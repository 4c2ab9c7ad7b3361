package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  // dim: key 1 current (A), key 2 current (B) + its v0 history, key 3 current (C)
  private def dim = Seq(
    (1L, "A", 10L, 1L, Scd.OpenVersion, true),
    (2L, "B", 20L, 1L, Scd.OpenVersion, true),
    (2L, "B0", 20L, 0L, 1L, false),
    (3L, "C", 30L, 1L, Scd.OpenVersion, true)
  ).toDF("k", "seg", "nat", "version_from", "version_to", "is_current")

  // batch: key 1 changed, key 2 unchanged, key 9 new
  private def batch = Seq(
    (1L, "A2", 10L), (2L, "B", 20L), (9L, "N", 90L)
  ).toDF("k", "seg", "nat")

  test("scd2Merge: expire+open on change, passthrough no-ops, insert new keys, history untouched") {
    // the operator's output order is undefined (ordering is a gate
    // concern) — sort here, at the gate
    val got = Scd.scd2Merge(dim, batch, "k", Seq("seg", "nat"), batchVersion = 2L)
      .orderBy(col("k"), col("version_from"))
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "A", 10L, 1L, 2L, false),              // expired at v2
      (1L, "A2", 10L, 2L, Scd.OpenVersion, true), // opened replacement
      (2L, "B0", 20L, 0L, 1L, false),             // history passthrough
      (2L, "B", 20L, 1L, Scd.OpenVersion, true),  // unchanged no-op
      (3L, "C", 30L, 1L, Scd.OpenVersion, true),  // untouched by batch
      (9L, "N", 90L, 2L, Scd.OpenVersion, true)   // insert
    ), s"got $got")
  }

  test("scd2Merge is idempotent: replaying the same batch at the same version is a no-op") {
    val once = Scd.scd2Merge(dim, batch, "k", Seq("seg", "nat"), 2L)
    val twice = Scd.scd2Merge(once, batch, "k", Seq("seg", "nat"), 2L)
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("scd2Merge: a second version chain grows history monotonically") {
    val v2 = Scd.scd2Merge(dim, batch, "k", Seq("seg", "nat"), 2L)
    val batch3 = Seq((1L, "A3", 10L)).toDF("k", "seg", "nat")
    val v3 = Scd.scd2Merge(v2, batch3, "k", Seq("seg", "nat"), 3L)
      .filter(col("k") === 1L)
      .orderBy(col("version_from"))
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
    assert(v3 == Seq(
      (1L, "A", 10L, 1L, 2L, false),
      (1L, "A2", 10L, 2L, 3L, false),
      (1L, "A3", 10L, 3L, Scd.OpenVersion, true)), s"got $v3")
  }

  test("scd2Merge: null attr transitions are tracked (null-safe compare)") {
    val d = Seq((1L, null.asInstanceOf[String], 10L, 1L, Scd.OpenVersion, true))
      .toDF("k", "seg", "nat", "version_from", "version_to", "is_current")
    val b = Seq((1L, "X", 10L)).toDF("k", "seg", "nat")
    val got = Scd.scd2Merge(d, b, "k", Seq("seg", "nat"), 2L)
      .orderBy(col("version_from"))
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(r => (r._2, r._5, r._6)) ==
      Seq((null, 2L, false), ("X", Scd.OpenVersion, true)), s"got $got")
  }

  test("scd2Merge rejects an empty attr list") {
    intercept[IllegalArgumentException] {
      Scd.scd2Merge(dim, batch, "k", Seq.empty, 2L)
    }
  }

  test("scd2Merge: a batch with duplicate keys keeps one open row per key") {
    // the same key twice in one batch must NOT fan out through the
    // full-outer join (double-expired current row, two open rows)
    val b = Seq((1L, "A2", 10L), (1L, "A9", 10L), (9L, "N", 90L))
      .toDF("k", "seg", "nat")
    val got = Scd.scd2Merge(dim, b, "k", Seq("seg", "nat"), 2L)
    val openPerKey = got.filter(col("is_current"))
      .groupBy(col("k")).count().filter(col("count") > 1).count()
    assert(openPerKey == 0L, "duplicate batch keys broke one-open-row-per-key")
    val expired1 = got.filter(col("k") === 1L && !col("is_current") &&
      col("version_to") === 2L).count()
    assert(expired1 == 1L, "current row for key 1 expired more than once")
  }

  test("asOf: slicing the merged dimension at v1 reproduces the pre-batch current slice") {
    val merged = Scd.scd2Merge(dim, batch, "k", Seq("seg", "nat"), 2L)
    val got = Scd.asOf(merged, 1L).orderBy(col("k"))
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
    // expired-at-2 key 1 comes BACK (it was current at v1); the opened
    // replacement and the v2 insert drop out; the v0 history row stays out
    assert(got.map(r => (r._1, r._2)) ==
      Seq((1L, "A"), (2L, "B"), (3L, "C")), s"got $got")
    // as-of v0 sees only the pre-v1 history row's world
    val v0 = Scd.asOf(merged, 0L).as[(Long, String, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(v0.map(r => (r._1, r._2)) == Seq((2L, "B0")), s"got $v0")
  }

  test("scd2Merge plan: one join, explode-emitted legs, no operator-level global sort") {
    val p = Scd.scd2Merge(dim, batch, "k", Seq("seg", "nat"), 2L)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val joins = """\((\d+)\) [A-Za-z]*Join""".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(joins == 1, s"expected exactly one join (the full-outer merge), got $joins:\n$p")
    assert(p.contains("Generate"), s"legs must emit via the codegen'd explode:\n$p")
    // r10 verdict What's-wrong #2: no total-order shuffle inside the operator
    assert(!p.contains("rangepartitioning"), s"operator must not global-sort:\n$p")
  }
}
