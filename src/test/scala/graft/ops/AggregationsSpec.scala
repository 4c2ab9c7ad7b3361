package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit fixtures pin the semantics SURVEY.md §5.2 calls out: bucket boundary
  * values, deterministic dedup, decimal-exact sums. */
class AggregationsSpec extends SparkSpec {
  import spark.implicits._

  test("quantityBuckets: boundary values land in the right bucket") {
    val li = Seq(9.99, 10.0, 24.99, 25.0, 1.0, 50.0)
      .map(q => (1L, q, 100.0)).toDF("l_orderkey", "l_quantity", "l_extendedprice")
    val got = Aggregations.quantityBuckets(li)
      .select("qty_bucket", "num_items").as[(String, Long)].collect().toMap
    assert(got == Map("short" -> 2L, "medium" -> 2L, "long" -> 2L))
  }

  test("dsum is exact and order-independent") {
    val df1 = (1 to 1000).map(i => i + 0.01).toDF("x").repartition(7)
    val df2 = (1 to 1000).reverse.map(i => i + 0.01).toDF("x").repartition(3)
    val s1 = df1.agg(Aggregations.dsum(col("x"))).head.getDouble(0)
    val s2 = df2.agg(Aggregations.dsum(col("x"))).head.getDouble(0)
    assert(s1 == s2)
    assert(s1 == 500510.0)
  }

  test("dedupOrdersByCustomer keeps the min row per key (deterministic)") {
    val orders = Seq(
      (10L, 1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      (7L, 1L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
      (3L, 2L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = Aggregations.dedupOrdersByCustomer(orders)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 7L, 2L -> 3L))
  }

  test("categoryStats groups sum to total count on real fixture") {
    val li = graft.model.Tables.lineitem(spark, sf)
    val stats = Aggregations.categoryStats(li)
    assert(stats.agg(sum("num_items")).head.getLong(0) == li.count())
  }

  test("globalStats approx variant brackets exact median") {
    val li = graft.model.Tables.lineitem(spark, sf)
    val exact = Aggregations.globalStats(li).head
    val approx = Aggregations.globalStatsApprox(li).head
    val exactMedian = exact.getDouble(exact.fieldIndex("median_price"))
    val approxMedian = approx.getDouble(approx.fieldIndex("median_price"))
    assert(math.abs(exactMedian - approxMedian) / exactMedian < 0.05)
  }

  test("winsorize approx variant tracks exact quantiles per group") {
    val orders = graft.model.Tables.orders(spark, sf)
    def byGroup(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderpriority", "n", "p_lo", "p_hi")
        .as[(String, Long, Double, Double)].collect()
        .map { case (g, n, lo, hi) => g -> ((n, lo, hi)) }.toMap
    val exact = byGroup(Aggregations.winsorizedPriceStats(orders))
    val approx = byGroup(Aggregations.winsorizedPriceStats(orders, maxExactRows = 0L))
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, (n, lo, hi)) =>
      val (na, loA, hiA) = approx(g)
      assert(na == n, s"$g: row count must not depend on the quantile impl")
      assert(loA <= hiA, s"$g: approx quantiles out of order")
      // exact interpolates between values, the sketch returns a member
      // value — on the small fixture's sparse tails that gap dominates, so
      // the tolerance is wide; at real scale the sketch error is ~1/10000
      assert(math.abs(loA - lo) / lo < 0.15, s"$g: p05 approx=$loA exact=$lo")
      assert(math.abs(hiA - hi) / hi < 0.15, s"$g: p95 approx=$hiA exact=$hi")
    }
  }

  test("distinctSketchAudit: HLL estimates within bound, union row present") {
    val li = graft.model.Tables.lineitem(spark, sf)
    val rows = Aggregations.distinctSketchAudit(li)
      .as[(String, Long, Boolean)].collect()
    val flags = li.select("l_returnflag").distinct()
      .as[String].collect().toSet
    assert(rows.map(_._1).toSet == flags + "*")
    rows.foreach { case (scope, _, ok) =>
      assert(ok, s"$scope: HLL estimate outside the 5% bound") }
    // the '*' row's baseline is the true global distinct — the sketch-union
    // estimate was audited against THIS, not a sum of per-group counts
    // (flags share part keys, so the naive sum would overcount)
    val global = rows.find(_._1 == "*").get._2
    assert(global == li.select("l_partkey").distinct().count())
    assert(global < rows.filter(_._1 != "*").map(_._2).sum,
      "fixture must overlap part keys across flags or the union test is vacuous")
  }

  test("sourceDriftReport: identical sources score zero PSI, a skewed one does not") {
    import spark.implicits._
    // sources A and B carry the SAME text multiset -> each matches the
    // corpus distribution exactly, so every (p - q) term is 0 and PSI = 0;
    // source C holds only the longest texts -> concentrated in the top
    // deciles, PSI must clear the 0.25 "major drift" triage bound
    val texts = (1 to 40).map(i => (1 to (i * 3)).map(j => s"t$j").mkString(" "))
    val ab = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong, t, "a"), (1000L + i, t, "b")) }
    val even = ab.toDF("doc_id", "text", "source")
    val evenPsi = graft.ops.Aggregations.sourceDriftReport(even)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(evenPsi == Map("a" -> 0.0, "b" -> 0.0), s"got $evenPsi")
    val skewed = (even.as[(Long, String, String)].collect().toSeq ++
      texts.takeRight(5).zipWithIndex.map { case (t, i) => (2000L + i, t, "c") })
      .toDF("doc_id", "text", "source")
    val skewPsi = graft.ops.Aggregations.sourceDriftReport(skewed)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(skewPsi("c") > 0.25, s"skewed source under the major-drift bound: $skewPsi")
  }
}
