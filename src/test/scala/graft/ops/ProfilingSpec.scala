package graft.ops

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile: hand-computed per-column stats, numeric-only min/max, one row per column") {
    val d = Seq(
      (1L, Some(2.5), Some("a")),
      (2L, None, Some("b")),
      (3L, Some(7.5), None),
      (4L, Some(2.5), Some("a")))
      .toDF("id", "score", "tag")
    val got = Profiling.profile(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.size == 3)
    val id = got("id")
    assert(id.getString(1) == "bigint" && id.getLong(2) == 4L &&
      id.getLong(3) == 0L && id.getDouble(4) == 0.0 && id.getLong(5) == 4L &&
      id.getDouble(6) == 1.0 && id.getDouble(7) == 4.0, s"id row: $id")
    val score = got("score")
    assert(score.getLong(3) == 1L && score.getDouble(4) == 0.25 &&
      score.getLong(5) == 2L && // distinct excludes null; 2.5 counted once
      score.getDouble(6) == 2.5 && score.getDouble(7) == 7.5, s"score row: $score")
    val tag = got("tag")
    assert(tag.getString(1) == "string" && tag.getLong(3) == 1L &&
      tag.getLong(5) == 2L && tag.isNullAt(6) && tag.isNullAt(7), s"tag row: $tag")
  }

  test("diversityReport: uniform mix maxes entropy; skew drops it; single source null-normalized") {
    // 2+2 uniform over two sources: entropy ln 2, simpson 0.5. The norm
    // divides the PUBLISHED (rounded) entropy — recomputable from the row
    // — so uniform reads 0.9999, not 1.0 (0.6931/ln 2 after the round)
    val uniform = Seq("a", "a", "b", "b").toDF("source")
    val u = Profiling.diversityReport(uniform, "source").head()
    assert(u.getLong(0) == 4L && u.getLong(1) == 2L)
    assert(u.getDouble(2) == 0.6931 && u.getDouble(3) == 0.9999 &&
      u.getDouble(4) == 0.5, s"uniform: $u")
    // 3:1 skew: entropy below max, simpson above the uniform floor
    val skew = Seq("a", "a", "a", "b").toDF("source")
    val s = Profiling.diversityReport(skew, "source").head()
    assert(s.getDouble(2) < 0.6931 && s.getDouble(4) > 0.5, s"skew: $s")
    // one source: entropy 0, normalized undefined -> null
    val solo = Seq("a", "a").toDF("source")
    val o = Profiling.diversityReport(solo, "source").head()
    assert(o.getDouble(2) == 0.0 && o.isNullAt(3) && o.getDouble(4) == 1.0,
      s"solo: $o")
  }

  test("benfordReport: hand-computed digits, cents boundary, non-positive excluded") {
    // 19.99 -> 1999 cents -> digit 1; 0.01 -> 1; 905.00 -> 9; 2.50 -> 2;
    // 0 and -5 excluded (no first significant digit)
    val d = Seq(19.99, 0.01, 905.00, 2.50, 0.0, -5.0).toDF("v")
    val got = Profiling.benfordReport(d, "v")
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    assert(got.map(r => r._1 -> r._2) == Seq(1 -> 2L, 2 -> 1L, 9 -> 1L),
      s"got $got")
    val m = got.map(r => r._1 -> r).toMap
    assert(m(1)._3 == 0.5 && m(1)._4 == 0.301 && m(1)._5 == 0.199, s"got $got")
  }

  test("kAnonymity: small combos flagged, boundary k not flagged") {
    val d = (Seq.fill(10)(("en", "a")) ++ Seq.fill(3)(("en", "b")) :+
      (("fr", "a"))).toDF("lang", "source")
    val got = Profiling.kAnonymity(d, Seq("lang", "source"), k = 10L)
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("en", "a", 10L, false), // exactly k -> safe (< k is the risk rule)
      ("en", "b", 3L, true),
      ("fr", "a", 1L, true)), s"got $got")
  }

  test("fkAudit: orphans counted, null child key is an orphan, clean FK reports zero") {
    val parent = Seq(1L, 2L).toDF("pid")
    val child = Seq(Some(1L), Some(1L), Some(9L), None)
      .toDF("cid") // 9 dangles, null surfaces as an orphan
    val got = Profiling.fkAudit(child, "cid", parent, "pid", "c -> p")
      .as[(String, Long, Long, Double)].head()
    assert(got == (("c -> p", 4L, 2L, 0.5)), s"got $got")
    val clean = Profiling.fkAudit(parent, "pid", parent, "pid", "self")
      .as[(String, Long, Long, Double)].head()
    assert(clean == (("self", 2L, 0L, 0.0)), s"got $clean")
  }
}
