package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-shaped fixture (FIXTURES.md §B1) with every boundary value the
  * reference's bucket logic must split on: 239/240, 1199/1200 seconds;
  * 999/1k, 9999/10k, 99999/100k, 999999/1M views; -1 sentinels; UNA and
  * null categories; related arrays with self-loops, dangling ids, dups. */
case class V(id: String, uploader: String, category: String, age: Int,
             length: Int, views: Long, rate: Double, ratings: Long,
             comments: Long, related: Seq[String])

class YouTubeSpec extends SparkSpec {
  import spark.implicits._

  lazy val videos: DataFrame = Seq(
    V("v01", "alice", "Music", 100, 239, 999L, 4.5, 10, 1, Seq("v02", "v03", "v04", "v05", "v06")),
    V("v02", "bob", "Music", 100, 240, 1000L, 4.0, 10, 1, Seq("v01", "v01", "v07")), // dup edge
    V("v03", "carol", "Comedy", 100, 1199, 9999L, 3.5, 10, 1, Seq("v03", "v01")),    // self-loop
    V("v04", "dave", "Comedy", 100, 1200, 10000L, 3.0, 10, 1, Seq("zz_dangling")),
    V("v05", "erin", "UNA", 100, 50, 99999L, 2.5, 10, 1, Seq()),
    V("v06", "frank", null, 100, 3000, 100000L, 2.0, 10, 1, Seq("v01", "v02", "v03", "v04", "v05")),
    V("v07", "grace", "Music", -1, -1, 999999L, 1.5, -1, -1, Seq("v01")),
    V("v08", "heidi", "Music", 100, 10, 1000000L, 5.0, 10, 1, Seq("v09", "v10", "v01", "v02", "v03", "v04"))
  ).toDF()

  test("length buckets split exactly at 240 and 1200 seconds (sentinels land short)") {
    val got = YouTube.lengthBuckets(videos)
      .select("length_bucket", "num_videos").as[(String, Long)].collect().toMap
    // short: 239, 50, -1, 10 ; medium: 240, 1199 ; long: 1200, 3000
    assert(got == Map("short_lt_4min" -> 4L, "medium_4_20min" -> 2L, "long_ge_20min" -> 2L))
  }

  test("view buckets split exactly at 1k/10k/100k/1M") {
    val got = YouTube.viewBuckets(videos)
      .select("views_bucket", "num_videos").as[(String, Long)].collect().toMap
    assert(got == Map(
      "a_lt_1k" -> 1L,      // 999
      "b_1k_10k" -> 2L,     // 1000, 9999
      "c_10k_100k" -> 2L,   // 10000, 99999
      "d_100k_1m" -> 2L,    // 100000, 999999
      "e_ge_1m" -> 1L))     // 1000000
  }

  test("category stats: count-desc order, UNA and null are ordinary groups") {
    val got = YouTube.categoryStats(videos)
      .select("category", "num_videos").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toSeq
    assert(got.head == (Some("Music") -> 4L))
    assert(got.map(_._1).toSet == Set(Some("Music"), Some("Comedy"), Some("UNA"), None))
  }

  test("relatedEdges: self-loops removed, dup edges kept, dangling ids kept") {
    val edges = YouTube.relatedEdges(videos)
      .as[(String, String)].collect().toSeq
    assert(!edges.contains(("v03", "v03")))        // self-loop dropped
    assert(edges.count(_ == ("v02", "v01")) == 2)  // multi-edge weight kept
    assert(edges.contains(("v04", "zz_dangling"))) // dangling kept (filtered later)
    assert(!edges.exists(_._2 == null))
  }

  test("influencers: filtered vertex set, reference cache schema, dense ranks") {
    val top = YouTube.influencers(spark, videos, k = 10).cache()
    // vertex filter: only v01 (5 related), v06 (5), v08 (6) qualify
    val ids = top.select("ID").as[String].collect().toSet
    assert(ids == Set("v01", "v06", "v08"))
    assert(top.columns.toSeq == Seq("rank", "ID", "influence_score", "uploader"))
    val ranks = top.select("rank").as[Long].collect().sorted.toSeq
    assert(ranks == Seq(1L, 2L, 3L))
    // v01<->v06 form a 2-cycle (plus v08 -> v01): rank mass oscillates with
    // period 2, and at the fixed 10th iteration v06 holds the peak — the
    // reference's fixed-iteration semantics, not the fixpoint's
    assert(top.filter(col("rank") === 1).select("ID").head.getString(0) == "v06")
    // v08 has no in-edges inside the filtered set: reset floor, last place
    assert(top.filter(col("rank") === 3).select("ID").head.getString(0) == "v08")
    val uploaders = top.select("uploader").as[String].collect()
    assert(!uploaders.contains(null))
  }

  test("degreeReport: histograms and enriched top-20s with zero-filled isolates") {
    val r = YouTube.degreeReport(videos)
    val outHist = r("out_degree_hist")
      .select("outDegree", "num_vertices").as[(Long, Long)].collect().toMap
    // out-degrees after cleanup: v01:5, v02:3(dup kept), v03:1, v04:1, v05:0(absent), v06:5, v07:1, v08:6
    assert(outHist == Map(5L -> 2L, 3L -> 1L, 1L -> 3L, 6L -> 1L))
    val topIn = r("top_by_in_degree")
      .select("id", "inDegree").as[(String, Long)].collect()
    // v01 referenced by v02 (twice — dup edge kept), v03, v06, v07, v08 = 6
    assert(topIn.head._1 == "v01" && topIn.head._2 == 6L)
    assert(topIn.exists { case (id, d) => id == "v08" && d == 0L }) // isolate zero-filled
  }

  test("viewStats returns the global stats the reference dropped") {
    val r = YouTube.viewStats(videos).head
    assert(r.getLong(r.fieldIndex("num_videos")) == 8L)
    assert(r.getLong(r.fieldIndex("max_views")) == 1000000L)
  }
}
