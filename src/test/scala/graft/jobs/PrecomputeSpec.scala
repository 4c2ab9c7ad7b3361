package graft.jobs

import graft.SparkSpec
import graft.serve.Caches

class PrecomputeSpec extends SparkSpec {

  test("two-phase precompute writes every reference cache with its §1.4 schema") {
    val out = java.nio.file.Files.createTempDirectory("graft-caches").toString
    Precompute.runAll(spark, sf, out)

    // Phase 2 reads with required-column validation (guiV5.py:72-78 pattern)
    val pr = Caches.read(spark, s"$out/pagerank_cache",
      Seq("rank", "ID", "influence_score", "uploader"))
    assert(pr.count() > 0)
    // ranks are 1..N dense (bigint, matching the oracle's row_number type)
    val ranks = pr.select("rank").collect().map(_.getLong(0)).sorted
    assert(ranks.head == 1L && ranks.toSeq == (1L to ranks.length.toLong))

    val cats = Caches.read(spark, s"$out/category_stats",
      Seq("l_returnflag", "num_items", "avg_qty", "max_price"))
    assert(cats.count() > 0)
    assert(Caches.read(spark, s"$out/view_stats_global",
      Seq("num_items", "median_price", "p90_price")).count() == 1)
    assert(Caches.read(spark, s"$out/degree_hist", Seq("outDegree", "num_vertices")).count() > 0)
    assert(Caches.read(spark, s"$out/top_by_degree", Seq("id", "outDegree")).count() == 20)
    assert(Caches.read(spark, s"$out/size_buckets", Seq("qty_bucket", "num_items")).count() == 3)
    assert(Caches.read(spark, s"$out/view_buckets", Seq("price_bucket", "num_orders")).count() > 0)
    val als = Caches.read(spark, s"$out/als_recs_cache",
      Seq("userId", "userKey", "recommendations"))
    assert(als.count() > 0)

    // missing-column validation fails fast
    intercept[IllegalArgumentException] {
      Caches.read(spark, s"$out/pagerank_cache", Seq("nonexistent_column"))
    }
  }
}
