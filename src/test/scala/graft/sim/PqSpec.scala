package graft.sim

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("subvectors reassemble to the original vector") {
    val emb = Tables.embeddings(spark, sf).limit(20)
    val back = Pq.subvectors(emb, m = 4, dim = 64)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("sub"), col("svec")))).as("s"))
      .select(col("vec_id"),
        flatten(transform(col("s"), x => x.getField("svec"))).as("re"))
      .join(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("orig")), Seq("vec_id"))
      .filter(col("re") =!= col("orig"))
    assert(back.count() == 0, "subvector split lost or reordered components")
  }

  test("codes are total, m-wide, dense per subspace, and non-degenerate") {
    val emb = Tables.embeddings(spark, sf)
    val codes = Pq.pqCodes(emb, m = 4, ksub = 8, rounds = 2, dim = 64)
    assert(codes.count() == emb.count(), "a vector was dropped by encoding")
    assert(codes.filter(size(col("codes")) =!= 4).count() == 0,
      "a vector did not get exactly m codes")
    val perSub = codes
      .select(posexplode(col("codes")).as(Seq("sub", "code")))
      .groupBy(col("sub"))
      .agg(min(col("code")).as("mn"), max(col("code")).as("mx"),
        countDistinct(col("code")).as("n"))
      .as[(Int, Int, Int, Long)].collect()
    assert(perSub.length == 4)
    perSub.foreach { case (sub, mn, mx, n) =>
      assert(mn == 0 && mx <= 7, s"sub=$sub codes out of [0,8): [$mn,$mx]")
      // dense 0..mx (ranked over surviving centroids) and informative
      assert(n == mx + 1, s"sub=$sub codes not dense: $n distinct, max $mx")
      assert(n >= 2, s"sub=$sub collapsed to one code — quantizer degenerate")
    }
  }

  test("with rerank >= corpus, adcTopK equals the exact brute-force top-k") {
    // the ADC stage only SELECTS candidates; the exact re-rank DECIDES.
    // A pool covering the whole corpus makes the selection lossless, so
    // the result must be bruteForceTopK verbatim — the compressed path
    // can then only differ by what the pool CUTS, which recall audits own.
    val emb = Tables.embeddings(spark, sf)
    val got = Pq.adcTopK(emb, queryVecId = 0L, k = 10, rerank = 600)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos_sim"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = Similarity.bruteForceTopK(emb, Seq(0L), k = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want, s"lossless-pool ADC diverged from brute force:\n$got\nvs\n$want")
  }

  test("ivfPqTopK with nprobe = nlist and a lossless pool equals brute force") {
    // probing every cell and pooling the whole corpus removes both
    // approximations; the exact re-rank must then reproduce the exact
    // top-k verbatim — residual coding must not change a single verdict
    val emb = Tables.embeddings(spark, sf)
    val got = Pq.ivfPqTopK(emb, queryVecId = 0L, k = 10,
        nlist = 16, nprobe = 16, rerank = 600)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos_sim"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = Similarity.bruteForceTopK(emb, Seq(0L), k = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want, s"lossless IVF-PQ diverged from brute force:\n$got\nvs\n$want")
  }

  test("ivfPqTopK candidates come only from the probed cells") {
    val emb = Tables.embeddings(spark, sf)
    val res = Pq.ivfPqTopK(emb, queryVecId = 0L, k = 10, nprobe = 4)
    val cells = res.select(col("cell")).distinct().as[Long].collect()
    assert(res.count() == 10)
    assert(cells.length <= 4, s"results span ${cells.length} cells > nprobe=4")
  }

  test("adcTopK at the default pool keeps high recall vs exact") {
    val emb = Tables.embeddings(spark, sf)
    val approx = Pq.adcTopK(emb, queryVecId = 0L, k = 10)
      .select(col("neighbor_id")).as[Long].collect().toSet
    val exact = Similarity.bruteForceTopK(emb, Seq(0L), k = 10)
      .select(col("neighbor_id")).as[Long].collect().toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5,
      s"PQ@default pool recall $recall < 0.5 — quantizer is not selecting")
  }
}
