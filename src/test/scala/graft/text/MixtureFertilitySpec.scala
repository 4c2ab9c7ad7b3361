package graft.text

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class MixtureFertilitySpec extends SparkSpec {
  import spark.implicits._

  test("fertility >= 1 everywhere and totals reconcile with bpeEncode") {
    val docs = Tables.documents(spark, sf)
    val r = TextAnalysis.bpeFertility(docs)
    // BPE splits a word into >= 1 tokens, never merges across words
    assert(r.filter(col("fertility") < 1.0).count() == 0)
    assert(r.filter(col("chars_per_token") <= 0.0).count() == 0)
    val (w1, b1) = r.agg(sum(col("n_words")), sum(col("n_bpe_tokens")))
      .as[(Long, Long)].head()
    val (w2, b2) = TextAnalysis.bpeEncode(docs)
      .agg(sum(col("n_words")), sum(col("n_bpe_tokens")))
      .as[(Long, Long)].head()
    assert((w1, b1) == (w2, b2), "per-source totals diverge from per-doc encode")
  }

  test("dedup-aware plan: planted copies shrink the unique ledger and grow epochs") {
    // srcB pads its mass with 3 verbatim copies; srcA is all-unique.
    // The raw ledgers tie, but srcB's unique mass is half — so at equal
    // weights its epochs double while the naive plan would report them equal
    val run = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run a", "en", "srcA", 1L), (2L, s"$run b", "en", "srcA", 1L),
      (3L, s"$run c", "en", "srcA", 1L), (4L, s"$run d", "en", "srcA", 1L),
      (5L, s"$run x", "en", "srcB", 1L), (6L, s"$run x", "en", "srcB", 1L),
      (7L, s"$run y", "en", "srcB", 1L), (8L, s"$run y", "en", "srcB", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.mixturePlanDedupAware(
        docs, Seq("srcA" -> 1.0, "srcB" -> 1.0), tokenBudget = 88L)
      .as[(String, Long, Long, Long, Long, Double, Long, Double, Boolean)]
      .collect().toSeq
    val a = r.find(_._1 == "srcA").get
    val b = r.find(_._1 == "srcB").get
    assert(a._2 == 4 && a._3 == 4 && a._4 == a._5, s"srcA should be all-unique: $a")
    assert(b._2 == 4 && b._3 == 2 && b._5 * 2 == b._4,
      s"srcB should halve under dedup: $b")
    // equal planned tokens, but srcB's epochs run on the unique mass
    assert(a._7 == b._7 && b._8 == a._8 * 2, s"epochs: $a vs $b")
    assert(!a._9 && b._9, "only the copy-padded source oversamples")
  }
}
