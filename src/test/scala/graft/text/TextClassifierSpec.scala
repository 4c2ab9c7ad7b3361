package graft.text

import graft.SparkSpec
import graft.model.Tables
import graft.ops.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  // the q_edit_neardups rule: the fixture's text is label-free noise (all
  // 31 tokens appear in every source at near-uniform rates), so the gate
  // corpus PLANTS a deterministic signal — 70% of docs carry their
  // source's marker token five times — and the oracle recomputes the same
  // augmentation. Accuracy then has a real target: marked docs classify,
  // unmarked ones stay near chance.
  private def planted(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(pmod(col("doc_id"), lit(10)) < 7,
        concat(col("text"),
          TextClassifier.marker(col("source")))).otherwise(col("text")))

  test("every held-out doc gets exactly one verdict; schema is total") {
    val docs = planted(Tables.documents(spark, sf))
    val v = TextClassifier.naiveBayes(docs)
    val nTest = Sampling.hashSplit(docs.select(col("doc_id")), "doc_id", 42L)
      .filter(col("split") === "test").count()
    assert(v.count() == nTest, "a test doc was dropped or duplicated")
    assert(v.filter(col("predicted").isNull || col("score").isNull).count() == 0)
  }

  test("the classifier recovers the planted signal far beyond chance") {
    val v = TextClassifier.naiveBayes(planted(Tables.documents(spark, sf)))
    val acc = v.agg(avg(when(col("correct"), 1.0).otherwise(0.0)))
      .as[Double].head()
    // 70% of test docs are marked; chance on the rest ≈ 1/20 — the
    // expectation sits near 0.73, and anything under 0.5 means the
    // model or scoring broke (measured 0.74 at sf0.001, 0.76 at sf0.01)
    assert(acc >= 0.5, s"NB accuracy $acc lost the planted signal")
  }

  test("margin AUC recovers the planted signal for every class") {
    val r = TextClassifier.naiveBayesAuc(planted(Tables.documents(spark, sf)))
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(r.size == 20)
    val nTest = r.map(_._2).sum // each test doc is positive in ONE class
    r.foreach { case (src, np, nn, auc) =>
      assert(np + nn == nTest, s"$src ledger broken: $np + $nn != $nTest")
      // a class with no test docs carries a null AUC honestly; for the
      // rest, the margin ranks true-class docs above the others — a
      // raw-posterior ranking reads ~0.2-0.3 here (length dominates)
      assert(np == 0 || auc.exists(_ > 0.5), s"$src margin AUC $auc at/below chance")
    }
    val defined = r.flatMap(_._4)
    assert(defined.sum / defined.size >= 0.8,
      s"mean margin AUC ${defined.sum / defined.size} too low for the planted corpus")
  }

  test("calibration: bins partition the test split and accuracy rises with margin") {
    val r = TextClassifier.naiveBayesCalibration(planted(Tables.documents(spark, sf)))
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(r.map(_._1) == (1 to 10), s"bins not dense: ${r.map(_._1)}")
    val nTest = Sampling.hashSplit(
        Tables.documents(spark, sf).select(col("doc_id")), "doc_id", 42L)
      .filter(col("split") === "test").count()
    assert(r.map(_._2).sum == nTest, "bins lost or duplicated docs")
    // margins are the ntile key, so their bin means must be monotone
    assert(r.map(_._3) == r.map(_._3).sorted, s"margin means not monotone: $r")
    // the planted signal makes high-margin routes trustworthy: the top
    // bin must beat the bottom bin decisively
    assert(r.last._4 >= r.head._4 + 0.3,
      s"calibration curve flat: bottom ${r.head._4} vs top ${r.last._4}")
  }

  test("report counts reconcile with the per-doc verdicts") {
    val docs = planted(Tables.documents(spark, sf))
    val v = TextClassifier.naiveBayes(docs)
    val r = TextClassifier.naiveBayesReport(docs)
    val nTest = v.count()
    assert(r.agg(sum(col("support"))).as[Long].head() == nTest)
    assert(r.agg(sum(col("n_predicted"))).as[Long].head() == nTest)
    val bad = r.filter(
      (col("recall") < 0) || (col("recall") > 1) ||
        (col("precision") < 0) || (col("precision") > 1))
    assert(bad.count() == 0, "a rate left [0,1]")
  }

  test("an all-OOV test doc falls back to the max-prior class") {
    // under seed 42, ids 1–4 hash into train and id 8 into test; doc 8
    // shares no token with the training vocabulary, so it must classify
    // by prior alone — lexicographically smallest among the tied priors
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "srcA", 16L),
      (2L, "alpha beta delta", "en", "srcA", 16L),
      (3L, "epsilon zeta eta", "en", "srcB", 16L),
      (4L, "epsilon zeta theta", "en", "srcB", 16L),
      (8L, "qqq www zzz", "en", "srcB", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val v = TextClassifier.naiveBayes(docs, vocabSize = 100)
      .as[(Long, String, String, Double, Boolean)].collect().toSeq
    assert(v.map(_._1) == Seq(8L))
    assert(v.head._3 == "srcA", s"OOV fallback picked ${v.head._3}, not the prior argmax")
  }
}
