package graft.text

import graft.Tier.PinOps
import graft.ops.Sampling
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes source classifier — the quality/domain
  * classifier leg of a training-data pipeline (the fastText-classifier
  * role in CCNet/RefinedWeb curation: route documents to mixture buckets
  * by predicted domain, audit a crawl slice against its claimed source).
  * The reference's only "classification" is its per-category aggregate
  * report (SURVEY §2.3); this is the §2-beyond mandate, built as pure
  * DataFrame arithmetic — no spark.ml, no RNG — so the whole
  * train-then-score pipeline replays in the DuckDB oracle exactly.
  *
  * Determinism contract (the decimal-ledger trick from
  * q_label_centroids): every per-term log-likelihood is rounded to 6
  * decimals ONCE, then accumulated as exact DECIMAL — integer-exact
  * summation, so per-document scores compare exactly across engines and
  * the argmax needs no epsilon. Laplace(+1) smoothing over a top-V
  * closed vocabulary; out-of-vocabulary tokens are dropped on BOTH
  * train-count and score sides (standard closed-vocab NB).
  *
  * Scale shape: train = one (term, class) count shuffle over the train
  * split + a V-bounded TakeOrdered vocabulary; the DENSE model (every
  * vocab term × every class, zero counts smoothed) is V·C rows — bounded
  * by the vocabulary cap, NOT the corpus — and broadcasts to the scoring
  * join. Scoring = one map-side broadcast join + one groupBy(doc) decimal
  * sum: linear in the test split, one shuffle. At 100 TB the vocabulary
  * cap is the guard: V·C stays a few-MB broadcast no matter the corpus.
  */
object TextClassifier {

  /** The planted-signal expression the GATE corpus appends (the
    * q_edit_neardups augmentation rule: the fixture's text is label-free
    * noise, so the gate plants a recoverable signal and the oracle
    * recomputes the identical augmentation): five copies of a per-source
    * marker token. Shared between the SparkEntry registration and the
    * spec so the two corpora never drift. */
  def marker(source: Column): Column =
    repeat(concat(lit(" srcmark_"), source), 5)

  /** Train on the [[Sampling.hashSplit]] train+val slice, score the
    * held-out `test` slice (membership a pure function of (seed, doc_id)
    * — reproducible, growth-stable, and NOT correlated with any fixture
    * id-arithmetic the way a doc_id-mod split would be). Returns
    * per-test-document verdicts `(doc_id, label, predicted, score,
    * correct)` — score is the winning class's exact decimal posterior
    * (prior + Σ tf·loglik), cast back to double at the boundary. */
  def naiveBayes(documents: DataFrame, vocabSize: Int = 2000,
                 seed: Long = 42L): DataFrame = {
    val parts = modelParts(documents, vocabSize, seed)
    // argmax with lexicographic class tiebreak, no window: negate the
    // posterior so min(struct) picks (highest score, smallest class)
    val viaTokens = parts.scored
      .groupBy(col("doc_id"), col("source"))
      .agg(min(struct((-col("posterior")).as("neg"), col("cls"))).as("best"))
      .select(col("doc_id"), col("source"),
        col("best.cls").as("predicted"),
        (-col("best.neg")).cast("double").as("score"))
    // totality: a test doc whose every token is OOV has no scored rows —
    // it classifies by prior alone (one constant winner, broadcast)
    val priorWinner = parts.classes
      .agg(min(struct((-col("log_prior")).as("neg"), col("source"))).as("b"))
      .select(col("b.source").as("prior_cls"),
        (-col("b.neg")).cast("double").as("prior_score"))
    parts.testDocs
      .join(viaTokens, Seq("doc_id", "source"), "left")
      .crossJoin(broadcast(priorWinner))
      .select(col("doc_id"), col("source").as("label"),
        coalesce(col("predicted"), col("prior_cls")).as("predicted"),
        coalesce(col("score"), col("prior_score")).as("score"))
      .withColumn("correct", col("predicted") === col("label"))
      .orderBy(col("doc_id"))
  }

  private case class NbParts(classes: DataFrame, scored: DataFrame,
                             testDocs: DataFrame)

  /** The shared train-and-score pipeline up to the per-(doc, class)
    * posterior table — [[naiveBayes]] takes its argmax, [[naiveBayesAuc]]
    * ranks its columns. */
  private def modelParts(documents: DataFrame, vocabSize: Int,
                         seed: Long): NbParts = {
    require(vocabSize >= 1,
      s"naiveBayes: need vocabSize >= 1, got vocabSize=$vocabSize")
    val split = Sampling.hashSplit(
      documents.select(col("doc_id"), col("source"), col("text")),
      "doc_id", seed)
    // pinned: four consumers read the token stream (the vocab TakeOrdered,
    // the class totals, the per-(term, class) counts and the test-split tf
    // aggregate), and without the pin each re-runs the tokenize → explode
    // pipeline over the corpus — the ngramJaccardPairs shingle-tier rule
    // (r16; measured 4 tokenization passes → 1). r17 (ADVICE r16): the pin
    // is the per-(doc, term) tf AGGREGATE, not the raw exploded occurrence
    // stream — the r16 pin was the one tier whose size grew linearly with
    // total tokens, where the tf table is bounded by distinct terms per
    // doc and serves all four consumers exactly (every downstream number
    // is an exact-integer sum of tfs: Σ_docs tf = occurrence count).
    val toks = split.select(
        col("doc_id"), col("source"), col("split"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("source"), col("split"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .pinTier
    val train = toks.filter(col("split") =!= "test")

    // closed vocabulary: top-V train terms by (freq desc, term) — the
    // TextAnalysis.vocabulary ordering, V-bounded TakeOrdered; sum of
    // per-doc tfs ≡ the occurrence count (exact integers, any order)
    val vocab = train.groupBy(col("term"))
      .agg(sum(col("tf")).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(vocabSize)
      .select(col("term"))

    val trainV = train.join(broadcast(vocab), Seq("term"))
    // per-class in-vocab token totals and document priors (one row/class)
    val classTotals = trainV.groupBy(col("source"))
      .agg(sum(col("tf")).as("n_tokens"))
    val priors = split.filter(col("split") =!= "test")
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val classes = priors
      .crossJoin(priors.agg(sum(col("n_docs")).as("total_docs")))
      .join(classTotals, Seq("source"))
      .select(col("source"),
        round(log(col("n_docs").cast("double") / col("total_docs")), 6)
          .cast("decimal(18,6)").as("log_prior"),
        col("n_tokens"))

    // DENSE smoothed model: every (vocab term × class), tf >= 0 — V·C
    // rows by construction, broadcast to the scorer
    val counts = trainV.groupBy(col("term"), col("source"))
      .agg(sum(col("tf")).as("tf"))
    val model = vocab.crossJoin(classes)
      .join(counts, Seq("term", "source"), "left")
      .select(col("term"), col("source"), col("log_prior"),
        round(log((coalesce(col("tf"), lit(0L)) + lit(1)).cast("double")
            / (col("n_tokens") + lit(vocabSize)).cast("double")), 6)
          .cast("decimal(18,6)").as("log_lik"))

    // score the held-out split: per (doc, class) exact decimal posterior.
    // tf widens to decimal(10,0) so the product stays in-precision
    // ((18,6)·(10,0) → (29,6); the sum’s (38,6) never overflows). The tf
    // aggregate IS the pinned tier now — no per-gate shuffle left here.
    val test = toks.filter(col("split") === "test")
      .select(col("doc_id"), col("source"), col("term"),
        col("tf").cast("decimal(10,0)").as("tf"))
    val scored = test
      .join(broadcast(model.withColumnRenamed("source", "cls")), Seq("term"))
      .groupBy(col("doc_id"), col("source"), col("cls"))
      .agg((max(col("log_prior"))
        + sum(col("log_lik") * col("tf"))).as("posterior"))
    NbParts(classes, scored,
      split.filter(col("split") === "test")
        .select(col("doc_id"), col("source")))
  }

  /** One-vs-rest AUC per class — the threshold-free quality number next
    * to [[naiveBayesReport]]'s argmax rates (a router is tuned on AUC,
    * not accuracy, when the mixture shares are imbalanced). The ranking
    * score is the MARGIN — posterior_c minus the best OTHER class's
    * posterior, i.e. exactly what the argmax compares — NOT the raw
    * posterior: a raw log-likelihood sum scales with document LENGTH, so
    * ranking it across documents measures length, not class affinity
    * (observed: raw-posterior "AUC" ≈ 0.2–0.3 on a 75%-accurate model;
    * the margin is length-invariant by construction). Then the exact
    * Mann–Whitney rank-sum identity: AUC_c = (Σ ranks of positives −
    * n⁺(n⁺+1)/2) / (n⁺·n⁻), ranks ascending by (margin, doc_id) —
    * margins are exact decimal differences, so the id tiebreak only ever
    * resolves true byte-ties (documented deviation from midrank AUC;
    * engine-portable where midranks on float ties are not). All-OOV docs
    * enter at their prior-only posteriors. Cost: the classifier's own
    * scoring pass + one doc-partitioned top-2 window + one
    * C-partitioned rank window over the test split. */
  def naiveBayesAuc(documents: DataFrame, vocabSize: Int = 2000,
                    seed: Long = 42L): DataFrame = {
    val p = testPosteriors(documents, vocabSize, seed)
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("posterior").desc, col("cls"))
    val tops = p.withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <= 2)
      .groupBy(col("doc_id"))
      .agg(max(when(col("rk") === 1, col("posterior"))).as("p1"),
        max(when(col("rk") === 2, col("posterior"))).as("p2"),
        max(when(col("rk") === 1, col("cls"))).as("c1"))
    val margins = p.join(tops, Seq("doc_id"))
      .select(col("doc_id"), col("label"), col("cls"),
        when(col("cls") === col("c1"),
          col("posterior") - coalesce(col("p2"), col("p1")))
          .otherwise(col("posterior") - col("p1")).as("margin"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cls")).orderBy(col("margin"), col("doc_id"))
    margins.withColumn("rn", row_number().over(w).cast("long"))
      .groupBy(col("cls"))
      .agg(sum(when(col("label") === col("cls"), col("rn"))).as("rank_sum"),
        sum(when(col("label") === col("cls"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("label") === col("cls"), 0L).otherwise(1L)).as("n_neg"))
      .select(col("cls").as("source"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("rank_sum") - col("n_pos") * (col("n_pos") + 1) / 2)
            / (col("n_pos") * col("n_neg")).cast("double"), 4))
          .as("auc"))
      .orderBy(col("source"))
  }

  /** Reliability-by-margin report — the calibration view next to
    * [[naiveBayesAuc]]: test docs binned into `bins` quantiles of the
    * WINNER'S margin (p1 − p2, the argmax's own confidence), each bin
    * reporting its accuracy — a router trusts high-margin routes only if
    * this curve actually rises. Deterministic: margins are exact decimal
    * differences, the ntile orders by (margin, doc_id) — the
    * q_quality_deciles global-quantile precedent (the window is
    * test-split-sized, not corpus-sized) — and only the published mean
    * and rate round (4). */
  def naiveBayesCalibration(documents: DataFrame, vocabSize: Int = 2000,
                            seed: Long = 42L, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"naiveBayesCalibration: need bins >= 2, got $bins")
    val p = testPosteriors(documents, vocabSize, seed)
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("posterior").desc, col("cls"))
    val verdicts = p.withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <= 2)
      .groupBy(col("doc_id"))
      .agg(max(col("label")).as("label"),
        max(when(col("rk") === 1, col("posterior"))).as("p1"),
        max(when(col("rk") === 2, col("posterior"))).as("p2"),
        max(when(col("rk") === 1, col("cls"))).as("predicted"))
      .select(col("doc_id"), col("label"), col("predicted"),
        (col("p1") - coalesce(col("p2"), col("p1"))).as("margin"))
    val wBin = org.apache.spark.sql.expressions.Window
      .orderBy(col("margin"), col("doc_id"))
    verdicts.withColumn("bin", ntile(bins).over(wBin))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("margin")).cast("double") / count(lit(1)), 4)
          .as("mean_margin"),
        round(avg(when(col("predicted") === col("label"), 1.0)
          .otherwise(0.0)), 4).as("accuracy"))
      .orderBy(col("bin"))
  }

  /** Per-(test doc, class) posterior table — the dense score matrix both
    * [[naiveBayesAuc]] and any calibration consumer read. Docs whose
    * every token is OOV carry the prior-only posterior in every class. */
  private def testPosteriors(documents: DataFrame, vocabSize: Int,
                             seed: Long): DataFrame = {
    val parts = modelParts(documents, vocabSize, seed)
    val scoredDocs = parts.scored.select(col("doc_id")).distinct()
    val oov = parts.testDocs
      .join(scoredDocs, Seq("doc_id"), "left_anti")
      .crossJoin(broadcast(parts.classes
        .select(col("source").as("cls"), col("log_prior"))))
      .select(col("doc_id"), col("source").as("label"), col("cls"),
        col("log_prior").cast("decimal(38,6)").as("posterior"))
    parts.scored
      .select(col("doc_id"), col("source").as("label"), col("cls"),
        col("posterior").cast("decimal(38,6)"))
      .unionByName(oov)
  }

  /** The aggregate view: per-class precision/recall/support over the same
    * verdicts — the report a curation dashboard reads. Counts are exact
    * integers; rates round at 4 (the house report constant). */
  def naiveBayesReport(documents: DataFrame, vocabSize: Int = 2000,
                       seed: Long = 42L): DataFrame = {
    val v = naiveBayes(documents, vocabSize, seed)
    val byLabel = v.groupBy(col("label").as("source"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("tp"))
    val byPred = v.groupBy(col("predicted").as("source"))
      .agg(count(lit(1)).as("n_predicted"))
    byLabel.join(byPred, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        round(coalesce(col("tp"), lit(0L))
          / col("support").cast("double"), 4).as("recall"),
        round(coalesce(col("tp"), lit(0L))
          / col("n_predicted").cast("double"), 4).as("precision"))
      .orderBy(col("source"))
  }
}
