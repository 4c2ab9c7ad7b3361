package graft.dedup

import graft.Tier.PinOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The standing shingle index — [[Dedup.incrementalDedup]] turned from a
  * per-batch recompute into a MAINTAINED structure (the production form its
  * scaladoc promised): the corpus tier `(doc_id, n, shingle)` is persisted
  * once, each new crawl batch is classified by joining its own (small)
  * shingle tier against the index, and the shingles of ADMITTED documents
  * are appended — so no admission ever re-tokenizes the corpus.
  *
  * Scale shape: admission cost is `batch tokenization + one equi-join of
  * batch-shingles against the index` — proportional to the BATCH, not the
  * corpus; the corpus is touched only as a pruned columnar scan of the
  * index (shingle, doc_id, n — no text). The append is idempotent per
  * doc_id ([[appendAdmitted]] anti-joins the index's doc set, the
  * [[graft.ingest.Ingest.dedupAppend]] exactly-once contract), so a
  * replayed batch cannot double-index a document. At 100 TB the index is
  * written `bucketBy(shingle)` into a catalog table
  * ([[buildBucketed]]/[[admitBucketed]]) so the admission join plans no
  * index-side exchange; plain parquet keeps the driver gate
  * self-contained.
  *
  * Semantics vs the recompute form: identical by construction — both
  * classify a batch against (standing corpus ∪ earlier-batch docs) with
  * the same scoring; ShingleIndexSpec pins batch-2 verdicts equal to a
  * full re-tokenization and plan-asserts the index path is the ONLY file
  * scan in the admission query.
  */
object ShingleIndex {

  /** The persisted tier schema: one row per (doc_id, distinct shingle)
    * with the doc's total shingle count `n` riding along (the same
    * window-count trick as the in-memory tiers — `n` is needed by every
    * Jaccard denominator and costs nothing extra here). */
  def tier(documents: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    Dedup.shingleRows(documents, k).withColumn("n", count(lit(1)).over(w))
  }

  /** Build (overwrite) the standing index from a corpus snapshot. */
  def build(documents: DataFrame, path: String, k: Int = 3): Unit =
    tier(documents, k).write.mode("overwrite").parquet(path)

  /** Classify a batch tier against a corpus tier — the shared core of the
    * index-read and recompute forms. Verdict per batch doc: `dup_corpus`
    * (best match in the corpus tier), `dup_batch` (best match is an
    * EARLIER batch doc — first-in wins), or `new`; the winning match and
    * its Jaccard make rejects auditable (ties to the lower match id). */
  def classify(batchTier: DataFrame, corpusTier: DataFrame,
               threshold: Double = 0.5): DataFrame = {
    val bt = batchTier.pinTier
    val batch = bt.select(col("doc_id"), col("n"), col("shingle"))
    val other = corpusTier
      .select(col("doc_id").as("match_id"), col("n").as("n_m"), col("shingle"))
      .withColumn("m_batch", lit(false))
      .unionByName(bt
        .select(col("doc_id").as("match_id"), col("n").as("n_m"), col("shingle"))
        .withColumn("m_batch", lit(true)))
    val candidates = batch.join(other, Seq("shingle"))
      .filter(!col("m_batch") || col("match_id") < col("doc_id"))
    scoreCandidates(bt, candidates, threshold)
  }

  /** Shared scoring tail of [[classify]]/[[admitBucketed]]: shingle-matched
    * candidate rows `(doc_id, n, match_id, n_m, m_batch)` → per-doc verdict.
    *
    * m_batch is a GROUPING key, not an aggregate: a replayed doc_id can
    * appear in BOTH tiers, and folding the two (doc_id, match_id) rows
    * together would double-count n_shared (jaccard > 1) and leave
    * first(m_batch) nondeterministic. Grouped separately, the replayed
    * doc's corpus copy scores a jaccard-1.0 self-match → dup_corpus,
    * which is the recompute verdict for an already-admitted document. */
  private def scoreCandidates(bt: DataFrame, candidates: DataFrame,
                              threshold: Double): DataFrame = {
    val scored = candidates
      .groupBy(col("doc_id"), col("match_id"), col("m_batch"))
      .agg(count(lit(1)).as("n_shared"), min(col("n")).as("n_a"),
        min(col("n_m")).as("n_b"))
      .withColumn("jaccard",
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("match_id"), col("m_batch"))
    val best = scored
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("doc_id"),
        when(col("m_batch"), lit("dup_batch")).otherwise(lit("dup_corpus"))
          .as("verdict"),
        col("match_id"), col("jaccard"))
    bt.select(col("doc_id")).distinct()
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("verdict"), lit("new")).as("verdict"),
        col("match_id"), col("jaccard"))
      .orderBy(col("doc_id"))
  }

  /** Classify a new batch against the standing index at `path` — the
    * corpus side is READ, never re-tokenized. Batch docs with zero
    * shingles (empty text) still get a `new` verdict via the trailing
    * outer join in [[classify]]... except they have no tier rows, so they
    * are re-attached here from the batch frame itself. */
  def admit(spark: SparkSession, batch: DataFrame, path: String,
            k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val verdicts = classify(tier(batch, k), spark.read.parquet(path), threshold)
    batch.select(col("doc_id")).distinct()
      .join(verdicts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("verdict"), lit("new")).as("verdict"),
        col("match_id"), col("jaccard"))
      .orderBy(col("doc_id"))
  }

  /** The index as a BUCKETED catalog table — the 100 TB layout the plain-
    * parquet scaladoc promises: the tier is written `bucketBy(shingle)`
    * (sorted within buckets), so an admission join consumes the index
    * pre-partitioned on its join key and plans NO index-side exchange; at
    * batch sizes past broadcast range, only the batch side shuffles into
    * the bucket scheme. `path` makes it an external table so the data
    * lives where the caller stages it, not the session warehouse. */
  def buildBucketed(documents: DataFrame, table: String, path: String,
                    k: Int = 3, buckets: Int = 32): Unit =
    tier(documents, k).write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "shingle").sortBy("shingle")
      .option("path", path).saveAsTable(table)

  /** [[admit]] against the bucketed table. Verdicts are identical to the
    * plain form by construction — the corpus and batch candidate legs are
    * joined separately and unioned AFTER (join-then-union instead of
    * classify's union-then-join: a union upstream of the join would erase
    * the scan's bucketing-derived output partitioning and force the
    * exchange back). ShingleIndexSpec pins verdict equality and asserts
    * the exchange-free index side on the executed plan. */
  def admitBucketed(spark: SparkSession, batch: DataFrame, table: String,
                    k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val bt = tier(batch, k).pinTier
    val b = bt.select(col("doc_id"), col("n"), col("shingle"))
    val corpusLeg = b
      .join(spark.table(table)
        .select(col("doc_id").as("match_id"), col("n").as("n_m"), col("shingle")),
        Seq("shingle"))
      .withColumn("m_batch", lit(false))
    val batchLeg = b
      .join(bt
        .select(col("doc_id").as("match_id"), col("n").as("n_m"), col("shingle")),
        Seq("shingle"))
      .filter(col("match_id") < col("doc_id"))
      .withColumn("m_batch", lit(true))
    val verdicts =
      scoreCandidates(bt, corpusLeg.unionByName(batchLeg), threshold)
    batch.select(col("doc_id")).distinct()
      .join(verdicts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("verdict"), lit("new")).as("verdict"),
        col("match_id"), col("jaccard"))
      .orderBy(col("doc_id"))
  }

  /** Append the shingles of ADMITTED (`verdict = new`) batch docs to the
    * index, idempotent per doc_id: a doc already present (a replayed
    * batch) is never appended twice. Returns the number of docs added. */
  def appendAdmitted(spark: SparkSession, batch: DataFrame,
                     verdicts: DataFrame, path: String, k: Int = 3): Long = {
    val admitted = verdicts.filter(col("verdict") === "new").select(col("doc_id"))
    val existing = spark.read.parquet(path).select(col("doc_id")).distinct()
    val freshDocs = admitted.join(existing, Seq("doc_id"), "left_anti")
      .pinTier
    val n = freshDocs.count()
    if (n > 0)
      tier(batch.join(freshDocs, Seq("doc_id"), "leftsemi"), k)
        .write.mode("append").parquet(path)
    n
  }

  /** [[appendAdmitted]] for the bucketed catalog table — completes the
    * 100 TB form's maintenance loop (classify → append admitted →
    * classify the next batch against the grown index). Same idempotence
    * contract; each append adds a fresh set of per-bucket files, which
    * [[compactBucketed]] periodically folds back to one sorted run per
    * bucket. Returns the number of docs added. */
  def appendAdmittedBucketed(spark: SparkSession, batch: DataFrame,
                             verdicts: DataFrame, table: String,
                             k: Int = 3, buckets: Int = 32): Long = {
    val admitted = verdicts.filter(col("verdict") === "new").select(col("doc_id"))
    val existing = spark.table(table).select(col("doc_id")).distinct()
    val freshDocs = admitted.join(existing, Seq("doc_id"), "left_anti")
      .pinTier
    val n = freshDocs.count()
    if (n > 0)
      tier(batch.join(freshDocs, Seq("doc_id"), "leftsemi"), k)
        .write.mode("append").format("parquet")
        .bucketBy(buckets, "shingle").sortBy("shingle").saveAsTable(table)
    n
  }

  /** Fold the admission-accreted bucket files back to one sorted run per
    * bucket behind a catalog flip + vacuum (the
    * [[graft.lake.BucketedTable.compact]] machinery — shuffle-free, the
    * bucketed scan is the merge unit). Compaction must not change one
    * verdict: the q_incremental_dedup_compacted gate shares the indexed
    * twin's oracle verbatim. Returns (files before, files after). */
  def compactBucketed(spark: SparkSession, table: String, path: String,
                      buckets: Int = 32): (Long, Long) =
    graft.lake.BucketedTable.compact(spark, table, path, "shingles",
      "shingle", buckets)
}
