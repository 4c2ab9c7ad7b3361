package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** The end-to-end training-data hygiene funnel — the composition a 100 TB
  * corpus actually runs, wired from the engine's own operators in the
  * standard cheapest-first order:
  *
  *   1. PII/URL scrub   (map-side regex, no shuffle)
  *   2. quality gate    (map-side score, no shuffle)
  *   3. exact dedup     (one shuffle on a 16-byte fingerprint)
  *   4. near-dup removal (MinHash + LSH banding — candidates only, no n²)
  *
  * Each stage strictly reduces the corpus, so the expensive stages see the
  * fewest documents. Near-dup removal keeps the smaller doc_id of every
  * verified pair and drops the other side — deterministic, and transitive
  * chains (a~b, b~c) collapse to the smallest member because every
  * larger-id member appears on the drop side of some pair.
  */
object CleanCorpus {

  /** Stage 1+2: scrubbed text and its quality score, one map-side pass. */
  def scrubbedWithQuality(documents: DataFrame): DataFrame = {
    val scrubbed = TextAnalysis.scrubPii(documents)
      .select(col("doc_id"), col("scrubbed").as("text"))
    TextAnalysis.qualityScores(scrubbed)
      .join(scrubbed, Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("quality_score"))
  }

  /** The full funnel. Returns the cleaned corpus (doc_id, text).
    *
    * Two near-dup drop policies:
    *   - `clusterDedup = false` (pair-wise): drop the larger side of every
    *     verified pair. Survivors are the pair graph's LOCAL minima — two
    *     docs that share a neighbor but were not themselves flagged both
    *     survive (they are not dups of each other).
    *   - `clusterDedup = true` (cluster collapse): connected components
    *     over the pairs ([[graft.graph.Components]]), one survivor per
    *     cluster — the aggressive policy large-corpus dedup usually wants
    *     (a near-dup chain is one document family). */
  def run(spark: SparkSession, documents: DataFrame,
          minQuality: Double = 0.3, jaccardThreshold: Double = 0.5,
          clusterDedup: Boolean = false): DataFrame = {
    val quality = scrubbedWithQuality(documents)
      .filter(col("quality_score") >= minQuality)
      .select(col("doc_id"), col("text"))
    val exactKept = quality
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exact = quality.join(exactKept, Seq("doc_id"), "left_semi")
    val pairs = Dedup.minhashNearDups(exact, threshold = jaccardThreshold)
    if (clusterDedup) {
      val keep = graft.graph.Components
        .dupClusters(exact.select(col("doc_id")), pairs)
        .filter(col("keep") === 1).select(col("doc_id"))
      exact.join(keep, Seq("doc_id"), "left_semi")
    } else {
      val dropNearDups = pairs.select(col("doc_b").as("doc_id")).distinct()
      exact.join(dropNearDups, Seq("doc_id"), "left_anti")
    }
  }

  /** CLI: clean a documents table end-to-end and write the surviving
    * corpus. Usage: runMain graft.jobs.CleanCorpus <sfDir> <outPath> */
  def main(args: Array[String]): Unit = {
    val (sfDir, out) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables.documents(spark, sfDir)
    val cleaned = run(spark, docs).cache()
    cleaned.write.mode("overwrite").parquet(out)
    println(s"[clean-corpus] input=${docs.count()} survivors=${cleaned.count()} -> $out")
    spark.stop()
  }

  /** Per-stage survivor counts for the FULL funnel, every stage
    * oracle-checkable since r10: the MinHash stage runs the
    * oracle-replicable PolyHash family ([[Dedup.minhashPerm]]), so the
    * near-dedup survivor count is a DuckDB recompute like the rest —
    * before the graduation the oracle had to stop at exact dedup. Stage
    * names are prefixed for stable ordering. The d-stage uses [[run]]'s
    * default pair-wise drop policy (larger side of each verified pair). */
  def stages(documents: DataFrame, minQuality: Double = 0.3): DataFrame = {
    val sq = scrubbedWithQuality(documents).cache()
    val quality = sq.filter(col("quality_score") >= minQuality)
    val exactKept = quality
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exact = quality.join(exactKept, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text")).cache()
    val nExact = exact.count()
    val nearDropped = Dedup.minhashNearDups(exact)
      .select(col("doc_b")).distinct().count()
    val spark = documents.sparkSession
    import spark.implicits._
    val counts = Seq(
      ("a_input", documents.count()),
      ("b_quality", quality.count()),
      ("c_exact_dedup", nExact),
      ("d_near_dedup", nExact - nearDropped))
    sq.unpersist() // all counts are consumed eagerly above
    exact.unpersist()
    counts.toDF("stage", "n_docs").orderBy(col("stage"))
  }
}
