package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Two-phase result caches — SURVEY.md §2.1 (S7/S8).
  *
  * The reference precomputes each report to a JSON cache and serves reads
  * from it (`run_netagg_job.py:198-221`, `guiV5.py:59-78`). Spark-natively a
  * cache is a materialized parquet result: the batch job writes it once, the
  * serve layer re-reads it with schema validation. Parquet (not JSON) so the
  * serve-side scan keeps column pruning; `coalesce(1)` because these are
  * report-sized outputs — never use it on data-sized results. */
object Caches {

  def write(result: DataFrame, path: String): Unit =
    result.coalesce(1).write.mode("overwrite").parquet(path)

  /** S8 — read back with the reference's required-column validation
    * (`guiV5.py:72-78`): missing columns fail fast at serve time. */
  def read(spark: SparkSession, path: String, requiredColumns: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    val missing = requiredColumns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"cache at $path missing required columns: ${missing.mkString(", ")}")
    df
  }
}
