package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed ingest — SURVEY.md §2.1 (S1–S3).
  *
  * The reference's loader parses a too-big-for-RAM XML incrementally and
  * coerces attribute strings to a fixed schema with a **-1 sentinel** on
  * parse failure (`YoutubeDataset_loader_final.py:16-53`), then bulk-inserts
  * with duplicate-key tolerance (`:87-93,111-123`). Spark-natively that is:
  * schema-on-read + `try_cast`-with-sentinel projections + a dedup-append
  * sink. No custom expression needed — `coalesce(try_cast, -1)` is built-in
  * (SURVEY.md §7.3).
  */
object Ingest {

  /** `-1`-sentinel coercion: parse failures become -1, exactly the loader's
    * `safe_int` (`YoutubeDataset_loader_final.py:29-34`); nulls stay -1 too,
    * matching its missing-attribute path. */
  def sentinel(c: Column, t: String = "int"): Column =
    coalesce(try_cast(c, t), lit(-1).cast(t))
  private def try_cast(c: Column, t: String): Column = c.try_cast(t)

  /** The reference `videos` schema (SURVEY.md §1.2) applied to raw
    * all-strings rows (as an XML/CSV source would deliver them). */
  def typedVideos(raw: DataFrame): DataFrame =
    raw.select(
      col("id").cast("string").as("id"),
      col("uploader").cast("string"),
      col("category").cast("string"),
      sentinel(col("age")).as("age"),
      sentinel(col("length")).as("length"),
      sentinel(col("views"), "bigint").as("views"),
      sentinel(col("rate"), "double").as("rate"),
      sentinel(col("ratings"), "bigint").as("ratings"),
      sentinel(col("comments"), "bigint").as("comments"),
      filter(split(coalesce(col("related"), lit("")), ","), x => x =!= "").as("related"))

  /** S3 — dedup-append sink: the `insert_many(ordered=False)` +
    * swallow-duplicate-key pattern becomes an anti-join against the existing
    * keys, then an append. Exactly-once per batch; the anti join broadcasts
    * the incoming key set when small. */
  def dedupAppend(spark: SparkSession, incoming: DataFrame, path: String, key: String): Long = {
    val fresh =
      if (new java.io.File(path).exists()) {
        val existing = spark.read.parquet(path).select(col(key))
        incoming.join(existing, Seq(key), "left_anti")
      } else incoming
    val deduped = fresh.dropDuplicates(key).cache()
    val n = deduped.count()
    if (n > 0) deduped.write.mode("append").parquet(path)
    deduped.unpersist()
    n
  }
}
