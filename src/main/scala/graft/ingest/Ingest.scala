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

  /** S1 — streaming XML scan, Spark-native: the reference's incremental
    * `iterparse` over a too-big-for-RAM crawl file
    * (`YoutubeDataset_loader_final.py:75-108`) maps to the built-in XML
    * source (Spark 4 ships it), which streams row-tags without
    * materializing the document; partitioned, so a 100 TB crawl splits
    * across executors instead of one driver loop. Attributes surface with
    * the `_` prefix; child `<related>` elements arrive as an array. */
  /** Explicit all-strings schema: skips the inference pass entirely (one
    * scan instead of two over a 100 TB crawl) and sidesteps the Stax
    * attribute caster throwing on values like `length=""` that inference
    * typed numeric from earlier rows — typing is OUR job, one projection
    * later, with sentinels. */
  val xmlVideoSchema: StructType = StructType(
    Seq("_id", "_uploader", "_category", "_age", "_length", "_views",
      "_rate", "_ratings", "_comments").map(StructField(_, StringType)) :+
      StructField("related", ArrayType(StringType)))

  def readVideosXml(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "video")
      .option("attributePrefix", "_")
      .schema(xmlVideoSchema)
      .load(path)

  /** S2 for the XML shape: attribute columns (all read as strings via an
    * explicit projection) through the same sentinel coercion. */
  def typedVideosFromXml(raw: DataFrame): DataFrame = {
    val related =
      if (raw.columns.contains("related"))
        raw.schema("related").dataType match {
          case _: org.apache.spark.sql.types.ArrayType =>
            coalesce(col("related").cast("array<string>"), array())
          case _ => filter(array(col("related").cast("string")), x => x.isNotNull)
        }
      else array()
    raw.select(
      col("_id").cast("string").as("id"),
      col("_uploader").cast("string").as("uploader"),
      col("_category").cast("string").as("category"),
      sentinel(col("_age")).as("age"),
      sentinel(col("_length")).as("length"),
      sentinel(col("_views"), "bigint").as("views"),
      sentinel(col("_rate"), "double").as("rate"),
      sentinel(col("_ratings"), "bigint").as("ratings"),
      sentinel(col("_comments"), "bigint").as("comments"),
      related.as("related"))
  }

  /** S3 — dedup-append sink: the `insert_many(ordered=False)` +
    * swallow-duplicate-key pattern becomes an anti-join against the existing
    * keys, then an append. Exactly-once per batch; the anti join broadcasts
    * the incoming key set when small. Existence goes through the Hadoop
    * `FileSystem` resolved from the path's scheme — `java.io.File` would
    * always say "absent" on HDFS/S3 and silently re-ingest every batch. */
  def dedupAppend(spark: SparkSession, incoming: DataFrame, path: String, key: String): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (fs.exists(hPath)) {
        val existing = spark.read.parquet(path).select(col(key))
        incoming.join(existing, Seq(key), "left_anti")
      } else incoming
    val deduped = fresh.dropDuplicates(key).cache()
    val n = deduped.count()
    if (n > 0) deduped.write.mode("append").parquet(path)
    deduped.unpersist()
    n
  }

  // ------------------------------------------------------------- users

  /** The reference `users` schema — the second collection its loader fills
    * (`YoutubeDataset_loader_final.py:55-72`): `_id` string key plus
    * `uploads`/`watches`/`friends` ints, each through the same -1-sentinel
    * coercion as the video numerics. */
  def typedUsers(raw: DataFrame): DataFrame =
    raw.select(
      col("id").cast("string").as("user_id"),
      sentinel(col("uploads")).as("uploads"),
      sentinel(col("watches")).as("watches"),
      sentinel(col("friends")).as("friends"))

  /** All-strings schema for `<user id=… uploads=… watches=… friends=…/>`
    * row tags — same no-inference rationale as [[xmlVideoSchema]]. */
  val xmlUserSchema: StructType = StructType(
    Seq("_id", "_uploads", "_watches", "_friends").map(StructField(_, StringType)))

  def readUsersXml(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "user")
      .option("attributePrefix", "_")
      .schema(xmlUserSchema)
      .load(path)

  def typedUsersFromXml(raw: DataFrame): DataFrame =
    typedUsers(raw.select(
      col("_id").as("id"), col("_uploads").as("uploads"),
      col("_watches").as("watches"), col("_friends").as("friends")))

  /** The reference's one consumer of the users collection: its size
    * (`YoutubeNetworkAgg_Final.py:29`). */
  def userCount(users: DataFrame): DataFrame =
    users.agg(count(lit(1)).as("n_users"))

  // ------------------------------------------------------------- jsonl
  // The standard LLM training-corpus interchange format (one JSON object
  // per line). Same no-inference rationale as the XML source: an explicit
  // schema reads the corpus in ONE pass — schema inference would scan
  // 100 TB twice — and pins types against silent widening.

  /** Documents-corpus JSONL schema + a corrupt-record sink column. */
  val jsonlDocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt", StringType)))

  /** PERMISSIVE read with corrupt-record ROUTING, not dropping: malformed
    * lines land whole in `_corrupt` (and every schema column null), so
    * [[jsonlQuarantine]] can persist them for repair while
    * [[jsonlClean]] feeds the pipeline — at corpus scale "0.1% bad
    * lines" is millions of documents someone must be able to audit,
    * and DROPMALFORMED would erase them without a trace. */
  def readDocumentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(jsonlDocumentSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** The well-formed rows, corrupt column stripped. A row is clean when
    * the parser left `_corrupt` null. */
  def jsonlClean(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt").isNull).drop("_corrupt")

  /** Parse ONCE, split into (clean, quarantine). The parsed frame is
    * pinned before splitting — both the right pipeline shape (the JSON
    * parse is the expensive pass; two consumers must not re-run it) and
    * required: Spark refuses corrupt-only projections straight off a raw
    * scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the corrupt column exists
    * only for rows the parser actually touched). */
  def jsonlSplit(raw: DataFrame): (DataFrame, DataFrame) = {
    val parsed = graft.Tier.pin(raw)
    (jsonlClean(parsed),
      parsed.filter(col("_corrupt").isNotNull)
        .select(col("_corrupt").as("raw_line")))
  }

  /** Semi-structured property extraction — the embedded-JSON column every
    * event log carries (`props`): parse with an explicit schema
    * (`from_json`, map-side, no driver-side schema inference) and report
    * per-type health — row count, rows whose `k` did not parse (missing
    * key OR malformed document; both surface as null, which is exactly
    * what an ingest monitor wants as one number), and the extracted
    * field's sum/mean. The typed-extraction boundary rule of the XML
    * source applied to JSON: schema declared, never inferred, so the scan
    * stays one pass and the plan is stable however dirty the data.
    *
    * Scale shape: one map-side parse + one hash aggregate — the
    * |types|-sized report is the only thing that shuffles. */
  def propsFieldReport(events: DataFrame): DataFrame = {
    val k = from_json(col("props"), StructType(Seq(StructField("k", LongType))))
      .getField("k")
    events
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (count(lit(1)) - count(col("k"))).as("n_missing_k"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type"))
  }
}
