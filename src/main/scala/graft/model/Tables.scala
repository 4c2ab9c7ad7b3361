package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical table access for the engine.
  *
  * The reference applied its schema at the source boundary (a fixed typed
  * projection over a schemaless store — `YoutubeDataset_loader_final.py:16-53`,
  * re-asserted per job `YoutubeNetworkAgg_Final.py:68-77`). Here the analogue is
  * schema-on-read parquet: one canonical scan per table, letting Catalyst push
  * projections and predicates into the columnar reader (the Spark-native form of
  * the reference's manual `.select(...)` pushdown, `PageRank_Spark_v5.py:51-58`).
  *
  * At 100 TB the scan IS the query cost: every operator downstream must let
  * column pruning / predicate pushdown reach this reader, so nothing here
  * caches or materializes eagerly.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
