package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) storage — the shuffle-elimination lever for
  * repeated fact-to-fact joins at scale.
  *
  * The reference hand-repartitioned by join key before its graph build
  * (`PageRank_Spark_v5.py:94-95`) — a per-job shuffle. The durable form of
  * that idea is hash-bucketed storage: write both tables bucketed and
  * sorted by the join key once, and every subsequent equi-join on that key
  * is planned with ZERO Exchange on either side (sort-merge over pre-sorted
  * buckets). At 100 TB, a 600 s shuffle per run becomes a one-time write
  * cost; the test asserts the no-Exchange plan property.
  */
object Bucketing {

  /** One-time bucketed materialization (bucketBy requires the table
    * catalog; `path` keeps the data external-table style). The explicit
    * repartition on the bucket key aligns tasks with buckets (same
    * Murmur3 pmod placement), so the write emits ONE sorted run per
    * bucket instead of up-to-tasks×buckets files — the round-15
    * small-file rule, see `InvertedIndex.bucketAligned`. `numBuckets`
    * is thereby the write-parallelism unit: size it ∝ table. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, numBuckets: Int): Unit =
    df.repartition(numBuckets, org.apache.spark.sql.functions.col(key))
      .write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — co-located, no
    * shuffle on either input when bucket counts match. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the property bucketing buys. (AdaptiveSparkPlanExec is a leaf node:
    * TreeNode.collect does not descend into the AQE-managed subplan, so it
    * must be unwrapped explicitly.) */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.isEmpty
  }

  /** Demo main: bucket lineitem+orders from a fixture dir, run the
    * co-located join, report the shuffle-free property and row count.
    * Usage: runMain graft.serve.Bucketing <sfDir> <workDir> */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val li = graft.model.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val or = graft.model.Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    writeBucketed(li, "li_bucketed", s"$workDir/li", "l_orderkey", 8)
    writeBucketed(or, "or_bucketed", s"$workDir/or", "l_orderkey", 8)
    val joined = colocatedJoin(spark, "li_bucketed", "or_bucketed", "l_orderkey")
    println(s"bucketed-join shuffleFree=${isShuffleFree(joined)} rows=${joined.count()}")
    val plain = li.join(or, Seq("l_orderkey"))
    println(s"plain-join    shuffleFree=${isShuffleFree(plain)} rows=${plain.count()}")
    spark.stop()
  }
}
