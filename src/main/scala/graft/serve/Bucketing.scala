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

  /** Align a frame with a table's bucket scheme before a bucketed
    * write — THE shared rule for every bucketed write in the library
    * (inverted-index build/admit, shingle tier, this object). Spark's
    * bucketed writer does NOT repartition: every incoming task writes
    * its own file per bucket it holds rows for, so a write fed by P
    * shuffle partitions emits up to P×buckets files — at the ×32
    * campaign setting (P=1024) one admission left ~32k small files and
    * compaction became file-metadata I/O, not data (BENCH_SF32_r14
    * watch item, fixed r15). One explicit hash repartition on the
    * bucket column with numPartitions = buckets uses the SAME Murmur3
    * `pmod(hash(col), buckets)` placement as the bucket spec, so each
    * task holds exactly one bucket and the write emits ONE sorted file
    * per bucket at ANY shuffle-partition setting. Cost: one
    * input-sized shuffle. `buckets` thereby becomes the
    * write-parallelism unit — the standard bucketed-table sizing rule
    * (size buckets ∝ corpus). */
  def bucketAligned(df: DataFrame, buckets: Int, bucketCol: String): DataFrame =
    df.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))

  /** One-time bucketed materialization (bucketBy requires the table
    * catalog; `path` keeps the data external-table style); write
    * aligned via [[bucketAligned]]. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, numBuckets: Int): Unit =
    bucketAligned(df, numBuckets, key)
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
