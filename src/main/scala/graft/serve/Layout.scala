package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data layout for the 100 TB lake: partitioned writes + pruned reads
  * (north-star scope — the reference's storage is a single Mongo collection;
  * a Spark-native corpus lives as date/key-partitioned parquet, and the
  * partition column is the difference between scanning a day and scanning
  * the lake).
  *
  * Two layout levers, composable:
  *   - **Directory partitioning** (`partitionBy`): coarse, low-cardinality
  *     keys (date, source). A filter on the partition column becomes a
  *     `PartitionFilters` entry — pruned directories are never even listed.
  *   - **In-file ordering** (`sortWithinPartitions` before write): fine keys
  *     (user, doc id). Parquet row-group min/max stats become selective, so
  *     point/range reads skip row groups inside the surviving files.
  * Both are asserted in LayoutSpec (the pruned plan shape, not just the
  * row counts).
  */
object Layout {

  /** Write events date-partitioned, rows within each partition sorted by
    * (user_id, ts) so per-user reads touch few row groups. The repartition
    * on the partition column keeps one task per output directory —
    * without it every task writes every date (small-file explosion:
    * tasks × dates files). */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      // event_date leads the sort: Spark's planned-write inserts its own
      // local sort on the partition column otherwise, which would both
      // re-sort every partition and void the (user_id, ts) ordering
      .repartition(col("event_date"))
      .sortWithinPartitions(col("event_date"), col("user_id"), col("ts"))
      .write.partitionBy("event_date").mode("overwrite").parquet(path)

  /** Read one day back: the date predicate must show up as a partition
    * filter (directory pruning), not a data filter. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("event_date") === lit(day))
}
