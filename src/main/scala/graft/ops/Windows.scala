package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic window functions (north-star scope — the reference has no window
  * functions at all, SURVEY.md §2.4: ranking is global sort+limit and rank
  * numbers are assigned driver-side; here the per-entity history analytics a
  * production pipeline derives from fact tables).
  *
  * One shuffle on the partition key; every frame below is a running or
  * fixed-width ROWS frame, which Spark evaluates in a single sorted pass per
  * partition — no per-row rescans. Partition cardinality = customers, so the
  * shuffle is as wide as the key space and AQE can coalesce/split it.
  */
object Windows {

  /** Per-customer order history: days since the previous order (lag),
    * running lifetime spend, and a 3-order moving average of spend.
    *
    * Money math follows the engine's oracle-determinism rule: sums
    * accumulate as decimal(18,2) (exact, order-insensitive) and only the
    * final division happens in double (IEEE — bit-identical across
    * engines). Ordering inside a customer is (date, orderkey): unique, so
    * the frame contents are deterministic. */
  def customerOrderGaps(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last3 = w.rowsBetween(-2, Window.currentRow)
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_date")).cast("bigint"))
      .withColumn("order_seq", row_number().over(w).cast("bigint"))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(running).cast("double"))
      .withColumn("mavg3_spend",
        round(sum(col("o_totalprice").cast("decimal(18,2)")).over(last3).cast("double")
          / count(lit(1)).over(last3), 4))
      .select(col("o_custkey"), col("o_orderkey"), col("order_seq"), col("gap_days"),
        col("running_spend"), col("mavg3_spend"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }
}
