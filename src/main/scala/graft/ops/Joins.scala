package graft.ops

import graft.Tier.PinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join operators — SURVEY.md §2.3 (J1–J3, S9).
  *
  * Join-strategy policy for 100 TB: dimension tables (part, supplier,
  * customer, nation, region — and any top-K result) are broadcast so the fact
  * scan never shuffles; only fact-to-fact joins (the co-occurrence self-join
  * in graph.Edges) shuffle, and those shuffle on their join key so AQE can
  * split skewed partitions. The reference's driver-side `find_one` loop
  * (`run_pagerank_job.py:124-140`) — K network round-trips — becomes a single
  * broadcast hash join here.
  */
object Joins {

  /** J2 — dimension-lookup star join (`run_alsrecs_job.py:138-139`): fact
    * lineitem joined to two dims, then aggregated. Both dims fit in a
    * broadcast at any realistic scale (part/supplier grow ~linearly but stay
    * 1000× smaller than lineitem; at true 100 TB part may exceed the
    * broadcast threshold and Catalyst falls back to shuffled hash join on its
    * own — the hint is advisory). */
  def brandRevenue(lineitem: DataFrame, part: DataFrame, supplier: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part), lineitem("l_partkey") === part("p_partkey"))
      .join(broadcast(supplier), lineitem("l_suppkey") === supplier("s_suppkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("num_items"),
        Aggregations.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("p_brand"))

  /** Enrich a k-row result with an unbounded dimension, with every broadcast
    * bounded by k. A left-outer join preserving the k-row side can only
    * broadcast the dimension (the build side must be the non-preserved
    * side), and broadcasting an unbounded dimension is a driver OOM at
    * scale. So: (1) broadcast the k keys as a left-semi prune into the dim
    * scan — at any dim size this caps the dim side at ≤k rows; (2) broadcast
    * that pruned dim into the preserved left join. Two broadcasts, both
    * O(k); the dim table itself is only ever scanned, never collected.
    * The k-row side is pinned (eager localCheckpoint) so its plan — often an
    * expensive upstream like a PageRank fixpoint — runs once, not once per
    * use. */
  def enrichWithPrunedDim(small: DataFrame, dim: DataFrame, key: String): DataFrame = {
    val pinned = small.pinTier
    val pruned = dim.join(broadcast(pinned.select(col(key)).distinct()), Seq(key), "left_semi")
    pinned.join(broadcast(pruned), Seq(key), "left")
  }

  /** Anti join — entities with no matching facts (customers with no order
    * in a given year). Catalyst plans left_anti as a broadcast/shuffled hash join
    * with early-out probing: the fact side is only ever hashed on its join
    * key projection, never materialized wide. The reference has no semi/anti
    * joins (SURVEY.md §2.3); a data pipeline needs them constantly
    * (orphan detection, holdout construction). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame, inYear: Int): DataFrame =
    customer
      .join(orders.filter(year(col("o_orderdate")) === inYear)
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Semi join — entities with at least one qualifying fact (parts that ever
    * shipped in bulk). The filter is pushed below the join, so the fact scan
    * prunes to (l_partkey, l_quantity) and the semi join stops at first
    * match per key — no fact-side aggregation or distinct. */
  def partsWithBulkShipments(part: DataFrame, lineitem: DataFrame, minQty: Int): DataFrame =
    part
      .join(lineitem.filter(col("l_quantity") >= minQty)
          .select(col("l_partkey").as("p_partkey")),
        Seq("p_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      .orderBy(col("p_partkey"))

  /** Set operations over keyed extracts (SURVEY.md §2.12: the reference has
    * none) — churn analysis: customers active in year A but gone in year B,
    * and the loyal intersection. EXCEPT/INTERSECT plan as aggregate-free
    * left-anti / left-semi joins over distinct keys — same scale shape as
    * the joins above. */
  def customerChurn(orders: DataFrame, yearA: Int, yearB: Int): DataFrame = {
    def active(y: Int) = orders
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    val churned = active(yearA).except(active(yearB))
      .select(col("o_custkey"), lit("churned").as("cohort"))
    val retained = active(yearA).intersect(active(yearB))
      .select(col("o_custkey"), lit("retained").as("cohort"))
    churned.unionByName(retained).orderBy(col("cohort"), col("o_custkey"))
  }

  /** S9/J3 — point lookup as a broadcast join: enrich a small top-K result
    * with dimension attributes (replaces the reference's per-row
    * `find_one` loop, `PageRank_Spark_v5.py:148-156`). The top-K side is 20
    * rows; [[enrichWithPrunedDim]] keeps both broadcasts at 20 rows no
    * matter how large customer grows. */
  def enrichTopOrders(orders: DataFrame, customer: DataFrame, k: Int): DataFrame = {
    val top = TopK.topOrdersByPrice(orders, k)
    enrichWithPrunedDim(top,
      customer.select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_mktsegment")),
      "o_custkey")
      .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }
}
