package graft.ops

import graft.Tier.PinOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operators — SURVEY.md §2.4 (A1–A11).
  *
  * All of these are single hash-aggregate shapes: Catalyst plans them as
  * partial (map-side) + final aggregate, so at cluster scale the shuffle
  * carries one row per (partition × group), not per input row. Group columns
  * here are low-cardinality (flags, buckets, categories), which is exactly the
  * shape that scales to 100 TB — the reduction happens before the exchange.
  *
  * Determinism conventions (needed for the DuckDB-oracle hash compare):
  *   - double SUMs go through decimal so the result is exact and independent
  *     of partition/accumulation order (`dsum`);
  *   - double AVG/STDDEV are rounded to 4 decimals (`r4`) — accumulation-order
  *     float noise is far below 1e-4 at our scales;
  *   - every query ends in a total ORDER BY with a unique tiebreaker.
  */
object Aggregations {

  /** Order-independent exact sum of a 2-decimal money column: per-row cast to
    * decimal is identical in Spark and DuckDB, and decimal addition is exact,
    * so partial-aggregation order can't change the result. Re-cast to double
    * for a stable output schema. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Round a float aggregate for oracle comparison. */
  def r4(c: Column): Column = round(c, 4)

  /** A3 — the flagship multi-aggregate group-by (the reference's category
    * stats: `YoutubeNetworkAgg_Final.py:163-179`, `run_netagg_job.py:82-97`):
    * count / avg / max / avg / avg per group, ordered by count desc.
    * TPC-H shape: stats per (l_returnflag, l_linestatus). */
  def categoryStats(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("num_items"),
        r4(avg(col("l_quantity"))).as("avg_qty"),
        max(col("l_extendedprice")).as("max_price"),
        r4(avg(col("l_extendedprice"))).as("avg_price"),
        r4(avg(col("l_discount"))).as("avg_disc"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("num_items").desc, col("l_returnflag"), col("l_linestatus"))

  /** A4 — derived-bucket group-by (the reference's length buckets, boundaries
    * 240/1200 s: `YoutubeNetworkAgg_Final.py:185-205`). Bucket by l_quantity:
    * short <10, medium 10–24, long ≥25; count/avg/max per bucket. The when
    * chain is evaluated map-side inside whole-stage codegen; the aggregate
    * shuffles only 3 groups. */
  def quantityBuckets(lineitem: DataFrame): DataFrame =
    lineitem
      .withColumn("qty_bucket",
        when(col("l_quantity") < 10, "short")
          .when(col("l_quantity") < 25, "medium")
          .otherwise("long"))
      .groupBy(col("qty_bucket"))
      .agg(
        count(lit(1)).as("num_items"),
        r4(avg(col("l_extendedprice"))).as("avg_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy(col("qty_bucket"))

  /** A5 — 5-way bucket count (the reference's view buckets <1k…≥1M:
    * `YoutubeNetworkAgg_Final.py:226-239`) over o_totalprice. */
  def priceBuckets(orders: DataFrame): DataFrame =
    orders
      .withColumn("price_bucket",
        when(col("o_totalprice") < 50000, "lt_50k")
          .when(col("o_totalprice") < 100000, "50k_100k")
          .when(col("o_totalprice") < 200000, "100k_200k")
          .when(col("o_totalprice") < 400000, "200k_400k")
          .otherwise("ge_400k"))
      .groupBy(col("price_bucket"))
      .agg(count(lit(1)).as("num_orders"))
      .orderBy(col("price_bucket"))

  /** A6 — global (grand-total) multi-aggregate
    * (`YoutubeNetworkAgg_Final.py:214-221`): count, avg, stddev, median, p90,
    * max over one column. Uses exact `percentile` (Spark) ≡ `quantile_cont`
    * (DuckDB); the reference used percentile_approx — at 100 TB the approx
    * sketch is the right call, so [[globalStatsApprox]] keeps that variant
    * (invariant-tested, not hash-compared). Single-row result: partial
    * aggregates reduce each partition to one buffer, the final reduce is
    * O(partitions). */
  def globalStats(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      count(lit(1)).as("num_items"),
      r4(avg(col("l_extendedprice"))).as("avg_price"),
      r4(stddev(col("l_extendedprice"))).as("stddev_price"),
      // one percentile buffer for both quantiles — the exact-percentile
      // aggregate holds every value, so doubling the buffers doubled the cost
      expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ps"),
      max(col("l_extendedprice")).as("max_price"))
    .select(col("num_items"), col("avg_price"), col("stddev_price"),
      r4(element_at(col("ps"), 1)).as("median_price"),
      r4(element_at(col("ps"), 2)).as("p90_price"),
      col("max_price"))

  /** A6 at scale — the reference's actual choice (`percentile_approx`,
    * `YoutubeNetworkAgg_Final.py:218-219`): a mergeable quantile sketch whose
    * memory is bounded by accuracy, not cardinality. This is the variant to
    * run at 100 TB; exact percentile holds all values per partition. */
  def globalStatsApprox(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      count(lit(1)).as("num_items"),
      r4(avg(col("l_extendedprice"))).as("avg_price"),
      r4(stddev(col("l_extendedprice"))).as("stddev_price"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("median_price"),
      percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000)).as("p90_price"),
      max(col("l_extendedprice")).as("max_price"))

  /** A7 — histogram of an aggregate (the reference's degree histogram,
    * `YoutubeNetworkAgg_Final.py:116-119`): items-per-order distribution.
    * Two chained hash aggregates; the second one's input is already tiny. */
  def itemsPerOrderHistogram(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("items"))
      .groupBy(col("items")).agg(count(lit(1)).as("num_orders"))
      .orderBy(col("items"))

  /** A9 — distinct + limit (`run_alsrecs_job.py:102`). Hash-aggregate
    * distinct on the two low-cardinality flag columns. Deterministic order
    * instead of bare limit so the result is stable. */
  def distinctFlags(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** A10 — de-dup by key (`dropDuplicates(["id"])`,
    * `PageRank_Spark_v5.py:73`). Spark's dropDuplicates keeps an arbitrary
    * row per key (first seen per partition order), which is not stable across
    * runs/engines — so the engine's canonical dedup is "min row per key",
    * a deterministic first-row-wins: one hash aggregate, same cost. */
  def dedupOrdersByCustomer(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_custkey"))
      .agg(
        min(col("o_orderkey")).as("o_orderkey"),
        min(col("o_orderdate")).as("first_orderdate"))
      .orderBy(col("o_custkey"))

  /** A11 — re-nest: group + first + collect_list
    * (`run_alsrecs_job.py:142-145`). `first` is order-sensitive, so the
    * deterministic engine form is min + sort_array(collect_list) — same
    * single-aggregate plan, stable output. */
  def renestOrderParts(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        min(col("l_suppkey")).as("first_supp"),
        sort_array(collect_list(col("l_partkey"))).as("parts"))
      .orderBy(col("l_orderkey"))

  /** Beyond the reference (it has no grouping sets — SURVEY §2.4 note):
    * ROLLUP over the flag hierarchy, the standard subtotal report. Catalyst
    * expands the rollup into one Expand + hash aggregate — a single
    * shuffle regardless of level count. */
  def rollupStats(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("num_items"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CUBE over (returnflag, linestatus): all four grouping combinations in
    * one Expand + single-shuffle hash aggregate (same plan family as
    * [[rollupStats]]). `gid` is Spark's `grouping_id` — bit i set when
    * grouping column i is rolled up — matching SQL `GROUPING(a, b)`
    * bit-for-bit, so the oracle compares it directly. Rolled-up labels
    * surface as "ALL" to keep the output null-free and sortable. */
  def cubeStats(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("num_items"), dsum(col("l_extendedprice")).as("sum_price"),
        grouping_id().cast("bigint").as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("gid"), col("num_items"), col("sum_price"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** Winsorization report — per-group p05/p95 clipping, the standard
    * outlier-robust cleaning pass before a numeric column feeds training.
    * One grouped percentile aggregate (a single buffer holds both
    * quantiles), broadcast back onto the facts (group count is dimension-
    * sized), then boundary counts + the clipped mean. Clipped values are
    * rounded to cents before the decimal-exact sum, so the mean is
    * accumulation-order-free and cross-engine deterministic.
    *
    * State guard: the EXACT percentile aggregate buffers every value of a
    * group in memory — unbounded per-group state at corpus scale. Above
    * `maxExactRows` input rows the quantiles switch to the mergeable
    * `percentile_approx` sketch (memory bounded by the accuracy knob, not
    * cardinality) — the same exact-oracle/approx-scale pairing as
    * [[globalStats]]/[[globalStatsApprox]]. The exact form remains the
    * hash-matched oracle twin (q_winsorize); the forced-approx form is
    * gated rows-only (q_winsorize_approx) with its accuracy pinned against
    * the exact quantiles in AggregationsSpec, per SURVEY §5. */
  def winsorizedPriceStats(orders: DataFrame,
                           lo: Double = 0.05, hi: Double = 0.95,
                           maxExactRows: Long = 10000000L): DataFrame = {
    val exact = orders.count() <= maxExactRows
    val pctAgg =
      if (exact) expr(s"percentile(o_totalprice, array(${lo}D, ${hi}D))")
      else expr(s"percentile_approx(o_totalprice, array(${lo}D, ${hi}D), 10000)")
    val pct = orders.groupBy(col("o_orderpriority"))
      .agg(pctAgg.as("ps"))
      .select(col("o_orderpriority"),
        element_at(col("ps"), 1).as("p_lo"), element_at(col("ps"), 2).as("p_hi"))
    val clipped = least(greatest(col("o_totalprice"), col("p_lo")), col("p_hi"))
    orders.join(broadcast(pct), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        round(first(col("p_lo")), 4).as("p_lo"),
        round(first(col("p_hi")), 4).as("p_hi"),
        sum(when(col("o_totalprice") < col("p_lo"), 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("o_totalprice") > col("p_hi"), 1L).otherwise(0L)).as("n_clipped_hi"),
        round(sum(round(clipped, 2).cast("decimal(18,2)")).cast("double")
          / count(lit(1)), 4).as("mean_winsorized"))
      .orderBy(col("o_orderpriority"))
  }

  /** Driver-gated promise audit for the sketch branch of
    * [[winsorizedPriceStats]] — approx quantile values are sketch-
    * implementation-specific, so the gate emits the branch's portable
    * contract per group instead of the raw clip values (which stay pinned
    * against the exact quantiles in AggregationsSpec): the group set and
    * row counts are quantile-impl-independent (oracle recomputes them),
    * the sketch quantiles are ordered, and each sits within `relTol` of
    * the exact per-group percentile (AggregationsSpec's bound: wide
    * because exact interpolates where the sketch returns a member value —
    * on sparse fixture tails that gap dominates; at corpus scale the
    * sketch error is ~1/accuracy). */
  def winsorizeApproxAudit(orders: DataFrame, lo: Double = 0.05,
                           hi: Double = 0.95,
                           relTol: Double = 0.15): DataFrame = {
    val exact = winsorizedPriceStats(orders, lo, hi)
      .select(col("o_orderpriority"), col("n"),
        col("p_lo").as("x_lo"), col("p_hi").as("x_hi"))
    val approx = winsorizedPriceStats(orders, lo, hi, maxExactRows = 0L)
      .select(col("o_orderpriority"), col("n").as("n_approx"),
        col("p_lo"), col("p_hi"))
    exact.join(approx, Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("n"),
        (col("n_approx") === col("n") && col("p_lo") <= col("p_hi") &&
          abs(col("p_lo") - col("x_lo")) / col("x_lo") < lit(relTol) &&
          abs(col("p_hi") - col("x_hi")) / col("x_hi") < lit(relTol))
          .as("quantiles_ok"))
      .orderBy(col("o_orderpriority"))
  }

  /** Decile report over the document quality score — rank bucketing, the
    * complement of the fixed-boundary bucket queries (A4/A5). NOT a global
    * NTILE window (that moves the whole corpus through one sorted
    * partition): the nine cut points come from one exact-percentile
    * aggregate, broadcast back, and bucketing is a map-side comparison
    * chain. Ties land in one decile together (cut-point semantics, unlike
    * NTILE's even split), which is what a reproducible quality gate wants.
    * Empty deciles (heavy ties) are simply absent from the report. */
  def qualityDeciles(documents: DataFrame): DataFrame = {
    val ps = (1 to 9).map(_ / 10.0).mkString("array(", "D, ", "D)")
    val scored = graft.text.TextAnalysis.qualityScores(documents)
    val cuts = scored.agg(expr(s"percentile(quality_score, $ps)").as("cuts"))
    val decile = (1 to 9).foldLeft(lit(1L)) { (acc, k) =>
      acc + when(col("quality_score") > element_at(col("cuts"), k), 1L).otherwise(0L)
    }
    scored.crossJoin(broadcast(cuts))
      .withColumn("decile", decile)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality_score")).as("min_score"),
        max(col("quality_score")).as("max_score"))
      .orderBy(col("decile"))
  }

  /** Per-source distribution-drift report — PSI (population stability
    * index, the standard drift monitor) of each source's quality-score
    * distribution against the whole corpus, over the corpus's own decile
    * bins (the [[qualityDeciles]] cut-point machinery): PSI_s =
    * Σ_bins (p′ − q′)·ln(p′/q′) with p = source share in the bin, q =
    * corpus share, both floored at `eps` so empty bins stay finite.
    * PSI < 0.1 reads "stable", 0.1–0.25 "moderate drift", > 0.25 "major" —
    * the triage thresholds monitoring pipelines apply per ingest source.
    *
    * Scale shape: one score scan, one exact-percentile aggregate for the
    * cuts (the winsorize-style approx twin is the documented swap at
    * corpus scale), then counts over (source × decile) — a bins·sources
    * sized frame; the corpus is aggregated once and never joined wide. */
  def sourceDriftReport(documents: DataFrame, eps: Double = 1e-4): DataFrame = {
    val ps = (1 to 9).map(_ / 10.0).mkString("array(", "D, ", "D)")
    val scored = graft.text.TextAnalysis.qualityScores(documents)
      .select(col("doc_id"), col("quality_score"))
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
    val cuts = scored.agg(expr(s"percentile(quality_score, $ps)").as("cuts"))
    val decile = (1 to 9).foldLeft(lit(1L)) { (acc, k) =>
      acc + when(col("quality_score") > element_at(col("cuts"), k), 1L).otherwise(0L)
    }
    // slim (source, decile) tier read by the corpus and per-source counts
    val binned = scored.crossJoin(broadcast(cuts))
      .select(col("source"), decile.as("decile"))
      .pinTier
    val corpus = binned.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_bin"))
    val corpusShares = corpus.crossJoin(
        broadcast(corpus.agg(sum(col("n_bin")).as("n_total"))))
      .select(col("decile"), (col("n_bin") / col("n_total")).as("q"))
    val sources = binned.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val perCell = binned.groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n_sd"))
    val pCol = greatest(coalesce(col("n_sd"), lit(0L)) / col("n_docs"), lit(eps))
    val qCol = greatest(col("q"), lit(eps))
    sources.crossJoin(broadcast(corpusShares))
      // perCell is (source × decile)-sized; broadcast the right side of
      // the left outer instead of sort-merging two tiny frames
      .join(broadcast(perCell), Seq("source", "decile"), "left")
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"),
        round(sum((pCol - qCol) * log(pCol / qCol)), 4).as("psi"))
      .orderBy(col("source"))
  }

  /** Exact distinct count per group (the reference never counts distinct;
    * at 100 TB the approx_count_distinct twin is the right default, kept
    * alongside for the bench). */
  def distinctPartsPerFlag(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        approx_count_distinct(col("l_partkey")).as("n_parts_approx"))
      .orderBy(col("l_returnflag"))

  /** Mergeable-distinct audit: per-group DataSketches HLL sketches whose
    * UNION answers the global distinct question WITHOUT rescanning rows —
    * the re-aggregation shape 100 TB demands (daily sketches roll up to a
    * monthly distinct in one sketch merge; a second countDistinct pass over
    * the raw data does not). The '*' row's estimate comes only from
    * hll_union_agg over the per-group sketches, so the gate checks the
    * merge path specifically, not just per-group estimation.
    *
    * Promise gate (the q_recall_audit pattern): sketch estimates are
    * engine-specific, so the emitted columns are the EXACT counts (oracle-
    * recomputable) plus `ok` = estimate within `eps` relative error — the
    * oracle re-derives n_exact and pins the promise, never the estimate.
    * Default lgK=12 gives ~1.6% standard error; eps=0.05 is ~3 sigma.
    * The exact counts exist here as the audit baseline; production rolls
    * up sketches alone. */
  def distinctSketchAudit(lineitem: DataFrame, eps: Double = 0.05): DataFrame = {
    val perGroup = lineitem
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"),
        countDistinct(col("l_partkey")).as("n_exact"))
    val groups = perGroup.select(col("l_returnflag").as("scope"),
      col("n_exact"), hll_sketch_estimate(col("sk")).as("est"))
    val global = perGroup.agg(hll_union_agg(col("sk")).as("sk"))
      .crossJoin(lineitem.agg(countDistinct(col("l_partkey")).as("n_exact")))
      .select(lit("*").as("scope"), col("n_exact"),
        hll_sketch_estimate(col("sk")).as("est"))
    groups.unionByName(global)
      .select(col("scope"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <= col("n_exact") * lit(eps)).as("ok"))
      .orderBy(col("scope"))
  }

  /** A1 (intent) — group-by key + sum, then top-K by the sum
    * (`Top_K_Final.py:13-17`; the reference's version had a latent bug
    * grouping by a nonexistent field — we implement the intent, see
    * SURVEY.md §7.4.6). */
  def topPartsByQuantity(lineitem: DataFrame, k: Int): DataFrame =
    lineitem
      .groupBy(col("l_partkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .orderBy(col("total_qty").desc, col("l_partkey"))
      .limit(k)
}
