package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column data-profile report — the first thing a lake operator runs
  * against an unfamiliar (or freshly landed) table: row count, null
  * count/rate, exact distinct cardinality, and numeric min/max per column,
  * long-form (one row per column) so the report is oracle-hashable and
  * joins against catalogs/expectation tables.
  *
  * Scale shape: ONE aggregate pass over the table — every per-column
  * statistic is a column of the same single-row aggregate, and the
  * long-form pivot explodes that one row, so the table is scanned exactly
  * once. The exact multi-column distinct uses Spark's Expand (one input
  * row fans out to |cols| aggregation streams): the right exact-tier cost
  * at report scale, while a 100 TB profile swaps `count_distinct` for
  * `approx_count_distinct` (same plan minus the Expand) — the documented
  * sketch twin, same rule as vocabulary/vocabularyApprox.
  */
object Profiling {

  def profile(df: DataFrame): DataFrame = {
    val numeric: Set[DataType] =
      Set(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        count_distinct(c).as(s"${f.name}__distinct")) ++
        (if (numeric.contains(f.dataType)) Seq(
          min(c).cast("double").as(s"${f.name}__min"),
          max(c).cast("double").as(s"${f.name}__max"))
        else Nil)
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs.toIndexedSeq: _*)
    val perCol = df.schema.fields.map { f =>
      val hasMinMax = numeric.contains(f.dataType)
      struct(
        lit(f.name).as("column_name"),
        lit(f.dataType.simpleString).as("data_type"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__distinct").as("n_distinct"),
        (if (hasMinMax) col(s"${f.name}__min") else lit(null).cast("double"))
          .as("min_value"),
        (if (hasMinMax) col(s"${f.name}__max") else lit(null).cast("double"))
          .as("max_value"))
    }
    one
      .select(col("n_rows"), explode(array(perCol.toIndexedSeq: _*)).as("p"))
      .select(col("p.column_name"), col("p.data_type"), col("n_rows"),
        col("p.n_nulls"),
        round(col("p.n_nulls") / col("n_rows"), 4).as("null_rate"),
        col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
      .orderBy(col("column_name"))
  }

  /** Benford first-digit audit — the data-forensics screen for fabricated
    * or synthetic numeric columns: naturally occurring multi-magnitude
    * amounts follow log10(1 + 1/d) first-digit frequencies; uniform or
    * hand-made data does not. Digit extraction avoids float logarithms
    * entirely (log10 at power-of-10 boundaries differs per libm): amounts
    * become exact integer CENTS (the decimal-money rule) and the first
    * digit is the first character of the integer's decimal rendering —
    * identical in every engine. Exclusion happens on the CENTS (`>= 1`),
    * not the raw value: an amount in (0, 0.005) is positive but rounds to
    * zero cents, and a digit-0 row would divide by zero in the reference
    * share (engine-divergent: null under non-ANSI Spark, error elsewhere).
    *
    * Scale shape: one map-side digit projection + one 9-row aggregate;
    * the share denominator is a window total over the SAME 9-row
    * aggregate (no second scan of the input, no pinned tier). */
  def benfordReport(df: DataFrame, valueCol: String): DataFrame = {
    val all = Window.partitionBy()
    df.select(floor(col(valueCol) * 100 + 0.5).cast("bigint").as("cents"))
      .filter(col("cents") >= 1)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs") / sum(col("n_obs")).over(all), 4).as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 4).as("benford_share"))
      .withColumn("excess", round(col("share") - col("benford_share"), 4))
      .orderBy(col("digit"))
  }

  /** k-anonymity audit over a quasi-identifier combination — the
    * re-identification risk check run before a dataset leaves the
    * boundary: rows whose quasi-identifier combo is shared by fewer than
    * `k` rows are individually distinguishable. Long-form per-combo
    * output (values, group size, risk verdict) so the risky combos are
    * actionable, not just counted; the [[profile]] of privacy.
    *
    * Scale shape: ONE hash aggregate on the quasi-identifier tuple —
    * combo cardinality output, map-combined; the verdict is a column
    * comparison on the published count (recomputable from the row). */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1,
      s"kAnonymity: need quasi columns and k >= 1, got $quasiCols / $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("at_risk", col("n_rows") < k)
      .orderBy(quasiCols.map(col): _*)
  }

  /** Source-mix diversity — the one-row corpus-health summary of how
    * concentrated the corpus is across a categorical column: Shannon
    * entropy (nats) with its normalized form (fraction of the uniform-mix
    * maximum), and the Simpson concentration Σp² (the probability two
    * random docs share a source — 1/Simpson is the "effective source
    * count"). The number a mixture re-balancer tracks before/after
    * [[Sampling]]'s temperature/target-share passes.
    *
    * Floats follow the decayedPopularity rule: shares come from exact
    * integer counts, each term is one identical IEEE expression per
    * group, and only the Σ of ≤|categories| terms is order-sensitive —
    * published at round-4. Degenerate single-category corpora publish a
    * null normalized entropy (ln 1 = 0 denominator). */
  def diversityReport(df: DataFrame, catCol: String): DataFrame = {
    // total and category count are window totals over the per-category
    // aggregate itself (|categories| rows) — the input is scanned once,
    // with no pinned tier and no second aggregate pass
    val all = Window.partitionBy()
    df.groupBy(col(catCol)).agg(count(lit(1)).as("n"))
      .select(col("n"),
        sum(col("n")).over(all).as("total"),
        count(lit(1)).over(all).as("n_categories"),
        (col("n") / sum(col("n")).over(all)).as("p"))
      .agg(max(col("total")).as("n_rows"),
        max(col("n_categories")).as("n_categories"),
        round(-sum(col("p") * log(col("p"))), 4).as("entropy_nats"),
        round(sum(col("p") * col("p")), 4).as("simpson"))
      .withColumn("norm_entropy",
        when(col("n_categories") > 1,
          round(col("entropy_nats") / log(col("n_categories").cast("double")), 4)))
      .select(col("n_rows"), col("n_categories"), col("entropy_nats"),
        col("norm_entropy"), col("simpson"))
  }

  /** Referential-integrity audit for one child→parent key: child rows,
    * orphans (child keys with no parent row — LEFT ANTI, so null child
    * keys count as orphans, which is what a landed-data audit wants
    * surfaced), and the orphan rate. One labeled row, so several audits
    * union into one FK report.
    *
    * Scale shape: the anti join is a plain equi join on the key — shuffle
    * on both sides at fact×fact scale, broadcast when the parent key set
    * fits (Catalyst's size estimate decides; the parent side is projected
    * to its key column first, so "fits" is keys, not rows). */
  def fkAudit(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String,
              label: String): DataFrame = {
    val orphans = child.select(col(childKey).as("k"))
      .join(parent.select(col(parentKey).as("k")).distinct(), Seq("k"),
        "left_anti")
    child.agg(count(lit(1)).as("n_child"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
      .select(lit(label).as("fk"), col("n_child"), col("n_orphans"),
        round(col("n_orphans") / col("n_child"), 4).as("orphan_rate"))
  }
}
