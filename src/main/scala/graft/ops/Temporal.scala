package graft.ops

import graft.Tier.PinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators (north-star scope — the reference is batch-only
  * with no time axis; these are the joins a large-scale event/training-data
  * pipeline needs that plain equi-joins can't express).
  *
  * Both operators are built on the shapes that survive 100 TB:
  *   - [[asofJoin]] is the union–merge pattern: tag both sides, union, one
  *     window pass per key. One shuffle on the key, zero range expansion —
  *     the naive formulation (inequality join + max) explodes to
  *     |left|×|right| pairs per key before aggregating.
  *   - [[timeProximityPairs]] is the bucketed band join: quantize time into
  *     `windowSec` buckets, replicate the right side into its 3 adjacent
  *     buckets, equi-join on (key, bucket), then apply the exact band
  *     predicate. The join is an equi hash join AQE can plan and skew-split;
  *     candidate count is bounded by real temporal locality instead of
  *     |left|×|right| per key.
  */
object Temporal {

  /** As-of join: for every left row, attach the single most recent right row
    * with `right.ts <= left.ts` and the same key (the standard "latest state
    * at event time" lookup). Right rows must be unique per (key, ts) —
    * pre-aggregate to enforce (deterministic output; ties inside a timestamp
    * have no defined "latest").
    *
    * Implementation: tag sides, union, and take `last(right, ignoreNulls)`
    * over a (key, ts, side) window — right sorts before left at equal ts, so
    * a right row at exactly left.ts is visible (>= semantics, matching SQL
    * ASOF JOIN). Left rows with no prior right row keep nulls (LEFT ASOF). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val rStruct = StructType(right.schema.filterNot(f => f.name == key))
    val lStruct = StructType(left.schema)
    val tagged = left
      .select(col(key), col(ts).as("_t"), lit(1).as("_side"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("_l"),
        lit(null).cast(rStruct).as("_r"))
      .unionByName(right
        // null-timestamp right rows can never be "the latest state at or
        // before t" (SQL ASOF: a NULL comparison never matches) — and under
        // nulls-first ordering they would otherwise win for early left rows
        .filter(col(ts).isNotNull)
        .select(col(key), col(ts).as("_t"), lit(0).as("_side"),
          lit(null).cast(lStruct).as("_l"),
          struct(right.columns.toIndexedSeq.filterNot(_ == key).map(col): _*).as("_r")))
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*") +:
        rStruct.fieldNames.toSeq.map(f =>
          col(s"_match.$f").as(s"asof_$f")): _*)
  }

  /** Band (time-proximity) join: all (left, right) pairs with the same key
    * and |left.ts − right.ts| ≤ windowSec, compared in exact microseconds
    * (sub-second event timestamps make whole-second comparison lossy).
    * Each right row is replicated into its own and both neighboring buckets,
    * so every qualifying pair meets in exactly one equi-join bucket — no
    * duplicates, no distinct needed. */
  def timeProximityPairs(left: DataFrame, right: DataFrame, key: String,
                         windowSec: Int, ts: String = "ts"): DataFrame = {
    val usec = windowSec * 1000000L
    val lb = left
      .withColumn("_lus", unix_micros(col(ts)))
      .withColumn("_b", floor(col("_lus") / usec))
    val rb = right
      .withColumn("_rus", unix_micros(col(ts)))
      .withColumn("_b", explode(array(
        floor(col("_rus") / usec) - 1,
        floor(col("_rus") / usec),
        floor(col("_rus") / usec) + 1)))
      .drop(ts)
    lb.join(rb, Seq(key, "_b"))
      .filter(abs(col("_lus") - col("_rus")) <= usec)
      // public shape: the pair's time delta is part of the API; the bucket
      // and epoch internals are not. Shared non-key column names must be
      // pre-renamed by the caller, as for any self-join.
      .withColumn("dt_us", col("_lus") - col("_rus"))
      .drop("_b", "_lus", "_rus")
  }

  /** Daily activity + stickiness — the DAU/WAU dashboard stat: per day,
    * distinct active users, distinct users over the trailing 7 days
    * (inclusive), and stickiness = dau/wau (the engagement ratio product
    * teams track; 1/7 = "once a week" floor, 1.0 = daily habit).
    *
    * Scale shape: the event log reduces once to the (user, day) distinct
    * tier (user×day cardinality); the trailing-window distinct is a range
    * join of that tier against the DAY GRID — a calendar-bounded handful
    * of rows that broadcasts, so the non-equi join never touches two big
    * sides. */
  def activityReport(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .pinTier // read by the grid, dau, and the range join
    val days = ud.select(col("day")).distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = broadcast(days.select(col("day").as("d")))
      .join(ud, col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy(col("d")).agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("day") === col("d"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau"), 4).as("stickiness"))
      .orderBy(col("day"))
  }

  /** Weekly retention cohorts — the other classic event-sequence report:
    * users grouped by the week they were first seen (Monday-truncated,
    * identical in Spark and DuckDB), counted as retained in week-offset k
    * when they have ANY event in cohort-week + k. Retention is the share
    * of the cohort active at each offset (offset 0 is 1.0 by
    * construction — a useful self-check the oracle pins for free).
    *
    * Scale shape: one aggregate for first-seen, one distinct over
    * (user, week) — both user/week-cardinality — a user-keyed join, and
    * the cohort-sized final aggregate. No window functions, no event-log
    * self-join. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
      .pinTier // read by the activity join and cohort sizes
    val active = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val sizes = firstSeen.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_users"))
    active.join(firstSeen, Seq("user_id"))
      .select(col("cohort"),
        floor(datediff(col("wk"), col("cohort")) / 7).cast("bigint").as("week_offset"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("week_offset"), col("n_active"),
        round(col("n_active") / col("cohort_users"), 4).as("retention"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  /** Last-touch conversion attribution — the marketing-analytics
    * complement of the first-touch funnel: each conversion event is
    * credited to the user's most recent qualifying touch event within the
    * lookback window, or to "direct" when none exists. Output per
    * attributed touch type: conversions and decimal-exact revenue.
    *
    * Single-pass design (no event self-join): one window over the
    * user-keyed timeline carries the latest touch forward
    * (`last(..., ignoreNulls)` over rows-unbounded-preceding), with a
    * (ts, is-conversion, event_id) total order so a touch at the exact
    * conversion timestamp counts and ties are engine-independent — the
    * same merge trick as [[asofJoin]], on one table.
    *
    * Scale shape: one shuffle on user_id for the window, then a
    * touch-type-sized aggregate. The window state is one struct per user,
    * never a buffered partition. */
  def lastTouchAttribution(events: DataFrame, conversion: String,
                           touches: Seq[String],
                           lookbackSec: Long): DataFrame = {
    require(touches.nonEmpty && !touches.contains(conversion),
      "touch types must be non-empty and distinct from the conversion type")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("_conv").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type") === conversion || col("event_type").isin(touches: _*))
      .withColumn("_conv", (col("event_type") === conversion).cast("int"))
      .withColumn("_touch",
        last(when(col("_conv") === 0,
          struct(col("ts").as("t_ts"), col("event_type").as("t_type"))),
          ignoreNulls = true).over(w))
      .filter(col("_conv") === 1)
      .select(
        // exact microsecond compare (unix_micros/epoch_us) — second-level
        // truncation differs between engines on sub-second timestamps
        when(col("_touch").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("_touch.t_ts")) <=
            lookbackSec * 1000000L,
          col("_touch.t_type")).otherwise(lit("direct")).as("attributed_to"),
        col("value"))
      .groupBy(col("attributed_to"))
      .agg(count(lit(1)).as("n_conversions"),
        graft.ops.Aggregations.dsum(col("value")).as("revenue"))
      .orderBy(col("attributed_to"))
  }

  /** Ordered conversion funnel — the classic event-sequence report: for
    * each step k, the users whose EARLIEST step-k event falls strictly
    * after their earliest qualifying step-(k−1) event (first-touch
    * semantics — deterministic, unlike "any matching subsequence" variants
    * whose witness choice is engine-dependent). Output per step: user
    * count and conversion rate from step 1.
    *
    * Scale shape: one user-keyed aggregate per step over a frame that only
    * shrinks (step k joins step k−1's per-user row — user-cardinality,
    * not event-cardinality), each tier pinned for its two readers
    * (next step + count). Step count is a small constant; nothing scans
    * the event log more than once per step and AQE right-sizes the
    * shrinking joins. */
  def funnelReport(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val tiers = steps.zipWithIndex
      .foldLeft(Vector.empty[(String, DataFrame)]) { case (acc, (step, i)) =>
        val ev = events.filter(col("event_type") === step)
          .select(col("user_id"), col("ts"))
        val reached =
          if (i == 0) ev.groupBy(col("user_id")).agg(min(col("ts")).as("t"))
          else ev
            .join(acc.last._2.select(col("user_id"), col("t").as("tp")), Seq("user_id"))
            .filter(col("ts") > col("tp"))
            .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
        acc :+ (step -> reached.pinTier)
      }
    val stepCounts = tiers.zipWithIndex.map { case ((s, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(s).as("event_type"), col("n_users"))
    }.reduce(_ unionByName _)
    val base = stepCounts.filter(col("step") === 1)
      .select(col("n_users").as("n1"))
    stepCounts.crossJoin(broadcast(base))
      .select(col("step"), col("event_type"), col("n_users"),
        round(col("n_users") / greatest(col("n1"), lit(1L)), 4).as("conversion"))
      .orderBy(col("step"))
  }

  /** Exponentially time-decayed popularity per event type — the standard
    * recency-weighted ranking (each event contributes 0.5^(age/halfLife),
    * age measured back from the corpus's latest event so the report is a
    * pure function of the data, not of wall-clock at run time).
    *
    * Scale shape: one max(ts) aggregate broadcast back over the scan (the
    * decile-cuts pattern), then one map-side weight expression and one
    * hash aggregate — two shuffles total at any corpus size, no window.
    * The weighted sum follows the float-agg oracle rule: ages are exact
    * integers (microseconds), pow is evaluated per row identically in both
    * engines, and the Σ of ≤1.0 terms is rounded to 4 decimals so partial
    * aggregation order cannot move the report. */
  def decayedPopularity(events: DataFrame, halfLifeDays: Double = 7.0): DataFrame = {
    val mx = events.agg(max(unix_micros(col("ts"))).as("max_us"))
    events
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .crossJoin(broadcast(mx))
      .select(col("event_type"),
        pow(lit(0.5),
          (col("max_us") - col("us")).cast("double")
            / lit(86400e6 * halfLifeDays)).as("w"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("w")), 4).as("decayed_score"))
      .orderBy(col("decayed_score").desc, col("event_type"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * counts of (event, next event) over each user's timeline and the
    * row-normalized transition probability P(next|cur) — the standard
    * behavioral model behind "what do users do after X" and the input to
    * next-event prediction baselines. Sequence order is (ts, event_id) —
    * the event-id tiebreak makes simultaneous events deterministic, so the
    * report is reproducible cross-engine.
    *
    * Scale shape: ONE window lead per user (the sessionization shuffle,
    * keyed on user_id), then a (|types|²)-sized aggregate joined against
    * its broadcast row totals — after the lead, nothing is
    * event-cardinality. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = pairs.groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("event_type"))
      .agg(sum(col("n")).as("row_total"))
    counts.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("next_type"), col("n"),
        round(col("n") / col("row_total"), 4).as("p"))
      .orderBy(col("event_type"), col("next_type"))
  }

  /** Hourly volume anomalies per event type: z-score of each hour's event
    * count against the trailing 24 OBSERVED hours (row frame, not a range
    * frame — gap hours simply don't exist in an event log; the trailing
    * window is "the last day we actually saw", which is what an on-call
    * alert compares against). Hours with fewer than `minTrailing` prior
    * observations emit a null z (warm-up, no verdict); `is_anomaly` flags
    * |z| ≥ 3 on the ROUNDED mean/stddev (the qualityScores boundary rule:
    * the verdict is recomputable from the published columns).
    *
    * Scale shape: the raw log collapses to (type × hour) rows in one hash
    * aggregate — the window then runs over that tiny frame, partitioned by
    * event type, so the sort is per-type and never sees event-cardinality
    * data. At 100 TB the aggregate is the only full-data pass. */
  def hourlyAnomalies(events: DataFrame, minTrailing: Int = 6): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    val scored = hourly
      .withColumn("n_trailing", count(col("n_events")).over(w))
      .withColumn("mean24", round(avg(col("n_events")).over(w), 4))
      // stddev_samp over ONE row is NaN in Spark but NULL in DuckDB /
      // ANSI; publish the well-defined region only (≥2 observations)
      .withColumn("std24",
        when(count(col("n_events")).over(w) >= 2,
          round(stddev_samp(col("n_events")).over(w), 4)))
    scored
      .select(col("event_type"), col("hour"), col("n_events"),
        col("n_trailing"), col("mean24"), col("std24"),
        when(col("n_trailing") >= minTrailing && col("std24") > 0.0,
          round((col("n_events") - col("mean24")) / col("std24"), 4))
          .as("z_score"))
      .withColumn("is_anomaly",
        coalesce(abs(col("z_score")) >= 3.0, lit(false)))
      .orderBy(col("event_type"), col("hour"))
  }

  /** Daily event-type pivot — the wide activity matrix (one row per day,
    * one count column per event type) dashboards and spreadsheet exports
    * consume. The type list is caller-pinned: a stable report schema must
    * not depend on which types happen to appear in the scanned window
    * (and Spark's values-less `pivot` would pay a driver-side distinct
    * collect to discover them). Unlisted types are ignored; absent
    * (day, type) cells are 0, not null.
    *
    * Scale shape: pivot with pinned values is ONE hash aggregate on the
    * day — each count is a conditional aggregate column, map-combined; no
    * second pass, no transpose shuffle. */
  def dailyTypePivot(events: DataFrame, types: Seq[String]): DataFrame = {
    val day = date_trunc("day", col("ts")).as("day")
    events
      .groupBy(day)
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types) // a cell with no rows pivots to null, not 0
      .select(col("day") +: types.map(t => col(t).as(s"n_$t")): _*)
      .orderBy(col("day"))
  }

  /** Unpivot (melt) of the wide daily matrix back to tidy long form —
    * the inverse reshape, for feeding wide exports back into the
    * aggregate/window operators, which all expect (day, type, n) rows.
    * Built on the native `unpivot` (no explode/struct detour: Catalyst's
    * Expand, one input row fanning out to |types| output rows map-side).
    * Zero cells survive the round trip (they are values, not missing
    * rows); variable order is the pinned column order. */
  def meltDailyPivot(wide: DataFrame, types: Seq[String]): DataFrame =
    wide.unpivot(
        Array(col("day")),
        types.map(t => col(s"n_$t")).toArray,
        "event_type", "n_events")
      .withColumn("event_type",
        regexp_replace(col("event_type"), "^n_", ""))
      .orderBy(col("day"), col("event_type"))

  /** Calendar spine over the event log's own [min, max] day range: one row
    * per day with the date dimensions (dow, week start, month) — the
    * gap-free axis that trend reports and as-of backfills join against (an
    * event-log GROUP BY day silently skips empty days; the spine is what
    * makes them visible as zeros). Generated distributed via
    * sequence+explode from a one-row broadcast of the corpus bounds —
    * never a driver-side range materialization.
    *
    * dow is ISO (Monday=1..Sunday=7, DuckDB's isodow) — Spark's dayofweek
    * is Sunday=1, the one cross-engine calendar trap here. */
  def dateSpine(events: DataFrame): DataFrame = {
    val bounds = events.agg(
      date_trunc("day", min(col("ts"))).as("d0"),
      date_trunc("day", max(col("ts"))).as("d1"))
    bounds
      .select(explode(sequence(col("d0"), col("d1"),
        expr("INTERVAL 1 DAY"))).as("day"))
      .select(col("day"),
        (pmod(dayofweek(col("day")) + lit(5), lit(7)) + lit(1))
          .cast("bigint").as("iso_dow"),
        date_trunc("week", col("day")).as("week_start"),
        date_trunc("month", col("day")).as("month_start"))
      .orderBy(col("day"))
  }

  /** Gap-based sessionization: split each user's timeline into sessions at
    * inactivity gaps > `gapMinutes`, and publish per-session stats — the
    * canonical unit of engagement analytics (session counts, durations,
    * depth) and the batch ground truth a streaming session-window job is
    * checked against. A session boundary opens where the previous event is
    * absent (first event) or more than the gap away; the session index is
    * the running count of boundaries — both exact integer constructions, so
    * the report is reproducible cross-engine. Sequence order is
    * (ts, event_id), the [[eventTransitions]] tiebreak.
    *
    * Scale shape: ONE shuffle on user_id for the window pass; the per-
    * session aggregate groups on (user_id, session_idx), whose clustering
    * is already satisfied by the window's hash partitioning, so Catalyst
    * plans it exchange-free. Nothing downstream of the window sees
    * event-cardinality data except that one map-combined aggregate. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val bounded = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        (col("prev_us").isNull || col("us") - col("prev_us") > gapUs)
          .cast("int"))
      .withColumn("session_idx",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    bounded
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        count_distinct(col("event_type")).as("n_types"),
        ((max(col("us")) - min(col("us"))) / lit(1000000L))
          .cast("long").as("duration_sec"))
      .orderBy(col("user_id"), col("session_idx"))
  }
}
