package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the MERGE the lake layer needs
  * the moment a dimension (users, channels, sources) mutates between
  * snapshots. The reference rebuilds its Mongo collections wholesale on
  * every load (`YoutubeDataset_loader_final.py` drop-and-append); at
  * 100 TB a dimension rewrite must instead be an incremental merge that
  * PRESERVES history, because training-data lineage questions ("which
  * source config produced this shard?") are always as-of questions.
  *
  * [[scd2Merge]] is the Kimball type-2 form: a change never overwrites —
  * the standing row is expired (`version_to` = batch version,
  * `is_current` = false) and a fresh open row is appended. Open rows
  * carry `version_to` = [[Scd.OpenVersion]] (the DWH high-date sentinel,
  * not NULL: the open-row predicate `version_to = OpenVersion` stays
  * sargable and null-semantics-free in every engine).
  *
  * Scale shape, 100 TB: ONE full-outer shuffle join on the dimension key
  * between the current slice and the batch — history rows pass through
  * untouched (filter, no shuffle), and each joined row emits its 1–2
  * output rows via a codegen'd array-explode, so there is no second pass
  * and no driver-side diffing. The batch side is a snapshot delta
  * (typically ≪ dimension), so AQE will broadcast it when small; the
  * union legs are written in one job. Idempotent: replaying the same
  * batch at the same version finds attrs equal and changes nothing.
  */
object Scd {

  /** Sentinel `version_to` for open (current) rows. */
  val OpenVersion: Long = 999999999L

  /** Type-2 merge of `batch` (key + attrs) into `dim` (key + attrs +
    * `version_from`, `version_to`, `is_current`) at `batchVersion`.
    *
    * Legs, all derived from one full-outer join on `key`:
    *   - dim-only current rows, and matches whose tracked attrs are all
    *     equal: pass through unchanged (the no-op leg);
    *   - matches whose attrs differ: the current row expired at
    *     `batchVersion` PLUS the batch row opened at `batchVersion`;
    *   - batch-only keys: inserted as open rows at `batchVersion`.
    * History rows (`is_current` = false) bypass the join entirely.
    *
    * The batch is key-deduplicated before the join (one arbitrary
    * representative per key, Spark's `dropDuplicates`): a batch carrying
    * the same key twice would otherwise fan out through the full-outer
    * join and emit the current row expired twice plus two simultaneous
    * open rows — silently breaking the one-open-row-per-key invariant.
    * Callers whose batches layer multiple versions of a key must apply
    * them as separate `scd2Merge` calls in version order (a type-2 batch
    * is a snapshot delta; "two versions in one batch" has no well-defined
    * single-merge answer).
    *
    * Output order is NOT defined: ordering is a report/oracle concern and
    * a global sort of the whole dimension inside the operator would be a
    * gratuitous total-order shuffle on every merge at 100 TB. Consumers
    * that want clustering on disk should `sortWithinPartitions` at the
    * write site (see [[ScdTable]]); gates order at the gate.
    */
  def scd2Merge(dim: DataFrame, batch: DataFrame, key: String,
                attrs: Seq[String], batchVersion: Long): DataFrame = {
    require(attrs.nonEmpty, "scd2Merge needs at least one tracked attribute")
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))

    val b = attrs.foldLeft(
      batch.dropDuplicates(key).withColumnRenamed(key, "b_key")) {
      (df, a) => df.withColumnRenamed(a, s"b_$a")
    }
    val joined = current.join(b, col(key) === col("b_key"), "full_outer")

    val inDim = col(key).isNotNull
    val inBatch = col("b_key").isNotNull
    val changed = attrs.map(a => !(col(a) <=> col(s"b_$a"))).reduce(_ || _)

    def rowStruct(k: Column, as: Seq[Column], from: Column, to: Column,
                  cur: Column): Column =
      struct((k.as(key) +: as.zip(attrs).map { case (c, a) => c.as(a) }) ++
        Seq(from.cast("bigint").as("version_from"),
          to.cast("bigint").as("version_to"),
          cur.as("is_current")): _*)

    val passthrough = rowStruct(col(key), attrs.map(col),
      col("version_from"), col("version_to"), lit(true))
    val expired = rowStruct(col(key), attrs.map(col),
      col("version_from"), lit(batchVersion), lit(false))
    val opened = rowStruct(col("b_key"), attrs.map(a => col(s"b_$a")),
      lit(batchVersion), lit(OpenVersion), lit(true))

    val emitted = joined
      .select(explode(
        when(inDim && inBatch && changed, array(expired, opened))
          .when(inDim, array(passthrough))
          .otherwise(array(opened))).as("r"))
      .select(col("r.*"))

    history
      .select(col(key) +: attrs.map(col) :+ col("version_from") :+
        col("version_to") :+ col("is_current"): _*)
      .unionByName(emitted)
  }

  /** The dimension AS OF `version` — the rows that were current the
    * instant version `version` was the latest commit: `version_from <=
    * version < version_to`. This is the whole point of keeping type-2
    * history ("which source config produced this shard?"); with the
    * high-date sentinel both bounds are plain sargable comparisons — no
    * null semantics, and at 100 TB the `version_from` predicate pushes
    * into the parquet scan. */
  def asOf(dim: DataFrame, version: Long): DataFrame =
    dim.filter(col("version_from") <= lit(version) &&
      col("version_to") > lit(version))
}
