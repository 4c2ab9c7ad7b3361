package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory — the single place the library's session
  * contract lives, used by every harness main ([[Verify]], [[Bench]],
  * [[Stress]], [[Explain]]) and the entry point a user switching from the
  * reference starts at:
  *
  * {{{
  *   val spark = GraftSession.local(cores = 32)                   // dev/test
  *   val spark = GraftSession.configure(SparkSession.builder())   // cluster
  *     .getOrCreate()
  * }}}
  *
  * What it pins and why:
  *  - AQE (+partition coalescing, +skew-join splitting): runtime re-planning
  *    is the 100 TB answer to stale statistics — skewed joins re-split,
  *    shuffle fan-out right-sized per stage. On by default in Spark 4, but
  *    pinned so a cluster-side conf cannot silently regress the contract.
  *  - Runtime bloom-filter join pruning: a selective dimension predicate is
  *    re-applied to the fact side as an injected bloom semi-filter BEFORE
  *    the shuffle, so a 100 TB fact scan feeding a shuffle join ships only
  *    rows that can match (broadcast joins prune for free; this is the
  *    shuffle-join equivalent). On by default in Spark 4, pinned for the
  *    same no-silent-regress reason as AQE; injection is plan-asserted in
  *    PlanHygieneSpec at forced-shuffle thresholds.
  *  - `graft.GraftExtensions`: the library's native expressions
  *    (`dot_product`) resolve in pure SQL for every session.
  *  - UTC session timezone: event-time results are host-timezone-independent
  *    (the determinism rule the DuckDB oracle compare relies on).
  *  - `nanosAsLong`: driver fixture generations have carried several
  *    timestamp encodings (TIMESTAMP(NANOS), which Spark only reads as raw
  *    longs under this flag, and TIMESTAMP_NTZ micros since the round-7
  *    regeneration); every observed encoding is normalized to TimestampType
  *    at the source boundary ([[graft.model.Tables]]), and
  *    SchemaContractSpec pins the post-load schema.
  */
object GraftSession {

  /** Apply the library contract to any builder (cluster path — master,
    * memory, and deploy confs stay the caller's business). */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local harness/dev session: `cores` executor threads with the shuffle
    * fan-out sized to match — 32 tasks per exchange on a 32-thread local
    * box, not the 200-partition default that turns every tiny stage into
    * scheduler overhead (SURVEY §7.0). `SPARK_GRAFT_SHUFFLE_PARTITIONS`
    * overrides the fan-out for scaled-corpus runs: partitions must grow
    * ∝ data (the Stress harness rule — a 1000-executor cluster does this
    * as a matter of course), or per-partition state grows with the
    * corpus until a fixed heap OOMs (observed: the ×32 wedge join at 32
    * partitions). AQE coalesces small stages back down, so a high
    * fan-out does not tax small queries. */
  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val partitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      cores.toString)
    val spark = configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
