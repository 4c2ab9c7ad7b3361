package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Shared broadcast policy for iterative fixpoint state (PageRank ranks,
  * connected-components labels, star-minimum tables).
  *
  * Why it exists: fixpoint state lives behind `localCheckpoint`s, whose
  * size statistics are UNKNOWN to Catalyst — left alone, every round plans
  * a full shuffle join even when the state is kilobytes. The fixpoints
  * therefore decide the join strategy themselves. Earlier rounds used a raw
  * row-count cutoff (`nVerts <= 1_000_000`), which is a proxy for what the
  * decision is actually about — BYTES shipped to every executor. This
  * estimates bytes from the state's schema (fixed-width types exactly,
  * strings conservatively) and compares against a configurable budget, so
  * a wide-row state stops broadcasting earlier and a narrow long/long
  * state keeps the fast path longer.
  *
  * Config: `spark.graft.fixpoint.maxBroadcastBytes` (default 32 MB — the
  * old 1M-row cutoff × ~32 B/row, and comfortably inside a 1 GiB-executor
  * broadcast budget at 100 TB cluster shape). Set to 0 to force the
  * shuffle-join branch — Stress uses exactly that to exercise the fallback
  * path every run, so the branch the big cluster would take is never
  * dead code that only a billion-vertex graph could reach.
  *
  * Each decision prints one `{"graft_fixpoint":…}` line with the estimate
  * and the branch taken, so bench/stress artifacts record which plan shape
  * ran (the same attribution rule as the netlib-backend log).
  */
private[graft] object StateBroadcast {

  val ConfKey = "spark.graft.fixpoint.maxBroadcastBytes"
  val DefaultMaxBytes: Long = 32L * 1024 * 1024

  /** Estimated in-memory bytes of one state row: UnsafeRow null bitmap +
    * 8-byte slots for fixed-width fields, strings at a conservative 32 B
    * (graph ids in the wild: 11-char YouTube ids, sha-prefix doc ids). */
  def estimateRowBytes(schema: StructType): Long =
    8L + schema.fields.map(_.dataType match {
      case LongType | DoubleType | IntegerType | FloatType |
           ShortType | ByteType | BooleanType | DateType | TimestampType => 8L
      case StringType => 32L
      case _ => 64L // nested/binary state: assume wide
    }).sum

  /** True when `nRows` rows of `state`'s schema fit the broadcast budget. */
  def fits(state: DataFrame, nRows: Long, op: String): Boolean = {
    val max = state.sparkSession.conf
      .getOption(ConfKey).map(_.toLong).getOrElse(DefaultMaxBytes)
    val est = nRows * estimateRowBytes(state.schema)
    val bcast = est <= max
    println(s"""{"graft_fixpoint":"$op","n_rows":$nRows,"est_bytes":$est,""" +
      s""""max_bytes":$max,"broadcast":$bcast}""")
    bcast
  }
}
