package graft

/** In-process stage-timing side channel for composite gate queries.
  *
  * The staged-index gates (q_ann_ivf*_indexed, q_incremental_dedup_*)
  * necessarily pay the index BUILD inside the same query function as the
  * probe — the driver's bench can only time the whole function, so the
  * artifact could never show that the standing-index PROBE is cheap
  * (VERDICT r6 "missing" #2). Gate code wraps its build step in
  * [[timed]]; [[graft.Bench]] drains the recordings after each query and
  * attributes build vs probe seconds separately in the bench artifact.
  *
  * Deliberately minimal: a process-local concurrent map, keyed by query
  * name, cleared on read. No-op cost when nothing drains it (Verify and
  * production callers just leave a few doubles behind).
  */
object Telemetry {

  private val recordings =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  /** Run `f`, recording its wall-clock seconds under `key` (last write
    * wins — per-pass drains in Bench keep passes separate). */
  def timed[T](key: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    recordings.put(key, (System.nanoTime() - t0) / 1e9)
    r
  }

  /** Snapshot and clear all recordings. */
  def drain(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val snap = recordings.asScala.toMap
    recordings.clear()
    snap
  }
}
