package graft.lake

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** The ONE atomic small-file commit every standing tier's pointer flip
  * and manifest publish goes through (ADVICE r12): write the body to a
  * sibling temp file, then swap it onto the target with a SINGLE
  * overwrite-rename (`FileContext` + `Rename.OVERWRITE` — atomic on HDFS
  * and posix local). The previous per-tier idiom was delete-then-rename:
  * a crash between the two left NO pointer at all, so `currentVersion`
  * resolved to 0 and every subsequent probe/admit failed reading a
  * nonexistent `v=0/` — an outage, where a stale pointer would only have
  * been stale serving. With one operation there is no in-between state:
  * readers see the old value or the new one. */
object Commit {

  /** Atomically publish `body` at `target` (overwrites any prior file). */
  def atomicWrite(spark: SparkSession, target: Path, body: String): Unit = {
    val f: FileSystem =
      target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(target.getParent, target.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    FileContext
      .getFileContext(f.makeQualified(target).toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(f.makeQualified(tmp), f.makeQualified(target),
        Options.Rename.OVERWRITE)
  }

  /** Atomically swap an ALREADY-WRITTEN temp file onto `target`
    * (overwrite) — for commits whose body was produced by another writer
    * (e.g. a parquet/count file staged next to its final name). */
  def atomicSwap(spark: SparkSession, tmp: Path, target: Path): Unit = {
    val f: FileSystem =
      target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    FileContext
      .getFileContext(f.makeQualified(target).toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(f.makeQualified(tmp), f.makeQualified(target),
        Options.Rename.OVERWRITE)
  }
}
