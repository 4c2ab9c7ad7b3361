package graft.jobs

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spec for the day-partitioned event log (VERDICT r9 "next" #7): a 1-day
  * batch must rewrite exactly one day's files, whole-day expiry must be a
  * manifest edit with no rewrite, day filters must partition-prune, and
  * the crash-replay guarantees of the unpartitioned cycle must carry over.
  */
class PartitionedEventLogSpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int, hour: Int = 12): Timestamp =
    Timestamp.valueOf(f"2026-01-$day%02d $hour%02d:00:00")

  private def batch(ids: Range, day: Int, hour: Int = 12): DataFrame =
    ids.map(i => Ev(i.toLong, t(day, hour), i % 7L, "click", 1.0, "{}")).toDF()

  private def newRoot(): String =
    Files.createTempDirectory("graft-pevlog").toString + "/events"

  private def dayFiles(root: String, v: Long): Map[String, Set[String]] =
    PartitionedEventLog.manifest(spark, root, v)
      .groupBy(e => e.substring("day=".length, e.indexOf('/')))
      .view.mapValues(_.toSet).toMap

  private val cutoff = t(10, 0) // retention: keep ts >= Jan 10 00:00

  test("bootstrap: three days land partitioned; reads see day as a prunable partition column") {
    val root = newRoot()
    val b = batch(1 to 30, 12).unionByName(batch(31 to 60, 13))
      .unionByName(batch(61 to 90, 14))
    val r = PartitionedEventLog.runCycle(spark, root, b, cutoff)
    assert(r.version == 1L && r.appended == 90L && r.retained == 90L)
    assert(r.rewrittenDays == Seq("2026-01-12", "2026-01-13", "2026-01-14"))
    val log = PartitionedEventLog.read(spark, root).get
    assert(log.count() == 90L)
    // day rides as a partition column and a filter on it PRUNES the scan:
    // the literal must land in the scan's PartitionFilters clause (pruned
    // at file-listing time), not in a post-scan Filter
    val plan = log.filter(col("day") === "2026-01-13")
      .queryExecution.executedPlan.toString
    val partFilters = plan.split("PartitionFilters", 2)
    assert(partFilters.length == 2 &&
      partFilters(1).takeWhile(_ != ']').contains("2026-01-13"),
      s"day filter did not reach partition pruning:\n$plan")
    assert(log.filter(col("day") === "2026-01-13").count() == 30L)
  }

  test("a 1-day batch rewrites exactly that day: other days' file entries carry forward verbatim") {
    val root = newRoot()
    PartitionedEventLog.runCycle(spark, root,
      batch(1 to 30, 12).unionByName(batch(31 to 60, 13)), cutoff)
    val v1 = dayFiles(root, 1L)
    val r = PartitionedEventLog.runCycle(spark, root, batch(100 to 110, 13), cutoff)
    assert(r.rewrittenDays == Seq("2026-01-13"))
    assert(r.untouchedDays == Seq("2026-01-12"))
    val v2 = dayFiles(root, 2L)
    assert(v2("2026-01-12") == v1("2026-01-12"),
      "untouched day was rewritten — its file entries changed")
    assert(v2("2026-01-13") != v1("2026-01-13"))
    assert(PartitionedEventLog.read(spark, root).get.count() == 71L)
  }

  test("whole-day expiry is a manifest edit (no rewrite); the boundary day rewrites") {
    val root = newRoot()
    // days 8 (wholly expired by a day-10 cutoff later), 10 (boundary:
    // hour-0 rows expire, hour-12 rows survive a 06:00 cutoff), 15 (live)
    val seed = batch(1 to 20, 8).unionByName(batch(21 to 30, 10, hour = 3))
      .unionByName(batch(31 to 40, 10, hour = 12))
      .unionByName(batch(41 to 60, 15))
    PartitionedEventLog.runCycle(spark, root, seed, t(1, 0))
    val v1 = dayFiles(root, 1L)
    val r = PartitionedEventLog.runCycle(spark, root,
      spark.emptyDataset[Ev].toDF(), t(10, 6))
    // day 8: dropped without rewrite; day 10: rewritten (partial expiry);
    // day 15: carried forward verbatim
    assert(r.droppedDays == Seq("2026-01-08"), r.toString)
    assert(r.rewrittenDays == Seq("2026-01-10"))
    assert(r.untouchedDays == Seq("2026-01-15"))
    val v2 = dayFiles(root, 2L)
    assert(!v2.contains("2026-01-08"))
    assert(v2("2026-01-15") == v1("2026-01-15"))
    assert(r.expired == 30L && r.retained == 30L) // 20 (day 8) + 10 (day-10 hour 3)
    val got = PartitionedEventLog.read(spark, root).get
      .select("event_id").as[Long].collect().toSet
    assert(got == ((31L to 60L).toSet))
  }

  test("replaying the same cycle is exactly-once: zero admitted, equal snapshot") {
    val root = newRoot()
    val b = batch(1 to 50, 15)
    val r1 = PartitionedEventLog.runCycle(spark, root, b, cutoff)
    val r2 = PartitionedEventLog.runCycle(spark, root, b, cutoff)
    assert(r1.appended == 50L && r2.appended == 0L)
    assert(r2.version == 2L && r2.retained == 50L)
    assert(PartitionedEventLog.read(spark, root).get
      .select("event_id").distinct().count() == 50L)
  }

  test("crash window — manifest written, pointer not flipped: readers see the old version; replay completes") {
    val root = newRoot()
    PartitionedEventLog.runCycle(spark, root, batch(1 to 20, 15), cutoff)
    PartitionedEventLog.runCycle(spark, root, batch(21 to 30, 16), cutoff)
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // roll the pointer back to v1 — byte-identical to dying between the
    // manifest rename and the pointer flip
    val out = f.create(new Path(root, "_current"), true)
    out.write("1".getBytes("UTF-8")); out.close()
    assert(PartitionedEventLog.currentVersion(spark, root) == 1L)
    assert(PartitionedEventLog.read(spark, root).get.count() == 20L)
    val r = PartitionedEventLog.runCycle(spark, root, batch(21 to 30, 16), cutoff)
    assert(r.version == 2L && r.retained == 30L)
    assert(PartitionedEventLog.read(spark, root).get.count() == 30L)
  }

  test("pointer missing entirely: recovery resumes from the highest manifest") {
    val root = newRoot()
    PartitionedEventLog.runCycle(spark, root, batch(1 to 20, 15), cutoff)
    PartitionedEventLog.runCycle(spark, root, batch(21 to 30, 16), cutoff)
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root, "_current"), false)
    assert(PartitionedEventLog.currentVersion(spark, root) == 2L)
    assert(PartitionedEventLog.read(spark, root).get.count() == 30L)
  }

  test("vacuum drops old manifests and every unreferenced pool file, keeps the committed snapshot") {
    val root = newRoot()
    (1 to 3).foreach(i => PartitionedEventLog.runCycle(spark, root,
      batch(i * 100 to i * 100 + 9, 15), cutoff))
    // v1/v2's rewritten-day predecessors become unreferenced under keep=1
    val removed = PartitionedEventLog.vacuum(spark, root, keepVersions = 1)
    assert(removed.nonEmpty)
    assert(PartitionedEventLog.manifest(spark, root, 1L).isEmpty) // dropped
    val log = PartitionedEventLog.read(spark, root).get
    assert(log.count() == 30L) // all three batches still readable
    // every remaining pool file is referenced (nothing dangles)
    val referenced = PartitionedEventLog.manifest(spark, root, 3L).toSet
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = f.listStatus(new Path(root, "data")).toSeq
      .filter(_.isDirectory).flatMap(d =>
        f.listStatus(d.getPath).toSeq.filter(_.isFile)
          .map(s => s"${d.getPath.getName}/${s.getPath.getName}"))
    assert(onDisk.toSet == referenced, s"dangling pool files: ${onDisk.toSet -- referenced}")
  }
}
