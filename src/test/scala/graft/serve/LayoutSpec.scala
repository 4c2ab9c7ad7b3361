package graft.serve

import graft.SparkSpec
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  /** Temp dir recursively deleted after the body — test runs must not
    * accumulate partitioned fixture copies in /tmp. */
  private def withTempDir[A](body: java.io.File => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toFile
    try body(dir)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("date-partitioned write prunes directories on read (PartitionFilters)") {
    withTempDir { dirF =>
      val dir = dirF.getAbsolutePath
      val events = graft.model.Tables.events(spark, sf)
      Layout.writeEventsByDay(events, dir)

      val day = events.select(to_date(col("ts")).cast("string")).orderBy(col("ts")).head().getString(0)
      val got = Layout.readDay(spark, dir, day)
      val p = got.queryExecution.explainString(FormattedMode)
      val pf = p.linesIterator.filter(_.contains("PartitionFilters:")).mkString
      assert(pf.contains("event_date"), s"date predicate not a partition filter:\n$p")
      // the predicate must NOT survive as a post-scan data filter
      val dataFilters = p.linesIterator.filter(_.contains("PushedFilters:")).mkString
      assert(!dataFilters.contains("event_date"), s"date filter hit the data path:\n$p")

      // correctness: pruned read == filtered full read
      val expected = events.filter(to_date(col("ts")) === lit(day)).count()
      assert(got.count() == expected && expected > 0)
    }
  }

  test("one output directory per partition value (no small-file explosion)") {
    withTempDir { dir =>
      val events = graft.model.Tables.events(spark, sf)
      Layout.writeEventsByDay(events, dir.getAbsolutePath)
      val dayDirs = dir.listFiles().filter(f => f.isDirectory && f.getName.startsWith("event_date="))
      assert(dayDirs.nonEmpty)
      // repartition(event_date) -> each directory holds exactly one data file
      dayDirs.foreach { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"${d.getName} has ${files.length} files")
      }
    }
  }
}
