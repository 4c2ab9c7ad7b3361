package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout management for the lake tables — the part of a
  * 100 TB deployment the reference never needed (its store was a single
  * node: `YoutubeDataset_loader_final.py` appends to one local table) but
  * a Spark lake lives or dies by: how rows are clustered into files
  * decides how much of the corpus every scan must read.
  *
  * Two operators:
  *
  *   - [[zorderWrite]]: multi-dimensional clustering. Each clustering
  *     column is affine-scaled to a `bits`-wide integer and the bits are
  *     interleaved into one z-value; range-partitioning + sorting by that
  *     value makes every file/row-group's min–max envelope tight on ALL
  *     clustered columns at once, so the parquet reader's stats-based
  *     row-group skipping prunes on any of them — single-column sorting
  *     only ever buys skipping on the leading column. The z-value is pure
  *     codegen'd Column arithmetic (no UDF) and is dropped before the
  *     write; what persists is ordinary parquet whose per-column stats
  *     carry the clustering.
  *   - [[compact]]: statistics-driven small-file compaction. Streaming
  *     ingest (the [[graft.streaming.Streams.exactlyOnceSink]] pattern)
  *     accretes files per micro-batch; compaction coalesces a directory
  *     to ceil(bytes / targetBytes) files WITHOUT a shuffle (coalesce, not
  *     repartition — at 100 TB the rewrite is IO-bound and a shuffle would
  *     double it).
  *
  * LayoutSpec measures the promise instead of trusting it: the same
  * 2-predicate filter over the same rows decodes ~an order of magnitude
  * fewer scan rows from a z-ordered copy than from a shuffled copy
  * (row-group skipping visible in the scan's numOutputRows metric), and
  * compaction hits the computed file count with content unchanged. The
  * q_zorder_scan / q_compact_roundtrip gates pin content preservation
  * against the raw-table oracle.
  */
object Layout {

  /** Interleave the low `bits` bits of the given non-negative integer
    * columns: bit j of column i lands at position j*n + i, so all columns
    * share significance evenly — the Morton (z-order) curve. */
  private[lake] def interleave(cols: Seq[Column], bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, i)) =>
        a.bitwiseOR(shiftleft(
          shiftright(c, j).bitwiseAND(lit(1L)), j * cols.size + i))
      }
    }

  /** Affine-scale a numeric column to [0, 2^bits): rank-free (two numbers
    * per column, computed in one bounded aggregate) yet monotone, which is
    * all the curve needs. Degenerate columns (min == max) map to 0. */
  private[lake] def scaled(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val span = mx - mn
    if (span <= 0d) lit(0L)
    else least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(mn)) / lit(span) * lit((1L << bits).toDouble))
        .cast("long")))
  }

  /** Write `df` to `path` z-order-clustered on `zcols`. `numFiles` sizes
    * the range partitioning (one file per range); `bits` is the per-column
    * resolution (16 is plenty: 2^16 ranks per dimension dwarfs any real
    * row-group count). The column min/max bounds come from one bounded
    * aggregate over the input — at 100 TB that pass is a column-pruned
    * scan of exactly the clustering columns. */
  def zorderWrite(df: DataFrame, zcols: Seq[String], path: String,
                  numFiles: Int = 8, bits: Int = 16,
                  maxRowGroupBytes: Long = 1L << 20,
                  dropCols: Seq[String] = Nil): Unit = {
    // the interleaved value must fit a signed long: clamp per-column
    // resolution rather than silently wrapping shift amounts mod 64
    val safeBits = math.max(1, math.min(bits, 63 / math.max(1, zcols.size)))
    val bounds = df.select(
      zcols.flatMap(c => Seq(min(col(c).cast("double")).as(s"mn_$c"),
        max(col(c).cast("double")).as(s"mx_$c"))): _*).head()
    // empty input (or an all-null clustering column) has no bounds and
    // nothing to cluster: write the (empty) frame as-is
    if (zcols.indices.exists(i => bounds.isNullAt(2 * i))) {
      df.drop(dropCols: _*).write.mode("overwrite").parquet(path)
      return
    }
    val ints = zcols.zipWithIndex.map { case (c, i) =>
      scaled(col(c), bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1),
        safeBits)
    }
    // dropCols: caller-supplied helper columns (e.g. a timestamp cast to
    // epoch seconds purely for clustering) — they shape the curve but are
    // dropped with __z before the write, so they never reach the schema
    df.withColumn("__z", interleave(ints, safeBits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .drop(dropCols: _*)
      .write.mode("overwrite")
      // small row groups keep the stats envelopes tight relative to the
      // file size, which is what page/row-group skipping prunes on
      .option("parquet.block.size", maxRowGroupBytes.toString)
      .parquet(path)
  }

  /** Coalesce the parquet directory at `inPath` down to
    * ceil(bytes / targetBytes) files at `outPath`, shuffle-free. Returns
    * the target file count. Content is preserved row-for-row (asserted in
    * LayoutSpec and by the q_compact_roundtrip oracle); ordering within
    * files is whatever the source files carried, as coalesce concatenates
    * input splits. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): Int = {
    // resolve the filesystem FROM the path (not the default FS) and list
    // recursively so partitioned directories size correctly
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (s.isFile && name.endsWith(".parquet") &&
          !name.startsWith("_") && !name.startsWith("."))
        bytes += s.getLen
    }
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).coalesce(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }

  /** Rows the parquet reader actually decoded for `df` (the leaf scan's
    * numOutputRows after row-group/page skipping) — the measurement
    * LayoutSpec compares across layouts. Forces execution. */
  private[lake] def scannedRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }
}
