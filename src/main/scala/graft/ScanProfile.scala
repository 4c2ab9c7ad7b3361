package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Executed-plan scan decomposition (VERDICT r15 #1): the ×100 artifacts
  * attributed the standing-index probe-leg growth to "index-side growth"
  * in prose; this reads the answer off the EXECUTED plan instead — per
  * file-scan node, the driver-side metrics Spark itself maintains
  * (files read, bytes read, rows the scan emitted after pushdown) plus
  * the bucket-pruning outcome (`optionalBucketSet` cardinality vs the
  * table's bucket count). Aggregated per root path, the numbers separate
  * the two growth stories the prose conflated:
  *
  *   - **scan breadth** — files/bytes touched. If bucket pruning fires,
  *     files read stays ∝ (selected buckets × files per bucket), NOT the
  *     table's total file count, at any corpus scale;
  *   - **postings length** — rows the pruned scan emits. A fixed query's
  *     term postings grow ∝ corpus; that growth is the work the query
  *     genuinely asks for, not a pruning failure.
  *
  * Read AFTER an action has run on the same DataFrame object (metrics
  * live on the materialized plan; an un-run plan reports zeros). The
  * traversal descends through the two AQE leaf wrappers
  * (AdaptiveSparkPlanExec, QueryStageExec) because `TreeNode.collect`
  * does not — the [[graft.serve.Bucketing.isShuffleFree]] lesson.
  */
object ScanProfile {

  /** One file-scan node's footprint. `selectedBuckets`/`totalBuckets`
    * are present only for bucketed scans; `files`/`bytes` are the
    * driver metrics ("numFiles"/"filesSize") — NOTE these count the
    * partition-pruned LISTING, before bucket pruning (Spark populates
    * them from the selected partitions; the bucket filter applies at
    * RDD construction) — `selectedFiles` is the post-bucket-prune
    * physical read set (files whose name-encoded bucket id is in the
    * selected set), counted over the table's whole listing: exact for
    * the UNPARTITIONED bucketed layouts every graft tier uses; on a
    * partitioned-AND-bucketed table it would count bucket matches
    * across pruned-away partitions too (an overcount, not an
    * undercount) — and `rows` the scan's "numOutputRows" — what the
    * scan actually READ: bucket-pruned and row-group-stat-skipped, but
    * at row-group granularity (a pushed filter cannot drop below one
    * row group), so it sits between the residual-filtered result and
    * the table size. */
  case class ScanStat(path: String, files: Long, bytes: Long, rows: Long,
                      selectedBuckets: Option[Long],
                      totalBuckets: Option[Long],
                      selectedFiles: Option[Long]) {
    def merge(o: ScanStat): ScanStat = ScanStat(
      path, files + o.files, bytes + o.bytes, rows + o.rows,
      // a multi-referenced table (e.g. the BM25 idf leg + scoring leg)
      // scans the SAME selected buckets twice: pruning breadth is the
      // max, not the sum — summing would report 6/32 for a 3-term probe
      (selectedBuckets ++ o.selectedBuckets).reduceOption(_ max _),
      totalBuckets.orElse(o.totalBuckets),
      (selectedFiles ++ o.selectedFiles).reduceOption(_ max _))
  }

  /** Bucket id a bucketed-table data file encodes in its name
    * (Spark's `BucketingUtils.bucketIdToString`: `_%05d` right before
    * the first extension segment). None for non-bucketed layouts. */
  def bucketIdOfFile(path: String): Option[Int] = {
    val name = path.split('/').last
    "_(\\d{5})\\.".r.findFirstMatchIn(name).map(_.group(1).toInt)
  }

  private def collectScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan)
    case q: QueryStageExec        => collectScans(q.plan)
    case f: FileSourceScanExec    => Seq(f)
    case other => other.children.flatMap(collectScans) ++
      other.subqueries.flatMap(collectScans)
  }

  /** Every file-scan node in `df`'s executed plan, one entry per
    * occurrence (a table read twice appears twice). */
  def scans(df: DataFrame): Seq[ScanStat] =
    collectScans(df.queryExecution.executedPlan).map { f =>
      def m(k: String): Long =
        f.metrics.get(k).map(_.value).getOrElse(0L)
      val selected = f.optionalBucketSet.map(_.cardinality().toLong)
      ScanStat(
        path = f.relation.location.rootPaths.headOption
          .map(_.toString).getOrElse("<unknown>"),
        files = m("numFiles"), bytes = m("filesSize"),
        rows = m("numOutputRows"),
        selectedBuckets = selected,
        totalBuckets = f.relation.bucketSpec.map(_.numBuckets.toLong),
        selectedFiles = f.optionalBucketSet.map { bs =>
          f.relation.location.inputFiles.count { p =>
            bucketIdOfFile(p).exists(bs.get)
          }.toLong
        })
    }

  /** [[scans]] folded per root path — the per-table footprint of the
    * query, keyed by the path's last two segments (stable across temp
    * staging prefixes). */
  def perTable(df: DataFrame): Map[String, ScanStat] =
    scans(df).groupBy(s => tail2(s.path)).map { case (k, ss) =>
      k -> ss.reduce(_ merge _)
    }

  private def tail2(p: String): String =
    p.split('/').filter(_.nonEmpty).takeRight(2).mkString("/")

  /** The per-table footprint as one compact JSON object string (locale-
    * pinned integers only — rides inside a bench artifact line). */
  def json(df: DataFrame): String =
    perTable(df).toSeq.sortBy(_._1).map { case (k, s) =>
      "\"" + k + "\":{" +
        s""""files":${s.files},"bytes":${s.bytes},"rows":${s.rows}""" +
        s.selectedBuckets.map(b => s""","selected_buckets":$b""").getOrElse("") +
        s.totalBuckets.map(b => s""","total_buckets":$b""").getOrElse("") +
        s.selectedFiles.map(b => s""","selected_files":$b""").getOrElse("") + "}"
    }.mkString("{", ",", "}")
}
