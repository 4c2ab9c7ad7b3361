package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree analytics — SURVEY.md §2.8 G2, §2.3 J1, §2.4 A7.
  *
  * GraphFrames' `outDegrees`/`inDegrees` are literally
  * `edges.groupBy("src"/"dst").count()` (`YoutubeNetworkAgg_Final.py:112-113`)
  * — implemented here directly, which keeps the whole computation inside
  * whole-stage codegen instead of a graph-library detour. Degree counting is
  * the canonical skew hazard at scale (one viral vertex = one hot reduce
  * key); the two-level aggregate in [[outDegreesSkewSafe]] is the salting
  * pattern for that.
  */
object Degrees {

  /** G2 — out-degrees: one hash aggregate over the edge list. */
  def outDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outDegree"))

  /** G2 — in-degrees. */
  def inDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("inDegree"))

  /** G2 at scale — degree count with an explicit pre-aggregation on a salted
    * key, for edge lists where one vertex holds a large share of all edges
    * (max in-degree 3,981 in the reference data, `degreestat_cache.json`; a
    * 100 TB web-ish graph is far worse). Two cheap aggregates replace one
    * skewed one; AQE's skew handling covers joins but not aggregates, so
    * this is the one place we salt by hand. */
  def outDegreesSkewSafe(edges: DataFrame, saltBuckets: Int = 64): DataFrame =
    edges
      .withColumn("salt", pmod(xxhash64(col("dst")), lit(saltBuckets)))
      .groupBy(col("src").as("id"), col("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("id"))
      .agg(sum(col("partial")).cast("long").as("outDegree"))

  /** J1 — left-join degree enrichment with zero-fill for isolated vertices
    * (`run_netagg_job.py:45-60`): every vertex gets a degree, 0 when absent.
    * No broadcast hint: the degree table's cardinality is the vertex count —
    * unbounded at scale (billions of rows on a web-ish graph), so forcing a
    * broadcast is a driver OOM. Left unhinted, AQE broadcasts it only when
    * its measured size is actually small, else picks a shuffled hash join on
    * `id`. */
  def enrichWithOutDegree(vertices: DataFrame, edges: DataFrame): DataFrame =
    vertices
      .join(outDegrees(edges), Seq("id"), "left")
      .na.fill(0, Seq("outDegree"))

  /** J1 mirror for the in-leg — the reference materializes BOTH degree
    * directions (`run_netagg_job.py:39-43,52-60`; max in-degree 3,981 is a
    * headline `degreestat_cache.json` fact). */
  def enrichWithInDegree(vertices: DataFrame, edges: DataFrame): DataFrame =
    vertices
      .join(inDegrees(edges), Seq("id"), "left")
      .na.fill(0, Seq("inDegree"))

  /** A7 — degree histogram: aggregate of an aggregate
    * (`YoutubeNetworkAgg_Final.py:116-119`). Second aggregate's input is one
    * row per vertex-with-edges; its output one row per distinct degree. */
  def outDegreeHistogram(edges: DataFrame): DataFrame =
    outDegrees(edges)
      .groupBy(col("outDegree")).agg(count(lit(1)).as("num_vertices"))
      .orderBy(col("outDegree"))

  /** A7, in-leg (`run_netagg_job.py:39-43`). */
  def inDegreeHistogram(edges: DataFrame): DataFrame =
    inDegrees(edges)
      .groupBy(col("inDegree")).agg(count(lit(1)).as("num_vertices"))
      .orderBy(col("inDegree"))
}
