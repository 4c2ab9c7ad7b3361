package graft.graph

import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph}
import org.apache.spark.graphx.lib.{PageRank => GxPageRank}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank — SURVEY.md §2.8 G3 (`PageRank_Spark_v5.py:102`:
  * `g.pageRank(resetProbability=0.15, maxIter=10)`).
  *
  * Semantics preserved from the reference (SURVEY.md §2.8):
  * fixed iteration count (not tolerance-based), resetProb 0.15, self-loops
  * removed upstream, duplicate edges kept (multi-edges weight the walk),
  * GraphFrames/GraphX normalization (scores sum ≈ vertex count, not 1.0).
  *
  * Catalyst cannot express a 10-step iterative fixpoint, so this is the one
  * operator that leaves the SQL layer: GraphX Pregel supersteps over the
  * edge RDD. String vertex ids are mapped to Long via `zipWithUniqueId`
  * (stable bijection, no collision risk — SURVEY.md §7.4.2) and joined back
  * after the run. Everything before and after the 10 supersteps stays in
  * DataFrame land so scans remain pruned/pushed.
  */
object PageRankOp {

  /** PageRank over an edge list with numeric ids (vertex set = edge
    * endpoints). Input columns: src, dst (castable to long). */
  def runLongIds(spark: SparkSession, edges: DataFrame,
                 numIter: Int = 10, resetProb: Double = 0.15): DataFrame = {
    import spark.implicits._
    val edgeRdd = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].rdd
      .map { case (s, d) => GxEdge(s, d, 1.0) }
    val graph = GxGraph.fromEdges(edgeRdd, defaultValue = 1.0,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    val ranks = GxPageRank.run(graph, numIter, resetProb).vertices
    val out = ranks.toDF("id", "pagerank")
    graph.unpersist(blocking = false)
    out
  }

  /** Reference-faithful string-id variant (`PageRank_Spark_v5.py:65-97`):
    * vertices are supplied explicitly (the reference filters to
    * `size(related) >= 5`); edges with endpoints outside the vertex set are
    * dropped (GraphFrames semantics — GraphX would silently auto-create the
    * missing vertices, SURVEY.md §7.4.3), enforced with two left-semi joins;
    * string ids become Longs via zipWithUniqueId and are joined back after
    * the run so isolated vertices keep a rank too. */
  def runStringIds(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
                   numIter: Int = 10, resetProb: Double = 0.15): DataFrame = {
    import spark.implicits._
    val v = vertices.select(col("id").cast("string")).distinct()
    val e = edges
      .select(col("src").cast("string"), col("dst").cast("string"))
      .join(v.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(v.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
    val idMap = v.as[String].rdd.zipWithUniqueId().toDF("id", "vid").cache()
    val eNum = e
      .join(idMap.withColumnsRenamed(Map("id" -> "src", "vid" -> "srcId")), Seq("src"))
      .join(idMap.withColumnsRenamed(Map("id" -> "dst", "vid" -> "dstId")), Seq("dst"))
      .select(col("srcId").as("src"), col("dstId").as("dst"))
    val edgeRdd = eNum.as[(Long, Long)].rdd.map { case (s, d) => GxEdge(s, d, 1.0) }
    // fromEdges would drop isolated vertices; build the full vertex RDD so
    // every filtered video gets its resetProb floor, as GraphFrames does.
    val vertRdd = idMap.select(col("vid")).as[Long].rdd.map(_ -> 1.0)
    val graph = GxGraph(vertRdd, edgeRdd, defaultVertexAttr = 1.0,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    val ranks = GxPageRank.run(graph, numIter, resetProb).vertices.toDF("vid", "pagerank")
    val out = ranks.join(idMap, Seq("vid")).select(col("id"), col("pagerank"))
    out
  }

  /** The reference's full top-K flow (`PageRank_Spark_v5.py:107-115` +
    * enrichment `run_pagerank_job.py:124-140`): rank all vertices, take the
    * top K (TakeOrderedAndProject — no global sort), broadcast-join the
    * K-row result against the dimension table for enrichment (replacing K
    * driver-side point lookups), and assign dense rank numbers. Output
    * schema mirrors the reference cache record
    * `{rank, ID, influence_score, uploader}` (`run_pagerank_job.py:135-140`). */
  def topInfluencers(spark: SparkSession, edges: DataFrame, dim: DataFrame,
                     k: Int, numIter: Int = 10, resetProb: Double = 0.15): DataFrame = {
    val ranks = runLongIds(spark, edges, numIter, resetProb)
    val top = ranks
      .orderBy(col("pagerank").desc, col("id"))
      .limit(k)
    top.join(broadcast(dim), Seq("id"), "left")
      .withColumn("influence_score", round(col("pagerank"), 6))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("pagerank").desc, col("id"))))
      .drop("pagerank")
  }
}
