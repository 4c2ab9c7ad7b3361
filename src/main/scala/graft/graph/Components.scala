package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the missing middle
  * of every dedup funnel: near-dup PAIRS (MinHash/SimHash/Jaccard output)
  * become dup CLUSTERS, and each cluster keeps one canonical document
  * (north-star scope; the reference has no dedup at all, SURVEY.md §2).
  *
  * Implementation is min-label propagation as a DataFrame fixpoint — the
  * same execution shape as [[PageRankOp.pageRank]]: per round, every vertex
  * takes the minimum label among itself and its neighbors; converged when a
  * round changes nothing. Rounds needed = graph diameter, and near-dup
  * graphs are shallow (clusters are quasi-cliques — a handful of rounds);
  * each round is one equi-join + one hash aggregate, shuffling on the
  * vertex id, with the same eager-checkpoint lineage truncation as
  * PageRank. For billion-edge general graphs with long chains prefer the
  * large-star/small-star variant (fewer rounds); the per-round plan here is
  * identical, only the message rule changes.
  */
object Components {

  /** Label every vertex of the pair graph with its component's minimum
    * vertex id. Input: one row per undirected pair (a, b); output:
    * (id, component). Vertices outside any pair are absent — callers
    * coalesce(component, id) when joining back to the corpus. */
  def connectedComponents(pairs: DataFrame, a: String, b: String,
                          maxIter: Int = 20): DataFrame = {
    // symmetrize once: each row contributes messages in both directions
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .repartition(col("dst")).cache()
    // label-state partitioning sized to the vertex count, exactly as the
    // PageRank fixpoint sizes rank state (PageRankOp.pageRank): iterating
    // a few hundred labels across the full session fan-out is pure
    // scheduler overhead, while real vertex counts scale it back up
    val vertsIds = edges.select(col("src").as("id")).distinct()
    val nVerts = vertsIds.count()
    val sc = pairs.sparkSession.sparkContext
    val labelParts = math.max(1,
      math.min(sc.defaultParallelism, (nVerts / 100000L).toInt + 1))
    var labels = vertsIds
      .withColumn("label", col("id"))
      .coalesce(labelParts)
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // each vertex's next label: min over its own and its neighbors'
      val incoming = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels
        .join(incoming, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (col("label") =!= least(col("label"), coalesce(col("nbr_label"), col("label"))))
            .cast("long").as("delta"))
        .coalesce(labelParts)
        .localCheckpoint(true)
      changed = next.agg(sum(col("delta"))).head().getLong(0)
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    edges.unpersist(blocking = false)
    labels.select(col("id"), col("label").as("component"))
  }

  /** The dedup-funnel composition: near-dup pairs → components → one row
    * per document with its cluster id (own id when unclustered) and a
    * keep/drop verdict (the cluster minimum survives). */
  def dupClusters(documents: DataFrame, pairs: DataFrame,
                  a: String = "doc_a", b: String = "doc_b"): DataFrame = {
    // pin the pair tier: connectedComponents reads `pairs` twice (the
    // symmetrizing union), and when the pairs come from a full near-dup
    // pipeline (Dedup.ngramJaccardPairs) recomputing that pipeline per read
    // would double the most expensive stage of the funnel
    val p = pairs.localCheckpoint(true)
    val comp = connectedComponents(p, a, b)
      .withColumnRenamed("id", "doc_id")
    documents.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", (col("doc_id") === col("cluster_id")).cast("int"))
      .orderBy(col("doc_id"))
  }
}
