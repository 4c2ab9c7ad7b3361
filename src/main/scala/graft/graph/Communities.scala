package graft.graph

import graft.Tier.PinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007), DETERMINISTIC fixed-round variant: every vertex starts as its
  * own label; each round every vertex adopts the most frequent label among
  * its neighbors, ties broken toward the SMALLEST label. Classic LPA
  * breaks ties randomly and updates asynchronously — reproducible results
  * across engines need the synchronous sweep and the total tie order, and
  * the fixed round count is part of the contract (the k-core/PageRank
  * precedent) so the DuckDB oracle can unroll the identical sweeps.
  *
  * Community quality matches what sync LPA gives (label oscillation on
  * bipartite-ish regions is damped by the min-label tie-break, not
  * eliminated — a documented property of the synchronous variant, and
  * why the round count stays small).
  *
  * Scale shape: each round is one adjacency⋈labels equi-join (labels
  * broadcast under the [[StateBroadcast]] budget), one
  * (vertex, label)-count hash aggregate — map-side combined — and one
  * per-vertex argmax as a max(struct) aggregate, NOT a row_number window
  * (the window would sort vertex-cardinality data per round; the struct
  * max rides the same hash aggregate). Labels pinned every other round.
  */
object Communities {

  /** `rounds` synchronous LPA sweeps over the undirected simple graph of
    * `edges`. Returns every vertex with its final community label plus
    * the member count of that community, ordered by id. */
  def labelPropagation(edges: DataFrame, rounds: Int = 5): DataFrame = {
    val und = Triangles.undirect(edges).pinTier
    val nEdges = und.count()
    // full adjacency, both directions — the per-round join side
    val adj = und.select(col("a").as("id"), col("b").as("nbr"))
      .unionAll(und.select(col("b").as("id"), col("a").as("nbr")))
      .repartition(edges.sparkSession.sparkContext.defaultParallelism, col("id"))
      .pinTier
    val verts = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id"))).distinct().pinTier
    val nVerts = verts.count()
    val bcast = StateBroadcast.fits(verts, nVerts, "lpa")
    def mb(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    var labels = verts.select(col("id"), col("id").as("label"))
    for (i <- 1 to rounds) {
      val next = adj
        .join(mb(labels.select(col("id").as("nbr"), col("label"))), Seq("nbr"))
        .groupBy(col("id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        // argmax with a total order: max over (cnt, −label) picks the most
        // frequent label, smallest label on ties — one aggregate, no window
        .groupBy(col("id"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("label"))
      labels = if (i % 2 == 0 || i == rounds) next.pinTier else next
    }
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("community_size"))
    labels
      .join(mb(sizes), Seq("label"))
      .select(col("id"), col("label").as("community"), col("community_size"))
      .orderBy(col("id"))
  }
}
