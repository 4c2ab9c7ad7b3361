package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph derivation — SURVEY.md §2.6/§2.8 (R1, R3, F4–F6, G1).
  *
  * The reference derives a directed graph from an array column:
  * vertices = video ids, edges = `explode(related)` with null-drop and
  * self-loop removal (`PageRank_Spark_v5.py:65-97`,
  * `YoutubeNetworkAgg_Final.py:85-103`). On the TPC-H-ish fixtures the
  * array column is first *built* (parts per order) and the same-typed graph
  * is part↔part co-occurrence.
  *
  * Scale notes: the explode is a Catalyst `Generator` evaluated map-side (no
  * shuffle); the co-occurrence self-join shuffles once on the grouping key
  * and its output is bounded by Σ n_i² over groups — safe here because TPC-H
  * caps items/order at 7; for unbounded group sizes (a viral video's
  * in-links) the salting helper in [[graft.graph.Degrees]] applies.
  */
object Edges {

  /** The `related`-array view (videos-table analogue): one row per order with
    * the sorted array of its part keys. R3's `size` included (the
    * `size(related) >= 5` vertex filter, `PageRank_Spark_v5.py:61`, becomes
    * `filter(col("n_related") >= n)` on this view). */
  def relatedArrays(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey").as("id"))
      .agg(sort_array(collect_list(col("l_partkey"))).as("related"))
      .withColumn("n_related", size(col("related")))

  /** R1 + F5 — explode_outer the array back to (src, dst) edge rows and drop
    * null dst (empty-array rows), exactly the reference's edge derivation
    * (`PageRank_Spark_v5.py:77-90`). */
  def explodeEdges(arrays: DataFrame): DataFrame =
    arrays
      .select(col("id").as("src"), explode_outer(col("related")).as("dst"))
      .na.drop(Seq("dst"))

  /** G1 — same-typed co-occurrence edge list: directed part→part edges for
    * every ordered pair of distinct parts appearing in one order, with
    * multiplicity kept as a weight (the reference keeps duplicate edges —
    * "multi-edges weight the walk", SURVEY.md §2.8).
    *
    * Shape: ONE `collect_set` aggregate per order (shuffle 1) replaces the
    * former distinct + self-join-on-orderkey (two extra exchanges of the
    * full pair list); the n² pair expansion is two chained generators,
    * pure map-side, bounded by TPC-H's ≤7 items/order (for unbounded
    * group sizes — a viral video's in-links — cap/salt the group first,
    * [[graft.graph.Degrees]]); then the (src, dst) weight aggregate
    * (shuffle 2). Same output bound Σ n_i² over groups, one less pass
    * over the fact table. */
  def partCoOccurrence(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
      .select(explode(col("parts")).as("src"), col("parts"))
      .select(col("src"), explode(col("parts")).as("dst"))
      .filter(col("src") =!= col("dst")) // F6 self-loop removal
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
}
