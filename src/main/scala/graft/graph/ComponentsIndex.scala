package graft.graph

import graft.Tier.PinOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The standing components index — the third standing structure next to
  * [[graft.dedup.ShingleIndex]] (dedup) and [[graft.sim.IvfIndex]] (ANN):
  * component labels persisted once, and each NEW edge batch (today's
  * near-dup pairs, today's co-occurrences) admitted by re-solving ONLY the
  * components the batch touches. Without it, every nightly batch pays the
  * full-corpus contraction for what is usually a handful of merges.
  *
  * Admission economics: the solve is bounded by the AFFECTED subgraph
  * (members and edges of components containing a batch endpoint, plus the
  * batch itself) — batch-bounded in practice since near-dup components are
  * quasi-cliques, not corpus-spanning chains. The standing structures are
  * touched only as pruned columnar scans: labels (two long columns) filter
  * map-side against the broadcast batch-endpoint set, edges against the
  * broadcast member set. Nothing corpus-sized shuffles on admission.
  *
  * Correctness: components are closed under edges, so an unaffected
  * component cannot change (no batch edge touches it) and the affected
  * region's exact solution comes from the same star contraction the full
  * build uses — merged labels are IDENTICAL to a full recompute over
  * (standing ∪ batch) edges, which is exactly how the driver gate checks
  * it (shared closure oracle, the incremental-dedup precedent).
  * Min-vertex-id labels merge stably: the minimum of a merged component is
  * the minimum over its members, whatever partial labels said before.
  *
  * Persistence follows [[graft.dedup.ShingleIndex.appendAdmitted]]: the
  * merged labels are eagerly pinned BEFORE overwriting the labels
  * directory they were derived from, and the edge append anti-joins the
  * standing edge set so a replayed batch is a no-op (exactly-once).
  */
object ComponentsIndex {

  private def undirect(pairs: DataFrame, a: String, b: String): DataFrame =
    pairs
      .filter(col(a) =!= col(b))
      .select(least(col(a), col(b)).as("a"), greatest(col(a), col(b)).as("b"))
      .distinct()

  /** Build (overwrite) the standing index from a pair-list snapshot:
    * `path/edges` (undirected simple pairs) + `path/labels`
    * (id, component). */
  def build(pairs: DataFrame, path: String,
            a: String = "doc_a", b: String = "doc_b"): Unit = {
    val und = undirect(pairs, a, b).pinTier
    und.write.mode("overwrite").parquet(s"$path/edges")
    Components.connectedComponentsStar(und, "a", "b")
      .write.mode("overwrite").parquet(s"$path/labels")
  }

  def labels(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/labels")

  /** Admit an edge batch: re-solve the touched components, merge, persist,
    * and return the merged (id, component) labels. Idempotent per edge —
    * a replayed batch adds no edges and re-solves to the same labels. */
  def admit(spark: SparkSession, batchPairs: DataFrame, path: String,
            a: String = "doc_a", b: String = "doc_b"): DataFrame = {
    val batch = undirect(batchPairs, a, b).pinTier
    val standing = labels(spark, path)
    val edges = spark.read.parquet(s"$path/edges")
    // batch endpoints and the components they touch — both batch-bounded,
    // both broadcast into pruned scans of the standing structures
    val eps = batch.select(col("a").as("id"))
      .union(batch.select(col("b").as("id"))).distinct().pinTier
    val affected = standing
      .join(broadcast(eps), Seq("id"), "left_semi")
      .select(col("component")).distinct().pinTier
    val members = standing
      .join(broadcast(affected), Seq("component"), "left_semi")
      .select(col("id")).pinTier
    // closure: an edge of an affected component has BOTH endpoints in it,
    // so one-sided membership identifies the full affected edge set
    val subEdges = edges
      .join(broadcast(members.select(col("id").as("a"))), Seq("a"), "left_semi")
    val solved = Components.connectedComponentsStar(
      subEdges.unionByName(batch), "a", "b")
    val merged = standing
      .join(broadcast(affected), Seq("component"), "left_anti")
      .select(col("id"), col("component"))
      .unionByName(solved.select(col("id"), col("component")))
      .pinTier // materialized BEFORE the labels dir it reads is replaced
    val newEdges = batch.join(edges, Seq("a", "b"), "left_anti").pinTier
    newEdges.write.mode("append").parquet(s"$path/edges")
    merged.write.mode("overwrite").parquet(s"$path/labels")
    merged
  }
}
