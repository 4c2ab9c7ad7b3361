package graft.sim

import graft.Tier.PinOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The standing IVF-PQ index — [[Pq.ivfPqTopK]] turned from a per-query
  * recompute into a MAINTAINED structure (the seventh standing tier; the
  * InvertedIndex rule applied to compressed ANN). This is the layout a
  * billion-vector corpus actually serves from:
  *
  *  - `path/codes/cell=<id>/` — the m-byte PQ codes, parquet-PARTITIONED
  *    by coarse cell: a probe reads ONLY its nprobe cells' directories
  *    (`PartitionFilters` on the scan — asserted in IvfPqIndexSpec), so
  *    probe IO is ∝ the probed cells' share of the corpus, not the
  *    corpus.
  *  - `path/centroids/v=N/`, `path/codebooks/v=N/` — the coarse and
  *    subspace quantizers as versioned sidecars (the ComponentsIndex
  *    crash rule: writers only ADD `v=N+1`, readers take the highest
  *    `_SUCCESS`-complete version, so a crashed build/admission is
  *    invisible or complete — never torn).
  *
  * Determinism: build trains the same [[Similarity.kMeansSphericalModel]]
  * cells and [[Pq.train]] residual codebooks the recompute gate trains,
  * and probe calls [[Pq.ivfPqProbe]] on the persisted parts — the
  * BYTE-IDENTICAL Column tree the gate evaluates — so
  * `q_ann_ivf_pq_indexed` shares `q_ann_ivf_pq`'s oracle verbatim
  * (persistence must not change one score; the q_bm25_indexed rule).
  *
  * Admission ([[admit]]) follows standard IVF-PQ practice: quantizers are
  * FROZEN (no retrain — the recall cost of a drifting corpus is the
  * documented tradeoff, monitored by re-running the recall audit), new
  * vectors are assigned to existing cells with the build's exact
  * assignment expression, encoded with the build's codebooks, and
  * APPENDED to their cell partitions. Idempotent per vec_id: the
  * duplicate probe anti-joins the index pruned to the BATCH's OWN cells
  * (never a full-index scan — cost ∝ batch-touched partitions). */
object IvfPqIndex {

  private def versionOf(f: java.io.File): Option[Int] =
    "^v=(\\d+)$".r.findFirstMatchIn(f.getName).map(_.group(1).toInt)

  private def currentVersion(path: String): Int = {
    val dirs = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
    dirs.filter(d => new java.io.File(d, "_SUCCESS").isFile)
      .flatMap(versionOf).sorted.lastOption.getOrElse(0)
  }

  private def writeVersioned(df: DataFrame, path: String): Unit = {
    val next = currentVersion(path) + 1
    df.coalesce(1).write.mode("overwrite").parquet(s"$path/v=$next")
  }

  private def readVersioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/v=${currentVersion(path)}")

  /** Build (overwrite) the standing index at `path`. */
  def build(embeddings: DataFrame, path: String,
            nlist: Int = 16, m: Int = 4, ksub: Int = 8,
            rounds: Int = 2, kmRounds: Int = 3, dim: Int = 64): Unit = {
    val (assign, centroids) =
      Similarity.kMeansSphericalModel(embeddings, nlist, kmRounds)
    val resid = Pq.residuals(embeddings, assign, centroids).pinTier
    val codebooks = Pq.train(resid, m, ksub, rounds, dim).pinTier
    Pq.encode(resid, codebooks, m, dim)
      .join(resid.select(col("vec_id"), col("cluster")), Seq("vec_id"))
      .select(col("vec_id"), col("codes"), col("cluster").as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    writeVersioned(centroids, s"$path/centroids")
    writeVersioned(codebooks, s"$path/codebooks")
  }

  /** ANN top-k against the standing index — [[Pq.ivfPqProbe]] over the
    * persisted parts. `embeddings` is the raw tier the exact re-rank
    * (and the query lookup) reads; the codes scan is partition-pruned to
    * the nprobe probed cells. */
  def probe(spark: SparkSession, path: String, embeddings: DataFrame,
            queryVecId: Long, k: Int = 10, nprobe: Int = 4,
            rerank: Int = 50, m: Int = 4, dim: Int = 64): DataFrame = {
    val centroids = readVersioned(spark, s"$path/centroids")
    val codebooks = readVersioned(spark, s"$path/codebooks")
    // the partition column surfaces under the probe's name; the cell
    // filter inside ivfPqProbe then prunes whole cell=<id> directories
    val codes = spark.read.parquet(s"$path/codes")
      .select(col("vec_id"), col("codes"), col("cell").cast("long").as("cluster"))
    Pq.ivfPqProbe(codes, codebooks, centroids, embeddings, queryVecId,
      k, nprobe, rerank, m, dim)
  }

  /** Admit a batch with FROZEN quantizers: assign → encode → append to
    * the touched cell partitions. Replay-safe: already-indexed vec_ids
    * are dropped by an anti-join against the index PRUNED to the batch's
    * own cells. Returns the number of vectors admitted. */
  def admit(spark: SparkSession, batch: DataFrame, path: String,
            m: Int = 4, dim: Int = 64): Long = {
    val centroids = readVersioned(spark, s"$path/centroids")
    val codebooks = readVersioned(spark, s"$path/codebooks")
    val emb = batch
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val assign = Similarity.assignSpherical(emb, centroids)
    val resid = Pq.residuals(batch, assign, centroids).pinTier
    val cells = resid.select(col("cluster")).distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ nlist — the bounded class
    val existing = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(cells: _*)) // partition-pruned probe side
      .select(col("vec_id"))
    val fresh = resid.join(existing, Seq("vec_id"), "left_anti").pinTier
    val n = fresh.count()
    if (n > 0) {
      Pq.encode(fresh, codebooks, m, dim)
        .join(fresh.select(col("vec_id"), col("cluster")), Seq("vec_id"))
        .select(col("vec_id"), col("codes"), col("cluster").as("cell"))
        .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
    }
    n
  }
}
