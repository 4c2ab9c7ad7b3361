package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Standing IVF index — [[Similarity.ivfTopK]] turned from a per-query
  * retrain into a MAINTAINED structure (the ANN twin of
  * [[graft.dedup.ShingleIndex]], and the same production argument: at
  * 100 TB you train the coarse quantizer once, not per query).
  *
  * Layout under `path`:
  *   - `model/`      the persisted spark.ml KMeans quantizer (so admission
  *                   assigns with EXACTLY the training-time logic — no
  *                   reimplemented distance that could drift);
  *   - `centroids/`  (cell, centroid) — a broadcastable nlist-row table;
  *   - `postings/`   (vec_id, embedding) partitioned BY CELL: a probe of
  *                   nprobe cells reads only those directories — partition
  *                   pruning IS the IVF inverted-list seek, expressed in
  *                   lake layout instead of a custom file format.
  *
  * Scale shape: [[admit]] is broadcast-model assignment (map-side) plus an
  * anti-join against the postings' pruned vec_id column — cost ∝ batch,
  * idempotent per vec_id ([[graft.dedup.ShingleIndex.appendAdmitted]]'s
  * contract). [[topK]] scores |Q|·nprobe cells; the cell list is bounded
  * (≤ nprobe·|Q| of nlist), so the static isin partition filter is
  * driver-bounded the same way the IVF centroid collect is.
  * IvfIndexSpec pins topK-via-index ≡ [[Similarity.ivfTopK]] on the same
  * corpus/params (same seed → same quantizer → same probes, candidates,
  * scores and tie-breaks) and plan-asserts the postings partition
  * pruning; k-means cells are engine-specific, so driver gates stay
  * rows-only like q_ann_ivf itself.
  */
object IvfIndex {

  /** Train the coarse quantizer on a corpus snapshot and write the full
    * index (model + centroids + cell-partitioned postings). */
  def build(spark: SparkSession, embeddings: DataFrame, path: String,
            nlist: Int = 16, seed: Long = 42L): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = embeddings.withColumn("v", array_to_vector(col("embedding")))
    val km = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("v").setPredictionCol("cell")
    val model = km.fit(vecs)
    model.write.overwrite().save(s"$path/model")
    spark.createDataFrame(
        model.clusterCenters.zipWithIndex
          .map { case (c, i) => (i, c.toArray) }.toSeq)
      .toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
    model.transform(vecs)
      .select(col("cell"), col("vec_id"), col("embedding"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/postings")
  }

  /** Assign a new batch against the PERSISTED quantizer and append each
    * vector to its cell's partition — no retrain, map-side assignment,
    * idempotent per vec_id (a replayed batch appends nothing). Returns
    * the number of vectors added. */
  def admit(spark: SparkSession, batch: DataFrame, path: String): Long = {
    import org.apache.spark.ml.clustering.KMeansModel
    import org.apache.spark.ml.functions.array_to_vector
    val existing = spark.read.parquet(s"$path/postings")
      .select(col("vec_id")).distinct()
    val fresh = batch.join(existing, Seq("vec_id"), "left_anti")
      .localCheckpoint(true)
    val n = fresh.count()
    if (n > 0)
      KMeansModel.load(s"$path/model")
        .transform(fresh.withColumn("v", array_to_vector(col("embedding"))))
        .select(col("cell"), col("vec_id"), col("embedding"))
        .write.mode("append").partitionBy("cell").parquet(s"$path/postings")
    n
  }

  /** IVF top-k against the standing index: nprobe nearest cells per query
    * from the (broadcast) centroid table, then exact cosine over ONLY
    * those cells' posting partitions. `queries` is (query_id, q_emb). */
  def topK(spark: SparkSession, queries: DataFrame, path: String,
           k: Int, nprobe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_to_cent").desc, col("cell"))
    val probes = queries.join(broadcast(cents))
      .withColumn("cos_to_cent",
        Similarity.cosine(col("q_emb").cast("array<double>"), col("centroid")))
      .withColumn("p", row_number().over(wProbe))
      .filter(col("p") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cell"))
      .localCheckpoint(true) // ≤ nprobe·|Q| rows; read twice below
    // bounded driver round-trip (≤ nlist values): the static IN filter is
    // what turns the postings read into a partition-pruned directory seek
    val cells = probes.select(col("cell")).distinct().collect().map(_.get(0))
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("cell").isin(cells: _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    probes
      .join(postings.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("q_emb"), col("c_emb")), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
