package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins.
  *
  * AQE splits skewed partitions for sort-merge joins at runtime, but when a
  * handful of hot keys dominate (the viral-video shape: max in-degree 3,981
  * in the reference data, far worse in web corpora), explicit salting
  * spreads ONE hot key over `saltBuckets` reducers deterministically:
  * the large side gets a random-but-deterministic salt per row; the small
  * side is replicated once per salt value. Join key becomes (key, salt).
  * Cost: |small| × saltBuckets replication — use only when the small side
  * is broadcast-size but the join must shuffle anyway (e.g. it feeds a
  * keyed aggregation downstream).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted over `saltBuckets`.
    * Result equals the plain inner join, row for row. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    // deterministic per-row salt on the large side: hash of the whole row
    // would collide for duplicate rows (fine — distribution is what matters)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col).toSeq: _*)), lit(saltBuckets)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("bigint"))
    // shuffle-hash hint: salting only does anything on a shuffled join —
    // if the replicated side were broadcast the salt would be dead weight
    // (and at the scale that motivates salting it exceeds the broadcast
    // threshold anyway)
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  /** The aggregation-side twin (two-level aggregate) lives in
    * [[graft.graph.Degrees.outDegreesSkewSafe]]. */
  def saltColumn(c: Column, saltBuckets: Int): Column =
    pmod(xxhash64(c), lit(saltBuckets))
}
