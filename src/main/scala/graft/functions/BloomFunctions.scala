package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Broadcast bloom-filter membership, built on Spark's own runtime-filter
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain` — the
  * machinery behind `spark.sql.optimizer.runtime.bloomFilter.*`), exposed as
  * explicit operators so a pipeline can choose WHERE the filter goes instead
  * of hoping the optimizer injects one.
  *
  * The scale story: a semi-join against a membership set shuffles the whole
  * probe side on the join key. A bloom filter of the membership set is a few
  * MB regardless of probe-side size, ships to every task as a literal (same
  * transport as a broadcast), and drops non-members map-side inside codegen —
  * the probe side never shuffles. False positives are possible, so compose
  * with an exact verify on the (tiny) surviving fraction when exactness
  * matters — see [[graft.dedup.Dedup.contaminationReportBloom]].
  *
  * Keys are hashed to longs with `xxhash64` (seed 42) on BOTH the build and
  * probe side — `BloomFilterAggregate.update` inserts the long it is handed,
  * so build/probe agreement is the caller's contract and this object owns it.
  */
object BloomFunctions {

  /** Default sized for ~1M distinct members at ~1% false-positive rate
    * (bits ≈ 9.6 × items); kept well under Spark's runtime-filter creation
    * cap so `checkInputDataTypes` never rejects the aggregate. */
  val DefaultNumBits: Long = 1L << 23

  /** Distributed build: one partial+final aggregate over `keys`, returns the
    * serialized filter (null when `df` is empty — [[mightContain]] then
    * matches nothing, the correct zero-members semantics). The driver holds
    * only the numBits/8-byte sketch, never the member set. */
  def buildBloom(df: DataFrame, key: Column,
                 estItems: Long = 1L << 20,
                 numBits: Long = DefaultNumBits): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)), Literal(estItems), Literal(numBits))
    val row = df.agg(Bridge.aggregateColumn(agg).as("bloom")).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Map-side membership test against a serialized filter from
    * [[buildBloom]]. Codegen'd predicate; pushes like any deterministic
    * filter. May return true for a non-member (tune via numBits), never
    * false for a member. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    if (bloom == null) lit(false)
    else Bridge.column(BloomFilterMightContain(
      Literal(bloom), Bridge.expression(xxhash64(key))))
}
