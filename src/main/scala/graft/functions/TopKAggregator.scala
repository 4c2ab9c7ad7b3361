package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed [[Aggregator]] — the custom-AGGREGATE tier of
  * the extension ladder (native Expression > typed Aggregator > UDF),
  * demonstrated on the one shape the built-ins lack: per-GROUP top-k
  * without a window sort. `row_number() OVER (PARTITION BY g ORDER BY …)`
  * sorts every group in full before discarding all but k rows; this
  * aggregator carries a k-bounded buffer through partial aggregation, so
  * each map task reduces its slice to ≤k candidates BEFORE the shuffle —
  * per-group shuffle volume is O(k), not O(group), the difference between
  * a report and a spill on a billion-row group.
  *
  * Determinism: the buffer keeps the k best under a TOTAL order
  * ((value desc, id asc) encoded as the natural ascending sort of
  * (-value, id)), and top-k under a total order is associative and
  * commutative — any partial-merge tree yields the same set in the same
  * final order, which is what lets the driver gate hash-compare it
  * against the window-form oracle. */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"TopKAggregator: k must be >= 1, got $k")

  // ascending sort on (-value, id) = (value desc, id asc); the buffer is a
  // small sorted Seq — k is report-sized, so re-sort beats heap churn
  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    trim(b :+ a)
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(b1 ++ b2)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  import org.apache.spark.sql.functions.udaf

  /** The SQL-callable form: `topK(k)(col(value), col(id))` →
    * array<struct<_1,_2>> ready for posexplode into ranked rows. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAggregator(k), ExpressionEncoder[(Double, Long)]())
}
