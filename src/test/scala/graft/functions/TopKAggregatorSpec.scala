package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("topK: bounded, ordered, tie-broken by id, partition-layout independent") {
    val rows = Seq(
      (1L, 5.0, 10L), (1L, 9.0, 11L), (1L, 9.0, 12L), (1L, 1.0, 13L),
      (2L, 3.0, 20L))
    def run(parts: Int) = rows.toDF("g", "v", "id").repartition(parts)
      .groupBy(col("g"))
      .agg(TopKAggregator.topK(2)(col("v"), col("id")).as("top"))
      .select(col("g"), col("top"))
      .as[(Long, Seq[(Double, Long)])].collect().toMap
    val one = run(1)
    // 9.0 tie -> lower id first; k=2 cuts the rest; small group emits all
    assert(one(1L) == Seq((9.0, 11L), (9.0, 12L)), s"got $one")
    assert(one(2L) == Seq((3.0, 20L)), s"got $one")
    // merge associativity: any partition layout yields identical buffers
    (2 to 5).foreach(p => assert(run(p) == one, s"layout $p diverged"))
  }

  test("topK plan: partial aggregation present, no window sort") {
    val d = Seq((1L, 1.0, 1L)).toDF("g", "v", "id")
      .groupBy(col("g"))
      .agg(TopKAggregator.topK(2)(col("v"), col("id")).as("top"))
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"no aggregate physical node:\n$plan")
    assert(plan.contains("partial_topkaggregator") ||
      plan.toLowerCase.contains("partial"), s"no partial (map-side) phase:\n$plan")
    assert(!plan.contains("Window"), s"window sort leaked in:\n$plan")
  }
}
