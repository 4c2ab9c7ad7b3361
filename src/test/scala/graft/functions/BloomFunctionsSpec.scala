package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFunctionsSpec extends SparkSpec {
  import spark.implicits._

  lazy val members = (0 until 5000).map(i => s"key_$i").toDF("k")
  lazy val others  = (0 until 5000).map(i => s"absent_$i").toDF("k")

  test("no false negatives: every inserted key tests positive") {
    val bloom = BloomFunctions.buildBloom(members, col("k"))
    val hits = members.filter(BloomFunctions.mightContain(bloom, col("k"))).count()
    assert(hits == 5000L)
  }

  test("false-positive rate on a disjoint key set stays near the sizing target") {
    val bloom = BloomFunctions.buildBloom(members, col("k"))
    val fps = others.filter(BloomFunctions.mightContain(bloom, col("k"))).count()
    // sized for ~1% at 1M items, so 5k items is far below saturation
    assert(fps < 100L, s"$fps false positives out of 5000")
  }

  test("empty build matches nothing") {
    val bloom = BloomFunctions.buildBloom(members.limit(0), col("k"))
    assert(bloom == null)
    assert(members.filter(BloomFunctions.mightContain(bloom, col("k"))).count() == 0L)
  }

  test("undersized filter degrades to false positives, never false negatives") {
    val bloom = BloomFunctions.buildBloom(members, col("k"), numBits = 64)
    val hits = members.filter(BloomFunctions.mightContain(bloom, col("k"))).count()
    assert(hits == 5000L)
  }
}
