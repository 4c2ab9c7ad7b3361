package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 10k rows on one hot key + a tail
    val large = ((1 to 10000).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong, -i)))
      .toDF("key", "payload")
    val small = Seq((1L, "hot"), (2L, "warm"), (999L, "cold")).toDF("key", "name")
    val plain = large.join(small, Seq("key"))
      .select("key", "payload", "name").as[(Long, Int, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(large, small, "key")
      .select("key", "payload", "name").as[(Long, Int, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 10001)
  }

  test("salt spreads the hot key across buckets") {
    val large = (1 to 5000).map(i => (1L, i)).toDF("key", "payload")
    val buckets = large
      .withColumn("s", Skew.saltColumn(xxhash64(struct(col("key"), col("payload"))), 16))
      .select("s").distinct().count()
    assert(buckets > 8) // hot key occupies most of the 16 salt buckets
  }
}
