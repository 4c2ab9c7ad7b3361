package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class BprNegativesSpec extends SparkSpec {
  import spark.implicits._

  test("no emitted negative was ever purchased; at most k per customer, ranks dense") {
    val li = Tables.lineitem(spark, sf)
    val ord = Tables.orders(spark, sf)
    val part = Tables.part(spark, sf)
    val neg = Sampling.bprNegatives(li, ord, part)
    val inter = li.select(col("l_orderkey"), col("l_partkey"))
      .join(ord.select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        Seq("l_orderkey"))
      .select(col("o_custkey").as("cust_key"), col("l_partkey").as("neg_part"))
      .distinct()
    assert(neg.join(inter, Seq("cust_key", "neg_part"), "left_semi").count() == 0,
      "a sampled negative is actually a positive")
    val perCust = neg.groupBy(col("cust_key"))
      .agg(count(lit(1)).as("n"), max(col("rn")).as("mx"))
    assert(perCust.filter(col("n") > 4).count() == 0, "more than k negatives")
    assert(perCust.filter(col("n") =!= col("mx")).count() == 0, "ranks not dense")
    // determinism: derived draws, not rand()
    val again = Sampling.bprNegatives(li, ord, part)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(again == neg.as[(Long, Long, Long, Long)].collect().toSeq)
  }

  test("a near-exhausted customer undershoots k honestly") {
    // customer 1 bought every part except part 5: its only possible
    // negative is 5, so it must emit AT MOST one row and that row is 5 —
    // never a resampled positive, never a fabricated fill
    val parts = (1L to 6L).map(p => (p, s"part$p")).toDF("p_partkey", "p_name")
    val orders = Seq((10L, 1L), (11L, 2L)).toDF("o_orderkey", "o_custkey")
    val li = ((1L to 6L).filter(_ != 5L).map(p => (10L, p)) ++ Seq((11L, 1L)))
      .toDF("l_orderkey", "l_partkey")
    val neg = Sampling.bprNegatives(li, orders, parts)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val c1 = neg.filter(_._1 == 1L)
    assert(c1.size <= 1, s"customer 1 has one legal negative, got $c1")
    c1.foreach(r => assert(r._2 == 5L, s"emitted a purchased part: $r"))
    // the barely-constrained customer 2 (5 of 6 parts legal) gets real
    // negatives — how many of k depends on which dim slots the 12
    // deterministic draws land on, but none may be its one positive
    val c2 = neg.filter(_._1 == 2L)
    assert(c2.nonEmpty && c2.size <= 4, s"got $c2")
    c2.foreach(r => assert(r._2 != 1L, s"emitted customer 2's positive: $r"))
  }
}
