package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  test("dynamicFilter with empty predicate list is identity") {
    val df = Seq(1, 2, 3).toDF("x")
    assert(Filters.dynamicFilter(df, Seq.empty[Column]).count() == 3)
  }

  test("dynamicFilter folds predicates with AND") {
    val df = Seq((1, "a"), (2, "a"), (3, "b")).toDF("x", "s")
    val got = Filters.dynamicFilter(df, Seq(col("x") >= 2, col("s") === "a"))
    assert(got.as[(Int, String)].collect().toSeq == Seq((2, "a")))
  }

  test("dropNullAndSelf removes null dst and self-loops") {
    val edges = Seq(("a", "b"), ("a", "a"), ("b", null), ("b", "a"))
      .toDF("src", "dst")
    val got = Filters.dropNullAndSelf(edges).as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("b", "a")))
  }

  test("searchOrders with no options returns every order") {
    val orders = graft.model.Tables.orders(spark, sf)
    assert(Filters.searchOrders(orders).count() == orders.count())
  }
}
