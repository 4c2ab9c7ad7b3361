package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product equals the interpreted HOF computation bit for bit") {
    val embs = graft.model.Tables.embeddings(spark, sf).limit(100)
    val both = embs.select(
      VectorFunctions.dot_product(col("embedding"), col("embedding")).as("native"),
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) => assert(n == h) }
  }

  test("dot_product nulls propagate, double arrays accepted") {
    val d = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0, 1.0)))
    ).toDF("a", "b")
    val got = d.select(VectorFunctions.dot_product(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None))
  }

  test("dot_product over mixed double/int arrays: the quantized-code path") {
    // the ADC hot loop: per-query double weights against raw int codes,
    // plus the LUT identity dot(q, dequant(c)) = q_const + dot(w, c)
    val d = Seq((Seq(0.5, 2.0, -1.0), Seq(3, 4, 5))).toDF("w", "c")
    val got = d.select(
        VectorFunctions.dot_product(col("w"), col("c")).as("wd"),
        VectorFunctions.dot_product(col("c"), col("c")).as("ii"))
      .as[(Double, Double)].head()
    assert(got._1 == 0.5 * 3 + 2.0 * 4 + (-1.0) * 5)
    assert(got._2 == 9.0 + 16.0 + 25.0)
    // int × float mix resolves too (both orders)
    val m = Seq((Seq(2, 3), Seq(1.5f, 2.5f))).toDF("i", "f")
      .select(VectorFunctions.dot_product(col("i"), col("f")).as("a"),
        VectorFunctions.dot_product(col("f"), col("i")).as("b"))
      .as[(Double, Double)].head()
    assert(m._1 == 2 * 1.5 + 3 * 2.5 && m._2 == m._1)
  }

  test("dot_product is callable from SQL after registration") {
    Bridge.registerFunction(spark, "dot_product",
      exprs => DotProduct(exprs(0), exprs(1)))
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head
    assert(r.getDouble(0) == 11.0)
  }
}
