package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("explodeEdges: empty arrays are dropped, elements preserved") {
    val arrays = Seq(
      (1L, Seq(10L, 11L)),
      (2L, Seq.empty[Long])
    ).toDF("id", "related")
    val got = Edges.explodeEdges(arrays).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L)))
  }

  test("partCoOccurrence: weights count co-occurring orders, no self-loops") {
    val li = Seq(
      (1L, 100L), (1L, 200L),            // order 1: parts 100, 200
      (2L, 100L), (2L, 200L), (2L, 200L) // order 2: same pair (dup line)
    ).toDF("l_orderkey", "l_partkey")
    val got = Edges.partCoOccurrence(li)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((100L, 200L, 2L), (200L, 100L, 2L)))
  }

  test("degree histogram total equals vertices-with-edges count") {
    val edges = Edges.partCoOccurrence(graft.model.Tables.lineitem(spark, sf))
    val nSrc = edges.select("src").distinct().count()
    val histTotal = Degrees.outDegreeHistogram(edges)
      .agg(sum("num_vertices")).head.getLong(0)
    assert(histTotal == nSrc)
  }

  test("skew-safe degree count equals plain degree count") {
    val edges = Edges.partCoOccurrence(graft.model.Tables.lineitem(spark, sf))
    val plain = Degrees.outDegrees(edges).as[(Long, Long)].collect().toMap
    val salted = Degrees.outDegreesSkewSafe(edges).as[(Long, Long)].collect().toMap
    assert(plain == salted)
  }

  test("pageRank invariants: scores sum ~ N, hub outranks leaves, deterministic") {
    // star graph: every leaf points at vertex 0
    val edges = (1L to 20L).map(i => (i, 0L)).toDF("src", "dst")
    val ranks = PageRankOp.runLongIds(spark, edges).as[(Long, Double)].collect().toMap
    assert(math.abs(ranks.values.sum - 21.0) < 0.5) // GraphX sum-to-N normalization
    val hub = ranks(0L)
    assert((1L to 20L).forall(i => ranks(i) < hub))
    val again = PageRankOp.runLongIds(spark, edges).as[(Long, Double)].collect().toMap
    assert(ranks == again)
  }

  test("DataFrame pageRank matches GraphX on the same graph") {
    val edges = Edges.partCoOccurrence(graft.model.Tables.lineitem(spark, sf))
      .select(col("src"), col("dst"))
    val df = PageRankOp.runLongIds(spark, edges).as[(Long, Double)].collect().toMap
    val gx = PageRankOp.runGraphX(spark, edges).as[(Long, Double)].collect().toMap
    assert(df.keySet == gx.keySet)
    df.foreach { case (id, r) =>
      assert(math.abs(r - gx(id)) < 1e-6, s"vertex $id: df=$r gx=${gx(id)}")
    }
  }

  test("runStringIds drops edges with endpoints outside the vertex set") {
    val vertices = Seq("a", "b", "c").toDF("id")
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "zz"), ("zz", "a"))
      .toDF("src", "dst") // zz is dangling — GraphFrames semantics drop both edges
    val ranks = PageRankOp.runStringIds(vertices, edges)
    val ids = ranks.select("id").as[String].collect().toSet
    assert(ids == Set("a", "b", "c")) // isolated-but-declared vertices kept, zz absent
    // surviving chain a -> b -> c: rank accumulates down the chain
    val m = ranks.as[(String, Double)].collect().toMap
    assert(m("c") > m("b") && m("b") > m("a"))
  }
}
