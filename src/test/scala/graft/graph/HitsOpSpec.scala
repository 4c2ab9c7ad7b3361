package graft.graph

import graft.SparkSpec

class HitsOpSpec extends SparkSpec {
  import spark.implicits._

  test("hits: bipartite hub/authority split converges to the golden ratio") {
    // hubs {1,2} -> authorities {10,11}: 1->{10,11}, 2->{10}. The authority
    // iteration matrix AᵀA = [[2,1],[1,1]] has dominant eigenvector
    // (φ, 1) with φ = (1+√5)/2 — so auth(10)/auth(11) → φ ≈ 1.618.
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val got = HitsOp.hits(edges, numIter = 10, k = 10).collect()
    val byId = got.map(r => r.getLong(1) ->
      (r.getDouble(2), r.getDouble(3))).toMap
    // pure hubs have zero authority; pure authorities zero hub score
    assert(byId(1L)._1 == 0.0 && byId(2L)._1 == 0.0)
    assert(byId(10L)._2 == 0.0 && byId(11L)._2 == 0.0)
    // authority ranking: 10 (two hubs) > 11 (one); hubs: 1 (two auths) > 2
    assert(byId(10L)._1 > byId(11L)._1)
    assert(byId(1L)._2 > byId(2L)._2)
    val phi = (1.0 + math.sqrt(5.0)) / 2.0
    assert(math.abs(byId(10L)._1 / byId(11L)._1 - phi) < 1e-3,
      s"auth ratio ${byId(10L)._1 / byId(11L)._1} != φ")
    // hub ratio converges to the same eigen-structure: h ∝ A·a = (φ+1, φ)
    assert(math.abs(byId(1L)._2 / byId(2L)._2 - (phi + 1.0) / phi) < 1e-3)
    // normalization: each score family sums to the vertex count (4)
    assert(math.abs(got.map(_.getDouble(2)).sum - 4.0) < 1e-4)
    assert(math.abs(got.map(_.getDouble(3)).sum - 4.0) < 1e-4)
    // rank column is the 1..n sequence ordered by authority desc, id asc
    assert(got.sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
      == Seq(10L, 11L, 1L, 2L))
  }

  test("hits: top-k cut and determinism across runs") {
    val edges = Seq.tabulate(20)(i => ((i % 5).toLong, (10L + i % 7)))
      .toDF("src", "dst")
    val a = HitsOp.hits(edges, numIter = 10, k = 3).collect()
    val b = HitsOp.hits(edges, numIter = 10, k = 3).collect()
    assert(a.length == 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }
}
