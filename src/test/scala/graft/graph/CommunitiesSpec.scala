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

  test("modularityReport: bridged cliques — every integer column and Q hand-checked") {
    // same fixture as the LPA test: communities {1,2,3} / {10,11,12},
    // m=7, intra=3+3=6, degrees (2,2,3 | 3,2,2) → d_c = 7 both sides,
    // D2 = 98; Q = 6/7 − 98/(4·49) = 0.8571428… − 0.5 = 0.357143
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L)).toDF("src", "dst")
    val got = Communities.modularityReport(edges, rounds = 5)
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(got == ((6L, 7L, 2L, 6L, 98L, 0.357143)), s"got $got")
  }

  test("modularityReport: a clique is one community with Q = 0; disconnected cliques score high") {
    // K4 alone: one community, every edge intra, D2 = (2m)² ⇒ Q = 1 − 1 = 0
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val q4 = Communities.modularityReport(k4).as[(Long, Long, Long, Long, Long, Double)].head()
    assert(q4._3 == 1L && q4._6 == 0.0, s"got $q4")
    // two disconnected triangles: Q = 1 − 2·(9/36)/... = 6/6 − 2·81/(4·36)
    //   m=6, intra=6, d_c=6 each, D2=72 ⇒ Q = 1 − 72/144 = 0.5
    val tri2 = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val q2 = Communities.modularityReport(tri2).as[(Long, Long, Long, Long, Long, Double)].head()
    assert(q2 == ((6L, 6L, 2L, 6L, 72L, 0.5)), s"got $q2")
  }
}
