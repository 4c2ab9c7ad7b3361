package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's cross-pass stall detector (VERDICT r12 #7):
  * a query is flagged `suspect_stall` exactly when its slowest pass both
  * exceeds the absolute floor AND diverges >ratio× from its fastest —
  * the signature of a shared-VM stall the min-of-passes protocol
  * rejected, which previously cost a verdict cycle to attribute by hand
  * (q_pagerank_filtered r10, q_als_recommend r11). */
class BenchSpec extends AnyFunSuite {

  test("flags a >3x divergent query whose slow pass exceeds 5 s") {
    val got = Bench.suspectStalls(Map(
      "q_stalled" -> Seq(16.4, 4.9), // r11's ALS shape: 3.3x, slow pass 16 s
      "q_steady"  -> Seq(8.0, 7.6)))
    assert(got == Seq("q_stalled"))
  }

  test("divergence on a fast query is not a stall (both passes under the floor)") {
    // 10x swing but the slow pass is 0.5 s — codegen jitter, not a stall
    assert(Bench.suspectStalls(Map("q_tiny" -> Seq(0.5, 0.05))).isEmpty)
  }

  test("a slow-but-consistent query is not a stall") {
    assert(Bench.suspectStalls(Map("q_heavy" -> Seq(9.5, 8.9))).isEmpty)
  }

  test("single-pass runs never flag (no cross-pass evidence)") {
    assert(Bench.suspectStalls(Map("q_once" -> Seq(60.0))).isEmpty)
  }

  test("boundary: exactly ratio x is not flagged, just above is") {
    assert(Bench.suspectStalls(Map("q_edge" -> Seq(15.0, 5.0))).isEmpty)
    assert(Bench.suspectStalls(Map("q_over" -> Seq(15.1, 5.0))) == Seq("q_over"))
  }

  test("multiple stalls sort by name for a deterministic artifact") {
    val got = Bench.suspectStalls(Map(
      "q_b" -> Seq(20.0, 2.0), "q_a" -> Seq(30.0, 3.0)))
    assert(got == Seq("q_a", "q_b"))
  }
}
