package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels transitive clusters with their minimum") {
    // chain 1-2, 2-3 (one component), isolated pair 10-11, plus a
    // second chain joined out of order 7-6, 5-6
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 6L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = Components.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("connectedComponents converges on a long chain (diameter > 2)") {
    val n = 12
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Components.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect()
    assert(got.length == n + 1 && got.forall(_._2 == 0L))
  }

  test("dupClusters keeps exactly one canonical doc per cluster") {
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((2L, 4L), (4L, 6L)).toDF("doc_a", "doc_b")
    val got = Components.dupClusters(docs, pairs)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1), (2L, 2L, 1), (3L, 3L, 1),
      (4L, 2L, 0), (5L, 5L, 1), (6L, 2L, 0)))
    // survivors: every singleton plus one per cluster
    assert(got.count(_._3 == 1) == 4)
  }

  test("dupSurvivors keeps the longest member of each cluster, not the id minimum") {
    val docs = Seq(
      (1L, "a"), (2L, "bb"), (3L, "c"),
      (4L, "dddd dddd"), (5L, "e"), (6L, "ff")
    ).toDF("doc_id", "text")
    val pairs = Seq((2L, 4L), (4L, 6L)).toDF("doc_a", "doc_b")
    val got = Components.dupSurvivors(docs, pairs)
      .as[(Long, Long, Long, Int)].collect().toSeq
    // cluster {2,4,6} labels to its minimum (2) but doc 4 has the longest
    // text and survives; singletons always keep
    assert(got == Seq(
      (1L, 1L, 1L, 1), (2L, 2L, 2L, 0), (3L, 3L, 1L, 1),
      (4L, 2L, 9L, 1), (5L, 5L, 1L, 1), (6L, 2L, 2L, 0)))
  }

  test("ComponentsIndex: admission merges, spares untouched comps, equals full recompute, replays idempotently") {
    val stage = java.nio.file.Files
      .createTempDirectory("graft-cc-index-spec").toFile.getAbsolutePath
    try {
      // standing: {1,2}, {3,4}, {10,11}. batch: 2-3 (merges the first two)
      // and 20-21 (brand-new vertices). {10,11} must be untouched.
      val base = Seq((1L, 2L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
      val batch = Seq((2L, 3L), (20L, 21L)).toDF("doc_a", "doc_b")
      ComponentsIndex.build(base, s"$stage/cc")
      val merged = ComponentsIndex.admit(spark, batch, s"$stage/cc")
        .as[(Long, Long)].collect().toMap
      assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L), s"got $merged")
      // incremental == full recompute over the union
      val full = Components.connectedComponentsStar(
        base.unionByName(batch), "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      assert(merged == full)
      // replaying the SAME batch changes nothing: labels stable, no
      // duplicate edges appended (exactly-once)
      val replay = ComponentsIndex.admit(spark, batch, s"$stage/cc")
        .as[(Long, Long)].collect().toMap
      assert(replay == merged, s"replay drifted: $replay")
      val edges = ComponentsIndex.edges(spark, s"$stage/cc")
      assert(edges.count() == 5L && edges.distinct().count() == 5L,
        "replay appended duplicate edges")
    } finally {
      new scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively()
      ()
    }
  }

  test("ComponentsIndex: a crashed admission is invisible and a DIFFERENT later batch still admits correctly") {
    val stage = java.nio.file.Files
      .createTempDirectory("graft-cc-crash-spec").toFile.getAbsolutePath
    try {
      val base = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
      ComponentsIndex.build(base, s"$stage/cc") // commits v1
      // simulate a crash mid-admission of batch (2,3): both v2 artifacts
      // written but the pointer never flipped — the exact window the r9
      // advisor flagged (previous layout published the edges immediately)
      Seq((2L, 3L)).toDF("a", "b")
        .write.parquet(s"$stage/cc/edges/part_v=2")
      Seq((99L, 99L)).toDF("id", "component") // garbage half-state
        .write.parquet(s"$stage/cc/labels_v=2")
      assert(ComponentsIndex.currentVersion(spark, s"$stage/cc") == 1L)
      // readers see only v1: the orphaned edge partition is pruned out
      assert(ComponentsIndex.edges(spark, s"$stage/cc").count() == 2L)
      // a DIFFERENT batch admits on top of v1; the crashed leftovers are
      // cleared, not merged (the old layout needed the SAME batch replayed)
      val merged = ComponentsIndex.admit(
        spark, Seq((4L, 10L)).toDF("doc_a", "doc_b"), s"$stage/cc")
        .as[(Long, Long)].collect().toMap
      assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 10L -> 3L),
        s"got $merged")
      assert(ComponentsIndex.edges(spark, s"$stage/cc")
        .as[(Long, Long)].collect().toSet ==
        Set((1L, 2L), (3L, 4L), (4L, 10L)))
    } finally {
      new scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively()
      ()
    }
  }
}
