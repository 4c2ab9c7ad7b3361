package graft.sim

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** VERDICT r12 #2: the sf1 bench fired cosineNearDupsLSH's old fail-fast
  * (threshold 0.35 at 13 auto-planes ⇒ 1311 > 1024 tables) and errored.
  * The operator now TIGHTENS the plane count to the largest value whose
  * table budget fits and re-derives the table count there, so the
  * ≥targetRecall contract holds through the degraded path — these tests
  * pin (a) the sf1 regime is feasible after tightening, (b) recall and
  * precision survive a forced-infeasible plane count, (c) only the
  * genuinely unprunable regime (per-plane agreement → 0) still errors. */
class LshFeasibilitySpec extends SparkSpec {
  import spark.implicits._

  test("the sf1 regime (threshold 0.35, 13 planes) tightens to a feasible budget") {
    // the exact arithmetic the sf1 bench hit: infeasible at 13, feasible at 12
    assert(Similarity.lshTablesFor(0.35, 13) > 1024)
    assert(Similarity.lshTablesFor(0.35, 12) <= 1024)
  }

  test("forced-infeasible plane count degrades gracefully with recall >= 0.9, precision 1") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.cosineNearDups(emb, 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // planes = 13 at threshold 0.35 is the regime that used to throw
    val lsh = Similarity.cosineNearDupsLSH(emb, 0.35, planes = 13)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // precision 1: every pair exact-verified
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"degraded-path recall $recall over ${exact.size} exact pairs")
  }

  test("a threshold with ~zero per-plane agreement still fails fast") {
    val emb = Tables.embeddings(spark, sf)
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupsLSH(emb, threshold = -1.0)
    }
    assert(e.getMessage.contains("cannot prune"))
  }
}
