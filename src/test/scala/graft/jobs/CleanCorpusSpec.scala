package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleanCorpusSpec extends SparkSpec {
  import spark.implicits._

  // a long high-quality base text (stopword-rich, >40 tokens) shared by the
  // dup/near-dup plants
  private val base = ("the quick brown fox jumps over a lazy dog and then it " +
    "runs on for a while with great energy in the morning light of the park " +
    "where it is happy to play for hours on end with friends").trim

  private val docs = Seq(
    (1L, base),                                      // keeper
    (2L, base),                                      // exact dup of 1 -> dropped
    (3L, base.replace("morning", "evening")),        // near-dup of 1 -> dropped
    (4L, "###"),                                     // low quality -> dropped
    (5L, "please write to alice@example.com with a note about the voyage " +
      "because the crew is waiting for the captain to send word of the plan " +
      "today and the harbor is quiet while everyone wonders what comes next"), // keeper, scrubbed
    (6L, ("an utterly different story about ships and oceans and storms that " +
      "is long enough to score well on the quality gate because it has many " +
      "common words in it for the blend to add up to a decent value overall"))
  ).toDF("doc_id", "text")

  test("funnel drops low-quality, exact-dup and near-dup docs; scrubs survivors") {
    val clean = CleanCorpus.run(spark, docs).orderBy("doc_id").collect()
    val kept = clean.map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 6L), s"kept $kept")
    val d5 = clean.find(_.getLong(0) == 5L).get.getString(1)
    assert(d5.contains("<EMAIL>") && !d5.contains("alice@example.com"))
  }

  test("cluster mode collapses a shared-neighbor family to one survivor") {
    // 1 and 7 are each near-dups of 3's text family but textually far from
    // each other only via the chain — build a chain 1~3~7 where (1,7) may
    // not be flagged directly; cluster mode keeps exactly one of the family
    val chain = Seq(
      (1L, base),
      (3L, base.replace("morning", "evening")),
      (7L, base.replace("morning", "evening").replace("quick", "rapid")),
      (6L, ("an utterly different story about ships and oceans and storms that " +
        "is long enough to score well on the quality gate because it has many " +
        "common words in it for the blend to add up to a decent value overall"))
    ).toDF("doc_id", "text")
    val pairKept = CleanCorpus.run(spark, chain).select("doc_id")
      .as[Long].collect().toSet
    val clusterKept = CleanCorpus.run(spark, chain, clusterDedup = true)
      .select("doc_id").as[Long].collect().toSet
    // both modes keep the family minimum and the unrelated doc
    assert(clusterKept.contains(1L) && clusterKept.contains(6L))
    assert(clusterKept.subsetOf(pairKept))
    // cluster mode keeps exactly one member of the 1/3/7 family
    assert(clusterKept.intersect(Set(1L, 3L, 7L)) == Set(1L))
  }

  test("stage counts are monotone and match the funnel prefix") {
    val s = CleanCorpus.stages(docs).as[(String, Long)].collect().toMap
    assert(s("a_input") == 6L)
    assert(s("b_quality") == 5L)      // only the "###" doc fails the gate
    assert(s("c_exact_dedup") == 4L)  // docs 1+2 collapse
  }
}
