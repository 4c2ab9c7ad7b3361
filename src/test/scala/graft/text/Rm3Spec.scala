package graft.text

import graft.SparkSpec
import graft.model.Tables

class Rm3Spec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("join", "merge", "window")

  test("fbTerms = 0 degenerates to plain BM25 exactly") {
    val docs = Tables.documents(spark, sf)
    val got = TextAnalysis.bm25Rm3(docs, terms, fbTerms = 0)
      .as[(Long, Long, Double)].collect().toSeq
    val want = TextAnalysis.bm25TopK(docs, terms)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want, "zero-expansion RM3 diverged from BM25")
  }

  test("expansion changes the ranking deterministically and keeps k rows") {
    val docs = Tables.documents(spark, sf)
    val a = TextAnalysis.bm25Rm3(docs, terms)
      .as[(Long, Long, Double)].collect().toSeq
    val b = TextAnalysis.bm25Rm3(docs, terms)
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b, "RM3 expansion is not deterministic across runs")
    assert(a.size == 20)
    // the expanded query can only see MORE terms per doc, never fewer
    val plain = TextAnalysis.bm25TopK(docs, terms)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    a.foreach { case (doc, nTerms, _) =>
      plain.get(doc).foreach(p =>
        assert(nTerms >= p, s"doc $doc matched fewer terms after expansion"))
    }
  }
}
