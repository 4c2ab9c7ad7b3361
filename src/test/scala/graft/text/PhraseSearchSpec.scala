package graft.text

import graft.SparkSpec

class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  test("counts exact consecutive sequences, overlaps included, order enforced") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "en", "s", 1L), // two matches
      (2L, "beta alpha beta alpha", "en", "s", 1L),       // one (order matters)
      (3L, "alpha gamma beta", "en", "s", 1L),            // both terms, not adjacent
      (4L, "alpha alpha alpha", "en", "s", 1L),           // no beta at all
      (5L, "alpha beta", "en", "s", 1L)                   // boundary match
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.phraseSearch(docs, Seq("alpha", "beta"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 1L), (5L, 1L)), s"got $got")
    // a self-overlapping phrase counts every anchor: "a a a" has two "a a"
    val rep = TextAnalysis.phraseSearch(docs, Seq("alpha", "alpha"))
      .as[(Long, Long)].collect().toSeq
    assert(rep == Seq((4L, 2L)), s"got $rep")
  }

  test("a 3-term phrase demands the full sequence") {
    val docs = Seq(
      (1L, "x one two three y", "en", "s", 1L),
      (2L, "one two x three", "en", "s", 1L),
      (3L, "one three two", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.phraseSearch(docs, Seq("one", "two", "three"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L)), s"got $got")
  }
}
