package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats: hand-computed counts") {
    val d = Seq((1L, "Hello world, nice day")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(d).head
    assert(r.getLong(r.fieldIndex("n_tokens")) == 4L)      // whitespace tokens
    assert(r.getLong(r.fieldIndex("n_bpe_tokens")) == 5L)  // comma splits off
    // tokens: hello(5) world,(6) nice(4) day(3) -> 18/4 = 4.5
    assert(r.getDouble(r.fieldIndex("avg_token_len")) == 4.5)
  }

  test("gopherRules: each rule trips on its crafted violator; clean doc passes") {
    val fifty = ("the and " + Seq.tabulate(48)(i => s"word$i").mkString(" "))
    val d = Seq(
      (1L, fifty),                             // 50 words, 2 stopwords: pass
      (2L, "the and short text here"),         // <50 words
      (3L, ("ab " * 25) + ("#a " * 24) + "x"), // symbol-heavy: #/word > 0.1
      (4L, Seq.tabulate(50)(_ => "12345").mkString(" ")), // no letters
      (5L, (1 to 10).map(i => s"- bullet $i").mkString("\n")), // all bullets
      (6L, (1 to 10).map(i => s"line $i...").mkString("\n"))) // ellipsis ends
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ok = got(1L)
    assert(ok.getLong(ok.fieldIndex("n_words")) == 50L)
    assert(ok.getLong(ok.fieldIndex("n_stopwords")) == 2L)
    assert(ok.getBoolean(ok.fieldIndex("pass")), s"clean doc failed: $ok")
    assert(!got(2L).getBoolean(got(2L).fieldIndex("ok_words")))
    assert(!got(3L).getBoolean(got(3L).fieldIndex("ok_symbols")))
    assert(!got(4L).getBoolean(got(4L).fieldIndex("ok_alpha")))
    assert(!got(5L).getBoolean(got(5L).fieldIndex("ok_bullets")))
    assert(!got(6L).getBoolean(got(6L).fieldIndex("ok_ellipsis")))
    assert(Seq(2L, 3L, 4L, 5L, 6L)
      .forall(i => !got(i).getBoolean(got(i).fieldIndex("pass"))))
    // metric spot-checks: doc 5 bullet fraction is exactly 1.0; doc 6's
    // ellipsis-line fraction 1.0; doc 4 mean word length 5.0
    assert(got(5L).getDouble(got(5L).fieldIndex("bullet_frac")) == 1.0)
    assert(got(6L).getDouble(got(6L).fieldIndex("ellipsis_line_frac")) == 1.0)
    assert(got(4L).getDouble(got(4L).fieldIndex("mean_word_len")) == 5.0)
  }

  test("kneserNeyBigrams: hand-computed smoothed probabilities, no cross-doc pairs") {
    // "a b a b a c": c(ab)=2, c(ba)=2, c(ac)=1; c(a·)=3, N1+(a·)=2;
    // c(b·)=2, N1+(b·)=1; N1+(·a)=1, N1+(·b)=1, N1+(·c)=1; N1+(··)=3
    val d = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyBigrams(d)
      .as[(String, String, Long, Double)].collect().toSeq
    // P(b|a) = 1.25/3 + .75*2/3*(1/3) = .5833; P(a|b) = .625+.125 = .75;
    // P(c|a) = .25/3 + .1667 = .25
    assert(got == Seq(("a", "b", 2L, 0.5833), ("b", "a", 2L, 0.75),
      ("a", "c", 1L, 0.25)), s"got $got")
    // two docs never produce a bigram across the boundary
    val two = Seq((1L, "x y"), (2L, "z w")).toDF("doc_id", "text")
    val pairs = TextAnalysis.kneserNeyBigrams(two)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(pairs == Set("x" -> "y", "z" -> "w"), s"got $pairs")
  }

  test("docBigramLogLoss: repetitive doc scores lower NLL than the corpus-odd one") {
    // doc 1 is pure "a b a b ..." (its bigrams dominate the corpus LM);
    // doc 2 strings together corpus-rare continuations -> higher loss
    val d = Seq(
      (1L, "a b a b a b a b a b"),
      (2L, "a c b a c b"),
      (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.docBigramLogLoss(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 9L && got(2L)._1 == 5L)
    assert(got(1L)._2 < got(2L)._2,
      s"repetitive doc should be less surprising: $got")
    // single-token doc has no bigrams -> absent by contract
    assert(!got.contains(3L))
    // hand-check doc 1's loss: its bigrams are ab(x5+... corpus: ab c=5? doc1
    // ab appears 5, ba 4; doc2 contributes ac 2, cb 2, ba 1) — just pin
    // determinism across runs instead of the closed form
    val again = TextAnalysis.docBigramLogLoss(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == again)
  }

  test("bpeFirstMerges: vocab-weighted pair counts, in-word repeats count twice") {
    // "abab" (freq 2) contributes ab:2, ba:1 per occurrence -> ab:4, ba:2;
    // "cd" (freq 3) -> cd:3; single-char words contribute nothing
    val d = Seq((1L, "abab cd a"), (2L, "abab cd cd a")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeFirstMerges(d)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq("ab" -> 4L, "cd" -> 3L, "ba" -> 2L), s"got $got")
  }

  test("bpeTrain: N-round merge loop — greedy non-overlap, merged symbols re-pair, early exhaustion") {
    // vocab: abab:2, aaab:1. Hand trace:
    //  r1 pairs: ab:4+1=5, ba:2, aa:2  -> merge (a,b)=ab n=5
    //     abab -> [ab,ab]; aaab -> [a,a,ab] (greedy left-to-right)
    //  r2 pairs: (ab,ab):2, (a,a):1, (a,ab):1 -> merge (ab,ab)=abab n=2
    //  r3 tie at n=1 -> (s1,s2) order picks (a,a)=aa n=1
    //  r4 pairs: (aa,ab):1 -> merge =aaab n=1; r5: no pairs -> stop early
    val d = Seq((1L, "abab abab aaab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(d, nMerges = 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "a", "b", "ab", 5L),
      (2, "ab", "ab", "abab", 2L),
      (3, "a", "a", "aa", 1L),
      (4, "aa", "ab", "aaab", 1L)), s"got $got")
  }

  test("bpeEncode: learned merges compress the corpus; counts are exact") {
    // after the 4 learnable merges (see bpeTrain test) both words encode
    // to a single token: 3 words, 12 chars, 3 BPE tokens
    val d = Seq((1L, "abab abab aaab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(d, nMerges = 6)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 12L, 3L)), s"got $got")
    // fewer merges -> partial compression: with only merge (a,b)=ab,
    // abab -> [ab,ab] (2), aaab -> [a,a,ab] (3) => 7 tokens
    val one = TextAnalysis.bpeEncode(d, nMerges = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(one == Seq((1L, 3L, 12L, 7L)), s"got $one")
  }

  test("bm25TopK: only matching docs return, multi-term and short-doc boosts order correctly") {
    val docs = Seq(
      (1L, "join join merge x y"), // both terms, tf(join)=2
      (2L, "join z z z z"),        // one term, long
      (3L, "other words only"),    // no terms -> absent
      (4L, "merge"))               // one term, shortest doc
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, Seq("join", "merge"), k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1).toSet == Set(1L, 2L, 4L), s"got $got")
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 2L && byId(2L)._2 == 1L && byId(4L)._2 == 1L)
    // two matched terms beat one; equal idf + equal tf -> shorter doc wins
    assert(got.head._1 == 1L, s"got $got")
    assert(byId(4L)._3 > byId(2L)._3, s"length normalization failed: $got")
  }

  test("dsirResample: Gumbel-top-k is deterministic, k-sized, and follows the weights") {
    val docs = ((1L to 10L).map(i => (i, "zebra quagga stripe zebra", "srcT")) ++
      (11L to 22L).map(i => (i, "rock mineral quartz rock", "srcR")))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.dsirResample(docs, Seq("srcT"), k = 6, nBuckets = 64)
      .as[(Long, Double, Double)].collect().toSeq
    assert(got.size == 6)
    // the llr separation (~±5) dwarfs the O(1) Gumbel noise: every
    // selected doc is target-flavored
    assert(got.forall(_._2 > 0), s"resample leaked alien docs: $got")
    // replayable draw -> identical selection on a second run
    val again = TextAnalysis.dsirResample(docs, Seq("srcT"), k = 6, nBuckets = 64)
      .as[(Long, Double, Double)].collect().toSeq
    assert(again == got)
    // a different seed is a genuinely different draw (keys change even
    // when the winning set happens to coincide)
    val other = TextAnalysis.dsirResample(docs, Seq("srcT"), k = 6,
      nBuckets = 64, seed = "gumbel2")
      .as[(Long, Double, Double)].collect().toSeq
    assert(other.map(_._3) != got.map(_._3), "seed change left the draw identical")
  }

  test("perplexityBuckets: per-source tertiles are balanced and NLL-ordered") {
    // 6 docs per source: repetitive (low NLL under the corpus's own LM)
    // through mixed vocab (high); buckets must be 2/2/2 per source and
    // respect the NLL order within each source
    val docs = (0L to 5L).flatMap { i =>
      Seq((i, s"alpha beta alpha beta gamma w$i x$i", "sA"),
        (i + 100L, s"delta epsilon delta epsilon zeta y$i z$i", "sB"))
    }.toDF("doc_id", "text", "source")
    val got = TextAnalysis.perplexityBuckets(docs)
      .as[(Long, String, Double, String)].collect().toSeq
    for (src <- Seq("sA", "sB")) {
      val s = got.filter(_._2 == src)
      assert(s.groupBy(_._4).view.mapValues(_.size).toMap ==
        Map("head" -> 2, "middle" -> 2, "tail" -> 2), s"unbalanced for $src: $s")
      val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
      val sorted = s.sortBy(r => (r._3, r._1)).map(r => rank(r._4))
      assert(sorted == sorted.sorted, s"buckets out of NLL order for $src: $s")
    }
  }

  test("dsirWeights: target-resembling docs score positive, alien docs negative, counts exact") {
    // target slice (srcT) speaks "zebra quagga"; raw speaks "rock mineral".
    // doc 30 is raw-labelled but target-flavored -> must score keep=true;
    // doc 31 is pure raw vocabulary -> keep=false
    val docs = ((1L to 10L).map(i => (i, "zebra quagga stripe zebra", "srcT")) ++
      (11L to 20L).map(i => (i, "rock mineral quartz rock", "srcR")) ++
      Seq((30L, "zebra quagga stripe", "srcR"), (31L, "rock quartz mineral", "srcR")))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.dsirWeights(docs, Seq("srcT"), nBuckets = 64)
      .as[(Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(30L)._4, s"target-flavored doc must keep: ${got(30L)}")
    assert(!got(31L)._4, s"alien doc must drop: ${got(31L)}")
    assert(got(1L)._4 && !got(11L)._4)
    // unigrams + adjacent bigrams: 3 tokens -> 5 features
    assert(got(30L)._2 == 5L, s"got ${got(30L)}")
    // scores are symmetric evidence: target docs strictly above alien ones
    assert(got(1L)._3 > got(11L)._3)
  }

  test("sourceIndicativeTerms: planted source-exclusive term tops its source") {
    // "zebra" appears in every srcA doc and no srcB doc; "common" everywhere
    val d = (1L to 10L).map(i => (i, "common zebra filler", "srcA")) ++
      (11L to 20L).map(i => (i, "common other filler", "srcB"))
    val docs = d.toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceIndicativeTerms(docs, k = 3, minDf = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // perfectly discriminative terms rank first for their source; the
    // ubiquitous "common"/"filler" never appear (zero chi2, filtered by
    // the positive-association test)
    assert(got.contains(("srcA", 1L, "zebra")), s"got ${got.toSeq}")
    assert(got.contains(("srcB", 1L, "other")), s"got ${got.toSeq}")
    assert(!got.exists(_._3 == "common"), s"got ${got.toSeq}")
  }

  test("languageId: marker words win; no markers -> und") {
    val d = Seq(
      (1L, "the cat is on the mat"),
      (2L, "der hund ist nicht da"),
      (3L, "zzz qqq xxx")).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(d)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("unigramSurprisal: all-common text scores lowest, all-hapax highest") {
    val d = Seq(
      (1L, "common common common common"),
      (2L, "common rare1"),
      (3L, "rare2 rare3")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) < got(2L) && got(2L) < got(3L))
    // hand check: N=8 tokens, freq(common)=5 -> doc 1 mean = -ln(5/8)
    assert(math.abs(got(1L) - math.round(-math.log(5.0 / 8.0) * 1e4) / 1e4) < 1e-9)
    // zero-token docs have no tokens to score and are absent by contract
    assert(TextAnalysis.unigramSurprisal(
      Seq((9L, "   ")).toDF("doc_id", "text")).count() == 0)
  }

  test("chunkDocuments: boundaries, partial last chunk, order-exact reassembly") {
    val text = (1 to 70).map(i => s"t$i").mkString(" ")
    val d = Seq((1L, text), (2L, "   ")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(d, chunkTokens = 32)
      .collect().sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall(_.getLong(0) == 1L)) // zero-token doc yields no chunks
    assert(got.map(r => r.getLong(1) -> r.getLong(2)).toSeq
      == Seq(0L -> 32L, 1L -> 32L, 2L -> 6L))
    // the last chunk's fingerprint is the md5 of exactly tokens 65..70,
    // in order — proving reassembly is position-exact, not partition-order
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest((65 to 70).map(i => s"t$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    assert(got.last.getString(3) == md)
  }

  test("vocabularyApprox: estimates never undercount, stay inside the CMS bound, and find the heavy hitters") {
    val docs = graft.model.Tables.documents(spark, sf)
    val exact = TextAnalysis.vocabulary(docs, k = Int.MaxValue)
      .select("term", "freq").as[(String, Long)].collect().toMap
    val totalTokens = exact.values.sum
    val approx = TextAnalysis.vocabularyApprox(docs, k = Int.MaxValue)
      .select("term", "est_freq").as[(String, Long)].collect()
    // CMS hard guarantee: a point estimate never undercounts; the
    // overcount stays within eps·N (generous 100x slack keeps the spec
    // stable while still catching a broken sketch outright)
    approx.foreach { case (t, est) =>
      val truth = exact.getOrElse(t, 0L)
      assert(est >= truth, s"CMS undercounted '$t': $est < $truth")
      assert(est - truth <= math.max(1L, (0.0001 * totalTokens * 100).toLong),
        s"'$t' overcounted far beyond the eps bound: est=$est true=$truth")
    }
    // the sampled candidate set + estimates must recover the true top
    // (heavy hitters are exactly what survives sampling)
    val trueTop = exact.toSeq.sortBy { case (t, f) => (-f, t) }.take(20).map(_._1).toSet
    val estTop = approx.sortBy { case (t, f) => (-f, t) }.take(20).map(_._1).toSet
    val overlap = trueTop.intersect(estTop).size.toDouble / trueTop.size
    assert(overlap >= 0.8, s"heavy-hitter overlap $overlap: $estTop vs $trueTop")
    // deterministic: seeded sketch + mod-sample
    assert(approx.toSeq == TextAnalysis.vocabularyApprox(docs, k = Int.MaxValue)
      .select("term", "est_freq").as[(String, Long)].collect().toSeq)
  }

  test("fingerprint is whitespace-normalization invariant") {
    val d = Seq((1L, "a  b\tc"), (2L, "a b c"), (3L, "a b d")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(d).as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("winnowing fingerprints overlap heavily for near-identical docs") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val edited = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val far = (100 to 160).map(i => s"tok$i").mkString(" ")
    val d = Seq((1L, base), (2L, edited), (3L, far)).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(d).as[(Long, Seq[Long])].collect().toMap
    def overlap(a: Seq[Long], b: Seq[Long]) =
      a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size
    assert(overlap(fp(1L), fp(2L)) > 0.5)
    assert(overlap(fp(1L), fp(3L)) == 0.0)
  }

  test("repetitionStats: repeated text scores high, varied text zero, empty doc reports zeros") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam"),      // 1 distinct token, 1 distinct shingle
      (2L, "one two three four five six"),        // all distinct
      (3L, ""),                                   // empty -> zero ratios, still a row
      (4L, "ab cd")                               // < k tokens -> no shingles
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getDouble(2) > 0.8 && r(1L).getDouble(4) == 0.75) // 4 shingles, 1 distinct
    assert(r(2L).getDouble(2) == 0.0 && r(2L).getDouble(4) == 0.0)
    assert(r(3L).getLong(1) == 0L && r(3L).getDouble(2) == 0.0 && r(3L).getDouble(4) == 0.0)
    assert(r(4L).getLong(3) == 0L && r(4L).getDouble(4) == 0.0)
  }

  test("scrubPii replaces emails and urls and counts them") {
    val d = Seq(
      (1L, "contact alice@example.com or visit https://example.com/page?q=1 now"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.scrubPii(d).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 1L && r(1L).getLong(2) == 1L)
    assert(r(1L).getString(3) == "contact <EMAIL> or visit <URL> now")
    assert(r(2L).getLong(1) == 0L && r(2L).getString(3) == "no pii here at all")
  }

  test("sourceReport aggregates quality, dup and keep rates per source") {
    val good = "the cat sat on the mat and it is a fine day for all of us " * 3
    val d = Seq(
      (1L, good, "siteA"),            // dup of 3 (cross-source)
      (2L, "zz yy xx!!!", "siteA"),   // low quality, unique
      (3L, good, "siteB"),            // dup of 1
      (4L, good + "unique tail", "siteB")
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceReport(d).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("siteA").getLong(1) == 2L && r("siteB").getLong(1) == 2L)
    // one of siteA's two docs repeats elsewhere; junk doc drags keep rate
    assert(r("siteA").getDouble(4) == 0.5)
    assert(r("siteB").getDouble(4) == 0.5) // doc 3 dups doc 1
    assert(r("siteA").getDouble(5) == 0.5) // junk doc fails the 0.3 bar
    assert(r("siteB").getDouble(5) == 1.0)
    // mean_quality recomputes from the per-doc scores exactly
    val q = TextAnalysis.qualityScores(d.select(col("doc_id"), col("text")))
      .collect().map(x => x.getLong(0) -> x.getDouble(4)).toMap
    val expA = BigDecimal((q(1L) + q(2L)) / 2).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(r("siteA").getDouble(2) == expA.toDouble)
  }

  test("quality score components are bounded and blended") {
    val d = Seq((1L, "the a of to and is it for on with")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScores(d).head
    val stop = r.getDouble(r.fieldIndex("stopword_ratio"))
    assert(stop == 1.0) // all 10 tokens are stopwords
    val q = r.getDouble(r.fieldIndex("quality_score"))
    assert(q > 0.0 && q <= 1.0)
  }

  test("vocabulary counts corpus and document frequency with deterministic top-k") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "zebra")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabulary(d, k = 3)
      .as[(String, Long, Long)].collect().toSeq
    // the: freq 3 (2+1), df 2; sat: freq 2, df 2; then alphabetical among freq-1
    assert(got.take(2) == Seq(("the", 3L, 2L), ("sat", 2L, 2L)))
    assert(got(2) == (("cat", 1L, 1L)))
  }

  test("topTermsTfIdf ranks distinctive terms above ubiquitous ones") {
    val d = Seq(
      (1L, "apple apple banana shared"),
      (2L, "cherry shared"),
      (3L, "durian shared")).toDF("doc_id", "text")
    val got = TextAnalysis.topTermsTfIdf(d, k = 2)
      .as[(Long, Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // "shared" has df=3 -> idf ln(1)=0; never beats a distinctive term
    assert(got(1L) == Seq("apple", "banana"))
    assert(got(2L).head == "cherry")
    assert(got(3L).head == "durian")
  }

  test("collocations: planted phrase tops PMI; hapax pairs are support-floored") {
    // "new" and "york" ONLY ever appear together (20 times) in a corpus of
    // common filler: maximal association, must rank first. "rare pair"
    // appears once — infinite-ish PMI but under minCount, must be absent.
    val filler = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((1 to 20).map(i => (i.toLong, s"$filler new york $filler")) :+
      (99L, s"$filler rare pair")).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, minCount = 5, k = 10)
      .as[(String, String, Long, Double)].collect()
    assert(got.head._1 == "new" && got.head._2 == "york" && got.head._3 == 20L,
      s"planted phrase not on top: ${got.head}")
    assert(!got.exists(r => r._1 == "rare"), "hapax pair leaked past minCount")
    assert(got.forall(r => r._4 <= got.head._4), "not ordered by pmi desc")
  }

  test("zipfFit: planted Zipfian corpus fits alpha ~ 1; uniform corpus does not") {
    // word w_r appears round(120/r) times -> freq = C/rank exactly, so the
    // log-log OLS must recover alpha ~ 1 with a near-perfect fit
    val zipfWords = (1 to 30).flatMap(r => Seq.fill(math.round(120.0 / r).toInt)(f"w$r%02d"))
    val zipf = Seq((1L, zipfWords.mkString(" "))).toDF("doc_id", "text")
    val zf = TextAnalysis.zipfFit(zipf).as[(Long, Double, Double)].head()
    assert(zf._1 == 30L)
    assert(math.abs(zf._2 - 1.0) < 0.05, s"alpha ${zf._2} not ~1")
    assert(zf._3 > 0.99, s"r2 ${zf._3} not a near-perfect fit")
    // uniform frequencies: slope ~0 -> a corpus-health red flag
    val uniform = Seq((1L, (1 to 30).flatMap(r => Seq.fill(10)(f"u$r%02d")).mkString(" ")))
      .toDF("doc_id", "text")
    val uf = TextAnalysis.zipfFit(uniform).as[(Long, Double, Double)].head()
    assert(math.abs(uf._2) < 0.01, s"uniform corpus fit alpha ${uf._2} should be ~0")
  }

  test("vocabGini: uniform is 0; concentration raises it; hand-checked two-type case") {
    // equal frequencies -> perfect equality
    val uniform = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val u = TextAnalysis.vocabGini(uniform).as[(Long, Long, Double)].head()
    assert(u == ((3L, 6L, 0.0)), s"uniform: $u")
    // freqs (1, 9): G = 2*(1*1 + 2*9)/(2*10) - 3/2 = 38/20 - 1.5 = 0.4
    val skew = Seq((1L, ("b " + "a " * 9).trim)).toDF("doc_id", "text")
    val s = TextAnalysis.vocabGini(skew).as[(Long, Long, Double)].head()
    assert(s == ((2L, 10L, 0.4)), s"skew: $s")
  }

  test("vocabCoverage: hand-computed curve, tie order, overshoot k reports 100%") {
    // freqs: a=4, b=2, c=2, d=1 (9 occurrences). Rank order (freq desc,
    // term asc): a, b, c, d. k=1 -> 4/9; k=3 -> 8/9; k=10 > |vocab| -> 9/9
    val d = Seq((1L, "a a b c"), (2L, "a a b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(d, ks = Seq(1, 3, 10))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 9L, 0.4444), (3L, 8L, 9L, 0.8889), (10L, 9L, 9L, 1.0)),
      s"got $got")
  }
  test("c4Filters: line retention, sentence floor, and page verdicts follow the paper's rules") {
    val d = Seq(
      // doc 1: five good sentences across lines -> passes everything
      (1L, "This is a good line one. Another fine line two.\nA third proper line here. Fourth sentence stands. The fifth one closes."),
      // doc 2: lines lack terminal punctuation -> zero kept lines, fails floor
      (2L, "no punctuation here\nstill none\nnope"),
      // doc 3: javascript line dropped; remaining sentences under the floor
      (3L, "Please enable javascript to continue now.\nOnly one real sentence here."),
      // doc 4: code page (curly brace) fails the brace rule
      (4L, "A perfectly fine sentence one. Two more sentences follow here. Three is enough now. Four keeps going fine. Five closes it out. { code }"),
      // doc 5: dirty token fails the word-list rule
      (5L, "Sentence one is fine here. Sentence two is also fine. Sentence three works well. Sentence four still good. Sentence five viagra ends."))
      .toDF("doc_id", "text")
    val got = TextAnalysis.c4Filters(d)
      .select("doc_id", "n_kept_lines", "n_sentences", "ok_sentences",
        "ok_no_brace", "ok_dirty_words", "pass")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._7, s"doc 1 should pass: ${got(1L)}")
    assert(got(2L)._2 == 0L && !got(2L)._4 && !got(2L)._7)
    // doc 3: the javascript line is NOT retained even though it ends in '.'
    assert(got(3L)._2 == 1L && !got(3L)._7)
    assert(!got(4L)._5 && !got(4L)._7, s"brace page must fail: ${got(4L)}")
    assert(!got(5L)._6 && !got(5L)._7, s"dirty-word page must fail: ${got(5L)}")
  }

  test("charStats: entropy band separates natural text from runs and base64 junk") {
    val b64 = ("abcdefghijklmnopqrstuvwxyz0123456789+/" * 30)
    val d = Seq(
      (1L, "The quick brown fox jumps over the lazy dog near the river bank today."),
      (2L, "a" * 200),          // single-char run: entropy 0, top share 1
      (3L, b64),                 // uniform wide alphabet: entropy ~5.25 bits
      (4L, ""))                  // empty: null stats, fail surfaced
      .toDF("doc_id", "text")
    val got = TextAnalysis.charStats(d)
      .select("doc_id", "n_chars", "char_entropy", "top_char_share", "pass")
      .as[(Long, Long, Option[Double], Option[Double], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._5, s"natural text must pass: ${got(1L)}")
    assert(got(1L)._3.exists(e => e >= 3.5 && e <= 4.8))
    assert(got(2L)._3.contains(0.0) && got(2L)._4.contains(1.0) && !got(2L)._5)
    assert(got(3L)._3.exists(_ > 5.0) && !got(3L)._5, s"base64 junk must fail: ${got(3L)}")
    assert(got(4L)._2 == 0L && got(4L)._3.isEmpty && !got(4L)._5)
  }

  test("heapsLaw: counts exact at hand-built checkpoints; growth exponent in the sublinear band") {
    // 8 docs × 4 tokens; doc 0 introduces 4 terms, every later doc repeats
    // t0 t1 and introduces 2 fresh terms → with 4 buckets over ids 0..7
    // (cut = id div 2): N = 8,16,24,32; V = 6,10,14,18
    val docs = (0L to 7L).map { i =>
      val fresh = if (i == 0) "c0 d0" else s"a$i b$i"
      (i, s"t0 t1 $fresh")
    }.toDF("doc_id", "text")
    val r = TextAnalysis.heapsLaw(docs, nBuckets = 4).head
    assert(r.getLong(r.fieldIndex("n_buckets")) == 4L)
    assert(r.getLong(r.fieldIndex("total_tokens")) == 32L)
    assert(r.getLong(r.fieldIndex("n_vocab")) == 18L)
    val beta = r.getDouble(r.fieldIndex("beta"))
    val r2 = r.getDouble(r.fieldIndex("r2"))
    // V grows near-linearly here (every doc adds terms): β high but < 1,
    // and the log-log fit is tight
    assert(beta > 0.5 && beta < 1.0, s"beta $beta")
    assert(r2 > 0.95, s"r2 $r2")
  }

  test("heapsLaw: saturating vocabulary drives β toward 0") {
    // same 3 terms forever — vocabulary saturates in bucket 0
    val docs = (0L to 7L).map(i => (i, "x y z x y z")).toDF("doc_id", "text")
    val r = TextAnalysis.heapsLaw(docs, nBuckets = 4).head
    assert(r.getLong(r.fieldIndex("n_vocab")) == 3L)
    assert(r.getDouble(r.fieldIndex("beta")) < 0.1,
      s"saturated corpus must fit a near-flat growth curve: $r")
  }

  test("mixturePlan: floors, epochs and oversampling flags are exact; weights normalize") {
    val docs = Seq(
      (1L, "w w w w w w w w w w", "srcA"),  // 10 tokens
      (2L, "w w w w w", "srcB"),            // 5 tokens
      (3L, "w w w w w", "srcC"))            // 5 tokens, no target weight
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.mixturePlan(docs,
        Seq("srcA" -> 1.0, "srcB" -> 3.0), tokenBudget = 40L)
      .select("source", "avail_tokens", "target_share", "planned_tokens",
        "epochs", "oversampled")
      .as[(String, Long, Double, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("srcA", 10L, 0.25, 10L, 1.0, false),
      ("srcB", 5L, 0.75, 30L, 6.0, true),
      ("srcC", 5L, 0.0, 0L, 0.0, false)), s"got $got")
    intercept[IllegalArgumentException] {
      TextAnalysis.mixturePlan(docs, Seq("srcA" -> -1.0), 40L)
    }
  }

}
