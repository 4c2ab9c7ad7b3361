package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Aggregations, Filters, TopK}

/** Property tests (SURVEY.md §5.3): operator laws that must hold for any
  * input, checked over ScalaCheck-generated fixtures (seeded, so runs are
  * reproducible; Gen driven directly — no scalatest bridge needed). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  def samples[A](g: Gen[A], n: Int = 8): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  val ordersGen: Gen[List[(Long, Long, Double, String)]] =
    Gen.nonEmptyListOf(for {
      ok <- Gen.choose(1L, 50L)
      ck <- Gen.choose(1L, 10L)
      price <- Gen.choose(1, 500000).map(_ / 100.0)
      st <- Gen.oneOf("O", "F", "P")
    } yield (ok, ck, price, st)).map(_.distinctBy(_._1))

  test("top-K is a prefix of the full sort") {
    for (rows <- samples(ordersGen); k <- Seq(1, 3, 10)) {
      val df = rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      val topK = TopK.topOrdersByPrice(df, k).select("o_orderkey").as[Long].collect().toSeq
      val full = df.orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey").as[Long].collect().toSeq
      assert(topK == full.take(k))
    }
  }

  test("bucket counts always sum to the row count") {
    for (rows <- samples(ordersGen)) {
      val df = rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val total = Aggregations.priceBuckets(df).agg(sum("num_orders")).head.getLong(0)
      assert(total == rows.length)
    }
  }

  test("adding predicates never grows the dynamic-filter result") {
    for (rows <- samples(ordersGen); minP <- Seq(0.0, 1000.0, 4000.0)) {
      val df = rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val none = Filters.dynamicFilter(df, Seq.empty).count()
      val one = Filters.dynamicFilter(df, Seq(col("o_totalprice") >= minP)).count()
      val two = Filters.dynamicFilter(df,
        Seq(col("o_totalprice") >= minP, col("o_orderstatus") === "O")).count()
      assert(none >= one && one >= two)
    }
  }

  test("keyed dedup is idempotent and keyed-unique") {
    for (rows <- samples(ordersGen)) {
      val df = rows.map { case (ok, ck, _, _) =>
        (ok, ck, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      }.toDF("o_orderkey", "o_custkey", "o_orderdate")
      val once = Aggregations.dedupOrdersByCustomer(df)
      assert(once.select("o_custkey").distinct().count() == once.count())
      val twice = Aggregations.dedupOrdersByCustomer(
        once.select(col("o_orderkey"), col("o_custkey"),
          col("first_orderdate").as("o_orderdate")))
      assert(twice.collect().toSet == once.collect().toSet)
    }
  }

  val textGen: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.choose(1L, 1000L)
      words <- Gen.listOfN(12, Gen.oneOf(
        "the", "cat", "runs", "alice@example.com", "https://x.io/p", "",
        "word", "and", "it", "###", "a1b2"))
    } yield (id, words.mkString(" "))).map(_.distinctBy(_._1))

  test("PII scrub is idempotent: scrubbing scrubbed text changes nothing") {
    import graft.text.TextAnalysis
    for (rows <- samples(textGen, 4)) {
      val docs = rows.toDF("doc_id", "text")
      val once = TextAnalysis.scrubPii(docs)
        .select(col("doc_id"), col("scrubbed").as("text"))
      val twice = TextAnalysis.scrubPii(once)
      val diff = twice.filter(col("scrubbed") =!= col("text") ||
        col("n_emails") =!= 0 || col("n_urls") =!= 0)
      assert(diff.count() == 0, "scrub not idempotent")
    }
  }

  test("repetition ratios stay in [0,1] and zero-shingle docs report zero") {
    import graft.text.TextAnalysis
    for (rows <- samples(textGen, 4)) {
      val stats = TextAnalysis.repetitionStats(rows.toDF("doc_id", "text")).collect()
      stats.foreach { r =>
        val (tok, sh) = (r.getDouble(2), r.getDouble(4))
        assert(tok >= 0.0 && tok <= 1.0 && sh >= 0.0 && sh <= 1.0, s"ratios out of range: $r")
        if (r.getLong(3) == 0L) assert(sh == 0.0)
      }
      assert(stats.length == rows.length) // every doc reports, even empty ones
    }
  }

  test("exact decimal sum equals BigDecimal reference for any partitioning") {
    val xsGen = Gen.nonEmptyListOf(Gen.choose(1, 10000000).map(_ / 100.0))
    for (xs <- samples(xsGen); parts <- Seq(1, 3, 8)) {
      val got = xs.toDF("x").repartition(parts)
        .agg(Aggregations.dsum(col("x"))).head.getDouble(0)
      val expected = xs.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(got == expected)
    }
  }

  // ---- round-3 operators: temporal joins and components vs independent
  // reference implementations on random inputs ----

  val eventsGen: Gen[List[(Long, Long, Long)]] = // (id, key, tsMicros)
    Gen.nonEmptyListOf(for {
      id <- Gen.choose(1L, 500L)
      key <- Gen.choose(1L, 5L)
      ts <- Gen.choose(0L, 3600L).map(_ * 1000000L)
    } yield (id, key, ts)).map(_.distinctBy(_._1))

  test("asofJoin agrees with the naive inequality-join reference") {
    for (li <- samples(eventsGen, 6); ri <- samples(eventsGen, 6)) {
      val left = li.map { case (id, k, t) => (id, k, new java.sql.Timestamp(t / 1000)) }
        .toDF("event_id", "user_id", "ts")
      // right unique per (key, ts): the asofJoin precondition
      val rRows = ri.groupBy(r => (r._2, r._3)).map(_._2.maxBy(_._1)).toSeq
      val right = rRows.map { case (id, k, t) => (k, new java.sql.Timestamp(t / 1000), id) }
        .toDF("user_id", "ts", "r_id")
      val got = graft.ops.Temporal.asofJoin(left, right, "user_id", "ts")
        .select(col("event_id"), col("asof_r_id"))
        .as[(Long, Option[Long])].collect().toMap
      // naive reference: max-ts right row at or before each left row
      val expected = li.map { case (id, k, t) =>
        val cands = rRows.filter(r => r._2 == k && r._3 <= t)
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(r => (r._3, r._1))._1))
      }.toMap
      assert(got == expected)
    }
  }

  test("timeProximityPairs agrees with the naive all-pairs reference") {
    for (li <- samples(eventsGen, 6); ri <- samples(eventsGen, 6); w <- Seq(60, 600)) {
      val left = li.map { case (id, k, t) => (id, k, new java.sql.Timestamp(t / 1000)) }
        .toDF("l_id", "user_id", "ts")
      val right = ri.map { case (id, k, t) => (id + 100000L, k, new java.sql.Timestamp(t / 1000)) }
        .toDF("r_id", "user_id", "ts")
      val got = graft.ops.Temporal.timeProximityPairs(left, right, "user_id", w)
        .select(col("l_id"), col("r_id")).as[(Long, Long)].collect().toSet
      val expected = (for {
        (lid, lk, lt) <- li
        (rid, rk, rt) <- ri
        if lk == rk && math.abs(lt - rt) <= w * 1000000L
      } yield (lid, rid + 100000L)).toSet
      assert(got == expected)
    }
  }

  val pairsGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      x <- Gen.choose(1L, 30L)
      y <- Gen.choose(1L, 30L)
      if x != y
    } yield (math.min(x, y), math.max(x, y)))

  test("connectedComponents agrees with a driver-side union-find") {
    for (pairs <- samples(pairsGen, 6)) {
      val df = pairs.toDF("doc_a", "doc_b")
      val got = graft.graph.Components.connectedComponents(df, "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      // reference: plain union-find over the same pairs
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      assert(got == expected)
      // every component label is the component minimum
      got.groupBy(_._2).foreach { case (label, members) =>
        assert(members.keys.min == label)
      }
    }
  }

  test("connectedComponentsStar agrees with a driver-side union-find") {
    for (pairs <- samples(pairsGen, 6)) {
      val df = pairs.toDF("doc_a", "doc_b")
      val got = graft.graph.Components.connectedComponentsStar(df, "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      assert(got == parent.keys.map(v => v -> find(v)).toMap)
    }
  }

  // ---- round-4 text operators vs driver-side references ----

  val docsGen: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.choose(1L, 40L)
      words <- Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x9", "zz"))
    } yield (id, words.mkString(" "))).map(_.distinctBy(_._1))

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  test("chunkDocuments agrees with a driver-side chunker for any k") {
    def md5hex16(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    for (docs <- samples(docsGen, 5); k <- Seq(1, 3, 7)) {
      val got = graft.text.TextAnalysis.chunkDocuments(docs.toDF("doc_id", "text"), k)
        .as[(Long, Long, Long, String)].collect().toSet
      val expected = (for {
        (id, text) <- docs
        (chunk, i) <- toks(text).grouped(k).zipWithIndex
      } yield (id, i.toLong, chunk.length.toLong, md5hex16(chunk.mkString(" ")))).toSet
      assert(got == expected)
    }
  }

  test("packDocuments agrees with a driver-side sequential packer") {
    def packRef(docs: List[(Long, String)], c: Int): Set[(Long, Long, Long, Long, Long)] = {
      var o = 0L
      val out = List.newBuilder[(Long, Long, Long, Long, Long)]
      for ((id, text) <- docs.sortBy(_._1); n = toks(text).length.toLong; if n > 0) {
        var s = o / c
        while (s <= (o + n - 1) / c) {
          val from = math.max(o, s * c)
          val until = math.min(o + n, (s + 1) * c)
          out += ((s, id, from - o, from - s * c, until - from))
          s += 1
        }
        o += n
      }
      out.result().toSet
    }
    for (docs <- samples(docsGen, 5); c <- Seq(1, 5, 64); buckets <- Seq(1, 4, 100)) {
      val got = graft.text.TextAnalysis.packDocuments(
        docs.toDF("doc_id", "text").repartition(3), c, buckets)
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(got.toSet == packRef(docs, c), s"c=$c buckets=$buckets")
      // every sequence except the last is exactly full — packing wastes
      // nothing; the driver reference already pins slice-level layout
      val bySeq = got.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
      if (bySeq.nonEmpty) {
        val last = bySeq.keys.max
        bySeq.foreach { case (seq, tot) => if (seq != last) assert(tot == c) }
      }
    }
  }

  test("unigramSurprisal agrees with a driver-side reference, any partitioning") {
    def r(x: Double, s: Int): BigDecimal =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    for (docs <- samples(docsGen, 5); parts <- Seq(1, 5)) {
      val got = graft.text.TextAnalysis.unigramSurprisal(
        docs.toDF("doc_id", "text").repartition(parts))
        .as[(Long, Long, Double)].collect().toSet
      val all = docs.flatMap { case (_, t) => toks(t) }
      val freq = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = all.size.toDouble
      val expected = (for {
        (id, text) <- docs
        ts = toks(text)
        if ts.nonEmpty
      } yield {
        val lpSum = ts.map(t => r(-math.log(freq(t) / n), 6)).sum
        (id, ts.size.toLong, r(lpSum.toDouble / ts.size, 4).toDouble)
      }).toSet
      assert(got == expected)
    }
  }

  test("sqQuantize agrees with a driver-side reference, any partitioning") {
    val vecGen: Gen[List[(Long, Seq[Float], Int)]] =
      Gen.nonEmptyListOf(for {
        id <- Gen.choose(0L, 500L)
        dims <- Gen.listOfN(6, Gen.choose(-1000, 1000).map(_ / 250.0f))
      } yield (id, dims, 0)).map(_.distinctBy(_._1))
    for (vecs <- samples(vecGen, 5); parts <- Seq(1, 4)) {
      val df = vecs.toDF("vec_id", "embedding", "label").repartition(parts)
      val got = graft.sim.Similarity.sqQuantize(df)
        .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
      // independent scalar reference of the same published formula
      val dim = vecs.head._2.size
      val mns = (0 until dim).map(i => vecs.map(_._2(i).toDouble).min)
      val mxs = (0 until dim).map(i => vecs.map(_._2(i).toDouble).max)
      val expected = vecs.map { case (id, v, _) =>
        id -> v.zipWithIndex.map { case (x, i) =>
          if (mxs(i) == mns(i)) 0
          else math.floor((x.toDouble - mns(i)) / (mxs(i) - mns(i)) * 255.0 + 0.5).toInt
        }
      }.toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("connectedComponentsStar contracts a path graph far beyond the min-label round budget") {
    // diameter 60 ≫ min-label's default maxIter 20: label propagation
    // would run out of rounds here; the star alternation contracts the
    // chain in O(log n) rounds and must land every vertex on component 0
    val n = 60
    val path = (0L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = graft.graph.Components.connectedComponentsStar(path, "doc_a", "doc_b")
      .as[(Long, Long)].collect()
    assert(got.length == n + 1 && got.forall(_._2 == 0L))
    // shuffled long chain (worst-case id layout for the contraction)
    val perm = new scala.util.Random(7).shuffle((0L to n).toVector)
    val shuffled = (0 until n.toInt).map(i => (perm(i), perm(i + 1))).toDF("doc_a", "doc_b")
    val got2 = graft.graph.Components.connectedComponentsStar(shuffled, "doc_a", "doc_b")
      .as[(Long, Long)].collect()
    assert(got2.length == n + 1 && got2.forall(_._2 == 0L))
  }
}
