package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Round-3 operators: temporal joins, window analytics, sampling,
  * semi/anti/set ops, cube, decontamination, embedding norms. */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ------------------------------------------------------------- as-of join

  test("asofJoin attaches the most recent right row at or before left.ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),   // after r2 -> matches r2
      (2L, 10L, ts("2024-01-01 08:59:59")),   // before any right -> null
      (3L, 10L, ts("2024-01-01 09:30:00")),   // exactly r1's ts -> matches r1 (>=)
      (4L, 20L, ts("2024-01-01 12:00:00")))   // other key, one match
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 101L), // r1
      (10L, ts("2024-01-01 09:45:00"), 102L), // r2
      (20L, ts("2024-01-01 11:00:00"), 201L))
      .toDF("user_id", "ts", "err_event_id")
    val got = Temporal.asofJoin(left, right, "user_id", "ts")
      .select(col("event_id"), col("asof_err_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(102L), 2L -> None, 3L -> Some(101L), 4L -> Some(201L)))
  }

  test("asofJoin ignores null-timestamp right rows (SQL ASOF semantics)") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, None, 999L),                                // null ts -> never matches
      (10L, Some(ts("2024-01-01 09:00:00")), 101L))
      .toDF("user_id", "ts", "err_event_id")
    val got = Temporal.asofJoin(left, right, "user_id", "ts")
      .select(col("asof_err_event_id")).as[Option[Long]].head()
    assert(got == Some(101L))
  }

  test("asofJoin matches SQL ASOF semantics against a windowed reference") {
    val events = graft.model.Tables.events(spark, sf)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errs = events.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("err_event_id"))
    val got = Temporal.asofJoin(clicks, errs, "user_id", "ts")
    // independent formulation: inequality join + max-ts pick
    val best = clicks.as("c")
      .join(errs.as("e"), col("c.user_id") === col("e.user_id") && col("e.ts") <= col("c.ts"))
      .groupBy(col("c.event_id").as("event_id"))
      .agg(max(struct(col("e.ts"), col("e.err_event_id"))).as("m"))
      .select(col("event_id"), col("m.err_event_id").as("ref_match"))
    val joined = got.join(best, Seq("event_id"), "left")
    assert(joined.filter(
      coalesce(col("asof_err_event_id"), lit(-1L)) =!= coalesce(col("ref_match"), lit(-1L)))
      .count() == 0)
    assert(got.count() == clicks.count())
  }

  // ------------------------------------------------------------- band join

  test("timeProximityPairs finds exactly the pairs within the band") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 23:59:30")),  // crosses a bucket boundary
      (3L, 200L, ts("2024-01-01 10:00:00")))  // key isolation
      .toDF("click_id", "user_id", "ts")
    val right = Seq(
      (100L, 11L, ts("2024-01-01 10:00:30")), // 30s from click 1 -> in
      (100L, 12L, ts("2024-01-01 10:02:00")), // 120s from click 1 -> out
      (100L, 13L, ts("2024-01-02 00:00:29")), // 59s from click 2, next bucket -> in
      (200L, 14L, ts("2024-01-01 10:00:10"))) // other key -> pairs with click 3 only
      .toDF("user_id", "err_id", "ts")
    val got = Temporal.timeProximityPairs(left, right, "user_id", windowSec = 60)
      .select(col("click_id"), col("err_id")).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 11L), (2L, 13L), (3L, 14L)))
  }

  test("timeProximityPairs emits no duplicate pairs across buckets") {
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:59"))).toDF("user_id", "click_id", "ts")
    val right = Seq((1L, 9L, ts("2024-01-01 00:01:01"))).toDF("user_id", "err_id", "ts")
    assert(Temporal.timeProximityPairs(left, right, "user_id", 60).count() == 1)
  }

  // ------------------------------------------------------- window analytics

  test("customerOrderGaps computes lag gaps, running and moving spend") {
    val orders = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 100.0),
      (2L, 10L, ts("2024-01-11 00:00:00"), 200.0),
      (3L, 10L, ts("2024-01-31 00:00:00"), 400.0),
      (4L, 10L, ts("2024-02-01 00:00:00"), 800.0),
      (5L, 20L, ts("2024-01-05 00:00:00"), 50.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = Windows.customerOrderGaps(orders)
      .select(col("o_orderkey"), col("gap_days"), col("running_spend"), col("mavg3_spend"))
      .as[(Long, Option[Long], Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((None, 100.0, 100.0)))
    assert(got(2L) == ((Some(10L), 300.0, 150.0)))
    assert(got(3L) == ((Some(20L), 700.0, 233.3333)))
    assert(got(4L) == ((Some(1L), 1500.0, 466.6667)))
    assert(got(5L) == ((None, 50.0, 50.0)))
  }

  // ------------------------------------------------------------- sampling

  test("modStratifiedSample keeps quota rows and drops unlisted strata") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "stratum")
    val got = Sampling.modStratifiedSample(df, "stratum", "id",
      Map("a" -> 0.5)) // b unlisted -> dropped
    val rows = got.select(col("id"), col("stratum")).as[(Long, String)].collect()
    assert(rows.forall(_._2 == "a"))
    assert(rows.forall(_._1 % 1000 < 500))
    // even ids 0..998 with id mod 1000 < 500 -> 0,2,..,498 = 250 rows
    assert(rows.length == 250)
  }

  test("modStratifiedSample is deterministic across runs") {
    val df = (0L until 500L).map(i => (i, "x")).toDF("id", "stratum")
    val a = Sampling.modStratifiedSample(df, "stratum", "id", Map("x" -> 0.3))
      .select(col("id")).as[Long].collect().toSet
    val b = Sampling.modStratifiedSample(df, "stratum", "id", Map("x" -> 0.3))
      .select(col("id")).as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("stratifiedSampleReport reports totals, sampled and rate per stratum") {
    val df = (0L until 1000L).map(i => (i, if (i < 600) "big" else "small")).toDF("id", "stratum")
    val got = Sampling.stratifiedSampleReport(df, "stratum", "id",
      Map("big" -> 0.1, "small" -> 1.0))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // ids 0..599 mod 1000 < 100 -> 100 sampled; 600..999 all sampled
    assert(got("big") == ((600L, 100L, 0.1667)))
    assert(got("small") == ((400L, 400L, 1.0)))
  }

  // ------------------------------------------------- semi / anti / set ops

  test("customersWithoutOrders is the year-scoped anti join") {
    val customer = Seq((1L, "c1", "SEG"), (2L, "c2", "SEG"), (3L, "c3", "SEG"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, ts("1995-03-01 00:00:00")),
      (11L, 2L, ts("1996-03-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = Joins.customersWithoutOrders(customer, orders, 1995)
      .select(col("c_custkey")).as[Long].collect().toSeq
    assert(got == Seq(2L, 3L))
  }

  test("customerChurn labels churned and retained cohorts") {
    val orders = Seq(
      (1L, 1L, ts("1995-06-01 00:00:00")),  // cust 1: 1995 only -> churned
      (2L, 2L, ts("1995-06-01 00:00:00")),  // cust 2: both -> retained
      (3L, 2L, ts("1996-06-01 00:00:00")),
      (4L, 3L, ts("1996-06-01 00:00:00")))  // cust 3: 1996 only -> absent
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = Joins.customerChurn(orders, 1995, 1996)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "churned"), (2L, "retained")))
  }

  // ------------------------------------------------------------------ cube

  test("cubeStats emits all four grouping sets consistently") {
    val lineitem = graft.model.Tables.lineitem(spark, sf)
    val got = Aggregations.cubeStats(lineitem).cache()
    val total = got.filter(col("gid") === 3)
    assert(total.count() == 1)
    val n = lineitem.count()
    assert(total.select(col("num_items")).as[Long].head() == n)
    // leaf cells (gid 0) sum to the grand total
    assert(got.filter(col("gid") === 0).agg(sum(col("num_items"))).as[Long].head() == n)
    // rolled-up labels surface as ALL, never null
    assert(got.filter(col("l_returnflag").isNull || col("l_linestatus").isNull).count() == 0)
    got.unpersist()
  }

  // ------------------------------------------------------- decontamination

  test("contaminationReport flags corpus docs sharing shingles with benchmark docs") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),        // benchmark (id % 20 == 0)
      (1L, "alpha beta gamma delta epsilon eta theta"),   // shares 5-gram prefix
      (2L, "one two three four five six seven"))          // disjoint
      .toDF("doc_id", "text")
    val got = graft.dedup.Dedup.contaminationReport(docs, k = 5, benchMod = 20)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(!got.contains(0L))                    // benchmark docs excluded
    assert(got(1L)._2 == 1L && got(1L)._3 > 0.0) // "alpha beta gamma delta epsilon" shared
    assert(got(2L)._2 == 0L && got(2L)._3 == 0.0)
  }

  // ------------------------------------------------------- embedding norms

  test("embeddingNorms computes dim, l2 and mean; empty vectors report null") {
    val rows = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array.empty[Float]))    // broken-encoder row: null, not 0.0/NaN
    val got = rows.toDF("vec_id", "embedding")
    val out = graft.sim.Similarity.embeddingNorms(got)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, Some(5.0), Some(3.5))))
    assert(out(2L) == ((2L, Some(0.0), Some(0.0))))
    assert(out(3L) == ((0L, None, None)))
  }

  // ------------------------------------------------- winsorize / deciles

  test("winsorizedPriceStats clips at the per-group percentiles") {
    val orders = ((1 to 98).map(i => (i.toLong, "P", i * 100.0)) ++
      Seq((99L, "P", 1000000.0), (100L, "P", 0.01)))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r = Aggregations.winsorizedPriceStats(orders).head()
    assert(r.getLong(r.fieldIndex("n")) == 100L)
    // exactly the values strictly outside [p05, p95] are counted
    val pLo = r.getDouble(r.fieldIndex("p_lo"))
    val pHi = r.getDouble(r.fieldIndex("p_hi"))
    val expLo = orders.filter(col("o_totalprice") < pLo).count()
    val expHi = orders.filter(col("o_totalprice") > pHi).count()
    assert(r.getLong(r.fieldIndex("n_clipped_lo")) == expLo && expLo > 0)
    assert(r.getLong(r.fieldIndex("n_clipped_hi")) == expHi && expHi > 0)
    // the winsorized mean is immune to the outlier magnitude
    val r2 = Aggregations.winsorizedPriceStats(
      orders.withColumn("o_totalprice",
        when(col("o_orderkey") === 99L, 1.0e9).otherwise(col("o_totalprice")))).head()
    assert(r2.getDouble(r2.fieldIndex("mean_winsorized")) ==
      r.getDouble(r.fieldIndex("mean_winsorized")))
  }

  test("qualityDeciles buckets every document and keeps ties together") {
    val docs = graft.model.Tables.documents(spark, sf)
    val got = Aggregations.qualityDeciles(docs).cache()
    val total = got.agg(sum(col("n_docs"))).as[Long].head()
    assert(total == docs.count())
    // monotone score ranges across deciles
    val rows = got.select(col("decile"), col("min_score"), col("max_score"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, s"deciles overlap: $a vs $b")
      case _ =>
    }
    got.unpersist()
  }

  test("domainMixReport maximizes corpus size subject to target shares") {
    // en abundant, fr scarce: fr binds the capacity and keeps 100%
    val df = ((0L until 800L).map(i => (i, "en")) ++
      (0L until 100L).map(i => (i + 1000L, "fr"))).toDF("doc_id", "lang")
    val got = Sampling.domainMixReport(df, "lang", "doc_id",
      Map("en" -> 0.5, "fr" -> 0.5))
      .select(col("lang"), col("quota_milli"), col("n_sampled"), col("achieved_share"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // capacity = min(800/0.5, 100/0.5) = 200 -> en rate 200*0.5/800 = 0.125,
    // fr rate 1.0; en ids 0..799 with id%1000<125 -> 125 sampled
    assert(got("fr") == ((1000L, 100L, 0.4444)))
    assert(got("en") == ((125L, 125L, 0.5556)))
    // strata without a target share are excluded entirely
    val withOther = df.union(Seq((5000L, "zz")).toDF("doc_id", "lang"))
    val langs = Sampling.domainMixReport(withOther, "lang", "doc_id",
      Map("en" -> 0.5, "fr" -> 0.5)).select("lang").as[String].collect().toSet
    assert(langs == Set("en", "fr"))
  }

  test("rendezvousShard: balanced, stable under growth (~1/(N+1) movement), beats mod-N") {
    val df = (0L until 9000L).map(i => (i, s"row$i")).toDF("doc_id", "payload")
    val shards = df
      .withColumn("s8", Sampling.rendezvousShard(col("doc_id"), 8))
      .withColumn("s9", Sampling.rendezvousShard(col("doc_id"), 9))
      .withColumn("m8", pmod(col("doc_id"), lit(8)).cast("int"))
      .withColumn("m9", pmod(col("doc_id"), lit(9)).cast("int"))
      .select("doc_id", "s8", "s9", "m8", "m9")
      .as[(Long, Int, Int, Int, Int)].collect()
    // roughly balanced: every shard within 2x of the uniform share
    val byShard = shards.groupBy(_._2).view.mapValues(_.length)
    assert(byShard.size == 8 && byShard.values.forall(n => n > 9000 / 16 && n < 9000 / 4),
      s"imbalanced: $byShard")
    // minimal movement: growing 8 -> 9 moves ~1/9 of keys (and every
    // moved key lands on the NEW shard — the rendezvous invariant: the
    // old winners' weights are unchanged, only shard 8 can newly win)
    val moved = shards.filter(r => r._2 != r._3)
    assert(moved.forall(_._3 == 8), "a moved key landed on an old shard")
    val frac = moved.length.toDouble / shards.length
    assert(frac > 0.05 && frac < 0.18, s"movement fraction $frac not ~1/9")
    // the mod-N counterfactual reshuffles nearly everything
    val modMoved = shards.count(r => r._4 != r._5).toDouble / shards.length
    assert(modMoved > 0.8, s"mod-N moved only $modMoved")
  }

  test("deterministicShuffle: seeded, shard is the key prefix, partition-stable") {
    val df = (0L until 2000L).map(i => (i, s"row$i")).toDF("doc_id", "payload")
    val a = Sampling.deterministicShuffle(df, "doc_id", seed = 7L)
      .select("doc_id", "shuffle_key", "shard")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val b = Sampling.deterministicShuffle(df.repartition(13), "doc_id", seed = 7L)
      .select("doc_id", "shuffle_key", "shard")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq) // replayable under any partitioning
    assert(a.forall { case (_, key, shard) => shard == key.take(2) })
    // a different seed permutes: the induced orderings must differ
    val c = Sampling.deterministicShuffle(df, "doc_id", seed = 8L)
      .select("doc_id", "shuffle_key").as[(Long, String)].collect()
    assert(a.sortBy(_._2).map(_._1).toSeq != c.sortBy(_._2).map(_._1).toSeq)
    // report partitions the corpus exactly: shard counts sum to the total
    val rep = Sampling.shuffleReport(df, "doc_id", seed = 7L)
    assert(rep.agg(sum("n_rows")).head.getLong(0) == 2000L)
    // md5 prefixes spread: all 256 shards populated at this size
    assert(rep.count() == 256L)
  }

  test("hashSplit: total, deterministic, growth-stable, seed-sensitive") {
    val small = (0L until 500L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val grown = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    def splits(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Sampling.hashSplit(df, "doc_id", seed).select("doc_id", "split")
        .as[(Long, String)].collect().toMap
    val s1 = splits(small, 42L)
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(s1.size == 500)
    // appending rows never reassigns existing ones (pure function of id)
    val s2 = splits(grown, 42L)
    assert(s1.forall { case (id, sp) => s2(id) == sp })
    // near the intended 26/26/204 of 256 at this size
    val rates = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(rates("test") > 20 && rates("test") < 90)
    assert(rates("val") > 20 && rates("val") < 90)
    assert(rates("train") > 300)
    // a different seed produces a different assignment somewhere
    assert(splits(small, 43L) != s1)
    // the report's shares sum to 1 within each stratum
    val rep = Sampling.splitReport(small, "source", "doc_id", 42L)
    val bySource = rep.select("source", "share").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    bySource.values.foreach(s => assert(math.abs(s - 1.0) < 0.001))
  }

  test("temperatureMixReport: alpha flattens the head, invariants hold") {
    // two strata with 4:1 mass — at alpha 0.5 the big stratum's share
    // drops from 0.8 to sqrt(.8)/(sqrt(.8)+sqrt(.2)) = 2/3; factors are
    // w/p and the w column sums to 1
    val df = Seq.tabulate(100)(i =>
      (i.toLong, if (i < 80) "big" else "small", 10L))
      .toDF("doc_id", "lang", "n_chars")
    val rows = Sampling.temperatureMixReport(df, "lang", "n_chars", alpha = 0.5)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("big") == (("big", 80L, 800L, 0.8, 0.6667, 0.8333)))
    assert(rows("small") == (("small", 20L, 200L, 0.2, 0.3333, 1.6667)))
    // alpha = 1 is proportional: factor 1.0 everywhere
    Sampling.temperatureMixReport(df, "lang", "n_chars", alpha = 1.0)
      .select("sample_factor").as[Double].collect()
      .foreach(f => assert(f == 1.0))
  }

  test("funnelReport: first-touch ordering, drop-offs, out-of-order excluded") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // u1 completes in order; u2 stops after click; u3 purchases BEFORE its
    // click (must not count as step 3); u4 never views (absent everywhere —
    // funnel is anchored at step 1)
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "view", ts(1)), (2L, "click", ts(5)),
      (3L, "view", ts(1)), (3L, "purchase", ts(2)), (3L, "click", ts(4)),
      (4L, "click", ts(1)), (4L, "purchase", ts(2)))
      .toDF("user_id", "event_type", "ts")
    val got = Temporal.funnelReport(ev, Seq("view", "click", "purchase"))
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "view", 3L, 1.0),
      (2L, "click", 3L, 1.0),
      (3L, "purchase", 1L, 0.3333)), s"got $got")
  }

  test("retentionCohorts: per-cohort offsets, offset 0 full, churn counted once") {
    import java.sql.Timestamp
    def ts(d: Int, h: Int = 9) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // cohort of Mon Jan 1: u1 active weeks 0 and 2 (twice in week 2 ->
    // still one active row), u2 only week 0; cohort of Mon Jan 8: u3
    // active weeks 0 and 1
    val ev = Seq(
      (1L, ts(2)), (1L, ts(16)), (1L, ts(17)),
      (2L, ts(3)),
      (3L, ts(9)), (3L, ts(18)))
      .toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val got = Temporal.retentionCohorts(ev)
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("c"),
        col("week_offset"), col("n_active"), col("retention"))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L, 1.0),
      ("2024-01-01", 2L, 1L, 0.5),
      ("2024-01-08", 0L, 1L, 1.0),
      ("2024-01-08", 1L, 1L, 1.0)), s"got $got")
  }

  test("activityReport: trailing-7-day WAU windows and stickiness ratios") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 09:00:00")
    // u1 daily on days 1 and 9; u2 only day 1. Day 9's trailing week
    // [3..9] holds only u1 -> wau 1; day 1 holds both -> wau 2.
    val ev = Seq((1L, ts(1)), (2L, ts(1)), (1L, ts(9)))
      .toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val got = Temporal.activityReport(ev)
      .select(date_format(col("day"), "yyyy-MM-dd"), col("dau"), col("wau"), col("stickiness"))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-09", 1L, 1L, 1.0)), s"got $got")
    // overlapping window: u2 returns day 5 -> day 9 week [3..9] now has u1+u2
    val ev2 = (ev.as[(Long, Timestamp, String)].collect().toSeq :+
      ((2L, ts(5), "view"))).toDF("user_id", "ts", "event_type")
    val d9 = Temporal.activityReport(ev2)
      .filter(date_format(col("day"), "yyyy-MM-dd") === "2024-01-09")
      .select(col("dau"), col("wau"), col("stickiness"))
      .as[(Long, Long, Double)].head()
    assert(d9 == ((1L, 2L, 0.5)), s"got $d9")
  }

  test("lastTouchAttribution: latest touch wins, lookback bounds, ties count, direct fallback") {
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      // u1: view then click then purchase -> click (latest touch wins)
      (1L, ts(1, 9), 1L, "view", 0.0),
      (2L, ts(1, 10), 1L, "click", 0.0),
      (3L, ts(1, 11), 1L, "purchase", 10.0),
      // u2: purchase with no prior touch -> direct
      (4L, ts(1, 9), 2L, "purchase", 5.0),
      // u3: click 8 days before purchase -> outside 7-day lookback, direct
      (5L, ts(1, 9), 3L, "click", 0.0),
      (6L, ts(9, 10), 3L, "purchase", 7.0),
      // u4: signup at the SAME timestamp as the purchase -> still counts
      // (touches order before conversions at equal ts)
      (7L, ts(2, 9), 4L, "signup", 0.0),
      (8L, ts(2, 9), 4L, "purchase", 3.0),
      // u5: error events are not attributable touches -> direct
      (9L, ts(3, 9), 5L, "error", 0.0),
      (10L, ts(3, 10), 5L, "purchase", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Temporal.lastTouchAttribution(
      ev, "purchase", Seq("click", "view", "signup"), lookbackSec = 7L * 86400)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("click", 1L, 10.0),
      ("direct", 3L, 14.0),
      ("signup", 1L, 3.0)), s"got $got")
  }

  test("reservoirPerKey: exactly k per big group, all rows for small, seeded and deterministic") {
    val df = ((1 to 40).map(i => (i.toLong, "big")) ++
      Seq((100L, "small"), (101L, "small")))
      .toDF("doc_id", "source")
    val s42 = Sampling.reservoirPerKey(df, "source", "doc_id", k = 5, seed = 42L)
      .as[(String, Long, Long)].collect().toSeq
    assert(s42.count(_._1 == "big") == 5)
    assert(s42.filter(_._1 == "small").map(_._2).toSet == Set(100L, 101L))
    assert(s42.filter(_._1 == "big").map(_._3) == Seq(1L, 2L, 3L, 4L, 5L))
    // deterministic replay, regardless of partitioning
    val again = Sampling.reservoirPerKey(df.repartition(7), "source", "doc_id", 5, 42L)
      .as[(String, Long, Long)].collect().toSeq
    assert(s42 == again)
    // a different seed draws a different sample (40 choose 5 makes a
    // collision astronomically unlikely; equality would mean the seed is dead)
    val s7 = Sampling.reservoirPerKey(df, "source", "doc_id", 5, 7L)
      .as[(String, Long, Long)].collect().toSeq
    assert(s42.filter(_._1 == "big").map(_._2) != s7.filter(_._1 == "big").map(_._2))
  }

  test("nucleusSelect: minimal mass-covering prefix, exact boundary, singleton stratum") {
    val df = Seq(
      (1L, "A", 50L), (2L, "A", 30L), (3L, "A", 20L),
      (9L, "B", 7L))
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.nucleusSelect(df, "source", "n_chars", "doc_id", p10000 = 8000)
      .as[(String, Long, Long, Double)].collect().toSeq
    // A: 50 (prev 0) and 30 (prev 50 < 80) kept; 20 (prev 80, NOT < 80) excluded
    assert(got == Seq(
      ("A", 1L, 50L, 0.5),
      ("A", 2L, 30L, 0.8),
      ("B", 9L, 7L, 1.0)), s"got $got")
    // p = 100% keeps everything
    assert(Sampling.nucleusSelect(df, "source", "n_chars", "doc_id", 10000)
      .count() == 4)
  }

  test("temperatureSample: alpha=1 keeps everything; alpha<1 boosts the tail to 100%") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, if (i < 80) "big" else "small", 10L))
      .toDF("doc_id", "lang", "n_chars")
    val id = Sampling.temperatureSample(df, "lang", "n_chars", "doc_id", alpha = 1.0)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(id == Seq(("big", 80L, 1.0, 80L), ("small", 20L, 1.0, 20L)), s"got $id")
    // alpha .5 on the 4:1 mix: big's factor 0.8333 -> quota 833; every big
    // id (0..79) sits under 833 in the mod space, so the CAP story is in
    // the rate column; small upsamples -> capped at 1.0, keeps all
    val t = Sampling.temperatureSample(df, "lang", "n_chars", "doc_id", alpha = 0.5)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(t == Seq(("big", 80L, 0.833, 80L), ("small", 20L, 1.0, 20L)), s"got $t")
  }

  test("splitLeakageReport: planted cross-boundary twin lands off-diagonal") {
    // replicate the hashSplit rule to pick ids deterministically per split
    def splitOf(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"42:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val b = hex.substring(0, 2)
      if (b < "1a") "test" else if (b < "34") "val" else "train"
    }
    val testId = (1L to 300L).find(splitOf(_) == "test").get
    val trainIds = (1L to 300L).filter(splitOf(_) == "train").take(3)
    val run = (1 to 12).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (testId, s"$run leak"),                 // near-twin of a train doc
      (trainIds(0), s"$run tail"),
      (trainIds(1), s"$run other"),           // second twin: within-train pair too
      (trainIds(2), "entirely different text with its own words here"))
      .toDF("doc_id", "text")
    val got = Sampling.splitLeakageReport(d)
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("test", "train", 2L, true),
      ("train", "train", 1L, false)), s"got $got")

    // the FIX on the identical fixture: the cluster split keeps every
    // near-dup cluster intact, so the same twin pair that leaked above
    // cannot leak here — zero cross-split rows by construction
    val safe = Sampling.clusterSafeSplit(d)
      .as[(Long, Long, String)].collect().toSeq
    assert(safe.map(_._1).sorted ==
      (Seq(testId) ++ trainIds).sorted, "a doc lost its assignment")
    val byCluster = safe.groupBy(_._2).values
    byCluster.foreach(c => assert(c.map(_._3).distinct.size == 1,
      s"cluster straddles splits: $c"))
    val audit = Sampling.clusterSafeLeakageReport(d)
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(audit.forall(!_._4), s"cluster split leaked: $audit")
    assert(audit.map(_._3).sum == 3L, s"pair count changed: $audit")
  }

  test("decayedPopularity: exact half-life weights, anchored at corpus max ts") {
    import java.sql.Timestamp
    // max ts is the purchase; the view sits exactly 7 days (one half-life)
    // earlier -> weight 0.5; the click exactly 14 days earlier -> 0.25
    val ev = Seq(
      (1L, "purchase", Timestamp.valueOf("2024-01-15 00:00:00")),
      (2L, "view", Timestamp.valueOf("2024-01-08 00:00:00")),
      (3L, "view", Timestamp.valueOf("2024-01-15 00:00:00")),
      (4L, "click", Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Temporal.decayedPopularity(ev, halfLifeDays = 7.0)
      .as[(String, Long, Double)].collect().toSeq
    // view: 0.5 + 1.0 = 1.5; purchase: 1.0 (age 0); click: 0.25
    assert(got == Seq(("view", 2L, 1.5), ("purchase", 1L, 1.0),
      ("click", 1L, 0.25)), s"got $got")
  }

  test("eventTransitions: per-user sequences, id tiebreak, row-normalized probabilities") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // u1: A->B->A; u2: lone event (no pair); u3: simultaneous ts, event_id
    // order decides C->D (not D->C)
    val ev = Seq(
      (1L, 1L, "A", ts(1)), (2L, 1L, "B", ts(2)), (3L, 1L, "A", ts(3)),
      (4L, 2L, "A", ts(1)),
      (11L, 3L, "C", ts(5)), (12L, 3L, "D", ts(5)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Temporal.eventTransitions(ev)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("A", "B", 1L, 1.0), ("B", "A", 1L, 1.0),
      ("C", "D", 1L, 1.0)), s"got $got")
  }

  test("hourlyAnomalies: warm-up nulls, flat-baseline spike flagged, frame excludes self") {
    import java.sql.Timestamp
    // 30 hours of exactly 2 events, then one spike hour with 12: trailing
    // mean stays 2, stddev 0 -> no verdict until the spike enters a frame
    // WITH variance; instead plant a baseline alternating 1/3 so stddev>0
    def hr(h: Int) = Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h.toLong))
    val base = (0 until 30).flatMap { h =>
      val n = if (h % 2 == 0) 1 else 3
      (0 until n).map(i => (i.toLong, "view", hr(h)))
    }
    val spike = (0 until 12).map(i => (100L + i, "view", hr(30)))
    val ev = (base ++ spike).toDF("user_id", "event_type", "ts")
    val got = Temporal.hourlyAnomalies(ev, minTrailing = 6).collect()
    assert(got.length == 31)
    // first 6 hours: fewer than minTrailing observations -> null z
    got.take(6).foreach(r => assert(r.isNullAt(r.fieldIndex("z_score"))))
    val last = got.last
    // spike hour: trailing 24 observed hours alternate 1/3 -> mean 2,
    // stddev_samp ~1.0215; z = (12-2)/std ~ 9.79 -> anomaly
    assert(last.getLong(last.fieldIndex("n_events")) == 12L)
    assert(last.getBoolean(last.fieldIndex("is_anomaly")),
      s"spike not flagged: $last")
    assert(last.getDouble(last.fieldIndex("z_score")) > 3.0)
    // a mid-series baseline hour is NOT flagged
    val mid = got(20)
    assert(!mid.getBoolean(mid.fieldIndex("is_anomaly")), s"false positive: $mid")
  }

  test("dailyTypePivot: pinned columns, zero fill, unlisted type ignored") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, "view", Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, "view", Timestamp.valueOf("2024-01-01 11:00:00")),
      (3L, "click", Timestamp.valueOf("2024-01-02 10:00:00")),
      (4L, "mystery", Timestamp.valueOf("2024-01-02 10:00:00")))
      .toDF("event_id", "event_type", "ts")
    val got = Temporal.dailyTypePivot(ev, Seq("click", "view"))
      .as[(Timestamp, Long, Long)].collect().toSeq
    assert(got == Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 0L, 2L),
      (Timestamp.valueOf("2024-01-02 00:00:00"), 1L, 0L)), s"got $got")
  }

  test("meltDailyPivot: exact inverse of the pivot, zeros survive as rows") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, "view", Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, "click", Timestamp.valueOf("2024-01-02 10:00:00")))
      .toDF("event_id", "event_type", "ts")
    val types = Seq("click", "view")
    val melted = Temporal.meltDailyPivot(
      Temporal.dailyTypePivot(ev, types), types)
      .as[(Timestamp, String, Long)].collect().toSeq
    assert(melted == Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), "click", 0L),
      (Timestamp.valueOf("2024-01-01 00:00:00"), "view", 1L),
      (Timestamp.valueOf("2024-01-02 00:00:00"), "click", 1L),
      (Timestamp.valueOf("2024-01-02 00:00:00"), "view", 0L)), s"got $melted")
  }

  test("dateSpine: gap days present, ISO dow, week and month starts") {
    import java.sql.Timestamp
    // events on Mon Jan 1 and Thu Jan 4 only -> spine has all 4 days
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 15:00:00")),
      (2L, Timestamp.valueOf("2024-01-04 03:00:00")))
      .toDF("event_id", "ts")
    val got = Temporal.dateSpine(ev)
      .as[(Timestamp, Long, Timestamp, Timestamp)].collect().toSeq
    assert(got.map(_._1.toString.take(10)) ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"), s"got $got")
    assert(got.map(_._2) == Seq(1L, 2L, 3L, 4L), s"dow: $got") // Jan 1 2024 is a Monday
    assert(got.forall(_._3 == Timestamp.valueOf("2024-01-01 00:00:00")), s"week: $got")
    assert(got.forall(_._4 == Timestamp.valueOf("2024-01-01 00:00:00")), s"month: $got")
  }

  test("systematicWeightedSample: picks at step crossings, multiplicity, zero-weight skipped") {
    // weights 3,4,0,5,9 in id order; cum = 3,7,7,12,21; step 5.
    // crossings: id 2 crosses 5 (7 div 5 = 1 > 0), id 4 crosses 10
    // (12 div 5 = 2 > 1), id 5 crosses 15 AND 20 -> n_picks 2 (21 div 5 =
    // 4 > 2); id 1 and the zero-weight id 3 never cross
    val d = Seq((1L, 3L), (2L, 4L), (3L, 0L), (4L, 5L), (5L, 9L))
      .toDF("doc_id", "n_chars")
    val got = Sampling.systematicWeightedSample(d, "n_chars", "doc_id", step = 5L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 4L, 1L), (4L, 5L, 1L), (5L, 9L, 2L)), s"got $got")
    // expected size tracks total/step: heavy rows always selected
    val heavy = Seq((1L, 100L), (2L, 1L)).toDF("doc_id", "n_chars")
    val h = Sampling.systematicWeightedSample(heavy, "n_chars", "doc_id", step = 10L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(h.head == ((1L, 100L, 10L)), s"got $h")
  }

  test("sessionize: gap splits, boundary-exact gap kept, per-session stats") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // u1: 10:00 view, 10:10 click (same session), 11:00 view (50-min gap ->
    // new session); u2: one event; u3: gap of EXACTLY 30 min stays one
    // session (boundary is > gap, not >=)
    val ev = Seq(
      (1L, 1L, "view", ts(10, 0)), (2L, 1L, "click", ts(10, 10)),
      (3L, 1L, "view", ts(11, 0)),
      (4L, 2L, "view", ts(9, 0)),
      (5L, 3L, "view", ts(9, 0)), (6L, 3L, "view", ts(9, 30)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Temporal.sessionize(ev, gapMinutes = 30)
      .select("user_id", "session_idx", "n_events", "n_types", "duration_sec")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 2L, 2L, 600L), (1L, 2L, 1L, 1L, 0L),
      (2L, 1L, 1L, 1L, 0L),
      (3L, 1L, 2L, 1L, 1800L)), s"got $got")
  }
}
