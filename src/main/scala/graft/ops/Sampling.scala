package graft.ops

import graft.Tier.PinOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stratified sampling for training-data curation (north-star scope; the
  * reference's only sampling is a flat seeded 10% before ALS,
  * `run_alsrecs_job.py:55` — SURVEY.md §2.5 O5).
  *
  * Two flavors, both map-side (zero shuffle — the filter composes with
  * whatever follows):
  *   - [[modStratifiedSample]]: deterministic quota sampling on a stable
  *     row id — `id mod 1000 < quota(stratum)`. Reproducible across runs,
  *     engines, and retries (the property that matters when the sample
  *     defines a training set); exactly checkable by the SQL oracle.
  *   - [[rngStratifiedSample]]: Spark's Bernoulli `sampleBy` — unbiased
  *     when ids may carry structure, but only replayable within one
  *     partitioning (seeded rand is evaluated per row in partition order).
  */
object Sampling {

  /** Deterministic per-stratum quota filter: keep a row iff
    * `pmod(idCol, 1000) < round(fraction(stratum) · 1000)`. Unlisted strata
    * are dropped. Quotas quantize to 1/1000ths — the resolution of the mod
    * space; at production scale use a 64-bit hash of a business key as
    * `idCol` (sequential ids can alias generation patterns). */
  def modStratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                          fractions: Map[String, Double]): DataFrame = {
    val quota = fractions.foldLeft(lit(-1L)) { case (acc, (stratum, frac)) =>
      when(col(strataCol) === stratum, lit(math.round(frac * 1000))).otherwise(acc)
    }
    df.filter(pmod(col(idCol), lit(1000L)) < quota)
  }

  /** Per-stratum counts before/after sampling — the audit report a quota
    * sample ships with (achieved rate vs requested). */
  def stratifiedSampleReport(df: DataFrame, strataCol: String, idCol: String,
                             fractions: Map[String, Double]): DataFrame = {
    val sampled = modStratifiedSample(df, strataCol, idCol, fractions)
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n_sampled"))
    df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_total"))
      .join(sampled, Seq(strataCol), "left")
      .select(col(strataCol), col("n_total"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        round(coalesce(col("n_sampled"), lit(0L)).cast("double") / col("n_total"), 4)
          .as("achieved_rate"))
      .orderBy(col(strataCol))
  }

  /** Domain mixing — derive per-stratum sampling quotas from TARGET corpus
    * shares (the data-mixing step of training-set construction: "40% en,
    * 15% each of de/es/fr/zh"), maximizing corpus size subject to
    * availability: capacity = min over strata of n_i / share_i, then
    * rate_i = capacity · share_i / n_i (the binding stratum keeps 100%).
    * Rates quantize to the same 1/1000 mod space as
    * [[modStratifiedSample]]; every arithmetic step is plain IEEE double /
    * integer math in a fixed order, so the SQL oracle reproduces the plan
    * bit-for-bit. One aggregate over the corpus, a stratum-count-sized
    * broadcast join back, one filter — no shuffle of the corpus itself. */
  def domainMixReport(df: DataFrame, strataCol: String, idCol: String,
                      targetShares: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val shares = targetShares.toSeq.toDF(strataCol, "target_share")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_total"))
      .join(shares, Seq(strataCol))
    val capacity = counts
      .agg(min(col("n_total") / col("target_share")).as("capacity"))
    val quotas = counts.join(broadcast(capacity))
      .select(col(strataCol), col("n_total"), col("target_share"),
        floor(least(lit(1.0),
          col("capacity") * col("target_share") / col("n_total")) * 1000)
          .cast("bigint").as("quota_milli"))
    val sampled = df
      .join(broadcast(quotas.select(col(strataCol), col("quota_milli"))), Seq(strataCol))
      .filter(pmod(col(idCol), lit(1000L)) < col("quota_milli"))
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n_sampled"))
    val total = sampled.agg(sum(col("n_sampled")).as("n_mix"))
    quotas
      // sampled is stratum-sized; broadcast it (right side of the left
      // outer — the preserved quotas side cannot be the build side)
      .join(broadcast(sampled), Seq(strataCol), "left")
      .join(broadcast(total))
      .select(col(strataCol), col("n_total"), col("target_share"),
        col("quota_milli"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        round(coalesce(col("n_sampled"), lit(0L)).cast("double") / col("n_mix"), 4)
          .as("achieved_share"))
      .orderBy(col(strataCol))
  }

  /** Temperature-weighted domain resampling — the OTHER standard mix
    * policy, complementing [[domainMixReport]]'s explicit target shares:
    * derive each stratum's training share from its natural corpus mass via
    * the α-temperature rule used by multilingual LMs (mT5 §3.1 /
    * XLM-R §3: w_i = p_i^α / Σ_j p_j^α, α < 1 flattens the head and
    * up-weights low-resource strata; α = 1 is proportional, α = 0 uniform).
    * Output per stratum: corpus mass `(n_docs, mass)`, its natural share
    * `p`, the temperature share `w`, and `sample_factor = w / p` — the
    * expected per-document duplication (>1 = upsampled epochs, <1 =
    * downsampled) at a fixed total training budget.
    *
    * Scale shape: one aggregate over the corpus, then arithmetic over the
    * stratum-count-sized result with two one-row broadcast totals — the
    * corpus itself is never reshuffled. All math is IEEE double in a fixed
    * order, rounded at the gate boundary for the cross-engine compare. */
  def temperatureMixReport(df: DataFrame, strataCol: String,
                           massCol: String, alpha: Double): DataFrame = {
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(massCol)).cast("bigint").as("mass"))
    val tot = counts.agg(sum(col("mass")).as("mass_total"))
    val withP = counts.crossJoin(broadcast(tot))
      .withColumn("p", col("mass") / col("mass_total"))
    val z = withP.agg(sum(pow(col("p"), lit(alpha))).as("z"))
    withP.crossJoin(broadcast(z))
      .select(col(strataCol), col("n_docs"), col("mass"),
        round(col("p"), 4).as("p"),
        round(pow(col("p"), lit(alpha)) / col("z"), 4).as("w"),
        round(pow(col("p"), lit(alpha)) / col("z") / col("p"), 4)
          .as("sample_factor"))
      .orderBy(col(strataCol))
  }

  /** Deterministic corpus shuffle — the reproducible pre-epoch shuffle a
    * training pipeline needs: every row gets a pseudo-random but seeded
    * sort key (md5 of seed ‖ id — md5 so the SQL oracle reproduces it
    * exactly; xxhash64 would be faster but engine-private) plus a shard id
    * that is the KEY'S OWN leading byte. Because the shard is a prefix of
    * the key, reading shards in shard order and rows in key order within
    * each shard IS the global shuffled order — so at scale this is one
    * map-side projection + a repartition on the 256-value shard column +
    * `sortWithinPartitions(shuffle_key)`, never a global sort. Shard
    * population is near-uniform (md5 bytes), so no shard skews. The shard
    * stays the raw two-hex-char prefix: fixed-width hex sorts the same
    * lexically and numerically, and every engine agrees on substr. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string"))))
      .withColumn("shard", substring(col("shuffle_key"), 1, 2))

  /** Gate-facing shard report for [[deterministicShuffle]]: per-shard row
    * count plus the first key — enough for the oracle to pin both the key
    * derivation and the shard split without dumping every row. */
  def shuffleReport(df: DataFrame, idCol: String, seed: Long): DataFrame =
    deterministicShuffle(df, idCol, seed)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), min(col("shuffle_key")).as("first_key"))
      .orderBy(col("shard"))

  /** Rendezvous (highest-random-weight) sharding (Thaler & Ravishankar
    * 1996): shard(x) = argmax over shards s of hash(x, s) — the
    * RESHARDING-STABLE assignment. Growing N → N+1 shards re-evaluates
    * the same per-(key, shard) weights plus one new contender, so a key
    * moves ONLY if the new shard wins its argmax: expected movement is
    * 1/(N+1) of the corpus — where `hash(x) mod N → mod N+1` reassigns
    * ~N/(N+1) of it, a near-total reshuffle of a 100 TB layout every
    * time capacity changes. Weights: ONE [[graft.functions.PolyHash]]
    * base value per key mapped through per-shard order-1 universal
    * constants ([[rendezvousPerm]]) — hashing `"$s:$key"` directly would
    * make the weight AFFINE in the shard's digit character and the
    * argmax degenerate (observed: 2 of 8 shards populated); the affine
    * family with pseudo-random per-shard (a, b) decorrelates shards
    * while staying exactly DuckDB-replicable (ties break to the higher
    * shard id via the struct max, mirrored by the oracle's rank order).
    * Map-side, zero shuffle, codegen'd; one string hash per key however
    * many shards. */
  def rendezvousShard(idCol: Column, nShards: Int): Column = {
    require(nShards >= 1, s"rendezvousShard: need nShards >= 1, got $nShards")
    val h = graft.functions.PolyHash.poly_hash(
      concat(lit("rdv:"), idCol.cast("string")))
    val p = graft.functions.PolyHash.Mod
    val contenders = (0 until nShards).map { s =>
      val (a, b) = rendezvousPerm(s)
      struct(((lit(a) * h + lit(b)) % lit(p)).as("wt"), lit(s).as("shard"))
    }
    array_max(array(contenders: _*)).getField("shard")
  }

  /** Per-shard universal-family constants — the minhashPerm derivation at
    * offset 192+ (disjoint from MinHash 0–63, SimHash 64–127, Count-Min
    * 128–191). */
  def rendezvousPerm(s: Int): (Long, Long) =
    graft.dedup.Dedup.minhashPerm(192 + s)

  /** Gate-facing resharding audit: assign every row under `nShards` AND
    * `nShards + 1`, then report per-shard counts plus how many rows the
    * grow-by-one resharding moved — the ≈ 1/(N+1) minimal-movement
    * property, pinned as exact integers. */
  def rendezvousReport(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df
      .withColumn("shard", rendezvousShard(col(idCol), nShards))
      .withColumn("shard_grown", rendezvousShard(col(idCol), nShards + 1))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("shard") =!= col("shard_grown"), 1L).otherwise(0L))
          .as("n_moved"))
      .orderBy(col("shard"))

  /** Deterministic train/val/test split — membership as a pure function of
    * (seed, id): md5(seed ‖ id)'s leading byte lands the row in one of 256
    * buckets, and the split boundaries are HEX-PREFIX comparisons
    * (fixed-width lowercase hex sorts identically as text and as a number,
    * so every engine agrees without base conversion — the
    * [[deterministicShuffle]] shard trick). Properties a row_number or
    * random() split lacks, and the ones that matter when the split defines
    * an eval set: reproducible across runs/engines/retries, stable under
    * corpus growth (appending rows never reassigns existing ones), and
    * order-free. Quantization is 1/256 (`testSlots`/`valSlots` buckets);
    * audit the achieved rates with [[splitReport]]. Map-side, zero
    * shuffle. */
  def hashSplit(df: DataFrame, idCol: String, seed: Long,
                testSlots: Int = 26, valSlots: Int = 26): DataFrame = {
    // COUPLED: the q_split_report oracle (SparkEntry.oracleSql) hardcodes
    // these defaults as hex literals '1a' (=26) and '34' (=52); change the
    // defaults and the oracle boundaries together.
    require(testSlots >= 0 && valSlots >= 0 && testSlots + valSlots < 256,
      s"hashSplit: test+val slots must fit the 256-bucket space, got $testSlots+$valSlots")
    val shard = substring(
      md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string"))), 1, 2)
    df.withColumn("split",
      when(shard < lit(f"$testSlots%02x"), lit("test"))
        .when(shard < lit(f"${testSlots + valSlots}%02x"), lit("val"))
        .otherwise(lit("train")))
  }

  /** Per-(stratum, split) audit for [[hashSplit]]: counts plus the achieved
    * within-stratum share — the number you check against the intended
    * 10/10/80 before a training run. One aggregate + a stratum-partitioned
    * window over the (tiny) report rows. */
  def splitReport(df: DataFrame, strataCol: String, idCol: String,
                  seed: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    hashSplit(df, idCol, seed)
      .groupBy(col(strataCol), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        round(col("n_docs").cast("double") / sum(col("n_docs")).over(w), 4))
      .orderBy(col(strataCol), col("split"))
  }

  /** Train/val/test LEAKAGE audit: the [[hashSplit]] assignment crossed
    * with the exact near-dup pair tier — how many near-duplicate document
    * pairs STRADDLE a split boundary. The eval-integrity number document-
    * level splitting alone can't see: a test document whose near-twin
    * sits in train inflates every benchmark it touches, which is why
    * pipelines dedup BEFORE splitting and audit after. Emits the split×
    * split pair matrix with a cross_split flag; the diagonal is benign
    * within-split duplication, any off-diagonal mass is leakage.
    *
    * Scale shape (the crossSourceOverlap rule): the pair tier dominates
    * and is the already-capped [[graft.dedup.Dedup.ngramJaccardPairs]];
    * attribution adds two pair-list-sized equi-joins against the
    * (doc_id, split) projection and one ≤9-row aggregate. */
  def splitLeakageReport(documents: DataFrame, seed: Long = 42L,
                         k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(documents, k, threshold)
      .select(col("doc_a"), col("doc_b"))
    val splits = hashSplit(documents.select(col("doc_id")), "doc_id", seed)
      .select(col("doc_id"), col("split"))
    pairLeakage(pairs, splits)
  }

  /** Cross-split attribution of a near-dup pair tier against a per-doc
    * split assignment — the shared tail of [[splitLeakageReport]] and
    * [[clusterSafeLeakageReport]]. */
  private def pairLeakage(pairs: DataFrame, splits: DataFrame): DataFrame =
    pairs
      .join(splits.withColumnsRenamed(Map("doc_id" -> "doc_a", "split" -> "sa")),
        Seq("doc_a"))
      .join(splits.withColumnsRenamed(Map("doc_id" -> "doc_b", "split" -> "sb")),
        Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("cross_split", col("split_a") =!= col("split_b"))
      .orderBy(col("split_a"), col("split_b"))

  /** Group-aware (leakage-FREE) split — the fix for what
    * [[splitLeakageReport]] measures: split membership is a pure function
    * of (seed, near-dup CLUSTER label) instead of (seed, doc_id), so the
    * members of a near-dup cluster land in the SAME split and a near-dup
    * pair can never straddle a boundary (GroupShuffleSplit semantics; the
    * eval-integrity requirement behind e.g. GPT-3's fuzzy-dedup'd
    * validation set). Singleton documents are their own cluster (label =
    * doc_id — the dupClusters convention), so the achieved rates stay
    * within quantization of the slot targets unless duplication is
    * extreme, and [[splitReport]]-style auditing still applies.
    *
    * Scale shape: the pair tier + O(log n) star contraction (exactly the
    * q_dup_clusters cost class — nothing new past the closure) plus one
    * map-side md5 on the cluster label. */
  def clusterSafeSplit(documents: DataFrame, seed: Long = 42L,
                       k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(documents, k, threshold)
      .select(col("doc_a"), col("doc_b"))
    val clusters = graft.graph.Components.dupClusters(documents, pairs)
      .select(col("doc_id"), col("cluster_id"))
    hashSplit(clusters, "cluster_id", seed)
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** BPR-style negative sampling (Rendle et al. 2009) over the purchase
    * matrix — the training-triple miner a recommender/embedding trainer
    * runs next to [[graft.ml.Recommend]]: for every customer, k parts
    * they did NOT buy, drawn uniformly from the part dimension by a
    * DERIVED hash (poly_hash(seed:cust:i) mod |P| — reproducible
    * cross-engine, the dsirResample noise rule; a rand() here would be
    * engine-private). Draw-by-index + reject-positives + keep-first-k:
    * the standard oversampled rejection scheme, deterministic end to end.
    *
    * Scale shape: candidates are |C|·k·oversample rows (linear in
    * customers — NEVER the |C|·|P| cross space), the part dimension joins
    * twice as a broadcast (the rank lookup needs one dim-sized total
    * order — the dim-table window class), the positive rejection is one
    * anti-join on the interaction key, and the keep-k window sees
    * ≤ k·oversample rows per customer. A customer whose draws collide
    * with positives more than k·(oversample−1) times emits fewer than k
    * rows (vanishing for |positives| ≪ |P|; emitted honestly rather than
    * resampled — the df-cap rule). */
  def bprNegatives(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
                   k: Int = 4, oversample: Int = 3,
                   seed: String = "bpr1"): DataFrame = {
    require(k >= 1 && oversample >= 1,
      s"bprNegatives: need k >= 1 and oversample >= 1, got k=$k oversample=$oversample")
    import graft.functions.PolyHash.poly_hash
    val inter = lineitem.select(col("l_orderkey"), col("l_partkey"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        Seq("l_orderkey"))
      .select(col("o_custkey").as("cust_key"), col("l_partkey").as("part_key"))
      .distinct().pinTier
    val nParts = part.agg(count(lit(1)).as("n_parts"))
    val ranked = part.select(col("p_partkey").as("part_key"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("p_partkey"))) - 1).cast("long").as("idx"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cust_key")).orderBy(col("draw"), col("part_key"))
    inter.select(col("cust_key")).distinct()
      .select(col("cust_key"),
        explode(sequence(lit(0), lit(k * oversample - 1))).as("i"))
      .crossJoin(broadcast(nParts))
      .select(col("cust_key"), col("i"),
        pmod(poly_hash(concat_ws(":", lit(seed), col("cust_key"), col("i"))),
          col("n_parts")).as("idx"))
      .join(broadcast(ranked), Seq("idx"))
      .join(inter, Seq("cust_key", "part_key"), "left_anti")
      .groupBy(col("cust_key"), col("part_key"))
      .agg(min(col("i")).cast("bigint").as("draw"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
      .select(col("cust_key"), col("part_key").as("neg_part"),
        col("draw"), col("rn"))
      .orderBy(col("cust_key"), col("rn"))
  }

  /** The audit twin of [[clusterSafeSplit]]: the same pair tier crossed
    * with the cluster-derived assignment — cross-split rows are ZERO BY
    * CONSTRUCTION (both endpoints of a pair share a cluster by closure,
    * hence a split), and the gate publishes that zero next to
    * q_split_leakage's nonzero doc-level counts. */
  def clusterSafeLeakageReport(documents: DataFrame, seed: Long = 42L,
                               k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(documents, k, threshold)
      .select(col("doc_a"), col("doc_b")).pinTier
    val splits = graft.graph.Components.dupClusters(documents, pairs)
      .select(col("doc_id"), col("cluster_id"))
    pairLeakage(pairs,
      hashSplit(splits, "cluster_id", seed).select(col("doc_id"), col("split")))
  }

  /** Deterministic k-per-group reservoir sample: rank rows within each
    * stratum by a seeded md5 of the id (uniform pseudo-random order,
    * reproducible across runs/engines/retries — md5 so the SQL oracle
    * replays it exactly) and keep the k smallest. Equivalent in
    * distribution to per-group reservoir sampling, but order-free and
    * restart-safe — the properties that matter when the sample defines an
    * eval slice.
    *
    * Scale shape: one shuffle on the stratum; the `row_number ≤ k` filter
    * plans a WindowGroupLimit (asserted in GoldenPlanSpec), so each map
    * task pre-prunes to its local top-k before the exchange — per-group
    * work is O(partition · log k), never a full per-group sort. */
  def reservoirPerKey(df: DataFrame, strataCol: String, idCol: String,
                      k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"reservoirPerKey: k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(concat(lit(seed.toString), lit(":"),
        col(idCol).cast("string"))).asc, col(idCol).asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(strataCol), col(idCol), col("rank").cast("bigint").as("rank"))
      .orderBy(col(strataCol), col("rank"))
  }

  /** Top-p (nucleus) corpus selection per stratum: order each stratum's
    * rows by mass descending (id tiebreak) and keep the minimal prefix
    * covering at least `p10000`/10000 of the stratum's total mass —
    * including the row that crosses the threshold (the nucleus rule). The
    * quality-weighted data-selection step of corpus curation: "keep the
    * highest-value documents until 80% of each source's token mass is
    * covered".
    *
    * The keep predicate is EXACT integer arithmetic (cross-multiplied
    * bigints, no float threshold): prev_cum · 10000 < p10000 · total.
    * Overflow bound: mass sums below ~9.2e14 per stratum stay inside
    * int64 after the ×10000 — petabyte-scale token counts; beyond that,
    * swap in decimal.
    *
    * Scale shape: one shuffle on the stratum; two window passes over the
    * same partitioning (running and total mass), no joins. */
  def nucleusSelect(df: DataFrame, strataCol: String, massCol: String,
                    idCol: String, p10000: Int): DataFrame = {
    require(p10000 >= 1 && p10000 <= 10000,
      s"nucleusSelect: p10000 must be in [1, 10000], got $p10000")
    val W = org.apache.spark.sql.expressions.Window
    val run = W.partitionBy(col(strataCol))
      .orderBy(col(massCol).desc, col(idCol).asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val all = W.partitionBy(col(strataCol))
    df.withColumn("_cum", sum(col(massCol)).over(run))
      .withColumn("_tot", sum(col(massCol)).over(all))
      .filter((col("_cum") - col(massCol)) * lit(10000L) <
        lit(p10000.toLong) * col("_tot"))
      .select(col(strataCol), col(idCol), col(massCol),
        round(col("_cum").cast("double") / col("_tot"), 4).as("cum_share"))
      .orderBy(col(strataCol), col(massCol).desc, col(idCol))
  }

  /** The α-temperature mix REALIZED as a deterministic downsample: derive
    * each stratum's sampling factor from [[temperatureMixReport]]'s
    * arithmetic, cap upsampled strata at 1.0 (a filter cannot emit a row
    * twice; the report's `sample_factor` documents the intended
    * repetition), quantize to the 1/1000 mod space
    * ([[modStratifiedSample]]'s convention, floor like `domainMixReport`),
    * and keep rows by id mod. Output is the per-stratum audit: requested
    * vs achieved.
    *
    * Scale shape: one aggregate over the corpus, rate arithmetic on the
    * stratum-sized result with two one-row broadcasts, then one broadcast
    * join back and a map-side filter — the corpus is never reshuffled. */
  def temperatureSample(df: DataFrame, strataCol: String, massCol: String,
                        idCol: String, alpha: Double): DataFrame = {
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_total"), sum(col(massCol)).cast("bigint").as("mass"))
    val tot = counts.agg(sum(col("mass")).as("mass_total"))
    val withP = counts.crossJoin(broadcast(tot))
      .withColumn("p", col("mass") / col("mass_total"))
    val z = withP.agg(sum(pow(col("p"), lit(alpha))).as("z"))
    // pinned: the stratum-sized rate table feeds both the corpus filter
    // and the final report — without the pin the corpus aggregate runs
    // once per consumer
    val rates = graft.Tier.pin(withP.crossJoin(broadcast(z))
      .select(col(strataCol), col("n_total"),
        floor(least(lit(1.0),
          pow(col("p"), lit(alpha)) / col("z") / col("p")) * 1000)
          .cast("bigint").as("quota")))
    val kept = df.join(broadcast(rates.select(col(strataCol), col("quota"))), Seq(strataCol))
      .filter(pmod(col(idCol), lit(1000L)) < col("quota"))
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n_kept"))
    // kept is stratum-sized: broadcast it (the right side of the left
    // outer preserves rates rows, so the broadcast must be the right)
    rates.join(broadcast(kept), Seq(strataCol), "left")
      .select(col(strataCol), col("n_total"),
        round(col("quota") / 1000.0, 4).as("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col(strataCol))
  }

  /** Seeded Bernoulli stratified sample (`DataFrameStatFunctions.sampleBy`).
    * Kept for API completeness; cache() the result before branching reuse —
    * seeded rand re-evaluates under AQE partition drift (engine-wide rule,
    * see the ALS sample). */
  def rngStratifiedSample(df: DataFrame, strataCol: String,
                          fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Systematic PPS (probability-proportional-to-size) sample: walk the
    * corpus in id order accumulating the weight column and pick a row
    * every time the running total crosses a multiple of `step` — each row
    * selected with probability ∝ its weight (the survey-sampling PPS
    * contract; rows heavier than `step` report multiplicity > 1). The
    * weighted companion to [[reservoirPerKey]]'s uniform draw: "sample
    * documents ∝ token count" without ever touching float thresholds —
    * selection is PURE INTEGER arithmetic (floor-divided cumulative sums),
    * so the drawn set is identical cross-engine, immune to the libm
    * ulp differences a -ln(u)/w exponential-key draw would gate on.
    *
    * Scale shape: the prefix sum is the packDocuments two-level form — a
    * per-bucket window runs in parallel over id-range buckets and only the
    * `buckets`-row totals take an ordered window before broadcasting back
    * — so no stage ever sees a single-partition sort of the corpus. Then a
    * map-side predicate; no second pass. Expected sample size =
    * total_weight / step. Requires a numeric id (the bucket range split;
    * every graft id is). */
  def systematicWeightedSample(df: DataFrame, weightCol: String,
                               idCol: String, step: Long,
                               buckets: Int = 64): DataFrame = {
    require(step >= 1, s"systematicWeightedSample: step must be >= 1, got $step")
    val W = org.apache.spark.sql.expressions.Window
    // pinned: three consumers (max-id action, local windows, bucket totals)
    val lens = df.select(col(idCol), col(weightCol).cast("bigint").as("w"))
      .pinTier
    val maxId = Option(lens.agg(max(col(idCol))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val span = math.max(1L, maxId / buckets + 1)
    val bucketed = lens.withColumn("bucket", (col(idCol) / span).cast("bigint"))
    val wLocal = W.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val prefixed = bucketed.withColumn("local_cum", sum(col("w")).over(wLocal))
    val wBucket = W.orderBy(col("bucket")).rowsBetween(W.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bucket")).agg(sum(col("w")).as("bn"))
      .withColumn("boff", coalesce(sum(col("bn")).over(wBucket), lit(0L)))
      .select(col("bucket"), col("boff"))
    // `div` (long integer division), not floor(a/b): the double detour
    // loses exactness past 2^53 — reachable cumulative mass at corpus scale
    prefixed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("_cum", col("boff") + col("local_cum"))
      .select(col(idCol), col("w").as("weight"),
        (expr(s"_cum div $step") - expr(s"(_cum - w) div $step"))
          .cast("bigint").as("n_picks"))
      .filter(col("n_picks") >= 1)
      .orderBy(col(idCol))
  }
}
