package graft

/** Driver-contract consistency: the gates the correctness harness relies on
  * but nothing else would catch at compile time. */
class ContractSpec extends SparkSpec {

  test("every oracle entry names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL for non-existent queries: $orphans")
  }

  test("the rows-only set is exactly the documented engine-specific queries") {
    // every query WITHOUT an oracle must be one whose values are inherently
    // engine-specific (xxhash64 sketches, ALS factors, k-means cells) —
    // adding a query without an oracle entry is a contract regression
    // unless it is consciously added to this list (SURVEY §5)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // r8: empty — the five ANN gates (the last rows-only set) now emit
    // their portable contracts via Similarity.annContractAudit
    val documented = Set.empty[String]
    assert(rowsOnly == documented,
      s"undocumented rows-only queries: ${rowsOnly -- documented}; " +
        s"stale entries: ${documented -- rowsOnly}")
  }

  test("the contract-pinned promise-gate set is exactly the documented one") {
    // a promise gate's oracle recomputes counts but pins the engine-computed
    // contract booleans as literal TRUE — a weaker check than a full DuckDB
    // recomputation (see README "Determinism everywhere"). Any oracle whose
    // SQL pins a literal TRUE must be on this list: silently adding one
    // would let a trivial constant oracle masquerade as a full recompute.
    val pinned = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("TRUE AS") => name
    }.toSet
    val documented = Set(
      // ANN/PCA audits (raw outputs quantizer/hyperplane-specific)
      "q_pca_audit", "q_ann_lsh", "q_ann_ivf", "q_ann_ivf_sq",
      "q_ann_ivf_indexed", "q_ann_ivf_sq_indexed",
      // recall promise gates (xxhash64 hyperplane sketches; the oracle
      // recomputes n_exact from scratch, the recall floor is pinned).
      // q_minhash_neardups, q_simhash_neardups, q_winnow_neardups,
      // q_winnow_fps and q_semantic_dedup all GRADUATED to full
      // recomputes in r10 — their pipelines now run the oracle-replicable
      // PolyHash family / spherical-k-means recurrence.
      "q_recall_audit", "q_cosine_near_dups_lsh",
      // approximate-algorithm twins (HLL / approx-percentile sketches are
      // engine-specific; the oracle pins the exact side + error contract)
      "q_distinct_hll", "q_vocab_approx", "q_winsorize_approx",
      // model-output gates (ALS factors, JDK codec bytes)
      "q_als_recommend", "q_media_features")
    assert(pinned == documented,
      s"undocumented contract-pinned oracles: ${pinned -- documented}; " +
        s"stale entries: ${documented -- pinned}")
  }

  test("flagship entry returns rows at the smoke scale") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }
}
