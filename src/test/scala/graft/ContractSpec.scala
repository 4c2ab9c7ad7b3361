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

  test("flagship entry returns rows at the smoke scale") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }
}
