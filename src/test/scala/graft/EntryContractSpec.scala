package graft

/** Guards on the driver contract itself: the correctness gate joins
  * `SparkEntry.queries` with `SparkEntry.oracleSql` by key, so a
  * typo'd or orphaned oracle key silently downgrades a query to
  * rows-only — pin the invariants here instead.
  */
class EntryContractSpec extends SparkSpec {

  test("every oracle key has a query twin") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries with no query: $orphans")
  }

  test("only the three sketch-internal queries lack an oracle") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == Set(
      "q7_approx_distinct", "q7_hll_sketch", "q17_approx_quantiles"),
      s"unexpected rows-only set: $unoracled")
  }

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
