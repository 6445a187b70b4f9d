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

  test("every query has an oracle (sketches ride bounded-error certification)") {
    // since r7 even the three sketch queries are oracled: they emit
    // exact values + bound flags and the oracle asserts the flags
    // TRUE — nothing on the surface is rows-only anymore
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"unexpected rows-only set: $unoracled")
  }

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a committed plan snapshot") {
    val names = SparkEntry.queries.keySet
    val have = Option(new java.io.File("plans").listFiles).get
      .map(_.getName.stripSuffix(".txt")).toSet
    val missing = names -- have
    assert(missing.isEmpty, s"queries without a plans/ snapshot: $missing")
  }
}
