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

  /** The outermost call producing the expression aliased at
    * `asPos` (the index of an `AS <name>` match): walk backward
    * over balanced groups, skipping FILTER clauses, and return the
    * lower-cased function identifier — "" when the alias binds a
    * bare column/arithmetic rather than a call.
    */
  private def outermostCall(sql: String, asPos: Int): String = {
    var i = asPos - 1
    def skipSpace(): Unit = while (i >= 0 && sql(i).isWhitespace) i -= 1
    def ident(): String = {
      val end = i
      while (i >= 0 && (sql(i).isLetterOrDigit || sql(i) == '_')) i -= 1
      sql.substring(i + 1, end + 1).toLowerCase
    }
    var result = ""
    var done = false
    while (!done) {
      skipSpace()
      if (i < 0 || sql(i) != ')') { done = true }
      else {
        var depth = 0
        while (i >= 0 && { val c = sql(i)
          if (c == ')') depth += 1 else if (c == '(') depth -= 1
          depth != 0 }) i -= 1
        i -= 1 // past the '('
        val name = ident()
        if (name.isEmpty) { skipSpace(); if (ident() != "filter") done = true }
        else if (name == "filter") () // keyword glued to its group
        else { result = name; done = true }
      }
    }
    result
  }

  test("no integral result column rides an un-cast oracle SUM") {
    // DuckDB's sum(INTEGER/BIGINT) is HUGEINT, which the driver
    // materializes as float64 while Spark writes int64 — a
    // value-identical answer then fails the byte-strict hash gate
    // (645 vs 645.0, the CORRECTNESS_r09 sample_shards failure).
    // Convention: every oracle aggregate feeding an integral Spark
    // column is wrapped CAST(... AS BIGINT). This pins it locally:
    // an un-cast sum fails this spec, not a driver round.
    import org.apache.spark.sql.types._
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val integral = fn(spark, sf).schema.fields.collect {
          case f if Set[DataType](ByteType, ShortType, IntegerType,
            LongType).contains(f.dataType) => f.name
        }
        SparkEntry.oracleSql.get(name).toSeq.flatMap { sql =>
          integral.flatMap { c =>
            val m = java.util.regex.Pattern
              .compile(s"(?i)\\bAS\\s+($c)\\b").matcher(sql)
            val hits = Iterator.continually(m.find()).takeWhile(identity)
              .map(_ => m.start).toList
            // only the LAST `AS c` matters: CTEs textually precede
            // the final SELECT, so an intermediate HUGEINT re-cast
            // downstream (ds.d_sum → CAST(... AS BIGINT) AS d_sum)
            // is fine, while a bare final `SELECT c FROM cte` still
            // resolves to the CTE's alias as the last occurrence
            hits.lastOption.collect {
              case p if outermostCall(sql, p) == "sum" => s"$name.$c"
            }
          }
        }
    }.distinct
    assert(bad.isEmpty,
      s"integral columns fed by un-cast DuckDB sum() (HUGEINT→float64 " +
        s"hash mismatch): ${bad.mkString(", ")}")
  }

  test("every query has a committed plan snapshot") {
    val names = SparkEntry.queries.keySet
    val have = Option(new java.io.File("plans").listFiles).get
      .map(_.getName.stripSuffix(".txt")).toSet
    val missing = names -- have
    assert(missing.isEmpty, s"queries without a plans/ snapshot: $missing")
  }
}
