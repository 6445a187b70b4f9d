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

  test("every query key has a SURVEY §2 inventory row") {
    // SURVEY §2 is the judged coverage contract: a query shipped
    // without its row undercounts the surface (r13 shipped
    // dedup_quality_cross rowless). Pin the contract mechanically:
    // every `queries` key must appear backticked inside §2.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val start = survey.indexOf("## §2")
    val end = survey.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md §2/§3 headers missing")
    val s2 = survey.substring(start, end)
    val ticked = "`([A-Za-z0-9_]+)`".r.findAllMatchIn(s2)
      .map(_.group(1)).toSet
    val rowless = SparkEntry.queries.keySet -- ticked
    assert(rowless.isEmpty,
      s"queries with no SURVEY §2 inventory row: $rowless")
  }

  /** Aggregate-count/sum outputs (and their long-typed alias
    * closure) that later multiply a 10⁶/10⁴ ppm/bp literal in plain
    * BIGINT — the silent-wrap class found and hand-fixed six times
    * (vocab_coverage, fertility ×2, reciprocity, dsir, lmPpm): a raw
    * corpus count passes 9.2e12 below the 100 TB design point, the
    * non-ANSI product wraps while the DuckDB oracle widens/errors.
    * Convention: widen through DECIMAL(38,0) before the multiply —
    * a widened product types DECIMAL and never trips this walk.
    */
  private def unwidenedPpmProducts(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.types.LongType
    val tainted = scala.collection.mutable.Set.empty[Long]
    val hits = scala.collection.mutable.ArrayBuffer.empty[String]
    def refsTainted(e: Expression): Boolean =
      e.references.exists(a => tainted.contains(a.exprId.id))
    def ppmLit(e: Expression): Boolean = e match {
      case c: Cast => ppmLit(c.child)
      case Literal(v: Long, _) => v == 1000000L || v == 10000L
      case Literal(v: Int, _) => v == 1000000 || v == 10000
      case _ => false
    }
    def unboundedAgg(e: Expression): Boolean = e.exists {
      case ae: AggregateExpression =>
        ae.aggregateFunction.isInstanceOf[Sum] ||
          ae.aggregateFunction.isInstanceOf[Count]
      case _ => false
    }
    plan.foreachUp { node =>
      // children's taint is already recorded (foreachUp) when this
      // node's expressions are inspected
      node.expressions.foreach(_.foreach {
        case m @ Multiply(l, r, _) if m.dataType == LongType =>
          val sides = Seq(l, r)
          if (sides.exists(ppmLit) &&
            sides.exists(s => !ppmLit(s) && refsTainted(s)))
            hits += m.sql
        case _ => ()
      })
      node match {
        case Aggregate(_, aggExprs, _, _) => aggExprs.foreach {
          case a: Alias
            if a.dataType == LongType && unboundedAgg(a.child) =>
            tainted += a.exprId.id
          case _ => ()
        }
        case w: Window => w.windowExpressions.foreach {
          case a: Alias
            if a.dataType == LongType && unboundedAgg(a.child) =>
            tainted += a.exprId.id
          case _ => ()
        }
        case p: Project => p.projectList.foreach {
          case a: Alias
            if a.dataType == LongType && refsTainted(a.child) =>
            tainted += a.exprId.id
          case _ => ()
        }
        case _ => ()
      }
    }
    hits.toSeq.distinct
  }

  test("ppm-widening lint fires on a planted unwidened product") {
    import org.apache.spark.sql.functions._
    val planted = spark.range(10)
      .withColumn("g", col("id") % 2)
      .groupBy("g").agg(sum("id").as("c"))
      .selectExpr("CAST(c * 1000000 div 7 AS BIGINT) AS ppm")
    assert(unwidenedPpmProducts(planted.queryExecution.analyzed).nonEmpty,
      "lint failed to flag a raw aggregate * 1000000 in BIGINT")
    val widened = spark.range(10)
      .withColumn("g", col("id") % 2)
      .groupBy("g").agg(sum("id").as("c"))
      .selectExpr(
        "CAST(CAST(c AS DECIMAL(38,0)) * 1000000 div 7 AS BIGINT) AS ppm")
    assert(unwidenedPpmProducts(widened.queryExecution.analyzed).isEmpty,
      "lint flagged the DECIMAL(38,0)-widened form")
  }

  test("no query multiplies an unwidened aggregate by a ppm/bp literal") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        unwidenedPpmProducts(fn(spark, sf).queryExecution.analyzed)
          .map(e => s"$name: $e")
    }
    assert(bad.isEmpty,
      s"unwidened aggregate×ppm-literal products (int64 wrap below " +
        s"the 100 TB design point):\n${bad.mkString("\n")}")
  }
}
