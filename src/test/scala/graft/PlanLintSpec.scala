package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.PlanLint

class PlanLintSpec extends SparkSpec {

  private def rules(ds: org.apache.spark.sql.Dataset[_]): Set[String] =
    PlanLint.audit(ds).map(_.rule).toSet

  private def withoutBroadcast[A](body: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("cartesian product is an error finding") {
    import spark.implicits._
    val a = (1 to 100).toDF("x")
    val b = (1 to 100).toDF("y")
    withoutBroadcast {
      val findings = PlanLint.audit(a.crossJoin(b))
      assert(findings.exists(f =>
        f.rule == "cartesian-product" && f.severity == "error"),
        PlanLint.report(a.crossJoin(b)))
    }
  }

  test("nested-loop join is a warn finding") {
    import spark.implicits._
    val a = (1 to 100).toDF("x")
    val b = (1 to 10).toDF("y")
    val nlj = a.join(broadcast(b), col("x") < col("y"))
    assert(PlanLint.audit(nlj).exists(f =>
      f.rule == "nested-loop-join" && f.severity == "warn"))
  }

  test("sort-merge join and global sort are info findings") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    withoutBroadcast {
      val smj = li.join(o, li("l_orderkey") === o("o_orderkey"))
      assert(rules(smj).contains("sort-merge-join"))
    }
    assert(rules(li.orderBy("l_orderkey")).contains("global-sort"))
  }

  test("window without PARTITION BY is an error finding") {
    val li = Tables.lineitem(spark, sf)
    val w = li.withColumn("rn",
      sum("l_quantity").over(Window.orderBy("l_orderkey")))
    val findings = PlanLint.audit(w)
    assert(findings.exists(f =>
      f.rule == "single-partition-window" && f.severity == "error"))
    // the partitioned twin is clean
    val ok = li.withColumn("rn", sum("l_quantity")
      .over(Window.partitionBy("l_orderkey").orderBy("l_linenumber")))
    assert(PlanLint.errors(ok).isEmpty, PlanLint.report(ok))
  }

  test("a calendar-key-only window warns; a banded composite key is clean") {
    val ev = Tables.events(spark, sf)
    // partitioned ONLY by a day key: distinct-count tracks the
    // calendar, so one task absorbs a whole day of rows at scale
    val dayed = ev.withColumn("day", to_date(col("ts")))
      .withColumn("rn",
        sum("value").over(Window.partitionBy("day").orderBy("ts")))
    val f = PlanLint.audit(dayed).find(_.rule == "time-key-window")
    assert(f.exists(_.severity == "warn"), PlanLint.report(dayed))
    // the fix shape — a sub-period band in the composite key — and
    // an entity-keyed window both pass
    val banded = ev.withColumn("day", to_date(col("ts")))
      .withColumn("band", unix_micros(col("ts")) / lit(3600000000L))
      .withColumn("rn",
        sum("value").over(Window.partitionBy("day", "band").orderBy("ts")))
    assert(!rules(banded).contains("time-key-window"), PlanLint.report(banded))
    val keyed = ev.withColumn("rn",
      sum("value").over(Window.partitionBy("user_id").orderBy("ts")))
    assert(!rules(keyed).contains("time-key-window"), PlanLint.report(keyed))
  }

  test("a scan-unpushable filter is flagged; a pushable one is not") {
    val docs = Tables.documents(spark, sf)
    val unpushed = docs.filter(length(col("text")) > lit(5))
    assert(rules(unpushed).contains("filter-not-pushed"),
      PlanLint.report(unpushed))
    val pushed = docs.filter(col("doc_id") > 10)
    assert(!rules(pushed).contains("filter-not-pushed"),
      PlanLint.report(pushed))
  }

  test("shuffle count is reported; a scan-only plan has zero") {
    val scan = Tables.documents(spark, sf).select("doc_id")
    val f = PlanLint.audit(scan).find(_.rule == "shuffle-count").get
    assert(f.detail.startsWith("0 "))
    val agg = Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)))
    val g = PlanLint.audit(agg).find(_.rule == "shuffle-count").get
    assert(g.detail.startsWith("1 "))
  }

  test("a plan scanning one table past the threshold fires duplicate-scan") {
    // the r11 events_anomaly_robust regression shape: one physical
    // plan reading the same parquet table dozens of times because an
    // unmaterialized summary frame is referenced from many subtrees.
    // Synthesized here as a union fan-out over one table — the rule
    // counts per-TABLE multiplicity, whatever the join/union shape.
    val docs = Tables.documents(spark, sf)
    val fanout = (0 to PlanLint.DuplicateScanThreshold)
      .map(i => docs.filter(col("doc_id") % 100 === i)
        .groupBy("lang").agg(count(lit(1)).as("n")))
      .reduce(_ unionAll _)
    val f = PlanLint.audit(fanout).find(_.rule == "duplicate-scan")
    assert(f.exists(_.severity == "warn"), PlanLint.report(fanout))

    // two DIFFERENT tables at 4 scans each (8 total) stay clean —
    // multiplicity is per table, not per plan
    val emb = Tables.embeddings(spark, sf)
    val mixed = (0 to 3).map(i =>
      docs.filter(col("doc_id") % 100 === i).select(col("doc_id"))
        .unionAll(emb.filter(col("vec_id") % 100 === i).select(col("vec_id"))))
      .reduce(_ unionAll _)
    assert(!rules(mixed).contains("duplicate-scan"), PlanLint.report(mixed))
  }

  test("the fixed anomalyRobust plan is clean of duplicate-scan") {
    // the motivating defect: before RankSelect materialized its
    // selection, this exact operator re-read the events parquet 50×
    val df = graft.ops.Events.anomalyRobust(Tables.events(spark, sf))
    assert(!rules(df).contains("duplicate-scan"), PlanLint.report(df))
  }

  test("the ENTIRE query surface passes the lint at error severity") {
    // the repo's own discipline, applied through the public API to
    // every registered query: no cartesian products, no
    // single-partition windows anywhere (the final driver-contract
    // orderBy is info-severity by design). This is what keeps the
    // lint honest — a new operator that sneaks in a whole-corpus
    // window fails here before it ever reaches a plan review.
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val errs = PlanLint.errors(fn(spark, sf))
        if (errs.isEmpty) None
        else Some(s"$name: ${errs.map(_.rule).mkString(", ")}")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
