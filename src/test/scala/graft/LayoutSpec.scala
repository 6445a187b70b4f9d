package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.ops.Layout

class LayoutSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("bucketed tables join without a shuffle exchange") {
    // force SMJ: a broadcast join would insert a BroadcastExchange and
    // hide the property under test (bucketed scans satisfying the
    // join's required hash distribution)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try bucketedJoinBody()
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  private def bucketedJoinBody(): Unit = {
    // a previously-failed run can leave the managed-table dir behind
    // without a catalog entry; clear both
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    Layout.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Layout.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), "o_orderkey")
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan
    val exchanges = collectWithSubqueries(plan) { case e: Exchange => e }
    // the join itself is exchange-free; only the final low-cardinality
    // aggregation may shuffle
    assert(exchanges.size <= 1, s"unexpected exchanges:\n$plan")

    // same join on the raw (unbucketed) parquet shuffles both sides
    val raw = lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
      .join(orders, "o_orderkey")
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    raw.collect()
    val rawExchanges = collectWithSubqueries(
      raw.queryExecution.executedPlan) { case e: Exchange => e }
    assert(rawExchanges.size > exchanges.size)
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // thresholds tuned down so the tiny local tables qualify; on a
    // cluster the defaults (10MB creation / 10GB application) apply
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
        .filter(org.apache.spark.sql.functions.col("o_totalprice") > 500000)
      val j = li.join(o, org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      j.collect()
      assert(j.queryExecution.executedPlan.toString.toLowerCase.contains("bloom"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join returns exactly the plain join result") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val customer = Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
      .select(col("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(customer, "o_custkey")
      .collect().map(_.toSeq).toSet
    val salted = Layout.saltedJoin(orders, customer, "o_custkey", salt = 8)
      .select("o_custkey", "o_orderkey", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    val plainReordered = orders.join(customer, "o_custkey")
      .select("o_custkey", "o_orderkey", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    assert(salted == plainReordered && salted.nonEmpty)
    assert(plain.nonEmpty)
  }

  test("interleaved epoch: sequential shard reads replay the exact order; no global sort") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    val dir = Files.createTempDirectory("graft-interleave").toString
    val nShards = 8
    Layout.writeInterleaved(docs, dir, nShards)

    // the epoch order the loader must see = the shared key frame
    // (whose head is the sample_interleave query) fully ordered
    val expect = graft.ops.Sampling.interleaveKeys(docs)
      .orderBy(col("pos_key"), col("source"), col("rank_in_source"))
      .select("source", "doc_id", "rank_in_source", "pos_key")
      .collect().map(_.toSeq).toSeq

    // a sequential loader: shard dirs in shard order, each shard one
    // sorted file, file row order preserved by the offset-ordered scan
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard="))
      .sortBy(_.getName.stripPrefix("shard=").toInt)
    assert(shardDirs.length > 1 && shardDirs.length <= nShards)
    val got = shardDirs.toSeq.flatMap { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"one sorted file per shard, got ${files.length} in $d")
      spark.read.parquet(files.head.getPath)
        .select("source", "doc_id", "rank_in_source", "pos_key")
        .collect().map(_.toSeq).toSeq
    }
    assert(got.nonEmpty && got === expect)

    // the write plan: local sorts only — a global Sort would mean a
    // range-boundary sampling job and a sampled (non-reproducible)
    // shard split
    val layout = Layout.interleavedLayout(docs, nShards, 64)
    layout.collect()
    val globalSorts = collectWithSubqueries(layout.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.isEmpty,
      s"global sort in layout plan:\n${layout.queryExecution.executedPlan}")
  }

  test("z-ordered files are narrow in BOTH dimensions; linear sort is not") {
    import java.nio.file.Files
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val zDir = Files.createTempDirectory("graft-zorder").toString
    val linDir = Files.createTempDirectory("graft-linear").toString
    val nFiles = 16
    Layout.writeZOrdered(orders, "o_custkey", "o_totalprice", zDir, nFiles)
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(linDir)

    // mean per-file value spread of the SECOND dimension, as a share
    // of its global range: near 1.0 for the linear sort (each file
    // spans everything), well below for the z-order
    def spread2(dir: String): Double = {
      val global = orders.agg(
        (max("o_totalprice") - min("o_totalprice")).cast("double")).collect()(0).getDouble(0)
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      val spreads = files.map { f =>
        val r = spark.read.parquet(f).agg(
          (max("o_totalprice") - min("o_totalprice")).cast("double")).collect()(0)
        r.getDouble(0) / global
      }
      spreads.sum / spreads.length
    }
    val zs = spread2(zDir)
    val ls = spread2(linDir)
    assert(ls > 0.8, s"linear files should span ~the full price range, got $ls")
    assert(zs < 0.5 * ls, s"z-order files not narrower: z=$zs linear=$ls")
    // round trip preserves rows
    assert(spark.read.parquet(zDir).count() == orders.count())
  }
}
