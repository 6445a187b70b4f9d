package graft

import org.apache.spark.sql.functions._

import graft.ops.Manifest

class ManifestSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-manifest-$tag").toString
    d
  }

  test("manifest records one row per file with exact counts and bounds") {
    val dataDir = freshDir("build")
    val li = Tables.lineitem(spark, sf)
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(dataDir)

    val m = Manifest.build(spark, dataDir, Seq("l_orderkey", "l_quantity"))
    val rows = m.collect()
    assert(rows.length == spark.read.parquet(dataDir).inputFiles.length)
    assert(rows.map(_.getAs[Long]("n_rows")).sum == li.count())
    // range-partitioned files have pairwise-disjoint key intervals
    val iv = rows.map(r => (r.getAs[Long]("min_l_orderkey"),
      r.getAs[Long]("max_l_orderkey"))).sortBy(_._1)
    iv.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, s"overlap: $iv")
      case _ => ()
    }
  }

  test("pruned read equals the full filtered scan but opens fewer files") {
    val dataDir = freshDir("prune")
    Tables.lineitem(spark, sf)
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(dataDir)
    val manifest = Manifest.build(spark, dataDir, Seq("l_orderkey"))

    val full = spark.read.parquet(dataDir)
    val bounds = full.agg(min("l_orderkey"), max("l_orderkey")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(0) +
      (bounds.getLong(1) - bounds.getLong(0)) / 16) // ~1/16 of the range

    val pruned = Manifest.readPruned(spark, dataDir, manifest,
      "l_orderkey", lo, hi)
    val expected = full.where(col("l_orderkey").between(lo, hi))
    assert(pruned.count() == expected.count())
    assert(pruned.agg(sum("l_quantity")).head().getDouble(0) ==
      expected.agg(sum("l_quantity")).head().getDouble(0))
    // the point of the manifest: the narrow range opens a file subset
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"no files pruned: ${pruned.inputFiles.length}")
    assert(Manifest.pruneFiles(manifest, "l_orderkey", lo, hi).nonEmpty)
  }

  test("a range outside every file prunes to an empty frame, schema kept") {
    val dataDir = freshDir("empty")
    Tables.lineitem(spark, sf).limit(100)
      .write.mode("overwrite").parquet(dataDir)
    val manifest = Manifest.build(spark, dataDir, Seq("l_orderkey"))
    val out = Manifest.readPruned(spark, dataDir, manifest,
      "l_orderkey", -100L, -1L)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      spark.read.parquet(dataDir).columns.toSeq)
    assert(Manifest.pruneFiles(manifest, "l_orderkey", -100L, -1L).isEmpty)
  }

  test("incremental update stats only the new files, skips no-op upkeep") {
    val dataDir = freshDir("incr")
    val manifestDir = freshDir("incr-man")
    val li = Tables.lineitem(spark, sf)
    li.where(col("l_orderkey") < 750).repartition(2)
      .write.mode("append").parquet(dataDir)
    val v1 = Manifest.update(spark, dataDir, manifestDir, Seq("l_orderkey"))
    assert(v1 == 1L)
    val filesAfter1 = Manifest.load(spark, manifestDir).get.count()

    // a second batch lands as NEW files in the same directory
    li.where(col("l_orderkey") >= 750).repartition(2)
      .write.mode("append").parquet(dataDir)
    val v2 = Manifest.update(spark, dataDir, manifestDir, Seq("l_orderkey"))
    assert(v2 == 2L)
    val m2 = Manifest.load(spark, manifestDir).get
    assert(m2.count() > filesAfter1)
    // the union covers every file and every row exactly once
    assert(m2.agg(sum("n_rows")).head().getLong(0) == li.count())
    assert(m2.select("file_path").distinct().count() == m2.count())
    // canonical-form comparison: the metadata column and inputFiles
    // spell the same local URI differently (file:/ vs file:///)
    def canon(p: String) = new org.apache.hadoop.fs.Path(p).toString
    assert(m2.collect().map(r => canon(r.getString(
      m2.columns.indexOf("file_path")))).toSet ==
      spark.read.parquet(dataDir).inputFiles.map(canon).toSet)

    // nothing new -> same version, no phantom publish
    assert(Manifest.update(spark, dataDir, manifestDir,
      Seq("l_orderkey")) == 2L)
    assert(Manifest.load(spark, manifestDir).get.count() == m2.count())

    // the updated manifest prunes correctly across both batches
    val pruned = Manifest.readPruned(spark, dataDir, m2,
      "l_orderkey", 0L, 749L)
    assert(pruned.count() ==
      spark.read.parquet(dataDir)
        .where(col("l_orderkey").between(0, 749)).count())
  }

  test("versioned publish: write twice, load returns the latest") {
    val dataDir = freshDir("vdata")
    val manifestDir = freshDir("vman")
    Tables.lineitem(spark, sf).limit(500)
      .write.mode("overwrite").parquet(dataDir)
    val v1 = Manifest.write(spark, dataDir, manifestDir, Seq("l_orderkey"))
    val v2 = Manifest.write(spark, dataDir, manifestDir, Seq("l_orderkey"))
    assert(v1 == 1L && v2 == 2L)
    val loaded = Manifest.load(spark, manifestDir)
    assert(loaded.isDefined)
    assert(loaded.get.agg(sum("n_rows")).head().getLong(0) == 500L)
  }
}
