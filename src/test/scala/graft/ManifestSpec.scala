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

  test("manifest records real file sizes; compaction plan bins small files") {
    val dataDir = freshDir("compact")
    Tables.documents(spark, sf)
      .repartition(6)
      .write.mode("overwrite").parquet(dataDir)
    val m = Manifest.build(spark, dataDir, Seq("doc_id"))
    // file_bytes are the filesystem's own sizes
    val fsBytes = spark.read.parquet(dataDir).inputFiles
      .map(f => new java.io.File(new java.net.URI(f)).length()).sum
    assert(m.agg(sum("file_bytes")).head().getLong(0) == fsBytes)

    // synthetic planning table: binning is pure arithmetic on it
    import spark.implicits._
    val plan = Seq(
      ("a", 40L, 4L), ("b", 40L, 4L), ("c", 40L, 4L), ("d", 40L, 4L),
      ("e", 500L, 50L)) // already scan-efficient — left alone
      .toDF("file_path", "file_bytes", "n_rows")
    val jobs = Manifest.compactionPlan(plan, smallBytes = 100L,
        budgetBytes = 100L).collect()
      .map(r => r.getAs[Long]("job") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("total_bytes"))).toMap
    // prefix sums 0/40/80/120 → jobs 0,0,0,1; the big file is excluded
    assert(jobs == Map(0L -> (3L, 120L), 1L -> (1L, 40L)), s"got $jobs")
    // coverage: every small file lands in exactly one job
    assert(jobs.values.map(_._1).sum == 4L)
    intercept[IllegalArgumentException](
      Manifest.compactionPlan(plan, 100L, 50L))
  }

  test("compact executes the plan: rows preserved exactly, one file per " +
    "job, healthy files untouched, replay a no-op") {
    val dataDir = freshDir("compact-exec")
    val outDir = freshDir("compact-out")
    val docs = Tables.documents(spark, sf)
    docs.repartition(9).write.mode("overwrite").parquet(dataDir)
    val m = Manifest.build(spark, dataDir, Seq("doc_id"))
    // every file is "small": the job outputs alone must reproduce the
    // table byte-for-byte, in ~bytes/budget files
    val small = m.agg(max("file_bytes")).head().getLong(0) + 1
    val budget = small * 3
    val done = Manifest.compact(spark, m, outDir, small, budget)
    val jobs = done.collect()
    assert(jobs.forall(_.getAs[Long]("n_files") >= 1L))
    assert(jobs.map(_.getAs[scala.collection.Seq[String]]("subsumed_files").size).sum == 9)
    val outPaths = jobs.map(_.getAs[String]("out_path"))
    // one parquet file per job
    outPaths.foreach { p =>
      val files = new java.io.File(new java.net.URI("file://" + p).getPath)
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$p has ${files.length} files")
    }
    val compacted = spark.read.parquet(outPaths: _*)
    assert(compacted.collect().map(_.toSeq).toSet ===
      docs.collect().map(_.toSeq).toSet)
    // original files untouched (a reader mid-compaction stays whole)
    assert(spark.read.parquet(dataDir).count() == docs.count())
    // replay: committed job dirs are immutable — second run no-ops
    val again = Manifest.compact(spark, m, outDir, small, budget)
    assert(again.collect().map(_.getAs[String]("out_path")).toSet ==
      outPaths.toSet)
    assert(spark.read.parquet(outPaths: _*).count() == docs.count())
  }

  test("bloom manifest: point read is exact and opens a file subset") {
    val dataDir = freshDir("bloom")
    // UNCLUSTERED key: hash-scrambled doc_id order, so every file's
    // [min,max] spans nearly the whole id range and range stats are
    // useless for a point lookup — exactly the bloom's territory
    Tables.documents(spark, sf)
      .repartition(8, md5(col("doc_id").cast("string")))
      .write.mode("overwrite").parquet(dataDir)
    val m = Manifest.buildWithBloom(spark, dataDir,
      statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"),
      expectedPerFile = 1000L)
    val full = spark.read.parquet(dataDir)
    val nFiles = full.inputFiles.length
    assert(nFiles >= 8)
    // range pruning admits everything for a mid-range id (the
    // negative control: scrambled layout ⇒ every file's interval
    // covers the middle of the key range)
    val n = full.count()
    val midId = full.select("doc_id").orderBy("doc_id")
      .limit((n / 2).toInt).orderBy(col("doc_id").desc).head().getLong(0)
    assert(Manifest.pruneFiles(m, "doc_id", midId, midId).size == nFiles)
    // point read: row-identical to the full filtered scan, no false
    // negatives across a sample of present keys, and the needle opens
    // a strict file subset
    val ids = full.select("doc_id").limit(20).collect().map(_.getLong(0))
    ids.foreach { id =>
      val got = Manifest.readPoint(spark, dataDir, m, "doc_id", id)
      val expect = full.where(col("doc_id") === id)
      assert(got.count() == expect.count() && got.count() == 1L, s"id $id")
      assert(got.inputFiles.length < nFiles, s"no pruning for $id")
    }
    // an absent key prunes to (almost always) nothing and reads empty
    val absent = Manifest.readPoint(spark, dataDir, m, "doc_id", -999999L)
    assert(absent.count() == 0L)
  }

  test("bloom point probe stays in-cluster: only admitted paths reach the driver") {
    val dataDir = freshDir("bloom-dist")
    Tables.documents(spark, sf).limit(300)
      .repartition(4, md5(col("doc_id").cast("string")))
      .write.mode("overwrite").parquet(dataDir)
    val m = Manifest.buildWithBloom(spark, dataDir,
      Seq("doc_id"), Seq("doc_id"), expectedPerFile = 1000L)
    val id = spark.read.parquet(dataDir).select("doc_id").head().getLong(0)
    // the probe frame projects file_path ONLY — the per-file bloom
    // bytes are tested where the manifest rows live and never land
    // on the driver (at millions of files that collect is GBs of
    // driver heap per needle query)
    val frame = Manifest.pointCandidates(m, "doc_id", 0L)
    assert(frame.schema.fieldNames.sameElements(Array("file_path")),
      frame.schema.treeString)
    // distributed probe ≡ a driver-side reference probe over the
    // same blooms (hash mirrored: cast to the column type, xxhash64
    // seed 42 — the build convention)
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
    val h = XxHash64(Seq(Cast(Literal(id),
      org.apache.spark.sql.types.LongType)), 42L)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long]
    val reference = m.select(col("file_path"), col("bloom_doc_id"))
      .collect()
      .filter { r =>
        val bytes = r.getAs[Array[Byte]](1)
        bytes != null && org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bytes))
          .mightContainLong(h)
      }.map(_.getString(0)).toSeq.sorted
    assert(Manifest.pruneFilesPoint(m, "doc_id", id,
      org.apache.spark.sql.types.LongType) == reference)
    // a caller-supplied type hint skips schema inference and reads
    // the same rows
    val hinted = Manifest.readPoint(spark, dataDir, m, "doc_id", id,
      dtHint = Some(org.apache.spark.sql.types.LongType))
    assert(hinted.count() == 1L)
  }

  test("upkeep survives a manifest written before the schema widened") {
    val dataDir = freshDir("widen")
    val manifestDir = freshDir("widen-m")
    Tables.documents(spark, sf).limit(200)
      .repartition(3).write.mode("overwrite").parquet(dataDir)
    // simulate a pre-file_bytes manifest version on disk
    val legacy = Manifest.build(spark, dataDir, Seq("doc_id"))
      .drop("file_bytes")
    graft.ops.VersionedStore.commit(spark, manifestDir, "v=1") { staging =>
      legacy.coalesce(1).write.parquet(staging.toString)
    }
    // new files land; upkeep must WIDEN, not brick
    Tables.documents(spark, sf).filter(col("doc_id") >= 200).limit(100)
      .repartition(2).write.mode("append").parquet(dataDir)
    val v = Manifest.update(spark, dataDir, manifestDir, Seq("doc_id"))
    assert(v == 2L)
    val m = Manifest.load(spark, manifestDir).get
    assert(m.count() == spark.read.parquet(dataDir).inputFiles.length)
    // legacy rows carry null sizes; fresh rows carry real ones — and
    // the compaction planner skips the nulls instead of crashing
    assert(m.filter(col("file_bytes").isNull).count() == 3L)
    assert(m.filter(col("file_bytes").isNotNull).count() == 2L)
    val jobs = Manifest.compactionPlan(m, smallBytes = Long.MaxValue / 4,
      budgetBytes = Long.MaxValue / 2)
    assert(jobs.agg(sum("n_files")).head().getLong(0) == 2L)
  }

  test("bloom manifest incremental update stats only the new files") {
    val dataDir = freshDir("bloom-inc")
    val manifestDir = freshDir("bloom-inc-m")
    Tables.documents(spark, sf).filter(col("doc_id") < 250)
      .repartition(3, md5(col("doc_id").cast("string")))
      .write.mode("overwrite").parquet(dataDir)
    val v1 = Manifest.updateWithBloom(spark, dataDir, manifestDir,
      Seq("doc_id"), Seq("doc_id"), expectedPerFile = 1000L)
    assert(v1 == 1L)
    // second batch lands; upkeep must stat ONLY its files and the
    // unioned manifest must still answer point lookups over BOTH
    Tables.documents(spark, sf).filter(col("doc_id") >= 250)
      .repartition(3, md5(col("doc_id").cast("string")))
      .write.mode("append").parquet(dataDir)
    val v2 = Manifest.updateWithBloom(spark, dataDir, manifestDir,
      Seq("doc_id"), Seq("doc_id"), expectedPerFile = 1000L)
    assert(v2 == 2L)
    val m = Manifest.load(spark, manifestDir).get
    assert(m.count() == spark.read.parquet(dataDir).inputFiles.length)
    val oldId = spark.read.parquet(dataDir)
      .filter(col("doc_id") < 250).select("doc_id").head().getLong(0)
    val newId = spark.read.parquet(dataDir)
      .filter(col("doc_id") >= 250).select("doc_id").head().getLong(0)
    Seq(oldId, newId).foreach { id =>
      assert(Manifest.readPoint(spark, dataDir, m, "doc_id", id)
        .count() == 1L, s"id $id") }
    // a no-op upkeep returns the current version
    assert(Manifest.updateWithBloom(spark, dataDir, manifestDir,
      Seq("doc_id"), Seq("doc_id"), expectedPerFile = 1000L) == 2L)
  }

  test("bloom manifest survives the versioned write/load round trip") {
    val dataDir = freshDir("bloom-rt")
    val manifestDir = freshDir("bloom-rt-m")
    Tables.documents(spark, sf).limit(200)
      .repartition(4, md5(col("doc_id").cast("string")))
      .write.mode("overwrite").parquet(dataDir)
    val m = Manifest.buildWithBloom(spark, dataDir,
      Seq("doc_id"), Seq("doc_id"), expectedPerFile = 1000L)
    graft.ops.VersionedStore.commit(spark, manifestDir, "v=1") { staging =>
      m.coalesce(1).write.parquet(staging.toString)
    }
    val loaded = Manifest.load(spark, manifestDir).get
    val id = spark.read.parquet(dataDir)
      .select("doc_id").head().getLong(0)
    val got = Manifest.readPoint(spark, dataDir, loaded, "doc_id", id)
    assert(got.count() == 1L)
  }
}
