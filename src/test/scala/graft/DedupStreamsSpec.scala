package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.dedup.Dedup
import graft.streaming.{DedupStreams, NearDupCandidate}

case class DocRow(doc_id: Long, text: String)

class DedupStreamsSpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[DocRow]],
                        capacity: Int = 256): Set[(Long, Long)] = {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[DocRow]
    val name = s"ndc${System.nanoTime()}"
    val q = DedupStreams.nearDupCandidates(input.toDF(), capacity = capacity)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[NearDupCandidate].collect()
      .map(c => (c.doc_a, c.doc_b)).toSet
  }

  test("stream candidates cover every batch-verified near-dup pair") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[DocRow].collect().toSeq.sortBy(_.doc_id)
    // replay the corpus as two micro-batches split mid-corpus, so
    // cross-batch pairs exercise the persisted bucket state
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val streamed = runStream(Seq(b1, b2))
    val verified = Dedup.minhashLsh(docs.toDF(), 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty, "test corpus must contain near-dups")
    val missed = verified -- streamed
    assert(missed.isEmpty,
      s"batch-verified pairs the stream never surfaced: $missed")
  }

  test("bucket state is FIFO-bounded at capacity") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (1L to 5L).map(DocRow(_, t))
    val streamed = runStream(Seq(docs), capacity = 2)
    // identical docs share every bucket; with capacity 2 each arrival
    // pairs with exactly the two most recent ids
    assert(streamed == Set((1L, 2L), (1L, 3L), (2L, 3L),
      (2L, 4L), (3L, 4L), (3L, 5L), (4L, 5L)))
  }

  test("cross-batch collision surfaces after restart-free accumulation") {
    val t = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val streamed = runStream(Seq(
      Seq(DocRow(1L, t), DocRow(2L, "unrelated words entirely here now")),
      Seq(DocRow(3L, t.replace("mu", "muX")))))
    assert(streamed.contains((1L, 3L)))
  }

  test("stream guard covers every pair the batch merge later confirms") {
    // the ingestion story end-to-end: the live guard flags candidates
    // as docs arrive; the nightly mergeKeepers reconciliation verifies
    // and absorbs them — nothing the merge confirms can be a pair the
    // stream never surfaced
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[DocRow].collect().toSeq.sortBy(_.doc_id)
    val (b1, b2) = docs.splitAt(3 * docs.length / 4)
    val streamed = runStream(Seq(b1, b2))
    val baseModel = Dedup.fitKeepers(b1.toDF(), 0.5, 2)
    val merged = Dedup.mergeKeepers(baseModel, b1.toDF(), b2.toDF())
    def pairs(m: Dedup.KeeperModel): Set[(Long, Long)] =
      m.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val confirmedNew = pairs(merged) -- pairs(baseModel)
    assert(confirmedNew.nonEmpty, "delta must add near-dup pairs")
    val missed = confirmedNew -- streamed
    assert(missed.isEmpty,
      s"merge-confirmed pairs the stream never surfaced: $missed")
  }

  test("keeper gate: live docs probe the LOADED model's band index — " +
    "stream rows equal the batch replay, near-dups route to their " +
    "cluster keeper, novel docs stay silent") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    // base corpus: a near-dup cluster {1,2} (keeper 1) + a loner 3
    val base = Seq(
      DocRow(1L, "the quick brown fox jumps over the lazy dog again"),
      DocRow(2L, "the quick brown fox jumps over the lazy dog again"),
      DocRow(3L, "completely different words appear in this base doc"))
    // publish → load: the gate must serve the PERSISTED artifact
    val dir = s"/tmp/graft-test-keeper-gate-${System.nanoTime()}"
    Dedup.saveKeepers(Dedup.fitKeepers(base.toDF(), 0.5, 2), dir, 1L)
    val model = Dedup.loadKeepers(spark, dir, Some(1L))
    // live batch: 10 near-dups doc 1's cluster, 11 is novel
    val b1 = Seq(DocRow(10L,
      "the quick brown fox jumps over the lazy dog again"))
    val b2 = Seq(DocRow(11L, "nothing here resembles any base document"))
    val input = MemoryStream[DocRow]
    val name = s"kg${System.nanoTime()}"
    val q = DedupStreams.keeperGateStream(input.toDF(), model)
      .writeStream.format("memory").queryName(name).start()
    try Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table(name).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[Long]("base_doc_id"), r.getAs[Long]("keep_doc_id"))).toSet
    // row-for-row equal to the batch replay of the same projection
    val batch = DedupStreams.keeperGateStream((b1 ++ b2).toDF(), model)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[Long]("base_doc_id"), r.getAs[Long]("keep_doc_id"))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // the near-dup routes to cluster keeper 1 (via base docs 1 AND 2)
    assert(streamed.filter(_._1 == 10L).forall(_._4 == 1L))
    assert(streamed.map(_._1) == Set(10L)) // the novel doc is silent
  }
}
