package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.cdc.Changelog

/** Typed change record — the streaming-side mirror of the changelog
  * schema (see [[graft.cdc.Changelog]]).
  */
case class ChangeRecord(doc_id: String, seq: Long, ts_us: Long, op: String,
                        field_path: String, payload: String, amount: Double)

/** Per-document materialized state carried in the state store and
  * emitted on every change (tombstones included — downstream
  * consumers need them, exactly like the reference's delete messages
  * to the FTS topic).
  */
case class DocState(doc_id: String, last_seq: Long, last_op: String,
                    last_field: String, last_payload: String, n_changes: Long)

/** Structured-Streaming re-expression of the reference's consumer
  * loop (FtsAndGeoServiceJSONWithCDC.java:58-81): the poll/iterate/
  * route imperative loop becomes declarative stream transforms, and
  * the implicit "current document" becomes explicit state-store
  * state.
  *
  * Every stateless operator ([[Changelog.fromEvents]], `ftsRoute`,
  * `geoRoute`, `binaryRoute`) is a pure projection/filter and is
  * reused verbatim on streaming DataFrames — one definition, both
  * engines. Stateful materialization uses
  * `flatMapGroupsWithState`, which shards by doc_id across
  * executors: the 100 TB posture is "state scales with live keys,
  * not with history".
  */
object CdcStreams {

  /** Stream of typed change records from a raw event stream. */
  def changelog(events: DataFrame)(implicit spark: SparkSession): Dataset[ChangeRecord] = {
    import spark.implicits._
    Changelog.fromEvents(events).as[ChangeRecord]
  }

  /** Reference routing operators, streaming: same plans as batch. */
  def ftsRoute(cl: DataFrame): DataFrame = Changelog.ftsRoute(cl)
  def geoRoute(cl: DataFrame): DataFrame = Changelog.geoRoute(cl)
  def binaryRoute(cl: DataFrame): DataFrame = Changelog.binaryRoute(cl)

  /** LIVE dead-letter routing — [[Changelog.dlqRoute]]'s cascade on
    * the stream, stateless, so one malformed payload can never stall
    * a partition the way it throws inside the reference's poll loop
    * (FtsAndGeoServiceJSONWithCDC.java:120 hands ChangeNode values
    * straight to the message builder). Split the result on
    * `reason = 'ok'`: the clean side feeds the usual routes, the
    * dead letters land in their own sink WITH their reason — same
    * classification, batch and live, by construction.
    */
  def dlqRoute(cl: DataFrame): DataFrame = Changelog.dlqRoute(cl)

  private def mergeGroup(docId: String, recs: Iterator[ChangeRecord],
                         state: GroupState[DocState]): Iterator[DocState] = {
    var st = state.getOption.getOrElse(DocState(docId, -1L, "", "", "", 0L))
    var changed = false
    recs.toSeq.sortBy(_.seq).foreach { r =>
      changed = true
      st =
        if (r.seq > st.last_seq)
          DocState(docId, r.seq, r.op, r.field_path, r.payload, st.n_changes + 1)
        else st.copy(n_changes = st.n_changes + 1) // late duplicate: count, don't regress
    }
    if (changed) { state.update(st); Iterator.single(st) } else Iterator.empty
  }

  /** Continuous last-writer-wins materialization: emits the updated
    * per-document state (tombstones included) whenever a change
    * arrives. Converges to [[Changelog.latestState]] over the same
    * records — the batch operator is the oracle for this one.
    */
  def latestState(cl: Dataset[ChangeRecord])(implicit spark: SparkSession): Dataset[DocState] = {
    import spark.implicits._
    cl.groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(mergeGroup)
  }

  /** Incremental view maintenance: per-document running totals kept
    * live as changes arrive (update mode — each batch emits only the
    * documents it touched). The streaming twin of a batch
    * `groupBy(doc_id).agg(...)`; state is one row per live key.
    */
  def liveTotals(cl: Dataset[ChangeRecord]): DataFrame =
    cl.groupBy("doc_id")
      .agg(count(lit(1)).as("n_changes"),
        round(sum(col("amount")), 2).as("total_amount"),
        max(col("seq")).as("last_seq"))

  /** Stream-static enrichment: each change record joined to a
    * static dimension on the user key — the "look up the customer
    * profile for this CDC event" step. The dimension is broadcast
    * per micro-batch (re-read each batch, so slowly-changing dims
    * refresh without restarting the stream).
    */
  def enrich(cl: Dataset[ChangeRecord], dim: DataFrame,
             dimKey: String): DataFrame =
    cl.withColumn("user_key",
        when(col("doc_id").rlike("^user[0-9]+$"),
          substring(col("doc_id"), 5, Int.MaxValue).cast("long")))
      .join(broadcast(dim), col("user_key") === col(dimKey), "left")
      .drop("user_key")

  /** Stream-stream attribution join: purchases (address updates in
    * CDC terms) joined to the clicks that preceded them within
    * `windowSec`, both sides watermarked so join state is bounded —
    * the streaming analogue of the batch as-of attribution
    * ([[graft.ops.Relational.q18AsofAttribution]]). Spark keeps
    * click state only `windowSec` + watermark past the event time.
    */
  def attributionJoin(cl: Dataset[ChangeRecord], windowSec: Long = 3600,
                      watermark: String = "10 minutes"): DataFrame = {
    val base = cl.withColumn("ts", timestamp_micros(col("ts_us")))
    val clicks = base.filter(col("field_path") === "firstName")
      .select(col("doc_id").as("c_doc"), col("seq").as("click_seq"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = base.filter(col("field_path") === "address")
      .select(col("doc_id").as("p_doc"), col("seq").as("purchase_seq"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("p_doc") === col("c_doc") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("p_doc").as("doc_id"), col("purchase_seq"),
        col("click_seq"), col("purchase_ts"), col("click_ts"))
  }

  /** Event-time windowed changelog audit with a watermark: op mix
    * per hour, tolerating 10 minutes of disorder. The streaming
    * twin of [[Changelog.opCounts]].
    */
  def windowedOpCounts(cl: Dataset[ChangeRecord]): DataFrame =
    cl.withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("op"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("amount")), 2).as("total_amount"))
      .select(col("window.start").as("win_start"), col("op"), col("n"),
        col("total_amount"))

  /** Effectively-once ingestion over an at-least-once transport:
    * duplicate deliveries of the same (doc_id, seq) are dropped as
    * long as they arrive within the watermark, and the dedup state
    * is evicted afterwards — bounded state, unlike a plain
    * `dropDuplicates` which retains every key forever. The reference
    * consumer gets this from MapR-DB's changelog guarantees; on a
    * raw event transport it has to be an operator.
    */
  def dedupStream(cl: Dataset[ChangeRecord],
                  watermark: String = "10 minutes"): DataFrame =
    cl.withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("doc_id", "seq")

  /** Native event-time session windows: per-document activity
    * sessions closed by `gap` of silence — the streaming twin of the
    * batch gap-sessionization ([[graft.ops.Relational.q16Sessionize]]),
    * via `session_window` (state merges adjacent windows and the
    * watermark finalizes them, so only open sessions occupy state).
    */
  def sessionWindows(cl: Dataset[ChangeRecord], gap: String = "30 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    cl.withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("doc_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("amount")), 2).as("session_value"))
      .select(col("doc_id"), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n_events"),
        col("session_value"))
}
