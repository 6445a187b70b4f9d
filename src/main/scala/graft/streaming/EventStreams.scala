package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user funnel progression carried in the state store: the
  * earliest (ts_us, event_id) key of each qualified stage.
  * `Long.MaxValue` marks a stage not yet reached.
  */
case class FunnelProgress(user_id: Long,
                          s_ts: Long, s_id: Long,
                          c_ts: Long, c_id: Long,
                          purchased: Boolean)

/** Per-user retention state: the cohort week (epoch day of its
  * Monday, `Long.MinValue` while no signup seen) plus every activity
  * week already observed — bounded by the number of distinct weeks,
  * not events.
  */
case class RetentionState(cohortDay: Long, weeks: Seq[Long])

/** One (user, activity-week) cell emission. `week_day` is the
  * absolute week for downstream dedup; (cohort_week, week_offset)
  * aggregate to the batch retention matrix.
  */
case class RetentionHit(user_id: Long, cohort_week: java.sql.Date,
                        week_offset: Long, week_day: Long)

/** One heavy-hitter counter emission: the Misra-Gries estimate of
  * `token`'s count inside its state bucket as of this trigger.
  */
case class HeavyHitter(bucket: Int, token: String, cnt: Long)

/** One first-seen emission: `first_day` is the user's earliest
  * event-time day observed so far (epoch days); `is_correction`
  * marks a re-attribution after a late earlier-day arrival — the
  * downstream fold keeps each user's LATEST row.
  */
case class FirstSeen(user_id: Long, first_day: Long, is_correction: Boolean)

/** Per-series subsequence-match state: the last L−1 values of the
  * series in (ts, event_id) order (`tail`), plus the high-water
  * (ts, id) mark used to drop late arrivals. Fixed size per key —
  * the buffer never grows with the stream.
  */
case class TsTail(lastTs: Long, lastId: Long, tail: Seq[Double])

/** One scored window emission: the z-normalized distance of the
  * length-L window ENDING at `event_id`, bit-identical to the batch
  * operator's `dist` for the same window.
  */
case class TsWindowScore(event_type: String, event_id: Long, dist: Double)

/** Per-user last-touch carry: the most recent NON-purchase event
  * seen, by (ts_us, event_id). One fixed-size row per user.
  */
case class TouchState(touch_type: String, ts_us: Long, event_id: Long)

/** One attributed purchase emission: the purchase row credited to
  * the carry at its event time (`direct` when the user had no prior
  * non-purchase event).
  */
case class AttributionHit(user_id: Long, channel: String, value: Double,
                          ts_us: Long, event_id: Long)

/** Streaming twin of [[graft.ops.Events.funnel]]: per-user ordered
  * stage progression (signup → click → purchase) as keyed state,
  * emitted on change. Within a micro-batch events fold in event-time
  * order; across batches qualification is monotone (a stage, once
  * reached, never un-reaches), so the stream converges to the batch
  * funnel whenever stage-relevant events arrive in event-time order
  * across batches — the same in-order-source assumption the batch
  * operator's strict (ts, event_id) precedence encodes. State is one
  * fixed-size row per user: bounded, shardable on user_id.
  */
object EventStreams {

  private def before(aTs: Long, aId: Long, bTs: Long, bId: Long): Boolean =
    aTs < bTs || (aTs == bTs && aId < bId)

  private def foldGroup(userId: Long, rows: Iterator[(Long, Long, Long, String)],
                        state: GroupState[FunnelProgress]): Iterator[FunnelProgress] = {
    var st = state.getOption.getOrElse(
      FunnelProgress(userId, Long.MaxValue, Long.MaxValue,
        Long.MaxValue, Long.MaxValue, purchased = false))
    val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
    var changed = false
    sorted.foreach { case (_, ts, id, typ) =>
      typ match {
        case "signup" if before(ts, id, st.s_ts, st.s_id) =>
          st = st.copy(s_ts = ts, s_id = id); changed = true
        case "click" if before(st.s_ts, st.s_id, ts, id) &&
            before(ts, id, st.c_ts, st.c_id) =>
          st = st.copy(c_ts = ts, c_id = id); changed = true
        case "purchase" if !st.purchased && before(st.c_ts, st.c_id, ts, id) =>
          st = st.copy(purchased = true); changed = true
        case _ =>
      }
    }
    if (changed) { state.update(st); Iterator.single(st) } else Iterator.empty
  }

  private def weekDay(tsUs: Long): Long =
    java.time.LocalDate.ofEpochDay(Math.floorDiv(tsUs, 86_400_000_000L))
      .`with`(java.time.temporal.TemporalAdjusters.previousOrSame(
        java.time.DayOfWeek.MONDAY))
      .toEpochDay

  private def foldRetention(userId: Long, rows: Iterator[(Long, Long, String)],
                            state: GroupState[RetentionState]): Iterator[RetentionHit] = {
    val st = state.getOption.getOrElse(RetentionState(Long.MinValue, Seq.empty))
    val evs = rows.toSeq
    val sigWeeks = evs.filter(_._3 == "signup").map(e => weekDay(e._2))
    val cohort = (sigWeeks ++
      (if (st.cohortDay != Long.MinValue) Seq(st.cohortDay) else Nil))
      .minOption.getOrElse(Long.MinValue)
    val allWeeks = (st.weeks ++ evs.map(e => weekDay(e._2))).distinct.sorted
    // pre-cohort weeks buffer in state until a signup fixes the
    // cohort; an earlier late signup re-bases every offset (update
    // emissions supersede, keyed by absolute week)
    val toEmit =
      if (cohort == Long.MinValue) Seq.empty
      else if (cohort != st.cohortDay) allWeeks
      else allWeeks.filterNot(st.weeks.contains)
    state.update(RetentionState(cohort, allWeeks))
    toEmit.iterator.map(w => RetentionHit(userId,
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(cohort)),
      (w - cohort) / 7, w))
  }

  /** events stream → per-user (cohort, activity-week) cells, the
    * incremental retention matrix: group the emissions by
    * (cohort_week, week_offset) and count users to recover
    * [[graft.ops.Events.retention]]. Converges on in-order sources;
    * late earlier signups re-base a user's offsets via superseding
    * update emissions.
    */
  def retentionState(events: DataFrame)(implicit spark: SparkSession): Dataset[RetentionHit] = {
    import spark.implicits._
    events.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(foldRetention)
  }

  /** events stream → per-user funnel state updates. */
  def funnelState(events: DataFrame)(implicit spark: SparkSession): Dataset[FunnelProgress] = {
    import spark.implicits._
    events.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(foldGroup)
  }

  /** Streaming heavy hitters: the streaming twin of the batch
    * `freq_items` Misra-Gries aggregate. Tokens shard into `buckets`
    * state groups by portable hash; each group holds at most
    * `capacity` counters maintained with the MG decrement rule, so
    * TOTAL state is buckets × capacity counters no matter the token
    * cardinality or how long the stream runs — the only way "what's
    * trending" survives an unbounded vocabulary at 100 TB/day. Each
    * trigger re-emits the group's refreshed summary (Update mode);
    * consumers take top-k by count across buckets. Same guarantee as
    * the batch sketch: per-bucket undercount ≤ N_bucket/capacity,
    * exact whenever capacity exceeds the bucket's true distinct
    * count.
    */
  def heavyHittersState(tokens: DataFrame, buckets: Int = 16,
                        capacity: Int = 64)
                       (implicit spark: SparkSession): Dataset[HeavyHitter] = {
    require(buckets > 0 && capacity > 0,
      s"buckets ($buckets) and capacity ($capacity) must be positive")
    import spark.implicits._
    tokens
      .select(pmod(xxhash64(col("token")), lit(buckets)).cast("int").as("bucket"),
        col("token"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        foldHeavyHitters(capacity))
  }

  private def foldHeavyHitters(capacity: Int)(
      bucket: Int, rows: Iterator[(Int, String)],
      state: GroupState[Map[String, Long]]): Iterator[HeavyHitter] = {
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    state.getOption.foreach(buf ++= _)
    def add(key: String, n: Long): Unit = buf.get(key) match {
      case Some(c) => buf.update(key, c + n)
      case None =>
        if (buf.size < capacity) buf.update(key, n)
        else {
          // MG decrement: charge every counter by min(n, smallest),
          // evict zeros — identical to the batch aggregate's rule
          val dec = math.min(n, buf.valuesIterator.min)
          buf.mapValuesInPlace((_, c) => c - dec)
          buf.filterInPlace((_, c) => c > 0)
          if (n > dec && buf.size < capacity) buf.update(key, n - dec)
        }
    }
    // pre-count the batch and fold in sorted-token order: partition
    // iterators arrive in shuffle order, and MG evictions depend on
    // insertion order — without the sort the emitted counter VALUES
    // (not the error guarantee) would differ run to run, breaking
    // the repo's determinism invariant
    rows.toSeq.groupBy(_._2).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
      .foreach { case (t, n) => add(t, n) }
    state.update(buf.toMap)
    buf.toSeq.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => HeavyHitter(bucket, t, c) }.iterator
  }

  /** Streaming twin of [[graft.ops.Events.tsMatch]]'s scoring pass:
    * per-series keyed state holds a RING BUFFER of the last L−1
    * values (fixed size — state is |series| × (L−1) doubles no
    * matter how long the stream runs, so no timeout/watermark
    * eviction is needed for boundedness), each arriving row completes
    * one length-L window, and the emission carries the same
    * 6dp-rounded z-normalized distance the batch operator computes —
    * bit-identical fold ([[graft.functions.HashOps.znormDistD]]).
    * Top-k selection stays downstream (rank the emissions), exactly
    * as the batch operator layers TopKPerKey over its scored scan.
    *
    * Ordering contract: rows fold in (ts, event_id) order within a
    * micro-batch; across batches a row at-or-before the state's
    * high-water mark would retro-edit windows already emitted, so it
    * is DROPPED (counted nowhere) — the stream equals the batch
    * operator on in-order sources, the same convention as
    * [[funnelState]], and the late-drop policy is what a watermark
    * would enforce at the source.
    */
  def tsMatchState(events: DataFrame,
                   pattern: Seq[Double] =
                     Seq(0.0, 0.0, 1.0, 2.0, 4.0, 2.0, 1.0, 0.0))
                  (implicit spark: SparkSession): Dataset[TsWindowScore] = {
    import spark.implicits._
    val zq = graft.ops.Events.znormPattern(pattern)
    events.select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        foldTsMatch(zq))
  }

  private def foldTsMatch(zq: Array[Double])(
      key: String, rows: Iterator[(String, Long, Long, Double)],
      state: GroupState[TsTail]): Iterator[TsWindowScore] = {
    val L = zq.length
    val st = state.getOption.getOrElse(TsTail(Long.MinValue, Long.MinValue, Seq.empty))
    val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      .filter(r => before(st.lastTs, st.lastId, r._2, r._3))
    if (sorted.isEmpty) return Iterator.empty
    val window = scala.collection.mutable.ArrayDeque.from(st.tail)
    val out = Seq.newBuilder[TsWindowScore]
    sorted.foreach { case (_, _, id, v) =>
      window.append(v)
      if (window.size > L) window.removeHead()
      if (window.size == L) {
        val d = graft.functions.HashOps.znormDistD(window.toArray, zq)
        if (!d.isNaN) out += TsWindowScore(key, id,
          // Spark's round(col, 6): HALF_UP over the shortest decimal
          // representation — match it exactly so emissions hash-equal
          // the batch operator's dist column
          BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val (lastTs, lastId) = (sorted.last._2, sorted.last._3)
    state.update(TsTail(lastTs, lastId, window.takeRight(L - 1).toSeq))
    out.result().iterator
  }

  /** Streaming twin of [[graft.ops.Events.attribution]]: per-user
    * keyed state carries the latest NON-purchase event (one
    * fixed-size row per user, the [[funnelState]] boundedness and
    * in-order-source convention); each purchase emits immediately,
    * credited to the carry at that moment — `direct` when none.
    * Within a micro-batch rows fold in (ts, event_id) order, so a
    * touch and its purchase landing in one batch attribute exactly
    * like the batch operator. Aggregating emissions by channel
    * recovers the batch totals; production adds an idle-user state
    * timeout, exactly as the funnel/retention folds would.
    */
  def attributionState(events: DataFrame)
                      (implicit spark: SparkSession): Dataset[AttributionHit] = {
    import spark.implicits._
    events.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        foldAttribution)
  }

  private def foldAttribution(
      userId: Long, rows: Iterator[(Long, Long, Long, String, Double)],
      state: GroupState[TouchState]): Iterator[AttributionHit] = {
    var st = state.getOption.orNull
    val out = Seq.newBuilder[AttributionHit]
    rows.toSeq.sortBy(r => (r._2, r._3)).foreach {
      case (_, tsUs, eid, typ, value) =>
        if (typ == "purchase")
          out += AttributionHit(userId,
            if (st == null) "direct" else st.touch_type, value, tsUs, eid)
        else if (st == null || before(st.ts_us, st.event_id, tsUs, eid))
          st = TouchState(typ, tsUs, eid)
    }
    if (st != null) state.update(st)
    out.result().iterator
  }

  /** Streaming twin of [[graft.ops.Events.anomaly]]: score a live
    * event stream against a (mu, sigma)-per-type model frame — the
    * classic stream-static enrichment, where the model is a bounded
    * broadcast refreshed out-of-band (retrain batch-side, swap the
    * frame). Stateless: scoring adds no store, no watermark, and
    * composes with any upstream dedup/window stage.
    */
  /** Streaming twin of [[graft.ops.Events.burst]]'s scoring side —
    * the live rate gate: watermarked 1-minute tumbling counts per
    * type, each FINALIZED window scored against a batch-fitted
    * active-minute baseline (the [[anomalyStream]] out-of-band
    * model-refresh contract: `baseline` is [[graft.ops.Events.burst]]
    * output, swapped in per refresh) with the identical
    * DECIMAL-widened integer-ppm arithmetic — a minute the gate
    * flags live is exactly a minute the batch audit would flag.
    * Append mode: a window emits once the watermark closes it, so
    * the gate reports completed minutes, never partial counts; state
    * is the open windows inside the watermark horizon.
    */
  def burstGateStream(events: DataFrame, baseline: DataFrame,
                      thresholdPpm: Long = 3000000L,
                      watermark: String = "2 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"),
        expr("unix_micros(w.start) div 60000000").as("minute"), col("c"))
      // LEFT join: an event type absent from the batch baseline is
      // exactly the novel bot-flood/retry-storm the gate exists to
      // flag — the gate fails CLOSED (is_burst=true, null ratio)
      // rather than silently dropping the row an inner join would
      .join(broadcast(baseline
          .select("event_type", "n_events", "n_active_minutes")),
        Seq("event_type"), "left")
      .withColumn("ratio_ppm", expr(
        "CAST(CAST(c AS DECIMAL(38,0)) * 1000000 * n_active_minutes " +
          "div n_events AS BIGINT)"))
      .withColumn("is_burst",
        coalesce(col("ratio_ppm") > thresholdPpm, lit(true)))

  def anomalyStream(events: DataFrame, model: DataFrame,
                    tau: Double = 2.0): DataFrame =
    events.join(broadcast(model), "event_type")
      .filter(abs((col("value") - col("mu")) / col("sigma")) >= tau)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"),
        round((col("value") - col("mu")) / col("sigma"), 3).as("z"))

  /** Streaming twin of [[graft.ops.RangeJoin.trailingCandidates]]: a
    * KEYLESS trailing-window join of two streams as a watermarked
    * stream-stream join. The ⌊ts/W⌋ band (floor division, negative-
    * safe like the batch operator) is manufactured on both sides so
    * the symmetric hash join has an equi-key to shard its state by —
    * without one, every buffered right row lands in a single state
    * partition and the join stops scaling with the cluster. The left
    * probe explodes to its ≤2 candidate bands; the exact time-range
    * predicate filters inside each band bucket AND gives Spark the
    * bound it needs to evict right-side state once the watermark
    * passes leftTs − W. Inner pairs only (the batch operator's
    * `in_window=true` rows); both inputs must already carry distinct
    * column names, as with the batch API.
    */
  /** Negative-safe floor-division band of a microsecond expression —
    * ONE definition for every banded streaming operator (the batch
    * twin keeps its own in [[graft.plans.IntervalNative]]): `div`
    * truncates toward zero and would mis-band pre-epoch times. */
  private def bandFloorSql(us: String, widthUs: Long): String =
    s"(($us div ${widthUs}L) - (case when $us % ${widthUs}L < 0 then 1 else 0 end))"

  def bandedRangeJoinStream(left: DataFrame, right: DataFrame,
                            leftTs: String, rightTs: String,
                            windowSec: Long,
                            watermark: String = "10 minutes"): DataFrame = {
    val wUs = windowSec * 1000000L
    def bandOf(us: String) = expr(bandFloorSql(us, wUs))
    val l = left.withWatermark(leftTs, watermark)
      .withColumn("__lband", explode(array_distinct(array(
        bandOf(s"(unix_micros($leftTs) - ${wUs}L)"),
        bandOf(s"unix_micros($leftTs)")))))
    val r = right.withWatermark(rightTs, watermark)
      .withColumn("__rband", bandOf(s"unix_micros($rightTs)"))
    l.join(r,
      col("__lband") === col("__rband") &&
        col(rightTs) > col(leftTs) - expr(s"INTERVAL $windowSec SECONDS") &&
        col(rightTs) <= col(leftTs))
      .drop("__lband", "__rband")
  }

  /** Streaming twin of the native keyed range join
    * ([[graft.plans.RangeNative.join]]): equality keys plus the
    * trailing window `(leftTs − W, leftTs]`, as a watermarked
    * stream-stream join. The equi-keys shard the symmetric-hash state
    * directly — no manufactured band column needed — and the range
    * predicate is the time constraint Structured Streaming uses to
    * evict buffered rows once the watermark passes `leftTs − W`, so
    * per-key state is bounded by the window, not the stream. With
    * `leftOuter=true`, left rows with no match in the window emit
    * null-padded once their own watermark expires (both sides must be
    * watermarked for that mode — enforced here for inner too, since
    * unwatermarked inner state grows without bound). Both inputs must
    * carry distinct column names, as with the batch API.
    */
  def keyedRangeJoinStream(left: DataFrame, right: DataFrame,
                           keys: Seq[(String, String)],
                           leftTs: String, rightTs: String,
                           windowSec: Long,
                           leftOuter: Boolean = false,
                           watermark: String = "10 minutes"): DataFrame = {
    require(keys.nonEmpty,
      "keys must be non-empty — for a keyless trailing-window join use bandedRangeJoinStream")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"rename the right side first — both sides have: ${shared.mkString(", ")}")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val cond = keys.map { case (lk, rk) => col(lk) === col(rk) }
      .reduce(_ && _) &&
      col(rightTs) > col(leftTs) - expr(s"INTERVAL $windowSec SECONDS") &&
      col(rightTs) <= col(leftTs)
    l.join(r, cond, if (leftOuter) "left_outer" else "inner")
  }

  /** One debounced emission: the kept event's key coordinates. */
  case class DebounceEmit(user_id: Long, event_type: String,
                          event_id: Long, ts_us: Long)

  /** Streaming twin of [[graft.ops.Events.debounce]] — the live form
    * a telemetry ingest actually runs: per-(user, type) keyed state
    * holds ONE long (the latest event time seen) and an arriving
    * event is emitted iff it opens a new burst (no prior event, or
    * gap exceeded). Same gap-session rule as the batch auditor, so
    * on an in-order replay the emitted set is exactly the batch
    * keep-set (spec-pinned across a burst-splitting batch boundary).
    * State is one fixed-size row per live (user, type) — bounded by
    * key cardinality, never stream length. Late rows at or before
    * the key's high-water mark DROP (the tsMatchState
    * watermark-at-source policy): a late duplicate must not re-open
    * a burst it actually belongs inside.
    */
  def debounceState(events: DataFrame, gapSec: Long = 5L)
                   (implicit spark: SparkSession): Dataset[DebounceEmit] = {
    import spark.implicits._
    require(gapSec > 0)
    val gapUs = gapSec * 1000000L
    events.select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[Long]) =>
          // micro-batch arrival order is not event order: sort the
          // batch's rows like the batch operator's window does
          val ordered = rows.toSeq.sortBy(r => (r._4, r._3))
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = ordered.flatMap { case (u, t, id, us) =>
            if (us <= last && last != Long.MinValue) None // late: drop
            else {
              val keep = last == Long.MinValue || us - last > gapUs
              last = us
              if (keep) Some(DebounceEmit(u, t, id, us)) else None
            }
          }
          state.update(last)
          out.iterator
      }
  }

  /** One observed transition: the user stepped from `prev_type` to
    * `next_type` at event time `ts_us`. */
  case class TransitionEmit(user_id: Long, prev_type: String,
                            next_type: String, ts_us: Long)

  /** Streaming twin of [[graft.ops.Events.markov]]'s transition
    * extraction — live (prev → next) behavior steps, ready for the
    * downstream count/normalize that builds the transition matrix.
    * Per-user keyed state is ONE fixed-size row — the latest (ts,
    * event_id, type) triple, the same composite high-water mark the
    * batch window orders by — so each in-order arrival emits exactly
    * one transition from the carried type. Late rows at or before
    * the (ts, id) mark DROP (the debounceState fence: a transition
    * already emitted must not re-fire with a different predecessor);
    * on in-order replay the emitted pair multiset is exactly the
    * batch operator's lag-window pairs (spec-pinned across a
    * sequence-splitting batch boundary, shuffled in-batch arrival
    * included).
    */
  def markovState(events: DataFrame)
                 (implicit spark: SparkSession): Dataset[TransitionEmit] = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[(Long, Long, String)]) =>
          // micro-batch arrival order is not event order: sort like
          // the batch operator's (ts, event_id) window
          val ordered = rows.toSeq.sortBy(r => (r._4, r._3))
          var carry = state.getOption.orNull
          val out = Seq.newBuilder[TransitionEmit]
          ordered.foreach { case (_, t, id, us) =>
            if (carry == null) carry = (us, id, t)
            else if (us > carry._1 || (us == carry._1 && id > carry._2)) {
              out += TransitionEmit(userId, carry._3, t, us)
              carry = (us, id, t)
            } // else: at or before the high-water mark — drop
          }
          state.update(carry)
          out.result().iterator
      }
  }

  /** One session boundary emission: `delta` is +1 at a session's
    * first event time, −1 at its end + 1µs (the half-open
    * [s, e+1µs) convention of [[graft.ops.Events.concurrency]]'s
    * sweep), so the running sum of deltas in `us` order IS the live
    * concurrent-session gauge.
    */
  case class SessionDelta(user_id: Long, us: Long, delta: Int)

  /** Streaming twin of [[graft.ops.Events.concurrency]]'s sweep
    * input — live session OPEN/CLOSE deltas under the q16 gap rule.
    * Per-user keyed state holds ONE long (the session's latest
    * event time). An arrival that opens a session emits +1 at its
    * time; an arrival more than `gapSec` past the carry closes the
    * old session (−1 at last + 1µs, the batch sweep's half-open
    * convention) and opens a new one. A session whose user goes
    * quiet closes by EVENT-TIME TIMEOUT once the watermark passes
    * last + gap — so every −1 eventually emits and state holds one
    * row per ACTIVE user only (quiet users are removed, unlike the
    * debounce carry which lives forever). Downstream, a running sum
    * of deltas in time order is the live concurrency gauge, and a
    * windowed sum/max reproduces the batch per-day profile.
    * Spec-pinned: the NET deltas (summed per (user, time) — exact
    * cancellation, since every delta is ±1 at an integer micro)
    * equal the batch session spans' boundaries across a
    * session-splitting batch boundary. Out-of-order arrivals are
    * honored within the span they can still reach: a row inside the
    * live span moves no boundary; a row BEFORE the open session's
    * published start but within its gap reach retro-extends it with
    * a COMPENSATING pair (−1 at the stale start cancels the emitted
    * +1 in any event-time-ordered sum, +1 lands at the true start) —
    * so consumers aggregating by event time converge to the batch
    * answer. Two arrivals stay out of scope by construction and
    * drop: rows at or before the watermark (the state may already be
    * timeout-closed and removed — reprocessing would reopen a
    * phantom span), and rows older than the open start's gap reach
    * (a separate earlier session, or a bridge into one already
    * closed and reported — both need multi-span state).
    */
  def concurrencyState(events: DataFrame, gapSec: Long = 1800L,
                       watermark: String = "30 minutes")
                      (implicit spark: SparkSession): Dataset[SessionDelta] = {
    import spark.implicits._
    require(gapSec > 0)
    val gapUs = gapSec * 1000000L
    events.withWatermark("ts", watermark)
      // the watermarked `ts` column must SURVIVE into the stateful
      // operator's input — projecting it away drops the event-time
      // tag and the analyzer rejects the event-time timeout
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long)]) => // (session start, latest event)
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is over
            val (_, last) = state.get
            state.remove()
            Iterator.single(SessionDelta(user, last + 1L, -1))
          } else {
            // rows at or before the watermark DROP explicitly:
            // flatMapGroupsWithState never auto-drops late data, and
            // after a timeout-close removed the state a beyond-
            // watermark straggler would otherwise reopen a phantom
            // session inside an already-reported span
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            // micro-batch arrival order is not event order: sort the
            // batch's rows like the batch session window does
            val ordered = rows.toSeq.filter(_._3 > wmUs)
              .sortBy(r => (r._3, r._2))
            val out = Seq.newBuilder[SessionDelta]
            var start = Long.MinValue
            var last = Long.MinValue
            state.getOption.foreach { case (s0, l0) => start = s0; last = l0 }
            ordered.foreach { case (_, _, us, _) =>
              if (last == Long.MinValue) {
                out += SessionDelta(user, us, 1); start = us; last = us
              } else if (us >= start && us <= last) {
                // inside the live span: no boundary moves
              } else if (us < start) {
                // in-watermark out-of-order arrival BEFORE the open
                // session's published start. Gap-reachable → the
                // batch session truly starts here: publish the
                // COMPENSATING pair (−1 at the stale start cancels
                // the already-emitted +1 in any event-time-ordered
                // sum; +1 at the true start replaces it). A row
                // older than start − gap would be a separate earlier
                // session (or a bridge into one already closed and
                // reported) — reconstructing those needs multi-span
                // state, so they drop; the spec pins this scope.
                if (start - us <= gapUs) {
                  out += SessionDelta(user, start, -1)
                  out += SessionDelta(user, us, 1)
                  start = us
                }
              } else if (us - last > gapUs) {
                out += SessionDelta(user, last + 1L, -1)
                out += SessionDelta(user, us, 1)
                start = us; last = us
              } else last = us
            }
            if (last != Long.MinValue) {
              state.update((start, last))
              // timeout must sit past the current watermark; a
              // session already expired by this batch's watermark
              // fires on the next trigger
              state.setTimeoutTimestamp(
                math.max(last / 1000L + gapSec * 1000L + 1L,
                  state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }

  /** Per-user sliding-rate buffer: events the watermark has not yet
    * finalized (`pending`, (event_id, us)) plus every event time a
    * pending or future window can still reach (`times`, pruned at
    * watermark − W). Bounded by the user's event count inside one
    * watermark-plus-window horizon — a data-rate constant, never the
    * stream's history.
    */
  case class RateBuf(pending: Seq[(Long, Long)], times: Seq[Long])

  /** One finalized rate emission: the trailing-window count of
    * `event_id`'s user at its event time, bit-identical to the batch
    * [[graft.ops.Events.rateWindows]] trailing count for the same
    * event. */
  case class RateHit(user_id: Long, event_id: Long, us: Long,
                     n_in_window: Long, gated: Boolean)

  /** Streaming twin of [[graft.ops.Events.rateWindows]] — the LIVE
    * per-user rate gate: every event's trailing `(ts − W, ts]`
    * same-user count, emitted once the watermark FINALIZES the event
    * (every row in its window carries ts ≤ us ≤ watermark and has
    * therefore arrived — in-horizon disorder cannot change an
    * emitted count, so a count the gate publishes is exactly the
    * batch audit's count for that event). Append mode; beyond-
    * watermark stragglers drop explicitly (their windows may already
    * be finalized — flatMapGroupsWithState never auto-drops late
    * rows); the event-time timeout drains pending events and expires
    * idle users' time buffers without waiting for their next event.
    */
  def rateGateStream(events: DataFrame, windowSec: Long = 86400L,
                     threshold: Long = 3L, watermark: String = "1 hour")
                    (implicit spark: SparkSession): Dataset[RateHit] = {
    import spark.implicits._
    require(windowSec > 0, s"windowSec ($windowSec) must be positive")
    require(threshold > 0, s"threshold ($threshold) must be positive")
    val wUs = windowSec * 1000000L
    events.withWatermark("ts", watermark)
      // the watermarked ts column must survive into the stateful
      // operator's input (the concurrencyState rule)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[RateBuf]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(RateBuf(Seq.empty, Seq.empty))
          // the exec itself pre-filters rows at/below the watermark;
          // this filter restates the contract for state restored from
          // a checkpoint whose watermark has since advanced
          val fresh =
            if (state.hasTimedOut) Seq.empty
            else rows.toSeq.filter(_._3 >= wmUs).map(r => (r._2, r._3))
          val pending = (prev.pending ++ fresh).sortBy(p => (p._2, p._1))
          val times = (prev.times ++ fresh.map(_._2)).sorted
          // final once the watermark passes STRICTLY above the event
          // time: every row of the (us − W, us] window carries
          // ts ≤ us < wm and can no longer arrive
          val (done, still) = pending.partition(_._2 < wmUs)
          val out = done.map { case (id, us) =>
            val n = times.count(t => t > us - wUs && t <= us).toLong
            RateHit(user, id, us, n, n >= threshold)
          }
          // a future event has us > wm, so its window floor us − W
          // exceeds wm − W: older times are unreachable, drop them
          val keepTimes = times.filter(_ > wmUs - wUs)
          if (still.isEmpty && keepTimes.isEmpty) state.remove()
          else {
            state.update(RateBuf(still, keepTimes))
            val target =
              if (still.nonEmpty) still.head._2 / 1000L + 1L
              // only finalized times remain: expire them once no
              // future window can reach them
              else keepTimes.max / 1000L + windowSec * 1000L + 1L
            state.setTimeoutTimestamp(
              math.max(target, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  /** One interval buffered in a band group's symmetric join state:
    * the caller's long key payload plus the closed [s_us, e_us] span.
    */
  case class IntervalBuf(key: Long, s_us: Long, e_us: Long)

  /** One emitted overlap pair, left-stream fields first. Spans are
    * long microseconds, the batch [[graft.plans.IntervalNative]]
    * convention. */
  case class IntervalPairEmit(l_key: Long, l_s: Long, l_e: Long,
                              r_key: Long, r_s: Long, r_e: Long)

  /** Streaming twin of the native plane-sweep interval join
    * ([[graft.plans.IntervalJoinExec]]) — completes the temporal
    * triad live (as-of: [[keyedRangeJoinStream]]; trailing range:
    * [[bandedRangeJoinStream]]; this: two SPANS intersecting, the
    * who-is-online-together view). Both inputs carry `(key: long,
    * s: timestamp, e: timestamp)` closed spans; every (left, right)
    * pair whose spans overlap (`ls ≤ re && rs ≤ le` — touching
    * endpoints match) emits EXACTLY ONCE, with no dedup state:
    *
    *  - each interval explodes to the time bands its span covers and
    *    the union of both sides groups by band — SYMMETRIC keyed
    *    state, two buffers per band, shardable on the band key;
    *  - an arriving interval probes the OPPOSITE buffer and a pair
    *    emits only in the band owning `max(l_s, r_s)` (both partners
    *    provably span that band — the IntervalJoinExec discipline),
    *    so multi-band pairs never duplicate; within the owning band
    *    the pair emits when its SECOND member arrives (the first is
    *    already buffered), so cross-batch arrival never duplicates
    *    either;
    *  - eviction is WATERMARK-DRIVEN at two grains: buffered
    *    intervals whose END the watermark has passed drop at every
    *    trigger (no future admitted arrival can overlap them — the
    *    batch exec's own-side prune, streamed), and once the
    *    watermark passes a band's end the whole band group retires
    *    by event-time timeout. Per-band state is the band's
    *    watermark-LIVE interval set, with `bandSec` the
    *    state/replication knob exactly as in the batch exec.
    *
    * Ordering contract (the per-file twin discipline): rows fold in
    * (start, end, side, key) order within a micro-batch; a row whose
    * START is at or before the watermark drops explicitly — its
    * owner bands may already be retired, and a phantom re-pairing
    * after eviction would under- or re-emit. A source emitting
    * intervals at CLOSE time should therefore set `watermark` to at
    * least the longest expected span plus arrival disorder: the
    * watermark is driven by starts, so that slack is what keeps a
    * long-lived session's start inside the window when it finally
    * closes.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         bandSec: Long, watermark: String = "1 hour")
                        (implicit spark: SparkSession): Dataset[IntervalPairEmit] = {
    import spark.implicits._
    require(bandSec > 0, s"bandSec ($bandSec) must be positive")
    val W = bandSec * 1000000L
    def floorBand(c: String) = bandFloorSql(c, W)
    def prep(df: DataFrame, isLeft: Boolean) =
      df.withWatermark("s", watermark)
        .select(lit(isLeft).as("is_left"), col("key"),
          expr("unix_micros(s)").as("s_us"), expr("unix_micros(e)").as("e_us"),
          // the watermarked column must SURVIVE into the stateful
          // operator's input (the concurrencyState gotcha)
          col("s"))
        .withColumn("band", explode(expr(
          s"sequence(${floorBand("s_us")}, ${floorBand("e_us")})")))
    val both = prep(left, isLeft = true).unionByName(prep(right, isLeft = false))
      .as[(Boolean, Long, Long, Long, java.sql.Timestamp, Long)]
    both.groupByKey(_._6)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (band: Long,
         rows: Iterator[(Boolean, Long, Long, Long, java.sql.Timestamp, Long)],
         state: GroupState[(Seq[IntervalBuf], Seq[IntervalBuf])]) =>
          if (state.hasTimedOut) {
            // watermark passed the band's end: no future arrival can
            // own a pair here — the band's buffers retire wholesale
            state.remove()
            Iterator.empty
          } else {
            // watermark 0 means NOT YET SET (Spark's initial value):
            // nothing can be late before any watermark exists, and
            // a strict s_us > 0 gate would silently drop pre-epoch
            // spans the batch twin's negative-safe banding supports
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (lb0, rb0) = state.getOption.getOrElse(
              (Seq.empty[IntervalBuf], Seq.empty[IntervalBuf]))
            // drop buffered intervals the watermark has killed: any
            // future admitted arrival has s_us > wmUs, so an entry
            // with e_us <= wmUs can never overlap again — without
            // this a one-sided band's buffer grows toward its
            // population (the batch exec's own-side prune, streamed)
            val lb = scala.collection.mutable.ArrayBuffer.from(
              if (wmUs > 0L) lb0.filter(_.e_us > wmUs) else lb0)
            val rb = scala.collection.mutable.ArrayBuffer.from(
              if (wmUs > 0L) rb0.filter(_.e_us > wmUs) else rb0)
            val fresh = rows.toSeq.filter(r => wmUs == 0L || r._3 > wmUs)
              .sortBy(r => (r._3, r._4, r._1, r._2))
            val out = Seq.newBuilder[IntervalPairEmit]
            fresh.foreach { case (isLeft, key, sUs, eUs, _, _) =>
              val opp = if (isLeft) rb else lb
              opp.foreach { o =>
                if (sUs <= o.e_us && o.s_us <= eUs &&
                    Math.floorDiv(math.max(sUs, o.s_us), W) == band) {
                  out += (if (isLeft)
                    IntervalPairEmit(key, sUs, eUs, o.key, o.s_us, o.e_us)
                  else
                    IntervalPairEmit(o.key, o.s_us, o.e_us, key, sUs, eUs))
                }
              }
              (if (isLeft) lb else rb) += IntervalBuf(key, sUs, eUs)
            }
            if (lb.nonEmpty || rb.nonEmpty) {
              state.update((lb.toSeq, rb.toSeq))
              // retire at band end; a band the watermark already
              // passed (all its rows just dropped as late) arms for
              // the next trigger
              state.setTimeoutTimestamp(
                math.max((band + 1L) * W / 1000L,
                  state.getCurrentWatermarkMs() + 1L))
            } else if (state.exists) {
              // the prune emptied both buffers: nothing left to pair
              state.remove()
            }
            out.result().iterator
          }
      }
  }

  /** One distribution-drift emission: the type's rows-so-far and the
    * current binned-KS distance to the reference ECDF. */
  case class ValueDriftEmit(event_type: String, n_cur: Long, ks: Double)

  /** Fit the REFERENCE side of the streaming drift monitor from a
    * batch frame (yesterday's corpus): global [lo, hi] value bounds
    * plus dense per-type bin counts in the q33/`Events.valueDrift`
    * fixed-width convention. Model-sized driver collect (types ×
    * bins longs) — the anomalyStream model-fitting posture.
    */
  def driftReference(reference: DataFrame, bins: Int = 20)
      : (Double, Double, Map[String, Seq[Long]]) = {
    require(bins > 0)
    val b = reference.agg(min("value").as("lo"), max("value").as("hi")).head()
    val (lo, hi) = (b.getAs[Double]("lo"), b.getAs[Double]("hi"))
    require(hi > lo, s"degenerate value range [$lo, $hi]")
    val rows = reference.select(col("event_type"),
        least(floor(((col("value") - lo) * bins) / (hi - lo)),
          lit(bins - 1L)).cast("int").as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
      .collect()
    val byType = rows.groupBy(_.getAs[String]("event_type")).map {
      case (t, rs) =>
        val dense = Array.fill(bins)(0L)
        rs.foreach(r => dense(r.getAs[Int]("bin")) = r.getAs[Long]("n"))
        t -> dense.toSeq
    }
    (lo, hi, byType)
  }

  /** Streaming twin of [[graft.ops.Events.valueDrift]]: per-type
    * binned value counts accumulate in keyed state (bounded at
    * |types| × bins longs — no watermark needed for boundedness, the
    * labelDriftState discipline), and every micro-batch emits the
    * CURRENT two-sample KS distance of the type's stream-so-far
    * against the reference ECDF fitted by [[driftReference]] and
    * swapped out-of-band (anomalyStream's model-refresh contract).
    * Arithmetic mirrors the batch operator bin for bin — same
    * IEEE bin expression, exact integer cumulatives, double division,
    * max before one 6dp HALF_UP round — so a stream that has seen
    * exactly the batch operator's second window reports its `ks`
    * (spec-pinned, extremes planted in the reference window so both
    * sides share [lo, hi]). Values outside the reference range clamp
    * to the edge bins: out-of-range mass is precisely the drift the
    * monitor exists to flag, never an error. A type ABSENT from the
    * reference is the maximal shift (a newly-introduced event type),
    * not a missing value: it emits ks = 1.0 — the batch operator's
    * one-sided-window rule. (The converse — a reference type that
    * never arrives — is invisible to any per-arrival monitor; the
    * batch twin reports it.)
    */
  def valueDriftState(events: DataFrame, lo: Double, hi: Double,
                      reference: Map[String, Seq[Long]], bins: Int = 20)
                     (implicit spark: SparkSession): Dataset[ValueDriftEmit] = {
    import spark.implicits._
    require(bins > 0 && hi > lo)
    val refEcdf: Map[String, Array[Double]] = reference.map { case (t, cs) =>
      require(cs.length == bins, s"reference for $t has ${cs.length} bins")
      val tot = cs.sum.toDouble
      t -> cs.scanLeft(0L)(_ + _).tail.map(_ / tot).toArray
    }
    events.select(col("event_type"), col("value")).as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[(String, Double)],
         state: GroupState[Seq[Long]]) =>
          val counts = state.getOption.map(_.toArray)
            .getOrElse(Array.fill(bins)(0L))
          rows.foreach { case (_, v) =>
            val raw = math.floor(((v - lo) * bins) / (hi - lo))
            val b = math.min(math.max(raw, 0.0), (bins - 1).toDouble).toInt
            counts(b) += 1
          }
          state.update(counts.toSeq)
          refEcdf.get(etype) match {
            case None =>
              val n = counts.sum
              if (n == 0L) Iterator.empty
              else Iterator.single(ValueDriftEmit(etype, n, 1.0))
            case Some(rc) =>
              val n = counts.sum
              if (n == 0L) Iterator.empty
              else {
                var cum = 0L
                var ks = 0.0
                var j = 0
                while (j < bins) {
                  cum += counts(j)
                  val d = math.abs(cum.toDouble / n - rc(j))
                  if (d > ks) ks = d
                  j += 1
                }
                Iterator.single(ValueDriftEmit(etype, n,
                  BigDecimal(ks).setScale(6,
                    BigDecimal.RoundingMode.HALF_UP).toDouble))
              }
          }
      }
  }

  /** One live daily-volume cell: the running count for (type, day),
    * `is_final` once the watermark closed the day for good.
    * `day_epoch` is days since the epoch (UTC) — the TZ-free key the
    * batch `dailySeries` day column reduces to under the UTC
    * session.
    */
  case class DailyVolumeEmit(event_type: String, day_epoch: Long,
                             n: Long, is_final: Boolean)

  /** Streaming twin of `Events.dailySeries`'s observed cells — the
    * live feed under the batch trend/change-point/autocorrelation
    * consumers: per (type, UTC day) counts carried as ONE long of
    * keyed state, running cells emitted every touched batch, the
    * cell FINALIZED (emitted with `is_final` and state dropped) by
    * EVENT-TIME TIMEOUT once the watermark passes the day's end plus
    * `allowanceSec`. Arrivals at-or-before the watermark drop
    * explicitly (the concurrencyState fence: after a finalize a
    * straggler would otherwise reopen a phantom partial cell inside
    * an already-reported day); arrivals after the fence for a
    * still-open day accumulate normally however they interleave.
    * State is bounded by the live (type, day) cells inside the
    * watermark horizon — |types| × O(1) days, regardless of stream
    * length. The dense zero-day grid stays a read-side concern
    * (exactly as in the batch operator, where the calendar join
    * manufactures it after the corpus agg).
    */
  def dailyVolumeState(events: DataFrame,
                       watermark: String = "1 hour",
                       allowanceSec: Long = 3600L)
                      (implicit spark: SparkSession): Dataset[DailyVolumeEmit] = {
    import spark.implicits._
    require(allowanceSec >= 0, s"allowanceSec ($allowanceSec) must be >= 0")
    val dayUs = 86400000000L
    events.withWatermark("ts", watermark)
      // the watermarked ts column must survive into the stateful
      // operator's input (event-time timeout analysis requirement)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"), col("ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, math.floorDiv(r._2, dayUs)))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: (String, Long), rows: Iterator[(String, Long, java.sql.Timestamp)],
         state: GroupState[Long]) =>
          val (etype, day) = key
          if (state.hasTimedOut) {
            val n = state.get
            state.remove()
            Iterator.single(DailyVolumeEmit(etype, day, n, is_final = true))
          } else {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val fresh = rows.count(_._2 > wmUs).toLong
            if (fresh == 0L) Iterator.empty
            else {
              val n = state.getOption.getOrElse(0L) + fresh
              state.update(n)
              state.setTimeoutTimestamp(
                math.max((day + 1) * 86400000L + allowanceSec * 1000L,
                  state.getCurrentWatermarkMs() + 1L))
              Iterator.single(DailyVolumeEmit(etype, day, n, is_final = false))
            }
          }
      }
  }

  /** Streaming twin of [[graft.ops.Events.cumulativeUniques]]'s
    * first-seen identity: one emission per user when first observed,
    * carrying the first-seen EVENT-TIME day — so daily new-user
    * counts (and through them the exact cumulative distinct-user
    * curve) fold from the emissions without any distinct work.
    * State per user is ONE long (the current first day); a late
    * event carrying an EARLIER day than the recorded one re-attributes
    * the user with an `is_correction` emission (the downstream fold
    * takes each user's latest row — the compensating-pair discipline
    * of [[concurrencyState]], specialized to a min that only ever
    * moves back). The latest emission per user always equals the
    * batch operator's per-user `min(day)` over the rows seen so far,
    * whatever the arrival order — pinned across a batch boundary by
    * the spec.
    */
  def firstSeenState(events: DataFrame)
                    (implicit spark: SparkSession): Dataset[FirstSeen] = {
    import spark.implicits._
    val dayUs = 86400000000L
    events
      .select(col("user_id"), expr("unix_micros(ts)").as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long)],
         state: GroupState[Long]) =>
          val md = rows.map(r => math.floorDiv(r._2, dayUs)).min
          state.getOption match {
            case None =>
              state.update(md)
              Iterator.single(FirstSeen(userId, md, is_correction = false))
            case Some(cur) if md < cur =>
              state.update(md)
              Iterator.single(FirstSeen(userId, md, is_correction = true))
            case _ => Iterator.empty
          }
      }
  }
}
