package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming analytics over the `events` shape
  * (event_id, ts, user_id, event_type, value) — the extension surface
  * beyond the reference's event-per-file model (SURVEY §2.11 end:
  * watermarks, event-time windows, session state).
  *
  * All operators take a STREAMING frame (`readStream` source or
  * MemoryStream in tests) and return an unstarted streaming frame —
  * callers pick sink/output mode. They also run unchanged on batch
  * frames (Spark's unified API), which is how the oracle-checked
  * batch q18 shares semantics with [[hourlyCounts]].
  *
  * Scale: a watermarked windowed agg keeps state only for open
  * windows (bounded by watermark lag × window rate); sessionization
  * state is one small Session per active (user) group, evicted by
  * event-time timeout. Both shuffle once on the group key.
  */
// Serializable: the stateful update closures call the shared
// watermark helper below, so they capture the module reference
object EventStreams extends Serializable {

  /** Typed event for the stateful operators. `ts` in epoch millis —
    * milliseconds because GroupState timeouts speak millis. */
  final case class Event(event_id: Long, ts: Long, user_id: Long, event_type: String, value: Double)

  /** The current event-time watermark, or None on a BATCH run: the
    * unified API runs these operators on batch frames too, where no
    * watermark exists and the getter throws. */
  private def watermarkMs(state: GroupState[_]): Option[Long] =
    try Some(state.getCurrentWatermarkMs())
    catch { case _: UnsupportedOperationException => None }

  /** A closed activity session: maximal run of one user's events with
    * no gap exceeding `gapMs`. */
  final case class Session(
      user_id: Long,
      start_ts: Long,
      end_ts: Long,
      n_events: Long,
      total_value: Double,
  )

  /** Tumbling event-time windows with a watermark: per (window,
    * event_type) counts and value sums. Late data beyond
    * `watermarkDelay` is dropped by the engine; state for closed
    * windows is evicted — the unbounded-state hazard of a naive
    * streaming groupBy is exactly what the watermark bounds. */
  def hourlyCounts(
      events: DataFrame,
      tsCol: String = "ts",
      watermarkDelay: String = "1 hour",
      windowLen: String = "1 hour",
      slide: Option[String] = None, // Some("30 minutes") → sliding windows
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        slide.fold(window(col(tsCol), windowLen))(s => window(col(tsCol), windowLen, s)),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("cnt"),
        col("sum_value"),
      )

  /** Streaming exact deduplication on `event_id` with watermark-
    * bounded state — the intake-side dedup an LLM event/data feed
    * needs when the transport is at-least-once (retried producers,
    * replayed partitions): the first arrival of an id wins, duplicates
    * arriving within `watermarkDelay` of the event time are dropped,
    * and the engine evicts an id's state once the watermark passes it.
    * That eviction is the contract's honest edge: a duplicate arriving
    * LATER than the watermark delay is no longer detectable — the
    * standard bounded-state trade (unbounded streaming dedup is
    * unbounded state; the batch exact-dedup operators cover full-
    * history semantics). Uses the engine's own
    * `dropDuplicatesWithinWatermark` so state bookkeeping rides the
    * streaming aggregation machinery, one shuffle on the id. */
  def dedupeStream(
      events: DataFrame,
      tsCol: String = "ts",
      idCols: Seq[String] = Seq("event_id"),
      watermarkDelay: String = "1 hour",
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Gap-based sessionization via `flatMapGroupsWithState`: one state
    * entry per user holding the open session; events extend it while
    * gaps stay under `gapMs`, otherwise the closed session is emitted
    * and a new one opens. Event-time timeout closes idle sessions once
    * the watermark passes end_ts + gap (so state is bounded and
    * sessions eventually flush without requiring a newer event). */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String = "10 minutes",
  ): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(
        userId: Long,
        batch: Iterator[Event],
        state: GroupState[Session],
    ): Iterator[Session] = {
      val sorted = batch.toSeq.sortBy(e => (e.ts, e.event_id))
      var closed = List.empty[Session]
      if (sorted.isEmpty) {
        // no new events: only a timeout can have woken us
        if (state.hasTimedOut && state.exists) {
          closed = state.get :: closed
          state.remove()
        }
      } else {
        var cur = state.getOption.orNull
        sorted.foreach { e =>
          if (cur == null) {
            cur = Session(userId, e.ts, e.ts, 1L, e.value)
          } else if (e.ts - cur.end_ts > gapMs) {
            closed = cur :: closed
            cur = Session(userId, e.ts, e.ts, 1L, e.value)
          } else {
            cur = cur.copy(
              end_ts = math.max(cur.end_ts, e.ts),
              n_events = cur.n_events + 1L,
              total_value = cur.total_value + e.value,
            )
          }
        }
        state.update(cur)
        // clamped above the current watermark — a batch of events all
        // older than watermark − gap would otherwise compute a timeout
        // the API rejects (it must exceed the watermark); batch runs
        // have no watermark and need no clamp
        state.setTimeoutTimestamp(math.max(
          cur.end_ts + gapMs,
          watermarkMs(state).getOrElse(Long.MinValue) + 1))
      }
      closed.reverseIterator
    }

    events
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** One stage advance of one user's funnel walk (`stage` 1-based). */
  final case class FunnelProgress(user_id: Long, stage: Int, stage_name: String, ts: Long)

  /** Streaming funnel — the live twin of [[graft.ops.Funnel.funnel]]:
    * per-user state walks `stages` strictly in event-time order and
    * emits a [[FunnelProgress]] row the moment a stage is reached
    * (append mode — the conversion dashboard updates per micro-batch,
    * not per nightly batch job).
    *
    * Semantics vs the batch operator: identical on in-order input
    * (each batch is sorted by (ts, event_id) before folding, so
    * within-batch disorder is absorbed; the agreement spec pins
    * equality). The PROGRESSIVE trade: a stage-enabling event that
    * arrives in a LATER micro-batch than an event it would have
    * unlocked cannot rewrite already-emitted progress — the streaming
    * answer converges to the batch answer as ordering holds, which is
    * the standard watermark contract.
    *
    * State is bounded three ways: completing the walk removes the
    * state immediately; idle users are evicted by event-time timeout
    * once the watermark passes last activity + `idleMs` (funnel
    * abandonment — a returning user restarts from stage one, and the
    * eviction is therefore OBSERVABLE and tested); and per-user state
    * is just the reached-stage timestamps (<= |stages| longs). */
  def funnelStream(
      events: Dataset[Event],
      stages: Seq[String],
      watermarkDelay: String = "10 minutes",
      idleMs: Long = 3600L * 1000,
  ): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    require(idleMs > 0, s"idleMs must be positive, got $idleMs")
    val spark = events.sparkSession
    import spark.implicits._

    def update(
        userId: Long,
        batch: Iterator[Event],
        state: GroupState[Seq[Long]],
    ): Iterator[FunnelProgress] = {
      if (state.hasTimedOut) {
        // abandonment: forget the partial walk; a comeback restarts
        state.remove()
        Iterator.empty
      } else {
        val sorted = batch.toSeq.sortBy(e => (e.ts, e.event_id))
        var times = state.getOption.getOrElse(Seq.empty)
        var out = List.empty[FunnelProgress]
        sorted.foreach { e =>
          val next = times.size
          if (next < stages.size && e.event_type == stages(next) &&
              (next == 0 || e.ts > times(next - 1))) {
            times = times :+ e.ts
            out = FunnelProgress(userId, next + 1, stages(next), e.ts) :: out
          }
        }
        if (times.size == stages.size) {
          // journey complete — no further state to hold
          state.remove()
        } else if (times.nonEmpty && sorted.nonEmpty) {
          // users who never reached stage one hold NO state at all;
          // any activity refreshes a partial walk's abandonment clock.
          // Clamped above the current watermark: a batch whose events
          // all predate watermark − idleMs would otherwise compute a
          // timeout the API rejects (it must exceed the watermark);
          // batch runs have no watermark and need no clamp
          state.update(times)
          state.setTimeoutTimestamp(math.max(
            sorted.map(_.ts).max + idleMs,
            watermarkMs(state).getOrElse(Long.MinValue) + 1))
        }
        out.reverseIterator
      }
    }

    events
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** One finalized point of a user's dense period series. */
  final case class LocfPoint(user_id: Long, period: Long, value_filled: Double, observed: Boolean)

  /** [[locfStream]] state: the last FINALIZED period and its total
    * (what gap rows carry forward), plus the per-period running sums
    * the watermark has not yet finalized. Sums are exact integer
    * CENTS — the streaming stand-in for the batch operator's
    * DECIMAL(18,2) discipline: merge order cannot perturb them. */
  final case class LocfState(lastPeriod: Long, lastCents: Long, pending: Map[Long, Long])

  /** Streaming LOCF gap-fill — the live twin of
    * [[graft.ops.TimeSeries.gapFillLocf]]: per-user per-period exact
    * totals emitted AS THE WATERMARK FINALIZES THEM, with missing
    * periods between observed ones carried forward (append mode — the
    * dense series a live dashboard or feature store consumes point by
    * point, not per nightly batch).
    *
    * A period emits once the watermark passes its end (total fixed —
    * late events within the delay still land in their period because
    * it is still pending). Gap rows only ever sit BETWEEN finalized
    * observed periods, exactly like the batch grid (first..last
    * active: the series never speculates past the last observation).
    *
    * State is bounded two ways: pending periods span at most the
    * watermark lag (finalized ones leave state immediately), and an
    * idle user — no activity for `idleMs` past the watermark — is
    * evicted wholesale. Eviction is the documented divergence from
    * batch: a comeback after eviction starts a FRESH series (no gap
    * rows bridge the absence), the same contract as
    * [[funnelStream]]'s restart; within `idleMs` the two agree
    * point-for-point (spec-pinned). */
  def locfStream(
      events: Dataset[Event],
      periodMs: Long,
      watermarkDelay: String = "10 minutes",
      idleMs: Long = 24L * 3600 * 1000,
  ): Dataset[LocfPoint] = {
    require(periodMs > 0, s"periodMs must be positive, got $periodMs")
    require(idleMs > 0, s"idleMs must be positive, got $idleMs")
    val spark = events.sparkSession
    import spark.implicits._

    val NoLast = Long.MinValue

    // finalize every pending period the watermark has passed: gap
    // rows from the last finalized period, then the observed row
    def flush(
        userId: Long,
        st: LocfState,
        wmPeriod: Long,
    ): (List[LocfPoint], LocfState) = {
      val ready = st.pending.keys.filter(_ < wmPeriod).toSeq.sorted
      if (ready.isEmpty) (Nil, st)
      else {
        var last = st.lastPeriod
        var lastC = st.lastCents
        val out = List.newBuilder[LocfPoint]
        ready.foreach { p =>
          if (last != NoLast) {
            var g = last + 1
            while (g < p) {
              out += LocfPoint(userId, g, lastC / 100.0, observed = false)
              g += 1
            }
          }
          lastC = st.pending(p)
          last = p
          out += LocfPoint(userId, p, lastC / 100.0, observed = true)
        }
        (out.result(), LocfState(last, lastC, st.pending -- ready))
      }
    }

    def update(
        userId: Long,
        batch: Iterator[Event],
        state: GroupState[LocfState],
    ): Iterator[LocfPoint] = {
      // batch run (unified API): no watermark exists — ALL data is
      // present, so every period finalizes and the output equals the
      // batch operator's (spec-pinned agreement)
      val wmOpt = watermarkMs(state)
      val wmPeriod =
        wmOpt.map(Math.floorDiv(_, periodMs)).getOrElse(Long.MaxValue)
      val st0 = state.getOption.getOrElse(LocfState(NoLast, 0L, Map.empty))
      // merge the batch: periods at/before the last finalized one are
      // late beyond repair (their row already emitted) and drop.
      // Defensive — the engine already filters sub-watermark rows
      // before an EventTimeTimeout state function (spec-pinned), and
      // every already-finalized period lies below the watermark
      var pending = st0.pending
      batch.foreach { e =>
        val p = Math.floorDiv(e.ts, periodMs)
        if (st0.lastPeriod == NoLast || p > st0.lastPeriod) {
          val cents = Math.round(e.value * 100)
          pending = pending.updated(p, pending.getOrElse(p, 0L) + cents)
        }
      }
      val (out, st1) = flush(userId, st0.copy(pending = pending), wmPeriod)
      wmOpt match {
        case None =>
          // batch: everything flushed above, nothing can arrive later
          state.remove()
        case Some(wm) =>
          if (st1.pending.isEmpty && st1.lastPeriod == NoLast) {
            // nothing observed and nothing pending — hold no state at all
            state.remove()
          } else if (state.hasTimedOut && st1.pending.isEmpty && out.isEmpty) {
            // the IDLE timer fired (a finalization wake-up would have
            // flushed something): evict — the carried value is gone, and
            // a comeback starts a fresh series (observable — no gap rows
            // bridge the absence)
            state.remove()
          } else {
            state.update(st1)
            // wake when the earliest pending period becomes finalizable,
            // or — fully flushed — after the idle horizon; clamped above
            // the watermark (the API rejects timeouts at or before it)
            val wake =
              if (st1.pending.nonEmpty) (st1.pending.keys.min + 1) * periodMs
              else wm + idleMs
            state.setTimeoutTimestamp(math.max(wake, wm + 1))
          }
      }
      out.iterator
    }

    events
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
