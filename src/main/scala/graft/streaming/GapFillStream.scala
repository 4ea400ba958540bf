package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** STREAMING gap-filled hourly resample — the q74 semantic as a
  * continuous query: one finalized (event_type, hour, n) row per hour
  * per type, with silent hours emitted as EXPLICIT ZEROS. Plain
  * watermarked window aggregation cannot do this (no input rows for an
  * hour → no group → no row); the zeros need event-time TIMERS: each
  * type's state keeps pending per-hour counts plus the last finalized
  * hour, and every micro-batch — or the timer firing while the type
  * receives no data at all — finalizes every hour whose end the
  * watermark has passed, zeros included.
  *
  * Ported to `transformWithState` (arbitrary-state v2; round-11
  * verdict task 4 — RateLimitStream/CdcStreamV2/TimeoutStream prove
  * the API, this is the first port of an EXISTING v1 operator that
  * uses event-time timers): the v1 GroupState blob splits into the
  * composable typed states the v2 API exists for — the pending
  * per-hour counts become a `MapState[Long, Long]` (point lookups and
  * per-hour removal against the store, where the v1 blob rewrote the
  * WHOLE map every batch; also forced — the v2 Avro state encoder
  * rejects a MapType FIELD inside a product state), the two-field
  * chain cursor stays a ValueState, and the v1 single-timeout
  * discipline (`setTimeoutTimestamp` replaces the previous timeout) is
  * reproduced explicitly — v2 timers ACCUMULATE per key, so each
  * invocation deletes whatever is armed (`listTimers`/`deleteTimer`)
  * before registering the next wake. Requires the RocksDB state store
  * provider, like every transformWithState operator.
  *
  * Bounds: state per type = the pending hours inside the watermark
  * horizon (delay/1h + in-flight) plus exactly ONE armed timer,
  * independent of stream length; the emitted chain is contiguous from
  * the type's first-seen hour, so consumers get the same dense series
  * the batch operator produces (differential in StreamingGapFillSpec,
  * loss/kill recovery in ChaosRecoverySpec — both unchanged by the
  * port). Until finalization begins, an out-of-order straggler for an
  * hour EARLIER than the current anchor — but still inside the
  * watermark — LOWERS the anchor instead of being dropped (the anchor
  * is provisional until the first emit; only the watermark, never
  * batch arrival order, decides lateness).
  *
  * Post-watermark stragglers never reach the handler at all: the
  * stateful operator's watermark pre-filter drops them first and
  * counts them in the per-operator `numRowsDroppedByWatermark` metric
  * on `StreamingQueryProgress` — THAT is where a consumer observes the
  * drops (spec-asserted). An in-state late counter would be dead code:
  * an hour finalizes only once h+1h <= wm, so every row of a finalized
  * hour has ts < wm and is pre-filtered. The defensive skip below is
  * therefore unreachable-by-construction and exists only to keep the
  * chain invariant (never re-open a finalized hour) locally obvious.
  */
object GapFillStream extends Serializable {

  case class In(event_type: String, ts: Timestamp)
  case class HourCount(event_type: String, hour: Timestamp, n: Long)
  case class ChainCursor(lastFinalized: Long, started: Boolean)

  private val HourMs = 3600000L

  class GapFillProcessor extends StatefulProcessor[String, In, HourCount] {
    @transient private var pending: MapState[Long, Long] = _
    @transient private var cursor: ValueState[ChainCursor] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getMapState[Long, Long]("pending",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      cursor = getHandle.getValueState[ChainCursor]("cursor",
        Encoders.product[ChainCursor], TTLConfig.NONE)
    }

    private def current(): ChainCursor =
      if (cursor.exists()) cursor.get()
      else ChainCursor(Long.MinValue, started = false)

    private def pendingCount(h: Long): Long =
      if (pending.containsKey(h)) pending.getValue(h) else 0L

    /** Emit every hour whose end the watermark has passed (zeros for
      * pending-free hours in the chain), persist, and re-arm the single
      * timer at the end of the next open hour — shared by the data path
      * and the timer path, like the v1 handler's tail. */
    private def finalizeAndArm(tpe: String, c0: ChainCursor,
        wm: Long): List[HourCount] = {
      var c = c0
      var out = List.empty[HourCount]
      if (c.lastFinalized != Long.MinValue) {
        var h = c.lastFinalized + HourMs
        while (h + HourMs <= wm) {
          out ::= HourCount(tpe, new Timestamp(h), pendingCount(h))
          pending.removeKey(h)
          c = ChainCursor(h, started = true)
          h += HourMs
        }
      }
      cursor.update(c)
      // single-timeout discipline: replace whatever is armed.
      // Materialize BEFORE deleting: deleting under the live iterator
      // would lean on unspecified iterator-under-mutation behavior of
      // the v2 timer API (≤1 timer here, so the copy is one element).
      getHandle.listTimers().toSeq.foreach(t => getHandle.deleteTimer(t))
      val next =
        (if (c.lastFinalized == Long.MinValue) wm else c.lastFinalized) +
          2 * HourMs
      getHandle.registerTimer(math.max(next, wm + 1))
      out.reverse
    }

    override def handleInputRows(tpe: String, it: Iterator[In],
        timerValues: TimerValues): Iterator[HourCount] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      var c = current()
      // materialize the group (bounded: one type's slice of one micro-
      // batch): the chain anchor must be the MINIMUM hour in the batch —
      // initializing from whichever event the iterator yields first
      // would misclassify earlier same-batch hours as late
      val hours = it.map(e => math.floorDiv(e.ts.getTime, HourMs) * HourMs).toArray
      // the anchor is PROVISIONAL until the first emit: a later batch
      // may carry an even earlier hour the watermark has not passed yet
      // (nothing is finalized, so lowering re-opens nothing)
      if (!c.started && hours.nonEmpty) {
        val fillable = hours.filter(h => h + HourMs > wm)
        if (fillable.nonEmpty) {
          val anchor = fillable.min - HourMs
          if (c.lastFinalized == Long.MinValue || anchor < c.lastFinalized)
            c = c.copy(lastFinalized = anchor)
        } else if (c.lastFinalized == Long.MinValue)
          c = c.copy(lastFinalized = hours.min - HourMs)
      }
      hours.foreach { h =>
        // h <= lastFinalized is unreachable (watermark pre-filter, see
        // scaladoc); skipping rather than counting keeps the invariant
        // that a finalized hour is never re-opened
        if (h > c.lastFinalized)
          pending.updateValue(h, pendingCount(h) + 1L)
      }
      finalizeAndArm(tpe, c, wm).iterator
    }

    override def handleExpiredTimer(tpe: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[HourCount] =
      finalizeAndArm(tpe, current(),
        timerValues.getCurrentWatermarkInMs()).iterator
  }

  def hourlyGapFill(ev: Dataset[In], delay: String): Dataset[HourCount] = {
    implicit val outEnc = Encoders.product[HourCount]
    ev.withWatermark("ts", delay)
      .groupByKey(_.event_type)(Encoders.STRING)
      .transformWithState(new GapFillProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
