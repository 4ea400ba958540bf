package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING gap-filled hourly resample — the q74 semantic as a
  * continuous query: one finalized (event_type, hour, n) row per hour
  * per type, with silent hours emitted as EXPLICIT ZEROS. Plain
  * watermarked window aggregation cannot do this (no input rows for an
  * hour → no group → no row); the zeros need event-time TIMERS: each
  * type's state keeps pending per-hour counts plus the last finalized
  * hour, and every micro-batch — or the type's timeout while it
  * receives no data at all — finalizes every hour whose end the
  * watermark has passed, zeros included.
  *
  * Bounds: state per type = the pending hours inside the watermark
  * horizon (delay/1h + in-flight), independent of stream length; the
  * emitted chain is contiguous from the type's first-seen hour, so
  * consumers get the same dense series the batch operator produces
  * (differential in StreamingGapFillSpec). Until finalization begins,
  * an out-of-order straggler for an hour EARLIER than the current
  * anchor — but still inside the watermark — LOWERS the anchor instead
  * of being dropped (the anchor is provisional until the first emit;
  * only the watermark, never batch arrival order, decides lateness).
  *
  * Post-watermark stragglers never reach the handler at all: the
  * stateful operator's watermark pre-filter (`WatermarkSupport.
  * eventTimeWatermarkForLateEvents` on `FlatMapGroupsWithStateExec`)
  * drops them first and counts them in the per-operator
  * `numRowsDroppedByWatermark` metric on `StreamingQueryProgress` —
  * THAT is where a consumer observes the drops (spec-asserted). An
  * in-state late counter would be dead code: an hour finalizes only
  * once h+1h <= wm, so every row of a finalized hour has ts < wm and
  * is pre-filtered. The defensive skip below is therefore
  * unreachable-by-construction and exists only to keep the chain
  * invariant (never re-open a finalized hour) locally obvious.
  */
object GapFillStream extends Serializable {

  case class In(event_type: String, ts: Timestamp)
  case class HourCount(event_type: String, hour: Timestamp, n: Long)
  case class GapState(pending: Map[Long, Long], lastFinalized: Long,
      started: Boolean)

  private val HourMs = 3600000L

  def hourlyGapFill(ev: Dataset[In], delay: String): Dataset[HourCount] = {
    import ev.sparkSession.implicits._

    def handle(tpe: String, it: Iterator[In],
        state: GroupState[GapState]): Iterator[HourCount] = {
      val wm = state.getCurrentWatermarkMs()
      var st = state.getOption.getOrElse(
        GapState(Map.empty, Long.MinValue, started = false))
      // materialize the group (bounded: one type's slice of one micro-
      // batch): the chain anchor must be the MINIMUM hour in the batch —
      // initializing from whichever event the iterator yields first
      // would misclassify earlier same-batch hours as late
      val hours = it.map(e => math.floorDiv(e.ts.getTime, HourMs) * HourMs).toArray
      // the anchor is PROVISIONAL until the first emit: a later batch
      // may carry an even earlier hour the watermark has not passed yet
      // (nothing is finalized, so lowering re-opens nothing)
      if (!st.started && hours.nonEmpty) {
        val fillable = hours.filter(h => h + HourMs > wm)
        if (fillable.nonEmpty) {
          val anchor = fillable.min - HourMs
          if (st.lastFinalized == Long.MinValue || anchor < st.lastFinalized)
            st = st.copy(lastFinalized = anchor)
        } else if (st.lastFinalized == Long.MinValue)
          st = st.copy(lastFinalized = hours.min - HourMs)
      }
      hours.foreach { h =>
        // h <= lastFinalized is unreachable (watermark pre-filter, see
        // scaladoc); skipping rather than counting keeps the invariant
        // that a finalized hour is never re-opened
        if (h > st.lastFinalized)
          st = st.copy(pending = st.pending + (h ->
            (st.pending.getOrElse(h, 0L) + 1L)))
      }
      // finalize every hour whose END the watermark has passed — the
      // same loop serves data batches and pure-timeout wakeups, and it
      // emits the zeros for pending-free hours in the chain
      var out = List.empty[HourCount]
      if (st.lastFinalized != Long.MinValue) {
        var h = st.lastFinalized + HourMs
        while (h + HourMs <= wm) {
          out ::= HourCount(tpe, new Timestamp(h), st.pending.getOrElse(h, 0L))
          st = st.copy(pending = st.pending - h, lastFinalized = h,
            started = true)
          h += HourMs
        }
      }
      state.update(st)
      // wake when the watermark passes the end of the next open hour
      val next =
        (if (st.lastFinalized == Long.MinValue) wm else st.lastFinalized) +
          2 * HourMs
      state.setTimeoutTimestamp(math.max(next, wm + 1))
      out.reverseIterator
    }

    ev.withWatermark("ts", delay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(handle)
  }
}
