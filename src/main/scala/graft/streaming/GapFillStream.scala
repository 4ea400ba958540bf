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
  * (differential in StreamingGapFillSpec). Late rows for already-
  * finalized hours are counted in `late_dropped` rather than silently
  * lost (the streaming-dedup contract: post-watermark stragglers are
  * the caller's delay-budget decision).
  */
object GapFillStream extends Serializable {

  case class In(event_type: String, ts: Timestamp)
  case class HourCount(event_type: String, hour: Timestamp, n: Long)
  case class GapState(pending: Map[Long, Long], lastFinalized: Long,
      lateDropped: Long)

  private val HourMs = 3600000L

  def hourlyGapFill(ev: Dataset[In], delay: String): Dataset[HourCount] = {
    import ev.sparkSession.implicits._

    def handle(tpe: String, it: Iterator[In],
        state: GroupState[GapState]): Iterator[HourCount] = {
      val wm = state.getCurrentWatermarkMs()
      var st = state.getOption.getOrElse(
        GapState(Map.empty, Long.MinValue, 0L))
      // materialize the group (bounded: one type's slice of one micro-
      // batch): the chain anchor must be the MINIMUM hour in the batch —
      // initializing from whichever event the iterator yields first
      // would misclassify earlier same-batch hours as late
      val hours = it.map(e => math.floorDiv(e.ts.getTime, HourMs) * HourMs).toArray
      if (st.lastFinalized == Long.MinValue && hours.nonEmpty)
        st = st.copy(lastFinalized = hours.min - HourMs)
      hours.foreach { h =>
        if (h <= st.lastFinalized)
          st = st.copy(lateDropped = st.lateDropped + 1)
        else
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
          st = st.copy(pending = st.pending - h, lastFinalized = h)
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
