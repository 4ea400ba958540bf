package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Incremental per-user event-transition extraction — the streaming form
  * of the batch transition-matrix operator (`Analytics.eventTransitions`
  * / q104): emits a (user, from_type, to_type) row for every consecutive
  * pair of one user's events, carrying only the LAST seen event per user
  * in a named `ValueState` (transformWithState, the v2 stateful API —
  * same backend requirements as [[CdcStreamV2]]: RocksDB provider).
  *
  * Ordering contract: per-key ORDERED DELIVERY ACROSS BATCHES — the
  * Kafka key-partition model, where one user's events live in one
  * ordered partition. Rows WITHIN a micro-batch may arrive shuffled and
  * are sorted by (ts, event_id) before folding, the same total order the
  * batch operator's window uses; under the contract the accumulated
  * emissions equal batch q104 exactly (StreamingTransitionsSpec drives
  * the differential, shuffled in-batch arrival included).
  *
  * Scale shape: state is ONE event per user (not a buffer), emissions
  * are append-only and feed the same groups-sized (from, to) aggregation
  * downstream; the in-batch sort is bounded by a single user's rows in
  * one micro-batch.
  */
object TransitionStream extends Serializable {
  case class Ev(user_id: Long, ts: Long, event_id: Long, event_type: String)
  case class Trans(user_id: Long, from_type: String, to_type: String)

  private class Fold extends StatefulProcessor[Long, Ev, Trans] {
    @transient private var last: ValueState[Ev] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Ev]("last", Encoders.product[Ev],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Trans] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
      val out = Seq.newBuilder[Trans]
      var prev = Option(last.get())
      for (e <- sorted) {
        prev.foreach(p => out += Trans(key, p.event_type, e.event_type))
        prev = Some(e)
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  def transitions(ev: Dataset[Ev]): Dataset[Trans] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .transformWithState(new Fold, TimeMode.None(), OutputMode.Append())
  }
}
