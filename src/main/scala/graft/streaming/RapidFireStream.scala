package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Incremental RAPID-FIRE purchase screening — the streaming form of
  * the batch velocity check (`Analytics.q167RapidFire`): flag a
  * purchase that follows the same user's previous purchase within one
  * hour, AS IT ARRIVES — the fraud screen has to fire before
  * settlement, not in tonight's batch. State per user is ONE previous
  * purchase (ts, event_id, v4) in a named `ValueState`
  * (transformWithState v2, the [[TransitionStream]] backend contract).
  *
  * Ordering contract: per-key ordered delivery across batches (the
  * Kafka key-partition model); rows within a micro-batch sort by
  * (ts, event_id) before folding — under that contract the accumulated
  * flags equal batch q167 exactly (StreamingSpec drives the
  * differential with shuffled in-batch arrival).
  *
  * Scale shape: one value per user of state, append-only output,
  * in-batch sort bounded by one user's rows in one micro-batch.
  */
object RapidFireStream extends Serializable {
  case class Purchase(user_id: Long, ts: Long, event_id: Long, v4: Long)
  case class Flag(user_id: Long, prev_id: Long, event_id: Long,
      prev_v4: Long, v4: Long, gap_us: Long)

  private val WindowUs = 3600L * 1000000L

  private class Screen extends StatefulProcessor[Long, Purchase, Flag] {
    @transient private var last: ValueState[Purchase] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Purchase]("last",
        Encoders.product[Purchase], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Purchase],
        timers: TimerValues): Iterator[Flag] = {
      val sorted = rows.toSeq.sortBy(p => (p.ts, p.event_id))
      val out = Seq.newBuilder[Flag]
      var prev = Option(last.get())
      for (p <- sorted) {
        prev.foreach { q =>
          val gap = p.ts - q.ts
          if (gap <= WindowUs)
            out += Flag(key, q.event_id, p.event_id, q.v4, p.v4, gap)
        }
        prev = Some(p)
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  /** `ts` is epoch MICROS (the batch operator's unit). */
  def flags(p: Dataset[Purchase]): Dataset[Flag] = {
    import p.sparkSession.implicits._
    p.groupByKey(_.user_id)
      .transformWithState(new Screen, TimeMode.None(), OutputMode.Append())
  }
}
