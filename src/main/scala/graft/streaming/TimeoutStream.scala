package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** TIMEOUT DETECTION with EVENT-TIME TIMERS — the second
  * transformWithState operator, exercising the half of the v2 API the
  * rate limiter doesn't: ListState + registerTimer/handleExpiredTimer.
  * Semantics are EXACTLY q188's unconverted clicks (a click with no
  * same-user purchase in [cts, cts + timeout)), but emitted
  * PROACTIVELY: each click registers an event-time timer at its
  * conversion deadline; a purchase retires every pending click it
  * converts; when the watermark passes a deadline the engine calls
  * handleExpiredTimer and the still-pending click is emitted as
  * abandoned. The stream-stream outer join (AttributionStream
  * left_outer) holds the null row in JOIN state until the same
  * watermark — this is the state-machine formulation of the identical
  * contract, and StreamingTimeoutSpec pins the differential.
  *
  * State honesty: per user one ListState of in-flight clicks (bounded
  * by clicks-per-timeout-window) plus one registered timer per click;
  * both are retired by conversion or expiry — state is O(in-flight),
  * the same bound the outer join's buffer has, held in explicit form.
  *
  * Within a batch a key's rows are folded in (ts, event_id) order (the
  * RateLimitStream contract); conversion windows are half-open
  * [cts, cts + timeout) exactly as in the q187/q188 oracle. */
object TimeoutStream {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)
  case class Pending(click_id: Long, click_us: Long)
  case class Abandoned(click_id: Long, user_id: Long, click_us: Long)

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  class TimeoutProcessor(timeoutUs: Long)
      extends StatefulProcessor[Long, Ev, Abandoned] {
    @transient private var pending: ListState[Pending] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getListState[Pending]("pending",
        Encoders.product[Pending], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Abandoned] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var inFlight: Vector[Pending] =
        if (pending.exists()) pending.get().toVector else Vector.empty
      sorted.foreach { e =>
        val us = micros(e.ts)
        e.event_type match {
          case "click" =>
            inFlight :+= Pending(e.event_id, us)
            // event-time timer at the conversion deadline (ms grain —
            // the engine compares against the ms watermark)
            getHandle.registerTimer((us + timeoutUs) / 1000)
          case "purchase" =>
            // retire every pending click this purchase converts:
            // us in [click_us, click_us + timeout)
            inFlight = inFlight.filterNot(p =>
              us >= p.click_us && us < p.click_us + timeoutUs)
          case _ => ()
        }
      }
      pending.clear()
      if (inFlight.nonEmpty) pending.put(inFlight.toArray)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Abandoned] = {
      val deadlineUs = (expiredTimerInfo.getExpiryTimeInMs + 1) * 1000
      val inFlight: Vector[Pending] =
        if (pending.exists()) pending.get().toVector else Vector.empty
      val (expired, alive) =
        inFlight.partition(p => p.click_us + timeoutUs <= deadlineUs)
      pending.clear()
      if (alive.nonEmpty) pending.put(alive.toArray)
      expired.iterator.map(p => Abandoned(p.click_id, key, p.click_us))
    }
  }

  /** Abandoned clicks of a watermarked event stream: no same-user
    * purchase within `timeoutUs` of the click. Requires the RocksDB
    * state store provider (a transformWithState constraint). */
  def abandoned(ev: Dataset[Ev], timeoutUs: Long, delay: String): Dataset[Abandoned] = {
    implicit val outEnc = Encoders.product[Abandoned]
    ev.withWatermark("ts", delay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TimeoutProcessor(timeoutUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
