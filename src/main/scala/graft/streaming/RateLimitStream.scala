package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** PER-KEY RATE LIMITING (ingest throttling): admit at most `k` events
  * per (user, event_type) per tumbling window, keeping the earliest by
  * (ts, event_id). The admission-control shape in front of every
  * expensive pipeline stage — bot bursts and retry storms die here, at
  * the cost of one keyed state lookup per event.
  *
  * Two forms, tied by a differential spec:
  *
  *   - BATCH ([[rateLimitBatch]]): window-bucket by integer
  *     `unix_micros(ts) div windowMicros` (the q119 idiom — identical
  *     arithmetic in DuckDB as `epoch_us // N`), rank within
  *     (user, type, bucket), admit rank ≤ k. Registered as q194's
  *     census.
  *   - STREAMING ([[throttled]]): Spark 4's `transformWithState`
  *     (arbitrary-state v2 — this repo's first use) with ONE
  *     (bucket, count) ValueState per key. flatMapGroupsWithState
  *     could express this too, but the v2 API is where Structured
  *     Streaming is headed: typed composable state, explicit TTL
  *     config, RocksDB-backed stores (the spec opts into the RocksDB
  *     provider, which transformWithState requires).
  *
  * State honesty: one 16-byte (bucket, count) pair per ACTIVE
  * (user, type) key — old windows are overwritten in place, not
  * accumulated, so state is O(active keys) not O(windows). Idle keys:
  * the spec runs TTLConfig.NONE (deterministic tests); production sets
  * a TTL of a few windows so dormant keys evict — the knob exists on
  * the same line, which is exactly why the v2 API is used.
  *
  * Within one micro-batch a key's rows are buffered and sorted by
  * (ts, event_id) before admission, so per-key arrival order inside a
  * batch does not matter; ACROSS batches the equality with the batch
  * form needs per-key ts-ordered arrival (the production norm with
  * keyed ingest partitions — the same contract as streamingNewUsers
  * and streamingBucketDedup, and what the spec feeds). */
object RateLimitStream {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)
  case class WinCount(win: Long, n: Long)

  /** Batch admission: input events + (win, rn, allowed) columns. */
  def rateLimitBatch(ev: DataFrame, k: Int, windowMicros: Long): DataFrame =
    ev.withColumn("win", expr(s"unix_micros(ts) div ${windowMicros}L"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("event_type"), col("win"))
          .orderBy(col("ts"), col("event_id"))))
      .withColumn("allowed", col("rn") <= k)

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  /** The v2 stateful processor: admit while the key's current-bucket
    * count is below k; a bucket change resets the count in place. */
  class RateLimitProcessor(k: Int, windowMicros: Long)
      extends StatefulProcessor[(Long, String), Ev, Ev] {
    @transient private var st: ValueState[WinCount] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[WinCount]("win_count",
        Encoders.product[WinCount], TTLConfig.NONE)

    override def handleInputRows(key: (Long, String), rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Ev] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var (w, n) =
        if (st.exists()) { val s = st.get(); (s.win, s.n) } else (Long.MinValue, 0L)
      val out = Seq.newBuilder[Ev]
      sorted.foreach { e =>
        val win = micros(e.ts) / windowMicros
        if (win != w) { w = win; n = 0L }
        if (n < k) { n += 1; out += e }
      }
      st.update(WinCount(w, n))
      out.result().iterator
    }
  }

  /** Streaming admission over a keyed event stream. Requires the
    * RocksDB state store provider (a transformWithState constraint). */
  def throttled(ev: Dataset[Ev], k: Int, windowMicros: Long): Dataset[Ev] = {
    implicit val evEnc = Encoders.product[Ev]
    ev.groupByKey(e => (e.user_id, e.event_type))(
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .transformWithState(new RateLimitProcessor(k, windowMicros),
        TimeMode.None(), OutputMode.Append())
  }
}
