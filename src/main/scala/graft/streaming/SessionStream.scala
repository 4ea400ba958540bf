package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** SESSIONIZATION via Spark's native `session_window` — the merging
  * event-time session windows the engine maintains itself (dynamic gap
  * coalescing in the stateful aggregation operator), rather than a
  * hand-rolled flatMapGroupsWithState buffer. One code path serves both
  * modes:
  *
  *   - BATCH: `sessions(df, gap)` is a plain groupBy aggregation —
  *     the registered q186 runs it against the DuckDB gaps-and-islands
  *     oracle (lag + running break-sum), pinning the exact semantics:
  *     a session breaks when ts − prev_ts > gap (an event at exactly
  *     prev + gap still merges — StreamingSessionSpec's exact-gap test
  *     and the q186 oracle's `> INTERVAL` break pin this); the window
  *     end is last_event + gap.
  *   - STREAMING: the same expression under a watermark emits each
  *     session ONCE, when the watermark passes its close (Append mode) —
  *     StreamingSessionSpec drives the batch differential and
  *     ChaosRecoverySpec the exactly-once recovery contract.
  *
  * Scale shape: state per in-flight session is one (start, end, aggs)
  * tuple keyed by (user, window) — merged in place by the engine; the
  * shuffle is the same single user-keyed exchange any per-user
  * aggregation pays. Money stays in fixed point (value·1000 as long,
  * the q179 convention) so the sums are exact on any engine. */
object SessionStream {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)

  /** (user_id, s_start, s_end, n_events, total_milli) sessions with the
    * given inactivity gap; watermark applied by the streaming caller. */
  def sessions(ev: DataFrame, gap: String): DataFrame =
    ev.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000, 0).cast("long")).as("total_milli"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"), col("total_milli"))

  /** Streaming form: watermarked, Append-mode-ready (sessions finalize
    * when the watermark passes their close). */
  def sessionsStream(ev: Dataset[Ev], gap: String, delay: String): DataFrame =
    sessions(ev.toDF.withWatermark("ts", delay), gap)
}
