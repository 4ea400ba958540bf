package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WINDOWED CLICK→PURCHASE ATTRIBUTION as a STREAM–STREAM JOIN — the
  * one Structured Streaming join mode the suite didn't yet exercise:
  * two watermarked event streams (here derived from one ingest stream —
  * a genuine self-join of streams) inner-joined on user plus a time
  * range, emitting one row per (click, purchase-within-the-next-hour)
  * pair.
  *
  * One code path, both modes (the SessionStream doctrine):
  *   - BATCH: a plain equi-join on user_id with range predicates —
  *     Catalyst plans the user-keyed shuffle join; the registered q187
  *     gates it against the straightforward DuckDB join oracle.
  *   - STREAMING: both sides carry watermarks and the range condition
  *     bounds BOTH buffers — a click's state is evictable once the
  *     watermark passes click_ts + window (no purchase can match it
  *     anymore), a purchase's once it passes purchase_ts (no earlier
  *     click can still arrive) — so join state is the watermark
  *     horizon's events, not the stream's history. Inner join emits a
  *     pair as soon as both sides are present; the parquet sink's
  *     batchId log keeps replays exactly-once (ChaosRecoverySpec).
  *
  * Watermark caveat (property-pinned by StreamingAttributionSpec's
  * "idle purchase side pins the global watermark" test): the GLOBAL
  * watermark is the MIN over both derived watermark nodes (Spark's
  * multipleWatermarkPolicy default), and each side's watermark advances
  * only when THAT side sees events — the spec drives a click-only
  * stream hours past every deadline and shows the global watermark
  * stays at epoch 0, nothing emits, join state grows unevicted, and
  * one purchase-side row releases it all. Real deployments feeding
  * both sides from one ingest topic (as here) advance together.
  *
  * Money in fixed-point millis (q179 convention), lag in exact
  * microseconds (q127/q167 convention). */
object AttributionStream {

  /** (click_id, purchase_id, user_id, lag_us, value_milli) pairs for
    * purchases within `window` after a click by the same user.
    * `delay` is the event-time watermark (ignored in batch).
    *
    * `joinType` "inner" (default) emits matched pairs only; "left_outer"
    * ALSO emits every unconverted click once with a null purchase side —
    * in streaming the null row is held back until the watermark passes
    * click_ts + window (only then is "no purchase will ever match"
    * certain), the semantics that make outer stream joins the hardest
    * mode — q188 gates the batch form, StreamingAttributionSpec pins
    * the held-back-then-emitted behavior. */
  def attribution(ev: DataFrame, window: String, delay: String,
      joinType: String = "inner"): DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        round(col("value") * 1000, 0).cast("long").as("value_milli"))
      .withWatermark("purchase_ts", delay)
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $window"),
        joinType)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"),
        col("value_milli"))
  }
}
