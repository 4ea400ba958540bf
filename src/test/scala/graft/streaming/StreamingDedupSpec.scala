package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp((1000 + min) * 60000L)

  test("streaming exact dedup drops duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.streamingExactDedup(df, "1 hour")
      .select("doc_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts(0), "alpha bravo"), (2L, ts(1), "charlie delta"))
      q.processAllAvailable()
      // batch 2: doc 3 duplicates doc 1 (normalization collapses case/
      // whitespace); doc 4 is new
      mem.addData((3L, ts(2), "  ALPHA   bravo "), (4L, ts(3), "echo foxtrot"))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").as[Long].collect().toSet
      assert(kept === Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("dedup state is EVICTED at the watermark: a late re-occurrence re-emits") {
    // THE test that separates dropDuplicatesWithinWatermark from plain
    // dropDuplicates: with the plain form the content_hash state lives
    // forever and the day-later duplicate would be silently dropped;
    // with bounded state it must re-emit once the watermark passed the
    // first occurrence's expiry. This is the observable proof that
    // streaming-dedup state is O(in-flight window), not O(corpus).
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.streamingExactDedup(df, "1 hour")
      .select("doc_id")
      .writeStream.format("memory").queryName("dedup_evict_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts(0), "alpha bravo"))
      q.processAllAvailable()
      // in-delay duplicate: dropped; the filler event advances the
      // watermark to ts(180) - 60min = ts(120), far past doc 1's expiry
      mem.addData((2L, ts(5), "alpha  BRAVO"), (3L, ts(180), "filler"))
      q.processAllAvailable()
      // next batch runs with watermark ts(120): doc 1's state is gone,
      // so the identical content must be emitted again
      mem.addData((4L, ts(181), "ALPHA bravo"))
      q.processAllAvailable()
      val kept = spark.table("dedup_evict_out").as[Long].collect().toSet
      assert(kept === Set(1L, 3L, 4L))
    } finally q.stop()
  }

  test("streaming bucket dedup kept-set equals batch earliest-per-bucket (q192)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = EventStreams.streamingBucketDedup(df, "2 hours")
      .select("event_id")
      .writeStream.format("memory").queryName("bucket_dedup_out")
      .outputMode(OutputMode.Append).start()
    // per-key ts-ordered arrival across micro-batches (the production
    // norm with per-user partitioned ingest); base ts is 16:40, so the
    // 17:00 hour bucket opens at ts(20)
    val batches = Seq(
      Seq((10L, ts(0), 1L, "click"), (11L, ts(5), 1L, "click"),   // dup bucket
        (12L, ts(7), 2L, "view")),
      Seq((13L, ts(20), 1L, "click"),                              // 17:00: new bucket
        (14L, ts(61), 1L, "click"),                                // dup of 13's bucket
        (15L, ts(62), 2L, "view")),                                // 17:00 view: new
      Seq((16L, ts(65), 1L, "view"),                               // type differs: new
        (17L, ts(66), 1L, "click")))                               // dup of 13's bucket
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("bucket_dedup_out").as[Long].collect().toSet
      // batch collapse of the SAME rows: earliest (ts, event_id) per
      // (user, type, hour) — the q192 semantics
      val rows = batches.flatten.toDF("event_id", "ts", "user_id", "event_type")
      val batchKept = rows
        .groupBy($"user_id", $"event_type",
          org.apache.spark.sql.functions.date_trunc("hour", $"ts"))
        .agg(org.apache.spark.sql.functions.min_by($"event_id",
          org.apache.spark.sql.functions.struct($"ts", $"event_id")).as("keep"))
        .select($"keep").as[Long].collect().toSet
      assert(streamed === batchKept)
      assert(streamed === Set(10L, 12L, 13L, 15L, 16L))
    } finally q.stop()
  }
}
