package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventStreams.{Ev, SessionOut}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // offset from epoch 0: a record exactly AT the initial watermark (0)
  // is treated as late and dropped
  private def ts(min: Long): Timestamp = new Timestamp((1000 + min) * 60000L)

  test("streaming hourly agg over MemoryStream matches batch result on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    val q = EventStreams.hourlyAgg(df)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = Seq(
        (ts(0), "click", 1L, 1.0), (ts(10), "click", 2L, 2.0),
        (ts(61), "click", 1L, 4.0), (ts(62), "view", 3L, 8.0),
        (ts(130), "click", 2L, 16.0))
      mem.addData(rows: _*)
      q.processAllAvailable()
      // advance the watermark far enough to close every window
      mem.addData((ts(600), "late", 9L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .select("hour", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      // streaming emits exactly the closed windows = the batch result
      // over the original rows (the watermark-advancing row's own window
      // stays open and must NOT appear)
      val batch = EventStreams.hourlyAgg(rows.toDF("ts", "event_type", "user_id", "value"))
        .select("hour", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming OHLC bars over MemoryStream match batch; tie-break carries over") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Long, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "user_id", "event_id", "value")
    val q = EventStreams.hourlyOhlc(df)
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = Seq(
        (ts(0), "click", 1L, 1L, 5.0), (ts(10), "click", 2L, 2L, 9.0),
        (ts(50), "click", 1L, 3L, 7.0),                  // hour 1 bar: 5/9/5/7
        (ts(20), "view", 3L, 4L, 2.0), (ts(20), "view", 3L, 5L, 8.0), // tied ts
        (ts(70), "click", 2L, 6L, 4.0))                  // second hour bar
      mem.addData(rows.take(3): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*)   // tied rows arrive in a later batch
      q.processAllAvailable()
      mem.addData((ts(600), "late", 9L, 99L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ohlc_out")
        .select("hour", "event_type", "open", "high", "low", "close", "volume")
        .as[(Timestamp, String, Double, Double, Double, Double, Long)]
        .collect().toSet
      val batch = EventStreams.hourlyOhlc(
        rows.toDF("ts", "event_type", "user_id", "event_id", "value"))
        .select("hour", "event_type", "open", "high", "low", "close", "volume")
        .as[(Timestamp, String, Double, Double, Double, Double, Long)]
        .collect().toSet
      assert(streamed === batch)
      // the tied-ts pair resolved by event_id: open=id4's 2.0, close=id5's 8.0
      val view = streamed.find(_._2 == "view").get
      assert((view._3, view._6) === ((2.0, 8.0)))
    } finally q.stop()
  }

  test("streaming new-user counts: cross-batch first-seen state matches batch collapse") {
    implicit val sqlCtx = spark.sqlContext
    val day = 1440L // minutes
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = EventStreams.streamingNewUsers(df)
      .writeStream.format("memory").queryName("newusers_out")
      .outputMode(OutputMode.Append).start()
    try {
      // day 0: users 1, 2 (user 1 twice); day 1: user 1 AGAIN (must not
      // recount — state crosses batches) + new user 3
      mem.addData((ts(0), 1L), (ts(10), 2L), (ts(20), 1L))
      q.processAllAvailable()
      mem.addData((ts(day + 1), 1L), (ts(day + 2), 3L))
      q.processAllAvailable()
      // push the watermark far past both days to close the windows
      mem.addData((ts(10 * day), 99L))
      q.processAllAvailable()
      val streamed = spark.table("newusers_out")
        .as[(Timestamp, Long)].collect().toMap
      val batch = Seq((ts(0), 1L), (ts(10), 2L), (ts(20), 1L),
        (ts(day + 1), 1L), (ts(day + 2), 3L))
        .toDF("ts", "user_id")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
        .groupBy(window(col("first_ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start"), col("n"))
        .as[(Timestamp, Long)].collect().toMap
      assert(streamed === batch)
      assert(streamed.values.toSeq.sorted === Seq(1L, 2L)) // 2 on day 0, 1 on day 1
    } finally q.stop()
  }

  test("streaming HLL registers: Complete-mode register state equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = graft.operators.Analytics.hllRegisters(mem.toDF().toDF("key"))
      .writeStream.format("memory").queryName("hll_out")
      .outputMode(OutputMode.Complete).start()
    try {
      val a = (1 to 800).map(i => s"u-$i")
      val b = (500 to 1200).map(i => s"u-$i") // overlaps a — maxima must absorb
      mem.addData(a: _*)
      q.processAllAvailable()
      mem.addData(b: _*)
      q.processAllAvailable()
      val streamed = spark.table("hll_out")
        .as[(Long, Long)].collect().toMap
      val batch = graft.operators.Analytics.hllRegisters((a ++ b).toDF("key"))
        .as[(Long, Long)].collect().toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("windowed streaming HLL: closed hours emit batch-identical register state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = EventStreams.hourlyHll(df)
      .writeStream.format("memory").queryName("whll_out")
      .outputMode(OutputMode.Append).start()
    try {
      // hour 0: users 1..50 (dups included); hour 1: 40..80
      val rows = (1L to 50L).map(u => (ts(u % 40), u)) ++
        (40L to 80L).map(u => (ts(61 + u % 30), u))
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((ts(600), 999L)) // advance watermark; its window stays open
      q.processAllAvailable()
      val streamed = spark.table("whll_out")
        .as[(Timestamp, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val batch = EventStreams.hourlyHll(rows.toDF("ts", "user_id"))
        .as[(Timestamp, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed === batch)
      // every closed wall-clock hour present (the 16:40 anchor straddles
      // a boundary, so the fixture spans 3 windows), registers bounded
      assert(streamed.keySet.map(_._1).size === 3)
      assert(streamed.groupBy(_._1._1).forall(_._2.size <= 256))
    } finally q.stop()
  }

  test("streaming CMS: Complete-mode counter state equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = graft.operators.Analytics.cmsSketch(mem.toDF().toDF("key"))
      .writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Complete).start()
    try {
      val a = (1 to 400).flatMap(i => Seq.fill(i % 3 + 1)(s"u-$i"))
      val b = (300 to 700).map(i => s"u-$i") // overlaps a — counters must add
      mem.addData(a: _*)
      q.processAllAvailable()
      mem.addData(b: _*)
      q.processAllAvailable()
      val streamed = spark.table("cms_out")
        .as[(Long, Long, Long)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
      val batch = graft.operators.Analytics.cmsSketch((a ++ b).toDF("key"))
        .as[(Long, Long, Long)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-static dim enrichment matches batch, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", "engagement"), ("view", "reach"))
      .toDF("event_type", "category")
    val mem = MemoryStream[(Timestamp, String, Long)]
    val df = mem.toDF().toDF("ts", "event_type", "user_id")
    val q = EventStreams.enrichWithDim(df, dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = Seq((ts(0), "click", 1L), (ts(1), "view", 2L),
        (ts(2), "click", 3L), (ts(3), "purchase", 4L)) // no dim row → dropped
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .select("user_id", "category").as[(Long, String)].collect().toSet
      val batch = EventStreams.enrichWithDim(
        rows.toDF("ts", "event_type", "user_id"), dim)
        .select("user_id", "category").as[(Long, String)].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set((1L, "engagement"), (2L, "reach"), (3L, "engagement")))
    } finally q.stop()
  }

  test("watermarked stream-stream join matches batch; matches cross micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val impMem = MemoryStream[(Long, Timestamp)]
    val clkMem = MemoryStream[(Long, Timestamp)]
    val imps = impMem.toDF().toDF("ad_id", "ts")
    val clks = clkMem.toDF().toDF("ad_id", "ts")
    val q = EventStreams.impressionClicks(imps, clks)
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append).start()
    try {
      // impressions arrive FIRST (batch 1); their clicks arrive in a
      // LATER micro-batch — matching requires buffered join state
      val impRows = Seq((1L, ts(0)), (2L, ts(5)), (3L, ts(10)))
      val clkRows = Seq(
        (1L, ts(30)),   // in window → match
        (2L, ts(80)),   // 75 min after imp → outside 1 h window
        (9L, ts(20)))   // no impression
      impMem.addData(impRows: _*)
      q.processAllAvailable()
      clkMem.addData(clkRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssj_out")
        .select("ad_id").as[Long].collect().toSet
      assert(streamed === Set(1L))
      val batch = EventStreams.impressionClicks(
        impRows.toDF("ad_id", "ts"), clkRows.toDF("ad_id", "ts"))
        .select("ad_id").as[Long].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming sessionization emits closed sessions on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionize(mem.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: events at t=0m and t=10m (one session), then silence;
      // user 2: one event at t=5m.
      mem.addData(Ev(1, 100, ts(0)), Ev(1, 101, ts(10)), Ev(2, 200, ts(5)))
      q.processAllAvailable()
      // watermark jump past the 30-min gap closes both sessions
      mem.addData(Ev(9, 900, ts(240)))
      q.processAllAvailable()
      val got = spark.table("sess_out").as[SessionOut].collect()
        .filter(_.user_id < 9).map(s => (s.user_id, s.session_id, s.n_events,
          s.first_event, s.last_event)).toSet
      assert(got === Set((1L, 1L, 2L, 100L, 101L), (2L, 1L, 1L, 200L, 200L)))
    } finally q.stop()
  }

  test("STREAMING native session_window matches the batch q101 operator on the same rows") {
    // the third sessionization mechanism in the suite: q16 islands SQL
    // == custom flatMapGroupsWithState == native session_window — this
    // pins the native operator's STREAMING mode (watermarked session
    // merge in the state store) against its own batch form, which the
    // driver gate already proves equal to the islands oracle
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = mem.toDS().toDF()
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
      .select(col("user_id"), col("w.start").as("s_start"),
        col("w.end").as("s_end"), col("n_events"), col("first_event"))
      .writeStream.format("memory").queryName("native_sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two merged events + a boundary-exact third (EXACTLY
      // prev+30min — must merge, the q101 probe rule); user 2: split
      mem.addData(Ev(1, 100, ts(0)), Ev(1, 101, ts(10)), Ev(2, 200, ts(5)))
      q.processAllAvailable()
      mem.addData(Ev(1, 102, ts(40)), Ev(2, 201, ts(50)))
      q.processAllAvailable()
      // close everything via watermark
      mem.addData(Ev(9, 900, ts(300)))
      q.processAllAvailable()
      mem.addData(Ev(9, 901, ts(301)))
      q.processAllAvailable()
      val got = spark.table("native_sess_out")
        .filter(col("user_id") < 9)
        .select(col("user_id"), col("s_start"), col("s_end"),
          col("n_events"), col("first_event"))
        .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
      val batch = Seq(Ev(1, 100, ts(0)), Ev(1, 101, ts(10)), Ev(2, 200, ts(5)),
        Ev(1, 102, ts(40)), Ev(2, 201, ts(50)))
        .toDF()
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
        .select(col("user_id"), col("w.start").as("s_start"),
          col("w.end").as("s_end"), col("n_events"), col("first_event"))
        .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
      assert(got === batch)
      // the boundary-exact event DID merge: user 1 has ONE session of 3
      assert(got.count(_._1 == 1L) === 1)
      assert(got.find(_._1 == 1L).get._4 === 3L)
    } finally q.stop()
  }

  test("sessionize in batch mode equals the q16 window formulation on real events") {
    val d = sf("sf0.001")
    val evs = graft.operators.Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[Ev]
    val viaState = EventStreams.sessionize(evs, gapSec = 1800)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    val viaWindow = graft.operators.Relational.q16Sessionize(spark, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaState === viaWindow)
  }

  test("sessionize gap test is exact to the microsecond (sub-ms knife edge)") {
    // two events 1800.000400 s apart: a millisecond-truncated diff reads
    // exactly 1_800_000 ms (no split); the exact epoch-µs convention —
    // the one q16 uses — reads 1_800_000_400 µs > 1800 s (split)
    def tsAt(sec: Long, nanos: Int): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(sec * 1000L)
      t.setNanos(nanos)
      t
    }
    val over = Seq(
      Ev(1L, 1L, tsAt(1000000L, 100000)),            // t + 100 µs
      Ev(1L, 2L, tsAt(1001800L, 500000))).toDS()     // +1800.0004 s
    assert(EventStreams.sessionize(over, 1800).count() === 2L)
    val under = Seq(
      Ev(1L, 1L, tsAt(1000000L, 500000)),            // t + 500 µs
      Ev(1L, 2L, tsAt(1001800L, 100000))).toDS()     // +1799.9996 s
    assert(EventStreams.sessionize(under, 1800).count() === 1L)
  }

  test("STREAMING hopping windows (q223's expression) emit batch-identical closed windows") {
    // window(ts, 60m, 15m) under a watermark: each event's FOUR
    // overlapping windows finalize independently as the watermark
    // passes their ends — the rolling-dashboard continuous query
    implicit val sqlCtx = spark.sqlContext
    def hop(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("ts"), "60 minutes", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          approx_count_distinct(col("user_id")).as("u"))
        .select(col("w.start").as("w_start"), col("event_type"),
          col("n"), col("u"))
    val rows = Seq(
      (ts(0), "click", 1L, 1.0), (ts(10), "click", 2L, 2.0),
      (ts(10), "click", 1L, 2.0), (ts(61), "view", 3L, 4.0),
      (ts(75), "click", 2L, 8.0))
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val q = hop(mem.toDF().toDF("ts", "event_type", "user_id", "value")
        .withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("hop_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(rows.take(3): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*)
      q.processAllAvailable()
      // closer: watermark far past every window end
      mem.addData((ts(600), "zz", 9L, 0.0))
      q.processAllAvailable()
      mem.addData((ts(601), "zz", 9L, 0.0))
      q.processAllAvailable()
      val cutoff = ts(600).getTime - 10 * 60000L
      val got = spark.table("hop_out")
        .as[(Timestamp, String, Long, Long)].collect()
        .filter(r => r._2 != "zz").toSet
      val batch = hop(rows.toDF("ts", "event_type", "user_id", "value"))
        .as[(Timestamp, String, Long, Long)].collect()
        .filter(r => r._1.getTime + 60 * 60000L <= cutoff).toSet
      assert(got === batch)
      // four windows per (event, type) group by construction
      assert(batch.count(_._2 == "view") === 4)
    } finally q.stop()
  }
}
