package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Analytics

class StreamingGapFillSpec extends SparkSpec {
  import spark.implicits._

  // GapFillStream is transformWithState (v2) since round 12: every test
  // here needs the RocksDB provider
  override protected def test(name: String, tags: org.scalatest.Tag*)(
      body: => Any)(implicit pos: org.scalactic.source.Position): Unit =
    super.test(name, tags: _*)(withRocksDb(body))(pos)

  private def at(hour: Int, min: Int) =
    new Timestamp(hour * 3600000L + min * 60000L)

  test("streaming gap fill: zeros for silent hours, timers advance silent types") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[GapFillStream.In]
    val q = GapFillStream.hourlyGapFill(mem.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("gapfill_out")
      .outputMode(OutputMode.Append).start()
    try {
      // hour 10: A x2, B x1; hour 11: silence; hour 12: A x1
      mem.addData(
        GapFillStream.In("A", at(10, 5)), GapFillStream.In("A", at(10, 40)),
        GapFillStream.In("B", at(10, 20)), GapFillStream.In("A", at(12, 15)))
      q.processAllAvailable()
      // push the watermark to 14:30 (15:00 - 30min); B receives NO new
      // data — its zeros must come from the event-time TIMER
      mem.addData(GapFillStream.In("A", at(15, 0)))
      q.processAllAvailable()
      // one more batch so the 14:30 watermark (derived after the
      // previous batch) drives finalization
      mem.addData(GapFillStream.In("A", at(15, 1)))
      q.processAllAvailable()

      val got = spark.table("gapfill_out")
        .as[GapFillStream.HourCount].collect()
        .map(r => (r.event_type, r.hour.getTime / 3600000L, r.n)).toSet
      val want = Set(
        ("A", 10L, 2L), ("A", 11L, 0L), ("A", 12L, 1L), ("A", 13L, 0L),
        ("B", 10L, 1L), ("B", 11L, 0L), ("B", 12L, 0L), ("B", 13L, 0L))
      assert(got === want)

      // differential vs the batch operator on the same rows, over the
      // finalized horizon (hours 10-13) — the dense series agrees
      val rows = Seq(
        ("A", at(10, 5)), ("A", at(10, 40)), ("B", at(10, 20)),
        ("A", at(12, 15)), ("A", at(15, 0)), ("A", at(15, 1)))
        .toDF("event_type", "ts")
      val batch = Analytics.gapFillHourly(rows)
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L,
          r.getLong(2)))
        .filter(x => x._2 <= 13L).toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("gap fill anchors on the batch MIN hour, not iterator order") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[GapFillStream.In]
    val q = GapFillStream.hourlyGapFill(mem.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("gapfill_order_out")
      .outputMode(OutputMode.Append).start()
    try {
      // later hour FIRST in the batch: the hour-20 row must still count
      // (a first-seen anchor would classify it as late and drop it)
      mem.addData(
        GapFillStream.In("C", at(23, 30)), GapFillStream.In("C", at(20, 10)))
      q.processAllAvailable()
      mem.addData(GapFillStream.In("C", at(26, 0)))
      q.processAllAvailable()
      mem.addData(GapFillStream.In("C", at(26, 1)))
      q.processAllAvailable()
      val got = spark.table("gapfill_order_out")
        .as[GapFillStream.HourCount].collect()
        .map(r => (r.hour.getTime / 3600000L, r.n)).toSet
      assert(got === Set((20L, 1L), (21L, 0L), (22L, 0L), (23L, 1L), (24L, 0L)))
    } finally q.stop()
  }

  test("pre-anchor straggler inside the watermark lowers the anchor across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[GapFillStream.In]
    val q = GapFillStream.hourlyGapFill(mem.toDS(), "3 hours")
      .writeStream.format("memory").queryName("gapfill_preanchor_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1 anchors at hour 22 (min hour 23); watermark -> 20:30
      mem.addData(GapFillStream.In("D", at(23, 30)))
      q.processAllAvailable()
      // batch 2: hour 21 is BELOW the provisional anchor but its end
      // (22:00) is past the 20:30 watermark — must lower the anchor
      // and count, not drop (nothing is finalized yet)
      mem.addData(GapFillStream.In("D", at(21, 15)))
      q.processAllAvailable()
      // advance the watermark far enough to finalize hours 21-26
      mem.addData(GapFillStream.In("D", at(30, 0)))
      q.processAllAvailable()
      mem.addData(GapFillStream.In("D", at(30, 1)))
      q.processAllAvailable()
      val got = spark.table("gapfill_preanchor_out")
        .as[GapFillStream.HourCount].collect()
        .map(r => (r.hour.getTime / 3600000L, r.n)).toSet
      assert(got === Set((21L, 1L), (22L, 0L), (23L, 1L), (24L, 0L),
        (25L, 0L), (26L, 0L)))
    } finally q.stop()
  }

  test("post-watermark straggler: series intact, drop visible in the operator metric") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[GapFillStream.In]
    val q = GapFillStream.hourlyGapFill(mem.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("gapfill_late_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(GapFillStream.In("E", at(10, 0)), GapFillStream.In("E", at(14, 0)))
      q.processAllAvailable()
      mem.addData(GapFillStream.In("E", at(14, 1)))
      q.processAllAvailable() // hours 10-12 finalized (wm 13:30)
      // straggler for the already-finalized hour 11: the stateful
      // operator's watermark pre-filter drops it BEFORE the handler —
      // the finalized series stays intact and the drop is observable in
      // numRowsDroppedByWatermark (the advertised surfacing point)
      mem.addData(GapFillStream.In("E", at(11, 30)), GapFillStream.In("E", at(15, 0)))
      q.processAllAvailable()
      mem.addData(GapFillStream.In("E", at(15, 1)))
      q.processAllAvailable()
      val rows = spark.table("gapfill_late_out")
        .as[GapFillStream.HourCount].collect()
        .map(r => (r.hour.getTime / 3600000L, r.n)).toSet
      assert(rows.contains((11L, 0L))) // finalized count unchanged
      assert(rows.contains((13L, 0L))) // chain advanced past the drop
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L, s"straggler drop not surfaced (dropped=$dropped)")
    } finally q.stop()
  }
}
