package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Top-level so Spark can instantiate the encoder without the suite's
  * outer scope. */
case class AttrEv(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  // offset from epoch 0: the initial global watermark is 0 ms and the
  // join's late-input handling is borderline at exactly epoch 0
  private val Day = 86400000L
  private def at(min: Int) = new Timestamp(Day + min * 60000L)

  test("stream-stream attribution join equals the batch operator; cross-batch pairs found") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttrEv]
    val q = AttributionStream.attribution(mem.toDF(), "1 HOUR", "10 minutes")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append).start()
    try {
      // click in batch 1, matching purchase in batch 2 (the pair exists
      // only if the click survived in join state across batches); a
      // purchase 61 min after the click must NOT attribute; user 2's
      // purchase has no click — unmatched
      mem.addData(
        AttrEv(1L, at(0), 7L, "click", 0.0),
        AttrEv(2L, at(5), 7L, "purchase", 10.5))
      q.processAllAvailable()
      mem.addData(
        AttrEv(3L, at(30), 7L, "purchase", 2.25),
        AttrEv(4L, at(61), 7L, "purchase", 1.0),
        AttrEv(5L, at(62), 2L, "purchase", 9.0),
        AttrEv(6L, at(62), 7L, "click", 0.0))
      q.processAllAvailable()
      mem.addData(AttrEv(7L, at(100), 7L, "purchase", 4.0))
      q.processAllAvailable()

      val got = spark.table("attr_out")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = Set(
        (1L, 2L, 7L, 5L * 60000000L, 10500L),   // same-batch pair
        (1L, 3L, 7L, 30L * 60000000L, 2250L),   // cross-batch pair
        (6L, 7L, 7L, 38L * 60000000L, 4000L))   // click after earlier purchases
      assert(got === want)
      // batch differential: identical rows from the same code path
      val batch = AttributionStream.attribution(Seq(
        AttrEv(1L, at(0), 7L, "click", 0.0),
        AttrEv(2L, at(5), 7L, "purchase", 10.5),
        AttrEv(3L, at(30), 7L, "purchase", 2.25),
        AttrEv(4L, at(61), 7L, "purchase", 1.0),
        AttrEv(5L, at(62), 2L, "purchase", 9.0),
        AttrEv(6L, at(62), 7L, "click", 0.0),
        AttrEv(7L, at(100), 7L, "purchase", 4.0)).toDF,
        "1 HOUR", "10 minutes")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("left-outer: unconverted clicks emit a null row only after the watermark closes their window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttrEv]
    val q = AttributionStream.attribution(mem.toDF(), "1 HOUR",
        "10 minutes", "left_outer")
      .writeStream.format("memory").queryName("attr_lo_out")
      .outputMode(OutputMode.Append).start()
    try {
      // click 1 (user 7) converts; click 2 (user 8) never can —
      // user 8 has no purchases at all
      mem.addData(AttrEv(1L, at(0), 7L, "click", 0.0),
        AttrEv(2L, at(10), 8L, "click", 0.0),
        AttrEv(3L, at(20), 7L, "purchase", 5.0))
      q.processAllAvailable()
      // watermark still inside click 2's window: no null row yet —
      // "unconverted" is not yet provable
      val early = spark.table("attr_lo_out")
        .collect().map(r => (r.getLong(0), r.isNullAt(1))).toSet
      assert(early === Set((1L, false)))
      // push BOTH watermarks past click2+window (70 min + 10 delay)
      mem.addData(AttrEv(4L, at(200), 9L, "click", 0.0),
        AttrEv(5L, at(200), 9L, "purchase", 1.0))
      q.processAllAvailable()
      mem.addData(AttrEv(6L, at(210), 9L, "click", 0.0),
        AttrEv(7L, at(210), 9L, "purchase", 1.0))
      q.processAllAvailable()
      mem.addData(AttrEv(8L, at(220), 9L, "click", 0.0),
        AttrEv(9L, at(220), 9L, "purchase", 1.0))
      q.processAllAvailable()
      mem.addData(AttrEv(10L, at(230), 9L, "click", 0.0),
        AttrEv(11L, at(230), 9L, "purchase", 1.0))
      q.processAllAvailable()
      val got = spark.table("attr_lo_out")
        .collect().map(r => (r.getLong(0), r.isNullAt(1))).toSet
      // click 2's null row has now been released
      assert(got.contains((2L, true)), got)
      // and the converted clicks never got a spurious null sibling
      assert(!got.contains((1L, true)), got)
    } finally q.stop()
  }

  test("idle purchase side pins the global watermark: nulls held, state grows, release on first purchase") {
    // the q187/q188 caveat as a PROPERTY (round-11 verdict task 6): the
    // global watermark is the MIN over both derived watermark nodes, and
    // a side that sees no rows keeps ITS node at epoch 0 — so a
    // click-only stream can advance its own event time arbitrarily far
    // without ever proving "unconverted" for anyone, and left-outer null
    // rows stay in state indefinitely. Feeding the idle side one row
    // un-pins everything at once.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttrEv]
    val q = AttributionStream.attribution(mem.toDF(), "1 HOUR",
        "10 minutes", "left_outer")
      .writeStream.format("memory").queryName("attr_pin_out")
      .outputMode(OutputMode.Append).start()
    try {
      // phase 1: clicks ONLY, event time marching 0 → 400 min — click
      // 1's 70+10 min deadline is hours behind the click-side watermark
      mem.addData(AttrEv(1L, at(0), 1L, "click", 0.0))
      q.processAllAvailable()
      Seq(200, 300, 400).zipWithIndex.foreach { case (m, i) =>
        mem.addData(AttrEv(10L + i, at(m), 2L + i, "click", 0.0))
        q.processAllAvailable()
      }
      // nothing may emit: no matches exist and no null row is provable
      // while the purchase watermark node sits at epoch 0
      assert(spark.table("attr_pin_out").isEmpty,
        spark.table("attr_pin_out").collect().mkString("\n"))
      // the global watermark really is pinned at epoch 0 by the idle side
      assert(q.lastProgress.eventTime.get("watermark")
        === "1970-01-01T00:00:00.000Z", q.lastProgress.eventTime)
      // and every click is still buffered in join state (nothing evicted)
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows >= 4L, s"state=$stateRows")

      // phase 2: release — the purchase side sees data at the frontier,
      // its watermark jumps 0 → ~390, the global min follows, and the
      // long-closed click windows all resolve (subsequent batches apply
      // the advanced watermark)
      mem.addData(AttrEv(50L, at(400), 9L, "purchase", 1.0))
      q.processAllAvailable()
      Seq(410, 420, 430).foreach { m =>
        mem.addData(AttrEv((50 + m).toLong, at(m), 9L, "click", 0.0),
          AttrEv((100 + m).toLong, at(m), 9L, "purchase", 1.0))
        q.processAllAvailable()
      }
      val got = spark.table("attr_pin_out").collect()
        .map(r => (r.getLong(0), r.isNullAt(1))).toSet
      // clicks 1, 10, 11 (windows closed well under the released
      // watermark) emit their null rows; click 12 @400 may still be open
      assert(Set((1L, true), (10L, true), (11L, true)).subsetOf(got), got)
    } finally q.stop()
  }

  test("join state is watermark-bounded: an out-of-horizon click cannot match a late purchase") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttrEv]
    val q = AttributionStream.attribution(mem.toDF(), "1 HOUR", "10 minutes")
      .writeStream.format("memory").queryName("attr_wm_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(AttrEv(1L, at(0), 5L, "click", 0.0))
      q.processAllAvailable()
      // advance BOTH derived watermarks far past click1+window — the
      // global watermark is the MIN across watermark nodes, so a side
      // that sees no data pins it (the multipleWatermarkPolicy rule);
      // user 6's pair also proves the join still works at the frontier
      mem.addData(AttrEv(2L, at(500), 6L, "click", 0.0),
        AttrEv(3L, at(505), 6L, "purchase", 2.0))
      q.processAllAvailable()
      mem.addData(AttrEv(4L, at(520), 6L, "click", 0.0),
        AttrEv(5L, at(525), 6L, "purchase", 3.0))
      q.processAllAvailable()
      // a purchase that WOULD have matched click 1 arrives 8 hours past
      // the watermark: evicted click state / late-input filtering must
      // keep it unmatched
      mem.addData(AttrEv(9L, at(30), 5L, "purchase", 1.0))
      q.processAllAvailable()
      val got = spark.table("attr_wm_out")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === Set(
        (2L, 3L, 6L, 5L * 60000000L, 2000L),
        (2L, 5L, 6L, 25L * 60000000L, 3000L),
        (4L, 5L, 6L, 5L * 60000000L, 3000L)))
    } finally q.stop()
  }
}
