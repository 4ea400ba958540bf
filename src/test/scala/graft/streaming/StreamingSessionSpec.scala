package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._
  import SessionStream.Ev

  private def at(min: Int) = new Timestamp(min * 60000L)

  test("streaming sessions equal the batch operator on closed windows; gap merge and split are exact") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = SessionStream.sessionsStream(mem.toDS(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: events at 0, 20, 40 min (chained: each gap < 30) then 90
      // (29-min-short of nothing — new session); user 2: single event
      mem.addData(Ev(1L, at(0), 1.5), Ev(1L, at(20), 2.0), Ev(2L, at(5), 4.0))
      q.processAllAvailable()
      mem.addData(Ev(1L, at(40), 0.25), Ev(1L, at(90), 8.0))
      q.processAllAvailable()
      // closer: watermark to 190 − 10 = 180 min — every session above
      // (latest close: 90 + 30 = 120) is final
      mem.addData(Ev(9L, at(190), 0.0))
      q.processAllAvailable()
      mem.addData(Ev(9L, at(191), 0.0))
      q.processAllAvailable()

      val got = spark.table("sess_out")
        .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
      // chained merge ACROSS micro-batches: 0/20 arrived in batch 1,
      // 40 in batch 2 — one session [0, 70); the 90 event is its own
      assert(got.contains((1L, at(0), at(70), 3L, 3750L)), got)
      assert(got.contains((1L, at(90), at(120), 1L, 8000L)), got)
      assert(got.contains((2L, at(5), at(35), 1L, 4000L)), got)
      // batch differential on the same rows, restricted to closed sessions
      val rows = Seq(
        Ev(1L, at(0), 1.5), Ev(1L, at(20), 2.0), Ev(2L, at(5), 4.0),
        Ev(1L, at(40), 0.25), Ev(1L, at(90), 8.0), Ev(9L, at(190), 0.0),
        Ev(9L, at(191), 0.0)).toDF
      val batch = SessionStream.sessions(rows, "30 minutes")
        .as[(Long, Timestamp, Timestamp, Long, Long)].collect()
        .filter(_._3.getTime <= 180 * 60000L).toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("the q208 SQL text runs CONTINUOUSLY: spark.sql over a streaming view equals the DSL stream") {
    // q208_sql_sessionize's docstring claims the same SQL under
    // readStream runs as a continuous query — prove it: register a
    // watermarked MemoryStream as a temp view, run the literal
    // session_window SQL through spark.sql as a STREAMING query, and
    // diff against the DSL streaming pipeline on identical batches.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.toDF().withWatermark("ts", "10 minutes")
      .createOrReplaceTempView("graft_sess_sql_stream")
    val q = spark.sql(
      """SELECT user_id,
        |  session_window.start AS s_start, session_window.end AS s_end,
        |  count(1) AS n_events,
        |  sum(CAST(round(value * 1000, 0) AS BIGINT)) AS total_milli
        |FROM graft_sess_sql_stream
        |GROUP BY user_id, session_window(ts, '30 minutes')""".stripMargin)
      .writeStream.format("memory").queryName("sess_sql_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Ev(1L, at(0), 1.5), Ev(1L, at(20), 2.0), Ev(2L, at(5), 4.0))
      q.processAllAvailable()
      mem.addData(Ev(1L, at(40), 0.25), Ev(1L, at(90), 8.0))
      q.processAllAvailable()
      mem.addData(Ev(9L, at(190), 0.0))
      q.processAllAvailable()
      mem.addData(Ev(9L, at(191), 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_sql_out")
        .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
      // same emissions the DSL streaming test pins on these batches —
      // cross-batch merge included
      assert(got.contains((1L, at(0), at(70), 3L, 3750L)), got)
      assert(got.contains((1L, at(90), at(120), 1L, 8000L)), got)
      assert(got.contains((2L, at(5), at(35), 1L, 4000L)), got)
    } finally {
      q.stop()
      spark.catalog.dropTempView("graft_sess_sql_stream")
    }
  }

  test("exact-gap boundary MERGES: ts - prev == gap joins the session; one past it splits") {
    // Spark's session_window is inclusive at the close: an event AT
    // prev + gap merges (split strictly greater) — the oracle's
    // gaps-and-islands break uses > to match
    val rows = Seq(Ev(7L, at(0), 1.0), Ev(7L, at(30), 1.0),
      Ev(8L, at(0), 1.0), Ev(8L, at(31), 1.0)).toDF
    val got = SessionStream.sessions(rows, "30 minutes")
      .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
    assert(got === Set(
      (7L, at(0), at(60), 2L, 2000L),
      (8L, at(0), at(30), 1L, 1000L),
      (8L, at(31), at(61), 1L, 1000L)))
  }
}
