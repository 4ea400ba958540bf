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

  test("dynamic per-row gap: session end is the running max(ts+gap), streaming == batch") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    // value encodes the gap policy: value >= 4 → 60-minute hold, else
    // 10 minutes (the q221 shape on the Ev schema)
    def dynSessions(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"),
          session_window(col("ts"), expr(
            "CASE WHEN value >= 4.0 THEN '60 minutes' ELSE '10 minutes' END"))
            .as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("w.start").as("s_start"),
          col("w.end").as("s_end"), col("n"))
    // user 1: long-gap event at 0 (holds to 60) bridges the 40-min
    // event (short gap → holds to 50); event at 51 still merges (≤ the
    // RUNNING MAX end 60, not the last event's own 50) — the dynamic
    // rule a static formulation cannot express; the merge rule is
    // boundary-INCLUSIVE (an event AT the running max end still joins,
    // matching the oracle's strictly-greater break), so 61 would merge
    // and 62 would split; pin 70 splitting. user 2: two short-gap
    // events 11 min apart split.
    val rows = Seq(
      Ev(1L, at(0), 9.0), Ev(1L, at(40), 1.0), Ev(1L, at(51), 1.0),
      Ev(1L, at(70), 1.0),
      Ev(2L, at(0), 1.0), Ev(2L, at(11), 1.0))
    val batch = dynSessions(rows.toDF)
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(batch === Set(
      (1L, at(0), at(61), 3L), // end = max(0+60, 40+10, 51+10) = 61
      (1L, at(70), at(80), 1L),
      (2L, at(0), at(10), 1L),
      (2L, at(11), at(21), 1L)))
    // streaming: same expression under a watermark, sessions emitted
    // once closed, batch-identical
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = dynSessions(mem.toDS().toDF.withWatermark("ts", "5 minutes"))
      .writeStream.format("memory").queryName("dyn_sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 2's t=0/11 events must ride in batch 1: batch 1's max ts
      // (51) sets the watermark to 46, so arriving later would drop
      // them as late — the cross-batch merge is exercised by user 1's
      // t=70 event alone
      mem.addData(rows.take(3) ++ rows.drop(4): _*)
      q.processAllAvailable()
      mem.addData(rows(3))
      q.processAllAvailable()
      mem.addData(Ev(9L, at(500), 0.0)) // watermark far past every close
      q.processAllAvailable()
      mem.addData(Ev(9L, at(501), 0.0))
      q.processAllAvailable()
      val got = spark.table("dyn_sess_out")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .filter(_._1 != 9L).toSet
      assert(got === batch)
    } finally q.stop()
  }
}
