package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(60000L * m)

  test("asof join: inclusive boundary, no-prior-match null, key isolation") {
    val left = Seq(
      (1L, ts(10), 100L), // after k1's first order
      (1L, ts(20), 101L), // exactly AT k1's second order (inclusive)
      (1L, ts(5), 102L),  // before any k1 order -> null
      (2L, ts(50), 200L), // k2 must not see k1's orders
      (3L, ts(50), 300L)) // key with no orders at all -> null
      .toDF("k", "t", "event_id")
    val right = Seq(
      (1L, ts(8), 1008L), (1L, ts(20), 1020L),
      (2L, ts(49), 2049L))
      .toDF("k", "t", "o_orderkey")
    val got = Asof.asofJoin(left, right, "o_orderkey")
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got === Map(
      100L -> Some(1008L),
      101L -> Some(1020L), // t equal ⇒ matched (≤ semantics)
      102L -> None,
      200L -> Some(2049L),
      300L -> None))
  }

  test("forward asof: strict boundary, no-later-match null, earliest wins, key isolation") {
    val left = Seq(
      (1L, ts(10), 100L), // before k1's two later rights → EARLIEST (ts 20)
      (1L, ts(20), 101L), // exactly AT a right → strict < excludes it → ts 30
      (1L, ts(40), 102L), // after every k1 right → null
      (2L, ts(5), 200L),  // k2 must not see k1's rights
      (3L, ts(5), 300L))  // key with no rights → null
      .toDF("k", "t", "event_id")
    val right = Seq(
      (1L, ts(20), 1020L), (1L, ts(30), 1030L),
      (2L, ts(6), 2006L))
      .toDF("k", "t", "p_id")
    val got = Asof.asofJoinForward(left, right, "p_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got === Map(
      100L -> Some(1020L),
      101L -> Some(1030L), // t equal ⇒ NOT matched (strict >)
      102L -> None,
      200L -> Some(2006L),
      300L -> None))
    // matched_t rides along with the payload (same winning row)
    val mt = Asof.asofJoinForward(left, right, "p_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(mt(100L) === Some(ts(20)) && mt(101L) === Some(ts(30)) && mt(102L) === None)
  }

  test("asof join result is partitioning-insensitive") {
    val left = (0 until 500).map(i => ((i % 7).toLong, ts(i), i.toLong))
      .toDF("k", "t", "event_id")
    val right = (0 until 100).map(i => ((i % 7).toLong, ts(i * 5), 1000L + i))
      .toDF("k", "t", "o_orderkey")
    def run(n: Int) = Asof.asofJoin(left.repartition(n), right.repartition(n max 2), "o_orderkey")
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toSet
    assert(run(1) === run(13))
  }

  test("bucketed range join == naive theta join; boundaries half-open; bad intervals dropped") {
    val points = (0 until 240).map(i => (ts(i), i.toLong)).toDF("ts", "pid")
    val intervals = Seq(
      (ts(10), ts(20), "a"),   // plain window
      (ts(15), ts(40), "b"),   // OVERLAPS a: points 15-19 match both
      (ts(19), ts(21), "c"),   // straddles a bucket edge at any width
      (ts(50), ts(50), "d"),   // empty (start == end) -> no matches
      (ts(70), ts(60), "e"),   // inverted -> dropped, not fabricated
      (ts(200), ts(1000), "f")) // extends past the last point
      .toDF("win_start", "win_end", "tag")
    val naive = points.crossJoin(intervals)
      .filter(col("ts") >= col("win_start") && col("ts") < col("win_end"))
      .select(col("pid"), col("tag")).as[(Long, String)].collect().toSet
    // expected semantics spot-checks: start inclusive, end exclusive
    assert(naive.contains((10L, "a")) && !naive.contains((20L, "a")))
    assert(naive.contains((15L, "b")) && naive.contains((15L, "a")))
    assert(!naive.exists(_._2 == "d") && !naive.exists(_._2 == "e"))
    // the bucketed join must reproduce the naive pairs at ANY width —
    // correctness is width-independent (width only tunes cost)
    for (widthMin <- Seq(1L, 7L, 60L)) {
      val got = Asof.rangeJoinBucketed(points, "ts", intervals,
          "win_start", "win_end", bucketMicros = widthMin * 60L * 1000000)
        .select(col("pid"), col("tag")).as[(Long, String)].collect()
      assert(got.length === got.toSet.size, s"width=$widthMin produced duplicate pairs")
      assert(got.toSet === naive, s"width=$widthMin")
    }
  }

  test("interval overlap join == naive theta join, duplicate-free at any width") {
    val left = Seq(
      (1L, ts(0), ts(100)),   // long interval spanning many buckets
      (2L, ts(10), ts(20)),
      (3L, ts(20), ts(30)),   // touches 2's end: half-open -> no overlap
      (4L, ts(25), ts(26)),   // contained inside 1 and 3
      (5L, ts(500), ts(600))) // overlaps nothing on the right
      .toDF("lid", "f_start", "f_end")
    val right = Seq(
      (10L, ts(15), ts(40)),  // overlaps 1, 2, 3, 4
      (11L, ts(95), ts(200)), // clips 1's tail only
      (12L, ts(100), ts(110)),// touches 1's end exactly -> no overlap with 1
      (13L, ts(300), ts(300)),// empty -> overlaps nothing
      (14L, ts(50), ts(50)))  // empty STRICTLY INSIDE 1: raw theta predicate
                              // is TRUE, set-intersection semantics say no —
                              // pins the documented divergence
      .toDF("rid", "wk_start", "wk_end")
    // naive reference encodes the OPERATOR's set-intersection semantics:
    // both sides restricted to non-empty intervals, then the theta predicate
    val naive = left.filter(col("f_start") < col("f_end"))
      .crossJoin(right.filter(col("wk_start") < col("wk_end")))
      .filter(col("f_start") < col("wk_end") && col("wk_start") < col("f_end"))
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    assert(naive === Set((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (1L, 11L)))
    // the raw predicate alone WOULD emit (1,14) — assert the divergence is real
    assert(left.crossJoin(right)
      .filter(col("f_start") < col("wk_end") && col("wk_start") < col("f_end"))
      .filter(col("rid") === 14L).count() > 0)
    // a pair shares every bucket in [max(starts), min(ends)) — the
    // first-covered-bucket predicate must kill the duplicates at ANY
    // width without a dropDuplicates shuffle
    for (widthMin <- Seq(1L, 13L, 120L)) {
      val got = Asof.intervalOverlapJoin(left, "f_start", "f_end",
          right, "wk_start", "wk_end", bucketMicros = widthMin * 60L * 1000000)
        .select(col("lid"), col("rid")).as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"width=$widthMin produced duplicate pairs")
      assert(got.toSet === naive, s"width=$widthMin")
    }
  }

  test("q64 plan: equi join on buckets, never a nested-loop product") {
    val q = Asof.q64RangeJoin(spark, sf("sf0.001"))
    q.queryExecution.toRdd.count() // let AQE finalize join strategies
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // the 10-interval side broadcasts; events stream through one scan
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
