package graft.operators

import java.sql.Timestamp

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

  test("asof join result is partitioning-insensitive") {
    val left = (0 until 500).map(i => ((i % 7).toLong, ts(i), i.toLong))
      .toDF("k", "t", "event_id")
    val right = (0 until 100).map(i => ((i % 7).toLong, ts(i * 5), 1000L + i))
      .toDF("k", "t", "o_orderkey")
    def run(n: Int) = Asof.asofJoin(left.repartition(n), right.repartition(n max 2), "o_orderkey")
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toSet
    assert(run(1) === run(13))
  }
}
