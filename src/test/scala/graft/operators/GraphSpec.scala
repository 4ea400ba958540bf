package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference power iteration replicating the operator's rounding
    * schedule exactly (round-10 contributions, decimal-exact sums,
    * round-10 damped update, round-8 output). */
  private def slowPagerank(edges: Seq[(Long, Long)]): Map[Long, Double] = {
    def r10(x: Double) =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => BigDecimal(r10(r(s) / deg(s))) }.sum).toMap
      r = nodes.map(v => v ->
        r10(0.15 / n + 0.85 * in.getOrElse(v, BigDecimal(0)).toDouble)).toMap
    }
    r.view.mapValues(x => BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
  }

  private def undirected(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map(_.swap)

  test("pagerank: symmetric pair stays uniform; star center dominates") {
    // two nodes, one undirected edge: by symmetry rank stays 0.5/0.5
    val pair = Graph.pagerank(undirected(Seq((1L, 2L))).toDF("src", "dst"))
      .as[(Long, Double)].collect().toMap
    assert(pair === Map(1L -> 0.5, 2L -> 0.5))
    // star: center 1 linked to 2,3,4 — center outranks leaves, which tie
    val star = Graph.pagerank(
      undirected(Seq((1L, 2L), (1L, 3L), (1L, 4L))).toDF("src", "dst"))
      .as[(Long, Double)].collect().toMap
    assert(star(1L) > star(2L))
    assert(star(2L) === star(3L) && star(3L) === star(4L))
    // mass conservation (undirected -> no dangling leak): sum == 1
    assert(math.abs(star.values.sum - 1.0) < 1e-6, star)
  }

  test("pagerank matches the reference iteration on random graphs") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val edges = undirected((1 to 40).map(_ =>
        (rnd.nextInt(12).toLong, 12L + rnd.nextInt(8))).distinct)
      val got = Graph.pagerank(edges.toDF("src", "dst"))
        .as[(Long, Double)].collect().toMap
      val want = slowPagerank(edges)
      assert(got.keySet === want.keySet, s"trial $trial")
      got.foreach { case (v, x) =>
        assert(math.abs(x - want(v)) < 1e-8, s"trial $trial node $v: $x vs ${want(v)}")
      }
    }
  }
}
