package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Reference power iteration replicating the operator's integer
    * fixed-point schedule exactly (floor divisions, exact integer
    * sums) — any deviation in the distributed formulation shows as an
    * exact-integer mismatch, not a tolerance failure. */
  private def slowPagerank(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.size.toLong
    val base = (15L * Scale) / (100L * n)
    var r = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = nodes.map(v => v -> (base + in.getOrElse(v, 0L) * 85L / 100L)).toMap
    }
    r
  }

  private def undirected(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map(_.swap)

  test("pagerank: symmetric pair stays uniform; star center dominates") {
    // two nodes, one undirected edge: by symmetry both hold Scale/2
    val pair = Graph.pagerank(undirected(Seq((1L, 2L))).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(pair(1L) === pair(2L))
    assert(math.abs(pair(1L) - Scale / 2) < 5)  // floor-quantization slack
    // star: center 1 linked to 2,3,4 — center outranks leaves, which tie
    val star = Graph.pagerank(
      undirected(Seq((1L, 2L), (1L, 3L), (1L, 4L))).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(star(1L) > star(2L))
    assert(star(2L) === star(3L) && star(3L) === star(4L))
    // mass conservation up to floor loss (< 1e-12 per edge per step)
    assert(math.abs(star.values.sum - Scale) < 1000, star)
  }

  test("pagerank matches the fixed-point reference exactly on random graphs") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val edges = undirected((1 to 40).map(_ =>
        (rnd.nextInt(12).toLong, 12L + rnd.nextInt(8))).distinct)
      val got = Graph.pagerank(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val want = slowPagerank(edges)
      assert(got === want, s"trial $trial")
    }
  }
}
