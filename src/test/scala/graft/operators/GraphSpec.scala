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

  /** Naive O(n³) triangle enumeration over an undirected u<v edge set. */
  private def slowTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tris = for {
      a <- nodes; b <- nodes if a < b && es((a, b))
      c <- nodes if b < c && es((b, c)) && es((a, c))
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("triangleCounts: closed forms — K4, star, and a hub with one chord") {
    // K4: every node is in C(3,2) = 3 triangles
    val k4 = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    val gotK4 = Graph.triangleCounts(k4.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    assert(gotK4 === (1L to 4L).map(_ -> 3L).toMap)
    // star has no triangles at all → empty output
    val star = (2L to 6L).map(h => (1L, h))
    assert(Graph.triangleCounts(star.toDF("u", "v")).count() === 0)
    // one chord on the star closes exactly one triangle — and the hub's
    // high degree must not inflate the count (orientation correctness)
    val chord = star :+ (2L, 3L)
    val gotChord = Graph.triangleCounts(chord.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    assert(gotChord === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  /** Textbook queue BFS, depth-capped. */
  private def slowBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
      k: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (i <- 1 to k) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> i.toLong)
      frontier = next
    }
    dist
  }

  test("bfs: path-graph layers, unreached stays absent, depth cap binds") {
    // path 1-2-3-4-5-6-7 seeded at 1, depth 4 → nodes 1..5; 6,7 absent
    val path = undirected((1L to 6L).map(i => (i, i + 1)))
    val got = Graph.bfs(path.toDF("src", "dst"),
        Seq(1L).toDF("node"), 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // two seeds meet in the middle: min distance wins
    val two = Graph.bfs(path.toDF("src", "dst"),
        Seq(1L, 7L).toDF("node"), 4)
      .as[(Long, Long)].collect().toMap
    assert(two === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      7L -> 0L, 6L -> 1L, 5L -> 2L))
  }

  test("bfs matches queue BFS on random graphs") {
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 3) {
      val edges = undirected((1 to 60).map(_ =>
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter(e => e._1 != e._2).distinct)
      val seeds = Set(0L, 1L)
      val got = Graph.bfs(edges.toDF("src", "dst"),
          seeds.toSeq.toDF("node"), 3)
        .as[(Long, Long)].collect().toMap
      assert(got === slowBfs(edges, seeds, 3), s"trial $trial")
    }
  }

  /** Fixpoint peel: rounds until the live set stops shrinking. */
  private def slowKcore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var live = edges.map(_._1).toSet
    var changed = true
    while (changed) {
      val deg = edges.filter(e => live(e._1) && live(e._2))
        .groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val next = live.filter(n => deg.getOrElse(n, 0L) >= k)
      changed = next != live
      live = next
    }
    edges.filter(e => live(e._1) && live(e._2))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
  }

  test("kcore: tail peels, triangle survives, cascades empty a path") {
    // triangle 1-2-3 plus tail 3-4: 2-core = the triangle, each deg 2
    val tri = undirected(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    val got = Graph.kcore(tri.toDF("src", "dst"), 2, 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // path 1-2-3: ends peel in round 1, middle cascades in round 2
    val path = undirected(Seq((1L, 2L), (2L, 3L)))
    assert(Graph.kcore(path.toDF("src", "dst"), 2, 3).count() === 0)
  }

  test("kcore matches fixpoint peeling on random graphs") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val edges = undirected((1 to 80).map(_ =>
        (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
        .filter(e => e._1 != e._2).distinct)
      // 20 rounds ≥ the worst cascade on 20 nodes ⇒ converged
      val got = Graph.kcore(edges.toDF("src", "dst"), 3, 20)
        .as[(Long, Long)].collect().toMap
      assert(got === slowKcore(edges, 3), s"trial $trial")
    }
  }

  test("triangleCounts matches naive enumeration on random graphs") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val edges = (1 to 120).map { _ =>
        val a = rnd.nextInt(20).toLong; val b = rnd.nextInt(20).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 < e._2).distinct
      val got = Graph.triangleCounts(edges.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      assert(got === slowTriangles(edges), s"trial $trial")
    }
  }

  test("doulion: p=1 degenerates to exact, p=1/4 matches a brute-force referee on K12") {
    // p = 1 (keepHex 16): no sampling, scale 1 — the estimator MUST
    // reproduce the exact count with rel_err 0 (pins the 1/p^3 wiring)
    val k12 = (for (a <- 1L to 12L; b <- a + 1 to 12L) yield (a, b)).toIndexedSeq
    val exactRow = Graph.triangleDoulion(k12.toDF("u", "v"), 16)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(exactRow === ((66L, 66L, 220L, 220L, 220L, Some(0.0))))
    // p = 1/4 (keepHex 4): the kept edge set is a pure function of the
    // md5 convention — recompute it and its triangles brute-force
    def kept(u: Long, v: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"${u}_$v".getBytes("UTF-8"))
      ((h(0) >> 4) & 0xf) < 4
    }
    val sampledEdges = k12.filter(e => kept(e._1, e._2))
    val es = sampledEdges.toSet
    val nTriS = (for {
      a <- 1L to 12L; b <- a + 1 to 12L if es((a, b))
      c <- b + 1 to 12L if es((b, c)) && es((a, c))
    } yield 1).size.toLong
    val row = Graph.triangleDoulion(k12.toDF("u", "v"), 4)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(row._1 === 66L)
    assert(row._2 === sampledEdges.size.toLong, "md5 coin disagrees")
    assert(row._3 === 220L)
    assert(row._4 === nTriS, "sampled triangle count disagrees with brute force")
    assert(row._5 === nTriS * 64L, "estimate must be sampled count x (1/p)^3")
    assert(row._6 === Some(BigDecimal(math.abs(nTriS * 64L - 220L).toDouble / 220L)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // and an empty exact count yields a NULL error, not a crash
    val empty = Graph.triangleDoulion(
      Seq((1L, 2L), (3L, 4L)).toDF("u", "v"), 4)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(empty._3 === 0L && empty._6.isEmpty)
  }

  test("sssp: weighted relaxation beats hop-count path, round bound binds") {
    import spark.implicits._
    // 1→2 direct costs 10; 1→3→2 costs 2+3=5 (more hops, cheaper);
    // 2→4→6→7 extends it. At k=4, node 7 is only reachable through the
    // EXPENSIVE 1→2 head (13, 4 edges) — the cheap head needs 5 edges;
    // node 5 needs ≥5 edges either way, so it stays absent.
    val edges = Seq(
      (1L, 2L, 10L), (1L, 3L, 2L), (3L, 2L, 3L), (2L, 4L, 1L),
      (4L, 6L, 1L), (6L, 7L, 1L), (7L, 5L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.sssp(edges, seeds, k = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 3L -> 2L, 2L -> 5L, 4L -> 6L, 6L -> 7L,
      7L -> 13L))

    // differential vs the textbook DP on random weighted digraphs:
    // dist_i(v) = min(dist_{i-1}(v), min_{(u,v,w)} dist_{i-1}(u) + w)
    val rnd = new scala.util.Random(136)
    for (trial <- 1 to 3) {
      val n = 40
      val es = Seq.fill(160)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
        (rnd.nextInt(9) + 1).toLong))
        .filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq
      val k = 3
      var dp = Map(0L -> 0L)
      for (_ <- 1 to k) {
        val relax = es.flatMap { case (u, v, w) => dp.get(u).map(du => v -> (du + w)) }
        dp = (dp.toSeq ++ relax).groupBy(_._1)
          .map { case (v, ds) => v -> ds.map(_._2).min }
      }
      val got2 = Graph.sssp(es.toDF("src", "dst", "w"), Seq(0L).toDF("node"), k)
        .as[(Long, Long)].collect().toMap
      assert(got2 === dp, s"trial $trial")
    }
  }

  test("resource allocation: closed-form weights, degree cap excludes hubs") {
    import spark.implicits._
    // p1 ~ {A,B}, p2 ~ {A,B,C}, p3 ~ {A} (deg<2, never scores)
    val edges = Seq(
      (1L, 101L), (2L, 101L),
      (1L, 102L), (2L, 102L), (3L, 102L),
      (1L, 103L))
      .toDF("c", "p")
    // cap 3: p1 weight 1e12//2, p2 weight 1e12//3 to all three pairs
    val w2 = 1000000000000L / 2
    val w3 = 1000000000000L / 3
    val got = Graph.resourceAlloc(edges, cap = 3)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got === List(
      (1L, 2L, 2L, w2 + w3),
      (1L, 3L, 1L, w3),
      (2L, 3L, 1L, w3)), got)
    // cap 2: the deg-3 "hub" p2 is excluded — only (A,B) via p1 remains
    val capped = Graph.resourceAlloc(edges, cap = 2)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(capped === List((1L, 2L, 1L, w2)), capped)
  }

  test("hits: two-iteration closed form on a planted bipartite graph") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hitsspec").toString
    Seq((10L, 1L), (20L, 2L), (30L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 101L), (10L, 102L), (20L, 102L), (30L, 102L), (30L, 103L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // a1: P101=1 P102=3 P103=1; h1: C1=4 C2=3 C3=4;
    // a2: P101=4, P102=4+3+4=11, P103=4; ties break by partkey
    val got = Graph.q156Hits(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    assert(got === List((102L, 3L, 11L), (101L, 1L, 4L), (103L, 1L, 4L)))
  }

  test("ppr: JVM fixed-point replica matches; teleport mass stays near seeds") {
    import spark.implicits._
    def slowPpr(edges: Seq[(Long, Long)], seeds: Set[Long]): Map[Long, Long] = {
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nodes = edges.map(_._1).distinct.sorted
      val ns = nodes.count(seeds).toLong
      val base = (15L * Scale) / (100L * ns)
      var r = nodes.map(v => v -> (if (seeds(v)) Scale / ns else 0L)).toMap
      for (_ <- 1 to 5) {
        val in = edges.groupBy(_._2).view.mapValues(
          _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
        r = nodes.map(v => v ->
          ((if (seeds(v)) base else 0L) + in.getOrElse(v, 0L) * 85L / 100L)).toMap
      }
      r
    }
    val dir = java.nio.file.Files.createTempDirectory("pprspec").toString
    // custkey 50 -> node 100 is the seed; custkeys 1, 2 -> nodes 2, 4
    Seq((1L, 50L), (2L, 1L), (3L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 11L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.q164Ppr(spark, dir).as[(Long, Long)].collect().toMap
    val pairs = Seq((100L, 21L), (100L, 23L), (2L, 21L), (4L, 23L))
    val edges = pairs ++ pairs.map(_.swap)
    val want = slowPpr(edges, Set(100L))
    assert(got === want)
    // proximity: restart mass concentrates on the seed and its direct
    // neighbors; the distance-2 non-seed customers hold the tail. (The
    // seed itself need not top the list — hub neighbors that collect
    // from several nodes can out-rank it.)
    assert(got(100L) > got(2L) && got(100L) > got(4L))
    assert(got(100L) + got(21L) + got(23L) > got(2L) + got(4L))
  }
}
