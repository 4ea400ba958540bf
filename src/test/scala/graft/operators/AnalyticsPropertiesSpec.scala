package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based pins for the round-11 analytics identities: the
  * distributed closed forms must equal their sequential textbook
  * definitions on ARBITRARY inputs, not just the gated fixtures.
  * Deterministic scalacheck sampling (the DedupPropertiesSpec idiom). */
class AnalyticsPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(1341L + i)))

  test("CUSUM window identity equals the sequential max(0, S + dev) fold") {
    // the q190 closed form S_t = P_t - min(0, min_{i<t} P_i) IS Page's
    // recurrence — pin the identity on random signed series
    val seriesGen: Gen[Seq[(Long, Int, Long)]] = for {
      nKeys <- Gen.choose(1, 4)
      lens <- Gen.listOfN(nKeys, Gen.choose(1, 40))
      devs <- Gen.sequence[Seq[Seq[Long]], Seq[Long]](
        lens.map(l => Gen.listOfN(l, Gen.choose(-50L, 50L))))
    } yield devs.zipWithIndex.flatMap { case (ds, k) =>
      ds.zipWithIndex.map { case (dv, t) => (k.toLong, t, dv) }
    }
    samples(seriesGen, 12).foreach { rows =>
      val df = rows.toDF("k", "t", "dev")
      val wo = Window.partitionBy($"k").orderBy($"t")
      val wincl = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = df
        .withColumn("pfx", sum($"dev").over(wo))
        .withColumn("cu", $"pfx" -
          least(lit(0L), min($"pfx").over(wincl)))
        .select($"k", $"t", $"cu")
        .as[(Long, Int, Long)].collect()
        .map { case (k, t, c) => (k, t) -> c }.toMap
      rows.groupBy(_._1).foreach { case (k, es) =>
        var s = 0L
        es.sortBy(_._2).foreach { case (_, t, dv) =>
          s = math.max(0L, s + dv)
          assert(got((k, t)) === s, s"k=$k t=$t")
        }
      }
    }
  }

  test("rate-limit window form equals sequential per-key admission on random streams") {
    val evGen: Gen[Seq[(Long, Long, Long, String)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        ty <- Gen.oneOf("click", "view")
        min <- Gen.choose(0L, 90L)
      } yield (u, ty, min))
    } yield rows.zipWithIndex.map { case ((u, ty, m), i) =>
      (i.toLong, (1000 + m) * 60000000L, u, ty) // event_id, ts micros
    }
    samples(evGen, 12).foreach { evs =>
      val df = evs.toDF("event_id", "us", "user_id", "event_type")
        .select($"event_id", timestamp_micros($"us").as("ts"),
          $"user_id", $"event_type")
      val got = graft.streaming.RateLimitStream
        .rateLimitBatch(df, 2, 600000000L)
        .filter($"allowed").select($"event_id").as[Long].collect().toSet
      val want = evs.groupBy(e => (e._3, e._4)).flatMap { case (_, es) =>
        var cur = Long.MinValue; var n = 0
        es.sortBy(e => (e._2, e._1)).flatMap { case (id, us, _, _) =>
          val win = us / 600000000L
          if (win != cur) { cur = win; n = 0 }
          if (n < 2) { n += 1; Some(id) } else None
        }
      }.toSet
      assert(got === want)
    }
  }

  test("HLL registers of a union equal element-wise max of the parts' registers") {
    // the merge law q195's union relies on, over random key sets
    val setsGen: Gen[(Seq[String], Seq[String])] = for {
      na <- Gen.choose(0, 80)
      nb <- Gen.choose(0, 80)
      a <- Gen.listOfN(na, Gen.choose(0, 500).map(i => s"k$i"))
      b <- Gen.listOfN(nb, Gen.choose(0, 500).map(i => s"k$i"))
    } yield (a, b)
    samples(setsGen, 8).foreach { case (a, b) =>
      def regs(ks: Seq[String]): Map[Long, Long] =
        if (ks.isEmpty) Map.empty
        else Analytics.hllRegisters(ks.toDF("key"))
          .as[(Long, Long)].collect().toMap
      val ra = regs(a); val rb = regs(b); val ru = regs(a ++ b)
      val merged = (ra.keySet ++ rb.keySet).map(r =>
        r -> math.max(ra.getOrElse(r, 0L), rb.getOrElse(r, 0L))).toMap
      assert(ru === merged)
    }
  }

  test("q191 RRF fused top-5 equals an independent driver-side computation (sf0.001)") {
    val d = sf("sf0.001")
    val got = Similarity.q191RrfFusion(spark, d)
      .select($"query_id", $"neighbor_id", $"fused_rank", $"rrf_fp")
      .as[(Long, Long, Int, Long)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    // reference: plain Scala from the same parquet
    val vecs = Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def dot(x: Seq[Double], y: Seq[Double]): Double =
      x.zip(y).foldLeft(0.0) { case (s, (a, b)) => s + a * b }
    def rnd6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (q <- 0L until 10L if vecs.contains(q)) {
      val qe = vecs(q); val qn = math.sqrt(dot(qe, qe)); val qsd = dot(qe, qe)
      val others = vecs.toSeq.filter(_._1 != q)
      val scored = others.map { case (id, e) =>
        val dp = dot(qe, e)
        (id, rnd6(dp / (math.sqrt(dot(e, e)) * qn)), rnd6(qsd + dot(e, e) - 2 * dp))
      }
      val topA = scored.sortBy(x => (-x._2, x._1)).take(10).map(_._1)
      val topB = scored.sortBy(x => (x._3, x._1)).take(10).map(_._1)
      val contrib = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      topA.zipWithIndex.foreach { case (id, i) => contrib(id) += 1000000000L / (61 + i) }
      topB.zipWithIndex.foreach { case (id, i) => contrib(id) += 1000000000L / (61 + i) }
      val top5 = contrib.toSeq.sortBy { case (id, c) => (-c, id) }.take(5)
      top5.zipWithIndex.foreach { case ((id, c), i) =>
        assert(got((q, i + 1)) === ((id, c)), s"query $q rank ${i + 1}")
      }
    }
  }

  test("spearman (q236 machinery): matches an average-rank Pearson referee on random tied data") {
    val groupGen = for {
      n <- Gen.choose(2, 40)
      xs <- Gen.listOfN(n, Gen.choose(0L, 8L)) // narrow range → many ties
      ys <- Gen.listOfN(n, Gen.choose(0L, 8L))
    } yield xs.zip(ys)
    def avgRanks(vs: Seq[Long]): Seq[Double] = {
      val order = vs.indices.sortBy(vs)
      val ranks = Array.ofDim[Double](vs.length)
      var i = 0
      while (i < order.length) {
        var j = i
        while (j + 1 < order.length && vs(order(j + 1)) == vs(order(i))) j += 1
        val r = (i + j) / 2.0 + 1
        (i to j).foreach(k => ranks(order(k)) = r)
        i = j + 1
      }
      ranks.toSeq
    }
    samples(groupGen, 12).zipWithIndex.foreach { case (pts, k) =>
      val df = pts.zipWithIndex
        .map { case ((x, y), _) => ("g", x, y) }.toDF("source", "x", "y")
      val got = Analytics.spearmanByGroup(df)
        .as[(String, Long, Option[Double])].collect().head
      assert(got._2 === pts.length.toLong, s"case $k")
      val (rx, ry) = (avgRanks(pts.map(_._1)), avgRanks(pts.map(_._2)))
      val n = pts.length.toDouble
      val (sx, sy) = (rx.sum, ry.sum)
      val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (rx.map(a => a * a).sum, ry.map(b => b * b).sum)
      val varProd = (n * sxx - sx * sx) * (n * syy - sy * sy)
      if (varProd <= 0) assert(got._3.isEmpty, s"case $k: degenerate")
      else {
        val want = BigDecimal((n * sxy - sx * sy) / math.sqrt(varProd))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got._3.isDefined, s"case $k")
        // doubled-rank integer moments vs half-rank doubles: identical
        // up to the last ulp before rounding; allow exactly that
        assert(math.abs(got._3.get - want) <= 1e-6, s"case $k: ${got._3.get} vs $want")
      }
    }
  }
}
