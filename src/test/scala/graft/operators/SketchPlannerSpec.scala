package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchPlannerSpec extends SparkSpec {
  import spark.implicits._

  // A(k1), B(k1,k2), C(k2): the planner prices A⋈B vs B⋈C and must join
  // the cheaper pair first. Differential ground truth: both orders
  // produce the same rows, so correctness never depends on the decision —
  // only cost does.
  private def runBoth(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame) = {
    val (label, planned) = SketchPlanner.planThreeWay(a, b, c, "k1", "k2")
    val worst = SketchPlanner.threeWayWorstFirst(a, b, c, "k1", "k2")
    (label, planned, worst)
  }

  test("uniform corpus: sketch pick matches exact stats, output order-independent") {
    // |A⋈B| = 5000 (unique k1 both sides), |B⋈C| = 200·25 = 5000? no:
    // C has 200 rows over 100 k2 values, B spreads k2 uniformly over
    // 1000 values → |B⋈C| = 5000·(100/1000 match)·2 = 1000. B⋈C is
    // genuinely smaller; the sketch must see that through the noise.
    val a = spark.range(5000).select(col("id").as("k1"), lit(1L).as("av"))
    val b = spark.range(5000).select(col("id").as("k1"),
      pmod(col("id"), lit(1000)).as("k2"), lit(2L).as("bv"))
    val c = spark.range(200).select(pmod(col("id"), lit(100)).as("k2"),
      col("id").as("cv"))
    val (label, planned, worst) = runBoth(a, b, c)
    assert(label.startsWith("bc_first"), label)
    val p = planned.select("k1", "k2", "av", "bv", "cv")
      .collect().map(_.toSeq).toSet
    val w = worst.select("k1", "k2", "av", "bv", "cv")
      .collect().map(_.toSeq).toSet
    assert(p === w)
    assert(p.size === 1000)
  }

  test("skewed corpus: one hot key explodes A⋈B; the sketch routes around it") {
    // A and B share ONE hot k1 value with 300 rows each side →
    // |A⋈B| ≥ 90 000, while |B⋈C| stays tiny. Static row counts alone
    // (|A| = |B| = 600) cannot see this — the CMS inner product can,
    // because the hot key's counter squares.
    val a = spark.range(600).select(
      when(col("id") < 300, lit(7L)).otherwise(col("id") + 1000).as("k1"),
      lit(1L).as("av"))
    val b = spark.range(600).select(
      when(col("id") < 300, lit(7L)).otherwise(col("id") + 5000).as("k1"),
      pmod(col("id"), lit(500)).as("k2"), lit(2L).as("bv"))
    val c = spark.range(20).select(col("id").as("k2"), col("id").as("cv"))
    val (label, planned, worst) = runBoth(a, b, c)
    assert(label.startsWith("bc_first"), label)
    val p = planned.select("k1", "k2", "av", "bv", "cv")
      .collect().map(_.toSeq).toSet
    assert(p === worst.select("k1", "k2", "av", "bv", "cv")
      .collect().map(_.toSeq).toSet)
    // the avoided intermediate really is the explosive one
    assert(a.join(b, "k1").count() >= 90000L)
    assert(b.join(c, "k2").count() < 100L)
  }

  test("mirror-skewed corpus: when B⋈C is the explosive side, ab_first wins") {
    val a = spark.range(200).select((col("id") + 50).as("k1"), lit(1L).as("av"))
    val b = spark.range(600).select(col("id").as("k1"),
      when(col("id") < 300, lit(3L)).otherwise(col("id") + 9000).as("k2"),
      lit(2L).as("bv"))
    val c = spark.range(300).select(lit(3L).as("k2"), col("id").as("cv"))
    val (label, planned, worst) = runBoth(a, b, c)
    assert(label.startsWith("ab_first"), label)
    assert(planned.select("k1", "k2", "av", "bv", "cv")
      .collect().map(_.toSeq).toSet ===
      worst.select("k1", "k2", "av", "bv", "cv")
        .collect().map(_.toSeq).toSet)
  }

  test("hot-key skew: System-R underestimates 100x in the dangerous direction; CMS stays one-sided") {
    // 500 copies of key 7 on each side plus 500 disjoint unique keys:
    // exact |A join B| = 500*500 = 250_000, but n*n/max(ndv) with EXACT
    // stats says ~1996 - the uniformity assumption underestimating by
    // 125x, exactly the error that makes a planner broadcast an
    // exploding join. The CMS prices the frequency inner product
    // directly: >= exact always, and within width noise here.
    val a = spark.range(1000).select(
      when(col("id") < 500, lit(7L)).otherwise(col("id") + 1000).as("k"))
    val b = spark.range(1000).select(
      when(col("id") < 500, lit(7L)).otherwise(col("id") + 9000).as("k"))
    val exact = SketchPlanner.exactPair(a, col("k"), b, col("k"))
      .as[Long].collect().head
    val cms = SketchPlanner.estPair(a, col("k"), b, col("k"))
      .as[Long].collect().head
    val (na, ndvA) = (1000L, 501L)
    val systemR = na * na / ndvA
    assert(exact === 250000L)
    assert(systemR < exact / 100, s"System-R $systemR vs exact $exact")
    assert(cms >= exact, s"CMS must never underestimate: $cms vs $exact")
    assert(cms <= exact + (1000L * 1000L) / 16384 * 4,
      s"CMS $cms far past the width-noise bound") // eps = n_a*n_b/w slack
  }

  test("q205 decision table: one-sided estimates, picks and strategies agree with exact") {
    val d = sf("sf0.001")
    val rows = SketchPlanner.q205JoinPlanner(spark, d)
      .as[(String, Long, Long, Boolean, Boolean, String, String)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq("c_join_o", "o_join_l"))
    rows.foreach { case (cand, est, exact, _, _, _, _) =>
      assert(est >= exact, s"$cand: CMS estimate must be one-sided")
    }
    // exactly one candidate picked, and the sketch agrees with exact
    assert(rows.count(_._4) === 1)
    rows.foreach { r =>
      assert(r._4 === r._5, s"${r._1}: pick disagrees with exact stats")
      assert(r._6 === r._7, s"${r._1}: strategy disagrees with exact stats")
    }
  }
}
