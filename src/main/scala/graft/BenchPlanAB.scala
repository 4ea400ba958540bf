package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SketchPlanner

/** A/B: what is the q205 sketch planner's decision WORTH at runtime?
  *
  * Corpus where static row counts cannot rank the two candidate first
  * joins of A⋈B⋈C (A and B are the same size) but the key distributions
  * make |A⋈B| explode (rows/800 shared k1 keys × 800 rows each side →
  * 2500 × 800 × 800 ≈ 1.6e9 intermediate rows at the 2M default, each
  * carrying A's 64-byte payload) while |B⋈C| is ~1e3: the CMS inner
  * product sees the square of the per-key counts, so the planner routes
  * around the explosion. Even pipelined (AQE broadcasts C, so the
  * intermediate never hits a shuffle), 1.6e9 payload-bearing rows are
  * pure wasted CPU the good
  * order never spends. Arms, all constructed INSIDE the timer (the round-11
  * BenchSkewAB lesson):
  *
  *   - plan:  the sketch pass itself + the decision (two constant-size
  *            sketch scans + two 1-row collects) — the planner's COST
  *   - good:  EXECUTION of the chosen order (decision precomputed —
  *            buildThreeWay, no sketching in the timer)
  *   - bad:   execution of the other order (the one a static-stats
  *            optimizer with no distribution knowledge might pick) —
  *            the penalty avoided
  *
  * `runMain graft.BenchPlanAB [rowsPerSide] [reps]`. Medians recorded in
  * BASELINE.md §SketchPlanAB. Identical outputs asserted before timing. */
object BenchPlanAB {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 2000000
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.getOrCreate("graft-plan-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val nKeys = rows / 800 // 800 rows per k1 key on each side
    val dir = java.nio.file.Files.createTempDirectory("planab").toString
    spark.range(rows.toLong)
      .select(pmod(col("id"), lit(nKeys.toLong)).as("k1"), col("id").as("av"),
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string"))).as("pad"))
      .write.mode("overwrite").parquet(s"$dir/a.parquet")
    spark.range(rows.toLong)
      .select(pmod(col("id"), lit(nKeys.toLong)).as("k1"),
        col("id").as("k2"), (col("id") * 2).as("bv"))
      .write.mode("overwrite").parquet(s"$dir/b.parquet")
    spark.range(1000L)
      .select(col("id").as("k2"), (col("id") * 3).as("cv"))
      .write.mode("overwrite").parquet(s"$dir/c.parquet")

    def a: DataFrame = spark.read.parquet(s"$dir/a.parquet")
    def b: DataFrame = spark.read.parquet(s"$dir/b.parquet")
    def c: DataFrame = spark.read.parquet(s"$dir/c.parquet")

    // differential: both orders agree (on a 1000-row slice of the output)
    val (label0, planned0) = SketchPlanner.planThreeWay(a, b, c, "k1", "k2")
    require(label0.startsWith("bc_first"), s"unexpected decision $label0")
    val g = planned0.agg(count(lit(1)), sum(col("av")), sum(col("cv"))).collect()(0)
    val w = SketchPlanner.threeWayWorstFirst(a, b, c, "k1", "k2")
      .agg(count(lit(1)), sum(col("av")), sum(col("cv"))).collect()(0)
    require(g == w, s"arm mismatch: $g vs $w")

    def time(run: () => Unit): Double = {
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val results = (1 to reps).map { i =>
      var decision = ""
      val plan = time(() =>
        decision = SketchPlanner.decideThreeWay(a, b, c, "k1", "k2"))
      def goodArm() = time(() =>
        sink(SketchPlanner.buildThreeWay(a, b, c, "k1", "k2", decision)))
      def badArm() = time(() =>
        sink(SketchPlanner.buildThreeWay(a, b, c, "k1", "k2",
          SketchPlanner.invertDecision(decision))))
      val (good, bad) =
        if (i % 2 == 0) { val x = badArm(); (goodArm(), x) }
        else { val x = goodArm(); (x, badArm()) }
      println(f"[plan-ab] rep $i: plan $plan%.3f s, good-order $good%.3f s, bad-order $bad%.3f s")
      (plan, good, bad)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[plan-ab] rows=$rows MEDIAN plan ${med(results.map(_._1))}%.3f s, " +
      f"good-order ${med(results.map(_._2))}%.3f s, " +
      f"bad-order ${med(results.map(_._3))}%.3f s")
    spark.stop()
  }
}
