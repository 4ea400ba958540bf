package graft

import graft.operators.Graph

/** A/B: what is DOULION edge sampling (q246) worth at runtime?
  *
  * Arms, each timed end to end per rep (cold cache, the graft.Bench
  * convention):
  *
  *   - exact: the degree-oriented total over the full part co-purchase
  *     edge list ([[Graph.triangleTotalExact]] — the q105 pipeline
  *     minus the per-node rollup)
  *   - est:   the same pipeline over the md5-sampled quarter of the
  *     edges, scaled by 1/p³ ([[Graph.triangleTotalEstimate]] — what a
  *     production deployment runs instead of the exact count)
  *
  * Both arms pay the basket-pair edge BUILD inside the timer — the
  * build is shared work sampling cannot remove, so the end-to-end
  * speedup understates the wedge-stage speedup (~1/p² = 16×) by
  * design; the honest number is the end-to-end one. The two answers
  * and the relative error print with the timings. `runMain
  * graft.BenchTriangleAB [reps]`; SPARK_GRAFT_SF_DIR picks the scale
  * (default sf0.1). Medians recorded in BASELINE.md §TriangleAB. */
object BenchTriangleAB {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-triangle-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(arm: String, fn: () => Long): (Seq[Double], Long) = {
      var v = 0L
      val ts = (1 to reps).map { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        v = fn()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[triangle-ab] $arm rep $i: $sec%.3f s (value $v)")
        sec
      }
      (ts.sorted, v)
    }
    def median(ts: Seq[Double]): Double =
      if (ts.size % 2 == 1) ts(ts.size / 2)
      else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2

    val (exactTs, exact) = time("exact",
      () => Graph.triangleTotalExact(spark, sfDir).collect()(0).getLong(0))
    val (estTs, est) = time("est",
      () => Graph.triangleTotalEstimate(spark, sfDir).collect()(0).getLong(0))
    val relErr =
      if (exact == 0) Double.NaN else math.abs(est - exact).toDouble / exact
    println(f"[triangle-ab] === sf=$sfDir exact=$exact est=$est " +
      f"rel_err=$relErr%.4f | exact ${median(exactTs)}%.2f s vs " +
      f"est ${median(estTs)}%.2f s -> ${median(exactTs) / median(estTs)}%.1fx ===")
    spark.stop()
  }
}
