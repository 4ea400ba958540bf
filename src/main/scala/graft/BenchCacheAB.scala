package graft

/** A/B measurement of the CROSS-QUERY dedup cache
  * (`spark.graft.dedup.cache` — see operators.Dedup.maybeCache): runs the
  * curation bundle q20+q21+q22+q45 as ONE session pass (the flag's stated
  * payoff is sharing gram/signature rows ACROSS queries; within one query
  * AQE ReuseExchange already dedups, and the cache was measured a loss
  * there). The within-rep arm order is COUNTERBALANCED (OFF→ON on even
  * reps, ON→OFF on odd) so monotone warm-up — page cache, JIT — and VM
  * drift hit both arms equally; reports per-arm medians of the bundle
  * wall time.
  *
  * `runMain graft.BenchCacheAB [sfDir] [reps]` — results recorded in
  * BASELINE.md.
  */
object BenchCacheAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val bundle = Seq("q20_exact_dedup", "q21_minhash_neardup",
      "q22_ngram_jaccard", "q45_contamination")
    val fns = bundle.map(n => n -> SparkEntry.queries(n))
    val spark = GraftSession.getOrCreate("graft-bench-cache-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def runBundle(cache: Boolean): Double = {
      spark.catalog.clearCache()
      spark.conf.set("spark.graft.dedup.cache", cache.toString)
      val t0 = System.nanoTime()
      fns.foreach { case (_, fn) =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }

    val (off, on) = (1 to reps).map { i =>
      val (o, c) = if (i % 2 == 0) {
        val o0 = runBundle(cache = false); val c0 = runBundle(cache = true)
        (o0, c0)
      } else {
        val c0 = runBundle(cache = true); val o0 = runBundle(cache = false)
        (o0, c0)
      }
      println(f"[cache-ab] rep $i: off=$o%.2f s on=$c%.2f s")
      (o, c)
    }.unzip
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    println(f"[cache-ab] bundle q20+q21+q22+q45 at $sfDir over $reps reps: " +
      f"off median=${median(off)}%.2f s, on median=${median(on)}%.2f s")
    spark.stop()
  }
}
