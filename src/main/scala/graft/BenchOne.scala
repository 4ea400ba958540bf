package graft

/** Repeat-bench a single registered query in one warm JVM:
  * `runMain graft.BenchOne <queryName> [sfDir] [reps]`. Separates plan
  * cost from JVM/codegen warmup — Bench times each query once, so a
  * query's number can move between rounds just from where it lands in
  * the (alphabetical) run order; this prints every rep so warm steady
  * state is visible.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    // "cold": clear the cache before every rep, so operators that persist
    // intermediates pay their cache build each time (matches graft.Bench).
    val cold = args.length > 3 && args(3) == "cold"
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = GraftSession.getOrCreate("graft-bench-one")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val times = (1 to reps).map { i =>
      if (cold) spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // noop sink, matching graft.Bench: full materialization + SQL
      // execution events (observe metrics / cap listener fire)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bench-one] $name rep $i: $sec%.3f s")
      sec
    }
    val sorted = times.sorted
    // true median (mean of the middle pair for even rep counts) — same
    // definition graft.Bench reports
    val median = if (reps % 2 == 1) sorted(reps / 2)
                 else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2
    println(f"[bench-one] $name min=${times.min}%.3f median=$median%.3f max=${times.max}%.3f over $reps reps")
    spark.stop()
  }
}
