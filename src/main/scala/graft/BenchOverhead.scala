package graft

/** One-off probe: where does a cheap query's wall time go?
  * Times analysis/optimization/physical planning vs execution for a few
  * cheap registered queries, warm, plus extension-rule cost. */
object BenchOverhead {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("debug-overhead")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = Seq("q37_scalar_funcs", "q12_having", "q10_setops")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 4).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime() // build (incl. any eager work)
        df.queryExecution.optimizedPlan
        val t2 = System.nanoTime() // analyze+optimize
        df.queryExecution.executedPlan
        val t3 = System.nanoTime() // physical planning
        df.write.format("noop").mode("overwrite").save()
        val t4 = System.nanoTime() // execute (re-plans its own copy)
        println(f"[ovh] $n rep $i build=${(t1-t0)/1e6}%.1f opt=${(t2-t1)/1e6}%.1f phys=${(t3-t2)/1e6}%.1f exec=${(t4-t3)/1e6}%.1f ms")
      }
    }
    spark.stop()
  }
}
