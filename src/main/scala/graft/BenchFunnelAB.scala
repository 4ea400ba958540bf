package graft

/** A/B: q222's `spark.graft.funnel.cache` knob (r18, VERDICT item 4) —
  * alternating OFF/ON reps in one warm JVM, cache cleared and the
  * persisted token frame dropped between reps so each rep pays its own
  * materialization. usage: runMain graft.BenchFunnelAB [sfDir] [repsPerArm] */
object BenchFunnelAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.getOrCreate("funnel-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries("q222_curation_funnel")
    def run(on: Boolean): Double = {
      spark.catalog.clearCache()
      spark.conf.set("spark.graft.funnel.cache", on.toString)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val offs = collection.mutable.ArrayBuffer.empty[Double]
    val ons = collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { i =>
      val off = run(on = false); offs += off
      val on = run(on = true); ons += on
      println(f"[funnel-ab] rep $i off=$off%.3f on=$on%.3f")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[funnel-ab] $sfDir medians: off=${med(offs.toSeq)}%.3f on=${med(ons.toSeq)}%.3f")
    spark.conf.unset("spark.graft.funnel.cache")
    spark.stop()
  }
}
