package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B: the [[graft.plans.GroupTopK]] bounded-heap operator vs the window
  * `row_number` plan it replaces, on the largest local table (lineitem,
  * top 10 rows per supplier by price). `runMain graft.BenchTopKAB [sfDir]
  * [reps]`. Arms alternate within AND across reps (the BenchCacheAB
  * counterbalancing), and the window arm runs with the rewrite rule
  * removed from the session so it really executes WindowExec over a full
  * per-partition sort. Median per arm printed last; numbers recorded in
  * BASELINE.md §GroupTopK. */
object BenchTopKAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.getOrCreate("graft-topk-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def li: DataFrame = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))

    def operatorArm(): DataFrame =
      graft.plans.GroupTopKExtension.topKPerGroup(li, Seq("l_suppkey"),
        Seq(("l_extendedprice", false), ("l_orderkey", true),
          ("l_linenumber", true)), 10)

    def windowArm(): DataFrame = {
      // remove the rewrite so this arm measures the stock plan
      val e = spark.experimental
      e.extraOptimizations =
        e.extraOptimizations.filterNot(_ == graft.plans.RewriteWindowTopK)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
      li.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 10).drop("__rn")
    }

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // sanity: identical result sets before timing
    val a = operatorArm().collect().map(_.mkString("|")).sorted
    val b = windowArm().collect().map(_.mkString("|")).sorted
    require(a.sameElements(b), s"arm mismatch: ${a.length} vs ${b.length} rows")
    graft.plans.GroupTopKExtension.install(spark)

    val (ops, wins) = (1 to reps).map { i =>
      val (o, w) = if (i % 2 == 0) {
        val w0 = time(windowArm()); graft.plans.GroupTopKExtension.install(spark)
        val o0 = time(operatorArm()); (o0, w0)
      } else {
        val o0 = time(operatorArm())
        val w0 = time(windowArm()); graft.plans.GroupTopKExtension.install(spark)
        (o0, w0)
      }
      println(f"[topk-ab] rep $i: operator=$o%.3f s window=$w%.3f s")
      (o, w)
    }.unzip
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    println(f"[topk-ab] rows=${a.length} median operator=${median(ops)}%.3f s " +
      f"window=${median(wins)}%.3f s speedup=${median(wins) / median(ops)}%.2fx")
    spark.stop()
  }
}
