package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B for the r18 order-statistics rewrites (guide §2.5 single-giant-key
  * windows, §4 interpreted-aggregate cost):
  *
  *   - q108_robust_stats: row_number windows partitioned by l_returnflag
  *     (3 groups → 3 sort tasks at ANY core count) vs the counts-frame
  *     rank pick shipped in Relational.q108RobustStats.
  *   - q32_percentiles: percentile() fed every fact row (interpreted
  *     TypedImperativeAggregate) vs percentile(v, p, c) over the
  *     codegen'd per-(group, value) counts frame.
  *
  * Alternates OLD/NEW reps in one warm JVM (cache cleared per rep) and
  * asserts the two forms return EQUAL row sets before timing is trusted.
  * usage: runMain graft.BenchMedianAB [sfDir] [repsPerArm]
  */
object BenchMedianAB {

  // The pre-r18 forms, verbatim (from Relational.scala @ c0a6f7d).
  private def q108Old(s: SparkSession, d: String): DataFrame = {
    val li = graft.operators.Tables.lineitem(s, d)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
    def lowerMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("g"))
      df.withColumn("rk", row_number().over(w.orderBy(col(v))))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("rk") === expr("(n + 1) div 2"))
        .select(col("g"), col("n"), col(v).as(out))
    }
    val med = lowerMedian(li, "x", "med")
    val dev = li.join(broadcast(med.drop("n")), Seq("g"))
      .select(col("g"), abs(col("x") - col("med")).as("dv"))
    lowerMedian(dev, "dv", "mad").drop("n")
      .join(broadcast(med), Seq("g"))
      .select(col("g").as("l_returnflag"), col("n"), col("med"), col("mad"))
  }

  private def q32Old(s: SparkSession, d: String): DataFrame =
    graft.operators.Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_extendedprice, 0.5)").as("p50_price"))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.getOrCreate("median-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val arms: Seq[(String, (SparkSession, String) => DataFrame,
        (SparkSession, String) => DataFrame)] = Seq(
      ("q108_robust_stats", q108Old _,
        SparkEntry.queries("q108_robust_stats")),
      ("q32_percentiles", q32Old _,
        SparkEntry.queries("q32_percentiles")))

    arms.foreach { case (name, oldFn, newFn) =>
      // result identity first — sorted collected rows must match exactly
      val oldRows = oldFn(spark, sfDir).collect().map(_.toString).sorted
      val newRows = newFn(spark, sfDir).collect().map(_.toString).sorted
      require(oldRows.sameElements(newRows),
        s"$name old/new rows differ:\nold=${oldRows.mkString("; ")}\nnew=${newRows.mkString("; ")}")
      println(s"[median-ab] $name rows identical (${oldRows.length})")

      def run(fn: (SparkSession, String) => DataFrame): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val olds = collection.mutable.ArrayBuffer.empty[Double]
      val news = collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { i =>
        val o = run(oldFn); olds += o
        val n = run(newFn); news += n
        println(f"[median-ab] $name rep $i old=$o%.3f new=$n%.3f")
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[median-ab] $name $sfDir medians: old=${med(olds.toSeq)}%.3f " +
        f"new=${med(news.toSeq)}%.3f")
    }
    spark.stop()
  }
}
