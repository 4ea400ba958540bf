package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B: the round-11 prefix-filtered containment join (q121's registered
  * form) vs the round-10 inverted-index baseline, on the sf1-equivalent
  * corpus the ScaleSweep generates (50k docs, 10-way duplicate texts —
  * the exact shape that exposed the baseline's |df|² candidate blow-up
  * at 73 s). `runMain graft.BenchContainAB [docsDir] [reps]`. Arms
  * alternate (BenchCacheAB counterbalancing); identical directed pairs
  * asserted once before timing. Medians recorded in BASELINE.md
  * §ContainmentPrefix. */
object BenchContainAB {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.getOrCreate("graft-contain-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def prefixArm(): DataFrame =
      graft.operators.Dedup.containmentArms(docs, 1000, 0.8)._1

    def invertedArm(): DataFrame =
      graft.operators.Dedup.containmentArms(docs, 1000, 0.8)._2

    def time(df: DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // equality once (count-level on the big corpus; full-pair equality
    // is DedupSpec's job at test scale)
    val np = prefixArm().count()
    val ni = invertedArm().count()
    require(np == ni, s"arm mismatch: $np vs $ni pairs")
    println(s"[contain-ab] $np directed pairs from both arms")

    val (ps, is) = (1 to reps).map { i =>
      if (i % 2 == 0) { val inv = time(invertedArm()); (time(prefixArm()), inv) }
      else { val p = time(prefixArm()); (p, time(invertedArm())) }
    }.unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    (ps zip is).zipWithIndex.foreach { case ((p, iv), k) =>
      println(f"[contain-ab] rep ${k + 1}: prefix $p%.2f s, inverted $iv%.2f s")
    }
    println(f"[contain-ab] MEDIAN prefix ${med(ps)}%.2f s, " +
      f"inverted ${med(is)}%.2f s")
    spark.stop()
  }
}
