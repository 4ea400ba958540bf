package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B: prefix-filtered Jaccard join vs q22's capped inverted index at
  * q22's low threshold (0.2), on the sf1 sweep corpus. Exploratory — at
  * t=0.2 the prefix covers 80% of each set, so the filter prunes far
  * less than at q121's t=0.8; this measures whether it still pays.
  * `runMain graft.BenchJaccardAB [docsDir] [reps]`. */
object BenchJaccardAB {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.getOrCreate("graft-jaccard-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def capped: DataFrame =
      graft.operators.Dedup.cappedGramItems(docs, 1000)

    def prefixArm(): DataFrame =
      graft.operators.Dedup.prefixJoinItems(capped, 0.2)
    def invertedArm(): DataFrame =
      graft.operators.Dedup.q22Shape(docs, 1000, 0.2)

    def time(df: DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val np = prefixArm().count(); val ni = invertedArm().count()
    require(np == ni, s"arm mismatch: $np vs $ni")
    println(s"[jaccard-ab] $np pairs from both arms")
    val (ps, is) = (1 to reps).map { i =>
      if (i % 2 == 0) { val inv = time(invertedArm()); (time(prefixArm()), inv) }
      else { val p = time(prefixArm()); (p, time(invertedArm())) }
    }.unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[jaccard-ab] MEDIAN prefix ${med(ps)}%.2f s, inverted ${med(is)}%.2f s " +
      f"(prefix reps ${ps.map(x => f"$x%.2f").mkString("/")}, " +
      f"inverted ${is.map(x => f"$x%.2f").mkString("/")})")
    spark.stop()
  }
}
