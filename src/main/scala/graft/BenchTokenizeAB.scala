package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B: the native single-pass `alpha_tokens` kernel vs the regex
  * tokenize pipeline it replaces (`split(regexp_replace(lower, strip),
  * "[^a-z]+")`) — the expression under every text operator's first
  * stage. Arms run the same downstream shape (explode → hash-agg count
  * by token → 1-row fold) so the measured delta is the tokenizer.
  * Identical aggregate outputs asserted before timing.
  *
  * `runMain graft.BenchTokenizeAB [reps]`; SPARK_GRAFT_SF_DIR picks the
  * corpus. Medians recorded in BASELINE.md §TokenizeAB. */
object BenchTokenizeAB {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 7
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-tok-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = graft.operators.Tables.documents(spark, sfDir)
      .select(col("text")).localCheckpoint()

    def downstream(toks: String): DataFrame =
      docs.selectExpr(s"explode($toks) AS w").where(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)), sum(col("n")), sum(length(col("w")) * col("n")))
    def native() = downstream("alpha_tokens(text)")
    def regex() = downstream(
      "split(regexp_replace(lower(text), '(^[^a-z]+)|([^a-z]+$)', ''), '[^a-z]+')")

    require(native().collect()(0) == regex().collect()(0), "arm mismatch")
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime(); df.collect(); (System.nanoTime() - t0) / 1e9
    }
    val results = (1 to reps).map { i =>
      val (a, b) =
        if (i % 2 == 0) { val r = time(regex()); (time(native()), r) }
        else { val n = time(native()); (n, time(regex())) }
      println(f"[tok-ab] rep $i: native $a%.3f s, regex $b%.3f s")
      (a, b)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[tok-ab] sf=$sfDir MEDIAN native ${med(results.map(_._1))}%.3f s, " +
      f"regex ${med(results.map(_._2))}%.3f s")
    spark.stop()
  }
}
