package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B: the round-11 two-phase domain cap (q176 — over-cap sources only
  * enter a rank-FILTERED window that plans as WindowGroupLimit
  * Partial→Final) vs the round-10 single-window rollup (every row ranked,
  * full per-source sort) on a DELIBERATELY skewed corpus: one mega-domain
  * holding ~95% of rows plus a long tail of tiny sources — the shape the
  * round-10 docstring flagged as its own weakness. `runMain
  * graft.BenchSkewAB [rows] [reps]`. Arms alternate within and across
  * reps (the BenchCacheAB counterbalancing); identical outputs asserted
  * before timing. Medians recorded in BASELINE.md §DomainCapSkew. */
object BenchSkewAB {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 3000000
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.getOrCreate("graft-skew-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // ~95% of docs in source "mega", the rest across 200 tail sources
    // (tails of ~0.025% each — most land under the cap of 15 only when
    // rows is small; either way "mega" dominates every partition-skew
    // property this A/B probes). Deterministic: pure functions of id.
    val dir = java.nio.file.Files.createTempDirectory("skewab").toString
    spark.range(rows.toLong).select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(100)) < 95, lit("mega"))
          .otherwise(concat(lit("tail_"), pmod(col("id"), lit(200))))
          .as("source"),
        (pmod(col("id") * 2654435761L, lit(9000)) + 100).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))

    val cap = 15

    // round-11 registered formulation (re-stated over the scratch table)
    def twoPhase(): DataFrame = {
      val per = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(col("n_chars").cast("long")).as("total_chars"))
        .localCheckpoint()
      val small = per.filter(col("n_total") <= cap)
        .select(col("source"), col("n_total"),
          col("n_total").as("n_kept"), col("total_chars").as("kept_chars"))
      val bigSrc = per.filter(col("n_total") > cap)
        .select(col("source"), col("n_total"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("h"), col("doc_id"))
      val kept = docs
        .join(broadcast(bigSrc.select(col("source"))), Seq("source"))
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= cap)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars").cast("long")).as("kept_chars"))
      bigSrc.join(kept, Seq("source"))
        .select(col("source"), col("n_total"), col("n_kept"),
          col("kept_chars"))
        .unionByName(small)
    }

    // round-10 formulation: rank EVERY row (r feeds the rollup, so the
    // RankLimit rewrite cannot fire and the mega-domain fully sorts in
    // one window partition)
    def oneWindow(): DataFrame = {
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      docs.withColumn("r", row_number().over(w))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("r") <= cap, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("r") <= cap, col("n_chars").cast("long"))
            .otherwise(0L)).as("kept_chars"))
    }

    // The timer starts BEFORE the DataFrame is constructed: twoPhase()'s
    // eager localCheckpoint() materializes the per-source aggregation at
    // construction time, so timing a pre-built frame would exclude that
    // whole scan+shuffle from the two-phase arm while the one-window arm
    // pays everything inside the timer (round-11 advisory).
    def time(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val a = twoPhase().collect().map(_.mkString("|")).sorted
    val b = oneWindow().collect().map(_.mkString("|")).sorted
    require(a.sameElements(b), s"arm mismatch: ${a.length} vs ${b.length} rows")

    val (tps, ows) = (1 to reps).map { i =>
      if (i % 2 == 0) { val o = time(() => oneWindow()); (time(() => twoPhase()), o) }
      else { val t = time(() => twoPhase()); (t, time(() => oneWindow())) }
    }.unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    (tps zip ows).zipWithIndex.foreach { case ((t, o), i) =>
      println(f"[skew-ab] rep ${i + 1}: two-phase $t%.3f s, one-window $o%.3f s")
    }
    println(f"[skew-ab] rows=$rows MEDIAN two-phase ${med(tps)}%.3f s, " +
      f"one-window ${med(ows)}%.3f s")
    spark.stop()
  }
}
