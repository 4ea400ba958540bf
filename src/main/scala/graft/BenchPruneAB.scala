package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Storage, Tables}

/** A/B: what is the zone-map pruned read path (q216) worth at runtime?
  *
  * Layout: lineitem's (ship_date, l_quantity) as 64 date-clustered
  * parquet files (zonemapClusteredWrite — built once, untimed: layouts
  * amortize across queries, the q70 stance). Probe: the 1997-Q1 monthly
  * aggregate. Arms, each timed end to end per rep:
  *
  *   - pruned: [[Storage.prunedRead]] — 64 footer reads + the manifest
  *     filter (the PLAN cost, paid inside the timer) + a scan of only
  *     the surviving files
  *   - full:   the same filter + aggregate over all 64 files (parquet
  *     row-group stats still apply — this arm is Spark's own best
  *     unpruned effort, not a strawman)
  *
  * Identical outputs asserted before timing. `runMain graft.BenchPruneAB
  * [reps]`; SPARK_GRAFT_SF_DIR picks the scale (default sf0.1). Medians
  * recorded in BASELINE.md §ZonemapPruneAB. */
object BenchPruneAB {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-prune-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val dir = java.nio.file.Files.createTempDirectory("pruneab").toString + "/li"
    Storage.zonemapClusteredWrite(
      Tables.lineitem(spark, sfDir)
        .select(to_date(col("l_shipdate")).as("ship_date"), col("l_quantity")),
      "ship_date", 64, dir)

    def answer(df: DataFrame) =
      df.groupBy(month(col("ship_date")).as("mth"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("s"))
        .collect().sortBy(_.getInt(0)).toSeq

    def prunedArm() = {
      val (df, total, skipped) =
        Storage.prunedRead(spark, dir, "ship_date", "1997-01-01", "1997-03-31")
      (answer(df), total, skipped)
    }
    def fullArm() = answer(
      spark.read.parquet(dir).filter(col("ship_date")
        .between(lit("1997-01-01").cast("date"), lit("1997-03-31").cast("date"))))

    val (g0, total0, skipped0) = prunedArm()
    require(g0 == fullArm(), "arm mismatch")
    println(s"[prune-ab] layout: $total0 files, probe skips $skipped0")

    def time(run: () => Any): Double = {
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }
    val results = (1 to reps).map { i =>
      val (p, f) =
        if (i % 2 == 0) { val x = time(() => fullArm()); (time(() => prunedArm()), x) }
        else { val x = time(() => prunedArm()); (x, time(() => fullArm())) }
      println(f"[prune-ab] rep $i: pruned $p%.3f s, full-scan $f%.3f s")
      (p, f)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[prune-ab] sf=$sfDir MEDIAN pruned ${med(results.map(_._1))}%.3f s, " +
      f"full-scan ${med(results.map(_._2))}%.3f s")
    spark.stop()
  }
}
