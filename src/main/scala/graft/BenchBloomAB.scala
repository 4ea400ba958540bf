package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{BloomPrune, Tables}

/** A/B: explicit bloom pre-probe ([[BloomPrune.bloomPrefilter]]) ahead of
  * the exact semi join, vs the plain semi join alone — the q93 pattern,
  * measured. `runMain graft.BenchBloomAB [sfDir] [reps]`, arms
  * counterbalanced (the BenchCacheAB convention), medians printed last.
  *
  * Honesty note for the expected outcome at LOCAL scale: the benefit of
  * a bloom probe is shuffle-input reduction on a network; at sf0.1 in
  * one JVM with AQE broadcasting the dim, both arms execute a broadcast
  * join over one local scan, so the bloom arm pays its build+probe as
  * pure overhead. The measurement documents that trade honestly — the
  * operator's value case (multi-executor shuffle of a 100 TB fact
  * side) is stated in the BloomPrune scaladoc, and its correctness
  * properties are what the q93 gate and BloomPruneSpec pin. To expose
  * the mechanism rather than the broadcast shortcut, the join arm also
  * runs with broadcast disabled (shuffle join), reported separately.
  */
object BenchBloomAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.getOrCreate("graft-bloom-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def dim: DataFrame = Tables.part(spark, sfDir)
      .filter(col("p_size") < 5).select(col("p_partkey"))
    def fact: DataFrame = Tables.lineitem(spark, sfDir)

    def agg(df: DataFrame): DataFrame = {
      val dd = dim
      df.join(dd, df("l_partkey") === dd("p_partkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
    }
    def plainArm(): DataFrame = agg(fact)
    def bloomArm(): DataFrame =
      agg(BloomPrune.bloomPrefilter(fact, dim, "l_partkey", "p_partkey", 4096L))

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    require(plainArm().collect().map(_.mkString("|")).sorted.sameElements(
      bloomArm().collect().map(_.mkString("|")).sorted), "arm mismatch")

    def run(label: String): Unit = {
      val (bs, ps) = (1 to reps).map { i =>
        if (i % 2 == 0) { val p = time(plainArm()); val b = time(bloomArm()); (b, p) }
        else { val b = time(bloomArm()); val p = time(plainArm()); (b, p) }
      }.unzip
      println(f"[bloom-ab] $label plain=${med(ps)}%.3f s bloom=${med(bs)}%.3f s (reps=$reps)")
    }

    run("broadcast-allowed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try run("shuffle-join-forced")
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    spark.stop()
  }
}
