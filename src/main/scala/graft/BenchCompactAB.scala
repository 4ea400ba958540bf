package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Storage, Tables}

/** A/B: what does [[Storage.optimizeCompact]] buy at probe time?
  *
  * Layout A (fragmented): lineitem's (l_extendedprice, l_returnflag)
  * as ONE clustered write plus THREE `numZonemapAppend` commits split
  * by quantity — each commit re-clusters only its own slice, so the
  * layout holds four parallel copies of the price grid (64 files) and
  * any price-window probe pays its surviving range in all four
  * commits. Layout B: the identical history, then
  * `optimizeCompact(..., 16)` — same rows, one merged grid.
  *
  * The probe is a 10k-wide price window + aggregate, run through the
  * AUTOMATIC pruning rule (plain read.filter with the flag on) so the
  * timer pays what production pays: manifest read + survivor pruning +
  * the scan. Identical outputs asserted before timing; arms
  * counterbalanced across reps (the BenchCacheAB convention); medians
  * and per-arm surviving-file counts printed for BASELINE.md. */
object BenchCompactAB {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 7
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-compact-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice"), col("l_returnflag"), col("l_quantity"))
    def fragmented(dir: String): Unit = {
      Storage.numZonemapClusteredWrite(li.filter(col("l_quantity") <= 10),
        "l_extendedprice", 16, dir)
      Seq(col("l_quantity") > 10 && col("l_quantity") <= 25,
          col("l_quantity") > 25 && col("l_quantity") <= 40,
          col("l_quantity") > 40).foreach { slice =>
        Storage.numZonemapAppend(li.filter(slice), "l_extendedprice", 16, dir)
      }
    }
    val fdir = java.nio.file.Files.createTempDirectory("cab-f").toString + "/li"
    fragmented(fdir)
    val cdir = java.nio.file.Files.createTempDirectory("cab-c").toString + "/li"
    fragmented(cdir)
    Storage.optimizeCompact(spark, cdir, "l_extendedprice", 16)

    def probeDf(dir: String, lo: Double): DataFrame =
      spark.read.parquet(dir)
        .filter(col("l_extendedprice") >= lo &&
          col("l_extendedprice") <= lo + 10000.0)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("s"))

    spark.conf.set(graft.plans.ZonemapPruneRule.FLAG, "true")
    // identical outputs before timing
    val a0 = probeDf(fdir, 20000.0).collect().sortBy(_.getString(0)).toSeq
    val b0 = probeDf(cdir, 20000.0).collect().sortBy(_.getString(0)).toSeq
    require(a0 == b0, "arms disagree — compaction changed results")
    // per-arm survivor counts for the reported window
    def survivors(dir: String, lo: Double): Int = {
      val man = Storage.readNumManifest(spark, dir).get
      Storage.survivorsFromColumnSets(Seq.empty, Seq.empty,
        Seq((man, Seq((Some(BigDecimal(lo)), Some(BigDecimal(lo + 10000.0)))))))
        .get._1.size
    }
    println(s"[compact-ab] window 20000..30000: fragmented opens " +
      s"${survivors(fdir, 20000.0)}/64 files, compacted ${survivors(cdir, 20000.0)}/16")

    def timeProbe(dir: String, lo: Double): Double = {
      val t0 = System.nanoTime()
      probeDf(dir, lo).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val fs = collection.mutable.ArrayBuffer[Double]()
    val cs = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to reps) {
      val lo = 2000.0 + (i * 9000.0) % 70000.0
      if (i % 2 == 1) { fs += timeProbe(fdir, lo); cs += timeProbe(cdir, lo) }
      else { cs += timeProbe(cdir, lo); fs += timeProbe(fdir, lo) }
      println(f"[compact-ab] rep $i: fragmented=${fs.last}%.3f s compacted=${cs.last}%.3f s")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[compact-ab] medians over $reps reps: " +
      f"fragmented=${med(fs.toSeq)}%.3f s compacted=${med(cs.toSeq)}%.3f s")
    spark.stop()
  }
}
