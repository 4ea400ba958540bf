package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Storage, Tables}

/** A/B: selective scans over a Z-ORDERED vs a LINEARLY-sorted parquet
  * layout of the same rows (lineitem at the given SF, 64 files each,
  * layout keys (l_partkey, l_suppkey) vs l_partkey only).
  *
  * The probe is a narrow l_suppkey range + aggregate — the access
  * pattern the linear layout cannot serve (suppkey scatters across
  * every partkey-sorted file, so parquet min/max skips nothing), while
  * the z-order layout keeps each suppkey range in a small file/row-
  * group neighborhood. Arms are counterbalanced across reps (the
  * BenchCacheAB convention); medians printed for BASELINE.md.
  */
object BenchZorderAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 7
    val spark = GraftSession.getOrCreate("graft-zorder-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val zdir = Files.createTempDirectory("zab-z").toString
    Storage.zorderWrite(li, "l_partkey", "l_suppkey", 1024, 64, zdir)
    val ldir = Files.createTempDirectory("zab-l").toString
    li.repartitionByRange(64, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(ldir)

    val bounds = li.agg(min("l_suppkey"), max("l_suppkey")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo + 1) / 50) // ~2% selectivity

    def probe(dir: String, s0: Long): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(dir)
        .where(col("l_suppkey") >= s0 && col("l_suppkey") < s0 + width)
        .agg(count(lit(1)), sum(col("l_extendedprice")))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }

    val zs = collection.mutable.ArrayBuffer[Double]()
    val ls = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to reps) {
      val s0 = lo + (i * 7L * width) % math.max(1L, hi - lo - width)
      if (i % 2 == 1) { zs += probe(zdir, s0); ls += probe(ldir, s0) }
      else { ls += probe(ldir, s0); zs += probe(zdir, s0) }
      println(f"[zorder-ab] rep $i: zorder=${zs.last}%.3f s linear=${ls.last}%.3f s")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[zorder-ab] medians over $reps reps: " +
      f"zorder=${med(zs.toSeq)}%.3f s linear=${med(ls.toSeq)}%.3f s")
    spark.stop()
  }
}
