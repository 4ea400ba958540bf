package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Tables}

/** A/B: the q119 OHLC aggregation with its shipped STRUCT min_by/max_by
  * ordering key (plans as SortAggregate — a struct aggregation buffer
  * isn't hash-mutable) vs a DECIMAL(38,0)-packed scalar key
  * (micros·10¹⁹ + event_id, order-identical for nonnegative ids) that
  * keeps the buffer hash-aggregable.
  *
  * Measured verdict (sf0.1, medians of 7 counterbalanced reps):
  * struct/sortagg 0.373 s, packed/hashagg 0.528 s — the per-row wide-
  * decimal arithmetic costs MORE than the per-partition sort, whose
  * per-task cost is bounded at any corpus size by partition sizing. So
  * the struct form ships; this harness keeps the decision re-checkable.
  */
object BenchOhlcAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 7
    val spark = GraftSession.getOrCreate("graft-ohlc-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val ev = Tables.events(spark, sfDir)

    def structArm(): DataFrame = Analytics.q119OhlcBars(spark, sfDir)

    val packedOrd =
      expr("cast(unix_micros(ts) as decimal(18,0))") *
        lit(new java.math.BigDecimal("10000000000000000000")) +
        expr("cast(event_id as decimal(19,0))")

    def packedArm(): DataFrame =
      ev.select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr"),
        col("ts"), col("event_id"), col("value"))
        .groupBy(col("event_type"), col("hr"))
        .agg(
          min_by(col("value"), packedOrd).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), packedOrd).as("close"),
          count(lit(1)).as("volume"),
          sum(col("value").cast("decimal(38,10)")).as("turnover"))

    // one-time result-equality check, then timing only
    val a = structArm().collect().map(_.toString).sorted
    val b = packedArm().collect().map(_.toString).sorted
    require(a.sameElements(b), "arms disagree — packed key is not order-exact")

    def time(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val ss = collection.mutable.ArrayBuffer[Double]()
    val ps = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to reps) {
      if (i % 2 == 1) { ss += time(structArm _); ps += time(packedArm _) }
      else { ps += time(packedArm _); ss += time(structArm _) }
      println(f"[ohlc-ab] rep $i: struct/sortagg=${ss.last}%.3f s packed/hashagg=${ps.last}%.3f s")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[ohlc-ab] medians over $reps reps: " +
      f"struct/sortagg=${med(ss.toSeq)}%.3f s packed/hashagg=${med(ps.toSeq)}%.3f s")
    spark.stop()
  }
}
