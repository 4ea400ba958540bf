package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Analytics

class StreamingRapidFireSpec extends SparkSpec {
  import spark.implicits._
  import RapidFireStream.{Flag, Purchase}

  test("streaming rapid-fire equals batch q167 under chunked, in-batch-shuffled arrival") {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(59)
    // 20 users × ~15 purchases over ~50 hours: plenty of sub-hour pairs
    val minNs = 60L * 1000000000L
    val evRows = (1 to 300).map { i =>
      val u = rnd.nextInt(20).toLong
      (i.toLong, rnd.nextInt(3000).toLong * minNs + i, u, "purchase",
        rnd.nextInt(10000) / 100.0, "")
    }
    val dir = java.nio.file.Files.createTempDirectory("rapidstream").toString
    evRows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val want = Analytics.q167RapidFire(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => Flag(r._1, r._2, r._3, r._4, r._5, r._6)).toSet

    // stream side: same rows as Purchase (ts in micros, exact v4)
    val purchases = evRows.map { case (id, tsNs, u, _, v, _) =>
      Purchase(u, tsNs / 1000L, id,
        (BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          * 10000).toLongExact)
    }
    val batches = purchases.sortBy(p => (p.ts, p.event_id)).grouped(75)
      .map(b => rnd.shuffle(b)).toSeq
    val mem = MemoryStream[Purchase]
    val q = RapidFireStream.flags(mem.toDS())
      .writeStream.format("memory").queryName("rapid_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      val got = spark.table("rapid_out").as[Flag].collect().toSet
      assert(got === want)
      assert(want.nonEmpty, "fixture must exercise the flag path")
    } finally {
      q.stop()
      oldProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
  }
}
