package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.DecimalType

import graft.{Slow, SparkSpec}
import graft.operators.{Analytics, Tables}

/** Streaming↔batch differentials driven by the REAL testdata parquet
  * (sf0.1 events — 100k rows, the driver's bench SF), not hand-rolled
  * fixtures: the two newest streaming operators (windowed HLL,
  * rapid-fire transformWithState) must produce batch-identical results
  * when the actual event table is replayed as a stream in
  * watermark-ordered chunks with shuffled in-chunk arrival — the
  * Kafka-partition delivery model at data shape, where skewed users,
  * duplicate timestamps and real value distributions live.
  * (Round-9 verdict task 6; mirrors HeavyHittersStreamSpec's
  * shard-differential discipline.) */
class ParquetStreamDiffSpec extends SparkSpec {
  import spark.implicits._

  private val d = sf("sf0.1")

  /** ts-sorted chunks (so nothing falls behind the watermark), each
    * chunk internally shuffled (arrival order within a micro-batch is
    * not part of any contract). */
  private def chunks[T](rows: Seq[T], n: Int, seed: Int): Seq[Seq[T]] = {
    val rnd = new scala.util.Random(seed)
    val size = math.max(1, (rows.size + n - 1) / n)
    rows.grouped(size).map(c => rnd.shuffle(c)).toSeq
  }

  test("windowed streaming HLL over sf0.1 events equals the batch sketch", Slow) {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, d)
      .select(col("ts"), col("user_id"))
      .as[(Timestamp, Long)].collect().toSeq
      .sortBy(_._1.getTime)
    val batch = EventStreams.hourlyHll(
        rows.toDF("ts", "user_id"))
      .as[(Timestamp, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    val mem = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.hourlyHll(mem.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("whll_pq_out")
      .outputMode(OutputMode.Append).start()
    try {
      chunks(rows, 6, seed = 101).foreach { c =>
        mem.addData(c: _*); q.processAllAvailable()
      }
      // sentinel far past max ts closes every real window (its own
      // window stays open and never emits)
      val sentinel = new Timestamp(rows.last._1.getTime + 30L * 86400000L)
      mem.addData((sentinel, -1L))
      q.processAllAvailable()
      val streamed = spark.table("whll_pq_out")
        .as[(Timestamp, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed === batch)
      assert(batch.nonEmpty, "sf0.1 events must populate hourly sketches")
    } finally q.stop()
  }

  test("streaming rapid-fire over sf0.1 events equals batch q167", Slow) {
    import RapidFireStream.{Flag, Purchase}
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    val want = Analytics.q167RapidFire(spark, d).as[Flag].collect().toSet
    val purchases = Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts"),
        col("event_id"),
        (col("value").cast(DecimalType(38, 4)) * 10000).cast("long").as("v4"))
      .as[Purchase].collect().toSeq
      .sortBy(p => (p.ts, p.event_id))

    val mem = MemoryStream[Purchase]
    val q = RapidFireStream.flags(mem.toDS())
      .writeStream.format("memory").queryName("rapid_pq_out")
      .outputMode(OutputMode.Append).start()
    try {
      chunks(purchases, 8, seed = 202).foreach { c =>
        mem.addData(c: _*); q.processAllAvailable()
      }
      val got = spark.table("rapid_pq_out").as[Flag].collect().toSet
      assert(got === want)
      assert(want.nonEmpty, "sf0.1 purchases must trip the velocity screen")
    } finally {
      q.stop()
      oldProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
  }
}
