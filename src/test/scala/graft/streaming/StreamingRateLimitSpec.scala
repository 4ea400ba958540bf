package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import RateLimitStream.Ev

/** transformWithState rate limiter vs the batch window-rank form.
  * transformWithState requires the RocksDB state store provider; the
  * spec opts in per-test and restores the session default after. */
class StreamingRateLimitSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp((1000 + min) * 60000L)

  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocks[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, Rocks)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  test("streaming admission equals batch window-rank admission; state carries across batches") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Ev]
      val q = RateLimitStream.throttled(mem.toDS(), 3, 600000000L)
        .select($"event_id")
        .writeStream.format("memory").queryName("rate_limit_out")
        .outputMode(OutputMode.Append).start()
      // base ts(0) = 16:40 → the 10-min buckets break at :40/:50/:00;
      // user 1 bursts 5 events in one bucket SPLIT ACROSS BATCHES (only
      // the admission state can link them), user 2 stays under the cap,
      // and a later bucket resets user 1's count
      val batches = Seq(
        Seq(Ev(1, ts(0), 1, "click"), Ev(2, ts(1), 1, "click"),
          Ev(3, ts(2), 2, "click")),
        Seq(Ev(4, ts(3), 1, "click"),   // 3rd in user1's bucket: admitted
          Ev(5, ts(4), 1, "click"),     // 4th: throttled
          Ev(6, ts(5), 1, "click"),     // 5th: throttled
          Ev(7, ts(6), 2, "click")),    // user2 2nd: admitted
        Seq(Ev(8, ts(11), 1, "click"),  // next bucket (16:50): reset
          Ev(9, ts(12), 1, "view")))    // different type: own key
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val streamed = spark.table("rate_limit_out").as[Long].collect().toSet
        val batch = RateLimitStream.rateLimitBatch(
            batches.flatten.toDF(), 3, 600000000L)
          .filter($"allowed").select($"event_id").as[Long].collect().toSet
        assert(streamed === batch)
        assert(streamed === Set(1L, 2L, 3L, 4L, 7L, 8L, 9L))
      } finally q.stop()
    }
  }

  test("within one micro-batch, admission is by (ts, event_id), not arrival order") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Ev]
      val q = RateLimitStream.throttled(mem.toDS(), 2, 600000000L)
        .select($"event_id")
        .writeStream.format("memory").queryName("rate_limit_order_out")
        .outputMode(OutputMode.Append).start()
      try {
        // shuffled arrival inside the batch: the EARLIEST two must win
        mem.addData(Ev(23, ts(3), 1, "click"), Ev(21, ts(1), 1, "click"),
          Ev(22, ts(2), 1, "click"), Ev(20, ts(0), 1, "click"))
        q.processAllAvailable()
        val streamed = spark.table("rate_limit_order_out").as[Long].collect().toSet
        assert(streamed === Set(20L, 21L))
      } finally q.stop()
    }
  }
}
