package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import TimeoutStream.{Abandoned, Ev}

/** Event-time-timer timeout detection vs the q188 outer-join contract:
  * a click with no same-user purchase in [cts, cts + 1h) is emitted as
  * abandoned once the watermark passes its deadline — and only then. */
class StreamingTimeoutSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp((1000 + min) * 60000L)

  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  test("timer-emitted abandoned clicks equal the batch no-purchase-in-window set") {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, Rocks)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = TimeoutStream.abandoned(mem.toDS(), 3600000000L, "10 minutes")
      .writeStream.format("memory").queryName("timeout_out")
      .outputMode(OutputMode.Append).start()
    // u1's click converts in-batch+cross-batch; u2's click never
    // converts (the abandoned one); u5's click converts CROSS-BATCH
    // just before its deadline — the pending ListState must carry it
    // over; trailing clicks only advance the watermark
    val batches = Seq(
      Seq(Ev(1, ts(0), 1, "click"), Ev(2, ts(1), 2, "click")),
      Seq(Ev(3, ts(30), 1, "purchase"), Ev(4, ts(300), 5, "click")),
      Seq(Ev(5, ts(310), 5, "purchase")),                 // converts 4
      Seq(Ev(6, ts(500), 6, "click")),                    // wm → t490
      Seq(Ev(7, ts(600), 7, "click")))                    // wm → t590: a NO-DATA
    // micro-batch (noDataMicroBatches, on by default) fires timers the
    // final watermark covers — so click 6 (deadline t560) is abandoned
    // too; only click 7 is still in flight at the end
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("timeout_out").as[Abandoned].collect()
        .map(_.click_id).toSet
      // batch differential (the q188 LEFT JOIN semantics), restricted
      // to clicks whose deadline the final watermark (t600 - 10min =
      // t590) has passed — clicks 6 and 7 are still in flight
      val rows = batches.flatten.toDS()
      val clicks = rows.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("cts"))
      val purchases = rows.filter($"event_type" === "purchase")
        .select($"user_id".as("pu"), $"ts".as("pts"))
      val unconverted = clicks
        .join(purchases, $"user_id" === $"pu" && $"pts" >= $"cts" &&
          $"pts" < $"cts" + expr("INTERVAL 1 HOUR"), "left")
        .filter($"pts".isNull)
        .filter($"cts" + expr("INTERVAL 1 HOUR") <= lit(ts(590)))
        .select($"click_id").as[Long].collect().toSet
      assert(streamed === unconverted)
      assert(streamed === Set(2L, 6L))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
    }
  }
}
