package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp((1000 + min) * 60000L)

  test("streaming exact dedup drops duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.streamingExactDedup(df, "1 hour")
      .select("doc_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts(0), "alpha bravo"), (2L, ts(1), "charlie delta"))
      q.processAllAvailable()
      // batch 2: doc 3 duplicates doc 1 (normalization collapses case/
      // whitespace); doc 4 is new
      mem.addData((3L, ts(2), "  ALPHA   bravo "), (4L, ts(3), "echo foxtrot"))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").as[Long].collect().toSet
      assert(kept === Set(1L, 2L, 4L))
    } finally q.stop()
  }
}
