package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Analytics

class StreamingTransitionsSpec extends SparkSpec {
  import spark.implicits._
  import TransitionStream.{Ev, Trans}

  test("streaming transitions equal batch q104 under chunked, in-batch-shuffled arrival") {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(53)
    // synthetic history: 40 users × ~25 events, typed a..e
    val types = Array("a", "b", "c", "d", "e")
    val events = (1 to 1000).map { i =>
      Ev(rnd.nextInt(40).toLong, (i / 4).toLong, i.toLong,
        types(rnd.nextInt(types.length)))
    }
    // per-key ordered delivery across batches: chunk the (ts, event_id)
    // global order into 4 batches, then SHUFFLE within each batch —
    // the operator must restore the in-batch order itself
    val batches = events.sortBy(e => (e.ts, e.event_id)).grouped(250)
      .map(b => rnd.shuffle(b)).toSeq

    val mem = MemoryStream[Ev]
    val q = TransitionStream.transitions(mem.toDS())
      .writeStream.format("memory").queryName("trans_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      val got = spark.table("trans_out").as[Trans].collect()
        .groupBy(t => (t.from_type, t.to_type)).view.mapValues(_.length.toLong)
        .toMap
      val want = Analytics.eventTransitions(
          events.toDF())
        .as[(String, String, Long, Long)].collect()
        .map { case (f, t, c, _) => (f, t) -> c }.toMap
      assert(got === want)
      // cross-check the per-source totals the batch operator carries
      val fromTotals = got.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val batchTotals = Analytics.eventTransitions(
          events.toDF())
        .as[(String, String, Long, Long)].collect()
        .map { case (f, _, _, ft) => f -> ft }.toMap
      assert(fromTotals === batchTotals)
    } finally {
      q.stop()
      oldProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
  }
}
