package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Analytics

class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._
  import CdcStream.Chg

  test("streaming latest-wins equals the batch fold under shuffled multi-batch arrival") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Chg]
    val q = CdcStream.latestWins(mem.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode(OutputMode.Update).start()
    try {
      // three batches, deliberately out of seq order: key 1's seq=5
      // arrives FIRST, so the later-arriving seq=3 must lose; key 2 is
      // updated then deleted; key 3 deleted then re-upserted
      mem.addData(Chg(1L, 5L, "U", 15.0), Chg(2L, 1L, "U", 21.0))
      q.processAllAvailable()
      mem.addData(Chg(1L, 3L, "U", 13.0), Chg(2L, 2L, "D", 0.0),
        Chg(3L, 1L, "D", 0.0))
      q.processAllAvailable()
      mem.addData(Chg(3L, 2L, "U", 33.0), Chg(4L, 1L, "U", 44.0))
      q.processAllAvailable()

      // final streaming winner per key = max emission under the fold's
      // own total order (winners evolve monotonically in it)
      val got = spark.table("cdc_out").as[Chg].collect()
        .groupBy(_.k).map { case (k, xs) =>
          k -> xs.maxBy(c => (c.seq, c.op, c.bal))
        }
      val want = Map(
        1L -> Chg(1L, 5L, "U", 15.0), // old seq=3 arrived later, lost
        2L -> Chg(2L, 2L, "D", 0.0),
        3L -> Chg(3L, 2L, "U", 33.0),
        4L -> Chg(4L, 1L, "U", 44.0))
      assert(got === want)

      // differential: applying the resolved winners to a base snapshot
      // matches the batch operator folding the raw changelog directly
      val base = Seq((1L, 10.0), (2L, 20.0), (9L, 90.0)).toDF("k", "bal")
      val changelog = Seq(
        (1L, 5L, "U", 15.0), (2L, 1L, "U", 21.0), (1L, 3L, "U", 13.0),
        (2L, 2L, "D", 0.0), (3L, 1L, "D", 0.0), (3L, 2L, "U", 33.0),
        (4L, 1L, "U", 44.0)).toDF("k", "seq", "op", "bal")
      val batchSnap = Analytics.applyChangelog(base, changelog, "k", "seq", "op")
        .select(col("k"), col("bal")).as[(Long, Double)].collect().toMap
      val streamSnap = {
        val winners = got.values.toSeq
        val deleted = winners.filter(_.op == "D").map(_.k).toSet
        val upserts = winners.filter(_.op == "U").map(c => c.k -> c.bal).toMap
        (Map(1L -> 10.0, 2L -> 20.0, 9L -> 90.0) ++ upserts) -- deleted
      }
      assert(streamSnap === batchSnap)
    } finally q.stop()
  }

  test("transformWithState port agrees with the mapGroupsWithState fold") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState keeps each named state variable in its own
    // column family — RocksDB-backed only (the default HDFS provider
    // refuses); this is also the intended production backend
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Chg]
    val q = CdcStreamV2.latestWins(mem.toDS())
      .writeStream.format("memory").queryName("cdc_v2_out")
      .outputMode(OutputMode.Update).start()
    try {
      // same shuffled arrival script as the v1 test
      mem.addData(Chg(1L, 5L, "U", 15.0), Chg(2L, 1L, "U", 21.0))
      q.processAllAvailable()
      mem.addData(Chg(1L, 3L, "U", 13.0), Chg(2L, 2L, "D", 0.0),
        Chg(3L, 1L, "D", 0.0))
      q.processAllAvailable()
      mem.addData(Chg(3L, 2L, "U", 33.0), Chg(4L, 1L, "U", 44.0))
      q.processAllAvailable()
      val got = spark.table("cdc_v2_out").as[Chg].collect()
        .groupBy(_.k).map { case (k, xs) =>
          k -> xs.maxBy(c => (c.seq, c.op, c.bal))
        }
      assert(got === Map(
        1L -> Chg(1L, 5L, "U", 15.0),
        2L -> Chg(2L, 2L, "D", 0.0),
        3L -> Chg(3L, 2L, "U", 33.0),
        4L -> Chg(4L, 1L, "U", 44.0)))
    } finally {
      q.stop()
      oldProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None    => spark.conf.unset(provKey)
      }
    }
  }
}
