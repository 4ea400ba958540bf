package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Vocab

class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  // HeavyHittersStream is transformWithState (v2) since round 12: every
  // test here needs the RocksDB provider
  override protected def test(name: String, tags: org.scalatest.Tag*)(
      body: => Any)(implicit pos: org.scalactic.source.Position): Unit =
    super.test(name, tags: _*)(withRocksDb(body))(pos)

  test("streaming MG shards: cross-batch state; recount of candidates == batch") {
    implicit val sqlCtx = spark.sqlContext
    val k = 3; val shards = 4
    val mem = MemoryStream[String]
    val q = HeavyHittersStream.shardedCandidates(mem.toDS(), k, shards)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Update).start()
    // 'alpha' is heavy only ACROSS batches — per-batch it never
    // dominates, so surviving requires state carried in the store
    val batches = Seq(
      Seq.fill(6)("alpha") ++ Seq("b", "c", "d", "e", "f", "g"),
      Seq.fill(6)("alpha") ++ Seq("h", "i", "j", "kk", "l", "m"),
      Seq.fill(8)("alpha") ++ Seq.fill(10)("zeta") ++ Seq("n", "o", "p"))
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val snaps = spark.table("hh_out")
        .as[HeavyHittersStream.ShardCandidates].collect()
      // current summary per shard = the emission with max n
      val last = snaps.groupBy(_.shard).values.map(_.maxBy(_.n)).toSeq
      val candidates = last.flatMap(_.words).toSet
      val all = batches.flatten
      // per-shard totals must cover the stream exactly once
      assert(last.map(_.n).sum === all.size.toLong)
      // guarantee: every true heavy hitter (> N/(k+1)) is a candidate
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val trueHH = exact.filter(_._2 > all.size.toDouble / (k + 1)).keySet
      assert(trueHH.nonEmpty && trueHH.subsetOf(candidates),
        s"missing ${trueHH -- candidates} from $candidates")
      // the streaming candidates finish identically to the batch
      // two-pass operator: exact recount over the candidate set,
      // thresholded, equals Vocab.frequentWords on the same words
      val recount = exact
        .filter { case (w, c) =>
          candidates.contains(w) && c > all.size.toDouble / (k + 1) }
        .toSet
      val batch = Vocab.frequentWords(all.toDF("w"), k)
        .as[(String, Long)].collect().toSet
      assert(recount === batch)
    } finally q.stop()
  }
}
