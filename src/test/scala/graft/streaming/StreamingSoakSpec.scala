package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Curation

/** Dice-soak for the stateful streaming family (round-14 verdict task
  * 5): the 2-micro-batch differentials pin one schedule; production
  * streams arrive in arbitrary batchings and orders. Each test below
  * loops seeds and re-randomizes HOW the same rows arrive — batch
  * boundaries for the funnel (whose batch-equality contract assumes
  * doc_id-ordered arrival, the ingest-sequencer shape), boundaries AND
  * arrival order for claims (whose contract is first-wins, order-
  * dependent by design) — and asserts an EXACT referee every time:
  *
  *   funnel: verdicts == the gated batch funnel, for every batching —
  *     micro-batch boundaries must be invisible when arrival order is
  *     the sequencer's.
  *   claims: per bucket, EXACTLY ONE owner, every loser maps to that
  *     owner, and the owner is precisely min(batch-of-arrival, ts,
  *     doc_id) — the first-wins law restated over whatever schedule the
  *     dice produced (state carries ownership across batches; within a
  *     batch the processor sorts (ts, doc_id)).
  *
  * Watermark delays are chosen ≫ the event-time spread so eviction
  * never fires mid-soak — eviction semantics are pinned separately
  * (chaos/recovery specs); this soak isolates schedule sensitivity. */
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  override protected def test(name: String, tags: org.scalatest.Tag*)(
      body: => Any)(implicit pos: org.scalactic.source.Position): Unit =
    super.test(name, tags: _*)(withRocksDb(body))(pos)

  private val d = sf("sf0.001")

  /** Split `rows` into `nBatches` contiguous runs at seeded random cut
    * points (empty runs possible and allowed — an idle micro-batch). */
  private def randomSplits[T](rows: IndexedSeq[T], nBatches: Int,
      rnd: scala.util.Random): Seq[IndexedSeq[T]] = {
    val cuts = (Vector.fill(nBatches - 1)(rnd.nextInt(rows.length + 1))
      :+ 0 :+ rows.length).sorted
    cuts.zip(cuts.tail).map { case (a, b) => rows.slice(a, b) }
  }

  test("funnel soak: any batching of sequencer-ordered arrival equals the batch funnel (5 seeds x 5-8 batches)") {
    implicit val sqlCtx = spark.sqlContext
    val refs = spark.sparkContext.broadcast(CurationStream.buildRefs(spark, d))
    val want = Curation.funnelVerdicts(spark, d)
      .select(col("doc_id"), col("source"), col("keep1"), col("keep2"),
        col("keep3"), coalesce(col("keep4"), lit(false)).as("keep4"))
      .collect().map(_.toSeq).toSet
    val rows = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("source"), col("text"))
      .orderBy(col("doc_id"))
      .as[(Long, String, String)].collect()
      .map { case (id, src, txt) =>
        (id, new Timestamp(1000000000000L + id * 1000L), src, txt)
      }.toIndexedSeq
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val batches = randomSplits(rows, 5 + rnd.nextInt(4), rnd)
      val mem = MemoryStream[(Long, Timestamp, String, String)]
      val q = CurationStream.verdicts(
          mem.toDF().toDF("doc_id", "ts", "source", "text"), refs, "1 day")
        .writeStream.format("memory").queryName(s"funnel_soak_$seed")
        .outputMode(OutputMode.Append).start()
      try {
        batches.filter(_.nonEmpty).foreach { b =>
          mem.addData(b: _*); q.processAllAvailable()
        }
        val got = spark.table(s"funnel_soak_$seed")
          .collect().map(_.toSeq).toSet
        assert(got.size === rows.length, s"seed $seed: one verdict per doc")
        assert(got === want,
          s"seed $seed (${batches.map(_.size).mkString("/")}): " +
            "batching changed the funnel's verdicts")
      } finally q.stop()
    }
  }

  test("media claims soak: random arrival order and batching, first-wins law holds per bucket (5 seeds x 5-8 batches)") {
    implicit val sqlCtx = spark.sqlContext
    // 12 base payloads, an in-place edited near-dup of each (within the
    // pigeonhole radius — shares >=1 of the 4 bands), 6 unrelated: a mix
    // where buckets genuinely contend across whatever order dice pick
    val rng = new scala.util.Random(47L)
    def payload(): String =
      Array.fill(1024)((33 + rng.nextInt(94)).toChar).mkString
    val media: IndexedSeq[(Long, Timestamp, Array[Byte])] = {
      val bases = (0 until 12).map(_ => payload())
      val edited = bases.map { p =>
        val a = p.toCharArray; a(77) = '!'; a(505) = '@'; new String(a)
      }
      val all = bases ++ edited ++ (0 until 6).map(_ => payload())
      all.zipWithIndex.map { case (p, i) =>
        ((i + 1).toLong, new Timestamp(1000000000000L + i * 1000L),
          p.getBytes("UTF-8"))
      }.toIndexedSeq
    }
    // (doc_id, band) -> bkey from the batch band arithmetic (the claims
    // output intentionally drops bkey; the referee reattaches it)
    val bandRows = NeardupStream.mediaBandRows(
        media.toDF("doc_id", "ts", "payload"))
      .select(col("doc_id"), col("band"), col("bkey"))
      .as[(Long, Int, Long)].collect()
    val bkeyOf = bandRows.map(r => (r._1, r._2) -> r._3).toMap
    val tsOf = media.map(m => m._1 -> m._2.getTime).toMap
    for (seed <- 11 to 15) {
      val rnd2 = new scala.util.Random(seed)
      val arrival = rnd2.shuffle(media)
      val batches = randomSplits(arrival, 5 + rnd2.nextInt(4), rnd2)
        .filter(_.nonEmpty)
      val batchOf = batches.zipWithIndex.flatMap { case (b, i) =>
        b.map(m => m._1 -> i)
      }.toMap
      val mem = MemoryStream[(Long, Timestamp, Array[Byte])]
      val q = NeardupStream.mediaClaims(
          mem.toDF().toDF("doc_id", "ts", "payload"), "1 day")
        .writeStream.format("memory").queryName(s"media_soak_$seed")
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val claims = spark.table(s"media_soak_$seed")
          .select(col("doc_id"), col("band"), col("claimed"))
          .as[(Long, Int, Boolean)].collect()
        assert(claims.length === bandRows.length,
          s"seed $seed: exactly one claim per (doc, band)")
        val byBucket = claims.groupBy { case (id, band, _) =>
          (band, bkeyOf((id, band)))
        }
        byBucket.foreach { case (bucket, rows) =>
          // the first-wins law under THIS schedule: the owner is the
          // arrival-minimal (batch, ts, doc_id) of the bucket...
          val expect = rows.map(_._1)
            .minBy(id => (batchOf(id), tsOf(id), id))
          val owners = rows.filter(_._3).map(_._1).toSet
          // ...exactly one owner, and it is that row; every duplicate
          // maps to the live owner by sharing this bucket
          assert(owners === Set(expect),
            s"seed $seed bucket $bucket: owners $owners, expected $expect " +
              s"(schedule ${rows.map(r => (r._1, batchOf(r._1))).sortBy(_._1).mkString(",")})")
        }
        // contention genuinely happened under this schedule
        assert(claims.exists(!_._3), s"seed $seed: no bucket was contended")
      } finally q.stop()
    }
  }
}
