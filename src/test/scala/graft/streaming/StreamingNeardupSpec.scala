package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingNeardupSpec extends SparkSpec {
  import spark.implicits._

  // NeardupStream is transformWithState (v2) since round 12: every test
  // here (batch differentials included) needs the RocksDB provider
  override protected def test(name: String, tags: org.scalatest.Tag*)(
      body: => Any)(implicit pos: org.scalactic.source.Position): Unit =
    super.test(name, tags: _*)(withRocksDb(body))(pos)

  private def ts(min: Long): Timestamp = new Timestamp((1000 + min) * 60000L)

  test("delayToMs accepts the full CalendarInterval grammar withWatermark accepts") {
    // the v1 API took any CalendarInterval text; the v2 port must not
    // narrow the accepted delay grammar (round-12 advisory)
    assert(NeardupStream.delayToMs("10 seconds") === 10000L)
    assert(NeardupStream.delayToMs("1 hour 30 minutes") === 5400000L)
    assert(NeardupStream.delayToMs("interval 2 minutes") === 120000L)
    assert(NeardupStream.delayToMs("1 day") === 86400000L)
    assert(NeardupStream.delayToMs("500 milliseconds") === 500L)
    intercept[IllegalArgumentException](NeardupStream.delayToMs("3 months"))
    intercept[Exception](NeardupStream.delayToMs("not an interval"))
  }

  private val orig =
    "the quick brown fox jumps over the lazy dog near the river bank today " +
      "while the sun sets slowly behind the distant purple mountains casting long shadows"
  private val nearCopy = orig.replace("lazy dog", "lazy cat")
  private val unrelated =
    "completely different text about cooking pasta with garlic olive oil basil " +
      "tomatoes parmesan and a pinch of salt simmered gently in a wide heavy pan"

  test("streaming near-dup dedup: near-copy in a later micro-batch is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = NeardupStream.bandClaims(df, "1 hour")
      .writeStream.format("memory").queryName("claims_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts(0), orig))
      q.processAllAvailable()
      mem.addData((2L, ts(5), nearCopy), (3L, ts(6), unrelated))
      q.processAllAvailable()
      val kept = NeardupStream.keptDocs(spark.table("claims_out"))
        .as[Long].collect().toSet
      // doc 2 shares most shingles with doc 1 → collides in ≥1 bucket
      // whose owner (from the EARLIER batch, via state) is doc 1
      assert(kept === Set(1L, 3L))
    } finally q.stop()
  }

  test("batch mode equals an independent window formulation (first-wins per bucket)") {
    val docs = Seq(
      (10L, ts(0), orig),
      (11L, ts(1), nearCopy),     // loses buckets to 10
      (12L, ts(2), unrelated),
      (13L, ts(3), unrelated),    // exact copy of 12's text → loses all buckets
      (14L, ts(4), "tiny doc")    // short-doc fallback path
    ).toDF("doc_id", "ts", "text")

    val viaState = NeardupStream.keptDocs(NeardupStream.bandClaims(docs, "1 hour").toDF())
      .as[Long].collect().toSet

    // independent formulation: bucket owner = min (ts, doc_id) row per
    // (band, bkey); a doc survives iff it owns all its buckets
    val rows = NeardupStream.bandRows(docs, 16, 4)
    val w = Window.partitionBy(col("band"), col("bkey"))
      .orderBy(col("ts"), col("doc_id"))
    val viaWindow = rows
      .withColumn("owner", first(col("doc_id")).over(w))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("doc_id") === col("owner"), 1).otherwise(0)).as("n"))
      .filter(col("n") === 16)
      .select("doc_id").as[Long].collect().toSet

    assert(viaState === viaWindow)
    assert(viaState.contains(10L) && viaState.contains(12L))
    assert(!viaState.contains(13L)) // exact dup never survives
    assert(viaState.contains(14L))
  }

  test("same-batch collision resolves deterministically by (ts, doc_id)") {
    val docs = Seq(
      (20L, ts(1), orig),
      (21L, ts(1), orig), // identical text, same ts → doc_id breaks the tie
      (22L, ts(0), nearCopy) // EARLIER ts → owns the shared buckets
    ).toDF("doc_id", "ts", "text")
    val kept = NeardupStream.keptDocs(NeardupStream.bandClaims(docs, "1 hour").toDF())
      .as[Long].collect().toSet
    // 22 is first by event time; 20/21 lose their shared buckets to it,
    // and 21 additionally loses every bucket to 20
    assert(!kept.contains(21L))
    assert(kept.contains(22L))
  }

  // sign-LSH is scale-invariant (buckets hash SIGNS of hyperplane dots),
  // so v and 2v share every bucket deterministically — no probabilistic
  // recall in this fixture; -v flips every sign, so it collides nowhere.
  private val v1 = Array.tabulate(16)(i => math.sin(i + 1.0)).toSeq
  private val v2 = v1.map(_ * 2.0)
  private val v3 = v1.map(x => -x)

  test("streaming embedding near-dup: scaled copy in a later batch is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Seq[Double])]
    val df = mem.toDF().toDF("vec_id", "ts", "e")
    val q = NeardupStream.embeddingClaims(df, "1 hour")
      .writeStream.format("memory").queryName("emb_claims_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts(0), v1))
      q.processAllAvailable()
      mem.addData((2L, ts(5), v2), (3L, ts(6), v3))
      q.processAllAvailable()
      val kept = NeardupStream.keptDocs(spark.table("emb_claims_out"))
        .as[Long].collect().toSet
      assert(kept === Set(1L, 3L))
    } finally q.stop()
  }

  test("embedding claims in batch mode equal the window formulation") {
    val vecs = Seq(
      (30L, ts(0), v1),
      (31L, ts(1), v2),  // scaled copy → loses all 8 tables to 30
      (32L, ts(2), v3))
      .toDF("vec_id", "ts", "e")
    val viaState = NeardupStream.keptDocs(
        NeardupStream.embeddingClaims(vecs, "1 hour").toDF())
      .as[Long].collect().toSet
    val rows = NeardupStream.embeddingBandRows(vecs, 8, 16)
    val w = Window.partitionBy(col("band"), col("bkey"))
      .orderBy(col("ts"), col("doc_id"))
    val viaWindow = rows
      .withColumn("owner", first(col("doc_id")).over(w))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("doc_id") === col("owner"), 1).otherwise(0)).as("n"))
      .filter(col("n") === 8)
      .select("doc_id").as[Long].collect().toSet
    assert(viaState === viaWindow)
    assert(viaState === Set(30L, 32L))
  }

  test("streaming media near-dup: an edited payload in a later batch is dropped") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic payloads: base, a 2-char in-place edit (within
    // Hamming radius 3 of the base — shares >=1 pigeonhole band), and
    // an unrelated one; plus a sub-gram payload that must pass through
    val rng = new scala.util.Random(41L)
    val base = Array.fill(2048)((33 + rng.nextInt(94)).toChar).mkString
    val edited = { val a = base.toCharArray; a(100) = '!'; a(900) = '@'; new String(a) }
    val other = Array.fill(2048)((33 + rng.nextInt(94)).toChar).mkString
    val mem = MemoryStream[(Long, Timestamp, Array[Byte])]
    val df = mem.toDF().toDF("doc_id", "ts", "payload")
    val q = NeardupStream.mediaClaims(df, "1 hour")
      .writeStream.format("memory").queryName("media_claims_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts(0), base.getBytes("UTF-8")))
      q.processAllAvailable()
      mem.addData((2L, ts(5), edited.getBytes("UTF-8")),
        (3L, ts(6), other.getBytes("UTF-8")))
      q.processAllAvailable()
      val kept = NeardupStream.keptDocs(spark.table("media_claims_out"))
        .as[Long].collect().toSet
      assert(kept === Set(1L, 3L))
    } finally q.stop()
  }

  test("streaming chunk claims: shared boilerplate chunk in a later batch fails its claim") {
    implicit val sqlCtx = spark.sqlContext
    def w(i: Int): String = s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val a = (0 until 4).map(w).mkString(" ")  // chunk A (width 4)
    val b = (4 until 8).map(w).mkString(" ")  // chunk B
    val c = (8 until 12).map(w).mkString(" ") // chunk C
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = NeardupStream.chunkClaims(df, "1 hour", width = 4)
      .writeStream.format("memory").queryName("chunk_claims_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts(0), s"$a $b"))
      q.processAllAvailable()
      // doc 2 re-ingests chunk A (owned by doc 1, via state across
      // micro-batches) next to fresh chunk C; doc 3 is letterless and
      // must pass through unbanded (no claims, not blocked)
      mem.addData((2L, ts(5), s"$a $c"), (3L, ts(6), "12345 !!!"))
      q.processAllAvailable()
      val claims = spark.table("chunk_claims_out")
        .groupBy(col("doc_id"))
        .agg(sum(when(col("claimed"), 1).otherwise(0)).as("won"),
          count(lit(1)).as("total"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(claims(1L) === ((2L, 2L))) // owns A and B
      assert(claims(2L) === ((1L, 2L))) // loses A, wins C
      assert(!claims.contains(3L))      // letterless: no chunk rows at all
    } finally q.stop()
  }

  test("batch chunk claims agree with q234's canonical per-chunk winner (kept counts per doc)") {
    // ts ascending with doc_id so the claims order (ts, doc_id) and the
    // batch canonical order (doc_id, chunk_idx) pick the same winner;
    // no intra-doc duplicate chunks so kept_chunks == claims won
    def w(i: Int): String = s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val a = (0 until 4).map(w)
    val b = (4 until 8).map(w)
    val c = (8 until 10).map(w) // short tail chunk
    val docs = Seq(
      (1L, ts(0), (a ++ b).mkString(" ")),
      (2L, ts(1), a.mkString(" ")),
      (3L, ts(2), (b ++ c).mkString(" ")))
      .toDF("doc_id", "ts", "text")
    val viaState = NeardupStream.chunkClaims(docs, "1 hour", width = 4)
      .toDF()
      .groupBy(col("doc_id"))
      .agg(sum(when(col("claimed"), 1L).otherwise(0L)).as("won"))
      .as[(Long, Long)].collect().toMap
    val viaBatch = graft.operators.Curation.chunkDedup(
        docs.select("doc_id", "text"), width = 4)
      .select(col("doc_id"), col("kept_chunks"))
      .as[(Long, Long)].collect().toMap
    assert(viaState === viaBatch)
    assert(viaState === Map(1L -> 2L, 2L -> 0L, 3L -> 1L))
  }

  test("media claims band arithmetic equals the batch fingerprintPairs banding") {
    // a pair the BATCH operator verifies within radius 3 must collide in
    // >=1 streaming bucket (the pigeonhole guarantee shared verbatim)
    val rng = new scala.util.Random(43L)
    val base = Array.fill(2048)((33 + rng.nextInt(94)).toChar).mkString
    val edited = { val a = base.toCharArray; a(500) = '#'; new String(a) }
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val batchPairs = graft.operators.Multimodal.fingerprintPairs(
      graft.operators.Multimodal.payloadFingerprints(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs === Set((1L, 2L)))
    val media = Seq(
      (1L, ts(0), base.getBytes("UTF-8")),
      (2L, ts(1), edited.getBytes("UTF-8"))).toDF("doc_id", "ts", "payload")
    val shared = NeardupStream.mediaBandRows(media)
      .groupBy(col("band"), col("bkey"))
      .agg(countDistinct(col("doc_id")).as("n"))
      .filter(col("n") === 2).count()
    assert(shared >= 1, "radius-3 pair must share a streaming bucket")
  }
}
