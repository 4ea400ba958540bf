package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Curation

/** The q222 funnel as a continuous query: the streaming form over the
  * appended training corpus must equal the gated batch funnel's per-doc
  * verdicts row for row (frozen refs compiled from the same population),
  * in both batch mode (TimeMode.None) and micro-batched streaming. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  // transformWithState requires the RocksDB state store provider
  override protected def test(name: String, tags: org.scalatest.Tag*)(
      body: => Any)(implicit pos: org.scalactic.source.Position): Unit =
    super.test(name, tags: _*)(withRocksDb(body))(pos)

  private val d = sf("sf0.001")

  private lazy val refs =
    spark.sparkContext.broadcast(CurationStream.buildRefs(spark, d))

  /** The gated funnel's per-doc verdicts (keep4 null → false, as the
    * q222 rollup coalesces it). */
  private lazy val want: Set[Seq[Any]] =
    Curation.funnelVerdicts(spark, d)
      .select(col("doc_id"), col("source"), col("keep1"), col("keep2"),
        col("keep3"), coalesce(col("keep4"), lit(false)).as("keep4"))
      .collect().map(_.toSeq).toSet

  private def trainRows(): Array[(Long, Timestamp, String, String)] =
    spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("source"), col("text"))
      .orderBy(col("doc_id"))
      .as[(Long, String, String)].collect()
      // ts follows doc_id order — the ingest-sequencer contract the
      // batch form's min-doc_id dedup winner maps onto
      .map { case (id, src, txt) =>
        (id, new Timestamp(1000000000000L + id * 1000L), src, txt)
      }

  test("batch mode: streaming operator equals the gated funnel's verdicts") {
    val rows = trainRows()
    val got = CurationStream.verdicts(
        rows.toSeq.toDF("doc_id", "ts", "source", "text"), refs, "1 hour")
      .collect().map(_.toSeq).toSet
    assert(got.size === rows.length)
    assert(got === want)
  }

  test("streaming over the appended corpus equals the batch funnel (2 micro-batches)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = trainRows()
    val mem = MemoryStream[(Long, Timestamp, String, String)]
    val q = CurationStream.verdicts(
        mem.toDF().toDF("doc_id", "ts", "source", "text"), refs, "1 hour")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      mem.addData(b1.toSeq: _*)
      q.processAllAvailable()
      mem.addData(b2.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("funnel_out").collect().map(_.toSeq).toSet
      assert(got.size === rows.length, "one verdict per appended document")
      assert(got === want)
    } finally q.stop()
  }

  test("frozen cut reproduces the population-relative tercile exactly") {
    // the batch keep4 is rank-based; the stream's (cutS, cutD) threshold
    // must carve out the IDENTICAL doc set — already implied by the
    // differentials above, pinned here directly on the kept counts
    val batchKept = Curation.funnelVerdicts(spark, d)
      .filter(coalesce(col("keep4"), lit(false))).count()
    val r = refs.value
    assert(r.anyKept === (batchKept > 0))
    if (batchKept > 0) {
      // the cut is the K-th smallest (s_fp, doc_id): K == kept count
      assert(batchKept ===
        want.count(row => row(5).asInstanceOf[Boolean]).toLong)
    }
  }

  test("frozen refs are bounded by construction: prob cap bites, floor set, stream still equals batch") {
    // a synthetic corpus whose bigram-type count far exceeds the cap:
    // 30 docs × ~26 mostly-unique words, every doc opening with the
    // same "alpha beta" so top-K-by-count has a clear head
    def word(i: Int, j: Int): String =
      "" + ('a' + i % 26).toChar + ('a' + i / 26).toChar +
        ('a' + j % 26).toChar + ('a' + j / 26).toChar
    val docsRows = (0 until 30).map { i =>
      val text = "alpha beta " + (0 until 25).map(j => word(i, j)).mkString(" ")
      (i.toLong, s"s${i % 3}", text)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-refs-cap").toString
    docsRows.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cap = 50
    val capped = CurationStream.buildRefs(spark, dir, probCap = cap)
    // the size bound holds REGARDLESS of corpus size…
    assert(capped.prob.size === cap)
    // …the cap genuinely bit (the corpus carries far more bigram types)…
    val fullProb = graft.operators.Vocab.knProbTable(
      graft.operators.Vocab.bigramRows(
        spark.read.parquet(s"$dir/documents.parquet")))
    val nTypes = fullProb.count()
    assert(nTypes > 10L * cap, s"fixture too small: $nTypes bigram types")
    // …the eviction floor is the FULL table's max nll, not the capped…
    val wantFloor = fullProb.agg(max(col("nll"))).collect()(0).getDouble(0)
    assert(capped.floorNll === Some(wantFloor))
    // …the head of the count order survives (every doc's opener)…
    assert(capped.prob.contains(("alpha", "beta")))
    // …and micro-batched streaming under the capped refs still equals
    // the batch-mode run of the same operator (the floor path is live:
    // most bigrams of every arriving doc are absent from the 50-entry
    // table, so the differential exercises eviction-floor scoring)
    val bRefs = spark.sparkContext.broadcast(capped)
    val rows = docsRows.filter(_._1 % 7 != 0).map { case (id, src, txt) =>
      (id, new Timestamp(1000000000000L + id * 1000L), src, txt)
    }
    val wantBatch = CurationStream.verdicts(
        rows.toDF("doc_id", "ts", "source", "text"), bRefs, "1 hour")
      .collect().map(_.toSeq).toSet
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, String)]
    val q = CurationStream.verdicts(
        mem.toDF().toDF("doc_id", "ts", "source", "text"), bRefs, "1 hour")
      .writeStream.format("memory").queryName("funnel_capped_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("funnel_capped_out").collect().map(_.toSeq).toSet
      assert(got.size === rows.length)
      assert(got === wantBatch)
    } finally q.stop()
    // a COMPLETE table (cap not biting) must carry no floor — absent
    // means unseen and is skipped, the exact round-14 gate semantics
    val uncapped = CurationStream.buildRefs(spark, dir)
    assert(uncapped.floorNll.isEmpty)
    assert(uncapped.prob.size.toLong === nTypes)
  }

  test("an over-cap decontam reference fails fast instead of truncating or collecting") {
    // truncating a decontamination reference would silently admit
    // contamination, so the build must refuse BEFORE collecting
    val e = intercept[IllegalArgumentException] {
      CurationStream.buildRefs(spark, d, evalGramCap = 1)
    }
    assert(e.getMessage.contains("decontam reference"))
    assert(e.getMessage.contains("bounded eval suite"))
  }

  test("stream-static leak flags over 2 micro-batches equal the batch q238 chunk verdicts") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.operators.Tables.documents(spark, d)
    val trainSet = CurationStream.trainChunkSet(docs) // static reference
    // the eval stream: every non-train doc, ts following doc_id order
    val evalRows = graft.operators.Curation.withSplit(docs)
      .filter(col("split") =!= "train")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      .as[(Long, String)].collect()
      .map { case (id, txt) =>
        (id, new Timestamp(1000000000000L + id * 1000L), txt)
      }
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = CurationStream.leakFlags(df, trainSet)
      .writeStream.format("memory").queryName("leak_flags_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      val (b1, b2) = evalRows.splitAt(evalRows.length / 2)
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("leak_flags_out")
        .select(col("doc_id"), col("chunk_idx"), col("leaked"))
        .as[(Long, Long, Boolean)].collect().toSet
      // batch referee: same chunks, same static train set, left join
      val batch = graft.operators.Curation.chunksOfTokens(
          graft.operators.Curation.docTokens(
            graft.operators.Curation.withSplit(docs)
              .filter(col("split") =!= "train")
              .select(col("doc_id"), col("text"))), 20, 20)
        .join(trainSet.withColumn("in_train", lit(1)), Seq("chunk_hash"), "left")
        .select(col("doc_id"), col("chunk_idx"),
          (coalesce(col("in_train"), lit(0)) === 1).as("leaked"))
        .as[(Long, Long, Boolean)].collect().toSet
      assert(got === batch)
      // the audit genuinely bites on this corpus (q238's measured rates)
      assert(got.exists(_._3) && got.exists(!_._3))
      // and rolls up to q238's per-split doc counts
      val leakedDocs = got.filter(_._3).map(_._1)
      val q238Total = graft.operators.Curation.q238SplitLeakage(spark, d)
        .agg(sum(col("n_leaked"))).as[Long].collect().head
      assert(leakedDocs.size.toLong === q238Total)
    } finally q.stop()
  }
}
