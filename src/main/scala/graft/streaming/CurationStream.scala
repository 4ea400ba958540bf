package graft.streaming

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import java.sql.Timestamp

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.operators.{Curation, Dedup, Vocab}

/** THE q222 CURATION FUNNEL AS A CONTINUOUS QUERY (round-13 verdict
  * task 5): the batch composition is gated; the production deployment is
  * incremental — new documents stream in and the funnel emits per-doc
  * verdicts as they arrive:
  *
  *   C4/Gopher quality rules   → stateless per-row (the q222 stage-1
  *                               arithmetic over the same native tokens)
  *   exact dedup, first-wins   → the ONLY keyed state: one owner per
  *                               md5(normText) bucket, NeardupStream's
  *                               claim semantics on transformWithState v2
  *   8-gram decontamination    → stream vs a BROADCAST frozen eval-gram
  *                               set (decontam references are compiled
  *                               offline and shipped — the production
  *                               shape)
  *   perplexity band           → per-row scoring against a BROADCAST
  *                               frozen KN prob table + a FROZEN tercile
  *                               cut (batch terciles are population-
  *                               relative; a stream can't re-rank, so the
  *                               cut is compiled from the batch
  *                               population — CCNet ships exactly this:
  *                               a trained LM + fixed band thresholds)
  *
  * [[buildRefs]] compiles the frozen references with the SAME DataFrame
  * fragments the gated queries run (Vocab.knProbTable, Curation
  * .decontamGrams, Curation.funnelVerdicts), so StreamingCurationSpec's
  * differential is exact: streaming the training corpus in doc_id order
  * == `Curation.funnelVerdicts` row for row, and ChaosRecoverySpec runs
  * the stateful stage through loss + undrained kill.
  *
  * Batch/stream deviation contract (documented, inherent):
  *   - first-wins ownership follows ARRIVAL order across micro-batches
  *     (within a batch: (ts, doc_id) — deterministic); the batch form's
  *     min-doc_id winner matches when arrival follows doc_id order,
  *     which an ingest pipeline's sequencer provides.
  *   - a bigram absent from the frozen prob table (impossible when
  *     streaming the training corpus itself; possible for novel docs)
  *     is SKIPPED — the doc scores over its known bigrams, unscored if
  *     none: the standard frozen-LM scoring convention.
  *
  * Scale shape: the stateless stages are one codegen'd tokenize +
  * per-row Scala over broadcast model-sized tables (prob table =
  * bigram-type-sized, eval grams = held-out-set-sized — reference data,
  * never corpus-sized); the stateful stage keeps ONE long per observed
  * text-hash bucket, hash-partitioned, event-time-evicted past the
  * watermark. Nothing is corpus×corpus. */
object CurationStream {

  /** Frozen references the funnel scores against. `cutS`/`cutD` encode
    * the batch tercile boundary as a lexicographic (s_fp, doc_id)
    * threshold — keep4 ⇔ (s_fp, doc_id) ≤ (cutS, cutD) — which is what
    * "rank (rnk−1)·3 div n < 2 over (s_fp, doc_id) order" freezes to.
    * `anyKept` false ⇔ the batch population had no scored survivors. */
  case class FunnelRefs(
      evalGrams: Set[Long],
      prob: Map[(String, String), Double],
      cutS: Long, cutD: Long, anyKept: Boolean)

  /** One enriched row entering the stateful stage: every stateless
    * verdict ingredient precomputed so the claim processor's output
    * carries the whole row (no stream-stream join). */
  case class FunnelIn(doc_id: Long, ts: Timestamp, source: String,
      bkey: String, keep1: Boolean, contaminated: Boolean,
      scored: Boolean, s_fp: Long)

  case class FunnelOut(doc_id: Long, source: String, keep1: Boolean,
      keep2: Boolean, contaminated: Boolean, scored: Boolean, s_fp: Long)

  /** Compile the frozen references from the batch corpus — three
    * bounded, model-sized driver materializations (the "train the
    * model, ship it to scorers" step every frozen-reference pipeline
    * has; sizes are bigram-type / eval-gram / 1-row, never corpus). */
  def buildRefs(s: SparkSession, d: String): FunnelRefs = {
    val docs = graft.operators.Tables.documents(s, d)
    val prob = Vocab.knProbTable(Vocab.bigramRows(docs))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val evalGrams = Curation.decontamGrams(
        docs.filter(col("doc_id") % 7 === 0).select(col("doc_id"), col("text")))
      .select(col("gram")).distinct()
      .collect().map(_.getLong(0)).toSet
    // the frozen tercile cut: K-th smallest (s_fp, doc_id) among the
    // batch stage-3 survivors, K = (2n−1) div 3 + 1 (= the rank count
    // with (rnk−1)·3 div n < 2)
    val scored = Vocab.q212KnBigram(s, d)
      .filter(col("avg_nll").isNotNull)
      .select(col("doc_id"),
        expr("CAST(round(avg_nll * 10000, 0) AS BIGINT)").as("s_fp"))
    val surv = Curation.funnelVerdicts(s, d).filter(col("keep3"))
      .select(col("doc_id")).join(scored, Seq("doc_id"))
    val n = surv.count()
    if (n == 0) FunnelRefs(evalGrams, prob, 0L, 0L, anyKept = false)
    else {
      val k = ((2 * n - 1) / 3 + 1).toInt
      val cut = surv.orderBy(col("s_fp"), col("doc_id")).limit(k)
        .orderBy(col("s_fp").desc, col("doc_id").desc).limit(1)
        .collect()(0)
      FunnelRefs(evalGrams, prob, cut.getLong(1), cut.getLong(0), anyKept = true)
    }
  }

  /** Stateless enrichment: native tokenize + dedup hash in one codegen'd
    * select, then per-row Scala for the stats/gram/score arithmetic
    * against the broadcast refs. Every constant replicates q222's
    * expressions bit for bit (StreamingCurationSpec differentials them). */
  private def enrich(docs: DataFrame,
      refs: Broadcast[FunnelRefs]): Dataset[FunnelIn] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("doc_id"), col("ts"), col("source"),
        Dedup.tokensCodegen(col("text")).as("toks"),
        md5(Dedup.normText(col("text"))).as("bkey"))
      .as[(Long, Timestamp, String, Seq[String], String)]
      .map { case (id, ts, src, toks, bkey) =>
        val r = refs.value
        // stage 1 — q222's C4/Gopher rules (integer arithmetic, no FP)
        val n = toks.length.toLong
        val sumLen = toks.iterator.map(_.length.toLong).sum
        val stopC = toks.count(t => t == "the" || t == "a").toLong
        val maxC =
          if (toks.isEmpty) 0L
          else toks.groupBy(identity).valuesIterator.map(_.size).max.toLong
        val keep1 = !(n < 30) &&
          !(sumLen * 10 < n * 42 || sumLen * 10 > n * 50) &&
          !(stopC * 100 < n * 5) && !(maxC * 10 > n)
        // stage 3 — distinct 8-gram 60-bit hashes vs the frozen set
        val grams: Set[Long] =
          if (toks.length < 8) Set.empty
          else (0 to toks.length - 8).iterator
            .map(j => gramHash(toks.slice(j, j + 8).mkString(" "))).toSet
        val hits = grams.count(r.evalGrams.contains).toLong
        val contaminated = grams.nonEmpty && hits * 10 >= grams.size.toLong
        // stage 4 ingredient — frozen-KN score, q212's exact arithmetic
        val nlls = (0 until toks.length - 1).iterator
          .flatMap(i => r.prob.get((toks(i), toks(i + 1)))).toArray
        val scored = nlls.nonEmpty
        val sFp = if (!scored) 0L else {
          var sum = JBigDecimal.ZERO
          nlls.foreach(x => sum = sum.add(
            JBigDecimal.valueOf(x).setScale(18, RoundingMode.HALF_UP)))
          val avg4 = JBigDecimal.valueOf(sum.doubleValue / nlls.length)
            .setScale(4, RoundingMode.HALF_UP).doubleValue
          JBigDecimal.valueOf(avg4).movePointRight(4)
            .setScale(0, RoundingMode.HALF_UP).longValueExact()
        }
        FunnelIn(id, ts, src, bkey, keep1, contaminated, scored, sFp)
      }
  }

  /** 60-bit md5-prefix hash of a gram string — q222's
    * `conv(substring(md5(g), 1, 15), 16, 10)` in Scala. */
  private def gramHash(g: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(g.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** First-wins text-hash claims carrying the full enriched row: a
    * keep1 survivor claims its bucket iff no earlier keep1 survivor
    * owns it (q222's "dedup among quality survivors" order); rows that
    * failed stage 1 pass through unclaimed and never take ownership.
    * Event-time timer eviction bounds state exactly as ClaimProcessor. */
  class FunnelProcessor(streaming: Boolean, delayMs: Long)
      extends StatefulProcessor[String, FunnelIn, FunnelOut] {
    @transient private var owner: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[FunnelIn],
        timerValues: TimerValues): Iterator[FunnelOut] = {
      val sorted = rows.toArray
        .sortInPlaceBy(r => (EventStreams.micros(r.ts), r.doc_id))
      var own = if (owner.exists()) owner.get() else -1L
      var lastTs = 0L
      val out = sorted.map { r =>
        lastTs = math.max(lastTs, r.ts.getTime)
        val keep2 =
          if (!r.keep1) false
          else if (own == -1L) { own = r.doc_id; true }
          else r.doc_id == own
        FunnelOut(r.doc_id, r.source, r.keep1, keep2,
          r.contaminated, r.scored, r.s_fp)
      }
      if (own != -1L) owner.update(own)
      if (streaming) {
        getHandle.listTimers().toSeq.foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(lastTs + delayMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[FunnelOut] = {
      owner.clear()
      Iterator.empty
    }
  }

  /** The continuous funnel over a (doc_id, ts, source, text) TRAIN-doc
    * stream (the caller excludes the held-out split, as q222 does):
    * emits (doc_id, source, keep1, keep2, keep3, keep4) per document.
    * Runs identically in batch mode (TimeMode.None) for differentials. */
  def verdicts(docs: DataFrame, refs: Broadcast[FunnelRefs],
      watermarkDelay: String): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val enriched = enrich(docs.withWatermark("ts", watermarkDelay), refs)
    val streaming = enriched.isStreaming
    val r = refs.value // driver-side: cut literals into the plan
    enriched.groupByKey(_.bkey)
      .transformWithState(
        new FunnelProcessor(streaming, NeardupStream.delayToMs(watermarkDelay)),
        if (streaming) TimeMode.EventTime() else TimeMode.None(),
        OutputMode.Append())
      .toDF()
      .withColumn("keep3", col("keep2") && !col("contaminated"))
      .withColumn("keep4", col("keep3") && col("scored") && lit(r.anyKept) &&
        (col("s_fp") < r.cutS ||
          (col("s_fp") === r.cutS && col("doc_id") <= r.cutD)))
      .select(col("doc_id"), col("source"), col("keep1"), col("keep2"),
        col("keep3"), col("keep4"))
  }

  /** Decontamination-at-ingest: per-chunk leak flags for a document
    * ingest stream checked against a STATIC train-chunk table — the
    * streaming face of q238's split-leakage audit, and the repo's
    * exemplar of Spark's third reference-data idiom: a stream-STATIC
    * equi join. Unlike the funnel's broadcast Sets (driver-sized
    * snapshot baked into the plan) or the claims paths' keyed state
    * (stream-mutable), the static side here is a DataFrame the engine
    * re-plans per micro-batch — so a train set too big to broadcast
    * still works (shuffled join at scale) and a replaced underlying
    * table is picked up without restarting the query. Stateless by
    * construction: chunking is per-row, the left join needs no
    * watermark or state store, and the per-doc verdict is the
    * consumer's batch rollup (q238's max() shape — same division of
    * labor as claims → keptDocs). */
  def leakFlags(docs: DataFrame, trainChunks: DataFrame,
      width: Int = 20): DataFrame =
    Curation.chunkRows(docs, width)
      .join(trainChunks.select(col("chunk_hash")).distinct()
        .withColumn("in_train", lit(1)), Seq("chunk_hash"), "left")
      .select(col("doc_id"), col("ts"), col("chunk_idx"),
        (coalesce(col("in_train"), lit(0)) === 1).as("leaked"))

  /** The static reference side for [[leakFlags]]: distinct chunk hashes
    * of the train split of a batch corpus. */
  def trainChunkSet(docs: DataFrame, width: Int = 20): DataFrame =
    Curation.chunkRows(Curation.withSplit(docs)
        .filter(col("split") === "train")
        .select(col("doc_id"), col("text")), width)
      .select(col("chunk_hash")).distinct()
}
