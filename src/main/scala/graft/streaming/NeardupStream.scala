package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming MinHash-LSH near-dup detection — the streaming form of the
  * batch Dedup.neardupPairs candidate generation, for deduplicating a
  * document INGEST stream before it ever lands in the corpus.
  *
  * Shape: per-row `minhash_bands` expression (tokens → shingles →
  * minhash → band keys in one codegen'd loop — a stream cannot interpose
  * the batch path's signature AGGREGATION before keyed state) → explode
  * to (band, bkey) → keyed state per bucket records the first document
  * to claim it. Output is the append-only CLAIMS stream: one row per
  * (doc, band) with `claimed` = whether this doc was first. A document
  * is a near-dup suspect iff it failed to claim ≥1 bucket; deriving the
  * kept set is a per-doc aggregation over claims ([[keptDocs]]) that
  * runs batch-side or in the sink (foreachBatch) — facts stream, policy
  * aggregates, so the stateful stage stays single and append-only.
  *
  * Scale/semantics notes:
  *   - State is ONE long per observed bucket (the owner), hash-
  *     partitioned by (band, bkey) across the cluster; event-time
  *     timeout evicts buckets idle past the watermark, bounding state —
  *     which also means a duplicate arriving later than the watermark
  *     delay is not caught: the inherent streaming-dedup contract,
  *     identical to the exact streaming dedup's.
  *   - Within a micro-batch, claims resolve in (ts, doc_id) order, so
  *     the outcome is deterministic and matches the batch formulation's
  *     first-wins (verified by differential in StreamingNeardupSpec).
  */
object NeardupStream {

  case class BandRow(doc_id: Long, ts: Timestamp, band: Int, bkey: Long)
  case class Claim(doc_id: Long, band: Int, claimed: Boolean)

  /** (doc_id, ts, band, bkey) rows for a (doc_id, ts, text) frame —
    * per-row expression work only; runs identically batch or streaming. */
  def bandRows(docs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    docs
      .withColumn("toks", graft.operators.Dedup.tokensCodegen(col("text")))
      .withColumn("bkeys",
        call_function("minhash_bands", col("toks"), lit(bands), lit(rowsPerBand)))
      .select(col("doc_id"), col("ts"),
        posexplode(col("bkeys")).as(Seq("band", "bkey")))

  /** (doc_id, ts, band, bkey) rows for an embedding ingest stream
    * (vec_id, ts, e) — the sign-LSH analog of [[bandRows]]: each vector
    * hashes into one bucket per table via the codegen'd `sign_buckets`
    * expression (q42's batch machinery), so SEMANTIC near-dups — not
    * just textual ones — are caught at ingest by the same first-wins
    * claim state. Caveat shared with the batch operator: sign-LSH
    * recall is probabilistic in (tables, bits); a claims consumer
    * wanting exactness verifies candidate cosines downstream. */
  def embeddingBandRows(vecs: DataFrame, tables: Int, bits: Int): DataFrame =
    vecs.select(col("vec_id").as("doc_id"), col("ts"),
      posexplode(call_function("sign_buckets",
        col("e"), lit(tables), lit(bits))).as(Seq("band", "bkey")))

  /** First-wins bucket claims over a (possibly streaming) document
    * frame. `watermarkDelay` bounds state lifetime in streaming mode. */
  def bandClaims(docs: DataFrame, watermarkDelay: String,
                 bands: Int = 16, rowsPerBand: Int = 4): Dataset[Claim] =
    claimsFromRows(bandRows(docs, bands, rowsPerBand), watermarkDelay)

  /** (doc_id, ts, band, bkey) rows for a MEDIA ingest stream
    * (doc_id, ts, payload: binary) — the payload-fingerprint analog of
    * [[bandRows]], enabled by the per-row `payload_simhash` expression
    * (graft.functions.PayloadSimhash; the batch form's vote AGGREGATION
    * could never run ahead of keyed state): the 60-bit fingerprint
    * splits into the same 4×15-bit pigeonhole bands as the batch
    * Multimodal.fingerprintPairs, so any payload within Hamming
    * distance 3 of an already-ingested one shares ≥1 bucket and fails
    * its claim. Sub-gram payloads (NULL fingerprint) pass through
    * unbanded — never claimed, never blocked. */
  def mediaBandRows(media: DataFrame): DataFrame =
    media
      .select(col("doc_id"), col("ts"),
        call_function("payload_simhash", col("payload")).as("fp"))
      .filter(col("fp").isNotNull)
      .select(col("doc_id"), col("ts"),
        posexplode(expr("transform(sequence(0, 3), " +
          "b -> (fp >> (b * 15)) & 32767)")).as(Seq("band", "bkey")))

  /** First-wins payload-fingerprint claims for a media ingest stream —
    * byte-level near-dup dedup at ingest, same state contract as the
    * text and embedding paths. */
  def mediaClaims(media: DataFrame, watermarkDelay: String): Dataset[Claim] =
    claimsFromRows(mediaBandRows(media), watermarkDelay)

  /** (doc_id, ts, band, bkey) rows for SUB-DOCUMENT chunk dedup at
    * ingest — the streaming face of the batch q234
    * (graft.operators.Curation.chunkDedup): each document splits into
    * non-overlapping `width`-token chunks and every chunk hashes into
    * ONE exact bucket (band 0, xxhash64 of the space-joined tokens —
    * exact dedup needs no banding; the multi-band machinery degrades
    * gracefully to a single table). A chunk's first-ever claimant owns
    * it; later documents carrying the same boilerplate paragraph fail
    * that chunk's claim and a downstream reassembler drops it. Token
    * arrays come from the same native alpha_tokens kernel as the batch
    * operator, so stream and batch agree on chunk boundaries; letterless
    * docs (the [""] singleton) pass through unbanded like sub-gram media
    * payloads. */
  def chunkBandRows(docs: DataFrame, width: Int): DataFrame =
    docs
      .withColumn("tk", graft.operators.Dedup.tokensCodegen(col("text")))
      .where(size(col("tk")) > 0 && element_at(col("tk"), 1) =!= "")
      .select(col("doc_id"), col("ts"), col("tk"),
        explode(expr(s"sequence(0, size(tk) - 1, $width)")).as("start"))
      .select(col("doc_id"), col("ts"), lit(0).as("band"),
        xxhash64(concat_ws(" ",
          slice(col("tk"), col("start") + 1, lit(width)))).as("bkey"))

  /** First-wins chunk claims for a document ingest stream — paragraph-
    * level dedup at ingest. Same state contract as every other claims
    * path: one owner long per observed chunk bucket, event-time
    * eviction after `watermarkDelay`. */
  def chunkClaims(docs: DataFrame, watermarkDelay: String,
                  width: Int = 20): Dataset[Claim] =
    claimsFromRows(chunkBandRows(docs, width), watermarkDelay)

  /** First-wins bucket claims for an embedding ingest stream — the
    * semantic-dedup-at-ingest form. Same state contract as the text
    * path: one owner long per observed bucket, event-time eviction. */
  def embeddingClaims(vecs: DataFrame, watermarkDelay: String,
                      tables: Int = 8, bits: Int = 16): Dataset[Claim] =
    claimsFromRows(embeddingBandRows(vecs, tables, bits), watermarkDelay)

  /** Watermark-delay string → milliseconds, for the v2 timer arithmetic
    * (v1's two-arg setTimeoutTimestamp did this addition internally;
    * registerTimer takes an absolute ms timestamp). Parsed with Spark's
    * own CalendarInterval grammar so every delay `withWatermark` accepts
    * — "10 seconds", "1 hour 30 minutes", "interval 2 minutes" — is
    * accepted here too (v1 took any CalendarInterval text; a narrower
    * hand-rolled grammar would throw at pipeline construction on
    * previously-valid strings). Month/year units are rejected exactly
    * like v1's GroupState did: they have no fixed ms width. */
  private[streaming] def delayToMs(d: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(d))
    require(iv.months == 0,
      s"month/year intervals unsupported in watermark delay '$d'")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** The v2 first-wins processor: one owner long per bucket; in
    * streaming mode an event-time timer at lastSeen + delay evicts idle
    * buckets exactly where v1's setTimeoutTimestamp(lastTs, delay) did
    * (single-timer hygiene: delete-then-register, v2 timers accumulate).
    * Batch mode runs the SAME processor under TimeMode.None — timers
    * never arm, state lives for the one "batch". */
  class ClaimProcessor(streaming: Boolean, delayMs: Long)
      extends StatefulProcessor[(Int, Long), BandRow, Claim] {
    @transient private var owner: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandRow],
        timerValues: TimerValues): Iterator[Claim] = {
      // one bucket's rows from one micro-batch (streaming) or one
      // bucket's full history (batch) — bounded like any keyed group.
      // Ordering uses exact epoch-µs (EventStreams.micros): getTime's
      // ms truncation would flip first-wins ownership on sub-ms ties
      // vs the batch window formulation's full-precision ORDER BY ts.
      val sorted = rows.toArray.sortInPlaceBy(r => (EventStreams.micros(r.ts), r.doc_id))
      var own = if (owner.exists()) owner.get() else -1L
      var lastTs = 0L
      val out = sorted.map { r =>
        lastTs = math.max(lastTs, r.ts.getTime)
        if (own == -1L) { own = r.doc_id; Claim(r.doc_id, key._1, claimed = true) }
        else Claim(r.doc_id, key._1, claimed = r.doc_id == own)
      }
      owner.update(own)
      if (streaming) {
        // materialize before deleting (single timer — one-element copy;
        // see GapFillStream.finalizeAndArm for the rationale)
        getHandle.listTimers().toSeq.foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(lastTs + delayMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: (Int, Long),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Claim] = {
      owner.clear()
      Iterator.empty
    }
  }

  /** Shared first-wins keyed state over any (doc_id, ts, band, bkey)
    * frame, batch or streaming — `transformWithState` (arbitrary-state
    * v2) since round 12; requires the RocksDB state store provider. */
  private def claimsFromRows(bandedRows: DataFrame,
                             watermarkDelay: String): Dataset[Claim] = {
    val s = bandedRows.sparkSession
    import s.implicits._
    val rows = bandedRows
      .withWatermark("ts", watermarkDelay)
      .as[BandRow]
    val streaming = rows.isStreaming
    rows.groupByKey(r => (r.band, r.bkey))
      .transformWithState(
        new ClaimProcessor(streaming, delayToMs(watermarkDelay)),
        if (streaming) TimeMode.EventTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Kept set from a claims frame: a doc survives iff it claimed EVERY
    * band (no bucket was owned by an earlier doc). The expected band
    * count is each doc's OWN claim count — not a parameter that could
    * silently disagree with the `bands` used in [[bandClaims]]. Plain
    * aggregation — in streaming deployments this runs in the sink
    * (foreachBatch) or a downstream batch job over the claims table. */
  def keptDocs(claims: DataFrame): DataFrame =
    claims.groupBy(col("doc_id"))
      .agg(sum(when(col("claimed"), 1).otherwise(0)).as("n_claimed"),
        count(lit(1)).as("n_bands"))
      .filter(col("n_claimed") === col("n_bands"))
      .select(col("doc_id"))
}
