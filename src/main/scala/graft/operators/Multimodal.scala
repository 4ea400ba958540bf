package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct, processed in partition-sized
  * batches through typed Datasets (the JVM analog of mapInPandas batch
  * UDFs: one iterator per partition, record-at-a-time streaming, no
  * whole-partition materialization).
  *
  * The actual codecs are NOT in this environment, so the decode /
  * resize / frame-sample kernels are DETERMINISTIC STUBS (clearly marked
  * below) — the Spark-side contract they run under (schema, encoders,
  * partitioning, batch shape, row explosion bounds) is real and tested
  * in MultimodalSpec. Swapping a stub for a JNI/FFmpeg kernel changes no
  * plan shape.
  *
  * Scale notes: payloads stay in executor space end-to-end (no collect);
  * frame sampling is a flatMap whose fan-out is bounded by
  * `meta.durationMs / frameEveryMs`; repartitioning by media kind
  * co-locates records that share a codec so a batch touches one decoder.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
                       sampleRateHz: Int, durationMs: Long)

  case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

  /** One extracted feature row per media record. */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                           checksum: Long, brightness: Double)

  case class Frame(doc_id: Long, frame_idx: Int, offset_ms: Long,
                   bytes: Array[Byte])

  private val kinds = Array("image", "audio", "video")

  /** Build a media table from the documents table: the text bytes stand
    * in for an encoded payload (DETERMINISTIC FAKE — a real pipeline
    * reads the bytes from object storage), metadata derived
    * deterministically from doc_id. */
  def asMedia(docs: DataFrame)(implicit s: SparkSession): Dataset[MediaRecord] = {
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val kind = kinds((id % 3).toInt)
        val meta = MediaMeta(kind,
          width = 64 + (id % 8).toInt * 32,
          height = 64 + (id % 5).toInt * 32,
          sampleRateHz = if (kind == "audio") 16000 else 0,
          durationMs = if (kind == "image") 0L else 1000L + (id % 7) * 500L)
        MediaRecord(id, text.getBytes("UTF-8"), meta)
    }
  }

  /** ===== STUB KERNELS (deterministic fakes; see object Scaladoc) ===== */

  /** "Decode + feature-extract": byte checksum and a fake brightness.
    * A real implementation decodes the payload; the iterator-in /
    * iterator-out batch contract is the real part. */
  def extractFeatures(media: Dataset[MediaRecord])(implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    media.mapPartitions { batch =>
      // per-partition setup happens once (codec init in a real kernel)
      batch.map { r =>
        var sum = 0L
        var i = 0
        while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(r.doc_id, r.meta.kind, r.payload.length, sum,
          if (r.payload.length == 0) 0.0 else sum.toDouble / r.payload.length / 255.0)
      }
    }
  }

  /** "Resize": truncate the payload to w*h/8 bytes and stamp new dims —
    * stands in for a pixel resample; metadata propagation is the real
    * contract. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int)(implicit s: SparkSession): Dataset[MediaRecord] = {
    import s.implicits._
    media.map { r =>
      val cap = math.max(1, w * h / 8)
      r.copy(payload = r.payload.take(cap),
        meta = r.meta.copy(width = w, height = h))
    }
  }

  /** "Frame sampling": one frame per `everyMs` of duration, bytes sliced
    * round-robin from the payload — a real kernel seeks keyframes; the
    * bounded flatMap fan-out is the real contract. */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long)(implicit s: SparkSession): Dataset[Frame] = {
    import s.implicits._
    media.filter(_.meta.kind == "video").flatMap { r =>
      val n = math.max(1, (r.meta.durationMs / everyMs).toInt)
      val chunk = math.max(1, r.payload.length / n)
      (0 until n).iterator.map { i =>
        Frame(r.doc_id, i, i * everyMs,
          r.payload.slice(i * chunk, math.min((i + 1) * chunk, r.payload.length)))
      }
    }
  }

  /** ===== Oracle-checkable query over the binary column ===== */

  /** Binary-column metadata summary: payload byte length, md5 digest and
    * derived kind per document — exercises binary encode/digest in the
    * scan layer (DuckDB computes the identical digest over the same
    * bytes). */
  def q29MultimodalMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        element_at(typedLit(kinds.toSeq), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        length(to_binary(col("text"), lit("utf-8"))).as("n_bytes"),
        md5(to_binary(col("text"), lit("utf-8"))).as("digest"))

  val q29Sql: String =
    """SELECT doc_id,
      |  ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS digest
      |FROM documents""".stripMargin

  /** The FRAME-SAMPLING pipeline under the gate: every video document
    * runs through the REAL typed path (asMedia → sampleFrames flatMap)
    * and the resulting frame stream aggregates to a manifest —
    * (doc, n_frames, total payload bytes sliced). The oracle recomputes
    * the fan-out arithmetic in closed form (n = max(1, dur/250ms),
    * chunk = max(1, len/n), total = min(len, n·chunk)), so any drift in
    * the slicing/fan-out contract — the part a real decoder swap must
    * preserve — hash-fails even though the kernel itself is a stub.
    *
    * Scale shape: bounded flatMap fan-out (dur/everyMs frames per
    * record), partial-agg manifest; payloads never leave executors. */
  def q172FrameManifest(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    sampleFrames(asMedia(Tables.documents(s, d)), everyMs = 250L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("bytes"))).cast("long").as("total_bytes"))
  }

  val q172Sql: String =
    """WITH v AS (
      |  SELECT doc_id, octet_length(encode(text)) AS len,
      |    1000 + (doc_id % 7) * 500 AS dur
      |  FROM documents WHERE doc_id % 3 = 2),
      |c AS (
      |  SELECT doc_id, len, greatest(1, dur // 250) AS n FROM v),
      |f AS (
      |  SELECT doc_id, n, len, greatest(1, len // n) AS chunk FROM c)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_frames,
      |  CAST(least(len, n * chunk) AS BIGINT) AS total_bytes
      |FROM f""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q29_multimodal_meta" -> (q29MultimodalMeta _, q29Sql),
    "q172_frame_manifest" -> (q172FrameManifest _, q172Sql),
  )
}
