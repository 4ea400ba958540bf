package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}
import graft.SparkSpec
import graft.operators.Multimodal._

class MultimodalSpec extends SparkSpec {
  implicit private lazy val s: org.apache.spark.sql.SparkSession = spark
  import spark.implicits._

  private def docs() =
    Seq((0L, "alpha bravo"), (1L, "charlie delta echo"), (2L, "foxtrot"),
      (3L, "golf hotel india juliet"), (4L, "kilo"), (5L, "lima mike november"))
      .toDF("doc_id", "text")

  test("media schema: binary payload + typed metadata struct") {
    val media = asMedia(docs())
    val sch = media.schema
    assert(sch("payload").dataType === BinaryType)
    val meta = sch("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSet ===
      Set("kind", "width", "height", "sampleRateHz", "durationMs"))
    assert(media.count() === 6)
  }

  test("feature extraction streams partition batches without losing records") {
    val media = asMedia(docs()).repartition(3)
    val feats = extractFeatures(media).collect()
    assert(feats.length === 6)
    val byId = feats.map(f => f.doc_id -> f).toMap
    // deterministic stub: checksum = sum of utf-8 bytes
    assert(byId(0L).checksum === "alpha bravo".getBytes("UTF-8").map(_ & 0xff).sum.toLong)
    assert(byId(0L).n_bytes === 11)
    assert(feats.forall(f => f.brightness >= 0.0 && f.brightness <= 1.0))
    assert(feats.map(_.kind).toSet === Set("image", "audio", "video"))
  }

  test("resize caps payload and stamps new dimensions") {
    val out = resize(asMedia(docs()), 16, 16).collect()
    assert(out.forall(_.payload.length <= 32))
    assert(out.forall(r => r.meta.width === 16 && r.meta.height === 16))
    assert(out.map(_.doc_id).sorted.toSeq === (0L to 5L))
  }

  test("frame sampling: fan-out bounded by duration/everyMs, video only") {
    val media = asMedia(docs())
    val frames = sampleFrames(media, everyMs = 500L).collect()
    val videoIds = media.collect().filter(_.meta.kind == "video").map(_.doc_id).toSet
    assert(frames.map(_.doc_id).toSet === videoIds)
    val byId = frames.groupBy(_.doc_id)
    media.collect().filter(_.meta.kind == "video").foreach { r =>
      val expect = math.max(1, (r.meta.durationMs / 500L).toInt)
      assert(byId(r.doc_id).length === expect, s"doc ${r.doc_id}")
      assert(byId(r.doc_id).map(_.frame_idx).sorted.toSeq === (0 until expect))
    }
  }

  test("repartition by kind co-locates codec batches") {
    val media = asMedia(docs()).repartition(3, col("meta.kind"))
    val perPartKinds = media.rdd
      .mapPartitions(it => Iterator(it.map(_.meta.kind).toSet))
      .collect()
    // hash partitioning co-locates: every kind appears in exactly ONE
    // partition (two kinds may share a partition on hash collision)
    Seq("image", "audio", "video").foreach { k =>
      assert(perPartKinds.count(_.contains(k)) === 1, s"kind $k split")
    }
    assert(media.count() === 6)
  }

  // ── payload fingerprint + Hamming-banded near-dup ────────────────────

  /** Deterministic "payload" corpus for the recall pin: a 4096-char base
    * drawn from a seeded RNG, near-dups made by IN-PLACE character
    * edits (the alignment-preserving edit class the stride-4 gram
    * sampling is built for), plus unrelated payloads from other seeds.
    * Radius 3 on a 60-bit simhash is a VERY-near-dup regime: each edit
    * perturbs 2 of ~1023 grams, so a handful of edits (or a ~2%
    * truncation) moves a few bits while unrelated payloads sit at the
    * ~30-bit random baseline — the separation the pin asserts. */
  private def seededPayloads() = {
    def randText(seed: Long, n: Int): String = {
      val rng = new scala.util.Random(seed)
      val sb = new StringBuilder
      (0 until n).foreach(_ => sb += (33 + rng.nextInt(94)).toChar)
      sb.toString
    }
    val base = randText(7L, 4096)
    def edited(nEdits: Int, seed: Long): String = {
      val rng = new scala.util.Random(seed)
      val arr = base.toCharArray
      (0 until nEdits).foreach { _ =>
        arr(rng.nextInt(arr.length)) = (33 + rng.nextInt(94)).toChar
      }
      new String(arr)
    }
    Seq(
      (0L, base),              // anchor
      (1L, base),              // exact duplicate → hamming 0
      (2L, edited(2, 11L)),    // 2 in-place edits → near-dup
      (3L, edited(4, 13L)),    // 4 in-place edits → near-dup
      (4L, randText(99L, 4096)),  // unrelated
      (5L, randText(123L, 4096)), // unrelated
      (6L, base.take(4000))    // aligned ~2% truncation → near-dup
    ).toDF("doc_id", "text")
  }

  test("payload fingerprint: exact dup at hamming 0; in-place edits and truncation within radius; unrelated payloads outside") {
    val pairs = Multimodal.fingerprintPairs(
        Multimodal.payloadFingerprints(seededPayloads()))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((0L, 1L)) === Some(0L), s"exact dup must be hamming 0: $pairs")
    assert(pairs.contains((0L, 2L)), s"2-edit near-dup missed: $pairs")
    assert(pairs.contains((0L, 3L)), s"4-edit near-dup missed: $pairs")
    assert(pairs.contains((0L, 6L)), s"aligned truncation missed: $pairs")
    // unrelated payloads never pair with the anchor family
    assert(!pairs.keys.exists { case (a, b) => a >= 4L && a <= 5L || b >= 4L && b <= 5L },
      s"unrelated payload paired: $pairs")
  }

  test("native payload_simhash == the builtin-expression vote aggregation, interpreted and codegen") {
    // seeded payloads (ascii, incl. sub-gram + empty) AND real corpus
    // text (multibyte-safe: hex is computed from utf-8 bytes either way)
    val crafted = seededPayloads()
      .union(Seq((100L, "short"), (101L, ""), (102L, "exactly8")).toDF("doc_id", "text"))
    val corpus = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (df <- Seq(crafted, corpus)) {
      val native = Multimodal.payloadFingerprints(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val agg = Multimodal.payloadFingerprintsAgg(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native === agg)
    }
    // interpreted path (no codegen) must agree too
    val expr = graft.functions.PayloadSimhash.PayloadSimhashExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(
        "exactly8pluspayloadbytes".getBytes("UTF-8")))
    val interpreted = expr.eval(null)
    val viaDf = Multimodal.payloadFingerprints(
        Seq((0L, "exactly8pluspayloadbytes")).toDF("doc_id", "text"))
      .collect()(0).getLong(1)
    assert(interpreted === viaDf)
    // sub-gram payload → NULL (the no-row convention)
    assert(graft.functions.PayloadSimhash.payloadSimhash("tiny".getBytes) == null)
  }

  test("payload fingerprints are deterministic and 60-bit") {
    val fps = Multimodal.payloadFingerprints(seededPayloads())
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val again = Multimodal.payloadFingerprints(seededPayloads())
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fps.toSeq === again.toSeq)
    assert(fps.forall { case (_, fp) => fp >= 0L && fp < (1L << 60) })
    // identical payloads → identical fingerprints
    assert(fps(0)._2 === fps(1)._2)
  }
}
