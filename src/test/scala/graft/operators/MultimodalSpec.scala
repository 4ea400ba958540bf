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
}
