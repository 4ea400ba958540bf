package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.operators.Curation

/** Bit-parity pins for the native `chunk_stats` kernel against the
  * token-array reference pipeline it replaced (docTokens +
  * chunksOfTokens at width == stride — the md5-over-joined-tokens
  * contract every chunk oracle states in DuckDB SQL). */
class ChunkStatsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(2411L + i)))

  private def referenceRows(docs: org.apache.spark.sql.DataFrame, w: Int) =
    Curation.chunksOfTokens(Curation.docTokens(
      docs.select(col("doc_id"), col("text"))), w, w)
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
        col("chunk_hash"))

  private def nativeRows(docs: org.apache.spark.sql.DataFrame, w: Int) =
    Curation.chunkRows(docs.select(col("doc_id"), col("text")), w)
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
        col("chunk_hash"))

  test("edge inputs: letterless, empty, unicode-lowercase aliasing, exact/short/multi chunks") {
    val docs = Seq(
      (1L, "aa bb cc dd"),              // exactly one width-4 chunk
      (2L, "aa bb cc dd ee"),           // chunk + 1-token tail
      (3L, "Aa BB cC"),                 // uppercase folds before hashing
      (4L, "123 !!! ..."),              // letterless -> zero rows
      (5L, ""),                         // empty -> zero rows
      (6L, "İstanbul héllo"), // İ lowers to i+combining dot -> 'i' + 'stanbul'; é splits h/llo
      (7L, "x" * 3000),                 // one enormous token
      (8L, (1 to 23).map(i => s"w$i").mkString(" ")) // digits split tokens
    ).toDF("doc_id", "text")
    Seq(1, 4, 20).foreach { w =>
      val ref = referenceRows(docs, w).collect().map(_.toSeq).toSet
      val got = nativeRows(docs, w).collect().map(_.toSeq).toSet
      assert(got === ref, s"width $w")
    }
    // letterless/empty docs are absent entirely
    val ids = nativeRows(docs, 4).select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(!ids.contains(4L) && !ids.contains(5L))
    // and the hash really is Spark's md5 of the joined tokens
    val one = nativeRows(docs.filter(col("doc_id") === 1L), 4)
      .select("chunk_hash").as[String].collect().head
    val viaSql = spark.sql("SELECT md5('aa bb cc dd')").as[String].collect().head
    assert(one === viaSql)
  }

  test("random unicode corpora: native == reference pipeline at several widths") {
    val textGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaStr.map(_.take(6)),
      2 -> Gen.oneOf("123", "!!!", "éß", "İ", "你好",
        "MiXeD", "", " ")))
      .map(_.mkString(" "))
    val corpusGen = Gen.listOfN(25, textGen)
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    Seq(2, 5).foreach { w =>
      samples(corpusGen, 6).zipWithIndex.foreach { case (docsSeq, k) =>
        val docs = docsSeq.toDF("doc_id", "text")
        val ref = referenceRows(docs, w).collect().map(_.toSeq).toSet
        val got = nativeRows(docs, w).collect().map(_.toSeq).toSet
        assert(got === ref, s"width $w case $k")
      }
    }
  }

  test("interpreted and codegen paths agree") {
    val docs = Seq((1L, "aa bb Cc dd ee ff"), (2L, "İ stanbul 99 xyz"))
      .toDF("doc_id", "text")
    val viaExpr = docs // codegen'd whole-stage path
      .select(col("doc_id"),
        call_function("chunk_stats", col("text"), lit(3)).as("cs"))
      .selectExpr("doc_id", "explode(cs) AS c")
      .selectExpr("doc_id", "c.chunk_hash", "c.n_chunk_tokens")
      .collect().map(_.toSeq).toSet
    // force interpreted evaluation through the kernel directly
    val interpreted = docs.as[(Long, String)].collect().flatMap { case (id, t) =>
      val arr = ChunkStats.chunkStats(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 3)
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        Seq(id, r.getUTF8String(0).toString, r.getInt(1))
      }
    }.toSet
    assert(viaExpr === interpreted)
  }
}
