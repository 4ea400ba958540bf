package graft.operators

import graft.SparkSpec

/** Differential: the MR-facade indexer must agree exactly with the
  * Catalyst-native q19 on the real corpus — same words, same doc counts,
  * same sorted posting strings. (q30's wc facade parity is implied by both
  * sharing the q18 oracle; this is the q118 analog, checked in-suite so a
  * facade regression fails before the driver gate.) */
class TextOpsSpec extends SparkSpec {

  test("q118 MR-facade indexer == q19 DataFrame indexer on sf0.001") {
    val d = sf("sf0.001")
    val facade = TextOps.q118MrIndexer(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val native = TextOps.q19InvertedIndex(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(facade.nonEmpty)
    assert(facade === native)
  }

  test("Cohen's kappa: hand-computed confusion; chance correction penalizes the majority-class shortcut") {
    import org.apache.spark.sql.functions.{col, length, lit}
    import spark.implicits._
    // 4 true-en docs predicted en; 3 true-es docs predicted es; 1
    // true-es doc written with ENGLISH markers (predicted en):
    // n=8, agree=7, S = 4*5 + 4*3 = 32, n^2 = 64
    // kappa+1 = (8*7 - 32 + 64 - 32)/(64 - 32) = 56/32 = 1.75
    val docs =
      (1 to 4).map(i => (i.toLong, "the of and is", "en")) ++
        (5 to 7).map(i => (i.toLong, "el la los y", "es")) ++
        Seq((8L, "the of and is", "es"))
    val dir = java.nio.file.Files.createTempDirectory("kappa").toString
    docs.toDF("doc_id", "text", "lang").withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.q215CohensKappa(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("en") === ((4L, 5L, 4L, 1750000000L)))
    assert(got("es") === ((4L, 3L, 3L, 1750000000L)))
    // chance correction: raw accuracy is 7/8 = 87.5%, but kappa is 0.75
    // - the mislabeled doc costs three times more than accuracy shows
    assert(got.keySet === Set("en", "es"))
  }
}
