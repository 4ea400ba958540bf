package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Degenerate-input robustness: every registered operator must handle an
  * EMPTY corpus and single/pathological rows without crashing — at
  * 100 TB, empty partitions, empty post-filter subtrees and letterless
  * documents are everyday inputs, not edge cases. */
class RobustnessSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("empty-sf").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // events.parquet carries raw long nanos (read via nanosAsLong)
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], evSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val emSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], custSchema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val liSchema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_shipdate", TimestampType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], liSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val ordSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", StringType),
      StructField("o_orderpriority", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ordSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val ptSchema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_size", IntegerType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ptSchema)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val supSchema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], supSchema)
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val natSchema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], natSchema)
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    dir
  }

  private val documentOps: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] =
    Seq(
      "q20_exact_dedup" -> Dedup.q20ExactDedup _,
      "q21_minhash_neardup" -> Dedup.q21MinhashNeardup _,
      "q22_ngram_jaccard" -> Dedup.q22NgramJaccard _,
      "q31_simhash" -> Dedup.q31Simhash _,
      "q24_token_stats" -> TextAnalysis.q24TokenStats _,
      "q26_tfidf_top" -> TextAnalysis.q26TfidfTop _,
      "q27_lang_id" -> TextAnalysis.q27LangId _,
      "q28_fingerprint" -> TextAnalysis.q28Fingerprint _,
      "q40_corpus_pipeline" -> TextAnalysis.q40CorpusPipeline _,
      "q43_split_assign" -> Curation.q43SplitAssign _,
      "q44_pii_redact" -> Curation.q44PiiRedact _,
      "q45_contamination" -> Curation.q45Contamination _)

  test("document/embedding/event operators return empty on an empty corpus") {
    documentOps.foreach { case (name, fn) =>
      assert(fn(spark, emptyDir).count() === 0L, name)
    }
    assert(Similarity.q23KnnExact(spark, emptyDir).count() === 0L)
    assert(Similarity.q41LabelCohesion(spark, emptyDir).count() === 0L)
    assert(Similarity.q42EmbeddingNeardup(spark, emptyDir).count() === 0L)
    assert(Relational.q15EventsHourly(spark, emptyDir).count() === 0L)
    assert(Relational.q16Sessionize(spark, emptyDir).count() === 0L)
    // round-9 operators
    assert(TextAnalysis.q120PmiBigrams(spark, emptyDir).count() === 0L)
    assert(TextAnalysis.q123SourceKl(spark, emptyDir).count() === 0L)
    assert(TextAnalysis.q128ZipfSlope(spark, emptyDir).count() === 0L)
    assert(Dedup.q121Containment(spark, emptyDir).count() === 0L)
    assert(Similarity.q126CentroidSim(spark, emptyDir).count() === 0L)
    assert(Analytics.q119OhlcBars(spark, emptyDir).count() === 0L)
    assert(Analytics.q122CumulativeUsers(spark, emptyDir).count() === 0L)
    assert(Analytics.q124Chi2(spark, emptyDir).count() === 0L)
    assert(Analytics.q127EventGaps(spark, emptyDir).count() === 0L)
    assert(Relational.q125BrandBasket(spark, emptyDir).count() === 0L)
    // round-13 operators: empty corpora flow through composed stages,
    // dynamic windows, and the funnel's rank-over-survivors without
    // crashing (the n_scored > 0 guard keeps the tercile division off
    // the empty set)
    assert(Curation.q218PplFilter(spark, emptyDir).count() === 0L)
    assert(Curation.q220PackSweep(spark, emptyDir).count() === 0L)
    assert(Curation.q222CurationFunnel(spark, emptyDir).count() === 0L)
    assert(Relational.q221DynamicSession(spark, emptyDir).count() === 0L)
    assert(Relational.q223HoppingWindow(spark, emptyDir).count() === 0L)
    assert(Relational.q225LargeOrders(spark, emptyDir).count() === 0L)
    // q224 is the zero-PRESERVING distribution: an empty ORDERS side
    // with customers present must yield one (0, n_customers) row, and
    // a fully empty corpus yields none
    assert(Relational.q224Custdist(spark, emptyDir).count() === 0L)
    // round-14 second wave: empty facts flow through the multi-join
    // topologies; the grouped shapes emit nothing, the global scalar
    // (q233) emits its single zero-count row
    assert(Relational.q230VolumeShipping(spark, emptyDir).count() === 0L)
    assert(Relational.q231NationProfit(spark, emptyDir).count() === 0L)
    assert(Relational.q232ReturnedItems(spark, emptyDir).count() === 0L)
    val q233 = Relational.q233DisjunctiveScan(spark, emptyDir).collect()
    assert(q233.length === 1 && q233.head.getLong(0) === 0L)
    assert(Curation.q234ChunkDedup(spark, emptyDir).count() === 0L)
    assert(Vocab.q235VocabCoverage(spark, emptyDir).count() === 0L)
    // q237's global aggregates emit zero rows via the n_chunks guard
    // (mirroring the oracle's GROUP BY); q236/q238 group away to none
    assert(Curation.q237ChunkSweep(spark, emptyDir).count() === 0L)
    assert(Curation.q238SplitLeakage(spark, emptyDir).count() === 0L)
    assert(Analytics.q236Spearman(spark, emptyDir).count() === 0L)
    assert(Curation.q239NoveltyCurve(spark, emptyDir).count() === 0L)
    assert(Curation.q240SourceOverlap(spark, emptyDir).count() === 0L)
    assert(Curation.q242TemplateFamilies(spark, emptyDir).count() === 0L)
    assert(Curation.q243DupAttribution(spark, emptyDir).count() === 0L)
    assert(Curation.q244NoveltyHll(spark, emptyDir).count() === 0L)
  }

  test("pathological documents: letterless, whitespace-only, huge-token, unicode") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("patho").toString
    Seq(
      (1L, "12345 67890 !!!"),          // letterless → empty token set
      (2L, "    \t\n   "),              // whitespace only
      (3L, "x" * 50000),                // one enormous token
      (4L, "héllo wörld çafé naïve"),   // diacritics (split on non a-z)
      (5L, "")                          // empty string
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // nothing throws, outputs keep one row per doc where per-doc
    Seq[(String, DataFrame)](
      "q24" -> TextAnalysis.q24TokenStats(spark, dir),
      "q28" -> TextAnalysis.q28Fingerprint(spark, dir),
      "q44" -> Curation.q44PiiRedact(spark, dir)
    ).foreach { case (n, df) => assert(df.count() === 5L, n) }
    assert(Dedup.q20ExactDedup(spark, dir).count() > 0)
    Dedup.q21MinhashNeardup(spark, dir).count() // no crash
    Dedup.q31Simhash(spark, dir).count()        // no crash
  }

  test("custdist preserves the zero-order bucket (left join + count(col), never count(*))") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the sf0.01 gate corpus has no order-less customers, so the
    // Q13-defining branch needs a crafted fixture: customers 1 and 2
    // place orders, 3 and 4 place none — they must land in c_count=0,
    // not vanish (inner join) or report 1 (count(*) over the null row)
    val dir = java.nio.file.Files.createTempDirectory("custdist").toString
    Seq((1L, "a", 0L, 0.0, "m"), (2L, "b", 0L, 0.0, "m"),
      (3L, "c", 0L, 0.0, "m"), (4L, "d", 0L, 0.0, "m"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L, "O", 5.0, "1997-01-01", "1-URGENT"),
      (11L, 1L, "O", 5.0, "1997-01-02", "1-URGENT"),
      (12L, 2L, "O", 5.0, "1997-01-03", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.q224Custdist(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }
}
