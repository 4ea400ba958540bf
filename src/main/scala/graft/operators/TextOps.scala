package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.mr.MRJob

/** The reference's two real queries (wc: src/mrapps/wc.go:21-44,
  * indexer: src/mrapps/indexer.go:20-39) as Catalyst plans over the
  * documents table — plus the same wordcount routed through the generic
  * MR facade, so the driver's DuckDB gate checks the facade itself.
  *
  * Scale notes:
  *   - The DataFrame wordcount gets map-side partial aggregation the
  *     reference lacks (it ships one record per word *occurrence* —
  *     623,948 intermediate records for a 3.3 MB corpus; partial agg
  *     collapses that before the shuffle).
  *   - The inverted index's posting lists (collect_list) are bounded by
  *     the number of documents containing the word — inherent to the
  *     operator's output, same as the reference's Reduce. At 100 TB you'd
  *     cap or shard postings for stop-words; kept faithful here.
  */
object TextOps {
  import Tables._

  /** Tokenize on non-letter runs, matching the wc.go tokenizer for the
    * ASCII corpus (and the DuckDB oracle's string_split_regex). */
  private val tokenRe = "[^a-zA-Z]+"

  /** Q1 wc as a Catalyst plan: split → explode → filter → count.
    * One shuffle with partial aggregation. */
  def q18Wordcount(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(col("text"), tokenRe)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  val q18Sql: String =
    """SELECT w AS word, count(*) AS n FROM (
      |  SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS w FROM documents
      |) WHERE w <> '' GROUP BY w""".stripMargin

  /** Q2 indexer as a Catalyst plan: per-doc distinct words, then per word
    * the doc count and the sorted comma-joined posting list — the exact
    * output shape of indexer.go:36-39 ("<count> <doc1,doc2,...>" split
    * into typed columns). Two shuffles: dedup on (word, doc), group on
    * word. */
  def q19InvertedIndex(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id").cast("string").as("doc"),
        explode(split(col("text"), tokenRe)).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",", sort_array(collect_list(col("doc")))).as("docs"))

  val q19Sql: String =
    """SELECT word, count(*) AS n_docs, string_agg(doc, ',' ORDER BY doc) AS docs
      |FROM (
      |  SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc, w AS word FROM (
      |    SELECT doc_id, unnest(string_split_regex(text, '[^a-zA-Z]+')) AS w
      |    FROM documents)
      |  WHERE w <> ''
      |) GROUP BY word""".stripMargin

  /** The same wordcount routed through the generic MR facade
    * (graft.mr.MRJob): documents.text → (word,"1") pairs → FNV shuffle →
    * sorted group-scan → counts. Checked against the SAME oracle as q18,
    * so the driver gate verifies facade semantics, not just the Catalyst
    * plan. */
  def q30MrWordcount(s: SparkSession, d: String): DataFrame = {
    val pairs = documents(s, d)
      .select(col("text"))
      .rdd
      .flatMap(r => r.getString(0).split(tokenRe).iterator
        .filter(_.nonEmpty).map(w => (w, "1")))
    val counted = MRJob.onPairs(pairs, (_, vs) => vs.size.toString, nReduce = 32)
    s.createDataFrame(counted.map { case (w, n) => org.apache.spark.sql.Row(w, n.toLong) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("word", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType))))
  }

  /** The indexer routed through the generic MR facade, completing the
    * facade-gated pair (q30 = wc, q118 = indexer — the reference's only
    * two real workloads). Map emits each word ONCE per document via a
    * per-doc set (indexer.go:26-31 does the same dedup with a map);
    * reduce receives the posting docs, sorts them, and emits the
    * reference's exact `"<count> <doc1,doc2,...>"` value
    * (indexer.go:36-39), which we split into the q19 oracle's typed
    * columns. Per-task memory is one document's vocab on the map side
    * and one word's posting list on the reduce side — the same inherent
    * bounds as q19's collect_list. */
  def q118MrIndexer(s: SparkSession, d: String): DataFrame = {
    val pairs = documents(s, d)
      .select(col("doc_id").cast("string").as("doc"), col("text"))
      .rdd
      .flatMap { r =>
        val doc = r.getString(0)
        r.getString(1).split(tokenRe).iterator.filter(_.nonEmpty)
          .toSet[String].iterator.map(w => (w, doc))
      }
    val reduced = MRJob.onPairs(pairs, (_, vs) => {
      val docs = vs.toArray.distinct.sorted
      s"${docs.length} ${docs.mkString(",")}"
    }, nReduce = 32)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("word",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_docs",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("docs",
        org.apache.spark.sql.types.StringType)))
    s.createDataFrame(reduced.map { case (w, v) =>
      val sp = v.indexOf(' ')
      org.apache.spark.sql.Row(w, v.substring(0, sp).toLong, v.substring(sp + 1))
    }, schema)
  }

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q18_wordcount"      -> (q18Wordcount _, q18Sql),
    "q19_inverted_index" -> (q19InvertedIndex _, q19Sql),
    "q30_mr_wordcount"   -> (q30MrWordcount _, q18Sql),
    "q118_mr_indexer"    -> (q118MrIndexer _, q19Sql),
  )
}
