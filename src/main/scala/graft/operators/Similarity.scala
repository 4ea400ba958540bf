package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (embedding:
  * array<float> x 64).
  *
  * Layers:
  *   - [[q23KnnExact]]: brute-force cosine top-k for a bounded query set —
  *     the baseline AND the honest scale path for few queries: the query
  *     side is broadcast, the corpus streams through one scan, top-k via
  *     per-query window. No corpus x corpus product anywhere.
  *   - [[annIvf]]: IVF-style partitioned ANN — assign every vector to its
  *     nearest sampled centroid (broadcast centroid table), probe only
  *     `nprobe` cells per query, exact rerank inside cells. At 100 TB the
  *     cell assignment is the partition key: each probe touches
  *     nprobe/ncells of the corpus.
  *   - [[signBuckets]]: random-hyperplane sign-LSH buckets for
  *     embedding-cosine NEAR-DUP detection (cos ≈ 1 pairs collide with
  *     high probability; multiple tables for recall). Bucket-join only —
  *     never all-pairs.
  *
  * All vector math is built-in array expressions (zip_with / aggregate /
  * transform) in double precision — codegen-friendly, no UDFs.
  */
object Similarity {
  import Tables._

  /** Corpus with double-cast embedding and precomputed L2 norm. */
  def vectors(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("e"))
      .withColumn("norm", expr("sqrt(aggregate(e, 0D, (a, x) -> a + x * x))"))

  private val dotQE = "aggregate(zip_with(e, qe, (x, y) -> x * y), 0D, (a, x) -> a + x)"

  /** Exact cosine top-10 neighbors for each query vector (vec_id < 10).
    * Cosine rounded to 1e-6 before ranking so the cut is stable across
    * engines; ties broken by neighbor id. */
  def q23KnnExact(s: SparkSession, d: String): DataFrame = {
    val v = vectors(s, d)
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("norm").as("qn"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("sim", round(expr(dotQE) / (col("norm") * col("qn")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        col("rnk"), col("sim"))
  }

  val q23Sql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
      |s AS (SELECT qid, vec_id AS nid, round(list_cosine_similarity(qe, e), 6) AS sim
      |      FROM q, v WHERE vec_id <> qid)
      |SELECT qid AS query_id, nid AS neighbor_id, rnk, sim
      |FROM (SELECT qid, nid, sim,
      |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
      |      FROM s)
      |WHERE rnk <= 10""".stripMargin

  /** IVF ANN: deterministically sample centroids (vec_id % stride = 0),
    * assign each corpus vector to its nearest centroid (broadcast join +
    * per-vector argmax), probe the `nprobe` nearest cells per query and
    * exact-rerank only inside them. Returns (query_id, neighbor_id, rnk,
    * sim) like the exact path — recall measured against it in
    * SimilaritySpec. */
  def annIvf(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
             centroidStride: Int): DataFrame = {
    val cents = corpus.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("norm").as("cn"))
    val dotCE = "aggregate(zip_with(e, ce, (x, y) -> x * y), 0D, (a, x) -> a + x)"

    def assign(df: DataFrame, keep: Int): DataFrame = {
      val byVec = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("cid"))
      df.crossJoin(broadcast(cents))
        .withColumn("csim", expr(dotCE) / (col("norm") * col("cn")))
        .withColumn("crnk", row_number().over(byVec))
        .filter(col("crnk") <= keep)
        .drop("ce", "cn", "csim", "crnk")
    }

    val cells = assign(corpus, 1)
    val probes = assign(queries, nprobe)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("norm").as("qn"), col("cid"))
    val byQ = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    cells.join(probes, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(expr(dotQE) / (col("norm") * col("qn")), 6))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        col("rnk"), col("sim"))
  }

  /** Sign-LSH bucket ids: `tables` independent tables of `bits`
    * hyperplanes each; hyperplane component i for plane h is ±1 derived
    * from xxhash64(i, h). Vectors with cosine ≈ 1 agree on nearly every
    * sign bit, so they share a bucket in ≥1 table with high probability. */
  def signBuckets(tables: Int, bits: Int): org.apache.spark.sql.Column =
    expr(
      s"""transform(sequence(0, ${tables - 1}), t -> struct(t AS tbl,
         |  aggregate(sequence(0, ${bits - 1}), 0L, (acc, b) -> acc * 2 +
         |    CASE WHEN aggregate(
         |      zip_with(e, sequence(0, size(e) - 1),
         |        (x, i) -> x * (CAST(xxhash64(i, t * $bits + b) & 1 AS DOUBLE) * 2 - 1)),
         |      0D, (a, x) -> a + x) > 0 THEN 1 ELSE 0 END) AS bucket))""".stripMargin)

  /** Embedding-cosine near-dup pairs via sign-LSH bucket join + exact
    * cosine verification — the vector analog of MinHash-LSH text dedup. */
  def embeddingNeardup(corpus: DataFrame, tables: Int, bits: Int,
                       minCos: Double): DataFrame = {
    val bucketed = corpus
      .select(col("vec_id"), col("e"), col("norm"),
        explode(signBuckets(tables, bits)).as("bb"))
      .select(col("vec_id"), col("e"), col("norm"),
        col("bb.tbl"), col("bb.bucket"))
    val a = bucketed.select(col("tbl"), col("bucket"), col("vec_id").as("id_a"),
      col("e").as("ea"), col("norm").as("na"))
    val b = bucketed.select(col("tbl"), col("bucket"), col("vec_id").as("id_b"),
      col("e").as("eb"), col("norm").as("nb"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ea"), col("eb"), col("na"), col("nb"))
      .dropDuplicates("id_a", "id_b") // a pair may share buckets in several tables
      .withColumn("cos",
        expr("aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (a, x) -> a + x)") /
          (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q23_knn_exact" -> (q23KnnExact _, q23Sql),
  )
}
