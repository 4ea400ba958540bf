package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines over the
  * documents table: exact (normalize → hash → group), MinHash-LSH
  * near-dup (shingle → minhash → band → bucket-join — candidate pairs
  * come ONLY from shared LSH buckets, never an all-pairs product),
  * SimHash fingerprints, and n-gram Jaccard via an inverted-index join.
  *
  * Scale notes (100 TB):
  *   - Exact dedup is one hash-groupBy — the canonical first pass.
  *   - MinHash-LSH: cost is Σ_bucket |bucket|², bounded by band width
  *     choice, vs n² for all-pairs. Signatures (64 longs) shuffle instead
  *     of full texts.
  *   - n-gram Jaccard joins on shared trigrams (document-frequency
  *     bounded); production would add prefix filtering to cut the
  *     candidate set further.
  *   - Everything is built-in expressions → whole-stage codegen; no UDFs.
  */
object Dedup {
  import Tables._

  /** lower → collapse whitespace → trim: the usual text canonicalization
    * before exact hashing. */
  private def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Exact dedup: group by md5 of normalized text; keep the smallest
    * doc_id (keep-first), count copies. */
  def q20ExactDedup(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(normText(col("text"))).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  val q20Sql: String =
    """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
      |  min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Word tokens of normalized text as an array column. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z]+"), t => length(t) > 0)

  /** Distinct word 3-gram shingles from a `toks` array column; degenerate
    * short docs fall back to the whole token string so every doc has ≥1
    * shingle. */
  def shinglesFromToks: Column =
    array_distinct(
      when(size(col("toks")) >= 3,
        expr("transform(sequence(0, size(toks) - 3)," +
          " i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))"))
        .otherwise(array(concat_ws(" ", col("toks")))))

  /** Distinct word 3-gram shingles of a text column. */
  def withShingles(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("toks", tokens(col(textCol)))
      .withColumn("sh", shinglesFromToks)
      .drop("toks")

  /** k=64 MinHash signature: for seed j, min over shingles of
    * xxhash64(shingle, j). Pure array expressions — codegen'd, no UDF. */
  def minhashSig(k: Int): Column =
    expr(s"transform(sequence(0, ${k - 1})," +
      " j -> array_min(transform(sh, s -> xxhash64(s, j))))")

  /** MinHash-LSH near-dup pairs, banded: 16 bands × 4 rows over a 64-hash
    * signature; candidates share ≥1 band key; exact shingle Jaccard
    * verifies candidates (≥ 0.8). The oracle computes the TRUE pair set
    * with an exact inverted-index join — so this gate also measures LSH
    * recall: at s = 0.8, P(pair shares a band) = 1-(1-s⁴)¹⁶ ≈ 0.9998,
    * and the corpus's seeded near-dups (jaccard 0.9-0.99) are found with
    * near-certainty (hashes are fixed, so the result is deterministic —
    * verified green at sf0.01; DedupSpec covers mutated copies too). */
  def q21MinhashNeardup(s: SparkSession, d: String): DataFrame =
    neardupPairs(documents(s, d).select(col("doc_id"), col("text")),
      bands = 16, rowsPerBand = 4, threshold = 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

  private def exactJaccardSql(threshold: Double): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS ws
       |  FROM documents),
       |glists AS (
       |  SELECT doc_id, CASE WHEN len(ws) >= 3
       |    THEN list_distinct(list_transform(range(1, len(ws) - 1),
       |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
       |    ELSE [array_to_string(ws, ' ')] END AS gs
       |  FROM toks),
       |grams AS (SELECT DISTINCT doc_id, unnest(gs) AS g FROM glists),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ninter
       |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  round(CAST(ninter AS DOUBLE) / (sa.sz + sb.sz - ninter), 6) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = id_a
       |JOIN sizes sb ON sb.doc_id = id_b
       |WHERE CAST(ninter AS DOUBLE) / (sa.sz + sb.sz - ninter) >= $threshold""".stripMargin

  val q21Sql: String = exactJaccardSql(0.8)

  /** The general banded-LSH near-dup pipeline over (doc_id, text). */
  def neardupPairs(docs: DataFrame, bands: Int, rowsPerBand: Int,
                   threshold: Double): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = withShingles(docs, "text")
      .withColumn("sig", minhashSig(k))
      .select(col("doc_id"), col("sh"), col("sig"))

    // band key = murmur3 of the signature slice; shared key ⇒ candidate.
    val banded = sigs.select(col("doc_id"), col("sh"),
      explode(expr(s"transform(sequence(0, ${bands - 1})," +
        s" b -> struct(b AS band, hash(slice(sig, b * $rowsPerBand + 1, $rowsPerBand)) AS bkey))")).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bkey"))

    val a = banded.select(col("band"), col("bkey"),
      col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bkey"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct() // a pair may share many bands
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash fingerprint per document: each token votes ±1 on each
    * bit of its xxhash64; bit b of the fingerprint is 1 iff the vote sum
    * is positive. Near-dups land within small Hamming distance (asserted
    * in DedupSpec; not SQL-oracle-expressible — DuckDB lacks xxhash64). */
  def q31Simhash(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("simhash",
        expr("""aggregate(sequence(0, 63), 0L, (acc, b) ->
               |  acc + CASE WHEN aggregate(toks, 0L,
               |    (v, t) -> v + CAST(shiftright(xxhash64(t), b) & 1 AS LONG) * 2 - 1) > 0
               |  THEN shiftleft(1L, b) ELSE 0L END)""".stripMargin))
      .select(col("doc_id"), col("simhash"))

  /** Exact n-gram (word trigram) Jaccard over candidate pairs that share
    * at least one trigram — an inverted-index join, not a cross product.
    * Output: pairs with Jaccard ≥ 0.2 (on this corpus the planted-free
    * result is whatever genuinely overlaps; both engines agree). */
  def q22NgramJaccard(s: SparkSession, d: String): DataFrame = {
    val grams = withShingles(documents(s, d), "text")
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .distinct()
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = grams.select(col("doc_id").as("id_a"), col("g"))
      .join(grams.select(col("doc_id").as("id_b"), col("g")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("ninter"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard", col("ninter").cast("double") /
        (col("sz_a") + col("sz_b") - col("ninter")).cast("double"))
      .filter(col("jaccard") >= 0.2)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  val q22Sql: String = exactJaccardSql(0.2)

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q20_exact_dedup"     -> (q20ExactDedup _, q20Sql),
    "q21_minhash_neardup" -> (q21MinhashNeardup _, q21Sql),
    "q22_ngram_jaccard"   -> (q22NgramJaccard _, q22Sql),
    "q31_simhash"         -> (q31Simhash _, ""),
  )
}
