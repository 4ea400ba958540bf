package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB design point.
  *
  * First line of defense is AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on in GraftSession) — it
  * needs no code changes and splits oversized partitions at runtime
  * (demonstrated in SkewSpec). Salting is the explicit fallback for
  * cases AQE can't fix: skewed AGGREGATION keys, or a skewed join where
  * both sides are too large to split effectively.
  */
object Skew {

  /** Salted equi-join: the (large, skewed) fact side scatters each row
    * into one of `salts` sub-keys; the dim side replicates `salts`×.
    * A hot key's rows spread over `salts` reducers instead of one.
    * Result is row-identical to the plain join (asserted in SkewSpec);
    * cost is the dim-side replication — use for bounded dims only. */
  /** The salt must be DETERMINISTIC in row content: deriving it from
    * monotonically_increasing_id()/rand() makes a shuffle key that can
    * change when a stage retry recomputes a partition, losing or
    * duplicating rows (the SPARK-23207 class of bug). Hashing every
    * column routes a recomputed row identically. Caveat: byte-identical
    * duplicate rows share a salt, so a hot key of pure duplicates stays
    * hot — the right tool there is pre-aggregating the duplicates, not
    * salting. */
  private def contentSalt(df: DataFrame, salts: Int): org.apache.spark.sql.Column = {
    // xxhash64 rejects MapType anywhere in a nested type (no canonical
    // order) — exclude columns containing maps at ANY depth; rows
    // differing only in excluded columns then share a salt, which is a
    // spread concern, never a correctness one
    import org.apache.spark.sql.types._
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType    => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType  => containsMap(a.elementType)
      case _             => false
    }
    val hashable = df.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    require(hashable.nonEmpty, "saltedJoin/saltedCount need ≥1 non-map column")
    pmod(xxhash64(hashable: _*), lit(salts.toLong)).cast("int")
  }

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val salted = fact.withColumn("__salt", contentSalt(fact, salts))
    val replicated = dim.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key — the map-side-combine idea made
    * explicit for aggregates Spark can't partially compute (e.g. exact
    * count-distinct per hot key would need it; plain sums/counts get
    * partial agg automatically and don't need this). */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt", contentSalt(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))

  /** The salted aggregation under the DRIVER gate: per-type event
    * counts through the two-phase (key, salt) → key plan must equal
    * the plain GROUP BY the oracle runs — salting redistributes work,
    * never results. events.user/event_type skew is the realistic
    * shape; 16 salts spread any hot type over 16 reducers. */
  def q58SkewAgg(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    saltedCount(Tables.events(s, d), "event_type", salts = 16)
      .select(col("event_type"), col("n"))

  val q58Sql: String =
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"

  val all: Map[String, ((org.apache.spark.sql.SparkSession, String) => DataFrame, String)] =
    Map("q58_skew_agg" -> (q58SkewAgg _, q58Sql))
}
