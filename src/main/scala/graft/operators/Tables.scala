package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). Each loader is a plain parquet scan — Catalyst
  * pushes filters and prunes columns into it, which is the whole point:
  * at 100 TB the scan must read only the columns/row-groups a query needs.
  */
object Tables {
  /** Inferred parquet schema per table path — what a real engine's
    * catalog holds. Without it EVERY DataFrame build re-infers the
    * schema (driver-side footer read + listing, measured 90–135 ms per
    * cheap query at sf0.1 — the dominant build cost; guide §5 "the
    * driver should do almost no data work", §6 listing/planning). Keyed
    * by path: the testdata dirs are immutable per path, and the first
    * reference still reads the real footer, so dtype variance across
    * testdata generations (events.ts) is preserved. Metadata only —
    * never rows. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val p = s"$dir/$name.parquet"
    val sch = schemaCache.computeIfAbsent(p, _ => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(p)
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")

  /** events.parquet has shipped `ts` under two physical types across
    * testdata generations, so normalize by the *loaded* dtype rather than
    * assuming one:
    *   - parquet TIMESTAMP(NANOS): Spark 4.x rejects it on read unless
    *     `legacy.parquet.nanosAsLong=true` (set once at session build in
    *     GraftSession), which surfaces it as a raw LongType of epoch-nanos.
    *     Convert with integer arithmetic: epoch-nanos ≈ 1.7e18 exceeds
    *     double's 53-bit integer precision, so a `/1e9` double divide would
    *     corrupt microseconds — `ts div 1000` keeps the conversion exact and
    *     matches DuckDB's CAST(ts AS TIMESTAMP) micros truncation.
    *   - parquet timestamp[us] (isAdjustedToUTC=false): Spark reads it
    *     natively as TIMESTAMP_NTZ; cast to session-TZ TIMESTAMP, which is
    *     exact under the UTC session timezone GraftSession pins.
    * Either way every consumer sees `ts: timestamp` in UTC micros. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts loaded as unexpected type $other (dir=$d); " +
            "expected LongType (nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
