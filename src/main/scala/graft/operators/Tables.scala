package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). Each loader is a plain parquet scan — Catalyst
  * pushes filters and prunes columns into it, which is the whole point:
  * at 100 TB the scan must read only the columns/row-groups a query needs.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark 4.x
    * rejects outright on read. Read it as raw long nanos
    * (`legacy.parquet.nanosAsLong` — set once at session build in
    * GraftSession, NOT mutated here per call) and convert with integer
    * arithmetic: epoch-nanos ≈ 1.7e18 exceeds double's 53-bit integer
    * precision, so a `/1e9` double divide would corrupt microseconds —
    * `ts div 1000` keeps the conversion exact and matches DuckDB's
    * CAST(ts AS TIMESTAMP) micros truncation. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet needs spark.sql.legacy.parquet.nanosAsLong=true " +
        "(set by GraftSession.builder)")
    t(s, d, "events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
