package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * extensions) is registered here as a named query with, where the
  * semantics are SQL-expressible, a DuckDB oracle statement producing the
  * same column names and values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  private def modules: Seq[Map[String, ((SparkSession, String) => DataFrame, String)]] =
    Seq(Relational.all, TextOps.all, Dedup.all, Similarity.all,
      TextAnalysis.all, Multimodal.all, Asof.all, Curation.all, Skew.all,
      Storage.all, Analytics.all, Vocab.all, Graph.all, BloomPrune.all,
      SqlSurface.all, SketchPlanner.all)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatten.map { case (name, (fn, _)) => name -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatten.collect {
      case (name, (_, sql)) if sql.nonEmpty => name -> sql
    }.toMap
}
