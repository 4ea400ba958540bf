package graft.operators

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink breadth under the driver gate (not just under specs):
  *
  *   - [[q61JsonSource]]: a registered query whose SPARK SIDE reads
  *     schema'd JSON — the scan-layer breadth FormatsSpec exercises,
  *     made driver-checkable: write a table to JSON, read it back with
  *     the parquet schema, gate the read-back against the parquet oracle
  *     relation. Any lossy type coercion on the JSON path (doubles,
  *     quoting, unicode) hash-fails the gate.
  *   - [[q62PartitionedSink]]: the F8 scale analog — a partitioned
  *     columnar SINK plus a partition-PRUNED re-scan, as one gated
  *     round-trip: the q40 surviving corpus gets its deterministic
  *     train/val/test split ([[Curation.withSplit]]), lands in parquet
  *     `partitionBy("split")`, and is read back filtered to one split.
  *     The filter must prune at the DIRECTORY level (PartitionFilters,
  *     plan-asserted in StorageSpec) — at 100 TB the re-scan reads the
  *     train/ partition only, never listing data files of val/ or test/.
  *
  * Both queries write to a scratch dir under java.io.tmpdir keyed by
  * (Spark application id × query × SF, `mode=overwrite`): stable WITHIN
  * a process, so re-runs — Verify once, Bench ×reps — are idempotent
  * and never collide across SFs, but unique ACROSS processes, so two
  * harness runs at the same SF can never interleave one's overwrite
  * with the other's read-back. The write happens eagerly at query-build
  * time; the returned DataFrame is the read-back, so the driver's hash
  * compares what a downstream consumer of the sink would actually see.
  */
object Storage {
  import Tables._

  private def scratch(s: SparkSession, tag: String, d: String): String =
    Paths.get(sys.props("java.io.tmpdir"), "graft-gate",
      s.sparkContext.applicationId, tag,
      d.replaceAll("[^A-Za-z0-9.]", "_")).toString

  /** Supplier through a JSON materialization: parquet → JSON → schema'd
    * read-back. Lossless by construction for this schema (longs, strings,
    * doubles — Jackson writes shortest-roundtrip doubles; FormatsSpec
    * asserts value equality at sf0.001), so the read-back must hash-match
    * the parquet oracle exactly. */
  def q61JsonSource(s: SparkSession, d: String): DataFrame = {
    val src = supplier(s, d)
    val dir = scratch(s, "q61_supplier_json", d)
    src.write.mode("overwrite").json(dir)
    s.read.schema(src.schema).json(dir)
  }

  val q61Sql: String =
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"

  /** q40's surviving corpus, split-assigned, written `partitionBy("split")`
    * and read back pruned to split='train'. The partition column comes
    * back from directory names (string), the data columns from the files;
    * the oracle recomputes the same pipeline + split in DuckDB. */
  def q62PartitionedSink(s: SparkSession, d: String): DataFrame = {
    val out = Curation.withSplit(TextAnalysis.q40CorpusPipeline(s, d))
      .select(col("doc_id"), col("n_words"), col("split"))
    val dir = scratch(s, "q62_corpus_by_split", d)
    out.write.mode("overwrite").partitionBy("split").parquet(dir)
    s.read.parquet(dir).filter(col("split") === "train")
  }

  val q62Sql: String =
    s"""SELECT doc_id, n_words, split FROM (
       |  SELECT doc_id, n_words,
       |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM (
       |    SELECT doc_id, n_words,
       |      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS b
       |    FROM (${TextAnalysis.q40Sql})))
       |WHERE split = 'train'""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q61_json_source"      -> (q61JsonSource _, q61Sql),
    "q62_partitioned_sink" -> (q62PartitionedSink _, q62Sql),
  )
}
