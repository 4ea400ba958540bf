package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics beyond connected components ([[Dedup.dedupClusters]]):
  * PageRank by power iteration over the undirected customer–supplier
  * trade graph (an edge per distinct (o_custkey, l_suppkey) pair traded
  * through orders⋈lineitem; customers get even node ids, suppliers odd).
  *
  * Determinism across engines: the iteration is INTEGER FIXED-POINT —
  * ranks are BIGINT units of 1e-12 ("rank_e12"), contributions are
  * floor divisions rank div deg, the damped update is
  * base + (85·Σ) div 100 with base = 15e12 div (100·n) — so every
  * quantity on both engines is an exactly-summed integer and the walk
  * is bit-identical BY CONSTRUCTION. (A double formulation with
  * per-iteration round(x, 10) measurably diverges: Spark rounds the
  * shortest decimal representation HALF_UP while DuckDB multiplies and
  * rounds in binary, and across 5 iterations × |V| values dozens of
  * 1-ULP boundary hits survive to the output. Floor quantization loses
  * ≤1e-12 mass per edge per step — a defined, engine-free semantic.)
  *
  * Scale shape: the edge list (with out-degrees pre-joined) is
  * partitioned on src and persisted ONCE; each of the k iterations is
  * one shuffle join rank⋈edges plus one partially-aggregated sum on
  * dst — the textbook Pregel-style schedule expressed relationally. The
  * rank frame is groups-sized (one row per node), never edges-sized,
  * and N is a one-scalar driver aggregate, not a collected dataset.
  * 100 TB honesty: iteration count is fixed (5), not convergence-
  * chased; lineage stays linear in k.
  */
object Graph {
  import Tables._

  private val Iters = 5
  /** Fixed-point scale: ranks are BIGINT multiples of 1e-12. */
  private val Scale = 1000000000000L

  def q81Pagerank(s: SparkSession, d: String): DataFrame = {
    val pairs = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    pagerank(pairs.select(col("src"), col("dst"))
      .unionAll(pairs.select(col("dst").as("src"), col("src").as("dst"))))
  }

  /** Power-iteration PageRank over a DIRECTED edge list (undirected
    * graphs pass both directions). Nodes = sources (every node of an
    * undirected graph has out-edges). */
  def pagerank(edges: DataFrame): DataFrame = {
    // localCheckpoint, not persist: the blocks must outlive this builder
    // (a persist + finally-unpersist would drop the cache before the
    // returned frame ever executes) and be reclaimed with the frame by
    // the context cleaner rather than squatting in the session cache.
    // Checkpointed PARTITIONED AND SORTED on src: every iteration's
    // rank⋈edges then plans as a zero-Exchange sort-merge join against
    // the rank frame (itself key-partitioned by its groupBy/distinct
    // lineage) — no broadcast of the rank vector anywhere, because at
    // web scale the node set does NOT fit an executor; measured 0 hash
    // exchanges per iteration at sf0.1. (A window-count variant for the
    // degrees — saving the groupBy+join — measured ~2x SLOWER here: the
    // whole-partition window buffers every src group, while the partial-
    // aggregated groupBy shuffles only group-sized rows.)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, Seq("src")).repartition(col("src"))
      .sortWithinPartitions(col("src"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(false)
    val n = nodes.count()
    // fixed-point: rank_e12 units of 1e-12; all ops integer, both engines
    var r = nodes.select(col("node"), lit(Scale / n).as("rank_e12"))
    val base = (15L * Scale) / (100L * n)
    for (_ <- 1 to Iters) {
      val contrib = e.join(r, e("src") === r("node"))
        .select(col("dst"), expr("rank_e12 div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      r = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(nodes("node"),
          (lit(base) + expr("coalesce(s, 0L) * 85 div 100")).as("rank_e12"))
        // truncate the per-iteration lineage (the dedupClusters
        // lesson): without this, Catalyst re-plans a k-deep join
        // chain and AQE re-derives every prior iteration per stage.
        // Lazy, so the loop still executes as one DAG per run.
        .localCheckpoint(false)
    }
    r.select(col("node"), col("rank_e12"))
  }

  private def iterSql(i: Int): String =
    s"""rk$i AS (
       |  SELECT e.dst AS node, sum(r.rank_e12 // e.deg) AS s
       |  FROM ed e JOIN r${i - 1} r ON e.src = r.node
       |  GROUP BY 1),
       |r$i AS (
       |  SELECT n0.node,
       |    CAST((15 * $Scale) // (100 * nn.n) +
       |         (COALESCE(rk$i.s, 0) * 85) // 100 AS BIGINT) AS rank_e12
       |  FROM nodes n0 CROSS JOIN nn
       |  LEFT JOIN rk$i ON rk$i.node = n0.node)""".stripMargin

  val q81Sql: String =
    s"""WITH eraw AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT src, dst FROM eraw
       |          UNION ALL SELECT dst, src FROM eraw),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |ed AS (SELECT e.src, e.dst, d.deg FROM edges e
       |       JOIN deg d ON d.src = e.src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, CAST($Scale // nn.n AS BIGINT) AS rank_e12
       |       FROM nodes CROSS JOIN nn),
       |${(1 to Iters).map(iterSql).mkString(",\n")}
       |SELECT node, rank_e12 FROM r$Iters""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q81_pagerank" -> (q81Pagerank _, q81Sql),
  )
}
