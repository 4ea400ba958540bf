package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics beyond connected components ([[Dedup.dedupClusters]]):
  * PageRank by power iteration over the undirected customer–supplier
  * trade graph (an edge per distinct (o_custkey, l_suppkey) pair traded
  * through orders⋈lineitem; customers get even node ids, suppliers odd).
  *
  * Determinism across engines (the q41/q69 decimal convention): each
  * contribution rank/deg rounds to 10 decimals and accumulates as
  * DECIMAL(38,18) — exact, aggregation-order-free — and the damped
  * update re-rounds to 10 decimals per iteration, so Spark and the
  * DuckDB oracle walk bit-identical rank vectors; the 1e-18 double→
  * decimal cast wobble is 8 digits below the re-rounding cut.
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

  private val D = 0.85
  private val Iters = 5

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
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // localCheckpoint, not persist: the blocks must outlive this builder
    // (a persist + finally-unpersist would drop the cache before the
    // returned frame ever executes) and be reclaimed with the frame by
    // the context cleaner rather than squatting in the session cache.
    // Checkpointed PARTITIONED AND SORTED on src: every iteration's
    // rank⋈edges then plans as a zero-Exchange sort-merge join against
    // the rank frame (itself key-partitioned by its groupBy/distinct
    // lineage) — no broadcast of the rank vector anywhere, because at
    // web scale the node set does NOT fit an executor; measured 0 hash
    // exchanges per iteration at sf0.1.
    val e = edges.join(deg, Seq("src")).repartition(col("src"))
      .sortWithinPartitions(col("src"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(false)
    val n = nodes.count()
    var r = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to Iters) {
      val contrib = e.join(r, e("src") === r("node"))
        .select(col("dst"),
          round(col("rank") / col("deg"), 10)
            .cast("decimal(38,18)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      r = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(nodes("node"),
          round(lit(0.15 / n) +
            lit(D) * coalesce(col("s").cast("double"), lit(0.0)), 10)
            .as("rank"))
        // truncate the per-iteration lineage (the dedupClusters
        // lesson): without this, Catalyst re-plans a k-deep join
        // chain and AQE re-derives every prior iteration per stage.
        // Lazy, so the loop still executes as one DAG per run.
        .localCheckpoint(false)
    }
    r.select(col("node"), round(col("rank"), 8).as("rank"))
  }

  private def iterSql(i: Int): String =
    s"""rk$i AS (
       |  SELECT e.dst AS node,
       |    sum(CAST(round(r.rank / e.deg, 10) AS DECIMAL(38,18))) AS s
       |  FROM ed e JOIN r${i - 1} r ON e.src = r.node
       |  GROUP BY 1),
       |r$i AS (
       |  SELECT n0.node,
       |    round(0.15 / nn.n + 0.85 * COALESCE(CAST(rk$i.s AS DOUBLE), 0.0),
       |      10) AS rank
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
       |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
       |${(1 to Iters).map(iterSql).mkString(",\n")}
       |SELECT node, round(rank, 8) AS rank FROM r$Iters""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q81_pagerank" -> (q81Pagerank _, q81Sql),
  )
}
