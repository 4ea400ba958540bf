package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-FIRST ENTRIES (round-10 verdict task 7): q168 proved the
  * `spark.sql` path on one relational shape; these register the same
  * declarative surface across the OTHER operator families — dedup, text
  * quality, event analytics, vector similarity — as pure SQL text over
  * temp views, each gated against the SAME DuckDB oracle as its
  * DSL-built sibling. The point under test: a user who writes SQL (a BI
  * tool, a notebook, a dbt model) reaches the identical Catalyst plans
  * and identical results as the DataFrame API — including the repo's
  * custom SQL-registered expressions (`vec_dot` in q185 runs inside
  * whole-stage codegen exactly as in q23).
  *
  * View lifecycle is the q168 idiom (Relational.q168SqlEntry): per-call
  * unique names so concurrent calls with different data dirs never
  * rebind each other, dropped as soon as the plan is built (`s.sql`
  * analyzes eagerly — the DataFrame holds resolved relations, not
  * names). Scale shapes are inherited from the SQL itself: the same
  * partial aggregations, window limits and broadcasts Catalyst derives
  * for the DSL forms (plan-drift-guarded in PLANS.md like every other
  * registered query). */
object SqlSurface {
  import Tables._

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** Registers `tables` as unique temp views, runs `sql` with `$v0..`
    * placeholders substituted, drops the views. */
  private def withViews(s: SparkSession, tables: Seq[DataFrame])
                       (sql: Seq[String] => String): DataFrame = {
    val id = seq.incrementAndGet()
    val names = tables.indices.map(i => s"v_sqlsurface_${id}_$i")
    tables.zip(names).foreach { case (df, n) => df.createOrReplaceTempView(n) }
    try s.sql(sql(names))
    finally names.foreach(s.catalog.dropTempView)
  }

  /** q20 (exact dedup census) as SQL: same md5-of-normalized-text
    * grouping, keep-first, copy count. */
  def q182SqlDedupCensus(s: SparkSession, d: String): DataFrame =
    withViews(s, Seq(documents(s, d))) { case Seq(v) =>
      s"""SELECT md5(lower(trim(regexp_replace(text, '\\\\s+', ' '))))
         |    AS content_hash,
         |  min(doc_id) AS keep_id, count(*) AS n_copies
         |FROM $v GROUP BY 1""".stripMargin
    }

  /** q24 (token/quality stats) as SQL: LATERAL VIEW explode for the
    * word stream, left-joined back so zero-word docs keep their row —
    * the exact nTokensCol / tokensCodegen semantics in SQL text. */
  def q183SqlTokenStats(s: SparkSession, d: String): DataFrame =
    withViews(s, Seq(documents(s, d))) { case Seq(v) =>
      s"""WITH ws AS (
         |  SELECT doc_id, w FROM $v
         |  LATERAL VIEW explode(split(
         |    regexp_replace(lower(text), '(^[^a-z]+)|([^a-z]+$$)', ''),
         |    '[^a-z]+')) t AS w
         |  WHERE w <> ''),
         |wagg AS (
         |  SELECT doc_id, count(*) AS nw, sum(length(w)) AS wlen,
         |    sum(CASE WHEN w IN ('the','a','an','of','to','and','in',
         |      'is','it','for') THEN 1 ELSE 0 END) AS nstop
         |  FROM ws GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CASE WHEN length(regexp_replace(d.text, '(^\\\\s+)|(\\\\s+$$)', ''))
         |         = 0 THEN 0
         |       ELSE size(split(
         |         regexp_replace(d.text, '(^\\\\s+)|(\\\\s+$$)', ''),
         |         '\\\\s+')) END AS n_tokens,
         |  size(regexp_extract_all(d.text,
         |    '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\\\s]', 0)) AS n_bpeish,
         |  CAST(coalesce(g.nw, 0) AS INT) AS n_words,
         |  round(CAST(coalesce(g.wlen, 0) AS DOUBLE)
         |    / CAST(greatest(coalesce(g.nw, 0), 1) AS DOUBLE), 4)
         |    AS avg_word_len,
         |  round(CAST(coalesce(g.nstop, 0) AS DOUBLE)
         |    / CAST(greatest(coalesce(g.nw, 0), 1) AS DOUBLE), 4)
         |    AS stopword_ratio,
         |  round(CAST(length(regexp_replace(d.text, '[A-Za-z0-9\\\\s]', ''))
         |    AS DOUBLE) / CAST(greatest(length(d.text), 1) AS DOUBLE), 4)
         |    AS punct_ratio
         |FROM $v d LEFT JOIN wagg g ON d.doc_id = g.doc_id""".stripMargin
    }

  /** q127 (inter-event gap percentiles) as SQL: lag window over
    * (user, type), exact `percentile` aggregate. */
  def q184SqlEventGaps(s: SparkSession, d: String): DataFrame =
    withViews(s, Seq(events(s, d))) { case Seq(v) =>
      s"""WITH g AS (
         |  SELECT event_type,
         |    unix_micros(ts) - lag(unix_micros(ts)) OVER (
         |      PARTITION BY user_id, event_type
         |      ORDER BY ts, event_id) AS gap_us
         |  FROM $v)
         |SELECT event_type, count(*) AS n_gaps,
         |  round(percentile(gap_us / 1000000.0D, 0.5D), 6) AS p50_s,
         |  round(percentile(gap_us / 1000000.0D, 0.9D), 6) AS p90_s
         |FROM g WHERE gap_us IS NOT NULL
         |GROUP BY event_type""".stripMargin
    }

  /** q23 (exact cosine kNN) as SQL: the custom `vec_dot` Catalyst
    * expression called BY NAME from SQL text (it is SQL-registered in
    * GraftSession), broadcast hint pinning the 10-row query side, rank
    * filter planning as WindowGroupLimit — the DSL plan, from SQL. */
  def q185SqlKnn(s: SparkSession, d: String): DataFrame =
    withViews(s, Seq(embeddings(s, d))) { case Seq(v) =>
      s"""WITH vn AS (
         |  SELECT vec_id, e, sqrt(vec_dot(e, e)) AS norm
         |  FROM (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS e
         |        FROM $v)),
         |q AS (SELECT vec_id AS qid, e AS qe, norm AS qn
         |      FROM vn WHERE vec_id < 10),
         |sc AS (
         |  SELECT /*+ BROADCAST(q) */ qid, vec_id AS nid,
         |    round(vec_dot(e, qe) / (norm * qn), 6) AS sim
         |  FROM vn JOIN q ON vec_id <> qid)
         |SELECT qid AS query_id, nid AS neighbor_id, rnk, sim
         |FROM (SELECT qid, nid, sim,
         |        row_number() OVER (PARTITION BY qid
         |          ORDER BY sim DESC, nid) AS rnk
         |      FROM sc)
         |WHERE rnk <= 10""".stripMargin
    }

  /** Oracles are REUSED verbatim from the DSL siblings — the entire
    * point: two front-ends, one result. */
  /** q190 (CUSUM changepoint) as SQL: the closed-form running-sum /
    * running-min windows and integer-scaled deviations verbatim in SQL
    * text — the analyst-facing form of the changepoint monitor. */
  def q201SqlCusum(s: SparkSession, d: String): DataFrame =
    withViews(s, Seq(events(s, d))) { case Seq(v) =>
      s"""WITH d AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
         |  FROM $v GROUP BY 1, 2),
         |t AS (
         |  SELECT event_type, sum(cnt) AS total, count(*) AS ndays
         |  FROM d GROUP BY 1),
         |dev AS (
         |  SELECT d.event_type, day, total,
         |    10 * ndays * cnt - 11 * total AS su,
         |    9 * total - 10 * ndays * cnt AS sd
         |  FROM d JOIN t USING (event_type)),
         |p AS (
         |  SELECT *,
         |    sum(su) OVER (PARTITION BY event_type ORDER BY day) AS pu,
         |    sum(sd) OVER (PARTITION BY event_type ORDER BY day) AS pd
         |  FROM dev),
         |c AS (
         |  SELECT event_type, day, total,
         |    pu - least(0L, min(pu) OVER (PARTITION BY event_type
         |      ORDER BY day ROWS UNBOUNDED PRECEDING)) AS cu,
         |    pd - least(0L, min(pd) OVER (PARTITION BY event_type
         |      ORDER BY day ROWS UNBOUNDED PRECEDING)) AS cd,
         |    (3 * total) div 2 AS h
         |  FROM p)
         |SELECT event_type,
         |  max(cu) AS max_cusum_up, max(cd) AS max_cusum_dn,
         |  sum(CASE WHEN cu > h THEN 1L ELSE 0L END) AS n_alarm_up,
         |  sum(CASE WHEN cd > h THEN 1L ELSE 0L END) AS n_alarm_dn,
         |  min(CASE WHEN cu > h THEN day END) AS first_alarm_up,
         |  min(CASE WHEN cd > h THEN day END) AS first_alarm_dn
         |FROM c GROUP BY 1""".stripMargin
    }

  /** q194 (rate-limit admission census) as SQL: the integer epoch
    * bucketing and admission window rank in SQL text. */
  def q202SqlRateLimit(s: SparkSession, d: String): DataFrame =
    withViews(s, Seq(events(s, d))) { case Seq(v) =>
      s"""WITH w AS (
         |  SELECT event_type,
         |    row_number() OVER (
         |      PARTITION BY user_id, event_type,
         |        unix_micros(ts) div 600000000
         |      ORDER BY ts, event_id) AS rn
         |  FROM $v)
         |SELECT event_type, count(*) AS n_raw,
         |  sum(CASE WHEN rn <= 3 THEN 1L ELSE 0L END) AS n_allowed,
         |  sum(CASE WHEN rn <= 3 THEN 0L ELSE 1L END) AS n_throttled,
         |  max(CAST(rn AS BIGINT)) AS max_burst
         |FROM w GROUP BY 1""".stripMargin
    }

  /** q35 (backward as-of join) as SQL — the TEMPORAL-JOIN family's
    * twin (round-11 verdict task 7): Spark SQL has no ASOF JOIN
    * keyword (DuckDB's oracle uses one), so the SQL text IS the
    * scale-right merge the DSL builds — union both sides tagged, one
    * window per key ordered (t, side) with side 0 sorting first at
    * equal t for the inclusive ≤, running `last(_, true)` carrying the
    * most recent order forward. Same single user-keyed exchange. */
  def q206SqlAsof(s: SparkSession, d: String): DataFrame =
    withViews(s, Seq(events(s, d), orders(s, d))) { case Seq(ev, ord) =>
      s"""WITH o AS (
         |  SELECT o_custkey AS k, o_orderdate AS t,
         |    max(o_orderkey) AS o_orderkey
         |  FROM $ord GROUP BY 1, 2),
         |u AS (
         |  SELECT k, CAST(t AS TIMESTAMP) AS t, 0 AS side, o_orderkey,
         |    CAST(NULL AS BIGINT) AS event_id
         |  FROM o
         |  UNION ALL
         |  SELECT user_id AS k, ts AS t, 1 AS side,
         |    CAST(NULL AS BIGINT) AS o_orderkey, event_id
         |  FROM $ev),
         |m AS (
         |  SELECT event_id, k, side,
         |    last(o_orderkey, true) OVER (PARTITION BY k
         |      ORDER BY t, side
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched
         |  FROM u)
         |SELECT event_id, k AS user_id, matched AS o_orderkey
         |FROM m WHERE side = 1""".stripMargin
    }

  /** q109 (frontier BFS) as SQL — the GRAPH-ITERATION family's twin:
    * Spark SQL has no recursive CTE, and the DSL's loop is FIXED-depth
    * anyway (the q81 discipline), so the iteration unrolls as chained
    * CTEs — Graph.bfsIterSql, the SAME text the DuckDB oracle runs.
    * What the SQL form gives up vs the DSL: the per-round
    * localCheckpoint lineage cuts and the reused edge partitioning —
    * at depth 4 Catalyst handles the unrolled plan; an unbounded-depth
    * traversal is the one shape this surface cannot express (see
    * COVERAGE.md). */
  def q207SqlBfs(s: SparkSession, d: String): DataFrame =
    withViews(s, Seq(orders(s, d), lineitem(s, d), customer(s, d))) {
      case Seq(ord, li, cust) =>
        s"""WITH eraw AS (
           |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |  FROM $ord JOIN $li ON o_orderkey = l_orderkey),
           |edges AS (SELECT src, dst FROM eraw
           |          UNION ALL SELECT dst, src FROM eraw),
           |d0 AS (SELECT c_custkey * 2 AS node, CAST(0 AS BIGINT) AS dist
           |       FROM $cust WHERE c_nationkey = 0),
           |${(1 to Graph.BfsDepth).map(Graph.bfsIterSql).mkString(",\n")}
           |SELECT node, dist FROM d${Graph.BfsDepth}""".stripMargin
    }

  /** q186 (sessionization) as SQL — the STREAMING-SHAPE family's twin:
    * `session_window` is the engine's merging session operator, and
    * calling it from SQL text builds the identical stateful-capable
    * aggregation the DSL (and the streaming query in SessionStream)
    * uses — GROUP BY session_window(ts, gap), window bounds from the
    * struct. The same SQL under readStream runs continuously —
    * StreamingSessionSpec's "q208 SQL text runs CONTINUOUSLY" test
    * executes this literal text as a streaming query over a
    * watermarked view and diffs it against the DSL stream. */
  def q208SqlSessionize(s: SparkSession, d: String): DataFrame =
    withViews(s, Seq(events(s, d))) { case Seq(v) =>
      s"""SELECT user_id,
         |  session_window.start AS s_start, session_window.end AS s_end,
         |  count(1) AS n_events,
         |  sum(CAST(round(value * 1000, 0) AS BIGINT)) AS total_milli
         |FROM $v
         |GROUP BY user_id, session_window(ts, '30 minutes')""".stripMargin
    }

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q182_sql_dedup_census" -> (q182SqlDedupCensus _, Dedup.q20Sql),
    "q183_sql_token_stats"  -> (q183SqlTokenStats _, TextAnalysis.q24Sql),
    "q184_sql_event_gaps"   -> (q184SqlEventGaps _, Analytics.q127Sql),
    "q185_sql_knn"          -> (q185SqlKnn _, Similarity.q23Sql),
    "q201_sql_cusum"        -> (q201SqlCusum _, Analytics.q190Sql),
    "q202_sql_rate_limit"   -> (q202SqlRateLimit _, Analytics.q194Sql),
    "q206_sql_asof"         -> (q206SqlAsof _, Asof.q35Sql),
    "q207_sql_bfs"          -> (q207SqlBfs _, Graph.q109Sql),
    "q208_sql_sessionize"   -> (q208SqlSessionize _, Analytics.q186Sql),
  )
}
