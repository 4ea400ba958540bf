package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events table — the classic product
  * questions a clickstream engine must answer:
  *
  *   - [[q66Funnel]]: ORDERED conversion funnel (view → click →
  *     purchase, each step strictly after the previous one). The naive
  *     formulation is one self-join per step (the oracle's shape — k
  *     shuffles and k joins for a k-step funnel); here each step is a
  *     conditional `min` over the SAME per-user window, so the whole
  *     funnel costs ONE shuffle on user_id: Spark plans the chained
  *     window aggregates as stacked Window operators over one Exchange,
  *     and the follow-up per-user collapse reuses that partitioning
  *     (ENSURE_REQUIREMENTS inserts no second shuffle — asserted in
  *     AnalyticsSpec).
  *   - [[q67Retention]]: weekly cohort retention. Cohort = ISO week of
  *     the user's first event; one (user, active-week) dedup, one join
  *     back on user_id, one count-distinct per (cohort, offset). Every
  *     shuffle key is either user_id or the tiny (cohort, offset) pair —
  *     nothing is ever events×events.
  *
  * Timestamps compare at MICROsecond precision on both engines (Spark
  * ts is micros by Tables.events construction; the oracles CAST to
  * TIMESTAMP which truncates DuckDB's nanos) — the q16 convention.
  */
object Analytics {
  import Tables._

  /** One row: users with ≥1 view; of those, users with a click strictly
    * after their first view; of those, users with a purchase strictly
    * after that first qualifying click. First-touch attribution (first
    * view, first qualifying click) — the strictest common funnel
    * definition, and the one with a clean one-pass window form. */
  def q66Funnel(s: SparkSession, d: String): DataFrame =
    funnel(events(s, d))

  /** The one-shuffle funnel over any (user_id, event_type, ts) frame. */
  def funnel(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    ev
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
      .agg(count(lit(1)).as("n_users"),
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_view_click"),
        count(col("t3")).as("n_funnel"))
  }

  val q66Sql: String =
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events),
      |u AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t1
      |  FROM e GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM e JOIN u ON e.user_id = u.user_id
      |  WHERE e.event_type = 'click' AND e.ts > u.t1
      |  GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
      |  GROUP BY 1)
      |SELECT (SELECT count(*) FROM u) AS n_users,
      |       (SELECT count(t1) FROM u) AS n_view,
      |       (SELECT count(*) FROM c) AS n_view_click,
      |       (SELECT count(*) FROM p) AS n_funnel""".stripMargin

  /** (cohort_week, week_offset) → distinct active users, for every
    * offset a cohort was ever active at. Weeks are ISO date_trunc
    * ('week') on both engines; the offset divides a day-diff that is a
    * multiple of 7 by construction, so the double division is exact. */
  def q67Retention(s: SparkSession, d: String): DataFrame =
    retention(events(s, d))

  /** Cohort retention over any (user_id, ts) frame. */
  def retention(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("ts"))
    // to_date: DuckDB's date_trunc('week') yields DATE — match the type
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        to_date(date_trunc("week", col("first_ts"))).as("cohort_week"))
    val active = ev
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    active.join(cohorts, Seq("user_id"))
      .withColumn("week_offset",
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  val q67Sql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |f AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      |  FROM e GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM e)
      |SELECT f.cohort_week,
      |  CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS BIGINT)
      |    AS week_offset,
      |  count(DISTINCT a.user_id) AS n_active
      |FROM a JOIN f ON a.user_id = f.user_id
      |GROUP BY 1, 2""".stripMargin

  /** Per-nation top-3 customers by balance, through the custom
    * [[graft.plans.GroupTopK]] whole-operator (bounded per-group heaps,
    * partial before the shuffle — no window, no sort of the input; see
    * its scaladoc for the 100 TB argument). The oracle is the classic
    * `row_number()` window form, so the gate proves operator ==
    * window-top-k semantics. Tiebreak on c_custkey makes ties
    * deterministic on both engines. The nation-name join happens AFTER
    * the top-k (25 x 3 rows), so the dimension join is over the already
    * reduced side. */
  def q71TopPerGroup(s: SparkSession, d: String): DataFrame = {
    val top = graft.plans.GroupTopKExtension.topKPerGroup(
      customer(s, d).select(col("c_custkey"), col("c_name"),
        col("c_acctbal"), col("c_nationkey")),
      groupCols = Seq("c_nationkey"),
      order = Seq(("c_acctbal", false), ("c_custkey", true)), k = 3)
    top.join(broadcast(nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  val q71Sql: String =
    """SELECT n_name, c_custkey, c_name, c_acctbal
      |FROM (
      |  SELECT c_custkey, c_name, c_acctbal, c_nationkey,
      |    row_number() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer) c
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE rn <= 3""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q66_funnel"    -> (q66Funnel _, q66Sql),
    "q67_retention" -> (q67Retention _, q67Sql),
    "q71_top_per_group" -> (q71TopPerGroup _, q71Sql),
  )
}
