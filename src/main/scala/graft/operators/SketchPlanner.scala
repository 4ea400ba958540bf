package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SKETCH-DRIVEN JOIN PLANNING — the consumer of q204's CMS
  * join-cardinality estimator (round-11 verdict task 3): price every
  * candidate join from constant-size sketches, then DECIDE — which pair
  * to join first in a multi-way join, and whether the intermediate is
  * small enough to broadcast — before a single data-sized shuffle runs.
  *
  * This is the engine-side intelligence the reference's fixed
  * map→shuffle→reduce pipeline never had (its only "plan" is the nReduce
  * constant at `src/mr/coordinator.go:18-24`), and it is exactly the
  * decision Catalyst's CBO makes from ANALYZE statistics — except sketches
  * work on inputs no catalog has stats for (filtered subqueries, fresh
  * ingests, mid-pipeline frames), are mergeable across executors, and add
  * one cheap counting pass instead of a full stats build.
  *
  * Three surfaces:
  *   - [[q205JoinPlanner]] (gated): prices the two pairwise joins of the
  *     customer⋈orders⋈lineitem chain from 4×16384 CMS sketches, emits
  *     each candidate's estimate, the exact referee, and both DECISIONS
  *     (first-join pick = argmin estimate; broadcast-vs-shuffle for the
  *     intermediate) alongside the decisions exact stats would have made.
  *   - [[planThreeWay]] (executor): builds the A⋈B⋈C DataFrame in the
  *     sketch-chosen order with the broadcast hint applied when the
  *     intermediate estimate clears the threshold. The two 1-row estimate
  *     aggregates are collected driver-side — a deliberate, documented
  *     exception to the no-collect rule: a plan decision needs a scalar on
  *     the driver, the same way AQE reads runtime shuffle stats (bytes per
  *     partition) on the driver between stages.
  *   - BenchPlanAB (harness): measures the decision's worth — sketch cost
  *     vs the runtime gap between the two orders on a corpus where the
  *     wrong first join explodes.
  *
  * Scale shape: each side folds to ≤4·16384 counters map-side (the q145
  * partial-agg shape — every map task ships at most the sketch, never
  * keys); the estimator joins sketch-sized frames; decisions are O(1).
  * At 100 TB the planner's cost is one counting scan per side — and a
  * side's sketch is reusable across every candidate join it appears in.
  */
object SketchPlanner {
  import Tables._

  private val W = 16384L

  /** min over the 4 CMS rows of Σ_col ca·cb — the one-sided
    * |A ⋈_key B| overestimate (see q204's derivation). One row, one
    * BIGINT column `est`. `fast=false` is the gated md5 construction
    * (engine-portable, so DuckDB can replicate it bit-for-bit);
    * `fast=true` swaps the hash for native xxhash64 — same sketch, same
    * guarantees, ~an order of magnitude cheaper per row, for the
    * execution-side planner where no cross-engine parity is needed
    * (the hash only has to be uniform, not portable). */
  private[operators] def estPair(a: DataFrame, ka: Column, b: DataFrame, kb: Column,
      fast: Boolean = false): DataFrame = {
    def sketch(df: DataFrame, k: Column, out: String): DataFrame = {
      val s =
        if (fast) cmsSketchFast(df.select(k.as("key")))
        else Analytics.cmsSketchW(df.select(k.cast("string").as("key")), W)
      s.select(col("row_idx"), col("col_idx"), col("cnt").as(out))
    }
    sketch(a, ka, "ca").join(sketch(b, kb, "cb"), Seq("row_idx", "col_idx"))
      .groupBy(col("row_idx"))
      .agg(sum(expr("CAST(ca AS DECIMAL(38,0)) * cb")).as("ip"))
      .agg(min(col("ip")).cast("long").as("est"))
  }

  /** q145's 4×W CMS shape with xxhash64 rows (seeded by row_idx via the
    * hash's argument list) — whole-stage-codegen'd, no md5. Partial-agg
    * to ≤4·W counters map-side, like the gated form. The key is
    * normalized to its STRING rendering first (same canonicalization as
    * the gated md5 path): xxhash64 is type-sensitive, so without it an
    * INT key on one side and a BIGINT/STRING key holding the same
    * values on the other would hash to unrelated cells and the inner
    * product would silently price garbage. */
  private def cmsSketchFast(keys: DataFrame): DataFrame =
    keys
      .select(col("key").cast("string").as("key"),
        explode(array((0 until 4).map(i => lit(i.toLong)): _*)).as("row_idx"))
      .select(col("row_idx"),
        pmod(xxhash64(col("row_idx"), col("key")), lit(W)).as("col_idx"))
      .groupBy(col("row_idx"), col("col_idx"))
      .agg(count(lit(1)).as("cnt"))

  /** Exact |A ⋈_key B| referee: per-key partial counts joined, Σ na·nb —
    * what the estimate is graded against (never run in production use;
    * the whole point of the sketch is not touching keys). */
  private[operators] def exactPair(a: DataFrame, ka: Column, b: DataFrame, kb: Column): DataFrame = {
    val fa = a.groupBy(ka.cast("string").as("key")).agg(count(lit(1)).as("na"))
    val fb = b.groupBy(kb.cast("string").as("key")).agg(count(lit(1)).as("nb"))
    fa.join(fb, Seq("key"))
      .agg(coalesce(sum(expr("CAST(na AS DECIMAL(38,0)) * nb")), lit(0))
        .cast("long").as("exact"))
  }

  /** Rows the planner lets an intermediate hold and still broadcast it
    * into the next join — config in a real optimizer
    * (spark.sql.autoBroadcastJoinThreshold is the byte-unit analog). */
  val broadcastRowThreshold = 50000L

  /** The gated decision table for the customer⋈orders⋈lineitem chain.
    * One row per candidate first join, with the sketch estimate, the
    * exact referee, the pick (argmin by (size, name) — deterministic
    * under ties), and the broadcast-vs-shuffle call for the candidate's
    * intermediate under [[broadcastRowThreshold]]. At sf0.01 the two
    * candidates land on OPPOSITE sides of the threshold (est
    * c⋈o ≈ 16.4k → broadcast, o⋈l ≈ 115k → shuffle), so both branches
    * of both decisions are exercised — and both agree with exact stats. */
  def q205JoinPlanner(s: SparkSession, d: String): DataFrame = {
    val cands = Seq(
      ("c_join_o",
        estPair(customer(s, d), col("c_custkey"), orders(s, d), col("o_custkey")),
        exactPair(customer(s, d), col("c_custkey"), orders(s, d), col("o_custkey"))),
      ("o_join_l",
        estPair(orders(s, d), col("o_orderkey"), lineitem(s, d), col("l_orderkey")),
        exactPair(orders(s, d), col("o_orderkey"), lineitem(s, d), col("l_orderkey"))))
    val rows = cands.map { case (name, e, x) =>
      e.crossJoin(broadcast(x))
        .select(lit(name).as("candidate"), col("est").as("est_join_size"),
          col("exact").as("exact_join_size"))
    }.reduce(_ unionByName _)
    // 2-row frame: the bounded-aggregate scalar-join idiom, never a
    // data-sized single partition
    val best = rows.agg(
      min(struct(col("est_join_size"), col("candidate"))).as("be"),
      min(struct(col("exact_join_size"), col("candidate"))).as("bx"))
    rows.crossJoin(broadcast(best))
      .select(col("candidate"), col("est_join_size"), col("exact_join_size"),
        (col("candidate") === col("be.candidate")).as("est_pick"),
        (col("candidate") === col("bx.candidate")).as("exact_pick"),
        when(col("est_join_size") <= broadcastRowThreshold, "broadcast")
          .otherwise("shuffle").as("est_strategy"),
        when(col("exact_join_size") <= broadcastRowThreshold, "broadcast")
          .otherwise("shuffle").as("exact_strategy"))
  }

  // NOTE: q205Sql stripMargins the INTERPOLATED text, so no line these
  // helpers emit may begin with `||` (the outer pass would eat one bar)
  private def cmsSql(table: String, key: String, cnt: String): String =
    s"""h_$cnt AS (
       |  SELECT g.row_idx,
       |    CAST('0x' || substr(md5(CAST(g.row_idx AS VARCHAR) || ':' ||
       |         CAST($key AS VARCHAR)), 1, 15) AS BIGINT) % $W
       |      AS col_idx
       |  FROM $table CROSS JOIN g),
       |$cnt AS (SELECT row_idx, col_idx, count(*) AS $cnt
       |         FROM h_$cnt GROUP BY 1, 2)""".stripMargin

  private def pairSql(name: String, sa: String, sb: String,
      ta: String, ka: String, tb: String, kb: String): String =
    s"""ip_$name AS (
       |  SELECT $sa.row_idx, sum(CAST($sa.$sa AS HUGEINT) * $sb.$sb) AS ip
       |  FROM $sa JOIN $sb USING (row_idx, col_idx) GROUP BY 1),
       |fa_$name AS (SELECT CAST($ka AS VARCHAR) AS key, count(*) AS na
       |             FROM $ta GROUP BY 1),
       |fb_$name AS (SELECT CAST($kb AS VARCHAR) AS key, count(*) AS nb
       |             FROM $tb GROUP BY 1),
       |r_$name AS (
       |  SELECT '$name' AS candidate,
       |    (SELECT CAST(min(ip) AS BIGINT) FROM ip_$name) AS est_join_size,
       |    (SELECT CAST(coalesce(sum(CAST(na AS HUGEINT) * nb), 0) AS BIGINT)
       |     FROM fa_$name JOIN fb_$name USING (key)) AS exact_join_size)""".stripMargin

  val q205Sql: String =
    s"""WITH g AS (SELECT CAST(range AS BIGINT) AS row_idx FROM range(4)),
       |${cmsSql("customer", "c_custkey", "s_c")},
       |${cmsSql("orders", "o_custkey", "s_oc")},
       |${cmsSql("orders", "o_orderkey", "s_ok")},
       |${cmsSql("lineitem", "l_orderkey", "s_l")},
       |${pairSql("c_join_o", "s_c", "s_oc", "customer", "c_custkey", "orders", "o_custkey")},
       |${pairSql("o_join_l", "s_ok", "s_l", "orders", "o_orderkey", "lineitem", "l_orderkey")},
       |r AS (SELECT * FROM r_c_join_o UNION ALL SELECT * FROM r_o_join_l)
       |SELECT candidate, est_join_size, exact_join_size,
       |  candidate = (SELECT candidate FROM r r2
       |               ORDER BY r2.est_join_size, r2.candidate LIMIT 1)
       |    AS est_pick,
       |  candidate = (SELECT candidate FROM r r2
       |               ORDER BY r2.exact_join_size, r2.candidate LIMIT 1)
       |    AS exact_pick,
       |  CASE WHEN est_join_size <= $broadcastRowThreshold
       |    THEN 'broadcast' ELSE 'shuffle' END AS est_strategy,
       |  CASE WHEN exact_join_size <= $broadcastRowThreshold
       |    THEN 'broadcast' ELSE 'shuffle' END AS exact_strategy
       |FROM r""".stripMargin

  /** EXECUTE a three-way join A⋈B⋈C (A–B on `kab`, B–C on `kbc`, both
    * key columns present in B) in the sketch-chosen order: price both
    * intermediates from CMS sketches, join the cheaper pair first, and
    * broadcast the intermediate into the second join when its estimate
    * clears `bcastRows`. Returns (decision-label, frame); output rows
    * are order-independent — SketchPlannerSpec differentials both
    * orders on uniform AND adversarially skewed corpora.
    *
    * The two 1-row estimates are collected driver-side by design (the
    * scalar a plan decision needs — AQE's runtime-stats reads are the
    * same shape); each costs one counting scan whose shuffle payload is
    * the constant-size sketch. */
  def planThreeWay(a: DataFrame, b: DataFrame, c: DataFrame,
      kab: String, kbc: String,
      bcastRows: Long = broadcastRowThreshold): (String, DataFrame) = {
    val d = decideThreeWay(a, b, c, kab, kbc, bcastRows)
    (d, buildThreeWay(a, b, c, kab, kbc, d))
  }

  /** The decision alone — two constant-size sketch scans, two 1-row
    * collects. Label: `{ab,bc}_first/{broadcast,shuffle}`. */
  def decideThreeWay(a: DataFrame, b: DataFrame, c: DataFrame,
      kab: String, kbc: String,
      bcastRows: Long = broadcastRowThreshold): String = {
    val estAB = estPair(a, col(kab), b, col(kab), fast = true)
      .collect()(0).getLong(0)
    val estBC = estPair(b, col(kbc), c, col(kbc), fast = true)
      .collect()(0).getLong(0)
    val label = if (estAB <= estBC) "ab_first" else "bc_first"
    val strat = if (math.min(estAB, estBC) <= bcastRows) "broadcast"
    else "shuffle"
    s"$label/$strat"
  }

  /** Construct the plan a decision names — no sketching, so a cached
    * decision is free to reuse (and the A/B can time execution alone). */
  def buildThreeWay(a: DataFrame, b: DataFrame, c: DataFrame,
      kab: String, kbc: String, decision: String): DataFrame = {
    val (first, second, secondKey) =
      if (decision.startsWith("ab_first")) (a.join(b, kab), c, kbc)
      else (b.join(c, kbc), a, kab)
    val hinted =
      if (decision.endsWith("/broadcast")) broadcast(first) else first
    hinted.join(second, secondKey)
  }

  /** The opposite first join (same broadcast policy suffix dropped —
    * the wrong order's intermediate is by construction the big one, so
    * it gets no hint), for differentials and the A/B. */
  def invertDecision(decision: String): String =
    if (decision.startsWith("ab_first")) "bc_first/shuffle"
    else "ab_first/shuffle"

  /** The deliberately wrong order, for differentials and the A/B. */
  def threeWayWorstFirst(a: DataFrame, b: DataFrame, c: DataFrame,
      kab: String, kbc: String): DataFrame =
    buildThreeWay(a, b, c, kab, kbc,
      invertDecision(decideThreeWay(a, b, c, kab, kbc)))

  /** SELECTIVITY-ESTIMATOR COMPARISON — the CMS inner product (q204)
    * side by side with the classic System-R formula
    * |A⋈B| ≈ n_A·n_B / max(ndv_A, ndv_B) (Selinger 1979, and what
    * Catalyst's CBO computes from ANALYZE stats), each against the
    * exact size, per candidate join of the TPC-H-ish chain plus
    * events⋈orders. Emits both estimates and both 1e-9 fixed-point
    * relative errors (CMS error signed-positive by theorem; System-R
    * error in absolute value). System-R here gets EXACT ndv/row counts
    * (better than any catalog), so its residual error is purely the
    * uniformity assumption.
    *
    * The honest reading of the gated fixture: on FK-shaped joins with
    * mild skew, System-R-with-exact-stats is accurate — often beating
    * the CMS's width-noise overestimate. The CMS earns its keep on the
    * two axes the table can't show: (1) its error is ONE-SIDED — it
    * never underestimates, so a planner consuming it never wrongly
    * picks a broadcast/unsalted plan for an exploding join, while
    * System-R's uniformity assumption UNDERESTIMATES under real key
    * skew by arbitrary factors (SketchPlannerSpec's hot-key fixture:
    * 125× under, exactly the dangerous direction), and (2) it needs no
    * catalog — it works on any mid-pipeline frame a filter just
    * produced. An engine wants both: System-R when stats exist and
    * distributions are tame, the sketch when they don't or aren't.
    *
    * Scale shape: per candidate, two count-distinct partial aggs (key
    * frames), one CMS fold each side (≤4·16384 counters map-side), a
    * sketch-sized join — nothing data×data; the exact referee is
    * gate-only as in q204/q205. */
  def q211SelectivityCompare(s: SparkSession, d: String): DataFrame = {
    val cands = Seq(
      ("c_join_o",
        customer(s, d), col("c_custkey"), orders(s, d), col("o_custkey")),
      ("o_join_l",
        orders(s, d), col("o_orderkey"), lineitem(s, d), col("l_orderkey")),
      ("e_join_o",
        events(s, d), col("user_id"), orders(s, d), col("o_custkey")))
    cands.map { case (name, a, ka, b, kb) =>
      val fa = a.groupBy(ka.cast("string").as("key")).agg(count(lit(1)).as("na"))
      val fb = b.groupBy(kb.cast("string").as("key")).agg(count(lit(1)).as("nb"))
      val statsA = fa.agg(sum(col("na")).as("n_a"), count(lit(1)).as("ndv_a"))
      val statsB = fb.agg(sum(col("nb")).as("n_b"), count(lit(1)).as("ndv_b"))
      val exact = fa.join(fb, Seq("key"))
        .agg(coalesce(sum(expr("CAST(na AS DECIMAL(38,0)) * nb")), lit(0))
          .cast("long").as("exact_size"))
      estPair(a, ka, b, kb)
        .crossJoin(broadcast(exact))
        .crossJoin(broadcast(statsA)).crossJoin(broadcast(statsB))
        .select(lit(name).as("candidate"), col("exact_size"),
          col("est").as("cms_est"),
          expr("CAST((CAST(n_a AS DECIMAL(38,0)) * n_b) " +
            "div greatest(ndv_a, ndv_b) AS BIGINT)").as("systemr_est"))
        .withColumn("cms_err_fp",
          expr("CASE WHEN exact_size > 0 THEN " +
            "((cms_est - exact_size) * 1000000000L) div exact_size " +
            "ELSE 0L END"))
        .withColumn("systemr_err_fp",
          expr("CASE WHEN exact_size > 0 THEN " +
            "(abs(CAST(systemr_est AS DECIMAL(38,0)) - exact_size) " +
            "* 1000000000) div exact_size ELSE 0 END").cast("long"))
    }.reduce(_ unionByName _)
  }

  private def selSql(name: String, ta: String, ka: String,
      tb: String, kb: String): String =
    s"""ga_$name AS (SELECT CAST($ka AS VARCHAR) AS key, count(*) AS na
       |             FROM $ta GROUP BY 1),
       |gb_$name AS (SELECT CAST($kb AS VARCHAR) AS key, count(*) AS nb
       |             FROM $tb GROUP BY 1),
       |ha_$name AS (
       |  SELECT g.row_idx,
       |    CAST('0x' || substr(md5(CAST(g.row_idx AS VARCHAR) || ':' ||
       |         CAST($ka AS VARCHAR)), 1, 15) AS BIGINT) % $W AS col_idx
       |  FROM $ta CROSS JOIN g),
       |sa_$name AS (SELECT row_idx, col_idx, count(*) AS ca
       |             FROM ha_$name GROUP BY 1, 2),
       |hb_$name AS (
       |  SELECT g.row_idx,
       |    CAST('0x' || substr(md5(CAST(g.row_idx AS VARCHAR) || ':' ||
       |         CAST($kb AS VARCHAR)), 1, 15) AS BIGINT) % $W AS col_idx
       |  FROM $tb CROSS JOIN g),
       |sb_$name AS (SELECT row_idx, col_idx, count(*) AS cb
       |             FROM hb_$name GROUP BY 1, 2),
       |r_$name AS (
       |  SELECT '$name' AS candidate,
       |    (SELECT CAST(coalesce(sum(CAST(na AS HUGEINT) * nb), 0) AS BIGINT)
       |     FROM ga_$name JOIN gb_$name USING (key)) AS exact_size,
       |    (SELECT CAST(min(ip) AS BIGINT) FROM (
       |       SELECT sa_$name.row_idx,
       |         sum(CAST(sa_$name.ca AS HUGEINT) * sb_$name.cb) AS ip
       |       FROM sa_$name JOIN sb_$name USING (row_idx, col_idx)
       |       GROUP BY 1)) AS cms_est,
       |    CAST((SELECT CAST(sum(na) AS HUGEINT) FROM ga_$name)
       |       * (SELECT CAST(sum(nb) AS HUGEINT) FROM gb_$name)
       |       // greatest((SELECT count(*) FROM ga_$name),
       |                   (SELECT count(*) FROM gb_$name))
       |      AS BIGINT) AS systemr_est)""".stripMargin

  val q211Sql: String =
    s"""WITH g AS (SELECT CAST(range AS BIGINT) AS row_idx FROM range(4)),
       |${selSql("c_join_o", "customer", "c_custkey", "orders", "o_custkey")},
       |${selSql("o_join_l", "orders", "o_orderkey", "lineitem", "l_orderkey")},
       |${selSql("e_join_o", "events", "user_id", "orders", "o_custkey")},
       |r AS (SELECT * FROM r_c_join_o UNION ALL SELECT * FROM r_o_join_l
       |      UNION ALL SELECT * FROM r_e_join_o)
       |SELECT candidate, exact_size, cms_est, systemr_est,
       |  CAST(CASE WHEN exact_size > 0 THEN
       |    ((cms_est - exact_size) * 1000000000) // exact_size
       |    ELSE 0 END AS BIGINT) AS cms_err_fp,
       |  CAST(CASE WHEN exact_size > 0 THEN
       |    (abs(CAST(systemr_est AS HUGEINT) - exact_size) * 1000000000)
       |      // exact_size ELSE 0 END AS BIGINT) AS systemr_err_fp
       |FROM r""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q205_join_planner" -> (q205JoinPlanner _, q205Sql),
    "q211_selectivity_compare" -> (q211SelectivityCompare _, q211Sql))
}
