package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — an operator Spark has no native form of,
  * built by composition (mandate preference (a)): for each left row,
  * the most recent right row with the same key and time ≤ the left
  * time.
  *
  * Implementation is the scale-right merge algorithm, NOT a range join:
  * union both sides tagged, ONE shuffle on the key, per-key time sort,
  * and a running `last(_, ignoreNulls)` window carries the most recent
  * right-side attributes forward into each left row. Cost is
  * sort-merge-like (n log n per key group); a range join would be
  * |left| × |matching-range| and a cross-key disaster at 100 TB.
  */
object Asof {
  import Tables._

  /** Generic as-of: left (k, t, leftCols…), right (k, t, payload).
    * Right side must be unique per (k, t) — pre-aggregate ties first. */
  def asofJoin(left: DataFrame, right: DataFrame, payload: String): DataFrame = {
    val tagged = right
      .select(col("k"), col("t"), lit(0).as("side"), col(payload),
        lit(null).cast("long").as("event_id"))
      .unionAll(left.select(col("k"), col("t"), lit(1).as("side"),
        lit(null).cast("long").as(payload), col("event_id")))
    // side 0 (right) sorts before side 1 (left) at equal t ⇒ inclusive ≤
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("matched", last(col(payload), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k"), col("matched"))
  }

  /** FORWARD as-of — the mirror of [[asofJoin]]: for each left row, the
    * EARLIEST right row with the same key and time STRICTLY AFTER the
    * left time (kdb's `aj` runs backward, the forward form is the
    * "next quote/next conversion" primitive). Same scale-right merge:
    * one union, ONE shuffle on the key, and a `first(_, ignoreNulls)`
    * window over the FORWARD frame carries the next right row back.
    * Strictness falls out of the tag order: right (side 0) sorts BEFORE
    * left (side 1) at equal t, so an equal-time right row is outside the
    * left row's [current, following] frame. Returns the left id/key/time
    * plus the matched payload and its time (null when no later right row
    * exists). */
  def asofJoinForward(left: DataFrame, right: DataFrame, payload: String): DataFrame = {
    val tagged = right
      .select(col("k"), col("t"), lit(0).as("side"), col(payload),
        col("t").as("rt"), lit(null).cast("long").as("event_id"))
      .unionAll(left.select(col("k"), col("t"), lit(1).as("side"),
        lit(null).cast("long").as(payload),
        lit(null).cast("timestamp").as("rt"), col("event_id")))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged
      .withColumn("matched", first(col(payload), ignoreNulls = true).over(w))
      .withColumn("matched_t", first(col("rt"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k"), col("t"), col("matched"),
        col("matched_t"))
  }

  /** Per view event: the same user's NEXT purchase strictly after it,
    * with the conversion latency in exact micros — per-impression
    * time-to-convert, the forward-as-of workload (purchase ties per
    * (user, ts) collapse to min event_id so both engines pick
    * deterministically; views with no later purchase keep NULLs). */
  def q132AsofForward(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), col("ts").as("t"), col("event_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("k"), col("ts").as("t"))
      .agg(min(col("event_id")).as("p_id"))
    asofJoinForward(v, p, "p_id")
      .select(col("event_id"), col("k").as("user_id"),
        col("matched").as("purchase_id"),
        (unix_micros(col("matched_t")) - unix_micros(col("t")))
          .as("latency_us"))
  }

  val q132Sql: String =
    """WITH v AS (
      |  SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS t, event_id
      |  FROM events WHERE event_type = 'view'),
      |p AS (
      |  SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS t,
      |    min(event_id) AS p_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT v.event_id, v.k AS user_id, p.p_id AS purchase_id,
      |  epoch_us(p.t) - epoch_us(v.t) AS latency_us
      |FROM v ASOF LEFT JOIN p ON v.k = p.k AND v.t < p.t""".stripMargin

  /** Each event matched to the user's most recent order at event time
    * (order ties per (custkey, orderdate) collapsed to max o_orderkey so
    * both engines pick deterministically). */
  def q35AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id").as("k"), col("ts").as("t"), col("event_id"))
    val ord = orders(s, d)
      .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("t"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    asofJoin(ev, ord, "o_orderkey")
      .select(col("event_id"), col("k").as("user_id"),
        col("matched").as("o_orderkey"))
  }

  val q35Sql: String =
    """WITH ord AS (
      |  SELECT o_custkey AS k, o_orderdate AS t, max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, o.o_orderkey
      |FROM events e ASOF LEFT JOIN ord o
      |  ON e.user_id = o.k AND CAST(e.ts AS TIMESTAMP) >= o.t""".stripMargin

  /** Exact epoch micros for bucket math (the q16 convention);
    * TIMESTAMP_NTZ columns (parquet isAdjustedToUTC=false — the orders
    * table) cast to session-tz instants first, deterministic because
    * GraftSession pins the session timezone to UTC. */
  private def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Bucket KEY for a micros value: the bucket's START in epoch micros,
    * `m - pmod(m, width)` — pure LONG arithmetic. Never `floor(m / w)`:
    * Spark evaluates `long / long` as double division, exact only while
    * micros < 2^53 (~year 2255) — the same hazard class Tables.events
    * avoids; `pmod` keeps the whole pipeline integral at any epoch (and
    * floor-consistent for negative, pre-1970 micros too). Using the
    * start as the key (instead of an index) also means interval bucket
    * ranges enumerate with a stepped `sequence`, still divisionless. */
  private def bucketStart(m: Column, width: Long): Column =
    m - pmod(m, lit(width))

  /** Bucketed RANGE join (point-in-interval, NO equi key) — the second
    * temporal-join operator Spark lacks natively: pairs every point row
    * with every interval containing its timestamp (`start ≤ ts < end`).
    * Spark's only built-in plan for a pure theta join is
    * BroadcastNestedLoopJoin — |points|×|intervals| comparisons, a
    * scale-killer. Quantizing time into fixed-width buckets turns it
    * into an EQUI join (mandate preference (a) — composition): each
    * interval explodes to the buckets it covers, each point maps to its
    * single bucket, the join runs hash-partitioned (or broadcast, for a
    * small interval side) on the bucket key, and the exact range
    * predicate filters inside bucket-matched candidates.
    *
    * Cost: |points| + Σᵢ ceil(lenᵢ/width) join-input rows instead of a
    * nested-loop product — pick `bucketMicros` near the TYPICAL interval
    * length (fan-out per interval = len/width + 1; too-fine buckets
    * replicate intervals, too-coarse buckets degrade the filter
    * selectivity, correctness is unaffected either way). A point joins
    * exactly ONE bucket, so point-in-interval needs no pair dedup
    * (interval×interval would). Zero-length/inverted intervals are
    * dropped up front — Spark's `sequence(a, b)` generates DESCENDING
    * for b < a and would fabricate bucket rows. Timestamps are compared
    * in exact epoch micros via [[micros]]. */
  def rangeJoinBucketed(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    val pb = points.withColumn("__bucket",
      bucketStart(micros(col(tsCol)), bucketMicros))
    val ib = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        bucketStart(micros(col(startCol)), bucketMicros),
        bucketStart(micros(col(endCol)) - 1, bucketMicros),
        lit(bucketMicros))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** The range join under the driver gate: event traffic inside the 10
    * busiest hours' OFFSET windows ([hour+30 min, hour+90 min) — the
    * half-open shift makes the counts genuinely range-dependent instead
    * of re-reading the hourly aggregate). The interval side is 10 rows →
    * the exploded bucket table broadcasts and the corpus streams through
    * one scan, no shuffle on the events side (plan-asserted in
    * AsofSpec). Top-10 cut is deterministic: (count DESC, hour) in both
    * engines. */
  def q64RangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val windows = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("h"))
      .limit(10)
      .select((col("h") + expr("INTERVAL 30 MINUTES")).as("win_start"),
        (col("h") + expr("INTERVAL 90 MINUTES")).as("win_end"))
    rangeJoinBucketed(ev.select(col("ts")), "ts",
        windows, "win_start", "win_end", bucketMicros = 15L * 60 * 1000000)
      .groupBy(col("win_start"))
      .agg(count(lit(1)).as("n_events"))
  }

  val q64Sql: String =
    """WITH busy AS (
      |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, count(*) AS n
      |  FROM events GROUP BY 1
      |  ORDER BY n DESC, h LIMIT 10),
      |win AS (
      |  SELECT h + INTERVAL 30 MINUTE AS win_start,
      |         h + INTERVAL 90 MINUTE AS win_end
      |  FROM busy)
      |SELECT win_start, count(*) AS n_events
      |FROM events e JOIN win w
      |  ON CAST(e.ts AS TIMESTAMP) >= w.win_start
      | AND CAST(e.ts AS TIMESTAMP) < w.win_end
      |GROUP BY win_start""".stripMargin

  /** Interval OVERLAP join ([[rangeJoinBucketed]]'s interval×interval
    * generalization): pairs every left interval with every right interval
    * it overlaps, under SET-INTERSECTION semantics — two half-open
    * intervals overlap iff their intersection is non-empty. For non-empty
    * intervals that is the usual theta predicate
    * `startL < endR AND startR < endL`; an EMPTY interval (end ≤ start,
    * the empty set) overlaps NOTHING, even though the raw predicate would
    * be TRUE for an empty interval strictly inside the other side. That
    * divergence is deliberate and pinned in AsofSpec ("empty interval
    * strictly inside"): callers who want the raw-predicate behavior must
    * widen empty intervals before calling.
    *
    * Both sides explode to their covered buckets and equi-join on the
    * bucket key — but unlike the point case, an overlapping pair shares
    * EVERY bucket in [max(starts), min(ends)), so the raw join emits
    * duplicates. They are eliminated WITHOUT a dropDuplicates shuffle:
    * a pair is kept only in the FIRST bucket both sides cover —
    * `bucket == bucketStart(max(startL, startR))` — a per-row
    * predicate on columns already present (the standard dedup trick for
    * bucketed spatial/temporal joins; asserted duplicate-free in
    * AsofSpec). Join input is Σ ceil(len/width) rows per side; width
    * tunes the replication/selectivity trade, never correctness.
    * Column names must be disjoint across the two frames. */
  def intervalOverlapJoin(left: DataFrame, startL: String, endL: String,
      right: DataFrame, startR: String, endR: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    def exploded(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) > col(s)) // empty = ∅ ⇒ overlaps nothing (see above)
        .withColumn("__bucket", explode(sequence(
          bucketStart(micros(col(s)), bucketMicros),
          bucketStart(micros(col(e)) - 1, bucketMicros),
          lit(bucketMicros))))
    exploded(left, startL, endL)
      .join(exploded(right, startR, endR), Seq("__bucket"))
      .filter(col(startL) < col(endR) && col(startR) < col(endL))
      .filter(col("__bucket") === bucketStart(
        greatest(micros(col(startL)), micros(col(startR))), bucketMicros))
      .drop("__bucket")
  }

  /** The overlap join under the driver gate: how many order fulfillment
    * windows ([o_orderdate, +3 days)) overlap each of the 10 busiest
    * order weeks. The 10-row week side explodes and broadcasts; orders
    * stream through one scan. Top-10 cut deterministic: (count DESC,
    * week) in both engines. */
  def q65OverlapJoin(s: SparkSession, d: String): DataFrame = {
    val ord = orders(s, d)
    val weeks = ord
      .groupBy(date_trunc("week", col("o_orderdate")).as("wk"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("wk"))
      .limit(10)
      .select(col("wk").as("wk_start"),
        (col("wk") + expr("INTERVAL 7 DAYS")).as("wk_end"))
    val spans = ord.select(col("o_orderkey"), col("o_orderdate").as("f_start"),
      (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("f_end"))
    intervalOverlapJoin(spans, "f_start", "f_end",
        weeks, "wk_start", "wk_end", bucketMicros = 7L * 86400 * 1000000)
      .groupBy(col("wk_start"))
      .agg(count(lit(1)).as("n_orders"))
  }

  val q65Sql: String =
    """WITH busy AS (
      |  SELECT date_trunc('week', o_orderdate) AS wk, count(*) AS n
      |  FROM orders GROUP BY 1
      |  ORDER BY n DESC, wk LIMIT 10),
      |win AS (
      |  SELECT CAST(wk AS TIMESTAMP) AS wk_start,
      |         CAST(wk AS TIMESTAMP) + INTERVAL 7 DAY AS wk_end
      |  FROM busy)
      |SELECT wk_start, count(*) AS n_orders
      |FROM orders o JOIN win w
      |  ON o.o_orderdate < w.wk_end
      | AND o.o_orderdate + INTERVAL 3 DAY > w.wk_start
      |GROUP BY wk_start""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q35_asof_join"    -> (q35AsofJoin _, q35Sql),
    "q64_range_join"   -> (q64RangeJoin _, q64Sql),
    "q65_overlap_join" -> (q65OverlapJoin _, q65Sql),
    "q132_asof_forward" -> (q132AsofForward _, q132Sql),
  )
}
