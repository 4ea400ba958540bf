package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q35_asof_join" -> (q35AsofJoin _, q35Sql),
  )
}
