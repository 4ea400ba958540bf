package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("distributed global rank equals the single-partition window form") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_extendedprice").as("x"), col("l_orderkey"),
        col("l_linenumber"))
    val dist = Relational.globalRank(li, col("x"),
      struct(col("l_orderkey"), col("l_linenumber")), parts = 8)
      .select(col("rnk"), col("x"), col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Double, Long, Long)].collect().sortBy(_._1)
    val naive = li.withColumn("rnk", row_number().over(
        Window.orderBy(col("x"), col("l_orderkey"), col("l_linenumber")))
        .cast("long"))
      .select(col("rnk"), col("x"), col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Double, Long, Long)].collect().sortBy(_._1)
    assert(dist.length === naive.length)
    assert(dist.toSeq === naive.toSeq)
  }

  test("rank is invariant to the partition count, ties broken by the tiebreak") {
    // heavy ties: only 5 distinct values over 1000 rows — every rank
    // decision crosses value groups and partition boundaries
    val df = (1L to 1000L).map(i => (i % 5, i)).toDF("v", "id")
    def ranks(parts: Int) =
      Relational.globalRank(df, col("v"), col("id"), parts)
        .select(col("id"), col("rnk")).as[(Long, Long)].collect().toMap
    val r4 = ranks(4)
    val r16 = ranks(16)
    assert(r4 === r16)
    // closed form: rank = v*200 + position within the id sequence
    assert(r4.size === 1000)
    assert(r4.values.toSeq.sorted === (1L to 1000L))
    val want = (1L to 1000L).map(i => i -> ((i % 5) * 200L +
      (i - 1) / 5 + 1)).toMap
    assert(r4 === want)
  }
}
