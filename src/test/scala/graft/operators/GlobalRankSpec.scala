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

  test("skyline: closed form with ties and duplicates; matches brute-force dominance") {
    import spark.implicits._
    // (10,5) frontier; (10,5) duplicate → BOTH stay (neither strictly
    // beats the other); (10,3) dominated within its price group;
    // (12,5) dominated by cheaper (10,5); (12,7) frontier (bigger);
    // (15,7) dominated (same size, pricier); (8,1) frontier (cheapest).
    val rows = Seq(
      (1L, 10.0, 5), (2L, 10.0, 5), (3L, 10.0, 3), (4L, 12.0, 5),
      (5L, 12.0, 7), (6L, 15.0, 7), (7L, 8.0, 1))
      .toDF("p_partkey", "price", "p_size")
    val got = Relational.skyline2d(rows, parts = 3)
      .as[(Long, Double, Int)].collect().map(_._1).toSet
    assert(got === Set(1L, 2L, 5L, 7L))

    // random differential vs quadratic dominance, across partition counts
    val rnd = new scala.util.Random(137)
    for (trial <- 1 to 3) {
      val data = (1L to 300L).map(i =>
        (i, (rnd.nextInt(40) + 1).toDouble, rnd.nextInt(30)))
      val brute = data.filter { case (_, pr, sz) =>
        !data.exists { case (_, pr2, sz2) =>
          pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz) }
      }.map(_._1).toSet
      val dist = Relational.skyline2d(
          data.toDF("p_partkey", "price", "p_size"), parts = 5)
        .as[(Long, Double, Int)].collect().map(_._1).toSet
      assert(dist === brute, s"trial $trial")
    }
  }
}
