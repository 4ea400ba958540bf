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

  test("grouped rank equals the per-group window form across group counts and parts") {
    // 3 groups (the q94 shape: a low-cardinality partition key whose
    // window would sort in 3 tasks), heavy ties inside each group
    val df = (1L to 3000L).map(i => (s"g${i % 3}", i % 7, i))
      .toDF("grp", "v", "id")
    def toMap2(rows: Array[(String, Long, Long)]) =
      rows.map(r => (r._1, r._2) -> r._3).toMap
    val naive = toMap2(df.withColumn("rnk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("v"), col("id")))
        .cast("long"))
      .select(col("grp"), col("id"), col("rnk"))
      .as[(String, Long, Long)].collect())
    for (parts <- Seq(4, 16)) {
      val got = toMap2(
        Relational.groupedRank(df, col("grp"), col("v"), col("id"), parts)
          .select(col("grp"), col("id"), col("rnk"))
          .as[(String, Long, Long)].collect())
      assert(got === naive, s"parts=$parts")
    }
    // a group smaller than any partition slice still ranks correctly
    val tiny = df.unionByName(Seq(("solo", 0L, 9999L)).toDF("grp", "v", "id"))
    val got = toMap2(
      Relational.groupedRank(tiny, col("grp"), col("v"), col("id"), 8)
        .select(col("grp"), col("id"), col("rnk"))
        .as[(String, Long, Long)].collect())
    assert(got(("solo", 9999L)) === 1L)
    assert(got.size === 3001)
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

  test("gini: uniform spend scores 0; total concentration scores (n-1)/n") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ginispec").toString
    def giniOf(rows: Seq[(Long, Long, Double)]): (Long, Long, Double) = {
      rows.map { case (ok, ck, tp) =>
        (ok, ck, tp, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")) }
        .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      Relational.q153Gini(spark, dir).as[(Long, Long, Double)].head()
    }
    // 10 customers, equal spend → perfect equality
    val equal = (1L to 10L).map(i => (i, i, 50.0))
    assert(giniOf(equal) === ((10L, 5000000L, 0.0)))
    // one customer holds everything (others epsilon-free? zero spend
    // means no order — use near-zero): planted closed form on 4 custs
    // y = (0.0001, 0.0001, 0.0001, 100): moments by hand
    val skewed = Seq((1L, 1L, 0.0001), (2L, 2L, 0.0001), (3L, 3L, 0.0001),
      (4L, 4L, 100.0))
    val (n, sy, g) = giniOf(skewed)
    assert((n, sy) === ((4L, 1000003L)))
    // hand-computed: ranks 1..4, y = (1,1,1,1000000) in 1e-4 units
    // sry = 1+2+3+4000000 = 4000006; G = (2*4000006 - 5*1000003)/(4*1000003)
    val want = BigDecimal((2.0 * 4000006 - 5.0 * 1000003) / (4.0 * 1000003))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g === want)
  }

  test("weighted median: cumulative-weight argmin, exact half boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wmedspec").toString
    // brand B1: prices 1,2,3 with weights 1,1,2 → cum (1,2,4), tot 4;
    //   2*cum>=4 first at price 2 (exact boundary: 2*2 == 4)
    // brand B2: prices 10,20 with weights 9,1 → median 10
    Seq((1L, "B1", 1.0), (2L, "B1", 2.0), (3L, "B1", 3.0),
      (4L, "B2", 10.0), (5L, "B2", 20.0))
      .toDF("p_partkey", "p_brand", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 9.0), (5L, 1.0))
      .toDF("l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.q154WeightedMedian(spark, dir)
      .as[(String, Double, Long)].collect().toSet
    assert(got === Set(("B1", 2.0, 40000L), ("B2", 10.0, 100000L)))
  }

  test("exact quantiles: percentile_cont closed form + differential vs percentile()") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("quantspec").toString
    def quantsOf(xs: Seq[Double]): Map[Double, Double] = {
      xs.zipWithIndex.map { case (x, i) => (i.toLong, i, x) }
        .toDF("l_orderkey", "l_linenumber", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      Relational.q157ExactQuantiles(spark, dir)
        .as[(Double, Double)].collect().toMap
    }
    // 1..10: pos(0.5)=4.5 -> 5.5; pos(0.9)=8.1 -> 9.1; pos(0.99)=8.91 -> 9.91
    assert(quantsOf((1 to 10).map(_.toDouble)) ===
      Map(0.5 -> 5.5, 0.9 -> 9.1, 0.99 -> 9.91))
    // random differential against Spark's exact percentile()
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(501)(rnd.nextInt(10000) / 100.0)
    val got = quantsOf(xs)
    val want = xs.toDF("x")
      .selectExpr("percentile(x, 0.5)", "percentile(x, 0.9)",
        "percentile(x, 0.99)")
      .as[(Double, Double, Double)].head()
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((got(0.5), got(0.9), got(0.99)) ===
      ((r6(want._1), r6(want._2), r6(want._3))))
  }

  test("sales opportunity: integer-exact above-average cut, anti-join, segment rollup") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("salesoppspec").toString
    Seq((1L, "A", 100.0), (2L, "A", 10.0), (3L, "B", 50.0), (4L, "B", -5.0))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // c3 ordered recently; c1 has only an OLD order (lapsed with
    // history); c2/c4 never ordered
    Seq((30L, 3L, java.sql.Timestamp.valueOf("2021-06-01 00:00:00")),
      (10L, 1L, java.sql.Timestamp.valueOf("2019-01-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // positive avg = 160/3 = 53.33; lapsed = {1,2,4}; above avg = {1}
    val got = Relational.q159SalesOpportunity(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("A", 1L, 1000000L)))
  }

  test("lorenz deciles: exact cumulative shares on planted spend 1..10") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lorenzspec").toString
    (1L to 10L).map(i => (i, i, i.toDouble))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.q160LorenzDeciles(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === (0L to 9L).toSet)
    (0L to 9L).foreach { dcl =>
      val i = dcl + 1
      val share = BigDecimal(i * (i + 1) / 2.0 / 55.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(dcl) === ((1L, i * 10000L, share)), s"decile $dcl")
    }
  }

  test("benford: integer first-digit extraction incl. power-of-ten boundaries") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("benfordspec").toString
    // 10.0000 -> 100000 -> digit 1; 0.9999 -> 9999 -> 9; 0.0001 -> 1 -> 1;
    // 999.9999 -> 9999999 -> 9; 200.5 -> 2005000 -> 2; <=0 dropped
    val xs = Seq(10.0, 0.9999, 0.0001, 999.9999, 200.5, 0.0, -3.0)
    xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, 1L, x, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.q161Benford(spark, dir)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def p6(dg: Int) = BigDecimal(math.log(1.0 + 1.0 / dg) / math.log(10.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map(1L -> ((2L, p6(1))), 2L -> ((1L, p6(2))),
      9L -> ((2L, p6(9)))))
  }

  test("pareto point: minimal prefix covering 80%, exact integer boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("paretospec").toString
    // spends 80, 10, 5, 5 -> top-1 covers exactly 80% (5*cum == 4*total)
    Seq((1L, 1L, 80.0), (2L, 2L, 10.0), (3L, 3L, 5.0), (4L, 4L, 5.0))
      .map { case (ok, ck, v) =>
        (ok, ck, v, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.q169ParetoPoint(spark, dir)
      .as[(Long, Long, Double, Double)].head()
    assert(r === ((1L, 4L, 0.25, 0.8)))
  }

  test("fill latency: exact interpolated percentiles on planted latencies") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fillspec").toString
    val d0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    def day(n: Int) = java.sql.Timestamp.valueOf(f"2020-01-${1 + n}%02d 00:00:00")
    // priority P: order latencies 2, 4, 10 (first ship = min shipdate)
    Seq((1L, d0, "P"), (2L, d0, "P"), (3L, d0, "P"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, day(2)), (1L, day(9)), (2L, day(4)), (3L, day(10)))
      .toDF("l_orderkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.q170FillLatency(spark, dir)
      .as[(String, Long, Double, Double)].head()
    // p50 of (2,4,10) = 4; p90: pos = 0.9*2 = 1.8 -> 4 + 0.8*(10-4) = 8.8
    assert(r === (("P", 3L, 4.0, 8.8)))
  }
}
