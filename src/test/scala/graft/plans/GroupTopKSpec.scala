package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-group top-k whole-operator: semantics vs the window
  * `row_number` form it replaces, the partial/final plan shape, and the
  * automatic optimizer rewrite of existing window-style queries. */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private val d = sf("sf0.001")

  private def planOf(df: DataFrame): String = {
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString
  }

  private def windowTopK(df: DataFrame, group: Seq[String],
      order: Seq[org.apache.spark.sql.Column], k: Int): DataFrame = {
    val w = Window.partitionBy(group.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("operator == window row_number top-k on customer, k=3 and k=1") {
    val cust = spark.read.parquet(s"$d/customer.parquet")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
    for (k <- Seq(1, 3)) {
      val ours = GroupTopKExtension.topKPerGroup(cust, Seq("c_nationkey"),
        Seq(("c_acctbal", false), ("c_custkey", true)), k)
      val ref = windowTopK(cust, Seq("c_nationkey"),
        Seq($"c_acctbal".desc, $"c_custkey".asc), k)
      assert(sortedRows(ours) === sortedRows(ref), s"k=$k")
    }
  }

  test("k larger than every group keeps all rows; ties broken by the tiebreaker") {
    val df = Seq(
      ("a", 1, 10), ("a", 2, 10), ("a", 3, 10),   // 3-way tie on v
      ("b", 4, 5), ("b", 5, 7),
      ("c", 6, 1)
    ).toDF("g", "id", "v")
    val all = GroupTopKExtension.topKPerGroup(df, Seq("g"),
      Seq(("v", false), ("id", true)), 100)
    assert(all.count() === 6)
    val top2 = GroupTopKExtension.topKPerGroup(df, Seq("g"),
      Seq(("v", false), ("id", true)), 2)
    val ref = windowTopK(df, Seq("g"), Seq($"v".desc, $"id".asc), 2)
    assert(sortedRows(top2) === sortedRows(ref))
    // tie group "a": deterministic winners are ids 1 and 2
    assert(top2.filter($"g" === "a").select($"id").as[Int].collect().sorted
      === Array(1, 2))
  }

  test("empty input produces empty output") {
    val df = Seq.empty[(String, Int)].toDF("g", "v")
    assert(GroupTopKExtension.topKPerGroup(df, Seq("g"),
      Seq(("v", false)), 3).count() === 0)
  }

  test("plan: partial heap before the exchange, final after; no Window, no input Sort") {
    val cust = spark.read.parquet(s"$d/customer.parquet")
      .select($"c_custkey", $"c_acctbal", $"c_nationkey")
    val df = GroupTopKExtension.topKPerGroup(cust, Seq("c_nationkey"),
      Seq(("c_acctbal", false), ("c_custkey", true)), 3)
    val plan = planOf(df).split("== Initial Plan ==").head
    assert(plan.contains("GroupTopKPartial"), plan.take(2000))
    assert(plan.contains("GroupTopK"), plan.take(2000))
    // partial must sit BELOW the exchange (map-side), final above
    val lines = plan.linesIterator.toSeq
    val iFinal = lines.indexWhere(l => l.contains("GroupTopK") && !l.contains("Partial"))
    val iEx = lines.indexWhere(_.contains("Exchange"), iFinal)
    val iPartial = lines.indexWhere(_.contains("GroupTopKPartial"), iEx)
    assert(iFinal >= 0 && iEx > iFinal && iPartial > iEx,
      s"expected final < exchange < partial top-down, got $iFinal/$iEx/$iPartial\n$plan")
    assert(!plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("Sort "), plan.take(2000))
  }

  test("optimizer rule rewrites filter(row_number<=k) window plans automatically") {
    GroupTopKExtension.install(spark)
    val cust = spark.read.parquet(s"$d/customer.parquet")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
    val windowed = windowTopK(cust, Seq("c_nationkey"),
      Seq($"c_acctbal".desc, $"c_custkey".asc), 3)
    assert(windowed.queryExecution.optimizedPlan.collect {
      case g: GroupTopK => g
    }.nonEmpty, windowed.queryExecution.optimizedPlan.toString)
    val plan = planOf(windowed).split("== Initial Plan ==").head
    assert(plan.contains("GroupTopK") && !plan.contains("Window"), plan.take(2000))
    // and the rewritten plan still returns the window answer
    val direct = GroupTopKExtension.topKPerGroup(cust, Seq("c_nationkey"),
      Seq(("c_acctbal", false), ("c_custkey", true)), 3)
    assert(sortedRows(windowed) === sortedRows(direct))
  }

  test("rule declines: rank kept in output, rank() instead of row_number, no ordering") {
    GroupTopKExtension.install(spark)
    val df = Seq(("a", 1, 10), ("a", 2, 9), ("b", 3, 8)).toDF("g", "id", "v")
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)
    // rank column survives in the output -> operator can't produce it
    val kept = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(kept.queryExecution.optimizedPlan.collect {
      case g: GroupTopK => g }.isEmpty)
    assert(kept.collect().length === 3)
    // rank() keeps >k rows on ties — must not rewrite
    val tied = Seq(("a", 1, 10), ("a", 2, 10), ("a", 3, 10)).toDF("g", "id", "v")
    val ranked = tied
      .withColumn("rk", rank().over(Window.partitionBy($"g").orderBy($"v".desc)))
      .filter($"rk" <= 1).drop("rk")
    assert(ranked.queryExecution.optimizedPlan.collect {
      case g: GroupTopK => g }.isEmpty)
    assert(ranked.count() === 3) // all three tie for rank 1
  }

  test("rewrite fires through spark.sql QUALIFY-style subquery form too") {
    GroupTopKExtension.install(spark)
    spark.read.parquet(s"$d/customer.parquet").createOrReplaceTempView("gtk_cust")
    val df = spark.sql(
      """SELECT c_custkey, c_acctbal, c_nationkey FROM (
        |  SELECT c_custkey, c_acctbal, c_nationkey,
        |    row_number() OVER (PARTITION BY c_nationkey
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM gtk_cust) WHERE rn <= 5""".stripMargin)
    assert(df.queryExecution.optimizedPlan.collect {
      case g: GroupTopK => g }.nonEmpty,
      df.queryExecution.optimizedPlan.toString)
    val cust = spark.table("gtk_cust")
      .select($"c_custkey", $"c_acctbal", $"c_nationkey")
    val ref = windowTopK(cust, Seq("c_nationkey"),
      Seq($"c_acctbal".desc, $"c_custkey".asc), 5)
      // ref would itself rewrite; compare values regardless of plan
    assert(sortedRows(df) === sortedRows(ref))
  }

  test("randomized differential: many groups, skewed sizes, nulls in the sort key") {
    val rng = new scala.util.Random(4242)
    val rows = (1 to 5000).map { i =>
      val g = rng.nextInt(97)
      val v: java.lang.Double =
        if (rng.nextInt(20) == 0) null else java.lang.Double.valueOf(rng.nextInt(50))
      (g, i, v)
    }
    val df = rows.toDF("g", "id", "v").repartition(8)
    val ours = GroupTopKExtension.topKPerGroup(df, Seq("g"),
      Seq(("v", false), ("id", true)), 7)
    val ref = windowTopK(df, Seq("g"), Seq($"v".desc, $"id".asc), 7)
    assert(sortedRows(ours) === sortedRows(ref))
  }

  test("q86 gated query actually runs the rewrite: GroupTopK, no Window") {
    val q = graft.operators.Relational.q86WindowTopkRewrite(
      spark, "/root/testdata/sf0.001")
    q.queryExecution.toRdd.count()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("GroupTopK"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }
}
