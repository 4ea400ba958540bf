package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The approximate-sketch scale paths documented next to their exact
  * counterparts (q09 countDistinct → HLL; q32 percentile → t-digest):
  * bounded-memory, one pass, merge order-independent. */
class SketchSpec extends SparkSpec {
  import spark.implicits._
  private val d = sf("sf0.01")

  test("approx_count_distinct within 5% of exact and partitioning-independent") {
    val li = Tables.lineitem(spark, d)
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].head()
    val approx1 = li.repartition(4)
      .select(approx_count_distinct(col("l_partkey"))).as[Long].head()
    val approx2 = li.repartition(17)
      .select(approx_count_distinct(col("l_partkey"))).as[Long].head()
    assert(math.abs(approx1 - exact).toDouble / exact < 0.05, s"$approx1 vs $exact")
    assert(approx1 === approx2) // HLL merge is order/partitioning independent
  }

  test("approx_percentile tracks exact percentile") {
    val li = Tables.lineitem(spark, d)
    val exact = li.select(expr("percentile(l_quantity, 0.5)")).as[Double].head()
    val approx = li.select(expr("approx_percentile(l_quantity, 0.5, 1000)"))
      .as[Double].head()
    assert(math.abs(approx - exact) <= 1.0, s"$approx vs $exact")
  }
}
