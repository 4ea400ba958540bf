package graft.operators

import graft.SparkSpec

/** Closed-form check of the q125 brand basket-lift: hand-computed
  * support/marginals/lift on a 4-order corpus, per-order brand dedup,
  * and the support floor. */
class BasketSpec extends SparkSpec {
  import spark.implicits._

  test("brand basket: per-order dedup, pair support, hand-computed lift") {
    // orders: 1:{A,B} 2:{A,B} 3:{A,C} 4:{B} — A,B appear together in 2
    // of 4 orders; the duplicate A line in order 1 must not double-count
    val li = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),  // parts 10,11 are both brand A
      (2L, 10L), (2L, 12L),
      (3L, 10L), (3L, 13L),
      (4L, 12L))
      .toDF("l_orderkey", "l_partkey")
    val pt = Seq((10L, "A"), (11L, "A"), (12L, "B"), (13L, "C"))
      .toDF("p_partkey", "p_brand")
    val got = Relational.brandBasket(li, pt, minSupport = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // only (A,B) reaches support 2; (A,C) has support 1 → floored out
    assert(got.keySet === Set(("A", "B")))
    val (nab, na, nb, lift) = got(("A", "B"))
    assert((nab, na, nb) === ((2L, 3L, 3L)))
    // lift = (2·4)/(3·3)
    assert(lift === BigDecimal(2.0 * 4 / (3.0 * 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
