package graft.operators

import graft.SparkSpec

/** Differential: the MR-facade indexer must agree exactly with the
  * Catalyst-native q19 on the real corpus — same words, same doc counts,
  * same sorted posting strings. (q30's wc facade parity is implied by both
  * sharing the q18 oracle; this is the q118 analog, checked in-suite so a
  * facade regression fails before the driver gate.) */
class TextOpsSpec extends SparkSpec {

  test("q118 MR-facade indexer == q19 DataFrame indexer on sf0.001") {
    val d = sf("sf0.001")
    val facade = TextOps.q118MrIndexer(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val native = TextOps.q19InvertedIndex(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(facade.nonEmpty)
    assert(facade === native)
  }
}
