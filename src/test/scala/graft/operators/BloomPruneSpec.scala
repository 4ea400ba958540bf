package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prefilter is a superset of the exact match set and actually prunes") {
    val d = sf("sf0.01")
    val dim = Tables.part(spark, d).filter(col("p_size") < 5)
      .select(col("p_partkey"))
    val fact = Tables.lineitem(spark, d)
    val pruned = BloomPrune.bloomPrefilter(fact, dim, "l_partkey",
      "p_partkey", 4096L)
    val exact = fact.join(dim, fact("l_partkey") === dim("p_partkey"),
      "left_semi")
    val (nFact, nPruned, nExact) =
      (fact.count(), pruned.count(), exact.count())
    // no false negatives: every exact match survives the probe
    assert(exact.join(pruned.select(col("l_orderkey"), col("l_linenumber")),
      Seq("l_orderkey", "l_linenumber"), "left_anti").count() === 0L,
      "bloom dropped a true match")
    // superset, but a USEFUL one: at ~8.5% dim selectivity the probe
    // must reject the bulk of the fact side (FPP default is 3%)
    assert(nExact <= nPruned, "pruned below the exact count")
    assert(nPruned < nFact / 2,
      s"bloom pruned nothing: $nPruned of $nFact rows passed")
    val fpRate = (nPruned - nExact).toDouble / (nFact - nExact)
    assert(fpRate < 0.10, f"false-positive rate $fpRate%.3f implausibly high")
  }

  test("q93 plan: scalar-subquery bloom build, probe before the join") {
    val q = BloomPrune.q93BloomPrune(spark, sf("sf0.001"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    // the probe must sit UNDER the semi join (filter before shuffle),
    // not above it: might_contain appears in a Filter on the scan side
    val probeIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "bloom probe should be below the join in the plan tree\n" + plan.take(2000))
  }

  // NOTE: Catalyst's AUTOMATIC runtime bloom-filter injection (the rule
  // whose expressions BloomFilterFns re-exposes) is already pinned in
  // PlanAuditSpec's "runtime bloom filter" test — not duplicated here.
}
