package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SketchPlanner

/** A/B: what is the q205 sketch planner's decision WORTH at runtime?
  *
  * Corpus where static row counts cannot rank the two candidate first
  * joins of A⋈B⋈C (A and B are the same size) but the key distributions
  * make |A⋈B| explode (rows/800 shared k1 keys × 800 rows each side →
  * 2500 × 800 × 800 ≈ 1.6e9 intermediate rows at the 2M default, each
  * carrying A's 64-byte payload) while |B⋈C| is ~1e3: the CMS inner
  * product sees the square of the per-key counts, so the planner routes
  * around the explosion. Even pipelined (AQE broadcasts C, so the
  * intermediate never hits a shuffle), 1.6e9 payload-bearing rows are
  * pure wasted CPU the good
  * order never spends. Arms, all constructed INSIDE the timer (the round-11
  * BenchSkewAB lesson):
  *
  *   - plan:  the sketch pass itself + the decision (two constant-size
  *            sketch scans + two 1-row collects) — the planner's COST
  *   - good:  EXECUTION of the chosen order (decision precomputed —
  *            buildThreeWay, no sketching in the timer)
  *   - bad:   execution of the other order (the one a static-stats
  *            optimizer with no distribution knowledge might pick) —
  *            the penalty avoided
  *
  * `runMain graft.BenchPlanAB [rowsPerSide] [reps]`. Medians recorded in
  * BASELINE.md §SketchPlanAB. Identical outputs asserted before timing. */
object BenchPlanAB {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 2000000
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.getOrCreate("graft-plan-ab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val nKeys = rows / 800 // 800 rows per k1 key on each side
    val dir = java.nio.file.Files.createTempDirectory("planab").toString
    spark.range(rows.toLong)
      .select(pmod(col("id"), lit(nKeys.toLong)).as("k1"), col("id").as("av"),
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string"))).as("pad"))
      .write.mode("overwrite").parquet(s"$dir/a.parquet")
    spark.range(rows.toLong)
      .select(pmod(col("id"), lit(nKeys.toLong)).as("k1"),
        col("id").as("k2"), (col("id") * 2).as("bv"))
      .write.mode("overwrite").parquet(s"$dir/b.parquet")
    spark.range(1000L)
      .select(col("id").as("k2"), col("id").as("k3"), (col("id") * 3).as("cv"))
      .write.mode("overwrite").parquet(s"$dir/c.parquet")
    spark.range(1000L)
      .select(col("id").as("k3"), (col("id") * 5).as("dv"))
      .write.mode("overwrite").parquet(s"$dir/d.parquet")

    def a: DataFrame = spark.read.parquet(s"$dir/a.parquet")
    def b: DataFrame = spark.read.parquet(s"$dir/b.parquet")
    def c: DataFrame = spark.read.parquet(s"$dir/c.parquet")
    def dd: DataFrame = spark.read.parquet(s"$dir/d.parquet")

    // differential: both orders agree (on a 1000-row slice of the output)
    val (label0, planned0) = SketchPlanner.planThreeWay(a, b, c, "k1", "k2")
    require(label0.startsWith("bc_first"), s"unexpected decision $label0")
    val g = planned0.agg(count(lit(1)), sum(col("av")), sum(col("cv"))).collect()(0)
    val w = SketchPlanner.threeWayWorstFirst(a, b, c, "k1", "k2")
      .agg(count(lit(1)), sum(col("av")), sum(col("cv"))).collect()(0)
    require(g == w, s"arm mismatch: $g vs $w")

    def time(run: () => Unit): Double = {
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val results = (1 to reps).map { i =>
      var decision = ""
      // cold pricing per rep (the catalog would make reps 2+ free)
      SketchPlanner.SketchCatalog.clear()
      val plan = time(() =>
        decision = SketchPlanner.decideThreeWay(a, b, c, "k1", "k2"))
      def goodArm() = time(() =>
        sink(SketchPlanner.buildThreeWay(a, b, c, "k1", "k2", decision)))
      def badArm() = time(() =>
        sink(SketchPlanner.buildThreeWay(a, b, c, "k1", "k2",
          SketchPlanner.invertDecision(decision))))
      val (good, bad) =
        if (i % 2 == 0) { val x = badArm(); (goodArm(), x) }
        else { val x = goodArm(); (x, badArm()) }
      println(f"[plan-ab] rep $i: plan $plan%.3f s, good-order $good%.3f s, bad-order $bad%.3f s")
      (plan, good, bad)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[plan-ab] rows=$rows MEDIAN plan ${med(results.map(_._1))}%.3f s, " +
      f"good-order ${med(results.map(_._2))}%.3f s, " +
      f"bad-order ${med(results.map(_._3))}%.3f s")

    // ── 4-table CHAIN: the decideChain rule vs a hand-built best order
    // vs the no-knowledge left-to-right fold. The rule's plan must be
    // IDENTICAL to manual (asserted on canonicalized logical plans), so
    // "rule == manual" is structural; the timing rows document it.
    //
    // Expected decision, derived from the sketch's own arithmetic (not
    // from exact sizes): |c⋈d| = 1000 ranks first (noise ≤ ~61); b's 2M
    // distinct k2 values fill all 16384 cells, so est|b⋈c| carries the
    // structural ‖b‖₁·‖c‖₁/w ≈ 122k floor and ranks second — both
    // orders dodge e0's 1.6e9 explosion, which is all that costs money.
    // The final a-merge goes UNHINTED: the propagated estimate (~250k)
    // exceeds the 50k broadcast budget — one-sidedness means the
    // planner never wrongly broadcasts, and AQE's runtime stats (the
    // true 1000-row build side) still convert it dynamically: exactly
    // the static-planner/AQE division of labor.
    val chain = Seq(a, b, c, dd)
    val keys = Seq("k1", "k2", "k3")
    val steps = SketchPlanner.decideChain(chain, keys)
    require(steps == Seq(
      SketchPlanner.ChainStep(2, bcastLeft = true, bcastRight = false),
      SketchPlanner.ChainStep(1, bcastLeft = false, bcastRight = true),
      SketchPlanner.ChainStep(0, bcastLeft = false, bcastRight = false)),
      s"unexpected chain decision $steps")
    val ruled = SketchPlanner.buildChain(chain, keys, steps)
    val manual = a.join(
      b.join(broadcast(broadcast(c).join(dd, "k3")), "k2"), "k1")
    require(ruled.queryExecution.optimizedPlan.canonicalized ==
      manual.queryExecution.optimizedPlan.canonicalized,
      "rule-applied plan differs from the hand-built best order")
    def chainAgg(df: DataFrame) =
      df.agg(count(lit(1)), sum(col("av")), sum(col("cv")), sum(col("dv")))
        .collect()(0)
    val cg = chainAgg(ruled)
    require(cg == chainAgg(SketchPlanner.chainLeftToRight(chain, keys)),
      "chain arm mismatch")
    // the AUTOMATIC rule (round-14): optimizer rewrite of the plain
    // left-to-right query must land on the same plan as buildChain
    spark.conf.set(graft.plans.RewriteChainJoin.FLAG, "true")
    val auto = SketchPlanner.chainLeftToRight(chain, keys)
    require(auto.queryExecution.optimizedPlan.canonicalized ==
      manual.select(auto.columns.toSeq.map(col): _*)
        .queryExecution.optimizedPlan.canonicalized,
      "automatic RewriteChainJoin plan differs from the hand-built best order")
    spark.conf.unset(graft.plans.RewriteChainJoin.FLAG)

    val chainResults = (1 to reps).map { i =>
      // plan-cold re-prices every (table, key); plan-warm hits the
      // session sketch catalog (zero scans) — the cross-decision
      // amortization arm
      SketchPlanner.SketchCatalog.clear()
      val planCold = time(() => SketchPlanner.decideChain(chain, keys))
      val planWarm = time(() => SketchPlanner.decideChain(chain, keys))
      def ruleArm() = time(() => sink(SketchPlanner.buildChain(chain, keys, steps)))
      def manualArm() = time(() => sink(manual))
      def ltrArm() = time(() => sink(SketchPlanner.chainLeftToRight(chain, keys)))
      def autoArm() = time { () =>
        spark.conf.set(graft.plans.RewriteChainJoin.FLAG, "true")
        try sink(SketchPlanner.chainLeftToRight(chain, keys))
        finally spark.conf.unset(graft.plans.RewriteChainJoin.FLAG)
      }
      val (r, m, l, u) =
        if (i % 2 == 0) {
          val l0 = ltrArm(); val m0 = manualArm(); val u0 = autoArm()
          (ruleArm(), m0, l0, u0)
        } else { val r0 = ruleArm(); val m0 = manualArm(); (r0, m0, ltrArm(), autoArm()) }
      println(f"[plan-ab] chain rep $i: plan-cold $planCold%.3f s, " +
        f"plan-warm $planWarm%.3f s, rule $r%.3f s, " +
        f"manual $m%.3f s, auto-rule $u%.3f s, left-to-right $l%.3f s")
      (planCold, planWarm, r, m, l, u)
    }
    println(f"[plan-ab] chain rows=$rows MEDIAN plan-cold ${med(chainResults.map(_._1))}%.3f s, " +
      f"plan-warm ${med(chainResults.map(_._2))}%.3f s, " +
      f"rule ${med(chainResults.map(_._3))}%.3f s, " +
      f"manual ${med(chainResults.map(_._4))}%.3f s, " +
      f"auto-rule ${med(chainResults.map(_._6))}%.3f s, " +
      f"left-to-right ${med(chainResults.map(_._5))}%.3f s")

    // ── STAR (round-14 verdict task 3): one fact, two dims on distinct
    // fact keys, written WORST-FIRST. dAll is FACT-SIZED (1:1 on ba,
    // 64-byte payload — far over both the planner's row budget and
    // AQE's broadcast bytes, so its join genuinely shuffles); dSel
    // keeps 1% of the fact and fits the budget. The literal order
    // exchanges all `rows` fact rows against dAll and then exchanges
    // the payload-bearing intermediate again for dSel; the decided
    // order (selective-first, broadcast) cuts the fact to 1% BEFORE
    // the unavoidable dAll exchange — the saved work is two fact-sized
    // shuffles of wide rows.
    spark.range(rows.toLong)
      .select(col("id").as("sa"), col("id").as("ba"), col("id").as("fv"))
      .write.mode("overwrite").parquet(s"$dir/sf.parquet")
    spark.range(rows.toLong)
      .select(col("id").as("da_b"),
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string"))).as("dpad"),
        (col("id") * 7).as("dallv"))
      .write.mode("overwrite").parquet(s"$dir/dall.parquet")
    spark.range(rows.toLong / 100)
      .select(col("id").as("ds_a"), (col("id") * 3).as("dselv"))
      .write.mode("overwrite").parquet(s"$dir/dsel.parquet")
    // stable instances: Column-addressed edges must reference the SAME
    // resolved attributes as the frames they join
    val sf: DataFrame = spark.read.parquet(s"$dir/sf.parquet")
    val dAll: DataFrame = spark.read.parquet(s"$dir/dall.parquet")
    val dSel: DataFrame = spark.read.parquet(s"$dir/dsel.parquet")
    val starEdges = Seq(
      (sf("ba"), dAll("da_b")), (sf("sa"), dSel("ds_a")))
    val starDims = Seq(dAll, dSel)
    val starSteps = SketchPlanner.decideStar(sf, starDims, starEdges)
    require(starSteps.map(_.edge) == Seq(1, 0) && starSteps.head.bcastDim &&
      !starSteps(1).bcastDim, s"unexpected star decision $starSteps")
    def starDecided = SketchPlanner.buildStar(sf, starDims, starEdges, starSteps)
    def starLiteral = SketchPlanner.starLiteralOrder(sf, starDims, starEdges)
    def starAgg(df: DataFrame) =
      df.agg(count(lit(1)), sum(col("fv")), sum(col("dallv")), sum(col("dselv")))
        .collect()(0)
    val sg = starAgg(starDecided)
    require(sg == starAgg(starLiteral), "star arm mismatch")
    // the AUTOMATIC rule must land on buildStar's plan
    spark.conf.set(graft.plans.RewriteChainJoin.FLAG, "true")
    val starAuto = starLiteral
    require(starAuto.queryExecution.optimizedPlan.canonicalized ==
      starDecided.select(starAuto.columns.toSeq.map(col): _*)
        .queryExecution.optimizedPlan.canonicalized,
      "automatic star rewrite differs from the manual buildStar order")
    spark.conf.unset(graft.plans.RewriteChainJoin.FLAG)
    val starResults = (1 to reps).map { i =>
      SketchPlanner.SketchCatalog.clear()
      val planCold = time(() => SketchPlanner.decideStar(sf, starDims, starEdges))
      val planWarm = time(() => SketchPlanner.decideStar(sf, starDims, starEdges))
      def decidedArm() = time(() => sink(starDecided))
      def literalArm() = time(() => sink(starLiteral))
      def autoArm() = time { () =>
        spark.conf.set(graft.plans.RewriteChainJoin.FLAG, "true")
        try sink(starLiteral)
        finally spark.conf.unset(graft.plans.RewriteChainJoin.FLAG)
      }
      val (dec, lito, auto) =
        if (i % 2 == 0) { val l0 = literalArm(); (decidedArm(), l0, autoArm()) }
        else { val d0 = decidedArm(); (d0, literalArm(), autoArm()) }
      println(f"[plan-ab] star rep $i: plan-cold $planCold%.3f s, " +
        f"plan-warm $planWarm%.3f s, decided $dec%.3f s, " +
        f"auto-rule $auto%.3f s, literal $lito%.3f s")
      (planCold, planWarm, dec, lito, auto)
    }
    println(f"[plan-ab] star rows=$rows MEDIAN plan-cold ${med(starResults.map(_._1))}%.3f s, " +
      f"plan-warm ${med(starResults.map(_._2))}%.3f s, " +
      f"decided ${med(starResults.map(_._3))}%.3f s, " +
      f"auto-rule ${med(starResults.map(_._5))}%.3f s, " +
      f"literal ${med(starResults.map(_._4))}%.3f s")

    // ── SNOWFLAKE (round-15 verdict task 6): the selective dim is now a
    // BRANCH — a dim joined by a subdim whose filter does the cutting
    // (region→nation→customer in miniature). Written worst-first AND
    // linearly (the subdim joins the dim's key, not the fact's), the
    // shape extractStar used to concede. The rule must collapse the
    // branch, see its 1% retention, and join it first broadcast —
    // same two saved fact-sized shuffles as the star arm.
    spark.range(rows.toLong / 100)
      .select(col("id").as("ds_a"), pmod(col("id"), lit(50)).as("sub"),
        (col("id") * 3).as("dselv"))
      .write.mode("overwrite").parquet(s"$dir/dsel2.parquet")
    spark.range(50)
      .select(col("id").as("sub_k"), (col("id") * 11).as("dsubv"))
      .write.mode("overwrite").parquet(s"$dir/dsub.parquet")
    val dSel2: DataFrame = spark.read.parquet(s"$dir/dsel2.parquet")
    val dSub: DataFrame = spark.read.parquet(s"$dir/dsub.parquet")
    val branch: DataFrame =
      dSel2.join(dSub, dSel2("sub") === dSub("sub_k"))
    val snowEdges = Seq((sf("ba"), dAll("da_b")), (sf("sa"), dSel2("ds_a")))
    val snowDims = Seq(dAll, branch)
    val snowSteps = SketchPlanner.decideStar(sf, snowDims, snowEdges)
    require(snowSteps.map(_.edge) == Seq(1, 0) && snowSteps.head.bcastDim,
      s"unexpected snowflake decision $snowSteps")
    def snowDecided = SketchPlanner.buildStar(sf, snowDims, snowEdges, snowSteps)
    // literal linear fold — the user's written order
    def snowLiteral = sf.join(dAll, sf("ba") === dAll("da_b"))
      .join(dSel2, sf("sa") === dSel2("ds_a"))
      .join(dSub, dSel2("sub") === dSub("sub_k"))
    def snowAgg(df: DataFrame) =
      df.agg(count(lit(1)), sum(col("fv")), sum(col("dallv")),
        sum(col("dselv")), sum(col("dsubv"))).collect()(0)
    require(snowAgg(snowDecided) == snowAgg(snowLiteral), "snowflake arm mismatch")
    // the AUTOMATIC rule on the LINEAR fold must land on the collapsed
    // decided order
    spark.conf.set(graft.plans.RewriteChainJoin.FLAG, "true")
    val snowHinted = snowLiteral.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.hint != org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE => j
    }
    spark.conf.unset(graft.plans.RewriteChainJoin.FLAG)
    require(snowHinted.nonEmpty,
      "snowflake rewrite did not fire on the linear fold")
    val snowResults = (1 to reps).map { i =>
      SketchPlanner.SketchCatalog.clear()
      val planCold = time(() => SketchPlanner.decideStar(sf, snowDims, snowEdges))
      val planWarm = time(() => SketchPlanner.decideStar(sf, snowDims, snowEdges))
      def decidedArm() = time(() => sink(snowDecided))
      def literalArm() = time(() => sink(snowLiteral))
      def autoArm() = time { () =>
        spark.conf.set(graft.plans.RewriteChainJoin.FLAG, "true")
        try sink(snowLiteral)
        finally spark.conf.unset(graft.plans.RewriteChainJoin.FLAG)
      }
      val (dec, lito, auto) =
        if (i % 2 == 0) { val l0 = literalArm(); (decidedArm(), l0, autoArm()) }
        else { val d0 = decidedArm(); (d0, literalArm(), autoArm()) }
      println(f"[plan-ab] snowflake rep $i: plan-cold $planCold%.3f s, " +
        f"plan-warm $planWarm%.3f s, decided $dec%.3f s, " +
        f"auto-rule $auto%.3f s, literal $lito%.3f s")
      (planCold, planWarm, dec, lito, auto)
    }
    println(f"[plan-ab] snowflake rows=$rows MEDIAN plan-cold ${med(snowResults.map(_._1))}%.3f s, " +
      f"plan-warm ${med(snowResults.map(_._2))}%.3f s, " +
      f"decided ${med(snowResults.map(_._3))}%.3f s, " +
      f"auto-rule ${med(snowResults.map(_._5))}%.3f s, " +
      f"literal ${med(snowResults.map(_._4))}%.3f s")
    spark.stop()
  }
}
