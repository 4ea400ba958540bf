package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(60000L * m)

  test("funnel: strict ordering per step, first-touch attribution") {
    val ev = Seq(
      // u1: full funnel in order
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      // u2: click BEFORE first view -> view counted, click not
      (2L, "click", ts(0)), (2L, "view", ts(10)),
      // u3: purchase before the qualifying click -> not a funnel completion
      (3L, "view", ts(0)), (3L, "purchase", ts(5)), (3L, "click", ts(10)),
      // u4: no view at all -> counted in n_users only
      (4L, "purchase", ts(0)),
      // u5: repeated views — t1 pins to the FIRST view, click qualifies
      (5L, "view", ts(0)), (5L, "view", ts(50)), (5L, "click", ts(60)),
      // u6: click at EXACTLY the view timestamp -> strict > excludes it
      (6L, "view", ts(0)), (6L, "click", ts(0)))
      .toDF("user_id", "event_type", "ts")
    val r = Analytics.funnel(ev).collect()(0)
    assert(r.getAs[Long]("n_users") === 6L)
    assert(r.getAs[Long]("n_view") === 5L)        // u1, u2, u3, u5, u6
    assert(r.getAs[Long]("n_view_click") === 3L)  // u1, u3, u5
    assert(r.getAs[Long]("n_funnel") === 1L)      // u1
  }

  test("funnel plan: the whole funnel costs ONE hash-partitioned shuffle") {
    val q = Analytics.q66Funnel(spark, sf("sf0.001"))
    q.queryExecution.toRdd.count()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE toString appends the pre-AQE plan
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges === 1, s"expected 1 hash exchange, plan:\n${plan.take(3000)}")
  }

  test("retention: offsets non-negative; offset-0 covers every user; gaps kept") {
    val ev = Seq(
      // u1 active weeks 0, 2 (skips week 1 — offset 2 must still appear)
      (1L, ts(0)), (1L, ts(2 * 7 * 24 * 60)),
      // u2 joins in week 1, active weeks 1, 2
      (2L, ts(7 * 24 * 60)), (2L, ts(2 * 7 * 24 * 60)),
      // u3 active only week 0
      (3L, ts(100)))
      .toDF("user_id", "ts")
    val r = Analytics.retention(ev)
      .collect()
      .map(x => (x.getAs[java.sql.Date]("cohort_week").toString,
        x.getAs[Long]("week_offset"), x.getAs[Long]("n_active")))
      .toSet
    // epoch week 0 starts Mon 1969-12-29; minute 0 = 1970-01-01 (Thu)
    val w0 = "1969-12-29"; val w1 = "1970-01-05"
    assert(r === Set((w0, 0L, 2L), (w0, 2L, 1L), (w1, 0L, 1L), (w1, 1L, 1L)))
    // every user appears in their own cohort at offset 0
    val total = r.filter(_._2 == 0L).map(_._3).sum
    assert(total === 3L)
  }
}
