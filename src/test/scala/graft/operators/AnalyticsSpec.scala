package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(60000L * m)

  test("eventTransitions: per-user adjacency counts, (ts, event_id) tie-break") {
    val ev = Seq(
      // u1: a→b→a (two transitions)
      (1L, 1L, "a", ts(0)), (2L, 1L, "b", ts(1)), (3L, 1L, "a", ts(2)),
      // u2: same-timestamp pair — event_id orders b BEFORE c
      (5L, 2L, "b", ts(0)), (6L, 2L, "c", ts(0)),
      // u3: single event → no transitions at all
      (7L, 3L, "a", ts(9)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Analytics.eventTransitions(ev)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", "b", 1L, 1L),   // from-total of 'a' counts only a→b
      ("b", "a", 1L, 2L),   // 'b' fans out to a and c → from_total 2
      ("b", "c", 1L, 2L)))
    // swapping the event_ids at the tied timestamp flips the transition
    val flipped = ev.withColumn("event_id",
      when(col("event_id") === 5L, 6L)
        .when(col("event_id") === 6L, 5L).otherwise(col("event_id")))
    val got2 = Analytics.eventTransitions(flipped)
      .as[(String, String, Long, Long)].collect().toSet
    // u2's b→c becomes c→b; u1's transitions (and b→a) are untouched,
    // so 'b' now fans out only to 'a' → its from_total drops to 1
    assert(got2 === Set(
      ("a", "b", 1L, 1L), ("b", "a", 1L, 1L), ("c", "b", 1L, 1L)))
  }

  test("intervalMerge: overlap and touch merge, strict gaps split, keys isolate") {
    val iv = Seq(
      (1L, ts(0), ts(10)), (1L, ts(5), ts(7)),  // contained span
      (1L, ts(10), ts(20)),                     // touching endpoint → merges
      (1L, ts(21), ts(30)),                     // strict gap → new island
      (2L, ts(0), ts(1)))                       // second key stays isolated
      .toDF("k", "s", "e")
    val got = Analytics.intervalMerge(iv)
      .as[(Long, Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, ts(0), ts(20), 3L),
      (1L, 2L, ts(21), ts(30), 1L),
      (2L, 1L, ts(0), ts(1), 1L)))
  }

  test("intervalMerge matches a naive scan-merge on random interval sets") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val iv = (1 to 200).map { _ =>
        val k = rnd.nextInt(5).toLong
        val s = rnd.nextInt(100).toLong
        (k, s, s + rnd.nextInt(8))
      }
      val got = Analytics.intervalMerge(iv.toDF("k", "s", "e"))
        .select("k", "merged_from", "merged_to", "n_spans")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = iv.groupBy(_._1).flatMap { case (k, spans) =>
        val sorted = spans.map(t => (t._2, t._3)).sorted
        val islands = sorted.tail.foldLeft(
          List((sorted.head._1, sorted.head._2, 1L))) {
          case ((f, t, n) :: rest, (s2, e2)) =>
            if (s2 > t) (s2, e2, 1L) :: (f, t, n) :: rest
            else (f, math.max(t, e2), n + 1) :: rest
          case (Nil, _) => Nil
        }
        islands.map { case (f, t, n) => (k, f, t, n) }
      }.toSet
      assert(got === want, s"trial $trial")
    }
  }

  test("trending decay: 2^-30 fixed-point weights, weekly halving, 30-week floor") {
    // events.parquet carries raw nanos (the production schema)
    val day = 86400L * 1000000000L
    val anchor = 1000L * day
    val ev = Seq(
      (1L, anchor, 7L, "a", 0.0, ""),            // age 0 → 2^30
      (2L, anchor - 7 * day, 7L, "a", 0.0, ""),  // 1 full week → 2^29
      (3L, anchor - 6 * day, 7L, "b", 0.0, ""),  // 6 days: week 0 → 2^30
      (4L, anchor - 300 * 7 * day, 7L, "a", 0.0, ""))  // ≥30 weeks → 1
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("decayspec").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q110TrendingDecay(spark, dir)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "a" -> ((1L << 30) + (1L << 29) + 1L, 3L),
      "b" -> ((1L << 30), 1L)))
  }

  test("user mode: highest count wins, count ties break to smallest type") {
    val hour = 3600L * 1000000000L
    val rows =
      Seq((7L, "b"), (7L, "b"), (7L, "a"), (7L, "a"),   // tie 2-2 → a
        (8L, "b"), (8L, "b"), (8L, "b"), (8L, "a"))     // b by count
        .zipWithIndex.map { case ((u, t), i) =>
          (i.toLong, hour + i * 1000L, u, t, 0.0, "")
        }
    val dir = java.nio.file.Files.createTempDirectory("modespec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q115UserMode(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === Set((7L, "a", 2L, 4L), (8L, "b", 3L, 4L)))
  }

  test("lag xcorr: closed-form product sums, missing-overlap pairs absent") {
    // x: hours 0 (2 events), 1 (3); y: hours 1 (5), 2 (7); ts in nanos
    val hour = 3600L * 1000000000L
    def evs(t: String, h: Long, n: Int) =
      (1 to n).map(i => (h * 100 + i, h * hour + i * 1000L, 7L, t, 0.0, ""))
    val ev = (evs("x", 0, 2) ++ evs("x", 1, 3) ++ evs("y", 1, 5) ++ evs("y", 2, 7))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("xcorrspec").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q117LagXcorr(spark, dir)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    assert(got(("x", "y", 0L)) === ((15L, 1L)))        // hr1: 3*5
    assert(got(("x", "y", 1L)) === ((31L, 2L)))        // 2*5 + 3*7
    assert(got(("x", "y", 2L)) === ((14L, 1L)))        // hr0→hr2: 2*7
    assert(got(("x", "x", 0L)) === ((13L, 2L)))        // 4 + 9
    assert(!got.contains(("y", "x", 1L)))              // no overlapping hours
  }

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

  test("gap-fill: every (type, hour) cell present, missing hours are zero") {
    val h = 60 // minutes per hour
    val ev = Seq(
      // type A: events in hour 0 (x2) and hour 3; hours 1-2 are gaps
      (1L, "A", ts(5)), (2L, "A", ts(20)), (3L, "A", ts(3 * h + 1)),
      // type B: only hour 1
      (4L, "B", ts(h + 30)))
      .toDF("event_id", "event_type", "ts")
    val out = Analytics.gapFillHourly(ev)
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Timestamp]("hour").getTime / 60000 / 60,
        r.getAs[Long]("n")))
      .toSet
    // dense grid: 2 types x 4 hours (span hour 0..3), zeros explicit
    assert(out === Set(
      ("A", 0L, 2L), ("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 1L),
      ("B", 0L, 0L), ("B", 1L, 1L), ("B", 2L, 0L), ("B", 3L, 0L)))
  }

  test("scd2: consecutive runs collapse, intervals chain, one shuffle") {
    val ev = Seq(
      // u1: A A B A -> three runs (A x2, B, A) — the repeated state
      // REOPENS a new interval, it does not merge with the first A run
      (1L, 1L, "A", ts(0)), (2L, 1L, "A", ts(10)),
      (3L, 1L, "B", ts(20)), (4L, 1L, "A", ts(30)),
      // u2: single event -> one open-ended interval
      (5L, 2L, "B", ts(5)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val q = Analytics.scd2(ev)
    val out = q.collect().map(r => (r.getAs[Long]("user_id"),
      r.getAs[String]("event_type"),
      r.getAs[Timestamp]("valid_from").getTime / 60000,
      Option(r.getAs[Timestamp]("valid_to")).map(_.getTime / 60000),
      r.getAs[Long]("n_events"))).toSet
    assert(out === Set(
      (1L, "A", 0L, Some(20L), 2L),
      (1L, "B", 20L, Some(30L), 1L),
      (1L, "A", 30L, None, 1L),
      (2L, "B", 5L, None, 1L)))
    // the whole window chain + collapse costs ONE hash exchange
    q.queryExecution.toRdd.count()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges === 1, s"expected 1 hash exchange:\n${plan.take(3000)}")
  }

  test("scd2: null states form their own runs (null-safe boundaries); empty input") {
    val ev = Seq(
      (1L, 1L, Some("A"), ts(0)),
      (2L, 1L, None, ts(10)),        // null state: its OWN run, not merged
      (3L, 1L, None, ts(20)),        // consecutive nulls collapse together
      (4L, 1L, Some("A"), ts(30)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.scd2(ev).collect()
      .map(r => (Option(r.getAs[String]("event_type")),
        r.getAs[Timestamp]("valid_from").getTime / 60000,
        r.getAs[Long]("n_events"))).toSet
    assert(out === Set(
      (Some("A"), 0L, 1L), (None, 10L, 2L), (Some("A"), 30L, 1L)))
    assert(Analytics.scd2(ev.limit(0)).count() === 0)
    // empty gap-fill input: no bounds -> empty calendar, no crash
    assert(Analytics.gapFillHourly(
      Seq.empty[(String, Timestamp)].toDF("event_type", "ts")).count() === 0)
  }

  test("anomalies: spike flagged with closed-form z; partial frames and flat series excluded") {
    def hr(n: Int) = new Timestamp(3600000L * n)
    // type A: hours 0..3 counts (1,1,1,9) — window 4: at hour 3 the frame
    // is full, mean=3, sigma=4, z=(9-3)/4=1.5; with thresh 1.4 flagged.
    // Hours 0-2 have partial frames -> excluded regardless of value.
    // type B: constant series -> sigma=0 -> never flagged.
    val series = (Seq((0, 1L), (1, 1L), (2, 1L), (3, 9L)).map {
      case (h, n) => ("A", hr(h), n) } ++
      (0 to 3).map(h => ("B", hr(h), 5L)))
      .toDF("event_type", "hour", "n")
    val out = Analytics.anomalies(series, window = 4, zThresh = 1.4)
      .as[(String, Timestamp, Long, Double)].collect()
    assert(out.toSeq === Seq(("A", hr(3), 9L, 1.5)))
    // raising the threshold above the closed-form z empties the result
    assert(Analytics.anomalies(series, 4, 1.6).count() === 0)
  }

  test("rolling RANGE window: trailing days, boundary exit, same-day peers") {
    def day(n: Int) = java.sql.Timestamp.valueOf(f"1995-01-${n}%02d 10:30:00")
    val ord = Seq(
      (1L, 1L, day(1), 100.0),
      (2L, 1L, day(3), 10.0),   // sees day 1 (3-day window: days 1..3)
      (3L, 1L, day(4), 1.0),    // sees days 3,4 — day 1 EXITED the frame
      (4L, 1L, day(4), 0.5),    // same-day peer: RANGE includes both
      (5L, 2L, day(2), 7.0))    // other customer, isolated
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.rollingSpend(ord, days = 3)
      .select("o_orderkey", "spend_30d", "n_orders_30d")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((100.0, 1L)))
    assert(out(2L) === ((110.0, 2L)))
    // both day-4 orders see the SAME frame {day3, day4 x2} = 11.5
    assert(out(3L) === ((11.5, 3L)))
    assert(out(4L) === ((11.5, 3L)))
    assert(out(5L) === ((7.0, 1L)))
  }

  test("cdc apply: latest-wins update, delete, insert, untouched base") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("k", "bal")
    val changes = Seq(
      (1L, 1L, "U", 11.0), (1L, 3L, "U", 13.0), (1L, 2L, "U", 12.0), // latest seq=3 wins
      (2L, 1L, "U", 21.0), (2L, 2L, "D", 0.0),                       // updated then deleted
      (9L, 1L, "U", 99.0),                                            // insert: key not in base
      (3L, 1L, "D", 0.0), (3L, 2L, "U", 33.0))                        // deleted then re-upserted
      .toDF("k", "seq", "op", "bal")
    val out = Analytics.applyChangelog(base, changes, "k", "seq", "op")
      .as[(Long, Double, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      1L -> ((13.0, "chg")),   // latest update applied
      3L -> ((33.0, "chg")),   // D then U: U is latest → row lives
      4L -> ((40.0, "base")),  // untouched base row
      9L -> ((99.0, "chg"))))  // pure insert
    // key 2: latest op is D → gone entirely
    assert(!out.contains(2L))
  }

  test("pit attribution: purchases land in the containing state interval; none before it") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"1995-01-01 10:${m}%02d:00")
    val ev = Seq(
      // user 1: view state, purchase, click state, purchase
      (1L, 1L, "view", t(1)), (2L, 1L, "purchase", t(2)),
      (3L, 1L, "click", t(3)), (4L, 1L, "purchase", t(4)),
      // user 2: purchase BEFORE any state exists → none
      (5L, 2L, "purchase", t(1)), (6L, 2L, "view", t(2)),
      // user 3: only purchases → none
      (7L, 3L, "purchase", t(5)),
      // user 4: purchase exactly AT a state boundary → the NEW state
      (8L, 4L, "view", t(1)), (9L, 4L, "click", t(3)),
      (10L, 4L, "purchase", t(3)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Analytics.pitAttribution(ev)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "view"  -> ((1L, 1L)),  // user 1's first purchase
      "click" -> ((2L, 2L)),  // user 1's second + user 4's boundary purchase
      "none"  -> ((2L, 2L)))) // user 2 pre-state + user 3 stateless
  }

  test("ohlcBars: OHLC picks, hour buckets, (ts, event_id) tie-break, turnover exact") {
    val hr = 3600000L // one hour of millis
    val ev = Seq(
      // type a, hour 0: ts order 1,2,3 → open=5.0, close=7.0
      (1L, 1L, "a", ts(1), 5.0), (2L, 1L, "a", ts(2), 9.0),
      (3L, 1L, "a", ts(3), 7.0),
      // type a, hour 1 (single event): all four prices equal
      (4L, 1L, "a", new java.sql.Timestamp(hr + 60000L), 2.5),
      // type b, hour 0: TIED ts → event_id breaks: open=id5's 4.0, close=id6's 1.0
      (5L, 2L, "b", ts(10), 4.0), (6L, 2L, "b", ts(10), 1.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.ohlcBars(df).collect().map { r =>
        ((r.getString(0), r.getLong(1)),
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getLong(6), r.getDouble(7)))
      }.toMap
    val got = run(ev)
    assert(got === Map(
      ("a", 0L) -> ((5.0, 9.0, 5.0, 7.0, 3L, 21.0)),
      ("a", 1L) -> ((2.5, 2.5, 2.5, 2.5, 1L, 2.5)),
      ("b", 0L) -> ((4.0, 4.0, 1.0, 1.0, 2L, 5.0))))
    // swapping the tied events' ids flips open/close for b, nothing else
    val flipped = ev.withColumn("event_id",
      when(col("event_id") === 5L, 6L)
        .when(col("event_id") === 6L, 5L).otherwise(col("event_id")))
    assert(run(flipped)(("b", 0L)) === ((1.0, 4.0, 1.0, 4.0, 2L, 5.0)))
  }

  test("chi2 contingency: hand-computed 2x2, orphan users drop, marginals exact") {
    val ev = Seq(
      (1L, 1L, "a", ts(0)), (2L, 1L, "a", ts(1)), (3L, 2L, "a", ts(2)),
      (4L, 1L, "b", ts(3)),
      (5L, 2L, "b", ts(4)), (6L, 2L, "b", ts(5)), (7L, 2L, "b", ts(6)),
      (8L, 9L, "a", ts(7))) // user 9 has no customer row → dropped
      .toDF("event_id", "user_id", "event_type", "ts")
    val cust = Seq((1L, "S1"), (2L, "S2")).toDF("c_custkey", "c_mktsegment")
    val got = Analytics.chi2Contingency(ev, cust)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // matrix: a=(S1:2, S2:1), b=(S1:1, S2:3); rt: a=3 b=4; ct: S1=3 S2=4; N=7
    def cell(o: Long, rt: Long, ct: Long): (Long, Double, Double) = {
      val e = (rt.toDouble * ct) / 7
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (o, r6(e), r6((o.toDouble - e) * (o.toDouble - e) / e))
    }
    assert(got === Map(
      ("a", "S1") -> cell(2, 3, 3), ("a", "S2") -> cell(1, 3, 4),
      ("b", "S1") -> cell(1, 4, 3), ("b", "S2") -> cell(3, 4, 4)))
  }

  test("rfm: quintiles from exact global ranks, composite segment, rank directions") {
    // 10 users; user k (1..10) has last event at minute k, k events, and
    // spend 10*k — so every metric ranks users identically: rank k for
    // user k, quintile = (k*5-1) div 10 + 1 → users 1,2→1 … 9,10→5
    val ev = (1 to 10).flatMap { k =>
      (1 to k).map(j => ((k * 100 + j).toLong, k.toLong, "a", ts(k), 10.0))
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Analytics.rfm(ev)
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(got.size === 10)
    (1 to 10).foreach { k =>
      val q = (k * 5 - 1) / 10 + 1
      assert(got(k.toLong) === ((q, q, q, s"$q$q$q")), s"user $k")
    }
  }

  test("cumulativeUsers: first-seen collapse == naive running count-distinct") {
    val day = 86400000L
    def at(d: Int, m: Int) = new java.sql.Timestamp(d * day + m * 60000L)
    val ev = Seq(
      (1L, 1L, "a", at(0, 1)), (2L, 1L, "a", at(2, 1)), // u1 spans days 0,2
      (3L, 2L, "a", at(0, 5)),                          // u2 day 0 only
      (4L, 3L, "a", at(1, 0)), (5L, 3L, "a", at(1, 9)), // u3 twice day 1
      (6L, 4L, "a", at(3, 0)))                          // u4 day 3
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Analytics.cumulativeUsers(ev)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    // day 2 is ABSENT (no new users) — the curve reports first-seen days only
    assert(got === Set(
      ("1970-01-01", 2L, 2L), ("1970-01-02", 1L, 3L), ("1970-01-04", 1L, 4L)))
    // cross-check the collapse identity against the naive per-day distinct scan
    val naive = ev.select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val days = got.map(_._1)
    days.foreach { d =>
      val cum = naive.filter(_._1 <= d).map(_._2).distinct.length
      assert(got.find(_._1 == d).get._3 === cum.toLong, s"day $d")
    }
  }

  test("TWAP: distributed lead equals the naive window at any partition count") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(min: Long) = Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(min))
    // values held for unequal durations; two types; enough rows that
    // parts=7 forces type runs to SPAN partition boundaries (the stitch
    // path) and some partitions hold a single row
    val rows = (0 until 40).map { i =>
      (if (i % 2 == 0) "a" else "b", t(i * 3 + i % 5), i.toLong, (i % 7).toDouble)
    }
    val df = rows.toDF("event_type", "ts", "event_id", "value")
    val naive = df
      .withColumn("nt", lead(col("ts"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))))
      .filter(col("nt").isNotNull)
      .withColumn("dur", unix_micros(col("nt")) - unix_micros(col("ts")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_segments"), sum(col("dur")).as("total_us"),
        round(sum((col("value") * col("dur")).cast("decimal(38,4)"))
          .cast("double") / sum(col("dur")).cast("double"), 6).as("twap6"))
      .as[(String, Long, Long, Double)].collect().toSet
    for (p <- Seq(1, 7, 32)) {
      val got = Analytics.twap(df, parts = p)
        .as[(String, Long, Long, Double)].collect().toSet
      assert(got === naive, s"parts=$p")
    }
    // closed form: one type, values 10 for 2min then 20 for 1min → 40/3
    val simple = Seq(("x", t(0), 0L, 10.0), ("x", t(2), 1L, 20.0),
      ("x", t(3), 2L, 99.0)).toDF("event_type", "ts", "event_id", "value")
    val r = Analytics.twap(simple, parts = 3)
      .as[(String, Long, Long, Double)].collect().head
    assert(r === (("x", 2L, 180000000L, 13.333333)))
  }

  test("KS statistic: closed forms, min-value tiebreak, partition-count invariant") {
    import spark.implicits._
    def ks(a: Seq[Double], b: Seq[Double], parts: Int = 3) = {
      val rows = (a.map(_ -> true) ++ b.map(_ -> false)).toDF("value", "isa")
      val r = Analytics.ksTest2(rows, parts).collect()(0)
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))
    }
    // A={1,2,3}, B={2,4}: max |c1*n2 - c2*n1| = 3 at value 3 (D = 0.5)
    assert(ks(Seq(1, 2, 3), Seq(2, 4)) === ((3L, 3.0, 3L, 2L)))
    // interleaved A={1,3}, B={2,4}: diff 2 at BOTH v=1 and v=3 → min wins
    assert(ks(Seq(1, 3), Seq(2, 4)) === ((2L, 1.0, 2L, 2L)))
    // identical samples: ks_num 0, located at the smallest pooled value
    assert(ks(Seq(5, 7), Seq(5, 7)) === ((0L, 5.0, 2L, 2L)))
    // prefix-scan correctness is partition-count independent
    val big = (1 to 200).map(_.toDouble)
    val shifted = (1 to 200).map(i => i + 40.0)
    assert(ks(big, shifted, parts = 1) === ks(big, shifted, parts = 7))
  }

  test("ols trend: exact line recovered; per-month sums feed the moments") {
    val dir = java.nio.file.Files.createTempDirectory("olsspec").toString
    Seq((1, "N1")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 1)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // monthly totals 10, 12, 14, 16 → slope 2, intercept 10 (x0 = 0 at
    // the first month); March is split across two orders to prove the
    // month-grain pre-aggregation
    val d = Seq(
      (1L, 1L, 10.0, Timestamp.valueOf("2020-01-15 00:00:00")),
      (2L, 1L, 12.0, Timestamp.valueOf("2020-02-10 00:00:00")),
      (3L, 1L, 9.0,  Timestamp.valueOf("2020-03-05 00:00:00")),
      (4L, 1L, 5.0,  Timestamp.valueOf("2020-03-25 00:00:00")),
      (5L, 1L, 16.0, Timestamp.valueOf("2020-04-28 00:00:00")))
    d.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Analytics.q146OlsTrend(spark, dir)
      .as[(String, Long, Double, Double)].collect()
    assert(got === Array(("N1", 4L, 2.0, 10.0)))
  }

  test("path trigrams: session boundary kills cross-session trigrams") {
    val hour = 3600L * 1000000000L
    val min = 60L * 1000000000L
    // u7: a,b,c,d with a 31-min gap before d → only a>b>c counts;
    // u8: a,b only → no trigram; u9: x,y,z twice back-to-back
    val rows = Seq(
      (1L, 0L * min, 7L, "a"), (2L, 5L * min, 7L, "b"),
      (3L, 10L * min, 7L, "c"), (4L, 41L * min, 7L, "d"),
      (5L, hour, 8L, "a"), (6L, hour + min, 8L, "b"),
      (7L, 2 * hour, 9L, "x"), (8L, 2 * hour + min, 9L, "y"),
      (9L, 2 * hour + 2 * min, 9L, "z"), (10L, 2 * hour + 3 * min, 9L, "x"),
      (11L, 2 * hour + 4 * min, 9L, "y"), (12L, 2 * hour + 5 * min, 9L, "z"))
      .map { case (id, t, u, e) => (id, t, u, e, 0.0, "") }
    val dir = java.nio.file.Files.createTempDirectory("trispec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q149PathTrigrams(spark, dir)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("a>b>c", 1L), ("x>y>z", 2L), ("y>z>x", 1L),
      ("z>x>y", 1L)))
  }

  test("bitmap rollup: exact distinct across word boundaries == countDistinct") {
    val week = 7L * 86400L * 1000000000L
    // ids straddle 63-bit word boundaries (62|63, 125|126) and repeat
    val ids = Seq(0L, 62L, 62L, 63L, 64L, 125L, 126L, 1000L)
    val rows = ids.zipWithIndex.map { case (u, i) =>
      (i.toLong, week + i * 1000L, u, "e", 0.0, "")
    } ++ Seq((100L, 2 * week + 1000L, 62L, "e", 0.0, ""),
      (101L, 2 * week + 2000L, 9999L, "e", 0.0, ""))
    val dir = java.nio.file.Files.createTempDirectory("bitmapspec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q150BitmapRollup(spark, dir)
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3))).toMap
    val want = graft.operators.Tables.events(spark, dir)
      .groupBy(date_trunc("week", col("ts")).cast("date").as("week"))
      .agg(countDistinct(col("user_id")).as("nd"))
      .as[(java.sql.Date, Long)].collect()
      .map(r => r._1.toString -> r._2).toMap
    assert(got.view.mapValues(_._2).toMap === want)
    assert(got.values.map(_._1).forall(_ >= 1L)) // occupied words only
  }

  test("kadane burst: windowed prefix form == brute-force max subarray, x3 seeds") {
    val hour = 3600L * 1000000000L
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = for (u <- 1L to 8L; i <- 1 to 50) yield
        (u * 1000 + i, i * hour + u * 1000L, u,
          if (rnd.nextInt(3) == 0) "error" else "click", 0.0, "")
      val dir = java.nio.file.Files.createTempDirectory("kadanespec").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Analytics.q151KadaneBurst(spark, dir)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      rows.groupBy(_._3).foreach { case (u, rs) =>
        val ds = rs.sortBy(_._1)
          .map(r => if (r._4 == "error") -1L else 1L).toIndexedSeq
        val brute = (for {
          i <- ds.indices; j <- i until ds.length
        } yield ds.slice(i, j + 1).sum).max
        assert(got(u) === ((brute, ds.sum, ds.length.toLong)),
          s"user $u seed $seed")
      }
    }
  }

  test("runs test: clumped vs alternating daily series closed forms") {
    val day = 86400L * 1000000000L
    // type a: counts 5,5,1,1,5 vs mean 3.4 -> signs 1,1,0,0,1 -> 3 runs
    // type b: 5,1,5,1 vs mean 3 -> signs 1,0,1,0 -> 4 runs
    // exact-mean tie: type c 2,2 -> signs 0,0 -> 1 run, n_above 0
    def burst(t: String, d: Long, n: Int) =
      (1 to n).map(i => (d * 1000 + i.toLong + t.hashCode.abs.toLong * 97,
        d * day + i * 1000L, 7L, t, 0.0, ""))
    val rows =
      (Seq(5, 5, 1, 1, 5).zipWithIndex.flatMap { case (n, i) => burst("a", i + 1, n) } ++
       Seq(5, 1, 5, 1).zipWithIndex.flatMap { case (n, i) => burst("b", i + 1, n) } ++
       Seq(2, 2).zipWithIndex.flatMap { case (n, i) => burst("c", i + 1, n) })
    val dir = java.nio.file.Files.createTempDirectory("runsspec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q162RunsTest(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") === ((3L, 3L, 2L, 1.0 + 2.0 * 3 * 2 / 5.0)))
    assert(got("b") === ((4L, 2L, 2L, 1.0 + 2.0 * 2 * 2 / 4.0)))
    assert(got("c") === ((1L, 0L, 2L, 1.0)))
  }

  test("acf: closed-form moments on a planted series, missing days absent") {
    val day = 86400L * 1000000000L
    // type a days 1,2,3,5 (day 4 missing) counts 1,2,3,1
    def burst(d: Long, n: Int) =
      (1 to n).map(i => (d * 100 + i.toLong, d * day + i * 1000L, 7L, "a", 0.0, ""))
    val rows = burst(1, 1) ++ burst(2, 2) ++ burst(3, 3) ++ burst(5, 1)
    val dir = java.nio.file.Files.createTempDirectory("acfspec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q165Acf(spark, dir)
      .as[(String, Int, Long, Option[Double])].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    def r6(pairs: Seq[(Long, Long)]): Double = {
      val n = pairs.size.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      BigDecimal((n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // lag1 pairs: (1,2),(2,3) — (3,_) absent (day 4 missing), (5) end
    assert(got(1) === ((2L, Some(r6(Seq((1L, 2L), (2L, 3L)))))))
    // lag2 pairs: (1,3),(3,1); lag3 has the single pair (2,1):
    // zero variance -> undefined -> NULL
    assert(got(2) === ((2L, Some(r6(Seq((1L, 3L), (3L, 1L)))))))
    assert(got(3) === ((1L, None)))
  }

  test("abtest z: pooled two-proportion closed form on planted cohorts") {
    val hour = 3600L * 1000000000L
    // even users (u2): 10 events, 4 purchases; odd (u1): 10 events, 1
    def evs(u: Long, total: Int, buys: Int) =
      (1 to total).map(i => (u * 1000 + i.toLong, hour * i + u, u,
        if (i <= buys) "purchase" else "view", 0.0, ""))
    val rows = evs(2L, 10, 4) ++ evs(1L, 10, 1)
    val dir = java.nio.file.Files.createTempDirectory("abtestspec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Analytics.q166AbtestZ(spark, dir)
      .as[(Long, Long, Long, Long, Double)].head()
    assert((r._1, r._2, r._3, r._4) === ((10L, 4L, 10L, 1L)))
    val p = 5.0 / 20.0
    val want = BigDecimal((0.4 - 0.1) /
      math.sqrt(p * (1 - p) * (1.0 / 10 + 1.0 / 10)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._5 === want)
  }

  test("rapid fire: only within-hour consecutive purchases flagged, amounts exact") {
    val min = 60L * 1000000000L
    val rows = Seq(
      (1L, 0L, 7L, "purchase", 10.5, ""),
      (2L, 30 * min, 7L, "purchase", 20.25, ""),   // 30 min gap -> flagged
      (3L, 200 * min, 7L, "purchase", 5.0, ""),    // 170 min -> not
      (4L, 210 * min, 7L, "view", 1.0, ""),        // non-purchase ignored
      (5L, 215 * min, 8L, "purchase", 9.0, ""))    // other user, single
    val dir = java.nio.file.Files.createTempDirectory("rapidspec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q167RapidFire(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    assert(got === List((7L, 1L, 2L, 105000L, 202500L, 30L * 60 * 1000000)))
  }
  test("Mann-Whitney U: pair-count differential, identity, partition invariance") {
    import spark.implicits._
    def mw(a: Seq[Double], b: Seq[Double], parts: Int = 3) = {
      val rows = (a.map(_ -> true) ++ b.map(_ -> false)).toDF("value", "isa")
      val r = Analytics.mannWhitneyU(rows, parts).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // brute force over pairs: u1x2 = 2*#{a>b} + #{a==b}, then the same
    // nonnegative-numerator integer divisions the operator emits
    def brute(a: Seq[Double], b: Seq[Double]) = {
      val u1x2 = (for (x <- a; y <- b) yield
        if (x > y) 2L else if (x == y) 1L else 0L).sum
      val pairs = BigInt(a.size.toLong) * b.size
      val auc = (BigInt(u1x2) * 1000000000L / (pairs * 2)).toLong
      val cliff = (BigInt(u1x2) * 1000000000L / pairs).toLong - 1000000000L
      (a.size.toLong, b.size.toLong, auc, cliff)
    }
    val cases = Seq(
      (Seq(1.0, 2, 3), Seq(2.0, 4)),          // ties across groups
      (Seq(5.0, 5, 5), Seq(5.0, 5)),          // all tied
      (Seq(1.0, 2), Seq(3.0, 4)),             // full separation: u1 = 0
      (Seq(10.0, 20, 30, 40), Seq(5.0, 15, 25, 35, 45)))
    cases.foreach { case (a, b) => assert(mw(a, b) === brute(a, b)) }
    // identity + partition-count invariance on a bigger interleave
    val big = (1 to 300).map(i => (i * 7 % 100).toDouble)
    val other = (1 to 200).map(i => (i * 13 % 100).toDouble)
    val r1 = mw(big, other, parts = 1)
    assert(r1 === mw(big, other, parts = 8))
    // AUC ∈ [0,1e9]; cliff = 2·AUC − 1e9 up to one unit of div truncation
    assert(r1._3 >= 0 && r1._3 <= 1000000000L)
    val resid = r1._4 - (2 * r1._3 - 1000000000L)
    assert(resid === 0L || resid === 1L)
    assert(r1 === brute(big, other))
  }

  test("Mann-Whitney ratio path is exact where raw U overflows BIGINT (round-10 advisory regression)") {
    import spark.implicits._
    // Pre-aggregated per-value counts standing in for 5e9 rows per arm —
    // the ~100 TB regime the round-10 advisory flagged. Here
    // U1 = 1.1e19 > Long.MaxValue (9.22e18): the round-10 formulation,
    // which emitted raw U as a BIGINT column, is arithmetically
    // unrepresentable on this input; the 1e-9 ratio outputs must stay
    // exact through the DECIMAL(38,0) pipeline.
    val g = Seq(
      (1.0, 2000000000L, 1000000000L),
      (2.0, 1000000000L, 2000000000L),
      (3.0, 2000000000L, 2000000000L)).toDF("value", "a", "b")
    // BigInt referee over the same closed form
    val counts = Seq((2000000000L, 1000000000L),
      (1000000000L, 2000000000L), (2000000000L, 2000000000L))
    var bLess = BigInt(0); var u1x2 = BigInt(0)
    counts.foreach { case (a, b) =>
      u1x2 += BigInt(a) * (bLess * 2 + b); bLess += b
    }
    assert(u1x2 / 2 > BigInt(Long.MaxValue)) // raw U1 really is past BIGINT
    val n1 = BigInt(counts.map(_._1).sum); val n2 = BigInt(counts.map(_._2).sum)
    val auc = (u1x2 * 1000000000L / (n1 * n2 * 2)).toLong
    val cliff = (u1x2 * 1000000000L / (n1 * n2)).toLong - 1000000000L
    val r = Analytics.mannWhitneyFromCounts(g, parts = 3).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (n1.toLong, n2.toLong, auc, cliff))
    assert((auc, cliff) === (440000000L, -120000000L)) // hand-checked
  }

  test("bootstrap CI: 32 deterministic replicates, weights mean ~1, means bracket the point estimate") {
    import spark.implicits._
    val d = sf("sf0.001")
    val a = Analytics.q179BootstrapCi(spark, d).collect().map(_.toSeq).toSet
    val b = Analytics.q179BootstrapCi(spark, d).collect().map(_.toSeq).toSet
    assert(a === b) // pure function of (event_id, replicate)
    val rows = Analytics.q179BootstrapCi(spark, d)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0 until 32))
    val ev = Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 1000, 0).cast("long").as("v"))
      .as[Long].collect()
    val n = ev.length.toLong
    val pointMean = ev.sum / n // same fixed-point div as the operator
    rows.foreach { case (rep, nEff, _) =>
      assert(nEff > n * 7 / 10 && nEff < n * 13 / 10, s"rep $rep nEff $nEff vs n $n")
    }
    // mod-3 multiplier weights are mean-1 → replicate means scatter AROUND
    // the point estimate; all 32 on one side would mean a broken resample
    val means = rows.map(_._3)
    assert(means.min <= pointMean && pointMean <= means.max,
      s"point $pointMean outside [${means.min}, ${means.max}]")
    // and they genuinely vary (non-degenerate weights)
    assert(means.distinct.length > 5)
  }

  test("spearman: monotone ±1 exactly, ties average-ranked to a hand value, constant group guarded to null") {
    val base = Seq(
      // g1: strictly increasing y with x → rho = 1 exactly
      ("g1", 1L, 10L), ("g1", 2L, 20L), ("g1", 3L, 30L), ("g1", 4L, 41L),
      // g2: strictly decreasing → rho = -1 exactly
      ("g2", 1L, 9L), ("g2", 2L, 7L), ("g2", 3L, 4L),
      // g3: ties in both columns; referee value below
      ("g3", 1L, 10L), ("g3", 2L, 20L), ("g3", 2L, 20L), ("g3", 3L, 5L),
      // g4: constant x → zero rank variance → guarded NULL, not NaN
      ("g4", 7L, 1L), ("g4", 7L, 2L), ("g4", 7L, 3L)
    ).toDF("source", "x", "y")
    val got = Analytics.spearmanByGroup(base)
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("g1") === ((4L, Some(1.0))))
    assert(got("g2") === ((3L, Some(-1.0))))
    assert(got("g4") === ((3L, None)))
    // g3 referee (average ranks): x = [1,2,2,3] -> [1, 2.5, 2.5, 4];
    // y = [10,20,20,5] -> [2, 3.5, 3.5, 1] (5 ranks 1, 10 ranks 2, the
    // tied 20s average ranks 3 and 4); pearson by the same closed form
    val rx = Seq(1.0, 2.5, 2.5, 4.0); val ry = Seq(2.0, 3.5, 3.5, 1.0)
    val n = 4.0
    val (sx, sy) = (rx.sum, ry.sum)
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (rx.map(a => a * a).sum, ry.map(b => b * b).sum)
    val want = BigDecimal((n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("g3")._2.contains(want), s"${got("g3")._2} vs $want")
  }
}
