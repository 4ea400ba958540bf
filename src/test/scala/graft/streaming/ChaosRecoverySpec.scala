package graft.streaming

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.SparkSpec

/** Serializable first-attempt "delivery loss": every input task's first
  * attempt dies after reading its rows; Spark's task retry (local[8,4])
  * redelivers. Top-level object so closures don't capture the suite. */
object ChaosLoss {
  def tap[T](r: T): T = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0)
      throw new RuntimeException("injected delivery loss")
    r
  }
}

/** ONE chaos protocol, EVERY stateful stream (round-10 verdict task 5 —
  * RecoverySpec proved the pattern on KVStore only):
  *
  *   1. batch 0 processed with every input task's FIRST delivery lost
  *      (injected attempt-0 failure → task-retry redelivery), then the
  *      query stopped;
  *   2. more batches arrive; the query is restarted and killed
  *      UNDRAINED (restart from checkpoint may replay a partially
  *      processed batch);
  *   3. a final restart drains everything.
  *
  * The assertion is always the same exactly-once contract the
  * reference's lossy-network tests probe: the recovered output equals
  * the no-fault batch semantics — nothing lost, nothing double-applied.
  * File source (replayable) + parquet / idempotent foreachBatch sinks;
  * `maxFilesPerTrigger=1` keeps one file per micro-batch so watermark
  * progression across the kill matches the no-chaos run. */
class ChaosRecoverySpec extends SparkSpec {
  import spark.implicits._

  /** Runs the 3-query chaos protocol; returns the sink directory. */
  private def chaosProtocol(prefix: String, batches: Seq[Seq[String]],
      start: (String, String, String) => StreamingQuery): String = {
    val in = Files.createTempDirectory(s"$prefix-in")
    val out = Files.createTempDirectory(s"$prefix-out").toString
    val ckpt = Files.createTempDirectory(s"$prefix-ckpt").toString
    // strictly increasing mtimes: FileStreamSource orders by file
    // timestamp, and batch files written in one loop share a millisecond
    // — ties would let maxFilesPerTrigger=1 process batches OUT OF
    // ORDER, late-dropping the earlier ones under the advanced watermark
    def write(i: Int): Unit = {
      val p = in.resolve(s"b$i.json")
      Files.writeString(p, batches(i).mkString("\n"))
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    write(0)
    val q1 = start(in.toString, out, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    (1 until batches.size).foreach(write)
    val q2 = start(in.toString, out, ckpt)
    q2.stop() // undrained kill: no processAllAvailable
    val q3 = start(in.toString, out, ckpt)
    try q3.processAllAvailable() finally q3.stop()
    out
  }

  test("neardup claims: exactly-once first-wins state across loss + undrained kill") { withRocksDb {
    val docs = Seq(
      (1L, 1000L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, 2000L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, 3000L, "completely different content with its own vocabulary here"),
      (4L, 4000L, "the quick brown fox jumps over the lazy dog again and again"),
      (5L, 5000L, "completely different content with its own vocabulary here"),
      (6L, 6000L, "a third unrelated document that shares nothing with the others"))
    def json(r: (Long, Long, String)) =
      s"""{"doc_id":${r._1},"ts":${r._2},"text":"${r._3}"}"""
    val batches = Seq(docs.take(3).map(json), docs.drop(3).map(json))

    def pipeline(raw: DataFrame): DataFrame = {
      val injected = raw.as[(Long, Long, String)].map(ChaosLoss.tap(_))
        .toDF("doc_id", "ts_ms", "text")
        .select(col("doc_id"), timestamp_millis(col("ts_ms")).as("ts"),
          col("text"))
      NeardupStream.bandClaims(injected, "2 hours").toDF
    }
    val out = chaosProtocol("nd-chaos", batches, (in, out, ckpt) =>
      pipeline(spark.readStream
        .schema("doc_id LONG, ts LONG, text STRING")
        .option("maxFilesPerTrigger", "1").json(in))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start())

    val got = spark.read.parquet(out)
      .as[NeardupStream.Claim].collect()
    // exactly-once: one claim per (doc, band) despite loss + replay
    assert(got.groupBy(c => (c.doc_id, c.band)).forall(_._2.length == 1),
      got.mkString("\n"))
    // batch differential: same claims as the no-fault batch formulation
    val batchDf = docs.toDF("doc_id", "ts_ms", "text")
      .select(col("doc_id"), timestamp_millis(col("ts_ms")).as("ts"),
        col("text"))
    val want = NeardupStream.bandClaims(batchDf, "2 hours").collect()
    assert(got.map(c => (c.doc_id, c.band, c.claimed)).toSet ===
      want.map(c => (c.doc_id, c.band, c.claimed)).toSet)
    // semantics spot check: doc 1 claims everything, its dups claim nothing
    val byDoc = got.groupBy(_.doc_id).view
      .mapValues(cs => cs.forall(_.claimed)).toMap
    assert(byDoc(1L) && !byDoc(2L) && !byDoc(4L))
  } }

  test("transitions: per-user last-event state survives loss + undrained kill") {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val types = Array("a", "b", "c")
      val events = (1 to 60).map(i =>
        TransitionStream.Ev((i % 5).toLong, i.toLong, i.toLong,
          types(i % types.length)))
      def json(e: TransitionStream.Ev) =
        s"""{"user_id":${e.user_id},"ts":${e.ts},"event_id":${e.event_id},"event_type":"${e.event_type}"}"""
      // per-key ordered delivery across batches: chunk the global order
      val batches = events.grouped(20).map(_.map(json)).toSeq

      val out = chaosProtocol("tr-chaos", batches, (in, out, ckpt) =>
        TransitionStream.transitions(
          spark.readStream
            .schema("user_id LONG, ts LONG, event_id LONG, event_type STRING")
            .option("maxFilesPerTrigger", "1").json(in)
            .as[TransitionStream.Ev].map(ChaosLoss.tap(_)))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append).start())

      val got = spark.read.parquet(out).as[TransitionStream.Trans].collect()
        .map(t => (t.user_id, t.from_type, t.to_type)).sorted.toSeq
      // no-fault expectation: consecutive pairs of each user's (ts,
      // event_id)-ordered history, INCLUDING cross-batch boundary pairs
      // (those exist only if the last-event state survived the kill)
      val want = events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        es.sortBy(e => (e.ts, e.event_id)).sliding(2).collect {
          case Seq(p, n) => (u, p.event_type, n.event_type)
        }
      }.sorted
      assert(got === want)
    } finally {
      oldProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("gap fill: pending-hour chain finalizes correctly across loss + undrained kill") { withRocksDb {
    def json(tpe: String, h: Int, m: Int) =
      s"""{"event_type":"$tpe","ts":${h * 3600000L + m * 60000L}}"""
    // hour 10: A x2, B x1; hour 12: A x1; then two watermark closers
    // (the second makes the first's 14:30 watermark drive finalization)
    val batches = Seq(
      Seq(json("A", 10, 5), json("A", 10, 40), json("B", 10, 20),
        json("A", 12, 15)),
      Seq(json("A", 15, 0)),
      Seq(json("A", 15, 1)))

    val out = chaosProtocol("gf-chaos", batches, (in, out, ckpt) =>
      GapFillStream.hourlyGapFill(
        spark.readStream.schema("event_type STRING, ts LONG")
          .option("maxFilesPerTrigger", "1").json(in)
          .select(col("event_type"), timestamp_millis(col("ts")).as("ts"))
          .as[GapFillStream.In].map(ChaosLoss.tap(_)), "30 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start())

    val got = spark.read.parquet(out).as[GapFillStream.HourCount].collect()
      .map(r => (r.event_type, r.hour.getTime / 3600000L, r.n)).toSet
    // dense chains with explicit zeros, exactly once, zero hours intact —
    // the same series StreamingGapFillSpec pins for the no-chaos run
    assert(got === Set(
      ("A", 10L, 2L), ("A", 11L, 0L), ("A", 12L, 1L), ("A", 13L, 0L),
      ("B", 10L, 1L), ("B", 11L, 0L), ("B", 12L, 0L), ("B", 13L, 0L)))
  } }

  test("sessions: merging session_window state survives loss + undrained kill") {
    def json(u: Long, min: Int, v: Double) =
      s"""{"user_id":$u,"ts":${min * 60000L},"value":$v}"""
    // user 1's session spans the kill boundary: 0/20 before, 40 after —
    // recovery must MERGE across the restart into one [0, 70) session
    val batches = Seq(
      Seq(json(1L, 0, 1.5), json(1L, 20, 2.0), json(2L, 5, 4.0)),
      Seq(json(1L, 40, 0.25), json(1L, 90, 8.0)),
      Seq(json(9L, 190, 0.0)),
      Seq(json(9L, 191, 0.0)))

    val out = chaosProtocol("ss-chaos", batches, (in, out, ckpt) =>
      SessionStream.sessionsStream(
        spark.readStream.schema("user_id LONG, ts LONG, value DOUBLE")
          .option("maxFilesPerTrigger", "1").json(in)
          .select(col("user_id"), timestamp_millis(col("ts")).as("ts"),
            col("value"))
          .as[SessionStream.Ev].map(ChaosLoss.tap(_)),
        "30 minutes", "10 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start())

    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val got = spark.read.parquet(out)
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Long)]
      .collect()
    // exactly once, and the cross-kill session merged — not split at
    // the restart boundary, not double-emitted
    assert(got.length === got.toSet.size, got.mkString("\n"))
    val set = got.toSet
    assert(set.contains((1L, ts(0), ts(70), 3L, 3750L)), set)
    assert(set.contains((1L, ts(90), ts(120), 1L, 8000L)), set)
    assert(set.contains((2L, ts(5), ts(35), 1L, 4000L)), set)
  }

  test("attribution: stream-stream join state survives loss + undrained kill") {
    val day = 86400000L
    def json(id: Long, min: Int, u: Long, tpe: String, v: Double) =
      s"""{"event_id":$id,"ts":${day + min * 60000L},"user_id":$u,"event_type":"$tpe","value":$v}"""
    // the (1 → 3) pair spans the kill: click 1 sits in LEFT join state
    // when the query dies undrained; recovery must still emit it once
    val batches = Seq(
      Seq(json(1L, 0, 7L, "click", 0.0), json(2L, 5, 7L, "purchase", 10.5)),
      Seq(json(3L, 30, 7L, "purchase", 2.25), json(4L, 61, 7L, "purchase", 1.0),
        json(6L, 62, 7L, "click", 0.0)),
      Seq(json(7L, 100, 7L, "purchase", 4.0)))

    val out = chaosProtocol("at-chaos", batches, (in, out, ckpt) =>
      AttributionStream.attribution(
        spark.readStream
          .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE")
          .option("maxFilesPerTrigger", "1").json(in)
          .select(col("event_id"), timestamp_millis(col("ts")).as("ts"),
            col("user_id"), col("event_type"), col("value"))
          .as[AttrEv].map(ChaosLoss.tap(_)).toDF,
        "1 HOUR", "10 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start())

    val got = spark.read.parquet(out)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length === got.toSet.size, got.mkString("\n"))
    assert(got.toSet === Set(
      (1L, 2L, 7L, 5L * 60000000L, 10500L),
      (1L, 3L, 7L, 30L * 60000000L, 2250L),
      (6L, 7L, 7L, 38L * 60000000L, 4000L)))
  }

  test("left-outer attribution: held-back null row survives loss + undrained kill, emits exactly once") {
    val day = 86400000L
    def json(id: Long, min: Int, u: Long, tpe: String, v: Double) =
      s"""{"event_id":$id,"ts":${day + min * 60000L},"user_id":$u,"event_type":"$tpe","value":$v}"""
    // click 2 (user 8) NEVER converts: its null row exists only in join
    // state when batch 0 is processed, and the undrained kill lands
    // BEFORE any watermark can release it — recovery must neither lose
    // it nor emit it twice. Clicks 4/6/8/10 convert instantly and exist
    // to push both derived watermarks past click 2's 70+10 min deadline
    // (null release needs a FOLLOWING batch after the watermark moves,
    // hence four pusher batches).
    val batches = Seq(
      Seq(json(1L, 0, 7L, "click", 0.0), json(2L, 10, 8L, "click", 0.0),
        json(3L, 20, 7L, "purchase", 5.0)),
      Seq(json(4L, 200, 9L, "click", 0.0), json(5L, 200, 9L, "purchase", 1.0)),
      Seq(json(6L, 210, 9L, "click", 0.0), json(7L, 210, 9L, "purchase", 1.0)),
      Seq(json(8L, 220, 9L, "click", 0.0), json(9L, 220, 9L, "purchase", 1.0)),
      Seq(json(10L, 230, 9L, "click", 0.0), json(11L, 230, 9L, "purchase", 1.0)))

    val out = chaosProtocol("lo-chaos", batches, (in, out, ckpt) =>
      AttributionStream.attribution(
        spark.readStream
          .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE")
          .option("maxFilesPerTrigger", "1").json(in)
          .select(col("event_id"), timestamp_millis(col("ts")).as("ts"),
            col("user_id"), col("event_type"), col("value"))
          .as[AttrEv].map(ChaosLoss.tap(_)).toDF,
        "1 HOUR", "10 minutes", "left_outer")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start())

    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    // exactly-once across loss + replay: no duplicate rows at all
    assert(rows.length === rows.toSet.size, rows.mkString("\n"))
    val set = rows.toSet
    // the held-back null row was released exactly once after recovery
    assert(set.contains((2L, -1L, -1L)), set)
    // converted clicks never grew a spurious null sibling
    assert(!set.exists(r => r._1 != 2L && r._2 == -1L), set)
    // the matched pairs are intact: every u9 click matches every u9
    // purchase inside its forward hour (purchases are 10 min apart)
    val pusher = for {
      (c, ci) <- Seq(4L, 6L, 8L, 10L).zipWithIndex
      (p, pi) <- Seq(5L, 7L, 9L, 11L).zipWithIndex if pi >= ci
    } yield (c, p, 1000L)
    assert(set === (pusher.toSet + ((1L, 3L, 5000L)) + ((2L, -1L, -1L))), set)
  }

  test("heavy hitters: Misra-Gries shard state exact-once across loss + undrained kill") { withRocksDb {
    val k = 5
    val shards = 2
    val words = Seq.fill(30)("hot") ++ Seq.fill(10)("warm") ++
      (1 to 8).map(i => s"tail$i") ++ Seq.fill(20)("hot")
    def json(w: String) = s"""{"value":"$w"}"""
    val batches = Seq(words.take(24).map(json), words.slice(24, 48).map(json),
      words.drop(48).map(json))

    val out = chaosProtocol("hh-chaos", batches, (in, out, ckpt) =>
      HeavyHittersStream.shardedCandidates(
        spark.readStream.schema("value STRING")
          .option("maxFilesPerTrigger", "1").json(in)
          .as[String].map(ChaosLoss.tap(_)), k, shards)
        .writeStream
        // Update-mode snapshots land via an idempotent-enough foreachBatch
        // append: a replayed batch re-appends an identical snapshot row,
        // and validation reads the max-n row per shard (n is monotone)
        .foreachBatch((df: org.apache.spark.sql.Dataset[HeavyHittersStream.ShardCandidates], id: Long) =>
          df.write.mode("append").parquet(out))
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).start())

    val snaps = spark.read.parquet(out)
      .as[HeavyHittersStream.ShardCandidates].collect()
    val finalSnap = snaps.groupBy(_.shard).view
      .mapValues(_.maxBy(_.n)).toMap
    // exactly-once: each shard absorbed exactly its true word count —
    // a lost-then-redelivered or replayed batch would inflate n
    val trueShard = words.groupBy(w => math.floorMod(w.hashCode, shards))
      .view.mapValues(_.size.toLong).toMap
    trueShard.foreach { case (s, n) =>
      assert(finalSnap(s).n === n, s"shard $s n=${finalSnap(s).n} want $n")
    }
    // MG guarantee: every word over its shard's n/(k+1) survives
    words.groupBy(identity).foreach { case (w, occ) =>
      val s = math.floorMod(w.hashCode, shards)
      if (occ.size > trueShard(s) / (k + 1))
        assert(finalSnap(s).words.contains(w), s"$w missing from shard $s")
    }
  } }

  test("rate limit: transformWithState admission counter survives loss + undrained kill") {
    // the transformWithState (arbitrary-state v2) operator under the
    // same protocol: user 1 bursts six events in ONE 10-minute bucket
    // split across the kill boundary — only the first three may ever be
    // admitted, which requires the (bucket, count) ValueState to both
    // survive the undrained kill and not double-count the redelivered
    // batch. RocksDB provider is a transformWithState requirement.
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ms(min: Long): Long = (1000 + min) * 60000L
      // (event_id, ts_ms, user_id, type): u1 bucket-0 burst split 3/3,
      // u2 stays under cap, u1 next bucket resets
      val evs = Seq(
        (1L, ms(0), 1L, "click"), (2L, ms(1), 1L, "click"),
        (3L, ms(2), 1L, "click"), (4L, ms(3), 2L, "click"),
        // batch 2 (after the undrained kill)
        (5L, ms(4), 1L, "click"), (6L, ms(5), 1L, "click"),
        (7L, ms(6), 1L, "click"), (8L, ms(7), 2L, "click"),
        // batch 3: next bucket (base 16:40 → breaks at 17:00 = min 20)
        (9L, ms(21), 1L, "click"))
      def json(e: (Long, Long, Long, String)) =
        s"""{"event_id":${e._1},"ts":${e._2},"user_id":${e._3},"event_type":"${e._4}"}"""
      val batches = Seq(evs.take(4).map(json), evs.slice(4, 8).map(json),
        evs.drop(8).map(json))

      val out = chaosProtocol("rl-chaos", batches, (in, out, ckpt) =>
        RateLimitStream.throttled(
          spark.readStream
            .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING")
            .option("maxFilesPerTrigger", "1").json(in)
            .select(col("event_id"), timestamp_millis(col("ts")).as("ts"),
              col("user_id"), col("event_type"))
            .as[RateLimitStream.Ev].map(ChaosLoss.tap(_)), 3, 600000000L)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append).start())

      val got = spark.read.parquet(out).as[RateLimitStream.Ev].collect()
        .map(_.event_id).sorted.toSeq
      // exactly-once admission: first three of u1's burst (the cross-
      // kill tail all throttled), both u2 events, the next-bucket reset
      assert(got === Seq(1L, 2L, 3L, 4L, 8L, 9L), got.mkString(","))
    } finally oldProv match {
      case Some(v) => spark.conf.set(provKey, v)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("timeout timers: pending click + event-time timer survive loss + undrained kill") {
    // the v2 TIMER path under chaos: a click goes pending in batch 0
    // (with its event-time timer registered), the query is killed
    // undrained, and the timer must still FIRE after recovery once a
    // later batch's watermark passes the deadline — timers and
    // ListState both live in the checkpoint. A converted click across
    // the same kill must NOT fire.
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ms(min: Long): Long = (1000 + min) * 60000L
      val evs = Seq(
        (1L, ms(0), 1L, "click"),      // abandoned: no purchase ever
        (2L, ms(1), 2L, "click"),      // converted AFTER the kill
        // batch 2 (post-kill)
        (3L, ms(5), 2L, "purchase"),   // converts click 2
        // batch 3: watermark pusher (wm → min 110 > both deadlines)
        (4L, ms(120), 9L, "click"))
      def json(e: (Long, Long, Long, String)) =
        s"""{"event_id":${e._1},"ts":${e._2},"user_id":${e._3},"event_type":"${e._4}"}"""
      val batches = Seq(evs.take(2).map(json), evs.slice(2, 3).map(json),
        evs.drop(3).map(json))

      val out = chaosProtocol("to-chaos", batches, (in, out, ckpt) =>
        TimeoutStream.abandoned(
          spark.readStream
            .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING")
            .option("maxFilesPerTrigger", "1").json(in)
            .select(col("event_id"), timestamp_millis(col("ts")).as("ts"),
              col("user_id"), col("event_type"))
            .as[TimeoutStream.Ev].map(ChaosLoss.tap(_)),
          3600000000L, "10 minutes")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append).start())

      val got = spark.read.parquet(out).as[TimeoutStream.Abandoned]
        .collect().map(_.click_id).sorted.toSeq
      // exactly once: click 1's recovered timer fires once; click 2's
      // conversion crossed the kill and never fires
      assert(got === Seq(1L), got.mkString(","))
    } finally oldProv match {
      case Some(v) => spark.conf.set(provKey, v)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("curation funnel: first-wins dedup state survives loss + undrained kill, verdicts exactly once") { withRocksDb {
    // crafted docs so stage 1 bites deterministically: quality docs are
    // 28 distinct 5-letter words + 'the the' (n=30, mean len 4.87,
    // stopword 6.7%, max_c 2 — every C4 rule passes); the dup of doc 1
    // arrives in batch 0 AND (as doc 5) after the undrained kill, so
    // the bucket-owner state must survive both the replay and the kill
    // for keep2 to stay exactly-once-first-wins. Doc 4 fails stage 1
    // (too short) and must not claim its bucket.
    def words(seed: Int) =
      (0 until 28).map(i => s"${('a' + (i + seed) % 26).toChar}${('a' + ((i + seed) / 26) % 26).toChar}xyz")
    val textA = (words(0) :+ "the" :+ "the").mkString(" ")
    val textB = (words(7) :+ "the" :+ "the").mkString(" ")
    val docs = Seq(
      (1L, 1000L, "s1", textA),   // claims A's bucket
      (2L, 2000L, "s1", textA),   // same batch dup → keep2 false
      (3L, 3000L, "s2", textB),   // its own bucket → keep2 true
      (4L, 4000L, "s2", "tiny doc"), // fails keep1, never claims
      // post-kill batch
      (5L, 5000L, "s1", textA),   // cross-kill dup → state must hold
      (6L, 6000L, "s2", textB))   // cross-kill dup of B
    def json(r: (Long, Long, String, String)) =
      s"""{"doc_id":${r._1},"ts":${r._2},"source":"${r._3}","text":"${r._4}"}"""
    val batches = Seq(docs.take(4).map(json), docs.drop(4).map(json))

    val refs = spark.sparkContext.broadcast(
      CurationStream.buildRefs(spark, sf("sf0.001")))
    def pipeline(raw: DataFrame): DataFrame =
      CurationStream.verdicts(
        raw.as[(Long, Long, String, String)].map(ChaosLoss.tap(_))
          .toDF("doc_id", "ts_ms", "source", "text")
          .select(col("doc_id"), timestamp_millis(col("ts_ms")).as("ts"),
            col("source"), col("text")),
        refs, "2 hours")

    val out = chaosProtocol("funnel-chaos", batches, (in, out, ckpt) =>
      pipeline(spark.readStream
        .schema("doc_id LONG, ts LONG, source STRING, text STRING")
        .option("maxFilesPerTrigger", "1").json(in))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start())

    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    // exactly once: one verdict per doc despite loss + replay
    assert(got.map(_._1) === Seq(1L, 2L, 3L, 4L, 5L, 6L), got.mkString(","))
    // differential vs the no-fault batch-mode run of the same operator
    val batchDf = docs.toDF("doc_id", "ts_ms", "source", "text")
      .select(col("doc_id"), timestamp_millis(col("ts_ms")).as("ts"),
        col("source"), col("text"))
    val want = CurationStream.verdicts(batchDf, refs, "2 hours")
      .collect().map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(got === want)
    // semantics spot check: (keep1, keep2) per doc
    assert(got.map(t => (t._2, t._3)) === Seq(
      (true, true), (true, false), (true, true),
      (false, false), (true, false), (true, false)))
  } }
}
