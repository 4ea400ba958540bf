package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.KVStore.{KvOp, KvResult}

/** Streaming fault tolerance: a stateful query stopped and restarted
  * from its checkpoint must resume with its state intact — the
  * Structured Streaming analog of the reference's crash-recovery
  * contract (coordinator reassigns, output unaffected). Uses a file
  * source (replayable; MemoryStream can't recover from a checkpoint). */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  // KVStore is transformWithState (v2) since round 13: RocksDB provider
  // required for every checkpoint/recovery case here
  override protected def test(name: String, tags: org.scalatest.Tag*)(
      body: => Any)(implicit pos: org.scalactic.source.Position): Unit =
    super.test(name, tags: _*)(withRocksDb(body))(pos)

  private def writeOps(dir: Path, name: String, ops: Seq[KvOp]): Unit = {
    val lines = ops.map(o =>
      s"""{"opId":${o.opId},"op":"${o.op}","key":"${o.key}","value":"${o.value}"}""")
    Files.writeString(dir.resolve(name), lines.mkString("\n"))
  }

  test("KV state survives a stop/restart from checkpoint") {
    val in = Files.createTempDirectory("kv-in")
    val out = Files.createTempDirectory("kv-out").toString
    val ckpt = Files.createTempDirectory("kv-ckpt").toString

    // durable file sink: the memory sink is not recovery-capable
    def start() = KVStore.run(
      spark.readStream
        .schema("opId LONG, op STRING, key STRING, value STRING")
        .json(in.toString).as[KvOp])
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    writeOps(in, "batch1.json",
      Seq(KvOp(1, "put", "k", "persist"), KvOp(2, "append", "k", "ed")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // "crash": the query is gone; new ops arrive; restart from checkpoint
    writeOps(in, "batch2.json",
      Seq(KvOp(3, "get", "k", ""), KvOp(4, "append", "k", "!"),
        KvOp(5, "get", "k", "")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(out).as[KvResult].collect()
        .map(r => r.opId -> r.value).toMap
      assert(got(3) === "persisted")  // state restored from checkpoint
      assert(got(5) === "persisted!") // and still mutable
      // exactly-once across the restart: batch1 results appear once
      assert(spark.read.parquet(out).as[KvResult].collect()
        .count(_.opId == 1L) === 1)
    } finally q2.stop()
  }

  /** labrpc-analog chaos (reference: labrpc.go:171-190 drops/reorders
    * messages in flight): here "the network loses the delivery" is an
    * injected FIRST-ATTEMPT task failure on every mutating op — the op
    * is redelivered by Spark's task retry (local[8,4] allows 4
    * attempts), and the contract under test is the same one the
    * reference's lossy network probes: redelivery must not double-apply
    * (each opId answered exactly once, final state as if every op ran
    * once, in order). On top, the query is killed WITHOUT draining
    * between batches — restart from checkpoint may replay a partially
    * processed batch, which the batchId-idempotent sink must dedup. */
  test("KV exactly-once under injected delivery failures and an undrained kill") {
    val in = Files.createTempDirectory("kv-chaos-in")
    val out = Files.createTempDirectory("kv-chaos-out").toString
    val ckpt = Files.createTempDirectory("kv-chaos-ckpt").toString

    def start() = {
      val src = spark.readStream
        .schema("opId LONG, op STRING, key STRING, value STRING")
        .json(in.toString).as[KvOp]
        .map { op =>
          // first delivery of any mutating op is "lost" (task attempt 0
          // dies after reading it); the retry redelivers
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null && tc.attemptNumber() == 0 && op.op != "get")
            throw new RuntimeException(s"injected delivery loss (op ${op.opId})")
          op
        }
      KVStore.run(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    }

    writeOps(in, "c1.json", Seq(
      KvOp(1, "put", "a", "x"), KvOp(2, "append", "a", "y"),
      KvOp(3, "put", "b", "m"), KvOp(4, "get", "a", "")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // drop more ops, then kill/restart WITHOUT draining — the second
    // query may die mid-batch; the third must converge regardless
    writeOps(in, "c2.json", Seq(
      KvOp(5, "append", "b", "n"), KvOp(6, "get", "b", ""),
      KvOp(7, "append", "a", "z"), KvOp(8, "get", "a", "")))
    val q2 = start()
    q2.stop() // no processAllAvailable: undrained kill
    val q3 = start()
    try {
      q3.processAllAvailable()
      val rs = spark.read.parquet(out).as[KvResult].collect()
      // exactly-once: every op answered exactly once despite every
      // mutating op failing its first delivery and the undrained kill
      assert(rs.groupBy(_.opId).view.mapValues(_.length).toMap ===
        (1L to 8L).map(_ -> 1).toMap, rs.sortBy(_.opId).mkString("\n"))
      val byId = rs.map(r => r.opId -> r.value).toMap
      assert(byId(4L) === "xy")
      assert(byId(6L) === "mn")
      assert(byId(8L) === "xyz") // appends applied once each, in opId order
    } finally q3.stop()
  }
}
