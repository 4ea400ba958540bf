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
}
