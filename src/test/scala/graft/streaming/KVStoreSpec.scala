package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.streaming.KVStore.{KvOp, KvResult}

/** Differential tests of the KV surface against the reference's
  * porcupine model semantics (models/kv.go:63-77): get → state, put →
  * replace, append → concatenate, absent → "". */
class KVStoreSpec extends SparkSpec {
  import spark.implicits._

  /** The reference model, executed sequentially per key in opId order. */
  private def model(ops: Seq[KvOp]): Map[Long, String] = {
    val state = scala.collection.mutable.Map.empty[String, String].withDefaultValue("")
    ops.sortBy(_.opId).map { o =>
      o.op match {
        case "get"    => o.opId -> state(o.key)
        case "put"    => state(o.key) = o.value; o.opId -> ""
        case "append" => state(o.key) = state(o.key) + o.value; o.opId -> ""
      }
    }.toMap
  }

  test("get/put/append semantics match the porcupine model (batch mode)") {
    val ops = Seq(
      KvOp(1, "get", "k1", ""), KvOp(2, "put", "k1", "a"),
      KvOp(3, "append", "k1", "b"), KvOp(4, "get", "k1", ""),
      KvOp(5, "append", "k2", "x"), KvOp(6, "get", "k2", ""),
      KvOp(7, "put", "k1", "z"), KvOp(8, "get", "k1", ""))
    val got = KVStore.run(ops.toDS()).collect().map(r => r.opId -> r.value).toMap
    assert(got === model(ops))
    assert(got(1) === "")    // absent reads ""
    assert(got(4) === "ab")  // put then append
    assert(got(8) === "z")   // put replaces
  }

  test("streaming: state persists across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KvOp]
    val q = KVStore.run(mem.toDS())
      .writeStream.format("memory").queryName("kv_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(KvOp(1, "put", "k", "hello"), KvOp(2, "append", "k", " world"))
      q.processAllAvailable()
      mem.addData(KvOp(3, "get", "k", ""), KvOp(4, "append", "k", "!"))
      q.processAllAvailable()
      mem.addData(KvOp(5, "get", "k", ""))
      q.processAllAvailable()
      val got = spark.table("kv_out").as[KvResult].collect()
        .map(r => r.opId -> r.value).toMap
      assert(got(3) === "hello world") // state survived the batch boundary
      assert(got(5) === "hello world!")
    } finally q.stop()
  }

  test("randomized differential vs the model, any partitioning") {
    val gen = Gen.listOfN(200, for {
      op <- Gen.oneOf("get", "put", "append")
      key <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.alphaStr.map(_.take(3))
    } yield (op, key, v))
    (0 until 3).foreach { i =>
      val ops = gen.pureApply(Gen.Parameters.default, Seed(100L + i))
        .zipWithIndex.map { case ((op, k, v), idx) => KvOp(idx.toLong, op, k, v) }
      val got = KVStore.run(ops.toDS().repartition(7)).collect()
        .map(r => r.opId -> r.value).toMap
      assert(got === model(ops))
    }
  }
}
