package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The reference's declared-but-unimplemented KV surface (SURVEY.md §2.3;
  * API: kvraft/common.go:12-33, semantics model: models/kv.go:63-77 —
  * get returns state, put replaces, append concatenates, absent key
  * reads "") realized as a keyed-state stream operator: operations
  * arrive as a (possibly streaming) Dataset, state lives per key in
  * Spark's state store, results are emitted per operation.
  *
  * On `transformWithState` (arbitrary-state v2) since round 13 — the
  * last v1 holdout after the round-12 ports: the per-key register is a
  * named `ValueState[String]`, updated through the store instead of the
  * opaque GroupState blob, and the processor runs identically in batch
  * (TimeMode.None — the differential/linearizability specs) and
  * streaming (RecoverySpec's checkpoint recovery + chaos). No timers:
  * KV state is deliberately immortal, like the reference's store —
  * production TTL policy would be one `TTLConfig` argument away.
  * Requires the RocksDB state store provider, like every
  * transformWithState operator (KVStoreSpec/RecoverySpec opt in via
  * SparkSpec.withRocksDb).
  *
  * Ordering: per-key linearization order is (batchTime, opId) — within a
  * micro-batch ops are applied in opId order, mirroring how the
  * reference serializes through Raft log order. Cross-key ordering is
  * unconstrained, exactly like the sharded reference.
  *
  * Scale notes: state is one string per key, hash-partitioned by key
  * across the cluster by the state store — the Spark-native form of the
  * reference's key2shard static sharding (shardkv/client.go:22-28);
  * rebalancing is the state store's job, not a Join/Leave/Move protocol.
  */
object KVStore {

  case class KvOp(opId: Long, op: String, key: String, value: String)

  /** `value` is the Get result; Put/Append ack with "" like the
    * reference client API (kvraft/client.go:92-97 returns nothing). */
  case class KvResult(opId: Long, key: String, value: String)

  class KvProcessor extends StatefulProcessor[String, KvOp, KvResult] {
    @transient private var cur: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[String]("value", Encoders.STRING,
        TTLConfig.NONE)

    override def handleInputRows(key: String, batch: Iterator[KvOp],
        timerValues: TimerValues): Iterator[KvResult] = {
      var c = if (cur.exists()) cur.get() else ""
      // BOUND: materializes one key's ops from ONE micro-batch (streaming)
      // or one key's full op history (batch test mode) — per-key, never
      // corpus-wide; mirrors the reference, where a shard's Raft log is
      // serialized through one group anyway (kvraft/server.go API).
      val out = batch.toArray.sortInPlaceBy(_.opId).map { o =>
        o.op match {
          case "get" => KvResult(o.opId, key, c)
          case "put" => c = o.value; KvResult(o.opId, key, "")
          case "append" => c = c + o.value; KvResult(o.opId, key, "")
          case other => throw new IllegalArgumentException(s"unknown op '$other'")
        }
      }
      cur.update(c)
      out.iterator
    }
  }

  def run(ops: Dataset[KvOp]): Dataset[KvResult] = {
    implicit val outEnc = Encoders.product[KvResult]
    ops.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new KvProcessor, TimeMode.None(), OutputMode.Append())
  }
}
