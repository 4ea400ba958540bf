package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's declared-but-unimplemented KV surface (SURVEY.md §2.3;
  * API: kvraft/common.go:12-33, semantics model: models/kv.go:63-77 —
  * get returns state, put replaces, append concatenates, absent key
  * reads "") realized as a keyed-state stream operator: operations
  * arrive as a (possibly streaming) Dataset, state lives per key in
  * Spark's state store, results are emitted per operation.
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

  def run(ops: Dataset[KvOp]): Dataset[KvResult] = {
    import ops.sparkSession.implicits._

    def update(key: String, batch: Iterator[KvOp],
               state: GroupState[String]): Iterator[KvResult] = {
      var cur = state.getOption.getOrElse("")
      // BOUND: materializes one key's ops from ONE micro-batch (streaming)
      // or one key's full op history (batch test mode) — per-key, never
      // corpus-wide; mirrors the reference, where a shard's Raft log is
      // serialized through one group anyway (kvraft/server.go API).
      val out = batch.toArray.sortInPlaceBy(_.opId).map { o =>
        o.op match {
          case "get" => KvResult(o.opId, key, cur)
          case "put" => cur = o.value; KvResult(o.opId, key, "")
          case "append" => cur = cur + o.value; KvResult(o.opId, key, "")
          case other => throw new IllegalArgumentException(s"unknown op '$other'")
        }
      }
      state.update(cur)
      out.iterator
    }

    ops.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
