package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.MisraGries

/** CONTINUOUS heavy-hitter candidates over a word stream — the
  * streaming face of the two-pass pattern in `operators.Vocab`
  * (q68): Misra–Gries summaries live in the state store and absorb
  * each micro-batch; a batch-side exact recount of the (bounded)
  * candidate set finishes the job whenever a snapshot is taken.
  *
  * Ported to `transformWithState` (arbitrary-state v2; round-11
  * verdict task 4): the per-shard summary is a named ValueState under
  * the kryo encoder (the sketch state is a mutable hash map — exactly
  * the opaque-blob case kryo exists for; contrast GapFillStream's
  * product-encoded state, the structured case). No timers — TimeMode
  * .None, like RateLimitStream. Requires the RocksDB state store
  * provider, like every transformWithState operator. Spec coverage
  * (HeavyHittersStreamSpec differential, ParquetStreamDiffSpec,
  * ChaosRecoverySpec loss/kill) is unchanged by the port.
  *
  * Sharding: words group by `floorMod(hashCode, shards)`, so every
  * occurrence of a word lands in ONE shard and each shard holds an
  * independent O(k) summary. The guarantee composes: a word with
  * global count > N/(k+1) has shard-local count > n_shard/(k+1)
  * (its shard sees every copy and n_shard <= N), so it survives its
  * shard's summary — the cross-shard candidate union is a superset of
  * the true heavy hitters, exactly the property the exact recount
  * needs (asserted in HeavyHittersStreamSpec). At scale, shards spread
  * the state-store load across executors; k bounds each shard's state
  * at O(k) regardless of stream length.
  *
  * Emission (Update mode): a per-shard snapshot (words, n) after each
  * micro-batch that touched the shard; `n` grows monotonically per
  * shard, so the row with max n is the current summary — consumers
  * don't need arrival order.
  */
object HeavyHittersStream {

  case class ShardCandidates(shard: Int, words: Seq[String], n: Long)

  class MGProcessor(k: Int)
      extends StatefulProcessor[Int, String, ShardCandidates] {
    private val mg = new MisraGries(k)
    @transient private var st: ValueState[MisraGries.State] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MisraGries.State]("mg",
        Encoders.kryo[MisraGries.State], TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[String],
        timerValues: TimerValues): Iterator[ShardCandidates] = {
      val s = if (st.exists()) st.get() else new MisraGries.State()
      rows.foreach(w => mg.reduce(s, w))
      st.update(s)
      val snap = mg.finish(s)
      Iterator.single(ShardCandidates(shard, snap.words, snap.n))
    }
  }

  def shardedCandidates(words: Dataset[String], k: Int,
      shards: Int): Dataset[ShardCandidates] = {
    require(shards > 0, s"shards must be positive: $shards")
    implicit val outEnc = Encoders.product[ShardCandidates]
    words
      .groupByKey(w => math.floorMod(w.hashCode, shards))(Encoders.scalaInt)
      .transformWithState(new MGProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
