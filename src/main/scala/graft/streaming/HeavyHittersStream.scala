package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.MisraGries

/** CONTINUOUS heavy-hitter candidates over a word stream — the
  * streaming face of the two-pass pattern in `operators.Vocab`
  * (q68): Misra–Gries summaries live in the state store and absorb
  * each micro-batch; a batch-side exact recount of the (bounded)
  * candidate set finishes the job whenever a snapshot is taken.
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

  def shardedCandidates(words: Dataset[String], k: Int,
      shards: Int): Dataset[ShardCandidates] = {
    require(shards > 0, s"shards must be positive: $shards")
    val spark = words.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[MisraGries.State] =
      Encoders.kryo[MisraGries.State]
    val mg = new MisraGries(k)
    words
      .groupByKey(w => math.floorMod(w.hashCode, shards))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (shard: Int, it: Iterator[String],
         state: GroupState[MisraGries.State]) => {
          val st = state.getOption.getOrElse(new MisraGries.State())
          it.foreach(w => mg.reduce(st, w))
          state.update(st)
          val snap = mg.finish(st)
          Iterator(ShardCandidates(shard, snap.words, snap.n))
        })
  }
}
