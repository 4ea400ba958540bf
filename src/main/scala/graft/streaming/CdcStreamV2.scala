package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** [[CdcStream.latestWins]] re-expressed on `transformWithState` — the
  * arbitrary-stateful-processing v2 API (Spark 4): the per-key winner
  * lives in a NAMED, TYPED `ValueState` managed by the state store
  * (schema'd, TTL-capable, RocksDB-changelog-compatible) instead of the
  * single opaque blob `mapGroupsWithState` gives a group. Same fold,
  * same total order; StreamingCdcSpec drives both implementations over
  * the same shuffled multi-batch arrival and asserts identical winners.
  * Requires the RocksDB state store provider (named state variables map
  * to column families, which the default HDFS-backed provider refuses)
  * — the intended production backend anyway, already exercised in
  * KVStoreSpec.
  *
  * Why carry both: mapGroupsWithState is the battle-tested v1 this
  * engine's other stateful operators use; transformWithState is where
  * Spark's stateful processing is headed (multiple state variables per
  * key, explicit timers, state schema evolution). CDC latest-wins is
  * the simplest operator with real semantics, which makes it the right
  * differential harness for proving the two APIs agree before moving
  * anything bigger.
  */
object CdcStreamV2 extends Serializable {
  import CdcStream.Chg

  private class LatestWins extends StatefulProcessor[Long, Chg, Chg] {
    @transient private var winner: ValueState[Chg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      winner = getHandle.getValueState[Chg]("winner",
        Encoders.product[Chg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Chg],
        timers: TimerValues): Iterator[Chg] = {
      val best = (Option(winner.get()).iterator ++ rows)
        .maxBy(c => (c.seq, c.op, c.bal))
      winner.update(best)
      Iterator.single(best)
    }
  }

  def latestWins(changes: Dataset[Chg]): Dataset[Chg] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.k)
      .transformWithState(new LatestWins, TimeMode.None(), OutputMode.Update())
  }
}
