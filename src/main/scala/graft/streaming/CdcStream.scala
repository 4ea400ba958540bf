package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** STREAMING latest-wins CDC resolution — the continuous form of
  * `Analytics.applyChangelog`'s first stage: each key's state holds the
  * winning change under the SAME total order the batch operator uses
  * (lexicographic (seq, op, payload) max), and every micro-batch emits
  * the key's new winner. Downstream, the resolved feed upserts into the
  * serving copy of the base table; the batch operator is the replay of
  * the same fold, so the two agree on any prefix of the changelog —
  * StreamingCdcSpec drives the differential through shuffled multi-batch
  * arrival orders, including the out-of-order case where an older seq
  * arrives AFTER a newer one and must NOT win.
  *
  * State is one row per key (the winner), independent of changelog
  * length — the watermark question doesn't arise because CDC resolution
  * is keyed by sequence number, not event time: a late-arriving OLD
  * change is not "late data" to drop but an ordinary record that loses
  * the max. No timeout: keys live as long as the query (at 100 TB the
  * state backend is RocksDB, already exercised in EventStreamsSpec).
  */
object CdcStream extends Serializable {

  case class Chg(k: Long, seq: Long, op: String, bal: Double)

  def latestWins(changes: Dataset[Chg]): Dataset[Chg] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[Chg], state: GroupState[Chg]) =>
          val best = (state.getOption.iterator ++ it)
            .maxBy(c => (c.seq, c.op, c.bal))
          state.update(best)
          best
      }
  }
}
