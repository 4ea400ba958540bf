package graft.streaming

/** Linearizability checking for concurrent KV histories — the analog of
  * the reference's bundled porcupine checker (porcupine/porcupine.go:5-21)
  * with the get/put/append model of models/kv.go:63-77: get returns the
  * current state, put replaces it, append concatenates, an absent key
  * reads "".
  *
  * Algorithm: Wing–Gong linearization search (the same family porcupine
  * implements — "Testing and Verifying Concurrent Objects", Wing & Gong
  * 1993; Lowe 2017 adds the memoization used here). A history is
  * linearizable iff some total order of the operations (1) respects
  * real time — an op invoked after another COMPLETED must come later —
  * and (2) every output matches the sequential model run in that order.
  * The search repeatedly picks a "minimal" pending op (one invoked
  * before every pending op's response), applies the model, and
  * backtracks on output mismatch; visited (completed-set, state) pairs
  * are memoized so equivalent interleavings are explored once.
  *
  * Keys are independent in the model (exactly why the reference can
  * shard by key2shard), so the history is partitioned per key and each
  * sub-history checked alone — porcupine's partition function idea.
  * Worst-case exponential like every linearizability check (the problem
  * is NP-complete), fine for test-harness histories (≤ 63 ops/key).
  */
object Linearizability {

  /** One completed client operation: [invoke, ret] is its real-time
    * window (nanos or any monotonic clock), `result` the value the
    * client observed (get → read value; put/append ack ""). */
  case class OpRecord(client: Int, invoke: Long, ret: Long,
                      op: String, key: String, arg: String, result: String)

  /** Is the whole multi-key history linearizable under the KV model? */
  def isLinearizable(history: Seq[OpRecord]): Boolean =
    history.groupBy(_.key).forall { case (_, h) => keyLinearizable(h) }

  /** Single-key Wing–Gong search with (done-set, state) memoization. */
  private[streaming] def keyLinearizable(ops: Seq[OpRecord]): Boolean = {
    val h = ops.toIndexedSeq
    val n = h.size
    require(n <= 63, s"per-key history too large for the bitmask search: $n")
    if (n == 0) return true
    val failed = scala.collection.mutable.HashSet.empty[(Long, String)]
    val all = (1L << n) - 1

    def search(done: Long, state: String): Boolean = {
      if (done == all) return true
      if (!failed.add((done, state))) return false
      // an op may linearize next iff no other PENDING op completed
      // before it was invoked: invoke(i) <= min ret over pending ops
      var minRet = Long.MaxValue
      var i = 0
      while (i < n) {
        if ((done & (1L << i)) == 0 && h(i).ret < minRet) minRet = h(i).ret
        i += 1
      }
      i = 0
      while (i < n) {
        if ((done & (1L << i)) == 0 && h(i).invoke <= minRet) {
          val o = h(i)
          val (expected, next) = o.op match {
            case "get"    => (state, state)
            case "put"    => ("", o.arg)
            case "append" => ("", state + o.arg)
            case other => throw new IllegalArgumentException(s"unknown op '$other'")
          }
          if (expected == o.result && search(done | (1L << i), next)) return true
        }
        i += 1
      }
      false
    }
    search(0L, "")
  }
}
