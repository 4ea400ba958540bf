package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Output of [[MisraGries]]: the retained candidate items and the TRUE
  * processed row count (exact — counting is not part of the sketch). */
case class MGSummary(words: Seq[String], n: Long)

/** Misra–Gries frequent-items sketch as a typed Spark [[Aggregator]]
  * (mandate preference (b): a custom TypedColumn where no built-in
  * aggregate exists — Spark ships count_min_sketch but no way to QUERY
  * it inside a plan, and exact groupBy-count state is O(vocabulary)).
  *
  * State is HARD-BOUNDED at k counters per partial aggregate, so the
  * frequent-vocabulary scan over a 100 TB corpus carries O(k) bytes per
  * task instead of O(|vocab|) — the difference between a sketch and a
  * spilling hash aggregate when the vocabulary is billions of tokens.
  *
  * Guarantee (Misra–Gries 1982; merge rule per Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS 2012): every
  * counter undercounts by at most n/(k+1), total undercount is bounded
  * under arbitrary merge trees, hence ANY item with true frequency
  * > n/(k+1) is retained in the final summary regardless of input
  * order or partitioning. The summary CONTENTS beyond that set may vary
  * with partitioning — callers that need a deterministic result must
  * re-count candidates exactly (see operators.Vocab.q68HeavyHitters,
  * the standard two-pass pattern) — but the guaranteed superset makes
  * the verified second pass exact.
  *
  * reduce: +1 if tracked; open a counter if < k live; else decrement
  * ALL counters (the new item's implicit counter included — net effect
  * k+1 distinct items each lose one occurrence). merge: sum counters,
  * then subtract the (k+1)-th largest value from all and drop the
  * non-positive — the PODS'12 rule that preserves the error bound.
  */
class MisraGries(k: Int) extends Aggregator[String, MisraGries.State, MGSummary] {
  require(k > 0, s"k must be positive: $k")

  override def zero: MisraGries.State = new MisraGries.State()

  override def reduce(b: MisraGries.State, w: String): MisraGries.State = {
    b.n += 1
    val cur = b.counts.getOrElse(w, 0L)
    if (cur > 0L) b.counts(w) = cur + 1
    else if (b.counts.size < k) b.counts(w) = 1L
    else {
      // amortized O(1): each stored occurrence is decremented at most once
      for (key <- b.counts.keys.toArray) {
        val v = b.counts(key) - 1
        if (v == 0L) b.counts.remove(key) else b.counts(key) = v
      }
    }
    b
  }

  override def merge(a: MisraGries.State, b: MisraGries.State): MisraGries.State = {
    a.n += b.n
    b.counts.foreach { case (w, c) => a.counts(w) = a.counts.getOrElse(w, 0L) + c }
    if (a.counts.size > k) {
      val vs = a.counts.values.toArray
      java.util.Arrays.sort(vs)
      val t = vs(vs.length - 1 - k) // (k+1)-th largest
      for (key <- a.counts.keys.toArray) {
        val v = a.counts(key) - t
        if (v <= 0L) a.counts.remove(key) else a.counts(key) = v
      }
    }
    a
  }

  override def finish(b: MisraGries.State): MGSummary =
    MGSummary(b.counts.keys.toSeq.sorted, b.n)

  // kryo: the buffer lives as a plain object inside ObjectHashAggregate
  // and only crosses the wire at partial/final boundaries — O(k) bytes.
  override def bufferEncoder: Encoder[MisraGries.State] =
    Encoders.kryo[MisraGries.State]
  override def outputEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
}

object MisraGries {
  final class State extends Serializable {
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var n: Long = 0L
  }
}
