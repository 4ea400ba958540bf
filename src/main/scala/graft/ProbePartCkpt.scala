package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PartitionedCheckpoint

/** Throwaway probe: does PartitionedCheckpoint kill the per-join
  * re-Exchange, and are results identical to the plain form? */
object ProbePartCkpt {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("probe-pc")
    import spark.implicits._
    val a = (1L to 200000L).map(i => (i % 5000, i)).toDF("k", "va")
    val b = (1L to 100000L).map(i => (i % 3000, i * 7)).toDF("k", "vb")
    val ac = PartitionedCheckpoint(a, Seq("k"))
    val bc = PartitionedCheckpoint(b, Seq("k"))
    val j = ac.join(bc, Seq("k")).groupBy($"k").agg(sum($"va" * $"vb").as("s"))
    val plain = a.join(b, Seq("k")).groupBy($"k").agg(sum($"va" * $"vb").as("s"))
    val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = plain.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    println("ROWS_EQUAL=" + (got == want) + " n=" + got.size)
    val fin = j.queryExecution.executedPlan.toString
    val lines = fin.linesIterator.toArray
    val cut = lines.indexWhere(_.contains("== Initial Plan =="))
    val finalPart = (if (cut > 0) lines.take(cut) else lines).mkString("\n")
    println("FINAL_EXCHANGES=" + "Exchange".r.findAllIn(finalPart).length)
    println("FINAL_SORTS=" + "\\bSort\\b".r.findAllIn(finalPart).length)
    println(finalPart.linesIterator.filter(l => l.contains("Join") ||
      l.contains("Exchange") || l.contains("Scan") || l.contains("Sort"))
      .mkString("\n"))
    spark.stop()
  }
}
