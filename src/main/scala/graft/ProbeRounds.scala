package graft

/** Throwaway probe: print the plan skeleton of every localCheckpoint
  * QueryExecution a query's BUILD fires (the per-round frames of the
  * iterative graph operators) — joins, exchanges, leaf kinds.
  * usage: runMain graft.ProbeRounds <query> [sfDir] */
object ProbeRounds {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate("probe-rounds")
    var i = 0
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit = {
        if (f == "localCheckpoint" || f == "checkpoint") {
          i += 1
          val skel = qe.executedPlan.toString.linesIterator
            .filter(l => l.contains("Join") || l.contains("Exchange") ||
              l.contains("Scan") || l.contains("HashAggregate"))
            .mkString("\n")
          println(s"[rounds] ---- checkpoint #$i ($f) ----\n$skel")
        }
      }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    val df = SparkEntry.queries(name)(spark, sfDir)
    Thread.sleep(1500)
    println("[rounds] ---- FINAL ----")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Scan") || l.contains("HashAggregate")).mkString("\n"))
    spark.stop()
  }
}
