package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Probe: after executing a registered query, walk the final adaptive
  * plan (descending into query stages and reused exchanges) and count
  * parquet scan leaves vs ReusedExchange nodes — tells whether a
  * multi-consumer subtree is actually deduped at runtime.
  * usage: runMain graft.BenchScanReuse <query> [sfDir] */
object BenchScanReuse {
  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match {
      case ad: AdaptiveSparkPlanExec => Seq(ad.executedPlan)
      case q: QueryStageExec         => Seq(q.plan)
      case r: ReusedExchangeExec     => Seq(r.child)
      case other                     => other.children
    }
    p +: expanded.flatMap(flatten)
  }
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate("graft-scan-reuse")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val nodes = flatten(df.queryExecution.executedPlan)
    val scans = nodes.filter(_.getClass.getSimpleName.contains("FileSourceScan"))
    val reused = nodes.count(_.isInstanceOf[ReusedExchangeExec])
    println(s"[scan-reuse] $name: parquetScans=${scans.size} reusedExchanges=$reused")
    scans.foreach(s => println("  scan: " + s.toString.linesIterator.next().take(160)))
    spark.stop()
  }
}
