package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Probe: TOTAL parquet scans a query pays, including the ones hidden
  * inside lazy localCheckpoint builds (which [[BenchScanReuse]] cannot
  * see — a checkpoint truncates the main plan to `Scan ExistingRDD`).
  * Each `localCheckpoint` fires one QueryExecutionListener event whose
  * plan holds the scans that run ONCE at materialization; the main
  * action's plan holds the rest. Prints scans per (event, table) and the
  * per-table totals — the evidence for cross-candidate scan-sharing
  * claims (r18 keyCounts2).
  * usage: runMain graft.BenchScanTotal <query> [sfDir] */
object BenchScanTotal {
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
    val spark = GraftSession.getOrCreate("graft-scan-total")
    val tableOf = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Integer]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit = {
        flatten(qe.executedPlan).collect { case s: FileSourceScanExec =>
          val t = s.relation.location.rootPaths.headOption
            .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
          println(s"[scan-total] event=$f table=$t")
          tableOf.merge(t, 1, (a, b) => a + b)
        }
        ()
      }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    Thread.sleep(2000) // listener bus is async
    import scala.jdk.CollectionConverters._
    val total = tableOf.asScala.toSeq.sortBy(_._1)
    println(s"[scan-total] $name TOTALS: " +
      total.map { case (t, n) => s"$t=$n" }.mkString(" ") +
      s" sum=${total.map(_._2.toInt).sum}")
    spark.stop()
  }
}
