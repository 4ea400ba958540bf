package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Probe: where does a query's wall time go, stage by stage?
  * Runs a registered query once (noop sink) with a SparkListener
  * collecting per-stage duration, task count, input/shuffle bytes, and
  * the stage's name line (which names the operator site), then prints
  * stages sorted by total task time — the §1.1 empirical loop's
  * "find the slowest stage" step without the UI (disabled here).
  * usage: runMain graft.BenchStages <query> [sfDir] */
object BenchStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate("graft-stages")
    case class St(id: Int, wallMs: Long, taskMs: Long, tasks: Int,
                  inMB: Double, srMB: Double, swMB: Double, name: String)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages += St(i.stageId,
          (for {a <- i.completionTime; b <- i.submissionTime} yield a - b)
            .getOrElse(-1L),
          m.executorRunTime, i.numTasks,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.remoteBytesRead / 1e6 +
            m.shuffleReadMetrics.localBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          i.name.linesIterator.next().take(100))
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500) // listener bus drain
    println(f"[stages] $name wall=$wall%.2f s, ${stages.size} stages; top by task time:")
    stages.sortBy(-_.taskMs).take(14).foreach { s =>
      println(f"[stages]  id=${s.id}%4d taskTime=${s.taskMs / 1000.0}%8.2fs wall=${s.wallMs / 1000.0}%7.2fs tasks=${s.tasks}%4d in=${s.inMB}%8.1fMB sr=${s.srMB}%8.1fMB sw=${s.swMB}%8.1fMB  ${s.name}")
    }
    println(f"[stages] total task time ${stages.map(_.taskMs).sum / 1000.0}%.1f s across ${stages.map(_.tasks).sum} tasks")
    spark.stop()
  }
}
