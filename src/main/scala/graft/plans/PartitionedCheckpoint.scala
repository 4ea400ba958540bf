package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.{Column, DataFrame}

/** Lazy localCheckpoint that KEEPS its partitioning (and optionally its
  * per-partition sort order) visible to the planner.
  *
  * `Dataset.localCheckpoint` truncates the plan to a `LogicalRDD` whose
  * `outputPartitioning` is unknown when the plan is adaptive-and-
  * unexecuted (the lazy case — `AdaptiveSparkPlanExec` cannot name its
  * output partitioning before its final plan exists). Every downstream
  * join/aggregate keyed exactly how the checkpoint is already laid out
  * then pays a full re-`Exchange` of the checkpointed data — for the
  * iterative graph operators that re-join a checkpointed edge list every
  * round, that is one edge-sized shuffle PER ROUND that the r13–r15
  * "partitioned+sorted once, zero-Exchange per iteration" design had
  * explicitly removed (found regressed in optimization round 18 via the
  * per-round plan probe: `Exchange hashpartitioning(src)` above every
  * `Scan ExistingRDD`).
  *
  * [[apply]] restores the design soundly: it LAYS OUT the input itself —
  * `repartition(n, keys)` (REPARTITION_BY_NUM: a user-pinned partition
  * count AQE never coalesces) plus optional `sortWithinPartitions(keys)`
  * — takes the lazy local checkpoint of that, and re-labels the
  * resulting `LogicalRDD` with `HashPartitioning(keys, n)` (+ ascending
  * `SortOrder`). The claim is true BY CONSTRUCTION: the checkpoint
  * materializes the very exchange/sort described, with an
  * AQE-unalterable partition count, and `Dataset.checkpoint` reuses the
  * child plan's output attribute instances so the key attributes resolve
  * to the same ids. Rows, values and fault behavior are exactly those of
  * `repartition(n, keys).sortWithinPartitions(keys).localCheckpoint()`.
  *
  * n defaults to `spark.sql.shuffle.partitions` (conf-driven — the
  * GraftSession default derives from `SPARK_GRAFT_CPUS` locally and is a
  * cluster-sized setting in production, never a hard-coded constant). */
object PartitionedCheckpoint {
  def apply(df: DataFrame, keys: Seq[String], sorted: Boolean = true,
            numPartitions: Option[Int] = None): DataFrame = {
    val n = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val keyCols: Seq[Column] = keys.map(df.col)
    val laid0 = df.repartition(n, keyCols: _*)
    val laid = if (sorted) laid0.sortWithinPartitions(keyCols: _*) else laid0
    val ck = laid.localCheckpoint(false)
    val lr = ck.queryExecution.logical match {
      case l: LogicalRDD => l
      case other => // not a checkpoint plan (never expected) — stay safe
        return ck
    }
    val attrs = keys.map(k => lr.output.find(_.name == k).getOrElse(
      throw new IllegalArgumentException(
        s"checkpoint key '$k' not in ${lr.output.map(_.name)}")))
    val relabeled = LogicalRDD(
      lr.output, lr.rdd,
      HashPartitioning(attrs, n),
      if (sorted) attrs.map(a => SortOrder(a, Ascending)) else Nil,
      lr.isStreaming)(
      df.sparkSession.asInstanceOf[SparkSession])
    Dataset.ofRows(df.sparkSession.asInstanceOf[SparkSession], relabeled)
  }
}
