package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.plans.logical.{EmptyRelation, LogicalPlan}
import org.apache.spark.sql.execution.{CollectMetricsExec, EmptyRelationExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, LogicalQueryStage, QueryStageExec}

/** Empty-propagation-proof observed-metrics collection.
  *
  * `QueryExecution.observedMetrics` walks the FINAL physical plan for
  * `CollectMetricsExec` nodes. When AQE's empty-relation propagation
  * replaces a subtree whose materialized stages already RAN (the realistic
  * case: a cap anti-join's `observe` counters fired in a map stage, then a
  * downstream shuffle stage came back empty and the whole branch collapsed
  * to `EmptyRelationExec`), the metric nodes vanish from the final plan and
  * their already-fired accumulators become invisible — the no-silent-caps
  * WARN would go dark exactly when a cap dropped everything.
  *
  * `EmptyRelationExec` preserves the eliminated plan (`logical`), and the
  * preserved tree still references the materialized `LogicalQueryStage`s
  * whose physical plans hold the fired `CollectMetricsExec` accumulators.
  * [[observed]] merges those recovered metrics under `qe.observedMetrics`
  * (real final-plan metrics win on name collision). Zero extra jobs: this
  * only READS accumulators that the executed stages already populated; a
  * metric whose stage never ran is simply absent (its accumulator is at
  * the zero value, indistinguishable from "no rows" — callers that need
  * ran/not-ran must look at the plan, not the metric).
  */
object GraftMetrics {

  def observed(qe: QueryExecution): Map[String, Row] =
    recoverFromEmptyRelations(qe.executedPlan) ++ qe.observedMetrics

  /** Metrics from CollectMetricsExec nodes reachable only through
    * EmptyRelationExec-preserved subtrees of `plan`. */
  def recoverFromEmptyRelations(plan: SparkPlan): Map[String, Row] = {
    val out = scala.collection.mutable.Map.empty[String, Row]
    walkPhysical(plan, insideEmpty = false, out)
    out.toMap
  }

  private def walkPhysical(p: SparkPlan, insideEmpty: Boolean,
                           out: scala.collection.mutable.Map[String, Row]): Unit = p match {
    case c: CollectMetricsExec =>
      if (insideEmpty && !out.contains(c.name)) out(c.name) = c.collectedMetrics
      c.children.foreach(walkPhysical(_, insideEmpty, out))
    case a: AdaptiveSparkPlanExec =>
      walkPhysical(a.executedPlan, insideEmpty, out)
    case s: QueryStageExec =>
      walkPhysical(s.plan, insideEmpty, out)
    case e: EmptyRelationExec =>
      walkLogical(e.logical, out)
    case other =>
      other.children.foreach(walkPhysical(_, insideEmpty, out))
      other.subqueries.foreach(walkPhysical(_, insideEmpty, out))
  }

  private def walkLogical(l: LogicalPlan,
                          out: scala.collection.mutable.Map[String, Row]): Unit = l match {
    case q: LogicalQueryStage =>
      walkPhysical(q.physicalPlan, insideEmpty = true, out)
    case e: EmptyRelation =>
      walkLogical(e.logical, out)
    case other =>
      other.children.foreach(walkLogical(_, out))
  }
}
