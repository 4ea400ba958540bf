package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.{DateType, StringType}

import graft.operators.Storage

/** AUTOMATIC zone-map pruning — the round-14 verdict's task-4 close of
  * the storage arc: `Storage.prunedRead`/`strPrunedRead`/
  * `compoundPrunedRead` skip files a probe cannot touch, but a user had
  * to CALL them. This optimizer [[Rule]] (the [[RewriteChainJoin]]
  * registration pattern: `extraOptimizations`, strictly opt-in via
  * `spark.graft.zonemapPrune.enabled`, default FALSE) detects a
  * pushed-down Filter over a parquet relation whose directory carries a
  * persisted `_zonemap/` (date axis) or `_szonemap/` (string axis)
  * manifest with a `_column` sidecar naming the clustered column,
  * extracts the qualifying predicate bounds, and swaps the relation's
  * file index for one listing ONLY the surviving files — so a plain
  * `spark.read.parquet(dir).filter(col("day") >= ...)` gets the q216
  * skip for free.
  *
  * Contract carried over verbatim from the facade paths:
  *   - the Filter STAYS on top of the pruned relation — pruning is an
  *     optimization, never a filter (a file can survive on zones and
  *     still hold no matching rows);
  *   - survivor sets follow [[Storage.survivingFiles]]' union
  *     semantics: a file absent from one manifest is unskippable on
  *     that axis, both axes intersect;
  *   - only PERSISTED manifests are consulted (plan cost = one small
  *     file per axis, the Delta/Iceberg shape) — no silent O(files)
  *     footer scans at plan time; manifest-less or sidecar-less
  *     layouts are left exactly as they were. Million-file tables
  *     stay on [[Storage.prunedReadScaled]]'s distributed manifest
  *     (this rule materializes the survivor list driver-side, which
  *     the scan needs anyway, but it reads the whole manifest —
  *     O(manifest) — to get there).
  *
  * Predicate extraction is conservative: top-level conjuncts only,
  *   date axis — <, <=, >, >=, = between the clustered DateType column
  *   and a foldable literal (between desugars to >= AND <=);
  *   string axis — equality with a StringType literal (the
  *   strPrunedRead probe shape).
  * Anything else (disjunctions, IN, casts around the column,
  * partitioned tables, streaming relations, multi-root reads) leaves
  * the plan untouched. Zones cover every row WRITTEN, so dropping a
  * zone-dead file can never drop a row any filter could keep; the
  * re-applied Filter handles the rest — results equal the unpruned
  * scan by construction (ZonemapPruneSpec pins that plus the files
  * actually opened; q216/q227/q245's gated facades are unchanged).
  *
  * Fixpoint: pruned (or inspected-and-skipped) relations are tagged
  * ([[ZonemapPruneRule.PRUNED]]) so the fixedPoint batch prices each
  * relation once. */
object ZonemapPruneRule extends Rule[LogicalPlan] {

  val FLAG = "spark.graft.zonemapPrune.enabled"

  /** Set on a LogicalRelation this rule has inspected (pruned or not). */
  private[plans] val PRUNED = TreeNodeTag[Boolean]("graft.zonemap.pruned")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val session = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).orNull
    if (session == null || !session.conf.get(FLAG, "false").toBoolean) plan
    else plan.transformDown {
      case f @ Filter(cond, lr: LogicalRelation)
          if lr.getTagValue(PRUNED).isEmpty && !lr.isStreaming &&
            lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.setTagValue(PRUNED, true)
        prune(session, cond, lr).getOrElse(f)
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def prune(s: SparkSession, cond: Expression,
      lr: LogicalRelation): Option[LogicalPlan] = {
    val fsRel = lr.relation.asInstanceOf[HadoopFsRelation]
    val roots = fsRel.location.rootPaths
    if (roots.size != 1 || fsRel.partitionSchema.nonEmpty) return None
    val dir = roots.head.toString
    val dateCol = Storage.zonemapColumn(s, dir)
    val strCol = Storage.strZonemapColumn(s, dir)
    if (dateCol.isEmpty && strCol.isEmpty) return None
    val cs = conjuncts(cond)
    val dateBounds = dateCol.flatMap(dc => extractDateBounds(cs, lr, dc))
    val strEq = strCol.flatMap(sc => extractStrEq(cs, lr, sc))
    if (dateBounds.isEmpty && strEq.isEmpty) return None
    survivingFilesOf(s, dir, dateBounds, strEq).flatMap {
      case (survivors, total) if survivors.size < total =>
        val pruned = new InMemoryFileIndex(s,
          survivors.map(new Path(_)), Map.empty, Some(fsRel.dataSchema))
        val newLr = lr.copy(relation =
          fsRel.copy(location = pruned)(s))
        newLr.setTagValue(PRUNED, true)
        // the predicate re-applies in full on the survivors
        Some(Filter(cond, newLr))
      case _ => None // nothing skippable: keep the original scan
    }
  }

  /** Seam for ZonemapPruneSpec's never-a-filter fault drill. */
  private[plans] def survivingFilesOf(s: SparkSession, dir: String,
      dateBounds: Option[(Int, Int)], strEq: Option[String])
      : Option[(Seq[String], Int)] =
    Storage.survivingFiles(s, dir, dateBounds, strEq)

  /** [lo, hi] epoch-day bounds from conjuncts over the clustered
    * DateType column; None when no conjunct constrains it. */
  private def extractDateBounds(cs: Seq[Expression], lr: LogicalRelation,
      dateCol: String): Option[(Int, Int)] = {
    def isCol(e: Expression): Boolean = e match {
      case a: Attribute =>
        a.dataType == DateType && lr.output.exists(o =>
          o.exprId == a.exprId && o.name == dateCol)
      case _ => false
    }
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, DateType) => Some(v)
      case _ => None
    }
    var lo = Int.MinValue
    var hi = Int.MaxValue
    var found = false
    cs.foreach {
      case EqualTo(a, l) if isCol(a) => lit(l).foreach { v =>
        lo = math.max(lo, v); hi = math.min(hi, v); found = true }
      case EqualTo(l, a) if isCol(a) => lit(l).foreach { v =>
        lo = math.max(lo, v); hi = math.min(hi, v); found = true }
      case GreaterThanOrEqual(a, l) if isCol(a) => lit(l).foreach { v =>
        lo = math.max(lo, v); found = true }
      case GreaterThan(a, l) if isCol(a) => lit(l).foreach { v =>
        lo = math.max(lo, v + 1); found = true }
      case LessThanOrEqual(a, l) if isCol(a) => lit(l).foreach { v =>
        hi = math.min(hi, v); found = true }
      case LessThan(a, l) if isCol(a) => lit(l).foreach { v =>
        hi = math.min(hi, v - 1); found = true }
      // literal-on-the-left forms, flipped
      case GreaterThanOrEqual(l, a) if isCol(a) => lit(l).foreach { v =>
        hi = math.min(hi, v); found = true }
      case GreaterThan(l, a) if isCol(a) => lit(l).foreach { v =>
        hi = math.min(hi, v - 1); found = true }
      case LessThanOrEqual(l, a) if isCol(a) => lit(l).foreach { v =>
        lo = math.max(lo, v); found = true }
      case LessThan(l, a) if isCol(a) => lit(l).foreach { v =>
        lo = math.max(lo, v + 1); found = true }
      case _ =>
    }
    if (found) Some((lo, hi)) else None
  }

  /** The string equality probe value, when exactly the strPrunedRead
    * shape appears among the conjuncts. */
  private def extractStrEq(cs: Seq[Expression], lr: LogicalRelation,
      strCol: String): Option[String] = {
    def isCol(e: Expression): Boolean = e match {
      case a: Attribute =>
        a.dataType == StringType && lr.output.exists(o =>
          o.exprId == a.exprId && o.name == strCol)
      case _ => false
    }
    cs.collectFirst {
      case EqualTo(a, Literal(v, StringType)) if isCol(a) && v != null =>
        v.toString
      case EqualTo(Literal(v, StringType), a) if isCol(a) && v != null =>
        v.toString
    }
  }
}

object ZonemapPruneExtension {
  /** Idempotently registers the rule (the GroupTopKExtension seam). The
    * rule stays inert until `spark.graft.zonemapPrune.enabled` is true. */
  def install(spark: SparkSession): Unit = synchronized {
    val e = spark.experimental
    if (!e.extraOptimizations.contains(ZonemapPruneRule))
      e.extraOptimizations = e.extraOptimizations :+ ZonemapPruneRule
  }
}
