package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, StructType}

import graft.operators.Storage

/** AUTOMATIC zone-map pruning — the round-14 verdict's task-4 close of
  * the storage arc: `Storage.prunedRead`/`strPrunedRead`/
  * `compoundPrunedRead` skip files a probe cannot touch, but a user had
  * to CALL them. This optimizer [[Rule]] (the [[RewriteChainJoin]]
  * registration pattern: `extraOptimizations`, strictly opt-in via
  * `spark.graft.zonemapPrune.enabled`, default FALSE) detects a
  * pushed-down Filter over a parquet relation whose directory carries a
  * persisted `_zonemap/` (date axis), `_szonemap/` (string axis) or
  * `_nzonemap/` (numeric axis, r16 verdict task 3) manifest with a
  * `_column` sidecar naming the clustered column, extracts the
  * qualifying predicate bounds, and swaps the relation's file index for
  * one listing ONLY the surviving files — so a plain
  * `spark.read.parquet(dir).filter(col("day") >= ...)` gets the q216
  * skip for free.
  *
  * Contract carried over verbatim from the facade paths:
  *   - the Filter STAYS on top of the pruned relation — pruning is an
  *     optimization, never a filter (a file can survive on zones and
  *     still hold no matching rows);
  *   - survivor sets follow [[Storage.survivorsFromManifests]]' union
  *     semantics: a file absent from one manifest is unskippable on
  *     that axis, all axes intersect;
  *   - only PERSISTED manifests are consulted (plan cost = one small
  *     file per axis, the Delta/Iceberg shape) — no silent O(files)
  *     footer scans at plan time; manifest-less or sidecar-less
  *     layouts are left exactly as they were. Million-file tables
  *     stay on [[Storage.prunedReadScaled]]'s distributed manifest
  *     (this rule materializes the survivor list driver-side, which
  *     the scan needs anyway, but it reads the whole manifest —
  *     O(manifest) — to get there).
  *
  * PARTITIONED tables prune too (r16 verdict task 4): partition-dir +
  * zone-map is exactly the Delta/Iceberg layering a real lake uses —
  * `type=click/part-…parquet` files still carry zones worth skipping.
  * The manifests persist ROOT-RELATIVE paths, the survivor index is
  * rebuilt with the original root as `basePath` plus the relation's
  * full schema, so partition-column discovery (values AND types) is
  * preserved and Spark's own partition pruning then applies ON TOP of
  * the zone survivors — the two prunings intersect per file, each
  * doing the job the other can't (a partition filter can't see
  * within-partition clustering; a zone can't see directory values).
  *
  * Predicate extraction (widened in r16 to IN-lists, string ranges,
  * same-column ORs; numeric comparisons this round): each top-level
  * conjunct is desugared to a UNION of closed intervals over the
  * clustered column —
  *   comparisons (<, <=, >, >=, =, either operand order) → one
  *     interval (string/numeric strict bounds conservatively widen to
  *     inclusive — a superset never skips a file it shouldn't);
  *   IN (and its optimized InSet form) → point intervals;
  *   OR / nested AND → interval-set union / intersection, provided
  *     EVERY leaf constrains the same clustered column.
  * Constraining conjuncts INTERSECT. A file survives an axis when any
  * interval overlaps its zone. Anything else (casts around the column,
  * mixed-column disjunctions, NaN literals, streaming relations,
  * multi-root reads) leaves the plan untouched. Zones cover every row
  * WRITTEN, so dropping a zone-dead file can never drop a row any
  * filter could keep; the re-applied Filter handles the rest — results
  * equal the unpruned scan by construction (ZonemapPruneSpec pins that
  * plus the files actually opened; q216/q227/q245's gated facades are
  * unchanged).
  *
  * Fixpoint: NO tree tag (r15's one-shot tag sat on the original
  * LogicalRelation, which Catalyst shares by reference across Datasets
  * derived from one base DataFrame — after the first query optimized,
  * every later query on the same relation silently skipped pruning).
  * Termination is by natural idempotency instead: a pruned relation's
  * listed files are exactly the survivors, so a re-inspection finds
  * nothing further to skip (`finalFiles.size < listed.size` fails) and
  * returns the plan unchanged. Manifest reads are MEMOIZED per
  * `apply()` invocation (r16 advice): one small-file read per axis per
  * DIRECTORY per optimizer pass, however many Filter nodes or
  * fixedPoint iterations inspect it — on a remote FS the old
  * per-node re-read made plan latency scale with iterations × filters. */
object ZonemapPruneRule extends Rule[LogicalPlan] {

  val FLAG = "spark.graft.zonemapPrune.enabled"

  /** Everything the rule needs to know about one layout directory,
    * read ONCE per optimizer pass: the per-axis `_column` sidecars,
    * the persisted manifests for advertised axes, and the
    * multi-column `_colzones/` store (any number of columns per
    * codec). Legacy axes and colzones columns all INTERSECT. */
  private[plans] case class DirAxes(
      dateCol: Option[String], strCol: Option[String], numCol: Option[String],
      dateMan: Option[Seq[Storage.FileZone]],
      strMan: Option[Seq[Storage.StrFileZone]],
      numMan: Option[Seq[Storage.NumFileZone]],
      colzones: Storage.ColumnZones) {
    def isEmpty: Boolean =
      dateCol.isEmpty && strCol.isEmpty && numCol.isEmpty && colzones.isEmpty
    /** Every (column, manifest) pair per codec — legacy axis first. */
    def dateCands: Seq[(String, Seq[Storage.FileZone])] =
      (for (c <- dateCol; m <- dateMan) yield (c, m)).toSeq ++ colzones.dateCols
    def strCands: Seq[(String, Seq[Storage.StrFileZone])] =
      (for (c <- strCol; m <- strMan) yield (c, m)).toSeq ++ colzones.strCols
    def numCands: Seq[(String, Seq[Storage.NumFileZone])] =
      (for (c <- numCol; m <- numMan) yield (c, m)).toSeq ++ colzones.numCols
    /** The null axis lives only in the `_colzones/` store (written for
      * every column, whatever its value codec). */
    def nullCands: Seq[(String, Seq[Storage.NullStat])] = colzones.nullCols
    /** Union of every path any persisted manifest lists — the set the
      * zone guarantees cover. */
    def manifestedPaths: Set[String] =
      (dateMan.getOrElse(Seq.empty).map(_.path) ++
        strMan.getOrElse(Seq.empty).map(_.path) ++
        numMan.getOrElse(Seq.empty).map(_.path) ++
        colzones.allPaths).toSet
  }

  private[plans] def loadAxes(s: SparkSession, dir: String): DirAxes = {
    val dc = Storage.zonemapColumn(s, dir)
    val sc = Storage.strZonemapColumn(s, dir)
    val nc = Storage.numZonemapColumn(s, dir)
    DirAxes(dc, sc, nc,
      dc.flatMap(_ => Storage.readManifest(s, dir)),
      sc.flatMap(_ => Storage.readStrManifest(s, dir)),
      nc.flatMap(_ => Storage.readNumManifest(s, dir)),
      Storage.readColumnZones(s, dir))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val session = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).orNull
    if (session == null || !session.conf.get(FLAG, "false").toBoolean) plan
    else {
      // per-APPLY manifest memo: every Filter node (and every fixedPoint
      // re-entry of this transform within one apply) shares the reads
      val axesOf = scala.collection.mutable.Map.empty[String, DirAxes]
      plan.transformDown {
        case f @ Filter(cond, lr: LogicalRelation)
            if !lr.isStreaming && lr.relation.isInstanceOf[HadoopFsRelation] =>
          prune(session, cond, lr, axesOf).getOrElse(f)
      }
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def prune(s: SparkSession, cond: Expression,
      lr: LogicalRelation,
      axesOf: scala.collection.mutable.Map[String, DirAxes])
      : Option[LogicalPlan] = {
    val fsRel = lr.relation.asInstanceOf[HadoopFsRelation]
    val roots = fsRel.location.rootPaths
    if (roots.size != 1) return None
    val dir = roots.head.toString
    val axes = axesOf.getOrElseUpdate(dir, loadAxes(s, dir))
    if (axes.isEmpty) return None
    val cs = conjuncts(cond)
    // every zoned column the predicate constrains contributes one
    // (manifest, interval-union) pair; all pairs intersect
    val dateHits = axes.dateCands.flatMap { case (c, man) =>
      extractDateIvs(cs, lr, c).map(ivs => (c, man, ivs)) }
    val strHits = axes.strCands.flatMap { case (c, man) =>
      extractStrIvs(cs, lr, c).map(ivs => (c, man, ivs)) }
    val numHits = axes.numCands.flatMap { case (c, man) =>
      extractNumIvs(cs, lr, c).map(ivs => (c, man, ivs)) }
    // the null axis: explicit IS [NOT] NULL conjuncts, plus the
    // not-null a value constraint IMPLIES (a conjunct like `c >= 5`
    // is never true on a null row, so an all-null file cannot serve it)
    val valueCols = (dateHits.map(_._1) ++ strHits.map(_._1) ++
      numHits.map(_._1)).toSet
    val nullSets = axes.nullCands.flatMap { case (c, man) =>
      extractNullWant(cs, lr, c, valueCols.contains(c)).map(w => (man, w)) }
    val dateSets = dateHits.map(t => (t._2, t._3))
    val strSets = strHits.map(t => (t._2, t._3))
    val numSets = numHits.map(t => (t._2, t._3))
    if (dateSets.isEmpty && strSets.isEmpty && numSets.isEmpty &&
      nullSets.isEmpty) return None
    survivingFilesOf(dateSets, strSets, numSets, nullSets).flatMap {
      case (survivors, _) =>
        // Coverage cross-check (r15 advice): the manifests only protect
        // files they LIST. A data file present in the directory but
        // absent from every persisted manifest (crash between the
        // parquet append commit and the manifest write, or any
        // out-of-band addition) must stay in the scan UNCONDITIONALLY —
        // otherwise enabling the flag would change results vs the plain
        // scan, breaking the rule's "results equal the unpruned scan by
        // construction" contract. Likewise a manifest row whose data
        // file no longer exists is dropped (the plain scan would not
        // read it either). All of this uses the relation's ALREADY
        // LISTED files — no extra filesystem calls.
        def key(p: String): String = new Path(p).toUri.getPath
        val listed = fsRel.location.inputFiles.toSeq
        val listedKeys = listed.map(key).toSet
        val manifested = axes.manifestedPaths.map(key)
        val unmanifested = listed.filter(p => !manifested.contains(key(p)))
        val finalFiles =
          survivors.filter(p => listedKeys.contains(key(p))) ++ unmanifested
        if (finalFiles.size < listed.size) {
          // A PARTITIONED layout keeps its partition columns: the
          // original root goes in as basePath and the full schema
          // (data + partition columns) types the re-discovered
          // partition values, so `type=click/` survivors still carry
          // type='click' and Spark's partition pruning composes on top.
          val params =
            if (fsRel.partitionSchema.isEmpty) Map.empty[String, String]
            else Map("basePath" -> dir)
          val schema =
            if (fsRel.partitionSchema.isEmpty) fsRel.dataSchema
            else StructType(fsRel.dataSchema.fields ++ fsRel.partitionSchema.fields)
          val pruned = new InMemoryFileIndex(s,
            finalFiles.map(new Path(_)), params, Some(schema))
          val newLr = lr.copy(relation =
            fsRel.copy(location = pruned)(s))
          // the predicate re-applies in full on the survivors
          Some(Filter(cond, newLr))
        } else None // nothing skippable: keep the original scan
    }
  }

  /** Seam for ZonemapPruneSpec's never-a-filter fault drill. */
  private[plans] def survivingFilesOf(
      dateSets: Seq[(Seq[Storage.FileZone], Seq[(Int, Int)])],
      strSets: Seq[(Seq[Storage.StrFileZone], Seq[(Option[String], Option[String])])],
      numSets: Seq[(Seq[Storage.NumFileZone], Seq[(Option[BigDecimal], Option[BigDecimal])])],
      nullSets: Seq[(Seq[Storage.NullStat], Boolean)] = Seq.empty)
      : Option[(Seq[String], Int)] =
    Storage.survivorsFromColumnSets(dateSets, strSets, numSets, nullSets)

  /** The null-axis want for column `c` from the top-level conjuncts:
    * Some(true) when a conjunct demands NULL rows (skip no-null
    * files), Some(false) when one demands NON-null rows — explicitly
    * or implied by a value constraint on `c` (skip all-null files),
    * None when nothing constrains nullness. A contradictory
    * IS NULL AND IS NOT NULL keeps the IS NULL side: the re-applied
    * Filter returns zero rows either way, so any skip is sound. */
  private def extractNullWant(cs: Seq[Expression], lr: LogicalRelation,
      c: String, impliedNotNull: Boolean): Option[Boolean] = {
    def isCol(e: Expression): Boolean = e match {
      case a: Attribute =>
        lr.output.exists(o => o.exprId == a.exprId && o.name == c)
      case _ => false
    }
    if (cs.exists { case IsNull(a) => isCol(a); case _ => false })
      Some(true)
    else if (impliedNotNull ||
      cs.exists { case IsNotNull(a) => isCol(a); case _ => false })
      Some(false)
    else None
  }

  /** Interval union over the clustered DateType column from the
    * top-level conjuncts — None when no conjunct constrains it.
    * Constraining conjuncts intersect; inside one conjunct, OR unions
    * and nested AND intersects, each leaf a comparison/IN/InSet on the
    * column (any leaf that is not kills that conjunct's extraction —
    * conservative). */
  private def extractDateIvs(cs: Seq[Expression], lr: LogicalRelation,
      dateCol: String): Option[Seq[(Int, Int)]] = {
    def isCol(e: Expression): Boolean = e match {
      case a: Attribute =>
        a.dataType == DateType && lr.output.exists(o =>
          o.exprId == a.exprId && o.name == dateCol)
      case _ => false
    }
    def litV(e: Expression): Option[Int] = e match {
      case Literal(v: Int, DateType) => Some(v)
      case _ => None
    }
    def intersect(a: Seq[(Int, Int)], b: Seq[(Int, Int)]): Seq[(Int, Int)] =
      for {
        (al, ah) <- a; (bl, bh) <- b
        lo = math.max(al, bl); hi = math.min(ah, bh) if lo <= hi
      } yield (lo, hi)
    def ivs(e: Expression): Option[Seq[(Int, Int)]] = e match {
      case Or(l, r) => for (a <- ivs(l); b <- ivs(r)) yield a ++ b
      case And(l, r) => for (a <- ivs(l); b <- ivs(r)) yield intersect(a, b)
      case In(a, ls) if isCol(a) && ls.nonEmpty =>
        val vs = ls.map(litV)
        if (vs.forall(_.isDefined)) Some(vs.flatten.map(v => (v, v))) else None
      case InSet(a, hset) if isCol(a) && hset.nonEmpty =>
        val vs = hset.toSeq.map {
          case i: java.lang.Integer => Some(i.intValue)
          case _ => None
        }
        if (vs.forall(_.isDefined)) Some(vs.flatten.map(v => (v, v))) else None
      case EqualTo(a, l) if isCol(a) => litV(l).map(v => Seq((v, v)))
      case EqualTo(l, a) if isCol(a) => litV(l).map(v => Seq((v, v)))
      case GreaterThanOrEqual(a, l) if isCol(a) =>
        litV(l).map(v => Seq((v, Int.MaxValue)))
      case GreaterThan(a, l) if isCol(a) =>
        litV(l).map(v => Seq((v + 1, Int.MaxValue)))
      case LessThanOrEqual(a, l) if isCol(a) =>
        litV(l).map(v => Seq((Int.MinValue, v)))
      case LessThan(a, l) if isCol(a) =>
        litV(l).map(v => Seq((Int.MinValue, v - 1)))
      // literal-on-the-left forms, flipped
      case GreaterThanOrEqual(l, a) if isCol(a) =>
        litV(l).map(v => Seq((Int.MinValue, v)))
      case GreaterThan(l, a) if isCol(a) =>
        litV(l).map(v => Seq((Int.MinValue, v - 1)))
      case LessThanOrEqual(l, a) if isCol(a) =>
        litV(l).map(v => Seq((v, Int.MaxValue)))
      case LessThan(l, a) if isCol(a) =>
        litV(l).map(v => Seq((v + 1, Int.MaxValue)))
      case _ => None
    }
    val per = cs.flatMap(ivs(_))
    if (per.isEmpty) None else Some(per.reduce(intersect))
  }

  /** Interval union over the clustered StringType column — equality,
    * IN/InSet, ranges (strict bounds conservatively widen to
    * inclusive: a superset interval never skips a file it shouldn't),
    * OR/AND composition. Interval ends are Option (None = unbounded);
    * intersection goes through [[Storage.strIntervalIntersect]]'s
    * utf8 order. */
  private def extractStrIvs(cs: Seq[Expression], lr: LogicalRelation,
      strCol: String): Option[Seq[(Option[String], Option[String])]] = {
    type Iv = (Option[String], Option[String])
    def isCol(e: Expression): Boolean = e match {
      case a: Attribute =>
        a.dataType == StringType && lr.output.exists(o =>
          o.exprId == a.exprId && o.name == strCol)
      case _ => false
    }
    def litV(e: Expression): Option[String] = e match {
      case Literal(v, StringType) if v != null => Some(v.toString)
      case _ => None
    }
    def intersect(a: Seq[Iv], b: Seq[Iv]): Seq[Iv] =
      for (x <- a; y <- b; r <- Storage.strIntervalIntersect(x, y)) yield r
    def ivs(e: Expression): Option[Seq[Iv]] = e match {
      case Or(l, r) => for (a <- ivs(l); b <- ivs(r)) yield a ++ b
      case And(l, r) => for (a <- ivs(l); b <- ivs(r)) yield intersect(a, b)
      case In(a, ls) if isCol(a) && ls.nonEmpty =>
        val vs = ls.map(litV)
        if (vs.forall(_.isDefined))
          Some(vs.flatten.map(v => (Option(v), Option(v)))) else None
      case InSet(a, hset) if isCol(a) && hset.nonEmpty =>
        val vs = hset.toSeq.map {
          case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
          case _ => None
        }
        if (vs.forall(_.isDefined))
          Some(vs.flatten.map(v => (Option(v), Option(v)))) else None
      case EqualTo(a, l) if isCol(a) =>
        litV(l).map(v => Seq((Option(v), Option(v)): Iv))
      case EqualTo(l, a) if isCol(a) =>
        litV(l).map(v => Seq((Option(v), Option(v)): Iv))
      case GreaterThanOrEqual(a, l) if isCol(a) =>
        litV(l).map(v => Seq((Option(v), None): Iv))
      case GreaterThan(a, l) if isCol(a) => // conservative: >= v
        litV(l).map(v => Seq((Option(v), None): Iv))
      case LessThanOrEqual(a, l) if isCol(a) =>
        litV(l).map(v => Seq((None, Option(v)): Iv))
      case LessThan(a, l) if isCol(a) => // conservative: <= v
        litV(l).map(v => Seq((None, Option(v)): Iv))
      // literal-on-the-left forms, flipped
      case GreaterThanOrEqual(l, a) if isCol(a) =>
        litV(l).map(v => Seq((None, Option(v)): Iv))
      case GreaterThan(l, a) if isCol(a) =>
        litV(l).map(v => Seq((None, Option(v)): Iv))
      case LessThanOrEqual(l, a) if isCol(a) =>
        litV(l).map(v => Seq((Option(v), None): Iv))
      case LessThan(l, a) if isCol(a) =>
        litV(l).map(v => Seq((Option(v), None): Iv))
      case _ => None
    }
    val per = cs.flatMap(ivs(_))
    if (per.isEmpty) None else Some(per.reduce(intersect))
  }

  /** Interval union over the clustered NUMERIC column (r16 verdict
    * task 3) — comparisons, IN/InSet, OR/AND composition, the string
    * extractor's shape with exact-decimal ends: integral literals
    * convert losslessly, float/double literals through the shortest
    * round-trip string (order-preserving — same codec as the manifest),
    * DecimalType literals exactly. Strict bounds conservatively widen
    * to inclusive. A NaN literal kills the conjunct's extraction
    * (conservative — NaN ordering differs between Spark and IEEE, so
    * zones must never reason about it). Mixed-type comparisons arrive
    * cast-wrapped from the analyzer and fail the column match —
    * conservative again. */
  private def extractNumIvs(cs: Seq[Expression], lr: LogicalRelation,
      numCol: String): Option[Seq[(Option[BigDecimal], Option[BigDecimal])]] = {
    type Iv = (Option[BigDecimal], Option[BigDecimal])
    def isNumType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case IntegerType | LongType | ShortType | ByteType |
           FloatType | DoubleType => true
      case _: DecimalType => true
      case _ => false
    }
    def isCol(e: Expression): Boolean = e match {
      case a: Attribute =>
        isNumType(a.dataType) && lr.output.exists(o =>
          o.exprId == a.exprId && o.name == numCol)
      case _ => false
    }
    def toDec(v: Any): Option[BigDecimal] = v match {
      case i: java.lang.Integer => Some(BigDecimal(i.intValue))
      case l: java.lang.Long => Some(BigDecimal(l.longValue))
      case sh: java.lang.Short => Some(BigDecimal(sh.intValue))
      case b: java.lang.Byte => Some(BigDecimal(b.intValue))
      case d: java.lang.Double =>
        if (d.isNaN) None else Some(BigDecimal(d.toString))
      case f: java.lang.Float =>
        if (f.isNaN) None else Some(BigDecimal(f.toString))
      case dec: org.apache.spark.sql.types.Decimal => Some(dec.toBigDecimal)
      case _ => None
    }
    def litV(e: Expression): Option[BigDecimal] = e match {
      case Literal(v, dt) if v != null && isNumType(dt) => toDec(v)
      case _ => None
    }
    def intersect(a: Seq[Iv], b: Seq[Iv]): Seq[Iv] =
      for (x <- a; y <- b; r <- Storage.numIntervalIntersect(x, y)) yield r
    def ivs(e: Expression): Option[Seq[Iv]] = e match {
      case Or(l, r) => for (a <- ivs(l); b <- ivs(r)) yield a ++ b
      case And(l, r) => for (a <- ivs(l); b <- ivs(r)) yield intersect(a, b)
      case In(a, ls) if isCol(a) && ls.nonEmpty =>
        val vs = ls.map(litV)
        if (vs.forall(_.isDefined))
          Some(vs.flatten.map(v => (Option(v), Option(v)))) else None
      case InSet(a, hset) if isCol(a) && hset.nonEmpty =>
        val vs = hset.toSeq.map(toDec)
        if (vs.forall(_.isDefined))
          Some(vs.flatten.map(v => (Option(v), Option(v)))) else None
      case EqualTo(a, l) if isCol(a) =>
        litV(l).map(v => Seq((Option(v), Option(v)): Iv))
      case EqualTo(l, a) if isCol(a) =>
        litV(l).map(v => Seq((Option(v), Option(v)): Iv))
      case GreaterThanOrEqual(a, l) if isCol(a) =>
        litV(l).map(v => Seq((Option(v), None): Iv))
      case GreaterThan(a, l) if isCol(a) => // conservative: >= v
        litV(l).map(v => Seq((Option(v), None): Iv))
      case LessThanOrEqual(a, l) if isCol(a) =>
        litV(l).map(v => Seq((None, Option(v)): Iv))
      case LessThan(a, l) if isCol(a) => // conservative: <= v
        litV(l).map(v => Seq((None, Option(v)): Iv))
      // literal-on-the-left forms, flipped
      case GreaterThanOrEqual(l, a) if isCol(a) =>
        litV(l).map(v => Seq((None, Option(v)): Iv))
      case GreaterThan(l, a) if isCol(a) =>
        litV(l).map(v => Seq((None, Option(v)): Iv))
      case LessThanOrEqual(l, a) if isCol(a) =>
        litV(l).map(v => Seq((Option(v), None): Iv))
      case LessThan(l, a) if isCol(a) =>
        litV(l).map(v => Seq((Option(v), None): Iv))
      case _ => None
    }
    val per = cs.flatMap(ivs(_))
    if (per.isEmpty) None else Some(per.reduce(intersect))
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
