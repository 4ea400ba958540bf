package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path of the similarity
  * operators (`vec_dot`, `sign_buckets`).
  *
  * Spark's higher-order array functions (`aggregate`, `zip_with`,
  * `transform`) evaluate their lambda INTERPRETED — per element, per row —
  * which this repo measured ~10× slower than codegen on the dedup path
  * (DESIGN.md). A brute-force cosine scan evaluates one dot product per
  * corpus×query pair, so the similarity operators get real expressions
  * with `doGenCode`: the generated code calls a static primitive-loop
  * kernel over `ArrayData` — no boxing, no lambda dispatch, and the
  * surrounding arithmetic stays inside whole-stage codegen.
  */
object VecMath {

  /** Dot product of two double arrays over their common prefix length.
    * Null elements are treated as 0 (embeddings carry none). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** SplitMix64 finalizer — a strong, dependency-free 64-bit mixer used
    * to derive pseudo-random ±1 hyperplane components. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** `tables` sign-LSH bucket ids for one vector: bucket bit b of table t
    * is the sign of the vector's projection onto pseudo-random ±1
    * hyperplane (t, b). One primitive pass per (table, bit) — the
    * hyperplane component for dimension i is derived on the fly from
    * mix(plane * P1 + i), never materialized. */
  def signBuckets(e: ArrayData, tables: Int, bits: Int): ArrayData = {
    val n = e.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        val plane = t.toLong * bits + b
        var s = 0.0
        var i = 0
        while (i < n) {
          val sign = if ((mix(plane * 0x100000001b3L + i) & 1L) == 0L) -1.0 else 1.0
          s += e.getDouble(i) * sign
          i += 1
        }
        acc = (acc << 1) | (if (s > 0) 1L else 0L)
        b += 1
      }
      out(t) = acc
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** `vec_dot(a, b)`: codegen'd dot product of two array<double>. */
  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires (array<double>, array<double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecMath.dot($a, $b)")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
  }

  /** `sign_buckets(e, tables, bits)`: codegen'd array<long> of sign-LSH
    * bucket ids (one per table) for an array<double> vector. `tables` and
    * `bits` must be literals (folded to constants in the generated code). */
  case class SignBuckets(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isDoubleArray(first.dataType) && second.dataType == IntegerType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"sign_buckets requires (array<double>, int, int), got " +
          s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString})")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "sign_buckets"

    override protected def nullSafeEval(e: Any, t: Any, b: Any): Any =
      signBuckets(e.asInstanceOf[ArrayData], t.asInstanceOf[Int], b.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (e, t, b) => s"graft.functions.VecMath.signBuckets($e, $t, $b)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): SignBuckets =
      copy(first = f, second = s, third = t)
  }

  /** Register `vec_dot` and `sign_buckets` in the session's function
    * registry so `expr("vec_dot(e, qe)")` parses. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"vec_dot takes 2 arguments (a, b), got ${exprs.length}")
        VecDot(exprs(0), exprs(1))
      })
    reg.registerFunction(
      FunctionIdentifier("sign_buckets"),
      new ExpressionInfo(classOf[SignBuckets].getName, "sign_buckets"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"sign_buckets takes 3 arguments (e, tables, bits), got ${exprs.length}")
        SignBuckets(exprs(0), exprs(1), exprs(2))
      })
  }
}
