package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's partition-routing hash
  * (FNV-1a 32-bit masked non-negative — src/mr/worker.go:31-35), usable
  * from SQL/DataFrames as `fnv_ihash(str)`.
  *
  * Implemented as a real `Expression` with `doGenCode` (not a Scala UDF):
  * it participates in whole-stage codegen — the generated code calls the
  * same static kernel the interpreted path uses, so there is no
  * serialization boundary, no boxing, and constant-folding/null
  * short-circuiting come from `UnaryExpression` for free.
  */
case class FnvHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv_ihash requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "fnv_ihash"

  override protected def nullSafeEval(input: Any): Any =
    FnvHash.hashUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FnvHash.hashUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): FnvHash =
    copy(child = newChild)
}

object FnvHash {
  /** FNV-1a over the UTF-8 bytes, masked to non-negative — must stay
    * byte-identical to graft.mr.MRJob.ihash (asserted in FunctionsSpec). */
  def hashUTF8(s: UTF8String): Int = {
    val bytes = s.getBytes
    var h = 0x811c9dc5
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff)
      h *= 16777619
      i += 1
    }
    h & 0x7fffffff
  }

  /** Register `fnv_ihash` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("fnv_ihash"),
      new ExpressionInfo(classOf[FnvHash].getName, "fnv_ihash"),
      (exprs: Seq[Expression]) => FnvHash(exprs.head))
}
