package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for Morton (Z-order) bit interleaving,
  * usable from SQL/DataFrames as `zorder_bits(x, y)`: interleaves the
  * low 16 bits of two bucket ids into one 32-bit curve position
  * (x bits at even positions, y at odd).
  *
  * Z-ordering is THE multi-dimensional data-layout tool at 100 TB: range-
  * partitioning and sorting files by the interleaved value clusters rows
  * that are close in BOTH dimensions into the same files, so parquet
  * min/max pruning skips files for selective predicates on EITHER
  * column — a linear sort gives that for one column only (measured in
  * StorageSpec). Databricks/Iceberg/Hudi all ship the same primitive.
  *
  * A real `Expression` with `doGenCode` (the FnvHash pattern): the
  * interleave inlines into whole-stage codegen as a static call on
  * unboxed longs — on the write path it runs once per row of the full
  * table, exactly where a Scala UDF's boxing would hurt.
  */
case class ZorderBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_bits requires (bigint, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_bits"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZorderBits.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.ZorderBits.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZorderBits =
    copy(left = newLeft, right = newRight)
}

object ZorderBits {

  /** Spread the low 16 bits of v to even bit positions (0,2,4,...,30) —
    * the standard magic-mask Morton spread, 4 shift/mask steps. */
  def spread(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton code of the low 16 bits of x and y: x even bits, y odd. */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** Register `zorder_bits` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("zorder_bits"),
      new ExpressionInfo(classOf[ZorderBits].getName, "zorder_bits"),
      (exprs: Seq[Expression]) => ZorderBits(exprs(0), exprs(1)))
}
