package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_bands(tokens, bands, rowsPerBand)`: the ENTIRE
  * tokens → word-trigram shingles → k=bands×rowsPerBand minhash →
  * banded bucket keys pipeline as ONE per-row codegen'd expression
  * returning `array<long>` (one bucket key per band).
  *
  * Why it exists: the batch signature path (Dedup.minhashSigs) is an
  * explode + k min-AGGREGATES — the right shape for a batch corpus, but
  * an aggregation cannot run per-row inside arbitrary pipelines, and a
  * STREAM cannot interpose an aggregation before keyed state. This
  * expression computes the same construction (own hash family) in a
  * single primitive loop with no shuffle at all, which is what streaming
  * near-dup dedup keys its state on.
  */
object MinhashBands {

  /** SplitMix64 finalizer (same mixer as VecMath). */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, continued from a running state so a
    * trigram hashes as one byte stream with separators. A null token
    * (possible in arbitrary user array columns) hashes like the empty
    * string instead of NPE-ing the task. */
  @inline private def fnv64(state: Long, s: UTF8String): Long = {
    var h = state
    if (s != null) {
      val bytes = s.getBytes
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL)
        h *= 0x100000001b3L
        i += 1
      }
    }
    h ^ 0x1fL // separator so ("ab","c") != ("a","bc")
  }
  private val FnvInit = 0xcbf29ce484222325L

  def bandKeys(toks: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val k = bands * rowsPerBand
    val mins = Array.fill(k)(Long.MaxValue)
    val n = toks.numElements()

    @inline def vote(g: Long): Unit = {
      var j = 0
      while (j < k) {
        val h = mix(g ^ (j.toLong * 0x9e3779b97f4a7c15L))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
    }

    if (n >= 3) {
      var i = 0
      while (i <= n - 3) {
        var g = FnvInit
        g = fnv64(g, toks.getUTF8String(i))
        g = fnv64(g, toks.getUTF8String(i + 1))
        g = fnv64(g, toks.getUTF8String(i + 2))
        vote(g)
        i += 1
      }
    } else {
      // short doc: the whole token string is the single shingle,
      // mirroring Dedup.gramHashRows' short-doc fallback
      var g = FnvInit
      var i = 0
      while (i < n) { g = fnv64(g, toks.getUTF8String(i)); i += 1 }
      vote(g)
    }

    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < rowsPerBand) {
        acc = mix(acc ^ mins(b * rowsPerBand + r))
        r += 1
      }
      keys(b) = acc
      b += 1
    }
    ArrayData.toArrayData(keys)
  }

  case class Expr(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
      case ArrayType(StringType, _)
        if second.dataType == IntegerType && third.dataType == IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires (array<string>, int, int), got " +
          s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString})")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_bands"

    override protected def nullSafeEval(t: Any, b: Any, r: Any): Any =
      bandKeys(t.asInstanceOf[ArrayData], b.asInstanceOf[Int], r.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (t, b, r) => s"graft.functions.MinhashBands.bandKeys($t, $b, $r)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expr =
      copy(first = f, second = s, third = t)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[Expr].getName, "minhash_bands"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"minhash_bands takes 3 arguments (tokens, bands, rowsPerBand), got ${exprs.length}")
        Expr(exprs(0), exprs(1), exprs(2))
      })
}
