package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `alpha_tokens(str)` — the corpus tokenizer as ONE native expression.
  *
  * Semantics are EXACTLY `split(regexp_replace(lower(c),
  * "(^[^a-z]+)|([^a-z]+$)", ""), "[^a-z]+")` — the tokensCodegen
  * contract every text operator and every DuckDB oracle
  * (`list_filter(string_split_regex(lower(text),'[^a-z]+'), …)`) is
  * built on, including the letterless-input quirk: a string with no
  * [a-z] run yields `[""]` (size 1), never `[]`, because the stripped
  * empty string still splits to one empty token. AlphaTokensSpec pins
  * the equivalence property-style on random unicode inputs, and the
  * full 225-query DuckDB gate re-verifies it corpus-wide.
  *
  * Why native: the regex pipeline runs TWO java.util.regex passes per
  * row (a replace with alternation + a split) and sits under every
  * tokenize-heavy operator — dedup grams, BPE, KN scoring, quality
  * stats. The kernel is a single byte scan: pure-ASCII strings (the
  * overwhelming case) convert A–Z inline and never allocate an
  * intermediate lowered string; any row containing a non-ASCII byte
  * falls back to `UTF8String.toLowerCase` FIRST (bit-identical to
  * Spark's `lower()`, so 'İ' → i+combining-dot etc. behave exactly as
  * the regex pipeline) and then scans the lowered bytes — safe because
  * UTF-8 multibyte sequences never contain 0x61–0x7A bytes. Measured
  * in BASELINE §TokenizeAB.
  */
object TextTokens {

  private val EMPTY_ONLY: ArrayData =
    new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))

  def alphaTokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // copy only when offset/length slice requires
    var i = 0
    val n = bytes.length
    // non-ASCII anywhere → lower the whole string like lower() would,
    // then scan its bytes (a-z runs only; multibyte chars can't alias)
    while (i < n) {
      if ((bytes(i) & 0x80) != 0)
        return scanLowered(s.toLowerCase.getBytes)
      i += 1
    }
    scanAscii(bytes)
  }

  /** ASCII fast path: tokens are maximal [A-Za-z] runs, uppercase
    * converted in place while copying — no intermediate string. */
  private def scanAscii(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    val out = new java.util.ArrayList[Any](8)
    var i = 0
    while (i < n) {
      val b = bytes(i)
      val isLo = b >= 'a' && b <= 'z'
      if (isLo || (b >= 'A' && b <= 'Z')) {
        val start = i
        var j = i
        var anyUpper = false
        while (j < n && {
          val c = bytes(j)
          val lo = c >= 'a' && c <= 'z'
          val up = c >= 'A' && c <= 'Z'
          if (up) anyUpper = true
          lo || up
        }) j += 1
        val tok = java.util.Arrays.copyOfRange(bytes, start, j)
        if (anyUpper) {
          var k = 0
          while (k < tok.length) {
            if (tok(k) >= 'A' && tok(k) <= 'Z') tok(k) = (tok(k) + 32).toByte
            k += 1
          }
        }
        out.add(UTF8String.fromBytes(tok))
        i = j
      } else i += 1
    }
    if (out.isEmpty) EMPTY_ONLY
    else new GenericArrayData(out.toArray)
  }

  /** Post-lowercase path: tokens are maximal [a-z] runs of the already
    * lowered byte stream (uppercase can't survive toLowerCase). */
  private def scanLowered(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    val out = new java.util.ArrayList[Any](8)
    var i = 0
    while (i < n) {
      if (bytes(i) >= 'a' && bytes(i) <= 'z') {
        val start = i
        while (i < n && bytes(i) >= 'a' && bytes(i) <= 'z') i += 1
        out.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i)))
      } else i += 1
    }
    if (out.isEmpty) EMPTY_ONLY
    else new GenericArrayData(out.toArray)
  }

  /** Whitespace token count: maximal runs of non-[ \t\n\x0B\f\r]
    * bytes — Java's ASCII `\s` class INCLUDING vertical tab \x0B
    * (multibyte UTF-8 never aliases single-byte separators, so the
    * byte scan is exact); "" and all-whitespace → 0. Equals
    * `when(length(trim)==0, 0).otherwise(size(split(trim, "\\s+")))`
    * without allocating the split array — WsTokenCountSpec pins the
    * differential. Cross-engine note: DuckDB's RE2 `\s` EXCLUDES \x0B,
    * so an oracle built on regexp-splitting by '\s+' would diverge on
    * text containing a vertical tab; the kernel stays faithful to the
    * Spark/Java semantics of the regex form it replaced (no gated
    * corpus contains \x0B — the testdata generator emits none). */
  def wsTokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
        b == '\f' || b == '\r'
      if (!isWs && !inTok) { n += 1; inTok = true }
      else if (isWs) inTok = false
      i += 1
    }
    n
  }

  case class WsTokenCount(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"ws_token_count requires string, got ${child.dataType.catalogString}")
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def prettyName: String = "ws_token_count"

    override protected def nullSafeEval(s: Any): Any =
      wsTokenCount(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextTokens.wsTokenCount($c)")

    override protected def withNewChildInternal(c: Expression): WsTokenCount =
      copy(child = c)
  }

  case class AlphaTokens(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"alpha_tokens requires string, got ${child.dataType.catalogString}")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "alpha_tokens"

    override protected def nullSafeEval(s: Any): Any =
      alphaTokens(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextTokens.alphaTokens($c)")

    override protected def withNewChildInternal(c: Expression): AlphaTokens =
      copy(child = c)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("alpha_tokens"),
      new ExpressionInfo(classOf[AlphaTokens].getName, "alpha_tokens"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"alpha_tokens takes 1 argument, got ${exprs.length}")
        AlphaTokens(exprs.head)
      })
    reg.registerFunction(
      FunctionIdentifier("ws_token_count"),
      new ExpressionInfo(classOf[WsTokenCount].getName, "ws_token_count"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"ws_token_count takes 1 argument, got ${exprs.length}")
        WsTokenCount(exprs.head)
      })
  }
}
