package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** `alpha_tokens` must be BIT-IDENTICAL to the regex pipeline it
  * replaces (`split(regexp_replace(lower(c), strip-ends, ""),
  * "[^a-z]+")`) — including the letterless-input `[""]` quirk every
  * caller's size-guard depends on, and unicode lowering (the fallback
  * path lowers via UTF8String.toLowerCase, exactly Spark's lower()). */
class AlphaTokensSpec extends SparkSpec {
  import spark.implicits._

  private val regexForm =
    "split(regexp_replace(lower(s), '(^[^a-z]+)|([^a-z]+$)', ''), '[^a-z]+')"

  private def both(inputs: Seq[String]): Seq[(String, Seq[String], Seq[String])] =
    inputs.toDF("s")
      .selectExpr("s", "alpha_tokens(s) AS a", s"$regexForm AS b")
      .as[(String, Seq[String], Seq[String])].collect().toSeq

  test("hand-picked edges: empty, letterless, case runs, unicode, combining marks") {
    val cases = Seq(
      "", "   ", "123 456", "!!!", "hello world", "Hello World",
      "ALLCAPS", "MiXeD cAsE rUnS", "a", "Z", "a1b2c3", "--a--b--",
      "İstanbul BAŞKENT", "ß sharp", "naïve café", "ЖЖЖ cyrillic ЖЖЖ",
      "emoji 🎉 party", "tab\tsep\nnewline", "a" * 5000,
      ("Ab1" * 2000) + "end", "é" * 10, "ẋy", "ǅungla")
    both(cases).foreach { case (s, a, b) =>
      assert(a === b, s"input ${s.take(40).toSeq}")
    }
  }

  test("random unicode strings: alpha_tokens == regex pipeline") {
    val charGen = Gen.frequency(
      (8, Gen.alphaChar), (3, Gen.oneOf(' ', '\t', '-', '1', '!', '.')),
      (1, Gen.oneOf('É', 'ß', 'ж', 'İ', 'é', '中', '̇')))
    val strGen = Gen.choose(0, 80).flatMap(n =>
      Gen.listOfN(n, charGen).map(_.mkString))
    val inputs = (0 until 400).map(i =>
      strGen.pureApply(Gen.Parameters.default, Seed(5417L + i)))
    both(inputs).foreach { case (s, a, b) =>
      assert(a === b, s"input ${s.toSeq}")
    }
  }

  test("ws_token_count == trim+split on edges and random whitespace mixes") {
    val wsForm = "CASE WHEN length(regexp_replace(s, '(^\\\\s+)|(\\\\s+$)', '')) = 0 " +
      "THEN 0 ELSE size(split(regexp_replace(s, '(^\\\\s+)|(\\\\s+$)', ''), '\\\\s+')) END"
    val edges = Seq("", " ", "\t\n", "a", " a ", "a b", "  a\t\tb\nc  ",
      "word", " ", "a b", "one two  three\r\nfour", "x" * 1000)
    val charGen = Gen.frequency((5, Gen.alphaChar),
      (3, Gen.oneOf(' ', '\t', '\n', '\r', '\f')), (1, Gen.const(' ')))
    val rand = (0 until 200).map(i =>
      Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
        .pureApply(Gen.Parameters.default, Seed(7207L + i)))
    (edges ++ rand).toDF("s")
      .selectExpr("s", "ws_token_count(s) AS a", s"CAST(($wsForm) AS INT) AS b")
      .as[(String, Int, Int)].collect()
      .foreach { case (s, a, b) => assert(a === b, s"input ${s.toSeq}") }
  }

  test("interpreted eval equals codegen (collect vs whole-stage paths)") {
    // eval(): build the expression directly and call it interpreted
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq("", "Foo BAR", "İi", "123", "a-b")
    cases.foreach { s =>
      val viaEval = TextTokens.alphaTokens(UTF8String.fromString(s))
      val viaDf = Seq(s).toDF("s").selectExpr("alpha_tokens(s)")
        .as[Seq[String]].collect()(0)
      assert((0 until viaEval.numElements())
        .map(i => viaEval.getUTF8String(i).toString) === viaDf, s"input $s")
    }
  }
}
