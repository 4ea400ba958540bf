package graft.functions

import scala.util.Random

import graft.SparkSpec

class VecMathSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches a scalar reference on random vectors and stays in codegen") {
    val rnd = new Random(3)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian()))
    }
    val got = rows.toDF("id", "a", "b")
      .selectExpr("id", "vec_dot(a, b) AS d")
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, a, b) =>
      val want = a.zip(b).map { case (x, y) => x * y }.sum
      assert(math.abs(got(id) - want) < 1e-9, s"id=$id")
    }
    val plan = spark.range(10)
      .selectExpr("array(CAST(id AS DOUBLE)) AS a")
      .selectExpr("vec_dot(a, a) AS d")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.trim.startsWith("*(") && l.contains("vec_dot")), plan)
  }

  test("vec_dot uses the common prefix length and null inputs stay null") {
    val out = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 20.0)))
      .toDF("a", "b").selectExpr("vec_dot(a, b) AS d").as[Double].head()
    assert(out === 50.0) // 1*10 + 2*20; third element ignored
    val n = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b").selectExpr("vec_dot(a, b) AS d")
      .collect().head.isNullAt(0)
    assert(n)
  }

  test("sign_buckets: deterministic, table count respected, near-identical vectors collide") {
    val rnd = new Random(9)
    val base = Array.fill(32)(rnd.nextGaussian())
    val near = base.map(_ + 1e-9)
    val far = Array.fill(32)(rnd.nextGaussian())
    val out = Seq((1L, base), (2L, near), (3L, far), (4L, base))
      .toDF("id", "e")
      .selectExpr("id", "sign_buckets(e, 4, 16) AS b")
      .as[(Long, Seq[Long])].collect().toMap
    assert(out.values.forall(_.size === 4))
    assert(out(1L) === out(4L)) // identical input → identical buckets
    assert(out(1L) === out(2L)) // epsilon perturbation keeps every sign
    assert(out(1L) !== out(3L)) // unrelated vector lands elsewhere
  }

  test("minhash_bands: band count, token-content sensitivity, near-dup band collisions") {
    val orig = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = orig.replace("dog", "cat")
    val other = "entirely different content about galaxies and the telescopes that watch them"
    val out = Seq((1L, orig), (2L, near), (3L, other), (4L, orig))
      .toDF("id", "text")
      .selectExpr("id",
        "minhash_bands(split(lower(text), '[^a-z]+'), 16, 4) AS b")
      .as[(Long, Seq[Long])].collect().toMap
    assert(out.values.forall(_.size === 16))
    assert(out(1L) === out(4L)) // deterministic
    val sharedNear = out(1L).zip(out(2L)).count { case (x, y) => x == y }
    val sharedOther = out(1L).zip(out(3L)).count { case (x, y) => x == y }
    assert(sharedNear >= 1, s"near-dup shares no band ($sharedNear)")
    assert(sharedOther === 0, s"unrelated docs share $sharedOther bands")
  }

  test("minhash_bands short-doc fallback: under-3-token docs get stable keys") {
    val out = Seq((1L, "hi"), (2L, "hi"), (3L, "yo"))
      .toDF("id", "text")
      .selectExpr("id", "minhash_bands(split(text, ' '), 8, 2) AS b")
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) === out(2L))
    assert(out(1L) !== out(3L))
    assert(out.values.forall(_.size === 8))
  }
}
