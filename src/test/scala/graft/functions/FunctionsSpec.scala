package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.mr.MRJob

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("fnv_ihash expression equals the MR facade's ihash on arbitrary strings") {
    FnvHash.register(spark)
    val keys = (0 until 300).map(i =>
      Gen.asciiPrintableStr.pureApply(Gen.Parameters.default, Seed(5000L + i))) ++
      Seq("", "xyzzy", "café", "日本語")
    val got = keys.toDF("k")
      .selectExpr("k", "fnv_ihash(k) AS h")
      .as[(String, Int)].collect().toMap
    keys.foreach(k => assert(got(k) === MRJob.ihash(k), s"key=$k"))
  }

  test("fnv_ihash stays inside whole-stage codegen") {
    FnvHash.register(spark)
    // (a LocalTableScan of literals bypasses codegen; range does not)
    val df = spark.range(100)
      .selectExpr("fnv_ihash(CAST(id AS STRING)) AS h")
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside WholeStageCodegen stage n
    assert(plan.linesIterator.exists(l => l.trim.startsWith("*(") && l.contains("fnv_ihash")), plan)
    assert(df.selectExpr("sum(h)").as[Long].head() > 0)
  }

  test("zorder_bits interleaves bit-exactly and stays inside codegen") {
    ZorderBits.register(spark)
    // closed-form points: x fills even bit positions, y odd
    assert(ZorderBits.interleave(1L, 0L) === 1L)
    assert(ZorderBits.interleave(0L, 1L) === 2L)
    assert(ZorderBits.interleave(3L, 5L) === 39L)     // 0b100111
    assert(ZorderBits.interleave(0xffffL, 0L) === 0x55555555L)
    assert(ZorderBits.interleave(0L, 0xffffL) === 0xaaaaaaaaL)
    // reference bit loop over random points (incl. >16-bit truncation)
    val rnd = new scala.util.Random(11)
    def slow(x: Long, y: Long): Long =
      (0 until 16).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    (1 to 200).foreach { _ =>
      val x = rnd.nextLong() & 0x3ffffL; val y = rnd.nextLong() & 0x3ffffL
      assert(ZorderBits.interleave(x, y) === slow(x & 0xffffL, y & 0xffffL))
    }
    // expression path == kernel, inside whole-stage codegen
    val df = spark.range(500)
      .selectExpr("id", "zorder_bits(id, id * 7) AS z")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("zorder_bits")), plan)
    df.as[(Long, Long)].collect().foreach { case (id, z) =>
      assert(z === ZorderBits.interleave(id, id * 7))
    }
  }

  test("fnv_ihash can drive a DataFrame repartition matching the RDD partitioner") {
    FnvHash.register(spark)
    val n = 7
    val keys = (0 until 200).map(i => s"key$i")
    val buckets = keys.toDF("k")
      .selectExpr("k", s"pmod(fnv_ihash(k), $n) AS b")
      .as[(String, Int)].collect().toMap
    keys.foreach { k =>
      assert(buckets(k) === new graft.mr.FnvPartitioner(n).getPartition(k))
    }
  }
}
