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
