package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Source/sink format breadth: CSV and JSON roundtrips preserve the
  * relational data exactly (schema-aware read back, no silent type
  * coercion losses). */
class FormatsSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("CSV roundtrip of nation preserves all rows and values") {
    val dir = Files.createTempDirectory("fmt").resolve("nation_csv")
    val src = Tables.nation(spark, sf("sf0.001"))
    src.write.option("header", "true").mode("overwrite").csv(dir.toString)
    val back = spark.read.option("header", "true").schema(src.schema).csv(dir.toString)
    assert(canon(back) === canon(src))
  }

  test("JSON roundtrip of supplier preserves all rows and values") {
    val dir = Files.createTempDirectory("fmt").resolve("supplier_json")
    val src = Tables.supplier(spark, sf("sf0.001"))
    src.write.mode("overwrite").json(dir.toString)
    val back = spark.read.schema(src.schema).json(dir.toString)
    assert(canon(back) === canon(src))
  }

  test("ORC roundtrip of orders preserves all rows and values") {
    val dir = Files.createTempDirectory("fmt").resolve("orders_orc")
    val src = Tables.orders(spark, sf("sf0.001"))
    src.write.mode("overwrite").orc(dir.toString)
    val back = spark.read.orc(dir.toString)
    assert(canon(back) === canon(src))
  }

  test("text sink roundtrip: partitioned key-value lines read back losslessly") {
    // the MR facade's final-output format (SURVEY F8) through the generic
    // text source/sink path
    val dir = Files.createTempDirectory("fmt").resolve("kv_text")
    val src = Tables.nation(spark, sf("sf0.001"))
      .select(concat_ws(" ", col("n_name"), col("n_nationkey")).as("value"))
    src.write.mode("overwrite").text(dir.toString)
    val back = spark.read.text(dir.toString)
    assert(canon(back) === canon(src))
  }

  test("parquet roundtrip preserves the events timestamp conversion exactly") {
    val dir = Files.createTempDirectory("fmt").resolve("events_pq")
    val src = Tables.events(spark, sf("sf0.001"))
    src.write.mode("overwrite").parquet(dir.toString)
    val back = spark.read.parquet(dir.toString)
    assert(canon(back) === canon(src))
    // written as micros: readable without the nanosAsLong escape hatch
    assert(back.schema("ts").dataType.typeName.startsWith("timestamp"))
  }

  test("malformed JSON: permissive quarantine, dropmalformed, failfast") {
    // at 100 TB a bad shard must never kill the ingest job: PERMISSIVE
    // quarantines broken lines into _corrupt_record for a side-channel
    // audit, DROPMALFORMED keeps only clean rows, FAILFAST is the
    // strict-contract mode that surfaces corruption loudly
    import spark.implicits._
    val dir = Files.createTempDirectory("fmt").resolve("bad_json")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("part-0.json"),
      """{"id": 1, "name": "ok-one"}
        |{"id": 2, "name": "ok-two"}
        |{"id": 3, "name": BROKEN not json
        |{"id": 4, "name": "ok-three"}
        |""".stripMargin)
    val schema = "id BIGINT, name STRING, _corrupt_record STRING"

    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString).cache()
    try {
      assert(permissive.count() === 4)
      assert(permissive.filter(col("_corrupt_record").isNotNull).count() === 1)
      assert(permissive.filter(col("_corrupt_record").isNull)
        .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 4L))
    } finally permissive.unpersist()

    val dropped = spark.read.schema("id BIGINT, name STRING")
      .option("mode", "DROPMALFORMED").json(dir.toString)
    assert(dropped.count() === 3)

    val strict = spark.read.schema("id BIGINT, name STRING")
      .option("mode", "FAILFAST").json(dir.toString)
    val e = intercept[org.apache.spark.SparkException] { strict.count() }
    assert(Option(e.getMessage).exists(m =>
      m.contains("FAILFAST") || m.contains("Malformed") ||
        Option(e.getCause).exists(c =>
          String.valueOf(c.getMessage).contains("Malformed"))))
  }
}
