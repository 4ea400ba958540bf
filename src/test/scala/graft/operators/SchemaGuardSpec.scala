package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The guard must (a) pass on the real testdata at sf0.001 and (b) name the
  * drifted column when pointed at deliberately perturbed data — that second
  * property is what makes the next silent regen a 2-second diagnosis instead
  * of 19 opaque query crashes (round-8 postmortem). */
class SchemaGuardSpec extends SparkSpec {

  test("sf0.001 testdata matches the operator schema contract") {
    val drift = SchemaGuard.check(spark, sf("sf0.001"))
    assert(drift.isEmpty, s"unexpected drift:\n  ${drift.mkString("\n  ")}")
  }

  test("perturbed schema is reported as a named diff") {
    val dir = java.nio.file.Files.createTempDirectory("schemaguard").toString
    // copy every table unchanged except: nation loses a column, events.ts
    // becomes a string, documents gains an extra column
    SchemaGuard.expected.keys.foreach { t =>
      val src = spark.read.parquet(s"${sf("sf0.001")}/$t.parquet")
      val out = t match {
        case "nation"    => src.drop("n_regionkey")
        case "events"    => src.withColumn("ts", col("ts").cast("string"))
        case "documents" => src.withColumn("bonus", lit(1))
        case _           => src
      }
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val drift = SchemaGuard.check(spark, dir)
    assert(drift.exists(_.contains("nation: missing column n_regionkey")), drift)
    // a ts perturbation trips Tables.events' own dtype branch — the guard
    // surfaces that loader failure as a named drift line for the table
    assert(drift.exists(m => m.startsWith("events:") &&
      m.contains("events.ts loaded as unexpected type StringType")), drift)
    assert(drift.exists(_.contains("documents: unexpected extra column bonus")), drift)
    // nothing else drifted
    assert(drift.size == 3, drift)
    val ex = intercept[IllegalStateException](SchemaGuard.require(spark, dir))
    assert(ex.getMessage.contains("n_regionkey"))
  }

  test("events loader normalizes both physical ts generations to TIMESTAMP") {
    import org.apache.spark.sql.types.TimestampType
    // current generation (timestamp[us] → NTZ → cast): loads and is TIMESTAMP
    val cur = Tables.events(spark, sf("sf0.001"))
    assert(cur.schema("ts").dataType == TimestampType)
    // legacy generation analog: raw long nanos column (what nanosAsLong
    // surfaces for TIMESTAMP(NANOS) files) round-trips through the same
    // conversion the loader applies
    val dir = java.nio.file.Files.createTempDirectory("eventsgen").toString
    cur.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val legacy = Tables.events(spark, dir)
    assert(legacy.schema("ts").dataType == TimestampType)
    val a = cur.orderBy("event_id").select("ts").limit(100).collect().toSeq
    val b = legacy.orderBy("event_id").select("ts").limit(100).collect().toSeq
    assert(a == b, "legacy long-nanos path must convert to identical timestamps")
  }
}
