package graft.mr

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Format-compat differentials against the reference's committed run
  * artifacts: our reduce phase over ITS intermediate shuffle files must
  * reproduce ITS final output. */
class CompatSpec extends SparkSpec {
  private val refMain = "/root/reference/src/main"

  test("our reduce phase over the reference's committed intermediate files reproduces its golden output") {
    // The reference run left 80 NDJSON shuffle files mr-out-<m>-<r>.json
    // (8 maps x 10 reduces). For each reduce partition r: decode, sort,
    // group-scan, reduce — exactly PerformOp's reduce path
    // (src/mr/worker.go:161-216) — and diff against golden mr-out-<r>.
    (0 until 10).foreach { r =>
      val kvs = Compat.readIntermediate(spark, s"$refMain/mr-out-*-$r.json")
      val pairs = kvs.rdd.map(kv => (kv.Key, kv.Value)).repartition(1)
        .sortBy(identity)
      val reduced = pairs.mapPartitions(it =>
        MRJob.groupScan(it, Workloads.wcReduce)).collect()
        .map { case (k, v) => s"$k $v" }.sorted.toSeq
      val golden = Files.readAllLines(Paths.get(s"$refMain/mr-out-$r")).asScala
        .sorted.toSeq
      assert(reduced === golden, s"reduce partition $r")
    }
  }

  test("intermediate NDJSON roundtrip preserves records byte-compatibly") {
    val dir = Files.createTempDirectory("mr-compat").resolve("ndjson")
    val pairs = spark.sparkContext.parallelize(
      Seq(("eBook", "1"), ("the", "2"), ("with \"quotes\"", "x"), ("", "empty")), 2)
    Compat.writeIntermediate(spark, pairs, dir.toString)
    val back = Compat.readIntermediate(spark, s"$dir/*.json")
      .collect().map(kv => (kv.Key, kv.Value)).toSet
    assert(back === Set(("eBook", "1"), ("the", "2"), ("with \"quotes\"", "x"), ("", "empty")))
    // spot-check the wire format matches the reference's shape
    val line = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".json"))
      .flatMap(p => Files.readAllLines(p).asScala).find(_.contains("eBook"))
    assert(line.exists(l => l.startsWith("{\"Key\":\"eBook\",\"Value\":\"1\"")), line)
  }

  test("whole-text DataFrame source equals wholeTextFiles records") {
    val viaDF = Compat.wholeTextDF(spark, s"$refMain/pg-being_ernest.txt").collect()
    val viaRDD = spark.sparkContext
      .wholeTextFiles(s"$refMain/pg-being_ernest.txt").collect()
    assert(viaDF.length === 1 && viaRDD.length === 1)
    assert(Workloads.baseName(viaDF.head._1) === "pg-being_ernest.txt")
    assert(viaDF.head._2 === viaRDD.head._2)
  }
}
