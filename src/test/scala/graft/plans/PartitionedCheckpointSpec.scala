package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PartitionedCheckpoint
import graft.SparkSpec

class PartitionedCheckpointSpec extends SparkSpec {
  import spark.implicits._

  test("rows identical to the plain form, incl. null and negative keys") {
    val df = spark.range(5000).select(
      when(col("id") % 97 === 0, lit(null))
        .otherwise(col("id") % 31 - 15).as("k"),
      col("id").as("v"))
    val ck = PartitionedCheckpoint(df, Seq("k"))
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (Option(r.get(0)).map(_.toString).getOrElse("null"),
        r.getLong(1))).sorted.toSeq
    assert(norm(ck) === norm(df))
  }

  test("join of two partitioned checkpoints on the key: zero Exchange, zero Sort in the final plan") {
    val a = (1L to 50000L).map(i => (i % 999, i)).toDF("k", "va")
    val b = (1L to 30000L).map(i => (i % 777, i * 3)).toDF("k", "vb")
    val j = PartitionedCheckpoint(a, Seq("k"))
      .join(PartitionedCheckpoint(b, Seq("k")), Seq("k"))
      .groupBy($"k").agg(sum($"va" + $"vb").as("s"))
    val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = a.join(b, Seq("k")).groupBy($"k").agg(sum($"va" + $"vb").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
    // final adaptive plan: SMJ rides the claimed layout — the join AND
    // the same-key aggregate add no exchange and no sort
    val lines = j.queryExecution.executedPlan.toString.linesIterator.toArray
    val cut = lines.indexWhere(_.contains("== Initial Plan =="))
    val fin = (if (cut > 0) lines.take(cut) else lines).mkString("\n")
    assert(fin.contains("SortMergeJoin"), fin.take(1500))
    assert(!fin.contains("Exchange"), fin.take(1500))
    assert(!"\\bSort\\b".r.findFirstIn(fin).isDefined, fin.take(1500))
  }

  test("claimed partition count is the requested one and AQE leaves it alone") {
    val df = (1L to 10000L).map(i => (i % 100, i)).toDF("k", "v")
    val ck = PartitionedCheckpoint(df, Seq("k"), sorted = false,
      numPartitions = Some(7))
    assert(ck.rdd.getNumPartitions === 7)
    // same key, same hash bucket: every k lands in exactly one partition
    val spread = ck.select($"k", spark_partition_id().as("p"))
      .groupBy($"k").agg(countDistinct($"p").as("np"))
      .agg(max($"np")).collect().head.getLong(0)
    assert(spread === 1L)
  }
}
