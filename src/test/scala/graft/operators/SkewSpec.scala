package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** 100k fact rows where one key owns 90% of the data, plus a small dim. */
  private def skewed() = {
    val fact = spark.range(100000)
      .select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"),
        col("id").as("payload"))
    val dim = (0L until 50L).map(i => (i, s"name$i")).toDF("k", "name")
    (fact, dim)
  }

  test("salted join is row-identical to the plain join under skew") {
    val (fact, dim) = skewed()
    val plain = fact.join(dim, Seq("k")).groupBy(col("k"), col("name"))
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      .as[(Long, String, Long, Long)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 16)
      .groupBy(col("k"), col("name"))
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("salting spreads the hot key across reducers") {
    val (fact, _) = skewed()
    val perPartition = fact
      .withColumn("__salt",
        pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(16L)).cast("int"))
      .repartition(16, col("k"), col("__salt"))
      .mapPartitions(it => Iterator(it.count(_.getLong(0) == 7L)))
      .collect()
    val hot = perPartition.filter(_ > 0)
    // the ~90k hot-key rows must land on many partitions, none dominant
    assert(hot.length >= 8, s"hot key on only ${hot.length} partitions")
    assert(hot.max < 90000 / 4, s"one partition still holds ${hot.max} hot rows")
  }

  test("salted two-phase count equals plain count under skew") {
    val (fact, _) = skewed()
    val plain = fact.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    val salted = Skew.saltedCount(fact, "k", 16)
      .as[(Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    val (fact, dim) = skewed()
    // force a sort-merge join and make the skew thresholds tiny so the
    // local dataset trips them
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val joined = fact.join(dim.hint("shuffle_merge"), Seq("k"))
      joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("skew=true"), plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
