package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Tuned for the harness environment (single JVM `local[N]`) but every
  * setting below is what we would ship on a real multi-executor cluster:
  *   - AQE on (runtime re-plan: coalesce shuffle partitions, skew-join split,
  *     dynamic broadcast conversion) — the main scale lever at 100 TB.
  *   - shuffle.partitions sized to the parallelism, not the 200 default.
  *   - UTC session timezone so results are oracle-comparable.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      // events.parquet ships TIMESTAMP(NANOS); read as long, convert in
      // Tables.events (see comment there).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.FnvHash.register(spark)
    graft.functions.VecMath.register(spark)
    graft.functions.MinhashBands.register(spark)
    spark
  }
}
