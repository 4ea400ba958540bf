package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (JVM-wide; suites in
  * the default single-JVM forked test run reuse it). */
object SharedSpark {
  lazy val spark: SparkSession = {
    // local[8,4]: 8 threads, maxFailures=4 so fault-injection suites can
    // exercise task retry (reference analog: 10 s watchdog reassignment,
    // src/mr/coordinator.go:34-47).
    val s = GraftSession.builder("graft-test")
      .master("local[8,4]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.FnvHash.register(s)
    graft.functions.VecMath.register(s)
    graft.functions.MinhashBands.register(s)
    graft.functions.ZorderBits.register(s)
    graft.functions.BloomFilterFns.register(s)
    s
  }
}

/** Marks long-running soak/repeat tests. They RUN by default (the suite
  * must be green with them on); exclude for a quick pass with
  * `testOnly -- -l graft.Slow`. */
object Slow extends org.scalatest.Tag("graft.Slow")

abstract class SparkSpec extends AnyFunSuite {
  // stable identifier so subclasses can `import spark.implicits._`
  lazy val spark: SparkSession = SharedSpark.spark
  def sf(dir: String): String = s"/root/testdata/$dir"

  /** Run `body` with the RocksDB state store provider — a
    * transformWithState requirement (v2 operators refuse the default
    * HDFS-backed provider). Restores the previous provider after. */
  def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally old match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
