package graft.mr

import org.apache.spark.sql.{Encoders, SparkSession, functions}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's Reduce surface as REGISTERED Spark UDAFs.
  *
  * SURVEY §2.2: the reference engine is a second-order UDF harness —
  * Map is a UDTF and Reduce a UDAF over a group's values (wc's count
  * reduce: src/mrapps/wc.go:41-44; the sort-join reduce shared by
  * crash/nocrash/timing apps: src/mrapps/crash.go:45-55). `MRJob`
  * realizes those semantics through the facade; this is the reusable
  * SQL-registration form the survey maps them to, so a reference
  * workload's reduce can sit directly in a `GROUP BY` query:
  *
  * {{{
  *   ReduceUdaf.register(spark)
  *   spark.sql("SELECT word, wc_reduce(v) AS n FROM toks GROUP BY word")
  * }}}
  */
object ReduceUdaf {

  /** wc reduce: occurrence count, emitted as a string like the
    * reference (`strconv.Itoa(len(values))`). Merge-associative, so
    * Spark runs it partial/final with map-side combine — the upgrade
    * the reference's reduce-side-only evaluation never gets. */
  object WcReduce extends Aggregator[String, Long, String] {
    def zero: Long = 0L
    def reduce(b: Long, v: String): Long = b + 1L
    def merge(a: Long, b: Long): Long = a + b
    def finish(b: Long): String = b.toString
    def bufferEncoder = Encoders.scalaLong
    def outputEncoder = Encoders.STRING
  }

  /** crash/nocrash reduce: sort the group's values, join with spaces
    * (sorted for determinism under any arrival order — exactly why the
    * reference sorts too). The buffer materializes one GROUP's values,
    * the same per-key bound as the reference's in-memory `[]string`
    * (F7) — never a partition or corpus. */
  object SortJoinReduce extends Aggregator[String, List[String], String] {
    def zero: List[String] = Nil
    def reduce(b: List[String], v: String): List[String] = v :: b
    def merge(a: List[String], b: List[String]): List[String] = a ::: b
    def finish(b: List[String]): String = b.sorted.mkString(" ")
    def bufferEncoder = Encoders.kryo[List[String]]
    def outputEncoder = Encoders.STRING
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("wc_reduce", functions.udaf(WcReduce, Encoders.STRING))
    spark.udf.register("sortjoin_reduce",
      functions.udaf(SortJoinReduce, Encoders.STRING))
  }
}
