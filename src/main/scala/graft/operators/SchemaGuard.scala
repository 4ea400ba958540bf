package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Schema-drift guard for the driver-generated testdata.
  *
  * Round 8 lost its green board to a silent upstream regeneration that moved
  * `events.ts` from parquet TIMESTAMP(NANOS) to timestamp[us] — 19 queries
  * crashed with an opaque analysis error. This guard turns the next regen
  * into a *named* diff: it loads every table through the same `Tables`
  * loaders the operators use and compares the resulting schema (so it sees
  * post-normalization types, e.g. `events.ts` always as TIMESTAMP) against
  * the column name/type contract the operator suite assumes.
  *
  * `check` returns one readable message per drifted/missing/extra column;
  * empty means the contract holds. Verify fails fast on drift so the
  * correctness gate reports the real cause instead of 19 downstream crashes.
  */
object SchemaGuard {

  /** name -> expected (columnName -> dataType), in no particular order;
    * extra columns are reported too (operators select by name, but a new
    * column changes `select(*)` surfaces and is worth knowing about). */
  val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // post-loader contract: Tables.events normalizes ts to session-TZ
    // TIMESTAMP regardless of the physical generation (nanos-long or µs-NTZ)
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  private def load(spark: SparkSession, dir: String, name: String) =
    name match {
      case "events" => Tables.events(spark, dir)
      case n        => Tables.t(spark, dir, n)
    }

  /** Empty = contract holds. Otherwise one message per drift, e.g.
    * "events.ts: expected TIMESTAMP, loaded TIMESTAMP_NTZ" or
    * "orders: missing column o_orderdate". */
  def check(spark: SparkSession, dir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val loadedTry = scala.util.Try(load(spark, dir, table).schema)
      loadedTry match {
        case scala.util.Failure(e) =>
          Seq(s"$table: failed to load from $dir — ${e.getMessage.linesIterator.next()}")
        case scala.util.Success(schema) =>
          val loaded = schema.fields.map(f => f.name -> f.dataType).toMap
          val expectedNames = cols.map(_._1).toSet
          val missing = cols.collect {
            case (n, _) if !loaded.contains(n) => s"$table: missing column $n"
          }
          val drifted = cols.collect {
            case (n, dt) if loaded.contains(n) && loaded(n) != dt =>
              s"$table.$n: expected ${dt.sql}, loaded ${loaded(n).sql}"
          }
          val extra = schema.fieldNames.collect {
            case n if !expectedNames.contains(n) => s"$table: unexpected extra column $n"
          }
          missing ++ drifted ++ extra
      }
    }

  /** Throws with every drift listed, for use at the top of Verify/Bench. */
  def require(spark: SparkSession, dir: String): Unit = {
    val drift = check(spark, dir)
    if (drift.nonEmpty)
      throw new IllegalStateException(
        s"testdata schema drift detected under $dir:\n  " +
          drift.mkString("\n  ") +
          "\n(operator assumptions live in SchemaGuard.expected — " +
          "if the upstream generator legitimately changed, update them " +
          "and every consumer together)")
  }
}
