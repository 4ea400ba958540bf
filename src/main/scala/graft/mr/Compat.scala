package graft.mr

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}

/** Byte-format compatibility with the reference's on-disk artifacts:
  *   - intermediate shuffle files: NDJSON `{"Key":"…","Value":"…"}`
  *     (reference: src/mr/worker.go:146-152, committed examples
  *     `src/main/mr-out-<m>-<r>.json`);
  *   - whole-file DataFrame source: the SURVEY §1.2 DataFrame-native
  *     alternative to `wholeTextFiles`.
  *
  * These exist so a reference deployment can hand its files to this
  * engine mid-pipeline: CompatSpec reduces the reference's own committed
  * intermediate files and reproduces its final golden output.
  */
object Compat {

  case class RefKV(Key: String, Value: String)

  /** Read reference-format NDJSON intermediate files. */
  def readIntermediate(spark: SparkSession, glob: String): Dataset[RefKV] = {
    import spark.implicits._
    spark.read.schema("Key STRING, Value STRING").json(glob).as[RefKV]
  }

  /** Write a pair RDD in the reference's intermediate NDJSON format. */
  def writeIntermediate(spark: SparkSession, pairs: RDD[(String, String)],
                        outDir: String): Unit = {
    import spark.implicits._
    pairs.toDF("Key", "Value").write.mode("overwrite").json(outDir)
  }

  /** Whole-file scan as a DataFrame (filename, contents) — the
    * `spark.read.option("wholetext", true)` + `input_file_name()` form of
    * F1 (SURVEY §1.2); same records as `sc.wholeTextFiles`. */
  def wholeTextDF(spark: SparkSession, glob: String): Dataset[(String, String)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.option("wholetext", "true").text(glob)
      .select(input_file_name().as("filename"), col("value").as("contents"))
      .as[(String, String)]
  }
}
