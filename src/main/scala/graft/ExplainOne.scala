package graft
/** Dump .explain("formatted") for named queries to
  * plans/$SPARK_GRAFT_PLANS_DIR/<q>_<tag>.txt (default plans/r18). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args.drop(1)
    val spark = GraftSession.getOrCreate("graft-explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r18")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val txt = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
