package graft.mr

import graft.GraftSession

/** CLI entry point — the analog of the reference's
  * `mrcoordinator pg-*.txt` + `mrworker wc.so` pair
  * (src/main/mrcoordinator.go, src/main/mrworker.go): pick a named
  * workload, run the full MR job, write `"key value"` text per reduce
  * partition. Where the reference dlopens a plugin .so (F14,
  * src/main/mrworker.go:63-80), we look the (mapf, reducef) pair up in a
  * registry — same indirection, no dynamic loading needed on the JVM.
  *
  * Usage: runMain graft.mr.MRMain <workload> <inputGlob> <outDir> [nReduce]
  */
object MRMain {
  val registry: Map[String, ((String, String) => Seq[KV], (String, Iterator[String]) => String)] =
    Map(
      "wc"      -> ((Workloads.wcMap, Workloads.wcReduce)),
      "indexer" -> ((Workloads.indexerMap, Workloads.indexerReduce)),
      "nocrash" -> ((Workloads.probeMap, Workloads.sortJoinReduce)),
    )

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        s"usage: MRMain <${registry.keys.toSeq.sorted.mkString("|")}> <inputGlob> <outDir> [nReduce]")
      sys.exit(2)
    }
    // sbt's `runMain` passes quoting through literally (a glob written
    // '...' inside the sbt command string arrives WITH the quotes and
    // matches nothing) — strip symmetric surrounding quotes defensively
    def unquote(s: String): String =
      if (s.length >= 2 && (s.head == '\'' || s.head == '"') && s.last == s.head)
        s.substring(1, s.length - 1)
      else s
    val Array(name, rawInput, out) = args.take(3)
    val input = unquote(rawInput)
    val nReduce = if (args.length > 3) args(3).toInt else 10
    val (mapf, reducef) = registry.getOrElse(name, {
      System.err.println(s"unknown workload '$name'; have: ${registry.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
      throw new IllegalStateException
    })
    val spark = GraftSession.getOrCreate(s"mr-$name")
    MRJob.run(spark, input, mapf, reducef, nReduce, out)
    spark.stop()
  }
}
