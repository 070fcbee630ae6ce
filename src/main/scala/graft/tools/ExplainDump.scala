package graft.tools

/** Write the POST-EXECUTION `.explain("formatted")` plan of each named
  * registered query to `<outDir>/<query>.txt` — the committed
  * before/after plan evidence for optimization rounds
  * (plans/r{N}/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <q1> [q2 ...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // execute so AQE finalizes THIS QueryExecution's plan (the
      // formatted output then carries the final stages + codegen ids)
      df.queryExecution.toRdd.count()
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explaindump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
