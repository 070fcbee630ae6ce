package graft.tools

/** Executes a registered query once and prints its FINAL (post-AQE)
  * physical plan — for diagnosing runtime join-strategy flips that the
  * pre-execution explain can't show.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q38_minhash_pairs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    df.collect()
    println(f"PLANDUMP $name ran in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Aggregate") || l.contains("InMemory") || l.contains("Scan "))
      .map(_.take(140)).mkString("\n"))
    spark.stop()
  }
}
