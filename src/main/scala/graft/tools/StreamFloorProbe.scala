package graft.tools

/** q66 cost attribution (r12 verdict item 6): how much of the
  * session-stream bench number is per-run streaming machinery
  * (query/state-store/microbatch setup — fixed) vs per-event work
  * (scales with the corpus)? Runs q66 `iters` times in-process at each
  * SF and prints every run: the sf0.001 number IS the machinery floor
  * (≈60 events — state work is nil), and the run-to-run deltas at one
  * SF show what JVM warmth does vs what is truly per-run.
  *
  * Usage: runMain graft.tools.StreamFloorProbe [sfDirs...]
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1",
        "/tmp/graft_sf1", "/tmp/graft_sf10")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "3").toInt
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("q66_stream_sessionize")
    dirs.foreach { d =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val rows = graft.Tables.events(spark, d).count()
      println(f"[q66floor] $d%-28s events=$rows%9d runs=" +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]") +
        f" min=${times.min}%.2f")
    }
    spark.stop()
  }
}
