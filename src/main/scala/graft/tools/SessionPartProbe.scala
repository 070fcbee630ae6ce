package graft.tools

import org.apache.spark.sql.functions._

/** q66 state-partition sweep at one SF: rebuilds the q66 stream (events
  * + far-future sentinel → session_window → memory sink) under several
  * shuffle-partition settings, bypassing the registered query's
  * defaultParallelism cap — does the second microbatch's state-reload
  * stage (the low-utilization tail at sf10) parallelize with more,
  * smaller state partitions, or does per-partition overhead win?
  *
  * Usage: runMain graft.tools.SessionPartProbe [sfDir] [parts...]
  */
object SessionPartProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf10")
    val parts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(16, 32, 64, 128)
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "2").toInt
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val sentinelDir =
      java.nio.file.Files.createTempDirectory("q66probe").toString
    spark.range(1)
      .select(lit(-1L).as("event_id"),
        lit("2100-01-01 00:00:00").cast("timestamp").as("ts"),
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0).as("value"))
      .write.mode("overwrite").parquet(sentinelDir)
    parts.foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      val times = (1 to iters).map { _ =>
        val ev = graft.streaming.Streams.readEventsRaw(spark, d,
            glob = "events.parquet")
          .select(col("event_id"),
            col("ts").cast("long").cast("timestamp").as("ts"),
            col("user_id"), col("event_type"), col("value"))
        val sentinel = spark.readStream
          .schema("event_id long, ts timestamp, user_id long, " +
            "event_type string, value double")
          .parquet(sentinelDir)
        val sessions = graft.streaming.Streams.sessionWindows(
          ev.unionByName(sentinel), gap = "1800 seconds",
          watermark = "0 seconds")
        val t0 = System.nanoTime()
        val out = graft.streaming.Streams.runToMemory(
          sessions, s"q66p_${p}_${System.nanoTime}", "append")
        out.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q66parts] $d parts=$p%4d runs=" +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
