package graft.tools

import org.apache.spark.sql.functions._

/** Isolate the FIXED per-task cost of a warm local session: how much
  * executor CPU does a trivial N-task stage burn when the data is ~zero?
  * Adjudicates whether high cpu-map readings on tiny-data 32-task stages
  * are real per-row work or per-task overhead (metrics/codegen lookup/
  * broadcast deserialization), which decides between "optimize the
  * kernel" and "cut the task count".
  */
object TaskOverheadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) { cpuNanos.addAndGet(m.executorCpuTime); () }
        }
      })
    def timed(name: String)(f: => Unit): Unit = {
      // warm twice, then measure min-of-3
      (1 to 2).foreach(_ => f)
      val runs = (1 to 3).map { _ =>
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        val c0 = cpuNanos.get(); val t0 = System.nanoTime()
        f
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        (wall, (cpuNanos.get() - c0) / 1e9)
      }
      val best = runs.minBy(_._1)
      println(f"TASKPROBE $name%-36s wall=${best._1}%7.3f s cpu=${best._2}%7.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    timed("empty_32task") {
      noop(spark.range(0, 32, 1, 32).select(xxhash64(col("id")).as("h")))
    }
    timed("empty_1task") {
      noop(spark.range(0, 32, 1, 1).select(xxhash64(col("id")).as("h")))
    }
    timed("repart32_100krows") {
      noop(spark.range(0, 100000, 1, 2).repartition(32)
        .select(xxhash64(col("id")).as("h")))
    }
    val small = spark.range(0, 1000, 1, 1).select(col("id"),
      xxhash64(col("id")).as("h"))
    timed("bcast_join_32task") {
      noop(spark.range(0, 100000, 1, 32)
        .join(broadcast(small), Seq("id"), "left"))
    }
    val wide = spark.range(0, 3000, 1, 1).select(col("id"),
      transform(sequence(lit(1), lit(300)), i => xxhash64(col("id") + i))
        .as("arr"))
    timed("bcast_wide3k x300_32task") {
      noop(spark.range(0, 100000, 1, 32)
        .join(broadcast(wide), Seq("id"), "left"))
    }
    timed("get_json_100k_32task") {
      noop(spark.range(0, 100000, 1, 32)
        .select(get_json_object(concat(lit("{\"k\":"),
          (col("id") % 97).cast("string"), lit("}")), "$.k").cast("int")))
    }
    spark.stop()
  }
}
