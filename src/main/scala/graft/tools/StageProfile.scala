package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Run one registered query and dump per-stage task counts + CPU time —
  * the fastest way to see where a small-data plan serializes (e.g. AQE
  * coalescing a shuffle to one partition before a compute-heavy join).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up on whichever table the dir actually has (docs-only
    // ScaleDataGen dirs carry no lineitem)
    try graft.Tables.lineitem(spark, sfDir).count()
    catch { case _: Exception => graft.Tables.documents(spark, sfDir).count() }

    val stages = ArrayBuffer[(Int, String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
          si.numTasks,
          si.taskMetrics.executorRunTime,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)))
      }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"STAGES for $name  wall=$wall%.2f s")
    stages.sortBy(_._1).foreach { case (id, nm, n, run, w) =>
      println(f"  stage=$id%3d tasks=$n%3d runTimeSum=${run}%6d ms wall=${w}%6d ms  $nm")
    }
    spark.stop()
  }
}
