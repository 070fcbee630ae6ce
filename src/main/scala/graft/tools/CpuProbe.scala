package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Per-stage CPU attribution for registered queries under the BENCH
  * vehicle (`queryExecution.toRdd.count()` — StageProfile's `count()`
  * lets Catalyst eliminate final sorts/projections, exactly the stages
  * under investigation in the r16 fan-width work). One discarded priming
  * run, then min-of-k wall with the per-stage breakdown of the minimum
  * run: task counts, executorRunTime, executorCpuTime.
  *
  * Usage: runMain graft.tools.CpuProbe <sfDir> <q1> [q2 ...]
  */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    try graft.Tables.lineitem(spark, sfDir).count()
    catch { case _: Exception => graft.Tables.documents(spark, sfDir).count() }

    val stages = ArrayBuffer[(Int, String, Int, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
            si.numTasks,
            si.taskMetrics.executorRunTime,
            si.taskMetrics.executorCpuTime / 1000000L,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)))
        }
      }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): (Double, Vector[(Int, String, Int, Long, Long, Long)]) = {
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        (wall, stages.synchronized(stages.toVector))
      }
      once() // discarded priming run (JIT/codegen)
      val runs = (1 to 2).map(_ => once())
      val (wall, snap) = runs.minBy(_._1)
      val cpuTot = snap.map(_._5).sum / 1000.0
      println(f"CPUPROBE $name wall=$wall%.3f s cpu=$cpuTot%.2f s " +
        f"walls=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
      snap.sortBy(_._1).foreach { case (id, nm, n, run, cpu, w) =>
        println(f"  stage=$id%4d tasks=$n%3d run=${run}%6d ms cpu=${cpu}%6d ms wall=${w}%6d ms  $nm")
      }
    }
    spark.stop()
  }
}
