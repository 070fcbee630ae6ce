package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Run one registered query N times in a session and dump the per-stage
  * breakdown of the FASTEST and SLOWEST runs side by side — for
  * adjudicating erratic repeat-run variance (which stage inflates?)
  * where a single cold profile can't see it.
  *
  * Usage: runMain graft.tools.RepeatStageProfile <sfDir> <query> [n]
  */
object RepeatStageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val n = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    try graft.Tables.lineitem(spark, sfDir).count()
    catch { case _: Exception => graft.Tables.documents(spark, sfDir).count() }

    val current = ArrayBuffer[(Int, String, Int, Long, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        current.synchronized {
          current += ((si.stageId, si.name.takeWhile(_ != '\n').take(50),
            si.numTasks,
            si.taskMetrics.executorRunTime,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.taskMetrics.shuffleReadMetrics.totalBytesRead,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten,
            si.taskMetrics.inputMetrics.bytesRead))
        }
      }
    })
    val runs = (1 to n).map { i =>
      current.synchronized(current.clear())
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // let listener drain
      val snap = current.synchronized(current.toVector)
      val cacheState = spark.sparkContext.getRDDStorageInfo.map(info =>
        s"rdd=${info.id} cached=${info.numCachedPartitions}/" +
          s"${info.numPartitions} mem=${info.memSize >> 20}M " +
          s"disk=${info.diskSize >> 20}M").mkString("; ")
      println(f"[repeat] run $i wall=$wall%.2f s stages=${snap.size} " +
        s"[$cacheState]")
      (wall, snap)
    }
    for ((label, (wall, snap)) <- Seq(
        "FASTEST" -> runs.minBy(_._1), "SLOWEST" -> runs.maxBy(_._1))) {
      println(f"[repeat] $label wall=$wall%.2f s")
      snap.sortBy(-_._5).take(12).foreach {
        case (id, nm, t, run, w, sr, sw, in) =>
          println(f"[repeat]   stage=$id%4d tasks=$t%3d runSum=${run}%7d ms " +
            f"wall=${w}%7d ms shufR=${sr >> 20}%6d M shufW=${sw >> 20}%6d M " +
            f"in=${in >> 20}%6d M  $nm")
      }
    }
    spark.stop()
  }
}
