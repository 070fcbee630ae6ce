package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** A/B the r16 verdict-item-1 hypothesis on the q38 shape: the pair
  * self-join's ~0.2 s/task fixed cost is task-BINARY deserialization of
  * the deeply nested pinned-plan lineage, so truncating the pinned
  * intermediate's lineage (localCheckpoint → downstream tasks carry a
  * LogicalRDD leaf) should collapse the 32-task stage's CPU while the
  * persist-only pin keeps paying it. Prints total wall/cpu plus the
  * per-stage breakdown and the serialized task-binary proxy (the
  * broadcast sizes are not listener-visible; stage cpu is the signal).
  *
  * Usage: runMain graft.tools.LineageTruncProbe <sfDir> [pin|ckpt|scan]
  */
object LineageTruncProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val modes = if (args.length > 1) args.drop(1).toSeq
      else Seq("pin", "ckpt")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.documents(spark, d).count()

    val stages = ArrayBuffer[(Int, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.synchronized {
          stages += ((si.stageId, si.numTasks,
            si.taskMetrics.executorRunTime,
            si.taskMetrics.executorCpuTime / 1000000L))
        }
      }
    })

    def pipeline(mode: String): org.apache.spark.sql.DataFrame = {
      val docs = graft.Tables.documents(spark, d)
      val base = docs.select(col("doc_id").as("id"),
          graft.text.TextFunctions.distinctWordNGrams(col("text"), 3)
            .as("shingles"))
        .filter(size(col("shingles")) > 0)
      val sh = mode match {
        case "pin"  => graft.ops.Par.pinLatest(s"probe.trunc.$mode", base)
        case "ckpt" => base.localCheckpoint(false)
        case _      => base
      }
      val sigs = sh.select(col("id"),
          posexplode_outer(graft.functions.MinHashSig(col("shingles"), 8, 42)))
        .select(col("id"), col("pos").as("t"), col("col").as("h"))
        .filter(col("h").isNotNull)
      val sigsP = sigs.repartition(3, col("t"), col("h"))
      val cand = sigsP.as("a").hint("shuffle_hash")
        .join(sigsP.as("b"),
          col("a.t") === col("b.t") && col("a.h") === col("b.h") &&
            col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b")).agg(lit(1))
        .select("id_a", "id_b")
      cand
    }

    modes.foreach { mode =>
      def once(): (Double, Vector[(Int, Int, Long, Long)]) = {
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        pipeline(mode).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        (wall, stages.synchronized(stages.toVector))
      }
      once()
      val runs = (1 to 2).map(_ => once())
      val (wall, snap) = runs.minBy(_._1)
      println(f"TRUNC mode=$mode%-5s wall=$wall%.3f s cpu=${snap.map(_._4).sum / 1000.0}%.2f s")
      snap.sortBy(_._1).foreach { case (id, n, run, cpu) =>
        println(f"   stage=$id%4d tasks=$n%3d run=${run}%6d ms cpu=${cpu}%6d ms")
      }
    }
    spark.stop()
  }
}
