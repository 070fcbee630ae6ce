package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions

/** A/B the partition count of minhashPairs' explicit repartition pins
  * (q38 shape): replicate the operator with p ∈ {given list} and report
  * wall + executor task CPU (min-of-3, warmed). Adjudicates whether the
  * 32-task stages' CPU is per-row work (cpu flat in p) or per-task
  * fixed cost (cpu ∝ p) — which decides between kernel work and
  * rows-derived pin sizing.
  *
  * Usage: runMain graft.tools.PinCountProbe <sfDir> [p1,p2,...]
  */
object PinCountProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ps = args.lift(1).map(_.split(',').map(_.toInt).toSeq)
      .getOrElse(Seq(4, 8, 16, 32))
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

    def pipeline(p: Int): org.apache.spark.sql.DataFrame = {
      val sh = graft.ops.Par.fanOut(
          Tables.documents(spark, d)
            .select(col("doc_id").as("id"), col("text")))
        .select(col("id"),
          TextFunctions.distinctWordNGrams(col("text"), 3).as("shingles"))
        .filter(size(col("shingles")) > 0)
      val pinned = graft.ops.Par.pinLatest(s"pincount.sh.$p", sh)
      val sigs = pinned.select(col("id"),
        posexplode_outer(graft.functions.MinHashSig(col("shingles"), 8, 42)))
        .select(col("id"), col("pos").as("t"), col("col").as("h"))
        .filter(col("h").isNotNull)
      val sigsP = sigs.repartition(p, col("t"), col("h"))
      val cand = sigsP.as("a").hint("shuffle_hash")
        .join(sigsP.as("b"),
          col("a.t") === col("b.t") && col("a.h") === col("b.h") &&
            col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b")).agg(lit(1))
        .select("id_a", "id_b")
      val shH = pinned.select(col("id"),
        graft.functions.ShingleHashes(col("shingles")).as("_h"))
      cand.repartition(p, col("id_a"))
        .join(shH.select(col("id").as("id_a"), col("_h").as("_ha")), "id_a")
        .join(shH.select(col("id").as("id_b"), col("_h").as("_hb")), "id_b")
        .withColumn("_inter",
          graft.functions.SortedIntersectCount(col("_ha"), col("_hb")))
        .withColumn("est_jaccard", round(col("_inter") /
          (size(col("_ha")) + size(col("_hb")) - col("_inter")), 6))
        .filter(col("est_jaccard") >= 0.2)
        .select("id_a", "id_b", "est_jaccard")
    }

    ps.foreach { p =>
      val df = pipeline(p)
      df.queryExecution.toRdd.count() // warm (pins the cache too)
      val runs = (1 to 3).map { _ =>
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        val c0 = cpuNanos.get(); val t0 = System.nanoTime()
        val rows = pipeline(p).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        (wall, (cpuNanos.get() - c0) / 1e9, rows)
      }
      val best = runs.minBy(_._1)
      println(f"PINPROBE p=$p%3d wall=${best._1}%7.3f cpu=${best._2}%7.3f " +
        f"rows=${best._3} iters=${runs.map(r => f"${r._1}%.2f/${r._2}%.1f").mkString(" ")}")
    }
    spark.stop()
  }
}
