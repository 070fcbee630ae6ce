package graft.tools

import graft.sim.Similarity

/** Prints the measured recall(nProbe) curve the build sidecar stores
  * (`writeIvfIndex` → `recallCurve`) and the nProbe each recall target
  * resolves to, over the sf embeddings — the numbers NOTES records so
  * the calibrated operating point is documented at two SFs.
  *
  * Usage: runMain graft.tools.RecallCurveProbe [sfDir] [samples]
  */
object RecallCurveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val samples = args.lift(1).map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val dir = java.nio.file.Files.createTempDirectory("recall_curve").toString
    try {
      val t0 = System.nanoTime()
      Similarity.writeIvfIndex(emb, "embedding", "vec_id", dir,
        recallCurveSamples = samples)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val curve = Similarity.recallCurve(spark, dir).get
      val cells = curve.length
      println(f"sfDir=$sfDir rows=$n cells=$cells samples=$samples " +
        f"build=$tBuild%.1f s")
      val marks = (Seq(1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128,
        192, 256) :+ Similarity.autoNProbe(cells, n) :+ cells)
        .distinct.sorted.filter(p => p >= 1 && p <= cells)
      println("nProbe -> measured top-1 recall (build sample):")
      marks.foreach(p => println(f"  p=$p%4d  recall=${curve(p - 1)}%.3f"))
      println("target -> nProbeForRecall:")
      Seq(0.5, 0.8, 0.9, 0.95, 0.99, 1.0).foreach { t =>
        println(f"  target=$t%.2f -> nProbe=${
          Similarity.nProbeForRecall(spark, dir, t)}")
      }
      // in-memory twin: ivfTopK(recallTarget) measures its curve at fit
      // time over the same corpus (256 samples — comparable to the
      // default disk build); identical fit inputs + curve math should
      // land the same operating points (parity is spec-pinned exactly
      // at sample-cap-covered corpus sizes)
      import org.apache.spark.sql.functions.col
      val q1 = emb.limit(4).withColumn("vec_id", col("vec_id") + 10000000L)
      Similarity.ivfTopK(emb, q1, "embedding", "vec_id", k = 1,
        recallTarget = 0.9).count()
      val memRanks = Similarity.lastMemoryRecallRanks.get()
      val memCurve = Array.tabulate(cells)(p =>
        memRanks.count(_ <= p + 1).toDouble / memRanks.length)
      println("in-memory fit-time curve (ivfTopK recallTarget, 256 samples):")
      marks.foreach(p => println(f"  p=$p%4d  recall=${memCurve(p - 1)}%.3f"))
      println("target -> in-memory nProbe:")
      Seq(0.5, 0.8, 0.9, 0.95, 0.99, 1.0).foreach { t =>
        println(f"  target=$t%.2f -> nProbe=${
          Similarity.nProbeFromRanks(memRanks, cells, t)}")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
    spark.stop()
  }
}
