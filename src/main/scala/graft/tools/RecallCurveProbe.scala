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
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
    spark.stop()
  }
}
