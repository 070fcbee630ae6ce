package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** End-to-end scale probe for the ON-DISK IVF index: builds an index over
  * an sf1-equivalent synthetic corpus (default 200k x 64, ~2 orders past
  * the testdata), then measures probe latency AND actual bytes/files read
  * per nProbe from the FileSourceScanExec metrics — the partition-pruning
  * claim as an observable (bytes ~ nProbe/nClusters), not a plan string.
  */
object IvfScaleProbe {

  /** All file scans in the EXECUTED plan (descending through AQE). */
  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: QueryStageExec => fileScans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(fileScans)
  }

  /** (numFiles, bytes) actually read by `df`'s parquet scans, from the
    * post-execution metrics. Call AFTER an action has run the frame.
    */
  def scanReadMetrics(df: DataFrame): (Long, Long) = {
    val scans = fileScans(df.queryExecution.executedPlan)
    val files = scans.flatMap(_.metrics.get("numFiles")).map(_.value).sum
    val bytes = scans.flatMap(_.metrics.get("filesSize")).map(_.value).sum
    (files, bytes)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val dim = 64
    val nClusters = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic pseudo-gaussian corpus (same Irwin-Hall device as
    // AnnProbe), generated distributed — no driver materialization
    val corpus = spark.range(n.toLong).select(col("id").as("vec_id"),
      array((0 until dim).map { j =>
        ((0 until 4).map(r =>
          pmod(xxhash64(col("id"), lit(j * 4 + r)), lit(10000)) / 10000.0)
          .reduce(_ + _) - lit(2.0)).cast("double")
      }: _*).as("embedding"))

    val dir = java.nio.file.Files.createTempDirectory("ivf_scale").toString
    try {
      val t0 = System.nanoTime()
      Similarity.writeIvfIndex(corpus, "embedding", "vec_id", dir,
        nClusters = nClusters, seed = 17)
      println(f"IVF build: n=$n cells=$nClusters  ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val totalBytes = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/cells"))
          .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size(_)).sum
      }
      println(f"index bytes on disk: $totalBytes%,d")

      val query = corpus.filter(col("vec_id") === 7L).head().getSeq[Double](1)
      for (nProbe <- Seq(1, 2, 4, 8, 16, nClusters)) {
        // min-of-2: first run pays file listing; second is steady state
        val runs = (1 to 2).map { _ =>
          val t = System.nanoTime()
          val probed = Similarity.probeIvfIndex(spark, dir, query, k = 10,
            nProbe = nProbe)
          // collect(), not count(): count() plans its OWN query execution,
          // leaving probed.queryExecution's scan metrics unpopulated
          val rows = probed.collect().length
          val dt = (System.nanoTime() - t) / 1e9
          val (files, bytes) = scanReadMetrics(probed)
          (dt, files, bytes, rows)
        }
        val best = runs.minBy(_._1)
        println(f"nProbe=$nProbe%3d  ${best._1}%6.3f s  files=${best._2}%4d  " +
          f"bytes=${best._3}%,12d (${best._3 * 100.0 / totalBytes}%5.1f%% of index)")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
    spark.stop()
  }
}
