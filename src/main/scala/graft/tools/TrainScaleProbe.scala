package graft.tools

import org.apache.spark.sql.functions._

import scala.util.Random

import graft.exec.{CART, ModelParallel}
import graft.exec.ModelParallel.TrainMatrix
import graft.search.DistGridSearchCV

/** Dev probe for the engine's headline property (BASELINE.md): wall time
  * of a candidates × folds fan-out ≈ total single-task fit time / cores.
  * Fits 64 CART tasks (32 candidates × 2 folds) against a broadcast
  * 20k × 30 matrix on local[32] and reports the overlap factor.
  */
object TrainScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    // arg(1): alternate master — "local-cluster[4,8,4096]" runs REAL
    // separate executor JVMs (4 workers x 8 cores), isolating the
    // single-JVM memory-bandwidth/GC-sharing hypothesis for the overlap
    // gap without a cluster. Executors are fresh JVMs, so they need the
    // app classes on their classpath explicitly.
    val master = args.lift(1).getOrElse("local[32]")
    val spark =
      if (!master.startsWith("local-cluster")) Sessions.build(master, 32)
      else org.apache.spark.sql.SparkSession.builder()
        .master(master)
        .withExtensions(new graft.plans.GraftExtensions)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.executor.extraClassPath",
          "/root/repo/target/scala-2.13/classes")
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rng = new Random(1)
    val d = 30
    val x = Array.fill(n)(Array.fill(d)(rng.nextGaussian()))
    val y = x.map(r => if (r(0) + r(1) * 0.5 + rng.nextGaussian() * 0.3 > 0) 1.0 else 0.0)
    val matrix = TrainMatrix(x, y, ModelParallel.stratifiedFolds(y, 2, 7))

    val grid = Map("max_depth" -> (3 to 34).map(_.toDouble))
    val t0 = System.nanoTime()
    val r = new DistGridSearchCV(new CART.Classifier(2), grid, cv = 2)
      .fitMatrix(spark, matrix)
    val cv = r.cvResults.collect()
    val wall = (System.nanoTime() - t0) / 1e9
    // serial estimate: time a sample of depths on the driver, average,
    // scale to the task count (tree cost grows with depth, so sample the
    // low/mid/high rungs rather than one point)
    val totalFitSec = {
      val sampled = Seq(3.0, 12.0, 23.0, 34.0).map { depth =>
        val t1 = System.nanoTime()
        new CART.Classifier(2).fit(x, y, Map("max_depth" -> depth), 7)
        (System.nanoTime() - t1) / 1e9
      }
      sampled.sum / sampled.size * grid("max_depth").size * 2
    }
    println(f"[train-scale] ${grid("max_depth").size * 2} tasks, n=$n x $d")
    println(f"[train-scale] wall = $wall%.1f s, est. serial = $totalFitSec%.1f s, " +
      f"overlap = ${totalFitSec / wall}%.1fx")
    println(f"[train-scale] best depth = ${r.bestParams("max_depth")}%.0f, " +
      f"cv accuracy = ${r.bestScore}%.4f, candidates ranked = ${cv.length}")

    // the broadcast-overflow regime: same data as a distributed DataFrame,
    // Spark ML fits per task, identical relational skeleton
    import spark.implicits._
    val df = x.zip(y).toSeq.map { case (xi, yi) => (xi.toSeq, yi) }
      .toDF("features", "label").repartition(32)
    val t2 = System.nanoTime()
    val dp = new graft.search.DataParallelGridSearch(
      Map("reg_param" -> Seq(0.0, 0.01, 0.1), "max_iter" -> Seq(30.0)), cv = 3)
      .fit(spark, df, "features", "label")
    println(f"[train-scale] data-parallel: ${(System.nanoTime() - t2) / 1e9}%.1f s, " +
      f"best reg = ${dp.bestParams("reg_param")}, cv accuracy = ${dp.bestScore}%.4f")
    spark.stop()
  }
}
