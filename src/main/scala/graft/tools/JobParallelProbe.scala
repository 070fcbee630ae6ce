package graft.tools

import org.apache.spark.sql.functions._

import scala.util.Random

/** Dev probe for `JobParallel`: wall time of the data-parallel regime's
  * independent-fit axes at jobParallelism 1 (the pre-round-7 sequential
  * submission) vs the default 8. Each fit is a distributed job over the
  * same cached frame; the speedup is the recovered driver-phase /
  * scheduler overlap, and models must be IDENTICAL either way (the spec
  * pins that on the OvO surface; here we assert best-params/score
  * equality as a smoke check).
  */
object JobParallelProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 60000
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rng = new Random(7)
    val d = 20
    val k = 8
    val rows = (0 until n).map { _ =>
      val c = rng.nextInt(k)
      val x = Array.fill(d)(rng.nextGaussian() * 0.8)
      x(c % d) += 2.5
      (x.toSeq, c.toDouble)
    }
    val df = rows.toDF("features", "label")
      .withColumn("features", col("features").cast("array<double>"))
      .cache()
    df.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // OvR: k independent one-vs-rest DP fits
    def ovr(par: Int) = new graft.search.DistOneVsRest(
        graft.exec.LogisticRegressionLBFGS)
      .withBroadcastBudget(1L).withJobParallelism(par)
      .fit(spark, df, "features", "label")
    val (_, tOvrWarm) = time(ovr(1)) // warm-up: codegen + cache
    val (_, tOvr1) = time(ovr(1))
    val (_, tOvr8) = time(ovr(8))
    println(f"[jobpar] OvR k=$k DP fits: seq $tOvr1%6.2f s  par8 $tOvr8%6.2f s" +
      f"  speedup ${tOvr1 / tOvr8}%4.2fx  (warm-up $tOvrWarm%5.2f s)")

    // grid search: 6 candidates x 3 folds independent Spark ML fits
    val grid = Map("c" -> Seq(0.1, 0.5, 1.0, 2.0, 5.0, 10.0))
    def gs(par: Int) = new graft.search.DistGridSearchCV(
        graft.exec.LogisticRegressionLBFGS, grid, cv = 3)
      .withBroadcastBudget(1L).withJobParallelism(par)
      .fit(spark, df, "features", "label")
    val (r1, tGs1) = time(gs(1))
    val (r8, tGs8) = time(gs(8))
    require(r1.bestParams == r8.bestParams && r1.bestScore == r8.bestScore,
      s"parallelism changed the result: ${r1.bestParams}/${r1.bestScore} " +
        s"vs ${r8.bestParams}/${r8.bestScore}")
    println(f"[jobpar] grid 6x3 DP fits:  seq $tGs1%6.2f s  par8 $tGs8%6.2f s" +
      f"  speedup ${tGs1 / tGs8}%4.2fx  (same best: ${r8.bestParams})")

    spark.stop()
  }
}
