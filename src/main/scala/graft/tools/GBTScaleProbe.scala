package graft.tools

import org.apache.spark.sql.functions._

import scala.util.Random

/** Dev probe for `DataParallelGBT`: fit wall time at n and 10n rows
  * (binary logistic, 10 stages, depth 3) and the resulting time-vs-rows
  * exponent. Per-stage work is a histogram pass per tree level over the
  * cached base plus one leaf-aggregation pass, all linear in rows, so
  * the exponent should sit well under 1.0 at these sizes (per-job floors
  * amortize) and approach 1.0 from below at scale. Also times the
  * broadcast regime at the small n for the crossover picture.
  */
object GBTScaleProbe {
  def main(args: Array[String]): Unit = {
    val small = if (args.nonEmpty) args(0).toInt else 30000
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val d = 20
    def data(n: Int) = {
      val rng = new Random(7)
      (0 until n).map { _ =>
        val x = Array.fill(d)(rng.nextGaussian())
        val y = if (x(0) + 0.5 * x(1) + rng.nextGaussian() * 0.3 > 0) 1.0 else 0.0
        (x.toSeq, y)
      }.toDF("features", "label")
        .withColumn("features", col("features").cast("array<double>"))
    }
    val params = Map("n_estimators" -> 10.0, "learning_rate" -> 0.3)

    def timeDp(n: Int): Double = {
      val df = data(n)
      val t0 = System.nanoTime()
      graft.search.DataParallelGBT.fit(df, "features", "label", params,
        seed = 5, nClasses = 2)
      (System.nanoTime() - t0) / 1e9
    }
    timeDp(small) // warm-up: codegen + JIT
    val t1 = timeDp(small)
    val t10 = timeDp(small * 10)
    val exp = math.log(t10 / t1) / math.log(10.0)
    println(f"[gbtscale] DP fit: $small%d rows ${t1}%6.2f s   " +
      f"${small * 10}%d rows ${t10}%6.2f s   exponent $exp%5.2f")

    // broadcast regime at the small n (driver-collected matrix)
    val rng = new Random(7)
    val x = Array.fill(small)(Array.fill(d)(rng.nextGaussian()))
    val y = x.map(r =>
      if (r(0) + 0.5 * r(1) + rng.nextGaussian() * 0.3 > 0) 1.0 else 0.0)
    val t0 = System.nanoTime()
    graft.exec.GBT.Classifier.fit(x, y, params, 5)
    val tBc = (System.nanoTime() - t0) / 1e9
    println(f"[gbtscale] broadcast fit at $small%d rows: ${tBc}%6.2f s " +
      "(single-task; the DP route exists for data PAST the broadcast " +
      "budget, not to beat this)")
    spark.stop()
  }
}
