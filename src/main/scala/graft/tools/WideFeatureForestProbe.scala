package graft.tools

import org.apache.spark.sql.functions._

import graft.search.DataParallelCART

/** Measures the per-node feature-subset statistics win: a DP forest fit
  * at wide d under sqrt max_features aggregates only each node's nFeat
  * subset — the tensor and the per-row seqOp loops shrink by ~d/nFeat.
  * Synthetic wide data (d features, planted rule on feature 0), fit a
  * small bootstrap forest, print wall time. Evidence for NOTES.md.
  *
  * Usage: runMain graft.tools.WideFeatureForestProbe [rows] [d] [trees]
  */
object WideFeatureForestProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val d = args.lift(1).map(_.toInt).getOrElse(512)
    val trees = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    // integer-valued features (low-card candidates); label from f0
    val df = spark.range(n).select(
        array((0 until d).map(j =>
          pmod(xxhash64(col("id") + lit(j * 7919)), lit(7)).cast("double")): _*)
          .as("x"),
        (pmod(xxhash64(col("id")), lit(7)) < 3).cast("double").as("y"))
      .repartition(32).cache()
    df.count()

    val params = Map("max_depth" -> 5.0,
      "max_features" -> (math.sqrt(d) / d)) // sqrt rule: nFeat ≈ sqrt(d)
    val t0 = System.nanoTime()
    val m = DataParallelCART.fitForest(df, "x", "y", params, seed = 3,
      nTrees = trees, classification = true)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[widefeat] n=$n d=$d trees=$trees sqrt-features " +
      f"fit=$wall%.2f s nClasses=${m.nClasses}")
    spark.stop()
  }
}
