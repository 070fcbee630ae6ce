package graft.tools

import org.apache.spark.sql.functions._

import graft.exec.CART
import graft.search.DataParallelCART

/** Dev probe for the data-parallel tree regime at real row counts: fit a
  * histogram CART and a shared-pass forest on lineitem (600k rows at
  * sf0.1, 6 numeric features, 3-class l_returnflag target) and compare
  * wall time + training accuracy against the broadcast learner on the
  * driver-collected matrix. Evidence for NOTES.md: the DP route's cost is
  * passes-over-data x levels, independent of tree count for forests.
  *
  * Usage: runMain graft.tools.DPForestProbe [sfDir]
  */
object DPForestProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")

    val df = graft.Tables.lineitem(spark, dir)
      .select(
        array(col("l_quantity").cast("double"),
          col("l_extendedprice").cast("double"),
          col("l_discount").cast("double"),
          col("l_tax").cast("double"),
          col("l_partkey").cast("double") % 97.0,
          col("l_suppkey").cast("double") % 97.0).as("x"),
        // planted learnable rule over the features themselves (the raw
        // returnflag target is synthetic noise in this testdata): both
        // regimes must recover it exactly, making agreement meaningful
        (when(col("l_quantity") > 25,  2.0)
          .when(col("l_discount") > 0.05, 1.0).otherwise(0.0)).as("y"))
      .cache()
    val n = df.count()
    println(s"rows: $n")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val params = Map("max_depth" -> 6.0)

    val dpTree = time("DP-CART depth-6 (distributed histogram)") {
      DataParallelCART.fitClassifier(df, "x", "y", params, seed = 42, nClasses = 3)
    }
    val (x, y) = time("driver collect (broadcast-regime precondition)") {
      val rows = df.collect()
      (rows.map(_.getSeq[Double](0).toArray), rows.map(_.getDouble(1)))
    }
    val bcTree = time("broadcast CART depth-6 (single driver-side fit)") {
      CART.grow(x, y, null, params, seed = 42, nClasses = 3)
    }
    val sample = x.indices.by(199)
    val agree = sample.count(i => dpTree.predict(x(i)) == bcTree.predict(x(i)))
    val accDp = sample.count(i => dpTree.predict(x(i)) == y(i))
    val accBc = sample.count(i => bcTree.predict(x(i)) == y(i))
    println(s"sampled ${sample.size}: regime agreement $agree, " +
      s"acc dp=$accDp bc=$accBc")

    val forest = time("DP-forest 16 trees depth-6 (shared passes)") {
      DataParallelCART.fitForest(df, "x", "y", params, seed = 42,
        nTrees = 16, classification = true, bootstrap = true)
    }
    val accF = sample.count(i => forest.predict(x(i)) == y(i))
    println(s"forest acc on sample: $accF/${sample.size}")

    // extra-trees regime: the same shared passes + per-bin (min, max)
    // range stats — measures the trackRanges tensor overhead at real row
    // counts (cells grow s -> s+2 doubles; the pass count is unchanged)
    val extra = time("DP-extra-forest 16 trees depth-6 (range stats)") {
      DataParallelCART.fitForest(df, "x", "y",
        params + ("random_splits" -> 1.0), seed = 42,
        nTrees = 16, classification = true, bootstrap = false)
    }
    val accX = sample.count(i => extra.predict(x(i)) == y(i))
    println(s"extra-forest acc on sample: $accX/${sample.size}")
    spark.stop()
  }
}
