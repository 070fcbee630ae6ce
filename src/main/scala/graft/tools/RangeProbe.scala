package graft.tools

import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.RangeJoin]]: times the bucketized
  * equi-join at N points x M overlapping intervals, and (at a size where
  * it terminates) the naive range-predicate join Spark plans as
  * BroadcastNestedLoopJoin, to measure the gap the decomposition buys.
  *
  *   sbt "runMain graft.tools.RangeProbe [nPoints] [nIntervals]"
  */
object RangeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val m = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val spark = Sessions.build("local[32]", 32)
    import spark.implicits._

    val domain = 1000000.0
    // deterministic pseudo-random doubles from the row id — no rand(),
    // so reruns time identical data
    val points = spark.range(n).select(col("id").as("pid"),
      (pmod(col("id") * 2654435761L, lit(1000003L)) / lit(1000003.0) * domain).as("v"))
    val intervals = spark.range(m).select(col("id").as("iid"),
      (pmod(col("id") * 40503L, lit(999983L)) / lit(999983.0) * domain).as("lo"))
      .withColumn("hi", col("lo") + 3000.0) // ~3-bucket span at width 1000

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (rows, tBucket) = time {
      graft.ops.RangeJoin.pointInInterval(points, intervals,
        "v", "lo", "hi", bucketWidth = 1000.0).count()
    }
    println(f"BUCKETIZED n=$n m=$m matched=$rows%d in $tBucket%.1f s")

    // naive BNL at 1/20 the size (it is quadratic; full size would not
    // finish) — the per-pair rate scales the comparison. Subset by
    // MODULO filter: limit() collapses to one partition (and a
    // contiguous id filter lands in the first range partitions), which
    // would time the naive join nearly single-threaded while the
    // bucketized run uses every core — an unfair comparison.
    val pS = points.filter(pmod(col("pid"), lit(20)) === 0).cache(); pS.count()
    val iS = intervals.filter(pmod(col("iid"), lit(20)) === 0).cache(); iS.count()
    val (rS, tNaive) = time {
      pS.join(iS, col("v") >= col("lo") && col("v") < col("hi")).count()
    }
    val (rB, tB) = time {
      graft.ops.RangeJoin.pointInInterval(pS, iS,
        "v", "lo", "hi", bucketWidth = 1000.0).count()
    }
    require(rS == rB, s"bucketized != naive at probe scale: $rB vs $rS")
    println(f"SMALL (n/20 x m/20): naive BNL $tNaive%.1f s vs bucketized $tB%.1f s " +
      f"(match parity $rS%d rows); full-size naive extrapolates to ~${tNaive * 400}%.0f s")
    spark.stop()
  }
}
