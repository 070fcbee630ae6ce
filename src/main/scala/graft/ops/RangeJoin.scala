package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: pair each left "point" row with every
  * right interval [lo, hi) containing it, optionally also matching on
  * equality keys. Spark plans a bare range-condition join as
  * BroadcastNestedLoopJoin — every point scans every interval, a
  * cartesian at scale. Per the extension preference order this composes
  * existing operators instead — the standard bucketized decomposition:
  *
  *   1. intervals explode to the fixed-width buckets they overlap —
  *      bounded fan-out of (span/width)+1 rows per interval;
  *   2. each point maps to exactly ONE bucket (floor(v/width));
  *   3. a plain hash equi-join on (keys…, bucket) meets every containing
  *      interval; each (point, interval) pair meets exactly once — in the
  *      point's bucket — so no post-join dedup is needed;
  *   4. the residual predicate lo <= v < hi filters bucket co-residents.
  *
  * Intervals are half-open [lo, hi): stacked or tiled bands never
  * double-count a boundary point. Empty (hi <= lo) intervals match
  * nothing. `maxFanout` bounds the per-interval explosion — one malformed
  * unbounded interval would otherwise fan out to millions of bucket rows
  * and take the stage down with it, so the operator fails loudly instead
  * of exploding silently.
  *
  * Scale: the only shuffle is the hash join on (keys…, bucket). Pick
  * `bucketWidth` near the typical interval span: fan-out stays ~2 rows
  * per interval while each point still meets only the handful of
  * intervals sharing its bucket. A hot bucket behaves like any skewed
  * hash-join key (AQE skew-join or upstream salting applies unchanged).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double,
                      keyCols: Seq[String] = Nil,
                      maxFanout: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = (points.columns.toSet -- keyCols)
      .intersect(intervals.columns.toSet -- keyCols)
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: ${overlap.mkString(", ")}")
    val taken = (points.columns ++ intervals.columns).toSet
    val bC = Iterator.iterate("_bucket")(_ + "_").find(!taken.contains(_)).get

    val p = points.withColumn(bC,
      floor(col(pointCol) / bucketWidth).cast("long"))

    val loB = floor(col(loCol) / bucketWidth).cast("long")
    val hiB = floor(col(hiCol) / bucketWidth).cast("long")
    // The guard lives INSIDE the sequence bound (not a droppable
    // assert_true column the optimizer would prune away unevaluated).
    val hiGuarded = when(hiB - loB <= lit(maxFanout.toLong), hiB)
      .otherwise(raise_error(concat(
        lit(s"range-join interval spans more than $maxFanout buckets of " +
          s"width $bucketWidth: ["),
        col(loCol).cast("string"), lit(", "),
        col(hiCol).cast("string"), lit(")"))).cast("long"))
    val iv = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn(bC, explode(sequence(loB, hiGuarded)))

    p.join(iv, keyCols :+ bC)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(bC)
  }
}
