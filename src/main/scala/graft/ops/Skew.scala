package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation and salted broadcast
  * joins — the manual counterparts to AQE's skew-join splitting, for the
  * cases AQE can't fix (a single hot GROUP BY key, or a skewed
  * shuffle-join key against a small-but-not-tiny side).
  */
object Skew {

  // collision-free temp name (same convention as AsOfJoin/RangeJoin) —
  // a hard-coded "_salt" would silently overwrite a caller's column
  private def saltName(taken: Iterable[String]): String = {
    val set = taken.toSet
    Iterator.iterate("_salt")(_ + "_").find(!set.contains(_)).get
  }

  /** Two-phase aggregation for hot group keys: partial-aggregate on
    * (key, salt) then final-aggregate on key. `partialAggs` must be
    * reaggregatable (sum/count/min/max — NOT avg; compute avg as
    * sum/count in `finalAggs`).
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salt: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    require(salt > 0, "salt must be positive")
    val sC = saltName(df.columns)
    val salted = df.withColumn(sC,
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col(sC)): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keyCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a small right side:
    * left rows get a random salt in [0, salt); the right side is exploded
    * `salt`-fold so every (key, salt) bucket finds its match. Right side
    * must be small enough to replicate (it is also broadcast).
    */
  def saltedJoin(skewedLeft: DataFrame, smallRight: DataFrame,
                 keyCol: String, salt: Int, seed: Long = 42): DataFrame = {
    require(salt > 0, "salt must be positive")
    val sC = saltName(skewedLeft.columns ++ smallRight.columns)
    val l = skewedLeft.withColumn(sC,
      (rand(seed) * salt).cast("int"))
    val r = smallRight.withColumn(sC,
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(broadcast(r), Seq(keyCol, sC)).drop(sC)
  }
}
