package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most recent
  * right row with the same key and right.ts <= left.ts (backward,
  * inclusive). Spark has no native ASOF JOIN; per the extension preference
  * order this composes existing operators — the union + keyed-window
  * last-value technique — rather than a custom physical node:
  *
  *   1. union both sides tagged by origin, right payload nulled on left
  *      rows;
  *   2. one window per key ordered by (ts, origin) — right rows sort
  *      before left rows at equal timestamps so "inclusive" holds;
  *   3. `last(payload, ignoreNulls)` over unbounded-preceding fills each
  *      left row with the latest right payload at-or-before it;
  *   4. keep left rows.
  *
  * Scale: ONE shuffle of (left ∪ right) on the key — the same cost as the
  * sort-merge join an ASOF physical operator would do; no range explosion,
  * no per-row subquery. Skewed keys behave like any keyed window (salt
  * upstream if one key dominates).
  *
  * Right rows should be unique per (key, ts); if not, the greatest-
  * position duplicate wins (pre-aggregate for determinism).
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame,
               keyCol: String, leftTsCol: String, rightTsCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payloadCols.contains),
      "payload column names must not collide with left columns")

    val l = left
      .withColumn("_ts", col(leftTsCol))
      .withColumn("_src", lit(1))
      .select(Seq(col(keyCol).as("_key"), col("_ts"), col("_src")) ++
        leftCols.map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("_ts", col(rightTsCol))
      .withColumn("_src", lit(0))
      .select(Seq(col(keyCol).as("_key"), col("_ts"), col("_src")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(col): _*)

    val w = Window.partitionBy("_key")
      .orderBy(col("_ts").asc, col("_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_src") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(col): _*)
  }
}
