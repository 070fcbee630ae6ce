package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  *   3. `last(payloadStruct, ignoreNulls)` over unbounded-preceding fills
  *      each left row with the latest right payload at-or-before it. The
  *      payloads travel as ONE struct so a matched right row whose payload
  *      value is legitimately NULL still overwrites the older value (the
  *      struct itself is non-null for every right row) — filling each
  *      payload column independently would skip it and bleed the older
  *      payload forward;
  *   4. keep left rows, unpack the struct.
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

    // Temp names are derived from a prefix no caller column starts with, so
    // they can never shadow or collide with user columns.
    val taken = (leftCols ++ payloadCols).toSet
    val pre = Iterator.iterate("_asof_")(_ + "_")
      .find(p => !taken.exists(_.startsWith(p))).get
    val kC = pre + "key"; val tsC = pre + "ts"
    val srcC = pre + "src"; val payC = pre + "pay"

    val payType = StructType(payloadCols.map(c => right.schema(c)))

    val l = left
      .select(Seq(col(keyCol).as(kC), col(leftTsCol).as(tsC),
        lit(1).as(srcC)) ++
        leftCols.map(col) :+
        lit(null).cast(payType).as(payC): _*)
    val r = right
      .select(Seq(col(keyCol).as(kC), col(rightTsCol).as(tsC),
        lit(0).as(srcC)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(c => col(c).as(c)): _*).as(payC): _*)

    val w = Window.partitionBy(kC)
      .orderBy(col(tsC).asc, col(srcC).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn(payC, last(col(payC), ignoreNulls = true).over(w))
    filled.filter(col(srcC) === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(payC).getField(c).as(c)): _*)
  }
}
