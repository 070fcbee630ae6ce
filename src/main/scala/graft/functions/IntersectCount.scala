package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd |A ∩ B| for two `array<string>` columns — the LSH rerank
  * kernel. `size(array_intersect(a, b))` materializes the intersection
  * array through interpreted eval (~µs per element); candidate sets are
  * large pre-filter, so the rerank dominated minhash wall time. This
  * builds one hash set from the smaller side and counts hits from the
  * larger — no intermediate array, whole-stage codegen.
  *
  * Matches array_intersect's set semantics: duplicates count once
  * (both sides are deduped by the set/seen logic), and a null element
  * present in BOTH arrays counts as one common element — exactly what
  * `size(array_intersect(a, b))` returns.
  */
case class IntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count needs (array<string>, array<string>), " +
          s"got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(lv: Any, rv: Any): Any =
    IntersectCount.count(lv.asInstanceOf[ArrayData], rv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {

  /** Shared by eval and generated code. */
  def count(l: ArrayData, r: ArrayData): Int = {
    val (small, big) =
      if (l.numElements() <= r.numElements()) (l, r) else (r, l)
    val set = new java.util.HashSet[UTF8String](small.numElements() * 2)
    var smallHasNull = false
    var i = 0
    while (i < small.numElements()) {
      if (small.isNullAt(i)) smallHasNull = true
      else set.add(small.getUTF8String(i))
      i += 1
    }
    var c = 0
    var nullPending = smallHasNull // null-in-both counts once
    i = 0
    while (i < big.numElements() && (!set.isEmpty || nullPending)) {
      if (big.isNullAt(i)) { if (nullPending) { c += 1; nullPending = false } }
      else if (set.remove(big.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Column API: `intersect_count(a, b) -> int`. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      IntersectCount(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
