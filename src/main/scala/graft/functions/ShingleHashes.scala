package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** The minhash rerank's SLIM set representation: each shingle string
  * mapped to its 64-bit content hash (`XXH64.hashUTF8String(s, 42)` —
  * the SAME bytes-hash the [[MinHashSig]] signatures are built from),
  * sorted ascending. The exact-Jaccard rerank then joins these ~8 B/elem
  * arrays instead of the full string sets: at sf10 the string-set rerank
  * shuffled 4.8 GB of array payload between its two joins (measured —
  * the whole cost of q38's dominant stages); the hashed arrays cut that
  * ~3× and replace the per-pair hash-set intersection with a branch-
  * predictable sorted merge.
  *
  * Null elements are SKIPPED (matching array_intersect set semantics
  * where a null never matches a non-null; the shingle builders never
  * emit null elements). Duplicates in the input are KEPT (the builders
  * emit distinct shingles, so a duplicate hash can only arise from a
  * genuine 64-bit collision) so the array length stays |A| exactly.
  *
  * Exactness: Jaccard over hashed sets equals Jaccard over string sets
  * unless two DISTINCT shingles share an xxhash64 — probability
  * ~|S|²/2⁶⁵ over a corpus's distinct-shingle set S (≈2⁻²² even at
  * 10 B shingles), and DedupSimSpec pins zero collisions on the oracle
  * corpora plus randomized parity against the string-set rerank.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs array<string>, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.build(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.ShingleHashes.build($arr);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Shared by eval and generated code. */
  def build(shingles: ArrayData): GenericArrayData = {
    val n = shingles.numElements()
    var nonNull = 0
    var i = 0
    while (i < n) { if (!shingles.isNullAt(i)) nonNull += 1; i += 1 }
    val out = new Array[Long](nonNull)
    i = 0
    var j = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        out(j) = XXH64.hashUTF8String(shingles.getUTF8String(i), 42L)
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  def apply(shingles: Column): Column =
    GraftSqlBridge.column(ShingleHashes(GraftSqlBridge.expression(shingles)))
}

/** |A ∩ B| for two SORTED `array<long>` columns by linear merge — the
  * hashed-set twin of [[IntersectCount]]. Counts each matched VALUE once
  * (duplicate runs are skipped on both sides), so on duplicate-free
  * inputs it equals set-intersection size exactly. No per-pair hash-set
  * allocation, no hashing — two pointers and long compares.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs (array<long>, array<long>), " +
          s"got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(lv: Any, rv: Any): Any =
    SortedIntersectCount.count(lv.asInstanceOf[ArrayData],
      rv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Shared by eval and generated code. Inputs MUST be sorted ascending
    * (as [[ShingleHashes]] emits); null elements are not expected and
    * not handled — the producer's element type is non-nullable.
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        // skip duplicate runs so a matched value counts once per pair
        val v = x
        do i += 1 while (i < na && a.getLong(i) == v)
        do j += 1 while (j < nb && b.getLong(j) == v)
      }
    }
    c
  }

  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
