package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd MinHash signature: for each of `k` hash tables, the min over
  * the shingle set of `xxhash64(shingle, seed + t)` — bit-identical to the
  * built-in composition
  * `array_min(transform(shingles, s -> xxhash64(s, lit(seed + t))))`
  * (XxHash64 chains children: `hashLong(seed+t, hashUnsafeBytes(s, 42))`),
  * but hashes each shingle's BYTES once and derives the k per-table
  * variants with cheap `hashLong` folds — k× fewer string hashes, no
  * interpreted lambdas, one pass over the array.
  *
  * Empty shingle set → array of k nulls (`array_min` of an empty array is
  * null). Null shingles are skipped.
  */
case class MinHashSig(child: Expression, k: Int, seed: Long)
  extends UnaryExpression {

  require(k >= 1, s"need k >= 1 hash tables, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string>, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any =
    MinHashSig.build(v.asInstanceOf[ArrayData], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.MinHashSig.build($arr, $k, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Shared by eval and generated code. */
  def build(shingles: ArrayData, k: Int, seed: Long): GenericArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        // one bytes-hash per shingle (xxhash64's default seed 42), then k
        // cheap long folds — the chaining order of the XxHash64 expression
        val base = XXH64.hashUTF8String(shingles.getUTF8String(i), 42L)
        var t = 0
        while (t < k) {
          val h = XXH64.hashLong(seed + t, base)
          if (h < mins(t)) mins(t) = h
          t += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins)
  }

  /** Column API: `minhash_sig(shingles, k, seed) -> array<long>`. */
  def apply(shingles: Column, k: Int, seed: Long): Column =
    GraftSqlBridge.column(
      MinHashSig(GraftSqlBridge.expression(shingles), k, seed))
}
