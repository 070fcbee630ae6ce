package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd distinct word n-gram shingles: given `array<string>` tokens,
  * emit the space-joined n-grams in first-occurrence order with duplicates
  * removed — the fused equivalent of
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ", slice(...))))`.
  *
  * The built-in composition runs interpreted (HOF lambdas) and
  * `array_distinct` is O(grams²) string compares; together they dominate
  * the CPU of every shingle-based dedup (Jaccard inverted index, MinHash
  * signatures). This loop builds each gram once with `UTF8String.concatWs`
  * and dedups through a LinkedHashSet, inside whole-stage codegen.
  *
  * Fewer than n tokens → empty array. Null tokens are skipped within a
  * gram (concat_ws semantics).
  */
case class NGramShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_shingles needs array<string>, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    NGramShingles.build(toks, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.NGramShingles.build($toks, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramShingles =
    copy(child = newChild)
}

object NGramShingles {

  /** Shared by eval and generated code: one pass, one LinkedHashSet. */
  def build(toks: ArrayData, n: Int): GenericArrayData = {
    val total = toks.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= total - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        // null tokens → concat_ws skips them (UTF8String.concatWs ignores
        // null inputs), matching the built-in composition.
        parts(j) = if (toks.isNullAt(i + j)) null
          else toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Column API: distinct word n-grams of a token array. */
  def apply(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(NGramShingles(GraftSqlBridge.expression(tokens), n))
}
