package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multiplicity-preserving vocabulary-hit count over an `array<string>`
  * column — `size(filter(toks, t => t.isin(words: _*)))` as ONE fused
  * O(tokens) expression with an O(1) hash probe per token.
  *
  * The composed form evaluates an `In` literal chain per TOKEN —
  * O(tokens × vocab) string equality per row — which the honest bench
  * vehicle exposed as the whole cost of the stopword/language-ID family
  * (q33 at sf0.1: 1.31 s, ~125M string compares for 5 langs × ~50
  * markers × 500k tokens). Same fix class as [[VocabVector]] (hash set
  * as a codegen reference object), for counting instead of encoding.
  *
  * Counts every OCCURRENCE of a vocabulary member (repeats included —
  * stopword ratios and language-ID scores weight by occurrence, and
  * the DuckDB oracle's `len(list_filter(...))` counts the same way).
  * Null elements are skipped; a null ARRAY propagates null — exactly
  * like the composed `size(filter(...))` form it replaces and DuckDB's
  * `len(list_filter(...))`. (An earlier revision returned 0 there on
  * the premise that `tokens()` normalizes null text to an empty array;
  * it does not — `tokens(null)` is null — so a null-text document would
  * have silently diverged from the oracle in q31–q33.)
  */
case class VocabHits(child: Expression, vocab: Array[String])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vocab_hits needs array<string>, got ${other.simpleString(10)}")
  }

  // UTF8String-keyed so probe values need no conversion; built once on
  // the driver and shipped as a codegen reference object.
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.length * 2)
    vocab.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var hits = 0
    var k = 0
    while (k < arr.numElements()) {
      if (!arr.isNullAt(k) && set.contains(arr.getUTF8String(k))) hits += 1
      k += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("vocabSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, arr => {
      val hits = ctx.freshName("hits")
      val k = ctx.freshName("k")
      s"""
         |int $hits = 0;
         |for (int $k = 0; $k < $arr.numElements(); $k++) {
         |  if (!$arr.isNullAt($k) &&
         |      $s.contains($arr.getUTF8String($k))) $hits++;
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VocabHits =
    copy(child = newChild)
}

object VocabHits {
  def apply(tokens: Column, vocab: Seq[String]): Column =
    GraftSqlBridge.column(VocabHits(GraftSqlBridge.expression(tokens),
      vocab.toArray))
}
