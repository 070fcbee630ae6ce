package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd cosine similarity of two `array<double>` columns — one fused
  * loop computing dot, |a|² and |b|² together. The built-in composition
  * (`aggregate(zip_with(...))` three times) evaluates interpreted lambdas
  * with per-element boxing and allocates a zipped array per pair — the
  * dominant cost of brute-force kNN and LSH rerank at bench scale. This
  * expression keeps the whole similarity scan inside one WholeStageCodegen
  * span.
  *
  * Matches the HOF semantics on well-formed input (equal lengths, no null
  * elements): zero-norm on either side → 0.0. Extra trailing elements of
  * the longer array are ignored; null elements are skipped pairwise.
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim needs (array<double>, array<double>), " +
          s"got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(lv: Any, rv: Any): Any = {
    val a = lv.asInstanceOf[ArrayData]
    val b = rv.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |}
         |double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($d == 0.0) ? 0.0 : ($dot / $d);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column API: `cosine_sim(a, b) -> double`. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
