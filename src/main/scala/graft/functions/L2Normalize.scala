package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd L2 normalization of an `array<double>` column — one fused
  * pass for the squared norm, one for the scale. The HOF composition
  * (`transform(c, e => e / sqrt(aggregate(...)))`) re-evaluates the norm
  * aggregate INSIDE the per-element lambda — O(d²) interpreted work per
  * row — because higher-order functions neither codegen nor hoist
  * loop-invariant subtrees. This is the quantizer-input transform of the
  * IVF and SemDeDup paths, evaluated once per corpus row.
  *
  * An all-zero (or all-null-element) vector passes through unchanged
  * rather than turning into NaNs, which would poison KMeans; it lands in
  * some cell and reranks at cosine 0. Null elements are preserved
  * as-is and contribute 0 to the norm.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType,
    child.dataType.asInstanceOf[ArrayType].containsNull)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"l2_normalize needs array<double>, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var n2 = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { val x = a.getDouble(i); n2 += x * x }
      i += 1
    }
    if (n2 == 0.0) return a.copy()
    val inv = 1.0 / math.sqrt(n2)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!a.isNullAt(i)) out(i) = a.getDouble(i) * inv
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val n2 = ctx.freshName("n2")
      val x = ctx.freshName("x")
      val inv = ctx.freshName("inv")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $n2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $x = $a.getDouble($i);
         |    $n2 += $x * $x;
         |  }
         |}
         |if ($n2 == 0.0) {
         |  ${ev.value} = $a.copy();
         |} else {
         |  double $inv = 1.0 / java.lang.Math.sqrt($n2);
         |  Object[] $out = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $out[$i] = (Double) ($a.getDouble($i) * $inv);
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {
  /** Column API: `l2_normalize(a) -> array<double>`. */
  def apply(a: Column): Column =
    GraftSqlBridge.column(L2Normalize(GraftSqlBridge.expression(a)))
}
