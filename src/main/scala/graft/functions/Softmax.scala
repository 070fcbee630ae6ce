package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Max-shifted softmax of a score vector in one codegen'd pass —
  * bit-identical to `LogRegModel.predictProba`'s normalization
  * (subtract max, exp, divide by sum), so expression-scored
  * probabilities agree exactly with the driver-side model's. The HOF
  * spelling (`transform` + `aggregate` chains) re-evaluates the max/sum
  * aggregates per element and runs interpreted; this is one linear
  * loop. Null elements read as 0.0 score; an empty array passes
  * through; a null row is null.
  */
case class Softmax(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"softmax needs array<double>, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    if (n > 0) {
      var i = 0
      while (i < n) { out(i) = if (x.isNullAt(i)) 0.0 else x.getDouble(i); i += 1 }
      var mx = out(0); i = 1
      while (i < n) { if (out(i) > mx) mx = out(i); i += 1 }
      var sum = 0.0; i = 0
      while (i < n) { out(i) = math.exp(out(i) - mx); sum += out(i); i += 1 }
      i = 0
      while (i < n) { out(i) /= sum; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $x.numElements();
         |double[] $out = new double[$n];
         |if ($n > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $x.isNullAt($i) ? 0.0 : $x.getDouble($i);
         |  }
         |  double $mx = $out[0];
         |  for (int $i = 1; $i < $n; $i++) {
         |    if ($out[$i] > $mx) $mx = $out[$i];
         |  }
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = java.lang.Math.exp($out[$i] - $mx);
         |    $sum += $out[$i];
         |  }
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] /= $sum; }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Softmax =
    copy(child = newChild)
}

object Softmax {
  def apply(c: Column): Column =
    GraftSqlBridge.column(Softmax(GraftSqlBridge.expression(c)))
}
