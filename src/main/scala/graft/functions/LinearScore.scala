package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd linear scorer: `bias + Σ weights(i) * x(i)` over an
  * `array<double>` column — the model-inference hot path as a native
  * Catalyst expression instead of a Scala UDF (SURVEY.md §7.3 preference
  * order: a UDF boxes every element and breaks whole-stage codegen; this
  * expression compiles into the generated loop with the weights held as a
  * referenced object, so a batch-prediction projection stays inside one
  * WholeStageCodegen span).
  *
  * Rows whose array is shorter than the weight vector score only the
  * present prefix; elements beyond the weights are ignored.
  */
case class LinearScore(child: Expression, weights: Array[Double], bias: Double)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"linear_score needs array<double>, got ${other.simpleString(10)}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var s = bias
    val n = math.min(arr.numElements(), weights.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) s += weights(i) * arr.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double ${ev.value}_acc = $bias;
         |int $n = java.lang.Math.min($arr.numElements(), $wRef.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    ${ev.value}_acc += $wRef[$i] * $arr.getDouble($i);
         |  }
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LinearScore =
    copy(child = newChild)
}

object LinearScore {
  /** Column API: `linear_score(features, weights, bias)`. */
  def apply(c: Column, weights: Array[Double], bias: Double): Column =
    GraftSqlBridge.column(
      LinearScore(GraftSqlBridge.expression(c), weights, bias))
}
