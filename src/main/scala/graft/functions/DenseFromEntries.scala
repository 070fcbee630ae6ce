package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense vector from sparse (index, value) entries as ONE codegen'd
  * expression: `array<struct<idx:int, v:double>>` → zero-filled
  * `array<double>` of `width` with `out(idx) = v` for every in-range
  * entry (out-of-range indexes and null entries skipped; later entries
  * win on duplicate indexes; a null entry list yields the zero vector).
  *
  * Replaces the `map_from_entries` + `transform(sequence, j ->
  * try_element_at(m, j))` composition: higher-order functions are
  * CodegenFallback expressions, and ONE of them in a projection drags
  * every downstream consumer — including codegen'd scoring expressions
  * like [[LinearScoreMatrix]] — through per-row interpreted evaluation
  * with full row boxing (measured on q95 at sf10: the fused score
  * matrix cost 18 s riding the HOF-built input vs ~2 s over this
  * expression, 500k rows).
  */
case class DenseFromEntries(child: Expression, width: Int)
  extends UnaryExpression {

  require(width > 0, s"width must be positive, got $width")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
      if a.dataType == IntegerType && b.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dense_from_entries needs array<struct<int, double>>, got " +
        other.simpleString(10))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val out = new Array[Double](width)
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var k = 0
      while (k < arr.numElements()) {
        if (!arr.isNullAt(k)) {
          val row = arr.getStruct(k, 2)
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            val i = row.getInt(0)
            if (i >= 0 && i < width) out(i) = row.getDouble(1)
          }
        }
        k += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val out = ctx.freshName("out")
    val k = ctx.freshName("k")
    val row = ctx.freshName("row")
    val i = ctx.freshName("i")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    ev.copy(code =
      code"""
         |${c.code}
         |double[] $out = new double[$width];
         |if (!${c.isNull}) {
         |  for (int $k = 0; $k < ${c.value}.numElements(); $k++) {
         |    if (!${c.value}.isNullAt($k)) {
         |      org.apache.spark.sql.catalyst.InternalRow $row =
         |        ${c.value}.getStruct($k, 2);
         |      if (!$row.isNullAt(0) && !$row.isNullAt(1)) {
         |        int $i = $row.getInt(0);
         |        if ($i >= 0 && $i < $width) $out[$i] = $row.getDouble(1);
         |      }
         |    }
         |  }
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DenseFromEntries =
    copy(child = newChild)
}

object DenseFromEntries {
  def apply(entries: Column, width: Int): Column =
    GraftSqlBridge.column(
      DenseFromEntries(GraftSqlBridge.expression(entries), width))
}
