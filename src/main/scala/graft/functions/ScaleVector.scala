package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** Scale an ml `Vector` column by a plan-time constant — the
  * `transformer_weights` block scaling of the Encoderizer transform path
  * (reference `encoder.py:112`, FeatureUnion semantics) as a native
  * Catalyst expression instead of the Scala UDF it first shipped as.
  *
  * Operates on the VectorUDT's serialized form directly
  * (`struct<type:tinyint, size:int, indices:array<int>,
  * values:array<double>>`, type 0 = sparse / 1 = dense): sparsity is
  * PRESERVED (indices copied, values multiplied — a 2^18-wide hashed-text
  * vector with tens of non-zeros allocates tens of doubles, never the
  * dense width), and the projection stays inside whole-stage codegen —
  * no UDT deserialization, no UDF serde wall, no boxed SparseVector per
  * row. Null row → null.
  */
case class ScaleVector(child: Expression, w: Double)
  extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case udt: org.apache.spark.sql.types.UserDefinedType[_]
      if udt.userClass == classOf[org.apache.spark.ml.linalg.Vector] =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"scale_vector needs an ml VectorUDT column, got " +
        other.simpleString(10))
  }

  /** Shared by eval and generated code: copy the serialized vector row,
    * multiplying only `values`; `size`/`indices` pass through (null for
    * the dense layout, populated for sparse).
    */
  def scale(row: InternalRow): InternalRow = {
    val vals = row.getArray(3)
    val n = vals.numElements()
    val scaled = new Array[Double](n)
    var i = 0
    while (i < n) { scaled(i) = vals.getDouble(i) * w; i += 1 }
    val out = new GenericInternalRow(4)
    out.setByte(0, row.getByte(0))
    if (row.isNullAt(1)) out.setNullAt(1) else out.setInt(1, row.getInt(1))
    if (row.isNullAt(2)) out.setNullAt(2)
    else out.update(2, new GenericArrayData(row.getArray(2).toIntArray()))
    out.update(3, new GenericArrayData(scaled))
    out
  }

  override def nullSafeEval(v: Any): Any = scale(v.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scaleVector", this,
      classOf[ScaleVector].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.scale($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): ScaleVector =
    copy(child = newChild)
}

object ScaleVector {
  /** Column API: `scale_vector(vec, w)`. */
  def apply(c: Column, w: Double): Column =
    GraftSqlBridge.column(ScaleVector(GraftSqlBridge.expression(c), w))
}
