package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** All linear class scores of an ml `Vector` feature row in ONE fused
  * expression — the sparse sibling of [[LinearScoreMatrix]]. The weight
  * matrix rides along row-major as a referenced `double[]` (each row
  * `stride = d + 1` long, bias LAST — the LogRegModel layout) and the
  * kernel walks ONLY the vector's active entries: for hashed-text
  * features (2^18-wide, ~tens of non-zeros per row) densifying to
  * `array<double>` to reuse the dense expression would materialize five
  * orders of magnitude of zeros per row.
  *
  * Operates on the VectorUDT's serialized form directly
  * (`struct<type:tinyint, size:int, indices:array<int>,
  * values:array<double>>`, type 0 = sparse / 1 = dense), so the whole
  * projection stays in whole-stage codegen — no UDT deserialization, no
  * UDF serde wall. Replaces the per-row Scala UDF the text-prediction
  * path shipped first (same plan shape, but the UDF boxed a SparseVector
  * per row and broke the codegen span).
  *
  * Out-of-range sparse indices (a vector wider than the weight rows)
  * are skipped, matching the dense expression's prefix rule; a null row
  * is null.
  */
case class SparseScoreMatrix(child: Expression, weights: Array[Double],
                             nClasses: Int)
  extends UnaryExpression {

  require(nClasses > 0 && weights.length % nClasses == 0,
    s"weights length ${weights.length} is not a multiple of $nClasses classes")
  private val stride = weights.length / nClasses // d + 1, bias last

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case udt: org.apache.spark.sql.types.UserDefinedType[_]
      if udt.userClass == classOf[org.apache.spark.ml.linalg.Vector] =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sparse_score_matrix needs an ml VectorUDT column, got " +
        other.simpleString(10))
  }

  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val out = new Array[Double](nClasses)
    var c = 0
    while (c < nClasses) { out(c) = weights(c * stride + stride - 1); c += 1 }
    if (row.getByte(0) == 0.toByte) { // sparse
      val idx = row.getArray(2)
      val vals = row.getArray(3)
      val nnz = idx.numElements()
      var p = 0
      while (p < nnz) {
        val i = idx.getInt(p)
        if (i >= 0 && i < stride - 1) {
          val x = vals.getDouble(p)
          var c2 = 0
          while (c2 < nClasses) { out(c2) += weights(c2 * stride + i) * x; c2 += 1 }
        }
        p += 1
      }
    } else { // dense
      val vals = row.getArray(3)
      val n = math.min(vals.numElements(), stride - 1)
      var j = 0
      while (j < n) {
        val x = vals.getDouble(j)
        var c2 = 0
        while (c2 < nClasses) { out(c2) += weights(c2 * stride + j) * x; c2 += 1 }
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    val adCls = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, x => {
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val vals = ctx.freshName("vals")
      val nnz = ctx.freshName("nnz")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val c2 = ctx.freshName("c2")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      s"""
         |double[] $out = new double[$nClasses];
         |for (int $c = 0; $c < $nClasses; $c++) {
         |  $out[$c] = $wRef[$c * $stride + ${stride - 1}];
         |}
         |if ($x.getByte(0) == (byte) 0) {
         |  $adCls $idx = $x.getArray(2);
         |  $adCls $vals = $x.getArray(3);
         |  int $nnz = $idx.numElements();
         |  for (int $p = 0; $p < $nnz; $p++) {
         |    int $i = $idx.getInt($p);
         |    if ($i >= 0 && $i < ${stride - 1}) {
         |      double $xv = $vals.getDouble($p);
         |      for (int $c2 = 0; $c2 < $nClasses; $c2++) {
         |        $out[$c2] += $wRef[$c2 * $stride + $i] * $xv;
         |      }
         |    }
         |  }
         |} else {
         |  $adCls $vals = $x.getArray(3);
         |  int $n = java.lang.Math.min($vals.numElements(), ${stride - 1});
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $xv = $vals.getDouble($j);
         |    for (int $c2 = 0; $c2 < $nClasses; $c2++) {
         |      $out[$c2] += $wRef[$c2 * $stride + $j] * $xv;
         |    }
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SparseScoreMatrix =
    copy(child = newChild)
}

object SparseScoreMatrix {
  /** Column API over a k × (d+1) weight matrix (bias last per row). */
  def apply(c: Column, weights: Array[Array[Double]]): Column = {
    require(weights.nonEmpty && weights.map(_.length).distinct.length == 1,
      "weight rows must be non-empty and equal length")
    GraftSqlBridge.column(SparseScoreMatrix(GraftSqlBridge.expression(c),
      weights.flatten, weights.length))
  }
}
