package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-hot / multi-hot / dict vectorization over a fitted vocabulary as
  * ONE fused expression with an O(1) hash lookup per input value.
  *
  * The composed alternative — `array(vocab.map(v => when(col === v, …)))`
  * — is a JIT cliff twice over: Janino refuses the generated projection
  * outright past ~500 vocab entries ("Code grows beyond 64 KB", measured
  * at width 512), the stage silently drops to interpreted evaluation,
  * and the interpreted row cost is O(vocab) per row on top (measured
  * 15–21 s per 100k rows at width 4096; a 2^16 vocab — the Encoderizer
  * default cap — would be ~16× worse). Same cliff class SrpBandKeys
  * closed for SRP signatures; this closes it for every vocabulary stage.
  *
  * Modes (selected by the child's type):
  *  - string        → one-hot (1.0 at the value's index; unseen/null → 0s)
  *  - array<string> → multi-hot (1.0 at each member's index)
  *  - map<string,double> → dict expansion (value at each key's index)
  *
  * A null input yields the ALL-ZERO vector (never null), matching the
  * composed stages' unseen/null behavior.
  */
case class VocabVector(child: Expression, vocab: Array[String])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case MapType(StringType, DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vocab_vector needs string, array<string> or map<string,double>, " +
        s"got ${other.simpleString(10)}")
  }

  // UTF8String-keyed so probe values need no conversion; built once on
  // the driver and shipped as a codegen reference object.
  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.length * 2)
    var i = 0
    while (i < vocab.length) {
      m.putIfAbsent(UTF8String.fromString(vocab(i)), i) // first wins on dups
      i += 1
    }
    m
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val out = new Array[Double](vocab.length)
    if (v != null) child.dataType match {
      case StringType =>
        val i = index.get(v.asInstanceOf[UTF8String])
        if (i != null) out(i) = 1.0
      case ArrayType(StringType, _) =>
        val arr = v.asInstanceOf[ArrayData]
        var k = 0
        while (k < arr.numElements()) {
          if (!arr.isNullAt(k)) {
            val i = index.get(arr.getUTF8String(k))
            if (i != null) out(i) = 1.0
          }
          k += 1
        }
      case MapType(StringType, DoubleType, _) =>
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray()
        val vals = m.valueArray()
        var k = 0
        while (k < m.numElements()) {
          val i = index.get(keys.getUTF8String(k))
          if (i != null && !vals.isNullAt(k)) out(i) = vals.getDouble(k)
          k += 1
        }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("vocabIndex", index, "java.util.HashMap")
    val c = child.genCode(ctx)
    val out = ctx.freshName("out")
    val i = ctx.freshName("i")
    val k = ctx.freshName("k")
    val fill = child.dataType match {
      case StringType =>
        s"""
           |Integer $i = (Integer) $idx.get(${c.value});
           |if ($i != null) $out[$i.intValue()] = 1.0;
         """.stripMargin
      case ArrayType(StringType, _) =>
        s"""
           |for (int $k = 0; $k < ${c.value}.numElements(); $k++) {
           |  if (!${c.value}.isNullAt($k)) {
           |    Integer $i = (Integer) $idx.get(${c.value}.getUTF8String($k));
           |    if ($i != null) $out[$i.intValue()] = 1.0;
           |  }
           |}
         """.stripMargin
      case MapType(StringType, DoubleType, _) =>
        val keys = ctx.freshName("keys")
        val vals = ctx.freshName("vals")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $keys = ${c.value}.keyArray();
           |org.apache.spark.sql.catalyst.util.ArrayData $vals = ${c.value}.valueArray();
           |for (int $k = 0; $k < ${c.value}.numElements(); $k++) {
           |  Integer $i = (Integer) $idx.get($keys.getUTF8String($k));
           |  if ($i != null && !$vals.isNullAt($k)) {
           |    $out[$i.intValue()] = $vals.getDouble($k);
           |  }
           |}
         """.stripMargin
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    ev.copy(code =
      code"""
         |${c.code}
         |double[] $out = new double[${vocab.length}];
         |if (!${c.isNull}) {
         |  $fill
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): VocabVector =
    copy(child = newChild)
}

object VocabVector {
  /** Column API: `vocab_vector(c, vocab) -> array<double>`. */
  def apply(c: Column, vocab: Seq[String]): Column =
    GraftSqlBridge.column(
      VocabVector(GraftSqlBridge.expression(c), vocab.toArray))
}
