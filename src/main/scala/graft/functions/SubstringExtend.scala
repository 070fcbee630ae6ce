package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd kernels for the substring-dedup extension stages — the
  * expression forms of what were the last three per-row UDFs on a
  * 100 TB-path operator (ADVICE/VERDICT r11 item 5). Each delegates to
  * the same package-shared kernel functions the UDFs called
  * (`SubstringDedup.extendInSlice` / `extendSeeds`), so fusing changes
  * the execution vehicle (boxed UDF serialization → whole-stage
  * codegen), never the arithmetic: parity with the UDF route is
  * structural and spec-pinned under CODEGEN_ONLY.
  */

/** All ±minLen slices of one document in ONE call (the two-phase route's
  * phase-1 input): for each anchor position `p` (code points, 0-based),
  * the slice of `k + 2·minLen` code points starting at
  * `max(0, p − minLen)`, with the document's code-point length so
  * downstream extension can tell slice edges from document edges.
  * Returns `array<struct<pos:int, off:int, dlen:int, sl:string>>`.
  * The text is code-point-converted exactly once per document — the
  * two-phase route's core guarantee (never per anchor, never per pair).
  */
case class AnchorSlices(text: Expression, positions: Expression,
                        k: Int, minLen: Int) extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = positions

  override def dataType: DataType = AnchorSlices.OutType

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, positions.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"anchor_slices needs (string, array<int>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(t: Any, ps: Any): Any =
    AnchorSlices.build(t.asInstanceOf[UTF8String],
      ps.asInstanceOf[ArrayData], k, minLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, ps) =>
      s"${ev.value} = graft.functions.AnchorSlices.build($t, $ps, $k, $minLen);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AnchorSlices =
    copy(text = newLeft, positions = newRight)
}

object AnchorSlices {

  private[functions] val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("off", IntegerType, nullable = false),
      StructField("dlen", IntegerType, nullable = false),
      StructField("sl", StringType, nullable = false))),
    containsNull = false)

  /** Shared by eval and generated code. */
  def build(text: UTF8String, ps: ArrayData, k: Int,
            minLen: Int): GenericArrayData = {
    val cps = text.toString.codePoints().toArray
    val cap = k + 2 * minLen
    val n = ps.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val p = ps.getInt(i)
      val off = math.max(0, p - minLen)
      val len = math.min(cps.length - off, cap)
      out(i) = new GenericInternalRow(Array[Any](p, off, cps.length,
        UTF8String.fromString(new String(cps, off, len))))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, positions: Column, k: Int, minLen: Int): Column =
    GraftSqlBridge.column(AnchorSlices(GraftSqlBridge.expression(text),
      GraftSqlBridge.expression(positions), k, minLen))
}

/** Phase-1 per-seed verdict over two ±minLen slices —
  * `SubstringDedup.extendInSlice` as a codegen'd expression. Children
  * (in order): slA, offA, dlenA, pa, slB, offB, dlenB, pb. Returns
  * `array<int>` `[kind, start_a, start_b, len]` (kinds:
  * SliceReject/SliceSpan/SliceEscalate — see the kernel's doc).
  */
case class SliceExtend(children: Seq[Expression], k: Int, minLen: Int)
  extends Expression {

  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val want = Seq(StringType, IntegerType, IntegerType, IntegerType,
      StringType, IntegerType, IntegerType, IntegerType)
    if (children.length != 8)
      TypeCheckResult.TypeCheckFailure(
        s"slice_extend needs 8 inputs, got ${children.length}")
    else children.map(_.dataType).zip(want).zipWithIndex.collectFirst {
      case ((got, need), i) if got != need =>
        TypeCheckResult.TypeCheckFailure(
          s"slice_extend input $i needs ${need.simpleString(10)}, " +
            s"got ${got.simpleString(10)}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def eval(input: InternalRow): Any = {
    val vs = new Array[Any](8)
    var i = 0
    while (i < 8) {
      vs(i) = children(i).eval(input)
      if (vs(i) == null) return null
      i += 1
    }
    SliceExtend.build(
      vs(0).asInstanceOf[UTF8String], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Int],
      vs(4).asInstanceOf[UTF8String], vs(5).asInstanceOf[Int],
      vs(6).asInstanceOf[Int], vs(7).asInstanceOf[Int], k, minLen)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val childCode = gens.map(_.code.toString).mkString("\n")
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    val args = (gens.map(_.value.toString) ++
      Seq(k.toString, minLen.toString)).mkString(", ")
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
         |$childCode
         |boolean ${ev.isNull} = $anyNull;
         |$javaType ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.SliceExtend.build($args);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SliceExtend =
    copy(children = newChildren)
}

object SliceExtend {

  /** Shared by eval and generated code. */
  def build(slA: UTF8String, offA: Int, dlenA: Int, pa: Int,
            slB: UTF8String, offB: Int, dlenB: Int, pb: Int,
            k: Int, minLen: Int): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(graft.dedup.SubstringDedup.extendInSlice(
        slA.toString, offA, dlenA, pa, slB.toString, offB, dlenB, pb,
        k, minLen))

  def apply(slA: Column, offA: Column, dlenA: Column, pa: Column,
            slB: Column, offB: Column, dlenB: Column, pb: Column,
            k: Int, minLen: Int): Column =
    GraftSqlBridge.column(SliceExtend(
      Seq(slA, offA, dlenA, pa, slB, offB, dlenB, pb)
        .map(GraftSqlBridge.expression), k, minLen))
}

/** Full-text seed extension for one candidate pair —
  * `SubstringDedup.extendSeeds` as a codegen'd expression: both texts,
  * the pair's packed `(posA << 32 | posB)` seeds, out come the maximal
  * spans `array<struct<sa:int, sb:int, len:int>>` (0-based code-point
  * starts; covered-seed skip and >= minLen filtering inside the
  * kernel).
  */
case class ExtendSeeds(ta: Expression, tb: Expression, seeds: Expression,
                       k: Int, minLen: Int) extends TernaryExpression {

  override def first: Expression = ta
  override def second: Expression = tb
  override def third: Expression = seeds

  override def dataType: DataType = ExtendSeeds.OutType

  override def checkInputDataTypes(): TypeCheckResult =
    (ta.dataType, tb.dataType, seeds.dataType) match {
      case (StringType, StringType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, s) => TypeCheckResult.TypeCheckFailure(
        s"extend_seeds needs (string, string, array<bigint>), got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, ${s.simpleString(10)})")
    }

  override def nullSafeEval(a: Any, b: Any, s: Any): Any =
    ExtendSeeds.build(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      s.asInstanceOf[ArrayData], k, minLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, s) =>
      s"${ev.value} = graft.functions.ExtendSeeds.build($a, $b, $s, $k, $minLen);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): ExtendSeeds =
    copy(ta = newFirst, tb = newSecond, seeds = newThird)
}

object ExtendSeeds {

  private[functions] val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("sa", IntegerType, nullable = false),
      StructField("sb", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)

  /** Shared by eval and generated code. */
  def build(ta: UTF8String, tb: UTF8String, seeds: ArrayData,
            k: Int, minLen: Int): GenericArrayData = {
    val spans = graft.dedup.SubstringDedup.extendSeeds(
      ta.toString, tb.toString, seeds.toLongArray().toSeq, k, minLen)
    val out = new Array[Any](spans.length)
    var i = 0
    while (i < spans.length) {
      val s = spans(i)
      out(i) = new GenericInternalRow(Array[Any](s.sa, s.sb, s.len))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(ta: Column, tb: Column, seeds: Column,
            k: Int, minLen: Int): Column =
    GraftSqlBridge.column(ExtendSeeds(GraftSqlBridge.expression(ta),
      GraftSqlBridge.expression(tb), GraftSqlBridge.expression(seeds),
      k, minLen))
}
