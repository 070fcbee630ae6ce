package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact 128-bit sum of a BIGINT column, evaluating to DECIMAL(38,0) —
  * the allocation-free vehicle for the engine-invariant "integer units"
  * aggregates (q01's cent/micro-unit sums and exact averages).
  *
  * Why not `sum(CAST(x AS DECIMAL(38,0)))`: any per-row path through
  * Spark's `Decimal` with precision > 18 leaves the long-backed compact
  * representation — every row then allocates `java.math.BigDecimal`s and
  * branches through the compact/inflated split inside the generated
  * aggregate loop. Measured on this host (DecimalAggProbe, fresh JVMs,
  * sf0.1): the wide-decimal q01 is 3-5x slower at BEST, and the
  * profile-polluted branches intermittently throw HotSpot into
  * deopt/recompile storms where one aggregate task burns 20-75 s of pure
  * CPU for work that takes 0.3 s compiled — while the all-long twin of
  * the same query never left 0.26-0.44 s across every fresh-JVM run.
  *
  * The accumulator is two longs (hi, lo) forming a signed 128-bit
  * integer: update adds the sign-extended input to (hi, lo) with the
  * classic carry-save formula — `carry = ((lo & x) | ((lo | x) & ~sum))
  * >>> 63` — in pure long/bitwise expressions, so the generated code is
  * branch-free, allocation-free, and stays inside whole-stage codegen's
  * long fast paths. All limb adds are constructed in LEGACY eval mode:
  * limb arithmetic MUST wrap (that is what the carry corrects), and an
  * ANSI session would otherwise throw on a legitimate lo-limb overflow.
  * The single materialization to DECIMAL(38,0) happens once per GROUP
  * ([[Long128ToDecimal]]), not once per row.
  *
  * Exactness: 128-bit signed accumulation is exact until |sum| reaches
  * 2^127 ~ 1.7e38. For |sum| in [1e38, 2^127) — past DECIMAL(38,0)'s
  * own range — the group evaluates to NULL, matching what a LEGACY-mode
  * `sum(CAST(x AS DECIMAL(38,0)))` returns on precision overflow.
  * Beyond 2^127 the two-long accumulator wraps silently (a divergence
  * from the decimal sum, which stays NULL) — reaching it needs > 2^64
  * ~ 1.8e19 non-null rows even at max-long magnitude, far past any
  * stated corpus. Empty/all-null input returns NULL, matching `sum`.
  * At 100 TB the per-row work is three long adds and four bitwise
  * ops per aggregate — no decimal, no allocation, no JIT cliff.
  */
case class Sum128(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sum128 needs bigint, got ${other.simpleString(10)}")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  // Limb arithmetic must WRAP; ANSI sessions would throw on the
  // legitimate lo-limb overflow the carry formula corrects.
  private def addWrap(a: Expression, b: Expression): Expression =
    Add(a, b, NumericEvalContext(EvalMode.LEGACY,
      allowDecimalPrecisionLoss = true))

  /** Carry-out of the unsigned add `a + b = s` (s precomputed). */
  private def carryOut(a: Expression, b: Expression, s: Expression)
      : Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = child
    val newLo = addWrap(lo, x)
    // sign-extended 128-bit add: hi += (x >> 63) + carry(lo + x)
    val newHi = addWrap(addWrap(hi, ShiftRight(x, Literal(63))),
      carryOut(lo, x, newLo))
    Seq(
      If(IsNull(x), hi, newHi),
      If(IsNull(x), lo, newLo),
      Or(seen, IsNotNull(x)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = addWrap(lo.left, lo.right)
    val newHi = addWrap(addWrap(hi.left, hi.right),
      carryOut(lo.left, lo.right, newLo))
    Seq(newHi, newLo, Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(seen, Long128ToDecimal(hi, lo), Literal(null, DecimalType(38, 0)))

  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}

object Sum128 {

  /** `sum128(x)` as a Column aggregate. */
  def apply(c: Column): Column = GraftSqlBridge.column(
    Sum128(GraftSqlBridge.expression(c)).toAggregateExpression())
}

/** (hi, lo) signed-128 → DECIMAL(38,0); runs once per aggregate GROUP
  * (Sum128's evaluate), so the BigDecimal construction here is off the
  * per-row path by design. A value past DECIMAL(38,0)'s range (|v| >=
  * 1e38) evaluates to NULL — the LEGACY-mode decimal-sum overflow
  * contract — rather than throwing.
  */
case class Long128ToDecimal(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long128_to_decimal needs (bigint, bigint), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(hiV: Any, loV: Any): Any =
    Long128ToDecimal.toDecimal(hiV.asInstanceOf[Long], loV.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, l) =>
      s"""${ev.value} = graft.functions.Long128ToDecimal.toDecimal($h, $l);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Long128ToDecimal =
    copy(left = newLeft, right = newRight)
}

object Long128ToDecimal {

  private val TWO_64 = java.math.BigInteger.ONE.shiftLeft(64)
  private val TEN_38 = java.math.BigInteger.TEN.pow(38)

  /** Shared by eval and generated code; null on DECIMAL(38,0) overflow
    * (the legacy decimal-sum contract), never a throw.
    */
  def toDecimal(hi: Long, lo: Long): org.apache.spark.sql.types.Decimal = {
    val unsignedLo =
      if (lo >= 0) java.math.BigInteger.valueOf(lo)
      else java.math.BigInteger.valueOf(lo).add(TWO_64)
    val v = java.math.BigInteger.valueOf(hi).multiply(TWO_64).add(unsignedLo)
    if (v.abs.compareTo(TEN_38) >= 0) null
    else org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(v), 38, 0)
  }
}
