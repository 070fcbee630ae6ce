package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(h)` as a codegen'd predicate over a BROADCAST
  * sketch — the prefilter of [[graft.dedup.Dedup.dedupAgainstCorpus]].
  * The sketch rides a `Broadcast` handle (executors fetch it once per
  * JVM), never the task binary: a snapshot-scale bloom is tens of MB,
  * and serializing it into every task would multiply it by the task
  * count. Null input → null (no row is claimed present or absent).
  * No false negatives by bloom contract — a false TRUE is later removed
  * by the exact confirm join, a FALSE is definitive absence.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs bigint, got ${other.simpleString(10)}")
  }

  /** Shared by eval and generated code. */
  def test(h: Long): Boolean = bloom.value.mightContainLong(h)

  override def nullSafeEval(v: Any): Any = test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMc", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.test($h);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  def apply(c: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(c), bloom))
}
