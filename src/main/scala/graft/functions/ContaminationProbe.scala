package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The streaming-decontamination per-document probe
  * (`Streams.contaminationFilter`) as a codegen'd expression — the last
  * per-row UDF on a 100 TB-path operator, fused the same way as
  * [[SliceExtend]]/[[ExtendSeeds]]: the expression delegates to the SAME
  * winnow + extension kernels the UDF called
  * (`WinnowAnchors.winnow`, `SubstringDedup.extendSeeds`), so fusing
  * changes only the execution vehicle (boxed String marshalling +
  * catalyst result converters per row → one virtual call inside the
  * whole-stage-codegen'd projection), never the arithmetic. Parity with
  * the batch `crossSpans` twin stays spec-pinned on adversarial corpora.
  *
  * The broadcast sidecar carries the STATIC benchmark suite: the anchor
  * hash → (bench row, position) inverted map, the pre-decoded code-point
  * texts, and the bench ids (contamination counts DISTINCT bench doc
  * IDS, not sidecar row indices — a duplicated bench doc counts once,
  * matching crossSpans' (corpus_id, bench_id) grouping).
  *
  * Returns `struct<contaminated:boolean, n_bench_docs:int, max_span:int>`
  * — never null: null/short text is a CLEAN document (false, 0, 0),
  * exactly as the UDF behaved.
  */
case class ContaminationProbe(
    child: Expression,
    sidecar: Broadcast[(Map[Long, List[(Int, Int)]], Array[Array[Int]],
      Array[Long])],
    k: Int, minLen: Int, maxPosPerHash: Int)
  extends UnaryExpression {

  override def dataType: DataType = ContaminationProbe.OutType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"contamination_probe needs string, got ${other.simpleString(10)}")
  }

  override def eval(input: InternalRow): Any =
    probeRow(child.eval(input).asInstanceOf[UTF8String])

  /** Shared by eval and generated code (one virtual call per row). */
  def probeRow(text: UTF8String): InternalRow = {
    val (bh, bt, bids) = sidecar.value
    ContaminationProbe.probe(text, bh, bt, bids, k, minLen, maxPosPerHash)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("contamProbe", this,
      classOf[ContaminationProbe].getName)
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${c.code}
         |InternalRow ${ev.value} =
         |  $ref.probeRow(${c.isNull} ? null : ${c.value});
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ContaminationProbe = copy(child = newChild)
}

object ContaminationProbe {

  private[graft] val OutType: DataType = StructType(Seq(
    StructField("contaminated", BooleanType, nullable = false),
    StructField("n_bench_docs", IntegerType, nullable = false),
    StructField("max_span", IntegerType, nullable = false)))

  /** The UDF's exact body over an UTF8String input: decode the incoming
    * doc ONCE (winnow and every extension share the code points), group
    * candidate seeds per bench doc, one extension pass each.
    */
  def probe(text: UTF8String, bh: Map[Long, List[(Int, Int)]],
            bt: Array[Array[Int]], bids: Array[Long],
            k: Int, minLen: Int, maxPosPerHash: Int): InternalRow = {
    val w = minLen - k + 1
    if (text == null) return clean
    val s = text.toString
    if (s.length < minLen) return clean
    val cps = s.codePoints().toArray
    val (pos, hash) = WinnowAnchors.winnow(cps, k, w, maxPosPerHash)
    val seeds = new scala.collection.mutable.HashMap[Int, List[Long]]()
    var i = 0
    while (i < pos.length) {
      bh.getOrElse(hash(i), Nil).foreach { case (bi, bp) =>
        seeds(bi) = (pos(i).toLong << 32 | bp.toLong) ::
          seeds.getOrElse(bi, Nil)
      }
      i += 1
    }
    val hitIds = new scala.collection.mutable.HashSet[Long]()
    var maxSpan = 0
    seeds.foreach { case (bi, ss) =>
      val spans = graft.dedup.SubstringDedup
        .extendSeeds(cps, bt(bi), ss, k, minLen)
      if (spans.nonEmpty) {
        hitIds += bids(bi)
        spans.foreach(sp => if (sp.len > maxSpan) maxSpan = sp.len)
      }
    }
    new GenericInternalRow(Array[Any](hitIds.nonEmpty, hitIds.size, maxSpan))
  }

  private def clean: InternalRow =
    new GenericInternalRow(Array[Any](false, 0, 0))

  def apply(text: Column,
            sidecar: Broadcast[(Map[Long, List[(Int, Int)]],
              Array[Array[Int]], Array[Long])],
            k: Int, minLen: Int, maxPosPerHash: Int): Column =
    GraftSqlBridge.column(ContaminationProbe(
      GraftSqlBridge.expression(text), sidecar, k, minLen, maxPosPerHash))
}
