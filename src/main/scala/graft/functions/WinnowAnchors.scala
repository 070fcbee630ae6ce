package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS local fingerprinting scheme): rolling Karp-Rabin hashes of
  * every `k`-char gram, then the rightmost-minimum hash per window of `w`
  * consecutive grams, deduplicated. Returns
  * `array<struct<pos:int, hash:long>>` with 0-based character positions.
  *
  * The winnowing guarantee this build relies on (paper §3.2): the
  * selection inside a window depends only on the window's hash sequence,
  * so two copies of any common substring of length >= w + k - 1 contain
  * at least one fully-interior window each with IDENTICAL content — both
  * copies select the same gram at the same relative offset. An inverted
  * index on the anchor hash therefore catches every duplicated span of
  * length >= w + k - 1 while keeping only ~2/(w+1) of all gram positions.
  *
  * Texts shorter than w + k - 1 chars yield no anchors (they cannot
  * contain a qualifying span). Raw polynomial hashes are finalized with
  * an xxhash64 long-mix so min-selection is unbiased on low-entropy text;
  * collisions merely create candidate pairs that die in the char-level
  * verify/extension stage downstream. Positions count Unicode CODE
  * POINTS (SQL `substr`/`length` semantics), so downstream offsets are
  * exact for supplementary-plane text too.
  *
  * `maxPerHash` keeps only the FIRST n selected positions of any one
  * hash within a document (default unlimited). A hash at p positions in
  * doc A and q in doc B contributes p*q seeds to that pair's downstream
  * aggregation, so low-entropy text ("ababab…" spam: every window selects
  * the same gram) turns one pair into billions of seeds without the cap;
  * with it the per-pair seed count is bounded by cap * (other side's
  * anchor count). Keeping a position PREFIX (not a sample) means verbatim
  * copies — whose anchor position lists are identical — cap to the SAME
  * surviving positions, so their diagonal-0 seeds always survive and
  * full-copy detection is unaffected. Only a span whose every interior
  * anchor hash already occurred >= cap times EARLIER in the same doc can
  * be missed — degenerate internal repetition, the exact case the cap
  * exists to bound.
  */
case class WinnowAnchors(child: Expression, k: Int, w: Int,
                         maxPerHash: Int = Int.MaxValue)
  extends UnaryExpression {

  require(k >= 2, s"need gram size k >= 2, got $k")
  require(w >= 1, s"need window w >= 1, got $w")
  require(maxPerHash >= 1, s"need maxPerHash >= 1, got $maxPerHash")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("hash", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_anchors needs string, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any =
    WinnowAnchors.build(v.asInstanceOf[UTF8String], k, w, maxPerHash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WinnowAnchors.build($t, $k, $w, $maxPerHash);")

  override protected def withNewChildInternal(newChild: Expression): WinnowAnchors =
    copy(child = newChild)
}

object WinnowAnchors {

  private val B = 1000003L          // odd base; 64-bit wraparound arithmetic
  private val MixSeed = 0x9E3779B97F4A7C15L

  /** Shared by eval and generated code. */
  def build(text: UTF8String, k: Int, w: Int,
            maxPerHash: Int = Int.MaxValue): GenericArrayData = {
    val (pos, hash) = winnow(text.toString, k, w, maxPerHash)
    val out = new Array[Any](pos.length)
    var i = 0
    while (i < pos.length) {
      out(i) = new GenericInternalRow(Array[Any](pos(i), hash(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The winnowing core on a plain String — also used driver-side to
    * build static benchmark sidecars (streaming decontamination). Returns
    * parallel (positions, hashes) arrays, 0-based, in CODE POINTS — so
    * downstream 1-based offsets are true SQL `substr` positions for any
    * text, supplementary planes included.
    */
  def winnow(str: String, k: Int, w: Int,
             maxPerHash: Int = Int.MaxValue): (Array[Int], Array[Long]) =
    winnow(str.codePoints().toArray, k, w, maxPerHash)

  def winnow(s: Array[Int], k: Int, w: Int): (Array[Int], Array[Long]) =
    winnow(s, k, w, Int.MaxValue)

  def winnow(s: Array[Int], k: Int, w: Int,
             maxPerHash: Int): (Array[Int], Array[Long]) = {
    val m = s.length - k + 1
    if (m < w) return (Array.empty[Int], Array.empty[Long])
    // rolling polynomial hash of every k-gram, finalized with a long-mix
    var pow = 1L
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    val hashes = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s(i); i += 1 }
    hashes(0) = XXH64.hashLong(h, MixSeed)
    i = 1
    while (i < m) {
      h = (h - s(i - 1) * pow) * B + s(i + k - 1)
      hashes(i) = XXH64.hashLong(h, MixSeed)
      i += 1
    }
    // sliding-window minimum via a monotone deque; popping `>=` on push
    // keeps the RIGHTMOST minimal position per window (robust winnowing's
    // content-deterministic tie-break), so both copies of a duplicated
    // window select the same relative offset.
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val outPos = new scala.collection.mutable.ArrayBuffer[Int]()
    val outHash = new scala.collection.mutable.ArrayBuffer[Long]()
    var last = -1
    i = 0
    while (i < m) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val sel = deque(head)
        if (sel != last) {
          outPos += sel; outHash += hashes(sel)
          last = sel
        }
      }
      i += 1
    }
    if (maxPerHash == Int.MaxValue || outPos.length <= maxPerHash)
      return (outPos.toArray, outHash.toArray)
    // prefix cap per hash: selected positions arrive in increasing order,
    // so counting forward keeps each hash's FIRST maxPerHash positions —
    // verbatim copies produce identical position lists and therefore
    // identical survivors (see class doc)
    val seen = new java.util.HashMap[Long, Int]()
    val cpPos = new scala.collection.mutable.ArrayBuffer[Int]()
    val cpHash = new scala.collection.mutable.ArrayBuffer[Long]()
    i = 0
    while (i < outPos.length) {
      val n = seen.merge(outHash(i), 1, Integer.sum)
      if (n <= maxPerHash) { cpPos += outPos(i); cpHash += outHash(i) }
      i += 1
    }
    (cpPos.toArray, cpHash.toArray)
  }

  /** Column API: `winnow_anchors(text, k, w) -> array<struct<pos,hash>>`. */
  def apply(text: Column, k: Int, w: Int): Column =
    apply(text, k, w, Int.MaxValue)

  def apply(text: Column, k: Int, w: Int, maxPerHash: Int): Column =
    GraftSqlBridge.column(
      WinnowAnchors(GraftSqlBridge.expression(text), k, w, maxPerHash))
}
