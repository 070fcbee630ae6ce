package graft

import org.apache.spark.sql.catalyst.expressions.{Literal, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{CosineSim, MinHashSig, NGramShingles, Simhash64}

/** Property tests for the custom codegen'd expressions' kernels against
  * independent driver-side references (random inputs incl. duplicates,
  * empties, unicode, zero vectors). The CODEGEN_ONLY parity specs in
  * FunctionsSpec cover the generated-Java path; these pin the semantics.
  */
object ExpressionProperties extends Properties("expressions") {

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(8).mkString),
    Gen.oneOf("a", "b", "naïve", "東京", ""))
  private val tokensGen: Gen[List[String]] =
    Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, tokenGen))

  private def utf8Array(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t): AnyRef).toArray)

  property("ngram shingles = sliding-window concat, distinct, in order") =
    forAll(tokensGen, Gen.choose(1, 4)) { (toks, n) =>
      val got = NGramShingles.build(utf8Array(toks), n)
        .array.map(_.asInstanceOf[UTF8String].toString).toSeq
      val want = toks.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq.distinct
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("minhash sig = per-table min of chained xxhash64; empty -> nulls") =
    forAll(tokensGen, Gen.choose(1, 8), Gen.choose(0L, 999L)) { (toks, k, seed) =>
      val arr = utf8Array(toks)
      val got = MinHashSig.build(arr, k, seed).array.toSeq
      if (toks.isEmpty) Prop(got == Seq.fill(k)(null))
      else {
        val want = (0 until k).map { t =>
          toks.map(s => XXH64.hashLong(seed + t,
            XXH64.hashUTF8String(UTF8String.fromString(s), 42L))).min
        }
        Prop(got == want)
      }
    }

  property("simhash64 = sign of per-bit +/-1 sums") =
    forAll(Gen.listOf(Gen.long).map(_.take(30))) { hs =>
      val expr = Simhash64(Literal.create(hs, ArrayType(LongType)))
      val got = expr.eval(null).asInstanceOf[Long]
      var want = 0L
      (0 until 64).foreach { b =>
        val c = hs.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum
        if (c > 0) want |= 1L << b
      }
      Prop(got == want)
    }

  // The MOSS guarantee the substring-dedup family rests on: two copies of
  // any common substring of length >= w + k - 1 select at least one
  // anchor at the SAME relative offset with the same hash — regardless of
  // the differing context around the copies, alphabet size, or placement.
  property("winnowing: planted common span always shares an anchor") =
    forAll(
      Gen.choose(2L, Long.MaxValue), // rng seed
      Gen.choose(2, 6),              // alphabet size (small -> adversarial)
      Gen.choose(4, 12),             // k
      Gen.choose(2, 20)) {           // w
      (seed, alpha, k, w) =>
        val rng = new scala.util.Random(seed)
        def rand(n: Int) =
          Seq.fill(n)(('a' + rng.nextInt(alpha)).toChar).mkString
        val minLen = w + k - 1
        val span = rand(minLen + rng.nextInt(30))
        val ta = rand(rng.nextInt(40)) + span + rand(rng.nextInt(40))
        val tb = rand(rng.nextInt(40)) + span + rand(rng.nextInt(40))
        val offA = ta.indexOf(span); val offB = tb.indexOf(span)
        // indexOf can land EARLIER than the planted offset if the random
        // context happens to contain the span — still a valid common copy
        val (pa, ha) = graft.functions.WinnowAnchors.winnow(ta, k, w)
        val (pb, hb) = graft.functions.WinnowAnchors.winnow(tb, k, w)
        val inA = pa.indices
          .filter(i => pa(i) >= offA && pa(i) + k <= offA + span.length)
          .map(i => (pa(i) - offA, ha(i))).toSet
        val inB = pb.indices
          .filter(i => pb(i) >= offB && pb(i) + k <= offB + span.length)
          .map(i => (pb(i) - offB, hb(i))).toSet
        Prop(inA.intersect(inB).nonEmpty) :|
          s"no shared anchor for span len ${span.length} (k=$k w=$w)"
    }

  property("cosine_sim = dot/(|a||b|), zero-norm -> 0.0, prefix on mismatch") =
    forAll(Gen.choose(0, 12).flatMap(d => Gen.zip(
      Gen.listOfN(d, Gen.choose(-5.0, 5.0)),
      Gen.listOfN(d, Gen.oneOf(Gen.const(0.0), Gen.choose(-5.0, 5.0)))))) {
      case (a, b) =>
        val expr = CosineSim(
          Literal.create(a, ArrayType(DoubleType)),
          Literal.create(b, ArrayType(DoubleType)))
        val got = expr.eval(null).asInstanceOf[Double]
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(y => y * y).sum)
        val want = if (d == 0.0) 0.0 else dot / d
        Prop(got == want) :| s"got=$got want=$want"
    }

  // ---- substring-extension kernels (r12 fused expressions) ----

  /** Independent full-text seed extension — the reference the slice and
    * packed-seed kernels must agree with.
    */
  private def refExtend(ta: Array[Int], tb: Array[Int], pa: Int, pb: Int,
                        k: Int): Option[(Int, Int, Int)] = {
    if (pa < 0 || pb < 0 || pa + k > ta.length || pb + k > tb.length)
      return None
    var i = 0
    while (i < k) {
      if (ta(pa + i) != tb(pb + i)) return None
      i += 1
    }
    var sa = pa; var sb = pb
    while (sa > 0 && sb > 0 && ta(sa - 1) == tb(sb - 1)) { sa -= 1; sb -= 1 }
    var ea = pa + k; var eb = pb + k
    while (ea < ta.length && eb < tb.length && ta(ea) == tb(eb)) {
      ea += 1; eb += 1
    }
    Some((sa, sb, ea - sa))
  }

  // small alphabet (collisions abound) + supplementary-plane chars so
  // code-point arithmetic differs from char arithmetic
  private val cpGen: Gen[Int] =
    Gen.frequency(8 -> Gen.choose('a'.toInt, 'c'.toInt),
      1 -> Gen.const(0x1F600), 1 -> Gen.const(0x1F4A9))
  private val textGen: Gen[Array[Int]] =
    Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, cpGen)).map(_.toArray)
  private def str(cps: Array[Int]) = new String(cps, 0, cps.length)

  property("extendInSlice: SliceSpan = exact full-text span; never " +
    "rejects a qualifying run; escalate only on a matched gram") =
    forAll(textGen, textGen, Gen.choose(2, 4), Gen.choose(5, 12)) {
      (ca, cb, k, minLen) =>
        val (sa0, sb0) = (str(ca), str(cb))
        val seeds = for {
          pa <- 0 to math.max(-1, ca.length - k)
          pb <- 0 to math.max(-1, cb.length - k)
        } yield (pa, pb)
        val cap = k + 2 * minLen
        def slice(cps: Array[Int], p: Int): (String, Int) = {
          val off = math.max(0, p - minLen)
          val n = math.min(cps.length - off, cap)
          (new String(cps, off, n), off)
        }
        val props = seeds.take(400).map { case (pa, pb) =>
          val (slA, offA) = slice(ca, pa)
          val (slB, offB) = slice(cb, pb)
          val v = graft.dedup.SubstringDedup.extendInSlice(
            slA, offA, ca.length, pa, slB, offB, cb.length, pb, k, minLen)
          val ref = refExtend(ca, cb, pa, pb, k)
          v(0) match {
            case 1 => // SliceSpan: bit-exact vs full-text extension
              Prop(ref.contains((v(1), v(2), v(3))) && v(3) >= minLen) :|
                s"span ($pa,$pb): got=${v.toSeq} ref=$ref"
            case 0 => // SliceReject: certainly no qualifying run here
              Prop(ref.forall(_._3 < minLen)) :|
                s"reject ($pa,$pb) but ref=$ref (k=$k minLen=$minLen)"
            case 2 => // SliceEscalate: gram verified, boundary uncertain
              Prop(ref.nonEmpty) :| s"escalate ($pa,$pb) on unmatched gram"
            case other => Prop.falsified :| s"unknown verdict $other"
          }
        }
        if (props.isEmpty) Prop.passed else Prop.all(props: _*)
    }

  property("extendSeeds = distinct full-text spans >= minLen (covered-" +
    "seed skip is invisible in the output)") =
    forAll(textGen, textGen, Gen.choose(2, 4), Gen.choose(5, 12)) {
      (ca, cb, k, minLen) =>
        val seeds = (for {
          pa <- 0 to math.max(-1, ca.length - k)
          pb <- 0 to math.max(-1, cb.length - k)
        } yield (pa.toLong << 32) | pb.toLong).take(400)
        val got = graft.dedup.SubstringDedup.extendSeeds(
          ca, cb, seeds, k, minLen).map(s => (s.sa, s.sb, s.len)).toSet
        val want = seeds.flatMap { packed =>
          refExtend(ca, cb, (packed >>> 32).toInt, (packed & 0xFFFFFFFFL).toInt, k)
        }.filter(_._3 >= minLen).toSet
        Prop(got == want) :| s"got=$got want=$want"
    }

  property("AnchorSlices.build: slice = codepoints[max(0,p-minLen), " +
    "+k+2*minLen), dlen = codepoint length") =
    forAll(textGen, Gen.choose(2, 4), Gen.choose(5, 12)) { (cps, k, minLen) =>
      val ps = (0 to math.max(-1, cps.length - k)).toArray
      val out = graft.functions.AnchorSlices.build(
        UTF8String.fromString(str(cps)), new GenericArrayData(ps), k, minLen)
      val cap = k + 2 * minLen
      val props = ps.indices.map { i =>
        val row = out.array(i)
          .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        val off = math.max(0, ps(i) - minLen)
        val n = math.min(cps.length - off, cap)
        Prop(row.getInt(0) == ps(i) && row.getInt(1) == off &&
          row.getInt(2) == cps.length &&
          row.getUTF8String(3).toString == new String(cps, off, n)) :|
          s"slice $i (p=${ps(i)})"
      }
      if (props.isEmpty) Prop(out.numElements() == 0) else Prop.all(props: _*)
    }
}
