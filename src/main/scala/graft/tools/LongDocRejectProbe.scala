package graft.tools

import org.apache.spark.sql.functions._

/** Measures the two-phase `duplicateSpans` win in the regime it was
  * designed for: LONG documents whose candidate pairs are dominated by
  * shared grams that never extend (boilerplate). The testdata documents
  * average only a few hundred characters, so full-text-per-pair and
  * slice-per-seed move similar bytes there; real corpora carry KB–MB
  * documents, where the single-phase route ships (and code-point
  * converts) the full pair of documents once per FALSE candidate while
  * phase 1 ships a constant 2·(k + 2·minLen) code points per seed.
  *
  * Corpus: `groups` groups × `perGroup` docs of `docLen` random chars
  * (alphabet 20 — natural repeats negligible at minLen=50); every doc
  * of a group carries the same group-specific 16-char token at a random
  * position (one shared gram, never extending to 50) and ONE doc pair
  * per group shares a genuine 60-char span (phase-1-sized truth).
  * Candidate pairs per group ≈ C(perGroup, 2); true spans = 1.
  *
  * Usage: runMain graft.tools.LongDocRejectProbe [docLen] [groups] [perGroup]
  */
object LongDocRejectProbe {
  def main(args: Array[String]): Unit = {
    val docLen = args.headOption.map(_.toInt).getOrElse(4000)
    val groups = args.lift(1).map(_.toInt).getOrElse(300)
    val perGroup = args.lift(2).map(_.toInt).getOrElse(40)
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "2").toInt
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rng = new scala.util.Random(17)
    def rand(n: Int) = {
      val sb = new StringBuilder(n)
      var i = 0; while (i < n) { sb += ('a' + rng.nextInt(20)).toChar; i += 1 }
      sb.toString
    }
    val docs = (0 until groups).flatMap { g =>
      val token = f"Q${g}%014dZ" // 16 chars, group-unique, never extends
      val span60 = rand(60) // group-unique true span
      (0 until perGroup).map { m =>
        val base = rand(docLen)
        val at = 100 + rng.nextInt(docLen - 400)
        val withTok = base.substring(0, at) + token + base.substring(at + 16)
        val text = if (m < 2) { // one true 60-char span pair per group
          val sAt = docLen - 100
          withTok.substring(0, sAt) + span60 + withTok.substring(sAt + 60)
        } else withTok
        (g.toLong * 1000 + m, text)
      }
    }
    val df = docs.toDF("doc_id", "text")
    df.cache(); df.count()
    println(s"[longdoc] docs=${docs.size} docLen=$docLen groups=$groups " +
      s"perGroup=$perGroup (~${groups.toLong * perGroup * (perGroup - 1) / 2} " +
      "candidate pairs)")

    // Auto-route on a DERIVED input — the r11 misroute shape: a
    // groupBy+join survivor frame whose Catalyst size estimate is
    // unrelated to its true bytes. The measured router must place this
    // corpus on the same side of TwoPhaseBytesBudget as its actual
    // text bytes (single-phase for the 48–320 MB brackets).
    {
      val derived = df.groupBy("doc_id").agg(first(col("text")).as("text"))
        .join(df.select(col("doc_id")), "doc_id")
      val pinned = graft.ops.Par.pinIfDerived("probe.route",
        derived.select(col("doc_id").cast("long").as("doc"), col("text")))
      val stat = pinned.queryExecution.optimizedPlan.stats.sizeInBytes
      val measured = pinned.agg(sum(octet_length(col("text"))))
        .first().getLong(0)
      val twoP = graft.dedup.SubstringDedup.routeTwoPhase(pinned,
        measured = true)
      println(f"[longdoc] derived auto-route: twoPhase=$twoP " +
        f"(measured ${measured / 1e6}%.1f MB, plan-stat ${stat.toDouble / 1e6}%.1f MB, " +
        f"budget ${graft.dedup.SubstringDedup.TwoPhaseBytesBudget / 1e6}%.0f MB)")
      graft.ops.Par.unpin("probe.route", pinned)
    }

    def time(twoPhase: Boolean): (Double, Long) = {
      var rows = 0L
      val t = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        rows = graft.dedup.SubstringDedup.duplicateSpans(
          df, "text", "doc_id", minLen = 50, k = 16,
          twoPhase = Some(twoPhase)).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (t, rows)
    }
    val (t2, n2) = time(twoPhase = true)
    val (t1, n1) = time(twoPhase = false)
    require(n1 == n2, s"routes disagree: single=$n1 two-phase=$n2")
    println(f"[longdoc] spans=$n2  single-phase=$t1%.1f s  " +
      f"two-phase=$t2%.1f s  speedup=${t1 / t2}%.1fx")
    spark.stop()
  }
}
