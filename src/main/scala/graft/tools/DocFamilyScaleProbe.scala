package graft.tools

/** Two measured orders of magnitude for the document/embedding family:
  * runs the pair-based and per-row text queries at sf0.1, sf1 (10×) and
  * sf10 (100× — 500k docs / 200k vectors), generated fairly by
  * `ScaleDataGen` with the seeded-permutation cipher (`cipherPerm` —
  * the rotation cipher repeats mod 26 and would make copies 0 and 26
  * verbatim-identical at factor 100) and per-copy orthogonal embedding
  * transforms. Prints per-decade exponents: pair operators should stay
  * well under 1.0 (candidate volume is collision-bounded and scales
  * linearly with true duplicate structure); per-row CPU families
  * approach 1.0 from below as plan floors amortize — that is physics,
  * not a defect (the work is shuffle-free and distributes).
  *
  * Usage: runMain graft.tools.DocFamilyScaleProbe [q...]
  * (generates the two doc-only dirs on first run, ~5 min for sf10)
  */
object DocFamilyScaleProbe {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q34_fingerprint_groups", "q36_ngram_jaccard",
        "q37_simhash_pairs", "q38_minhash_pairs", "q62_ivf_ann",
        "q63_srp_pairs", "q64_neardup_survivors", "q72_pii_redact",
        "q76_semantic_dedup", "q78_tfidf_terms", "q83_dup_spans",
        "q86_contamination_spans", "q90_coverage_survivors")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "2").toInt
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val base = "/root/testdata/sf0.1"
    val d1 = "/tmp/graft_docs_sf1"
    val d10 = "/tmp/graft_docs_sf10"
    val tables = Set("documents", "embeddings")
    ScaleDataGen.generate(spark, base, 10, d1, tables)
    ScaleDataGen.generate(spark, base, 100, d10, tables)

    def timeAt(dir: String, name: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        // toRdd, not count(): count() lets Catalyst eliminate the very
        // work under measurement (see Bench.runOnce)
        fn(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    // warm-up: JVM, codegen, parquet footers
    Seq(base, d1, d10).foreach(d => graft.Tables.documents(spark, d).count())

    println(f"[docscale] ${"query"}%-26s sf0.1     sf1      sf10   e(0.1→1) e(1→10)")
    names.foreach { n =>
      val t1 = timeAt(base, n)
      val t10 = timeAt(d1, n)
      val t100 = timeAt(d10, n)
      val e1 = math.log(t10 / t1) / math.log(10.0)
      val e2 = math.log(t100 / t10) / math.log(10.0)
      println(f"[docscale] $n%-26s $t1%7.2f $t10%7.2f $t100%8.2f   $e1%6.2f  $e2%6.2f")
    }
    spark.stop()
  }
}
