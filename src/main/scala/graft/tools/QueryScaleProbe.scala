package graft.tools

/** Round-6 probe: time-vs-rows scaling exponents for the ten most
  * expensive registered queries. Runs each at sf0.01 and sf0.1 (10x the
  * rows), min-of-N per SF, and prints the per-query exponent
  * log10(t_10x / t_1x): ~1.0 = linear in rows, >1 superlinear (a scale
  * finding to chase), <1 = fixed per-query overhead (AQE planning,
  * micro-batch scheduling) still dominating at these SFs.
  *
  * Caveats recorded with the numbers in NOTES.md: the ~0.15-0.3 s/query
  * plan/AQE floor deflates exponents for sub-second queries, and the
  * streaming queries (q66, q81) pay a constant micro-batch scheduling
  * floor, so their exponents under-read by design.
  */
object QueryScaleProbe {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q36_ngram_jaccard", "q38_minhash_pairs", "q62_ivf_ann",
        "q63_srp_pairs", "q64_neardup_survivors", "q66_stream_sessionize",
        "q76_semantic_dedup", "q77_unigram_logprob", "q78_tfidf_terms",
        "q81_stream_attribution")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "3").toInt
    val small = "/root/testdata/sf0.01"
    val big = "/root/testdata/sf0.1"
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")

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

    // warm-up: JVM, codegen, parquet footers on both SFs
    graft.Tables.documents(spark, small).count()
    graft.Tables.documents(spark, big).count()

    println(f"[qscale] ${"query"}%-24s t(sf0.01)  t(sf0.1)  exponent")
    names.foreach { n =>
      val t1 = timeAt(small, n)
      val t10 = timeAt(big, n)
      val exp = math.log(t10 / t1) / math.log(10.0)
      println(f"[qscale] $n%-24s $t1%8.2f s $t10%8.2f s $exp%7.2f")
    }
    spark.stop()
  }
}
