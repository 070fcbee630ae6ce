package graft.tools

import org.apache.spark.sql.functions._

/** Round-6 probe: does the substring-dedup family stay linear at 10x the
  * sf0.1 corpus (50k docs)? A naive 10x (concatenate 10 copies) would be
  * UNFAIR: every doc gains 9 verbatim clones, so the span count — and any
  * pair-based operator's output — grows ~45x-quadratically and the probe
  * would measure duplication density, not scale. Instead each copy
  * applies a copy-specific alphabet-rotation SUBSTITUTION CIPHER: a
  * bijection on characters preserves every within-copy span exactly
  * (same offsets, same lengths), while a cross-copy common substring
  * would require one doc to contain the letter-shifted image of
  * another's span — as unlikely as a random collision. So the 10x
  * corpus has 10x the rows AND exactly 10x the true spans — the honest
  * scaling regime.
  *
  * Prints min-of-N times at 1x and 10x plus the log10 exponent, and the
  * span-count ratio as the fairness check (expect ~10, NOT ~45+).
  */
object SubstringScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "2").toInt
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, base)
      .select("doc_id", "text")

    // cache key includes the base dir; _SUCCESS guards against a partial
    // previous write being silently reused
    val tenxDir = "/tmp/graft_substr_10x_" +
      base.replaceAll("[^A-Za-z0-9.]", "_")
    val done = java.nio.file.Paths.get(
      tenxDir, "documents.parquet", "_SUCCESS")
    if (!java.nio.file.Files.exists(done)) {
      // rotate letters AND digits so no >= minLen run escapes the cipher
      val az = "abcdefghijklmnopqrstuvwxyz" +
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ" + "0123456789"
      def rot(s: String, c: Int) = s.drop(c) + s.take(c)
      val union = (0 until 10).map { c =>
        if (c == 0) docs.select(col("doc_id"), col("text"))
        else docs.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          translate(col("text"), az,
            rot(az.take(26), c) + rot(az.slice(26, 52), c)
              + rot(az.drop(52), c)).as("text"))
      }.reduce(_ unionAll _)
      // overwrite: the _SUCCESS guard exists precisely because a partial
      // previous write may be present — ErrorIfExists would wedge here
      union.repartition(32).write.mode("overwrite")
        .parquet(tenxDir + "/documents.parquet")
      println(s"[sscale] built 10x corpus at $tenxDir")
    }
    val docs10 = spark.read.parquet(tenxDir + "/documents.parquet")

    def run(df: org.apache.spark.sql.DataFrame): (Double, Long) = {
      var rows = 0L
      val t = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        rows = graft.dedup.SubstringDedup
          .duplicateSpans(df, "text", "doc_id", minLen = 50, k = 16)
          .count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (t, rows)
    }
    docs.count(); docs10.count() // warm footers + JIT
    val (t1, n1) = run(docs)
    val (t10, n10) = run(docs10)
    val exp = math.log(t10 / t1) / math.log(10.0)
    val ratio = n10.toDouble / math.max(1, n1)
    println(f"[sscale] duplicateSpans 1x: $t1%.2f s ($n1 spans)  " +
      f"10x: $t10%.2f s ($n10 spans)  exponent $exp%.2f  " +
      f"span-ratio $ratio%.1f")
    // fairness gate: a ratio far from 10 means cross-copy duplicates
    // leaked through the cipher (or the cached corpus is stale) and the
    // exponent above is measuring duplication density, not scale
    require(ratio >= 8 && ratio <= 12,
      f"span-ratio $ratio%.1f outside [8, 12] — 10x corpus is not a fair " +
        "10x; delete the cache dir and rebuild")

    // incremental route at 10x: span index over the 50k-doc corpus,
    // probed by the 5k copy-0 batch under SHIFTED ids (copy ids occupy
    // doc_id + c*1e7 for c in 0..9, so +1e9 collides with nothing) — the
    // re-ingestion worst case: every batch doc is a verbatim full-copy of
    // an indexed doc AND survives the self-pair guard (probing with the
    // copy-0 ids themselves would be filtered by doc =!= batch_id and
    // measure the near-miss path instead), so extension pays maximal
    // spans on every one; planted pairs ride along
    val idxDir = tenxDir + "/spanidx"
    val tb0 = System.nanoTime()
    graft.dedup.SubstringDedup.writeSpanIndex(
      docs10, "text", "doc_id", idxDir, minLen = 50, k = 16)
    val tBuild = (System.nanoTime() - tb0) / 1e9
    val probeBatch = docs.select(
      (col("doc_id") + lit(1000000000L)).as("doc_id"), col("text"))
    val tp = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      val n = graft.dedup.SubstringDedup
        .spansAgainstIndex(probeBatch, "text", "doc_id", idxDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"[sscale] spanIndex build(50k docs): $tBuild%.2f s  " +
      f"probe(5k batch): ${tp.map(_._1).min}%.2f s " +
      f"(${tp.head._2} spans, full-copy hit per batch doc)")

    // streaming-decontamination kernel throughput: the stateless
    // winnow->probe->extend projection over the 50k corpus against a
    // 500-doc bench sidecar (docs/s is the number a crawl pipeline sizes
    // executors by; the kernel is shuffle-free so it scales with cores)
    val bench = docs.filter(col("doc_id") < 500)
    val tc = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      val n = graft.streaming.Streams.contaminationFilter(
        docs10, bench, "text", "doc_id", minLen = 50, k = 16)
        .filter(col("contaminated")).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val rows10 = docs10.count()
    println(f"[sscale] contaminationFilter 50k docs vs 500-doc bench: " +
      f"${tc.map(_._1).min}%.2f s (${tc.head._2} contaminated, " +
      f"${rows10 / tc.map(_._1).min}%.0f docs/s)")
    spark.stop()
  }
}
