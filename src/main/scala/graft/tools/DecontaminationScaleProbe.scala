package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throughput curve of streaming decontamination as the BENCH side grows
  * (judge r6 item 8): q87's sidecar guard is 256 MB, but where on the way
  * there does the stateless-projection design (per-doc hash probe against
  * a broadcast sidecar) stop paying versus the broadcast-JOIN variant
  * (`SubstringDedup.crossSpans` — winnow corpus, hash-join bench anchors,
  * per-pair extension)?
  *
  * Setup: corpus = sf0.1 documents (5k docs); bench suites of 1×/4×/16×
  * (250/1000/4000 docs) drawn from a CIPHERED copy (cross-copy span
  * collisions are noise) plus 5% verbatim corpus docs planted so the
  * contaminated path stays exercised at every size. Reports, per size:
  * sidecar build time (one-off), projection wall time + docs/s
  * (steady-state, sidecar pre-built), and the crossSpans wall time on
  * identical inputs.
  */
object DecontaminationScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.Streams

    val docs = graft.Tables.documents(spark, base)
      .select("doc_id", "text").cache()
    val nDocs = docs.count()

    // ciphered pool: bench text that CANNOT collide with the corpus
    // beyond random noise (same trick as ScaleDataGen/SubstringScaleProbe)
    val az = "abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ" + "0123456789"
    val pool = docs.withColumn("text",
        translate(col("text"), az, ScaleDataGen.cipherTo(7)))
      .withColumn("doc_id", col("doc_id") + lit(90000000L))

    def benchOf(size: Int): DataFrame = {
      val planted = (size / 20).max(1) // 5% verbatim contamination source
      pool.filter(col("doc_id") < lit(90000000L + size - planted))
        .unionAll(docs.filter(col("doc_id") < planted)
          .withColumn("doc_id", col("doc_id") + lit(95000000L)))
        .cache()
    }

    println(s"[dscale] corpus rows=$nDocs")
    for (size <- Seq(250, 1000, 4000)) {
      val bench = benchOf(size); bench.count()
      Streams.clearSidecarCache()
      // one-off sidecar build (collect + winnow + broadcast)
      val tb0 = System.nanoTime()
      Streams.contaminationFilter(docs, bench, "text", "doc_id").count()
      val tBuild = (System.nanoTime() - tb0) / 1e9
      // steady state: sidecar memoized, min of 3
      val tProj = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Streams.contaminationFilter(docs, bench, "text", "doc_id").count()
        (System.nanoTime() - t0) / 1e9
      }.min
      // broadcast-join variant on identical inputs, min of 3
      val tJoin = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.dedup.SubstringDedup.crossSpans(docs, bench, "text", "doc_id")
          .count()
        (System.nanoTime() - t0) / 1e9
      }.min
      val contaminated = Streams.contaminationFilter(docs, bench, "text", "doc_id")
        .filter(col("contaminated")).count()
      println(f"[dscale] bench=$size%5d  build+first=$tBuild%6.2f s  " +
        f"steady=$tProj%6.2f s (${nDocs / tProj}%.0f docs/s)  " +
        f"crossSpans=$tJoin%6.2f s  contaminated=$contaminated")
      bench.unpersist()
    }
    spark.stop()
  }
}
