package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.Streams
import graft.Tables

/** Dev demo: drive the streaming rollup and multimodal plumbing end-to-end
  * on sf0.001 — the pieces the batch Verify contract can't exercise.
  */
object SmokePipeline {
  def main(args: Array[String]): Unit = {
    val spark = graft.tools.Sessions.build("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("events_stream").toString
    Tables.events(spark, "/root/testdata/sf0.001").write.mode("overwrite").parquet(dir)
    val rollup = Streams.runToMemory(
      Streams.windowedRollup(Streams.readEvents(spark, dir)),
      "smoke_rollup", "complete")
    println(s"[smoke] streaming rollup rows = ${rollup.count()}")
    rollup.orderBy("window_start", "event_type").show(5, truncate = false)

    val media = Multimodal.syntheticMedia(Tables.documents(spark, "/root/testdata/sf0.001"))
    val feats = Multimodal.extractFeatures(media, "media", "media_id", dim = 8)
    println(s"[smoke] media feature rows = ${feats.count()}")
    feats.select(col("media_id"), col("format"), slice(col("media_features"), 1, 4))
      .show(3, truncate = false)
    val frames = Multimodal.sampleFrames(media.limit(5), "media", "media_id", 32, 2)
    println(s"[smoke] sampled frames = ${frames.count()}")

    // incremental substring-dedup flow: index the corpus, stream a crawl
    // batch through in-flight decontamination, probe survivors against
    // the index, append them
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val idxDir = java.nio.file.Files.createTempDirectory("spanidx").toString + "/idx"
    graft.dedup.SubstringDedup.writeSpanIndex(
      docs.filter(col("doc_id") >= 10), "text", "doc_id", idxDir)
    val docDir = java.nio.file.Files.createTempDirectory("crawl").toString + "/batch"
    docs.filter(col("doc_id") < 10).write.parquet(docDir)
    val screened = Streams.runToMemory(
      Streams.contaminationFilter(
        spark.readStream.schema(Streams.documentSchema).parquet(docDir),
        docs.filter(col("doc_id") >= 10).limit(40), "text", "doc_id"),
      "smoke_decon", "append")
    println(s"[smoke] streamed batch: ${screened.count()} docs, " +
      s"${screened.filter(col("contaminated")).count()} contaminated in-flight")
    val survivors = screened.filter(!col("contaminated"))
    val hits = graft.dedup.SubstringDedup.spansAgainstIndex(
      survivors, "text", "doc_id", idxDir)
    println(s"[smoke] index-probe spans on survivors = ${hits.count()}")
    graft.dedup.SubstringDedup.appendToSpanIndex(
      survivors, "text", "doc_id", idxDir, batchId = "crawl-0001")
    println("[smoke] survivors appended to span index")

    // the reference's core (distributed hyperparameter search) feeding
    // the curation surface: learn a quality filter from Gopher-rule
    // labels over cheap text features, then score the corpus with the
    // codegen'd LinearScore path
    import graft.text.{Corpus, TextFunctions => TF}
    val qfeats = docs.select(col("doc_id"),
      array(
        TF.tokenCount(col("text")).cast("double"),
        TF.avgWordLen(col("text")),
        TF.stopwordRatio(col("text")),
        TF.punctRatio(col("text"))).as("f"))
    val labeled = qfeats.join(
      Corpus.gopherRules(docs, "text", "doc_id")
        .select(col("doc_id"), col("pass").cast("double").as("y")), "doc_id")
    val search = new graft.search.DistGridSearchCV(
      graft.exec.LogisticRegressionLBFGS,
      Map("c" -> Seq(0.1, 1.0), "max_iter" -> Seq(50.0)), cv = 3)
    val cached = labeled.cache() // fit + score + count share one compute
    val fitted = search.fit(spark, cached, "f", "y")
    // the codegen'd LinearScore scoring route (not the UDF fallback)
    val scored = graft.predict.Predict.withLinearPredictions(
      cached, fitted.bestModel.asInstanceOf[graft.exec.LogRegModel], "f")
    val agree = scored.filter(col("preds") === col("y")).count()
    println(s"[smoke] learned quality filter agrees with gopher rules on " +
      s"$agree/${cached.count()} docs (cv acc ${fitted.bestScore})")
    cached.unpersist(blocking = false)
    spark.stop()
  }
}
