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
    spark.stop()
  }
}
