package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked multimodal queries: the audio decode path is the one
  * multimodal kernel whose output is INTEGER-exact (PCM16 decode divides
  * by the power of two 32768, exactly invertible), so its windowed
  * statistics can be hash-compared against DuckDB reconstructing the
  * same samples from the same integer formula — the real `decodeWav`
  * runs on real RIFF bytes on the Spark side, and any parse/layout bug
  * (header offsets, endianness, window split) breaks the hash.
  */
object MultimodalQueries {

  /** 16-bit mono PCM WAV with samples from the deterministic integer
    * formula `((i·i·7 + i·31 + clip·97) mod 20001) − 10000` — the same
    * closed form the DuckDB oracle regenerates with generate_series.
    */
  private def clipWav(clip: Int, n: Int, rate: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    var i = 0
    while (i < n) {
      bb.putShort(
        (((i.toLong * i * 7 + i * 31 + clip * 97) % 20001) - 10000).toShort)
      i += 1
    }
    bb.array()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Real WAV decode -> integer per-window RMS statistics. 8 clips x
    // 2000 samples, 4 windows of exactly 500. The clips are generated
    // (not read from a fixture file) so both engines derive the truth
    // from the same closed-form samples; what the hash then verifies is
    // the DECODE + windowing: Spark's numbers come out of real RIFF
    // bytes through Multimodal.decodeWav. Scale shape: per-row decode
    // riding a narrow map, no shuffle until the final order.
    "q96_audio_window_stats" -> ((s, _) => {
      val clips = (0 until 8).map(c => (c, clipWav(c, n = 2000, rate = 8000)))
      val media = s.createDataFrame(clips).toDF("clip_id", "media")
      graft.multimodal.Multimodal
        .audioWindowStats(media, "media", "clip_id", nWindows = 4)
        .orderBy("clip_id", "window")
    })
  )

  val oracles: Map[String, String] = Map(
    "q96_audio_window_stats" ->
      """WITH samples AS (
        |  SELECT clip, i,
        |    ((i*i*7 + i*31 + clip*97) % 20001) - 10000 AS s
        |  FROM generate_series(0, 7) t(clip), generate_series(0, 1999) g(i)),
        |lagged AS (
        |  SELECT clip, i, s,
        |    lag(s) OVER (PARTITION BY clip ORDER BY i) AS ps
        |  FROM samples)
        |SELECT CAST(clip AS INT) AS clip_id,
        |  CAST(i // 500 AS INT) AS window,
        |  CAST(count(*) AS INT) AS n_samples,
        |  CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS sum_sq,
        |  CAST(sum(CASE WHEN i % 500 <> 0 AND (s >= 0) <> (ps >= 0)
        |                THEN 1 ELSE 0 END) AS INT) AS zero_crossings
        |FROM lagged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
