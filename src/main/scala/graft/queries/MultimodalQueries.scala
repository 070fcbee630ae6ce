package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked multimodal queries: the audio and image decode paths
  * are the two multimodal kernels whose output is INTEGER-exact (PCM16
  * decode divides by the power of two 32768, exactly invertible; PNG is
  * lossless so decoded channel bytes ARE the encoded pixels), so their
  * windowed/grid statistics can be hash-compared against DuckDB
  * reconstructing the same samples/pixels from the same integer
  * formulas — the real `decodeWav` / ImageIO kernels run on real RIFF /
  * PNG bytes on the Spark side, and any parse/layout bug (header
  * offsets, endianness, channel order, window or grid split) breaks
  * the hash.
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

  /** Real PNG bytes (ImageIO encode of a TYPE_INT_RGB raster) whose
    * pixels come from the deterministic channel formulas
    * `r=(x·7+y·13+img·29)%256, g=(x·11+y·5+img·41)%256,
    * b=(x·17+y·3+img·53)%256` — the same closed forms the DuckDB oracle
    * regenerates with generate_series.
    */
  private def imgPng(img: Int, w: Int, h: Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 7 + y * 13 + img * 29) % 256
        val g = (x * 11 + y * 5 + img * 41) % 256
        val b = (x * 17 + y * 3 + img * 53) % 256
        bi.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
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
    }),

    // Real PNG decode -> integer per-cell RGB sums. 6 images x 64x48,
    // 2x2 grid of exactly 32x24 cells. The PNGs are ENCODED by ImageIO
    // at query time from closed-form pixels and decoded back through
    // the real Multimodal.decodeImage kernel, so a channel-order,
    // row-stride, or grid-split bug anywhere in encode/decode/walk
    // breaks the hash. Scale shape: per-row decode riding a narrow
    // map, no shuffle until the final order.
    "q97_image_grid_stats" -> ((s, _) => {
      val imgs = (0 until 6).map(i => (i, imgPng(i, w = 64, h = 48)))
      val media = s.createDataFrame(imgs).toDF("img_id", "media")
      graft.multimodal.Multimodal
        .imageGridStats(media, "media", "img_id", grid = 2)
        .orderBy("img_id", "gy", "gx")
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
        |FROM lagged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q97_image_grid_stats" ->
      """WITH px AS (
        |  SELECT img, x, y,
        |    (x*7 + y*13 + img*29) % 256 AS r,
        |    (x*11 + y*5 + img*41) % 256 AS g,
        |    (x*17 + y*3 + img*53) % 256 AS b
        |  FROM generate_series(0, 5) t(img), generate_series(0, 63) xs(x),
        |       generate_series(0, 47) ys(y))
        |SELECT CAST(img AS INT) AS img_id,
        |  CAST(x // 32 AS INT) AS gx, CAST(y // 24 AS INT) AS gy,
        |  CAST(count(*) AS INT) AS n_pixels,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3 ORDER BY 1, 3, 2""".stripMargin
  )
}
