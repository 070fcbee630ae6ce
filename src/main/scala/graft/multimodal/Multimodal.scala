package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extract / resize /
  * frame-sample operators.
  *
  * IMAGE kernels are REAL: the JDK's ImageIO decodes PNG/JPEG/BMP/GIF
  * with no external codecs (headless-safe raster ops), so decode,
  * resize (bilinear resample + PNG re-encode) and feature extraction
  * (luminance-grid embedding) operate on actual pixels. Bytes that are
  * not a decodable image fall back to the deterministic byte-level
  * kernels (`fakeDecode`, subsampling) so every operator stays total —
  * audio/video codecs are not in the JDK, so those stay stubs behind the
  * same operator shapes.
  *
  * Scale: media rows are large; these operators never shuffle the binary
  * payload — decode/extract are narrow map transformations, and the
  * recommended layout keeps binaries in their own parquet column so
  * column pruning skips them unless touched.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** STUB decode kernel: deterministic bytes→floats (an FNV-style rolling
    * hash per output dimension). A real implementation replaces this body
    * with e.g. JPEG decode + CNN embedding; everything around it stays.
    */
  private[multimodal] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return out
    var h = 2166136261L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 16777619L
      out((i % dim + dim) % dim) = ((h >>> 16) % 1000L) / 1000.0f
      i += 1
    }
    out
  }

  /** REAL image decode (JDK ImageIO: PNG/JPEG/BMP/GIF). Returns null for
    * null/empty/undecodable bytes — callers branch to byte-level
    * fallbacks. Pure raster ops, headless-safe.
    */
  private[multimodal] def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null || bytes.isEmpty) null
    else try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Luminance of an ARGB pixel in [0, 1] (Rec. 601 weights). */
  @inline private def luminance(argb: Int): Float =
    ((0.299f * ((argb >> 16) & 0xff) + 0.587f * ((argb >> 8) & 0xff) +
      0.114f * (argb & 0xff)) / 255.0f)

  /** REAL image feature kernel: bilinear-resample the image onto a
    * ceil(sqrt(dim))² grid and emit the first `dim` luminances — the
    * perceptual-hash-style baseline embedding (what aHash/pHash build on).
    */
  private[multimodal] def imageFeatures(img: java.awt.image.BufferedImage,
                                        dim: Int): Array[Float] = {
    val k = math.ceil(math.sqrt(dim.toDouble)).toInt
    val small = scaleImage(img, k, k)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      out(i) = luminance(small.getRGB(i % k, i / k))
      i += 1
    }
    out
  }

  private def scaleImage(img: java.awt.image.BufferedImage,
                         w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    out
  }

  /** Decode + feature-extract: binary column → fixed-width `array<float>`
    * embedding, computed per partition (batched iteration keeps per-row
    * overhead off the hot path and amortizes kernel setup per partition,
    * exactly like mapInPandas batches). Decodable images get the REAL
    * luminance-grid features; other payloads (audio/video/raw) get the
    * deterministic byte-hash fallback so the operator is total.
    */
  def extractFeatures(df: DataFrame, mediaCol: String, idCol: String,
                      dim: Int = 32,
                      outCol: String = "media_features"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(outCol, ArrayType(FloatType)))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes =
          if (r.isNullAt(mediaIdx)) null
          else r.getAs[Array[Byte]](mediaIdx)
        val img = decodeImage(bytes)
        val feats =
          if (img != null) imageFeatures(img, dim) else fakeDecode(bytes, dim)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Decoded-image metadata: actual pixel dimensions (null when the bytes
    * are not a decodable image) — the validation pass a media pipeline
    * runs before trusting stored width/height columns.
    */
  def imageMeta(df: DataFrame, mediaCol: String,
                wCol: String = "decoded_width",
                hCol: String = "decoded_height"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField(wCol, IntegerType)).add(StructField(hCol, IntegerType))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val img = decodeImage(
          if (r.isNullAt(mediaIdx)) null else r.getAs[Array[Byte]](mediaIdx))
        val (w, h) =
          if (img == null) (null, null)
          else (Int.box(img.getWidth), Int.box(img.getHeight))
        Row.fromSeq(r.toSeq :+ w :+ h)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Resize: decodable images are bilinear-resampled to target dimensions
    * and re-encoded as PNG (REAL kernel); other payloads fall back to
    * deterministic byte subsampling. Metadata columns are updated to the
    * new dimensions — the part pipelines depend on.
    */
  def resize(df: DataFrame, mediaCol: String, targetW: Int, targetH: Int): DataFrame = {
    val targetLen = math.max(1, targetW * targetH / 64)
    val resample = udf((b: Array[Byte]) => {
      val img = decodeImage(b)
      if (img != null) {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(scaleImage(img, targetW, targetH), "png", bos)
        bos.toByteArray
      } else if (b == null) null
      else {
        val step = math.max(1, b.length / targetLen)
        b.indices.collect { case i if i % step == 0 => b(i) }.toArray
      }
    })
    df.withColumn(mediaCol, resample(col(mediaCol)))
      .withColumn("width", lit(targetW))
      .withColumn("height", lit(targetH))
  }

  /** STUB frame sampling for video: emits every `everyN`-th fixed-size
    * chunk of the binary as a frame row (real impl: container demux).
    * Generator shape: one input row → many frame rows via explode.
    */
  def sampleFrames(df: DataFrame, mediaCol: String, idCol: String,
                   frameBytes: Int, everyN: Int): DataFrame = {
    val chunks = udf((b: Array[Byte]) =>
      if (b == null) Seq.empty[Array[Byte]]
      else b.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % everyN == 0 => chunk }
        .toSeq)
    df.select(col(idCol), posexplode(chunks(col(mediaCol))).as(Seq("frame_idx", "frame")))
  }

  /** Text → synthetic media table for testing the plumbing end-to-end on
    * the documents testdata (binary = utf-8 bytes of the text).
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("fake/raw").as("format"),
      (length(col("text")) % 640).cast("int").as("width"),
      lit(480).as("height"))
}
