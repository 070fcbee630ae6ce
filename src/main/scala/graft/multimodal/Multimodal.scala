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
  * (luminance-grid embedding) operate on actual pixels. AUDIO covers
  * PCM WAV plus the G.711 mu-law/A-law companded formats (pure-formula
  * expansion); VIDEO covers MJPEG (concatenated JPEGs — marker-scan
  * frame extraction + ImageIO decode). Compressed codecs the JDK lacks
  * (MP3/AAC/H.264, …) plug in through the [[MediaDecoder]] ServiceLoader
  * SPI, consulted after the built-ins; bytes nothing decodes fall back
  * to the deterministic byte-level kernels (`fakeDecode`, subsampling)
  * so every operator stays total.
  *
  * Scale: media rows are large; these operators never shuffle the binary
  * payload — decode/extract are narrow map transformations, and the
  * recommended layout keeps binaries in their own parquet column so
  * column pruning skips them unless touched.
  */
object Multimodal {

  // Per-JVM (driver and each executor classload): ImageIO's default
  // file-backed stream cache would create/delete a temp file for EVERY
  // per-row decode/encode of data that is already fully in memory.
  javax.imageio.ImageIO.setUseCache(false)

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

  // ServiceLoader-discovered external codecs (see [[MediaDecoder]]) —
  // resolved lazily ONCE per JVM (driver and each executor classload),
  // never captured in closures: each executor re-resolves from its own
  // classpath, which is what makes the SPI cluster-correct.
  // Discovery is DEFENSIVE per provider: ServiceLoader throws
  // ServiceConfigurationError (an Error, so NOT caught by the NonFatal
  // handlers around per-row decode calls) for a misregistered or
  // failing-to-construct provider class — one bad plug-in jar must skip
  // that provider (with a once-per-JVM stderr warning), not poison every
  // decode of non-built-in bytes. That is the SPI's documented contract:
  // a provider that throws is treated the same as one returning null,
  // contained per row — and the same containment applies at load time.
  private lazy val externalDecoders: Array[MediaDecoder] = {
    def contained(t: Throwable): Boolean =
      scala.util.control.NonFatal(t) ||
        t.isInstanceOf[java.util.ServiceConfigurationError] ||
        t.isInstanceOf[LinkageError]
    def warn(t: Throwable): Unit =
      System.err.println("[graft.media] skipping MediaDecoder provider " +
        s"that failed to load: ${t.getClass.getName}: " +
        Option(t.getMessage).getOrElse("").take(200))
    val out = scala.collection.mutable.ArrayBuffer.empty[MediaDecoder]
    val it = java.util.ServiceLoader.load(classOf[MediaDecoder]).iterator()
    var more = true
    while (more) {
      // hasNext (config-file parse) and next (provider instantiation)
      // can EACH throw ServiceConfigurationError. A throwing next skips
      // just that provider and keeps iterating; a throwing hasNext gives
      // no way to advance past the bad entry, so discovery STOPS there
      // (providers already loaded stay usable) rather than retrying the
      // same throw forever.
      more = try it.hasNext catch {
        case t: Throwable if contained(t) => warn(t); false
      }
      if (more) {
        try out += it.next()
        catch { case t: Throwable if contained(t) => warn(t) }
      }
    }
    out.toArray
  }

  private def externalImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    var i = 0
    while (i < externalDecoders.length) {
      val d = try externalDecoders(i).decodeImage(bytes)
      catch { case scala.util.control.NonFatal(_) => null }
      if (d != null) return d
      i += 1
    }
    null
  }

  private def externalAudio(bytes: Array[Byte]): WavData = {
    var i = 0
    while (i < externalDecoders.length) {
      val d = try externalDecoders(i).decodeAudio(bytes)
      catch { case scala.util.control.NonFatal(_) => null }
      if (d != null) return d
      i += 1
    }
    null
  }

  /** REAL image decode (JDK ImageIO: PNG/JPEG/BMP/GIF), then any
    * [[MediaDecoder]] SPI plug-ins for formats the JDK lacks. Returns
    * null for null/empty/undecodable bytes — callers branch to
    * byte-level fallbacks. Pure raster ops, headless-safe.
    */
  private[graft] def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null || bytes.isEmpty) null
    else {
      val builtIn = try {
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      } catch { case scala.util.control.NonFatal(_) => null }
      if (builtIn != null) builtIn else externalImage(bytes)
    }

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
    def subsample(b: Array[Byte]): Array[Byte] = {
      val step = math.max(1, b.length / targetLen)
      b.indices.collect { case i if i % step == 0 => b(i) }.toArray
    }
    // (bytes, wasImage): the flag drives the format-metadata update below.
    // Encode guarded like decode — a PNG-writer failure falls back to the
    // byte path instead of killing the job on one row.
    val resample = udf((b: Array[Byte]) => {
      if (b == null) null
      else {
        val img = decodeImage(b)
        val encoded =
          if (img == null) null
          else try {
            val bos = new java.io.ByteArrayOutputStream()
            // write() returns false (writing NOTHING) when no PNG writer
            // SPI is registered — that must fall back, not emit 0 bytes
            val ok = javax.imageio.ImageIO.write(
              scaleImage(img, targetW, targetH), "png", bos)
            if (ok && bos.size() > 0) bos.toByteArray else null
          } catch { case scala.util.control.NonFatal(_) => null }
        if (encoded != null) (encoded, true) else (subsample(b), false)
      }
    })
    // collision-free temp name (AsOfJoin/RangeJoin convention): a
    // hard-coded "_rs" would clobber and then drop a caller's column
    val rsC = Iterator.iterate("_rs")(_ + "_")
      .find(!df.columns.contains(_)).get
    val wasImage = col(rsC).getField("_2")
    // metadata truth: only rows actually re-encoded as images assert the
    // target pixel dimensions; byte-subsampled fallbacks and null payloads
    // keep their original (or absent) dims — same gating as format below.
    def gatedDim(c: String, target: Int)(d: DataFrame): DataFrame =
      if (d.columns.contains(c))
        d.withColumn(c, when(wasImage === true, lit(target)).otherwise(col(c)))
      else
        d.withColumn(c, when(wasImage === true, lit(target)))
    val out = gatedDim("height", targetH)(gatedDim("width", targetW)(
      df.withColumn(rsC, resample(col(mediaCol)))
        .withColumn(mediaCol, col(rsC).getField("_1"))))
    // keep the format column TRUE: re-encodes are PNG; byte-subsampled
    // fallbacks are no longer any codec's format; null payloads keep theirs
    val withFormat =
      if (df.columns.contains("format"))
        out.withColumn("format",
          when(wasImage === true, lit("image/png"))
            .when(wasImage === false, lit("application/octet-stream"))
            .otherwise(col("format")))
      else out
    withFormat.drop(rsC)
  }

  /** STUB frame sampling for video: emits every `everyN`-th fixed-size
    * chunk of the binary as a frame row (real impl: container demux).
    * Generator shape: one input row → many frame rows via explode.
    */
  def sampleFrames(df: DataFrame, mediaCol: String, idCol: String,
                   frameBytes: Int, everyN: Int): DataFrame = {
    // fail fast on the driver — inside the UDF these surface as opaque
    // per-task ArithmeticException/IllegalArgumentException after retries
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val chunks = udf((b: Array[Byte]) =>
      if (b == null) Seq.empty[Array[Byte]]
      else b.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % everyN == 0 => chunk }
        .toSeq)
    df.select(col(idCol), posexplode(chunks(col(mediaCol))).as(Seq("frame_idx", "frame")))
  }

  /** REAL video frame sampling for MJPEG — the one video container
    * decodable with zero external codecs, because it is literally
    * concatenated JPEGs and ImageIO decodes JPEG. Frames are located by
    * scanning SOI (FFD8) / EOI (FFD9) marker pairs; inside a well-formed
    * scan 0xFF is escaped (FF00) or a restart marker, so the pair scan
    * is sound for streams whose frames do not embed thumbnail JPEGs
    * (typical camera MJPEG). Every `everyN`-th frame is emitted with its
    * DECODED pixel dimensions; non-MJPEG payloads emit no rows (compose
    * with [[sampleFrames]] for the byte-level fallback).
    */
  def sampleFramesMjpeg(df: DataFrame, mediaCol: String, idCol: String,
                        everyN: Int = 1): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val frames = udf((b: Array[Byte]) =>
      mjpegFrameOffsets(b).zipWithIndex
        .collect { case ((s, e), i) if i % everyN == 0 =>
          java.util.Arrays.copyOfRange(b, s, e) }
        .flatMap { fb =>
          val img = decodeImage(fb)
          if (img == null) None else Some((fb, img.getWidth, img.getHeight))
        })
    df.select(col(idCol),
      posexplode(frames(col(mediaCol))).as(Seq("frame_idx", "_f")))
      .select(col(idCol), col("frame_idx"),
        col("_f._1").as("frame"), col("_f._2").as("width"),
        col("_f._3").as("height"))
  }

  /** (start, end) byte ranges of SOI..EOI frames in an MJPEG stream.
    *
    * Length-aware segment walk, NOT a naive FFD9 byte scan: header
    * segment payloads (DQT/DHT/APPn/EXIF blobs) may contain raw FF D9
    * bytes — only entropy-coded scan data escapes FF. Each marker's
    * length-prefixed payload is skipped wholesale; after SOS the
    * entropy-coded region is scanned for the next real marker (FF
    * followed by anything but 00/RST), which is either EOI or a further
    * header segment (progressive scans). Malformed frames resync at the
    * next SOI instead of corrupting subsequent frame indices.
    */
  private[graft] def mjpegFrameOffsets(b: Array[Byte]): Seq[(Int, Int)] = {
    if (b == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val n = b.length
    @inline def u(idx: Int): Int = b(idx) & 0xff
    var i = 0
    while (i + 1 < n) {
      if (u(i) == 0xff && u(i + 1) == 0xd8) {
        val start = i
        var j = i + 2
        var end = -1
        var ok = true
        while (ok && end < 0 && j + 1 < n) {
          if (u(j) != 0xff) ok = false // expected a marker
          else u(j + 1) match {
            case 0xd9 => end = j + 2                      // EOI
            case 0xd8 => ok = false                       // nested SOI
            case 0xff => j += 1                           // fill byte
            case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
              j += 2                                      // standalone marker
            case 0xda =>                                  // SOS
              if (j + 3 >= n) ok = false
              else {
                var k = j + 2 + ((u(j + 2) << 8) | u(j + 3))
                var found = false
                while (!found && k + 1 < n) {
                  if (u(k) == 0xff && u(k + 1) != 0x00 &&
                      !(u(k + 1) >= 0xd0 && u(k + 1) <= 0xd7)) {
                    j = k; found = true
                  } else k += 1
                }
                if (!found) ok = false
              }
            case _ =>                                     // length-prefixed
              if (j + 3 >= n) ok = false
              else j += 2 + ((u(j + 2) << 8) | u(j + 3))
          }
        }
        if (end > 0) { out += ((start, end)); i = end }
        // Malformed frame: resync where the walk STOPPED, never inside
        // payloads it already skipped — restarting at start+2 would
        // byte-scan an APPn payload and could emit an embedded EXIF
        // thumbnail's SOI..EOI as a spurious frame, shifting every
        // subsequent frame index.
        else i = math.max(start + 2, j)
      } else i += 1
    }
    out.toSeq
  }

  /** Decoded PCM audio: sample rate, channel count, and samples mixed to
    * mono floats in [-1, 1].
    */
  final case class WavData(sampleRate: Int, channels: Int, samples: Array[Float])

  /** Audio decode: the built-in RIFF parser first (exact, oracle-pinned),
    * then any [[MediaDecoder]] SPI plug-ins for compressed formats the
    * JDK lacks. Null when nothing decodes — callers branch to byte
    * fallbacks.
    */
  private[graft] def decodeWav(bytes: Array[Byte]): WavData =
    if (bytes == null || bytes.isEmpty) null
    else {
      val builtIn = decodeWavRiff(bytes)
      if (builtIn != null) builtIn else externalAudio(bytes)
    }

  /** Minimal RIFF/WAVE PCM parser — pure JVM, no codecs (WAV is
    * uncompressed; 8/16-bit integer PCM, G.711 mu/A-law). Returns null
    * for anything that is not a well-formed PCM WAV.
    */
  private[graft] def decodeWavRiff(bytes: Array[Byte]): WavData = try {
    if (bytes == null || bytes.length < 44) return null
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return null
    var pos = 12
    var fmt: (Int, Int, Int, Int) = null // (formatCode, channels, sampleRate, bitsPerSample)
    var data: (Int, Int) = null     // (offset, length)
    while (pos + 8 <= bytes.length && (fmt == null || data == null)) {
      val id = tag(pos)
      val len = bb.getInt(pos + 4)
      // long arithmetic: a crafted len near Int.MaxValue must fail the
      // bounds check, not overflow past it into an OOM-sized allocation
      if (len < 0 || pos.toLong + 8L + len > bytes.length) return null
      if (id == "fmt ") {
        if (len < 16) return null
        val code = bb.getShort(pos + 8).toInt
        // 1 = integer PCM; 6/7 = G.711 A-law/mu-law (REAL compressed-
        // audio decode — the G.711 expansion is a pure public formula)
        if (code != 1 && code != 6 && code != 7) return null
        fmt = (code, bb.getShort(pos + 10).toInt, bb.getInt(pos + 12),
          bb.getShort(pos + 22).toInt)
      } else if (id == "data") data = (pos + 8, len)
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmt == null || data == null) return null
    val (code, channels, rate, bits) = fmt
    if (channels < 1) return null
    if (code == 1 && bits != 8 && bits != 16) return null
    if (code != 1 && bits != 8) return null // G.711 is always 8-bit bytes
    val bytesPerFrame = channels * bits / 8
    val n = data._2 / bytesPerFrame
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      var acc = 0.0f
      var c = 0
      while (c < channels) {
        val off = data._1 + i * bytesPerFrame + c * bits / 8
        acc += (code match {
          case 1 =>
            if (bits == 16) bb.getShort(off) / 32768.0f
            else ((bytes(off) & 0xff) - 128) / 128.0f
          case 6 => alawToLinear(bytes(off)) / 32768.0f
          case 7 => ulawToLinear(bytes(off)) / 32768.0f
        })
        c += 1
      }
      out(i) = acc / channels
      i += 1
    }
    WavData(rate, channels, out)
  } catch { case scala.util.control.NonFatal(_) => null } // totality: bad bytes -> null

  /** G.711 mu-law expansion (ITU-T G.711; the standard public-domain
    * formula): 8-bit companded byte -> 16-bit linear sample.
    */
  private[graft] def ulawToLinear(u: Byte): Int = {
    val x = (~u) & 0xff
    val t0 = (((x & 0x0f) << 3) + 0x84) << ((x & 0x70) >> 4)
    if ((x & 0x80) != 0) 0x84 - t0 else t0 - 0x84
  }

  /** G.711 A-law expansion (ITU-T G.711). */
  private[graft] def alawToLinear(a0: Byte): Int = {
    val a = (a0 ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    t += (if (seg == 0) 8 else 0x108)
    if (seg > 1) t <<= (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** REAL audio feature kernel: dim/2 equal windows over the mono signal,
    * each contributing (RMS energy, zero-crossing rate) — the classic
    * cheap audio descriptor pair. Output layout: [rms..., zcr...].
    */
  private[multimodal] def audioFeatureVec(wav: WavData, dim: Int): Array[Float] = {
    val k = math.max(1, dim / 2)
    val out = new Array[Float](dim)
    val s = wav.samples
    if (s.isEmpty) return out
    val win = math.max(1, s.length / k)
    var w = 0
    while (w < k) {
      val start = w * win
      val end = if (w == k - 1) s.length else math.min(s.length, start + win)
      var sumSq = 0.0; var zc = 0
      var i = start
      while (i < end) {
        sumSq += s(i) * s(i)
        if (i > start && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
        i += 1
      }
      val len = math.max(1, end - start)
      out(w) = math.sqrt(sumSq / len).toFloat
      if (k + w < dim) out(k + w) = zc.toFloat / len
      w += 1
    }
    out
  }

  /** Audio decode + feature-extract: PCM WAV payloads get REAL per-window
    * RMS/zero-crossing features; other payloads get the deterministic
    * byte-hash fallback (same totality contract as extractFeatures).
    */
  def extractAudioFeatures(df: DataFrame, mediaCol: String, idCol: String,
                           dim: Int = 32,
                           outCol: String = "audio_features"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(outCol, ArrayType(FloatType)))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes =
          if (r.isNullAt(mediaIdx)) null
          else r.getAs[Array[Byte]](mediaIdx)
        val wav = decodeWav(bytes)
        val feats =
          if (wav != null) audioFeatureVec(wav, dim) else fakeDecode(bytes, dim)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Decoded-audio metadata (null columns when not a PCM WAV). */
  def audioMeta(df: DataFrame, mediaCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("sample_rate", IntegerType))
      .add(StructField("n_samples", IntegerType))
      .add(StructField("duration_ms", IntegerType))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val wav = decodeWav(
          if (r.isNullAt(mediaIdx)) null else r.getAs[Array[Byte]](mediaIdx))
        val extra: Seq[Any] =
          if (wav == null) Seq(null, null, null)
          else Seq(wav.sampleRate, wav.samples.length,
            (wav.samples.length * 1000L / math.max(1, wav.sampleRate)).toInt)
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** INTEGER-EXACT per-window audio statistics over decoded PCM: the
    * mono signal splits into `nWindows` equal windows (floor split, last
    * window takes the remainder — `audioFeatureVec`'s rule) and each
    * emits `(window, n_samples, sum_sq, zero_crossings)` on the
    * 16-bit-integer reconstruction `round(sample × 32768)`. For mono
    * integer-PCM WAV the reconstruction IS the original sample (the
    * decode divides by the power of two 32768, exact in float), so
    * these stats are bit-exact integers — the oracle-able face of the
    * real decode kernel (q96), and a scale-friendly audio descriptor:
    * one pass per row, embarrassingly parallel, no floats to drift.
    * Zero crossings use the sign rule `(s_i >= 0) != (s_{i-1} >= 0)`
    * counted within the window. Non-WAV / null payloads emit no rows.
    */
  def audioWindowStats(df: DataFrame, mediaCol: String, idCol: String,
                       nWindows: Int): DataFrame = {
    require(nWindows >= 1, s"nWindows must be >= 1, got $nWindows")
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      inSchema(idIdx),
      StructField("window", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("zero_crossings", IntegerType, nullable = false)))
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val wav = decodeWav(
          if (r.isNullAt(mediaIdx)) null else r.getAs[Array[Byte]](mediaIdx))
        if (wav == null || wav.samples.isEmpty) Iterator.empty
        else {
          val s = wav.samples
          val k = nWindows
          val win = math.max(1, s.length / k)
          val id = r.get(idIdx)
          (0 until k).iterator.flatMap { w =>
            val start = w * win
            val end = if (w == k - 1) s.length else math.min(s.length, start + win)
            if (start >= end) None
            else {
              var sumSq = 0L; var zc = 0
              var i = start
              var prev = 0
              while (i < end) {
                val si = Math.round(s(i) * 32768.0f)
                sumSq += si.toLong * si
                if (i > start && (si >= 0) != (prev >= 0)) zc += 1
                prev = si
                i += 1
              }
              Some(Row(id, w, end - start, sumSq, zc))
            }
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** INTEGER-EXACT per-cell image statistics over the decoded raster:
    * the image splits into a `grid` × `grid` cell lattice (floor split,
    * the last row/column of cells takes the remainder —
    * `audioWindowStats`' rule in two dimensions) and each cell emits
    * `(gx, gy, n_pixels, sum_r, sum_g, sum_b)` straight off the decoded
    * ARGB ints. PNG/BMP/GIF are lossless, so for those formats the
    * decoded channel bytes ARE the encoded pixels and the sums are
    * bit-exact integers — the oracle-able face of the real ImageIO
    * decode kernel (q97, the image twin of q96), and a scale-friendly
    * descriptor: one raster pass per row, embarrassingly parallel,
    * no floats anywhere. Null / undecodable payloads emit no rows.
    */
  def imageGridStats(df: DataFrame, mediaCol: String, idCol: String,
                     grid: Int): DataFrame = {
    require(grid >= 1, s"grid must be >= 1, got $grid")
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(Seq(
      inSchema(idIdx),
      StructField("gx", IntegerType, nullable = false),
      StructField("gy", IntegerType, nullable = false),
      StructField("n_pixels", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val img = decodeImage(
          if (r.isNullAt(mediaIdx)) null else r.getAs[Array[Byte]](mediaIdx))
        if (img == null) Iterator.empty
        else {
          val w = img.getWidth; val h = img.getHeight
          val id = r.get(idIdx)
          val cw = math.max(1, w / grid); val ch = math.max(1, h / grid)
          for {
            gy <- (0 until grid).iterator
            y0 = gy * ch
            y1 = if (gy == grid - 1) h else math.min(h, y0 + ch)
            gx <- (0 until grid).iterator
            x0 = gx * cw
            x1 = if (gx == grid - 1) w else math.min(w, x0 + cw)
            if y0 < y1 && x0 < x1
          } yield {
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            Row(id, gx, gy, (x1 - x0) * (y1 - y0), sr, sg, sb)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
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
