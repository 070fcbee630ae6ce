package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side contract is real and tested — schema, partition-local
  * batched iteration (`mapPartitions`, the JVM analog of `mapInPandas`
  * batches), deterministic output shapes, metadata propagation. The DECODE
  * KERNELS ARE STUBS (`fakeDecode`): this container has no image/audio
  * codecs, so the byte→pixels step is a clearly-marked deterministic fake.
  * Swapping in a real codec touches ONLY the kernel body — the operator
  * shape (binary in, fixed-width float features / resized binary /
  * sampled frames out) is what the engine owns.
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

  /** Decode + feature-extract: binary column → fixed-width `array<float>`
    * embedding, computed per partition (batched iteration keeps per-row
    * overhead off the hot path and lets a real kernel amortize model
    * setup per partition, exactly like mapInPandas batches).
    */
  def extractFeatures(df: DataFrame, mediaCol: String, idCol: String,
                      dim: Int = 32,
                      outCol: String = "media_features"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(outCol, ArrayType(FloatType)))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      // per-partition setup would initialize the real codec/model here
      rows.map { r =>
        val bytes =
          if (r.isNullAt(mediaIdx)) null
          else r.getAs[Array[Byte]](mediaIdx)
        Row.fromSeq(r.toSeq :+ fakeDecode(bytes, dim).toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** STUB resize: re-encodes the binary to a target size by deterministic
    * subsampling of bytes (real impl: image resample). Metadata columns
    * are updated to the new dimensions — the part pipelines depend on.
    */
  def resize(df: DataFrame, mediaCol: String, targetW: Int, targetH: Int): DataFrame = {
    val targetLen = math.max(1, targetW * targetH / 64)
    val subsample = udf((b: Array[Byte]) =>
      if (b == null) null
      else {
        val step = math.max(1, b.length / targetLen)
        b.indices.collect { case i if i % step == 0 => b(i) }.toArray
      })
    df.withColumn(mediaCol, subsample(col(mediaCol)))
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
