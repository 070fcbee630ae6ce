package graft.multimodal

/** SPI for plugging compressed-media codecs the JDK lacks (MP3, AAC,
  * H.264, …) into the multimodal operators — the resolution of the
  * long-carried "compressed codecs stay byte-level fallback" item:
  * rather than bundling a native codec dependency, users who need real
  * MP3/AAC/H.264 decode ship their own implementation jar with a
  * `META-INF/services/graft.multimodal.MediaDecoder` entry, and every
  * JVM (driver and each executor) discovers it lazily via
  * `java.util.ServiceLoader` on first decode. No session config and no
  * closure capture: the registry is re-resolved from each executor's
  * own classpath, so the operators stay serialization-clean and the
  * plug-in works on a 1000-executor cluster exactly as on local[32].
  *
  * Contract:
  *  - Return null for bytes the decoder does not handle; throwing is
  *    treated the same as null (contained per row).
  *  - The BUILT-IN kernels run FIRST (ImageIO PNG/JPEG/BMP/GIF, RIFF
  *    integer-PCM WAV, G.711 mu/A-law, MJPEG marker scan): they are
  *    exact and oracle-pinned, so a plugged decoder extends coverage
  *    but can never change the behavior of formats the engine already
  *    decodes. External decoders run only when the built-ins return
  *    null, in classpath order, first non-null wins.
  *  - When nothing decodes the bytes, the deterministic byte-level
  *    fallbacks keep every operator total, exactly as before.
  *  - Implementations must be thread-safe (executor threads decode
  *    concurrently) and should magic-byte-sniff cheaply before doing
  *    real work (they run per undecodable row).
  */
trait MediaDecoder {

  /** Decoded image, or null when these bytes aren't this decoder's
    * format.
    */
  def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage = null

  /** Decoded audio (mono float samples in [-1, 1] + rate/channels), or
    * null when these bytes aren't this decoder's format.
    */
  def decodeAudio(bytes: Array[Byte]): Multimodal.WavData = null
}
