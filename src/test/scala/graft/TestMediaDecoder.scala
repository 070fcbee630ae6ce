package graft

import graft.multimodal.Multimodal

/** ServiceLoader-registered test codec (see
  * `src/test/resources/META-INF/services/graft.multimodal.MediaDecoder`)
  * — exercises the REAL SPI discovery path, not a mock: decodes only the
  * magic-prefixed "FAKEIMG"/"FAKEAUD" payloads the SPI spec plants and
  * returns null for everything else, so its presence on the test
  * classpath cannot perturb any other multimodal test in the same JVM.
  */
class TestMediaDecoder extends graft.multimodal.MediaDecoder {

  override def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes.length < 7 ||
        new String(bytes, 0, 7, "US-ASCII") != "FAKEIMG") null
    else {
      val img = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFFFFFF); img.setRGB(1, 0, 0x000000)
      img.setRGB(0, 1, 0x000000); img.setRGB(1, 1, 0xFFFFFF)
      img
    }

  override def decodeAudio(bytes: Array[Byte]): Multimodal.WavData =
    if (bytes.length < 7 ||
        new String(bytes, 0, 7, "US-ASCII") != "FAKEAUD") null
    else Multimodal.WavData(8000, 1, Array(0.5f, -0.5f, 0.25f, -0.25f))
}
