package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MediaOps

/** Real pure-JDK multimodal decode: ImageIO images + javax.sound WAV. */
class MediaOpsSpec extends AnyFunSuite {

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 13 + y * 57) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wav(sampleRate: Int, nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = (math.sin(i * 0.1) * 10000).toInt
      data(i * 2) = (v & 0xff).toByte
      data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("image decode recovers true dimensions and a sane luma grid") {
    val (w, h, feat) = MediaOps.decodeImage(png(40, 24), 16)
    assert(w == 40 && h == 24)
    assert(feat.length == 16)
    assert(feat.forall(f => f >= 0f && f <= 1f))
    assert(feat.exists(_ > 0f)) // not all-black
    // deterministic across calls
    assert(MediaOps.decodeImage(png(40, 24), 16)._3.toSeq == feat.toSeq)
  }

  test("wav decode recovers sample rate, frame count and RMS energy") {
    val (rate, frames, feat) = MediaOps.decodeWav(wav(16000, 8000), 8)
    assert(rate == 16000)
    assert(frames == 8000)
    assert(feat.length == 8)
    // a ±10000-amplitude sine has RMS near 10000/32768/sqrt(2) ≈ 0.216
    assert(feat.forall(f => f > 0.1f && f < 0.4f), feat.mkString(","))
  }

  test("decode dispatch: pdf payload falls back to the deterministic stub") {
    val bytes = "not an image".getBytes
    val (w, h, f1) = MediaOps.decode("application/pdf", bytes, 4)
    val (w2, h2, f2) = MediaOps.decode("application/pdf", bytes, 4)
    assert(w == w2 && h == h2 && f1.toSeq == f2.toSeq)
    // a corrupt image payload must not throw either
    MediaOps.decode("image/png", bytes, 4)
  }
}
