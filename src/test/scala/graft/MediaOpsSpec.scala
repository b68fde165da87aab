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

  test("resizeImage: aspect-preserving fit, never upscales, round-trips through PNG") {
    val r = MediaOps.resizeImage(png(40, 16), 20, 20)
    assert((r.in_w, r.in_h) == (40, 16))
    assert((r.out_w, r.out_h) == (20, 8)) // scale 0.5 preserves 5:2
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.out_bytes))
    assert(back.getWidth == 20 && back.getHeight == 8)
    // nearest-neighbour: output pixel (x,y) equals source pixel (2x, 2y)
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png(40, 16)))
    assert((back.getRGB(3, 2) & 0xffffff) == (src.getRGB(6, 4) & 0xffffff))
    // small images pass through at original size (no upscale)
    val small = MediaOps.resizeImage(png(10, 5), 20, 20)
    assert((small.out_w, small.out_h) == (10, 5))
    // deterministic bytes
    assert(MediaOps.resizeImage(png(40, 16), 20, 20).out_bytes.toSeq == r.out_bytes.toSeq)
    // undecodable -> null
    assert(MediaOps.resizeImage("junk".getBytes, 20, 20) == null)
  }

  test("frameSample stub: deterministic, stride respected, fan-out capped") {
    val bytes = "pretend this is a video".getBytes
    val f1 = MediaOps.stubFrames(bytes, everyNth = 7, maxFrames = 5)
    assert(f1 == MediaOps.stubFrames(bytes, 7, 5))
    assert(f1.size <= 5 && f1.nonEmpty)
    assert(f1.map(_._1) == f1.map(_._1).sorted)
    assert(f1.forall(_._1 % 7 == 0))
    // the cap bounds even a stride-1 sweep
    assert(MediaOps.stubFrames(bytes, 1, 16).size <= 16)
  }

  private def gif(frames: Int, w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until frames) {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val colors = Array(0xff0000, 0x00ff00, 0x0000ff)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, colors((x / 3 + y / 3 + f) % 3))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("gifFrames: REAL indexed multi-frame decode — stride, cap, determinism, dispatch") {
    val bytes = gif(frames = 5, w = 12, h = 10)
    val fs = MediaOps.gifFrames(bytes, everyNth = 2, maxFrames = 2)
    assert(fs.map(_._1) == Seq(0, 2), fs)
    fs.foreach { case (_, len, _) => assert(len == 12 * 10) } // real decoded dims
    assert(fs == MediaOps.gifFrames(bytes, 2, 2)) // deterministic rasters
    val all = MediaOps.gifFrames(bytes, 1, 16)
    assert(all.size == 5, all)
    assert(all.map(_._3).distinct.size > 1, "frames must differ") // real per-frame content
    // dispatch: image/gif → real frames; video stays the declared stub
    assert(MediaOps.sampleFrames("image/gif", bytes, 2, 2) == fs)
    assert(MediaOps.sampleFrames("video/mp4", bytes, 2, 2) == MediaOps.stubFrames(bytes, 2, 2))
    // corrupt GIF payload falls back to the stub instead of throwing
    val junk = Array.fill[Byte](32)(7)
    assert(MediaOps.sampleFrames("image/gif", junk, 2, 2) == MediaOps.stubFrames(junk, 2, 2))
  }

  test("dHash: gradient bits, sample-point invariance, garbage null, deterministic") {
    def gray(f: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val g = f(x) & 0xff; img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val asc = MediaOps.dHash(gray(x => x * 16))
    assert(asc == "1" * 64) // luma strictly increases at every sample step
    assert(MediaOps.dHash(gray(x => (15 - x) * 16)) == "0" * 64)
    // altering a pixel no 9x8 sample point touches leaves the hash unchanged
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gray(x => x * 16)))
    img.setRGB(15, 15, 0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(MediaOps.dHash(bos.toByteArray) == asc)
    assert(MediaOps.dHash("junk".getBytes("UTF-8")) == null)
    assert(MediaOps.dHash(gray(x => x * 16)) == asc)
  }

  test("wavHash: energy-ramp bits, volume invariance, garbage null") {
    def rampWav(scale: Int, reversed: Boolean = false): Array[Byte] = {
      val n = 65 * 16
      val data = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val seg = math.min(64, i * 65 / n)
        val v = (if (reversed) (65 - seg) else (seg + 1)) * scale
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val h = MediaOps.wavHash(rampWav(250))
    assert(h == "1" * 64) // strictly increasing segment energy
    assert(MediaOps.wavHash(rampWav(500)) == h) // volume change preserves ordering
    assert(MediaOps.wavHash(rampWav(250, reversed = true)) == "0" * 64)
    assert(MediaOps.wavHash("junk".getBytes("UTF-8")) == null)
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
