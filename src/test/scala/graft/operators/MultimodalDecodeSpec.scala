package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real-codec decode through [[Multimodal.JdkDecoder]]: the test
  * GENERATES genuine PNG/BMP/GIF/WAV payloads with the same JDK codecs,
  * then asserts the decoder recovers true dimensions/format metadata and
  * content-derived features — not hash-derived pseudo-values. */
class MultimodalDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** Same loud-then-silent signal written as little-endian WAV or
    * big-endian AIFF — the canonicalizing decoder must produce the same
    * envelope from both. */
  private def pcmFile(sampleRate: Int, nSamples: Int,
                      tpe: AudioFileFormat.Type): Array[Byte] = {
    val bigEndian = tpe == AudioFileFormat.Type.AIFF
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, bigEndian)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      // loud first half, silent second half — the envelope must see it
      val v = if (i < nSamples / 2)
        (math.sin(i * 0.1) * 20000).toInt else 0
      val (lo, hi) = ((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      pcm(i * 2) = if (bigEndian) hi else lo
      pcm(i * 2 + 1) = if (bigEndian) lo else hi
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, tpe, bos)
    bos.toByteArray
  }

  private def wav(sampleRate: Int, nSamples: Int): Array[Byte] =
    pcmFile(sampleRate, nSamples, AudioFileFormat.Type.WAVE)

  test("MP4 probe parses real container metadata — no codec needed") {
    val bytes = graft.TestMedia.mp4(640, 360, Seq(100, 50))
    assert(Multimodal.JdkDecoder.probe(bytes, "mp4") == (640, 360, 150))
    // garbage routed as mp4 → explicit could-not-decode, not pseudo-data
    assert(Multimodal.JdkDecoder.probe("not-an-mp4".getBytes, "mp4") == (0, 0, 0))
  }

  test("probe recovers true image dimensions and audio format") {
    assert(Multimodal.JdkDecoder.probe(png(37, 21, 0xFFFFFF), "png") == (37, 21, 1))
    assert(Multimodal.JdkDecoder.probe(bmp(64, 48), "bmp") == (64, 48, 1))
    val (rate, ch, frames) = Multimodal.JdkDecoder.probe(wav(8000, 4000), "wav")
    assert(rate == 8000 && ch == 1 && frames == 4000)
  }

  test("image features are a luminance histogram of the real pixels") {
    // pure white image → ALL mass in the top luminance bucket
    val f = Multimodal.JdkDecoder.features(png(16, 16, 0xFFFFFF), "png", 8)
    assert(math.abs(f.sum - 1.0f) < 1e-5)
    assert(f(7) == 1.0f && f.take(7).forall(_ == 0f))
    // pure black image → all mass in the bottom bucket
    val g = Multimodal.JdkDecoder.features(png(16, 16, 0x000000), "png", 8)
    assert(g(0) == 1.0f)
  }

  test("audio features are the RMS envelope of the real samples") {
    val f = Multimodal.JdkDecoder.features(wav(8000, 4000), "wav", 4)
    // loud first half, silent second half
    assert(f(0) > 0.5f && f(1) > 0.5f)
    assert(f(2) == 0f && f(3) == 0f)
  }

  test("big-endian AIFF canonicalizes: same envelope as the WAV twin") {
    val w = Multimodal.JdkDecoder.features(wav(8000, 4000), "wav", 4)
    val a = Multimodal.JdkDecoder.features(
      pcmFile(8000, 4000, AudioFileFormat.Type.AIFF), "aiff", 4)
    // byte-swapped sampling would light up the silent half with noise
    (w zip a).foreach { case (x, y) => assert(math.abs(x - y) < 1e-3f) }
    assert(a(2) == 0f && a(3) == 0f)
  }

  test("MP4 probe reads the VIDEO track when an audio trak comes first") {
    val bytes = graft.TestMedia.mp4AudioFirst(320, 240,
      videoFrames = 90, audioSamples = 44100)
    assert(Multimodal.JdkDecoder.probe(bytes, "mp4") == (320, 240, 90))
  }

  test("video features are the real stsz bitrate envelope — no pseudo-data") {
    // 40 frames: constant 500 bytes, then constant 2000 bytes — the
    // envelope must be low-then-high after peak normalization
    val sizes = Seq.fill(20)(500) ++ Seq.fill(20)(2000)
    val bytes = graft.TestMedia.mp4(640, 360, Seq(40), sizes)
    val f = Multimodal.JdkDecoder.features(bytes, "mp4", 4)
    assert(f(0) == 0.25f && f(1) == 0.25f) // 500/2000
    assert(f(2) == 1.0f && f(3) == 1.0f)
    // unparseable container → explicit zero vector, not hash noise
    val g = Multimodal.JdkDecoder.features("not-a-video".getBytes, "avi", 4)
    assert(g.forall(_ == 0f))
    assert(Multimodal.JdkDecoder.probe("not-a-video".getBytes, "avi") == (0, 0, 0))
  }

  test("AVI probe parses the real RIFF chunk tree: avih dims + movi sizes") {
    val sizes = Seq.fill(10)(250) ++ Seq.fill(10)(1000)
    val bytes = graft.TestMedia.avi(720, 480, sizes)
    assert(Multimodal.JdkDecoder.probe(bytes, "avi") == (720, 480, 20))
    val f = Multimodal.JdkDecoder.features(bytes, "avi", 2)
    assert(f(0) == 0.25f && f(1) == 1.0f) // 250/1000 frame-size envelope
  }

  test("Matroska probe walks the real EBML tree: dims + block count") {
    val sizes = Seq.fill(10)(100) ++ Seq.fill(10)(400)
    val bytes = graft.TestMedia.mkv(1280, 720, sizes)
    assert(Multimodal.JdkDecoder.probe(bytes, "mkv") == (1280, 720, 20))
    val f = Multimodal.JdkDecoder.features(bytes, "webm", 2)
    assert(f(0) == 0.25f && f(1) == 1.0f) // 100/400 block-size envelope
    assert(Multimodal.JdkDecoder.probe("garbage".getBytes, "mkv") == (0, 0, 0))
  }

  test("corrupt video containers yield could-not-decode, never a crash") {
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // a bare tkhd (empty payload) as the LAST box of the buffer: the
    // version byte would be read one past the end without the guard
    val tkhd = be32(8) ++ "tkhd".getBytes
    val trak = be32(16) ++ "trak".getBytes ++ tkhd
    val moov = be32(24) ++ "moov".getBytes ++ trak
    assert(Multimodal.JdkDecoder.probe(moov, "mp4") == (0, 0, 0))
    assert(Multimodal.JdkDecoder.features(moov, "mp4", 4).forall(_ == 0f))
    // an EBML element declaring a 2^31 size: Int math would wrap the end
    // offset negative and walk out of the buffer
    val ebml = Array[Byte](0x18, 0x53, 0x80.toByte, 0x67,
      0x01, 0x00, 0x00, 0x00, 0x80.toByte, 0x00, 0x00, 0x00)
    assert(Multimodal.JdkDecoder.probe(ebml, "webm") == (0, 0, 0))
    assert(Multimodal.JdkDecoder.features(ebml, "webm", 4).forall(_ == 0f))
  }

  test("probeAll runs the real decoder distributed over a media frame") {
    val rows = Seq(
      (1L, "image", png(20, 10, 0xFF0000), "png"),
      (2L, "image", bmp(8, 8), "bmp"),
      (3L, "audio", wav(16000, 100), "wav"))
      .toDF("media_id", "modality", "content", "format")
    val out = Multimodal.probeAll(rows)
      .select("media_id", "width", "height", "n_frames")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 20, 10, 1), (2L, 8, 8, 1), (3L, 16000, 1, 100)))
  }

  test("resizeImages caps the long edge, keeps aspect, re-probes to the new dims") {
    val rows = Seq(
      (1L, "image", png(40, 10, 0x00FF00), "png"), // 4:1 → 8×2
      (2L, "image", bmp(6, 6), "bmp"),             // under cap → untouched
      (3L, "audio", wav(16000, 50), "wav"),        // not an image → null
      (4L, "image", Array[Byte](1, 2, 3), "png"))  // corrupt → null
      .toDF("media_id", "modality", "content", "format")
    val out = Multimodal.resizeImages(rows, maxDim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        Option(r.getAs[Array[Byte]]("out_content")))).sortBy(_._1)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1L, 8, 2), (2L, 6, 6), (3L, 0, 0), (4L, 0, 0)), out.toSeq.toString)
    assert(out(2)._4.isEmpty && out(3)._4.isEmpty)
    // the emitted bytes are a REAL image: re-probing recovers the dims
    val re = Multimodal.JdkDecoder.probe(out(0)._4.get, "png")
    assert(re == ((8, 2, 1)), re.toString)
    // deterministic per byte content: a second pass emits identical bytes
    val again = Multimodal.resizeImages(rows, maxDim = 8)
      .filter(col("media_id") === 1L).collect()(0).getAs[Array[Byte]]("out_content")
    assert(java.util.Arrays.equals(again, out(0)._4.get))
  }

  test("extractFeatures feeds VectorOps with content-derived embeddings") {
    val rows = Seq(
      (1L, "image", png(16, 16, 0xFFFFFF), "png"),
      (2L, "image", png(16, 16, 0x000000), "png"))
      .toDF("media_id", "modality", "content", "format")
    val em = Multimodal.extractFeatures(rows, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(em(1L)(7) == 1.0f && em(2L)(0) == 1.0f)
  }
}
