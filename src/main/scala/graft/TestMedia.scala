package graft

import java.io.ByteArrayOutputStream

/** Deterministic synthetic-media generator (the dbgen analog for binary
  * columns): real media payloads assembled by hand from the public
  * specs — a minimal valid ISO-BMFF (MP4) box tree
  * (moov → trak → [tkhd, mdia → [hdlr, minf → stbl → [stts, stsz]]]),
  * a minimal Matroska/WebM EBML tree
  * (Segment → [Tracks → TrackEntry, Cluster → SimpleBlock*]), a RIFF
  * AVI, plus JDK-codec-encoded PNG/BMP images and WAV audio. Main-tree
  * so the multimodal driver gate and the specs generate the SAME
  * payloads; every builder is byte-deterministic for a given argument
  * list, which is what makes decode results oracle-able. */
object TestMedia {

  /** Solid-color RGB PNG encoded by the JDK's own ImageIO codec. */
  def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic patterned RGB image: rgb = f(x, y), encoded as
    * `format` ("png"/"bmp") — the pixel-identical-across-containers
    * fixture the pHash tests need. */
  def image(w: Int, h: Int, format: String,
            f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y) & 0xFFFFFF)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** All-black RGB BMP (BufferedImage default) via ImageIO. */
  def bmp(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** 16-bit mono WAV: loud sine first half, silence second half — the
    * RMS envelope must see the boundary. */
  def wav(sampleRate: Int, nSamples: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = if (i < nSamples / 2) (math.sin(i * 0.1) * 20000).toInt else 0
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 16-bit mono PCM audio with a caller-supplied waveform
    * (`f(i)` ∈ [-1, 1] per sample index), encoded as `fileType`
    * ("wav" little-endian or "aiff" big-endian — the JDK writes both).
    * Both containers carry the SAME 16-bit samples, so a decoder that
    * canonicalizes (afp64 does) sees identical PCM — the
    * pixel-identical-across-containers fixture, for audio. */
  def audio(sampleRate: Int, nSamples: Int, fileType: String,
            f: Int => Double): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val big = fileType.toLowerCase == "aiff"
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, big)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = math.max(-1.0, math.min(1.0, f(i)))
      val s = (v * 32767).toInt
      if (big) {
        pcm(i * 2) = ((s >> 8) & 0xff).toByte
        pcm(i * 2 + 1) = (s & 0xff).toByte
      } else {
        pcm(i * 2) = (s & 0xff).toByte
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      }
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    val tpe = if (big) AudioFileFormat.Type.AIFF else AudioFileFormat.Type.WAVE
    AudioSystem.write(ais, tpe, bos)
    bos.toByteArray
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(be32(8 + payload.length))
    bos.write(tpe.getBytes("US-ASCII"))
    bos.write(payload)
    bos.toByteArray
  }

  private def tkhdBox(width: Int, height: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(be32(0))                   // version 0 + flags
    (1 to 5).foreach(_ => bos.write(be32(0))) // ctime mtime trackid rsvd duration
    bos.write(new Array[Byte](8))        // reserved
    bos.write(new Array[Byte](2 + 2 + 2 + 2)) // layer altgroup volume rsvd
    bos.write(new Array[Byte](36))       // matrix
    bos.write(be32(width << 16))         // 16.16 width
    bos.write(be32(height << 16))        // 16.16 height
    box("tkhd", bos.toByteArray)
  }

  private def hdlrBox(handlerType: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(be32(0))                   // version + flags
    bos.write(be32(0))                   // pre_defined
    bos.write(handlerType.getBytes("US-ASCII")) // 'vide' | 'soun'
    bos.write(new Array[Byte](12))       // reserved
    bos.write(0)                         // empty name
    box("hdlr", bos.toByteArray)
  }

  private def sttsBox(frameCounts: Seq[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(be32(0))                   // version + flags
    bos.write(be32(frameCounts.size))    // entry_count
    frameCounts.foreach { c => bos.write(be32(c)); bos.write(be32(1000)) }
    box("stts", bos.toByteArray)
  }

  private def stszBox(sampleSizes: Seq[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(be32(0))                   // version + flags
    bos.write(be32(0))                   // sample_size 0 → per-sample table
    bos.write(be32(sampleSizes.size))    // sample_count
    sampleSizes.foreach(s => bos.write(be32(s)))
    box("stsz", bos.toByteArray)
  }

  private def trak(handlerType: String, width: Int, height: Int,
                   frameCounts: Seq[Int], sampleSizes: Seq[Int]): Array[Byte] = {
    val stbl = box("stbl", sttsBox(frameCounts) ++ stszBox(sampleSizes))
    val mdia = box("mdia", hdlrBox(handlerType) ++ box("minf", stbl))
    box("trak", tkhdBox(width, height) ++ mdia)
  }

  /** Deterministic varied per-frame encoded sizes (I-frame-ish spikes). */
  def videoSizes(n: Int): Seq[Int] =
    Seq.tabulate(n)(i => if (i % 10 == 0) 4000 else 600 + 150 * (i % 5))

  /** Minimal MP4 with one video track: tkhd v0 carrying 16.16 fixed-point
    * dimensions, hdlr 'vide', stts sample counts, stsz sample sizes. */
  def mp4(width: Int, height: Int, frameCounts: Seq[Int],
          sampleSizes: Seq[Int] = null): Array[Byte] = {
    val sizes = Option(sampleSizes).getOrElse(videoSizes(frameCounts.sum))
    val moov = box("moov", trak("vide", width, height, frameCounts, sizes))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    ftyp ++ moov
  }

  /** MP4 whose FIRST trak is audio ('soun', its own stts/stsz) and whose
    * second is the video track — exercises the track-type guard: a naive
    * first-stts walk reports the audio sample count. */
  def mp4AudioFirst(width: Int, height: Int, videoFrames: Int,
                    audioSamples: Int): Array[Byte] = {
    val audio = trak("soun", 0, 0, Seq(audioSamples),
      Seq.fill(audioSamples)(128))
    val video = trak("vide", width, height, Seq(videoFrames),
      videoSizes(videoFrames))
    val moov = box("moov", audio ++ video)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    ftyp ++ moov
  }

  // ---- AVI (RIFF) ----

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(id.getBytes("US-ASCII"))
    bos.write(le32(payload.length))
    bos.write(payload)
    if (payload.length % 2 == 1) bos.write(0) // even padding
    bos.toByteArray
  }

  private def riffList(listType: String, payload: Array[Byte]): Array[Byte] =
    riffChunk("LIST", listType.getBytes("US-ASCII") ++ payload)

  /** Minimal AVI: RIFF('AVI ' LIST('hdrl' avih) LIST('movi' 00dc…)) with
    * the given dimensions and per-frame chunk sizes. */
  def avi(width: Int, height: Int, frameSizes: Seq[Int]): Array[Byte] = {
    val avih = {
      val bos = new ByteArrayOutputStream()
      bos.write(le32(33367))            // dwMicroSecPerFrame (~30 fps)
      bos.write(le32(0)); bos.write(le32(0)); bos.write(le32(0)) // bps, pad, flags
      bos.write(le32(frameSizes.size))  // dwTotalFrames
      bos.write(le32(0)); bos.write(le32(1)); bos.write(le32(0)) // init, streams, bufsize
      bos.write(le32(width)); bos.write(le32(height))
      bos.write(new Array[Byte](16))    // reserved
      riffChunk("avih", bos.toByteArray)
    }
    val hdrl = riffList("hdrl", avih)
    val movi = riffList("movi",
      frameSizes.flatMap(n => riffChunk("00dc", Array.fill(n)(0x42.toByte)).toSeq).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    riffChunk("RIFF", body)
  }

  // ---- Matroska/WebM (EBML, RFC 8794) ----

  /** Size vint: 1 byte below 127 (127 itself would be the reserved
    * all-ones "unknown" form), else 2 bytes (< 16383). */
  private def vintSize(n: Int): Array[Byte] = {
    require(n < 16383, s"test fixture size too large: $n")
    if (n < 127) Array((0x80 | n).toByte)
    else Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
  }

  private def ebml(idBytes: Array[Byte], payload: Array[Byte]): Array[Byte] =
    idBytes ++ vintSize(payload.length) ++ payload

  private def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray

  /** Minimal Matroska with one video track (TrackNumber 1, TrackType 1,
    * PixelWidth/PixelHeight) and one Cluster of SimpleBlocks whose
    * payload lengths are `blockSizes` (each ≥ 4: track vint + timecode +
    * flags). */
  def mkv(width: Int, height: Int, blockSizes: Seq[Int]): Array[Byte] = {
    val header = ebml(id(0x1A, 0x45, 0xDF, 0xA3), Array.empty)
    val video = ebml(id(0xE0),
      ebml(id(0xB0), Array((width >> 8).toByte, (width & 0xff).toByte)) ++
      ebml(id(0xBA), Array((height >> 8).toByte, (height & 0xff).toByte)))
    val entry = ebml(id(0xAE),
      ebml(id(0xD7), Array(1.toByte)) ++     // TrackNumber 1
      ebml(id(0x83), Array(1.toByte)) ++     // TrackType video
      video)
    val tracks = ebml(id(0x16, 0x54, 0xAE, 0x6B), entry)
    val blocks = blockSizes.flatMap { n =>
      require(n >= 4, "SimpleBlock needs track+timecode+flags")
      // track 1 vint, int16 timecode, flags, then frame filler bytes
      val payload = Array(0x81.toByte, 0.toByte, 0.toByte, 0.toByte) ++
        Array.fill(n - 4)(0x55.toByte)
      ebml(id(0xA3), payload).toSeq
    }.toArray
    val cluster = ebml(id(0x1F, 0x43, 0xB6, 0x75),
      ebml(id(0xE7), Array(0.toByte)) ++ blocks) // Timecode 0 + blocks
    val segment = ebml(id(0x18, 0x53, 0x80, 0x67), tracks ++ cluster)
    header ++ segment
  }
}
