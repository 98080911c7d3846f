package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` with typed
  * metadata (BASELINE.json north star). The Spark-side plumbing — schema,
  * batched per-partition processing, feature shapes, partitioning — is
  * real, and so is the default codec: [[JdkDecoder]] decodes PNG/BMP/GIF/
  * JPEG via `javax.imageio` and WAV/AIFF/AU via `javax.sound.sampled`
  * (both ship in every JDK — no external libraries). Only video container
  * formats, which have no JDK codec, fall back to the clearly-marked
  * [[FakeDecoder]] stand-in; swapping in a real video decoder (JavaCV,
  * ffmpeg pipe) changes ONE method.
  */
object Multimodal {

  /** media table schema: the `d`-section analog for binary payloads. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true)))

  /** Decoder SPI. Implementations MUST be deterministic per byte content
    * for reproducible pipelines. */
  trait MediaDecoder extends Serializable {
    /** → (width, height, n_frames) */
    def probe(bytes: Array[Byte], format: String): (Int, Int, Int)
    /** → fixed-length feature vector */
    def features(bytes: Array[Byte], format: String, dim: Int): Array[Float]
  }

  /** REAL decoder over the JDK's own codecs — no external libraries:
    * `javax.imageio` reads PNG/BMP/GIF/JPEG (GIF with true frame count),
    * `javax.sound.sampled` reads WAV/AIFF/AU. Probe semantics:
    *  - image: (width, height, n_frames) — n_frames > 1 for animated GIF;
    *  - audio: (sample_rate, channels, sample_frames).
    * Features are real content features:
    *  - image: `dim`-bucket luminance histogram of the decoded pixels
    *    (first frame), L1-normalized — deterministic per byte content;
    *  - audio: `dim`-window RMS energy envelope of the PCM samples,
    *    peak-normalized.
    * Video container formats have no JDK codec; those fall back to
    * [[FakeDecoder]] (the one remaining stub, clearly marked). */
  object JdkDecoder extends MediaDecoder {
    import javax.imageio.ImageIO
    import javax.sound.sampled.AudioSystem
    import java.io.ByteArrayInputStream

    private def isAudio(fmt: String): Boolean =
      Set("wav", "wave", "aiff", "au").contains(fmt.toLowerCase)
    private def isVideo(fmt: String): Boolean =
      Set("mp4", "mkv", "avi", "mov", "webm", "mpeg", "mpg").contains(fmt.toLowerCase)

    /** Total function: MP4/MOV video → real ISO-BMFF box parse
      * ([[Mp4Probe]] — container metadata needs no codec); other video
      * containers → FakeDecoder (the documented stub); corrupt or
      * undecodable image/audio → (0, 0, 0), the explicit could-not-decode
      * signal (callers route those to the dead-letter channel, never
      * crash the job). */
    def probe(bytes: Array[Byte], format: String): (Int, Int, Int) = {
      if (bytes.isEmpty) return (0, 0, 0)
      if (Set("mp4", "mov", "m4v").contains(format.toLowerCase))
        return Mp4Probe.probe(bytes).getOrElse((0, 0, 0))
      if (isVideo(format)) return FakeDecoder.probe(bytes, format)
      try {
        if (isAudio(format)) {
          val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          try {
            val f = in.getFormat
            (f.getSampleRate.toInt, f.getChannels, in.getFrameLength.toInt)
          } finally in.close()
        } else {
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          try {
            val readers = ImageIO.getImageReaders(iis)
            if (!readers.hasNext) return (0, 0, 0)
            val r = readers.next()
            r.setInput(iis)
            try (r.getWidth(0), r.getHeight(0),
              math.max(1, r.getNumImages(true)))
            finally r.dispose()
          } finally iis.close()
        }
      } catch { case _: Exception => (0, 0, 0) }
    }

    def features(bytes: Array[Byte], format: String, dim: Int): Array[Float] = {
      if (bytes.isEmpty) return Array.fill(dim)(0f)
      if (isVideo(format)) return FakeDecoder.features(bytes, format, dim)
      try {
        if (isAudio(format)) audioEnvelope(bytes, dim)
        else imageHistogram(bytes, dim)
      } catch { case _: Exception => Array.fill(dim)(0f) }
    }

    /** L1-normalized luminance histogram of the decoded pixels. */
    private def imageHistogram(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) Array.fill(dim)(0f)
      else {
        val hist = new Array[Float](dim)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            hist(lum * dim / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = (img.getWidth * img.getHeight).toFloat
        hist.map(_ / n)
      }
    }

    /** RMS energy per window over the signed PCM samples. */
    private def audioEnvelope(bytes: Array[Byte], dim: Int): Array[Float] = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val frameBytes = f.getFrameSize
        val data = in.readAllBytes()
        val nFrames = data.length / math.max(1, frameBytes)
        if (nFrames == 0) return Array.fill(dim)(0f)
        val sampleBytes = frameBytes / math.max(1, f.getChannels)
        val env = new Array[Double](dim)
        val cnt = new Array[Int](dim)
        var i = 0
        while (i < nFrames) {
          // first channel, first sampleBytes of the frame (little-endian
          // signed PCM — the WAV norm; 8-bit WAV is unsigned)
          val off = i * frameBytes
          val s: Double = sampleBytes match {
            case 1 => ((data(off) & 0xff) - 128) / 128.0
            case 2 => ((data(off) & 0xff) | (data(off + 1) << 8)) / 32768.0
            case _ => (((data(off) & 0xff) | ((data(off + 1) & 0xff) << 8) |
              (data(off + 2) << 16))) / 8388608.0
          }
          val w = i * dim / nFrames
          env(w) += s * s
          cnt(w) += 1
          i += 1
        }
        val rms = env.indices.map(w =>
          if (cnt(w) == 0) 0.0 else math.sqrt(env(w) / cnt(w))).toArray
        val peak = rms.max
        rms.map(v => if (peak == 0) 0f else (v / peak).toFloat)
      } finally in.close()
    }
  }

  /** Real MP4/MOV (ISO base media file format) container probe — pure
    * byte-structure parsing, no codec: walks the box tree
    * (`moov → trak → mdia → minf → stbl`), reads the video track's
    * `tkhd` 16.16 fixed-point width/height and sums the `stts`
    * sample-count entries for the frame count. Frame PIXELS still need a
    * codec (the features path keeps the documented stand-in); the
    * metadata probe is exact. */
  object Mp4Probe {
    private def i32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def boxType(b: Array[Byte], o: Int): String =
      new String(b, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

    /** → Some((width, height, n_samples)) when a moov/trak parse
      * succeeds. */
    def probe(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      var w = 0; var h = 0; var frames = 0
      def walk(from: Int, to: Int): Unit = {
        var o = from
        while (o + 8 <= to) {
          val size0 = i32(bytes, o)
          val tpe = boxType(bytes, o)
          // size 1 → 64-bit largesize; size 0 → box extends to EOF
          val (size, hdr) =
            if (size0 == 1 && o + 16 <= to) {
              val big = (i32(bytes, o + 8).toLong << 32) |
                (i32(bytes, o + 12).toLong & 0xffffffffL)
              (big, 16)
            } else if (size0 == 0) ((to - o).toLong, 8)
            else (size0.toLong, 8)
          if (size < hdr || o + size > to) return // malformed — stop
          val end = o + size.toInt
          if (Containers.contains(tpe)) walk(o + hdr, end)
          else if (tpe == "tkhd" && w == 0) {
            val p = o + hdr
            val version = bytes(p) & 0xff
            // v0: ctime..duration are 32-bit (20 bytes); v1: 8+8+4+4+8 (32)
            val fixed = p + 4 + (if (version == 1) 32 else 20) +
              8 + 2 + 2 + 2 + 2 + 36 // reserved, layer, altgroup, volume, reserved, matrix
            if (fixed + 8 <= end) {
              val tw = i32(bytes, fixed) >>> 16     // 16.16 fixed point
              val th = i32(bytes, fixed + 4) >>> 16
              if (tw > 0 && th > 0) { w = tw; h = th }
            }
          } else if (tpe == "stts" && frames == 0) {
            val p = o + hdr
            if (p + 8 <= end) {
              val entries = i32(bytes, p + 4)
              var e = 0; var total = 0; var q = p + 8
              while (e < entries && q + 8 <= end) {
                total += i32(bytes, q) // sample_count
                e += 1; q += 8
              }
              frames = total
            }
          }
          o = end
        }
      }
      walk(0, bytes.length)
      if (w > 0 || frames > 0) Some((w, h, frames)) else None
    }
  }

  /** Deterministic stand-in: derives pseudo-metadata and features from a
    * rolling hash of the payload. NOT a real codec — retained ONLY as the
    * fallback for container formats the JDK cannot decode (video
    * features, and non-BMFF containers). */
  object FakeDecoder extends MediaDecoder {
    private def mix(h: Long, b: Byte): Long = (h ^ (b & 0xffL)) * 0x100000001b3L
    private def hash(bytes: Array[Byte]): Long =
      bytes.foldLeft(0xcbf29ce484222325L)(mix)
    def probe(bytes: Array[Byte], format: String): (Int, Int, Int) = {
      val h = hash(bytes)
      (64 + (h & 0x3ff).toInt, 64 + ((h >>> 10) & 0x3ff).toInt,
        1 + ((h >>> 20) & 0xff).toInt)
    }
    def features(bytes: Array[Byte], format: String, dim: Int): Array[Float] = {
      var h = hash(bytes)
      Array.fill(dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      }
    }
  }

  /** Decode/probe pass: per-partition batched iteration (the
    * `mapInPandas` batch-shape analog in Scala — one decoder instance per
    * partition, rows streamed, never materialized wholesale). */
  def probeAll(media: DataFrame, decoder: MediaDecoder = JdkDecoder): DataFrame = {
    val outSchema = media.schema
      .add("width", IntegerType).add("height", IntegerType)
      .add("n_frames", IntegerType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.empty)
        val fmt = Option(r.getAs[String]("format")).getOrElse("")
        val (w, h, f) = decoder.probe(bytes, fmt)
        Row.fromSeq(r.toSeq ++ Seq(w, h, f))
      }
    }(enc)
  }

  /** Feature-extraction pass → embedding column ready for VectorOps. */
  def extractFeatures(media: DataFrame, dim: Int = 64,
                      decoder: MediaDecoder = JdkDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.empty)
        val fmt = Option(r.getAs[String]("format")).getOrElse("")
        Row(r.getAs[Long]("media_id"), decoder.features(bytes, fmt, dim).toSeq)
      }
    }(enc)
  }

  /** Frame-sampling plan stub for video: positions of frames to decode —
    * pure metadata arithmetic, no codec needed. */
  def frameSamplePlan(media: DataFrame, everyN: Int,
                      decoder: MediaDecoder = JdkDecoder): DataFrame =
    probeAll(media, decoder)
      .filter(col("modality") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("n_frames") - 1, lit(everyN)).as("frame_indices"))
}
