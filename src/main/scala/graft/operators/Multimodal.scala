package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` with typed
  * metadata (BASELINE.json north star). The Spark-side plumbing — schema,
  * batched per-partition processing, feature shapes, partitioning — is
  * real; the actual codec call is stubbed behind [[MediaDecoder]] because
  * no image/audio libraries ship in this container. Swapping in a real
  * decoder (JavaCV, TwelveMonkeys, ffmpeg pipe) changes ONE method.
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

  /** Deterministic stand-in: derives pseudo-metadata and features from a
    * rolling hash of the payload. NOT a real codec — the plumbing target
    * for environments without media libraries. */
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
  def probeAll(media: DataFrame, decoder: MediaDecoder = FakeDecoder): DataFrame = {
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
                      decoder: MediaDecoder = FakeDecoder): DataFrame = {
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
                      decoder: MediaDecoder = FakeDecoder): DataFrame =
    probeAll(media, decoder)
      .filter(col("modality") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("n_frames") - 1, lit(everyN)).as("frame_indices"))
}
