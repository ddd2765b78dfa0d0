package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with a typed metadata struct;
  * decode/feature-extraction run per-partition over iterator batches so
  * a 100 TB corpus streams through executors without collecting. The
  * IMAGE half decodes for real via the JDK's `javax.imageio`
  * ([[imageIoDecoder]]: true format/width/height from PNG/JPEG/GIF/BMP
  * headers) and the AUDIO half via `javax.sound.sampled` (WAV/AIFF/AU
  * container headers: encoding, channels, sample bits, frame count) —
  * both zero-dependency JDK parsers chained in [[jdkDecoder]]. VIDEO
  * codec calls remain STUBBED behind [[Decoder]] — no video library
  * ships with the JDK or this container — with the Spark-side contract
  * (schema, batching, partitioning, deterministic output) real and
  * tested either way; a production deployment swaps in that one codec.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  case class MediaMeta(format: String, width: Int, height: Int,
      nFrames: Int, durationMs: Long)

  /** media table schema: id + kind + raw bytes + sidecar metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** A decode function: bytes -> metadata. Swappable seam. */
  type Decoder = Array[Byte] => MediaMeta

  /** Deterministic stub decoder: derives plausible metadata purely from
    * the byte content (so tests are stable). A real build replaces this
    * with an actual codec — the ONLY line that changes. */
  val stubDecoder: Decoder = { bytes =>
    val n = if (bytes == null) 0 else bytes.length
    val h = java.util.Arrays.hashCode(bytes)
    MediaMeta(
      format = Seq("jpeg", "png", "wav", "mp4")(math.abs(h % 4)),
      width = 64 + math.abs(h % 1024),
      height = 64 + math.abs((h / 7) % 1024),
      nFrames = 1 + math.abs(h % 240),
      durationMs = n.toLong)
  }

  /** REAL image header decode via the JDK's own `javax.imageio` — zero
    * extra dependencies: format name, width and height are read from
    * the PNG/JPEG/GIF/BMP header WITHOUT decoding pixels
    * (`ImageReader.getWidth/getHeight` parse only the stream header, so
    * the per-row cost is a few hundred bytes of parsing no matter the
    * image size — the right shape for a 100 TB binary-column scan).
    * Payloads no JDK reader recognizes (audio/video, corrupt bytes)
    * fall back to [[stubDecoder]]: those codecs are not in this
    * container, and the fallback keeps the column total — the
    * audio/video half of the surface remains a disclosed stub. */
  val imageIoDecoder: Decoder = { bytes =>
    val viaJdk: Option[MediaMeta] =
      if (bytes == null || bytes.length == 0) None
      else {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              Some(MediaMeta(r.getFormatName.toLowerCase,
                r.getWidth(0), r.getHeight(0), nFrames = 1,
                durationMs = 0L))
            } catch { case _: java.io.IOException => None }
            finally r.dispose()
          }
        } finally iis.close()
      }
    viaJdk.getOrElse(stubDecoder(bytes))
  }

  /** REAL audio header decode via the JDK's own `javax.sound.sampled` —
    * zero extra dependencies: WAV/AIFF/AU container headers yield the
    * encoding name, channel count, sample size and frame count without
    * reading sample data (`AudioSystem.getAudioFileFormat` parses only
    * the header). MediaMeta mapping: width = channels, height = sample
    * bits, nFrames = frame count, durationMs from frames / frameRate.
    * Unrecognized payloads return None so decoders can chain. */
  private def audioHeader(bytes: Array[Byte]): Option[MediaMeta] =
    if (bytes == null || bytes.length == 0) None
    else try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      val frames = math.max(aff.getFrameLength, 0)
      val durMs =
        if (fmt.getFrameRate > 0 && frames > 0)
          (frames.toDouble / fmt.getFrameRate * 1000.0).toLong
        else 0L
      Some(MediaMeta(aff.getType.getExtension.toLowerCase,
        width = fmt.getChannels, height = fmt.getSampleSizeInBits,
        nFrames = frames, durationMs = durMs))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Default production decoder: real IMAGE headers (`javax.imageio`),
    * then real AUDIO headers (`javax.sound.sampled`), then the
    * deterministic stub for everything else (video codecs are not in
    * the JDK — the remaining disclosed stub). */
  val jdkDecoder: Decoder = { bytes =>
    val viaImage: Option[MediaMeta] =
      if (bytes == null || bytes.length == 0) None
      else {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              Some(MediaMeta(r.getFormatName.toLowerCase,
                r.getWidth(0), r.getHeight(0), nFrames = 1,
                durationMs = 0L))
            } catch { case _: java.io.IOException => None }
            finally r.dispose()
          }
        } finally iis.close()
      }
    viaImage.orElse(audioHeader(bytes)).getOrElse(stubDecoder(bytes))
  }

  /** Attach deterministic fake binary payloads derived from an id column
    * — the test-data generator for the plumbing. */
  def withFakeMedia(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("media_type",
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")))
      .withColumn("content",
        to_binary(sha2(concat(lit("media"), col(idCol).cast("string")), 256),
          lit("hex")))

  /** Decode metadata per partition: iterator-at-a-time (no per-row task
    * overhead, no driver collect), preserving partitioning. The default
    * decoder reads REAL image headers (and stubs everything else), so
    * existing stub-payload pipelines are unchanged while genuine
    * PNG/JPEG bytes report their true dimensions. */
  def decodeMeta(df: DataFrame, idCol: String,
      decoder: Decoder = jdkDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val m = decoder(bytes)
          (id, m.format, m.width, m.height, m.nFrames, m.durationMs)
        }
      }
      .toDF("media_id", "format", "width", "height", "n_frames",
        "duration_ms")
  }

  /** Fake feature extractor: a deterministic `dim`-float embedding from
    * the payload bytes (xxhash-seeded), as a pure Column expression —
    * the shape a real encoder UDF would produce. */
  def fakeEmbedding(content: org.apache.spark.sql.Column,
      dim: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(content, i), lit(2000L)).cast("double") / 1000.0) - 1.0)

  /** Resize plan: target dimensions preserving aspect ratio against a
    * bounding box — the metadata half of a resize; the pixel transform
    * itself is a codec call behind the [[Decoder]] seam (stubbed here,
    * like decode). Pure column math, no UDF. */
  def resizePlan(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"), lit(1.0))
    decoded
      .withColumn("target_width",
        greatest(floor(col("width") * scale), lit(1)).cast("int"))
      .withColumn("target_height",
        greatest(floor(col("height") * scale), lit(1)).cast("int"))
  }

  /** Frame sampling plan: one row per sampled frame index — a generator
    * (explode) over the decoded frame count; downstream decode of the
    * selected frames stays distributed. */
  def frameSample(decoded: DataFrame, everyN: Int): DataFrame =
    decoded
      .filter(col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(everyN))).as("frame_idx"))
}
