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
  * headers), the AUDIO half via `javax.sound.sampled` (WAV/AIFF/AU
  * container headers: encoding, channels, sample bits, frame count),
  * and the VIDEO half via pure-JVM container walks — ISO BMFF
  * (MP4/QuickTime, [[videoHeader]]), RIFF ([[aviHeader]]) and
  * EBML/Matroska ([[mkvHeader]]): duration, track count, codec id,
  * pixel dimensions, sample count — container metadata needs no codec.
  * All zero-dependency parsers chained in [[jdkDecoder]]; only payloads
  * NO parser recognizes fall through to the deterministic stub, with
  * the Spark-side contract (schema, batching, partitioning,
  * deterministic output) real and tested either way.
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
    * Unrecognized payloads return None so decoders can chain. */
  private def imageHeader(bytes: Array[Byte]): Option[MediaMeta] =
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

  /** Image-only decoder: real headers for anything `javax.imageio`
    * recognizes, the deterministic stub for the rest. */
  val imageIoDecoder: Decoder = { bytes =>
    imageHeader(bytes).getOrElse(stubDecoder(bytes))
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

  /** REAL video container header decode: a pure-JVM ISO BMFF
    * (MP4 / QuickTime) box walk — no codec library, just the
    * container's length-prefixed box tree. Recognizes a leading `ftyp`
    * box, then reads `moov/mvhd` (timescale + duration), counts `trak`
    * boxes, and descends the first sample-table-bearing track
    * (`trak/mdia/minf/stbl`) for the `stsd` sample-entry fourcc (the
    * codec id), the `stsz` sample count (frame count) and the track's
    * `tkhd` 16.16-fixed pixel dimensions.
    *
    * MediaMeta mapping: format = "mp4:" + codec fourcc ("mp4" when no
    * sample description exists), width/height = tkhd integer pixels,
    * nFrames = stsz sample count (trak COUNT when the container carries
    * no sample table — header-only fixtures), durationMs = mvhd
    * duration · 1000 / timescale. Only box headers and fixed-offset
    * header fields are touched — a few hundred bytes of parsing
    * regardless of media size, like the image/audio halves. Non-ISO
    * containers (AVI, MKV, corrupt bytes) return None so decoders can
    * chain to the stub. */
  private[ops] def videoHeader(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 16) return None
    def u32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def fourcc(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // (type, payloadStart, payloadEnd) of each child box in [from, to);
    // malformed sizes stop the walk rather than throw, and the box-count
    // guard bounds the scan on adversarial bytes.
    def boxes(from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var o = from
      var guard = 0
      while (o + 8 <= to && guard < 4096) {
        val size = u32(o)
        val (payload, end) =
          if (size == 1L && o + 16 <= to) {
            val largesize = (u32(o + 8) << 32) | u32(o + 12)
            (o + 16, o + math.min(largesize, (to - o).toLong).toInt)
          } else if (size == 0L) (o + 8, to) // last box: extends to end
          else (o + 8, o + math.min(size, (to - o).toLong).toInt)
        if (end <= o || payload > to) return out.result()
        out += ((fourcc(o + 4), payload, math.min(end, to)))
        o = end
        guard += 1
      }
      out.result()
    }
    def find(bs: Seq[(String, Int, Int)], t: String) = bs.find(_._1 == t)
    val top = boxes(0, bytes.length)
    if (!top.headOption.exists(_._1 == "ftyp")) return None
    find(top, "moov").map { case (_, ms, me) =>
      val moov = boxes(ms, me)
      // payload-length guard FIRST: a truncated box can end exactly at
      // the buffer edge (p == bytes.length), so the version byte is only
      // readable once the v0 minimum length is established — the walk's
      // "malformed sizes stop, never throw" contract
      val durMs = find(moov, "mvhd").flatMap { case (_, p, e) =>
        if (e - p < 20) None
        else {
          val v = bytes(p) & 0xff
          if (v == 0) { // u32 creation/modification/duration
            val (timescale, duration) = (u32(p + 12), u32(p + 16))
            if (timescale > 0) Some(duration * 1000L / timescale) else None
          } else if (v == 1 && e - p >= 32) { // u64 times, u32 timescale
            val timescale = u32(p + 20)
            val duration = (u32(p + 24) << 32) | u32(p + 28)
            if (timescale > 0) Some(duration * 1000L / timescale) else None
          } else None
        }
      }.getOrElse(0L)
      val traks = moov.filter(_._1 == "trak")
      val codecTrack = traks.iterator.flatMap { case (_, ts, te) =>
        val trak = boxes(ts, te)
        val stbl = for {
          (_, ds, de) <- find(trak, "mdia")
          (_, ns, ne) <- find(boxes(ds, de), "minf")
          (_, ss, se) <- find(boxes(ns, ne), "stbl")
        } yield boxes(ss, se)
        stbl.flatMap { sb =>
          // stsd payload: version/flags(4) entry_count(4), then the first
          // sample entry's own size(4) + format fourcc(4)
          find(sb, "stsd").collect { case (_, p, e) if e - p >= 16 =>
            val cc = fourcc(p + 12).trim
            val nFrames = find(sb, "stsz").collect {
              // stsz payload: version/flags(4) sample_size(4) count(4)
              case (_, zp, ze) if ze - zp >= 12 => u32(zp + 8).toInt
            }.getOrElse(0)
            // tkhd: width/height are 16.16 fixed after 76 (v0) / 88 (v1)
            // payload bytes; the u16 at the field start is the int part
            // length guard BEFORE the version-byte read (same truncated-
            // payload hazard as mvhd above)
            val (w, h) = find(trak, "tkhd").collect {
              case (_, tp, te) if te - tp >= 84 && (bytes(tp) & 0xff) == 0 =>
                (u16(tp + 76), u16(tp + 80))
              case (_, tp, te) if te - tp >= 96 && (bytes(tp) & 0xff) == 1 =>
                (u16(tp + 88), u16(tp + 92))
            }.getOrElse((0, 0))
            (cc, w, h, nFrames)
          }
        }
      }.toSeq.headOption
      val (cc, w, h, nf) = codecTrack.getOrElse(("", 0, 0, 0))
      MediaMeta(
        format = if (cc.nonEmpty) "mp4:" + cc else "mp4",
        width = w, height = h,
        nFrames = if (nf > 0) nf else traks.size,
        durationMs = durMs)
    }
  }

  /** REAL AVI container header decode: a pure-JVM RIFF chunk walk — the
    * same zero-dependency shape as [[videoHeader]], little-endian. The
    * `LIST hdrl` header list carries `avih` (the main AVI header:
    * microseconds per frame, total frames, pixel dimensions) and one
    * `LIST strl` per stream whose `strh` names the stream type and
    * codec handler fourcc.
    *
    * MediaMeta mapping: format = "avi:" + the first `vids` stream's
    * handler fourcc ("avi" when none), width/height = avih pixels,
    * nFrames = avih total frames, durationMs = frames · µs-per-frame
    * / 1000. Only chunk headers and fixed-offset fields are touched.
    * Non-RIFF/AVI payloads return None so decoders can chain. */
  private[ops] def aviHeader(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 24) return None
    def u32le(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    // (chunkId, payloadStart, payloadEnd); chunks are word-aligned (an
    // odd payload is followed by one pad byte). Malformed sizes clamp
    // to the parent; the chunk-count guard bounds adversarial bytes.
    def chunks(from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var o = from
      var guard = 0
      while (o + 8 <= to && guard < 4096) {
        val size = u32le(o + 4)
        val end = o + 8 + math.min(size, (to - o - 8).toLong).toInt
        out += ((fourcc(o), o + 8, end))
        o = end + (end & 1)
        guard += 1
      }
      out.result()
    }
    // LIST payloads begin with the 4-byte list type, then child chunks.
    def lists(cs: Seq[(String, Int, Int)], typ: String) =
      cs.filter { case (id, p, e) =>
        id == "LIST" && e - p >= 4 && fourcc(p) == typ }
    val top = chunks(12, bytes.length)
    lists(top, "hdrl").headOption.flatMap { case (_, hs, he) =>
      val hdrl = chunks(hs + 4, he)
      hdrl.collectFirst { case ("avih", p, e) if e - p >= 40 =>
        // avih payload: µs/frame(0), total frames(16), width(32),
        // height(36) — all u32 little-endian
        val usPerFrame = u32le(p)
        val totalFrames = u32le(p + 16)
        val codec = lists(hdrl, "strl").iterator.flatMap {
          case (_, ss, se) =>
            // strh payload: stream type fourcc(0), handler fourcc(4)
            chunks(ss + 4, se).collectFirst {
              case ("strh", sp, spe)
                  if spe - sp >= 8 && fourcc(sp) == "vids" =>
                fourcc(sp + 4).trim
            }
        }.find(_.nonEmpty)
        MediaMeta(
          format = codec.map("avi:" + _).getOrElse("avi"),
          width = u32le(p + 32).toInt, height = u32le(p + 36).toInt,
          nFrames = totalFrames.toInt,
          durationMs = totalFrames * usPerFrame / 1000L)
      }
    }
  }

  /** REAL Matroska/WebM container header decode: a pure-JVM EBML walk.
    * EBML elements are (varint id, varint size, payload); ids keep
    * their length-marker bit (matching the spec'd constants below),
    * sizes strip it, and an all-ones size means "extends to the end"
    * (how live-muxed Segments are written). The walk reads
    * Segment→Info for TimestampScale + Duration and Segment→Tracks for
    * the first video TrackEntry's CodecID and pixel dimensions.
    *
    * MediaMeta mapping: format = "mkv:" + CodecID ("mkv" when no video
    * track), width/height = PixelWidth/PixelHeight, nFrames = track
    * COUNT (Matroska headers carry no sample count — same fallback as
    * the header-only MP4 case), durationMs = Duration ·
    * TimestampScale(ns) / 10^6. Non-EBML payloads return None so
    * decoders can chain. */
  private[ops] def mkvHeader(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 8) return None
    // EBML varint: the first byte's leading-zero count gives the width.
    def varint(o: Int, to: Int, keepMarker: Boolean): Option[(Long, Int)] = {
      if (o >= to) return None
      val b0 = bytes(o) & 0xff
      if (b0 == 0) return None
      val len = java.lang.Integer.numberOfLeadingZeros(b0) - 23
      if (len > 8 || o + len > to) return None
      var v = if (keepMarker) b0.toLong else (b0 & (0xff >>> len)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (bytes(o + i) & 0xffL); i += 1 }
      Some((v, len))
    }
    // (id, payloadStart, payloadEnd) of each sibling in [from, to)
    def elems(from: Int, to: Int): Seq[(Long, Int, Int)] = {
      val out = Seq.newBuilder[(Long, Int, Int)]
      var o = from
      var guard = 0
      var ok = true
      while (ok && o < to && guard < 4096) {
        val parsed = for {
          (id, idLen) <- varint(o, to, keepMarker = true)
          (size, szLen) <- varint(o + idLen, to, keepMarker = false)
        } yield {
          val p = o + idLen + szLen
          val unknown = size == (1L << (7 * szLen)) - 1
          val end =
            if (unknown) to else p + math.min(size, (to - p).toLong).toInt
          out += ((id, p, end))
          end
        }
        parsed match {
          case Some(next) if next > o => o = next; guard += 1
          case _ => ok = false
        }
      }
      out.result()
    }
    def uint(p: Int, e: Int): Long = {
      var v = 0L
      var i = p
      while (i < e && i - p < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
      v
    }
    def dbl(p: Int, e: Int): Double =
      if (e - p == 4) java.lang.Float.intBitsToFloat(uint(p, e).toInt).toDouble
      else if (e - p == 8) java.lang.Double.longBitsToDouble(uint(p, e))
      else 0.0
    def child(cs: Seq[(Long, Int, Int)], id: Long) = cs.find(_._1 == id)
    val top = elems(0, bytes.length)
    if (!top.headOption.exists(_._1 == 0x1A45DFA3L)) return None // EBML
    child(top, 0x18538067L).map { case (_, ss, se) => // Segment
      val seg = elems(ss, se)
      val info = child(seg, 0x1549A966L) // Info
        .map { case (_, p, e) => elems(p, e) }.getOrElse(Seq.empty)
      val tsScaleNs = child(info, 0x2AD7B1L) // TimestampScale
        .map { case (_, p, e) => uint(p, e) }.filter(_ > 0)
        .getOrElse(1000000L)
      val durMs = child(info, 0x4489L) // Duration (float, scale units)
        .map { case (_, p, e) => (dbl(p, e) * tsScaleNs / 1e6).toLong }
        .getOrElse(0L)
      val trackEntries = child(seg, 0x1654AE6BL).toSeq // Tracks
        .flatMap { case (_, p, e) => elems(p, e).filter(_._1 == 0xAEL) }
      val video = trackEntries.iterator.map { case (_, p, e) =>
        val t = elems(p, e)
        val isVideo = child(t, 0x83L) // TrackType: 1 = video
          .exists { case (_, vp, ve) => uint(vp, ve) == 1L }
        val codec = child(t, 0x86L).map { case (_, cp, ce) => // CodecID
          new String(bytes, cp, ce - cp,
            java.nio.charset.StandardCharsets.US_ASCII).trim }
        val dims = child(t, 0xE0L).map { case (_, vp, ve) => // Video
          val v = elems(vp, ve)
          (child(v, 0xB0L).map { case (_, a, b) => uint(a, b).toInt }
            .getOrElse(0), // PixelWidth
            child(v, 0xBAL).map { case (_, a, b) => uint(a, b).toInt }
              .getOrElse(0)) // PixelHeight
        }.getOrElse((0, 0))
        (isVideo, codec, dims)
      }.find(_._1)
      MediaMeta(
        format = video.flatMap(_._2).map("mkv:" + _).getOrElse("mkv"),
        width = video.map(_._3._1).getOrElse(0),
        height = video.map(_._3._2).getOrElse(0),
        nFrames = trackEntries.size,
        durationMs = durMs)
    }
  }

  /** Default production decoder: real IMAGE headers (`javax.imageio`),
    * real AUDIO headers (`javax.sound.sampled`), and real VIDEO
    * container headers (the pure-JVM MP4/QuickTime, RIFF/AVI and
    * EBML/Matroska walks), with the deterministic stub only for
    * payloads no parser recognizes.
    *
    * Dispatch is magic-byte FIRST: a recognized leading signature
    * routes straight to its parser, so the per-row cost at scan scale
    * is one parse — not five attempted parses per payload (ImageIO's
    * reader probe alone allocates a stream + walks the plugin
    * registry; paying it for every WAV/MP4 row dominated the decode
    * profile). A payload whose magic matches but whose parse fails —
    * and anything unrecognized — falls through to the full chain, so
    * dispatch is an optimization, never a semantics change: each walk
    * still guards its own reads, and a parser that throws falls to
    * the next instead of failing the task. */
  val jdkDecoder: Decoder = { bytes =>
    def safe(p: Array[Byte] => Option[MediaMeta]): Option[MediaMeta] =
      try p(bytes) catch { case scala.util.control.NonFatal(_) => None }
    def at(o: Int, s: String): Boolean =
      bytes != null && bytes.length >= o + s.length &&
        s.indices.forall(i => bytes(o + i) == s.charAt(i).toByte)
    val dispatched: Option[MediaMeta] =
      if (bytes == null || bytes.length < 12) None
      else if (at(0, "BM") || at(0, "GIF8") ||
          (bytes(0) == 0x89.toByte && at(1, "PNG")) ||
          (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte))
        safe(imageHeader)
      else if (at(0, "RIFF") && at(8, "WAVE")) safe(audioHeader)
      else if (at(0, "FORM") || at(0, ".snd")) safe(audioHeader)
      else if (at(4, "ftyp")) safe(videoHeader)
      else if (at(0, "RIFF") && at(8, "AVI ")) safe(aviHeader)
      else if (bytes(0) == 0x1a.toByte && bytes(1) == 0x45.toByte &&
          bytes(2) == 0xdf.toByte && bytes(3) == 0xa3.toByte)
        safe(mkvHeader)
      else None
    dispatched.getOrElse {
      safe(imageHeader).orElse(safe(audioHeader))
        .orElse(safe(videoHeader)).orElse(safe(aviHeader))
        .orElse(safe(mkvHeader)).getOrElse(stubDecoder(bytes))
    }
  }

  // ---- synthetic REAL container bytes: the decoder walks in reverse ----
  //
  // [[synthBytes]] assembles genuine BMP / WAV / MP4 / AVI / MKV /
  // PNG / GIF / JPEG / AIFF / AU container headers whose parameters
  // derive from the id by PLAIN integer arithmetic ([[synthParams]] —
  // re-derivable in external SQL), so a pipeline that synthesizes
  // bytes, decodes them with [[jdkDecoder]], and compares against the
  // arithmetic truth cross-checks the byte walks end-to-end (qm01's
  // oracle does exactly that). Every field the decoders read is
  // written; durations are chosen so the decode-side arithmetic is
  // EXACT (whole seconds for WAV/AIFF/AU so frames/rate*1000 has no
  // float rounding; timescale 1000 for MP4; integer µs/frame for AVI;
  // whole-ms doubles for MKV). One kind (id % 11 == 10) is
  // DELIBERATELY MALFORMED bytes no parser recognizes, whose truth row
  // is the [[stubDecoder]] profile — so the corrupt → stub
  // fall-through contract (the scale-critical behavior on a dirty
  // corpus) is oracle-pinned alongside the happy paths.

  /** The arithmetic TRUTH for [[synthBytes]]: what [[jdkDecoder]] must
    * report for id's payload. kind = id % 11 → bmp, wav, mp4, avi,
    * mkv, png, gif, jpeg, aiff ("aif" — the JDK type extension), au,
    * corrupt (→ the stub profile over [[corruptBytes]], re-derived
    * here by the same 31-polynomial `Arrays.hashCode` arithmetic the
    * SQL oracle computes — 4 bytes < 128 keep every intermediate a
    * small positive int, no overflow anywhere). */
  def synthParams(id: Long): MediaMeta = (id % 11) match {
    case 0 => MediaMeta("bmp", (16 + id % 317).toInt,
      (16 + (id / 5) % 211).toInt, 1, 0L)
    case 1 =>
      val secs = 1 + id % 9
      MediaMeta("wav", (1 + id % 2).toInt, 16, (8000 * secs).toInt,
        1000L * secs)
    case 2 => MediaMeta("mp4:avc1", (160 + id % 160).toInt,
      (120 + id % 120).toInt, (24 + id % 240).toInt, 1000 + id % 5000)
    case 3 =>
      val frames = 25 + id % 250
      MediaMeta("avi:mjpg", (320 + id % 320).toInt,
        (240 + id % 240).toInt, frames.toInt, frames * 40)
    case 4 => MediaMeta("mkv:V_VP9", (640 + id % 128).toInt,
      (360 + id % 72).toInt, 1, 2000 + id % 3000)
    case 5 => MediaMeta("png", (16 + id % 509).toInt,
      (16 + (id / 11) % 383).toInt, 1, 0L)
    case 6 => MediaMeta("gif", (8 + id % 251).toInt,
      (8 + (id / 3) % 199).toInt, 1, 0L)
    case 7 => MediaMeta("jpeg", (32 + id % 441).toInt,
      (32 + (id / 7) % 333).toInt, 1, 0L)
    case 8 =>
      val secs = 1 + id % 7
      MediaMeta("aif", (1 + id % 2).toInt, 16, (8000 * secs).toInt,
        1000L * secs)
    case 9 =>
      val secs = 1 + id % 6
      MediaMeta("au", (1 + id % 2).toInt, 16, (8000 * secs).toInt,
        1000L * secs)
    case _ =>
      // java.util.Arrays.hashCode of the 4 corrupt bytes, in closed
      // form: h = 31⁴ + 31³b₀ + 31²b₁ + 31b₂ + b₃ (all bytes
      // positive, h < 2³¹) — then the stub profile over h
      val b = corruptBytes(id)
      val h = 923521 + 29791 * b(0) + 961 * b(1) + 31 * b(2) + b(3)
      MediaMeta(Seq("jpeg", "png", "wav", "mp4")(h % 4),
        64 + h % 1024, 64 + (h / 7) % 1024, 1 + h % 240, 4L)
  }

  /** 4 deliberately malformed bytes for the corrupt kind: plain
    * arithmetic in the id, every byte in [1, 114) so no magic-byte
    * signature can match and the `Arrays.hashCode` polynomial stays a
    * small positive int ([[synthParams]] / the SQL oracle re-derive
    * it). Too short for every container walk, unrecognizable to
    * ImageIO and the sampled-audio readers — the whole decoder chain
    * returns None and [[jdkDecoder]] falls through to the stub. */
  private[ops] def corruptBytes(id: Long): Array[Byte] = Array(
    (1 + id % 113).toByte, (1 + (id / 7) % 109).toByte,
    (1 + (id / 11) % 107).toByte, (1 + (id / 13) % 103).toByte)

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, 24-bit,
    * uncompressed, header-only (ImageIO reads dimensions from the
    * header without touching pixel data — but its BI_RGB validation
    * cross-checks the DECLARED image/file sizes against the
    * dimensions, so those fields must be consistent even though no
    * pixel bytes follow). */
  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val rowSize = (w * 24L + 31) / 32 * 4
    val imageSize = rowSize * h
    ascii("BM") ++ le32(54 + imageSize) ++ le16(0) ++ le16(0) ++
      le32(54) ++
      le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++
      le16(24) ++ le32(0) ++ le32(imageSize) ++ le32(2835) ++
      le32(2835) ++ le32(0) ++ le32(0)
  }

  /** WAV: RIFF/WAVE with a PCM fmt chunk and a declared (empty) data
    * chunk — `javax.sound.sampled` derives the frame count from the
    * declared data size / block align without reading samples. */
  private def wavBytes(channels: Int, frames: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = frames.toLong * blockAlign
    ascii("RIFF") ++ le32(36 + dataSize) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(8000) ++ le32(8000L * blockAlign) ++ le16(blockAlign) ++
      le16(16) ++ ascii("data") ++ le32(dataSize)
  }

  /** ISO BMFF: ftyp + moov(mvhd v0, trak(tkhd v0 with 16.16 pixel
    * dims, mdia/minf/stbl(stsd 'avc1', stsz frame count))) — exactly
    * the boxes and fixed offsets [[videoHeader]] walks. */
  private def mp4Bytes(w: Int, h: Int, frames: Int,
      durMs: Long): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ ascii(typ) ++ payload
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(durMs)) // timescale 1000 → duration IS ms
    val tkhd = box("tkhd", Array.fill[Byte](76)(0) ++
      be16(w) ++ be16(0) ++ be16(h) ++ be16(0))
    val stsd = box("stsd", be32(0) ++ be32(1) ++ be32(8) ++ ascii("avc1"))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(frames.toLong))
    val stbl = box("stbl", stsd ++ stsz)
    val trak = box("trak", tkhd ++
      box("mdia", box("minf", stbl)))
    box("ftyp", ascii("isom") ++ be32(0) ++ ascii("isom")) ++
      box("moov", mvhd ++ trak)
  }

  /** RIFF/AVI: LIST hdrl carrying the avih main header (µs/frame,
    * total frames, pixel dims) and one LIST strl whose strh names a
    * 'vids' stream with handler 'mjpg' — the chunks [[aviHeader]]
    * walks, 40 000 µs/frame so durationMs = frames · 40 exactly. */
  private def aviBytes(w: Int, h: Int, frames: Int): Array[Byte] = {
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      ascii(id) ++ le32(payload.length.toLong) ++ payload
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      ascii("LIST") ++ le32(payload.length + 4L) ++ ascii(typ) ++ payload
    val avih = chunk("avih", le32(40000) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(frames.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++ Array.fill[Byte](16)(0))
    val strh = chunk("strh", ascii("vids") ++ ascii("mjpg") ++
      Array.fill[Byte](48)(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh))
    ascii("RIFF") ++ le32(hdrl.length + 4L) ++ ascii("AVI ") ++ hdrl
  }

  /** EBML/Matroska: EBML header + Segment(Info(TimestampScale 10⁶ ns,
    * Duration as a whole-ms float64) + Tracks(one video TrackEntry:
    * TrackType 1, CodecID, Video(PixelWidth/PixelHeight))) — the
    * elements [[mkvHeader]] walks; every payload < 127 bytes so
    * one-byte size varints suffice. */
  private def mkvBytes(w: Int, h: Int, durMs: Long): Array[Byte] = {
    def idBytes(id: Long): Array[Byte] = {
      val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      (n - 1 to 0 by -1).map(i => ((id >> (8 * i)) & 0xff).toByte).toArray
    }
    def elem(id: Long, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 127, "one-byte size varint overflow")
      idBytes(id) ++ Array((0x80 | payload.length).toByte) ++ payload
    }
    def uintBytes(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      (n - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    }
    val dur = java.lang.Double.doubleToLongBits(durMs.toDouble)
    val durBytes = (7 to 0 by -1)
      .map(i => ((dur >> (8 * i)) & 0xff).toByte).toArray
    val info = elem(0x1549A966L,
      elem(0x2AD7B1L, uintBytes(1000000L)) ++ elem(0x4489L, durBytes))
    val video = elem(0xE0L,
      elem(0xB0L, uintBytes(w.toLong)) ++ elem(0xBAL, uintBytes(h.toLong)))
    val trackEntry = elem(0xAEL,
      elem(0x83L, uintBytes(1L)) ++ elem(0x86L, ascii("V_VP9")) ++ video)
    elem(0x1A45DFA3L, Array.emptyByteArray) ++
      elem(0x18538067L, info ++ elem(0x1654AE6BL, trackEntry))
  }

  /** PNG: 8-byte signature + IHDR (width/height u32 BE, bit depth 8,
    * truecolor, standard compression/filter/interlace, REAL CRC32) +
    * empty IEND — ImageIO's PNG reader parses dimensions from IHDR
    * without needing pixel data. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32
      crc.update(ascii(typ)); crc.update(payload)
      be32(payload.length.toLong) ++ ascii(typ) ++ payload ++
        be32(crc.getValue)
    }
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++
      chunk("IHDR", be32(w.toLong) ++ be32(h.toLong) ++
        Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** GIF89a: header + logical screen descriptor (u16 LE dims, no
    * global color table) + one image descriptor with the SAME
    * dimensions (ImageIO reports image 0's descriptor size) + a
    * minimal LZW body + trailer. */
  private def gifBytes(w: Int, h: Int): Array[Byte] =
    ascii("GIF89a") ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0) ++
      Array(0x2c.toByte) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h) ++
      Array[Byte](0) ++
      Array[Byte](2, 1, 0, 0) ++ // LZW min code 2, 1-byte block, term
      Array(0x3b.toByte)

  /** JPEG: SOI + JFIF APP0 + DQT + baseline SOF0 (precision 8, height
    * THEN width u16 BE — the classic swapped-order trap, 3 components)
    * + SOS + EOI. The JDK reader's header parse runs to SOS, so the
    * stream carries the full marker skeleton; no entropy data is
    * needed for dimensions. */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    def m(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte) ++
        be16(payload.length + 2) ++ payload
    Array(0xff.toByte, 0xd8.toByte) ++
      m(0xe0, ascii("JFIF") ++ Array[Byte](0, 1, 1, 0) ++
        be16(1) ++ be16(1) ++ Array[Byte](0, 0)) ++
      m(0xdb, Array[Byte](0) ++ Array.fill[Byte](64)(1)) ++
      m(0xc0, Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](3,
        1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0)) ++
      m(0xda, Array[Byte](3, 1, 0, 2, 0x11, 3, 0x11, 0, 63, 0)) ++
      Array(0xff.toByte, 0xd9.toByte)
  }

  /** AIFF: FORM/AIFF with a COMM chunk (channels, sample frames,
    * 16-bit samples, sample rate 8000 as an 80-bit extended float) and
    * a declared SSND chunk whose size matches COMM's frame count —
    * `javax.sound.sampled` reads the header only. */
  private def aiffBytes(channels: Int, frames: Int): Array[Byte] = {
    val comm = ascii("COMM") ++ be32(18) ++ be16(channels) ++
      be32(frames.toLong) ++ be16(16) ++
      // 8000.0 as 80-bit extended: exp 16395, mantissa 0xFA00...
      Array(0x40, 0x0b, 0xfa, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)
    val dataSize = frames.toLong * channels * 2
    val ssnd = ascii("SSND") ++ be32(8 + dataSize) ++ be32(0) ++ be32(0)
    ascii("FORM") ++ be32(4 + comm.length + ssnd.length + dataSize) ++
      ascii("AIFF") ++ comm ++ ssnd
  }

  /** AU (.snd): the fixed 24-byte big-endian header — data offset,
    * declared data size (frames × frame size), encoding 3 (16-bit
    * linear PCM), sample rate 8000, channels. The reader derives the
    * frame count from the declared size; no sample bytes needed. */
  private def auBytes(channels: Int, frames: Int): Array[Byte] =
    ascii(".snd") ++ be32(24) ++ be32(frames.toLong * channels * 2) ++
      be32(3) ++ be32(8000) ++ be32(channels.toLong)

  /** Genuine container bytes for id — the payload [[jdkDecoder]] must
    * decode back to [[synthParams]](id) exactly. */
  def synthBytes(id: Long): Array[Byte] = {
    val p = synthParams(id)
    (id % 11) match {
      case 0 => bmpBytes(p.width, p.height)
      case 1 => wavBytes(p.width, p.nFrames)
      case 2 => mp4Bytes(p.width, p.height, p.nFrames, p.durationMs)
      case 3 => aviBytes(p.width, p.height, p.nFrames)
      case 4 => mkvBytes(p.width, p.height, p.durationMs)
      case 5 => pngBytes(p.width, p.height)
      case 6 => gifBytes(p.width, p.height)
      case 7 => jpegBytes(p.width, p.height)
      case 8 => aiffBytes(p.width, p.nFrames)
      case 9 => auBytes(p.width, p.nFrames)
      case _ => corruptBytes(id)
    }
  }

  /** Synthesize a media table from an id column: (media_id, content)
    * with genuine container bytes per row — per-partition iterator
    * batches (no driver collect, partitioning preserved), the
    * distributed form of [[synthBytes]]. */
  def synthMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions(_.map(id => (id, synthBytes(id))))
      .toDF("media_id", "content")
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

  // ---- pixel-level image content: the perceptual-hash pipeline ----
  //
  // The container kinds above stop at header metadata; image NEAR-DUP
  // (the multimodal analog of MinHash — a first-class need in any
  // image-text corpus) needs pixel content. BMP is the one format here
  // that stores pixels RAW (no compression), so a synthesized pixel
  // BMP can be decoded by the REAL ImageIO path and cross-checked
  // against pure integer arithmetic in an external SQL oracle — the
  // qm01 discipline extended from headers to pixel data.

  /** Grayscale value of pixel `p` (row-major over the 8×8 grid) of
    * image `id` — plain integer arithmetic, re-derivable in SQL.
    * Engineered so near-dups EXIST: each group of 4 consecutive ids
    * shares a base pattern (`id / 4` drives every pixel), and the
    * id's residue k = id % 4 inverts exactly 2k pixels (7p mod 64 is a
    * bijection, so the `< 2k` window selects exactly 2k positions) —
    * within a group, aHashes differ by a few bits; across groups they
    * are effectively random. */
  private[ops] def grayAt(id: Long, p: Int): Int = {
    val base = id / 4
    val k = id % 4
    val raw = ((11L + base * 31L + 13L * p * p + base * p) % 256L).toInt
    if (k > 0 && (7L * p + base + k) % 64L < 2 * k) 255 - raw else raw
  }

  /** A genuine 8×8 24-bit uncompressed BMP whose pixels are
    * [[grayAt]], written grayscale (r = g = b): rows bottom-up, BGR
    * byte order, 24-byte rows (8 px × 3 B — already 4-byte aligned, no
    * padding), on the same header [[bmpBytes]] builds. ImageIO decodes
    * it through its real BMP plugin, so a wrong row direction, channel
    * order, or offset in EITHER the writer or the reader breaks the
    * pixel oracle. */
  def pixelBmpBytes(id: Long): Array[Byte] = {
    val out = new Array[Byte](54 + 192)
    System.arraycopy(bmpBytes(8, 8), 0, out, 0, 54)
    var o = 54
    var sr = 0
    while (sr < 8) {
      val y = 7 - sr // BMP stores the bottom row first
      var x = 0
      while (x < 8) {
        val v = grayAt(id, y * 8 + x).toByte
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        o += 3; x += 1
      }
      sr += 1
    }
    out
  }

  /** Synthesize (media_id, content) pixel-BMP rows from an id column —
    * per-partition iterator batches, the [[synthMedia]] shape for the
    * pixel pipeline. */
  def synthImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions(_.map(id => (id, pixelBmpBytes(id))))
      .toDF("media_id", "content")
  }

  /** Decode each payload's 8×8 grayscale grid through the REAL ImageIO
    * path: (media_id, grays) with `grays` the 64 row-major values, or
    * NULL when the payload fails to decode or is not 8×8 — the
    * corrupt-row contract of [[decodeMeta]] applied to pixels (a dirty
    * corpus surfaces null fingerprints, never fake ones). Runs
    * per-partition; the gray array feeds the codegen'd
    * [[graft.functions.VectorExpressions.ahash64]] without leaving the
    * stage. */
  def decodeGray8x8(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val grays: Array[Long] =
            try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              if (img == null || img.getWidth != 8 || img.getHeight != 8)
                null
              else {
                val g = new Array[Long](64)
                var y = 0
                while (y < 8) {
                  var x = 0
                  while (x < 8) {
                    g(y * 8 + x) = (img.getRGB(x, y) & 0xff).toLong
                    x += 1
                  }
                  y += 1
                }
                g
              }
            } catch { case scala.util.control.NonFatal(_) => null }
          (id, grays)
        }
      }
      .toDF("media_id", "grays")
  }

  /** Audio frames per synthesized PCM clip and the window split the
    * fingerprint uses: 512 mono 16-bit frames → 64 windows × 8
    * frames. 64 window energies feed the 64-bit fingerprint. */
  val PcmFrames = 512
  val PcmWindows = 64

  /** Deterministic 16-bit PCM sample for (id, frame t) — the audio
    * analog of [[grayAt]]: groups of 4 ids share a base waveform
    * (base = id/4), and the id%4 residue TRIPLES the amplitude of
    * exactly k of the 64 windows (the window test `(5w + base + k)
    * mod 64 < k` touches exactly k windows — gcd(5, 64) = 1 makes
    * w ↦ 5w+c a bijection on 0..63). A tripled window triples its
    * energy, which the circular dHash sees as at most two flipped
    * bits (the comparisons into and out of that window) — so
    * intra-group fingerprint distances stay ≤ 2(k_a + k_b) ≤ 10 by
    * construction while inter-group distances are ~32. All
    * intermediates are small exact integers (|sample| ≤ 4500), so a
    * SQL oracle re-derives every sample. */
  private[ops] def sampleAt(id: Long, t: Int): Int = {
    val base = id / 4
    val k = id % 4
    val raw =
      ((7L + base * 37L + 11L * t * t + base * t) % 3001L).toInt - 1500
    if (k > 0 && (5L * (t / 8) + base + k) % 64L < k) raw * 3 else raw
  }

  /** A genuine mono 16-bit 8 kHz PCM WAV whose 512 sample frames are
    * [[sampleAt]], little-endian signed, on the same RIFF/fmt/data
    * header [[wavBytes]] builds (here with the data chunk actually
    * carrying its declared bytes). `javax.sound.sampled` decodes it
    * through its real WAV reader, so a wrong byte order, sign
    * convention, or header offset in EITHER the writer or the reader
    * breaks the sample oracle. */
  def pcmWavBytes(id: Long): Array[Byte] = {
    val header = wavBytes(1, PcmFrames)
    val out = new Array[Byte](header.length + PcmFrames * 2)
    System.arraycopy(header, 0, out, 0, header.length)
    var t = 0
    var o = header.length
    while (t < PcmFrames) {
      val v = sampleAt(id, t)
      out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
      o += 2
      t += 1
    }
    out
  }

  /** Synthesize (media_id, content) PCM-WAV rows from an id column —
    * per-partition iterator batches, the [[synthImages]] shape for
    * the audio pipeline. */
  def synthAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions(_.map(id => (id, pcmWavBytes(id))))
      .toDF("media_id", "content")
  }

  /** Decode each payload's PCM samples through the REAL
    * `javax.sound.sampled` path: (media_id, samples) with `samples`
    * the signed 16-bit frame values in order, or NULL when the
    * payload fails to decode, is not mono/16-bit/little-endian
    * signed PCM, or declares an absurd frame count — the corrupt-row
    * contract of [[decodeMeta]] applied to samples (a dirty corpus
    * surfaces null fingerprints, never fake ones). Runs
    * per-partition; the sample array feeds the window-energy fold
    * and [[graft.functions.VectorExpressions.dhash64]] without
    * leaving the stage. */
  def decodePcm16(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val samples: Array[Long] =
            try {
              val ais = javax.sound.sampled.AudioSystem
                .getAudioInputStream(
                  new java.io.ByteArrayInputStream(bytes))
              val f = ais.getFormat
              val ok = f.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
                !f.isBigEndian
              val n = ais.getFrameLength
              if (!ok || n <= 0 || n > (1 << 20)) null
              else {
                val buf = ais.readNBytes(n.toInt * 2)
                if (buf.length != n.toInt * 2) null
                else {
                  val out = new Array[Long](n.toInt)
                  var i = 0
                  while (i < out.length) {
                    out(i) = (((buf(2 * i + 1) << 8) |
                      (buf(2 * i) & 0xff)).toShort).toLong
                    i += 1
                  }
                  out
                }
              }
            } catch { case scala.util.control.NonFatal(_) => null }
          (id, samples)
        }
      }
      .toDF("media_id", "samples")
  }

  // ---- frame-level video content: the temporal-fingerprint pipeline ----
  //
  // The AVI walk above stops at header metadata; video NEAR-DUP needs
  // frame content. Uncompressed-RGB AVI is the video analog of the
  // pixel BMP: the RIFF `movi` list stores raw DIB frames (no codec),
  // so a synthesized payload decodes through a pure-JVM chunk walk
  // and every pixel cross-checks against integer arithmetic in an
  // external SQL oracle — the qm04 discipline extended along the time
  // axis.

  /** Frames per synthesized video clip: 8 × (8×8) DIB frames → 8
    * per-frame aHashes → one 64-bit temporal fingerprint (byte f
    * samples frame f's hash). */
  val VidFrames = 8

  /** Grayscale value of pixel `p` (row-major) of FRAME `f` of video
    * `id` — [[grayAt]]'s discipline with a time axis: each group of 4
    * consecutive ids shares a base clip (`id / 4` drives every pixel
    * of every frame), and the residue k = id % 4 inverts exactly 2k
    * pixels PER FRAME (the `(7p + base + k + f) mod 64 < 2k` window —
    * 7p mod 64 is a bijection, so each frame flips exactly 2k
    * positions, shifted by f so the damage moves between frames).
    * Within a group per-frame aHashes differ by a few bits; across
    * groups frames are effectively random. */
  private[ops] def vidGrayAt(id: Long, f: Int, p: Int): Int = {
    val base = id / 4
    val k = id % 4
    val raw = ((17L + base * 29L + 7L * f * f + 13L * p * p +
      base * p + f * p) % 256L).toInt
    if (k > 0 && (7L * p + base + k + f) % 64L < 2 * k) 255 - raw
    else raw
  }

  /** A genuine uncompressed-RGB RIFF/AVI whose `movi` frames are
    * [[vidGrayAt]] pixels: `LIST hdrl` carries avih (40 000 µs/frame,
    * [[VidFrames]] total, 8×8 px) and one `LIST strl` whose strh
    * names a 'vids' stream with the raw-DIB handler and whose strf is
    * a real BITMAPINFOHEADER (24 bpp, BI_RGB); `LIST movi` then holds
    * [[VidFrames]] `00db` chunks, each a 192-byte bottom-up BGR pixel
    * block (the [[pixelBmpBytes]] layout per frame). The existing
    * [[aviHeader]] walk reads the same header chunks, and the frame
    * decode below re-walks the container — a wrong row direction,
    * chunk size, or offset in EITHER writer or reader breaks the
    * pixel oracle. */
  def vidPixelAviBytes(id: Long): Array[Byte] = {
    def chunk(cid: String, payload: Array[Byte]): Array[Byte] =
      ascii(cid) ++ le32(payload.length.toLong) ++ payload
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      ascii("LIST") ++ le32(payload.length + 4L) ++ ascii(typ) ++ payload
    val avih = chunk("avih", le32(40000) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(VidFrames.toLong) ++ le32(0) ++ le32(1) ++
      le32(0) ++ le32(8L) ++ le32(8L) ++ Array.fill[Byte](16)(0))
    val strh = chunk("strh", ascii("vids") ++ ascii("dib ") ++
      Array.fill[Byte](48)(0))
    // BITMAPINFOHEADER: biSize 40, 8×8, 1 plane, 24 bpp, BI_RGB,
    // biSizeImage 192
    val strf = chunk("strf", le32(40) ++ le32(8) ++ le32(8) ++
      le16(1) ++ le16(24) ++ le32(0) ++ le32(192) ++
      Array.fill[Byte](16)(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val frames = (0 until VidFrames).toArray.map { f =>
      val px = new Array[Byte](192)
      var o = 0
      var sr = 0
      while (sr < 8) {
        val y = 7 - sr // DIB rows bottom-up, like the pixel BMP
        var x = 0
        while (x < 8) {
          val v = vidGrayAt(id, f, y * 8 + x).toByte
          px(o) = v; px(o + 1) = v; px(o + 2) = v
          o += 3; x += 1
        }
        sr += 1
      }
      chunk("00db", px)
    }
    val movi = list("movi", frames.reduce(_ ++ _))
    val body = hdrl ++ movi
    ascii("RIFF") ++ le32(body.length + 4L) ++ ascii("AVI ") ++ body
  }

  /** Synthesize (media_id, content) pixel-AVI rows from an id column —
    * per-partition iterator batches, the [[synthImages]] shape for
    * the video pipeline. */
  def synthVideos(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions(_.map(id => (id, vidPixelAviBytes(id))))
      .toDF("media_id", "content")
  }

  /** Decode each payload's raw-DIB frames through a pure-JVM RIFF
    * walk: (media_id, frames) with `frames` the per-frame 64
    * row-major gray values in presentation order, or NULL when the
    * payload is not a RIFF/AVI, avih declares other than 8×8 ×
    * [[VidFrames]], the `movi` list is missing, or any frame chunk
    * is not exactly 192 bytes — the corrupt-row contract of
    * [[decodeMeta]] applied to frames (a dirty corpus surfaces null
    * fingerprints, never fake ones). Uncompressed DIB means the walk
    * IS the decode — no codec, embarrassingly parallel, 0 shuffle. */
  def decodeDibFrames(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, dibFramesOf(bytes))
      })
      .toDF("media_id", "frames")
  }

  private[ops] def dibFramesOf(bytes: Array[Byte]): Array[Array[Long]] =
    try {
      def u32le(o: Int): Long =
        (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      def fourcc(o: Int): String =
        new String(bytes.slice(o, o + 4), "US-ASCII")
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return null
      val end = math.min(bytes.length.toLong, 8L + u32le(4)).toInt
      def chunks(from: Int, to: Int): Seq[(String, Int, Int)] = {
        val out = Seq.newBuilder[(String, Int, Int)]
        var o = from
        while (o + 8 <= to) {
          val size = u32le(o + 4)
          val p = o + 8
          val e = math.min(to.toLong, p + size).toInt
          out += ((fourcc(o), p, e))
          o = e + (size.toInt & 1) // RIFF chunks pad to even
        }
        out.result()
      }
      val top = chunks(12, end)
      // avih pins the declared geometry; the movi frames must agree
      val hdrl = top.collectFirst {
        case ("LIST", p, e) if fourcc(p) == "hdrl" => chunks(p + 4, e)
      }.getOrElse(return null)
      val geomOk = hdrl.exists { case (cid, p, e) =>
        cid == "avih" && e - p >= 40 && u32le(p + 16) == VidFrames &&
          u32le(p + 32) == 8 && u32le(p + 36) == 8
      }
      if (!geomOk) return null
      val movi = top.collectFirst {
        case ("LIST", p, e) if fourcc(p) == "movi" => chunks(p + 4, e)
      }.getOrElse(return null)
      val frames = movi.collect {
        case (cid, p, e) if cid == "00db" => (p, e)
      }
      if (frames.length != VidFrames ||
        frames.exists { case (p, e) => e - p != 192 }) return null
      frames.toArray.map { case (p, _) =>
        val g = new Array[Long](64)
        var sr = 0
        while (sr < 8) {
          val y = 7 - sr // bottom-up rows back to row-major
          var x = 0
          while (x < 8) {
            g(y * 8 + x) = bytes(p + (sr * 8 + x) * 3) & 0xffL
            x += 1
          }
          sr += 1
        }
        g
      }
    } catch { case scala.util.control.NonFatal(_) => null }
}
