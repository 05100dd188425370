package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real image-container header parsing in pure JVM byte inspection — no
  * codec library needed. PNG (IHDR), JPEG (SOF segment scan), and GIF
  * (logical screen descriptor) carry their pixel dimensions in the
  * first bytes of the container; parsing them is the non-stub half of
  * the multimodal metadata stage (graft.llm.Multimodal): real
  * width/height/format from real binary payloads, with the decode of
  * pixel DATA remaining out of scope in this environment.
  */
object MediaHeaders {

  /** Parse (format, width, height) from a container header, or None if
    * the bytes are not a recognized PNG/JPEG/GIF container. Never
    * throws on arbitrary input (bounds-checked; PERMISSIVE like the
    * Avro decode path). */
  def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b == null) return None
    if (isPng(b)) parsePng(b)
    else if (isJpeg(b)) parseJpeg(b)
    else if (isGif(b)) parseGif(b)
    else None
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && (0 until 8).forall(i => b(i) == PngSig(i))

  /** IHDR is REQUIRED to be the first chunk: length(4) type(4)="IHDR"
    * width(4 BE) height(4 BE) at fixed offsets 8..23. */
  private def parsePng(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16); val h = be32(b, 20)
      // the spec bounds both at 2^31-1 but zero is invalid, and a
      // high-bit byte pattern reads as negative through the signed
      // int — garbage dims must report as malformed, not as Some
      if (w > 0 && h > 0) Some(("png", w, h)) else None
    } else None

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

  /** Scan marker segments for the first SOFn frame header (C0-CF minus
    * the non-frame C4/C8/CC): data = precision(1) height(2 BE)
    * width(2 BE). Segment lengths include their own 2 bytes. */
  private def parseJpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
    var p = 2
    while (p + 3 < b.length) {
      if (u8(b, p) != 0xff) return None
      // skip fill bytes (consecutive 0xFF) before the marker code
      var q = p + 1
      while (q < b.length && u8(b, q) == 0xff) q += 1
      if (q >= b.length) return None
      val m = u8(b, q)
      if (m == 0xd9 || m == 0xda) return None // EOI / SOS: no frame header found
      if (q + 2 >= b.length) return None
      val len = be16(b, q + 1)
      if (len < 2 || q + 1 + len > b.length) return None
      val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
      if (isSof) {
        // the segment's DECLARED length must cover precision(1) +
        // height(2) + width(2): a short SOF would otherwise read its
        // dimensions from the next segment's bytes
        if (len < 7 || q + 7 >= b.length) return None
        val h = be16(b, q + 4); val w = be16(b, q + 6)
        return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
      }
      p = q + 1 + len
    }
    None
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Logical screen descriptor: width LE16 at 6, height LE16 at 8.
    * Zero dimensions are malformed (a zeroed descriptor is not an
    * image), so they report None like every other parse failure. */
  private def parseGif(b: Array[Byte]): Option[(String, Int, Int)] = {
    val w = le16(b, 6); val h = le16(b, 8)
    if (w > 0 && h > 0) Some(("gif", w, h)) else None
  }

  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong) | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** Parse a RIFF/WAVE container's fmt + data chunk headers:
    * (channels, sampleRate, bitsPerSample, nFrames). Chunk-walks like
    * parseJpeg; audio DATA need not be present (header-only blobs
    * parse, matching the synthesize-side contract). PERMISSIVE: any
    * malformed container yields None, never a throw. */
  def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b == null || b.length < 12) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var p = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    while (p + 8 <= b.length) {
      val id = new String(Array(b(p), b(p + 1), b(p + 2), b(p + 3)), "US-ASCII")
      val size = le32(b, p + 4)
      // a fmt chunk must DECLARE the 16 PCM bytes it carries — reading
      // past an undersized declaration would fabricate fields from the
      // next chunk's bytes
      if (id == "fmt " && size >= 16 && p + 8 + 16 <= b.length) {
        val channels = le16(b, p + 10)
        val rate = le32(b, p + 12).toInt
        val blockAlign = le16(b, p + 20)
        val bits = le16(b, p + 22)
        fmt = Some((channels, rate, bits, blockAlign))
      } else if (id == "data") {
        return fmt.collect { case (ch, rate, bits, ba) if ba > 0 =>
          (ch, rate, bits, size / ba)
        }
      }
      // advance in Long space: a hostile 32-bit size near Int.MaxValue
      // would wrap an Int cursor negative and index out of bounds; any
      // non-data chunk must fit entirely inside the blob
      val next = p.toLong + 8L + size + (size & 1L)
      if (next > b.length) return None
      p = next.toInt
    }
    None
  }

  /** Locate a RIFF container's `data` chunk: (payload offset, payload
    * length), or None when absent or when any chunk overruns the blob.
    * Cursor arithmetic in Long space (sizes are unsigned 32-bit) — the
    * parseWav discipline, shared with AudioStats so the two walks
    * cannot diverge. */
  def dataChunk(b: Array[Byte]): Option[(Long, Long)] = {
    if (b == null || b.length < 12) return None
    var i = 12L
    while (i + 8 <= b.length) {
      val o = i.toInt
      val id = new String(b, o, 4, "US-ASCII")
      val len = le32(b, o + 4)
      if (id == "data")
        return if (i + 8 + len <= b.length) Some((i + 8, len)) else None
      val next = i + 8 + len + (len & 1)
      if (next > b.length) return None
      i = next
    }
    None
  }

  /** Parse a RIFF/AVI container's MainAVIHeader (the `avih` chunk
    * inside the `hdrl` LIST): (width, height, streams, totalFrames,
    * microSecPerFrame). Chunk-walks the top level like parseWav and
    * descends ONLY into the hdrl list; video DATA (the `movi` list)
    * need not be present — header-only blobs parse, the
    * synthesize-side contract shared with WAV. PERMISSIVE: malformed
    * containers yield None, never a throw; the cursor advances in Long
    * space against hostile 32-bit sizes. */
  def parseAvi(b: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
    if (b == null || b.length < 12) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return None
    var p = 12
    while (p + 8 <= b.length) {
      val id = new String(Array(b(p), b(p + 1), b(p + 2), b(p + 3)), "US-ASCII")
      val size = le32(b, p + 4)
      if (id == "LIST" && size >= 4 && p + 12 <= b.length &&
          b(p + 8) == 'h' && b(p + 9) == 'd' && b(p + 10) == 'r' &&
          b(p + 11) == 'l') {
        // scan inside the hdrl list only, bounded by ITS declared size
        val listEnd = math.min(p.toLong + 8L + size, b.length.toLong)
        var q = p + 12
        while (q + 8 <= listEnd) {
          val cid = new String(Array(b(q), b(q + 1), b(q + 2), b(q + 3)), "US-ASCII")
          val csize = le32(b, q + 4)
          // an avih chunk must DECLARE the 56 MainAVIHeader bytes
          // (the undersized-fmt discipline from parseWav)
          if (cid == "avih" && csize >= 56 && q + 8 + 56 <= listEnd) {
            val d = q + 8
            return Some((le32(b, d + 32).toInt, le32(b, d + 36).toInt,
              le32(b, d + 24).toInt, le32(b, d + 16), le32(b, d)))
          }
          val cnext = q.toLong + 8L + csize + (csize & 1L)
          if (cnext > listEnd) return None
          q = cnext.toInt
        }
        return None
      }
      val next = p.toLong + 8L + size + (size & 1L)
      if (next > b.length) return None
      p = next.toInt
    }
    None
  }
}

/** `image_dims(binary)` -> struct<format, width, height>; null for
  * unrecognized/truncated containers (PERMISSIVE — callers route
  * unparseable blobs like the codec path routes decode failures). */
case class ImageDims(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"image_dims expects binary, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    MediaHeaders.parse(input.asInstanceOf[Array[Byte]]) match {
      case Some((fmt, w, h)) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))
      case None => null
    }
  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
  override def prettyName: String = "image_dims"
}

/** `audio_meta(binary)` -> struct<channels, sample_rate, bits,
  * n_frames>; null for unrecognized/truncated RIFF containers
  * (PERMISSIVE, like image_dims). */
case class AudioMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"audio_meta expects binary, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    MediaHeaders.parseWav(input.asInstanceOf[Array[Byte]]) match {
      case Some((ch, rate, bits, frames)) =>
        new GenericInternalRow(Array[Any](ch, rate, bits, frames))
      case None => null
    }
  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
  override def prettyName: String = "audio_meta"
}

/** `video_meta(binary)` -> struct<width, height, streams, n_frames,
  * us_per_frame>; null for unrecognized/truncated RIFF-AVI containers
  * (PERMISSIVE, like image_dims/audio_meta). */
case class VideoMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("streams", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("us_per_frame", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"video_meta expects binary, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    MediaHeaders.parseAvi(input.asInstanceOf[Array[Byte]]) match {
      case Some((w, h, st, frames, uspf)) =>
        new GenericInternalRow(Array[Any](w, h, st, frames, uspf))
      case None => null
    }
  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
  override def prettyName: String = "video_meta"
}

/** PGM (P5, binary grayscale) — the uncompressed image format whose
  * PIXEL data is decodable in pure JVM, which upgrades the multimodal
  * stage from header-only metadata to real decode → transform →
  * re-encode: [[ImageStats]] reads every pixel, [[ImageDownsample]]
  * box-filters to a new PGM. Compressed codecs (JPEG entropy coding
  * etc.) stay behind the documented mapPartitions seam — the
  * PLUMBING is identical, only the per-pixel kernel differs. */
/** Shared pixel kernels. The synth congruence is the ORACLE CONTRACT
  * (DuckDB replays `(id·7 + x·31 + y·17) mod 256` over a
  * generate_series grid for both the PGM and PNG pipelines), so it
  * lives in exactly one place — a drifting copy would silently break
  * oracle parity for one container format but not the other. Same for
  * the exact min/max/sum statistics row. */
private[functions] object PixelOps {
  /** pixel (x, y) = (id·7 + x·31 + y·17) mod 256, row-major. */
  def synthGrid(id: Long, w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = (((id * 7 + x * 31L + y * 17L) % 256 + 256) % 256).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  /** Exact (sum, min, max) over n unsigned bytes starting at off. */
  def stats(b: Array[Byte], off: Int, n: Int): (Long, Int, Int) = {
    var i = off; val end = off + n
    var sum = 0L; var mn = 255; var mx = 0
    while (i < end) {
      val v = b(i) & 0xff
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    (sum, mn, mx)
  }
}

object Pgm {

  /** Parse a binary PGM: returns (width, height, maxval, dataOffset),
    * or None if not a P5 container or truncated. Whitespace handling
    * per the netpbm spec (single whitespace after maxval, then raw
    * bytes). Bounds-checked, never throws. */
  def parse(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b == null || b.length < 8 || b(0) != 'P'.toByte || b(1) != '5'.toByte)
      return None
    var i = 2
    def skipWs(): Unit = {
      while (i < b.length &&
        (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1
      // netpbm comments: '#' to end of line
      if (i < b.length && b(i) == '#'.toByte) {
        while (i < b.length && b(i) != '\n') i += 1
        skipWs()
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0; var any = false
      while (i < b.length && b(i) >= '0'.toByte && b(i) <= '9'.toByte) {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
      }
      if (any) v else -1
    }
    val w = int(); val h = int(); val mx = int()
    if (w <= 0 || h <= 0 || mx <= 0 || mx > 255 || i >= b.length) return None
    // the single whitespace after maxval must actually BE whitespace:
    // a malformed header like "P5 8 8 255X…" must fail, not silently
    // shift the pixel window by one byte
    if (b(i) != ' ' && b(i) != '\n' && b(i) != '\r' && b(i) != '\t') return None
    i += 1
    if (b.length - i < w.toLong * h) return None
    Some((w, h, mx, i))
  }

  /** Encode (width, height, pixels) as binary PGM with the given
    * maxval (default 255). Pixel SEMANTICS are relative to maxval, so
    * re-encoders must carry the source's maxval through — writing 255
    * over 15-level pixels would render the image near-black in any
    * spec-compliant viewer. */
  def encode(w: Int, h: Int, px: Array[Byte], maxval: Int = 255): Array[Byte] = {
    require(maxval > 0 && maxval <= 255, s"maxval must be in [1,255], got $maxval")
    val header = s"P5\n$w $h\n$maxval\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + px.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(px, 0, out, header.length, px.length)
    out
  }
}

/** `image_stats(pgm_binary)` -> struct(width, height, n_px, px_sum,
  * px_min, px_max): exact integer pixel statistics from a REAL decode
  * of every pixel (sums exact, so the oracle can replay them; callers
  * derive mean/contrast arithmetically). Null for non-PGM payloads. */
case class ImageStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("n_px", LongType), StructField("px_sum", LongType),
    StructField("px_min", IntegerType), StructField("px_max", IntegerType)))
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"image_stats expects binary input, got $other")
  }
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    Pgm.parse(b) match {
      case None => null
      case Some((w, h, _, off)) =>
        val (sum, mn, mx) = PixelOps.stats(b, off, w * h)
        new GenericInternalRow(Array[Any](w, h, (w.toLong * h), sum, mn, mx))
    }
  }
  override protected def withNewChildInternal(newChild: Expression): ImageStats =
    copy(child = newChild)
  override def prettyName: String = "image_stats"
}

/** `image_downsample(pgm_binary, factor)` -> PGM binary: box-filter
  * downsample by an integer factor (each output pixel is the FLOOR of
  * the mean of its f×f block; trailing rows/cols that do not fill a
  * block are dropped, so out dims = in dims div f) — the resize stage
  * of a multimodal ingest pipeline, exact enough for an oracle to
  * replay. Null for non-PGM input or when a dimension collapses to 0. */
case class ImageDownsample(child: Expression, factor: Int)
    extends UnaryExpression with CodegenFallback {
  require(factor >= 1, s"factor must be >= 1, got $factor")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"image_downsample expects binary input, got $other")
  }
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    Pgm.parse(b) match {
      case None => null
      case Some((w, h, maxval, off)) =>
        val ow = w / factor; val oh = h / factor
        if (ow == 0 || oh == 0) return null
        val out = new Array[Byte](ow * oh)
        var oy = 0
        while (oy < oh) {
          var ox = 0
          while (ox < ow) {
            var sum = 0L
            var dy = 0
            while (dy < factor) {
              val row = off + (oy * factor + dy) * w + ox * factor
              var dx = 0
              while (dx < factor) { sum += b(row + dx) & 0xff; dx += 1 }
              dy += 1
            }
            out(oy * ow + ox) = (sum / (factor.toLong * factor)).toByte
            ox += 1
          }
          oy += 1
        }
        // carry the SOURCE maxval: the box mean of values in [0, mx]
        // stays in [0, mx], and re-labeling them against 255 would
        // silently darken any input with maxval < 255
        Pgm.encode(ow, oh, out, maxval)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): ImageDownsample =
    copy(child = newChild)
  override def prettyName: String = "image_downsample"
}

/** `audio_stats(wav_binary)` -> struct(n_samples, sum_abs, sum_sq,
  * peak, zero_crossings, clip_count): exact integer statistics over
  * REAL decoded PCM16-LE samples of a RIFF/WAVE payload (mono or
  * interleaved — every sample is read). Sums are exact int64 so an
  * oracle replays them; RMS/loudness derive downstream. A crossing is
  * `s[t-1]·s[t] < 0`; clip = sample at either int16 rail. Null when
  * the container is not PCM16 WAV. */
case class AudioStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType), StructField("sum_abs", LongType),
    StructField("sum_sq", LongType), StructField("peak", IntegerType),
    StructField("zero_crossings", LongType), StructField("clip_count", LongType)))
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"audio_stats expects binary input, got $other")
  }
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    MediaHeaders.parseWav(b) match {
      case None => null
      case Some((_, _, bitsPerSample, _)) if bitsPerSample != 16 => null
      case Some(_) =>
        val (dataOff, dataLen) = MediaHeaders.dataChunk(b) match {
          case None => return null
          case Some(dc) => dc
        }
        val n = (dataLen / 2).toInt
        var t = 0
        var sumAbs = 0L; var sumSq = 0L; var peak = 0
        var crossings = 0L; var clips = 0L; var prev = 0
        while (t < n) {
          val lo = b(dataOff.toInt + 2 * t) & 0xff
          val hi = b(dataOff.toInt + 2 * t + 1)
          val s = (hi << 8) | lo // sign-extended via hi being Byte
          val a = math.abs(s)
          sumAbs += a; sumSq += s.toLong * s
          if (a > peak) peak = a
          if (s == 32767 || s == -32768) clips += 1
          if (t > 0 && prev.toLong * s < 0) crossings += 1
          prev = s
          t += 1
        }
        new GenericInternalRow(Array[Any](n.toLong, sumAbs, sumSq, peak, crossings, clips))
    }
  }
  override protected def withNewChildInternal(newChild: Expression): AudioStats =
    copy(child = newChild)
  override def prettyName: String = "audio_stats"
}

/** `synth_pgm(id, w, h)` -> a COMPLETE binary PGM whose pixel (x, y)
  * is `(id·7 + x·31 + y·17) mod 256` — the deterministic payload
  * generator that lets the pixel pipeline be oracle-tested end to end
  * without codec libraries (the oracle replays the same congruence
  * over a generate_series grid). */
case class SynthPgm(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, IntegerType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"synth_pgm expects (long id, int w, int h), got $other")
    }
  override def nullSafeEval(idA: Any, wA: Any, hA: Any): Any = {
    val id = idA.asInstanceOf[Long]
    val w = wA.asInstanceOf[Int]; val h = hA.asInstanceOf[Int]
    require(w > 0 && h > 0 && w.toLong * h <= (1 << 22),
      s"synth_pgm dims out of range: ${w}x$h")
    Pgm.encode(w, h, PixelOps.synthGrid(id, w, h))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): SynthPgm = copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_pgm"
}

/** `synth_wav_pcm(id, n)` -> a COMPLETE RIFF/WAVE (PCM16-LE mono,
  * 16 kHz) with n samples `s(t) = ((id·7919 + t·2654435761) mod
  * 65536) − 32768` — real audio bytes whose exact sample statistics
  * the oracle replays over generate_series. */
case class SynthWavPcm(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (LongType, IntegerType) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"synth_wav_pcm expects (long id, int n), got $other")
  }
  override def nullSafeEval(idA: Any, nA: Any): Any = {
    val id = idA.asInstanceOf[Long]; val n = nA.asInstanceOf[Int]
    require(n > 0 && n <= (1 << 20), s"synth_wav_pcm n out of range: $n")
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    def le32(off: Int, v: Long): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def ascii(off: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    val rate = 16000
    ascii(0, "RIFF"); le32(4, 36L + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16); le16(20, 1 /* PCM */); le16(22, 1 /* mono */)
    le32(24, rate); le32(28, rate * 2L); le16(32, 2); le16(34, 16)
    ascii(36, "data"); le32(40, dataLen)
    var t = 0
    while (t < n) {
      val s = ((((id * 7919 + t * 2654435761L) % 65536) + 65536) % 65536).toInt - 32768
      le16(44 + 2 * t, s & 0xffff)
      t += 1
    }
    out
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthWavPcm =
    copy(left = l, right = r)
  override def prettyName: String = "synth_wav_pcm"
}

/** Minimal REAL PNG codec for 8-bit grayscale, non-interlaced images —
  * the compressed-format pixel path (round-7 advice: "real corpora are
  * JPEG/PNG-deflate"). Everything is pure JVM: DEFLATE via
  * java.util.zip (the same zlib stream every PNG encoder writes),
  * CRC-32 via java.util.zip.CRC32, and the full scanline filter set
  * (None/Sub/Up/Average/Paeth, PNG spec §9) on both encode and decode.
  * The container reference for the header layout is the public PNG
  * spec (RFC 2083); the reference repo has no multimodal path — this
  * generalizes its byte-level Avro codec discipline to media bytes. */
object Png {
  private val Sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def crc(typ: Array[Byte], data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32
    c.update(typ); c.update(data); c.getValue
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val t = typ.getBytes("US-ASCII")
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    be32(data.length.toLong); out.write(t); out.write(data); be32(crc(t, data))
  }

  /** Paeth predictor (PNG spec §9.4) — exact spec arithmetic. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode 8-bit grayscale pixels as a complete PNG. Each scanline is
    * filtered with type (row mod 5) — exercising ALL five spec filters
    * so a decoder that fakes unfiltering cannot round-trip — then the
    * filtered stream is DEFLATE-compressed into one IDAT. */
  def encode(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    val ihdr = new Array[Byte](13)
    def be32a(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >> 24) & 0xff).toByte; ihdr(off + 1) = ((v >> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >> 8) & 0xff).toByte; ihdr(off + 3) = (v & 0xff).toByte
    }
    be32a(0, w); be32a(4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, adaptive filters, no interlace
    // filtered scanlines: 1 filter-type byte + w filtered bytes per row
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (w + 1)) = f.toByte
      var x = 0
      while (x < w) {
        val cur = px(y * w + x) & 0xff
        val left = if (x > 0) px(y * w + x - 1) & 0xff else 0
        val up = if (y > 0) px((y - 1) * w + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xff else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (w + 1) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", bos.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a grayscale-8 non-interlaced PNG: verifies the signature
    * and every chunk CRC, concatenates multi-IDAT streams, INFLATEs,
    * and un-filters all five scanline filter types. Returns
    * (width, height, pixels) or None for anything malformed — never
    * throws on arbitrary bytes. */
  def decode(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b == null || b.length < Sig.length + 12) return None
    var i = 0
    while (i < Sig.length) { if (b(i) != Sig(i)) return None; i += 1 }
    def be32(off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var seenEnd = false
    while (!seenEnd) {
      if (i + 8 > b.length) return None
      val len = be32(i)
      if (len > Int.MaxValue - 12 || i + 12 + len > b.length) return None
      val typ = new String(b, i + 4, 4, "US-ASCII")
      // CRC over (type ++ data) straight from the buffer — no payload
      // copy for chunks that are only checksummed and skipped
      val c = new java.util.zip.CRC32
      c.update(b, i + 4, 4 + len.toInt)
      if (c.getValue != be32(i + 8 + len.toInt)) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(i + 8).toInt; h = be32(i + 12).toInt
          // grayscale-8, deflate, non-interlaced only — the synthetic
          // corpus contract; other color types report None (metadata
          // still flows through image_dims)
          if (b(i + 16) != 8 || b(i + 17) != 0 || b(i + 18) != 0 ||
            b(i + 19) != 0 || b(i + 20) != 0) return None
          if (w <= 0 || h <= 0 || w.toLong * h > (1 << 24)) return None
        case "IDAT" => idat.write(b, i + 8, len.toInt)
        case "IEND" => seenEnd = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      i += 12 + len.toInt
    }
    if (w <= 0 || h <= 0) return None
    val raw = new Array[Byte]((w + 1) * h)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, got, raw.length - got)
        // zero progress is terminal either way: needsInput = truncated
        // stream; needsDictionary (zlib FDICT flag) = a preset
        // dictionary this decoder does not supply — without this check
        // inflate() returns 0 forever and the loop would hang the task
        if (n == 0 && (infl.needsInput() || infl.needsDictionary())) return None
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally infl.end()
    if (got != raw.length) return None
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (w + 1)) & 0xff
      if (f > 4) return None
      var x = 0
      while (x < w) {
        val cur = raw(y * (w + 1) + 1 + x) & 0xff
        val left = if (x > 0) px(y * w + x - 1) & 0xff else 0
        val up = if (y > 0) px((y - 1) * w + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xff else 0
        val recon = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, ul)
        }
        px(y * w + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }
}

/** `synth_png(id, w, h)` -> a COMPLETE compressed PNG (grayscale-8,
  * DEFLATE IDAT, all five scanline filters cycling by row) with pixel
  * (x, y) = (id·7 + x·31 + y·17) mod 256 — the same congruence as
  * synth_pgm, so the oracle replays pixel statistics without needing
  * zlib: the engine proves decode(deflate(filter(px))) == px. */
case class SynthPng(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, IntegerType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"synth_png expects (long id, int w, int h), got $other")
    }
  override def nullSafeEval(idA: Any, wA: Any, hA: Any): Any = {
    val id = idA.asInstanceOf[Long]
    val w = wA.asInstanceOf[Int]; val h = hA.asInstanceOf[Int]
    require(w > 0 && h > 0 && w.toLong * h <= (1 << 22),
      s"synth_png dims out of range: ${w}x$h")
    Png.encode(w, h, PixelOps.synthGrid(id, w, h))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): SynthPng = copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_png"
}

/** `png_stats(png_binary)` -> struct(width, height, n_px, px_sum,
  * px_min, px_max): the SAME exact integer statistics as image_stats,
  * but from a REAL compressed decode — chunk walk with CRC checks,
  * INFLATE, full five-filter reconstruction. Null for anything that is
  * not a well-formed grayscale-8 PNG. */
case class PngStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("n_px", LongType), StructField("px_sum", LongType),
    StructField("px_min", IntegerType), StructField("px_max", IntegerType)))
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"png_stats expects binary input, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Png.decode(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some((w, h, px)) =>
        val (sum, mn, mx) = PixelOps.stats(px, 0, px.length)
        new GenericInternalRow(Array[Any](w, h, w.toLong * h, sum, mn, mx))
    }
  override protected def withNewChildInternal(newChild: Expression): PngStats =
    copy(child = newChild)
  override def prettyName: String = "png_stats"
}

object media {
  def image_dims(blob: Column): Column =
    ColumnBridge.column(ImageDims(ColumnBridge.expression(blob)))
  def audio_meta(blob: Column): Column =
    ColumnBridge.column(AudioMeta(ColumnBridge.expression(blob)))
  def video_meta(blob: Column): Column =
    ColumnBridge.column(VideoMeta(ColumnBridge.expression(blob)))
  def image_stats(blob: Column): Column =
    ColumnBridge.column(ImageStats(ColumnBridge.expression(blob)))
  def image_downsample(blob: Column, factor: Int): Column =
    ColumnBridge.column(ImageDownsample(ColumnBridge.expression(blob), factor))
  def audio_stats(blob: Column): Column =
    ColumnBridge.column(AudioStats(ColumnBridge.expression(blob)))
  def synth_pgm(id: Column, w: Column, h: Column): Column =
    ColumnBridge.column(SynthPgm(ColumnBridge.expression(id),
      ColumnBridge.expression(w), ColumnBridge.expression(h)))
  def synth_wav_pcm(id: Column, n: Column): Column =
    ColumnBridge.column(SynthWavPcm(ColumnBridge.expression(id),
      ColumnBridge.expression(n)))
  def synth_png(id: Column, w: Column, h: Column): Column =
    ColumnBridge.column(SynthPng(ColumnBridge.expression(id),
      ColumnBridge.expression(w), ColumnBridge.expression(h)))
  def png_stats(blob: Column): Column =
    ColumnBridge.column(PngStats(ColumnBridge.expression(blob)))
}
