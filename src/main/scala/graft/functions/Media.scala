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
    if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("png", be32(b, 16), be32(b, 20)))
    else None

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
        if (q + 7 >= b.length) return None
        return Some(("jpeg", be16(b, q + 6), be16(b, q + 4)))
      }
      p = q + 1 + len
    }
    None
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Logical screen descriptor: width LE16 at 6, height LE16 at 8. */
  private def parseGif(b: Array[Byte]): Option[(String, Int, Int)] =
    Some(("gif", le16(b, 6), le16(b, 8)))

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

object media {
  def image_dims(blob: Column): Column =
    ColumnBridge.column(ImageDims(ColumnBridge.expression(blob)))
  def audio_meta(blob: Column): Column =
    ColumnBridge.column(AudioMeta(ColumnBridge.expression(blob)))
  def video_meta(blob: Column): Column =
    ColumnBridge.column(VideoMeta(ColumnBridge.expression(blob)))
}
