package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Brotli (RFC 7932) STREAM-HEADER parse + store-mode subset — the
  * codec a crawler hits on most HTTP bodies (`Content-Encoding: br`).
  *
  * Honest scope, stated precisely:
  *   - brotli has NO magic number: a raw stream cannot be sniffed
  *     from content alone (a large fraction of random bytes parses as
  *     a valid stream prefix). Recognition therefore takes the
  *     transfer-metadata HINT a crawler actually has — see
  *     [[BlobKind.kindHinted]]; `blob_kind(blob)` without the hint
  *     keeps routing brotli to the content fallback by design.
  *   - the structural layer IS fully parsed: WBITS (all 15 variable-
  *     length encodings), meta-block headers (ISLAST/ISLASTEMPTY,
  *     MNIBBLES, MLEN with the nonzero-last-nibble rule), metadata
  *     blocks (reserved bit, MSKIPBYTES/MSKIPLEN with the nonzero-
  *     last-byte rule), and uncompressed meta-blocks incl. their
  *     byte-alignment — enough to TRIAGE any brotli stream and to
  *     fully DECODE store-mode streams (the level-0 analogue of gzip
  *     stored blocks, which this object also writes);
  *   - compressed meta-blocks (prefix codes, context modeling, the
  *     static dictionary) are recognized and routed (`kind = "br"`),
  *     not decoded — the spec's entropy layer is out of scope, the
  *     same contract zstd triage had before round 11's full decode.
  *
  * Never throws; malformation -> kind "malformed" / null decode. */
object Brotli {

  /** Structural accounting (round-12 extension, round-11 verdict #4 —
    * the RFC 7932 static dictionary is not reconstructible offline, so
    * the entropy layer stays out of scope and the structural layer
    * accounts sizes instead): `nMetaBlocks`/`skipBytes` count metadata
    * blocks and their skipped payload; `compressedMlen` is the
    * DECLARED uncompressed length of the compressed meta-block where
    * routing stops (0 when the stream is pure store/metadata). */
  final case class Meta(kind: String, wbits: Int, windowSize: Long,
      nStoreBlocks: Int, storeBytes: Long, nMetaBlocks: Int = 0,
      skipBytes: Long = 0L, compressedMlen: Long = 0L)

  private final val Malformed = Meta("malformed", 0, 0L, 0, 0L)

  /** Forward LSB-first bit reader (RFC 7932 §2 bit order). */
  private final class Reader(b: Array[Byte]) {
    var bitPos = 0
    var bad = false
    private val totalBits = b.length * 8
    def read(n: Int): Int = {
      if (bitPos + n > totalBits) { bad = true; return 0 }
      var res = 0
      var k = 0
      while (k < n) {
        val i = bitPos + k
        res |= ((b(i >> 3) >> (i & 7)) & 1) << k
        k += 1
      }
      bitPos += n
      res
    }
    /** Align to the next byte boundary; RFC: the skipped bits MUST be
      * zero in the places that require it (uncompressed alignment). */
    def alignRequireZero(): Boolean = {
      var ok = true
      while ((bitPos & 7) != 0) { if (read(1) != 0) ok = false }
      ok && !bad
    }
    def bytePos: Int = bitPos >> 3
    def atByteBoundaryEnd: Boolean = bytePos >= b.length ||
      (bytePos == b.length - 1 && {
        // padding bits of the final partial byte must be zero
        var i = bitPos
        var z = true
        while (i < totalBits) { z &&= ((b(i >> 3) >> (i & 7)) & 1) == 0; i += 1 }
        z
      })
  }

  /** Parse WBITS (RFC 7932 §9.1's variable-length code). Returns -1 on
    * the invalid pattern. */
  private def readWbits(r: Reader): Int = {
    if (r.read(1) == 0) return 16
    val n = r.read(3)
    if (n != 0) return 17 + n
    val m = r.read(3)
    if (m == 0) return 17
    if (m == 1) return -1 // reserved: invalid
    8 + m
  }

  /** Structural parse; decodes store-mode streams when `collect`. */
  private def parse(b: Array[Byte], collect: Boolean):
      (Meta, Option[Array[Byte]]) = {
    if (b == null || b.length == 0) return (Malformed, None)
    val r = new Reader(b)
    val wbits = readWbits(r)
    if (wbits < 0 || r.bad) return (Malformed, None)
    val window = (1L << wbits) - 16
    val out = if (collect) new java.io.ByteArrayOutputStream(b.length) else null
    var nStore = 0
    var storeBytes = 0L
    var nMeta = 0
    var skipTotal = 0L
    var done = false
    while (!done) {
      val isLast = r.read(1) == 1
      if (r.bad) return (Malformed, None)
      if (isLast && r.read(1) == 1) { // ISLASTEMPTY
        if (r.bad || !r.atByteBoundaryEnd) return (Malformed, None)
        done = true
      } else {
        val mnibbles = r.read(2)
        if (r.bad) return (Malformed, None)
        if (mnibbles == 3) {
          // metadata block: reserved bit, MSKIPBYTES, aligned skip
          if (isLast) return (Malformed, None)
          if (r.read(1) != 0) return (Malformed, None) // reserved
          val skipBytes = r.read(2)
          var skipLen = 0
          if (skipBytes > 0) {
            val v = r.read(8 * skipBytes)
            // RFC 7932 §9.2: only for MSKIPBYTES > 1 must the LAST byte
            // of the length field be nonzero; a 1-byte field of 0x00 is
            // a valid MSKIPLEN = 1
            if (skipBytes > 1 && (v >> (8 * (skipBytes - 1))) == 0)
              return (Malformed, None)
            skipLen = v + 1
          }
          if (!r.alignRequireZero()) return (Malformed, None)
          if (r.bytePos + skipLen > b.length) return (Malformed, None)
          r.bitPos += skipLen * 8
          nMeta += 1
          skipTotal += skipLen
        } else {
          val nib = 4 + mnibbles
          val v = r.read(4 * nib)
          if (r.bad) return (Malformed, None)
          if (nib > 4 && (v >> (4 * (nib - 1))) == 0)
            return (Malformed, None) // last nibble must be nonzero
          val mlen = v + 1
          val uncompressed = !isLast && r.read(1) == 1
          if (r.bad) return (Malformed, None)
          if (uncompressed) {
            if (!r.alignRequireZero()) return (Malformed, None)
            if (r.bytePos + mlen > b.length) return (Malformed, None)
            if (collect) out.write(b, r.bytePos, mlen)
            r.bitPos += mlen * 8
            nStore += 1
            storeBytes += mlen
          } else {
            // compressed meta-block: recognized + size-accounted from
            // its header (declared MLEN), not decoded
            return (Meta("br", wbits, window, nStore, storeBytes,
              nMeta, skipTotal, mlen.toLong), None)
          }
        }
      }
    }
    (Meta("br_store", wbits, window, nStore, storeBytes, nMeta, skipTotal),
      if (collect) Some(out.toByteArray) else None)
  }

  def meta(b: Array[Byte]): Meta = parse(b, collect = false)._1

  /** Full decode of store-mode streams; `kind != br_store` -> None. */
  def unwrap(b: Array[Byte]): Option[Array[Byte]] = {
    val (m, out) = parse(b, collect = true)
    if (m.kind == "br_store") out else None
  }

  /** Is this plausibly a brotli stream? Used ONLY behind the transfer-
    * metadata hint (see scope note above): a structurally valid prefix
    * qualifies. */
  def plausible(b: Array[Byte]): Boolean = {
    val k = meta(b).kind
    k == "br" || k == "br_store"
  }

  /** Synthesize a structurally-rich stream for the size-accounting
    * oracle (round-12): rotating WBITS encodings (1-bit, 4-bit and
    * 7-bit forms), 1-3 metadata-skip blocks, 1-2 store blocks, and —
    * three ids of four — a trailing compressed meta-block whose
    * declared MLEN exercises all three nibble widths (4/5/6).
    * `corrupt` truncates to 4 bytes: the walk dies inside the first
    * blocks, deterministically 'malformed'. */
  def synthStructural(id: Long, corrupt: Boolean): Array[Byte] = {
    val bw = new ZstdCodec.BitWriter
    val wb = Array(16, 18, 22, 10, 24)((id % 5).toInt)
    wb match {
      case 16 => bw.add(0L, 1)
      case n if n >= 18 => bw.add(1L, 1); bw.add((n - 17).toLong, 3)
      case n => bw.add(1L, 1); bw.add(0L, 3); bw.add((n - 8).toLong, 3)
    }
    val nMeta = 1 + (id % 3).toInt
    var j = 0
    while (j < nMeta) {
      val skipLen = 1 + ((id * 7 + j * 11) % 50).toInt
      bw.add(0L, 1); bw.add(3L, 2) // ISLAST=0, MNIBBLES=3 (metadata)
      bw.add(0L, 1); bw.add(1L, 2) // reserved, MSKIPBYTES=1
      bw.add((skipLen - 1).toLong, 8)
      bw.alignForward()
      var i = 0
      while (i < skipLen) { bw.add((id * 13 + i) % 256, 8); i += 1 }
      j += 1
    }
    val nStoreB = 1 + (id % 2).toInt
    j = 0
    while (j < nStoreB) {
      val len = 10 + ((id + j * 17) % 30).toInt
      bw.add(0L, 1); bw.add(0L, 2) // 4 nibbles
      bw.add((len - 1).toLong, 16)
      bw.add(1L, 1) // ISUNCOMPRESSED
      bw.alignForward()
      var i = 0
      while (i < len) { bw.add((id * 3 + j + i) % 256, 8); i += 1 }
      j += 1
    }
    if (id % 4 != 3) {
      val nibCode = (id % 3).toInt // 0/1/2 -> 4/5/6 nibbles
      val mlen = nibCode match {
        case 0 => 100L + id % 60000
        case 1 => 65537L + id % 900000
        case _ => 1048577L + id % 9000000
      }
      bw.add(0L, 1) // ISLAST=0
      bw.add(nibCode.toLong, 2)
      bw.add(mlen - 1, 4 * (4 + nibCode))
      bw.add(0L, 1) // ISUNCOMPRESSED=0 -> compressed, routing stops
      bw.add(0x5aL, 8); bw.add(0xa5L, 8) // opaque entropy bits
      bw.alignForward()
    } else {
      bw.add(1L, 1); bw.add(1L, 1) // ISLAST + ISLASTEMPTY
      bw.alignForward()
    }
    val full = bw.toArray
    if (corrupt) java.util.Arrays.copyOf(full, 4) else full
  }

  /** Store-mode encoder (the valid level-0 stream shape): WBITS=16,
    * data in <=65536-byte uncompressed meta-blocks, final
    * ISLAST+ISLASTEMPTY. Interoperable: any RFC 7932 decoder inflates
    * it. */
  def wrap(data: Array[Byte]): Array[Byte] = {
    val bw = new ZstdCodec.BitWriter
    bw.add(0L, 1) // WBITS = 16
    var p = 0
    while (p < data.length) {
      val n = math.min(65536, data.length - p)
      bw.add(0L, 1) // ISLAST = 0
      bw.add(0L, 2) // MNIBBLES code 0 -> 4 nibbles
      bw.add((n - 1).toLong, 16)
      bw.add(1L, 1) // ISUNCOMPRESSED
      bw.alignForward()
      var i = 0
      while (i < n) { bw.add((data(p + i) & 0xffL), 8); i += 1 }
      p += n
    }
    bw.add(1L, 1) // ISLAST
    bw.add(1L, 1) // ISLASTEMPTY
    bw.alignForward()
    bw.toArray
  }
}

/** `brotli_meta(binary)` -> struct(kind, wbits, window_size,
  * n_store_blocks, store_bytes, n_meta_blocks, skip_bytes,
  * compressed_mlen) per [[Brotli.meta]]. */
case class BrotliMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("kind", StringType), StructField("wbits", IntegerType),
    StructField("window_size", LongType),
    StructField("n_store_blocks", IntegerType),
    StructField("store_bytes", LongType),
    StructField("n_meta_blocks", IntegerType),
    StructField("skip_bytes", LongType),
    StructField("compressed_mlen", LongType)))
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"brotli_meta expects binary input, got $other")
  }
  override def nullSafeEval(input: Any): Any = {
    val m = Brotli.meta(input.asInstanceOf[Array[Byte]])
    new GenericInternalRow(Array[Any](UTF8String.fromString(m.kind),
      m.wbits, m.windowSize, m.nStoreBlocks, m.storeBytes,
      m.nMetaBlocks, m.skipBytes, m.compressedMlen))
  }
  override protected def withNewChildInternal(newChild: Expression): BrotliMeta =
    copy(child = newChild)
  override def prettyName: String = "brotli_meta"
}

/** `brotli_wrap(binary)` -> a store-mode brotli stream. */
case class BrotliWrap(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"brotli_wrap expects binary input, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Brotli.wrap(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): BrotliWrap =
    copy(child = newChild)
  override def prettyName: String = "brotli_wrap"
}

/** `brotli_unwrap(binary)` -> decoded bytes for store-mode streams,
  * null otherwise (incl. compressed meta-blocks — scope stated). */
case class BrotliUnwrap(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"brotli_unwrap expects binary input, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Brotli.unwrap(input.asInstanceOf[Array[Byte]]).orNull
  override protected def withNewChildInternal(newChild: Expression): BrotliUnwrap =
    copy(child = newChild)
  override def prettyName: String = "brotli_unwrap"
}

/** `synth_brotli_structural(id, corrupt)` per
  * [[Brotli.synthStructural]]. */
case class SynthBrotliStructural(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (LongType, BooleanType) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"synth_brotli_structural expects (long, boolean), got $other")
  }
  override def nullSafeEval(id: Any, c: Any): Any =
    Brotli.synthStructural(id.asInstanceOf[Long], c.asInstanceOf[Boolean])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SynthBrotliStructural = copy(left = l, right = r)
  override def prettyName: String = "synth_brotli_structural"
}

object brotli {
  def brotli_meta(blob: Column): Column =
    ColumnBridge.column(BrotliMeta(ColumnBridge.expression(blob)))
  def brotli_wrap(blob: Column): Column =
    ColumnBridge.column(BrotliWrap(ColumnBridge.expression(blob)))
  def brotli_unwrap(blob: Column): Column =
    ColumnBridge.column(BrotliUnwrap(ColumnBridge.expression(blob)))
  def synth_brotli_structural(id: Column, corrupt: Column): Column =
    ColumnBridge.column(SynthBrotliStructural(ColumnBridge.expression(id),
      ColumnBridge.expression(corrupt)))
}
