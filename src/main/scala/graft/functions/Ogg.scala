package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Ogg container triage (RFC 3533 page walk) — the free-codec A/V
  * member of the container family (Opus podcasts, Vorbis audio,
  * Theora video all ship in Ogg pages): per page, the "OggS" capture
  * pattern, version 0, header-type flags (continued/BOS/EOS), 64-bit
  * granule position, stream serial, sequence number, and the lacing
  * (segment) table whose values sum to the payload length. Pages must
  * tile the blob EXACTLY. Reports page/stream/BOS/EOS counts, total
  * payload bytes, max granule, and the first BOS page's codec
  * identity from its published magic ("OpusHead", \x01vorbis,
  * \x80theora, "fishead\0" for skeleton). The page CRC32 field is
  * walked over, not verified (triage scope, like the mp4/webp
  * envelopes — stated). Distinct-stream tracking is BOUNDED at 64
  * serials (per-row memory guard: a hostile blob is one page per 27
  * bytes, so unbounded tracking is O(blob) heap per row); a 65th
  * distinct serial is treated as out of triage scope and returns
  * None rather than silently reporting a saturated count (round-12
  * advice #1). Never throws; malformation -> null. */
object Ogg {

  final case class Meta(nPages: Int, nStreams: Int, nBos: Int, nEos: Int,
      payloadBytes: Long, maxGranule: Long, codec: String)

  def meta(b: Array[Byte]): Option[Meta] = {
    if (b == null || b.length < 27) return None
    var p = 0
    var nPages = 0
    var nBos = 0
    var nEos = 0
    var payload = 0L
    var maxGranule = Long.MinValue
    var codec: String = null
    val serials = new scala.collection.mutable.HashSet[Long]
    @inline def u32(i: Int): Long = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    while (p < b.length) {
      if (p + 27 > b.length) return None
      if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' || b(p + 3) != 'S')
        return None
      if (b(p + 4) != 0) return None // stream structure version
      val hType = b(p + 5) & 0xff
      if ((hType & 0xf8) != 0) return None // reserved flag bits
      var granule = 0L
      var k = 0
      while (k < 8) { granule |= (b(p + 6 + k) & 0xffL) << (8 * k); k += 1 }
      val serial = u32(p + 14)
      val nSegs = b(p + 26) & 0xff
      if (p + 27 + nSegs > b.length) return None
      var segSum = 0
      k = 0
      while (k < nSegs) { segSum += b(p + 27 + k) & 0xff; k += 1 }
      val payloadStart = p + 27 + nSegs
      if (payloadStart + segSum > b.length) return None
      nPages += 1
      serials += serial
      if (serials.size > 64) return None // bounded triage scope (see doc)
      if ((hType & 0x02) != 0) {
        nBos += 1
        if (codec == null && segSum >= 8) {
          val s = payloadStart
          codec =
            if (b(s) == 'O' && b(s + 1) == 'p' && b(s + 2) == 'u' &&
              b(s + 3) == 's' && b(s + 4) == 'H') "opus"
            else if ((b(s) & 0xff) == 0x01 && b(s + 1) == 'v' &&
              b(s + 2) == 'o' && b(s + 3) == 'r') "vorbis"
            else if ((b(s) & 0xff) == 0x80 && b(s + 1) == 't' &&
              b(s + 2) == 'h' && b(s + 3) == 'e') "theora"
            else if (b(s) == 'f' && b(s + 1) == 'i' && b(s + 2) == 's' &&
              b(s + 3) == 'h') "skeleton"
            else "unknown"
        }
      }
      if ((hType & 0x04) != 0) nEos += 1
      // granule -1 means "no packet finishes on this page"
      if (granule != -1L && granule > maxGranule) maxGranule = granule
      payload += segSum
      p = payloadStart + segSum
    }
    if (nPages == 0 || nBos == 0) return None
    Some(Meta(nPages, serials.size, nBos, nEos, payload,
      if (maxGranule == Long.MinValue) -1L else maxGranule,
      if (codec == null) "unknown" else codec))
  }

  /** Synthesize a structurally-true multi-stream Ogg for the oracle:
    * 1-2 logical streams, 2-4 pages each (BOS first with the codec
    * magic — opus/vorbis alternating — EOS last), deterministic
    * single-packet lacing and granule ladders. `corrupt` breaks the
    * second page's capture pattern. */
  def synth(id: Long, corrupt: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    def w32(v: Long): Unit =
      (0 until 4).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    def w64(v: Long): Unit =
      (0 until 8).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    val nStreams = (1 + id % 2).toInt
    var pageIdx = 0
    var s = 0
    while (s < nStreams) {
      val nPg = (2 + (id + s) % 3).toInt
      val serial = 1000L + id % 9000 + s
      var j = 0
      while (j < nPg) {
        val bos = j == 0
        val eos = j == nPg - 1
        val len = (40 + (id + s * 7 + j * 3) % 200).toInt // < 255: one lacing byte
        out.write('O'); out.write('g'); out.write('g')
        out.write(if (corrupt && pageIdx == 1) 'Z' else 'S')
        out.write(0) // version
        out.write((if (bos) 2 else 0) | (if (eos) 4 else 0))
        w64((id % 97) * 100 + s * 10 + j) // granule ladder
        w32(serial)
        w32(j.toLong) // page sequence
        w32(0L) // crc (not verified at triage scope)
        out.write(1) // one segment
        out.write(len)
        // payload: BOS pages lead with the codec magic
        val magic: Array[Byte] =
          if (!bos) Array.emptyByteArray
          else if ((id + s) % 2 == 0) "OpusHead".getBytes("US-ASCII")
          else Array[Byte](0x01, 'v', 'o', 'r', 'b', 'i', 's', 0)
        out.write(magic, 0, magic.length)
        var i = magic.length
        while (i < len) { out.write(((id + s + j + i) % 251).toInt); i += 1 }
        pageIdx += 1
        j += 1
      }
      s += 1
    }
    out.toByteArray
  }
}

/** `ogg_meta(binary)` -> struct(n_pages, n_streams, n_bos, n_eos,
  * payload_bytes, max_granule, codec) or null per [[Ogg.meta]]. */
case class OggMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_pages", IntegerType), StructField("n_streams", IntegerType),
    StructField("n_bos", IntegerType), StructField("n_eos", IntegerType),
    StructField("payload_bytes", LongType),
    StructField("max_granule", LongType), StructField("codec", StringType)))
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ogg_meta expects binary input, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Ogg.meta(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some(m) => new GenericInternalRow(Array[Any](m.nPages, m.nStreams,
        m.nBos, m.nEos, m.payloadBytes, m.maxGranule,
        UTF8String.fromString(m.codec)))
    }
  override protected def withNewChildInternal(newChild: Expression): OggMeta =
    copy(child = newChild)
  override def prettyName: String = "ogg_meta"
}

/** `synth_ogg(id, corrupt)` per [[Ogg.synth]]. */
case class SynthOgg(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (LongType, BooleanType) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"synth_ogg expects (long, boolean), got $other")
  }
  override def nullSafeEval(id: Any, c: Any): Any =
    Ogg.synth(id.asInstanceOf[Long], c.asInstanceOf[Boolean])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SynthOgg = copy(left = l, right = r)
  override def prettyName: String = "synth_ogg"
}

object ogg {
  def ogg_meta(blob: Column): Column =
    ColumnBridge.column(OggMeta(ColumnBridge.expression(blob)))
  def synth_ogg(id: Column, corrupt: Column): Column =
    ColumnBridge.column(SynthOgg(ColumnBridge.expression(id),
      ColumnBridge.expression(corrupt)))
}
