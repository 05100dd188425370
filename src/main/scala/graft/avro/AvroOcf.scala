package graft.avro

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro **Object Container File** codec for single-record messages.
  *
  * The reference frames every Kafka message as a complete Avro OCF —
  * magic `Obj\x01`, embedded writer schema, sync markers — holding exactly
  * one record (producer.py:36-48 `writer(bytes, schema, [record])`;
  * consumer.py:50-65 reads the first record back). This is NOT the
  * Confluent wire format and NOT spark-avro's raw-datum framing, so even
  * if the `spark-avro` connector were present (it is not in this
  * environment), its `from_avro`/`to_avro` could not decode these bytes.
  * Hence this hand-rolled codec on the core `org.apache.avro` generic API
  * (avro-1.12.1 ships with Spark).
  *
  * Design notes for scale:
  *  - `Schema` is not serialization-friendly; expressions carry the JSON
  *    string and parse lazily per executor (SURVEY.md §1.2).
  *  - The sync marker is derived deterministically from the schema
  *    fingerprint instead of `DataFileWriter`'s random marker, so encode
  *    output is a pure function of its input (required for the driver's
  *    DuckDB-oracle hash compare and for replay-idempotent sinks).
  *  - OCF-per-message embeds the schema in every message (~200-300 B
  *    overhead, SURVEY.md §6) — faithful to the reference; a raw-datum
  *    mode would be the scale optimization once framing is negotiable.
  */
object AvroOcf {

  /** Deterministic 16-byte sync marker from the schema fingerprint. */
  private def syncFor(schema: Schema): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(schema.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Container header (magic + metadata + sync) for a schema — byte-
    * identical for every message of that schema, so it is built once
    * and prepended, instead of re-serializing the schema JSON and
    * re-hashing the sync marker per record (which dominated codec
    * cost: the OCF-per-message framing overhead of SURVEY.md §6). */
  private val headerCache = new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], Array[Byte])]()

  /** Public so the codec expressions can resolve the header ONCE per
    * operator instance (Schema.toString is uncached in Avro 1.12, so a
    * per-record map lookup keyed on it would still re-serialize the
    * schema JSON every row). */
  def headerAndSync(schema: Schema): (Array[Byte], Array[Byte]) =
    headerCache.computeIfAbsent(schema.toString, _ => {
      val sync = syncFor(schema)
      val out = new ByteArrayOutputStream(256)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out, sync)
      w.close() // zero records appended -> header bytes only
      (out.toByteArray, sync)
    })

  private def startsWith(bytes: Array[Byte], prefix: Array[Byte]): Boolean = {
    if (bytes.length < prefix.length) return false
    var i = 0
    while (i < prefix.length) { if (bytes(i) != prefix(i)) return false; i += 1 }
    true
  }

  /** Spark type for a (possibly nullable-union) flat Avro record. */
  def sparkTypeFor(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"expected record, got $schema")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = fieldType(f.schema())
      StructField(f.name(), t, nullable)
    })
  }

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported: $s")
      (fieldType(nonNull.head)._1, true)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  /** One InternalRow -> OCF bytes holding exactly one record. */
  def encodeRow(row: InternalRow, sparkType: StructType, schema: Schema): Array[Byte] =
    encodeRow(row, sparkType, schema, headerAndSync(schema))

  private def toRecord(row: InternalRow, sparkType: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < sparkType.length) {
      val field = sparkType(i)
      val v =
        if (row.isNullAt(i)) null
        else field.dataType match {
          case StringType => row.getUTF8String(i).toString
          case FloatType  => java.lang.Float.valueOf(row.getFloat(i))
          case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
          case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
          case LongType   => java.lang.Long.valueOf(row.getLong(i))
          case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
          case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
          case other => throw new IllegalArgumentException(s"unsupported $other")
        }
      rec.put(i, v)
      i += 1
    }
    rec
  }

  /** One InternalRow -> RAW Avro datum bytes (binary encoding, NO
    * container framing). The scale mode of SURVEY §7.3: the OCF frame
    * embeds the writer schema + sync in EVERY message (~250 B for the
    * 3-field order record whose datum is ~20 B) — when both ends agree
    * on the schema out-of-band, the raw datum recovers that overhead.
    * The payload is the byte-identical datum block an OCF message
    * carries between header and sync. */
  def encodeDatumRow(row: InternalRow, sparkType: StructType, schema: Schema): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    val enc = org.apache.avro.io.EncoderFactory.get().directBinaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(toRecord(row, sparkType, schema), enc)
    enc.flush()
    out.toByteArray
  }

  /** RAW datum bytes -> InternalRow. Throws on malformed input; callers
    * choose null-on-error (PERMISSIVE). */
  def decodeDatumRow(bytes: Array[Byte], sparkType: StructType, readerSchema: Schema): InternalRow = {
    val dec = org.apache.avro.io.DecoderFactory.get()
      .binaryDecoder(bytes, 0, bytes.length, null)
    val rec = new GenericDatumReader[GenericRecord](readerSchema).read(null, dec)
    recordToRow(rec, sparkType)
  }

  def encodeRow(row: InternalRow, sparkType: StructType, schema: Schema,
      hs: (Array[Byte], Array[Byte])): Array[Byte] = {
    val rec = toRecord(row, sparkType, schema)
    // fast path equivalent to DataFileWriter.create+append+close with a
    // fixed sync marker: cached header ++ one data block
    // (zigzag-varint count=1, size, datum bytes, sync) — byte-identical
    // output, verified against the DataFileWriter form in tests
    val (header, sync) = hs
    val datumOut = new ByteArrayOutputStream(64)
    val enc = org.apache.avro.io.EncoderFactory.get().directBinaryEncoder(datumOut, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val datum = datumOut.toByteArray
    val out = new ByteArrayOutputStream(header.length + datum.length + 24)
    out.write(header)
    val blockEnc = org.apache.avro.io.EncoderFactory.get().directBinaryEncoder(out, null)
    blockEnc.writeLong(1L)
    blockEnc.writeLong(datum.length.toLong)
    blockEnc.flush()
    out.write(datum)
    out.write(sync)
    out.toByteArray
  }

  /** OCF bytes -> InternalRow of the FIRST record (consumer.py:60-65
    * returns only the first record of the container). Throws on
    * malformed input; callers choose null-on-error (PERMISSIVE). */
  def decodeRow(bytes: Array[Byte], sparkType: StructType, readerSchema: Schema): InternalRow =
    decodeRow(bytes, sparkType, readerSchema, headerAndSync(readerSchema))

  def decodeRow(bytes: Array[Byte], sparkType: StructType, readerSchema: Schema,
      hs: (Array[Byte], Array[Byte])): InternalRow = {
    // fast path: a container we encoded ourselves (identical header incl
    // deterministic sync) — decode the first datum directly, skipping the
    // per-message header schema-JSON parse. Foreign containers (other
    // sync markers, codecs, writer schemas) take the generic path below.
    val (header, _) = hs
    if (startsWith(bytes, header) && bytes.length > header.length) {
      val dec = org.apache.avro.io.DecoderFactory.get()
        .binaryDecoder(bytes, header.length, bytes.length - header.length, null)
      val count = dec.readLong()
      dec.readLong() // block byte size
      if (count >= 1) {
        val rec = new GenericDatumReader[GenericRecord](readerSchema).read(null, dec)
        return recordToRow(rec, sparkType)
      }
    }
    val in = new DataFileStream[GenericRecord](
      new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord](readerSchema))
    try {
      if (!in.hasNext) throw new IllegalArgumentException("empty avro container")
      val rec = in.next()
      recordToRow(rec, sparkType)
    } finally in.close()
  }

  private def recordToRow(rec: GenericRecord, sparkType: StructType): InternalRow = {
      val vals = new Array[Any](sparkType.length)
      var i = 0
      while (i < sparkType.length) {
        val v = rec.get(i)
        vals(i) = v match {
          case null => null
          case u: Utf8 => UTF8String.fromString(u.toString)
          case s: String => UTF8String.fromString(s)
          case f: java.lang.Float => f.floatValue()
          case d: java.lang.Double => d.doubleValue()
          case n: java.lang.Integer => n.intValue()
          case l: java.lang.Long => l.longValue()
          case b: java.lang.Boolean => b.booleanValue()
          case bb: java.nio.ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case other => throw new IllegalArgumentException(s"unsupported value $other")
        }
        i += 1
      }
      new GenericInternalRow(vals)
  }
}
