package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The synthetic order generator as a REAL DataSourceV2 table — the
  * Spark source API surface (SURVEY.md §2.1): a `TableProvider` whose
  * scan plans `numPartitions` independent index ranges (each executor
  * generates its slice — no driver loop, no data movement) and honors
  * COLUMN PRUNING via SupportsPushDownRequiredColumns, so
  * `select(product)` never computes order ids or prices.
  *
  * Usage: spark.read.format("graft.sources.OrdersSource")
  *   .option("rows", n).option("seed", s).option("numPartitions", p)
  *   .load()
  *
  * Row content is bit-identical to OrderGen.orders(spark, rows, seed)
  * (same md5-of-"seed|i" derivations, producer.py:118-145 semantics),
  * so the DuckDB oracle replays it symbolically — OrdersSourceSpec and
  * q_source_v2 pin the equivalence. */
class OrdersSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (OrdersSource.isEnvelope(options.getOrDefault("mode", "orders")))
      graft.model.Schemas.envelope
    else OrdersSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    // properties arrive in the caller's original case — normalize
    val opts = new CaseInsensitiveStringMap(properties)
    val rows = opts.getLong("rows", 1000L)
    val parts = opts.getInt("numPartitions", 4)
    // fail at table resolution with the option named — numPartitions=0
    // would otherwise die later with a bare '/ by zero' at plan time,
    // and a NEGATIVE value would silently plan one InputPartition per
    // row (a task per row and a driver-sized partition array)
    require(rows >= 0, s"option rows must be >= 0, got $rows")
    require(parts > 0, s"option numPartitions must be positive, got $parts")
    new OrdersSource.OrdersTable(
      rows,
      opts.getOrDefault("seed", "dsv2"),
      parts,
      OrdersSource.isEnvelope(opts.getOrDefault("mode", "orders")))
  }
}

object OrdersSource {

  val Schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("order_id", StringType, nullable = false),
    StructField("product", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false)))

  private[sources] def isEnvelope(mode: String): Boolean =
    mode.equalsIgnoreCase("envelope")

  private[sources] class OrdersTable(rows: Long, seed: String, parts: Int,
      envelope: Boolean) extends Table with SupportsRead {
    override def name(): String = s"graft_orders(rows=$rows, seed=$seed)"
    override def schema(): StructType =
      if (envelope) graft.model.Schemas.envelope else Schema
    override def capabilities(): java.util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new OrdersScanBuilder(rows, seed, parts,
        options.getLong("rowsPerBatch", 100L), envelope, schema())
  }

  private class OrdersScanBuilder(rows: Long, seed: String, parts: Int,
      rowsPerBatch: Long, envelope: Boolean, full: StructType)
      extends ScanBuilder with SupportsPushDownRequiredColumns {
    private var required: StructType = full
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def build(): Scan =
      new OrdersScan(rows, seed, parts, rowsPerBatch, envelope, required)
  }

  private class OrdersScan(rows: Long, seed: String, parts: Int,
      rowsPerBatch: Long, envelope: Boolean, required: StructType)
      extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      rangePartitions(0L, rows)
    private def rangePartitions(lo: Long, hi: Long): Array[InputPartition] = {
      val n = hi - lo
      val per = math.max(1L, (n + parts - 1) / parts)
      (lo until hi by per)
        .map(s => OrdersRange(s, math.min(s + per, hi)): InputPartition)
        .toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new OrdersReaderFactory(seed, required.fieldNames, envelope)

    /** Streaming form: the order index IS the offset (replayable from
      * any committed position — the at-least-once seam the reference's
      * manual commit provides). Rate limiting goes through
      * SupportsAdmissionControl (latestOffset advances at most
      * rowsPerBatch past the committed start) — capping inside
      * planInputPartitions instead would silently skip the rows
      * between the cap and the offset Spark commits. A restarted query
      * re-plans identical index ranges for identical offsets, so
      * replay is exact. */
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new MicroBatchStream with SupportsTriggerAvailableNow {
        private def off(v: Long): Offset = new Offset {
          override def json(): String = v.toString
        }
        // the drain target is the table's fixed bound, known up front —
        // Trigger.AvailableNow keeps firing rate-limited batches until
        // the committed offset reaches it
        override def prepareForTriggerAvailableNow(): Unit = ()
        override def initialOffset(): Offset = off(0L)
        override def latestOffset(): Offset =
          throw new UnsupportedOperationException(
            "admission-controlled source: latestOffset(start, limit) is used")
        override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
        override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
          val lo = start.json().toLong
          // honor the EXECUTION's read limit, not just our default:
          // Trigger.Once passes ReadAllAvailable (and logs that the
          // source's own limit is ignored) — answering with
          // rowsPerBatch there would let the single batch complete
          // "successfully" having silently dropped every later row
          def cap(l: ReadLimit): Long = l match {
            case m: ReadMaxRows => m.maxRows()
            case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable =>
              rows
            case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
              c.getReadLimits.map(cap).min
            case _ => rowsPerBatch
          }
          off(math.min(lo + cap(limit), rows))
        }
        override def reportLatestOffset(): Offset = off(rows)
        override def deserializeOffset(json: String): Offset = off(json.toLong)
        override def commit(end: Offset): Unit = ()
        override def stop(): Unit = ()
        override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
          rangePartitions(start.json().toLong, end.json().toLong)
        override def createReaderFactory(): PartitionReaderFactory =
          new OrdersReaderFactory(seed, required.fieldNames, envelope)
      }
  }

  private case class OrdersRange(start: Long, end: Long) extends InputPartition

  /** The generator contract, factored once: every field both reader
    * modes emit derives from the md5("seed|i") hex digest through
    * exactly these formulas (byte-identical to OrderGen.orders and its
    * symbolic DuckDB oracle). Kept per-field so the pruned batch reader
    * still skips the fields it doesn't need. */
  private object Derive {
    def orderId(h: String): String =
      s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
        s"${h.substring(16, 20)}-${h.substring(20, 32)}"
    def product(h: String): String = {
      val w1 = (java.lang.Long.parseLong(h.substring(0, 4), 16) %
        OrderGen.Words.length).toInt
      val w2 = (java.lang.Long.parseLong(h.substring(4, 8), 16) %
        OrderGen.Words.length).toInt
      s"${OrderGen.Words(w1)} ${OrderGen.Words(w2)}"
    }
    def price(h: String): Double =
      (java.lang.Long.parseLong(h.substring(8, 16), 16) % 149501L + 500L) / 100.0
  }

  private class OrdersReaderFactory(seed: String, fields: Array[String],
      envelope: Boolean) extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val r = partition.asInstanceOf[OrdersRange]
      if (envelope) new EnvelopeReader(r.start, r.end, seed, fields)
      else new OrdersReader(r.start, r.end, seed, fields)
    }
  }

  /** Envelope mode: Kafka-shaped rows with REAL Avro OCF payload bytes
    * (key = UTF-8 order id, value = one-record OCF, offset = index,
    * epoch-anchored timestamps) — byte-identical to
    * OrderGen.toEnvelopes, so the connector is a drop-in for the
    * topic-dir transport seam the reference's Kafka broker occupies.
    * The Avro schema is parsed per reader (Schema is not
    * serialization-friendly; the JSON string is the contract). */
  private class EnvelopeReader(start: Long, end: Long, seed: String,
      fields: Array[String]) extends PartitionReader[InternalRow] {
    private var i = start - 1
    private val digest = java.security.MessageDigest.getInstance("MD5")
    private val avroSchema = new org.apache.avro.Schema.Parser()
      .parse(graft.model.Schemas.orderAvroJson)
    // header + sync resolved once per reader — the per-record 3-arg
    // encodeRow would re-serialize the schema JSON for every row
    // (AvroOcf.scala:55-58)
    private val hs = graft.avro.AvroOcf.headerAndSync(avroSchema)
    private val emptyHeaders =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])

    override def next(): Boolean = { i += 1; i < end }

    override def get(): InternalRow = {
      val h = digest.digest(s"$seed|$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      lazy val orderId = Derive.orderId(h)
      val values: Array[Any] = fields.map {
        case "key" => orderId.getBytes("UTF-8")
        case "value" =>
          val order = InternalRow(
            UTF8String.fromString(orderId),
            UTF8String.fromString(Derive.product(h)),
            Derive.price(h).toFloat)
          graft.avro.AvroOcf.encodeRow(order, graft.model.Schemas.order, avroSchema, hs)
        case "topic" => UTF8String.fromString(graft.model.Schemas.OrdersTopic)
        case "partition" => 0
        case "offset" => i
        case "timestamp" => (1700000000L + i) * 1000000L // µs, epoch-anchored
        case "headers" => emptyHeaders
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      InternalRow.fromSeq(values.toIndexedSeq)
    }

    override def close(): Unit = ()
  }

  /** Per-partition generator: the same md5("seed|i") field derivations
    * as OrderGen.orders, evaluated only for the PRUNED columns. */
  private class OrdersReader(start: Long, end: Long, seed: String,
      fields: Array[String]) extends PartitionReader[InternalRow] {
    private var i = start - 1
    private val digest = java.security.MessageDigest.getInstance("MD5")

    override def next(): Boolean = { i += 1; i < end }

    override def get(): InternalRow = {
      // lowercase hex md5 of "seed|i" — identical to functions.md5
      val h = digest.digest(s"$seed|$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val values: Array[Any] = fields.map {
        case "seq" => i
        case "order_id" => UTF8String.fromString(Derive.orderId(h))
        case "product" => UTF8String.fromString(Derive.product(h))
        case "price" => Derive.price(h)
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      InternalRow.fromSeq(values.toIndexedSeq)
    }

    override def close(): Unit = ()
  }
}
