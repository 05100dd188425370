package graft.model

import org.apache.spark.sql.types._

/** Core payload record of the reference engine.
  *
  * Mirrors `order.avsc:2-18` (`com.assignment.Order`): the single
  * fixed-schema record type shared by producer and consumer. `price` is
  * single-precision at the codec boundary (order.avsc:16) and widened to
  * double for aggregation, matching fastavro's decode-to-Python-float
  * behavior (SURVEY.md §1.1).
  */
final case class Order(orderId: String, product: String, price: Float)

/** One Kafka-style message header: `(String, bytes)` (consumer.py:90-96). */
final case class Header(key: String, value: Array[Byte])

/** Kafka-shaped message envelope (consumer.py:231-235, producer.py:140).
  *
  * Field names and types mirror the Kafka source schema of Spark's
  * `spark-sql-kafka` connector so a real Kafka source can be dropped in
  * later without touching downstream operators (SURVEY.md §1.2). The
  * connector jar is absent in this environment, so envelopes are produced
  * by the file/memory sources in [[graft.stream.OrderPipeline]].
  */
final case class Envelope(
    key: Array[Byte],
    value: Array[Byte],
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: java.sql.Timestamp,
    headers: Seq[Header])

object Schemas {

  /** StructType mirror of order.avsc. */
  val order: StructType = StructType(Seq(
    StructField("orderId", StringType, nullable = false),
    StructField("product", StringType, nullable = false),
    StructField("price", FloatType, nullable = false)))

  /** Avro schema JSON — single source of truth for the codec layer.
    * Matches order.avsc byte-for-byte in semantics (record name,
    * namespace, field order and types). */
  val orderAvroJson: String =
    """{"type":"record","namespace":"com.assignment","name":"Order","fields":[
      |{"name":"orderId","type":"string"},
      |{"name":"product","type":"string"},
      |{"name":"price","type":"float"}]}""".stripMargin.replace("\n", "")

  /** Enriched-order Avro schema exercising the FULL type lattice the
    * codec supports (the shape a real-world payload takes once it
    * outgrows order.avsc's three primitives): nested record, array of
    * records, array of strings, string-keyed map, enum, fixed, bytes
    * decimal logical type, date, timestamp-micros and -millis, and a
    * `[null, T]` union. */
  val richOrderAvroJson: String =
    """{"type":"record","namespace":"com.assignment","name":"RichOrder","fields":[
      |{"name":"id","type":"string"},
      |{"name":"status","type":{"type":"enum","name":"Status","symbols":["O","F","P"]}},
      |{"name":"amount","type":{"type":"bytes","logicalType":"decimal","precision":12,"scale":2}},
      |{"name":"created","type":{"type":"long","logicalType":"timestamp-micros"}},
      |{"name":"updated","type":{"type":"long","logicalType":"timestamp-millis"}},
      |{"name":"day","type":{"type":"int","logicalType":"date"}},
      |{"name":"checksum","type":{"type":"fixed","name":"Chk","size":4}},
      |{"name":"tags","type":{"type":"array","items":"string"}},
      |{"name":"attrs","type":{"type":"map","values":"long"}},
      |{"name":"ship","type":{"type":"record","name":"Addr","fields":[
      |{"name":"city","type":"string"},
      |{"name":"zip","type":["null","string"],"default":null}]}},
      |{"name":"lines","type":{"type":"array","items":{"type":"record","name":"Line","fields":[
      |{"name":"sku","type":"string"},
      |{"name":"n","type":"long"}]}}},
      |{"name":"note","type":["null","string"],"default":null}]}"""
      .stripMargin.replace("\n", "")

  /** Envelope schema (the Kafka source shape, SURVEY.md §1.2). */
  val envelope: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  /** Topic names of the reference deployment (producer.py:112,
    * consumer.py:40). */
  val OrdersTopic = "orders"
  val DlqTopic = "orders-dlq"
}
