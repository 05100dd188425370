package graft

import org.apache.avro.Schema
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.avro.{AvroOcf, functions => A}
import graft.model.Schemas

/** The custom OCF codec kernel (SURVEY.md §2.1 S2/S5): round-trip
  * identity, PERMISSIVE decode failure, single-record framing. */
class AvroCodecSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new Schema.Parser().parse(Schemas.orderAvroJson)

  test("round-trip identity on fixture orders") {
    val orders = Seq(("a-1", "Widget A", 4.99f), ("b-2", "Widget B", 1000.01f),
      ("c-3", "Ünïcødé", 0.0f), ("d-4", "x", Float.MaxValue))
    val df = orders.toDF("orderId", "product", "price")
    val back = df.select(
      A.from_avro_ocf(
        A.to_avro_ocf(struct($"orderId", $"product", $"price"), Schemas.orderAvroJson),
        Schemas.orderAvroJson).as("o"))
      .select($"o.orderId", $"o.product", $"o.price")
    assert(back.collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getFloat(2)))
      === orders)
  }

  test("property: round-trip is the identity for arbitrary orders") {
    val genOrder = for {
      id <- Gen.identifier
      product <- Gen.alphaNumStr
      price <- Gen.chooseNum(-1500.0f, 1500.0f)
    } yield (id, product, price)
    val prop = Prop.forAll(genOrder) { case (id, product, price) =>
      val bytes = AvroOcf.encodeRow(
        org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(id),
          org.apache.spark.unsafe.types.UTF8String.fromString(product),
          price),
        Schemas.order, schema)
      val row = AvroOcf.decodeRow(bytes, Schemas.order, schema)
      // OCF magic per producer.py framing (Obj\x01)
      bytes(0) == 'O'.toByte && bytes(1) == 'b'.toByte && bytes(2) == 'j'.toByte &&
        row.getUTF8String(0).toString == id &&
        row.getUTF8String(1).toString == product &&
        row.getFloat(2) == price
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("fast-path encode is byte-identical to DataFileWriter output") {
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("pin-1"),
      org.apache.spark.unsafe.types.UTF8String.fromString("Pinned"), 42.5f)
    val fast = AvroOcf.encodeRow(row, Schemas.order, schema)
    // reference form: DataFileWriter with the same deterministic sync
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(schema.toString.getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, out, sync)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put(0, "pin-1"); rec.put(1, "Pinned"); rec.put(2, 42.5f)
    w.append(rec); w.close()
    assert(fast.toSeq === out.toByteArray.toSeq)
  }

  test("encode is deterministic (fixed sync marker)") {
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("id"),
      org.apache.spark.unsafe.types.UTF8String.fromString("p"), 1.5f)
    val a = AvroOcf.encodeRow(row, Schemas.order, schema)
    val b = AvroOcf.encodeRow(row, Schemas.order, schema)
    assert(a.toSeq === b.toSeq)
  }

  test("multi-record container decodes to the FIRST record (consumer.py:60-65)") {
    val out = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, out)
    Seq(("first", "P1", 1.0f), ("second", "P2", 2.0f)).foreach { case (id, p, pr) =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put(0, id); rec.put(1, p); rec.put(2, pr)
      w.append(rec)
    }
    w.close()
    val row = AvroOcf.decodeRow(out.toByteArray, Schemas.order, schema)
    assert(row.getUTF8String(0).toString === "first")
  }

  test("malformed bytes decode to null (PERMISSIVE -> DLQ route)") {
    val df = Seq(Array[Byte](1, 2, 3), "Obj garbage".getBytes).toDF("value")
    val out = df.select(A.from_avro_ocf($"value", Schemas.orderAvroJson).as("o"))
    assert(out.collect().forall(_.isNullAt(0)))
  }

  test("null input decodes to null") {
    val df = Seq(Option.empty[Array[Byte]]).toDF("value")
    val out = df.select(A.from_avro_ocf($"value", Schemas.orderAvroJson).as("o"))
    assert(out.collect().forall(_.isNullAt(0)))
  }

  test("SQL registration works") {
    A.register(spark)
    Seq(("i-9", "Prod", 9.5f)).toDF("orderId", "product", "price")
      .createOrReplaceTempView("codec_in")
    val got = spark.sql(
      s"""SELECT from_avro_ocf(to_avro_ocf(struct(orderId, product, price),
         |  '${Schemas.orderAvroJson}'), '${Schemas.orderAvroJson}').price AS p
         |FROM codec_in""".stripMargin).collect()
    assert(got.head.getFloat(0) === 9.5f)
  }

  test("property: raw-datum round-trip is the identity, datum is the OCF payload") {
    val genOrder = for {
      id <- Gen.identifier
      product <- Gen.alphaNumStr
      price <- Gen.chooseNum(-1500.0f, 1500.0f)
    } yield (id, product, price)
    val prop = Prop.forAll(genOrder) { case (id, product, price) =>
      val row = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(id),
        org.apache.spark.unsafe.types.UTF8String.fromString(product),
        price)
      val datum = AvroOcf.encodeDatumRow(row, Schemas.order, schema)
      val back = AvroOcf.decodeDatumRow(datum, Schemas.order, schema)
      val ocf = AvroOcf.encodeRow(row, Schemas.order, schema)
      // the raw datum is byte-identical to the OCF's payload slice
      // (header .. sync), i.e. the framing carries ONLY overhead
      val payload = ocf.slice(ocf.length - 16 - datum.length, ocf.length - 16)
      back.getUTF8String(0).toString == id &&
        back.getUTF8String(1).toString == product &&
        back.getFloat(2) == price &&
        payload.sameElements(datum) &&
        ocf.length - datum.length > 200 // recovered framing overhead
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("raw-datum malformed/truncated bytes decode to null (PERMISSIVE)") {
    val good = AvroOcf.encodeDatumRow(
      org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString("id-1"),
        org.apache.spark.unsafe.types.UTF8String.fromString("Prod"), 2.5f),
      Schemas.order, schema)
    val df = Seq(good.take(3), Array[Byte](127, 127, 127)).toDF("value")
    val out = df.select(A.from_avro_datum($"value", Schemas.orderAvroJson).as("o"))
    assert(out.collect().forall(_.isNullAt(0)))
  }

  test("raw-datum SQL registration works") {
    A.register(spark)
    Seq(("i-9", "Prod", 9.5f)).toDF("orderId", "product", "price")
      .createOrReplaceTempView("datum_in")
    val got = spark.sql(
      s"""SELECT from_avro_datum(to_avro_datum(struct(orderId, product, price),
         |  '${Schemas.orderAvroJson}'), '${Schemas.orderAvroJson}').price AS p,
         |  octet_length(to_avro_datum(struct(orderId, product, price),
         |  '${Schemas.orderAvroJson}')) AS n
         |FROM datum_in""".stripMargin).collect()
    assert(got.head.getFloat(0) === 9.5f)
    assert(got.head.getInt(1) === 1 + 3 + 1 + 4 + 4) // varint+id, varint+product, float
  }
}
