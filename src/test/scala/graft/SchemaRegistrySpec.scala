package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.avro.{AvroOcf, SchemaRegistryResolver, StaticSchemaRegistry}
import graft.model.Schemas

/** Companion-object counter so every closure-serialized copy of the
  * resolver in local mode reports into one place. */
object CountingRegistry {
  val hits = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** A resolver that counts lookups — the test double for a live
  * Schema Registry client, where each `resolve` is an HTTP fetch. */
final case class CountingRegistry(byId: Map[Int, String])
    extends SchemaRegistryResolver {
  override def resolve(id: Int): Option[String] = {
    CountingRegistry.hits.incrementAndGet()
    byId.get(id)
  }
}

/** The schema-registry seam ([[graft.avro.SchemaRegistryResolver]]):
  * where a live Confluent registry client plugs into
  * `from_avro_confluent`. Pins the contract a live implementation
  * relies on: plug-in decode through ANY resolver, positive lookups
  * cached per (expression-instance, id) so a live client pays one
  * fetch per new id, and unknown ids re-resolved per call (a live
  * negative lookup must retry — the id may be registered seconds
  * later) while still yielding null rows, never failures. */
class SchemaRegistrySpec extends SparkSpec {
  import spark.implicits._
  import graft.avro.functions.{from_avro_confluent, to_avro_confluent}

  private val schema = new org.apache.avro.Schema.Parser().parse(Schemas.orderAvroJson)

  test("StaticSchemaRegistry resolves known ids, None for unknown") {
    val r = StaticSchemaRegistry(Map(7 -> Schemas.orderAvroJson))
    assert(r.resolve(7) === Some(Schemas.orderAvroJson))
    assert(r.resolve(8) === None)
  }

  test("decode works through a custom resolver implementation (the live-client seam)") {
    CountingRegistry.hits.set(0)
    val df = Seq(("c-1", "Widget", 3.5f)).toDF("orderId", "product", "price")
    val out = df.select(from_avro_confluent(
        to_avro_confluent(struct($"orderId", $"product", $"price"),
          Schemas.orderAvroJson, 42),
        Schemas.orderAvroJson,
        CountingRegistry(Map(42 -> Schemas.orderAvroJson))).as("d"))
      .select($"d.orderId", $"d.product", $"d.price")
      .head()
    assert(out === Row("c-1", "Widget", 3.5f))
    assert(CountingRegistry.hits.get() >= 1)
  }

  test("positive lookups are cached: many rows, one id, one partition -> one resolve") {
    CountingRegistry.hits.set(0)
    val df = (1 to 200).map(i => (s"o-$i", "P", i.toFloat))
      .toDF("orderId", "product", "price")
      .repartition(1) // one task = one deserialized expression instance
    val n = df.select(from_avro_confluent(
        to_avro_confluent(struct($"orderId", $"product", $"price"),
          Schemas.orderAvroJson, 5),
        Schemas.orderAvroJson,
        CountingRegistry(Map(5 -> Schemas.orderAvroJson))).as("d"))
      .filter($"d".isNotNull).count()
    assert(n === 200)
    // one resolve per expression INSTANCE, not per row: the identity
    // cache a live client's fee structure depends on
    assert(CountingRegistry.hits.get() === 1,
      s"expected 1 cached resolve for 200 rows, saw ${CountingRegistry.hits.get()}")
  }

  test("unknown ids yield null rows and re-resolve per call (live negative lookup)") {
    CountingRegistry.hits.set(0)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("x"),
      org.apache.spark.unsafe.types.UTF8String.fromString("y"), 1.0f)
    val framed = AvroOcf.encodeConfluentRow(row, Schemas.order, schema, 99)
    val df = (1 to 10).map(_ => framed).toDF("value").repartition(1)
    val out = df.select(from_avro_confluent($"value", Schemas.orderAvroJson,
      CountingRegistry(Map(5 -> Schemas.orderAvroJson))).as("o"))
    assert(out.collect().forall(_.isNullAt(0)))
    // misses are NOT negatively cached: each row retries, because on a
    // live topic the id usually appears in the registry moments later
    assert(CountingRegistry.hits.get() === 10,
      s"expected 10 uncached misses, saw ${CountingRegistry.hits.get()}")
  }
}
