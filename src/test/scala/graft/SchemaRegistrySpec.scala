package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.avro.{AvroOcf, RetryingSchemaRegistry, SchemaRegistryResolver, StaticSchemaRegistry}
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

  test("positive cache under CONCURRENT partitions: 32 tasks, one id -> " +
    "resolve count bounded by task concurrency (not rows), no torn state") {
    // round-9 verdict #6: the one-partition case pins one-resolve-per-
    // instance; this pins the MULTI-partition shape a real executor
    // runs. SlowRegistry sleeps inside resolve to hold the stampede
    // window open across all 32 local[32] task threads at once — the
    // worst case for a putIfAbsent cache (every thread misses before
    // any thread publishes). Safety claim: the cache may admit up to
    // one resolve per concurrent task (bounded, fee-equivalent to the
    // official client's per-thread warmup), NEVER one per row; and
    // concurrent putIfAbsent publication is never torn — every one of
    // the 6,400 rows decodes to its exact value.
    SlowRegistry.calls.set(0)
    val df = (1 to 6400).map(i => (s"o-$i", s"P-$i", i.toFloat))
      .toDF("orderId", "product", "price")
      .repartition(32)
    val out = df.select(from_avro_confluent(
        to_avro_confluent(struct($"orderId", $"product", $"price"),
          Schemas.orderAvroJson, 9),
        Schemas.orderAvroJson,
        SlowRegistry(Map(9 -> Schemas.orderAvroJson))).as("d"))
      .select($"d.orderId", $"d.product", $"d.price")
      .collect()
    assert(out.length === 6400)
    // no torn state: every row's fields survive the concurrent decode
    val byId = out.map(r => (r.getString(0), (r.getString(1), r.getFloat(2)))).toMap
    for (i <- 1 to 6400)
      assert(byId(s"o-$i") === ((s"P-$i", i.toFloat)), s"row $i")
    val calls = SlowRegistry.calls.get()
    assert(calls >= 1 && calls <= 32,
      s"resolve count must be bounded by the 32 concurrent tasks, saw $calls")
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

  test("eventual-resolve: an id REGISTERED BETWEEN BATCHES starts decoding " +
    "(the 'seconds later' race, end to end)") {
    // batch 1: id 77 unknown -> every row null (DLQ-routable), no
    // failure; then the "producer's new version lands in the registry";
    // batch 2 through the SAME resolver type decodes — possible only
    // because misses are never negatively cached
    EventualRegistry.registered.set(false)
    EventualRegistry.calls.set(0)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("late"),
      org.apache.spark.unsafe.types.UTF8String.fromString("Reg"), 2.5f)
    val framed = AvroOcf.encodeConfluentRow(row, Schemas.order, schema, 77)
    val df = (1 to 5).map(_ => framed).toDF("value").repartition(1)
    def decoded() = df.select(from_avro_confluent($"value",
      Schemas.orderAvroJson, EventualRegistry(77)).as("o"))
    assert(decoded().collect().forall(_.isNullAt(0)),
      "rows must be null (not failures) while the id is unregistered")
    EventualRegistry.registered.set(true) // registration lands
    val out = decoded().select($"o.orderId", $"o.product", $"o.price").collect()
    assert(out.forall(_ === Row("late", "Reg", 2.5f)),
      "the same id must decode once registered — no sticky negative cache")
  }

  test("RetryingSchemaRegistry: transport failures retry, then succeed") {
    FlakyRegistry.failuresLeft.set(2)
    FlakyRegistry.calls.set(0)
    val r = RetryingSchemaRegistry(
      FlakyRegistry(Map(3 -> Schemas.orderAvroJson)), attempts = 3, backoffMs = 0)
    assert(r.resolve(3) === Some(Schemas.orderAvroJson))
    assert(FlakyRegistry.calls.get() === 3, "two failures + one success = 3 calls")
  }

  test("RetryingSchemaRegistry: an authoritative miss is NOT retried") {
    FlakyRegistry.failuresLeft.set(0)
    FlakyRegistry.calls.set(0)
    val r = RetryingSchemaRegistry(
      FlakyRegistry(Map(3 -> Schemas.orderAvroJson)), attempts = 5, backoffMs = 0)
    // the registry ANSWERED "no such id": retrying would just hammer it;
    // the per-row re-ask contract above handles late registration
    assert(r.resolve(99) === None)
    assert(FlakyRegistry.calls.get() === 1, "a miss must consume exactly one call")
  }

  test("RetryingSchemaRegistry: an exhausted budget propagates the failure " +
    "(outage must not mis-route rows to the DLQ as 'unknown schema')") {
    FlakyRegistry.failuresLeft.set(10)
    FlakyRegistry.calls.set(0)
    val r = RetryingSchemaRegistry(
      FlakyRegistry(Map(3 -> Schemas.orderAvroJson)), attempts = 3, backoffMs = 0)
    val e = intercept[RuntimeException](r.resolve(3))
    assert(e.getMessage.contains("registry unreachable"))
    assert(FlakyRegistry.calls.get() === 3, "exactly `attempts` calls before giving up")
  }

  test("decode through a flaky-but-recovering live client: rows decode, " +
    "nothing lands in the DLQ") {
    FlakyRegistry.failuresLeft.set(2) // first two fetches fail, then healthy
    FlakyRegistry.calls.set(0)
    val df = (1 to 50).map(i => (s"f-$i", "Q", i.toFloat))
      .toDF("orderId", "product", "price").repartition(1)
    val n = df.select(from_avro_confluent(
        to_avro_confluent(struct($"orderId", $"product", $"price"),
          Schemas.orderAvroJson, 8),
        Schemas.orderAvroJson,
        RetryingSchemaRegistry(FlakyRegistry(Map(8 -> Schemas.orderAvroJson)),
          attempts = 3, backoffMs = 0)).as("d"))
      .filter($"d".isNotNull).count()
    assert(n === 50, "every row must decode once the transport recovers")
    // 2 failed + 1 successful fetch, then the identity cache holds
    assert(FlakyRegistry.calls.get() === 3,
      s"expected 3 transport calls for 50 rows, saw ${FlakyRegistry.calls.get()}")
  }
}

/** Companion-object state so closure-serialized copies in local mode
  * share one view (the CountingRegistry discipline). */
object EventualRegistry {
  val registered = new java.util.concurrent.atomic.AtomicBoolean(false)
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** A registry where the id is UNREGISTERED until the flag flips — the
  * producer-deploys-mid-batch race from the FromAvroConfluent doc. */
final case class EventualRegistry(knownId: Int) extends SchemaRegistryResolver {
  override def resolve(id: Int): Option[String] = {
    EventualRegistry.calls.incrementAndGet()
    if (id == knownId && EventualRegistry.registered.get()) Some(Schemas.orderAvroJson)
    else None
  }
}

object FlakyRegistry {
  val failuresLeft = new java.util.concurrent.atomic.AtomicInteger(0)
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Companion counter shared across closure-serialized copies. */
object SlowRegistry {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** A registry that answers SLOWLY (50 ms) — holds the cache-miss
  * window open so every concurrent task races the same id at once:
  * the stampede worst case for the multi-partition cache spec. */
final case class SlowRegistry(byId: Map[Int, String]) extends SchemaRegistryResolver {
  override def resolve(id: Int): Option[String] = {
    SlowRegistry.calls.incrementAndGet()
    Thread.sleep(50)
    byId.get(id)
  }
}

/** A registry whose transport fails (throws) for the first
  * `failuresLeft` calls, then behaves — the 5xx/timeout simulation
  * for [[RetryingSchemaRegistry]]. */
final case class FlakyRegistry(byId: Map[Int, String]) extends SchemaRegistryResolver {
  override def resolve(id: Int): Option[String] = {
    FlakyRegistry.calls.incrementAndGet()
    if (FlakyRegistry.failuresLeft.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new RuntimeException("registry unreachable (simulated transport failure)")
    byId.get(id)
  }
}
