package graft

/** The envelope schema IS the drop-in seam for a real Kafka source:
  * every envelope column appears in `spark.readStream.format("kafka")`
  * output with the same name and type (no connector jar in this
  * environment, so the contract is pinned structurally instead of
  * integration-tested). The source additionally emits `timestampType`
  * (int) — intentionally omitted from the envelope: nothing in the
  * reference semantics reads it, and a drop-in source's extra column
  * is simply ignored by the projection. */
class EnvelopeSeamSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("envelope schema matches the Kafka source column contract") {
    import org.apache.spark.sql.types._
    val kafkaSourceShape = Seq(
      ("key", BinaryType), ("value", BinaryType), ("topic", StringType),
      ("partition", IntegerType), ("offset", LongType),
      ("timestamp", TimestampType))
    val fields = graft.model.Schemas.envelope.fields.map(f => f.name -> f.dataType).toMap
    kafkaSourceShape.foreach { case (name, dt) =>
      assert(fields.get(name).contains(dt), s"envelope field $name mismatch")
    }
    // headers: array<struct<key:string, value:binary>> as in the Kafka
    // source's includeHeaders=true shape
    assert(fields("headers") ===
      ArrayType(StructType(Seq(StructField("key", StringType),
        StructField("value", BinaryType)))))
  }
}

import graft.model.Order
import graft.ops.{Router, TypedOps}

/** Typed Dataset[Order] surface agrees with the columnar router. */
class TypedOpsSpec extends SparkSpec {
  import spark.implicits._

  private val orders = Seq(
    Order("a", "Widget", 4.99f), Order("b", "Widget", 5.0f),
    Order("c", "Widget", 50.0f), Order("d", "Widget", 1000.01f),
    Order("e", "Widget", -1.0f), Order("", "Widget", 10.0f),
    Order("f", "", 10.0f), Order("g", "Widget", 200.0f))

  test("typed routing agrees with the columnar when-chain") {
    val typed = TypedOps.route(spark, orders.toDS()).collect()
      .map(r => r.orderId -> r.status).toMap
    val columnar = Router.route(orders.toDF())
      .collect().map(r => r.getAs[String]("orderId") -> r.getAs[String]("status")).toMap
    assert(typed === columnar)
  }

  test("NaN price routes Permanent on both surfaces (SQL total ordering)") {
    val nan = Seq(Order("n1", "Widget", Float.NaN))
    val typed = TypedOps.route(spark, nan.toDS()).head().status
    val columnar = Router.route(nan.toDF()).head().getAs[String]("status")
    assert(typed === Router.Permanent)
    assert(columnar === Router.Permanent)
  }

  test("typed per-product stats equal hand computation") {
    val routed = TypedOps.route(spark, orders.toDS())
    val stats = TypedOps.perProductStats(spark, routed).collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // successes: a (4.99), d? no (permanent), g (200.0) -> Widget: n=2
    val exp = (4.99f.toDouble + 200.0f.toDouble) / 2
    assert(stats("Widget")._1 === 2L)
    assert(math.abs(stats("Widget")._2 - exp) < 1e-9)
  }
}
