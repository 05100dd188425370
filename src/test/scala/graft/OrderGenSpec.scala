package graft

import org.apache.spark.sql.functions._

import graft.ops.Router
import graft.sources.OrderGen
import graft.stream.OrderPipeline

/** EP1 -> EP2 loop: the producer analog writes an envelope topic dir;
  * the streaming consumer decodes and routes it; the fan-out equals the
  * batch routing of the generated orders (full produce/consume parity). */
class OrderGenSpec extends SparkSpec {
  import spark.implicits._

  test("generated orders are deterministic and in the producer's price range") {
    val a = OrderGen.orders(spark, 100, "s1").collect()
    val b = OrderGen.orders(spark, 100, "s1").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val prices = a.map(_.getAs[Double]("price"))
    assert(prices.forall(p => p >= 5.0 && p <= 1500.01))
    val ids = a.map(_.getAs[String]("order_id"))
    assert(ids.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
    assert(ids.distinct.length === ids.length)
  }

  test("produce -> topic dir -> streaming consume matches batch routing") {
    val topic = tmpDir("graft-topic")
    val out = tmpDir("graft-e2e-out")
    val ckpt = tmpDir("graft-e2e-ckpt")

    // EP1: 15 messages, as in producer.py:114
    val gen = OrderGen.orders(spark, 15, "e2e")
    OrderGen.writeTopicDir(gen, topic)

    // EP2: streaming consume of the topic dir
    val q = OrderPipeline.start(
      OrderPipeline.process(OrderPipeline.readTopicDir(spark, topic)), out, ckpt)
    q.processAllAvailable(); q.stop()

    val expected = Router.route(gen.withColumnRenamed("order_id", "orderId"))
      .groupBy($"status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    def dirCount(d: String): Long =
      try spark.read.parquet(d).count() catch { case _: Throwable => 0L }
    assert(dirCount(s"$out/success") === expected.getOrElse(Router.Success, 0L))
    assert(dirCount(s"$out/retry") === expected.getOrElse(Router.Transient, 0L))
    assert(dirCount(s"$out/dlq") === expected.getOrElse(Router.Permanent, 0L))

    // decoded payloads survive the loop byte-exactly
    val roundTripped = spark.read.parquet(s"$out/success")
      .select($"orderId", $"product", $"price").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val original = Router.route(gen.withColumnRenamed("order_id", "orderId"))
      .filter($"status" === Router.Success)
      .select($"orderId", $"product", $"price".cast("float").cast("double"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(roundTripped === original)
  }
}
