package graft

import org.apache.spark.sql.functions._

import graft.ops.Router

/** Router truth table (FIXTURES.md §1; consumer.py:249-270 predicate
  * order: null/invalid -> transient [5,50] -> permanent >1000). */
class RouterSpec extends SparkSpec {
  import spark.implicits._

  private val fixture: Seq[(String, String, Option[Double], String)] = Seq(
    ("u1", "Widget A", Some(4.99), Router.Success),
    ("u2", "Widget B", Some(5.0), Router.Transient),   // lower bound inclusive
    ("u3", "Widget C", Some(50.0), Router.Transient),  // upper bound inclusive
    ("u4", "Widget D", Some(50.01), Router.Success),
    ("u5", "Widget E", Some(1000.0), Router.Success),  // rule is strict >
    ("u6", "Widget F", Some(1000.01), Router.Permanent),
    ("u7", "Widget G", None, Router.Permanent),  // missing price
    ("u8", "Widget H", Some(-1.0), Router.Permanent),  // negative price
    ("", "Widget I", Some(10.0), Router.Permanent),    // empty orderId
    (null, "Widget J", Some(10.0), Router.Permanent),  // null orderId
    ("u9", null, Some(10.0), Router.Permanent),        // null product
    ("u10", "Widget K", Some(30.0), Router.Transient)) // transient beats <1000

  private lazy val routed = Router.route(
    fixture.toDF("orderId", "product", "price", "expected"))

  test("three-way router matches the reference truth table") {
    val bad = routed.filter($"status" =!= $"expected").collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("statuses are a total three-way partition") {
    val n = routed.count()
    val byStatus = Router.statusCounts(routed).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet.subsetOf(
      Set(Router.Success, Router.Transient, Router.Permanent)))
    assert(byStatus.values.sum === n)
  }

  test("DLQ enrichment carries reference provenance headers") {
    val enriched = Router.enrichDlq(
      routed.withColumn("topic", lit("orders"))
        .withColumn("partition", lit(0))
        .withColumn("offset", monotonically_increasing_id()),
      lit(1700000000L))
    val rows = enriched.select($"error_reason").collect().map(_.getString(0))
    assert(rows.nonEmpty)
    assert(rows.exists(_.startsWith("Price exceeds threshold: 1000.01 > 1000.0")))
    assert(rows.exists(_ == "Processing error: Missing price field"))
    val env = Router.dlqEnvelope(enriched, lit(Array[Byte](1)), lit(Array[Byte](2)))
    val headerKeys = env.select(expr("transform(headers, h -> h.key)")).head().getSeq[String](0)
    assert(headerKeys === Seq("error_reason", "original_topic",
      "original_partition", "original_offset", "timestamp"))
  }

  test("retry ledger fans out maxRetries attempts with linear backoff") {
    val ledger = Router.retryLedger(routed)
    val transientCount = routed.filter($"status" === Router.Transient).count()
    assert(ledger.count() === transientCount * Router.MaxRetries)
    val last = ledger.filter($"attempt" === Router.MaxRetries).head()
    assert(last.getAs[String]("disposition").startsWith("Processing failed after 3 retries"))
    assert(ledger.filter($"attempt" === 2).head().getAs[Double]("backoff_secs") === 1.0)
  }

  test("property: router is a total 3-way partition over the producer price range") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // mirror producer.py:123 uniform(5.0, 1500.0), plus edge prices
    val genPrice = Gen.frequency(
      8 -> Gen.chooseNum(5.0, 1500.0),
      1 -> Gen.oneOf(4.99, 5.0, 50.0, 50.01, 1000.0, 1000.01, -1.0, 0.0),
      1 -> Gen.chooseNum(-10.0, 2000.0))
    val prop = Prop.forAll(genPrice) { priceD =>
      val price = priceD.toFloat // route and regions on the same width
      val statuses = Seq(
        price >= 0 && !(price >= 5.0 && price <= 50.0) && price <= 1000.0, // success
        price >= 5.0 && price <= 50.0,                                     // transient
        price < 0 || price > 1000.0)                                       // permanent
      // exactly one region claims each price (disjoint + exhaustive)
      statuses.count(identity) == 1 && {
        val routed = TypedOpsHelper.status("id", "p", price)
        (statuses(0) && routed == Router.Success) ||
          (statuses(1) && routed == Router.Transient) ||
          (statuses(2) && routed == Router.Permanent)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  private object TypedOpsHelper {
    def status(id: String, product: String, price: Float): String =
      graft.ops.TypedOps.routeOrder(graft.model.Order(id, product, price)).status
  }

  test("running stats equal hand-computed cumulative aggregates") {
    val success = Router.route(
        Seq(("a", "p", 10.0), ("b", "p", 20.0), ("c", "p", 60.0), ("d", "p", 100.0))
          .toDF("orderId", "product", "price"))
      .filter($"status" === Router.Success) // 60.0 and 100.0 survive
    val stats = Router.runningStats(success, $"orderId")
      .select($"orderId", $"order_count", $"total_price", $"running_average")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(stats.toSeq === Seq(("c", 1L, 60.0, 60.0), ("d", 2L, 160.0, 80.0)))
  }
}
