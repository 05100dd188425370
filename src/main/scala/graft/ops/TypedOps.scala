package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Order

/** Typed `Dataset[Order]` surface (SURVEY.md §1.2: "typed side ...
  * where typed logic reads best"). Same routing semantics as the
  * columnar Router, with compile-time field checks; the columnar form
  * remains the hot path (codegen'd, no object materialization) — this
  * is the ergonomic API for order-level business logic.
  */
object TypedOps {

  /** Routed order with its status tag (the reference's tagged union,
    * consumer.py:222). */
  final case class RoutedOrder(orderId: String, product: String,
      price: Float, status: String)

  /** R4/R1/R2/R3 as a total function on one order — predicate order
    * preserved (consumer.py:249-270). */
  def routeOrder(o: Order): RoutedOrder = {
    val status =
      if (o.orderId == null || o.orderId.isEmpty ||
        o.product == null || o.product.isEmpty || o.price < 0) Router.Permanent
      else if (o.price >= Router.TransientLo && o.price <= Router.TransientHi) Router.Transient
      // NaN: Spark SQL total ordering places NaN above every value, so
      // the columnar router's `price > 1000.0` catches it — mirror that
      // here (Scala NaN comparisons are all false otherwise)
      else if (o.price > Router.PermanentThreshold || o.price.isNaN) Router.Permanent
      else Router.Success
    RoutedOrder(o.orderId, o.product, o.price, status)
  }

  def route(spark: SparkSession, orders: Dataset[Order]): Dataset[RoutedOrder] = {
    import spark.implicits._
    orders.map(routeOrder)
  }

  /** Typed running totals per product via groupByKey + mapGroups
    * (batch analog of the per-key streaming state op). */
  def perProductStats(spark: SparkSession, routed: Dataset[RoutedOrder])
      : Dataset[(String, Long, Double)] = {
    import spark.implicits._
    routed.filter(_.status == Router.Success)
      .groupByKey(_.product)
      .mapGroups { (product, it) =>
        var c = 0L; var s = 0.0
        it.foreach { o => c += 1; s += o.price }
        (product, c, s / c)
      }
  }
}
