package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.functions.{from_avro_ocf, to_avro_ocf}
import graft.model.Schemas
import graft.ops.{Analytics, Router}

/** Driver contract — one entry per implemented operator (SURVEY.md §2),
  * each paired with DuckDB oracle SQL over the same parquet tables.
  *
  * Determinism policy (the driver hash-compares values):
  *  - every query ends with an ORDER BY on a unique key;
  *  - no floating-point value is ever produced by an order-dependent
  *    reduction: monetary sums run in integer cents
  *    (`floor(price*100 + 0.5)` — pure IEEE arithmetic, identical in
  *    Spark and DuckDB), then divide back to doubles;
  *  - aliases match the oracle SQL exactly (driver sorts columns by name).
  */
object SparkEntry {

  /** The driver's testdata tables (TESTDATA.md). */
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The reference's order stream, mapped onto the `orders` table
    * (FIXTURES.md §4): orderId <- o_orderkey, product <- o_orderpriority,
    * price <- o_totalprice mod 1500 — reproducing the producer's
    * uniform(5.0, 1500.0) price range (producer.py:123) so all three
    * routing branches are exercised. */
  private def ordersAsStream(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey").as("order_key"),
      col("o_orderkey").cast("string").as("orderId"),
      col("o_orderpriority").as("product"),
      (col("o_totalprice") % 1500.0).as("price"),
      col("o_orderdate"))

  private def routed(s: SparkSession, dir: String): DataFrame =
    Router.route(ordersAsStream(s, dir))
      .withColumn("topic", lit(Schemas.OrdersTopic))
      .withColumn("partition", lit(0))
      .withColumn("offset", col("order_key"))

  /** Shared oracle prefix mirroring ordersAsStream + Router.route. */
  private val routedSql: String =
    """WITH stream AS (
      |  SELECT o_orderkey AS order_key,
      |         CAST(o_orderkey AS VARCHAR) AS order_id,
      |         o_orderpriority AS product,
      |         o_totalprice % 1500.0 AS price,
      |         o_orderdate
      |  FROM orders
      |), routed AS (
      |  SELECT *,
      |    CASE WHEN order_id IS NULL OR length(order_id) = 0
      |              OR product IS NULL OR length(product) = 0
      |              OR price IS NULL OR price < 0 THEN 'permanent_failure'
      |         WHEN price >= 5.0 AND price <= 50.0 THEN 'transient_failure'
      |         WHEN price > 1000.0 THEN 'permanent_failure'
      |         ELSE 'success' END AS status
      |  FROM stream
      |)""".stripMargin

  /** Flagship: the reference's per-message running aggregate trace
    * (A1, consumer.py:166-176) as a deterministic window query. */
  def entry(spark: SparkSession): DataFrame =
    qRunningAvg(spark, "/root/testdata/sf0.001")

  // ---- reference-parity queries (SURVEY.md §2.2-2.4) ----

  private def qRoute(s: SparkSession, dir: String): DataFrame =
    routed(s, dir)
      .select(col("order_key"), col("product"), col("price"), col("status"))
      .orderBy(col("order_key"))

  private def qRouteCounts(s: SparkSession, dir: String): DataFrame =
    Router.statusCounts(routed(s, dir)).orderBy(col("status"))

  private def qAggSuccess(s: SparkSession, dir: String): DataFrame =
    routed(s, dir).filter(col("status") === Router.Success)
      .select(floor(col("price") * 100 + 0.5).cast("long").as("cents"))
      .agg(count(lit(1)).as("order_count"), sum(col("cents")).as("c"))
      .select(
        col("order_count"),
        (col("c") / 100.0).as("total_price"),
        ((col("c") / 100.0) / col("order_count")).as("average_price"))

  private def qRunningAvg(s: SparkSession, dir: String): DataFrame =
    Router.runningStats(
        routed(s, dir).filter(col("status") === Router.Success), col("order_key"))
      .select(col("order_key"), col("price"), col("order_count"),
        col("total_price"), col("running_average"))
      .orderBy(col("order_key"))

  private def qDlqEnrich(s: SparkSession, dir: String): DataFrame =
    Router.enrichDlq(routed(s, dir), unix_timestamp(col("o_orderdate")))
      .select(col("order_key"), col("error_reason"), col("original_topic"),
        col("original_partition"), col("original_offset"), col("dlq_timestamp"))
      .orderBy(col("order_key"))

  private def qRetryLedger(s: SparkSession, dir: String): DataFrame =
    Router.retryLedger(routed(s, dir))
      .select(col("order_key"), col("price"), col("attempt"),
        col("backoff_secs"), col("disposition"))
      .orderBy(col("order_key"), col("attempt"))

  private def qValidate(s: SparkSession, dir: String): DataFrame =
    ordersAsStream(s, dir)
      .select(col("order_key"), (col("price") - 750.0).as("price_v"))
      .withColumn("validity",
        when(col("price_v") < 0, "invalid_negative_price").otherwise("valid"))
      .orderBy(col("order_key"))

  /** S2∘S5 codec round-trip (the custom Avro OCF kernel): encode each
    * order as a single-record OCF message, decode it back, project the
    * fields. Oracle = identity, proving `from_avro_ocf ∘ to_avro_ocf = id`
    * on real data (float widening made explicit on both sides). */
  private def qAvroRoundtrip(s: SparkSession, dir: String): DataFrame =
    ordersAsStream(s, dir)
      .select(col("order_key"), struct(
        col("orderId"), col("product"),
        col("price").cast("float").as("price")).as("o"))
      .select(col("order_key"),
        from_avro_ocf(to_avro_ocf(col("o"), Schemas.orderAvroJson), Schemas.orderAvroJson).as("d"))
      .select(col("order_key"),
        col("d.orderId").as("order_id"),
        col("d.product").as("product"),
        col("d.price").cast("double").as("price"))
      .orderBy(col("order_key"))

  // ---- analytics surface (SURVEY.md §2.5): joins, windows, rollup,
  // ---- set ops, distinct aggs, event-time buckets, as-of lookup ----

  private def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Analytics.pricingSummary(t(s, dir, "lineitem"))

  private def qJoinRevenueNation(s: SparkSession, dir: String): DataFrame =
    Analytics.revenueByNation(t(s, dir, "orders"), t(s, dir, "customer"), t(s, dir, "nation"))

  private def qSemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  private def qAntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private def qTopk(s: SparkSession, dir: String): DataFrame =
    Analytics.topK(t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
      col("o_totalprice"), col("o_orderkey"), 10)

  private def qWindowRank(s: SparkSession, dir: String): DataFrame =
    Analytics.topPerGroup(
        t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        col("o_custkey"), col("o_totalprice"), col("o_orderkey"), 3)
      .orderBy(col("o_custkey"), col("rn"))

  private def qWindowLag(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("n"))
      .orderBy(col("status"), col("priority"))

  private def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("n"))
      .orderBy(col("status"), col("priority"))

  private def highValue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey"))
  private def fStatus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))

  private def qUnion(s: SparkSession, dir: String): DataFrame =
    highValue(s, dir).union(fStatus(s, dir)).distinct().orderBy(col("custkey"))

  private def qIntersect(s: SparkSession, dir: String): DataFrame =
    highValue(s, dir).intersect(fStatus(s, dir)).orderBy(col("custkey"))

  private def qExcept(s: SparkSession, dir: String): DataFrame =
    highValue(s, dir).except(fStatus(s, dir)).orderBy(col("custkey"))

  private def qDistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; `nanosAsLong` surfaces it as a bigint nanos-epoch
    * column — which is also the exact representation all event-time
    * arithmetic here runs on (integer math, no precision loss). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
  }

  private def qEventBuckets(s: SparkSession, dir: String): DataFrame =
    Analytics.tumblingNanos(events(s, dir), "ts", 600)
      .groupBy(col("bucket_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(Analytics.fp(col("value"), 1000L)) / 1000.0).as("total_value"))
      .orderBy(col("bucket_start"), col("event_type"))

  private def qAsofLastPurchase(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("last_purchase_us",
        Analytics.asOfLast(col("user_id"),
          Seq(col("ts"), col("event_id")),
          col("event_type") === "purchase", expr("ts div 1000")))
      .select(col("event_id"), col("user_id"), col("event_type"), col("last_purchase_us"))
      .orderBy(col("event_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_route" -> (qRoute _),
    "q_route_counts" -> (qRouteCounts _),
    "q_agg_success" -> (qAggSuccess _),
    "q_running_avg" -> (qRunningAvg _),
    "q_dlq_enrich" -> (qDlqEnrich _),
    "q_retry_ledger" -> (qRetryLedger _),
    "q_validate" -> (qValidate _),
    "q_avro_roundtrip" -> (qAvroRoundtrip _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q_join_revenue_nation" -> (qJoinRevenueNation _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_topk" -> (qTopk _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_lag" -> (qWindowLag _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_union" -> (qUnion _),
    "q_intersect" -> (qIntersect _),
    "q_except" -> (qExcept _),
    "q_distinct_agg" -> (qDistinctAgg _),
    "q_event_buckets" -> (qEventBuckets _),
    "q_asof_last_purchase" -> (qAsofLastPurchase _),
  )

  def oracleSql: Map[String, String] = Map(
    "q_route" ->
      s"""$routedSql
         |SELECT order_key, product, price, status FROM routed ORDER BY order_key""".stripMargin,

    "q_route_counts" ->
      s"""$routedSql
         |SELECT status, count(*) AS n FROM routed GROUP BY status ORDER BY status""".stripMargin,

    "q_agg_success" ->
      s"""$routedSql, cents AS (
         |  SELECT CAST(floor(price * 100 + 0.5) AS BIGINT) AS cents
         |  FROM routed WHERE status = 'success')
         |SELECT count(*) AS order_count,
         |       sum(cents) / 100.0 AS total_price,
         |       (sum(cents) / 100.0) / count(*) AS average_price
         |FROM cents""".stripMargin,

    "q_running_avg" ->
      s"""$routedSql, s AS (
         |  SELECT order_key, price,
         |         CAST(floor(price * 100 + 0.5) AS BIGINT) AS cents
         |  FROM routed WHERE status = 'success')
         |SELECT order_key, price,
         |       count(*) OVER w AS order_count,
         |       sum(cents) OVER w / 100.0 AS total_price,
         |       (sum(cents) OVER w / 100.0) / (count(*) OVER w) AS running_average
         |FROM s
         |WINDOW w AS (ORDER BY order_key ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY order_key""".stripMargin,

    "q_dlq_enrich" ->
      s"""$routedSql
         |SELECT order_key,
         |       CASE WHEN price IS NULL THEN 'Processing error: Missing price field'
         |            WHEN order_id IS NULL OR length(order_id) = 0
         |                 OR product IS NULL OR length(product) = 0
         |              THEN 'Processing error: Invalid order payload'
         |            WHEN price < 0
         |              THEN printf('Processing error: Invalid price: %.2f', price)
         |            ELSE printf('Price exceeds threshold: %.2f > 1000.0', price)
         |       END AS error_reason,
         |       'orders' AS original_topic,
         |       0 AS original_partition,
         |       order_key AS original_offset,
         |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS dlq_timestamp
         |FROM routed WHERE status = 'permanent_failure' ORDER BY order_key""".stripMargin,

    "q_retry_ledger" ->
      s"""$routedSql
         |SELECT order_key, price, attempt, attempt * 0.5 AS backoff_secs,
         |       CASE WHEN attempt = 3 THEN 'Processing failed after 3 retries'
         |            ELSE 'retry' END AS disposition
         |FROM routed CROSS JOIN (SELECT unnest([1, 2, 3]) AS attempt) a
         |WHERE status = 'transient_failure'
         |ORDER BY order_key, attempt""".stripMargin,

    "q_validate" ->
      s"""$routedSql
         |SELECT order_key, price - 750.0 AS price_v,
         |       CASE WHEN price - 750.0 < 0 THEN 'invalid_negative_price'
         |            ELSE 'valid' END AS validity
         |FROM stream ORDER BY order_key""".stripMargin,

    "q_avro_roundtrip" ->
      s"""$routedSql
         |SELECT order_key, order_id, product,
         |       CAST(CAST(price AS REAL) AS DOUBLE) AS price
         |FROM stream ORDER BY order_key""".stripMargin,

    "q1_pricing_summary" ->
      """WITH f AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT) AS disc_c,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000 + 0.5) AS BIGINT) AS charge_c
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
        |SELECT l_returnflag, l_linestatus, count(*) AS count_order,
        |  sum(qty_c) / 100.0 AS sum_qty,
        |  sum(price_c) / 100.0 AS sum_base_price,
        |  sum(disc_c) / 10000.0 AS sum_disc_price,
        |  sum(charge_c) / 1000000.0 AS sum_charge,
        |  (sum(qty_c) / 100.0) / count(*) AS avg_qty,
        |  (sum(price_c) / 100.0) / count(*) AS avg_price
        |FROM f GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_revenue_nation" ->
      """SELECT n_name, count(*) AS n_orders,
        |  sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS delta
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_union" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |  UNION
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F') t
        |ORDER BY custkey""".stripMargin,

    "q_intersect" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |  INTERSECT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F') t
        |ORDER BY custkey""".stripMargin,

    "q_except" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |  EXCEPT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F') t
        |ORDER BY custkey""".stripMargin,

    "q_distinct_agg" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_event_buckets" ->
      """SELECT (epoch_ns(ts) // 1000000000) // 600 * 600 AS bucket_start,
        |       event_type, count(*) AS n,
        |       sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) / 1000.0 AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin,

    "q_asof_last_purchase" ->
      """SELECT event_id, user_id, event_type,
        |  last_value(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) // 1000 END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_us
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
