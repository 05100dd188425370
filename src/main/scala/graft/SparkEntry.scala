package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.functions.{from_avro_ocf, to_avro_ocf}
import graft.model.Schemas
import graft.ops.Router

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_route" -> (qRoute _),
    "q_route_counts" -> (qRouteCounts _),
    "q_agg_success" -> (qAggSuccess _),
    "q_running_avg" -> (qRunningAvg _),
    "q_dlq_enrich" -> (qDlqEnrich _),
    "q_retry_ledger" -> (qRetryLedger _),
    "q_validate" -> (qValidate _),
    "q_avro_roundtrip" -> (qAvroRoundtrip _),
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
  )
}
