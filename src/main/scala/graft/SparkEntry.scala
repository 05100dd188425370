package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.functions.{from_avro_ocf, to_avro_ocf}
import graft.llm.{Dedup, Multimodal, Similarity, TextOps}
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

  /** The driver's testdata tables (TESTDATA.md). The resolved read
    * relation (file listing + footer schema) is cached per (session,
    * path): the contract surface re-reads the same handful of parquet
    * tables, and re-listing + re-inferring per query is pure per-query
    * overhead (BASELINE.md's ~0.13 s/query floor). Only the RELATION
    * object is reused — no data is persisted, every query still scans
    * parquet. Keyed WEAKLY by the session object itself (identity
    * equality): a stopped session's entries are collectable, and a new
    * session can never alias another's cached plans. */
  private val relationCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    relationCache
      .computeIfAbsent(s, _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(s"$dir/$name", _ => s.read.parquet(s"$dir/$name.parquet"))

  /** Register every dataset table as a temp view so users can drive the
    * engine through `spark.sql(...)` directly (the DataFrame DSL and
    * SQL are the same Catalyst plans; no custom parser needed).
    * `events` needs the nanos-as-long conf (see `events` below), set
    * before its scan is planned. */
  def registerTables(s: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { n =>
      t(s, dir, n).createOrReplaceTempView(n)
    }
    events(s, dir).createOrReplaceTempView("events")
  }

  /** Engine-portable 60-bit hash (the md5 convention every sketch and
    * sampling query shares — replayable as
    * `CAST('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15) AS BIGINT)`
    * in the DuckDB oracle). */
  private def h60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Timestamp/date column -> integer epoch days (the oracle writes
    * `CAST(CAST(x AS DATE) - DATE '1970-01-01' AS BIGINT)`). */
  private def epochDay(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    datediff(c, lit("1970-01-01").cast("date")).cast("long")

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
      .select(Analytics.cents(col("price")).as("cents"))
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

  /** The flagship running aggregate through the 100 TB formulation:
    * ScalablePrefix.runningSum (two-pass range-partitioned prefix sum —
    * O(n) work, only numPartitions tuples to the driver) instead of the
    * single-task global window. Same semantics as q_running_avg, gated
    * by the same oracle window SQL, so CORRECTNESS now certifies the
    * scale path itself, not just an equivalence test. */
  private def qRunningAvgScalable(s: SparkSession, dir: String): DataFrame = {
    val base = routed(s, dir).filter(col("status") === Router.Success)
      .select(col("order_key"), Analytics.cents(col("price")).as("cents"))
    graft.ops.ScalablePrefix.runningSum(s, base, "order_key", "cents", numPartitions = 32)
      .select(col("order_key"), col("cents"),
        col("run_cnt").as("order_count"),
        (col("run_sum") / 100.0).as("total_price"),
        ((col("run_sum") / 100.0) / col("run_cnt")).as("running_average"))
      .orderBy(col("order_key"))
  }

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

  /** The retry LOOP's final disposition ledger as a batch query: where
    * every order ends up once the re-injection loop drains (success ->
    * processed on attempt 1; transient -> exhausted after 1 + MaxRetries
    * attempts with the reference's exhaustion message; permanent ->
    * straight to the DLQ with its error reason). This is the
    * oracle-checkable counterpart of the StreamingSpec loop test: the
    * streaming loop must land every record exactly where this ledger
    * says (consumer.py:278-314). */
  private def qRetryFinal(s: SparkSession, dir: String): DataFrame =
    routed(s, dir).select(col("order_key"), col("status"),
      when(col("status") === Router.Success, "processed")
        .when(col("status") === Router.Transient, "retry_exhausted")
        .otherwise("dlq_permanent").as("final_disposition"),
      when(col("status") === Router.Transient, 1 + Router.MaxRetries)
        .otherwise(1).cast("long").as("attempts"),
      when(col("status") === Router.Transient,
        format_string("Processing failed after %d retries", lit(Router.MaxRetries)))
        .when(col("status") === Router.Permanent,
          Router.errorReasonCol(col("orderId"), col("product"), col("price")))
        .otherwise("").as("final_reason"))
      .orderBy(col("order_key"))

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

  /** Raw-datum codec mode (SURVEY §7.3's scale optimization): identical
    * round-trip identity to q_avro_roundtrip but with NO container
    * framing — and the oracle PROVES the framing overhead is recovered:
    * the raw datum of the order record is exactly
    * 1 + len(orderId) + 1 + len(product) + 4 bytes (1-byte zigzag
    * varint length prefixes for strings under 64 chars, IEEE float),
    * which the SQL side computes symbolically and hash-compares against
    * `octet_length` of the real encoded bytes (vs ~250 B more per
    * message with the OCF header+sync). */
  private def qAvroDatumRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.avro.functions.{from_avro_datum, to_avro_datum}
    ordersAsStream(s, dir)
      .select(col("order_key"), struct(
        col("orderId"), col("product"),
        col("price").cast("float").as("price")).as("o"))
      .select(col("order_key"),
        to_avro_datum(col("o"), Schemas.orderAvroJson).as("b"))
      .select(col("order_key"),
        octet_length(col("b")).cast("long").as("datum_len"),
        from_avro_datum(col("b"), Schemas.orderAvroJson).as("d"))
      .select(col("order_key"),
        col("d.orderId").as("order_id"),
        col("d.product").as("product"),
        col("d.price").cast("double").as("price"),
        col("datum_len"))
      .orderBy(col("order_key"))
  }

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
      .withColumn("rn", col("rn").cast("long"))
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

  /** The `events` table normalized so `ts` is ALWAYS a bigint
    * nanos-epoch column — the exact integer representation all
    * event-time arithmetic here runs on (no float drift, no timezone
    * ambiguity). Handles both physical encodings the dataset has
    * shipped with: TIMESTAMP(NANOS) (surfaced via `nanosAsLong`) and
    * TIMESTAMP(MICROS) (read natively as a timestamp and widened —
    * `unix_micros * 1000` is exact). The DuckDB oracle mirrors this
    * with `epoch_ns(ts)`. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ =>
        // TIMESTAMP_NTZ -> instant under the UTC session timezone
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
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

  /** The NATIVE as-of join (graft.plans.AsofJoinExec — custom logical
    * node + planner strategy + physical merge operator): each order
    * looks up the customer's strictly-previous order, i.e. the
    * inter-purchase gap. The composite time key (day·2^40 + orderkey)
    * is a unique total order per customer — the 2^40 tie-break slot
    * holds order keys to ~1.1e12 (TPC-H SF ~180k) with day ≤ ~12k
    * staying inside int64, so strict "<" as-of equals the oracle's
    * lag() exactly at any realistic scale. The physical plan is two
    * clustered exchanges + sorts and ONE O(|L|+|R|) merge pass per
    * partition with O(1) state — no window funnel, no per-key
    * buffers. */
  private def qAsofNative(s: SparkSession, dir: String): DataFrame = {
    val slot = 1099511627776L // 2^40
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      epochDay(col("o_orderdate")).as("day"))
    val left = o.withColumn("tkey", col("day") * slot + col("o_orderkey"))
    val right = o.select(col("o_custkey").as("r_cust"),
      (col("day") * slot + col("o_orderkey")).as("r_tkey"),
      col("o_orderkey").as("prev_orderkey"), col("day").as("prev_day"))
    graft.plans.Asof.join(left, right,
        Seq("o_custkey"), Seq("r_cust"), "tkey", "r_tkey",
        Seq("prev_orderkey", "prev_day"), inclusive = false)
      .select(col("o_orderkey"), col("o_custkey"), col("day"),
        col("prev_orderkey"), (col("day") - col("prev_day")).as("gap_days"))
      .orderBy(col("o_orderkey"))
  }

  /** Point-in-time-correct feature join — the native as-of operator in
    * its ML-pipeline role: each purchase event is labeled with the
    * user's click count STRICTLY before it (the leakage guard a
    * feature-store join must enforce; inclusive semantics would leak
    * co-timestamped signals into training rows). The right side is the
    * per-user running click count (a high-cardinality-key window, no
    * funnel); the as-of itself is the one-merge-pass AsofJoinExec. The
    * oracle recomputes each label as a correlated COUNT — a different
    * algorithm entirely, so the gate checks the semantics, not the
    * plan. (user, ts) click pairs are unique in this dataset, which
    * QueriesSpec pins — running-count ties would otherwise make the
    * as-of pick nondeterministically. */
  private def qFeaturesAsof(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withColumn("clicks_so_far", count(lit(1)).over(
        Window.partitionBy(col("c_user")).orderBy(col("c_ts"))))
    graft.plans.Asof.join(purchases, clicks, Seq("user_id"), Seq("c_user"),
        "ts", "c_ts", Seq("clicks_so_far"), inclusive = false)
      .select(col("event_id"), col("user_id"),
        coalesce(col("clicks_so_far"), lit(0L)).as("clicks_before"))
      .orderBy(col("event_id"))
  }

  /** Last-touch marketing attribution: each purchase is attributed to
    * the SAME user's most recent strictly-preceding click's channel
    * (props.k mod 4), then revenue rolls up per channel with -1 for
    * organic (no prior click). Runs through the native as-of operator
    * — the second production consumer after q_features_asof, showing
    * the operator composes — while the oracle re-derives attribution
    * with an independent correlated-subquery algorithm. */
  private def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        Analytics.fp(col("value"), 1000L).as("v_milli"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        (get_json_object(col("props"), "$.k").cast("long") % 4).as("channel"))
    graft.plans.Asof.join(purchases, clicks, Seq("user_id"), Seq("c_user"),
        "ts", "c_ts", Seq("channel"), inclusive = false)
      .groupBy(coalesce(col("channel"), lit(-1L)).as("channel"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("v_milli")).as("value_milli"))
      .orderBy(col("channel"))
  }

  /** Time-series densification (gap filling): every 10-minute bucket in
    * each user's [first, last] activity span gets a row, absent buckets
    * filled with zero — the resample step feeding any windowed model.
    * The dense axis is generated per user with `sequence` (bounded by
    * the user's own span, so generation is distributed and
    * retention-bounded), then left-joined against observed counts. */
  private def qGapFill(s: SparkSession, dir: String): DataFrame = {
    // a deterministic user subset keeps the dumped ledger small (the
    // full densification at sf0.01 is ~630k rows); the operator shape
    // is identical
    val buckets = Analytics.tumblingNanos(
        events(s, dir).filter(col("user_id") % 37 === 0), "ts", 600)
      .groupBy(col("user_id"), col("bucket_start").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val dense = buckets.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), lit(600L))).as("bucket"))
    dense.join(buckets, Seq("user_id", "bucket"), "left")
      .select(col("user_id"), col("bucket"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("user_id"), col("bucket"))
  }

  /** Session windows via the lag-gap method: a new session starts after
    * a >30 min silence per user; session_id is the running count of
    * session starts — pure integer epoch math, shuffle only on user_id. */
  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("sec", expr("ts div 1000000000"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .withColumn("new_session",
        when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("sec")).as("session_start"),
        (max(col("sec")) - min(col("sec"))).as("duration_secs"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private def qWindowFuncs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        (lead(col("o_totalprice"), 1).over(w) - col("o_totalprice")).as("lead_delta"))
      .filter(col("rnk") <= 5)
      .orderBy(col("o_orderpriority"), col("rnk"), col("o_orderkey"))
  }

  /** Distribution-window functions (percent_rank / cume_dist /
    * nth_value / first+last over frames) — the second half of the
    * window surface beyond rank/lag/lead. percent_rank and cume_dist
    * are ratios of integer ranks (exact in both engines). */
  private def qWindowFuncs2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        nth_value(col("o_orderkey"), 2).over(wf).as("second_key"),
        first(col("o_orderkey")).over(wf).as("first_key"),
        last(col("o_orderkey")).over(wf).as("last_key"))
      .filter(col("rn") <= 4)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Portable string-function sweep: the transformation half of the
    * scalar library (case/pad/reverse/split_part/translate/position/
    * repeat/levenshtein) — all codegen'd built-ins, all with identical
    * semantics in DuckDB. */
  private def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        initcap(lower(col("c_name"))).as("name_title"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        split_part(col("c_name"), lit("#"), lit(1)).as("name_head"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_lowvowel"),
        instr(col("c_mktsegment"), "I").cast("long").as("i_pos"),
        repeat(substring(col("c_mktsegment"), 1, 2), 2).as("seg2x"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("long").as("seg_dist"))
      .orderBy(col("c_custkey"))

  /** The reference's scalar-function surface (SURVEY.md §2.5): string
    * encode/decode/case/length/substr, numeric round/floor/ceil/abs,
    * epoch timestamps, casts — all built-ins. */
  private def qScalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        lower(col("o_orderstatus")).as("status_lower"),
        length(col("o_orderpriority")).cast("long").as("pri_len"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        concat(col("o_orderstatus"), lit("#"), col("o_orderkey").cast("string")).as("tag"),
        round(col("o_totalprice")).as("price_round"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        ceil(col("o_totalprice")).cast("long").as("price_ceil"),
        abs(col("o_totalprice") - 250000.0).as("price_dist"),
        unix_timestamp(col("o_orderdate")).as("order_epoch"))
      .orderBy(col("o_orderkey"))

  private def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  private def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
      .select(col("o_orderstatus") +:
        priorities.zipWithIndex.map { case (p, i) =>
          coalesce(col(s"`$p`"), lit(0L)).as(s"p${i + 1}") }: _*)
      .orderBy(col("o_orderstatus"))

  private def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_id"),
        // missing/malformed keys -> -1, not null: Spark sorts nulls
        // first and DuckDB last, which would scramble the row-order
        // oracle compare
        coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(-1L)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k"))

  private def qDateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))
      .orderBy(col("o_orderkey"))

  /** Approximate quantiles via deterministic sampling — the scale
    * pattern for percentile estimation: exact percentile needs a full
    * per-group sort, so at 100 TB you compute it over a fixed-rate
    * hash sample (error ~ O(1/sqrt(sample size)), tunable by rate).
    * Unlike t-digest/QuantileSummaries internals, the deterministic
    * sample is REPLAYABLE by the oracle, so the approximation itself
    * is hash-verified, not just bounded. */
  private def qQuantileSampled(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(
        conv(substring(md5(concat(lit("qtile|"), col("o_orderkey").cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long") % 10 === 0)
      .select(col("o_orderpriority"), Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_sampled"),
        (expr("percentile(c, 0.5)") / 100.0).as("p50_est"),
        (expr("percentile(c, 0.95)") / 100.0).as("p95_est"))
      .orderBy(col("o_orderpriority"))

  /** Exact interpolated percentiles over integer cents: interpolation is
    * `(1-f)*lower + f*upper` on exact longs in both engines. */
  private def qPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority"), Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("o_orderpriority"))
      .agg(
        (expr("percentile(c, 0.5)") / 100.0).as("p50"),
        (expr("percentile(c, 0.9)") / 100.0).as("p90"),
        (expr("percentile(c, 0.99)") / 100.0).as("p99"))
      .orderBy(col("o_orderpriority"))

  /** Statistical aggregates (variance/stddev/correlation) computed from
    * exact integer moments — Spark's stddev/corr built-ins use
    * order-dependent streaming updates, so for oracle parity the moments
    * (sums of x, x^2, x*y as longs on bounded integer values) are reduced
    * exactly and the closed-form formulas run on identical doubles.
    *
    * Overflow headroom: the int64 sums must not wrap (Spark wraps
    * silently where DuckDB errors — a silent-divergence mode). Inputs
    * are therefore pre-bounded: x = floor(price/10) <= ~6e4 and
    * y = custkey % 30000 < 3e4 (custkey GROWS with SF, so the raw key
    * would overflow syy around 1e8 rows). With these bounds the largest
    * term (x*x ~ 3.6e9) keeps every sum inside int64 up to ~2.5e9 rows
    * PER GROUP (~ sf1500) — far beyond any verified SF, and checkable:
    * n * 3.6e9 < 2^63. */
  private def qStatsMoments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderstatus"),
        floor(col("o_totalprice") / 10).cast("long").as("x"),
        (col("o_custkey") % 30000).as("y"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(Seq(col("o_orderstatus"), col("n")) ++ {
        // closed-form moments in explicit double arithmetic: sx*sx would
        // overflow int64 (DuckDB errors, Spark wraps) — and the exact
        // long sums convert to identical doubles in both engines
        val nd = col("n").cast("double")
        val (sx, sy, sxx, syy, sxy) = (col("sx").cast("double"),
          col("sy").cast("double"), col("sxx").cast("double"),
          col("syy").cast("double"), col("sxy").cast("double"))
        Seq(
          (sx / nd).as("mean_x"),
          ((sxx - sx * sx / nd) / nd).as("var_pop"),
          sqrt((sxx - sx * sx / nd) / nd).as("stddev_pop"),
          ((nd * sxy - sx * sy) /
            (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))).as("corr_xy"))
      }: _*)
      .orderBy(col("o_orderstatus"))

  /** PERMISSIVE decode-error handling at the query level: every 10th
    * message is deterministically truncated; from_avro_ocf yields null
    * for exactly those, and the router sends them to the DLQ branch.
    * The oracle derives the same partition from the corruption rule. */
  private def qDecodeErrors(s: SparkSession, dir: String): DataFrame =
    ordersAsStream(s, dir)
      .select(col("order_key"), struct(
        col("orderId"), col("product"),
        col("price").cast("float").as("price")).as("o"))
      .select(col("order_key"), to_avro_ocf(col("o"), Schemas.orderAvroJson).as("value"))
      .withColumn("value",
        when(col("order_key") % 10 === 0, expr("substring(value, 1, 10)"))
          .otherwise(col("value")))
      .select(col("order_key"),
        from_avro_ocf(col("value"), Schemas.orderAvroJson).as("d"))
      .select(
        when(col("d").isNull, "decode_failure").otherwise("decoded").as("outcome"))
      .groupBy(col("outcome")).agg(count(lit(1)).as("n"))
      .orderBy(col("outcome"))

  /** TPC-H Q3-shaped: segment-filtered 3-way join, revenue top-10.
    * customer (filtered, broadcastable) ⋈ orders ⋈ lineitem with
    * date predicates pushed to both fact scans. */
  private def qShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= cutoff)
      .select(col("l_orderkey"),
        Analytics.fp(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L).as("rev_fp"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg((sum(col("rev_fp")) / 10000.0).as("revenue"))
      .select(col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("order_epoch"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped: five-way star join, revenue per nation in a
    * region and date window (dimensions broadcast). */
  private def qRegionVolume(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        Analytics.fp(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L).as("rev_fp"))
      .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg((sum(col("rev_fp")) / 10000.0).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Array-aggregation surface (collect_set/collect_list): grouped
    * collections emitted as sorted joined strings so the comparison is
    * engine-portable (raw array columns compare differently across
    * engines' result layers). */
  private def qCollectSet(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        size(collect_set(col("o_orderstatus"))).cast("long").as("n_statuses"))
      .orderBy(col("o_orderpriority"))

  /** Stratified sampling: exactly n docs per language stratum, chosen
    * by deterministic hash order — the reproducible per-class subset
    * builder for balanced corpus construction. Runs on the bounded
    * per-partition top-n path (graft.ops.Sampling): no single-task
    * stratum stage, no unbounded agg buffer — see Sampling.scaladoc. */
  private def qStratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.stratifiedTopN(s,
        t(s, dir, "documents")
          .withColumn("h",
            md5(concat(lit("strat|"), col("doc_id").cast("string")).cast("binary")))
          .select(col("lang"), col("h"), col("doc_id")),
        stratumCol = "lang", keyCol = "h", idCol = "doc_id", n = 25)
      .orderBy(col("lang"), col("rn"))

  /** Scan through the REAL DataSourceV2 table (sources/OrdersSource):
    * the planner prunes the projection down to (product, price) before
    * the scan, each of 8 input partitions generates its own index
    * slice executor-side, and the aggregate runs over the source
    * exactly as it would over any catalog table. The oracle replays
    * the md5 field derivations symbolically — same ground truth as
    * q_order_gen, reached through the connector API instead of column
    * expressions. */
  private def qSourceV2(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.OrdersSource")
      .option("rows", 1500).option("seed", "dsv2").option("numPartitions", 8)
      .load()
      .groupBy(col("product"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(Analytics.cents(col("price"))) / 100.0).as("total_spend"))
      .orderBy(col("product"))

  /** Error-tolerant casts (try_* family): malformed input -> null
    * instead of failure — the SQL-surface cousin of the codec's
    * PERMISSIVE decode. */
  private def qTryCast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        col("o_orderpriority").try_cast("int").as("pri_as_int"),
        substring(col("o_orderpriority"), 1, 1).try_cast("int").as("pri_digit_int"),
        col("o_orderstatus").try_cast("double").as("status_as_double"))
      .orderBy(col("o_orderkey"))

  /** Error-tolerant ARITHMETIC (try_add / try_multiply / try_divide /
    * try_element_at): overflow, divide-by-zero, and out-of-bounds
    * produce NULL instead of an ANSI runtime error — completing the
    * try_* family next to q_try_cast. The oracle has no try_*
    * functions, so it encodes each failure predicate explicitly
    * (CASE WHEN <would overflow> THEN NULL), which doubles as
    * documentation of exactly when each expression must fail. */
  private def qTryArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        // bigint overflow on even keys (Long.MaxValue + key)
        expr("try_add(CASE WHEN o_orderkey % 2 = 0 THEN 9223372036854775807 " +
          "ELSE 0 END, o_orderkey)").as("add_or_null"),
        // 2^62 * key overflows for every key >= 2
        expr("try_multiply(o_orderkey, 4611686018427387904)").as("mul_or_null"),
        // integer-ish divide by zero every 25th row
        expr("try_divide(CAST(floor(o_totalprice) AS BIGINT), o_orderkey % 25)")
          .as("div_or_null"),
        // indices 3 and 4 are out of bounds for a 2-element array
        // (index ZERO is a hard error even under try_element_at — the
        // 1-based contract itself, not a lookup failure)
        expr("try_element_at(array('low', 'high'), CAST(o_orderkey % 4 + 1 AS INT))")
          .as("elem_or_null"))
      .orderBy(col("o_orderkey"))

  /** Bit/bool aggregate sweep — bit_and/bit_or/bit_xor over the part
    * key set, bool_and/bool_or over predicates, count_if — the
    * aggregate-surface corner the earlier sweeps hadn't touched. All
    * integer/boolean outputs: hash-exact across engines by
    * construction, and every one partial-aggregates map-side. */
  private def qBitBoolAggs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("bit_and(l_partkey)").as("pk_and"),
        expr("bit_or(l_partkey)").as("pk_or"),
        expr("bit_xor(l_partkey)").as("pk_xor"),
        expr("bool_and(l_discount > 0.05)").as("all_disc"),
        expr("bool_or(l_tax > 0.07)").as("any_tax"),
        expr("count_if(l_quantity >= 25.0)").as("n_bulk"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Quantity-weighted mean price through the TYPED Aggregator UDAF
    * path (functions/WeightedMean.scala, registered via
    * functions.udaf) — the vanilla user-defined typed aggregation the
    * UDF/UDAF surface was missing next to the custom HLL sketch. The
    * buffer is exact long sums, so map-side partials merge
    * order-independently and the result hash-matches the oracle's
    * sum-of-products form. */
  private def qWeightedMean(s: SparkSession, dir: String): DataFrame = {
    val wm = udaf(graft.functions.WeightedMean,
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        Analytics.cents(col("l_extendedprice")).as("cents"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy(col("l_returnflag"))
      .agg(wm(col("cents"), col("qty")).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Ordered string aggregation: listagg ... WITHIN GROUP (ORDER BY) —
    * deterministic concatenation (DuckDB's string_agg ORDER BY form).
    * Dimension-sized groups only: an unbounded listagg over a fact
    * column would be a driver-sized string at scale. */
  private def qListagg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))

  /** Deterministic per-dataset scratch dir under target/ for the
    * format-roundtrip queries — inside the repo, overwritten
    * idempotently on every run; the sha1 prefix keeps distinct source
    * dirs from colliding (same contract as ops/Bucketing). */
  private def fmtDir(dir: String, name: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-1")
      .digest(dir.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
    s"target/fmt_roundtrip/$digest/$name"
  }

  /** CSV sink+source fidelity: write customer as headered CSV into the
    * build dir, read it back with the parquet schema, aggregate. The
    * oracle computes the same aggregate straight from parquet, so a
    * hash match proves the text roundtrip is lossless (shortest-repr
    * doubles re-parse to the same bits; quote/escape defaults agree
    * between writer and reader). */
  private def qCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "customer")
    val out = fmtDir(dir, "customer_csv")
    src.write.mode("overwrite").option("header", "true").csv(out)
    s.read.schema(src.schema).option("header", "true").csv(out)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(Analytics.cents(col("c_acctbal"))).as("bal_cents"),
        sum(col("c_custkey")).as("key_sum"),
        min(col("c_name")).as("first_name"))
      .orderBy(col("c_mktsegment"))
  }

  /** JSON-lines sink+source fidelity on a timestamp-bearing table:
    * orders out as JSONL, back in with the parquet schema (ISO
    * timestamps in the UTC session zone), aggregated vs the
    * straight-from-parquet oracle. */
  private def qJsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders")
    val out = fmtDir(dir, "orders_json")
    src.write.mode("overwrite").json(out)
    s.read.schema(src.schema).json(out)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(Analytics.cents(col("o_totalprice"))).as("price_cents"),
        min(unix_timestamp(col("o_orderdate"))).as("first_epoch"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q10-shaped: top customers by revenue lost to returned items
    * in a quarter — 4-way join ranking with a broadcast dimension. */
  private def qReturnedItems(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        Analytics.fp(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L).as("rev_fp"))
      .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg((sum(col("rev_fp")) / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q19-shaped: OR-bracketed multi-predicate revenue — exercises
    * disjunctive predicate pushdown and join-condition normalization. */
  private def qBracketRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 15) && col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 25) && col("p_size").between(1, 20)) ||
          (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 35) && col("p_size").between(1, 30)))
      .agg(
        count(lit(1)).as("n_items"),
        (sum(Analytics.fp(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L)) / 10000.0)
          .as("revenue"))

  /** Custom-UDAF surface: deterministic HLL sketch vs exact distinct.
    * The oracle replays the sketch register-for-register (graft.functions.Hll). */
  private def qHllDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_custkey"),
        conv(substring(md5(col("o_custkey").cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.Hll.hll_sketch(col("h")).as("hll_estimate"),
        countDistinct(col("o_custkey")).as("exact_distinct"))
      .orderBy(col("o_orderpriority"))

  /** Sketch REUSE across aggregation levels: per-nation HLL register
    * sketches of distinct parts supplied are materialized once, then
    * the region level is computed by MERGING sketches (elementwise
    * register max) — never rescanning raw data. Estimate-of-merge
    * equals estimate-of-union exactly (max is associative/commutative/
    * idempotent), so the oracle computes the region-level sketch
    * directly from raw rows and must land on bit-identical estimates.
    * This is how distinct-count rollups stay O(groups) instead of
    * O(data) per level at 100 TB. The exact distinct (one extra
    * aggregation, oracle-shared) sits alongside as the accuracy
    * audit. */
  private def qHllRollup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hll
    val li = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_nationkey"), col("n_regionkey"), col("l_partkey"),
        conv(substring(md5(col("l_partkey").cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
    val natSketch = li.groupBy(col("n_nationkey"), col("n_regionkey"))
      .agg(Hll.hll_registers(col("h")).as("regs"))
    val regSketch = natSketch.groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), Hll.hll_merge(col("regs")).as("regs"))
    val exact = li.groupBy(col("n_regionkey"))
      .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
    // exact side is |regions| rows — hint the broadcast at plan time
    // rather than relying on AQE's runtime demotion of the SMJ
    regSketch.join(broadcast(exact), "n_regionkey")
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_nations"),
        Hll.hll_estimate_registers(col("regs")).as("hll_estimate"),
        col("exact_distinct"))
      .orderBy(col("r_name"))
  }

  /** KMV bottom-k sketch rollup — the set-algebra sketch alongside
    * q_hll_rollup's registers: per-nation sketches of the part-key sets
    * merge to region level by "union, keep k smallest" (a pure
    * expression over ≤25 fine-group arrays per region — O(groups), not
    * O(data)). The estimate is exact below capacity and one double
    * division at capacity; the exact distinct rides along as the
    * accuracy control. Same 60-bit md5 hash convention as the HLL
    * family, so the oracle replays the sketch with ORDER BY h LIMIT k. */
  private def qKmvRollup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Kmv
    val li = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_nationkey"), col("n_regionkey"), col("l_partkey"),
        h60(col("l_partkey")).as("h"))
      // the sketch and exact aggregations group by different keys —
      // materialize the joined+hashed scan once (q_kmv_jaccard pattern)
      .localCheckpoint(eager = false)
    val natSketch = li.groupBy(col("n_nationkey"), col("n_regionkey"))
      .agg(Kmv.kmv_sketch(col("h")).as("sk"))
    val regSketch = natSketch.groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), Kmv.kmv_merge(col("sk")).as("sk"))
    val exact = li.groupBy(col("n_regionkey"))
      .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
    regSketch.join(broadcast(exact), "n_regionkey")
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_nations"),
        Kmv.kmv_estimate(col("sk")).as("kmv_estimate"),
        col("exact_distinct"))
      .orderBy(col("r_name"))
  }

  /** KMV set algebra — the overlap query HLL registers cannot answer
    * well: the Jaccard similarity between two regions' part-key sets,
    * estimated from two 64-value sketches (the fraction of the union
    * sketch present in both inputs — Beyer et al., SIGMOD 2007). Once
    * per-segment sketches are materialized, ANY pairwise Jaccard /
    * intersection is O(k), never O(data). Exact controls alongside. */
  private def qKmvJaccard(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Kmv
    val src = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin("ASIA", "EUROPE"))
      .select(col("r_name"), col("l_partkey"), h60(col("l_partkey")).as("h"))
      // the sketch and exact aggregations group by different keys —
      // materialize the 4-way join once (same pattern as q_hll_intersect)
      .localCheckpoint(eager = false)
    val sk = src.groupBy(col("r_name")).agg(Kmv.kmv_sketch(col("h")).as("sk"))
    val a = sk.filter(col("r_name") === "ASIA").select(col("sk").as("ka"))
    val b = sk.filter(col("r_name") === "EUROPE").select(col("sk").as("kb"))
    val exact = src.groupBy(col("l_partkey"))
      .agg(countDistinct(col("r_name")).as("nr"))
      .agg(
        sum(when(col("nr") === 2, 1L).otherwise(0L)).as("exact_intersect"),
        count(lit(1)).as("exact_union"))
    a.crossJoin(b).crossJoin(broadcast(exact))
      .select(
        Kmv.kmv_estimate(col("ka")).as("est_a"),
        Kmv.kmv_estimate(col("kb")).as("est_b"),
        Kmv.kmv_estimate(Kmv.kmv_union(col("ka"), col("kb"))).as("est_union"),
        Kmv.kmv_jaccard(col("ka"), col("kb")).as("est_jaccard"),
        col("exact_intersect"),
        col("exact_union"),
        (col("exact_intersect").cast("double") / col("exact_union"))
          .as("exact_jaccard"))
  }

  /** Deterministic hash-based Bernoulli sampling (reproducible corpus
    * subsets — a pipeline staple; salt makes draws independent). */
  private def qSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(
        conv(substring(md5(concat(lit("sample|"), col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long") % 100 < 10)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Corpus bigram document frequency (n-gram statistics). */
  private def qNgramCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(Dedup.shingles(TextOps.tokens(col("text")), 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("bigram"))
      .limit(20)

  /** Tokenizer-vocabulary coverage audit: build the top-256 vocabulary
    * by document frequency (deterministic tie-break on the token),
    * broadcast it, and report each source's out-of-vocabulary token
    * rate in exact ppm — the coverage check run before committing to a
    * tokenizer. The vocab build shuffles (token, doc) pairs once for
    * the distinct, then (token) counts; the tiny ranked vocab
    * broadcasts back onto the token stream, so the corpus is scanned
    * twice and never sorted. */
  private def qVocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = tok.select(col("tok"), col("doc_id")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(256)
    tok.join(broadcast(vocab.select(col("tok"), lit(1).as("in_v"))),
        Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_ppm", expr("oov_tokens * 1000000 div n_tokens"))
      .orderBy(col("source"))
  }

  /** S1/EP1 producer parity: deterministic generated orders, routed.
    * The oracle replays the generator field-for-field. */
  private def qOrderGen(s: SparkSession, dir: String): DataFrame = {
    val gen = graft.sources.OrderGen.orders(s, 1000L, "gen1")
      .withColumnRenamed("order_id", "orderId")
    Router.route(gen)
      .select(col("seq"), col("orderId").as("order_id"), col("product"),
        col("price"), col("status"))
      .orderBy(col("seq"))
  }

  /** Equi + range join: per purchase, same-user events in the
    * preceding 10 minutes (SortMergeJoin with a range residual —
    * the scalable equi-anchored interval-join shape). */
  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
    ev.join(purchases,
        col("user_id") === col("pu") &&
          col("ts") >= col("pts") - lit(600000000000L) &&
          col("ts") < col("pts"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_preceding"))
      .orderBy(col("purchase_id"))
  }

  // ---- LLM-pipeline operators (north-star extensions): text analysis,
  // ---- dedup family, similarity search, multimodal plumbing ----

  private def qTextStats(s: SparkSession, dir: String): DataFrame =
    TextOps.withTokenStats(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("n_uniq_tokens").cast("long").as("n_uniq_tokens"),
        col("type_token_ratio"), col("avg_token_len"))
      .orderBy(col("doc_id"))

  private def qLangId(s: SparkSession, dir: String): DataFrame =
    TextOps.withLangId(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("en_hits").cast("long").as("en_hits"),
        col("n_tokens").cast("long").as("n_tokens"), col("en_density"),
        col("pred_lang"), col("lang"), (col("pred_lang") === col("lang")).as("pred_match"))
      .orderBy(col("doc_id"))

  private def qQuality(s: SparkSession, dir: String): DataFrame =
    TextOps.withQualityScore(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("en_density"), col("type_token_ratio"),
        col("quality_score"))
      .orderBy(col("doc_id"))

  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    TextOps.withFingerprints(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("fp"), col("fp_prefix"))
      .orderBy(col("doc_id"))

  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(t(s, dir, "documents"), "doc_id", "text")
      .select(col("keep_id"), col("dup_count"))
      .orderBy(col("keep_id"))

  private def qJaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", k = 5, minSim = 0.05)
      .select(col("d1"), col("d2"), col("shared"), col("n1"), col("n2"), col("jaccard"))
      .orderBy(col("d1"), col("d2"))

  private def qMinhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidates(t(s, dir, "documents"), "doc_id", "text",
        k = 5, numHashes = 8, rowsPerBand = 1)
      .orderBy(col("d1"), col("d2"))

  private def qSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash32(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  private def qCosineTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.topK(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") === 0).select(col("embedding").as("qv")), "qv", 20)
  }

  private def qEmbedNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        "label", minSim = 0.25)
      .orderBy(col("v1"), col("v2"))

  private def qIvfSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
    val qc = assign.filter(col("vec_id") === 0).select(col("cid").as("qcid"))
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    emb.join(assign, "vec_id")
      .join(broadcast(qc), col("cid") === col("qcid"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  /** ANN index-quality evaluation: recall@10 of the IVF index against
    * the exact brute-force ground truth, per query — the metric an ANN
    * deployment gates on before trading exactness for probe speed.
    * Both rankings run through the SAME bounded per-partition heap
    * (no per-query window); the IVF assignment is computed once and
    * reused for the query buckets and the corpus buckets; recall is an
    * exact integer ppm. */
  private def qRecallAtK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
      .localCheckpoint(eager = false)
    val queries = emb.filter(col("vec_id").isin(0, 7, 42, 99, 123))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(assign.select(col("vec_id").as("qid"), col("cid").as("qcid")), "qid")
    def top10(scored: DataFrame): DataFrame = {
      val keyed = scored.select(col("qid"), col("vec_id"),
        lpad(greatest(lit(0L),
            floor((lit(1.0) - col("cosine")) * 1e9 + 0.5).cast("long")).cast("string"),
          12, "0").as("distkey"))
      graft.ops.Sampling.stratifiedTopN(s, keyed, "qid", "distkey", "vec_id", n = 10)
        .select(col("qid").cast("long").as("qid"), col("vec_id"))
    }
    val truth = top10(emb
      .crossJoin(broadcast(queries.select(col("qid"), col("qv"))))
      .select(col("qid"), col("vec_id"),
        Similarity.cosineFp(col("embedding"), col("qv")).as("cosine")))
    val retrieved = top10(emb.join(assign, "vec_id")
      .join(broadcast(queries), col("cid") === col("qcid"))
      .select(col("qid"), col("vec_id"),
        Similarity.cosineFp(col("embedding"), col("qv")).as("cosine")))
    truth.join(retrieved.withColumn("hit", lit(1L)), Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0L))).as("n_matched"))
      .withColumn("recall_ppm", expr("n_matched * 1000000 div n_truth"))
      .orderBy(col("qid"))
  }

  /** Int8 embedding quantization audit: per-vector scale, the full
    * code vector (rendered as CSV for engine-portable comparison), and
    * the exact fixed-point reconstruction error. */
  private def qVecQuantize(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(t(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("scale"),
        array_join(transform(col("codes"), c => c.cast("string")), ",").as("codes_csv"),
        col("abs_err_fp"))
      .orderBy(col("vec_id"))

  /** Batched ANN serving: top-5 neighbors for EACH of several query
    * vectors in one pass — broadcast the query batch, score every
    * (query, vector) pair, then per-query top-k through the SAME
    * bounded per-partition heap operator the stratified sampler uses
    * (stratum = query id, key = fixed-width fixed-point distance, so
    * string order == numeric order). No per-query window, no unbounded
    * buffer: the serving path scales with corpus size times queries /
    * partitions. */
  private def qAnnBatch(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id").isin(0, 7, 42))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"),
        Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))
      // ascending sortable key: fixed-point (1 - cosine), zero-padded to
      // fixed width so lexicographic == numeric order. Clamped at 0:
      // fixed-point rounding can push cosine a hair ABOVE 1 for
      // near-identical vectors, and a negative key would sort reversed
      // lexicographically vs numerically
      .select(col("qid"), col("vec_id"),
        lpad(greatest(lit(0L),
            floor((lit(1.0) - col("cosine")) * 1e9 + 0.5).cast("long")).cast("string"),
          12, "0").as("distkey"))
    graft.ops.Sampling.stratifiedTopN(s, scored, "qid", "distkey", "vec_id", n = 5)
      .select(col("qid").cast("long").as("qid"), col("rn"), col("vec_id"))
      .orderBy(col("qid"), col("rn"))
  }

  /** SRP-LSH bucket histogram: the centroid-free ANN scale path
    * (bucket join replaces all-pairs; see Similarity.srpSignature). */
  private def qLshAnnBuckets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        Similarity.srpSignature(col("embedding"), numPlanes = 12, dim = 64).as("sig"))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec"))
      .orderBy(col("sig"))

  private def qTokenEstimate(s: SparkSession, dir: String): DataFrame =
    TextOps.withTokenEstimate(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("n_words"), col("est_bpe_tokens"), col("est_tokens"))
      .orderBy(col("doc_id"))

  /** Array/collection function sweep over the embedding column. */
  private def qArrayFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        col("embedding").getItem(0).cast("double").as("first_component"),
        graft.functions.kernels.fixed_point_dot(
          slice(col("embedding"), 1, 8), slice(col("embedding"), 1, 8)).as("head8_norm_fp"),
        size(filter(col("embedding"), x => x > 0)).cast("long").as("n_positive"))
      .orderBy(col("vec_id"))

  /** Regexp surface (patterns chosen to behave identically in Java
    * regex and RE2): leading-digit extraction + match flag. */
  private def qRegexp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        regexp_extract(col("o_orderpriority"), "^([0-9])", 1).as("pri_digit"),
        col("o_orderpriority").rlike("^[1-3]-").as("is_high_pri"))
      .orderBy(col("o_orderkey"))

  private def qUnionAll(s: SparkSession, dir: String): DataFrame =
    highValue(s, dir).withColumn("src", lit("high_value"))
      .unionAll(fStatus(s, dir).withColumn("src", lit("f_status")))
      .groupBy(col("src")).agg(count(lit(1)).as("n"))
      .orderBy(col("src"))

  /** The composed curation pipeline (the realistic shape of a training
    * -data job): language gate -> quality gate -> exact dedup -> token
    * accounting, one declarative plan end to end. */
  private def qCurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.withQualityScore(t(s, dir, "documents"), "text")
    val gated = scored.filter(col("en_density") >= 0.05 && col("quality_score") >= 0.45)
    val deduped = TextOps.withFingerprints(gated, "text")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    val withTokens = TextOps.withTokenEstimate(deduped, "text")
    withTokens.agg(
      count(lit(1)).as("n_docs_kept"),
      sum(col("est_tokens")).as("total_est_tokens"),
      (sum(floor(col("quality_score") * 1000000 + 0.5).cast("long")) / 1000000.0 /
        count(lit(1))).as("mean_quality"))
  }

  /** Gopher-style duplicate n-gram fractions (k=2 and k=3). */
  private def qRepetition(s: SparkSession, dir: String): DataFrame =
    TextOps.withRepetition(
        TextOps.withRepetition(t(s, dir, "documents"), "text", 2), "text", 3)
      .select(col("doc_id"), col("n_2grams"), col("uniq_2grams"),
        col("dup_2gram_ratio"), col("n_3grams"), col("uniq_3grams"),
        col("dup_3gram_ratio"))
      .orderBy(col("doc_id"))

  /** PII scrub over documents with deterministically injected contact
    * lines (the raw corpus has none): count + redact, then fingerprint
    * the scrubbed text so the oracle verifies the REPLACEMENT output,
    * not just the counts. */
  private def qPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val withPii = t(s, dir, "documents").withColumn("text2",
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact u"), col("doc_id"), lit("@example.com now")))
        .when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" see https://example.org/d/"), col("doc_id"), lit(" page")))
        .otherwise(col("text")))
    TextOps.withPiiScrub(withPii, "text2")
      .select(col("doc_id"), col("n_emails"), col("n_urls"),
        md5(col("scrubbed").cast("binary")).as("scrub_fp"))
      .orderBy(col("doc_id"))
  }

  /** Incremental dedup: new documents are kept only if their content
    * fingerprint does not already exist in the PRIOR corpus (here the
    * doc_id % 5 == 0 subset) — the anti-join-on-digest shape every
    * continuously-ingesting curation pipeline runs per batch. The
    * shuffle carries 16-byte digests, never text. */
  private def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val prior = docs.filter(col("doc_id") % 5 === 0)
      .select(md5(col("text").cast("binary")).as("fp"))
      .distinct()
    docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("fp", md5(col("text").cast("binary")))
      .join(prior, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup clustering: Jaccard candidate pairs -> connected
    * components -> cluster label = min doc id (the kept representative).
    * Emits every clustered doc with its cluster and representative
    * flag; singleton docs (no near-dup) are not rows, by construction. */
  private def qDupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.dupClusters(
        Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", k = 5, minSim = 0.05),
        "d1", "d2")
      .select(col("node").as("doc_id"), col("label").as("cluster"),
        col("is_representative"))
      .orderBy(col("doc_id"))

  /** The SAME clustering answer as q_dup_clusters, computed by
    * alternating large-star/small-star contraction (ops/StarCC.scala)
    * instead of min-label propagation: O(log n) rounds regardless of
    * component diameter, vs O(diameter) for min-label — the formulation
    * that survives adversarial topology at 100 TB. One recursive
    * ground-truth oracle gates both algorithms. */
  private def qCcStar(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
      k = 5, minSim = 0.05)
    val (labels, _) = graft.ops.StarCC.labels(pairs, "d1", "d2")
    labels
      .select(col("node").as("doc_id"), col("label").as("cluster"),
        (col("label") === col("node")).as("is_representative"))
      .orderBy(col("doc_id"))
  }

  /** The dedup DECISION step: near-dup clusters keep their BEST member
    * (longest text, ties to the smaller doc_id) rather than the
    * arbitrary min-id — what a curation pipeline actually ships.
    * Composition of the clustering with an order-encoded argmax per
    * cluster; the encoding (n_chars·10⁹ + (10⁹−1−doc_id)) is the same
    * tie-free pair trick as q_arg_max, valid while doc_id < 10⁹.
    * Emits one row per cluster: the kept doc and the drop count. */
  private def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val clustered = Dedup.dupClusters(
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", k = 5, minSim = 0.05),
      "d1", "d2")
      .select(col("node").as("doc_id"), col("label").as("cluster"))
    clustered
      .join(t(s, dir, "documents").select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        max(col("n_chars") * 1000000000L + (lit(999999999L) - col("doc_id"))).as("enc"))
      .select(col("cluster"),
        (lit(999999999L) - col("enc") % 1000000000L).as("kept_doc"),
        expr("enc div 1000000000").as("kept_chars"),
        col("n_members"), (col("n_members") - 1).as("n_dropped"))
      .orderBy(col("cluster"))
  }

  /** N-gram decontamination: overlap of each doc's 5-gram shingles with
    * a small "benchmark" subset (doc_id % 97 == 0), benchmark side
    * broadcast. */
  private def qContamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.contamination(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "text", k = 5)
      .orderBy(col("doc_id"))
  }

  /** Concat-and-split sequence packing (the GPT-style pretraining batch
    * construction): documents are concatenated in doc_id order and
    * split into fixed 2048-token context windows; each doc reports its
    * global token offset, its window index, and whether it straddles a
    * window boundary. The token-offset prefix sum runs on
    * ScalablePrefix's two-pass range-partitioned path — the second
    * oracle-gated production use of that 100 TB formulation. */
  private def qPackWindows(s: SparkSession, dir: String): DataFrame = {
    val windowTokens = 2048L
    val base = TextOps.withTokenEstimate(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("est_tokens"))
    graft.ops.ScalablePrefix.runningSum(s, base, "doc_id", "est_tokens", numPartitions = 32)
      .select(col("doc_id"), col("est_tokens"),
        (col("run_sum") - col("est_tokens")).as("start_offset"),
        // integer `div`, not `/`: Column./ on longs is DOUBLE division,
        // which loses exactness past 2^53 total tokens
        expr(s"(run_sum - est_tokens) div $windowTokens").as("window_id"),
        (expr(s"(run_sum - est_tokens) div $windowTokens") =!=
          expr(s"(run_sum - 1) div $windowTokens")).as("crosses_boundary"))
      .orderBy(col("doc_id"))
  }

  private def qMultimodalMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.withMediaMeta(
        t(s, dir, "documents").withColumn("blob", encode(col("text"), "UTF-8")), "blob")
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("format"))
      .orderBy(col("doc_id"))

  /** ANSI-SQL interoperability: ONE SQL string (CTE + join + window +
    * fixed-point aggregate) executed verbatim by BOTH engines — Spark
    * via `spark.sql` over `registerTables` and DuckDB as its own
    * oracle. Proves the spark.sql surface end-to-end inside the
    * correctness gate, not just the DataFrame DSL. NB: in Spark SQL
    * TEXT a literal like `100.0` parses as DECIMAL(4,1) (the DSL's
    * `lit(100.0)` is a double), and bigint/decimal division yields
    * DECIMAL — hence the explicit CAST AS DOUBLE on the divisor. */
  private val sqlSurfaceText: String =
    """WITH cust_orders AS (
      |  SELECT c_mktsegment, o_totalprice,
      |         row_number() OVER (PARTITION BY c_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM customer JOIN orders ON o_custkey = c_custkey)
      |SELECT c_mktsegment,
      |  count(*) AS n_top_orders,
      |  sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |    / CAST(100.0 AS DOUBLE) AS top_order_revenue
      |FROM cust_orders WHERE rn = 1
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  private def qSqlSurface(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(sqlSurfaceText)
  }

  /** Map-typed function sweep (map_keys / map_values-by-key / size /
    * map_filter with a value lambda / map_concat / map_entries) over a
    * map built from `events.props` JSON plus event columns. Collections
    * are emitted as key-sorted joined strings so the comparison is
    * engine-portable (map iteration order is not part of the contract). */
  private def qMapFuncs(s: SparkSession, dir: String): DataFrame = {
    val kval = coalesce(get_json_object(col("props"), "$.k"), lit("-1"))
    val m = map(
      lit("k"), kval,
      lit("type"), col("event_type"),
      lit("uid"), col("user_id").cast("string"))
    events(s, dir)
      .select(col("event_id"), m.as("m"))
      .select(
        col("event_id"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
        array_join(transform(array_sort(map_keys(col("m"))),
          kk => element_at(col("m"), kk)), ",").as("vals_csv"),
        size(col("m")).cast("long").as("n_entries"),
        size(map_filter(col("m"),
          (_, v) => v.try_cast("bigint") > 50)).cast("long").as("n_big"),
        size(map_concat(col("m"), map(lit("extra"), lit("1"))))
          .cast("long").as("n_concat"),
        array_join(transform(map_entries(col("m")),
          e => concat(e.getField("key"), lit("="), e.getField("value"))), ",")
          .as("entries_csv"))
      .orderBy(col("event_id"))
  }

  /** Document chunking through the custom Generator (UDTF surface):
    * 64-token windows starting every 48 tokens (16-token overlap) —
    * the RAG/pretraining chunker as a streaming per-partition expand. */
  private def qChunking(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.chunking.chunk_document(TextOps.tokens(col("text")), 64, 16)
          .as(Seq("chunk_idx", "chunk", "n_chunk_tokens")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"), col("n_chunk_tokens").cast("long").as("n_chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Real container-header parsing, oracle-checked: synthesize a PNG /
    * JPEG / GIF header carrying doc_id-derived dimensions, parse it back
    * with the pure-JVM `image_dims` kernel, emit the parsed values. The
    * oracle replays the dimension arithmetic — a mismatch anywhere in
    * synthesis or parsing (endianness, offsets, segment walk) fails the
    * hash compare. */
  private def qMediaDims(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 512 + 16).cast("int").as("w_in"),
        ((col("doc_id") * 3) % 512 + 16).cast("int").as("h_in"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg").otherwise("gif").as("fmt_in"))
      .withColumn("blob",
        Multimodal.synthesizeHeader(col("fmt_in"), col("w_in"), col("h_in")))
      .select(col("doc_id"), graft.functions.media.image_dims(col("blob")).as("d"))
      .select(col("doc_id"), col("d.format").as("format"),
        col("d.width").cast("long").as("width"),
        col("d.height").cast("long").as("height"))
      .orderBy(col("doc_id"))

  /** Audio-container metadata extraction — the audio half of the
    * multimodal plumbing (q_media_dims covers images): REAL RIFF/WAVE
    * headers are synthesized from deterministic PCM parameters, parsed
    * back by the pure-JVM chunk walker (functions.media.audio_meta),
    * and duration is derived as exact integer ms. The oracle replays
    * the parameter arithmetic symbolically. */
  private def qAudioMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 2 + 1).cast("int").as("ch_in"),
        ((col("doc_id") % 5 + 1) * 8000).cast("int").as("rate_in"),
        lit(16).as("bits_in"),
        ((col("doc_id") % 100 + 1) * 1600).cast("long").as("frames_in"))
      .withColumn("blob", Multimodal.synthesizeWavHeader(
        col("ch_in"), col("rate_in"), col("bits_in"), col("frames_in")))
      .select(col("doc_id"), graft.functions.media.audio_meta(col("blob")).as("m"))
      .select(col("doc_id"),
        col("m.channels").cast("long").as("channels"),
        col("m.sample_rate").cast("long").as("sample_rate"),
        col("m.bits").cast("long").as("bits"),
        col("m.n_frames").as("n_frames"),
        expr("m.n_frames * 1000 div m.sample_rate").as("duration_ms"))
      .orderBy(col("doc_id"))

  /** Video-container metadata extraction — the third modality next to
    * q_media_dims (PNG/JPEG/GIF) and q_audio_meta (WAV): REAL RIFF/AVI
    * MainAVIHeader parsing (functions/Media.parseAvi) over containers
    * synthesized in pure column expressions from per-doc parameters.
    * The oracle replays the parameter arithmetic symbolically, so a
    * hash match proves synthesize∘parse = identity field-for-field;
    * clip duration is exact integer µs→ms. Per-row work, no shuffle
    * until the final sort. */
  private def qVideoMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        ((col("doc_id") % 8 + 1) * 160).cast("int").as("w_in"),
        ((col("doc_id") % 8 + 1) * 90).cast("int").as("h_in"),
        (col("doc_id") % 2 + 1).cast("int").as("streams_in"),
        ((col("doc_id") % 50 + 1) * 24).cast("long").as("frames_in"),
        when(col("doc_id") % 3 === 0, 33333L).otherwise(41667L)
          .as("uspf_in"))
      .withColumn("blob", Multimodal.synthesizeAviHeader(
        col("w_in"), col("h_in"), col("streams_in"), col("frames_in"),
        col("uspf_in")))
      .select(col("doc_id"), graft.functions.media.video_meta(col("blob")).as("m"))
      .select(col("doc_id"),
        col("m.width").cast("long").as("width"),
        col("m.height").cast("long").as("height"),
        col("m.streams").cast("long").as("streams"),
        col("m.n_frames").as("n_frames"),
        col("m.us_per_frame").as("us_per_frame"),
        expr("m.n_frames * m.us_per_frame div 1000").as("duration_ms"))
      .orderBy(col("doc_id"))

  /** Exact-k-per-group deterministic sampling (k=5 per language): the
    * eval-set construction primitive — rate-based sampling
    * (q_stratified_sample) cannot promise exactly k rows per stratum;
    * ranking a replayable 48-bit md5 key does. Runs on the two-pass
    * grouped rank (no per-language window funnel); the 48-bit key stays
    * below 2^53 so groupedRank's double order is exact. */
  private def qSampleK(s: SparkSession, dir: String): DataFrame = {
    val keyed = t(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 12), 16, 10)
          .cast("long").cast("double").as("h"))
    graft.ops.ScalablePrefix.groupedRank(s, keyed,
        groupCol = "lang", orderCol = "h", idCol = "doc_id", numPartitions = 32)
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("rnk"), col("doc_id"), col("grp_n"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** Correlated EXISTS subquery (TPC-H Q4 shape) as ONE SQL text run
    * verbatim by both engines — exercises Catalyst's subquery
    * decorrelation (EXISTS → left-semi join). */
  private val existsSubqueryText: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private def qExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(existsSubqueryText)
  }

  /** Correlated scalar subquery (TPC-H Q17 shape): per-part average
    * quantity threshold. Catalyst decorrelates the scalar subquery into
    * an aggregate + join. `l_quantity` is integer-valued (1..50), so
    * `avg` reduces exactly in both engines; money stays in cents. */
  private val scalarSubqueryText: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_small,
      |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |    / CAST(700.0 AS DOUBLE) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#4'
      |  AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * avg(l2.l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  private def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(scalarSubqueryText)
  }

  /** Full-outer join coverage: one market segment full-outer the
    * per-customer order rollup — left-null rows are customers outside
    * the segment with orders, right-null rows would be segment
    * customers with no orders. Keys coalesced to one spine. */
  private def qOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val bld = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_acctbal"))
    val ord = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders_raw"),
        sum(Analytics.cents(col("o_totalprice"))).as("spend_c"))
    bld.join(ord, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_custkey").isNotNull.as("in_segment"),
        coalesce(col("n_orders_raw"), lit(0L)).as("n_orders"),
        (coalesce(col("spend_c"), lit(0L)) / 100.0).as("spend"))
      .orderBy(col("custkey"))
  }

  /** RANGE-frame window (value-based, not row-based): rolling 30-day
    * spend per customer over an integer epoch-day order key. Unlike a
    * ROWS frame, RANGE bounds select peers by key distance — days with
    * no orders shrink the frame contents, and same-day orders are frame
    * peers. One Exchange on the customer key. */
  private def qRollingRange(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = t(s, dir, "orders")
      .filter(col("o_custkey") % 10 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("day"),
        Analytics.cents(col("o_totalprice")).as("price_c"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-29, Window.currentRow)
    base.select(col("o_custkey"), col("o_orderkey"), col("day"),
        (sum(col("price_c")).over(w) / 100.0).as("roll_30d"),
        count(lit(1)).over(w).cast("long").as("n_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** SCD type-2 dimension build (Analytics.scd2): order-priority change
    * history per customer with effectivity ranges; open versions carry
    * the sentinel 99999999 so no raw nulls reach the hash compare. */
  private def qScd2(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .filter(col("o_custkey") % 7 === 0)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("day"))
    Analytics.scd2(base, "o_custkey", "day", "o_orderkey", "o_orderpriority")
      .select(col("o_custkey"), col("version"), col("o_orderpriority"),
        col("valid_from"),
        coalesce(col("valid_to_raw"), lit(99999999L)).as("valid_to"),
        col("valid_to_raw").isNull.as("is_current"))
      .orderBy(col("o_custkey"), col("version"))
  }

  /** TF-IDF top terms per document with a LOG-FREE rational score:
    * score_fp = (tf * (N+1) * 10^6) div (df+1) — exact int64 arithmetic,
    * strictly monotone in tf and in -df like the classic tf·idf, and
    * bit-identical across engines (ln() differs by ULPs between libms,
    * so the standard formulation can't be hash-compared). Plan shape:
    * one explode + two aggregations (tf keyed by (doc,term), df keyed by
    * term) + a shuffle join on term — each stage partial-aggregates
    * map-side, nothing is ever collected. */
  private def qTfidf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .filter(col("doc_id") % 20 === 0)
      .withColumn("score_fp", expr("(tf * (n_docs + 1) * 1000000) div (df + 1)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score_fp").desc, col("term"))).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"), col("tf"),
        col("df"), col("score_fp"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Corpus length histogram via integer bucketing — the standard
    * pre-training length-distribution audit. Pure map + tiny agg. */
  private def qLengthHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(least(expr("n_chars div 200"), lit(15L)).as("bucket"),
        col("n_chars"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("bucket"))

  /** Z-order layout audit: Morton-interleave (p_size, p_partkey % 4096)
    * with the `zorder2` kernel, bucket rows by z-range, and emit each
    * bucket's min/max on BOTH dimensions. The tight per-bucket ranges
    * (max_y-min_y = 63 here) are exactly what makes range-partitioning
    * by zval prune parquet row groups on either predicate at 100 TB —
    * the oracle replays the interleave as 32 shift/mask terms. */
  private def qZorder(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_size").cast("long").as("x"),
        (col("p_partkey") % 4096).as("y"))
      .withColumn("zval", graft.functions.kernels.zorder2(col("x"), col("y")))
      .groupBy(expr("zval div 4096").as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy(col("zbucket"))

  /** Skew-resistant join through Analytics.saltedJoin: each lineitem row
    * takes a salt in [0,4), orders replicate once per salt, and the join
    * key becomes (orderkey, salt) — a hot order fans out over 4 tasks
    * instead of one straggler. The result is identical to the plain
    * join (the oracle IS the plain join), which is the point: salting
    * changes the partitioning, never the answer. */
  private def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val left = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("k"),
        Analytics.cents(col("l_extendedprice")).as("price_c"))
    val right = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    Analytics.saltedJoin(left, right, Seq("k"), salts = 4)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        (sum(col("price_c")) / 100.0).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Co-located fact⋈fact join over bucketed layout (ops.Bucketing):
    * both sides pre-bucketed by the join key, so the join itself plans
    * with NO Exchange (pinned by PlanAuditSpec) — the bucketed write
    * paid the shuffle once at layout time. */
  private def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val ot = graft.ops.Bucketing.ensureBucketed(s, dir, "orders",
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus")),
      "o_orderkey", buckets = 8)
    val lt = graft.ops.Bucketing.ensureBucketed(s, dir, "lineitem",
      t(s, dir, "lineitem").select(col("l_orderkey"),
        Analytics.cents(col("l_extendedprice")).as("price_c")),
      "l_orderkey", buckets = 8)
    s.table(ot).join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        (sum(col("price_c")) / 100.0).as("revenue"))
      .orderBy(col("o_orderstatus"))
  }

  /** Count-Min sketch heavy-hitter estimates (d=3 hash rows, w=64
    * counters) — the bounded-memory frequency sketch next to the HLL
    * cardinality sketch. Scale shape: keys are first compressed by an
    * EXACT map-side-combined count (the shuffle carries one row per
    * distinct key, never the event stream), the 3×64 counter table is
    * built from that compressed table and BROADCAST for probing. The
    * oracle rebuilds the identical sketch (md5 cells) and certifies the
    * CMS admissibility invariant — estimate >= true count — row by row,
    * with real collisions at w=64 (est > exact for some probes). */
  private def qCmsHeavy(s: SparkSession, dir: String): DataFrame = {
    def cell(d: org.apache.spark.sql.Column,
        key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(md5(concat(d.cast("string"), lit("|"),
        key.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long") % 64
    val ds = explode(array((0 until 3).map(lit): _*)).as("d")
    val exact = events(s, dir).groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val cells = exact.select(col("user_id"), col("cnt"), ds)
      .withColumn("w", cell(col("d"), col("user_id")))
      .groupBy(col("d"), col("w")).agg(sum(col("cnt")).as("counter"))
    val probes = exact.filter(col("user_id") % 10 === 0)
      .select(col("user_id"), col("cnt"), ds)
      .withColumn("w", cell(col("d"), col("user_id")))
    probes.join(broadcast(cells), Seq("d", "w"))
      .groupBy(col("user_id"), col("cnt"))
      .agg(min(col("counter")).as("cms_est"))
      .select(col("user_id"), col("cnt").as("exact_count"), col("cms_est"),
        (col("cms_est") >= col("cnt")).as("admissible"))
      .orderBy(col("user_id"))
  }

  /** Unpivot (melt) — the inverse of q_pivot: wide per-flag measure
    * columns become (flag, measure, value) rows via Dataset.unpivot.
    * Measures are fixed-point longs so the melt is value-exact. */
  private def qUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(Analytics.cents(col("l_quantity"))).as("sum_qty_c"),
        sum(Analytics.cents(col("l_extendedprice"))).as("sum_price_c"),
        sum(Analytics.fp(col("l_discount"), 10000L)).as("sum_disc_fp"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty_c"), col("sum_price_c"), col("sum_disc_fp")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))

  /** Interval-overlap join through coarse-bucket decomposition — the
    * scalable form of a theta join `a.s <= b.e AND b.s <= a.e`: each
    * interval explodes across the 30-day buckets it covers, the join
    * runs as an EQUI-join on the bucket (hash-partitionable, no
    * broadcast-nested-loop), the exact overlap predicate filters the
    * candidates, and each pair is kept only in the bucket of
    * max(start, start) so no overlap double-counts. At 100 TB this is
    * the difference between a shuffled hash join and an O(N*M) loop —
    * the oracle runs the plain theta join and must agree exactly. */
  private def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val iv = t(s, dir, "orders").filter(col("o_custkey") % 50 === 0)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("s"),
        (datediff(col("o_orderdate"), lit("1995-01-01").cast("date")) + 6)
          .cast("long").as("e"),
        Analytics.cents(col("o_totalprice")).as("price_c"))
      .withColumn("bucket", explode(sequence(expr("s div 30"), expr("e div 30"))))
    val promo = s.range(0, 81).select(col("id").as("w"),
        (col("id") * 30).as("ps"), (col("id") * 30 + 9).as("pe"))
      .withColumn("bucket", explode(sequence(expr("ps div 30"), expr("pe div 30"))))
    iv.join(promo, "bucket")
      .filter(col("s") <= col("pe") && col("ps") <= col("e"))
      .filter(col("bucket") === expr("greatest(s, ps) div 30"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_overlaps"),
        (sum(col("price_c")) / 100.0).as("overlap_spend"))
      .orderBy(col("w"))
  }

  /** Fuzzy matching via edit distance (levenshtein is built-in and
    * integer-exact in both engines): each probe document against its
    * successor's 48-char prefix. The successor lookup is an EQUI-join on
    * doc_id+1 — doc ids are dense, so this replaces the global-window
    * `lead` (which would serialize into one partition) with a
    * partitionable join; the oracle uses the window form and must
    * agree. ratio_fp is the normalized distance in exact ppm. */
  private def qEditDistance(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 48).as("pfx"))
    val nxt = d.select((col("doc_id") - 1).as("a_id"), col("pfx").as("nxt"))
    d.filter(col("doc_id") % 5 === 0)
      .join(nxt, col("doc_id") === col("a_id"))
      .withColumn("dist", levenshtein(col("pfx"), col("nxt")).cast("long"))
      .withColumn("ratio_fp",
        expr("(dist * 1000000) div greatest(length(pfx), length(nxt))"))
      .select(col("doc_id"), col("dist"), col("ratio_fp"))
      .orderBy(col("doc_id"))
  }

  /** Recursive CTE (Spark 4 WITH RECURSIVE) as ONE shared SQL text: an
    * 80-month spine generated by recursion, left-joined to the order
    * stream so empty months survive with zero counts. The spine depth
    * is calendar-bound (1995–2001), not data-bound, so the text is
    * SF-independent and stays under Spark's recursion level limit. */
  private val recursiveCteText: String =
    """WITH RECURSIVE months(m) AS (
      |  SELECT 0 UNION ALL SELECT m + 1 FROM months WHERE m < 79)
      |SELECT m, count(o_orderkey) AS n_orders,
      |  coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 0)
      |    / CAST(100.0 AS DOUBLE) AS revenue
      |FROM months LEFT JOIN orders
      |  ON (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 = m
      |GROUP BY m ORDER BY m""".stripMargin

  private def qRecursiveCte(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(recursiveCteText)
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 customers
    * per nation) as ONE shared SQL text — the SQL-standard spelling of
    * top-n-per-group, planned by Catalyst as a lateral join. Raw
    * acctbal doubles are emitted unreduced (no arithmetic), so parity
    * is byte-level parquet fidelity. */
  private val lateralTopkText: String =
    """SELECT n_name, c.c_name, c.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  private def qLateralTopk(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(lateralTopkText)
  }

  /** Deterministic argmax via max_by / arg_max: which order carries each
    * priority's highest price. Raw max_by ties are engine-defined, so
    * the ordering key is an order-preserving pair encoding
    * (cents * 10^8 + orderkey) — unique per row, hence a well-defined
    * argmax in both engines, with headroom to orderkey < 10^8 (~sf600).
    * One partial-aggregated groupBy; no window, no sort. */
  private def qArgMax(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        (Analytics.cents(col("o_totalprice")) * 100000000L + col("o_orderkey"))
          .as("enc"))
      .groupBy(col("o_orderpriority"))
      .agg(expr("max_by(o_orderkey, enc)").as("top_orderkey"),
        (expr("max(enc) div 100000000") / 100.0).as("max_price"))
      .orderBy(col("o_orderpriority"))

  /** Centered moving average (ROWS BETWEEN n PRECEDING AND n FOLLOWING)
    * — the two-sided window frame shape, complementing the running
    * (unbounded-preceding) and RANGE (value-based) frames already
    * covered. Daily pre-aggregation first, so the window slides over
    * one row per (priority, day), and all frame sums reduce exact
    * cents. */
  private def qMovingAvg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("day"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("rev_c"),
        count(lit(1)).as("n"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    daily.select(col("o_orderpriority"), col("day"),
        (col("rev_c") / 100.0).as("day_revenue"),
        (sum(col("rev_c")).over(w) / 100.0).as("win_revenue"),
        sum(col("n")).over(w).as("win_orders"),
        ((sum(col("rev_c")).over(w) / 100.0) / count(lit(1)).over(w))
          .as("centered_avg"))
      .orderBy(col("o_orderpriority"), col("day"))
  }

  /** Triangle enumeration over the co-purchase graph (parts appearing
    * in the same order): the canonical multi-way self-join. Edges are
    * canonicalized u < v, and a triangle is a wedge (e1.v = e2.u)
    * closed by a third edge — three equi-joins, each
    * hash-partitionable; at corpus scale the standard refinement is
    * degree-ordering the endpoints so high-degree hubs don't dominate
    * the wedge join. Probe restricted to partkey % 10 to bound wedges
    * at verify scale. */
  private def qTriangles(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    // materialize the edge list ONCE: referenced three times below, an
    // unmaterialized edge list would replicate the items self-join
    // lineage into every branch (13 hash exchanges instead of ~5 —
    // measured via Explain --audit). LAZY checkpoint so constructing
    // the DataFrame (plan audits, explain dumps) runs no job; the edge
    // RDD persists for the session — acceptable for a query-contract
    // entry (edge lists are tiny), but a long-lived service would
    // manage the materialization lifecycle explicitly à la dupClusters
    val edges = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    edges.as("e1")
      .join(edges.as("e2"), col("e1.v") === col("e2.u"))
      .join(edges.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .groupBy(col("e1.u").as("a"))
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("a"))
  }

  /** Sessionization through the BUILT-IN `session_window` function —
    * the same merge machinery Structured Streaming uses for streaming
    * session aggregation, here batch-oracle-certified. Boundary
    * semantics (verified empirically, and by the sf0.1 gate): sessions
    * merge when they overlap OR TOUCH, so an event at exactly the gap
    * distance still merges — the oracle's split rule is `gap > 1800`,
    * identical to the manual lag-gap form. (The exact-gap case first
    * appears at sf0.1; a smaller SF cannot distinguish the rules.) */
  private def qSessionWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("tssec", expr("ts div 1000000000"))
      .withColumn("t", col("tssec").cast("timestamp"))
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        max(col("tssec")).as("max_sec"), min(col("tssec")).as("min_sec"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start"),
        col("n_events"),
        (col("max_sec") - col("min_sec")).as("span_secs"))
      .orderBy(col("user_id"), col("session_start"))

  /** Domain-mixture sampling: per-source keep rates (upsample curated
    * domains, downsample bulk web — the pretraining mixture knob) via
    * the deterministic md5-hash Bernoulli gate, so the "random" sample
    * is replayable byte-for-byte by the oracle. A pure narrow filter:
    * no shuffle, no state, embarrassingly parallel at corpus scale. */
  private def qWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 90)
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 15)
      .otherwise(40)
    t(s, dir, "documents")
      .filter(
        conv(substring(md5(concat(lit("mix|"), col("doc_id").cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long") % 100 < rate)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Dataset-card accounting: documents and estimated tokens per source
    * with each source's exact share in ppm (integer arithmetic — no
    * float ratios). The grand total is a global window over the
    * PER-SOURCE AGGREGATE (one row per source), not over the corpus:
    * the scan + tokenization runs once, and the single-partition window
    * touches only the handful of post-agg rows. (A crossJoin with a
    * re-aggregated total would re-execute the whole heavy lineage —
    * partial-agg shapes differ, so ReuseExchange can't dedupe it.) */
  private def qSourceMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    TextOps.withTokenEstimate(t(s, dir, "documents"), "text")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("est_tokens")).as("toks"))
      .withColumn("total",
        sum(col("toks")).over(Window.partitionBy()))
      .select(col("source"), col("n_docs"), col("toks").as("est_tokens"),
        expr("(toks * 1000000) div total").as("share_ppm"))
      .orderBy(col("source"))
  }

  /** Multiset (bag-semantics) set operations — exceptAll preserves
    * duplicate counts where EXCEPT would collapse them, the remaining
    * set-op variants after q_union/q_intersect/q_except covered the
    * distinct forms. Both reduce to the same count-difference
    * aggregation shape at scale (no row-by-row matching). */
  private def qSetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "lineitem").select(col("l_returnflag"))
    val b = t(s, dir, "lineitem").filter(col("l_linenumber") > 1)
      .select(col("l_returnflag"))
    val ec = a.exceptAll(b).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_except"))
    val ic = a.intersectAll(b).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_intersect"))
    ec.join(ic, "l_returnflag")
      .select(col("l_returnflag"), col("n_except"), col("n_intersect"))
      .orderBy(col("l_returnflag"))
  }

  /** PageRank (3 unrolled iterations, damping 0.85) over the undirected
    * co-purchase graph — the second iterative graph operator next to
    * connected components. All arithmetic is exact int64 fixed point at
    * 1e6: per-edge contribution = pr div degree (integer division),
    * update = 150000 + (85 * sum) div 100 — order-independent
    * reductions, so the result is partitioning-proof and the oracle
    * replays the identical recurrence. Each iteration is one equi-join
    * + one aggregation keyed by destination (the standard distributed
    * PR shape); the edge list materializes once (lazy checkpoint). */
  private def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem").filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val und = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val edges = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .localCheckpoint(eager = false)
    // per-edge contribution denominators materialize ONCE: each of the 3
    // iterations joins this same (u, v, d) relation against the evolving
    // pr vector — without the checkpoint, every iteration re-runs the
    // edges⋈deg join (and the edge self-join lineage behind it)
    val withDeg = edges.join(deg, "u").localCheckpoint(eager = false)
    var pr = deg.select(col("u").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to 3) {
      pr = withDeg.join(pr, withDeg("u") === pr("node"))
        .select(col("v"), expr("pr div d").as("contrib"))
        .groupBy(col("v"))
        .agg(expr("150000 + (85 * sum(contrib)) div 100").as("pr"))
        .select(col("v").as("node"), col("pr"))
    }
    pr.join(deg, pr("node") === deg("u"))
      .select(col("node"), col("pr").as("pr_fp"), col("d").as("degree"))
      .orderBy(col("node"))
  }

  /** Link prediction by the resource-allocation index: for each
    * NON-edge pair (x, y) sharing at least one neighbor z,
    * RA(x,y) = Σ_z 1/deg(z) — the rational cousin of Adamic-Adar
    * (1/log deg needs a transcendental; 1/deg doesn't), computed in
    * exact ppm integer division so the oracle replays it bit-for-bit.
    * Shape: one wedge self-join on the common-neighbor key + one
    * aggregation + one anti-join against the existing edge list.
    * Scale: wedge enumeration is quadratic in deg(z), so hubs above a
    * degree cap (64) are skipped — the standard pruning, and sound
    * for ranking since a hub's 1/deg contribution is negligible; the
    * cap bounds any single join key's fan-out to 64×64 rows, making
    * the wedge shuffle skew-proof by construction. Top-30 candidate
    * edges via TakeOrderedAndProject, re-sorted on the (x, y) key. */
  private def qLinkPred(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem").filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val und = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    val edges = und.union(und.select(col("v").as("u"), col("u").as("v")))
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val mid = edges.join(deg.filter(col("d") <= 64), "u")
    val cand = mid.as("e1").join(mid.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.v").as("x"), col("e2.v").as("y"),
        col("e1.d").as("dz"))
    val scored = cand.groupBy(col("x"), col("y"))
      .agg(expr("sum(1000000 div dz)").as("ra_ppm"),
        count(lit(1)).as("n_common"))
    scored.join(und,
        scored("x") === und("u") && scored("y") === und("v"), "left_anti")
      .orderBy(col("ra_ppm").desc, col("x"), col("y")).limit(30)
      .select(col("x"), col("y"), col("n_common"), col("ra_ppm"))
      .orderBy(col("x"), col("y"))
  }

  /** HITS hubs & authorities over the bipartite customer→part purchase
    * graph (2 unrolled rounds, UNNORMALIZED — for a fixed iteration
    * count the ranking is normalization-invariant, and dropping the
    * norm keeps every value an exact int64 SUM OF COUNTS: the only
    * iterative graph operator in the contract with no division at
    * all). auth₁ = indegree; hub₁(c) = Σ_{p∈N(c)} auth₁(p);
    * auth₂(p) = Σ_{c∈N(p)} hub₁(c); hub₂ likewise. Each half-round is
    * one equi-join + one sum keyed by the opposite side — the same
    * distributed shape as PageRank but on a directed bipartite graph,
    * which PageRank's undirected co-purchase projection can't express.
    * Top-15 per role via TakeOrderedAndProject (deterministic id
    * tie-break), emitted as one (role, node, score) frame. */
  private def qHits(s: SparkSession, dir: String): DataFrame = {
    val ords = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val li = t(s, dir, "lineitem").filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = li.join(ords, li("l_orderkey") === ords("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint(eager = false)
    val auth1 = edges.groupBy(col("p")).agg(count(lit(1)).as("a1"))
    val hub1 = edges.join(auth1, "p").groupBy(col("c"))
      .agg(sum(col("a1")).as("h1"))
    val auth2 = edges.join(hub1, "c").groupBy(col("p"))
      .agg(sum(col("h1")).as("a2"))
    val hub2 = edges.join(auth2, "p").groupBy(col("c"))
      .agg(sum(col("a2")).as("h2"))
    val topAuth = auth2.orderBy(col("a2").desc, col("p")).limit(15)
      .select(lit("auth").as("role"), col("p").as("node"),
        col("a2").as("score"))
    val topHub = hub2.orderBy(col("h2").desc, col("c")).limit(15)
      .select(lit("hub").as("role"), col("c").as("node"),
        col("h2").as("score"))
    topAuth.union(topHub).orderBy(col("role"), col("node"))
  }

  /** Autocorrelation function of the daily-revenue series at lags
    * 1..7 (seasonality screen): pairwise-complete Pearson r between
    * (v_t, v_{t+k}) via a day-domain self-join per lag — well-defined
    * whether or not the calendar has gaps, no regular-grid resample
    * needed. Daily values quantize to exact thousands-of-dollars longs
    * so all five moments are order-independent integer sums; r is one
    * fixed double tree (products under 2^53 at gate SFs stay exact;
    * beyond that both engines round the SAME long inputs identically).
    * Scale: the join runs on the calendar-bounded day domain (~2.4k
    * rows regardless of SF), never the fact table — the fact scan
    * collapses to the daily table in one aggregation. */
  private def qAcf(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(epochDay(col("o_orderdate")).as("day"),
        Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("day"))
      .agg(expr("sum(c) div 100000").as("v"))
      .localCheckpoint(eager = false)
    val lags = s.range(1, 8).select(col("id").as("lag"))
    val pairs = daily.select(col("day"), col("v").as("x"))
      .crossJoin(broadcast(lags))
      .join(daily.select(col("day").as("day2"), col("v").as("y")),
        col("day") + col("lag") === col("day2"))
    pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("acf",
        (col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double"))))
      .select(col("lag"), col("n_pairs"), col("acf"))
      .orderBy(col("lag"))
  }

  /** CUSUM changepoint screen over the daily-revenue series: the
    * classic centered cumulative sum C_t = n·S_t − t·S_n (prefix sum
    * of deviations from the mean, cleared of the division so every
    * value is an EXACT integer — C_t/n·1000s-of-dollars). The top-10
    * |C_t| days are the level-shift candidates (where the mean before
    * differs most from the mean after). Scale: the prefix window runs
    * over the calendar-bounded day domain (~2.4k rows at any SF, the
    * q_locf/q_interpolate discipline); the fact table never sees a
    * window. Emitted per-candidate: the day, its exact C_t, and the
    * before/after mean levels in cents (rational → one double div). */
  private def qCusum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .select(epochDay(col("o_orderdate")).as("day"),
        Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("day"))
      .agg(expr("sum(c) div 100000").as("v"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val scanned = daily
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("st", sum(col("v")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("cusum", col("n") * col("st") - col("t") * col("s"))
    scanned
      .filter(col("t") < col("n"))
      .orderBy(abs(col("cusum")).desc, col("day")).limit(10)
      .select(col("day"), col("t").as("days_before"), col("cusum"),
        (col("st").cast("double") / col("t")).as("mean_before_k"),
        ((col("s") - col("st")).cast("double") / (col("n") - col("t")))
          .as("mean_after_k"))
      .orderBy(col("day"))
  }

  /** Spearman rank correlation per nation between customer engagement
    * (order count) and customer value (total spend) — the monotone-
    * association audit that is robust to the heavy right tail Pearson
    * chokes on. Ranks come from the two-pass grouped rank (no
    * per-nation window funnel); ties get textbook midranks, carried as
    * 2·rank integers (min_rnk + max_rnk within the tie group — exact,
    * no halves). rho = Pearson on the midranks from five exact integer
    * moments, one fixed double tree. Scale: groupedRank range-
    * partitions each axis; the tie collapse and join-back key on
    * (nation, value) — all shuffles carry (key, long) pairs only. */
  private def qSpearman(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"), sum(Analytics.cents(col("o_totalprice"))).as("y"))
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_custkey").as("ck"),
        col("x").cast("long").as("x"), col("y"))
      .localCheckpoint(eager = false)
    def midranks(orderCol: String, out: String): DataFrame = {
      val ranked = graft.ops.ScalablePrefix.groupedRank(s,
        perCust.select(col("n_name"), col(orderCol).cast("double").as("ord"),
          col("ck")),
        "n_name", "ord", "ck", 32)
      val ties = ranked.groupBy(col("n_name"), col("ord"))
        .agg((min(col("rnk")) + max(col("rnk"))).as(out))
      ranked.select(col("n_name"), col("ck"), col("ord"))
        .join(ties, Seq("n_name", "ord"))
        .select(col("n_name"), col("ck"), col(out))
    }
    val mr = midranks("x", "rx").join(midranks("y", "ry"), Seq("n_name", "ck"))
    mr.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
      .withColumn("rho",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
      .select(col("n_name"), col("n"), col("rho"))
      .orderBy(col("n_name"))
  }

  /** Mann-Whitney U rank-sum test: do URGENT orders carry a different
    * value distribution than LOW ones? The nonparametric two-sample
    * location test (no normality assumed — the right tool for heavy-
    * tailed money). Combined-sample midranks come from the two-pass
    * grouped rank under ONE group — groupedRank range-partitions by
    * the order key, so a single group is still a scalable global rank,
    * not a funnel. Ties carry 2·midrank integers; U, the tie term
    * Σ(t³−t), and both sample sizes are exact longs; the normal
    * approximation z (tie-corrected variance) and the common-language
    * effect size U/(n1·n2) are fixed double trees over those longs. */
  private def qMannWhitney(s: SparkSession, dir: String): DataFrame = {
    val sample = t(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderkey").as("ok"), col("o_orderpriority").as("grp"),
        Analytics.cents(col("o_totalprice")).as("v"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      sample.select(lit("all").as("g"), col("v").cast("double").as("ord"),
        col("ok")),
      "g", "ord", "ok", 32)
    val ties = ranked.groupBy(col("ord"))
      .agg((min(col("rnk")) + max(col("rnk"))).as("mr2"),
        count(lit(1)).as("t"))
      .localCheckpoint(eager = false)
    val tieTerm = ties.agg(
      sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
    val mr = ranked.select(col("ok"), col("ord"))
      .join(ties.select(col("ord"), col("mr2")), "ord")
      .join(sample.select(col("ok"), col("grp")), "ok")
    val stats = mr.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("mr2")).as("sr2"))
      .groupBy()
      .agg(
        max(when(col("grp") === "1-URGENT", col("n"))).as("n1"),
        max(when(col("grp") === "5-LOW", col("n"))).as("n2"),
        max(when(col("grp") === "1-URGENT", col("sr2"))).as("r1x2"))
    stats.crossJoin(broadcast(tieTerm))
      // 2·U1 = 2·R1 − n1(n1+1); every term exact int64
      .withColumn("u1_x2", col("r1x2") - col("n1") * (col("n1") + 1))
      .withColumn("cle",
        col("u1_x2").cast("double") / (lit(2.0) * (col("n1") * col("n2")).cast("double")))
      .withColumn("z",
        (col("u1_x2") - col("n1") * col("n2")).cast("double") /
          (lit(2.0) * sqrt(
            (col("n1") * col("n2")).cast("double") / 12.0 *
              ((col("n1") + col("n2") + 1).cast("double") -
                col("tie3").cast("double") /
                  ((col("n1") + col("n2")).cast("double") *
                    (col("n1") + col("n2") - 1).cast("double"))))))
      .select(col("n1"), col("n2"), col("u1_x2"), col("tie3"),
        col("cle"), col("z"))
  }

  /** Cohen's kappa inter-annotator agreement between two cheap,
    * fully-deterministic quality raters over the corpus — rater A
    * passes docs with >=200 chars, rater B passes docs with >=40
    * whitespace-delimited words (the length/word-count heuristics a
    * curation pipeline actually cross-checks). Chance-corrected
    * agreement collapses to pure integers: kappa = (N·Σdiag − Σrᵢcᵢ) /
    * (N² − Σrᵢcᵢ), so the ONLY double op is the final division. The
    * whole confusion matrix is 4 cells from one scan — the corpus
    * shuffles two booleans, never text. Emits the matrix with the
    * kappa scalar alongside. */
  private def qKappa(s: SparkSession, dir: String): DataFrame = {
    val rated = t(s, dir, "documents")
      .select(
        (col("n_chars") >= 200).as("a"),
        (size(split(col("text"), " ")) >= 40).as("b"))
    val cells = rated.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val rows_ = cells.groupBy(col("a")).agg(sum(col("cnt")).as("ra"))
    val cols_ = cells.groupBy(col("b")).agg(sum(col("cnt")).as("cb"))
    val scalars = cells
      .agg(sum(col("cnt")).as("nn"),
        sum(when(col("a") === col("b"), col("cnt")).otherwise(lit(0L)))
          .as("diag"))
    val pe = rows_.join(cols_, rows_("a") === cols_("b"))
      .agg(sum(col("ra") * col("cb")).as("rc"))
    cells.join(broadcast(rows_), "a").join(broadcast(cols_), "b")
      .crossJoin(broadcast(scalars)).crossJoin(broadcast(pe))
      .select(col("a"), col("b"), col("cnt"), col("ra"), col("cb"),
        ((col("nn") * col("diag") - col("rc")).cast("double") /
          (col("nn") * col("nn") - col("rc")).cast("double")).as("kappa"))
      .orderBy(col("a"), col("b"))
  }

  /** k-core decomposition (k=3, 3 unrolled peel rounds) over the
    * co-purchase graph: each round drops nodes with degree < k and
    * their incident edges — the standard dense-subgraph screen (spam
    * rings, bot cliques, well-connected catalog cores). One degree
    * aggregation + two semi-joins per round, every shuffle carrying
    * (long, long) edges only; round results are localCheckpoint'd so
    * no round replays its predecessors. A fixed round count keeps the
    * oracle replayable CTE-for-CTE (the q_label_prop discipline);
    * at 100 TB the same loop runs to fixpoint with a driver-side
    * emptiness check per round. Emits surviving nodes with their
    * residual in-core degree. */
  private def qKcore(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val half = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    var e = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    for (_ <- 1 to 3) {
      val keep = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= 3).select(col("u"))
        .localCheckpoint(eager = false)
      e = e.join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(eager = false)
    }
    e.groupBy(col("u").as("node")).agg(count(lit(1)).as("core_degree"))
      .orderBy(col("node"))
  }

  /** Negative-pair mining for contrastive training data: every doc
    * gets 3 deterministic pseudo-random negatives. Docs hash into 64
    * buckets (the replayable md5 convention); each anchor draws its
    * candidates from the NEXT bucket — different bucket ⇒ anchor ≠
    * negative by construction, and the candidate fan-out is bounded by
    * one bucket (~corpus/64) instead of the full corpus. Within the
    * candidate set, per-anchor selection ranks by a pair hash through
    * a row_number window PARTITIONED BY anchor — millions of anchor
    * keys hash-spread across executors, no funnel. The emitted triple
    * (anchor, negative, draw rank) replays bit-for-bit. */
  private def qNegatives(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        (h60(concat(lit("neg|"), col("doc_id").cast("string"))) % 64)
          .as("bucket"))
      .localCheckpoint(eager = false)
    val cands = docs.select(col("doc_id").as("neg_id"),
      col("bucket").as("nbucket"))
    val paired = docs
      .join(cands, (col("bucket") + 1) % 64 === col("nbucket"))
      .withColumn("ph",
        h60(concat(col("doc_id").cast("string"), lit("|"),
          col("neg_id").cast("string"))))
    paired
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("ph"), col("neg_id"))))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk").cast("long").as("rnk"), col("neg_id"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** Train/test split leakage audit: the GROUP-level split (hash the
    * customer, every order inherits it) against the naive ROW-level
    * split (hash each order independently). A customer whose orders
    * straddle both splits leaks future behavior into training — the
    * audit counts exactly those. Group-level provably yields zero
    * straddlers; the row-level count is the leak the pipeline would
    * have shipped. Both splits are the replayable md5 gate (80/20),
    * so the emitted counts are reproducible forever — the property an
    * eval-set contract actually needs. One orders scan, shuffles carry
    * (custkey, two split labels). */
  private def qGroupSplit(s: SparkSession, dir: String): DataFrame = {
    val labeled = t(s, dir, "orders")
      .select(col("o_custkey").as("ck"),
        (h60(concat(lit("split|"), col("o_custkey").cast("string"))) % 100 < 80)
          .as("grp_train"),
        (h60(concat(lit("split|"), col("o_orderkey").cast("string"))) % 100 < 80)
          .as("row_train"))
      .localCheckpoint(eager = false)
    def audit(flag: String, method: String): DataFrame = {
      val perCust = labeled.groupBy(col("ck"))
        .agg(sum(when(col(flag), 1L).otherwise(0L)).as("tr"),
          count(lit(1)).as("n"))
      perCust.agg(
        lit(method).as("method"),
        sum(col("tr")).as("train_orders"),
        sum(col("n") - col("tr")).as("test_orders"),
        sum(when(col("tr") > 0 && col("tr") < col("n"), 1L).otherwise(0L))
          .as("straddling_customers"))
    }
    audit("grp_train", "group").unionAll(audit("row_train", "row"))
      .orderBy(col("method"))
  }

  /** Quality-classifier inference — the fastText-style model-scoring
    * step of a curation pipeline, with the MODEL AS DATA: a one-row
    * weight table cross-joined (broadcast) onto the corpus, so
    * swapping trained weights never changes the plan. Features are
    * cheap deterministic text statistics (words, digit chars, length
    * deviation from 500); the logit is an exact integer dot product in
    * milli units — ranking-stable, hash-comparable, no transcendental
    * sigmoid needed because the keep decision only needs the sign.
    * Emits per-source accounting: docs, kept docs, keep rate (ppm),
    * mean logit — the dataset-card row for the filter. */
  private def qQualityModel(s: SparkSession, dir: String): DataFrame = {
    val weights = s.range(1).select(
      lit(40L).as("w_words"), lit(-10L).as("w_digits"),
      lit(-2L).as("w_lendev"), lit(-1500L).as("bias"))
    val scored = t(s, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("words"),
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long")
          .as("digits"),
        abs(col("n_chars") - 500).as("lendev"))
      .crossJoin(broadcast(weights))
      .withColumn("logit_milli",
        col("w_words") * col("words") + col("w_digits") * col("digits") +
          col("w_lendev") * col("lendev") + col("bias"))
    scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("logit_milli") >= 0, 1L).otherwise(0L)).as("kept"),
        sum(col("logit_milli")).as("sum_logit"))
      .withColumn("keep_ppm", expr("kept * 1000000 div n_docs"))
      .withColumn("mean_logit",
        col("sum_logit").cast("double") / col("n_docs").cast("double"))
      .select(col("source"), col("n_docs"), col("kept"), col("keep_ppm"),
        col("mean_logit"))
      .orderBy(col("source"))
  }

  /** Sorted-neighborhood dedup blocking — the third blocking family
    * next to LSH buckets (q_minhash_pairs) and learned clusters
    * (q_semantic_dedup): sort the corpus by a cheap composite key
    * (lang, length, id) and compare each doc only to its w−1=3 sort
    * successors. Ranks come from the two-pass grouped rank per lang
    * (no global-window funnel); the sliding window is an equi-join on
    * rank+j — at 100 TB both sides range-partition on the same key, so
    * the neighbor join is co-partitioned and narrow. Emits candidate
    * pairs within a length tolerance of 5 chars — the candidate set a
    * real pipeline would hand to an exact verifier. */
  private def qSortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      t(s, dir, "documents")
        .select(col("lang"), col("n_chars").cast("double").as("ord"),
          col("doc_id")),
      "lang", "ord", "doc_id", 32)
      .select(col("lang"), col("doc_id"), col("rnk"), col("ord"))
      .localCheckpoint(eager = false)
    val offsets = s.range(1, 4).select(col("id").as("j"))
    ranked.as("a")
      .crossJoin(broadcast(offsets))
      .join(ranked.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.rnk") + col("j") === col("b.rnk"))
      .filter(abs(col("b.ord") - col("a.ord")) <= 5.0)
      .select(col("a.lang").as("lang"), col("a.doc_id").as("d1"),
        col("b.doc_id").as("d2"),
        (col("b.ord") - col("a.ord")).cast("long").as("len_diff"))
      .orderBy(col("lang"), col("d1"), col("d2"))
  }

  /** Distributed bootstrap confidence interval by POISSON resampling
    * (the classic "bag of little bootstraps" building block): true
    * multinomial resampling needs a global draw, but Poisson(1)
    * weights per (row, replica) are independent — each row computes
    * its own 64 replica weights from the replayable md5 gate mapped
    * through the integer-threshold Poisson CDF, so the whole resample
    * is one explode + one aggregation, no coordination. Replica means
    * stay exact (Σwx, Σw longs; one integer milli-division); the CI is
    * the nearest-rank p5/p95 of the 64 replica means — a window over
    * 64 rows, nothing data-sized. Emits point estimate + interval for
    * the mean order value. */
  private def qBootstrap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = t(s, dir, "orders")
      .select(col("o_orderkey").as("ok"),
        Analytics.cents(col("o_totalprice")).as("x"))
    val replicas = src
      .select(col("ok"), col("x"),
        explode(sequence(lit(1), lit(64))).as("b"))
      .withColumn("u",
        h60(concat(lit("boot|"), col("ok").cast("string"), lit("|"),
          col("b").cast("string"))) % 100000)
      // Poisson(1) CDF at 1e-5 grain: P(<=k) for k = 0..7, tail -> 8
      .withColumn("w",
        when(col("u") < 36788, 0L).when(col("u") < 73576, 1L)
          .when(col("u") < 91970, 2L).when(col("u") < 98101, 3L)
          .when(col("u") < 99634, 4L).when(col("u") < 99941, 5L)
          .when(col("u") < 99992, 6L).when(col("u") < 99999, 7L)
          .otherwise(8L))
    val reps = replicas.groupBy(col("b"))
      .agg(sum(col("w") * col("x")).as("sxw"), sum(col("w")).as("sw"))
      .withColumn("mean_milli", expr("sxw * 10 div sw"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("mean_milli"), col("b"))))
    val point = src.agg(expr("sum(x) * 10 div count(1)").as("point_milli"))
    reps.agg(
        max(when(col("r") === 4, col("mean_milli"))).as("lo_milli"),
        max(when(col("r") === 61, col("mean_milli"))).as("hi_milli"),
        count(lit(1)).as("n_replicas"))
      .crossJoin(broadcast(point))
      .select(col("n_replicas"), col("point_milli"), col("lo_milli"),
        col("hi_milli"))
  }

  /** Data-quality assertion suite (the Deequ/dbt-tests shape): six
    * declarative checks — uniqueness, not-null, accepted values,
    * range, referential integrity, and an upper-bound check that
    * REALLY fails on this data (violations > 0 proves the suite
    * detects, not vacuously passes). Each check is one aggregate over
    * a shared single scan (the uniqueness check adds the only
    * shuffle); the FK probe broadcasts the distinct parent keys. One
    * (check_name, n_checked, violations, passed) row per assertion —
    * the table a pipeline gate consumes. */
  private def qDqChecks(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val uniq = o.agg(
      lit("o_orderkey_unique").as("check_name"),
      count(lit(1)).as("n_checked"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("violations"))
    val scanChecks = o.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_null"),
      sum(when(col("o_orderpriority").isin(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        0L).otherwise(1L)).as("v_accept"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("v_pos"),
      sum(when(col("o_totalprice") > 400000.0, 1L).otherwise(0L)).as("v_range"))
      .localCheckpoint(eager = false)
    def pick(name: String, vcol: String): DataFrame =
      scanChecks.select(lit(name).as("check_name"), col("n").as("n_checked"),
        col(vcol).as("violations"))
    val fk = o.join(
        broadcast(t(s, dir, "customer").select(col("c_custkey")).distinct()),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(lit("o_custkey_references_customer").as("check_name"),
        count(lit(1)).as("n_checked"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("violations"))
    uniq
      .unionAll(pick("o_custkey_not_null", "v_null"))
      .unionAll(pick("o_orderpriority_accepted", "v_accept"))
      .unionAll(pick("o_totalprice_positive", "v_pos"))
      .unionAll(pick("o_totalprice_below_400k", "v_range"))
      .unionAll(fk)
      .withColumn("passed", col("violations") === 0)
      .orderBy(col("check_name"))
  }

  /** k-fold cross-validation split audit (k=5, customers as the
    * leakage group — the q_group_split discipline extended to folds):
    * fold membership from the replayable md5 gate, then the balance
    * table a training pipeline checks before trusting the folds —
    * distinct customers, orders, exact revenue, and each fold's
    * revenue share in ppm of the broadcast grand total. Skewed folds
    * (a whale customer landing in one fold) show up as share drift;
    * everything is one orders scan + one 5-row broadcast join. */
  private def qCrossVal(s: SparkSession, dir: String): DataFrame = {
    val labeled = t(s, dir, "orders")
      .select(col("o_custkey"),
        (h60(concat(lit("fold|"), col("o_custkey").cast("string"))) % 5)
          .as("fold"),
        Analytics.cents(col("o_totalprice")).as("c"))
    val perFold = labeled.groupBy(col("fold"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"), sum(col("c")).as("revenue_cents"))
      .localCheckpoint(eager = false)
    val total = perFold.agg(sum(col("revenue_cents")).as("tot"))
    perFold.crossJoin(broadcast(total))
      .select(col("fold"), col("n_customers"), col("n_orders"),
        col("revenue_cents"),
        expr("revenue_cents * 1000000 div tot").as("share_ppm"))
      .orderBy(col("fold"))
  }

  /** Small-files compaction planner — the lakehouse maintenance op:
    * assign files (docs standing in, n_chars as size) to target-sized
    * output bins by GREEDY SEQUENTIAL packing in id order, formulated
    * on the two-pass range-partitioned prefix sum: a file's bin is its
    * EXCLUSIVE cumulative size div the 4000-char target — no window
    * funnel, no driver-side loop, identical at any corpus size. Emits
    * the plan's bin manifest (files, bytes, id range per bin) — what a
    * compaction executor would consume. */
  private def qCompaction(s: SparkSession, dir: String): DataFrame = {
    val sized = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val summed = graft.ops.ScalablePrefix.runningSum(s, sized,
      keyCol = "doc_id", valueCol = "n_chars", numPartitions = 32)
    summed
      .withColumn("bin", expr("(run_sum - n_chars) div 4000"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bin_chars"),
        min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
      .orderBy(col("bin"))
  }

  /** Monthly seasonal index of daily revenue — the decomposition-lite
    * seasonality audit: each calendar month's mean daily revenue as a
    * ppm ratio of the overall mean daily revenue (100% = 1e6). Daily
    * values quantize to thousands-of-dollars longs (the q_acf grain,
    * which keeps every product inside int64 at any SF); the index is
    * two exact integer divisions — no float crosses the engines. The
    * fact table collapses to the calendar-bounded daily table in one
    * aggregation; everything after is month-cardinality work. */
  private def qSeasonal(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(epochDay(col("o_orderdate")).as("day"),
        month(col("o_orderdate")).cast("long").as("m"),
        Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("day"), col("m"))
      .agg(expr("sum(c) div 100000").as("v"))
      .localCheckpoint(eager = false)
    val overall = daily.agg(count(lit(1)).as("nn"), sum(col("v")).as("ss"))
    daily.groupBy(col("m"))
      .agg(count(lit(1)).as("n_days"), sum(col("v")).as("sum_k"))
      .crossJoin(broadcast(overall))
      .select(col("m").as("month"), col("n_days"), col("sum_k"),
        expr("((sum_k div n_days) * 1000000) div (ss div nn)").as("index_ppm"))
      .orderBy(col("month"))
  }

  /** Calibration (reliability) table for the quality classifier: bin
    * the q_quality_model logit, and per bin compare predicted
    * confidence against the ACTUAL positive rate of a reference label
    * (docs >= 200 chars) — the standard post-training audit before a
    * filter's threshold is trusted. Bins are fixed-width integer
    * buckets of the exact milli-logit (clamped to ±10), so the whole
    * table is one scan + one 21-row aggregation; rates are exact ppm.
    * A well-calibrated filter shows monotone rates across bins. */
  private def qCalibration(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(
        (col("n_chars") >= 200).as("label"),
        (lit(40L) * size(split(col("text"), " ")).cast("long") +
          lit(-10L) * length(regexp_replace(col("text"), "[^0-9]", ""))
            .cast("long") +
          lit(-2L) * abs(col("n_chars") - 500) + lit(-1500L))
          .as("logit_milli"))
      .withColumn("bin",
        greatest(least(expr("logit_milli div 2000"), lit(10L)), lit(-10L)))
    scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("positives"),
        sum(col("logit_milli")).as("sum_logit"))
      .withColumn("pos_rate_ppm", expr("positives * 1000000 div n"))
      .select(col("bin"), col("n"), col("positives"), col("pos_rate_ppm"),
        col("sum_logit"))
      .orderBy(col("bin"))
  }

  /** Degree distribution of the co-purchase graph — the power-law
    * audit run before trusting any graph algorithm's cost model (a
    * heavy tail says: salt the hubs, cap the wedges). Two aggregations
    * (node degree, then nodes per degree), both shuffling only longs;
    * output is bounded by the max degree, not the data. */
  private def qDegreeDist(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val half = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val edges = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
    edges.groupBy(col("u")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))
  }

  /** Blocking-quality audit for the MinHash-LSH dedup path — the two
    * numbers an entity-resolution/dedup pipeline must report before
    * the blocking strategy is trusted (Christen's RR/PC metrics):
    * REDUCTION RATIO (how many of the all-pairs comparisons the
    * blocking avoided) and PAIRS COMPLETENESS (what fraction of true
    * near-dups — exact Jaccard >= 0.5 — the candidate set still
    * contains). Truth comes from the inverted-index exact join,
    * candidates from the 8-band LSH; the intersection is a semi-join
    * on the pair key. Everything lands in ONE row of exact longs/ppm;
    * the n_possible product is the only value that can exceed int64
    * (at ~10^9.5 docs — documented, not guarded). */
  private def qBlockingAudit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", k = 5, minSim = 0.5)
      .select(col("d1"), col("d2"))
      .localCheckpoint(eager = false)
    // one signature pass feeds the buckets AND the doc count (a doc has
    // a signature iff it has >= 1 shingle) — minhashCandidates would
    // recompute the signatures, and a shingleIndex count would re-explode
    // the corpus a third time
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text",
        k = 5, numHashes = 8)
      .localCheckpoint(eager = false)
    val buckets = Dedup.lshBuckets(sigs, "doc_id", numHashes = 8, rowsPerBand = 1)
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
      .localCheckpoint(eager = false)
    val nDocs = sigs.agg(count(lit(1)).as("n_docs"))
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    val nFound = truth.join(cand, Seq("d1", "d2"), "left_semi")
      .agg(count(lit(1)).as("true_found"))
    nDocs.crossJoin(broadcast(nTrue)).crossJoin(broadcast(nCand))
      .crossJoin(broadcast(nFound))
      .withColumn("n_possible", expr("n_docs * (n_docs - 1) div 2"))
      .select(col("n_docs"), col("n_possible"), col("n_true"),
        col("n_candidates"), col("true_found"),
        expr("(n_possible - n_candidates) * 1000000 div n_possible")
          .as("reduction_ppm"),
        expr("true_found * 1000000 div nullif(n_true, 0)")
          .as("completeness_ppm"))
  }

  /** MinHash sketch-accuracy probe — the q_recall_at_k discipline
    * applied to the dedup sketch: for every LSH candidate pair, the
    * SKETCH's Jaccard estimate (matching signature components / 8,
    * exact ppm) next to the EXACT shingle Jaccard, so the sketch's
    * variance is measured on real data instead of assumed from theory.
    * Signatures join back to the pair key (two narrow hash joins);
    * pairs whose shared shingles were all df-capped keep estimate > 0
    * and exact 0 — visible, not hidden (coalesce, left join). */
  private def qMinhashAccuracy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", k = 5, numHashes = 8)
      .localCheckpoint(eager = false)
    // candidates from the SAME checkpointed signatures (minhashCandidates
    // would recompute them from the corpus)
    val buckets = Dedup.lshBuckets(sigs, "doc_id", numHashes = 8, rowsPerBand = 1)
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", k = 5, minSim = 0.0)
      .select(col("d1"), col("d2"), col("shared"), col("jaccard"))
    val a = sigs.select(col("doc_id").as("d1") +:
      (0 until 8).map(j => col(s"h$j").as(s"a$j")): _*)
    val b = sigs.select(col("doc_id").as("d2") +:
      (0 until 8).map(j => col(s"h$j").as(s"b$j")): _*)
    val estExpr = (0 until 8).map(j =>
      when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L)).reduce(_ + _)
    cand.join(a, "d1").join(b, "d2")
      .withColumn("est_matches", estExpr)
      .join(exact, Seq("d1", "d2"), "left")
      .select(col("d1"), col("d2"), col("est_matches"),
        (col("est_matches") * 125000L).as("est_ppm"),
        coalesce(col("shared"), lit(0L)).as("shared"),
        coalesce(col("jaccard"), lit(0.0)).as("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** RFM customer segmentation — the classic warehouse scoring op:
    * recency (latest order day), frequency (orders), monetary (exact
    * cents) per customer, each ranked into ARITHMETIC quintiles
    * (score = ((rank−1)·5) div n + 1 — spelled out in both engines
    * rather than trusting ntile(), whose remainder placement is
    * engine-specific). Ranks come from the two-pass grouped rank under
    * one group (scalable global rank, the q_mann_whitney shape), three
    * axes in parallel. Emits the segment distribution: customers and
    * mean spend per (r, f, m) cell — the table a campaign targets. */
  private def qRfm(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(epochDay(col("o_orderdate"))).as("recency"),
        count(lit(1)).as("freq"),
        sum(Analytics.cents(col("o_totalprice"))).as("monetary"))
      .localCheckpoint(eager = false)
    def score(axis: String, out: String): DataFrame =
      graft.ops.ScalablePrefix.groupedRank(s,
        perCust.select(lit("all").as("g"),
          col(axis).cast("double").as("ord"), col("o_custkey")),
        "g", "ord", "o_custkey", 32)
        .select(col("o_custkey"),
          (expr("(rnk - 1) * 5 div grp_n") + 1).as(out))
    perCust
      .join(score("recency", "r_score"), "o_custkey")
      .join(score("freq", "f_score"), "o_custkey")
      .join(score("monetary", "m_score"), "o_custkey")
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        expr("sum(monetary) div count(1)").as("mean_monetary_cents"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** Lag-feature matrix builder — the feature-engineering step of a
    * forecasting pipeline: per customer order history, the previous
    * two order values, the delta, and the rolling mean of the prior
    * three orders (exact integer division; null until history exists,
    * exactly as a leakage-safe feature must be — no current-row
    * peeking). Windows partition on the customer key: millions of
    * customers hash-spread across executors, no funnel. A 1%
    * deterministic customer slice bounds the emitted matrix. */
  private def qLagFeatures(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val wPrev3 = w.rowsBetween(-3, -1)
    t(s, dir, "orders")
      .filter(col("o_custkey") % 100 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        epochDay(col("o_orderdate")).as("day"),
        Analytics.cents(col("o_totalprice")).as("c"))
      .withColumn("lag1", lag(col("c"), 1).over(w))
      .withColumn("lag2", lag(col("c"), 2).over(w))
      .withColumn("delta1", col("c") - col("lag1"))
      .withColumn("prev3_mean",
        (sum(col("c")).over(wPrev3) / count(col("c")).over(wPrev3))
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("day"), col("c"),
        col("lag1"), col("lag2"), col("delta1"), col("prev3_mean"))
      .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
  }

  /** Degree assortativity of the co-purchase graph: Pearson r between
    * the endpoint degrees over every directed edge — do hubs link to
    * hubs (r>0, social-style) or to leaves (r<0, hub-and-spoke)? The
    * number that decides whether hub-capping (q_link_pred's guard) is
    * load-bearing. Degrees join back onto the edge list (two narrow
    * hash joins on the node key); five exact integer moments, one
    * fixed double tree. */
  private def qAssortativity(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val half = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val edges = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
    edges
      .join(deg.select(col("u"), col("d").as("du")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
      .agg(count(lit(1)).as("n_edges"),
        sum(col("du")).as("sx"), sum(col("dv")).as("sy"),
        sum(col("du") * col("du")).as("sxx"),
        sum(col("dv") * col("dv")).as("syy"),
        sum(col("du") * col("dv")).as("sxy"))
      .withColumn("assortativity",
        (col("n_edges") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n_edges") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n_edges") * col("syy") - col("sy") * col("sy")).cast("double"))))
      .select(col("n_edges"), col("assortativity"))
  }

  /** Shannon entropy + KL divergence of each nation's order-priority
    * mix vs the global mix — the information-theoretic balance /
    * drift screen (a nation whose KL spikes routes differently than
    * the fleet). The category set is FIXED (5 priorities), so both
    * statistics are a fixed left-associated 5-term double tree over
    * exact long counts — never an order-dependent double reduction.
    * ln() may differ from DuckDB's by 1 ulp (measured 1/400 inputs),
    * so results ship as integer micro-nats via floor(x*1e6+0.5): a
    * last-ulp drift (~1e-16 relative) cannot move the floor except
    * within 1e-10 of an integer boundary, and the gate at both SFs
    * verifies no value sits there. One broadcast-joined scan, one
    * 25-group agg, one scalar agg — no extra shuffle at any scale. */
  private def qEntropy(s: SparkSession, dir: String): DataFrame = {
    val cnt = (p: String) =>
      sum(when(col("o_orderpriority") === p, 1L).otherwise(0L))
    val byNation = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        priorities.zipWithIndex.map { case (p, i) => cnt(p).as(s"c$i") }: _*)
    val glob = t(s, dir, "orders")
      .agg(count(lit(1)).as("gn"),
        priorities.zipWithIndex.map { case (p, i) => cnt(p).as(s"g$i") }: _*)
    def entTerm(i: Int): org.apache.spark.sql.Column = {
      val p = col(s"c$i").cast("double") / col("n").cast("double")
      when(col(s"c$i") > 0, p * log(p)).otherwise(lit(0.0))
    }
    def klTerm(i: Int): org.apache.spark.sql.Column = {
      val p = col(s"c$i").cast("double") / col("n").cast("double")
      val ratio = (col(s"c$i") * col("gn")).cast("double") /
        (col("n") * col(s"g$i")).cast("double")
      when(col(s"c$i") > 0, p * log(ratio)).otherwise(lit(0.0))
    }
    byNation.crossJoin(broadcast(glob))
      .withColumn("entropy_unat",
        floor((lit(0.0) - (0 to 4).map(entTerm).reduce(_ + _)) * 1000000 + 0.5)
          .cast("long"))
      .withColumn("kl_unat",
        floor((0 to 4).map(klTerm).reduce(_ + _) * 1000000 + 0.5).cast("long"))
      .select(col("n_name"), col("n"), col("entropy_unat"), col("kl_unat"))
      .orderBy(col("n_name"))
  }

  /** Mutual information between return flag and line status — the
    * categorical-dependence screen a feature-selection pass runs over
    * every column pair (near-zero MI ⇒ the pair carries no joint
    * signal). The 3×2 grid is FIXED, so MI and both marginal
    * entropies are fixed double trees over the 6 cell counts + 5
    * marginals, all from ONE scan collapsing to a single row
    * (map-side partial agg; nothing shuffles but 12 longs). Same
    * micro-nat integer contract as q_entropy. */
  private def qMutualInfo(s: SparkSession, dir: String): DataFrame = {
    val flags = Seq("A", "N", "R")
    val stats = Seq("F", "O")
    val cells = for { f <- flags; st <- stats } yield (f, st)
    val agg0 = t(s, dir, "lineitem").agg(
      count(lit(1)).as("n"),
      cells.zipWithIndex.map { case ((f, st), i) =>
        sum(when(col("l_returnflag") === f && col("l_linestatus") === st,
          1L).otherwise(0L)).as(s"c$i")
      } ++ flags.zipWithIndex.map { case (f, i) =>
        sum(when(col("l_returnflag") === f, 1L).otherwise(0L)).as(s"fx$i")
      } ++ stats.zipWithIndex.map { case (st, i) =>
        sum(when(col("l_linestatus") === st, 1L).otherwise(0L)).as(s"gy$i")
      }: _*)
    def miTerm(i: Int): org.apache.spark.sql.Column = {
      val fx = col(s"fx${i / 2}")
      val gy = col(s"gy${i % 2}")
      val p = col(s"c$i").cast("double") / col("n").cast("double")
      val ratio = (col(s"c$i") * col("n")).cast("double") /
        (fx * gy).cast("double")
      when(col(s"c$i") > 0, p * log(ratio)).otherwise(lit(0.0))
    }
    def hTerm(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val p = c.cast("double") / col("n").cast("double")
      when(c > 0, p * log(p)).otherwise(lit(0.0))
    }
    agg0
      .withColumn("mi_unat",
        floor((0 to 5).map(miTerm).reduce(_ + _) * 1000000 + 0.5).cast("long"))
      .withColumn("h_flag_unat",
        floor((lit(0.0) - (0 to 2).map(i => hTerm(col(s"fx$i"))).reduce(_ + _)) *
          1000000 + 0.5).cast("long"))
      .withColumn("h_status_unat",
        floor((lit(0.0) - (0 to 1).map(i => hTerm(col(s"gy$i"))).reduce(_ + _)) *
          1000000 + 0.5).cast("long"))
      .select(col("n"), col("c0"), col("c1"), col("c2"), col("c3"),
        col("c4"), col("c5"), col("mi_unat"), col("h_flag_unat"),
        col("h_status_unat"))
  }

  /** Confusion-matrix evaluation of the n-gram lang-ID heuristic
    * against the corpus's labeled `lang` column, swept over three
    * density thresholds — the precision/recall/F1 curve every
    * curation classifier ships with. The density compare is kept in
    * integers (hits·1000 ≥ thr·tokens ⟺ density ≥ thr/1000), so the
    * whole query — matrix cells, precision, recall, F1, accuracy in
    * ppm — is exact int64 arithmetic end-to-end. One text scan fans
    * out ×3 thresholds AFTER reducing each doc to two small ints;
    * the shuffle carries (threshold, 4 longs). */
  private def qConfusion(s: SparkSession, dir: String): DataFrame = {
    val thr = s.range(1)
      .select(explode(array(lit(60L), lit(80L), lit(100L))).as("thr_milli"))
    val scored = TextOps.withLangId(t(s, dir, "documents"), "text")
      .select(col("en_hits").cast("long").as("en_hits"),
        col("n_tokens").cast("long").as("n_tokens"),
        (col("lang") === "en").as("actual"))
    scored.crossJoin(broadcast(thr))
      .withColumn("pred",
        col("en_hits") * 1000L >= col("thr_milli") * col("n_tokens"))
      .groupBy(col("thr_milli"))
      .agg(
        sum(when(col("pred") && col("actual"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("actual"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("actual"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("actual"), 1L).otherwise(0L)).as("tn"))
      .withColumn("precision_ppm",
        expr("CASE WHEN tp + fp > 0 THEN tp * 1000000 div (tp + fp) ELSE 0 END"))
      .withColumn("recall_ppm",
        expr("CASE WHEN tp + fn > 0 THEN tp * 1000000 div (tp + fn) ELSE 0 END"))
      .withColumn("f1_ppm",
        expr("CASE WHEN precision_ppm + recall_ppm > 0 THEN " +
          "2 * precision_ppm * recall_ppm div (precision_ppm + recall_ppm) " +
          "ELSE 0 END"))
      .withColumn("accuracy_ppm",
        expr("(tp + tn) * 1000000 div (tp + fp + fn + tn)"))
      .orderBy(col("thr_milli"))
  }

  /** Largest-remainder (Hamilton) apportionment: divide 1000 shard
    * slots across nations proportional to customer count — the exact
    * integer answer to "split a fixed budget fairly", used verbatim
    * for partition-budget and sampling-quota allocation. quota·1000
    * splits into div/mod longs; the leftover slots go to the largest
    * remainders (ties broken by name — deterministic). The
    * row_number window runs over #nations rows (25), not data rows —
    * the single-partition window is bounded by group cardinality at
    * any data scale. */
  private def qApportion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnts = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val tot = cnts.agg(sum(col("cnt")).as("tot"))
    val based = cnts.crossJoin(broadcast(tot))
      .withColumn("base", expr("(1000 * cnt) div tot"))
      .withColumn("rem", expr("(1000 * cnt) % tot"))
      .localCheckpoint(eager = false)
    val extra = based.agg((lit(1000L) - sum(col("base"))).as("extra"))
    based.crossJoin(broadcast(extra))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("rem").desc, col("n_name"))))
      .withColumn("seats",
        col("base") + when(col("rn") <= col("extra"), 1L).otherwise(0L))
      .select(col("n_name"), col("cnt"), col("base"), col("rem"),
        col("seats"))
      .orderBy(col("n_name"))
  }

  /** ROC AUC of the lang-ID density score as an English detector —
    * the threshold-free companion to q_confusion's fixed-threshold
    * sweep. AUC is computed as the rank-sum statistic (AUC =
    * U/(n⁺·n⁻), the probability a random positive outranks a random
    * negative), so it rides the SAME scalable machinery as
    * q_mann_whitney: two-pass range-partitioned global rank, tie
    * midranks as 2·rank integers, U exact int64, one final ppm
    * integer division. No score histogram, no threshold grid — exact
    * AUC at any corpus size. */
  private def qAuc(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.withLangId(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("en_density").cast("double").as("dens"),
        (col("lang") === "en").as("pos"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      scored.select(lit("all").as("g"), col("dens").as("ord"), col("doc_id")),
      "g", "ord", "doc_id", 32)
    val ties = ranked.groupBy(col("ord"))
      .agg((min(col("rnk")) + max(col("rnk"))).as("mr2"))
    val mr = ranked.select(col("doc_id"), col("ord"))
      .join(ties, "ord")
      .join(scored.select(col("doc_id"), col("pos")), "doc_id")
    mr.agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("pos"), col("mr2")).otherwise(lit(0L))).as("rpos_x2"))
      .withColumn("u_x2", col("rpos_x2") - col("n_pos") * (col("n_pos") + 1))
      .withColumn("auc_ppm", expr("u_x2 * 1000000 div (2 * n_pos * n_neg)"))
      .select(col("n_pos"), col("n_neg"), col("u_x2"), col("auc_ppm"))
  }

  /** Theil-Sen robust trend: per-nation median of all pairwise
    * monthly-revenue slopes — the outlier-proof replacement for OLS
    * trend (one wild month cannot move a median of slopes). The pair
    * join runs on the MONTH domain (≤ #months² rows per nation,
    * independent of data scale — the q_acf/q_trend_test discipline);
    * slopes are exact milli-dollars-per-month via `div` (truncation
    * matches DuckDB `//` on negatives, verified); the median is the
    * lower-median row_number selection per nation. The per-nation
    * window is bounded by the month-domain square, not by data. */
  private def qTheilSen(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("cents"))
      .withColumn("dollars", expr("cents div 100"))
      .localCheckpoint(eager = false)
    val pairs = monthly.as("a").join(monthly.as("b"),
        col("a.n_name") === col("b.n_name") && col("a.m") < col("b.m"))
      .select(col("a.n_name").as("n_name"), col("a.m").as("mi"),
        col("b.m").as("mj"),
        ((col("b.dollars") - col("a.dollars")) * 1000L).as("dy_milli"),
        (col("b.m") - col("a.m")).cast("long").as("dx"))
      .withColumn("slope_milli", expr("dy_milli div dx"))
    pairs
      .withColumn("rnk", row_number().over(Window.partitionBy(col("n_name"))
        .orderBy(col("slope_milli"), col("mi"), col("mj"))))
      .withColumn("n_pairs",
        count(lit(1)).over(Window.partitionBy(col("n_name"))))
      .filter(col("rnk") === expr("(n_pairs + 1) div 2"))
      .select(col("n_name"), col("n_pairs"), col("slope_milli"))
      .orderBy(col("n_name"))
  }

  /** Newman modularity of the 2-round label-propagation partition
    * over the co-purchase graph — the quality score that tells you
    * whether the communities the propagation found are real
    * structure or noise (Q≈0). Exact-integer formulation:
    * Q = Σ_c (4m·e_c − d_c²) / (4m²), so the numerator is a sum of
    * longs (intra-edge counts and community degree sums from two
    * narrow joins against the broadcast-size label table) and the
    * ONLY double op is the final division. Reuses LabelProp.run —
    * the partition scored is literally q_label_prop's output. */
  private def qModularity(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val half = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    val edges = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    val labels = graft.ops.LabelProp.run(edges, rounds = 2)
      .localCheckpoint(eager = false)
    val m = half.agg(count(lit(1)).as("m"))
    val intra = half
      .join(labels.select(col("node").as("u"), col("lab").as("lu")), "u")
      .join(labels.select(col("node").as("v"), col("lab").as("lv")), "v")
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("community")).agg(count(lit(1)).as("e_c"))
    val degc = edges
      .join(labels.select(col("node").as("u"), col("lab")), "u")
      .groupBy(col("lab").as("community")).agg(count(lit(1)).as("d_c"))
    degc.join(intra, Seq("community"), "left")
      .withColumn("e_c", coalesce(col("e_c"), lit(0L)))
      .crossJoin(broadcast(m))
      .agg(max(col("m")).as("m"), count(lit(1)).as("n_communities"),
        sum(lit(4L) * col("m") * col("e_c") - col("d_c") * col("d_c"))
          .as("num"))
      .withColumn("modularity",
        col("num").cast("double") / (lit(4L) * col("m") * col("m")).cast("double"))
      .select(col("m"), col("n_communities"), col("modularity"))
  }

  /** Mean reciprocal rank of the IVF index against brute-force truth:
    * for each query, where does the TRUE nearest neighbor land in the
    * index's ranking (0 = not retrieved)? The single-number ranking
    * audit that catches what recall@k hides — an index can have high
    * recall while burying the true hit at rank 40. Truth is the
    * rank-1 brute-force neighbor (broadcast queries, per-partition
    * top-1 heaps); the index ranking reuses the bounded
    * stratifiedTopN heap machinery (n=50) with the fixed-point
    * distkey convention; reciprocal ranks and the mean are exact ppm
    * integers. */
  private def qMrr(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
      .localCheckpoint(eager = false)
    val queries = emb.filter(col("vec_id").isin(0, 7, 42, 99, 123))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(assign.select(col("vec_id").as("qid"), col("cid").as("qcid")), "qid")
    def keyed(scored: DataFrame): DataFrame = scored.select(col("qid"),
      col("vec_id"),
      lpad(greatest(lit(0L),
          floor((lit(1.0) - col("cosine")) * 1e9 + 0.5).cast("long")).cast("string"),
        12, "0").as("distkey"))
    val truthNn = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .crossJoin(broadcast(queries.select(col("qid"), col("qv"))))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 1)
      .select(col("qid").cast("long").as("qid"), col("vec_id").as("nn_id"))
    val ivfRanked = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .join(assign, "vec_id")
        .join(broadcast(queries), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 50)
      .select(col("qid").cast("long").as("qid"), col("rn"),
        col("vec_id").as("nn_id"))
    val perQ = truthNn.join(ivfRanked, Seq("qid", "nn_id"), "left")
      .withColumn("rank_in_ivf", coalesce(col("rn"), lit(0L)))
      .withColumn("rr_ppm",
        when(col("rank_in_ivf") > 0, expr("1000000 div rank_in_ivf"))
          .otherwise(lit(0L)))
      .localCheckpoint(eager = false)
    val mrr = perQ.agg(sum(col("rr_ppm")).as("srr"), count(lit(1)).as("nq"))
    perQ.crossJoin(broadcast(mrr))
      .withColumn("mrr_ppm", expr("srr div nq"))
      .select(col("qid"), col("nn_id"), col("rank_in_ivf"), col("rr_ppm"),
        col("mrr_ppm"))
      .orderBy(col("qid"))
  }

  /** Population stability index between two order-date cohorts (1996
    * vs 2000) over 8 FIXED price brackets — the drift monitor every
    * production scoring pipeline runs before trusting a model trained
    * on last year's distribution. Each bracket's PSI contribution
    * (p_a−p_b)·ln(p_a/p_b) is a per-ROW double tree over exact
    * counts, shipped as micro-nat integers; the TOTAL is the sum of
    * those integers (order-independent by construction — summing the
    * rounded terms, not the doubles). One scan, 8-group agg,
    * broadcast totals. */
  private def qPsi(s: SparkSession, dir: String): DataFrame = {
    val bracket = expr(
      """CASE WHEN o_totalprice < 50000 THEN 0 WHEN o_totalprice < 100000 THEN 1
        | WHEN o_totalprice < 150000 THEN 2 WHEN o_totalprice < 200000 THEN 3
        | WHEN o_totalprice < 250000 THEN 4 WHEN o_totalprice < 300000 THEN 5
        | WHEN o_totalprice < 400000 THEN 6 ELSE 7 END""".stripMargin)
    val bins = t(s, dir, "orders")
      .filter(year(col("o_orderdate")).isin(1996, 2000))
      .groupBy(bracket.cast("long").as("bin"))
      .agg(
        sum(when(year(col("o_orderdate")) === 1996, 1L).otherwise(0L)).as("ca"),
        sum(when(year(col("o_orderdate")) === 2000, 1L).otherwise(0L)).as("cb"))
      .localCheckpoint(eager = false)
    val tots = bins.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val terms = bins.crossJoin(broadcast(tots))
      .withColumn("term_unat",
        when(col("ca") > 0 && col("cb") > 0,
          floor((col("ca").cast("double") / col("na").cast("double") -
              col("cb").cast("double") / col("nb").cast("double")) *
            log((col("ca") * col("nb")).cast("double") /
              (col("na") * col("cb")).cast("double")) * 1000000 + 0.5)
            .cast("long"))
          .otherwise(lit(0L)))
      .localCheckpoint(eager = false)
    val tot = terms.agg(sum(col("term_unat")).as("psi_unat"))
    terms.crossJoin(broadcast(tot))
      .select(col("bin"), col("ca"), col("cb"), col("term_unat"),
        col("psi_unat"))
      .orderBy(col("bin"))
  }

  /** Weight-of-evidence / information-value screen: 5 fixed price
    * brackets of lineitem vs the returned flag — the classic credit-
    * scoring feature-power audit (IV < 0.02 ⇒ the feature is useless;
    * > 0.3 ⇒ strong). WOE_i = ln((g_i·B)/(b_i·G)) and the IV terms
    * are per-row double trees over exact counts shipped as micro-nat
    * integers; total IV = sum of the integer terms (the q_psi
    * contract). One scan, 5-group agg, broadcast totals. */
  private def qWoeIv(s: SparkSession, dir: String): DataFrame = {
    val bracket = expr(
      """CASE WHEN l_extendedprice < 20000 THEN 0
        | WHEN l_extendedprice < 40000 THEN 1
        | WHEN l_extendedprice < 60000 THEN 2
        | WHEN l_extendedprice < 80000 THEN 3 ELSE 4 END""".stripMargin)
    val bins = t(s, dir, "lineitem")
      .groupBy(bracket.cast("long").as("bin"))
      .agg(
        sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L)).as("g"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("b"))
      .localCheckpoint(eager = false)
    val tots = bins.agg(sum(col("g")).as("tg"), sum(col("b")).as("tb"))
    val terms = bins.crossJoin(broadcast(tots))
      .withColumn("woe_unat",
        when(col("g") > 0 && col("b") > 0,
          floor(log((col("g") * col("tb")).cast("double") /
              (col("b") * col("tg")).cast("double")) * 1000000 + 0.5)
            .cast("long"))
          .otherwise(lit(0L)))
      .withColumn("term_unat",
        when(col("g") > 0 && col("b") > 0,
          floor((col("g").cast("double") / col("tg").cast("double") -
              col("b").cast("double") / col("tb").cast("double")) *
            log((col("g") * col("tb")).cast("double") /
              (col("b") * col("tg")).cast("double")) * 1000000 + 0.5)
            .cast("long"))
          .otherwise(lit(0L)))
      .localCheckpoint(eager = false)
    val tot = terms.agg(sum(col("term_unat")).as("iv_unat"))
    terms.crossJoin(broadcast(tot))
      .select(col("bin"), col("g"), col("b"), col("woe_unat"),
        col("term_unat"), col("iv_unat"))
      .orderBy(col("bin"))
  }

  /** Per-node local clustering coefficient over the co-purchase
    * graph: 2·T_v / (d_v·(d_v−1)) in exact ppm — the node-level
    * "how clique-like is my neighborhood" score (q_triangles gives
    * the global count; this gives the distribution). Triangles are
    * enumerated once on id-oriented half edges (u<v<w — each
    * triangle exactly once, the standard sub-quadratic edge-join;
    * at real scale the orientation key becomes degree order to bound
    * the join fan-out, same plan shape) and unpivoted to the three
    * member nodes; the coefficient is pure integer arithmetic. */
  private def qLocalClustering(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val half = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    val tri = half.as("e1")
      .join(half.as("e2"), col("e1.v") === col("e2.u"))
      .join(half.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val triPerNode = tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    val deg = half.select(col("u").as("node"))
      .unionAll(half.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    deg.filter(col("d") >= 2)
      .join(triPerNode, Seq("node"), "left")
      .withColumn("tri", coalesce(col("tri"), lit(0L)))
      .withColumn("coeff_ppm", expr("2 * tri * 1000000 div (d * (d - 1))"))
      .select(col("node"), col("d"), col("tri"), col("coeff_ppm"))
      .orderBy(col("node"))
  }

  /** NDCG@10 of the IVF index against graded brute-force relevance
    * (truth rank r ⇒ gain 11−r) — the position-sensitive ranking
    * metric next to q_recall_at_k (set overlap) and q_mrr (first
    * hit). The 1/log2(i+1) discount enters as 10 integer micro-
    * weights (q_benford's no-transcendental-crosses-the-boundary
    * convention), IDCG is a compile-time integer constant, and
    * NDCG is one ppm integer division — bit-exact at any scale. */
  private def qNdcg(s: SparkSession, dir: String): DataFrame = {
    val discountCase =
      """CASE rn WHEN 1 THEN 1000000 WHEN 2 THEN 630930 WHEN 3 THEN 500000
        | WHEN 4 THEN 430677 WHEN 5 THEN 386853 WHEN 6 THEN 356207
        | WHEN 7 THEN 333333 WHEN 8 THEN 315465 WHEN 9 THEN 301030
        | ELSE 289065 END""".stripMargin
    val idcgMicro = 29966114L // sum of (11-i) * discount_i, i = 1..10
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
      .localCheckpoint(eager = false)
    val queries = emb.filter(col("vec_id").isin(0, 7, 42, 99, 123))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(assign.select(col("vec_id").as("qid"), col("cid").as("qcid")), "qid")
    def keyed(scored: DataFrame): DataFrame = scored.select(col("qid"),
      col("vec_id"),
      lpad(greatest(lit(0L),
          floor((lit(1.0) - col("cosine")) * 1e9 + 0.5).cast("long")).cast("string"),
        12, "0").as("distkey"))
    val truth10 = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .crossJoin(broadcast(queries.select(col("qid"), col("qv"))))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 10)
      .select(col("qid").cast("long").as("qid"), col("vec_id"),
        (lit(11L) - col("rn")).as("rel"))
    val ivf10 = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .join(assign, "vec_id")
        .join(broadcast(queries), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 10)
      .select(col("qid").cast("long").as("qid"), col("rn"), col("vec_id"))
    ivf10
      .join(truth10, Seq("qid", "vec_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      .withColumn("gain_micro", col("rel") * expr(discountCase))
      .groupBy(col("qid"))
      .agg(sum(col("gain_micro")).as("dcg_micro"))
      .withColumn("ndcg_ppm",
        expr(s"dcg_micro * 1000000 div ${idcgMicro}L"))
      .orderBy(col("qid"))
  }

  /** Closed-form ridge regression (2 features + intercept): predict
    * order value from line count and total quantity by solving the
    * 3×3 normal equations (XᵀX + λI·[0,1,1])β = Xᵀy with Cramer's
    * rule — the distributed-friendly regression: ONE pass collects 9
    * exact integer moments (map-side combine, a single 9-long row
    * shuffles), the solve is a fixed double tree over those longs on
    * one row. λ touches only the feature diagonal (intercept
    * unpenalized, the standard form). No iteration, no gradient —
    * at 100 TB this is still one scan + one 9-value reduce. */
  private def qRidge(s: SparkSession, dir: String): DataFrame = {
    val perOrder = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("x1"),
        sum(col("l_quantity").cast("long")).as("x2"))
      .join(t(s, dir, "orders")
          .select(col("o_orderkey"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 100")
              .as("y")),
        col("l_orderkey") === col("o_orderkey"))
    val m = perOrder.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"))
    // 3×3 system rows: [n s1 s2 | sy], [s1 s11+λ s12 | s1y], [s2 s12 s22+λ | s2y]
    val solved = m
      .withColumn("a", col("n").cast("double"))
      .withColumn("b", col("s1").cast("double"))
      .withColumn("c", col("s2").cast("double"))
      .withColumn("d", col("s1").cast("double"))
      .withColumn("e", (col("s11") + 1000L).cast("double"))
      .withColumn("f", col("s12").cast("double"))
      .withColumn("g", col("s2").cast("double"))
      .withColumn("h", col("s12").cast("double"))
      .withColumn("i", (col("s22") + 1000L).cast("double"))
      .withColumn("r0", col("sy").cast("double"))
      .withColumn("r1", col("s1y").cast("double"))
      .withColumn("r2", col("s2y").cast("double"))
    def det3(a: String, b: String, c: String, d: String, e: String,
        f: String, g: String, h: String, i: String): org.apache.spark.sql.Column =
      col(a) * (col(e) * col(i) - col(f) * col(h)) -
        col(b) * (col(d) * col(i) - col(f) * col(g)) +
        col(c) * (col(d) * col(h) - col(e) * col(g))
    solved
      .withColumn("det", det3("a", "b", "c", "d", "e", "f", "g", "h", "i"))
      .withColumn("beta0",
        det3("r0", "b", "c", "r1", "e", "f", "r2", "h", "i") / col("det"))
      .withColumn("beta1",
        det3("a", "r0", "c", "d", "r1", "f", "g", "r2", "i") / col("det"))
      .withColumn("beta2",
        det3("a", "b", "r0", "d", "e", "r1", "g", "h", "r2") / col("det"))
      .select(col("n"), col("beta0"), col("beta1"), col("beta2"))
  }

  /** Decile gains/lift table for the quality model — "if I keep only
    * the top-k% by score, what fraction of the good docs do I
    * capture?" — the curve that decides every corpus-budget cut.
    * Ranking rides the two-pass scalable global rank; decile
    * assignment, cumulative capture, and lift are exact integer
    * arithmetic; the cumulative window runs over 10 DECILE rows
    * (bounded by bucket count, not data). */
  private def qGains(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = t(s, dir, "documents")
      .select(col("doc_id"),
        (lit(40L) * size(split(col("text"), " ")).cast("long") +
          lit(-10L) * length(regexp_replace(col("text"), "[^0-9]", "")).cast("long") +
          lit(-2L) * abs(col("n_chars") - 500) + lit(-1500L)).as("logit_milli"),
        (col("n_chars") >= 200).as("label"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      scored.select(lit("all").as("g"),
        (lit(0L) - col("logit_milli")).cast("double").as("ord"), col("doc_id")),
      "g", "ord", "doc_id", 32)
    val n = scored.agg(count(lit(1)).as("n_total"),
      sum(when(col("label"), 1L).otherwise(0L)).as("pos_total"))
    val deciles = ranked
      .join(scored.select(col("doc_id"), col("label")), "doc_id")
      .crossJoin(broadcast(n))
      .withColumn("decile", expr("(rnk - 1) * 10 div n_total + 1"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
        max(col("n_total")).as("n_total"), max(col("pos_total")).as("pos_total"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciles
      .withColumn("cum_docs", sum(col("n_docs")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .withColumn("gain_ppm", expr("cum_pos * 1000000 div pos_total"))
      .withColumn("lift_ppm",
        expr("cum_pos * n_total * 1000000 div (cum_docs * pos_total)"))
      .select(col("decile"), col("n_docs"), col("n_pos"), col("cum_docs"),
        col("cum_pos"), col("gain_ppm"), col("lift_ppm"))
      .orderBy(col("decile"))
  }

  /** Herfindahl-Hirschman concentration index per region: Σ share²
    * of nation revenue within each region — the market-concentration
    * audit (HHI > 0.25 ⇒ concentrated). Shares are computed FIRST as
    * bounded ppm integers (≤ 1e6), then squared — raw-revenue squares
    * overflow int64 at scale (caught by the sf0.1 gate); bounded
    * shares never can, at any corpus size. Pure integer end-to-end.
    * Broadcast-dim star join, 25-row agg, broadcast region totals. */
  private def qHhi(s: SparkSession, dir: String): DataFrame = {
    val nationRev = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) div 100000")
        .as("rev_k"))
      .localCheckpoint(eager = false)
    val totals = nationRev.groupBy(col("r_name"))
      .agg(sum(col("rev_k")).as("total_k"))
    nationRev.join(broadcast(totals), "r_name")
      .withColumn("share_ppm", expr("rev_k * 1000000 div total_k"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        max(col("total_k")).as("total_k"),
        sum(col("share_ppm") * col("share_ppm")).as("sum_sq_ppm"),
        max(col("share_ppm")).as("top_share_ppm"))
      .withColumn("hhi_ppm", expr("sum_sq_ppm div 1000000"))
      .select(col("r_name"), col("n_nations"), col("total_k"),
        col("hhi_ppm"), col("top_share_ppm"))
      .orderBy(col("r_name"))
  }

  /** Simplified silhouette per cluster (centroid form): a = L2² to
    * own centroid, b = min L2² to any other, s = (b−a)/max(a,b) —
    * the cluster-quality audit that tells you whether the learned
    * blocking keys (q_semantic_dedup) actually separate. Distances
    * are exact fixed-point longs (per-dimension floor at 1e9, the
    * q_kmeans convention), so assignment, margins, and the ppm
    * silhouette are all integer arithmetic; per-vector work is a
    * broadcast of 8 centroids — one linear pass, no shuffle until
    * the 8-row agg. */
  private def qSilhouette(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val dists = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        graft.functions.kernels.fixed_point_l2(col("embedding"), col("cv"))
          .as("d2"))
    val ranked = dists
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("best"),
        sort_array(collect_list(struct(col("d2"), col("cid")))).as("all"))
      .select(col("vec_id"), col("best.cid").as("cid"),
        col("best.d2").as("a2"),
        col("all")(1)("d2").as("b2"))
    val perVec = ranked
      .withColumn("s_ppm",
        when(greatest(col("a2"), col("b2")) > 0,
          expr("(b2 - a2) * 1000000 div greatest(a2, b2)"))
          .otherwise(lit(0L)))
    perVec.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("s_ppm")).as("sum_s_ppm"))
      .withColumn("mean_s_ppm", expr("sum_s_ppm div n_vecs"))
      .select(col("cid"), col("n_vecs"), col("mean_s_ppm"))
      .orderBy(col("cid"))
  }

  /** Median-absolute-deviation outlier screen per nation — the
    * robust companion to q_outliers_iqr (MAD shrugs off the 50%
    * contamination that wrecks mean/stddev fences). BOTH medians
    * (value, then |value−median|) ride the two-pass range-partitioned
    * grouped rank — no per-nation window funnel; the 25-row median
    * tables travel back broadcast; the k=3 fence and outlier counts
    * are exact integer cents. */
  private def qMad(s: SparkSession, dir: String): DataFrame = {
    val vals = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey").as("ok"),
        Analytics.cents(col("o_totalprice")).as("v"))
      .localCheckpoint(eager = false)
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val ranked = graft.ops.ScalablePrefix.groupedRank(s,
        df.select(col("n_name"), col(valueCol).cast("double").as("ord"),
          col("ok")),
        "n_name", "ord", "ok", 32)
      val n = ranked.groupBy(col("n_name")).agg(max(col("rnk")).as("n"))
      ranked.join(n, "n_name")
        .filter(col("rnk") === expr("(n + 1) div 2"))
        .select(col("n_name"), col("ord").cast("long").as(out))
    }
    val med = lowerMedian(vals, "v", "med_cents")
    val dev = vals.join(broadcast(med), "n_name")
      .withColumn("dev", abs(col("v") - col("med_cents")))
      .localCheckpoint(eager = false)
    val mad = lowerMedian(dev.select(col("n_name"), col("ok"),
      col("dev").as("v")), "v", "mad_cents")
    dev.join(broadcast(mad), "n_name")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        max(col("med_cents")).as("med_cents"),
        max(col("mad_cents")).as("mad_cents"),
        sum(when(col("dev") > lit(3L) * col("mad_cents"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("n_name"))
  }

  /** Iterative proportional fitting (raking) of the priority×region
    * contingency table to uniform target margins — the survey-
    * weighting primitive that reweights a skewed sample to known
    * population margins. Two full IPF rounds (priority-scale,
    * region-scale, twice); each scale step multiplies by an integer
    * ppm factor (target·1e6 div margin-sum), so every weight stays an
    * exact int64 at any corpus size. All four margin windows run
    * over the 25-CELL table (bounded by category cardinality, not
    * data) after ONE counting shuffle. */
  private def qIpf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("o_orderpriority"), col("r_name"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val tot = cells.agg(sum(col("n")).as("total"))
    def scaleBy(df: DataFrame, dim: String): DataFrame = df
      .withColumn("msum", sum(col("w")).over(Window.partitionBy(col(dim))))
      .withColumn("w", expr("w * (target_w * 1000000 div msum) div 1000000"))
      .drop("msum")
    val w0 = cells.crossJoin(broadcast(tot))
      .withColumn("target_w", expr("(total div 5) * 1000000"))
      .withColumn("w", col("n") * lit(1000000L))
    val fitted = scaleBy(scaleBy(scaleBy(scaleBy(
      w0, "o_orderpriority"), "r_name"), "o_orderpriority"), "r_name")
    fitted
      .select(col("o_orderpriority"), col("r_name"), col("n"),
        col("w").as("w_ppm"))
      .orderBy(col("o_orderpriority"), col("r_name"))
  }

  /** Per-label embedding centroid drift: exact fixed-point mean
    * vector per label, then pairwise squared L2 between centroids —
    * the cohort-drift screen that catches a class whose embedding
    * distribution moved (new scraper, new preprocessing) before it
    * poisons training. Dimension explosion shuffles (label, dim,
    * fp) longs — never float vectors; means truncate to micro grain
    * so centroid-difference squares stay in int64 at any corpus
    * size; the 45-pair join runs on the 640-row centroid table. */
  private def qEmbedDrift(s: SparkSession, dir: String): DataFrame = {
    val dims = t(s, dir, "embeddings")
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")))
      .select(col("label"), col("pos").cast("long").as("dim"),
        floor(col("col").cast("double") * 1e9 + 0.5).cast("long").as("v_fp"))
    val means = dims.groupBy(col("label"), col("dim"))
      .agg(expr("CAST(sum(v_fp) AS BIGINT) div count(1)").as("mean_fp"))
      .withColumn("mean_u", expr("mean_fp div 1000"))
      .localCheckpoint(eager = false)
    means.as("a").join(means.as("b"),
        col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("l1"), col("b.label").as("l2"))
      .agg(sum((col("a.mean_u") - col("b.mean_u")) *
        (col("a.mean_u") - col("b.mean_u"))).as("d2_micro"))
      .orderBy(col("l1"), col("l2"))
  }

  /** Consistent-hashing ring balance audit: 8 physical nodes × 32
    * vnodes on an md5 ring, every customer key assigned to its
    * clockwise successor (wraparound via coalesce-to-min) — the
    * shard-rebalance primitive, audited for load skew. The ring is a
    * 256-long SORTED ARRAY broadcast to every key row, so assignment
    * is a pure per-row array_min(filter(...)) expression — zero
    * explosion, zero shuffle until the 8-row count; the vnode→node
    * resolve is a broadcast join on the chosen ring position. */
  private def qConsistentHash(s: SparkSession, dir: String): DataFrame = {
    val vnodes = s.range(256)
      .select(expr("id div 32").as("pnode"),
        conv(substring(md5(concat(lit("ring|"), col("id").cast("string"))
          .cast("binary")), 1, 12), 16, 10).cast("long").as("vhash"))
      .localCheckpoint(eager = false)
    val ring = vnodes.agg(array_sort(collect_list(col("vhash"))).as("varr"))
    val keys = t(s, dir, "customer")
      .select(col("c_custkey"),
        conv(substring(md5(concat(lit("key|"), col("c_custkey").cast("string"))
          .cast("binary")), 1, 12), 16, 10).cast("long").as("khash"))
      .localCheckpoint(eager = false)
    val assigned = keys.crossJoin(broadcast(ring))
      .withColumn("ahash", coalesce(
        array_min(filter(col("varr"), x => x >= col("khash"))),
        array_min(col("varr"))))
    assigned.join(broadcast(vnodes), col("ahash") === col("vhash"))
      .groupBy(col("pnode"))
      .agg(count(lit(1)).as("n_keys"))
      .crossJoin(broadcast(keys.agg(count(lit(1)).as("total"))))
      .withColumn("share_ppm", expr("n_keys * 1000000 div total"))
      .select(col("pnode"), col("n_keys"), col("share_ppm"))
      .orderBy(col("pnode"))
  }

  /** Quantile normalization of per-nation order values onto the
    * global distribution — the batch-effect remover (map every
    * cohort's rank-r value to the global value at the same relative
    * rank) that makes cross-cohort features comparable before
    * training. Both rankings ride the two-pass scalable grouped
    * rank; the target index is exact integer arithmetic
    * (r·N div n_g); the remap is an equi-join on the global rank.
    * Emits per-nation exact sums/extremes of the normalized cents. */
  private def qQuantileNormalize(s: SparkSession, dir: String): DataFrame = {
    val vals = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey").as("ok"),
        Analytics.cents(col("o_totalprice")).as("v"))
      .localCheckpoint(eager = false)
    val natR = graft.ops.ScalablePrefix.groupedRank(s,
      vals.select(col("n_name"), col("v").cast("double").as("ord"), col("ok")),
      "n_name", "ord", "ok", 32)
    val natN = natR.groupBy(col("n_name")).agg(max(col("rnk")).as("n_g"))
    val globR = graft.ops.ScalablePrefix.groupedRank(s,
      vals.select(lit("all").as("g"), col("v").cast("double").as("ord"),
        col("ok")),
      "g", "ord", "ok", 32)
      .localCheckpoint(eager = false)
    val totN = globR.agg(max(col("rnk")).as("n_tot"))
    natR.join(broadcast(natN), "n_name").crossJoin(broadcast(totN))
      .withColumn("target_rank", expr("rnk * n_tot div n_g"))
      .join(globR.select(col("rnk").as("target_rank"),
        col("ord").cast("long").as("norm_cents")), "target_rank")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("norm_cents")).as("sum_norm_cents"),
        min(col("norm_cents")).as("min_norm_cents"),
        max(col("norm_cents")).as("max_norm_cents"))
      .orderBy(col("n_name"))
  }

  /** Wilson score interval for the urgent-order share per nation —
    * the proportion CI that stays sane at small n and extreme p̂
    * (where the naive normal interval leaves [0,1]). Counts are
    * exact longs; both bounds are fixed trees of +,−,×,÷,√ over
    * those longs — every operator correctly rounded IEEE, so the
    * doubles are bit-identical in any engine. One broadcast-joined
    * scan, 25-group agg. */
  private def qWilson(s: SparkSession, dir: String): DataFrame = {
    val agg0 = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("x"))
    val nD = col("n").cast("double")
    val phat = col("x").cast("double") / nD
    val half = lit(1.96) * sqrt(phat * (lit(1.0) - phat) / nD +
      lit(3.8416) / (lit(4.0) * nD * nD))
    val denom = lit(1.0) + lit(3.8416) / nD
    agg0
      .withColumn("wilson_lo",
        (phat + lit(3.8416) / (lit(2.0) * nD) - half) / denom)
      .withColumn("wilson_hi",
        (phat + lit(3.8416) / (lit(2.0) * nD) + half) / denom)
      .select(col("n_name"), col("n"), col("x"), col("wilson_lo"),
        col("wilson_hi"))
      .orderBy(col("n_name"))
  }

  /** Customer spend-decile transition matrix 1996→1998 — the
    * mobility/churn table ("do top-decile customers stay top-
    * decile?") behind every LTV model. Each year's deciles come from
    * the two-pass scalable grouped rank (year = rank group, so both
    * years rank in ONE pass); the matrix is a count over the joined
    * decile pairs. Pure integers end-to-end. */
  private def qDecileMatrix(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .filter(year(col("o_orderdate")).isin(1996, 1998))
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_custkey"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("c"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      spend.select(col("yr").cast("string").as("g"),
        col("c").cast("double").as("ord"), col("o_custkey")),
      "g", "ord", "o_custkey", 32)
    val n = ranked.groupBy(col("g")).agg(max(col("rnk")).as("n"))
    val deciled = ranked.join(broadcast(n), "g")
      .withColumn("dec", expr("(rnk - 1) * 10 div n + 1"))
      .select(col("g"), col("o_custkey"), col("dec"))
      .localCheckpoint(eager = false)
    deciled.filter(col("g") === "1996")
      .select(col("o_custkey"), col("dec").as("d96"))
      .join(deciled.filter(col("g") === "1998")
        .select(col("o_custkey"), col("dec").as("d98")), "o_custkey")
      .groupBy(col("d96"), col("d98"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("d96"), col("d98"))
  }

  /** Flesch-Kincaid grade level per document from three integer
    * counts — words (token count), sentences ([.!?] RUNS via the
    * replace-single-minus-replace-empty length trick, so "?!" is one
    * boundary), syllables (vowel-group runs, the standard cheap
    * approximation). The grade is one fixed double tree over exact
    * ints shipped as milli-points; pure per-row codegen'd
    * expressions, zero shuffle before the final sort. */
  private def qReadability(s: SparkSession, dir: String): DataFrame = {
    val lowered = lower(col("text"))
    val words = greatest(lit(1L), size(split(col("text"), " ")).cast("long"))
    val sentences = greatest(lit(1L),
      (length(regexp_replace(col("text"), "[.!?]+", "S")) -
        length(regexp_replace(col("text"), "[.!?]+", ""))).cast("long"))
    val syllables = greatest(lit(1L),
      (length(regexp_replace(lowered, "[aeiouy]+", "V")) -
        length(regexp_replace(lowered, "[aeiouy]+", ""))).cast("long"))
    t(s, dir, "documents")
      .select(col("doc_id"), words.as("words"), sentences.as("sentences"),
        syllables.as("syllables"))
      .withColumn("fk_milli",
        floor((lit(0.39) * (col("words").cast("double") / col("sentences").cast("double")) +
          lit(11.8) * (col("syllables").cast("double") / col("words").cast("double")) -
          lit(15.59)) * 1000 + 0.5).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** LSH band-geometry sweep: candidate volume and truth recall at
    * rowsPerBand ∈ {1,2,4} from ONE checkpointed signature table —
    * the parameter-tuning audit behind every MinHash deployment (more
    * rows per band ⇒ fewer, higher-precision candidates; the sweep
    * shows exactly what each setting trades). Truth is the exact-
    * Jaccard join (df-capped); each geometry is just a different
    * band/sig projection of the SAME signatures — the corpus is
    * shingled once. */
  private def qLshSweep(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", k = 5, minSim = 0.5)
      .select(col("d1"), col("d2"))
      .localCheckpoint(eager = false)
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", k = 5,
      numHashes = 8)
      .localCheckpoint(eager = false)
    val rows = Seq(1, 2, 4).map { r =>
      val buckets = Dedup.lshBuckets(sigs, "doc_id", numHashes = 8,
        rowsPerBand = r)
      val cand = buckets.as("a").join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
        .localCheckpoint(eager = false)
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(truth.join(cand, Seq("d1", "d2"), "left_semi")
          .agg(count(lit(1)).as("n_found")))
        .select(lit(r.toLong).as("rows_per_band"),
          lit((8 / r).toLong).as("n_bands"), col("n_candidates"),
          col("n_found"))
    }
    rows.reduce(_ unionAll _)
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
      .withColumn("recall_ppm",
        expr("CASE WHEN n_true > 0 THEN n_found * 1000000 div n_true ELSE 0 END"))
      .select(col("rows_per_band"), col("n_bands"), col("n_candidates"),
        col("n_found"), col("recall_ppm"))
      .orderBy(col("rows_per_band"))
  }

  /** Inter-purchase gap statistics per nation: lag-gap days per
    * customer (the natural, scalable per-customer window — millions
    * of small partitions), then the nation-level lower median and
    * nearest-rank p90 BOTH from the two-pass grouped rank. The
    * re-engagement metric ("how long until a customer usually comes
    * back") with robust quantiles instead of a skew-fragile mean. */
  private def qPurchaseGaps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val gaps = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("day"))
      .withColumn("gap", col("day") - lag(col("day"), 1).over(w))
      .filter(col("gap").isNotNull)
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey").as("ok"), col("gap"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      gaps.select(col("n_name"), col("gap").cast("double").as("ord"),
        col("ok")),
      "n_name", "ord", "ok", 32)
    val n = ranked.groupBy(col("n_name")).agg(max(col("rnk")).as("n_gaps"))
    ranked.join(broadcast(n), "n_name")
      .filter(col("rnk") === expr("(n_gaps + 1) div 2") ||
        col("rnk") === expr("(9 * n_gaps + 9) div 10"))
      .groupBy(col("n_name"))
      .agg(max(col("n_gaps")).as("n_gaps"),
        min(col("ord")).cast("long").as("median_days"),
        max(col("ord")).cast("long").as("p90_days"))
      .orderBy(col("n_name"))
  }

  /** Cohen's d + Hedges' g effect size (URGENT vs LOW order values) —
    * the magnitude companion to q_mann_whitney's significance: a
    * fleet-scale test can make a trivial difference "significant";
    * d says whether it matters. Six exact integer moments (dollar
    * grain keeps squares in int64 at any scale) from one scan; both
    * standardized effects are fixed double trees over those longs. */
  private def qEffectSize(s: SparkSession, dir: String): DataFrame = {
    val agg0 = t(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 100").as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("ss"))
      .groupBy()
      .agg(max(when(col("grp") === "1-URGENT", col("n"))).as("n1"),
        max(when(col("grp") === "1-URGENT", col("sv"))).as("s1"),
        max(when(col("grp") === "1-URGENT", col("ss"))).as("ss1"),
        max(when(col("grp") === "5-LOW", col("n"))).as("n2"),
        max(when(col("grp") === "5-LOW", col("sv"))).as("s2"),
        max(when(col("grp") === "5-LOW", col("ss"))).as("ss2"))
    val n1D = col("n1").cast("double"); val n2D = col("n2").cast("double")
    val v1 = (n1D * col("ss1").cast("double") -
      col("s1").cast("double") * col("s1").cast("double")) /
      (n1D * (n1D - lit(1.0)))
    val v2 = (n2D * col("ss2").cast("double") -
      col("s2").cast("double") * col("s2").cast("double")) /
      (n2D * (n2D - lit(1.0)))
    val sp = sqrt(((n1D - lit(1.0)) * v1 + (n2D - lit(1.0)) * v2) /
      (n1D + n2D - lit(2.0)))
    val d = (col("s1").cast("double") / n1D -
      col("s2").cast("double") / n2D) / sp
    agg0
      .withColumn("cohen_d", d)
      .withColumn("hedges_g",
        d * (lit(1.0) - lit(3.0) / (lit(4.0) * (n1D + n2D) - lit(9.0))))
      .select(col("n1"), col("n2"), col("cohen_d"), col("hedges_g"))
  }

  /** Distribution-free order-statistic CI for the median order value
    * per nation: the binomial rank bracket [⌊(n−1.96√n)/2⌋,
    * ⌈(n+1.96√n)/2⌉+1] selects two data values that cover the true
    * median at ~95% — no normality, no bootstrap replicas. Rank
    * selection rides the two-pass scalable grouped rank; the rank
    * endpoints are floor/ceil of a fixed double tree (√ correctly
    * rounded), everything else exact integers. */
  private def qMedianCi(s: SparkSession, dir: String): DataFrame = {
    val vals = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey").as("ok"),
        Analytics.cents(col("o_totalprice")).as("v"))
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      vals.select(col("n_name"), col("v").cast("double").as("ord"), col("ok")),
      "n_name", "ord", "ok", 32)
      .localCheckpoint(eager = false)
    val n = ranked.groupBy(col("n_name")).agg(max(col("rnk")).as("n"))
    val nD = col("n").cast("double")
    ranked.join(broadcast(n
        .withColumn("lo_rank", greatest(lit(1L),
          floor((nD - lit(1.96) * sqrt(nD)) / lit(2.0)).cast("long")))
        .withColumn("hi_rank", least(col("n"),
          ceil((nD + lit(1.96) * sqrt(nD)) / lit(2.0)).cast("long") + 1L))
        .withColumn("med_rank", expr("(n + 1) div 2"))), "n_name")
      .filter(col("rnk") === col("lo_rank") ||
        col("rnk") === col("med_rank") || col("rnk") === col("hi_rank"))
      .groupBy(col("n_name"))
      .agg(max(col("n")).as("n"),
        max(when(col("rnk") === col("lo_rank"), col("ord"))).cast("long")
          .as("ci_lo_cents"),
        max(when(col("rnk") === col("med_rank"), col("ord"))).cast("long")
          .as("median_cents"),
        max(when(col("rnk") === col("hi_rank"), col("ord"))).cast("long")
          .as("ci_hi_cents"))
      .orderBy(col("n_name"))
  }

  /** DAU/MAU stickiness per 30-day window over the event stream —
    * the engagement ratio every product dashboard leads with. Two
    * distinct-count shuffles (per-day and per-window uniques — the
    * exact formulation; at 100 TB the HLL sketches from
    * q_hll_rollup swap in mergeably), then one integer ppm ratio
    * over the bounded window domain. */
  private def qStickiness(s: SparkSession, dir: String): DataFrame = {
    val days = events(s, dir)
      .select(col("user_id"),
        expr("(ts div 1000000000) div 86400").as("day"))
      .withColumn("win", expr("day div 30"))
    val daily = days.groupBy(col("win"), col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
    val monthly = days.groupBy(col("win"))
      .agg(countDistinct(col("user_id")).as("mau"))
    daily.join(monthly, "win")
      .withColumn("stickiness_ppm",
        expr("sum_dau * 1000000 div (n_days * mau)"))
      .select(col("win"), col("n_days"), col("sum_dau"), col("mau"),
        col("stickiness_ppm"))
      .orderBy(col("win"))
  }

  /** Two-step Markov transition matrix over the event stream: P² by
    * relational matrix multiply on the ppm one-step matrix (join on
    * the middle state, integer product, one ppm truncation) —
    * "where will a user be two events from now". The matrix side is
    * bounded by event-type cardinality, so the multiply is a
    * broadcast join however big the stream that estimated P was. */
  private def qMarkov2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("prev")).agg(sum(col("n")).as("total"))
    val p1 = pairs.join(broadcast(totals), "prev")
      .select(col("prev"), col("next"), expr("n * 1000000 div total").as("p_ppm"))
      .localCheckpoint(eager = false)
    p1.as("a").join(broadcast(p1.as("b")), col("a.next") === col("b.prev"))
      .groupBy(col("a.prev").as("prev"), col("b.next").as("next"))
      .agg(expr("CAST(sum(a.p_ppm * b.p_ppm) AS BIGINT) div 1000000")
        .as("p2_ppm"))
      .orderBy(col("prev"), col("next"))
  }

  /** Discrete-time hazard curve of customer attrition: for each
    * tenure month k, the share of customers whose LAST order landed
    * exactly k months after their first, among those who survived to
    * k — the life-table view of churn (the q_retention counterpart on
    * the order ledger). Tenures reduce per customer map-side; the
    * at-risk denominator is a reverse cumulative sum over the BOUNDED
    * tenure-month domain; hazard is exact ppm. */
  private def qHazard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tenure = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg((max(year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) -
        min(year(col("o_orderdate")) * 12 + month(col("o_orderdate"))))
        .cast("long").as("tenure"))
      .groupBy(col("tenure")).agg(count(lit(1)).as("churned"))
    val w = Window.orderBy(col("tenure").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tenure
      .withColumn("at_risk", sum(col("churned")).over(w))
      .withColumn("hazard_ppm", expr("churned * 1000000 div at_risk"))
      .select(col("tenure"), col("churned"), col("at_risk"),
        col("hazard_ppm"))
      .orderBy(col("tenure"))
  }

  /** Fano factor (variance-to-mean dispersion index) of daily event
    * volume per event type — the burstiness screen (≈1e6 ppm ⇒
    * Poisson-like arrivals; ≫1e6 ⇒ bursty, the retry-storm /
    * scraper-loop signature). Daily counts reduce on the bounded day
    * domain; Fano = (nΣc²−(Σc)²)·1e6 div ((n−1)·Σc) is exact int64
    * end-to-end. */
  private def qDispersion(s: SparkSession, dir: String): DataFrame = {
    events(s, dir)
      .select(col("event_type"),
        expr("(ts div 1000000000) div 86400").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("scc"))
      .filter(col("n_days") > 1)
      .withColumn("fano_ppm",
        expr("(n_days * scc - sc * sc) * 1000000 div ((n_days - 1) * sc)"))
      .select(col("event_type"), col("n_days"), col("sc").as("n_events"),
        col("fano_ppm"))
      .orderBy(col("event_type"))
  }

  /** Cohort LTV curve: customers cohorted by first-order quarter,
    * cumulative revenue per cohort member by quarters-since-start —
    * the money view the user-count retention triangle can't give.
    * One pass cohorts (min-quarter per customer broadcast back), one
    * grouped sum per (cohort, offset), cumulative window over the
    * BOUNDED offset domain, LTV = exact cents div cohort size. */
  private def qCohortLtv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qtr = (year(col("o_orderdate")) * 4 +
      quarter(col("o_orderdate"))).cast("long")
    val orders = t(s, dir, "orders")
      .select(col("o_custkey"), qtr.as("q"),
        Analytics.cents(col("o_totalprice")).as("c"))
      .localCheckpoint(eager = false)
    val cohorts = orders.groupBy(col("o_custkey"))
      .agg(min(col("q")).as("cohort_q"))
      .localCheckpoint(eager = false)
    val sizes = cohorts.groupBy(col("cohort_q"))
      .agg(count(lit(1)).as("n_cust"))
    val perOffset = orders.join(cohorts, "o_custkey")
      .groupBy(col("cohort_q"), (col("q") - col("cohort_q")).as("qtr_offset"))
      .agg(sum(col("c")).as("cents"))
    val w = Window.partitionBy(col("cohort_q")).orderBy(col("qtr_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perOffset
      .withColumn("cum_cents", sum(col("cents")).over(w))
      .join(broadcast(sizes), "cohort_q")
      .withColumn("ltv_cents", expr("cum_cents div n_cust"))
      .select(col("cohort_q"), col("qtr_offset"), col("n_cust"),
        col("cum_cents"), col("ltv_cents"))
      .orderBy(col("cohort_q"), col("qtr_offset"))
  }

  /** Laspeyres price index per year (base 1996): how much would the
    * 1996 basket cost at each year's prices — the inflation measure
    * that holds quantities fixed so pure price movement is isolated.
    * Per-(part, year) price aggregates join the broadcast-size base
    * basket; p_y·q₀ uses the two-step integer division (cents_y·q₀
    * div qty_y) so everything stays exact int64; p₀·q₀ collapses to
    * the base cents identically. */
  private def qLaspeyres(s: SparkSession, dir: String): DataFrame = {
    val py = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"), year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .localCheckpoint(eager = false)
    val base = py.filter(col("yr") === 1996)
      .select(col("l_partkey"), col("cents").as("cents0"),
        col("qty").as("q0"))
    py.join(base, "l_partkey")
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_parts"),
        sum(expr("cents * q0 div qty")).as("numer"),
        sum(col("cents0")).as("denom"))
      .withColumn("index_ppm", expr("numer * 1000000 div denom"))
      .select(col("yr"), col("n_parts"), col("index_ppm"))
      .orderBy(col("yr"))
  }

  /** FIFO lot matching as a cumulative-interval self-join: per part,
    * returned units consume non-returned units in ship-date order —
    * the inventory-costing / queue-settlement primitive (payments
    * against invoices, consumption against lots) expressed purely
    * relationally. Each side gets [cum_start, cum_end) unit intervals
    * from a per-part window (millions of small partitions — scalable);
    * matches are the interval-overlap join within the part, matched
    * units = exact integer overlap length. The invariant
    * Σmatched = min(total_in, total_out) per part ships in the
    * output, so the oracle re-proves the algorithm, not just the
    * numbers. */
  private def qFifoMatch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 50 === 0)
      .select(col("l_partkey").as("pk"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_shipdate").as("sd"),
        col("l_quantity").cast("long").as("qty"),
        (col("l_returnflag") === "R").as("is_out"))
      .localCheckpoint(eager = false)
    def ranges(outFlag: Boolean): DataFrame = {
      val w = Window.partitionBy(col("pk")).orderBy(col("sd"), col("ok"),
        col("ln")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.filter(col("is_out") === outFlag)
        .withColumn("cum_end", sum(col("qty")).over(w))
        .withColumn("cum_start", col("cum_end") - col("qty"))
        .select(col("pk"), col("cum_start"), col("cum_end"))
    }
    val ins = ranges(outFlag = false)
    val outs = ranges(outFlag = true)
    val matched = ins.as("i").join(outs.as("o"),
        col("i.pk") === col("o.pk") &&
          col("i.cum_start") < col("o.cum_end") &&
          col("o.cum_start") < col("i.cum_end"))
      .select(col("i.pk").as("pk"),
        (least(col("i.cum_end"), col("o.cum_end")) -
          greatest(col("i.cum_start"), col("o.cum_start"))).as("m"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("m")).as("matched_qty"))
    val totals = li.groupBy(col("pk"))
      .agg(sum(when(!col("is_out"), col("qty")).otherwise(0L)).as("total_in"),
        sum(when(col("is_out"), col("qty")).otherwise(0L)).as("total_out"))
    totals.join(matched, Seq("pk"), "left")
      .withColumn("n_pairs", coalesce(col("n_pairs"), lit(0L)))
      .withColumn("matched_qty", coalesce(col("matched_qty"), lit(0L)))
      .withColumn("fifo_ok",
        col("matched_qty") === least(col("total_in"), col("total_out")))
      .select(col("pk"), col("total_in"), col("total_out"), col("n_pairs"),
        col("matched_qty"), col("fifo_ok"))
      .orderBy(col("pk"))
  }

  /** Customer-base overlap between consecutive years: overlap
    * coefficient |A∩B|/min(|A|,|B|) and Jaccard per year pair — the
    * set-similarity audit on SETS AS TABLES (no sketches, exact).
    * Distinct (customer, year) pairs reduce map-side; the pair join
    * is keyed on customer so intersections never materialize the
    * year-pair cross product. */
  private def qYearOverlap(s: SparkSession, dir: String): DataFrame = {
    val cy = t(s, dir, "orders")
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("yr"))
      .distinct()
      .localCheckpoint(eager = false)
    val sizes = cy.groupBy(col("yr")).agg(count(lit(1)).as("n"))
    val inter = cy.as("a").join(cy.as("b"),
        col("a.o_custkey") === col("b.o_custkey") && col("a.yr") < col("b.yr"))
      .groupBy(col("a.yr").as("y1"), col("b.yr").as("y2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("yr").as("y1"), col("n").as("n1"))), "y1")
      .join(broadcast(sizes.select(col("yr").as("y2"), col("n").as("n2"))), "y2")
      .withColumn("overlap_ppm", expr("inter * 1000000 div least(n1, n2)"))
      .withColumn("jaccard_ppm", expr("inter * 1000000 div (n1 + n2 - inter)"))
      .select(col("y1"), col("y2"), col("n1"), col("n2"), col("inter"),
        col("overlap_ppm"), col("jaccard_ppm"))
      .orderBy(col("y1"), col("y2"))
  }

  /** Wald-Wolfowitz runs test on daily revenue vs its median — "is
    * the above/below-median sequence random, or does the series
    * trend/mean-revert?" Daily totals collapse onto the bounded day
    * domain; the median comes from the scalable grouped rank; the
    * runs count is one lag over the day-domain (window bounded by
    * calendar days, not data); E[R], Var[R], and z are fixed double
    * trees over exact counts. */
  private def qRunsTest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("day"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("v"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      daily.select(lit("all").as("g"), col("v").cast("double").as("ord"),
        col("day")),
      "g", "ord", "day", 32)
    val med = ranked.crossJoin(broadcast(ranked.agg(max(col("rnk")).as("n"))))
      .filter(col("rnk") === expr("(n + 1) div 2"))
      .select(col("ord").cast("long").as("med"))
    val signs = daily.crossJoin(broadcast(med))
      .withColumn("above", col("v") > col("med"))
      .withColumn("flip",
        when(col("above") =!= lag(col("above"), 1)
          .over(Window.orderBy(col("day"))), 1L).otherwise(0L))
    val agg0 = signs.agg(
      sum(when(col("above"), 1L).otherwise(0L)).as("n1"),
      sum(when(!col("above"), 1L).otherwise(0L)).as("n2"),
      (sum(col("flip")) + 1L).as("runs"))
    val n1D = col("n1").cast("double"); val n2D = col("n2").cast("double")
    val eR = lit(1.0) + lit(2.0) * n1D * n2D / (n1D + n2D)
    val vR = (lit(2.0) * n1D * n2D * (lit(2.0) * n1D * n2D - n1D - n2D)) /
      ((n1D + n2D) * (n1D + n2D) * (n1D + n2D - lit(1.0)))
    agg0
      .withColumn("z", (col("runs").cast("double") - eR) / sqrt(vR))
      .select(col("n1"), col("n2"), col("runs"), col("z"))
  }

  /** Shewhart p-chart of the weekly return rate: per-week control
    * limits p̄ ± 3√(p̄(1−p̄)/n_w) — the SPC view that catches a week
    * whose defect rate left the band (q_cusum finds mean SHIFTS;
    * the p-chart flags individual excursions, sample-size-aware).
    * Counts reduce onto the bounded week domain; limits are fixed
    * IEEE trees (√ correctly rounded) over exact counts; the flag
    * compares engine-identical doubles. */
  private def qPchart(s: SparkSession, dir: String): DataFrame = {
    val weekly = t(s, dir, "lineitem")
      .groupBy(expr("CAST(datediff(l_shipdate, DATE '1995-01-01') AS BIGINT) div 7")
        .as("week"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("d"))
      .localCheckpoint(eager = false)
    val tot = weekly.agg(sum(col("n")).as("nn"), sum(col("d")).as("dd"))
    val pbar = col("dd").cast("double") / col("nn").cast("double")
    val nD = col("n").cast("double")
    val half = lit(3.0) * sqrt(pbar * (lit(1.0) - pbar) / nD)
    weekly.crossJoin(broadcast(tot))
      .withColumn("rate_ppm", expr("d * 1000000 div n"))
      .withColumn("lcl", greatest(lit(0.0), pbar - half))
      .withColumn("ucl", pbar + half)
      .withColumn("out_of_control",
        col("d").cast("double") / nD < col("lcl") ||
          col("d").cast("double") / nD > col("ucl"))
      .select(col("week"), col("n"), col("d"), col("rate_ppm"),
        col("lcl"), col("ucl"), col("out_of_control"))
      .orderBy(col("week"))
  }

  /** Log-likelihood keyness (G²) of words in the English subcorpus
    * vs the rest — the corpus-linguistics keyword extractor (what
    * makes THIS slice lexically distinctive), the statistically
    * grounded upgrade over raw TF-IDF deltas. Word counts are exact
    * longs from one token shuffle; each word's G² is a per-row
    * double tree over integer ratios shipped as micro-nats; top-20
    * by (G², word) is a TakeOrdered, not a global sort. */
  private def qKeyness(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select((col("lang") === "en").as("is_en"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = toks.groupBy(col("w"))
      .agg(sum(when(col("is_en"), 1L).otherwise(0L)).as("o1"),
        sum(when(!col("is_en"), 1L).otherwise(0L)).as("o2"))
      .filter(col("o1") + col("o2") >= 10)
      .localCheckpoint(eager = false)
    val tots = counts.agg(sum(col("o1")).as("r1"), sum(col("o2")).as("r2"))
    def term(o: String, r: String): org.apache.spark.sql.Column = {
      val ratio = (col(o) * (col("r1") + col("r2"))).cast("double") /
        (col(r) * (col("o1") + col("o2"))).cast("double")
      when(col(o) > 0, col(o).cast("double") * log(ratio)).otherwise(lit(0.0))
    }
    counts.crossJoin(broadcast(tots))
      .withColumn("g2_unat",
        floor(lit(2.0) * (term("o1", "r1") + term("o2", "r2")) * 1000000 + 0.5)
          .cast("long"))
      .select(col("w"), col("o1"), col("o2"), col("g2_unat"))
      .orderBy(col("g2_unat").desc, col("w"))
      .limit(20)
  }

  /** Day-of-week revenue index + a uniformity chi-square over the 7
    * cells (0 = Sunday on the 1995-01-01 anchor) — the weekly-
    * periodicity companion to q_seasonal's monthly index. Index and
    * chi-square are exact integer arithmetic (two-step division
    * keeps squares in int64); the 7-cell statistic sums exact longs
    * so the total is order-independent. */
  private def qWeekdayEffect(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select((datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long") % 7L).as("dow"),
        Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
      .localCheckpoint(eager = false)
    val tot = daily.agg(sum(col("n")).as("nn"), sum(col("cents")).as("cc"))
    val terms = daily.crossJoin(broadcast(tot))
      .withColumn("rev_index_ppm",
        expr("(cents div 100) * 7000000 div (cc div 100)"))
      .withColumn("chi_term_micro",
        expr("((7 * n - nn) * (7 * n - nn)) div (7 * nn) * 1000000 div nn"))
      .localCheckpoint(eager = false)
    terms.crossJoin(broadcast(
        terms.agg(sum(col("chi_term_micro")).as("chi2_micro"))))
      .select(col("dow"), col("n"), col("cents"), col("rev_index_ppm"),
        col("chi_term_micro"), col("chi2_micro"))
      .orderBy(col("dow"))
  }

  /** Time-to-convert distribution: per user, seconds from first view
    * to first later purchase; median and nearest-rank p90 from the
    * scalable grouped rank — the latency view of the funnel
    * (q_funnel counts WHO converts; this says HOW FAST). First-event
    * timestamps reduce map-side per user; deltas are exact integer
    * seconds on the shared ns clock. */
  private def qTimeToConvert(s: SparkSession, dir: String): DataFrame = {
    val firsts = events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("v"),
        min(when(col("event_type") === "purchase", col("ts"))).as("p"))
      .filter(col("v").isNotNull && col("p").isNotNull && col("p") > col("v"))
      .select(col("user_id"), expr("(p - v) div 1000000000").as("delta_s"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      firsts.select(lit("all").as("g"), col("delta_s").cast("double").as("ord"),
        col("user_id")),
      "g", "ord", "user_id", 32)
    val n = ranked.agg(max(col("rnk")).as("n"))
    ranked.crossJoin(broadcast(n))
      .filter(col("rnk") === expr("(n + 1) div 2") ||
        col("rnk") === expr("(9 * n + 9) div 10"))
      .agg(max(col("n")).as("n_converted"),
        min(col("ord")).cast("long").as("median_s"),
        max(col("ord")).cast("long").as("p90_s"))
  }

  /** Item-item recommendation table from co-purchase counts: squared
    * cosine c_ij²·1e6/(c_i·c_j) (ranking-equivalent to cosine, pure
    * integer) and top-3 neighbors per item via the bounded per-
    * stratum heap — the classic "customers also bought" artifact.
    * Pair counts come from the order-key join (never all-pairs);
    * item marginals ride back broadcast-size. */
  private def qItemRecs(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint(eager = false)
    val freq = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val pairs = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("i"), col("b.l_partkey").as("j"))
      .agg(count(lit(1)).as("cij"))
    val scored = pairs
      .join(broadcast(freq.select(col("l_partkey").as("i"), col("cnt").as("ci"))), "i")
      .join(broadcast(freq.select(col("l_partkey").as("j"), col("cnt").as("cj"))), "j")
      .withColumn("sim2_ppm", expr("cij * cij * 1000000 div (ci * cj)"))
    val keyed = scored.select(col("i"), col("j"),
      concat(lpad((lit(1000000L) - col("sim2_ppm")).cast("string"), 9, "0"),
        lit("-"), lpad(col("j").cast("string"), 12, "0")).as("k"))
    graft.ops.Sampling.stratifiedTopN(s, keyed
        .select(col("i").as("stratum"), col("k"), col("j")),
      "stratum", "k", "j", n = 3)
      .select(col("stratum").cast("long").as("i"), col("rn"),
        col("j").as("rec"))
      .join(scored.select(col("i"), col("j").as("rec"), col("sim2_ppm")),
        Seq("i", "rec"))
      .select(col("i"), col("rn"), col("rec"), col("sim2_ppm"))
      .orderBy(col("i"), col("rn"))
  }

  /** Optimal single changepoint in daily revenue by exact SSE
    * minimization: split t maximizes S₁²/n₁ + S₂²/n₂ (equivalent to
    * min-SSE) computed from prefix sums over the bounded day domain —
    * the principled upgrade over q_cusum's heuristic screen.
    * Thousand-dollar grain keeps every squared sum below 2⁵³ (exact
    * in IEEE), so the score is two correctly-rounded divisions and
    * one add of exact values — bit-identical in any engine; the
    * argmax is a rank-1 row_number over the day domain. */
  private def qBreakpoint(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("day"))
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) div 100000")
        .as("v"))
      .localCheckpoint(eager = false)
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val scored = daily
      .withColumn("t", row_number().over(Window.orderBy(col("day"))).cast("long"))
      .withColumn("s1", sum(col("v")).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("t") < col("n"))
      .withColumn("score",
        (col("s1") * col("s1")).cast("double") / col("t").cast("double") +
          ((col("s") - col("s1")) * (col("s") - col("s1"))).cast("double") /
            (col("n") - col("t")).cast("double"))
    scored
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("day"))))
      .filter(col("rk") === 1)
      .withColumn("mean_before_k", expr("s1 div t"))
      .withColumn("mean_after_k", expr("(s - s1) div (n - t)"))
      .select(col("day").as("split_day"), col("t").as("n_before"),
        (col("n") - col("t")).as("n_after"), col("mean_before_k"),
        col("mean_after_k"), col("score"))
  }

  /** Kruskal-Wallis H: does order value differ across ALL five
    * priorities at once — the k-sample extension of q_mann_whitney
    * (running 10 pairwise U tests inflates false positives; H is the
    * one-shot answer). Combined midranks ride the scalable global
    * rank; per-group rank sums pivot into ONE row so H and its tie
    * correction are fixed double trees — never a double sum over
    * group rows. */
  private def qKruskalWallis(s: SparkSession, dir: String): DataFrame = {
    val sample = t(s, dir, "orders")
      .select(col("o_orderkey").as("ok"), col("o_orderpriority").as("grp"),
        Analytics.cents(col("o_totalprice")).as("v"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      sample.select(lit("all").as("g"), col("v").cast("double").as("ord"),
        col("ok")),
      "g", "ord", "ok", 32)
    val ties = ranked.groupBy(col("ord"))
      .agg((min(col("rnk")) + max(col("rnk"))).as("mr2"),
        count(lit(1)).as("t"))
      .localCheckpoint(eager = false)
    val tieTerm = ties.agg(
      sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
    val perGroup = ranked.select(col("ok"), col("ord"))
      .join(ties.select(col("ord"), col("mr2")), "ord")
      .join(sample.select(col("ok"), col("grp")), "ok")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("mr2")).as("r2"))
    val wideCols = priorities.zipWithIndex.flatMap { case (p, i) =>
      Seq(max(when(col("grp") === p, col("n"))).as(s"n$i"),
        max(when(col("grp") === p, col("r2"))).as(s"r$i"))
    }
    val wide = perGroup.groupBy().agg(wideCols.head, wideCols.tail: _*)
    def sumTerm: org.apache.spark.sql.Column =
      (0 to 4).map { i =>
        (col(s"r$i").cast("double") * col(s"r$i").cast("double")) /
          col(s"n$i").cast("double")
      }.reduce(_ + _)
    val nTot = (0 to 4).map(i => col(s"n$i")).reduce(_ + _)
    wide.crossJoin(broadcast(tieTerm))
      .withColumn("n_total", nTot)
      .withColumn("h_raw",
        lit(3.0) * sumTerm /
          (col("n_total").cast("double") * (col("n_total") + 1L).cast("double")) -
          lit(3.0) * (col("n_total") + 1L).cast("double"))
      .withColumn("h",
        col("h_raw") / (lit(1.0) - col("tie3").cast("double") /
          (col("n_total").cast("double") * col("n_total").cast("double") *
            col("n_total").cast("double") - col("n_total").cast("double"))))
      .select(col("n_total"), col("tie3"), col("h_raw"), col("h"))
  }

  /** Partial correlation of basket size and order value CONTROLLING
    * for total quantity — "does line-count predict spend beyond what
    * quantity already explains?" The confounder-aware upgrade over
    * q_stats_moments' raw correlation. One pass collects 10 exact
    * moments into one row; all three Pearson r's and the partial are
    * fixed double trees (products computed in double where n·Σz²
    * would leave int64). */
  private def qPartialCorr(s: SparkSession, dir: String): DataFrame = {
    val perOrder = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("x"),
        sum(col("l_quantity").cast("long")).as("y"))
      .join(t(s, dir, "orders")
          .select(col("o_orderkey"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 100")
              .as("z")),
        col("l_orderkey") === col("o_orderkey"))
    val m = perOrder.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("z") * col("z")).as("szz"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("z")).as("sxz"), sum(col("y") * col("z")).as("syz"))
    def r(sab: String, sa: String, sb: String, saa: String,
        sbb: String): org.apache.spark.sql.Column = {
      val nD = col("n").cast("double")
      (nD * col(sab).cast("double") - col(sa).cast("double") * col(sb).cast("double")) /
        (sqrt(nD * col(saa).cast("double") - col(sa).cast("double") * col(sa).cast("double")) *
          sqrt(nD * col(sbb).cast("double") - col(sb).cast("double") * col(sb).cast("double")))
    }
    m.withColumn("r_xz", r("sxz", "sx", "sz", "sxx", "szz"))
      .withColumn("r_yz", r("syz", "sy", "sz", "syy", "szz"))
      .withColumn("r_xy", r("sxy", "sx", "sy", "sxx", "syy"))
      .withColumn("r_xz_given_y",
        (col("r_xz") - col("r_xy") * col("r_yz")) /
          (sqrt(lit(1.0) - col("r_xy") * col("r_xy")) *
            sqrt(lit(1.0) - col("r_yz") * col("r_yz"))))
      .select(col("n"), col("r_xy"), col("r_xz"), col("r_yz"),
        col("r_xz_given_y"))
  }

  /** Shift-share decomposition of nation revenue growth 1996→2000:
    * Δ = national effect + regional-mix effect + competitive shift —
    * the standard regional-economics attribution ("did this nation
    * grow because everything grew, because its region grew, or
    * because it outperformed its region?"). Growth rates are exact
    * ppm integers; effects apply rates at dollar grain so every
    * product stays in int64 at any corpus size. */
  private def qShiftShare(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .filter(year(col("o_orderdate")).isin(1996, 2000))
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        expr("CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) div 100")
          .as("d1"),
        expr("CAST(sum(CASE WHEN year(o_orderdate) = 2000 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) div 100")
          .as("d2"))
      .localCheckpoint(eager = false)
    val regional = rev.groupBy(col("r_name"))
      .agg(sum(col("d1")).as("rr1"), sum(col("d2")).as("rr2"))
    val national = rev.agg(sum(col("d1")).as("t1"), sum(col("d2")).as("t2"))
    rev.filter(col("d1") > 0)
      .join(broadcast(regional), "r_name")
      .crossJoin(broadcast(national))
      .withColumn("g_nat_ppm", expr("(t2 - t1) * 1000000 div t1"))
      .withColumn("g_reg_ppm", expr("(rr2 - rr1) * 1000000 div rr1"))
      .withColumn("g_own_ppm", expr("(d2 - d1) * 1000000 div d1"))
      .withColumn("national_eff", expr("d1 * g_nat_ppm div 1000000"))
      .withColumn("mix_eff", expr("d1 * (g_reg_ppm - g_nat_ppm) div 1000000"))
      .withColumn("competitive_eff",
        expr("d1 * (g_own_ppm - g_reg_ppm) div 1000000"))
      .select(col("r_name"), col("n_name"), col("d1"), col("d2"),
        col("g_own_ppm"), col("national_eff"), col("mix_eff"),
        col("competitive_eff"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Cronbach's alpha over three cheap length-family quality items
    * (words, chars/10, 10·sentence-runs) — the internal-consistency
    * audit for any multi-item score: if alpha is low the items don't
    * measure one construct and summing them is meaningless. Item and
    * total variances come from exact integer moments in ONE pass;
    * alpha = k/(k−1)·(1 − Σvarᵢ/var_total) is a fixed double tree
    * with the k=3 item variances pivoted into one row. */
  private def qCronbach(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "documents")
      .select(
        size(split(col("text"), " ")).cast("long").as("s1"),
        expr("n_chars div 10").as("s2"),
        ((length(regexp_replace(col("text"), "[.!?]+", "S")) -
          length(regexp_replace(col("text"), "[.!?]+", ""))).cast("long") *
          10L).as("s3"))
      .withColumn("tot", col("s1") + col("s2") + col("s3"))
    val m = items.agg(count(lit(1)).as("n"),
      sum(col("s1")).as("a1"), sum(col("s1") * col("s1")).as("q1"),
      sum(col("s2")).as("a2"), sum(col("s2") * col("s2")).as("q2"),
      sum(col("s3")).as("a3"), sum(col("s3") * col("s3")).as("q3"),
      sum(col("tot")).as("at"), sum(col("tot") * col("tot")).as("qt"))
    def v(q: String, a: String): org.apache.spark.sql.Column = {
      val nD = col("n").cast("double")
      (nD * col(q).cast("double") - col(a).cast("double") * col(a).cast("double")) /
        (nD * (nD - lit(1.0)))
    }
    m.withColumn("alpha",
        (lit(3.0) / lit(2.0)) *
          (lit(1.0) - (v("q1", "a1") + v("q2", "a2") + v("q3", "a3")) /
            v("qt", "at")))
      .select(col("n"), col("alpha"))
  }

  /** Minimum detectable effect for an A/B test on the urgent-order
    * rate per nation: MDE = (z_α/2 + z_β)·√(2p̄(1−p̄)/n_arm) at 95%
    * power-80% — the experiment-sizing companion to q_ab_test ("is
    * this nation's traffic even enough to detect a 1-point move?").
    * Counts exact; the z constants are literals; MDE is a fixed
    * IEEE tree. */
  private def qMde(s: SparkSession, dir: String): DataFrame = {
    val agg0 = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("x"))
      .withColumn("n_arm", expr("n div 2"))
    val p = col("x").cast("double") / col("n").cast("double")
    agg0
      .withColumn("p_ppm", expr("x * 1000000 div n"))
      .withColumn("mde",
        lit(2.8) * sqrt(lit(2.0) * p * (lit(1.0) - p) /
          col("n_arm").cast("double")))
      .select(col("n_name"), col("n"), col("n_arm"), col("p_ppm"),
        col("mde"))
      .orderBy(col("n_name"))
  }

  /** Simpson's-paradox detector: the quantity→price association per
    * nation vs pooled — a nation whose slope SIGN flips against the
    * pooled slope is the classic aggregation trap that breaks naive
    * fleet-level conclusions. Slope signs compare the exact integer
    * OLS numerator n·Σxy − ΣxΣy (no division, no doubles), per
    * group and pooled; dollar grain keeps the pooled product in
    * int64. */
  private def qSimpsons(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("l_quantity").cast("long").as("x"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) div 100")
          .as("y"))
      .localCheckpoint(eager = false)
    val perNation = li.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
      .withColumn("num_own", col("n") * col("sxy") - col("sx") * col("sy"))
    val pooled = li.agg(count(lit(1)).as("np"), sum(col("x")).as("sxp"),
        sum(col("y")).as("syp"), sum(col("x") * col("y")).as("sxyp"))
      .withColumn("num_pooled",
        col("np") * col("sxyp") - col("sxp") * col("syp"))
      .select(col("num_pooled"))
    perNation.crossJoin(broadcast(pooled))
      .withColumn("reversed",
        (col("num_own") > 0 && col("num_pooled") < 0) ||
          (col("num_own") < 0 && col("num_pooled") > 0))
      .select(col("n_name"), col("n"), col("num_own"), col("num_pooled"),
        col("reversed"))
      .orderBy(col("n_name"))
  }

  /** Quartile coefficient of dispersion (Q3−Q1)/(Q3+Q1) of line
    * price per brand — the scale-free robust spread measure that
    * lets a $10 part family and a $10k family be compared on one
    * axis (stddev can't; IQR isn't scale-free). Nearest-rank
    * quartiles from the two-pass grouped rank; QCD is exact ppm. */
  private def qQcd(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        (col("l_orderkey") * 10L + col("l_linenumber").cast("long")).as("lk"),
        Analytics.cents(col("l_extendedprice")).as("v"))
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      li.select(col("p_brand"), col("v").cast("double").as("ord"), col("lk")),
      "p_brand", "ord", "lk", 32)
      .localCheckpoint(eager = false)
    val n = ranked.groupBy(col("p_brand")).agg(max(col("rnk")).as("n"))
    ranked.join(broadcast(n
        .withColumn("q1_rank", expr("(n + 3) div 4"))
        .withColumn("q3_rank", expr("(3 * n + 3) div 4"))), "p_brand")
      .filter(col("rnk") === col("q1_rank") || col("rnk") === col("q3_rank"))
      .groupBy(col("p_brand"))
      .agg(max(col("n")).as("n"),
        max(when(col("rnk") === col("q1_rank"), col("ord"))).cast("long")
          .as("q1_cents"),
        max(when(col("rnk") === col("q3_rank"), col("ord"))).cast("long")
          .as("q3_cents"))
      .withColumn("qcd_ppm",
        expr("(q3_cents - q1_cents) * 1000000 div (q3_cents + q1_cents)"))
      .orderBy(col("p_brand"))
  }

  /** Boilerplate detection by cross-document sentence frequency: a
    * sentence appearing in ≥5 DISTINCT docs is boilerplate (nav
    * bars, license blurbs, scraper artifacts) — the line-level
    * counterpart to q_paragraph_dedup's token-window chunks. One
    * sentence explode, one distinct-doc df shuffle on md5-sized
    * keys, then the per-source boilerplate CHARACTER share in exact
    * ppm — the number a cleaning pass reports before stripping. */
  private def qBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val sents = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), "\\. ")).as("sent"))
      .filter(length(col("sent")) > 20)
      .localCheckpoint(eager = false)
    val df = sents.groupBy(col("sent"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
    sents.join(df, "sent")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("doc_freq") >= 5, 1L).otherwise(0L)).as("n_boiler"),
        sum(length(col("sent")).cast("long")).as("total_chars"),
        sum(when(col("doc_freq") >= 5, length(col("sent")).cast("long"))
          .otherwise(0L)).as("boiler_chars"))
      .withColumn("boiler_char_ppm",
        expr("boiler_chars * 1000000 div total_chars"))
      .select(col("source"), col("n_sentences"), col("n_boiler"),
        col("boiler_char_ppm"))
      .orderBy(col("source"))
  }

  /** Tokenizer fertility per language: estimated BPE tokens per
    * whitespace word — the multilingual budget planner (a language
    * with 2× fertility costs 2× the context window for the same
    * text; the number that decides per-language sampling weights).
    * Reuses q_token_estimate's (len+3)/4 sub-word estimate; sums
    * are exact longs, fertility and chars-per-token exact ppm. */
  private def qFertility(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("words"),
        aggregate(transform(split(col("text"), " "),
            w => floor((length(w) + lit(3)).cast("double") / lit(4.0))
              .cast("long")),
          lit(0L), (a, v) => a + v).as("est_tokens"))
    toks.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("words")).as("total_words"),
        sum(col("est_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("fertility_ppm",
        expr("total_tokens * 1000000 div total_words"))
      .withColumn("chars_per_token_ppm",
        expr("total_chars * 1000000 div total_tokens"))
      .select(col("lang"), col("n_docs"), col("total_words"),
        col("total_tokens"), col("fertility_ppm"),
        col("chars_per_token_ppm"))
      .orderBy(col("lang"))
  }

  /** Curriculum staging: docs bucketed into 4 difficulty stages by
    * Flesch-Kincaid quartile (easy → hard), with the per-stage token
    * budget — the ordering table a curriculum-learning schedule
    * consumes. Difficulty ranks ride the scalable global rank;
    * stages are exact integer quartiles; per-stage token sums are
    * exact longs. */
  private def qCurriculum(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        greatest(lit(1L), size(split(col("text"), " ")).cast("long"))
          .as("words"),
        greatest(lit(1L),
          (length(regexp_replace(col("text"), "[.!?]+", "S")) -
            length(regexp_replace(col("text"), "[.!?]+", ""))).cast("long"))
          .as("sents"),
        greatest(lit(1L),
          (length(regexp_replace(lower(col("text")), "[aeiouy]+", "V")) -
            length(regexp_replace(lower(col("text")), "[aeiouy]+", "")))
            .cast("long")).as("syls"))
      .withColumn("fk_milli",
        floor((lit(0.39) * (col("words").cast("double") / col("sents").cast("double")) +
          lit(11.8) * (col("syls").cast("double") / col("words").cast("double")) -
          lit(15.59)) * 1000 + 0.5).cast("long"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      scored.select(lit("all").as("g"),
        col("fk_milli").cast("double").as("ord"), col("doc_id")),
      "g", "ord", "doc_id", 32)
    val n = ranked.agg(max(col("rnk")).as("n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("stage", expr("(rnk - 1) * 4 div n + 1"))
      .join(scored.select(col("doc_id"), col("words"), col("fk_milli")),
        "doc_id")
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("fk_milli")).as("fk_min_milli"),
        max(col("fk_milli")).as("fk_max_milli"),
        sum(col("words")).as("total_words"))
      .withColumn("mean_words", expr("total_words div n_docs"))
      .orderBy(col("stage"))
  }

  /** Odds ratio of a return given URGENT priority, with the 95%
    * log-normal CI — the 2×2 epidemiology statistic (how much more
    * likely is a return on urgent lines?). Cell counts are exact
    * longs from one scan; OR in exact ppm via two-step integer
    * division; the CI is the only double stage (ln + the Woolf SE),
    * shipped as micro-log-units per the q_entropy convention. */
  private def qOddsRatio(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        (col("o_orderpriority") === "1-URGENT").as("urgent")),
        col("l_orderkey") === col("o_orderkey"))
      .agg(
        sum(when(col("urgent") && col("l_returnflag") === "R", 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("urgent") && col("l_returnflag") =!= "R", 1L)
          .otherwise(0L)).as("b"),
        sum(when(!col("urgent") && col("l_returnflag") === "R", 1L)
          .otherwise(0L)).as("c"),
        sum(when(!col("urgent") && col("l_returnflag") =!= "R", 1L)
          .otherwise(0L)).as("d"))
    val lnOr = log((col("a") * col("d")).cast("double") /
      (col("b") * col("c")).cast("double"))
    val se = sqrt(lit(1.0) / col("a").cast("double") +
      lit(1.0) / col("b").cast("double") +
      lit(1.0) / col("c").cast("double") +
      lit(1.0) / col("d").cast("double"))
    cells
      .withColumn("or_ppm", expr("(a * 1000000 div b) * d div c"))
      .withColumn("ln_or_lo_micro",
        floor((lnOr - lit(1.96) * se) * 1000000 + 0.5).cast("long"))
      .withColumn("ln_or_hi_micro",
        floor((lnOr + lit(1.96) * se) * 1000000 + 0.5).cast("long"))
      .select(col("a"), col("b"), col("c"), col("d"), col("or_ppm"),
        col("ln_or_lo_micro"), col("ln_or_hi_micro"))
  }

  /** Wald SPRT over the daily return-rate stream: H₀ p=0.32 vs H₁
    * p=0.34 at α=0.05, β=0.2 — the sequential test that stops THE DAY
    * the evidence suffices instead of waiting for a fixed horizon.
    * The per-day log-likelihood increments are INTEGER micro-nat
    * constants (ln ratios precomputed as literals — q_ndcg's
    * no-transcendental-crosses-the-boundary convention), the LLR
    * trace is a prefix sum over the bounded day domain, and the
    * first boundary crossing is a conditional min — exact int64
    * end-to-end. */
  private def qSprt(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // c1 = round(1e6·ln(.34/.32)), c0 = round(1e6·ln(.66/.68)),
    // A = round(1e6·ln(.8/.05)), B = round(1e6·ln(.2/.95))
    val daily = t(s, dir, "lineitem")
      .groupBy(datediff(col("l_shipdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      .withColumn("llr_inc",
        col("r") * lit(60625L) + (col("n") - col("r")) * lit(-29853L))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val traced = daily
      .withColumn("llr_micro", sum(col("llr_inc")).over(w))
      .localCheckpoint(eager = false)
    traced.agg(
        count(lit(1)).as("n_days"),
        min(when(col("llr_micro") >= 2772589L, col("day"))).as("h1_day"),
        min(when(col("llr_micro") <= -1558145L, col("day"))).as("h0_day"),
        max(col("llr_micro")).as("max_llr_micro"),
        min(col("llr_micro")).as("min_llr_micro"))
      .withColumn("decision",
        when(col("h1_day").isNotNull &&
          (col("h0_day").isNull || col("h1_day") < col("h0_day")),
          lit("accept_h1"))
          .when(col("h0_day").isNotNull, lit("accept_h0"))
          .otherwise(lit("continue")))
      .withColumn("first_cross_day",
        coalesce(least(col("h1_day"), col("h0_day")),
          coalesce(col("h1_day"), col("h0_day"), lit(-1L))))
      .select(col("n_days"), col("first_cross_day"), col("decision"),
        col("max_llr_micro"), col("min_llr_micro"))
  }

  /** 10%-trimmed mean of order value per nation — the rank-band
    * companion to q_winsorize (trimming DROPS the tails instead of
    * clamping them). The band filter rnk ∈ (n/10, 9n/10] rides the
    * two-pass grouped rank; the trimmed mean is an exact cent sum
    * over the surviving band divided once. */
  private def qTrimmedMean(s: SparkSession, dir: String): DataFrame = {
    val vals = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey").as("ok"),
        Analytics.cents(col("o_totalprice")).as("v"))
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      vals.select(col("n_name"), col("v").cast("double").as("ord"), col("ok")),
      "n_name", "ord", "ok", 32)
    val n = ranked.groupBy(col("n_name")).agg(max(col("rnk")).as("n"))
    ranked.join(broadcast(n), "n_name")
      .filter(col("rnk") > expr("n div 10") &&
        col("rnk") <= expr("n - n div 10"))
      .groupBy(col("n_name"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_kept"),
        sum(col("ord").cast("long")).as("sum_cents"))
      .withColumn("trimmed_mean_cents", expr("sum_cents div n_kept"))
      .select(col("n_name"), col("n"), col("n_kept"),
        col("trimmed_mean_cents"))
      .orderBy(col("n_name"))
  }

  /** Local Outlier Factor (k=3) within IVF buckets, exact integers
    * end-to-end: fixed-point L2² pairwise distances INSIDE each
    * centroid bucket (the LSH-style scale move — never all-pairs),
    * k-distance by rank, reachability = max(d, kdist(o)), lrd as a
    * 1e18-scaled integer reciprocal, LOF in exact ppm. The density-
    * aware outlier score that catches points q_embed_outliers'
    * global-distance screen misses (a point can be near the global
    * mean yet alone in its neighborhood). Top-20 by LOF via
    * TakeOrdered. */
  private def qLof(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
      .select(col("vec_id"), col("cid"))
    val vecs = emb.join(assign, "vec_id")
      .select(col("cid"), col("vec_id"), col("embedding"))
      .localCheckpoint(eager = false)
    val d2 = vecs.as("a").join(vecs.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.cid").as("cid"), col("a.vec_id").as("p"),
        col("b.vec_id").as("o"),
        graft.functions.kernels.fixed_point_l2(col("a.embedding"),
          col("b.embedding")).as("d2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("p")).orderBy(col("d2"), col("o"))))
      .localCheckpoint(eager = false)
    val kdist = d2.filter(col("rnk") === 3)
      .select(col("p").as("o"), col("d2").as("kdist_o"))
    val neighbors = d2.filter(col("rnk") <= 3)
      .join(kdist, "o")
      .withColumn("reach", greatest(col("d2"), col("kdist_o")))
    val lrd = neighbors.groupBy(col("cid"), col("p"))
      .agg(sum(col("reach")).as("sum_reach"))
      .filter(col("sum_reach") > 0)
      // cap keeps sum_lrd_o·1e6 in int64 even for near-duplicate points
      .withColumn("lrd",
        expr("least(3 * 1000000000000000000 div sum_reach, 1000000000000)"))
      .localCheckpoint(eager = false)
    neighbors.select(col("p"), col("o"))
      .join(lrd.select(col("p").as("o"), col("lrd").as("lrd_o")), "o")
      .groupBy(col("p"))
      .agg(sum(col("lrd_o")).as("sum_lrd_o"))
      .join(lrd.select(col("cid"), col("p"), col("lrd")), "p")
      .withColumn("lof_ppm", expr("sum_lrd_o * 1000000 div (3 * lrd)"))
      .select(col("cid"), col("p").as("vec_id"), col("lof_ppm"))
      .orderBy(col("lof_ppm").desc, col("vec_id"))
      .limit(20)
  }

  /** k-NN classifier evaluation (k=3, IVF-bucketed): majority label
    * of the 3 nearest in-bucket neighbors vs the true label, per-
    * class accuracy in exact ppm — the "is this embedding space even
    * label-separable" sanity check before training anything on it.
    * Votes are integer counts; the majority pick is rank-1 by
    * (votes desc, label) — deterministic ties; distances reuse the
    * q_lof fixed-point pairwise kernel inside buckets only. */
  private def qKnnEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
      .select(col("vec_id"), col("cid"))
    val vecs = emb.join(assign, "vec_id")
      .select(col("cid"), col("vec_id"), col("embedding"),
        col("label").cast("long").as("label"))
      .localCheckpoint(eager = false)
    val neighbors = vecs.as("a").join(vecs.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("p"), col("b.vec_id").as("o"),
        col("b.label").as("label_o"),
        graft.functions.kernels.fixed_point_l2(col("a.embedding"),
          col("b.embedding")).as("d2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("p")).orderBy(col("d2"), col("o"))))
      .filter(col("rnk") <= 3)
    val votes = neighbors.groupBy(col("p"), col("label_o"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(
        Window.partitionBy(col("p")).orderBy(col("votes").desc, col("label_o"))))
      .filter(col("vr") === 1)
      .select(col("p").as("vec_id"), col("label_o").as("pred"))
    votes.join(vecs.select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L))
          .as("correct"))
      .withColumn("acc_ppm", expr("correct * 1000000 div n"))
      .orderBy(col("label"))
  }

  /** McNemar's paired test between two lang-ID thresholds (60 vs 100
    * milli-density) on the SAME docs — the right test for comparing
    * two classifiers on one dataset (independent-sample tests
    * overstate confidence when predictions are paired). Only the
    * discordant cells matter: χ² = (b−c)²/(b+c), and with integer
    * density compares it is exact int64 end-to-end (milli-scaled). */
  private def qMcnemar(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.withLangId(t(s, dir, "documents"), "text")
      .select(col("en_hits").cast("long").as("h"),
        col("n_tokens").cast("long").as("tk"),
        (col("lang") === "en").as("truth"))
      .withColumn("pred_a", col("h") * 1000L >= lit(60L) * col("tk"))
      .withColumn("pred_b", col("h") * 1000L >= lit(100L) * col("tk"))
    scored.agg(
        count(lit(1)).as("n"),
        sum(when((col("pred_a") === col("truth")) &&
          (col("pred_b") =!= col("truth")), 1L).otherwise(0L)).as("b"),
        sum(when((col("pred_a") =!= col("truth")) &&
          (col("pred_b") === col("truth")), 1L).otherwise(0L)).as("c"))
      .withColumn("chi2_milli",
        expr("CASE WHEN b + c > 0 THEN (b - c) * (b - c) * 1000 div (b + c) " +
          "ELSE 0 END"))
      .select(col("n"), col("b"), col("c"), col("chi2_milli"))
  }

  /** NOT IN anti-subquery (TPC-H Q16 shape) as ONE shared SQL text:
    * supplier diversity per (brand, size) excluding flagged suppliers.
    * NOT IN's three-valued null semantics plan as a null-aware anti
    * join in Catalyst; the subquery column is non-nullable here, so
    * both engines agree (a nullable column would make NOT IN vacuous —
    * the classic SQL trap, deliberately avoided and documented). */
  private val nestedNotInText: String =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#4' AND p_size IN (1, 5, 9, 13)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  private def qNestedNotIn(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(nestedNotInText)
  }

  /** Doubly-correlated EXISTS + NOT EXISTS (TPC-H Q21 shape) as ONE
    * shared SQL text: suppliers who shipped late on multi-supplier
    * orders where every OTHER supplier shipped on time. The NOT EXISTS
    * correlates on both the sibling lineitem AND the outer order's
    * date — the hardest decorrelation shape in the contract (Catalyst
    * rewrites both into join form). Interval arithmetic
    * (`+ INTERVAL 60 DAY`) parses identically in both engines. */
  private val lateSuppliersText: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |  AND s_suppkey % 4 = 0
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  private def qLateSuppliers(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(lateSuppliersText)
  }

  // ---- TPC-H completion sweep ---------------------------------------
  // The remaining classic TPC-H shapes not yet in the catalog, each as
  // ONE shared SQL text executed verbatim by spark.sql AND the DuckDB
  // oracle. The testdata schema has no partsupp / l_shipmode / c_phone
  // columns (TESTDATA.md), so Q2/Q11/Q20 (partsupp-anchored) are out of
  // reach and Q9/Q22 substitute documented proxies (p_retailprice as
  // unit cost; mktsegment for the phone country code). Money stays in
  // exact integer cents until the final division — the determinism
  // policy at the top of this file.

  /** Q7 volume-shipping shape: bilateral revenue between two nations by
    * ship year. The nation filter lands on both broadcast dimension
    * joins; the fact-side sum is exact cents. */
  private val volumeShippingText: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(sum(vol_c) AS BIGINT) / CAST(100.0 AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
      |      AS BIGINT) AS vol_c
      |  FROM lineitem
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  private def qVolumeShipping(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(volumeShippingText)
  }

  /** Q9 product-profit shape: per (nation, year) profit on parts whose
    * name matches a pattern. The schema has no partsupp, so unit cost is
    * a documented proxy: 80% of p_retailprice, in exact cents
    * (`floor(p_retailprice * 80 + 0.5)`). All arithmetic is int64 until
    * the final division. */
  private val productProfitText: String =
    """SELECT nation, o_year,
      |  CAST(sum(amount_c) AS BIGINT) / CAST(100.0 AS DOUBLE) AS profit
      |FROM (
      |  SELECT n_name AS nation,
      |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
      |        AS BIGINT)
      |      - CAST(floor(p_retailprice * 80 + 0.5) AS BIGINT)
      |        * CAST(l_quantity AS BIGINT) AS amount_c
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%red%'
      |) profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  private def qProductProfit(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(productProfitText)
  }

  /** Q13 customer-distribution shape: LEFT OUTER join with an extra
    * join-side predicate (which must NOT become a WHERE filter — the
    * customers with zero matching orders survive with count 0), then a
    * histogram of the per-customer counts. Two chained aggregations,
    * both on shuffle keys with full map-side partials. */
  private val custDistText: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  private def qCustDist(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(custDistText)
  }

  /** Q14 promo-revenue shape: one conditional aggregation over a
    * one-month scan window; the percentage is a single division of two
    * exact cent sums (normalized to BIGINT first — DuckDB's sum(BIGINT)
    * widens to INT128, Spark's stays int64; the CAST makes both engines
    * divide the same 64-bit values). */
  private val promoShareText: String =
    """WITH f AS (
      |  SELECT
      |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN v ELSE 0 END)
      |      AS BIGINT) AS promo_c,
      |    CAST(sum(v) AS BIGINT) AS total_c
      |  FROM (
      |    SELECT p_type,
      |      CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
      |        AS BIGINT) AS v
      |    FROM lineitem JOIN part ON p_partkey = l_partkey
      |    WHERE l_shipdate >= DATE '1997-09-01'
      |      AND l_shipdate < DATE '1997-10-01') x)
      |SELECT
      |  CAST(promo_c AS DOUBLE) * 100.0 / total_c AS promo_revenue_pct,
      |  promo_c / CAST(100.0 AS DOUBLE) AS promo_revenue,
      |  total_c / CAST(100.0 AS DOUBLE) AS total_revenue
      |FROM f""".stripMargin

  private def qPromoShare(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(promoShareText)
  }

  /** Q15 top-supplier shape: a revenue CTE referenced twice — once as
    * the join input and once inside an uncorrelated scalar MAX subquery
    * (the SQL-standard argmax-by-view). Ties all surface (no LIMIT 1),
    * ordered by the unique supplier key. */
  private val topSupplierText: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS total_c
      |  FROM lineitem
      |  WHERE l_shipdate >= DATE '1997-01-01'
      |    AND l_shipdate < DATE '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name,
      |  total_c / CAST(100.0 AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_c = (SELECT max(total_c) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  private def qTopSupplier(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(topSupplierText)
  }

  /** Q18 large-volume-order shape: grouped-HAVING IN subquery over the
    * fact table (Catalyst plans it as a semi join on the aggregated
    * keys), then the 3-way join re-aggregates the surviving orders.
    * Quantities are integral in the data — CAST to BIGINT keeps every
    * sum exact; the date is emitted as a yyyymmdd integer (timestamp
    * rendering differs between engines, integer math does not). */
  private val bigOrdersText: String =
    """SELECT c_name, c_custkey, o_orderkey,
      |  CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
      |    + day(o_orderdate) AS BIGINT) AS o_date_ymd,
      |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      |    / CAST(100.0 AS DOUBLE) AS total_price,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS BIGINT)) > 350)
      |GROUP BY 1, 2, 3, 4, 5
      |ORDER BY total_price DESC, o_orderkey""".stripMargin

  private def qBigOrders(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(bigOrdersText)
  }

  /** Q6 forecasting-revenue-change shape: the pure scan-filter-agg
    * query — every predicate pushes to the parquet scan, zero joins,
    * one partial+final aggregate. The discount BETWEEN runs on the
    * stored doubles directly (same IEEE comparison in both engines);
    * the money sum is exact cents. */
  private val forecastRevenueText: String =
    """SELECT
      |  CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
      |    AS BIGINT)) AS BIGINT) / CAST(100.0 AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1997-01-01'
      |  AND l_shipdate < DATE '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  private def qForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(forecastRevenueText)
  }

  /** Q22 global-sales-opportunity shape: customers above the positive
    * average balance with no urgent orders (scalar-average subquery +
    * predicated anti join), grouped by segment (the schema's stand-in
    * for the phone country code; in this dense data every customer has
    * SOME order, so the anti join carries Q22's extra predicate). The
    * above-average predicate is the exact integer cross-multiply
    * `bal_c * n > total_c` — no double ever enters a comparison. */
  private val idleCustomersText: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
      |  FROM customer),
      |pos AS (
      |  SELECT CAST(sum(bal_c) AS BIGINT) AS total_c,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM cust WHERE bal_c > 0)
      |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(bal_c) AS BIGINT) / CAST(100.0 AS DOUBLE) AS totacctbal
      |FROM cust, pos
      |WHERE bal_c * n > total_c
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  private def qIdleCustomers(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(idleCustomersText)
  }

  /** Window distribution functions (ntile / percent_rank / cume_dist)
    * plus explicit-arithmetic bucketing, as ONE shared SQL text with a
    * named WINDOW clause. The ORDER BY inside the window ends with the
    * unique c_custkey, so no two rows are peers and both engines'
    * rank-based doubles are the same single IEEE division. (DuckDB has
    * no width_bucket, so the bucket is spelled as floor arithmetic —
    * identical doubles either way.) */
  private val ntileDistText: String =
    """SELECT c_custkey, c_mktsegment,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cdist,
      |  1 + CAST(floor((c_acctbal - (-1000.0)) * 22 / 11000.0) AS BIGINT)
      |    AS balance_bucket
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  private def qNtileDist(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(ntileDistText)
  }

  /** GROUP BY ALL partials re-aggregated under ROLLUP with grouping()
    * flags, as ONE shared SQL text — the re-aggregation shape (fine
    * partials once, coarse levels from partials, never a second raw
    * scan) plus the modern GROUP BY ALL surface. The rollup's NULL
    * group labels order NULLS FIRST explicitly: Spark and DuckDB
    * default to opposite null placements, and the hash compare is
    * order-sensitive. */
  private val rollupGroupingText: String =
    """WITH per AS (
      |  SELECT n_name, o_orderpriority, count(*) AS n_orders,
      |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY ALL)
      |SELECT n_name, o_orderpriority,
      |  CAST(grouping(n_name) AS BIGINT) AS g_nation,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri,
      |  CAST(sum(n_orders) AS BIGINT) AS n_orders,
      |  sum(rev_c) / CAST(100.0 AS DOUBLE) AS revenue
      |FROM per
      |GROUP BY ROLLUP (n_name, o_orderpriority)
      |ORDER BY g_nation, g_pri, n_name NULLS FIRST,
      |  o_orderpriority NULLS FIRST""".stripMargin

  private def qRollupGrouping(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(rollupGroupingText)
  }

  /** Aggregate FILTER clauses + boolean aggregates as ONE shared SQL
    * text — the ANSI spelling of conditional aggregation (one scan, no
    * self-joins), all within map-side partial aggregation. Sums run in
    * integer cents; a filter that matches nothing yields NULL, hence
    * the coalesce. */
  private val aggFiltersText: String =
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
      |  coalesce(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      FILTER (WHERE l_linestatus = 'F'), 0) / CAST(100.0 AS DOUBLE)
      |    AS finished_revenue,
      |  bool_and(l_quantity > 0) AS all_positive_qty,
      |  bool_or(l_tax > 0.07) AS any_high_tax
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private def qAggFilters(s: SparkSession, dir: String): DataFrame = {
    registerTables(s, dir)
    s.sql(aggFiltersText)
  }

  /** Semi-structured VARIANT surface (Spark 4's open-schema type): a
    * JSON document assembled per event is parsed ONCE into a variant,
    * then typed paths are extracted with variant_get — object field,
    * nested array index, string field, and a deliberately wrong-typed
    * try_variant_get that must yield NULL instead of failing. The
    * oracle replays the same extractions with DuckDB's JSON functions,
    * so the values (not the engine's internal encoding) are what's
    * certified. schema_of_variant pins Spark's inferred shape. */
  private def qVariant(s: SparkSession, dir: String): DataFrame = {
    val kval = coalesce(get_json_object(col("props"), "$.k"), lit("-1"))
    val js = concat(
      lit("{\"u\":"), col("user_id"),
      lit(",\"t\":\""), col("event_type"),
      lit("\",\"vals\":["), kval, lit(","), (kval.cast("bigint") * 2).cast("string"),
      lit("]}"))
    events(s, dir)
      .select(col("event_id"), parse_json(js).as("v"))
      .select(col("event_id"),
        expr("variant_get(v, '$.u', 'bigint')").as("u"),
        expr("variant_get(v, '$.t', 'string')").as("t"),
        expr("variant_get(v, '$.vals[1]', 'bigint')").as("k2"),
        expr("try_variant_get(v, '$.t', 'bigint')").as("t_as_int"),
        expr("schema_of_variant(v)").as("v_schema"))
      .orderBy(col("event_id"))
  }

  /** Event-sequence funnel (signup → click → purchase, each stage
    * within 24 h of the previous) — the conversion analysis every
    * event-stream product runs. Spelled as three successive
    * min-aggregations joined on user_id rather than a per-user sort:
    * every stage is a shuffle on the natural user_id key with map-side
    * partial min, so the plan scales with users × stages and never
    * materializes per-user event lists. Timestamps are integer epoch
    * seconds end-to-end ([[oracle-bit-parity-policy]]: events.ts is
    * nanos-as-long). */
  private def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), col("event_type"),
      expr("ts div 1000000000").as("sec"))
    val day = 86400L
    val users = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("sec")).as("t_signup"))
    val s2 = e.join(s1, "user_id")
      .filter(col("event_type") === "click" &&
        col("sec") >= col("t_signup") && col("sec") <= col("t_signup") + day)
      .groupBy(col("user_id")).agg(min(col("sec")).as("t_click"))
    val s3 = e.join(s2, "user_id")
      .filter(col("event_type") === "purchase" &&
        col("sec") >= col("t_click") && col("sec") <= col("t_click") + day)
      .groupBy(col("user_id")).agg(min(col("sec")).as("t_purchase"))
    users
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"),
        when(col("t_purchase").isNotNull, 3L)
          .when(col("t_click").isNotNull, 2L)
          .when(col("t_signup").isNotNull, 1L)
          .otherwise(0L).as("stage"),
        col("t_signup"), col("t_click"), col("t_purchase"))
      .orderBy(col("user_id"))
  }

  /** The SAME distribution functions as q_ntile_dist, through the
    * two-pass grouped rank (ops/ScalablePrefix.groupedRank) instead of
    * a window: `PARTITION BY c_mktsegment` has ~5 distinct values, so
    * the window form funnels each segment through one task; the
    * two-pass path range-partitions on (segment, balance, key) and
    * reassembles ranks from per-(partition, group) counts.
    * percent_rank/cume_dist/ntile are then pure arithmetic on
    * (rank, group size) — each a single IEEE division or integer div,
    * bit-identical to the window definitions in both engines. The
    * oracle runs the WINDOW formulation: the 100 TB path must produce
    * the exact rows the one-task form would. */
  private def qRankScalable(s: SparkSession, dir: String): DataFrame = {
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey")),
      groupCol = "c_mktsegment", orderCol = "c_acctbal", idCol = "c_custkey",
      numPartitions = 32)
    // ntile(b): first (n % b) buckets get (n div b + 1) rows, the rest
    // (n div b) — positional arithmetic on (rnk, grp_n), guarded for
    // the degenerate grp_n < b case where the else-divisor is zero
    val b = 4L
    ranked
      .withColumn("q", expr(s"grp_n div $b"))
      .withColumn("r", col("grp_n") % b)
      .withColumn("quartile",
        when(col("rnk") <= col("r") * (col("q") + 1),
          expr("(rnk - 1) div (q + 1) + 1"))
          .otherwise(expr("r + (rnk - r * (q + 1) - 1) div q + 1")))
      .select(col("c_custkey"), col("c_mktsegment"), col("rnk"),
        when(col("grp_n") > 1,
          (col("rnk") - 1).cast("double") / (col("grp_n") - 1))
          .otherwise(lit(0.0)).as("pct_rank"),
        (col("rnk").cast("double") / col("grp_n")).as("cdist"),
        col("quartile"))
      .orderBy(col("c_custkey"))
  }

  /** EXACT per-group median without a per-group sort task: rank
    * selection on the two-pass grouped rank. The median of n values is
    * the mean of the values at 1-based ranks (n+1)/2 and (n+2)/2 —
    * when n is odd both formulas name the SAME rank, so the filter
    * keeps one row and the count-based mean below divides by 1, which
    * is why the aggregate divides by count(*) rather than a literal
    * 2 — selecting those ranks from
    * groupedRank's output turns the "sort each group through one task"
    * median into two narrow scans plus a 2-row-per-group aggregate.
    * Values are integer cents carried as exact doubles, so the final
    * mean-of-two and /100 are the only float ops, identical in both
    * engines; the oracle uses the window row_number formulation. */
  private def qMedianScalable(s: SparkSession, dir: String): DataFrame = {
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          Analytics.cents(col("o_totalprice")).cast("double").as("c"),
          col("o_orderkey")),
      groupCol = "o_orderpriority", orderCol = "c", idCol = "o_orderkey",
      numPartitions = 32)
    ranked
      .filter(col("rnk") === expr("(grp_n + 1) div 2") ||
        col("rnk") === expr("(grp_n + 2) div 2"))
      .groupBy(col("o_orderpriority"))
      .agg((sum(col("ord")) / count(lit(1)) / 100.0).as("median_price"),
        max(col("grp_n")).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Bloom-filter runtime pruning (ops/BloomPrune.scala): high-balance
    * supplier keys are compressed into 16 Kbit of bloom words by a
    * distributed bit_or aggregate, the fact scan is pre-filtered by the
    * pure-expression membership probe, and the exact broadcast join
    * then removes bloom false positives — same answer as the plain
    * semi-join (the oracle), with only the ~matching fraction of
    * lineitem surviving past the scan. */
  private def qBloomPrune(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
      .filter(col("s_acctbal") > 8000.0)
      .select(col("s_suppkey"))
    val bloom = graft.ops.BloomPrune.buildWords(sup, "s_suppkey",
      numBits = 16384, numHashes = 3)
    t(s, dir, "lineitem")
      .filter(graft.ops.BloomPrune.mightContain(bloom, col("l_suppkey")))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"),
        (sum(Analytics.cents(col("l_extendedprice"))) / 100.0).as("revenue"))
      .orderBy(col("l_suppkey"))
  }

  /** 2-D skyline (pareto frontier): the cheapest part at every size
    * where no smaller size is at least as cheap. Skyline is computed
    * the distributive way — a full groupBy first collapses the fact
    * table to one row per distinct size (bounded domain), and only that
    * tiny frontier candidate set flows through the ordered prefix-min
    * window; the unpartitioned window is over ≤|distinct sizes| rows,
    * never the raw table. Ties inside a size resolve by the encoded
    * (price_cents, partkey) pair min — deterministic in both engines.
    * Encoding capacity: partkey must stay below 1e8 (the pair stride)
    * and cents below ~9.2e18/1e8 — QueriesSpec asserts the partkey
    * bound on the verify datasets; a larger catalog needs a wider
    * stride or a two-column lexicographic min. */
  private def qSkyline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val enc = t(s, dir, "part")
      .select(col("p_size"),
        (Analytics.cents(col("p_retailprice")) * 100000000L + col("p_partkey")).as("e"))
      .groupBy(col("p_size")).agg(min(col("e")).as("enc"))
      .select(col("p_size").cast("long").as("p_size"),
        expr("enc div 100000000").as("best_c"),
        expr("enc % 100000000").as("best_partkey"))
    val prior = Window.orderBy(col("p_size"))
      .rowsBetween(Window.unboundedPreceding, -1)
    enc.withColumn("pm", min(col("best_c")).over(prior))
      .filter(col("pm").isNull || col("best_c") < col("pm"))
      .select(col("p_size"), (col("best_c") / 100.0).as("best_price"),
        col("best_partkey"))
      .orderBy(col("p_size"))
  }

  /** Chunk-level (paragraph) dedup — the composition of the chunking
    * Generator with digest dedup: documents are split into overlapping
    * token windows, each chunk is fingerprinted, fingerprints occurring
    * in more than one chunk mark their chunks as duplicated, and each
    * document reports its duplicated-chunk ratio in exact ppm. The
    * shuffle carries 16-byte digests (never chunk text), and the
    * occurrence count joins back on the same digest key. */
  private def qParagraphDedup(s: SparkSession, dir: String): DataFrame = {
    val chunks = t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.chunking.chunk_document(TextOps.tokens(col("text")), 64, 16)
          .as(Seq("chunk_idx", "chunk", "n_chunk_tokens")))
      .select(col("doc_id"), md5(col("chunk").cast("binary")).as("fp"))
    val occ = chunks.groupBy(col("fp")).agg(count(lit(1)).as("n_occ"))
    chunks.join(occ, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        expr("(n_dup_chunks * 1000000) div n_chunks").as("dup_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Exact per-group percentiles (p25/p90/p99) by nearest-rank
    * selection on the two-pass grouped rank — the same scale shape as
    * the exact median: no group is ever sorted through one task, and
    * the final aggregate touches at most three rows per group.
    * Nearest-rank definition: the p-th percentile is the value at
    * 1-based rank ceil(p·n/100) = (n·p + 99) div 100 — pure integer
    * arithmetic, identical in both engines; values are integer cents,
    * so the only float op is the final /100. */
  /** Per-group nearest-rank percentile CENTS for each p in `ps`, by
    * rank selection on the two-pass grouped rank — the shared core of
    * q_percentile_exact and q_outliers_iqr, so the nearest-rank
    * formula ((n·p + 99) div 100) is defined once. Returns one row per
    * o_orderpriority with grp_n and a p<P>_c long column per p. */
  private def orderPricePercentiles(s: SparkSession, dir: String,
      ps: Seq[Int]): DataFrame = {
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          Analytics.cents(col("o_totalprice")).cast("double").as("c"),
          col("o_orderkey")),
      groupCol = "o_orderpriority", orderCol = "c", idCol = "o_orderkey",
      numPartitions = 32)
    def rk(p: Int) = expr(s"(grp_n * $p + 99) div 100")
    val aggs = max(col("grp_n")).as("grp_n") +:
      ps.map(p => max(when(col("rnk") === rk(p), col("ord")))
        .cast("long").as(s"p${p}_c"))
    ranked
      .filter(ps.map(p => col("rnk") === rk(p)).reduce(_ || _))
      .groupBy(col("o_orderpriority"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Winsorized group means (robust-statistics cleaning): clip each
    * order's price to its priority's [p05, p95] nearest-rank fence and
    * compare the group mean before/after — the outlier-resistant
    * aggregate reporting pipelines use when a few fat-finger rows drag
    * the plain mean. Fences come off the two-pass grouped rank (no
    * per-group sort task) and broadcast back; means are exact integer
    * division. */
  private def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    val pct = orderPricePercentiles(s, dir, Seq(5, 95))
      .select(col("o_orderpriority"), col("p5_c").as("p05"), col("p95_c").as("p95"))
    t(s, dir, "orders")
      .select(col("o_orderpriority"),
        Analytics.cents(col("o_totalprice")).as("cents"))
      .join(broadcast(pct), "o_orderpriority")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        expr("sum(cents) div count(1)").as("mean_c"),
        expr("sum(greatest(p05, least(p95, cents))) div count(1)").as("wins_mean_c"))
      .orderBy(col("o_orderpriority"))
  }

  /** INTERPOLATED p90 (percentile_cont semantics: position p·(n-1),
    * linear interpolation between the bracketing values) computed
    * EXACTLY: position and fraction are integer arithmetic
    * (pos = 90·(n-1); rank = pos div 100 + 1; frac = pos mod 100),
    * the two bracketing ranks come off the same two-pass grouped rank
    * as the nearest-rank family, and the interpolation
    * v1 + frac·(v2-v1)/100 runs in cents×100 longs with ONE final
    * division — so the continuous percentile is bit-identical across
    * engines, which a float position+lerp never is. */
  private def qPercentileCont(s: SparkSession, dir: String): DataFrame = {
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          Analytics.cents(col("o_totalprice")).cast("double").as("c"),
          col("o_orderkey")),
      groupCol = "o_orderpriority", orderCol = "c", idCol = "o_orderkey",
      numPartitions = 32)
    ranked
      .withColumn("r1", expr("(90 * (grp_n - 1)) div 100 + 1"))
      .withColumn("frac", expr("(90 * (grp_n - 1)) % 100"))
      .filter(col("rnk") === col("r1") || col("rnk") === col("r1") + 1)
      .groupBy(col("o_orderpriority"))
      .agg(
        max(when(col("rnk") === col("r1"), col("ord"))).cast("long").as("v1"),
        max(when(col("rnk") === col("r1") + 1, col("ord"))).cast("long").as("v2"),
        max(col("frac")).as("frac"), max(col("grp_n")).as("n"))
      .select(col("o_orderpriority"),
        ((col("v1") * 100L +
          col("frac") * (coalesce(col("v2"), col("v1")) - col("v1")))
          / 10000.0).as("p90_cont"),
        col("n"))
      .orderBy(col("o_orderpriority"))
  }

  private def qPercentileExact(s: SparkSession, dir: String): DataFrame =
    orderPricePercentiles(s, dir, Seq(25, 90, 99))
      .select(col("o_orderpriority"),
        (col("p25_c") / 100.0).as("p25"),
        (col("p90_c") / 100.0).as("p90"),
        (col("p99_c") / 100.0).as("p99"),
        col("grp_n").as("n"))
      .orderBy(col("o_orderpriority"))

  /** Deterministic grouped mode: the most frequent order priority per
    * customer nation, ties broken by the smallest value. Two-level
    * aggregation — count per (group, value), max-count per group, join
    * back — whose shuffles carry only the distinct (group, value)
    * combinations after partial aggregation: no sort, no window, no
    * per-group funnel. Spark's built-in mode() is tie-nondeterministic,
    * which can never hash-match an oracle; the composition is the
    * contract-grade form and scales as O(groups × domain). */
  private def qMode(s: SparkSession, dir: String): DataFrame = {
    // materialize the (group, value) counts ONCE: both the max level
    // and the join-back read it, and without this the orders⋈customer
    // join + aggregation lineage executes twice (lazy checkpoint so
    // plan audits run no job — the qTriangles convention)
    val cnts = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val mx = cnts.groupBy(col("c_nationkey").as("nk"))
      .agg(max(col("cnt")).as("mx"))
    cnts.join(mx, col("c_nationkey") === col("nk") && col("cnt") === col("mx"))
      .groupBy(col("c_nationkey"))
      .agg(min(col("o_orderpriority")).as("mode_priority"),
        max(col("mx")).as("n_orders"))
      .orderBy(col("c_nationkey"))
  }

  /** CDC-style snapshot diff: the insert/update/delete change set
    * between two versions of the orders table (simulated
    * deterministically from one scan: version A drops keys ≡0 mod 10,
    * version B drops keys ≡1 mod 10 and reprices keys ≡0 mod 7). Rows
    * compare by an md5 row fingerprint, so the equality check is one
    * 16-byte compare regardless of row width — the standard wide-table
    * CDC trick — the full-outer join shuffles each side by the key
    * once, and unchanged rows (the overwhelming majority at scale) are
    * dropped before the emit. */
  /** The deterministic two-version simulation of the orders table
    * shared by the CDC queries — version A drops keys ≡0 mod 10,
    * version B drops keys ≡1 mod 10 and reprices keys ≡0 mod 7.
    * Defined ONCE so q_snapshot_diff's diff and q_ivm's delta can
    * never drift apart (their oracles spell the same simulation).
    * Both versions carry (k, prio, c). */
  private def orderVersions(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
        Analytics.cents(col("o_totalprice")).as("c"))
    (base.filter(col("k") % 10 =!= 0),
      base.filter(col("k") % 10 =!= 1)
        .withColumn("c",
          col("c") + when(col("k") % 7 === 0, 500L).otherwise(0L)))
  }

  private def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    def fp(prio: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      md5(concat_ws("|", prio, c).cast("binary"))
    val (a, b) = orderVersions(s, dir)
    val vOld = a.select(col("k").as("k_old"), col("c").as("old_c"),
      fp(col("prio"), col("c")).as("fp_old"))
    val vNew = b.select(col("k").as("k_new"), col("c").as("new_c"),
      fp(col("prio"), col("c")).as("fp_new"))
    vOld.join(vNew, col("k_old") === col("k_new"), "full_outer")
      .withColumn("change",
        when(col("k_old").isNull, "insert")
          .when(col("k_new").isNull, "delete")
          .when(col("fp_old") =!= col("fp_new"), "update"))
      .filter(col("change").isNotNull)
      .select(coalesce(col("k_old"), col("k_new")).as("o_orderkey"),
        col("change"),
        (col("old_c") / 100.0).as("old_price"),
        (col("new_c") / 100.0).as("new_price"))
      .orderBy(col("o_orderkey"))
  }

  /** Sub-document (containment) duplication: asymmetric |A∩B|/|A| over
    * the shared-shingle candidate pairs — catches a short document
    * quoted inside a long one, which symmetric Jaccard scores near
    * zero. Same inverted-index join as q_jaccard_pairs (no all-pairs;
    * df skew guard on). */
  private def qContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 5, minContain = 0.2)
      .select(col("d1"), col("d2"), col("shared"), col("n1"), col("n2"),
        col("contain_in_1"), col("contain_in_2"))
      .orderBy(col("d1"), col("d2"))

  private val Bm25Terms = Seq("spark", "merge", "window")

  /** BM25 retrieval scoring (log-free rational idf — same trick as the
    * rational TF-IDF): top-50 documents for a 3-term query. tf/dl are
    * per-row array expressions over one scan, corpus stats (N, Σdl,
    * df) one tiny broadcast aggregate, per-term contributions 1e-6
    * fixed-point longs so the cross-term sum is order-independent, and
    * the emit is TakeOrderedAndProject. */
  private def qBm25(s: SparkSession, dir: String): DataFrame =
    graft.llm.Ranking.bm25(t(s, dir, "documents"), "doc_id", "text", Bm25Terms)
      .select(col("doc_id"), col("dl"), col("tf_0"), col("tf_1"), col("tf_2"),
        col("score_fp"), col("score"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(50)

  /** 3-D skyline (minimize size, price, name length) over the DISTINCT
    * dim tuples of part — the >2-D generalization of q_skyline, where
    * the prefix-min trick alone no longer works. Decomposition:
    * (1) collapse to distinct dim tuples (one hash agg); (2) per
    * (size, price) only the min name_len can survive; (3) within each
    * size, the 2-D skyline via a strict-predecessor RANGE window over
    * the per-size slice; (4) the surviving candidate set — a superset
    * of the true skyline by the union-of-local-skylines property, and
    * tiny (≤ frontier × sizes) — goes through one broadcast dominance
    * anti-join. No all-pairs pass ever touches the full table. */
  private def qSkyline3d(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "part")
      .select(col("p_size").cast("long").as("size"),
        Analytics.cents(col("p_retailprice")).as("price_c"),
        length(col("p_name")).cast("long").as("name_len"),
        col("p_partkey"))
      .groupBy(col("size"), col("price_c"), col("name_len"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("rep_partkey"))
    val perPrice = d
      .withColumn("m",
        struct(col("name_len"), col("n_parts"), col("rep_partkey")))
      .groupBy(col("size"), col("price_c")).agg(min(col("m")).as("m"))
      .select(col("size"), col("price_c"), col("m.name_len").as("name_len"),
        col("m.n_parts").as("n_parts"), col("m.rep_partkey").as("rep_partkey"))
    val prior = Window.partitionBy(col("size")).orderBy(col("price_c"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val cand = perPrice
      .withColumn("pm", min(col("name_len")).over(prior))
      .filter(col("pm").isNull || col("name_len") < col("pm"))
      .drop("pm")
    val dom = cand.select(col("size").as("bs"), col("price_c").as("bp"),
      col("name_len").as("bn"))
    cand.join(broadcast(dom),
        col("bs") <= col("size") && col("bp") <= col("price_c") &&
          col("bn") <= col("name_len") &&
          (col("bs") < col("size") || col("bp") < col("price_c") ||
            col("bn") < col("name_len")),
        "left_anti")
      .select(col("size"), (col("price_c") / 100.0).as("price"),
        col("name_len"), col("n_parts"), col("rep_partkey"))
      .orderBy(col("size"), col("price"))
  }

  /** Multi-source BFS hop distances over the co-purchase graph (parts
    * appearing in the same order), seeds = part keys ≡0 mod 100 — the
    * iterative-traversal operator class (CC tells you the cluster, BFS
    * the distance). Level-synchronous frontier expansion: one
    * edge-join + one anti-join per level, frontier count only to the
    * driver (ops/Bfs.scala). Oracle = recursive-CTE reachability with
    * min(dist). */
  private def qBfs(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    val seeds = edges.select(col("u").as("node")).distinct()
      .filter(col("node") % 100 === 0)
    graft.ops.Bfs.distances(edges, seeds).orderBy(col("node"))
  }

  /** One-pass column profiler (the deequ/DESCRIBE-style data-quality
    * sweep a pipeline runs before training): row count, null count,
    * exact distinct count, and min/max per column, computed in ONE
    * scan (multiple distinct aggregates plan as a single Expand pass)
    * and unpivoted to a row per column via stack(). min/max cross the
    * type boundary as strings; the monetary column is profiled in
    * integer cents so no double ever renders to text (engine string
    * renderings of doubles differ — integers are identical). At 100 TB
    * the same shape runs with HLL sketches replacing the exact
    * distincts (see q_hll_distinct); exact is the contract here. */
  private def qProfile(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .withColumn("bal_c", Analytics.cents(col("c_acctbal")))
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "bal_c")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.zipWithIndex.flatMap { case (cn, i) =>
        Seq(sum(when(col(cn).isNull, 1L).otherwise(0L)).as(s"nn$i"),
          countDistinct(col(cn)).as(s"nd$i"),
          min(col(cn)).cast("string").as(s"mn$i"),
          max(col(cn)).cast("string").as(s"mx$i"))
      }
    val stackArgs = cols.zipWithIndex.map { case (cn, i) =>
      val label = if (cn == "bal_c") "c_acctbal_cents" else cn
      s"'$label', nn$i, nd$i, mn$i, mx$i"
    }.mkString(", ")
    c.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) as " +
          "(col_name, n_null, n_distinct, min_s, max_s)")
      .orderBy(col("col_name"))
  }

  /** Robust (IQR-fence) outlier detection per group, composed from the
    * rank-selection percentile path: p25/p75 come from groupedRank (no
    * per-group sort task), fences are pure integer-cents arithmetic
    * (k·IQR with k = 1/2 — Tukey's 1.5 flags nothing on this
    * short-tailed synthetic distribution, so the tighter fence keeps
    * the oracle discriminating), and the per-group fence row is
    * broadcast back onto the fact scan for one counting pass. No
    * double appears before the final /100 rendering. */
  private def qOutliersIqr(s: SparkSession, dir: String): DataFrame = {
    val cents = t(s, dir, "orders")
      .select(col("o_orderpriority"),
        Analytics.cents(col("o_totalprice")).as("c"), col("o_orderkey"))
    val fences = orderPricePercentiles(s, dir, Seq(25, 75))
      .withColumnRenamed("grp_n", "n_total")
      .withColumn("lo_c", expr("p25_c - ((p75_c - p25_c) div 2)"))
      .withColumn("hi_c", expr("p75_c + ((p75_c - p25_c) div 2)"))
    cents.join(broadcast(fences), "o_orderpriority")
      .groupBy(col("o_orderpriority"))
      .agg(max(col("p25_c")).as("p25_c"), max(col("p75_c")).as("p75_c"),
        max(col("lo_c")).as("lo_c"), max(col("hi_c")).as("hi_c"),
        max(col("n_total")).as("n_total"),
        sum(when(col("c") < col("lo_c"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("c") > col("hi_c"), 1L).otherwise(0L)).as("n_high"))
      .select(col("o_orderpriority"),
        (col("p25_c") / 100.0).as("p25"), (col("p75_c") / 100.0).as("p75"),
        (col("lo_c") / 100.0).as("lo_fence"), (col("hi_c") / 100.0).as("hi_fence"),
        col("n_total"), col("n_low"), col("n_high"),
        (col("n_low") + col("n_high")).as("n_outliers"))
      .orderBy(col("o_orderpriority"))
  }

  /** The prefix-filtered Jaccard join (AllPairs/PPJoin candidate
    * reduction, Dedup.jaccardPairsPrefix) — identical answer to the
    * plain inverted-index join, which is exactly what the oracle runs:
    * the optimization is answer-transparent. Candidate volume drops
    * from Σ df² over all shingles to the per-doc rarest-prefix index,
    * and boilerplate hot shingles sort LAST so they fall out of every
    * prefix — the skew guard emerges from the algorithm instead of a
    * tuning knob. */
  private def qJaccardPrefix(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairsPrefix(t(s, dir, "documents"), "doc_id", "text",
        k = 5, minSim = 0.05)
      .select(col("d1"), col("d2"), col("shared"), col("n1"), col("n2"),
        col("jaccard"))
      .orderBy(col("d1"), col("d2"))

  /** Weighted shortest paths (distance to the nearest hub) over a
    * sparsified co-purchase graph — Bellman-Ford relaxation
    * (ops/Bfs.weightedDistances): the weighted complement of q_bfs's
    * unit-hop traversal. Deterministic weights 1 + (u+v) mod 5; the
    * (u+v) mod 7 sparsifier keeps multi-hop structure (the dense graph
    * is all but 1 hop deep). Oracle = cost-bounded recursive-CTE
    * reachability with min(cost). */
  private def qSssp(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey") &&
          (col("a.l_partkey") + col("b.l_partkey")) % 7 === 0)
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .withColumn("w", lit(1L) + (col("u") + col("v")) % 5)
      .localCheckpoint(eager = false)
    val seeds = edges.select(col("u").as("node")).distinct()
      .filter(col("node") % 1000 === 0)
    // the oracle's recursion is bounded at cost < 100, which omits any
    // node whose TRUE shortest distance reaches the horizon (a path
    // under the horizon would itself be the shorter distance) — the
    // engine applies the identical horizon so the contract cannot
    // silently diverge on a deeper graph (observed max is 18 at sf0.1)
    graft.ops.Bfs.weightedDistances(edges, seeds)
      .filter(col("dist") < 100).orderBy(col("node"))
  }

  /** Cohort retention — the classic product-analytics triangle: users
    * cohorted by their first-activity week, then counted distinct per
    * (cohort_week, week_offset). Two aggregations keyed by user — the
    * shuffle carries users, never events — then one count-distinct per
    * cell; all week arithmetic is integer epoch-seconds (the ns-epoch
    * policy), so the cells hash-match bit-for-bit. */
  private def qRetention(s: SparkSession, dir: String): DataFrame = {
    val weeks = events(s, dir)
      .select(col("user_id"),
        expr("(ts div 1000000000) div 604800").as("week"))
      .distinct()
    val cohorts = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Order-independent table checksum — the anti-entropy primitive for
    * replica/CDC verification: per group, a bit_xor fold of a 60-bit
    * md5-derived row hash plus the row count. XOR is commutative and
    * associative, so the fold needs NO ordering guarantee from the
    * shuffle (a sum could overflow under ANSI; xor cannot), and two
    * tables can be compared replica-to-replica by exchanging one row
    * per group instead of any data. */
  private def qTableChecksum(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority"),
        conv(substring(md5(concat_ws("|",
            col("o_orderkey"), col("o_custkey"),
            Analytics.cents(col("o_totalprice"))).cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("checksum"))
      .orderBy(col("o_orderpriority"))

  /** Mergeable histogram-quantile sketch rollup (functions/Hist.scala)
    * — the quantile member of the sketch family, same shape as
    * q_hll_rollup: one long[64] bucket-count sketch per nation, merged
    * to region level by elementwise SUM (associative — rollups are
    * O(groups × B), never O(data)), then p50/p95 read off the merged
    * sketch by a cross-multiplied integer rank threshold. Estimates
    * are bucket lower bounds ($10,000 grain over [0, $640k)) — the
    * equi-width trade-off, bit-identical across engines unlike
    * approx_percentile's engine-private GK sketch. The quantile
    * selection explodes 64 rows per REGION (group-cardinality work,
    * not row work). */
  private def qHistQuantile(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hist
    import org.apache.spark.sql.expressions.Window
    val Lo = 0L; val Hi = 64000000L // cents; width exactly $10,000
    val src = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_nationkey"), col("n_regionkey"),
        Analytics.cents(col("o_totalprice")).as("c"))
    val natSketch = src.groupBy(col("n_nationkey"), col("n_regionkey"))
      .agg(Hist.hist_registers(col("c"), Lo, Hi).as("regs"))
    // materialized ONCE (lazy): four branches (cum window, n_orders,
    // p50, p95, final select) read it, and each would otherwise
    // re-execute the fact join + both UDAF levels
    val regSketch = natSketch.groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), Hist.hist_merge(col("regs")).as("regs"))
      .localCheckpoint(eager = false)
    val cum = regSketch
      .select(col("n_regionkey"), col("n_nations"),
        posexplode(col("regs")).as(Seq("idx", "cnt")))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("n_regionkey")).orderBy(col("idx"))))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col("n_regionkey"))))
    val p50 = cum.filter(col("cum") * 2 >= col("n"))
      .groupBy(col("n_regionkey")).agg(min(col("idx")).as("b50"))
    val p95 = cum.filter(col("cum") * 20 >= col("n") * 19)
      .groupBy(col("n_regionkey")).agg(min(col("idx")).as("b95"))
    regSketch.select(col("n_regionkey"), col("n_nations"))
      .join(cum.groupBy(col("n_regionkey")).agg(max(col("n")).as("n_orders")),
        "n_regionkey")
      .join(p50, "n_regionkey").join(p95, "n_regionkey")
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_nations"), col("n_orders"),
        (col("b50") * 10000L).as("p50_bucket_lo"),
        (col("b95") * 10000L).as("p95_bucket_lo"))
      .orderBy(col("r_name"))
  }

  /** Gaps-and-islands interval merging — per supplier, collapse the
    * [shipdate, receiptdate] intervals of their lineitems into maximal
    * overlapping islands and report island count + covered days. The
    * classic warehouse interval problem: an island starts where the
    * start exceeds the running max of all preceding ends (prefix-max
    * window, partitioned by the HIGH-cardinality supplier key — no
    * funnel), island ids are a running sum of the start flags, and the
    * per-island collapse is one aggregation. All date math is integer
    * epoch days; both engines compute over the identical
    * (start, end, orderkey, linenumber) total order. */
  private def qIslands(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // interval = [ship day, ship day + 1 + (okey+line) mod 14]: the
    // table has no receipt date, so the duration is derived
    // deterministically from the keys (identical in the oracle)
    val iv = t(s, dir, "lineitem")
      .select(col("l_suppkey"),
        datediff(col("l_shipdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("st"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("en",
        col("st") + 1L + (col("l_orderkey") + col("l_linenumber")) % 14)
    val order = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("st"), col("en"), col("l_orderkey"), col("l_linenumber"))
    val flagged = iv
      .withColumn("pm", max(col("en")).over(
        order.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_start",
        when(col("pm").isNull || col("st") > col("pm"), 1L).otherwise(0L))
      .withColumn("island", sum(col("is_start")).over(order))
    flagged.groupBy(col("l_suppkey"), col("island"))
      .agg(min(col("st")).as("i_start"), max(col("en")).as("i_end"),
        count(lit(1)).as("i_n"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("i_end") - col("i_start") + 1L).as("covered_days"),
        sum(col("i_n")).as("n_intervals"))
      .orderBy(col("l_suppkey"))
  }

  /** Market share (TPC-H Q8 shape): per order year, the revenue share
    * sourced from suppliers in one region. Fact⋈fact on the order key
    * (shuffle join — both sides large), every dimension broadcast, one
    * conditional aggregation; the share is a SINGLE division of two
    * exact cent sums, so the only double op is the final ratio. */
  private def qMarketShare(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        Analytics.cents(col("l_extendedprice")).as("rev_c"))
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    val supRegion = t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supRegion), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(col("rev_c")).as("total_c"),
        sum(when(col("r_name") === "ASIA", col("rev_c")).otherwise(0L))
          .as("asia_c"))
      .select(col("o_year"),
        (col("total_c") / 100.0).as("total_revenue"),
        (col("asia_c") / 100.0).as("asia_revenue"),
        (col("asia_c").cast("double") / col("total_c")).as("asia_share"))
      .orderBy(col("o_year"))
  }

  /** Sketch set algebra: the estimated OVERLAP between two regions'
    * part-key sets by inclusion-exclusion over mergeable HLL register
    * sketches — est(A) + est(B) - est(A∪B), where the union sketch is
    * the elementwise register max (exact for HLL, no re-scan). This is
    * the audience-overlap primitive: once per-segment sketches are
    * materialized, ANY pairwise overlap is O(registers), never
    * O(data). The exact intersection rides along as the accuracy
    * control, same convention as q_hll_distinct/q_hll_rollup. */
  private def qHllIntersect(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hll
    val src = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin("ASIA", "EUROPE"))
      .select(col("r_name"), col("l_partkey"),
        conv(substring(md5(col("l_partkey").cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
      // materialized ONCE: the sketch and exact aggregations group by
      // different keys (r_name vs l_partkey), so exchange reuse cannot
      // dedup them and the 4-way join would otherwise execute twice
      .localCheckpoint(eager = false)
    val sk = src.groupBy(col("r_name")).agg(Hll.hll_registers(col("h")).as("regs"))
    val a = sk.filter(col("r_name") === "ASIA").select(col("regs").as("ra"))
    val b = sk.filter(col("r_name") === "EUROPE").select(col("regs").as("rb"))
    val exact = src.groupBy(col("l_partkey"))
      .agg(countDistinct(col("r_name")).as("nr"))
      .filter(col("nr") === 2)
      .agg(count(lit(1)).as("exact_intersect"))
    a.crossJoin(b).crossJoin(exact)
      .withColumn("est_a", Hll.hll_estimate_registers(col("ra")))
      .withColumn("est_b", Hll.hll_estimate_registers(col("rb")))
      .withColumn("est_union", Hll.hll_estimate_registers(
        zip_with(col("ra"), col("rb"), (x, y) => greatest(x, y))))
      .select(col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"),
        col("exact_intersect"))
  }

  /** Incremental view maintenance: the per-priority (count, revenue)
    * aggregate of table version B is DERIVED from version A's
    * materialized aggregate plus the CDC delta — inserts add, deletes
    * subtract, updates contribute their price difference — instead of
    * rescanning B. The oracle recomputes B's aggregate directly, so
    * the gate proves maintained == recomputed. At 100 TB this is THE
    * pattern for keeping rollups fresh: work scales with the delta
    * (here ~19% of rows), not the table. Counts and cents are exact
    * longs, so increments commute and the maintained result is
    * bit-identical, not approximately converged. */
  private def qIvm(s: SparkSession, dir: String): DataFrame = {
    val (vOld, vNew) = orderVersions(s, dir)
    // the materialized view over version A
    val viewA = vOld.groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"))
    // CDC delta rows (the same diff q_snapshot_diff emits, with the
    // group key carried) collapsed to per-group increments
    val delta = vOld.select(col("k"), col("prio"), col("c"))
      .withColumnRenamed("c", "old_c").as("o")
      .join(vNew.select(col("k"), col("prio").as("prio_n"),
        col("c").as("new_c")).as("n"), Seq("k"), "full_outer")
      .filter(col("old_c").isNull || col("new_c").isNull ||
        col("old_c") =!= col("new_c"))
      .select(coalesce(col("prio"), col("prio_n")).as("prio"),
        when(col("old_c").isNull, 1L).when(col("new_c").isNull, -1L)
          .otherwise(0L).as("dn"),
        (coalesce(col("new_c"), lit(0L)) - coalesce(col("old_c"), lit(0L)))
          .as("dc"))
      .groupBy(col("prio"))
      .agg(sum(col("dn")).as("dn"), sum(col("dc")).as("dc"))
    // maintained view = A's aggregate + increments
    viewA.join(delta, Seq("prio"), "full_outer")
      .select(col("prio").as("o_orderpriority"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_orders"),
        ((coalesce(col("sum_c"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          / 100.0).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Dataset-card dedup accounting: per-source exact-duplicate rate in
    * ppm — the number every corpus datasheet reports next to the
    * source mix. One digest aggregation (the shuffle carries 16-byte
    * md5 digests, never text), then counts per source; a corpus-wide
    * total rides along via unionAll. */
  private def qDedupRate(s: SparkSession, dir: String): DataFrame = {
    val digests = t(s, dir, "documents")
      .select(col("source"), md5(col("text").cast("binary")).as("d"))
    def rate(df: DataFrame, label: org.apache.spark.sql.Column): DataFrame =
      df.groupBy(label.as("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("d")).as("n_unique"))
        .withColumn("dup_ppm",
          expr("(n_docs - n_unique) * 1000000 div n_docs"))
    rate(digests, col("source"))
      .unionAll(rate(digests, lit("__all__")))
      .orderBy(col("source"))
  }

  /** MERGE INTO (upsert-apply) semantics — the CDC APPLY step that
    * completes the family (q_snapshot_diff computes a delta, q_ivm
    * maintains an aggregate; this applies a delta to the base table):
    * WHEN MATCHED AND op='U' THEN UPDATE, WHEN MATCHED AND op='D' THEN
    * DELETE, WHEN NOT MATCHED THEN INSERT — as ONE full-outer join on
    * the key where each MERGE branch is a projection case. The source
    * batch is synthesized deterministically from the target (updates
    * +$5.00 on key%7=0, deletes key%7=1, inserts at fresh keys for
    * key%13=0). Work scales with max(|target|, |source|) through one
    * shuffle — the standard distributed upsert shape. The oracle
    * replays the merge independently; per-priority exact-cents totals
    * gate the merged table. */
  private def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val tgt = t(s, dir, "orders").select(col("o_orderkey").as("k"),
      col("o_orderpriority").as("prio"),
      Analytics.cents(col("o_totalprice")).as("c"))
    val src = tgt.filter(col("k") % 7 === 0)
        .select(col("k"), col("prio"), (col("c") + 500L).as("c"), lit("U").as("op"))
      .unionAll(tgt.filter(col("k") % 7 === 1)
        .select(col("k"), lit(null).cast("string").as("prio"),
          lit(null).cast("long").as("c"), lit("D").as("op")))
      .unionAll(tgt.filter(col("k") % 13 === 0)
        .select((col("k") + 100000000L).as("k"), col("prio"),
          (col("c") + 123L).as("c"), lit("I").as("op")))
    tgt.as("t")
      .join(src.as("s"), col("t.k") === col("s.k"), "full_outer")
      .filter(col("s.op").isNull || col("s.op") =!= "D")
      .select(
        when(col("s.op").isNull, col("t.prio")).otherwise(col("s.prio")).as("prio"),
        when(col("s.op").isNull, col("t.c")).otherwise(col("s.c")).as("c"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_orders"), (sum(col("c")) / 100.0).as("total_price"))
      .select(col("prio").as("o_orderpriority"), col("n_orders"), col("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Unigram-rarity scoring — the log-free surprisal proxy that ranks
    * documents by how unusual their vocabulary is (the cheap
    * perplexity stand-in a quality filter runs before any model): mean
    * inverse document frequency of the doc's token occurrences, in
    * exact 1e6 fixed point. The df table joins on the token key as a
    * plain shuffle join (a corpus-scale vocabulary need not be
    * broadcastable); the corpus size is ONE broadcast scalar. */
  private def qRarity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tok = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val dfTab = tok.select(col("tok"), col("doc_id")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("nd"))
    tok.join(dfTab, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(expr("(nd * 1000000) div df")).as("sum_micro"))
      .select(col("doc_id"), col("n_tokens"),
        expr("sum_micro div n_tokens").as("mean_idf_micro"))
      .orderBy(col("doc_id"))
  }

  /** Entity-resolution matching with blocking — the structured-data
    * dedup complement to the document near-dup family: candidate pairs
    * come ONLY from equi-joined (brand, size) blocks (the standard ER
    * blocking discipline — the expensive edit-distance scorer never
    * sees a cross-block pair, and the join is a plain shuffle on the
    * block key), then pairs score by name edit distance and match at
    * ≤3 edits. At corpus scale the block key is the knob: tighter
    * blocks trade recall for candidate volume, exactly like the
    * shingle-prefix trade-off in the text family. */
  private def qErMatch(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
    p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_size") === col("b.p_size") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("edit_dist",
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long"))
      .filter(col("edit_dist") <= 3)
      .select(col("a.p_partkey").as("k1"), col("b.p_partkey").as("k2"),
        col("a.p_name").as("name1"), col("b.p_name").as("name2"),
        col("a.p_brand").as("block_brand"),
        col("a.p_size").cast("long").as("block_size"), col("edit_dist"))
      .orderBy(col("k1"), col("k2"))
  }

  /** Linear gap interpolation over a sparse daily series — the
    * time-series fill step after q_gap_fill's calendar spine: known
    * points are the days ≡0 mod 3 (simulating a sparse sensor), every
    * spine day finds its bracketing known points via
    * last/first-ignore-nulls windows, and the interpolation
    * (v1·(t2-t1) + (v2-v1)·(t-t1)) div (t2-t1) runs entirely in longs
    * (non-negative, so truncating div == floor in both engines). The
    * unpartitioned windows run over the DAY DOMAIN (~2.5k rows
    * regardless of data volume) — domain-bounded like the skyline
    * frontier, not data-bounded; the heavy lifting (daily totals) is
    * a parallel aggregation before the window. */
  private def qInterpolate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .select(datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"),
        Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("v"))
    val known = daily.filter(col("day") % 3 === 0)
    val spine = known.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val wPrev = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.orderBy(col("day"))
      .rowsBetween(0, Window.unboundedFollowing)
    spine.join(known, Seq("day"), "left")
      .withColumn("t1",
        last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("v1", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("t2",
        first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wNext))
      .withColumn("v2", first(col("v"), ignoreNulls = true).over(wNext))
      .filter(col("t1").isNotNull && col("t2").isNotNull)
      .select(col("day"), col("v").isNotNull.as("known"),
        (when(col("v").isNotNull, col("v"))
          .otherwise(expr(
            "(v1 * (t2 - t1) + (v2 - v1) * (day - t1)) div (t2 - t1)"))
          / 100.0).as("value"))
      .orderBy(col("day"))
  }

  /** Time-series anomaly detection: flag days whose nation-level daily
    * revenue sits more than 3 population-sigmas from that nation's mean.
    * The moments are EXACT int64 (n, sum, sum-of-squares in whole
    * dollars — dollars, not cents, so n·Q stays far inside int64 at
    * bench scale), broadcast back onto the daily series; the z-score is
    * then ONE division and ONE sqrt of exact integers —
    * z = (x·n − S) / sqrt(n·Q − S²) — bit-identical IEEE in both
    * engines. The heavy work (daily totals) is a parallel aggregation;
    * the per-nation moment table is 25 rows. */
  private def qAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), epochDay(col("l_shipdate")).as("day"),
        Analytics.cents(col("l_extendedprice")).as("c"))
      .groupBy(col("n_name"), col("day"))
      // whole dollars (integer div): the squared-sum stays exact in int64
      .agg(expr("sum(c) div 100").as("x"))
      // the moments and the probe read the same daily table —
      // materialize it once (nation x day rows, tiny)
      .localCheckpoint(eager = false)
    val moments = daily.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("q"))
    daily.join(broadcast(moments), "n_name")
      .withColumn("z",
        (col("x") * col("n") - col("s")).cast("double") /
          sqrt((col("n") * col("q") - col("s") * col("s")).cast("double")))
      .filter(abs(col("z")) > 3.0)
      .select(col("n_name"), col("day"), col("x").as("revenue_usd"), col("z"))
      .orderBy(col("n_name"), col("day"))
  }

  /** LOCF (last-observation-carried-forward) fill with staleness
    * accounting — the step-fill sibling of q_interpolate's linear fill:
    * every day in the domain carries the most recent known value plus
    * how many days old it is (the serving-freshness audit a feature
    * store runs). Same domain-bounded window discipline: the
    * unpartitioned window runs over the ~2.5k-row day spine, never the
    * fact table. */
  private def qLocf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .select(epochDay(col("o_orderdate")).as("day"),
        Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("v"))
    val known = daily.filter(col("day") % 5 === 0)
    val spine = known.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val wPrev = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(known, Seq("day"), "left")
      .withColumn("t1",
        last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("v1", last(col("v"), ignoreNulls = true).over(wPrev))
      .filter(col("t1").isNotNull)
      .select(col("day"), col("v").isNotNull.as("known"),
        (col("v1") / 100.0).as("value"),
        (col("day") - col("t1")).as("staleness_days"))
      .orderBy(col("day"))
  }

  /** Referential-integrity audit over the star schema: every FK edge
    * scanned once, orphan children counted via a null-probe LEFT join
    * against the DISTINCT (and broadcast-small) parent key set — the
    * anti-join formulated as one aggregation, no row ever leaves the
    * scan. A deliberately corrupted copy of one edge (every 1000th
    * part key shifted out of range) proves the audit actually detects
    * violations rather than vacuously passing. */
  private def qFkOrphans(s: SparkSession, dir: String): DataFrame = {
    // dimension-sized parents broadcast, so the probe never leaves the
    // child scan; the fact-sized parent (orders) shuffle-joins inside
    // the one-pass lineitem audit below
    def audit(edge: String, child: DataFrame, key: String,
              parent: DataFrame, pkey: String): DataFrame = {
      val pk = broadcast(parent.select(col(pkey).cast("long").as("__pk")).distinct())
      child.select(col(key).cast("long").as("__fk"))
        .join(pk, col("__fk") === col("__pk"), "left")
        .agg(count(lit(1)).as("child_rows"),
          sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("orphans"))
        .select(lit(edge).as("fk_edge"), col("child_rows"), col("orphans"))
    }
    // all four fact-table edges probe in ONE lineitem pass (a per-edge
    // scan would read the 100 TB table four times): three broadcast
    // probes + the one shuffle probe (orders), counted in one agg and
    // unpivoted to edge rows
    val pPk = broadcast(t(s, dir, "part")
      .select(col("p_partkey").as("p_pk")).distinct())
    val liEdges = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .withColumn("l_partkey_bad",
        when(col("l_orderkey") % 1000 === 0, col("l_partkey") + 1000000000L)
          .otherwise(col("l_partkey")))
      .join(pPk, col("l_partkey") === col("p_pk"), "left")
      .join(pPk.select(col("p_pk").as("pb_pk")),
        col("l_partkey_bad") === col("pb_pk"), "left")
      .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey").as("s_pk")).distinct()),
        col("l_suppkey") === col("s_pk"), "left")
      .join(t(s, dir, "orders").select(col("o_orderkey").as("o_pk")).distinct(),
        col("l_orderkey") === col("o_pk"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_pk").isNull, 1L).otherwise(0L)).as("orph_o"),
        sum(when(col("p_pk").isNull, 1L).otherwise(0L)).as("orph_p"),
        sum(when(col("s_pk").isNull, 1L).otherwise(0L)).as("orph_s"),
        sum(when(col("pb_pk").isNull, 1L).otherwise(0L)).as("orph_pb"))
      .selectExpr("""stack(4,
        'lineitem->orders', n, orph_o,
        'lineitem->part', n, orph_p,
        'lineitem->supplier', n, orph_s,
        'lineitem_corrupted->part', n, orph_pb)
        AS (fk_edge, child_rows, orphans)""")
    audit("customer->nation", t(s, dir, "customer"), "c_nationkey",
        t(s, dir, "nation"), "n_nationkey")
      .unionAll(liEdges)
      .unionAll(audit("nation->region", t(s, dir, "nation"), "n_regionkey",
        t(s, dir, "region"), "r_regionkey"))
      .unionAll(audit("orders->customer", t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer"), "c_custkey"))
      .unionAll(audit("supplier->nation", t(s, dir, "supplier"), "s_nationkey",
        t(s, dir, "nation"), "n_nationkey"))
      .orderBy(col("fk_edge"))
  }

  /** Rolling 30-day distinct customers per day via mergeable HLL
    * sketches — the sliding-window distinct that powers "active users"
    * dashboards at scale: the data-sized work is ONE daily aggregation
    * into 64-register sketches; the rolling union is then a
    * per-register RANGE-window max over the (days × 64) DOMAIN —
    * work bounded by the calendar, not the data, and the window frames
    * re-merge sketches instead of rescanning raw rows. The exact
    * control recomputes each window by exploding every order onto the
    * ≤30 spine days it covers (the partitionable rewrite of the
    * sliding theta join). Same register math as q_hll_rollup, so the
    * oracle replays both sides. */
  private def qRollingDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hll
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders").select(
      epochDay(col("o_orderdate")).as("day"), col("o_custkey"),
      h60(col("o_custkey")).as("h"))
      .localCheckpoint(eager = false)
    val daily = o.groupBy(col("day")).agg(Hll.hll_registers(col("h")).as("regs"))
    val cells = daily.select(col("day"),
      posexplode(col("regs")).as(Seq("reg", "rho")))
    val rolled = cells.withColumn("m", max(col("rho")).over(
      Window.partitionBy(col("reg")).orderBy(col("day")).rangeBetween(-29, 0)))
    val est = rolled.groupBy(col("day"))
      .agg(sum(call_function("shiftleft", lit(1L),
          (lit(Hll.MaxRho) - col("m")).cast("int")))
        .as("total"))
      .select(col("day"),
        (lit(Hll.Alpha) / (col("total").cast("double") / lit(Hll.Scale)))
          .as("est_distinct"))
    val exact = o.select(explode(sequence(col("day"), col("day") + 29)).as("sday"),
        col("o_custkey"))
      .join(daily.select(col("day").as("sday")), "sday")
      .groupBy(col("sday"))
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
    est.join(exact, est("day") === exact("sday"))
      .select(col("day"), col("est_distinct"), col("exact_distinct"))
      .orderBy(col("day"))
  }

  /** EXACT weighted median — order statistics where each value counts
    * with a weight (here: per-nation median part price weighted by
    * quantity sold; the "half the volume sold below this price"
    * number). Shape discipline: weights first collapse onto the
    * (nation, price) VALUE DOMAIN, the cumulative-weight window runs
    * over that bounded domain (distinct prices, not line items), and
    * the median is the first value whose running weight reaches half
    * the total — integer cross-multiply `2·cum >= total`, no doubles
    * anywhere. */
  private def qWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wp = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("nk"),
        Analytics.cents(col("l_extendedprice")).as("p"),
        col("l_quantity").cast("long").as("w"))
      .groupBy(col("nk"), col("p")).agg(sum(col("w")).as("w"))
    // group totals as an aggregate + broadcast join, NOT a second
    // whole-partition window: the unbounded-frame window would buffer
    // each nation's rows again, while the aggregate partial-combines
    // map-side and ships 25 rows
    val totals = wp.groupBy(col("nk").as("tnk")).agg(sum(col("w")).as("tw"))
    val cum = wp.withColumn("cw", sum(col("w")).over(
        Window.partitionBy(col("nk")).orderBy(col("p"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(totals), col("nk") === col("tnk"))
    cum.filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("nk"))
      .agg(min(col("p")).as("median_c"), max(col("tw")).as("total_weight"))
      .select(col("nk").cast("long").as("nationkey"),
        (col("median_c") / 100.0).as("weighted_median_price"),
        col("total_weight"))
      .orderBy(col("nationkey"))
  }

  /** Benford first-digit audit — the classic fabricated-numbers screen
    * run on monetary columns: observed first-digit shares of
    * o_totalprice vs Benford's log10(1+1/d) expectation. Expectations
    * are integer ppm LITERALS (log10 evaluated at authoring time), so
    * no transcendental function output ever crosses the engine
    * boundary; shares and deltas are exact integer arithmetic. */
  private def qBenford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L)
    val exp = benford.zipWithIndex
      .map { case (ppm, i) => (i + 1L, ppm) }
      .toDF("digit", "benford_ppm")
    val digits = t(s, dir, "orders")
      .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("total"))
    digits.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("n * 1000000 div total"))
      .join(broadcast(exp), Seq("digit"))
      .withColumn("delta_ppm", col("share_ppm") - col("benford_ppm"))
      .select(col("digit"), col("n"), col("share_ppm"),
        col("benford_ppm"), col("delta_ppm"))
      .orderBy(col("digit"))
  }

  /** Mann-Kendall trend test over the monthly revenue series — the
    * nonparametric "is this metric actually trending" statistic:
    * S = Σ_{i<j} sign(v_j − v_i) over all month pairs, with Kendall's
    * tau in exact ppm. The pair join runs over the MONTH DOMAIN (~80
    * rows → ~3k pairs regardless of data volume); the data-sized work
    * is one monthly aggregation. Everything is integer sign arithmetic
    * — no distributional assumption, no doubles until never. */
  private def qTrendTest(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("m"),
        Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("m")).agg(sum(col("c")).as("v"))
      .localCheckpoint(eager = false)
    val pairs = monthly.select(col("m").as("mi"), col("v").as("vi"))
      .join(monthly.select(col("m").as("mj"), col("v").as("vj")),
        col("mi") < col("mj"))
      .select(signum(col("vj") - col("vi")).cast("long").as("sgn"))
    val n = monthly.agg(count(lit(1)).as("n"))
    pairs.agg(sum(col("sgn")).as("s_stat"), count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(n))
      .select(col("n").as("n_months"), col("s_stat"), col("n_pairs"),
        expr("s_stat * 1000000 div n_pairs").as("tau_ppm"))
  }

  /** Chi-square independence audit between order priority and customer
    * market segment: the contingency table in one join+aggregation,
    * expectations and per-cell contributions in exact integer
    * cross-multiplies — contrib = (n·N − r·c)²·1e6 div (r·c·N) — so
    * the statistic is a sum of exact longs (order-independent; a
    * naive double Σ would be partitioning-dependent). The grand total
    * rides along via a broadcast scalar. */
  private def qChiSquare(s: SparkSession, dir: String): DataFrame = {
    val joined = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderpriority").as("prio"))
      .join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
    // checkpoint the CONTINGENCY TABLE (|prios| x |segments| rows), not
    // the join: the margins and total re-aggregate 25 rows, and the
    // data-sized join+count runs exactly once
    val cells = joined.groupBy(col("prio"), col("seg"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val rows = cells.groupBy(col("prio")).agg(sum(col("n")).as("r"))
    val cols_ = cells.groupBy(col("seg")).agg(sum(col("n")).as("c"))
    val total = cells.agg(sum(col("n")).as("nn"))
    val contrib = cells.join(broadcast(rows), "prio")
      .join(broadcast(cols_), "seg").crossJoin(broadcast(total))
      // two-step division keeps every intermediate inside int64 at any
      // SF (d² alone would overflow); both engines truncate toward
      // zero, and q1 and d share a sign so the product is non-negative
      .withColumn("contrib_micro",
        expr("((n * nn - r * c) * 1000000 div (r * c)) * (n * nn - r * c) div nn"))
    val chi2 = contrib.agg(sum(col("contrib_micro")).as("chi2_micro"))
    contrib.crossJoin(broadcast(chi2))
      .select(col("prio"), col("seg"), col("n"),
        expr("(r * c * 1000000) div nn").as("expected_micro"),
        col("contrib_micro"), col("chi2_micro"))
      .orderBy(col("prio"), col("seg"))
  }

  /** Time-weighted average (TWAP-style) of each user's event values:
    * every observation is weighted by how long it remained current
    * (the gap to the user's next event — a lead over the unique
    * per-user (ts, event_id) order), so irregular sampling cannot bias
    * the mean toward burst periods. Weights are exact nanosecond
    * longs; values quantize at 1e3; the ONLY double op is the final
    * weighted division. Last events (no successor) carry no weight —
    * the standard half-open-interval convention. */
  private def qTwap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // order AND difference at MICROsecond precision: DuckDB timestamps
    // carry us, so both the successor chain and the weights must be
    // derived from the same truncated clock in both engines
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"),
        Analytics.fp(col("value"), 1000L).as("v"))
      .withColumn("nxt", lead(col("tus"), 1).over(w))
      .filter(col("nxt").isNotNull)
      // weights in MILLIseconds: v(1e3-scaled) x weight must stay far
      // inside int64 after the per-user sum
      .withColumn("wt", expr("(nxt - tus) div 1000"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("wt")).as("span_ms"),
        sum(col("v") * col("wt")).as("vw"))
      .filter(col("user_id") % 17 === 0) // bounded dump, same operator shape
      .select(col("user_id"), col("n_obs"), col("span_ms"),
        (col("vw").cast("double") / col("span_ms") / 1000.0).as("twap"))
      .orderBy(col("user_id"))
  }

  /** Join-key skew diagnostic — the "does this key need salting"
    * report the salted-join pattern depends on: for each candidate
    * shuffle key, the per-key frequency distribution summarized as
    * top-key share (ppm) and nearest-rank p50/p99 frequencies. The
    * percentiles come from the frequency-OF-frequencies table (one
    * row per DISTINCT per-key count — tiny at any scale), so the only
    * window runs over that bounded domain: no rank pass ever touches
    * the key-cardinality-sized table, let alone the data. */
  private def qDataSkew(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def skew(keyName: String, df: DataFrame, key: String): DataFrame = {
      val freq = df.groupBy(col(key).cast("long").as("k"))
        .agg(count(lit(1)).as("f"))
        .localCheckpoint(eager = false)
      val stats = freq.agg(count(lit(1)).as("n_keys"),
        sum(col("f")).as("n_rows"), max(col("f")).as("max_f"))
      val ff = freq.groupBy(col("f")).agg(count(lit(1)).as("cnt"))
      val cum = ff.withColumn("cum",
        sum(col("cnt")).over(Window.orderBy(col("f"))))
      val ranks = stats.select(expr("(n_keys + 1) div 2").as("r50"),
        expr("(99 * n_keys + 99) div 100").as("r99"))
      val sel = cum.crossJoin(broadcast(ranks))
        .agg(min(when(col("cum") >= col("r50"), col("f"))).as("p50_f"),
          min(when(col("cum") >= col("r99"), col("f"))).as("p99_f"))
      stats.crossJoin(sel)
        .select(lit(keyName).as("join_key"), col("n_keys"), col("n_rows"),
          col("max_f"),
          expr("max_f * 1000000 div n_rows").as("top_share_ppm"),
          col("p50_f"), col("p99_f"),
          expr("p99_f * 100 div p50_f").as("p99_over_p50_pct"))
    }
    val li = t(s, dir, "lineitem")
    skew("lineitem.l_suppkey", li, "l_suppkey")
      .unionAll(skew("lineitem.l_partkey", li, "l_partkey"))
      .unionAll(skew("orders.o_custkey", t(s, dir, "orders"), "o_custkey"))
      .orderBy(col("join_key"))
  }

  /** Event transition matrix (first-order Markov estimate): per-user
    * next-event pairs from a high-cardinality-key window (ordered by
    * the unique (ts, event_id)), counted and normalized to exact-ppm
    * transition probabilities per source state. The sequence-mining
    * primitive behind "what do users do after X" product analytics. */
  private def qTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("prev")).agg(sum(col("n")).as("total"))
    pairs.join(broadcast(totals), "prev")
      .select(col("prev"), col("next"), col("n"),
        expr("n * 1000000 div total").as("prob_ppm"))
      .orderBy(col("prev"), col("next"))
  }

  /** Exact OLS regression per nation: slope / intercept / r² of line
    * revenue (whole dollars) against quantity, from five exact integer
    * sums — ONE shuffle on the group key with map-side partial
    * aggregation, dimension lookup broadcast. The closed-form
    * combination is a fixed tree of deterministic double ops applied to
    * the exact sums (same discipline as q_stats_moments, which stops at
    * corr), so results are bit-identical across engines — unlike the
    * built-in regr_slope/regr_intercept/regr_r2, whose double
    * accumulation order is partition-dependent. */
  private def qRegression(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_suppkey"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice")).cast("long").as("y"))
    val dim = broadcast(
      t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
    li.join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(Seq(col("n_name"), col("n")) ++ {
        val nd = col("n").cast("double")
        val (sx, sy, sxx, syy, sxy) = (col("sx").cast("double"),
          col("sy").cast("double"), col("sxx").cast("double"),
          col("syy").cast("double"), col("sxy").cast("double"))
        val cov = nd * sxy - sx * sy
        val vx = nd * sxx - sx * sx
        val vy = nd * syy - sy * sy
        Seq((cov / vx).as("slope"),
          ((sy - (cov / vx) * sx) / nd).as("intercept"),
          (cov * cov / (vx * vy)).as("r2"))
      }: _*)
      .orderBy(col("n_name"))
  }

  /** A-priori frequent-itemset mining (pairs) + association rules over
    * order baskets (items = part brands). The candidate space is pruned
    * to frequent items FIRST — the a-priori monotonicity bound: no pair
    * can be frequent unless both members are — so the per-basket
    * self-join scales with Σ frequent-basket-size², never |items|²; the
    * item-support table is tiny and rides along broadcast. Support,
    * confidence (both directions), and lift are exact integer ppm. */
  private def qItemsets(s: SparkSession, dir: String): DataFrame = {
    // materialize the distinct basket-item list ONCE: it feeds the
    // basket total, the item supports, and both sides of the pair
    // self-join — unmaterialized, each use would replay the scan +
    // distinct shuffle (the qTriangles edge-list convention)
    val baskets = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      .distinct()
      .localCheckpoint(eager = false)
    val tot = baskets.agg(countDistinct(col("basket")).as("n_baskets"))
    val freq = baskets.groupBy(col("item")).agg(count(lit(1)).as("supp"))
      .crossJoin(broadcast(tot))
      .filter(col("supp") * 20 >= col("n_baskets"))   // item minsup 5%
      .select(col("item"), col("supp"))
    val fb = baskets.join(broadcast(freq.select(col("item"))), "item")
    fb.select(col("basket"), col("item").as("i1"))
      .join(fb.select(col("basket"), col("item").as("i2")), Seq("basket"))
      .filter(col("i1") < col("i2"))
      .groupBy(col("i1"), col("i2")).agg(count(lit(1)).as("supp"))
      .crossJoin(broadcast(tot))
      .filter(col("supp") * 100 >= col("n_baskets"))  // pair minsup 1%
      .join(broadcast(freq.select(col("item").as("i1"), col("supp").as("s1"))), "i1")
      .join(broadcast(freq.select(col("item").as("i2"), col("supp").as("s2"))), "i2")
      .select(col("i1"), col("i2"), col("supp"), col("s1"), col("s2"),
        expr("supp * 1000000 div s1").as("conf12_ppm"),
        expr("supp * 1000000 div s2").as("conf21_ppm"),
        // two-step division: supp*n_baskets*1e6 would overflow int64
        // once baskets reach ~10^7 (ANSI would kill the query at the
        // very scale a-priori is for); conf12 <= 1e6 keeps the
        // intermediate bounded by 1e6 * n_baskets
        expr("(supp * 1000000 div s1) * n_baskets div s2").as("lift_ppm"))
      .orderBy(col("i1"), col("i2"))
  }

  /** Integer-exact exponential decay (EMA) of daily revenue: weight
    * 2^-age per day of age over a 20-day horizon. The textbook EMA
    * recurrence is inherently serial; the bounded-horizon form is
    * associative and distributes as a cover-day explode — each day
    * contributes to exactly 20 target days with a left-shift weight, so
    * the whole series needs ONE shuffle on the day key and no
    * sequential scan (the same calendar-bounded-explode idiom as
    * q_rolling_distinct). The final scaled-sum / 2^19 division only
    * moves the double's exponent, so results are bit-identical. */
  private def qEma(s: SparkSession, dir: String): DataFrame = {
    // materialized once: the contribution explode and the observed-day
    // join both read it (lazy checkpoint, qItemsets convention)
    val daily = t(s, dir, "orders")
      .select(epochDay(col("o_orderdate")).as("day"),
        Analytics.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .localCheckpoint(eager = false)
    daily
      .withColumn("k", explode(sequence(lit(0), lit(19))))
      .select((col("day") + col("k")).as("t"),
        expr("shiftleft(cents, 19 - k)").as("c"))
      .groupBy(col("t")).agg(sum(col("c")).as("scaled"))
      .join(daily.select(col("day")), col("t") === col("day"))
      .select(col("day"), (col("scaled") / lit(524288.0)).as("ema"))
      .orderBy(col("day"))
  }

  /** First BPE merge-table round over the document corpus: word
    * frequencies (the one corpus-wide scan+shuffle tokenizer training
    * ever pays), then adjacent character-pair counts weighted by word
    * frequency — the argmax of this table is the first merge of a BPE
    * tokenizer (Sennrich et al., ACL 2016). The full iterative trainer
    * (TextOps.bpeTrain) replays this per round over the collapsed
    * vocabulary only; this query pins round 1 against the oracle. */
  private def qBpePairs(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextOps.bpePairCounts(
      graft.llm.TextOps.wordFreq(t(s, dir, "documents"), "text")
        .select(graft.llm.TextOps.charSymbols(col("w")).as("syms"), col("freq")))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(30)

  /** Distributed Lloyd's k-means over the embedding corpus (k=8, one
    * update round from the deterministic lowest-id seed), then the
    * final assignment summarized per cluster with the learned first
    * coordinate as a model checksum. The corpus never shuffles — the
    * k × dim model moves by broadcast, assignment argmax is a
    * map-side-combining aggregate, and the update reduces (cid, dim)
    * partial sums (Clustering.lloyd). Oracle = the same round unrolled
    * in SQL over the same fixed-point arithmetic. */
  private def qKmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = graft.llm.Clustering.lloyd(emb, "vec_id", "embedding", k = 8, rounds = 1)
    graft.llm.Clustering.assign(emb, "vec_id", "embedding", cents)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), min(col("vec_id")).as("min_vec"))
      .join(broadcast(cents.select(col("cid"), element_at(col("cf"), 1).as("c0_fp"))), "cid")
      .orderBy(col("cid"))
  }

  /** Semantic deduplication (SemDeDup-style, cf. Abbas et al. 2023):
    * k-means clusters become LEARNED blocking keys, and near-duplicate
    * cosine pairs are mined only within a cluster — q_embed_near_dup's
    * blocking with the label column replaced by the model's own
    * geometry, so the pair join stays linear in cluster size with no
    * labeled data. Composes Clustering.lloyd/assign with
    * Similarity.nearDupPairs unchanged. */
  private def qSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = graft.llm.Clustering.lloyd(emb, "vec_id", "embedding", k = 8, rounds = 1)
    val assigned = emb
      .join(graft.llm.Clustering.assign(emb, "vec_id", "embedding", cents), "vec_id")
    Similarity.nearDupPairs(assigned, "vec_id", "embedding", "cid", minSim = 0.35)
      .orderBy(col("v1"), col("v2"))
  }

  /** Embedding outlier screen (out-of-distribution filter): the 20
    * vectors whose best similarity to ANY learned centroid is lowest —
    * far from every cluster ⇒ likely noise/OOD, the curation
    * counterpart of q_semantic_dedup's "too close" pairs. One scored
    * assignment pass (broadcast model, map-side argmax), then a
    * bounded TakeOrdered — no window, no second scan. */
  private def qEmbedOutliers(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = graft.llm.Clustering.lloyd(emb, "vec_id", "embedding", k = 8, rounds = 1)
    graft.llm.Clustering.assignScored(emb, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("d").as("best_d"))
      .orderBy(col("best_d"), col("vec_id"))
      .limit(20)
  }

  /** Product-quantization ADC search: 64-dim vectors compress to 8
    * per-subspace codes against a deterministic sub-centroid codebook
    * (the 16 lowest-id vectors' slices); the query scores candidates
    * through the broadcast lookup table WITHOUT touching the original
    * vectors — the memory-bound path of IVF-PQ ANN at billion-vector
    * scale (q_ivf_search supplies the bucketing half). Top-10 by exact
    * integer ADC score. */
  private def qPqAdc(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = Similarity.subVectors(emb.filter(col("vec_id") < 16), "embedding", 8, 8)
      .select(col("s"), col("vec_id").as("cid"), col("sub").as("csub"))
    val codes = Similarity.pqAssign(emb, "vec_id", "embedding", cents, 8, 8)
    val lut = Similarity.subVectors(emb.filter(col("vec_id") === 0), "embedding", 8, 8)
      .select(col("s"), col("sub").as("qsub"))
      .join(cents, "s")
      .select(col("s"), col("cid"), Similarity.dotFp(col("qsub"), col("csub")).as("d"))
    Similarity.pqAdcScores(codes, "vec_id", lut)
      .orderBy(col("adc_fp").desc, col("vec_id"))
      .limit(10)
  }

  /** Label-propagation community detection (2 synchronous rounds,
    * deterministic min-label ties) over the co-purchase graph — the
    * community member of the graph family; CC/BFS/PageRank/triangles
    * answer reachability/centrality/density, this answers membership.
    * Output: per-community size and smallest member. */
  private def qLabelProp(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val half = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val edges = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    graft.ops.LabelProp.run(edges, rounds = 2)
      .groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_node"))
      .orderBy(col("community"))
  }

  /** PMI-style collocation extraction: bigram lift = p(w1 w2) /
    * (p(w1) p(w2)) over the token stream — the corpus statistic behind
    * phrase induction ("new york" as one token) in tokenizer/vocab
    * pipelines. Counts are exact longs from one bigram shuffle and one
    * unigram shuffle; the unigram table rides back broadcast; the score
    * is one fixed tree of double ops (monotone transform of log-PMI, so
    * ranking-equivalent and bit-portable). Minimum-count gates kill the
    * long noise tail before the join. */
  private def qPmi(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents").select(split(col("text"), " ").as("tk"))
    // both count tables are materialized ONCE (lazy checkpoint): uni
    // feeds the totals and two broadcast joins, bcnt the totals and
    // the main pass — unmaterialized, each consumer replays the
    // documents scan + explode + aggregate (the qItemsets convention)
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val bi = toks.select(explode(graft.llm.TextOps.adjacentPairs(col("tk"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cab"))
      .localCheckpoint(eager = false)
    val totals = uni.agg(sum(col("c")).as("t_tokens"))
      .crossJoin(bi.agg(sum(col("cab")).as("t_bigrams")))
    bi.filter(col("cab") >= 5)
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), "w2")
      .crossJoin(broadcast(totals))
      .filter(col("c1") >= 10 && col("c2") >= 10)
      .select(col("w1"), col("w2"), col("cab"), col("c1"), col("c2"),
        ((col("cab").cast("double") * col("t_tokens").cast("double")
          * col("t_tokens").cast("double")) /
         (col("t_bigrams").cast("double") * col("c1").cast("double")
          * col("c2").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(25)
  }

  /** Source-mixture token-budget allocation: given per-source mixture
    * weights, split a token budget into per-source targets and emit the
    * sampling rate (ppm, capped at 1 — no upsampling) that realizes
    * each target, plus an undersupply flag where the source simply
    * lacks the tokens. The planning step of "hit this data mixture" in
    * LLM pre-training runs; one aggregate over the corpus, then pure
    * integer arithmetic on the per-source table. */
  private def qTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("tokens"))
      .withColumn("w", substring(col("source"), 4, 10).cast("long") % 4 + 1)
    val tw = src.agg(sum(col("w")).as("total_w"))
    src.crossJoin(broadcast(tw))
      .select(col("source"), col("tokens"), col("w"),
        expr("10000 * w div total_w").as("target_tokens"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("target_tokens * 1000000 div tokens")))
      .withColumn("expected_tokens", expr("tokens * rate_ppm div 1000000"))
      .withColumn("undersupplied", col("tokens") < col("target_tokens"))
      .orderBy(col("source"))
  }

  /** Revenue-concentration (Pareto) audit: how many top customers
    * carry 80% of revenue, via the two-pass range-partitioned prefix
    * sum (ScalablePrefix) over a descending-revenue key encoding — the
    * global-window formulation would funnel every customer through one
    * task. Encoding: ascending key = (2^36 − cents)·2^26 + custkey, so
    * ascending key order IS (revenue desc, custkey) order. Bounds:
    * cents < 2^36 (≈ $687M per customer — TPC-H tops out ~$5M) and
    * custkey < 2^26 (≈ 67M customers ≈ SF 440); outside them the
    * encoding is invalid, so both are asserted loudly rather than
    * silently mis-sorting. */
  private def qPareto(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("cents"))
      .select(when(col("cents") < (1L << 36) && col("o_custkey") < (1L << 26),
          (lit(1L << 36) - col("cents")) * lit(1L << 26) + col("o_custkey"))
        .otherwise(raise_error(lit(
          "q_pareto key encoding overflow: cents >= 2^36 or custkey >= 2^26")))
        .as("k"), col("cents"))
    val run = graft.ops.ScalablePrefix.runningSum(s, cust, "k", "cents", 32)
    val tot = run.agg(sum(col("cents")).as("t"), count(lit(1)).as("n"),
      max(col("cents")).as("topc"))
    run.crossJoin(broadcast(tot))
      .filter(col("run_sum") * 5 >= col("t") * 4)
      .agg(max(col("n")).as("n_customers"),
        min(col("run_cnt")).as("n_for_80pct"),
        expr("max(topc) * 1000000 div max(t)").as("top_share_ppm"))
  }

  /** Two-proportion A/B z-test: customers split into variants by key
    * parity, exposure = any order, conversion = at least one order in
    * 1995 (≈0.78 at every SF — a genuinely two-sided proportion; the
    * events table's purchase rate saturates at 1.0, which degenerates
    * the pooled variance). Counts are exact longs from ONE
    * customer-keyed aggregation pass; z is the pooled-variance
    * statistic as a fixed tree of double ops — the experiment-readout
    * companion to q_chi_square (independence) and q_trend_test
    * (monotone trend). */
  private def qAbTest(s: SparkSession, dir: String): DataFrame = {
    val users = t(s, dir, "orders")
      .groupBy((col("o_custkey") % 2).as("variant"), col("o_custkey"))
      .agg(max(when(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
          col("o_orderdate") < lit("1996-01-01").cast("date"), 1L)
        .otherwise(0L)).as("conv"))
    val g = users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val wide = g.filter(col("variant") === 0)
      .select(col("n").as("n0"), col("c").as("c0"))
      .crossJoin(g.filter(col("variant") === 1)
        .select(col("n").as("n1"), col("c").as("c1")))
    wide.select(Seq(col("n0"), col("c0"), col("n1"), col("c1")) ++ {
      val (n0, c0, n1, c1) = (col("n0").cast("double"), col("c0").cast("double"),
        col("n1").cast("double"), col("c1").cast("double"))
      val p0 = c0 / n0
      val p1 = c1 / n1
      val p = (c0 + c1) / (n0 + n1)
      Seq(((p1 - p0) /
        sqrt(p * (lit(1.0) - p) * (lit(1.0) / n0 + lit(1.0) / n1))).as("z"))
    }: _*)
  }

  /** Bigram-LM fluency scoring: each document's mean conditional
    * probability P(w2|w1) over its bigrams, in exact ppm — the
    * corpus-statistics fluency screen (low mean ⇒ token soup), the
    * conditional cousin of q_rarity's unigram surprisal. Bigram and
    * unigram counts come from two aggregations; the per-doc score joins
    * bigram occurrences against the count tables on the bigram key
    * (shuffle join — corpus-scale vocabulary, NOT broadcast) and
    * reduces with one integer mean per doc. */
  private def qNgramLm(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
    val bi = toks.select(col("doc_id"),
        explode(graft.llm.TextOps.adjacentPairs(col("tk"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .localCheckpoint(eager = false)
    val bcnt = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
    val ucnt = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    bi.join(bcnt, Seq("w1", "w2")).join(ucnt, Seq("w1"))
      .select(col("doc_id"), expr("cab * 1000000 div c1").as("cond_ppm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(cond_ppm) div count(1)").as("mean_cond_ppm"))
      .orderBy(col("doc_id"))
  }

  /** ML feature preparation in one pass: leave-one-out target encoding
    * (the category mean EXCLUDING the current row — the standard
    * leakage-safe categorical encoding) and per-group min-max scaling,
    * both from ONE grouped aggregate broadcast back onto the fact scan.
    * All integer arithmetic: LOO = (Σ−x) div (n−1), scale in exact ppm;
    * degenerate groups (n=1 / constant) yield null, not a crash. */
  private def qFeaturePrep(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        Analytics.cents(col("o_totalprice")).as("cents"))
    val g = o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    o.join(broadcast(g), "o_orderpriority")
      .select(col("o_orderkey"), col("o_orderpriority"),
        when(col("n") > 1, expr("(s - cents) div (n - 1)")).as("loo_mean_cents"),
        expr("(cents - mn) * 1000000 div nullif(mx - mn, 0)").as("minmax_ppm"))
      .orderBy(col("o_orderkey"))
  }

  /** Two-sample Kolmogorov–Smirnov distribution-drift test per nation:
    * D = max |F̂₁(x) − F̂₂(x)| between urgent-ish and ordinary orders'
    * price distributions, computed EXACTLY — counts collapse onto the
    * distinct value DOMAIN first (the q_weighted_median convention, so
    * the per-nation window walks distinct prices, not rows), and the
    * sup statistic is the max of |c1·n2 − c2·n1| integer
    * cross-products, one division to ppm at the end. The
    * drift-monitoring companion to q_chi_square (categorical) for
    * continuous columns. Nations missing either sample drop out
    * (HAVING both populated) instead of dividing by zero. */
  private def qKsTest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nk"),
        Analytics.cents(col("o_totalprice")).as("v"),
        (col("o_orderpriority") <= "2-HIGH").as("g1"))
    val dom = o.groupBy(col("nk"), col("v"))
      .agg(sum(when(col("g1"), 1L).otherwise(0L)).as("d1"),
        sum(when(!col("g1"), 1L).otherwise(0L)).as("d2"))
    val w = Window.partitionBy(col("nk")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = dom.groupBy(col("nk"))
      .agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"))
      .filter(col("n1") > 0 && col("n2") > 0)
    dom
      .withColumn("c1", sum(col("d1")).over(w))
      .withColumn("c2", sum(col("d2")).over(w))
      .join(broadcast(tot), "nk")
      .groupBy(col("nk"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("d_num"))
      .select(col("nk").cast("long").as("nationkey"), col("n1"), col("n2"),
        // two-step ×1000 division: d_num ≤ n1·n2, so a single ×1e6
        // would overflow int64 right where drift is largest at big SF
        // (the q_chi_square convention); identical rounding both engines
        expr("(d_num * 1000 div n1) * 1000 div n2").as("ks_ppm"))
      .orderBy(col("nationkey"))
  }

  /** Exact Gini coefficient of customer revenue inequality via the
    * closed form over ascending-sorted values, G = (2·Σi·xᵢ −
    * (n+1)·Σxᵢ) / (n·Σxᵢ): ranks come from the two-pass
    * range-partitioned prefix sum (run_cnt IS the ascending rank — no
    * global window funnel), moment sums are exact longs, and G is one
    * fixed double tree. Completes the concentration family: q_pareto
    * answers "how many carry 80%", q_gini (Simpson) scores categorical
    * diversity, this scores continuous inequality. Same loud key-
    * encoding guard as q_pareto (cents < 2^37, custkey < 2^26). */
  private def qLorenzGini(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("cents"))
      .select(when(col("cents") < (1L << 37) && col("o_custkey") < (1L << 26),
          col("cents") * lit(1L << 26) + col("o_custkey"))
        .otherwise(raise_error(lit(
          "q_lorenz_gini key encoding overflow: cents >= 2^37 or custkey >= 2^26")))
        .as("k"), col("cents"))
    val run = graft.ops.ScalablePrefix.runningSum(s, cust, "k", "cents", 32)
    // loud pre-flight: Σ rank·cents ≤ n·Σcents, so the moment sum is
    // int64-safe iff n·sx < 2^62 — checked from two cheap scalars
    // BEFORE the product sum runs (a wrapped sum would be silent)
    val head = run.agg(max(col("run_cnt")), sum(col("cents"))).head()
    val (nChk, sxChk) = (head.getLong(0), head.getLong(1))
    if (nChk > 0 && sxChk > (1L << 62) / nChk) throw new IllegalStateException(
      s"q_lorenz_gini moment sum would overflow int64 (n=$nChk, total_cents=$sxChk)" +
        " — compute on a coarser currency unit")
    run.agg(max(col("run_cnt")).as("n"), sum(col("cents")).as("sx"),
        sum(col("run_cnt") * col("cents")).as("six"))
      .select(Seq(col("n"), col("sx")) ++ {
        val (n, sx, six) = (col("n").cast("double"),
          col("sx").cast("double"), col("six").cast("double"))
        Seq(((lit(2.0) * six - (n + lit(1.0)) * sx) / (n * sx)).as("gini"))
      }: _*)
  }

  /** Zipf rank–frequency diagnostic over the token distribution: for
    * the top-20 tokens, rank × frequency — near-constant under Zipf's
    * law, so drift in the product flags a skewed/degenerate corpus
    * (boilerplate floods, template spam) without any log/regression
    * fit. One token aggregation, a bounded top-k, integer products. */
  private def qZipf(s: SparkSession, dir: String): DataFrame = {
    val freq = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(20)
    import org.apache.spark.sql.expressions.Window
    // 20 rows: the window is a formality, not a funnel
    freq.withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("w"))).cast("long"))
      .select(col("rank"), col("w"), col("freq"),
        (col("rank") * col("freq")).as("rank_x_freq"))
      .orderBy(col("rank"))
  }

  /** Gini–Simpson diversity of the corpus source mix: 1 − Σ(nᵢ/N)² and
    * the inverse-Simpson "effective source count" — the dataset-card
    * diversity number next to q_source_mix's shares. Exact integer
    * arithmetic end to end (one tiny aggregation over per-source
    * counts); Σnᵢ² stays far inside int64 at any driver SF. */
  private def qGini(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    src.agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_sources"),
        sum(col("n") * col("n")).as("ss"))
      .select(col("n_docs"), col("n_sources"),
        expr("(n_docs * n_docs - ss) * 1000000 div (n_docs * n_docs)")
          .as("gini_ppm"),
        expr("n_docs * n_docs * 1000 div ss").as("effective_sources_milli"))
  }

  /** One-time physical-layout preparation for a dataset dir: builds the
    * bucketed table copies q_bucketed_join reads. Benchmark harnesses
    * call this during warmup so the timed pass measures the co-located
    * join, not the layout write — the same convention as excluding
    * index builds from steady-state query timing. (Building the query
    * runs ensureBucketed eagerly; no action needed.) */
  def prepareLayouts(s: SparkSession, dir: String): Unit = {
    qBucketedJoin(s, dir)
    ()
  }

  /** DuckDB rendering of Similarity.dotFp (1e-9 fixed point); `dims`
    * defaults to the corpus width, 64 — pass less for prefix
    * (matryoshka-truncated) dots. */
  private def duckDot(a: String, b: String, dims: Int = 64): String =
    s"list_sum(list_transform(generate_series(1,$dims), i -> " +
      s"CAST(floor(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)))"

  private def duckCos(dab: String, daa: String, dbb: String): String =
    s"($dab / 1000000000.0) / (sqrt($daa / 1000000000.0) * sqrt($dbb / 1000000000.0))"

  /** Shared oracle CTE chain replaying one Lloyd round (seed = lowest-8
    * ids, fixed-point floor-mean update) ending at `a2` (the final
    * assignment) and `c1` (the learned centroids) — consumed by
    * q_kmeans and q_semantic_dedup. */
  private lazy val kmeansAssignCtes: String =
    """c0 AS (
      |  SELECT CAST(vec_id AS BIGINT) AS cid,
      |    list_transform(embedding, v ->
      |      CAST(floor(CAST(v AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)) AS cf
      |  FROM embeddings WHERE vec_id < 8),
      |d1 AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(generate_series(1, 64), i ->
      |      CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cf[i] AS DOUBLE) + 0.5) AS BIGINT))) AS d
      |  FROM embeddings e CROSS JOIN c0 c),
      |a1 AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
      |    FROM d1) x WHERE rn = 1),
      |s1 AS (
      |  SELECT a.cid, i,
      |    CAST(sum(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS s,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM embeddings e
      |  JOIN a1 a ON e.vec_id = a.vec_id
      |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) dims
      |  GROUP BY a.cid, i),
      |c1 AS (
      |  SELECT cid,
      |    list(CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) ORDER BY i) AS cf
      |  FROM s1 GROUP BY cid),
      |d2 AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(generate_series(1, 64), i ->
      |      CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cf[i] AS DOUBLE) + 0.5) AS BIGINT))) AS d
      |  FROM embeddings e CROSS JOIN c1 c),
      |a2 AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
      |    FROM d2) x WHERE rn = 1)""".stripMargin

  /** Recursive-reachability oracle for connected components over the
    * Jaccard near-dup pair graph — shared by q_dup_clusters (min-label
    * propagation) and q_cc_star (star contraction): two different
    * distributed algorithms, one ground truth. */
  /** The shared CTE chain ending at `reach` (transitive closure of the
    * Jaccard near-dup pair graph) — composed into three oracles. */
  private lazy val dupClustersCtes: String =
    s"""$duckShingles,
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |cand AS (
       |  SELECT doc_id, s FROM sh
       |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
       |                  HAVING count(*) > ${graft.llm.Dedup.DefaultMaxShingleDf})),
       |p AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
       |  FROM cand a JOIN cand b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT d1, d2 FROM p
       |  JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
       |  WHERE shared / (c1.n + c2.n - shared) >= 0.05),
       |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
       |          UNION SELECT d2, d1 FROM pairs),
       |reach AS (
       |  SELECT a AS node, a AS label FROM edges
       |  UNION
       |  SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.node)""".stripMargin

  private lazy val dupClustersOracle: String =
    s"""WITH RECURSIVE $dupClustersCtes
       |SELECT node AS doc_id, min(label) AS cluster,
       |       min(label) = node AS is_representative
       |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  /** DuckDB replay of TextOps.cdcChunks (mask 16): boundary tokens by
    * the shared h60 convention, running boundary count per doc, chunk
    * text reassembled in position order and md5'd. Ends at `chunks`
    * (doc_id, chunk_id, n_toks, chunk_hash). */
  private lazy val duckCdcChunks: String =
    """tok AS (
      |  SELECT doc_id, unnest(generate_series(1, len(tk))) AS i, tk
      |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) d),
      |flags AS (
      |  SELECT doc_id, i, tk[i] AS t,
      |    CASE WHEN CAST('0x' || substr(md5(tk[i]), 1, 15) AS BIGINT) % 16 = 0
      |         THEN 1 ELSE 0 END AS boundary
      |  FROM tok),
      |cids AS (
      |  SELECT doc_id, i, t,
      |    sum(boundary) OVER (PARTITION BY doc_id ORDER BY i) AS chunk_id
      |  FROM flags),
      |chunks AS (
      |  SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n_toks,
      |    md5(string_agg(t, ' ' ORDER BY i)) AS chunk_hash
      |  FROM cids GROUP BY doc_id, chunk_id)""".stripMargin

  /** DuckDB rendering of Dedup.shingles (k=5, distinct). */
  private val duckShingles: String =
    """sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(tk) - 4),
      |    i -> array_to_string(tk[i:i+4], ' ')))) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) toks)""".stripMargin

  /** Temperature-scaled training-mixture allocation (τ = 0.5): a
    * source's sampling weight ∝ sqrt(its token count) — the standard
    * up-weighting of small sources when composing a pre-training data
    * epoch — then a 1-billion-token budget is apportioned by largest
    * remainder, so per-source allocations are exact integers that sum
    * to the budget. sqrt of an exact int64 is correctly-rounded IEEE
    * in both engines; everything downstream is int64. The windows run
    * over the per-source AGGREGATE — cardinality is the source
    * catalog (20 here), a bounded dimension independent of corpus
    * size, so the single-partition window is scale-safe. */
  private def qEpochMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 1000000000L
    val bySrc = t(s, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tk"))
      .groupBy(col("source")).agg(sum(col("tk")).as("tokens"))
      .withColumn("sc", floor(sqrt(col("tokens").cast("double"))).cast("long"))
    val all = Window.partitionBy()
    bySrc
      .withColumn("tot", sum(col("sc")).over(all))
      .withColumn("base", expr(s"($budget * sc) div tot"))
      .withColumn("frac", expr(s"($budget * sc) % tot"))
      .withColumn("short", lit(budget) - sum(col("base")).over(all))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("frac").desc, col("source"))).cast("long"))
      .select(col("source"), col("tokens"),
        expr("(1000000 * sc) div tot").as("weight_ppm"),
        (col("base") + when(col("rn") <= col("short"), 1L).otherwise(0L))
          .as("alloc_tokens"))
      .orderBy(col("source"))
  }

  /** Multinomial naive-Bayes trainer for the language label: one
    * token-explode scan feeds (class, token) counts, per-class token
    * totals, and the vocabulary size — all map-side-combining
    * aggregates — and the model row is the add-1-smoothed conditional
    * in exact ppm, `(c+1)·10⁶ div (T+|V|)`, beside the class prior.
    * Top-5 tokens per class via a window whose input is the
    * VOCABULARY-sized count table (|V| rows per class, independent of
    * corpus row count), not the corpus. Class-total and vocab frames
    * are broadcast (≤ |classes| and 1 row). */
  private def qNaiveBayes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("lang"),
      explode(TextOps.tokens(col("text"))).as("token"))
    val tc = toks.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("c"))
    val classTot = toks.groupBy(col("lang")).agg(count(lit(1)).as("t"))
    val vocab = toks.select(col("token")).distinct().agg(count(lit(1)).as("v"))
    val priors = docs.groupBy(col("lang")).agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("ntot"))))
      .select(col("lang"), expr("(1000000 * nd) div ntot").as("prior_ppm"))
    tc.join(broadcast(classTot), "lang")
      .crossJoin(broadcast(vocab))
      .withColumn("p_ppm", expr("((c + 1) * 1000000) div (t + v)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("c").desc, col("token"))).cast("long"))
      .filter(col("rn") <= 5)
      .join(broadcast(priors), "lang")
      .select(col("lang"), col("rn"), col("token"), col("c"),
        col("p_ppm"), col("prior_ppm"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Holt linear-trend exponential smoothing over the daily revenue
    * series (α = 1/5, β = 1/10), entirely in integer cents:
    * l_t = (y_t + 4(l+b)) div 5, b_t = ((l_t − l) + 9b) div 10 —
    * `div` truncates toward zero, and DuckDB's integer `//` has the
    * same truncating semantics (verified on negative operands), so
    * negative trends replay exactly.
    * The unbounded order stream first reduces to one row per
    * day (calendar-bounded: ~2.4k rows at ANY corpus scale), and only
    * that bounded series is folded sequentially through
    * `aggregate()` — the same bounded-series argument as the EMA
    * operator; the oracle replays the recurrence as a recursive CTE. */
  private def qHolt(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("c"))
    daily
      .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("arr"))
      .select(explode(expr(
        """aggregate(
          |  slice(arr, 2, size(arr) - 1),
          |  named_struct(
          |    'l', arr[0].c, 'b', CAST(0 AS BIGINT),
          |    'rows', array(named_struct(
          |      'day', arr[0].day, 'c', arr[0].c,
          |      'l', arr[0].c, 'b', CAST(0 AS BIGINT)))),
          |  (acc, x) -> named_struct(
          |    'l', (x.c + 4 * (acc.l + acc.b)) div 5,
          |    'b', ((x.c + 4 * (acc.l + acc.b)) div 5 - acc.l
          |          + 9 * acc.b) div 10,
          |    'rows', concat(acc.rows, array(named_struct(
          |      'day', x.day, 'c', x.c,
          |      'l', (x.c + 4 * (acc.l + acc.b)) div 5,
          |      'b', ((x.c + 4 * (acc.l + acc.b)) div 5 - acc.l
          |            + 9 * acc.b) div 10)))),
          |  acc -> acc.rows)""".stripMargin)))
      .select(col("col.day").as("day"), col("col.c").as("rev_c"),
        col("col.l").as("level_c"), col("col.b").as("trend_c"),
        (col("col.l") + col("col.b")).as("forecast_c"))
      .orderBy(col("day"))
  }

  /** Personalized PageRank (3 unrolled iterations, damping 0.85) over
    * the qPagerank co-purchase graph, with ALL teleport mass pinned to
    * the seed set (partkey ≡ 0 mod 100) — the "related to these
    * parts" ranking. Exact int64 fixed point at 1e6 like qPagerank;
    * the one structural difference is the per-iteration LEFT join from
    * the node universe (deg), because a node's teleport term exists
    * even when no in-neighbor contributed mass this round. Edge and
    * degree relations materialize once; each iteration is one
    * equi-join + dest-keyed aggregation + node-keyed left join. */
  private def qPpr(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem").filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val und = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val edges = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .localCheckpoint(eager = false)
    val withDeg = edges.join(deg, "u").localCheckpoint(eager = false)
    def teleport(node: org.apache.spark.sql.Column, full: Boolean) =
      when(node % 100 === 0, lit(if (full) 1000000L else 150000L))
        .otherwise(lit(0L))
    var pr = deg.select(col("u").as("node"))
      .withColumn("pr", teleport(col("node"), full = true))
    for (_ <- 1 to 3) {
      val mass = withDeg.join(pr, withDeg("u") === pr("node"))
        .select(col("v"), expr("pr div d").as("contrib"))
        .groupBy(col("v"))
        .agg(expr("(85 * sum(contrib)) div 100").as("m"))
      pr = deg.select(col("u").as("node"))
        .join(mass, col("node") === col("v"), "left")
        .select(col("node"),
          (teleport(col("node"), full = false) +
            coalesce(col("m"), lit(0L))).as("pr"))
    }
    pr.filter(col("pr") > 0)
      .join(deg, pr("node") === deg("u"))
      .select(col("node"), col("pr").as("pr_fp"), col("d").as("degree"),
        (col("node") % 100 === 0).as("is_seed"))
      .orderBy(col("node"))
  }

  /** SimHash near-dup candidate pairs through 4×8-bit band buckets:
    * docs sharing any band of their 32-bit fingerprint meet in a
    * bucket-equi-join (never all-pairs), and by pigeonhole a pair
    * within hamming ≤ 3 differs in at most 3 of the 4 bands, so
    * banding has EXACT recall at that radius — the sub-quadratic
    * candidate shape that keeps simhash dedup viable at corpus scale.
    * The fingerprint frame materializes once and fans into the four
    * band projections; the bucket join carries only (id, fp, key). */
  private def qSimhashHamming(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.simhash32(t(s, dir, "documents"), "doc_id", "text")
      .localCheckpoint(eager = false)
    val bands = (0 until 4).map { b =>
      sh.select(col("doc_id"), col("simhash32"), lit(b).as("band"),
        expr(s"(simhash32 div ${1L << (8 * b)}) % 256").as("key"))
    }.reduce(_ union _)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        expr("bit_count(x.simhash32 ^ y.simhash32)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("d1"), col("d2"))
  }

  /** Higher-order array-function sweep — lambda expressions evaluated
    * inside whole-stage codegen, no UDF: filter (long-token count),
    * aggregate (char total and sum of squared lengths via transform),
    * exists / forall (membership and case audit), and array_sort +
    * slice rendered to a string. Pure per-row map over a pruned scan;
    * zero shuffle. */
  private def qHofFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .withColumn("tk", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        expr("size(filter(tk, t -> length(t) > 4))").cast("long").as("n_long"),
        expr("aggregate(tk, CAST(0 AS BIGINT), (a, t) -> a + length(t))")
          .as("total_chars"),
        expr("aggregate(transform(tk, t -> CAST(length(t) * length(t) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x)").as("sum_sq"),
        expr("exists(tk, t -> t = 'spark')").as("has_spark"),
        expr("forall(tk, t -> t = lower(t))").as("all_lower"),
        expr("array_join(slice(array_sort(tk), 1, 3), ',')").as("first3"))
      .orderBy(col("doc_id"))

  /** Positional explode (the ordinal-generator surface): token with its
    * 0-based position, bounded to the first 10 per document — the
    * oracle replays ordinality via generate_series ≤ len. */
  private def qPosexplode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .filter(col("pos") < 10)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("token"))
      .orderBy(col("doc_id"), col("pos"))

  /** ORC sink+source fidelity (the third columnar format next to
    * parquet and Avro): part out as ORC into the build dir, back in
    * with the parquet schema, aggregated vs the straight-from-parquet
    * oracle — lossless types or the hash gate catches it. */
  private def qOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "part")
    val out = fmtDir(dir, "part_orc")
    src.write.mode("overwrite").orc(out)
    s.read.schema(src.schema).orc(out)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(Analytics.cents(col("p_retailprice"))).as("price_cents"),
        sum(col("p_size")).as("size_sum"),
        min(col("p_name")).as("first_name"))
      .orderBy(col("p_brand"))
  }

  /** Per-document content-defined chunking profile (TextOps.cdcChunks,
    * mask 16): chunk count, largest chunk, and total tokens — the
    * storage-layout audit run before chunk-level dedup. One explode →
    * per-doc window → two aggregations; every stage keyed by doc. */
  private def qCdcChunks(s: SparkSession, dir: String): DataFrame =
    TextOps.cdcChunks(t(s, dir, "documents"), "doc_id", "text")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("n_toks")).as("max_chunk"),
        sum(col("n_toks")).as("total_toks"))
      .orderBy(col("doc_id"))

  /** Chunk-level storage dedup ratio per source: distinct chunk hashes
    * over total chunks (ppm) — what CDC chunking would save if each
    * chunk were stored once. The distinct runs on 16-byte md5 chunk
    * identities, never chunk text, keyed by (source, hash). */
  private def qChunkDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextOps.cdcChunks(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("total_chunks"),
        countDistinct(col("chunk_hash")).as("uniq_chunks"))
      .select(col("source"), col("total_chunks"), col("uniq_chunks"),
        expr("(1000000 * uniq_chunks) div total_chunks").as("dedup_ppm"))
      .orderBy(col("source"))
  }

  /** Reciprocal-rank fusion (k = 60) of two document rankings — by
    * length and by distinct-token count — the standard way to combine
    * retrieval signals without score calibration. BOTH ranks come from
    * the two-pass range-partitioned rank (ScalablePrefix.groupedRank),
    * not a single-task global window, and the fused score is exact
    * integer: 10⁹ div (60 + r₁) + 10⁹ div (60 + r₂). Top-25 via
    * TakeOrderedAndProject. */
  private def qRrf(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "documents")
      .select(col("doc_id"), lit("all").as("g"),
        col("n_chars").cast("double").as("len_ord"),
        size(array_distinct(TextOps.tokens(col("text"))))
          .cast("double").as("uniq_ord"))
      .localCheckpoint(eager = false)
    def rankBy(ordCol: String, out: String) =
      graft.ops.ScalablePrefix.groupedRank(s,
          m.select(col("g"), (-col(ordCol)).as("o"), col("doc_id")),
          groupCol = "g", orderCol = "o", idCol = "doc_id",
          numPartitions = 32)
        .select(col("doc_id"), col("rnk").as(out))
    rankBy("len_ord", "rank_len")
      .join(rankBy("uniq_ord", "rank_uniq"), "doc_id")
      .select(col("doc_id"), col("rank_len"), col("rank_uniq"),
        expr("1000000000 div (60 + rank_len) + 1000000000 div (60 + rank_uniq)")
          .as("rrf_fp"))
      .orderBy(col("rrf_fp").desc, col("doc_id")).limit(25)
  }

  /** As-of join WITH TOLERANCE: each click takes the user's most
    * recent purchase only when it happened within the last hour,
    * otherwise no match — the bounded-staleness point-in-time lookup
    * (feature stores call this the max-age rule). Same single
    * sort-window pass as the plain as-of (Analytics.asOfLast); the
    * tolerance is a post-predicate, not a second join. */
  private def qAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val horizon = 3600L * 1000000000L
    events(s, dir)
      .withColumn("lp",
        Analytics.asOfLast(col("user_id"), Seq(col("ts"), col("event_id")),
          col("event_type") === "purchase", col("ts")))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        (col("lp").isNotNull && col("ts") - col("lp") <= horizon)
          .as("matched"),
        when(col("lp").isNotNull && col("ts") - col("lp") <= horizon,
          expr("(ts - lp) div 1000000000")).as("gap_s"))
      .orderBy(col("event_id"))
  }

  /** NULL-semantics audit — the aggregate/grouping corners users trip
    * on, pinned against the oracle: COUNT(*) vs COUNT(col) vs
    * COUNT(DISTINCT col) under NULLs (via a NULLIF-derived column),
    * NULLs forming their own GROUP BY key, and min/max skipping
    * NULLs. Pure one-pass aggregate. */
  private def qNullAudit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(expr("nullif(l_returnflag, 'N')").as("flag"),
        expr("nullif(l_discount, 0.0)").as("disc"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("disc")).as("n_nonnull"),
        countDistinct(col("disc")).as("n_distinct"),
        sum(when(col("disc").isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("disc")).as("min_disc"),
        max(col("disc")).as("max_disc"))
      .orderBy(col("flag"))

  /** Half-life-decayed engagement score per event type: each event
    * contributes value·2^(−age/30d), computed EXACTLY as integer
    * cents divided by a power-of-two (shift, capped at 2⁴⁰) — the
    * order-independent integer form of exponential time decay, so the
    * distributed sum is partitioning-proof. Reference time is the
    * stream's max timestamp (broadcast scalar). */
  private def qDecayScore(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .crossJoin(broadcast(events(s, dir).agg(max(col("ts")).as("mx"))))
      .select(col("event_type"),
        Analytics.cents(col("value")).as("vc"),
        least(expr("(mx - ts) div 2592000000000000"), lit(40L)).as("k"))
      .select(col("event_type"),
        expr("vc div shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))").as("dv"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("dv")).as("decayed_cents"))
      .orderBy(col("event_type"))

  /** Decision-stump trainer: the best single price threshold
    * predicting a returned line (l_returnflag = 'R'), by minimum
    * Gini impurity. One pass builds per-bucket (n, positives); the
    * cumulative scan runs over the BUCKET table (price-range/5000
    * rows — bounded by the price domain, not the data volume), and
    * impurity is computed in ppm ratios so the arithmetic never
    * outgrows int64 at any corpus scale. Emits the 5 best splits. */
  private def qDecisionStump(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = t(s, dir, "lineitem")
      .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) div 500000")
          .as("bucket"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
    val cum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    b.withColumn("nl", sum(col("n")).over(cum))
      .withColumn("pl", sum(col("p")).over(cum))
      .withColumn("nt", sum(col("n")).over(all))
      .withColumn("pt", sum(col("p")).over(all))
      .filter(col("nl") < col("nt")) // right side must be non-empty
      .withColumn("lp", expr("(1000000 * pl) div nl"))
      .withColumn("rp", expr("(1000000 * (pt - pl)) div (nt - nl)"))
      .withColumn("gl", expr("1000000 - (lp * lp + (1000000 - lp) * (1000000 - lp)) div 1000000"))
      .withColumn("gr", expr("1000000 - (rp * rp + (1000000 - rp) * (1000000 - rp)) div 1000000"))
      .withColumn("gini_ppm", expr("(nl * gl + (nt - nl) * gr) div nt"))
      .select(((col("bucket") + 1) * 5000).as("threshold_dollars"),
        col("nl").as("left_n"), col("pl").as("left_pos"), col("gini_ppm"))
      .orderBy(col("gini_ppm"), col("threshold_dollars")).limit(5)
  }

  /** STL-lite additive decomposition of the daily revenue series:
    * trend = 7-day centered moving average, seasonal = per-weekday
    * mean of the detrended values, residual = remainder — all in
    * integer cents with truncating division, so the decomposition is
    * exact and engine-portable. The ordered windows run over the
    * day-level AGGREGATE (calendar-bounded, like Holt/EMA); the
    * seasonal profile is a 7-row broadcast. */
  private def qStlLite(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("c"))
    val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val tr = daily
      .withColumn("tsum", sum(col("c")).over(w))
      .withColumn("tn", count(lit(1)).over(w))
      .withColumn("trend_c", expr("tsum div tn"))
      .withColumn("det", col("c") - col("trend_c"))
      .withColumn("wd", pmod(col("day") + 4, lit(7)))
    val seas = tr.groupBy(col("wd"))
      .agg(sum(col("det")).as("ssum"), count(lit(1)).as("sn"))
      .select(col("wd"), expr("ssum div sn").as("seasonal_c"))
    tr.join(broadcast(seas), "wd")
      .select(col("day"), col("c").as("rev_c"), col("trend_c"),
        col("seasonal_c"), (col("det") - col("seasonal_c")).as("residual_c"))
      .orderBy(col("day"))
  }

  /** Per-source dataset card — the datasheet a curation run publishes
    * beside a corpus: volume (docs, tokens, chars), language spread
    * (count + plurality language), and the within-source exact-dup
    * rate (1 − distinct md5 / docs, in ppm). One corpus scan feeds
    * both aggregates; the plurality-language rank runs over the
    * (source × lang) table — catalog-bounded, not corpus-sized. */
  private def qSourceCard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val base = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("est_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(md5(col("text").cast("binary"))).as("uniq_texts"),
        sum(col("n_chars")).as("chars"))
    val top = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("ln"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("ln").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    base.join(broadcast(top), "source")
      .select(col("source"), col("n_docs"), col("est_tokens"),
        col("n_langs"), col("top_lang"),
        expr("(1000000 * (n_docs - uniq_texts)) div n_docs").as("dup_ppm"),
        expr("chars div n_docs").as("mean_chars"))
      .orderBy(col("source"))
  }

  /** Join-strategy hint surface: the same orders⋈lineitem aggregate
    * forced through a SHUFFLE_HASH join — no sort phase, the right
    * choice when both sides are large but one partitions into
    * RAM-sized hash maps (vs sort-merge's spill-friendly default).
    * The answer is hint-invariant (the oracle is the plain join);
    * PlanAuditSpec pins the ShuffledHashJoin operator so a planner
    * regression can't silently fall back. */
  private def qShuffleHashJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), Analytics.cents(col("l_extendedprice")).as("lc"))
      .hint("shuffle_hash")
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("lc")).as("rev_cents"))
      .orderBy(col("o_orderpriority"))

  /** Matryoshka-truncation retrieval audit: for each query vector, the
    * top-10 neighbor set by FULL 64-dim cosine vs by the FIRST-16-DIM
    * prefix cosine, reporting the overlap — the acceptance test run
    * before serving truncated embeddings (MRL-style) to cut index cost
    * 4×. Both rankings use the broadcast-query + per-query
    * stratifiedTopN shape (no global sort, no all-pairs); the overlap
    * join carries only (qid, vec_id) pairs. */
  private def qMatryoshkaEval(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id").isin(0, 7, 42))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def topIds(proj: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val scored = emb.crossJoin(broadcast(queries))
        .select(col("qid"), col("vec_id"),
          lpad(greatest(lit(0L),
              floor((lit(1.0) - Similarity.cosineFp(proj(col("embedding")),
                proj(col("qv")))) * 1e9 + 0.5).cast("long")).cast("string"),
            12, "0").as("distkey"))
      graft.ops.Sampling.stratifiedTopN(s, scored, "qid", "distkey", "vec_id", n = 10)
        .select(col("qid"), col("vec_id"))
    }
    topIds(identity).as("f")
      .join(topIds(v => slice(v, 1, 16)).as("tr"),
        col("f.qid") === col("tr.qid") && col("f.vec_id") === col("tr.vec_id"))
      .groupBy(col("f.qid").cast("long").as("qid"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("qid"), col("n_overlap"),
        expr("(1000000 * n_overlap) div 10").as("overlap_ppm"))
      .orderBy(col("qid"))
  }

  /** Cross-source shingle overlap — the train/eval separation audit at
    * source granularity: per source, how many of its distinct 5-gram
    * shingles also occur in ANOTHER source (shared_ppm high = the
    * source adds little novel text). Shape: distinct (source, shingle)
    * pairs → shingle spread count → per-source aggregate; the shuffle
    * key is the shingle, the same inverted-index discipline as
    * jaccardPairs (never all-pairs of sources). */
  private def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // shuffle discipline: 8-byte xxhash64 shingle keys, never the
    // shingle strings (jaccardPairs convention — the oracle counts the
    // strings; a 64-bit collision is the accepted 2^-64 risk)
    val ss = Dedup.shingleIndex(docs, "doc_id", "text", k = 5)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), xxhash64(col("s")).as("s")).distinct()
      .localCheckpoint(eager = false)
    val spread = ss.groupBy(col("s")).agg(count(lit(1)).as("nsrc"))
    ss.join(spread, "s")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("nsrc") > 1, 1L).otherwise(0L)).as("n_shared"))
      .select(col("source"), col("n_shingles"), col("n_shared"),
        expr("(1000000 * n_shared) div n_shingles").as("shared_ppm"))
      .orderBy(col("source"))
  }

  /** Hive-style partitioned layout + partition pruning: orders written
    * `partitionBy(o_orderpriority)`, then a single-priority read whose
    * filter never touches the other partitions' files — THE mechanism
    * that turns a 100 TB scan into a 20 TB scan when the predicate
    * matches the layout. PlanAuditSpec pins the PartitionFilters
    * entry; the oracle is the same aggregate off the unpartitioned
    * table. */
  private def qPartitionPrune(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders")
    val out = fmtDir(dir, "orders_bypri")
    src.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    s.read.parquet(out)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(Analytics.cents(col("o_totalprice"))).as("price_cents"),
        min(col("o_orderkey")).as("first_key"))
      .orderBy(col("o_orderpriority"))
  }

  /** Schema-evolution read (mergeSchema): two parquet generations —
    * v1 without, v2 with a `price_cents` column — read as ONE relation
    * whose merged schema null-fills the missing column, then
    * aggregated. This is the lakehouse append-only evolution contract:
    * old files stay valid, new columns arrive as nullable. */
  private def qMergeSchema(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders")
    val v1 = fmtDir(dir, "evo_v1")
    val v2 = fmtDir(dir, "evo_v2")
    src.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(v1)
    src.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderpriority"),
        Analytics.cents(col("o_totalprice")).as("price_cents"))
      .write.mode("overwrite").parquet(v2)
    s.read.option("mergeSchema", "true").parquet(v1, v2)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        count(col("price_cents")).as("n_with_price"),
        sum(col("price_cents")).as("price_cents_sum"))
      .orderBy(col("o_orderpriority"))
  }

  /** unionByName with allowMissingColumns — positional UNION's
    * schema-safe sibling: columns align by NAME, absent columns
    * null-fill, so two differently-shaped extracts of the same fact
    * table combine without positional accidents. The null `pri` group
    * and the null-filled `cents` side both surface in the aggregate. */
  private def qUnionByName(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders")
    val a = src.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("pri"))
    val b = src.filter(col("o_orderkey") % 2 === 1)
      .select(Analytics.cents(col("o_totalprice")).as("cents"),
        col("o_orderkey").as("k"))
    a.unionByName(b, allowMissingColumns = true)
      .groupBy(col("pri"))
      .agg(count(lit(1)).as("n"), count(col("cents")).as("n_cents"),
        sum(col("cents")).as("cents_sum"), sum(col("k")).as("key_sum"))
      .orderBy(col("pri"))
  }

  /** Peak interval concurrency by sweep-line: every lineitem holds an
    * open interval [order date, ship date); +1/−1 boundary deltas
    * reduce to one row per day (calendar-bounded), a running sum walks
    * the bounded day series, and the peak row is the answer — the
    * classic "max concurrent sessions" shape, with the unbounded fact
    * scan collapsing to bounded data BEFORE any ordered pass. */
  private def qPeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        epochDay(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("od"), epochDay(col("l_shipdate")).as("sd"))
    val deltas = li.select(col("od").as("day"), lit(1L).as("d"))
      .union(li.select(col("sd").as("day"), lit(-1L).as("d")))
      .groupBy(col("day")).agg(sum(col("d")).as("delta"))
    val run = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("open", sum(col("delta")).over(run))
      .orderBy(col("open").desc, col("day")).limit(1)
      .select(col("day").as("peak_day"), col("open").as("peak_open"))
  }

  /** Array set algebra between each document and its successor
    * (doc_id + 1 equi-join, the dense-id contract pinned in
    * QueriesSpec): intersection / union cardinalities and the token
    * Jaccard in exact ppm — order-free set measures, so the engines'
    * different array orderings can't skew the hash gate. */
  private def qArraySetOps(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        array_distinct(TextOps.tokens(col("text"))).as("tk"))
    docs.as("a")
      .join(docs.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"),
        size(expr("array_intersect(a.tk, b.tk)")).cast("long").as("n_common"),
        size(expr("array_union(a.tk, b.tk)")).cast("long").as("n_union"),
        size(expr("array_except(a.tk, b.tk)")).cast("long").as("n_only_left"))
      .withColumn("jaccard_ppm", expr("(1000000 * n_common) div n_union"))
      .filter(col("doc_id") % 10 === 0)
      .orderBy(col("doc_id"))
  }

  /** Open-order aging report as of the book's last order date: lines
    * ordered but not yet shipped at the reference day, bucketed by
    * 30-day age, with line counts and open value — the snapshot
    * (point-in-time) inventory query. Reference day is a broadcast
    * scalar; the rest is one filtered scan + small aggregate. */
  private def qOpenAging(s: SparkSession, dir: String): DataFrame = {
    val ref = t(s, dir, "orders")
      .agg(max(epochDay(col("o_orderdate"))).as("ref"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        epochDay(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .crossJoin(broadcast(ref))
      .filter(col("od") <= col("ref") && epochDay(col("l_shipdate")) > col("ref"))
      .select(expr("(ref - od) div 30").as("age_bucket"),
        Analytics.cents(col("l_extendedprice")).as("val_c"))
      .groupBy(col("age_bucket"))
      .agg(count(lit(1)).as("n_lines"), sum(col("val_c")).as("open_cents"))
      .orderBy(col("age_bucket"))
  }

  /** 7-day rolling MEDIAN of daily revenue — the robust smoother the
    * rolling mean family can't express. The frame's values are
    * collected and sorted per window (frame width is a constant 7, so
    * the per-row work is O(1)); the median is emitted ×2 (sum of the
    * two middle elements) to stay in exact integer cents for even
    * frames. Day-series window: calendar-bounded like Holt/STL. */
  private def qRollingMedian(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("c"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    daily
      .withColumn("arr", sort_array(collect_list(col("c")).over(w)))
      .select(col("day"), col("c").as("rev_c"),
        expr("size(arr)").cast("long").as("win_n"),
        expr("element_at(arr, CAST((size(arr) + 1) / 2 AS INT)) + " +
          "element_at(arr, CAST((size(arr) + 2) / 2 AS INT))").as("med_x2_c"))
      .orderBy(col("day"))
  }

  /** CUPED variance-reduced experiment readout: customers split into
    * two deterministic md5 arms, pre-period revenue is the covariate,
    * post-period revenue the metric; θ = cov(x,y)/var(x) pooled across
    * arms in exact ppm (den pre-scaled so the ratio stays in int64),
    * and each arm reports its raw and θ-adjusted totals. All sums are
    * whole dollars — int64-safe at verify scale; at larger corpus
    * scale the same query runs on mean-centered per-partition partial
    * sums (the standard rescaling discipline). */
  private def qCuped(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "orders")
      .agg(min(epochDay(col("o_orderdate"))).as("mn"),
        max(epochDay(col("o_orderdate"))).as("mx"))
      .select(expr("mn + (mx - mn) div 2").as("split"))
    val per = t(s, dir, "orders")
      .crossJoin(broadcast(days))
      .select(col("o_custkey"),
        when(epochDay(col("o_orderdate")) <= col("split"),
          expr("CAST(floor(o_totalprice) AS BIGINT)")).otherwise(0L).as("xd"),
        when(epochDay(col("o_orderdate")) > col("split"),
          expr("CAST(floor(o_totalprice) AS BIGINT)")).otherwise(0L).as("yd"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("xd")).as("x"), sum(col("yd")).as("y"))
      .withColumn("arm", (h60(concat(lit("arm|"), col("o_custkey").cast("string"))) % 2)
        .cast("long"))
      .localCheckpoint(eager = false)
    val theta = per.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n"),
        expr("CASE WHEN (n * sxx - sx * sx) div 1000000 > 0 " +
          "THEN (n * sxy - sx * sy) div ((n * sxx - sx * sx) div 1000000) " +
          "ELSE 0 END").as("theta_ppm"),
        expr("(1000 * sx) div n").as("xbar_milli"))
    per.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_cust"), sum(col("x")).as("x_sum"),
        sum(col("y")).as("y_sum"))
      .crossJoin(broadcast(theta.select(col("theta_ppm"), col("xbar_milli"))))
      .select(col("arm"), col("n_cust"), col("x_sum"), col("y_sum"),
        col("theta_ppm"),
        expr("1000000 * y_sum - theta_ppm * x_sum + " +
          "theta_ppm * ((n_cust * xbar_milli) div 1000)").as("adj_micro"))
      .orderBy(col("arm"))
  }

  /** OHLC time bars over the purchase stream: per 10-minute bucket,
    * open/close by earliest/latest event (min_by/max_by on the
    * purchase timestamp — globally unique in this stream, an
    * assumption pinned in QueriesSpec so a regenerated dataset fails
    * loudly), high/low, and volume. One map-side-combining aggregate
    * over the bucketed scan — the canonical market-bar shape. */
  private def qOhlcBars(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(expr("ts div 600000000000").as("bucket"),
        Analytics.cents(col("value")).as("vc"), col("ts").as("ord"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        expr("min_by(vc, ord)").as("open_c"),
        expr("max_by(vc, ord)").as("close_c"),
        max(col("vc")).as("high_c"), min(col("vc")).as("low_c"),
        sum(col("vc")).as("vol_c"))
      .filter(col("n") >= 3)
      .orderBy(col("bucket"))

  /** Difference-in-differences readout: treated = customers of nations
    * 0–11, control = the rest; pre/post split at the calendar midpoint
    * (the qCuped split). The 2×2 cell sums stay integer dollars; cell
    * means are exact milli-dollars (trunc div), and the DiD estimate
    * is the mean-difference of differences — the standard
    * quasi-experimental effect readout, one broadcast-dimension join +
    * one aggregate. */
  private def qDid(s: SparkSession, dir: String): DataFrame = {
    val split = t(s, dir, "orders")
      .agg(min(epochDay(col("o_orderdate"))).as("mn"),
        max(epochDay(col("o_orderdate"))).as("mx"))
      .select(expr("mn + (mx - mn) div 2").as("split"))
    val cells = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), (col("c_nationkey") < 12).as("treated"))),
        col("o_custkey") === col("c_custkey"))
      .crossJoin(broadcast(split))
      .select(col("treated"),
        (epochDay(col("o_orderdate")) > col("split")).as("post"),
        expr("CAST(floor(o_totalprice) AS BIGINT)").as("d"))
      .groupBy(col("treated"), col("post"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("dollars"))
      .withColumn("mean_milli", expr("(1000 * dollars) div n"))
    val wide = cells.groupBy()
      .agg(
        max(when(col("treated") && col("post"), col("mean_milli"))).as("tp"),
        max(when(col("treated") && !col("post"), col("mean_milli"))).as("tq"),
        max(when(!col("treated") && col("post"), col("mean_milli"))).as("cp"),
        max(when(!col("treated") && !col("post"), col("mean_milli"))).as("cq"))
      .select(((col("tp") - col("tq")) - (col("cp") - col("cq"))).as("did_milli"))
    cells.select(col("treated"), col("post"), col("n"), col("dollars"),
        col("mean_milli"))
      .crossJoin(broadcast(wide))
      .orderBy(col("treated"), col("post"))
  }

  /** k-anonymity / l-diversity audit over the quasi-identifier
    * (nation, market segment, balance decile-bucket) with order
    * priority as the sensitive attribute: how identifiable is a
    * customer, and how varied is the sensitive value inside each QI
    * class. One grouped pass builds the class table (cardinality ≤
    * |nations|×|segments|×10 — catalog-bounded); the report is a
    * single-row summary: class count, smallest class, share of rows
    * in classes below k=5, and the minimum/row-share-below l=3
    * sensitive diversity. */
  private def qKAnonymity(s: SparkSession, dir: String): DataFrame = {
    val rows = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(floor(c_acctbal) AS BIGINT) div 1000").as("bal_b"))),
        col("o_custkey") === col("c_custkey"))
    val classes = rows
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_b"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderpriority")).as("l"))
    classes.agg(
        count(lit(1)).as("n_classes"),
        sum(col("n")).as("n_rows"),
        min(col("n")).as("min_class"),
        sum(when(col("n") < 5, col("n")).otherwise(0L)).as("rows_below_k"),
        min(col("l")).as("min_l"),
        sum(when(col("l") < 3, col("n")).otherwise(0L)).as("rows_below_l"))
      .select(col("n_classes"), col("n_rows"), col("min_class"),
        expr("(1000000 * rows_below_k) div n_rows").as("below_k_ppm"),
        col("min_l"),
        expr("(1000000 * rows_below_l) div n_rows").as("below_l_ppm"))
  }

  /** Event-time lateness audit — the measurement that SIZES a
    * watermark: per user, each event's lateness is how far it arrived
    * behind the user's running max event time (arrival order =
    * (ts, event_id) ingest order surrogate is not available, so the
    * stream's event_id is the arrival sequence); the histogram of
    * lateness minutes says what delay bound covers which fraction of
    * events. Per-user ordered window (user-count parallelism) + tiny
    * bucketed aggregate. The verify corpus happens to be perfectly
    * in-order per user, so its histogram is the single bucket 0 —
    * QueriesSpec feeds a synthetic out-of-order stream through
    * `latenessBuckets` to prove the operator actually discriminates. */
  private def qLatenessAudit(s: SparkSession, dir: String): DataFrame =
    latenessBuckets(events(s, dir))

  private[graft] def latenessBuckets(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prior_max", max(col("ts")).over(w))
      .filter(col("prior_max").isNotNull)
      .select(greatest(lit(0L),
        expr("(prior_max - ts) div 60000000000")).as("late_min"))
      .select(least(col("late_min"), lit(60L)).as("late_bucket"))
      .groupBy(col("late_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("late_bucket"))
  }

  /** Producer-sink round trip through the DataSourceV2 WRITE protocol
    * (sources/TopicDirSink.scala): deterministic orders → Kafka-shaped
    * envelopes → V2 batch write (per-task log segments + atomic
    * manifest commit) → manifest-trusting read → Avro decode — gated
    * against the same generation-replay oracle as q_order_gen. The
    * float Avro price is recovered to exact cents before comparison
    * (float→cents is exact for the producer's ≤ $1500 range). */
  private def qTopicSink(s: SparkSession, dir: String): DataFrame = {
    val out = fmtDir(dir, "topic_v2")
    graft.sources.OrderGen.toEnvelopes(
        graft.sources.OrderGen.orders(s, 500L, "sink1"))
      .select(col("key"), col("value"), col("offset"))
      .write.format("graft.sources.TopicDirSink").mode("append").save(out)
    graft.sources.TopicDirSink.readSegments(s, out)
      .select(col("offset").as("seq"),
        decode(col("key"), "UTF-8").as("order_id"),
        from_avro_ocf(col("value"), Schemas.orderAvroJson).as("o"))
      .select(col("seq"), col("order_id"), col("o.product").as("product"),
        expr("CAST(floor(CAST(o.price AS DOUBLE) * 100 + 0.5) AS BIGINT)")
          .as("price_cents"))
      .orderBy(col("seq"))
  }

  /** Association rules over the frequent brand pairs (qItemsets'
    * candidate shape): directional confidence and symmetric lift in
    * exact ppm — support counts stay integers, so the engine and
    * oracle agree bit-for-bit where a floating P(A∩B)/P(A)P(B) would
    * drift. Basket list materializes once; every stage is the
    * inverted-index pair join, never baskets×baskets. */
  private def qAssocRules(s: SparkSession, dir: String): DataFrame = {
    val baskets = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      .distinct()
      .localCheckpoint(eager = false)
    val tot = baskets.agg(countDistinct(col("basket")).as("n_baskets"))
    val freq = baskets.groupBy(col("item")).agg(count(lit(1)).as("supp"))
      .crossJoin(broadcast(tot))
      .filter(col("supp") * 20 >= col("n_baskets"))
      .select(col("item"), col("supp"))
      .localCheckpoint(eager = false)
    val fb = baskets.join(broadcast(freq.select(col("item"))), "item")
    fb.select(col("basket"), col("item").as("i1"))
      .join(fb.select(col("basket"), col("item").as("i2")), Seq("basket"))
      .filter(col("i1") < col("i2"))
      .groupBy(col("i1"), col("i2")).agg(count(lit(1)).as("supp_pair"))
      .join(broadcast(freq.select(col("item").as("i1"), col("supp").as("s1"))), "i1")
      .join(broadcast(freq.select(col("item").as("i2"), col("supp").as("s2"))), "i2")
      .crossJoin(broadcast(tot))
      .filter(col("supp_pair") >= 20)
      .select(col("i1"), col("i2"), col("supp_pair"),
        expr("(1000000 * supp_pair) div s1").as("conf12_ppm"),
        expr("(1000000 * supp_pair) div s2").as("conf21_ppm"),
        expr("(1000000 * supp_pair * n_baskets) div (s1 * s2)").as("lift_ppm"))
      .orderBy(col("i1"), col("i2"))
  }

  /** Session-outcome distribution (the abandonment report): sessions
    * cut at 30-minute gaps per user (the sessionize rule), each
    * session labeled by its LAST event — well-defined because the
    * stream is in-order per user (ts nondecreasing in event_id, a
    * contract pinned in QueriesSpec), so arg-max on event_id IS the
    * final event. Share of sessions ending in each state, purchase =
    * converted, anything else = abandoned. */
  private def qAbandonment(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        expr("ts div 1000000000").as("sec"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
      .withColumn("session", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session"))
      .agg(expr("max_by(event_type, event_id)").as("last_type"),
        count(lit(1)).as("n_events"))
    sessions.groupBy(col("last_type"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .crossJoin(broadcast(sessions.agg(count(lit(1)).as("total"))))
      .select(col("last_type"), col("n_sessions"), col("n_events"),
        expr("(1000000 * n_sessions) div total").as("share_ppm"))
      .orderBy(col("last_type"))
  }

  /** Exact-DECIMAL aggregation surface: the money-typed path (every
    * other query uses the integer-cents convention; this one pins
    * Spark's DECIMAL sum/min/max against DuckDB's, compared through
    * the canonical string rendering so precision-widening differences
    * between engines can't hide a value skew). */
  private def qDecimalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("decimal(12,2)").as("p"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("p")).cast("string").as("sum_dec"),
        min(col("p")).cast("string").as("min_dec"),
        max(col("p")).cast("string").as("max_dec"))
      .orderBy(col("o_orderpriority"))

  /** Complex-event-pattern match (MATCH_RECOGNIZE-lite): each user's
    * journey renders to its ordered event-initial string (bounded by
    * per-user history length), and the browse→click→purchase pattern
    * `v[^e]*c[^e]*p` — a view, then a click, then a purchase with no
    * error between — is counted per journey by regexp (leftmost,
    * non-overlapping in both engines). Distribution of match counts
    * across users; the per-user string build is the same sort_array
    * ordering discipline as CDC chunking. */
  private def qEventPattern(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        substring(col("event_type"), 1, 1).as("ini"))
      .groupBy(col("user_id"))
      .agg(concat_ws("",
        transform(sort_array(collect_list(struct(col("ts"), col("event_id"), col("ini")))),
          x => x.getField("ini"))).as("seq"))
      .select(expr("CAST(regexp_count(seq, 'v[^e]*c[^e]*p') AS BIGINT)").as("n_matches"))
      .groupBy(col("n_matches"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_matches"))

  /** Snapshot time travel on the V2 topic sink: two successive commit
    * jobs (500 then 300 deterministic orders) produce two versioned
    * manifests; reading snapshot 1, snapshot 2, and the latest pointer
    * proves historical reads survive later commits — the lakehouse
    * time-travel contract, gated against the generation-replay oracle
    * (each version's count and offset/price checksums). */
  private def qTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val out = fmtDir(dir, "topic_tt")
    // idempotent across reruns in one JVM or many: wipe, then commit twice
    val root = java.nio.file.Paths.get(out)
    if (java.nio.file.Files.isDirectory(root)) {
      val all = java.nio.file.Files.walk(root)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(all.iterator()).asScala
        .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      finally all.close()
    }
    def publish(n: Long, seed: String): Unit =
      graft.sources.OrderGen.toEnvelopes(graft.sources.OrderGen.orders(s, n, seed))
        .select(col("key"), col("value"), col("offset"))
        .write.format("graft.sources.TopicDirSink").mode("append").save(out)
    publish(500L, "tt1")
    publish(300L, "tt2")
    def stats(version: Option[Int], label: String) =
      graft.sources.TopicDirSink.readSegments(s, out, version)
        .select(col("offset"),
          from_avro_ocf(col("value"), Schemas.orderAvroJson).as("o"))
        .agg(count(lit(1)).as("n"), sum(col("offset")).as("offset_sum"),
          sum(expr("CAST(floor(CAST(o.price AS DOUBLE) * 100 + 0.5) AS BIGINT)"))
            .as("cents_sum"))
        .select(lit(label).as("snapshot"), col("n"), col("offset_sum"),
          col("cents_sum"))
    stats(Some(1), "v1").unionAll(stats(Some(2), "v2"))
      .unionAll(stats(None, "latest"))
      .orderBy(col("snapshot"))
  }

  /** In-batch negative collision audit for contrastive training:
    * vectors land in deterministic md5 batches of ~n/16, and within a
    * batch every same-label pair is a FALSE negative if used as an
    * in-batch negative. Per batch: member count, same-label pairs
    * (Σ C(c,2) over label groups), all pairs C(n,2), and the
    * collision rate in ppm — the audit run before trusting in-batch
    * sampling. Two bounded aggregates; no pair materialization. */
  private def qInbatchNegatives(s: SparkSession, dir: String): DataFrame = {
    val b = t(s, dir, "embeddings")
      .select((h60(concat(lit("b|"), col("vec_id").cast("string"))) % 16)
        .as("batch"), col("label"))
    val byLabel = b.groupBy(col("batch"), col("label"))
      .agg(count(lit(1)).as("c"))
    byLabel.groupBy(col("batch"))
      .agg(sum(col("c")).as("n"),
        sum(expr("c * (c - 1) div 2")).as("same_label_pairs"))
      .select(col("batch"), col("n"), col("same_label_pairs"),
        expr("n * (n - 1) div 2").as("all_pairs"),
        expr("(1000000 * same_label_pairs) div (n * (n - 1) div 2)")
          .as("collision_ppm"))
      .orderBy(col("batch"))
  }

  /** Quality-filter calibration sweep: for every threshold decile of
    * the composite quality score, the documents and tokens that would
    * survive "keep score ≥ t" — the curve consulted before committing
    * a filter threshold (keep X% of tokens ↔ threshold t). One scored
    * scan into 11 buckets, then a reverse cumulative over the bucket
    * table (bounded at 11 rows by construction). */
  private def qFilterSweep(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextOps.withQualityScore(t(s, dir, "documents"), "text")
      .select(floor(col("quality_score") * 10).cast("long").as("bucket"),
        col("n_tokens").cast("long").as("toks"))
    val buckets = scored.groupBy(col("bucket"))
      .agg(count(lit(1)).as("docs"), sum(col("toks")).as("toks"))
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    buckets
      .withColumn("kept_docs", sum(col("docs")).over(w))
      .withColumn("kept_tokens", sum(col("toks")).over(w))
      .withColumn("total_tokens", sum(col("toks")).over(all))
      .select(col("bucket").as("threshold_decile"), col("kept_docs"),
        col("kept_tokens"),
        expr("(1000000 * kept_tokens) div total_tokens").as("kept_ppm"))
      .orderBy(col("threshold_decile"))
  }

  /** PCA top direction by distributed power iteration (2 rounds,
    * uncentered): v ← Xᵀ(Xv), rescaled to ~3 digits between rounds —
    * every reduction is a sum of int64 products over fp3-quantized
    * inputs, so the direction replays bit-for-bit in the oracle
    * (truncating division on the rescale in both engines). The corpus
    * never moves: each round is one broadcast of the 64-long model
    * vector, one (i)-keyed dot aggregate, one (j)-keyed update
    * aggregate — the same model-to-data shape as Lloyd's k-means. */
  private def qPowerIteration(s: SparkSession, dir: String): DataFrame = {
    val x = t(s, dir, "embeddings")
      .select(col("vec_id").as("i"), posexplode(col("embedding")))
      .select(col("i"), (col("pos") + 1).cast("long").as("j"),
        expr("CAST(floor(CAST(col AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("xf"))
      .localCheckpoint(eager = false)
    def iterate(v: Array[Long]): Array[Long] = {
      val varr = array(v.map(lit): _*)
      val sI = x.withColumn("v", element_at(varr, col("j").cast("int")))
        .groupBy(col("i")).agg(sum(col("xf") * col("v")).as("s"))
      val w = x.join(sI, "i").groupBy(col("j"))
        .agg(sum(col("xf") * col("s")).as("w"))
        .orderBy(col("j")).collect().map(_.getLong(1))
      val d = w.map(math.abs).max / 1000 + 1
      w.map(_ / d)
    }
    val v2 = iterate(iterate(Array.fill(64)(1L)))
    import s.implicits._
    v2.zipWithIndex.map { case (v, idx) => (idx + 1L, v) }.toSeq
      .toDF("j", "v").orderBy(col("j"))
  }

  /** Fuzzy entity matching by Jaro-Winkler — the phonetic-ish
    * complement to q_er_match's edit distance: candidate pairs come
    * only from (size, first-letter) blocks (first-letter blocking
    * aligns with JW's prefix emphasis — cross-initial pairs can't
    * score the Winkler boost anyway), scored by the native
    * [[graft.functions.JaroWinklerPpm]] kernel (Spark has no jaro
    * builtin; composing it from builtins would need a per-character
    * join). The oracle replays through DuckDB's own
    * `jaro_winkler_similarity` at the shared ppm grain — two
    * independent implementations of Winkler '90 agreeing bit-for-bit. */
  private def qJaroMatch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.kernels
    val p = t(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        substring(col("p_name"), 1, 1).as("initial"))
    p.as("a").join(p.as("b"),
        col("a.p_size") === col("b.p_size") &&
          col("a.initial") === col("b.initial") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("jw_ppm", kernels.jaro_winkler_ppm(col("a.p_name"), col("b.p_name")))
      .filter(col("jw_ppm") >= 800000)
      .select(col("a.p_partkey").as("k1"), col("b.p_partkey").as("k2"),
        col("a.p_name").as("name1"), col("b.p_name").as("name2"),
        col("a.p_size").cast("long").as("block_size"), col("jw_ppm"))
      .orderBy(col("k1"), col("k2"))
  }

  /** Kaplan-Meier survival curve of customer tenure (churn analysis):
    * per customer, tenure = last−first order in 90-day quarters; churn
    * = last order before the 2000-07-01 cutoff (otherwise censored at
    * the observation edge). The KM product Π(1 − d/n) runs in LOG
    * space as integer micro-nats — each bucket's ln((n−d)/n) is
    * rounded to 1e-6 nats (absorbing cross-engine ln() ulp), then the
    * log-survival curve is an integer cumulative sum over the bounded
    * tenure-quarter DOMAIN (~28 rows — the windows never touch
    * customer-cardinality data; the per-customer reduction is a plain
    * parallel aggregate). A bucket where everyone at risk churns
    * (ln 0) floors at −13815511 μnats ≡ survival 1e-6. */
  private def qSurvival(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cutoff = lit("2000-07-01").cast("date")
    val per = t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(min(epochDay(col("o_orderdate"))).as("f"),
        max(epochDay(col("o_orderdate"))).as("l"))
      .select(expr("(l - f) div 90").as("tq"),
        (col("l") < epochDay(cutoff)).as("churned"))
    val tab = per.groupBy(col("tq")).agg(
      sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
      count(lit(1)).as("tot"))
    val wRisk = Window.orderBy(col("tq").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wCum = Window.orderBy(col("tq"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tab.withColumn("at_risk", sum(col("tot")).over(wRisk))
      .withColumn("term_micro",
        when(col("at_risk") > col("d"),
          expr("CAST(floor(ln(CAST(at_risk - d AS DOUBLE) / CAST(at_risk AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"))
          .otherwise(lit(-13815511L)))
      .withColumn("log_surv_micro", sum(col("term_micro")).over(wCum))
      .select(col("tq"), col("at_risk"), col("d").as("churned"),
        (col("tot") - col("d")).as("censored"), col("log_surv_micro"))
      .orderBy(col("tq"))
  }

  /** Jensen-Shannon divergence of each source's language mix vs the
    * REST of the corpus — the symmetric, bounded drift score for
    * mixture monitoring (KL alone, q_entropy, explodes on
    * missing-language zeros; JSD's midpoint m=(p+q)/2 never does).
    * Each of the ≤10 terms per source is p·ln(2p/(p+q)) rounded to
    * integer micro-nats FIRST, so the reported 2·JSD is a sum of
    * integers (order-independent; the ÷2 is left to the reader —
    * integer halving of a possibly-odd negative total floor/truncates
    * differently across engines). Counts collapse to the (source,
    * lang) grid map-side; nothing data-sized crosses the shuffle. */
  private def qJsd(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val grid = docs.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
    val bySrc = grid.groupBy(col("source")).agg(sum(col("n")).as("n_s"))
    val byLang = grid.groupBy(col("lang")).agg(sum(col("n")).as("g_l"))
    val total = grid.agg(sum(col("n")).as("g")).select(col("g"))
    // full (source × lang) frame so zero-count cells contribute their
    // q-side term: rest-of-corpus still has the language
    val frame = bySrc.crossJoin(byLang)
      .join(grid, Seq("source", "lang"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(total))
      .withColumn("r_l", col("g_l") - col("n"))
      .withColumn("rest", col("g") - col("n_s"))
    val termed = frame.select(col("source"), col("n_s"),
      expr("""CAST(floor(CASE WHEN n > 0 THEN
              |  (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE)) *
              |  ln(2.0 * (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE)) /
              |     (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE) + CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)))
              |  * 1000000 ELSE 0.0 END + 0.5) AS BIGINT)""".stripMargin).as("tp"),
      expr("""CAST(floor(CASE WHEN r_l > 0 THEN
              |  (CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)) *
              |  ln(2.0 * (CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)) /
              |     (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE) + CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)))
              |  * 1000000 ELSE 0.0 END + 0.5) AS BIGINT)""".stripMargin).as("tq"))
    termed.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"),
        sum(col("tp") + col("tq")).as("jsd_x2_micro"))
      .orderBy(col("source"))
  }

  /** Fisher randomization test for the URGENT−LOW mean-order-value
    * difference — the nonparametric companion to q_ab_test's z-test:
    * 64 deterministic pseudo-relabelings (md5(key:replica) mod N < n₁
    * — binomial relabeling, the exchangeable-null variant that needs
    * no global sort), each replica's group means re-computed from
    * exact cent sums in ONE scan of the 64-wide replica explode (the
    * q_bootstrap shape: rows×64 through a map-side-combined agg,
    * nothing collected). p = (1 + #{|Δᵣ| ≥ |Δ_obs|})/(R+1), the
    * add-one estimator, in exact ppm. Mean differences are single
    * IEEE divisions of exact integers — bit-identical cross-engine. */
  private def qPermTest(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderkey"),
        Analytics.cents(col("o_totalprice")).as("c"),
        (col("o_orderpriority") === "1-URGENT").as("g1"))
    val obs = base.agg(
      sum(when(col("g1"), col("c"))).as("s1"),
      sum(when(col("g1"), 1L).otherwise(0L)).as("n1"),
      sum(when(!col("g1"), col("c"))).as("s0"),
      sum(when(!col("g1"), 1L).otherwise(0L)).as("n0"))
    val reps = base.crossJoin(broadcast(obs))
      .select(col("c"), col("n1"), col("n0"),
        explode(sequence(lit(0), lit(63))).as("r"),
        col("o_orderkey"))
      .withColumn("coin",
        h60(concat(col("o_orderkey").cast("string"), lit(":"), col("r").cast("string")))
          % (col("n1") + col("n0")) < col("n1"))
      .groupBy(col("r")).agg(
        sum(when(col("coin"), col("c"))).as("s1r"),
        sum(when(col("coin"), 1L).otherwise(0L)).as("n1r"),
        sum(when(!col("coin"), col("c"))).as("s0r"),
        sum(when(!col("coin"), 1L).otherwise(0L)).as("n0r"))
    val scored = reps.crossJoin(broadcast(obs))
      .select(
        (col("s1r").cast("double") / col("n1r").cast("double") -
          col("s0r").cast("double") / col("n0r").cast("double")).as("dr"),
        (col("s1").cast("double") / col("n1").cast("double") -
          col("s0").cast("double") / col("n0").cast("double")).as("dobs"),
        col("n1"), col("n0"))
    scored.groupBy(col("n1"), col("n0"), col("dobs"))
      .agg(sum(when(abs(col("dr")) >= abs(col("dobs")), 1L).otherwise(0L)).as("exceed"))
      .select(col("n1"), col("n0"), col("dobs").as("obs_diff_cents"),
        col("exceed"),
        expr("(1000000 * (1 + exceed)) div 65").as("p_ppm"))
      .orderBy(col("n1"))
  }

  /** XML codec fidelity (Spark 4 to_xml ∘ from_xml = identity) — the
    * fourth self-describing interchange format beside JSON, CSV and
    * Avro OCF: each nation row (plus an injected `<&"` special-char
    * column to force entity escaping both ways) serializes to an XML
    * record and parses back through an explicit DDL schema. The
    * oracle never sees XML — it asserts the round-trip re-produced
    * the source values, same contract as q_json_roundtrip. */
  private def qXmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
      .withColumn("tricky",
        concat(col("n_name"), lit(" <&\"'> "), col("n_nationkey").cast("string")))
    val xml = n.select(col("n_nationkey"),
      to_xml(struct(col("n_name"), col("n_regionkey"), col("tricky"))).as("x"))
    xml.select(col("n_nationkey").cast("long").as("n_nationkey"),
        from_xml(col("x"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "n_name STRING, n_regionkey INT, tricky STRING")).as("d"))
      .select(col("n_nationkey"), col("d.n_name").as("n_name"),
        col("d.n_regionkey").cast("long").as("n_regionkey"),
        col("d.tricky").as("tricky"))
      .orderBy(col("n_nationkey"))
  }

  /** Unicode canonicalization — the text-normalization step every
    * multilingual dedup pipeline needs BEFORE hashing (NFC and NFD
    * spellings of the same text md5 to different digests, silently
    * splitting duplicate clusters; Spark ships no normalizer at all):
    * accented forms are synthesized from nation names in BOTH engines
    * (precomposed via translate; decomposed via combining-mark
    * replace), then the native [[graft.functions.NfcNormalize]] /
    * [[graft.functions.StripAccents]] kernels (JDK Normalizer) are
    * checked against DuckDB's independent utf8proc implementations
    * (`nfc_normalize` / `strip_accents`). */
  private def qUnicodeNorm(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.kernels
    val base = lower(col("n_name"))
    // precomposed (NFC) accent injection; translate is code-point-wise
    val accented = translate(base, "aeiou", "áéíöü")
    // the SAME text decomposed (NFD): base letter + combining mark
    val decomposed = Seq("a" -> "á", "e" -> "é", "i" -> "í",
      "o" -> "ö", "u" -> "ü")
      .foldLeft(base) { case (c, (from, to)) => regexp_replace(c, from, to) }
    t(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        accented.as("accented"),
        kernels.nfc_normalize(decomposed).as("recomposed"),
        kernels.strip_accents(accented).as("stripped"))
      .withColumn("roundtrip_ok", col("recomposed") === col("accented"))
      .orderBy(col("n_nationkey"))
  }

  /** Coarsened exact matching (CEM, Iacus-King-Porro) — the causal-
    * inference ATT estimate behind "did URGENT-priority service drive
    * spend?": treatment = customer ever placed an URGENT order,
    * covariate cells = (nation, market segment) exact bins, and only
    * cells containing BOTH arms match. All arithmetic is integer:
    * per-cell mean spends are truncating divisions of exact cent
    * sums, so the cell-level ATT contribution is deterministic in any
    * engine and the output never sums doubles. The heavy reduction
    * (per-customer spend) is one map-side-combined aggregate; the
    * cell grid is dimension-bounded (≤125 rows). */
  private def qCem(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(max(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("treated"),
        sum(Analytics.cents(col("o_totalprice"))).as("y"))
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    perCust.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nation"), col("c_mktsegment").as("segment"))
      .agg(sum(when(col("treated") === 1, 1L).otherwise(0L)).as("m_t"),
        sum(when(col("treated") === 0, 1L).otherwise(0L)).as("m_c"),
        sum(when(col("treated") === 1, col("y")).otherwise(0L)).as("s_t"),
        sum(when(col("treated") === 0, col("y")).otherwise(0L)).as("s_c"))
      .filter(col("m_t") > 0 && col("m_c") > 0)
      .select(col("nation"), col("segment"), col("m_t"), col("m_c"),
        expr("s_t div m_t - s_c div m_c").as("cell_att_cents"))
      .orderBy(col("nation"), col("segment"))
  }

  /** Haar wavelet decomposition of the daily-revenue series — the
    * multi-resolution compaction behind wavelet-based approximate
    * query processing (Chakrabarti et al., VLDB '00): 8 levels of
    * unnormalized pairwise sums/differences over a 256-day window,
    * every coefficient an exact int64 (no √2 scaling — the synthesis
    * side owns the 2^level divisor). Level k is a groupBy(i div 2)
    * on a domain-bounded table (≤256 rows after the one daily
    * pre-aggregate that touches order-cardinality data); the full
    * transform is 8 tiny shuffles, each half the previous size. */
  private def qHaar(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(epochDay(col("o_orderdate")).as("day"),
        Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("v"))
    val base = daily.agg(min(col("day")).as("d0"))
      .select(explode(sequence(lit(0L), lit(255L))).as("i"), col("d0"))
      .join(daily.withColumnRenamed("day", "dd"),
        col("dd") === col("d0") + col("i"), "left")
      .select(col("i"), coalesce(col("v"), lit(0L)).as("v"))
    var cur = base
    var out: DataFrame = null
    for (k <- 1 to 8) {
      val lvl = cur.groupBy(expr("i div 2").as("j"))
        .agg(sum(when(col("i") % 2 === 0, col("v")).otherwise(-col("v"))).as("d"),
          sum(col("v")).as("a"))
      val det = lvl.select(lit(k.toLong).as("level"), col("j").as("idx"), col("d").as("coef"))
      out = if (out == null) det else out.unionAll(det)
      cur = lvl.select(col("j").as("i"), col("a").as("v"))
    }
    out.unionAll(cur.select(lit(9L).as("level"), col("i").as("idx"), col("v").as("coef")))
      .orderBy(col("level"), col("idx"))
  }

  /** Weighted reservoir sampling (Efraimidis-Spirakis A-ES): each row
    * draws a replayable uniform u from the md5 convention and competes
    * on key = ln(u)/w — the top-k keys ARE a weighted-without-
    * replacement sample, the one-pass distributed algorithm for
    * "sample 20 orders proportional to spend". The key is rounded to
    * an integer 1e-12 grain FIRST (one ln + one division — the same
    * double tree in both engines), so ordering and tie-breaks are
    * integer-deterministic; selection is TakeOrderedAndProject
    * (bounded per-partition heaps, no global sort). */
  private def qWeightedReservoir(s: SparkSession, dir: String): DataFrame = {
    val withH = t(s, dir, "orders")
      .select(col("o_orderkey"), Analytics.cents(col("o_totalprice")).as("w"),
        h60(col("o_orderkey")).as("h"))
      .withColumn("key_pico",
        expr("""CAST(floor(ln((CAST(h AS DOUBLE) + 1.0) / 1152921504606846976.0)
                |  / CAST(w AS DOUBLE) * 1000000000000 + 0.5) AS BIGINT)""".stripMargin))
    withH.orderBy(col("key_pico").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("w").as("weight_cents"), col("key_pico"))
      .orderBy(col("key_pico").desc, col("o_orderkey"))
  }

  /** Replayable Laplace noise-injection harness — the differential-
    * privacy release MECHANISM (sensitivity-1 count query, ε=1,
    * inverse-CDF Laplace) with md5-seeded noise so tests and oracles
    * can replay it exactly. NOT private as parameterized (deterministic
    * noise is no noise — a production release swaps the seed source
    * for a CSPRNG); what this gates is the plumbing: per-cell noise
    * scale, the exact integer micro-grain the noisy counts ship in,
    * and that the true counts never leave the engine alongside. */
  private def qNoiseInject(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .withColumn("u",
        (h60(concat(lit("dp:"), col("o_orderpriority"))).cast("double") + 0.5) /
          lit(1.152921504606846976e18))
      .withColumn("noise_micro",
        expr("""CAST(floor((CASE WHEN u < 0.5 THEN ln(2.0 * u)
                |  ELSE -ln(2.0 - 2.0 * u) END) * 1000000 + 0.5) AS BIGINT)""".stripMargin))
      .select(col("o_orderpriority"), col("n").as("true_count"),
        col("noise_micro"),
        (col("n") * 1000000L + col("noise_micro")).as("noisy_micro"))
      .orderBy(col("o_orderpriority"))
  }

  /** parse_url surface — the web-corpus provenance columns every
    * crawl-derived dataset carries: URLs synthesized from nation/part
    * attributes in both engines, then HOST / PATH / QUERY and a
    * single-parameter extraction via Spark's parse_url (the oracle
    * rebuilds the same pieces with pure string ops — parse_url
    * semantics pinned against an independent decomposition). */
  private def qUrlParse(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    // strip "_" too: java.net.URI (behind parse_url) treats an
    // underscore hostname as unparseable authority -> null HOST
    val url = concat(lit("https://"),
      lower(regexp_replace(col("n_name"), "[ _]", "")), lit(".example.com/r"),
      col("n_regionkey").cast("string"), lit("/docs?q=n"),
      col("n_nationkey").cast("string"), lit("&page=2"))
    n.select(col("n_nationkey").cast("long").as("n_nationkey"), url.as("url"))
      .select(col("n_nationkey"), col("url"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("q")).as("q_param"))
      .orderBy(col("n_nationkey"))
  }

  /** Bounded-error gate for the BUILT-IN HLL++ sketch
    * (approx_count_distinct, rsd=5%): the estimate itself is engine-
    * specific (Spark's sketch, deterministic for fixed data) so the
    * oracle can't replay it — instead the QUERY ships the property
    * that matters (|est − exact| ≤ 5% of exact) as a boolean next to
    * the exact count, and the oracle asserts it must be TRUE. If a
    * Spark upgrade or sketch regression drifts the estimate out of
    * its advertised bound, this row hash-mismatches. Complements
    * q_hll_distinct (the custom oracle-replayable sketch). */
  private def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(countDistinct(col("o_custkey")).as("exact_customers"),
        approx_count_distinct(col("o_custkey"), 0.05).as("est"))
      .select(col("nation"), col("exact_customers"),
        (abs(col("est") - col("exact_customers")) * 100 <=
          col("exact_customers") * 5).as("within_5pct"))
      .orderBy(col("nation"))
  }

  /** Welch's unequal-variance t-test (URGENT vs LOW mean order value)
    * — the default two-sample test when variances can't be assumed
    * equal (q_effect_size's pooled d assumes they can). One grouped
    * scan collects exact integer moments per arm; t and the
    * Welch–Satterthwaite df are fixed double trees over those exact
    * integers (+,−,×,÷,√ all correctly rounded IEEE → bit-identical in
    * any engine). Zero shuffles beyond the 2-group reduce. */
  private def qWelchT(s: SparkSession, dir: String): DataFrame = {
    val agg0 = t(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 100").as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("ss"))
      .groupBy()
      .agg(max(when(col("grp") === "1-URGENT", col("n"))).as("n1"),
        max(when(col("grp") === "1-URGENT", col("sv"))).as("s1"),
        max(when(col("grp") === "1-URGENT", col("ss"))).as("ss1"),
        max(when(col("grp") === "5-LOW", col("n"))).as("n2"),
        max(when(col("grp") === "5-LOW", col("sv"))).as("s2"),
        max(when(col("grp") === "5-LOW", col("ss"))).as("ss2"))
    val n1D = col("n1").cast("double"); val n2D = col("n2").cast("double")
    val v1 = (n1D * col("ss1").cast("double") -
      col("s1").cast("double") * col("s1").cast("double")) /
      (n1D * (n1D - lit(1.0)))
    val v2 = (n2D * col("ss2").cast("double") -
      col("s2").cast("double") * col("s2").cast("double")) /
      (n2D * (n2D - lit(1.0)))
    val se1 = v1 / n1D; val se2 = v2 / n2D
    val tStat = (col("s1").cast("double") / n1D -
      col("s2").cast("double") / n2D) / sqrt(se1 + se2)
    val df = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / (n1D - lit(1.0)) + se2 * se2 / (n2D - lit(1.0)))
    agg0.select(col("n1"), col("n2"), tStat.as("t_welch"), df.as("df_welch"))
  }

  /** One-way ANOVA F across all five order priorities (dollar-grain
    * order values): between/within sums of squares from per-group
    * exact integer moments PIVOTED into one row, so every double
    * addition is a fixed 5-term tree (never a row-order-dependent
    * SUM over doubles). Companion to q_kruskal_wallis — the
    * parametric version of the same "do the arms differ" question. */
  private def qAnovaF(s: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val g = t(s, dir, "orders")
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 100").as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("ss"))
    anovaFromPivot(pivotMoments(g, prios)).select(col("n_total"),
      col("ssb"), col("ssw"), col("f_stat"))
  }

  /** Pivots per-group (n, sv, ss) moment rows into ONE row of
    * n1..nk, s1..sk, ss1..ssk columns in the given group order. */
  private def pivotMoments(g: DataFrame, groups: Seq[String]): DataFrame = {
    val cols = groups.zipWithIndex.flatMap { case (p, i) => Seq(
      max(when(col("grp") === p, col("n"))).as(s"n${i + 1}"),
      max(when(col("grp") === p, col("sv"))).as(s"s${i + 1}"),
      max(when(col("grp") === p, col("ss"))).as(s"ss${i + 1}"))
    }
    g.groupBy().agg(cols.head, cols.tail: _*)
  }

  /** Shared fixed-tree ANOVA arithmetic over a pivoted one-row moment
    * table (n1..n5, s1..s5, ss1..ss5): left-assoc 5-term sums keep the
    * IEEE evaluation order identical to the oracle's spelled-out SQL. */
  private def anovaFromPivot(piv: DataFrame): DataFrame = {
    def d(c: String) = col(c).cast("double")
    val nT = col("n1") + col("n2") + col("n3") + col("n4") + col("n5")
    val sT = d("s1") + d("s2") + d("s3") + d("s4") + d("s5")
    val bg = d("s1") * d("s1") / d("n1") + d("s2") * d("s2") / d("n2") +
      d("s3") * d("s3") / d("n3") + d("s4") * d("s4") / d("n4") +
      d("s5") * d("s5") / d("n5")
    val ssTot = d("ss1") + d("ss2") + d("ss3") + d("ss4") + d("ss5")
    val ssb = bg - sT * sT / nT.cast("double")
    val ssw = ssTot - bg
    piv.select(nT.as("n_total"), ssb.as("ssb"), ssw.as("ssw"),
      ((ssb / lit(4.0)) / (ssw / (nT.cast("double") - lit(5.0))))
        .as("f_stat"))
  }

  /** Brown–Forsythe robust variance-equality test (the median-based
    * Levene): per-priority LOWER-median order value selected on the
    * two-pass scalable grouped rank (no per-group sort funnel),
    * absolute deviations stay exact int64 dollars, then the same
    * pivoted fixed-tree ANOVA as q_anova_f runs on the deviations.
    * Gates whether q_anova_f's equal-variance reading is trustworthy. */
  private def qLeveneBf(s: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val vals = t(s, dir, "orders")
      .select(col("o_orderpriority").as("grp"), col("o_orderkey").as("ok"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 100").as("v"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      vals.select(col("grp"), col("v").cast("double").as("ord"), col("ok")),
      "grp", "ord", "ok", 32)
    val med = ranked
      .filter(col("rnk") * 2 === col("grp_n") + (col("grp_n") % 2))
      .select(col("grp"), col("ord").cast("long").as("med"))
    val g = vals.join(broadcast(med), "grp")
      .select(col("grp"), abs(col("v") - col("med")).as("z"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("z")).as("sv"),
        sum(col("z") * col("z")).as("ss"))
    anovaFromPivot(pivotMoments(g, prios)).select(col("n_total"),
      col("ssb"), col("ssw"), col("f_stat").as("f_bf"))
  }

  /** Cliff's delta ordinal effect size (URGENT vs LOW): δ = P(x>y) −
    * P(x<y) = 2·U1/(n1·n2) − 1, so it falls out of the same exact
    * midrank machinery as q_mann_whitney — reported in exact ppm via
    * the truncating integer division both engines share. The
    * distribution-free magnitude companion to q_mann_whitney's
    * significance z (as q_effect_size is to q_welch_t). */
  private def qCliffsDelta(s: SparkSession, dir: String): DataFrame = {
    val sample = t(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderkey").as("ok"), col("o_orderpriority").as("grp"),
        Analytics.cents(col("o_totalprice")).as("v"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      sample.select(lit("all").as("g"), col("v").cast("double").as("ord"),
        col("ok")),
      "g", "ord", "ok", 32)
    val ties = ranked.groupBy(col("ord"))
      .agg((min(col("rnk")) + max(col("rnk"))).as("mr2"))
    val mr = ranked.select(col("ok"), col("ord"))
      .join(ties, "ord")
      .join(sample.select(col("ok"), col("grp")), "ok")
    val stats = mr.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("mr2")).as("sr2"))
      .groupBy()
      .agg(
        max(when(col("grp") === "1-URGENT", col("n"))).as("n1"),
        max(when(col("grp") === "5-LOW", col("n"))).as("n2"),
        max(when(col("grp") === "1-URGENT", col("sr2"))).as("r1x2"))
    stats
      .withColumn("u1_x2", col("r1x2") - col("n1") * (col("n1") + 1))
      .select(col("n1"), col("n2"),
        expr("(u1_x2 - n1 * n2) * 1000000 div (n1 * n2)")
          .as("cliffs_delta_ppm"))
  }

  /** Equal-exposure Poisson rate comparison of two event streams
    * (clicks vs views over the identical time span): conditional on
    * the total, the click count is Binomial(a+b, ½) under H₀, so
    * z = (a−b)/√(a+b) — exact integer counts, one √ at the end. The
    * rate ratio ships alongside in exact ppm. The stream-health screen
    * ("did clicks collapse relative to views today?") with no
    * distributional fit anywhere. */
  private def qPoissonRate(s: SparkSession, dir: String): DataFrame = {
    events(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy()
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("b"))
      .select(col("a"), col("b"),
        ((col("a") - col("b")).cast("double") /
          sqrt((col("a") + col("b")).cast("double"))).as("z"),
        expr("a * 1000000 div b").as("rate_ratio_ppm"))
  }

  /** Chapman capture-recapture estimate of the active-customer
    * universe from two observation windows (1996 and 1997 order
    * activity): N̂ = (n1+1)(n2+1)/(m+1) − 1 — the ecology estimator
    * that data teams reuse to size "how many customers exist that we
    * only ever see a fraction of". One scan, one customer-keyed
    * reduce, pure integer arithmetic. */
  private def qCaptureRecapture(s: SparkSession, dir: String): DataFrame = {
    val flags = t(s, dir, "orders")
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(col("o_custkey"))
      .agg(
        max(when(year(col("o_orderdate")) === 1996, 1L).otherwise(0L)).as("c1"),
        max(when(year(col("o_orderdate")) === 1997, 1L).otherwise(0L)).as("c2"))
    flags.groupBy()
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(col("c1") * col("c2")).as("m"))
      .select(col("n1"), col("n2"), col("m"),
        expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1").as("chapman_est"))
  }

  /** All word-trigram occurrences (doc_id, g) — the TYPE space for the
    * vocabulary-statistics queries. The synthetic corpus draws from a
    * ~31-word list, so unigram types saturate instantly; trigram types
    * (~16 k at sf0.01) give the realistic open-vocabulary shape. */
  private def trigrams(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 2), " +
          "i -> array_join(slice(tk, i, 3), ' '))")).as("g"))

  /** Good-Turing frequency smoothing over the corpus vocabulary:
    * r* = (r+1)·N_{r+1}/N_r for r = 1..10 from the token
    * frequency-of-frequencies — the open-vocabulary mass estimate
    * (r*=1's N_1/N is the unseen-token probability) every n-gram LM
    * pipeline needs. The corpus collapses to term frequencies once;
    * the N_r table is vocabulary-of-counts sized (tiny at any scale),
    * so the r↔r+1 join is a broadcast no-op. Exact integer milli
    * throughout; rows where N_{r+1}=0 drop (r* undefined there). */
  private def qGoodTuring(s: SparkSession, dir: String): DataFrame = {
    val freq = trigrams(s, dir)
      .groupBy(col("g")).agg(count(lit(1)).as("r"))
    val fof = freq.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
      .localCheckpoint(eager = false)
    fof.as("a")
      .join(broadcast(fof.as("b")), col("a.r") + 1 === col("b.r"))
      .filter(col("a.r") <= 10)
      .select(col("a.r").as("r"), col("a.n_r").as("n_r"),
        col("b.n_r").as("n_next"))
      .withColumn("r_star_milli", expr("(r + 1) * n_next * 1000 div n_r"))
      .orderBy(col("r"))
  }

  /** Heaps'-law vocabulary-growth curve: distinct token types seen by
    * each tenth of the corpus (doc_id order). The scalable trick is
    * that vocab(≤d) needs no per-checkpoint distinct pass — each
    * type's FIRST document position determines every checkpoint it
    * counts toward, so one min-reduce per token plus a cumulative sum
    * over the 10-row checkpoint domain answers all checkpoints at
    * once. The sublinearity audit behind "will more data keep adding
    * vocabulary". */
  private def qHeaps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = t(s, dir, "documents").agg(count(lit(1)).as("d_total"))
    val first = trigrams(s, dir)
      .groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
    val bucketed = first.crossJoin(broadcast(total))
      .select(expr("((first_doc + 1) * 10 + d_total - 1) div d_total")
        .as("checkpoint"))
      .groupBy(col("checkpoint")).agg(count(lit(1)).as("new_types"))
    // 10 checkpoint rows: the window is a formality, not a funnel
    bucketed.crossJoin(broadcast(total))
      .withColumn("vocab_cum",
        sum(col("new_types")).over(Window.orderBy(col("checkpoint"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("checkpoint"),
        expr("d_total * checkpoint div 10").as("docs_cum"),
        col("new_types"), col("vocab_cum"))
      .orderBy(col("checkpoint"))
  }

  /** Per-user inter-event-gap profile + bot screen: millisecond gaps
    * from one user-keyed lag window (user_id is high-cardinality, so
    * the window partitions scale out), then exact integer gap moments
    * per user — mean gap, share of gaps under an hour in ppm — and a
    * deterministic bot flag (≥20 gaps, and >20% fast or mean gap
    * under 2h). The abuse/automation screen every event pipeline runs
    * before trusting engagement counts. */
  private def qBotDetect(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("tus"))
    val gaps = e
      .withColumn("gap_ms",
        expr("(tus - lag(tus) OVER (PARTITION BY user_id " +
          "ORDER BY tus, event_id)) div 1000"))
      .filter(col("gap_ms").isNotNull)
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_ms")).as("sum_gap_ms"),
        sum(when(col("gap_ms") <= 3600000L, 1L).otherwise(0L)).as("fast"))
      .select(col("user_id"), col("n_gaps"),
        expr("sum_gap_ms div n_gaps").as("mean_gap_ms"),
        expr("fast * 1000000 div n_gaps").as("fast_ppm"),
        (col("n_gaps") >= 20 &&
          (expr("fast * 1000000 div n_gaps") > 200000L ||
            expr("sum_gap_ms div n_gaps") < 7200000L)).as("bot_flag"))
      .orderBy(col("user_id"))
  }

  /** Fellegi–Sunter probabilistic record linkage over the part
    * catalog: candidate pairs from (size, initial) blocking — never
    * all-pairs — scored by summing per-field agreement/disagreement
    * log-odds (integer micro-log literals standing in for trained
    * m/u probabilities: ln(m/u) and ln((1−m)/(1−u)) per field).
    * Brand and type compare exactly; price agrees within $50 (cents).
    * Pairs at or above the decision threshold ship with their field
    * pattern — the classic ER decision rule, exact int64 end-to-end. */
  private def qFellegiSunter(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"), Analytics.cents(col("p_retailprice")).as("price_c"),
        substring(col("p_name"), 1, 1).as("initial"))
    val brandW = when(col("a.p_brand") === col("b.p_brand"), 2400000L)
      .otherwise(-800000L)
    val typeW = when(col("a.p_type") === col("b.p_type"), 1800000L)
      .otherwise(-400000L)
    val priceW = when(abs(col("a.price_c") - col("b.price_c")) <= 5000L,
      900000L).otherwise(-300000L)
    p.as("a").join(p.as("b"),
        col("a.p_size") === col("b.p_size") &&
          col("a.initial") === col("b.initial") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("k1"), col("b.p_partkey").as("k2"),
        (col("a.p_brand") === col("b.p_brand")).as("brand_eq"),
        (col("a.p_type") === col("b.p_type")).as("type_eq"),
        (abs(col("a.price_c") - col("b.price_c")) <= 5000L).as("price_eq"),
        (brandW + typeW + priceW).as("score_micro"))
      .filter(col("score_micro") >= 2500000L)
      .orderBy(col("k1"), col("k2"))
  }

  /** Folded-variance periodicity detection over daily event counts:
    * for each candidate period p = 2..10 days, fold days by d mod p
    * and score the fold by its between-group sum of squares — a high
    * score means the daily series repeats at period p. The statistic
    * is Σ_r (S_r² div n_r) − S² div N with the divisions as explicit
    * truncating integer division — order-independent integer sums,
    * deterministic in any engine, no transcendental spectral machinery.
    * Everything windows over the bounded (period × fold) domain; the
    * event scan reduces to one row per day first. */
  private def qPeriodDetect(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(expr("ts div 86400000000000").as("d"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val tot = daily.agg(count(lit(1)).as("nd"), sum(col("c")).as("sc"))
    val folded = daily
      .crossJoin(broadcast(s.range(2, 11).select(col("id").as("p"))))
      .groupBy(col("p"), expr("d % p").as("r"))
      .agg(sum(col("c")).as("sr"), count(lit(1)).as("nr"))
    folded.groupBy(col("p"))
      .agg(sum(expr("sr * sr div nr")).as("ssb_scaled"))
      .crossJoin(broadcast(tot))
      .select(col("p"), col("ssb_scaled"),
        expr("ssb_scaled - sc * sc div nd").as("period_score"))
      .orderBy(col("p"))
  }

  /** MASE-style seasonal-naive benchmark over daily revenue: is a
    * weekly-seasonal naive forecast (value a week ago) actually better
    * than the trivial naive (value a day ago)? Both error totals are
    * exact integer thousand-dollar daily revenues through gap-safe
    * day-domain self-joins (no lag window over data-sized partitions),
    * and the ratio ships in exact ppm — under 1e6 means the weekly
    * season is real and a forecaster should use it. */
  private def qMase(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
      .localCheckpoint(eager = false)
    val e1 = daily.as("a").join(daily.as("b"),
        col("a.day") + 1 === col("b.day"))
      .select(abs(col("b.v") - col("a.v")).as("e"))
      .agg(count(lit(1)).as("n1"), sum(col("e")).as("sae1"))
    val e7 = daily.as("a").join(daily.as("b"),
        col("a.day") + 7 === col("b.day"))
      .select(abs(col("b.v") - col("a.v")).as("e"))
      .agg(count(lit(1)).as("n7"), sum(col("e")).as("sae7"))
    e1.crossJoin(broadcast(e7))
      .select(col("n1"), col("sae1"), col("n7"), col("sae7"),
        expr("(sae7 * n1) * 1000000 div (sae1 * n7)").as("mase_ppm"))
  }

  /** Per-user behavioral entropy: Shannon entropy of each user's
    * event-type mix (5 fixed types) in integer micro-nats — the
    * engagement-diversity screen (near-zero entropy = single-action
    * users/automation; compare q_bot_detect's timing view). The 5-term
    * entropy tree is FIXED (q_entropy's contract) and the micro-nat
    * floor absorbs cross-engine ln() ulp; one user-keyed reduce, no
    * windows. */
  private def qSessionEntropy(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cnt = (p: String) =>
      sum(when(col("event_type") === p, 1L).otherwise(0L))
    val byUser = events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        types.zipWithIndex.map { case (p, i) => cnt(p).as(s"c$i") }: _*)
    def entTerm(i: Int): org.apache.spark.sql.Column = {
      val p = col(s"c$i").cast("double") / col("n").cast("double")
      when(col(s"c$i") > 0, p * log(p)).otherwise(lit(0.0))
    }
    byUser
      .withColumn("entropy_unat",
        floor((lit(0.0) - (0 to 4).map(entTerm).reduce(_ + _)) * 1000000
          + 0.5).cast("long"))
      .select(col("user_id"), col("n"), col("entropy_unat"))
      .orderBy(col("user_id"))
  }

  /** Dedup-threshold calibration sweep: candidate pairs and docs
    * dropped at each Jaccard threshold 0.50/0.60/0.70/0.80/0.90, all
    * from ONE exact-Jaccard candidate-pair table (the inverted-index
    * join — never all-pairs). The decide-the-threshold audit a dedup
    * pipeline runs before committing to a similarity cut, sibling to
    * q_filter_sweep's quality-threshold sweep. Dropped docs = distinct
    * higher-id members of qualifying pairs (the keep-lowest-id rule). */
  private def qDedupSweep(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 5, minSim = 0.05)
      .localCheckpoint(eager = false)
    val thresholds = s.range(1, 10).select((col("id") * 100000).as("thr_ppm"))
    // exact rational qualification: shared/(n1+n2-shared) >= thr as an
    // integer cross-multiply — no double ever decides a boundary pair
    val q = col("shared") * 1000000 >=
      col("thr_ppm") * (col("n1") + col("n2") - col("shared"))
    pairs.crossJoin(broadcast(thresholds))
      .groupBy(col("thr_ppm"))
      .agg(sum(when(q, 1L).otherwise(0L)).as("n_pairs"),
        countDistinct(when(q, col("d2"))).as("docs_dropped"))
      .orderBy(col("thr_ppm"))
  }

  /** Embedding-norm audit: per-label L2-norm profile (mean in exact
    * fixed point, min/max) plus degenerate-vector counts — the data-
    * quality gate before any cosine math is trusted (zero or tiny
    * norms poison similarity search silently). Norms are exact
    * fixed-point integers via the same 1e-9 per-term quantization the
    * similarity stack uses; one label-keyed reduce, no shuffle of the
    * vectors themselves beyond it. */
  private def qVectorNorms(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("label").cast("long").as("label"),
        graft.functions.kernels.fixed_point_dot(col("embedding"),
          col("embedding")).as("nrm_fp"))
    emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("nrm_fp")).as("sum_nrm_fp"),
        min(col("nrm_fp")).as("min_nrm_fp"),
        max(col("nrm_fp")).as("max_nrm_fp"),
        sum(when(col("nrm_fp") < 10000000L, 1L).otherwise(0L))
          .as("degenerate"))
      .select(col("label"), col("n"),
        expr("sum_nrm_fp div n").as("mean_nrm_fp"),
        col("min_nrm_fp"), col("max_nrm_fp"), col("degenerate"))
      .orderBy(col("label"))
  }

  /** Temporal train/test split audit (cutoff 1998-01-01): per nation,
    * order and customer counts on each side plus the STRADDLING
    * customers — the population whose test-period behavior is partly
    * memorized by any model trained on the pre-period (the temporal
    * cousin of q_group_split's row-vs-group leakage audit). One
    * customer-keyed reduce carrying two booleans; straddle share in
    * exact ppm of test-side customers. */
  private def qTemporalSplit(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01").cast("date")
    val per = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("o_custkey"))
      .agg(
        sum(when(col("o_orderdate") < cut, 1L).otherwise(0L)).as("n_tr"),
        sum(when(col("o_orderdate") >= cut, 1L).otherwise(0L)).as("n_te"))
    per.groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(sum(col("n_tr")).as("train_orders"),
        sum(col("n_te")).as("test_orders"),
        sum(when(col("n_tr") > 0, 1L).otherwise(0L)).as("train_customers"),
        sum(when(col("n_te") > 0, 1L).otherwise(0L)).as("test_customers"),
        sum(when(col("n_tr") > 0 && col("n_te") > 0, 1L).otherwise(0L))
          .as("straddling"))
      .withColumn("straddle_ppm",
        expr("straddling * 1000000 div test_customers"))
      .orderBy(col("nation"))
  }

  /** Robust feature scaling ((x − median)/IQR, the outlier-proof
    * alternative to z-scoring): per-priority median/q1/q3 selected on
    * the two-pass grouped rank (the q_percentile_exact machinery),
    * then a deterministic order sample is emitted with its scaled
    * value in exact ppm — (v − med)·1e6 div IQR, integer end-to-end.
    * The broadcast of the 5-row fence table back onto the scan is the
    * same shape q_outliers_iqr pins. */
  private def qRobustScaler(s: SparkSession, dir: String): DataFrame = {
    val fences = orderPricePercentiles(s, dir, Seq(25, 50, 75))
      .select(col("o_orderpriority").as("prio"), col("p25_c"),
        col("p50_c"), col("p75_c"))
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 997 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        Analytics.cents(col("o_totalprice")).as("v_c"))
      .join(broadcast(fences), col("o_orderpriority") === col("prio"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("v_c"),
        expr("(v_c - p50_c) * 1000000 div (p75_c - p25_c)")
          .as("scaled_ppm"))
      .orderBy(col("o_orderkey"))
  }

  /** Per-source corpus novelty: the share of each source's trigram
    * TYPES that appear in no other source — near-zero novelty means
    * the source is redundant with the rest of the corpus (mirror
    * scrapes, syndication), novelty ≈ 1 means it contributes unique
    * text. Type-level source counts collapse the corpus once; a type
    * is exclusive when its distinct-source count is 1. Exact ppm. */
  private def qNovelty(s: SparkSession, dir: String): DataFrame = {
    val typed = t(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(tk) - 2), " +
          "i -> array_join(slice(tk, i, 3), ' '))")).as("g"))
      .distinct()
      .localCheckpoint(eager = false)
    val spread = typed.groupBy(col("g"))
      .agg(count(lit(1)).as("n_sources"))
    typed.join(spread, "g")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("types"),
        sum(when(col("n_sources") === 1, 1L).otherwise(0L))
          .as("exclusive_types"))
      .withColumn("novelty_ppm",
        expr("exclusive_types * 1000000 div types"))
      .orderBy(col("source"))
  }

  /** Funnel conversion-window sweep: signup→purchase conversion at
    * 1 h / 6 h / 24 h windows, all from ONE pass — per user the first
    * signup and the earliest subsequent purchase delta, then each
    * window is a threshold count over that tiny per-user table (the
    * sweep discipline of q_filter_sweep/q_dedup_sweep applied to
    * funnel design: pick the attribution window from evidence, not
    * convention). */
  private def qFunnelWindows(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), col("event_type"),
      expr("ts div 1000000000").as("sec"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("sec")).as("t_signup"))
    val dt = e.join(s1, "user_id")
      .filter(col("event_type") === "purchase" &&
        col("sec") >= col("t_signup"))
      .groupBy(col("user_id"))
      .agg((min(col("sec") - col("t_signup"))).as("dt"))
    val signups = s1.agg(count(lit(1)).as("signups"))
    val windows = s.range(0, 3).select(
      when(col("id") === 0, 3600L).when(col("id") === 1, 21600L)
        .otherwise(86400L).as("window_sec"))
    dt.crossJoin(broadcast(windows))
      .groupBy(col("window_sec"))
      .agg(sum(when(col("dt") <= col("window_sec"), 1L).otherwise(0L))
        .as("converted"))
      .crossJoin(broadcast(signups))
      .withColumn("cvr_ppm", expr("converted * 1000000 div signups"))
      .orderBy(col("window_sec"))
  }

  /** First-touch attribution — the acquisition-side complement of
    * q_attribution's last-touch: each purchase is credited to the
    * channel of its user's FIRST click ever, provided that click
    * precedes the purchase (later-first-click purchases stay
    * unattributed at channel −1). The first click is a deterministic
    * struct-min per user (one reduce; (ts, event_id) unique), so no
    * per-purchase as-of pass is needed — first touch is a user-level
    * fact, which is exactly why marketers like it at scale. */
  private def qFirstTouch(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        Analytics.fp(col("value"), 1000L).as("v_milli"))
    val firstClick = ev.filter(col("event_type") === "click")
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          (get_json_object(col("props"), "$.k").cast("long") % 4)
            .as("channel")).as("c"))
      .groupBy(col("user_id"))
      .agg(min(col("c")).as("fc"))
      .select(col("user_id"), col("fc.ts").as("fc_ts"),
        col("fc.channel").as("fc_channel"))
    purchases.join(firstClick, Seq("user_id"), "left")
      .groupBy(when(col("fc_ts").isNotNull && col("fc_ts") <= col("ts"),
          col("fc_channel")).otherwise(lit(-1L)).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("v_milli")).as("value_milli"))
      .orderBy(col("channel"))
  }

  /** Paasche price index (current-basket companion to q_laspeyres's
    * base-basket index — economists quote the pair): numerator is the
    * year's actual spend, denominator prices the year's quantities at
    * base-1996 unit prices via the same two-step integer division
    * discipline. Laspeyres ≥ Paasche spread = substitution bias. */
  private def qPaasche(s: SparkSession, dir: String): DataFrame = {
    val py = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"), year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .localCheckpoint(eager = false)
    val base = py.filter(col("yr") === 1996)
      .select(col("l_partkey"), col("cents").as("cents0"),
        col("qty").as("q0"))
    py.join(base, "l_partkey")
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("cents")).as("numer"),
        sum(expr("cents0 * qty div q0")).as("denom"))
      .withColumn("index_ppm", expr("numer * 1000000 div denom"))
      .select(col("yr"), col("n_parts"), col("index_ppm"))
      .orderBy(col("yr"))
  }

  /** Sample-ratio-mismatch (SRM) guard for the q_ab_test experiment:
    * a 50/50 customer-parity split whose observed arm sizes drift is
    * a broken randomizer — the FIRST check any experiment readout
    * must pass. χ²(1 df) = (n0−n1)²/(n0+n1) against the even split,
    * shipped in exact milli via integer cross-multiply (squares of
    * arm-count deltas stay far inside int64 at any scale). */
  private def qAbSrm(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "orders")
      .groupBy((col("o_custkey") % 2).as("variant"))
      .agg(countDistinct(col("o_custkey")).as("n"))
    g.filter(col("variant") === 0).select(col("n").as("n0"))
      .crossJoin(g.filter(col("variant") === 1).select(col("n").as("n1")))
      .select(col("n0"), col("n1"),
        expr("(n0 - n1) * (n0 - n1) * 1000 div (n0 + n1)")
          .as("chi2_milli"),
        (expr("(n0 - n1) * (n0 - n1) * 1000 div (n0 + n1)") >= 3841L)
          .as("srm_flag"))
  }

  /** Hill tail-index estimator of the order-value distribution: over
    * the top-201 order statistics (TakeOrdered — a per-partition heap,
    * never a global sort), α̂ = k / Σ ln(xᵢ/x_thr) with each log term
    * rounded to integer micro-nats BEFORE the sum (q_entropy's
    * contract: the rounding absorbs cross-engine ln ulp and makes the
    * reduction order-independent). α̂ ≈ 1 means an extreme heavy tail
    * (top orders dominate revenue); the quantitative companion to
    * q_pareto/q_lorenz_gini. */
  private def qTailIndex(s: SparkSession, dir: String): DataFrame = {
    val top = t(s, dir, "orders")
      .select(Analytics.cents(col("o_totalprice")).as("v"),
        col("o_orderkey").as("ok"))
      .orderBy(col("v").desc, col("ok"))
      .limit(201)
      .localCheckpoint(eager = false)
    val thr = top.agg(min(col("v")).as("x_thr"))
    top.crossJoin(broadcast(thr))
      .select(floor(log(col("v").cast("double") /
          col("x_thr").cast("double")) * 1000000 + 0.5).cast("long")
        .as("term_unat"), col("x_thr"))
      .groupBy(col("x_thr"))
      .agg(count(lit(1)).as("k_plus_1"), sum(col("term_unat")).as("sum_unat"))
      .select(col("x_thr").as("x_thr_cents"), col("k_plus_1"),
        col("sum_unat"),
        expr("(k_plus_1 - 1) * 1000000000 div sum_unat")
          .as("hill_alpha_milli"))
  }

  /** 7-day rolling correlation between daily click and purchase
    * volumes: the co-movement monitor ("did purchases decouple from
    * clicks this week?"). The event stream collapses to one row per
    * day first; every windowed sum is an exact integer over the
    * gap-safe RANGE frame on the bounded day DOMAIN (calendar-sized,
    * never data-sized), and each day's r is a fixed IEEE tree over
    * those six exact sums. */
  private def qRollingCorr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(expr("ts div 86400000000000").as("d"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    // day-domain window: calendar-bounded rows, RANGE frame is gap-safe
    val w = Window.orderBy(col("d")).rangeBetween(-6, 0)
    val sums = daily
      .withColumn("nw", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
    val num = (col("nw") * col("sxy") - col("sx") * col("sy")).cast("double")
    val dx = (col("nw") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (col("nw") * col("syy") - col("sy") * col("sy")).cast("double")
    sums.select(col("d"), col("nw"), col("x"), col("y"),
        when(col("nw") >= 3, num / (sqrt(dx) * sqrt(dy))).as("r"))
      .orderBy(col("d"))
  }

  /** Burst detection on the hourly event stream (Kleinberg-lite): an
    * hour bursts when its count exceeds 1.2× the trailing-24h mean —
    * decided by integer cross-multiply (c·20 > Σtrail), no division
    * anywhere — and consecutive bursting hours merge into episodes via
    * the gaps-and-islands prefix trick. All windows ride the bounded
    * hour DOMAIN (calendar-sized); the stream collapses to one row per
    * hour first. Output: burst episodes with span and peak. */
  private def qBurstDetect(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events(s, dir)
      .groupBy(expr("ts div 3600000000000").as("h"))
      .agg(count(lit(1)).as("c"))
    val wTrail = Window.orderBy(col("h")).rangeBetween(-24, -1)
    val flagged = hourly
      .withColumn("trail", sum(col("c")).over(wTrail))
      .withColumn("n_trail", count(lit(1)).over(wTrail))
      // full-trailing-day context only: the first day can't burst
      .withColumn("burst",
        col("n_trail") === 24 && col("c") * 20 > col("trail"))
    val wAll = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged
      .withColumn("island", sum(when(col("burst"), 0L).otherwise(1L)).over(wAll))
      .filter(col("burst"))
      .groupBy(col("island"))
      .agg(min(col("h")).as("start_h"), max(col("h")).as("end_h"),
        count(lit(1)).as("hours"), max(col("c")).as("peak"),
        sum(col("c")).as("events"))
      .select(col("start_h"), col("end_h"), col("hours"), col("peak"),
        col("events"))
      .orderBy(col("start_h"))
  }

  /** Telemetry double-fire screen: consecutive identical events per
    * user within 5 s (same type, near-same timestamp) are SDK retries /
    * double-sends that silently inflate engagement. One user-keyed lag
    * window (high-cardinality partitions — scalable), exact integer
    * millisecond deltas, per-type dup counts and ppm share. */
  private def qAdjacentDup(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), col("event_id"),
      col("event_type"), expr("ts div 1000000").as("tms"))
    val lagged = e.withColumn("prev_type",
        expr("lag(event_type) OVER (PARTITION BY user_id " +
          "ORDER BY tms, event_id)"))
      .withColumn("prev_tms",
        expr("lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id)"))
    lagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("prev_type") === col("event_type") &&
          col("tms") - col("prev_tms") <= 5000L, 1L).otherwise(0L))
          .as("dup_fires"))
      .withColumn("dup_ppm", expr("dup_fires * 1000000 div n_events"))
      .orderBy(col("event_type"))
  }

  /** Join-cardinality prediction audit: for the orders⋈lineitem key,
    * predicted output size Σ_k cA(k)·cB(k) from the two sides'
    * per-key histograms vs the ACTUAL join count — the pre-flight
    * explosion guard a 100 TB join plan runs before committing to a
    * shuffle (the formula is what a CBO uses; here it's proven exact
    * against the real join), plus the hottest key's contribution. */
  private def qJoinCardinality(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "orders").groupBy(col("o_orderkey").as("k"))
      .agg(count(lit(1)).as("ca"))
    val b = t(s, dir, "lineitem").groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("cb"))
    val prods = a.join(b, "k")
      .select(col("k"), (col("ca") * col("cb")).as("prod"))
      .localCheckpoint(eager = false)
    val predicted = prods.agg(sum(col("prod")).as("predicted"))
    val actual = t(s, dir, "orders").join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("actual"))
    val top = prods.agg(max(col("prod")).as("hottest_key_rows"))
    predicted.crossJoin(broadcast(actual)).crossJoin(broadcast(top))
      .select(col("predicted"), col("actual"),
        (col("predicted") === col("actual")).as("formula_exact"),
        col("hottest_key_rows"))
  }

  /** Weekday-seasonality strength: the share of daily-revenue
    * variance explained by day-of-week, SSB·1e6 div SST with the
    * between-group term in the same explicit truncating-integer-
    * division discipline as q_period_detect — the effect-size number
    * that tells a forecaster whether q_weekday_effect's indices are
    * worth modeling (near 0 ⇒ weekday is noise). */
  private def qWeekdayStrength(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
      .localCheckpoint(eager = false)
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
      sum(col("v") * col("v")).as("svv"))
    val byDow = daily.groupBy(expr("(day + 4) % 7").as("dow"))
      .agg(sum(col("v")).as("sr"), count(lit(1)).as("nr"))
    byDow.agg(sum(expr("sr * sr div nr")).as("bg_scaled"))
      .crossJoin(broadcast(tot))
      .select(col("n").as("n_days"),
        expr("bg_scaled - sv * sv div n").as("ssb_scaled"),
        expr("svv - sv * sv div n").as("sst_scaled"),
        expr("(bg_scaled - sv * sv div n) * 1000000 " +
          "div (svv - sv * sv div n)").as("strength_ppm"))
  }

  /** Hurst exponent by rescaled-range (R/S) analysis of daily revenue
    * — long-memory detection (H≈0.5 random walk, H→1 trending, H→0.5⁻
    * mean-reverting). Blocks of m ∈ {16, 64} days: within each block
    * the cumulative-deviation range is EXACT after scaling by m
    * (m·Σᵢvᵢ − (j+1)·S stays integer — no mean ever materializes as a
    * double), R/S collapses to R′/√(m·Σv² − S²) with ONE div + ONE
    * sqrt per block, rounded to micro before the cross-block mean so
    * the reduction is order-independent. H from the two block sizes'
    * log-mean-R/S slope over the ln 4 micro-nat literal. Block windows
    * are m-row bounded; blocks scale out. */
  private def qHurst(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
    val ranked = daily
      .withColumn("rnk", row_number().over(Window.orderBy(col("day")))
        .cast("long"))
      .crossJoin(broadcast(s.range(0, 2).select(
        when(col("id") === 0, 16L).otherwise(64L).as("m"))))
      .select(col("m"), expr("(rnk - 1) div m").as("blk"),
        expr("(rnk - 1) % m").as("pos"), col("v"))
    val wBlk = Window.partitionBy(col("m"), col("blk"))
      .orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ranked
      .withColumn("cv", sum(col("v")).over(wBlk))
      .withColumn("cdev", col("m") * col("cv") -
        (col("pos") + 1) * sum(col("v")).over(
          Window.partitionBy(col("m"), col("blk"))))
    val perBlock = cum.groupBy(col("m"), col("blk"))
      .agg(count(lit(1)).as("nb"), sum(col("v")).as("sb"),
        sum(col("v") * col("v")).as("ssb"),
        max(col("cdev")).as("cmax"), min(col("cdev")).as("cmin"))
      .filter(col("nb") === col("m"))
      .select(col("m"),
        floor((col("cmax") - col("cmin")).cast("double") /
          sqrt((col("m") * col("ssb") - col("sb") * col("sb"))
            .cast("double")) * 1000000 + 0.5).cast("long").as("rs_micro"))
    val perM = perBlock.groupBy(col("m"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("rs_micro")).as("srs"))
      .select(col("m"), col("n_blocks"),
        expr("srs div n_blocks").as("mean_rs_micro"))
      .withColumn("l_unat",
        floor(log(col("mean_rs_micro").cast("double") / 1000000.0)
          * 1000000 + 0.5).cast("long"))
    perM.groupBy()
      .agg(max(when(col("m") === 16, col("mean_rs_micro"))).as("rs16_micro"),
        max(when(col("m") === 64, col("mean_rs_micro"))).as("rs64_micro"),
        max(when(col("m") === 16, col("l_unat"))).as("l16"),
        max(when(col("m") === 64, col("l_unat"))).as("l64"))
      .select(col("rs16_micro"), col("rs64_micro"),
        expr("(l64 - l16) * 1000 div 1386294").as("hurst_milli"))
  }

  /** Empirical-Bayes shrinkage of per-nation urgent-order rates
    * (beta-binomial, moment-matched prior): small nations get pulled
    * toward the cross-nation mean in proportion to their evidence —
    * the league-table correction that stops a 40-order nation topping
    * a ranking on noise. Per-nation counts are exact; the prior's
    * (a, a+b) come from a fixed double tree over the k EQUAL-WEIGHTED
    * ppm rates (integer sums, so the moment match is order-
    * independent); each nation's shrunk rate is one fixed tree over
    * its own integers + the broadcast prior. */
  private def qEbShrinkage(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("x"))
      .withColumn("r_ppm", expr("x * 1000000 div n"))
      .localCheckpoint(eager = false)
    val prior = per.agg(count(lit(1)).as("k"), sum(col("r_ppm")).as("sr"),
        sum(col("r_ppm") * col("r_ppm")).as("srr"))
      .select(
        (col("sr").cast("double") / col("k").cast("double") / 1e6).as("m"),
        ((col("srr").cast("double") / col("k").cast("double") -
          (col("sr").cast("double") / col("k").cast("double")) *
          (col("sr").cast("double") / col("k").cast("double"))) / 1e12)
          .as("v"))
      .select(col("m"), col("v"),
        (col("m") * (lit(1.0) - col("m")) / col("v") - lit(1.0)).as("ab"))
    per.crossJoin(broadcast(prior))
      .select(col("nation"), col("n"), col("x"), col("r_ppm"),
        floor((col("x").cast("double") + col("m") * col("ab")) /
          (col("n").cast("double") + col("ab")) * 1000000 + 0.5)
          .cast("long").as("shrunk_ppm"))
      .orderBy(col("nation"))
  }

  /** Cluster-randomized ratio-metric test (revenue per order, arms by
    * customer parity): the randomization unit is the CUSTOMER but the
    * metric is a ratio of order-level sums, so naive per-order
    * variance is wrong — the delta method over per-customer cluster
    * totals is the correct standard error (the experimentation-
    * platform workhorse). Six exact integer moments per arm over
    * cluster totals; R, var(R), and z are fixed IEEE trees. */
  private def qRatioMetric(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "orders")
      .groupBy((col("o_custkey") % 2).as("arm"), col("o_custkey"))
      .agg(count(lit(1)).as("o"),
        sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 100"))
          .as("r"))
    val arms = cust.groupBy(col("arm"))
      .agg(count(lit(1)).as("k"), sum(col("r")).as("sr"),
        sum(col("o")).as("so"), sum(col("r") * col("r")).as("srr"),
        sum(col("o") * col("o")).as("soo"), sum(col("r") * col("o")).as("sro"))
    def d(c: String) = col(c).cast("double")
    val pivotCols = Seq("k", "sr", "so", "srr", "soo", "sro").flatMap { c =>
      Seq(max(when(col("arm") === 0, col(c))).as(s"${c}0"),
        max(when(col("arm") === 1, col(c))).as(s"${c}1"))
    }
    val wide = arms.groupBy().agg(pivotCols.head, pivotCols.tail: _*)
    def armStats(sfx: String) = {
      val k = d(s"k$sfx"); val sr = d(s"sr$sfx"); val so = d(s"so$sfx")
      val srr = d(s"srr$sfx"); val soo = d(s"soo$sfx"); val sro = d(s"sro$sfx")
      val rBar = sr / k; val oBar = so / k
      val ratio = sr / so
      val varR = (srr / k - rBar * rBar)
      val varO = (soo / k - oBar * oBar)
      val covRO = (sro / k - rBar * oBar)
      // delta-method variance of (Σr/Σo) over k iid clusters
      val v = (varR - lit(2.0) * ratio * covRO + ratio * ratio * varO) /
        (k * oBar * oBar)
      (ratio, v)
    }
    val (r0, v0) = armStats("0")
    val (r1, v1) = armStats("1")
    wide.select(col("k0"), col("k1"), r0.as("rpo0"), r1.as("rpo1"),
      ((r1 - r0) / sqrt(v0 + v1)).as("z"))
  }

  /** Per-bin sigmoid confidence literals for the quality classifier's
    * 21 logit bins (bin center ≈ 2·bin logits): sigmoids are computed
    * ONCE at build time and embedded as identical integer-ppm literals
    * in both engines — no runtime transcendental ever crosses the
    * engine boundary. */
  private lazy val confCaseSql: String =
    (-10 to 10).map { b =>
      s"WHEN $b THEN ${math.round(1e6 / (1.0 + math.exp(-2.0 * b)))}"
    }.mkString("CASE bin ", " ", " ELSE 0 END")

  /** Expected calibration error of the quality classifier — the ONE
    * number that says whether q_calibration's reliability table is
    * trustworthy: ECE = Σ_b (n_b/N)·|acc_b − conf_b| over the fixed
    * logit bins, with per-bin confidence a build-time sigmoid literal
    * (confCaseSql) and everything else exact integers. The worst bin
    * ships alongside via an order-encoded integer argmax. */
  private def qEce(s: SparkSession, dir: String): DataFrame = {
    val binned = t(s, dir, "documents")
      .select(
        (col("n_chars") >= 200).as("label"),
        (lit(40L) * size(split(col("text"), " ")).cast("long") +
          lit(-10L) * length(regexp_replace(col("text"), "[^0-9]", ""))
            .cast("long") +
          lit(-2L) * abs(col("n_chars") - 500) + lit(-1500L))
          .as("logit_milli"))
      .withColumn("bin",
        greatest(least(expr("logit_milli div 2000"), lit(10L)), lit(-10L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"))
      .withColumn("conf_ppm", expr(confCaseSql))
      .withColumn("gap_ppm",
        abs(expr("pos * 1000000 div n") - col("conf_ppm")))
    binned.groupBy()
      .agg(sum(col("n")).as("n_docs"),
        sum(col("n") * col("gap_ppm")).as("weighted_gap"),
        max(col("gap_ppm") * 1000 + col("bin") + 10).as("worst_enc"))
      .select(col("n_docs"),
        expr("weighted_gap div n_docs").as("ece_ppm"),
        expr("worst_enc div 1000").as("max_gap_ppm"),
        expr("worst_enc % 1000 - 10").as("worst_bin"))
  }

  /** Fairness audit of the quality classifier across languages:
    * demographic-parity gap (keep-rate vs corpus) and equal-
    * opportunity gap (TPR among label-positives vs corpus) per
    * language, all exact ppm integers — the per-slice eval any
    * production filter ships with. One scan, one group-by; the
    * corpus row is broadcast back. */
  private def qFairness(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(col("lang"),
        (col("n_chars") >= 200).as("label"),
        ((lit(40L) * size(split(col("text"), " ")).cast("long") +
          lit(-10L) * length(regexp_replace(col("text"), "[^0-9]", ""))
            .cast("long") +
          lit(-2L) * abs(col("n_chars") - 500) + lit(-1500L)) >= 0L)
          .as("pred"))
      .localCheckpoint(eager = false)
    val byLang = scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred"), 1L).otherwise(0L)).as("kept"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("pred") && col("label"), 1L).otherwise(0L)).as("tp"))
    val glob = scored.agg(
      count(lit(1)).as("gn"),
      sum(when(col("pred"), 1L).otherwise(0L)).as("gkept"),
      sum(when(col("label"), 1L).otherwise(0L)).as("gpos"),
      sum(when(col("pred") && col("label"), 1L).otherwise(0L)).as("gtp"))
    byLang.crossJoin(broadcast(glob))
      .select(col("lang"), col("n"),
        expr("kept * 1000000 div n").as("keep_ppm"),
        expr("tp * 1000000 div n_pos").as("tpr_ppm"),
        expr("kept * 1000000 div n - gkept * 1000000 div gn")
          .as("dp_gap_ppm"),
        expr("tp * 1000000 div n_pos - gtp * 1000000 div gpos")
          .as("eo_gap_ppm"))
      .orderBy(col("lang"))
  }

  /** Fleiss' kappa for THREE deterministic quality raters (chars ≥
    * 200, words ≥ 40, digits ≤ 5) — multi-rater chance-corrected
    * agreement, extending q_kappa's two-rater Cohen form. With n = 3
    * raters and 2 categories, per-item pair-agreement numerators are
    * tiny integers (6 if unanimous, 2 if split), so P̄ and P̄ₑ reduce
    * to one integer reduce + a fixed double tree over (A, S, N). */
  private def qFleissKappa(s: SparkSession, dir: String): DataFrame = {
    val rated = t(s, dir, "documents")
      .select(
        ((when(col("n_chars") >= 200, 1L).otherwise(0L)) +
          (when(size(split(col("text"), " ")) >= 40, 1L).otherwise(0L)) +
          (when(length(regexp_replace(col("text"), "[^0-9]", "")) <= 5, 1L)
            .otherwise(0L))).as("n_pass"))
      .select(col("n_pass"),
        (col("n_pass") * (col("n_pass") - 1) +
          (lit(3L) - col("n_pass")) * (lit(2L) - col("n_pass"))).as("pairs"))
    val agg0 = rated.agg(count(lit(1)).as("n_items"),
      sum(col("pairs")).as("a"), sum(col("n_pass")).as("s"))
    def d(c: String) = col(c).cast("double")
    val pBar = d("a") / (lit(6.0) * d("n_items"))
    val pPass = d("s") / (lit(3.0) * d("n_items"))
    val pe = pPass * pPass + (lit(1.0) - pPass) * (lit(1.0) - pPass)
    agg0.select(col("n_items"), col("a"), col("s"),
      ((pBar - pe) / (lit(1.0) - pe)).as("fleiss_kappa"))
  }

  /** MAP@10 of the IVF index against brute-force binary relevance —
    * the order-sensitive companion to q_recall_at_k and the graded
    * q_ndcg: AP's precision@k prefix sums live on the 10-row per-query
    * ranking (bounded window), every term an exact integer-ppm
    * division, mean over queries an integer div. Same shared IVF
    * assignment and bounded-heap top-k scaffolding as q_ndcg. */
  private def qMapEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents,
      "cid", "cv").localCheckpoint(eager = false)
    val queries = emb.filter(col("vec_id").isin(0, 7, 42, 99, 123))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(assign.select(col("vec_id").as("qid"), col("cid").as("qcid")),
        "qid")
    def keyed(scored: DataFrame): DataFrame = scored.select(col("qid"),
      col("vec_id"),
      lpad(greatest(lit(0L),
          floor((lit(1.0) - col("cosine")) * 1e9 + 0.5).cast("long"))
        .cast("string"), 12, "0").as("distkey"))
    val truth10 = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .crossJoin(broadcast(queries.select(col("qid"), col("qv"))))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 10)
      .select(col("qid").cast("long").as("qid"), col("vec_id"),
        lit(1L).as("rel"))
    val ivf10 = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .join(assign, "vec_id")
        .join(broadcast(queries), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 10)
      .select(col("qid").cast("long").as("qid"), col("rn").cast("long")
        .as("rn"), col("vec_id"))
    val marked = ivf10
      .join(truth10, Seq("qid", "vec_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    // 10-row per-query window: bounded, not a funnel
    val cum = marked.withColumn("cum_rel",
      sum(col("rel")).over(Window.partitionBy(col("qid"))
        .orderBy(col("rn"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.withColumn("term_ppm",
        when(col("rel") === 1L, expr("cum_rel * 1000000 div rn"))
          .otherwise(lit(0L)))
      .groupBy(col("qid"))
      .agg(sum(col("term_ppm")).as("sum_terms"),
        sum(col("rel")).as("hits"))
      .select(col("qid"), col("hits"),
        expr("sum_terms div 10").as("ap_ppm"))
      .orderBy(col("qid"))
  }

  /** Range-partitioner boundary audit — how a distributed sort picks
    * split points: 7 boundary values from a 2% md5-deterministic
    * sample's nearest-rank octiles (the replayable stand-in for
    * RangePartitioner's reservoir), then the FULL table is bucketed
    * against the broadcast boundaries and each bucket's skew vs the
    * ideal n/8 ships in signed ppm. Large skews mean the sample
    * under-resolved the distribution — the audit behind every
    * repartitionByRange sizing decision. */
  private def qRangeBoundaries(s: SparkSession, dir: String): DataFrame = {
    val vals = t(s, dir, "orders")
      .select(Analytics.cents(col("o_totalprice")).as("v"),
        col("o_orderkey").as("ok"))
      .localCheckpoint(eager = false)
    val sample = vals.filter(
      conv(substring(md5(concat(lit("bounds|"), col("ok").cast("string"))
        .cast("binary")), 1, 8), 16, 10).cast("long") % 100 < 2)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      sample.select(lit("all").as("g"), col("v").cast("double").as("ord"),
        col("ok")),
      "g", "ord", "ok", 32)
    val boundCols = (1 to 7).map(i =>
      max(when(col("rnk") === expr(s"greatest(grp_n * $i div 8, 1)"),
        col("ord").cast("long"))).as(s"b$i"))
    val bounds = ranked
      .filter((1 to 7).map(i =>
        col("rnk") === expr(s"greatest(grp_n * $i div 8, 1)")).reduce(_ || _))
      .groupBy()
      .agg(boundCols.head, boundCols.tail: _*)
    val bucketed = vals.crossJoin(broadcast(bounds))
      .select((lit(1L) + (1 to 7).map(i =>
        when(col("v") > col(s"b$i"), 1L).otherwise(0L)).reduce(_ + _))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    val total = vals.agg(count(lit(1)).as("n_total"))
    bucketed.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_rows"),
        expr("(n_rows - n_total div 8) * 1000000 div (n_total div 8)")
          .as("skew_ppm"))
      .orderBy(col("bucket"))
  }

  /** Neyman optimal allocation for stratified sampling: sample-size
    * shares ∝ N_h·S_h (stratum size × std) beat proportional
    * allocation whenever strata variances differ — the survey-
    * statistics answer to "how many rows should each stratum
    * contribute to a 10k eval set". Per-stratum std is one sqrt over
    * exact integer moments; the weights are rounded to integer milli
    * BEFORE the cross-stratum sum, so shares and allocations are
    * pure integer arithmetic. */
  private def qNeymanAlloc(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 100")
          .as("v"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_h"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("ss"))
      .withColumn("s_milli",
        floor(sqrt((col("n_h").cast("double") * col("ss").cast("double") -
          col("sv").cast("double") * col("sv").cast("double")) /
          (col("n_h").cast("double") *
            (col("n_h").cast("double") - lit(1.0)))) * 1000 + 0.5)
          .cast("long"))
      .withColumn("w_milli", col("n_h") * col("s_milli"))
      .localCheckpoint(eager = false)
    val tot = g.agg(sum(col("w_milli")).as("sw"))
    g.crossJoin(broadcast(tot))
      .select(col("prio"), col("n_h"), col("s_milli"),
        expr("w_milli * 1000000 div sw").as("share_ppm"),
        expr("10000 * w_milli div sw").as("alloc"))
      .orderBy(col("prio"))
  }

  /** Empirical false-positive audit of the bloom-prune filter
    * (ops/BloomPrune): build over BUILDING-segment customers
    * (m = 64 Ki bits, k = 3), probe every ordering customer, and
    * assert BOTH bloom guarantees — zero false negatives (every true
    * member passes, by construction) and an observed FP count within
    * 2× the (1−e^(−kn/m))^k theory bound (+10 absolute slack for
    * small-count variance). The bit positions are xxhash64 (not
    * replayable in the oracle), so the QUERY ships the property
    * booleans next to the exact set sizes — q_approx_distinct's
    * bounded-error-gate pattern. */
  private def qBloomFpp(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k")).distinct()
      .localCheckpoint(eager = false)
    val probes = t(s, dir, "orders")
      .select(col("o_custkey").as("k")).distinct()
      .localCheckpoint(eager = false)
    val bloom = graft.ops.BloomPrune.buildWords(dim, "k",
      numBits = 65536, numHashes = 3)
    val marked = probes
      .withColumn("passes",
        graft.ops.BloomPrune.mightContain(bloom, col("k")))
      .join(dim.withColumn("member", lit(true)), Seq("k"), "left")
      .withColumn("member", coalesce(col("member"), lit(false)))
    val agg0 = marked.agg(
      count(lit(1)).as("n_probe"),
      sum(when(col("member"), 1L).otherwise(0L)).as("true_members"),
      sum(when(col("member") && col("passes"), 1L).otherwise(0L))
        .as("members_passed"),
      sum(when(!col("member") && col("passes"), 1L).otherwise(0L))
        .as("false_positives"))
    val nBuild = dim.agg(count(lit(1)).as("n_build"))
    agg0.crossJoin(broadcast(nBuild))
      .select(col("n_build"), col("n_probe"), col("true_members"),
        (col("members_passed") === col("true_members"))
          .as("no_false_negatives"),
        (col("false_positives").cast("double") <=
          lit(2.0) * pow(lit(1.0) - exp(lit(-3.0) *
            col("n_build").cast("double") / lit(65536.0)), 3) *
            (col("n_probe") - col("true_members")).cast("double") +
            lit(10.0)).as("fpp_within_bound"))
  }

  /** SAX (Symbolic Aggregate approXimation) of the daily revenue
    * series: 8-day PAA segments z-normalized against the whole series
    * and mapped to a 4-symbol alphabet at the Gaussian breakpoints
    * ±0.6745 — the classic time-series indexing transform (Lin/Keogh).
    * Segment means stay exact integers ×8 (no division), the z
    * comparison is an integer cross-multiply against σ once σ is a
    * single sqrt, and the breakpoints are micro literals — so the
    * symbol assignment is decided by exact integer comparisons. */
  private def qSax(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
    val ranked = daily
      .withColumn("rnk", row_number().over(Window.orderBy(col("day")))
        .cast("long"))
    val glob = ranked.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
      sum(col("v") * col("v")).as("svv"))
    val seg = ranked
      .select(expr("(rnk - 1) div 8").as("seg"), col("v"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("ns"), sum(col("v")).as("sb"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .filter(col("ns") === 8)
    // z = (mean_seg − mean)/σ vs breakpoints ±0.6745: cross-multiplied
    // so the decision is (8·sb − 8·n·mean) vs bp·8·n·σ — one sqrt, one
    // multiply, exact integers elsewhere
    val nD = col("n").cast("double")
    val sigma = sqrt((nD * col("svv").cast("double") -
      col("sv").cast("double") * col("sv").cast("double")) / (nD * nD))
    val lhs = (col("sb") * col("n") - col("sv") * lit(8L)).cast("double")
    val rhs = sigma * nD * lit(8.0)
    seg.crossJoin(broadcast(glob))
      .select(col("seg"), col("sb"), col("lo"), col("hi"),
        when(lhs < rhs * lit(-0.6745), lit("a"))
          .when(lhs < lit(0.0), lit("b"))
          .when(lhs < rhs * lit(0.6745), lit("c"))
          .otherwise(lit("d")).as("symbol"))
      .orderBy(col("seg"))
  }

  /** Reciprocal-rank fusion of two retrieval lists (brute-force cosine
    * vs IVF ranking): RRF(d) = Σ 1/(60+rank) with the ten possible
    * rank discounts embedded as integer micro literals — rank fusion
    * is THE standard way RAG stacks merge lexical and vector hits, and
    * with literal discounts the fused score is an exact integer sum.
    * Reuses q_ndcg's shared IVF assignment and bounded-heap top-10s;
    * fused top-5 per query via rank selection over ≤20 candidates. */
  private def qRankFusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rrfCase =
      """CASE rn WHEN 1 THEN 16393 WHEN 2 THEN 16129 WHEN 3 THEN 15873
        | WHEN 4 THEN 15625 WHEN 5 THEN 15385 WHEN 6 THEN 15152
        | WHEN 7 THEN 14925 WHEN 8 THEN 14706 WHEN 9 THEN 14493
        | ELSE 14286 END""".stripMargin
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents,
      "cid", "cv").localCheckpoint(eager = false)
    val queries = emb.filter(col("vec_id").isin(0, 7, 42, 99, 123))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(assign.select(col("vec_id").as("qid"), col("cid").as("qcid")),
        "qid")
    def keyed(scored: DataFrame): DataFrame = scored.select(col("qid"),
      col("vec_id"),
      lpad(greatest(lit(0L),
          floor((lit(1.0) - col("cosine")) * 1e9 + 0.5).cast("long"))
        .cast("string"), 12, "0").as("distkey"))
    val bf10 = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .crossJoin(broadcast(queries.select(col("qid"), col("qv"))))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 10)
      .select(col("qid").cast("long").as("qid"), col("vec_id"),
        expr(rrfCase).cast("long").as("rrf_micro"))
    val ivf10 = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .join(assign, "vec_id")
        .join(broadcast(queries), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 10)
      .select(col("qid").cast("long").as("qid"), col("vec_id"),
        expr(rrfCase).cast("long").as("rrf_micro"))
    val fused = bf10.unionAll(ivf10)
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("rrf_micro")).as("rrf_micro"),
        count(lit(1)).as("n_lists"))
    // ≤20 candidates per query: the window is bounded, not a funnel
    fused
      .withColumn("frank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("rrf_micro").desc, col("vec_id"))).cast("long"))
      .filter(col("frank") <= 5)
      .select(col("qid"), col("frank"), col("vec_id"), col("n_lists"),
        col("rrf_micro"))
      .orderBy(col("qid"), col("frank"))
  }

  /** Neighbor-set Jaccard link scores over the co-purchase graph —
    * the normalized companion to q_link_pred's resource-allocation
    * index: |N(x)∩N(y)| from the same hub-capped wedge join,
    * |N(x)∪N(y)| = d(x)+d(y)−common, similarity exact ppm. Candidate
    * pairs only ever materialize through shared neighbors (never
    * all-pairs), and the hub cap bounds any node's wedge fan-out. */
  private def qGraphJaccard(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem").filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val und = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    val edges = und.union(und.select(col("v").as("u"), col("u").as("v")))
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .localCheckpoint(eager = false)
    val mid = edges.join(deg.filter(col("d") <= 64), "u")
    val common = mid.as("e1").join(mid.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .groupBy(col("e1.v").as("x"), col("e2.v").as("y"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(deg.select(col("u").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("u").as("y"), col("d").as("dy")), "y")
      .select(col("x"), col("y"), col("n_common"),
        expr("n_common * 1000000 div (dx + dy - n_common)")
          .as("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("x"), col("y")).limit(30)
      .select(col("x"), col("y"), col("n_common"), col("jaccard_ppm"))
      .orderBy(col("x"), col("y"))
  }

  /** ABC inventory classification (the 80/95 Pareto cut applied as a
    * labeling operator): parts ranked by revenue through the SAME
    * order-preserving key encoding + two-pass prefix sum as q_pareto
    * (no global window funnel), then A = first 80% of cumulative
    * revenue, B = next 15%, C = tail — per-class part counts and
    * exact revenue shares. The planner's view of q_pareto's
    * concentration number. */
  private def qAbcAnalysis(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("cents"))
      .select(when(col("cents") < (1L << 36) && col("l_partkey") < (1L << 26),
          (lit(1L << 36) - col("cents")) * lit(1L << 26) + col("l_partkey"))
        .otherwise(raise_error(lit(
          "q_abc key encoding overflow: cents >= 2^36 or partkey >= 2^26")))
        .as("k"), col("cents"))
    val run = graft.ops.ScalablePrefix.runningSum(s, parts, "k", "cents", 32)
    val tot = run.agg(sum(col("cents")).as("t"))
    run.crossJoin(broadcast(tot))
      .select(col("cents"),
        when(col("run_sum") * 5 <= col("t") * 4, "A")
          .when(col("run_sum") * 20 <= col("t") * 19, "B")
          .otherwise("C").as("abc"))
      .groupBy(col("abc"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"))
      .crossJoin(broadcast(tot))
      .select(col("abc"), col("n_parts"),
        expr("cents * 1000000 div t").as("revenue_share_ppm"))
      .orderBy(col("abc"))
  }

  /** Top user-journey paths: every 3-step event-type sequence per
    * user (two lags over one scalable user-keyed window), counted
    * corpus-wide — the product-analytics "what do people actually do"
    * table. 5³ = 125 possible paths bound the output; the top-15 ride
    * TakeOrdered. */
  private def qSessionPath(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), col("event_id"),
      col("event_type"), expr("ts div 1000").as("tus"))
    val w = "PARTITION BY user_id ORDER BY tus, event_id"
    e.withColumn("t1", expr(s"lag(event_type, 2) OVER ($w)"))
      .withColumn("t2", expr(s"lag(event_type, 1) OVER ($w)"))
      .filter(col("t1").isNotNull)
      .select(concat_ws(">", col("t1"), col("t2"), col("event_type"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(15)
  }

  /** Churn-label construction audit — the LABEL side of an ML
    * pipeline, where leakage usually sneaks in: at three annual
    * cutoffs, a customer is churned iff they have pre-cutoff activity
    * and NO orders in the following 365 days (the lookahead window is
    * explicit, so the feature/label boundary is auditable). One
    * customer-keyed pass per cutoff from one shared aggregate —
    * at-risk counts, churn counts, churn ppm per cohort. */
  private def qChurnLabel(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(epochDay(col("o_orderdate"))).as("first_d"),
        max(epochDay(col("o_orderdate"))).as("last_d"))
      .localCheckpoint(eager = false)
    val cutoffs = s.range(0, 3).select(
      (epochDayLit("1997-01-01") + col("id") * 365L).as("cut_d"),
      (col("id") + 1997L).as("cohort"))
    per.crossJoin(broadcast(cutoffs))
      .filter(col("first_d") < col("cut_d"))
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("at_risk"),
        sum(when(col("last_d") < col("cut_d"), 1L).otherwise(0L))
          .as("churned_strict"),
        sum(when(col("last_d") < col("cut_d") + 365L, 1L).otherwise(0L))
          .as("churned_365"))
      .withColumn("churn_ppm", expr("churned_365 * 1000000 div at_risk"))
      .orderBy(col("cohort"))
  }

  /** Standardized residuals for q_chi_square's priority × segment
    * grid — WHICH cells drive the dependence, not just whether it
    * exists: r = (o − e)/√e with e the exact rational expected count
    * (row·col/N), every residual one fixed tree over exact integers.
    * |r| > 3 flags the outlier cells a reviewer should read first. */
  private def qCrosstabResiduals(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderpriority").as("prio"),
        col("c_mktsegment").as("seg"))
      .localCheckpoint(eager = false)
    val cells = base.groupBy(col("prio"), col("seg"))
      .agg(count(lit(1)).as("o"))
    val rows_ = base.groupBy(col("prio")).agg(count(lit(1)).as("rn"))
    val cols_ = base.groupBy(col("seg")).agg(count(lit(1)).as("cn"))
    val n = base.agg(count(lit(1)).as("nn"))
    cells.join(broadcast(rows_), "prio").join(broadcast(cols_), "seg")
      .crossJoin(broadcast(n))
      .select(col("prio"), col("seg"), col("o"),
        ((col("o").cast("double") -
          (col("rn") * col("cn")).cast("double") / col("nn").cast("double")) /
          sqrt((col("rn") * col("cn")).cast("double") /
            col("nn").cast("double"))).as("std_residual"))
      .withColumn("outlier", abs(col("std_residual")) > 3.0)
      .orderBy(col("prio"), col("seg"))
  }

  private def epochDayLit(d: String): org.apache.spark.sql.Column =
    datediff(lit(d).cast("date"), lit("1970-01-01").cast("date")).cast("long")

  /** Historical VaR / CVaR of day-over-day revenue changes: the p5
    * nearest-rank loss (VaR) and the exact mean of the tail at or
    * beyond it (CVaR) over the bounded day domain — deltas via the
    * gap-safe day self-join (q_mase's discipline), rank selection on
    * a calendar-sized window, tail mean one integer division. The
    * risk-reporting shape finance teams run on any daily P&L-like
    * series. */
  private def qVarCvar(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
      .localCheckpoint(eager = false)
    val deltas = daily.as("a").join(daily.as("b"),
        col("a.day") + 1 === col("b.day"))
      .select((col("b.v") - col("a.v")).as("delta"),
        col("b.day").as("day"))
    // day-domain window: calendar-bounded rank, not a data funnel
    val ranked = deltas
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("delta"), col("day"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
    ranked
      .withColumn("var_rank", expr("greatest((n * 5 + 99) div 100, 1)"))
      .groupBy()
      .agg(max(col("n")).as("n_days"),
        max(when(col("rnk") === col("var_rank"), col("delta")))
          .as("var95_kd"),
        sum(when(col("rnk") <= col("var_rank"), col("delta"))).as("tail_sum"),
        sum(when(col("rnk") <= col("var_rank"), 1L).otherwise(0L))
          .as("tail_n"))
      .select(col("n_days"), col("var95_kd"),
        expr("tail_sum div tail_n").as("cvar95_kd"))
  }

  /** V-optimal 4-bucket histogram of the monthly revenue series by
    * EXHAUSTIVE RELATIONAL ENUMERATION — the dynamic program
    * re-expressed as a join: every boundary triple (b1 < b2 < b3)
    * over the ~84-month domain is a candidate (≈ 90k rows — domain-
    * bounded, data-independent), each segment's SSE comes from the
    * O(1) prefix-sum identity, and the argmin is a TakeOrdered(1).
    * The same enumerate-domain-then-argmin move as q_breakpoint,
    * scaled to three changepoints; SSE stays exact int64 at the
    * month × thousand-dollar grain. */
  private def qVoptimalHist(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = t(s, dir, "orders")
      .groupBy(expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
        .as("mo"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
    // month-domain prefix sums (calendar-bounded window)
    val pre = monthly
      .withColumn("i", row_number().over(Window.orderBy(col("mo")))
        .cast("long"))
      .withColumn("cs", sum(col("v")).over(Window.orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("css", sum(col("v") * col("v")).over(Window.orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("i"), col("cs"), col("css"))
      .localCheckpoint(eager = false)
    val n = pre.agg(max(col("i")).as("n"))
    val idx = pre.select(col("i"))
    val triples = idx.as("x").crossJoin(idx.as("y")).crossJoin(idx.as("z"))
      .select(col("x.i").as("b1"), col("y.i").as("b2"), col("z.i").as("b3"))
      .filter(col("b1") < col("b2") && col("b2") < col("b3"))
      .crossJoin(broadcast(n)).filter(col("b3") < col("n"))
    def seg(fromPre: String, toPre: String): org.apache.spark.sql.Column =
      // m·SSE identity: len·Σv² − (Σv)² over [from+1, to], scaled by len
      // to stay integer: SSE·len² form is monotone-comparable only at
      // equal len, so use the exact rational via two-step div like
      // q_laspeyres: (len·Σv² − (Σv)²) div len
      expr(s"((${toPre}_css - ${fromPre}_css) * (${toPre}_i - ${fromPre}_i)" +
        s" - (${toPre}_cs - ${fromPre}_cs) * (${toPre}_cs - ${fromPre}_cs))" +
        s" div (${toPre}_i - ${fromPre}_i)")
    val zero = s.range(1).select(lit(0L).as("z_i"), lit(0L).as("z_cs"),
      lit(0L).as("z_css"))
    val joined = triples
      .join(pre.select(col("i").as("p1_i"), col("cs").as("p1_cs"),
        col("css").as("p1_css")), col("b1") === col("p1_i"))
      .join(pre.select(col("i").as("p2_i"), col("cs").as("p2_cs"),
        col("css").as("p2_css")), col("b2") === col("p2_i"))
      .join(pre.select(col("i").as("p3_i"), col("cs").as("p3_cs"),
        col("css").as("p3_css")), col("b3") === col("p3_i"))
      .join(pre.select(col("i").as("p4_i"), col("cs").as("p4_cs"),
        col("css").as("p4_css")).crossJoin(broadcast(n))
        .filter(col("p4_i") === col("n")).drop("n"),
        lit(true))
      .crossJoin(broadcast(zero))
    val sse = joined.select(col("b1"), col("b2"), col("b3"),
      (seg("z", "p1") + seg("p1", "p2") + seg("p2", "p3") + seg("p3", "p4"))
        .as("sse_scaled"))
    sse.orderBy(col("sse_scaled"), col("b1"), col("b2"), col("b3")).limit(1)
  }

  /** Marginal-novelty (coverage) curve: for each corpus tenth (by
    * doc_id), the share of its documents whose exact content digest
    * was already seen earlier — "is the next batch of data still
    * adding new documents, or just duplicate mass?" Each digest's
    * FIRST doc is one min-reduce (q_heaps' trick at the document
    * level); a doc is novel iff it IS its digest's first occurrence. */
  private def qCoverageCurve(s: SparkSession, dir: String): DataFrame = {
    val total = t(s, dir, "documents").agg(count(lit(1)).as("d_total"))
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .localCheckpoint(eager = false)
    val firsts = docs.groupBy(col("fp")).agg(min(col("doc_id")).as("first_doc"))
    docs.join(firsts, "fp")
      .crossJoin(broadcast(total))
      .select(expr("((doc_id + 1) * 10 + d_total - 1) div d_total")
        .as("decile"),
        when(col("doc_id") === col("first_doc"), 1L).otherwise(0L)
          .as("novel"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("docs"), sum(col("novel")).as("novel_docs"))
      .withColumn("dup_ppm",
        expr("(docs - novel_docs) * 1000000 div docs"))
      .orderBy(col("decile"))
  }

  /** Linear (even-credit) multi-touch attribution — the third member
    * of the attribution trio (q_attribution last-touch, q_first_touch
    * first-touch): every click strictly before a purchase shares the
    * purchase's value equally. Credit per click = value·1e6 div
    * n_clicks in exact micro (truncating; the dropped remainder is
    * < n_clicks micro per purchase, stated in the contract). The
    * purchase×click pairing is a user-keyed range join — bounded by
    * per-user activity, never a cross product. */
  private def qMultiTouch(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts"),
        Analytics.fp(col("value"), 1000L).as("v_milli"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"),
        (get_json_object(col("props"), "$.k").cast("long") % 4).as("channel"))
    val paired = purchases.join(clicks, Seq("user_id"))
      .filter(col("c_ts") < col("ts"))
    val counted = paired.groupBy(col("pid"), col("v_milli"))
      .agg(count(lit(1)).as("n_clicks"))
    paired.join(counted.select(col("pid"), col("n_clicks")), "pid")
      .select(col("channel"),
        expr("v_milli * 1000 div n_clicks").as("credit_micro"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_micro")).as("credit_micro"))
      .orderBy(col("channel"))
  }

  /** Exact Shapley-value channel attribution over 3 channels: each
    * user's clicked-channel SET (2³ coalitions) and conversion flag
    * collapse to 8 exact rates; the Shapley weights for 3 players are
    * the rationals {2,1,1,2}/6, so each channel's value is PURE
    * INTEGER arithmetic over the pivoted coalition rates — the
    * game-theoretic attribution usually quoted as "needs simulation",
    * done in closed form because the player count is fixed. Users
    * with no clicks anchor the empty coalition. */
  private def qShapleyAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val per = ev.groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "click" &&
          expr("CAST(get_json_object(props, '$.k') AS LONG) % 3") === 0L,
          1L).otherwise(0L)).as("c0"),
        max(when(col("event_type") === "click" &&
          expr("CAST(get_json_object(props, '$.k') AS LONG) % 3") === 1L,
          1L).otherwise(0L)).as("c1"),
        max(when(col("event_type") === "click" &&
          expr("CAST(get_json_object(props, '$.k') AS LONG) % 3") === 2L,
          1L).otherwise(0L)).as("c2"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
    val coal = per.groupBy(col("c0"), col("c1"), col("c2"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
      .select(col("c0"), col("c1"), col("c2"),
        expr("CASE WHEN n > 0 THEN x * 1000000 div n ELSE 0 END").as("v"))
    val subsets = for { a <- 0 to 1; b <- 0 to 1; c <- 0 to 1 } yield (a, b, c)
    val vCols = subsets.map { case (a, b, c) =>
      max(when(col("c0") === a && col("c1") === b && col("c2") === c,
        col("v"))).as(s"v$a$b$c")
    }
    val wide = coal.groupBy().agg(vCols.head, vCols.tail: _*)
      .na.fill(0L)
    wide.select(
      expr("(2 * (v100 - v000) + (v110 - v010) + (v101 - v001) + " +
        "2 * (v111 - v011)) div 6").as("shapley0_micro"),
      expr("(2 * (v010 - v000) + (v110 - v100) + (v011 - v001) + " +
        "2 * (v111 - v101)) div 6").as("shapley1_micro"),
      expr("(2 * (v001 - v000) + (v101 - v100) + (v011 - v010) + " +
        "2 * (v111 - v110)) div 6").as("shapley2_micro"))
  }

  /** Per-segment uplift readout: treatment/control conversion (the
    * q_ab_test experiment) split by market segment, uplift in signed
    * exact ppm per segment — heterogeneous-treatment-effect reporting,
    * the step between "the experiment moved the average" and "for
    * whom". One customer-keyed pass, exact counts throughout. */
  private def qUpliftBySegment(s: SparkSession, dir: String): DataFrame = {
    val users = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        (col("o_custkey") % 2).as("arm"), col("o_custkey"))
      .agg(max(when(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
          col("o_orderdate") < lit("1996-01-01").cast("date"), 1L)
        .otherwise(0L)).as("conv"))
    users.groupBy(col("segment"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x1"))
      .select(col("segment"), col("n0"), col("n1"),
        expr("x0 * 1000000 div n0").as("control_ppm"),
        expr("x1 * 1000000 div n1").as("treat_ppm"),
        expr("x1 * 1000000 div n1 - x0 * 1000000 div n0")
          .as("uplift_ppm"))
      .orderBy(col("segment"))
  }

  /** Seasonal-residual anomaly detection: q_stl_lite's decomposition
    * at thousand-dollar grain (residual SQUARES must stay in int64 —
    * the cent-grain squares overflow, caught by the oracle gate),
    * screened at 3σ (moments over the bounded day domain,
    * one sqrt) — the upgrade over q_anomaly's raw 3σ that stops the
    * weekly cycle itself from flagging as anomalous. Emits only the
    * flagged days with their z-scores as fixed IEEE trees. */
  private def qAnomalyStl(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("c"))
    val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val tr = daily
      .withColumn("tsum", sum(col("c")).over(w))
      .withColumn("tn", count(lit(1)).over(w))
      .withColumn("det", col("c") - expr("tsum div tn"))
      .withColumn("wd", pmod(col("day") + 4, lit(7)))
    val seas = tr.groupBy(col("wd"))
      .agg(sum(col("det")).as("ssum"), count(lit(1)).as("sn"))
      .select(col("wd"), expr("ssum div sn").as("seasonal_c"))
    val resid = tr.join(broadcast(seas), "wd")
      .select(col("day"), col("c"),
        (col("det") - col("seasonal_c")).as("r"))
      .localCheckpoint(eager = false)
    val mom = resid.agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
      sum(col("r") * col("r")).as("srr"))
    val nD = col("n").cast("double")
    val sigma = sqrt((nD * col("srr").cast("double") -
      col("sr").cast("double") * col("sr").cast("double")) / (nD * nD))
    val mean = col("sr").cast("double") / nD
    resid.crossJoin(broadcast(mom))
      .withColumn("z", (col("r").cast("double") - mean) / sigma)
      .filter(abs(col("z")) > 3.0)
      .select(col("day"), col("c").as("rev_c"), col("r").as("residual_c"),
        col("z"))
      .orderBy(col("day"))
  }

  /** Weekday revenue bands (P10/P50/P90 of daily revenue per
    * day-of-week): the seasonal-profile chart behind staffing and
    * alert thresholds. Daily values collapse to the day domain first;
    * each weekday's nearest-rank quantiles ride a 7-group bounded
    * rank — never a data-sized window. */
  private def qQuantileBands(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
      .withColumn("wd", pmod(col("day") + 4, lit(7)))
    // 7 weekday groups over the bounded day domain
    val ranked = daily
      .withColumn("rnk", row_number().over(Window.partitionBy(col("wd"))
        .orderBy(col("v"), col("day"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("wd"))))
    def rk(p: Int) = expr(s"greatest((n * $p + 99) div 100, 1)")
    ranked
      .filter(Seq(10, 50, 90).map(p => col("rnk") === rk(p)).reduce(_ || _))
      .groupBy(col("wd"))
      .agg(max(col("n")).as("n_days"),
        max(when(col("rnk") === rk(10), col("v"))).as("p10_kd"),
        max(when(col("rnk") === rk(50), col("v"))).as("p50_kd"),
        max(when(col("rnk") === rk(90), col("v"))).as("p90_kd"))
      .orderBy(col("wd"))
  }

  /** Same-part price-dispersion audit: coefficient of variation of
    * the per-unit price across a part's line items, exact ppm from
    * integer moments (unit price at the cents-per-unit grain via the
    * two-step truncating division the index queries share). High CV
    * = inconsistent pricing / data-entry faults; top-20 by CV ride
    * TakeOrdered. Only parts with ≥ 5 observations report. */
  private def qPriceDispersion(s: SparkSession, dir: String): DataFrame = {
    val unit = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) div " +
          "CAST(l_quantity AS BIGINT)").as("u"))
    unit.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), sum(col("u")).as("su"),
        sum(col("u") * col("u")).as("suu"))
      .filter(col("n") >= 5)
      .select(col("l_partkey"), col("n"),
        expr("su div n").as("mean_unit_c"),
        floor(sqrt((col("n").cast("double") * col("suu").cast("double") -
            col("su").cast("double") * col("su").cast("double")) /
            (col("n").cast("double") * (col("n").cast("double") - lit(1.0))))
          / (col("su").cast("double") / col("n").cast("double"))
          * 1000000 + 0.5).cast("long").as("cv_ppm"))
      .orderBy(col("cv_ppm").desc, col("l_partkey")).limit(20)
      .select(col("l_partkey"), col("n"), col("mean_unit_c"), col("cv_ppm"))
      .orderBy(col("l_partkey"))
  }

  /** Price-volume-mix bridge (the accountant's ΔRevenue
    * decomposition, per-part exact): for each consecutive year pair,
    * ΔR = Σ(p₁−p₀)·q₁ (price effect) + Σ(q₁−q₀)·p₀ (volume effect)
    * + truncation residual, with unit prices at the cents grain via
    * truncating division — so the bridge is exactly additive BY
    * CONSTRUCTION against the reported revenue delta, and the
    * residual column proves it. Only parts present in both years
    * bridge; entry/exit revenue is reported separately. */
  private def qPvmBridge(s: SparkSession, dir: String): DataFrame = {
    val py = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"), year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .withColumn("p", expr("cents div qty"))
      .localCheckpoint(eager = false)
    val pairs = py.as("a").join(py.as("b"),
        col("a.l_partkey") === col("b.l_partkey") &&
          col("a.yr") + 1 === col("b.yr"))
      .select(col("b.yr").as("yr"),
        ((col("b.p") - col("a.p")) * col("b.qty")).as("price_eff"),
        ((col("b.qty") - col("a.qty")) * col("a.p")).as("volume_eff"),
        (col("b.cents") - col("a.cents")).as("delta"))
    pairs.groupBy(col("yr"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("price_eff")).as("price_effect_c"),
        sum(col("volume_eff")).as("volume_effect_c"),
        sum(col("delta")).as("delta_c"))
      .withColumn("residual_c",
        expr("delta_c - price_effect_c - volume_effect_c"))
      .orderBy(col("yr"))
  }

  /** Entropy rate of the user-event Markov chain: H = −Σᵢⱼ πᵢ pᵢⱼ
    * ln pᵢⱼ with the empirical state distribution as π — how
    * predictable the NEXT event is given the current one (the
    * sequence-complexity number beside q_markov2's matrix). The 25
    * transition cells are domain-bounded; each cell's term is rounded
    * to micro-nats BEFORE the sum (q_entropy's contract), weighted by
    * exact from-state counts, and the final division is one div. */
  private def qEntropyRate(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), col("event_id"),
      col("event_type"), expr("ts div 1000").as("tus"))
    val trans = e
      .withColumn("nxt",
        expr("lead(event_type) OVER (PARTITION BY user_id " +
          "ORDER BY tus, event_id)"))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type"), col("nxt"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val fromTot = trans.groupBy(col("event_type"))
      .agg(sum(col("c")).as("ct"))
    val tot = trans.agg(sum(col("c")).as("n_all"))
    val cell = trans.join(broadcast(fromTot), "event_type")
      .select(col("c"), col("ct"),
        floor((col("c").cast("double") / col("ct").cast("double")) *
          log(col("c").cast("double") / col("ct").cast("double")) *
          lit(-1000000.0) + 0.5).cast("long").as("term_unat"))
    cell.select((col("ct") * col("term_unat")).as("wterm"))
      .agg(sum(col("wterm")).as("swt"))
      .crossJoin(broadcast(tot))
      .select(col("n_all"),
        expr("swt div n_all").as("entropy_rate_unat"))
  }

  /** Packing-efficiency audit for the q_pack_windows layout: per
    * source, how much of the 2048-token context budget the packed
    * windows actually fill (fill ppm), plus boundary-crossing doc
    * counts — the "are we wasting context" number a pretraining
    * pipeline tracks per mixture component. Pure arithmetic over the
    * same token estimates; the per-source window count is the exact
    * ceiling of its token mass. */
  private def qPackEfficiency(s: SparkSession, dir: String): DataFrame = {
    val windowTokens = 2048L
    val base = TextOps.withTokenEstimate(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("source"), col("est_tokens"))
    base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("est_tokens")).as("tokens"))
      .select(col("source"), col("n_docs"), col("tokens"),
        expr(s"(tokens + $windowTokens - 1) div $windowTokens")
          .as("windows"),
        expr(s"tokens * 1000000 div " +
          s"(((tokens + $windowTokens - 1) div $windowTokens) * $windowTokens)")
          .as("fill_ppm"))
      .orderBy(col("source"))
  }

  /** Hard-negative mining for contrastive training: for each anchor
    * in a deterministic subset, the top-3 same-label neighbors in the
    * "hard band" — similar enough to confuse (cosine ≥ 0.10) but not
    * near-duplicates (cosine ≤ 0.25, q_embed_near_dup's cut) — via
    * the label-blocked pair join (never all-pairs) and a bounded
    * per-anchor heap. Near-dups make FALSE negatives (they're really
    * positives), easy ones teach nothing; the band is where the
    * training signal lives. */
  private def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val n = emb.select(col("vec_id"), col("label"), col("embedding"),
      graft.functions.kernels.fixed_point_dot(col("embedding"),
        col("embedding")).as("nrm"))
      .localCheckpoint(eager = false)
    val anchors = n.filter(col("vec_id") % 7 === 0)
    val pairs = anchors.as("a").join(n.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("anchor"), col("b.vec_id").as("neg"),
        (Similarity.dotFp(col("a.embedding"), col("b.embedding"))
          .cast("double") / 1e9 /
          (sqrt(col("a.nrm").cast("double") / 1e9) *
            sqrt(col("b.nrm").cast("double") / 1e9))).as("cosine"))
      .withColumn("cos_micro",
        floor(col("cosine") * 1000000 + 0.5).cast("long"))
      .filter(col("cos_micro") >= 100000L && col("cos_micro") <= 250000L)
    // per-anchor candidates are label-block bounded; rank top-3
    pairs
      .withColumn("rn", row_number().over(Window.partitionBy(col("anchor"))
        .orderBy(col("cos_micro").desc, col("neg"))).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("anchor"), col("rn"), col("neg"), col("cos_micro"))
      .orderBy(col("anchor"), col("rn"))
  }

  /** Variance share of the PCA top direction — the one-number answer
    * to "is this embedding space effectively one-dimensional":
    * λ₁/trace in exact-integer-fed ppm, with λ₁ the Rayleigh quotient
    * of q_power_iteration's 2-round fixed-point direction (replayed
    * identically here and in the oracle's CTE chain) and the trace a
    * plain integer sum of squared milli components. num, wn, trace
    * are exact int64; the final share is one fixed IEEE tree over
    * them. Model (the 64 weights) moves by broadcast; the corpus
    * never shuffles. */
  private def qPcaVarShare(s: SparkSession, dir: String): DataFrame = {
    val x = t(s, dir, "embeddings")
      .select(col("vec_id").as("i"), posexplode(col("embedding")))
      .select(col("i"), (col("pos") + 1).cast("long").as("j"),
        expr("CAST(floor(CAST(col AS DOUBLE) * 1000 + 0.5) AS BIGINT)")
          .as("xf"))
      .localCheckpoint(eager = false)
    def iterate(v: Array[Long]): Array[Long] = {
      val varr = array(v.map(lit): _*)
      val sI = x.withColumn("v", element_at(varr, col("j").cast("int")))
        .groupBy(col("i")).agg(sum(col("xf") * col("v")).as("s"))
      val w = x.join(sI, "i").groupBy(col("j"))
        .agg(sum(col("xf") * col("s")).as("w"))
        .orderBy(col("j")).collect().map(_.getLong(1))
      val d = w.map(math.abs).max / 1000 + 1
      w.map(_ / d)
    }
    val v2 = iterate(iterate(Array.fill(64)(1L)))
    val wnVal = v2.map(v => v * v).sum
    val varr = array(v2.map(lit): _*)
    val num = x.withColumn("v", element_at(varr, col("j").cast("int")))
      .groupBy(col("i")).agg(sum(col("xf") * col("v")).as("dd"))
      .select(expr("(dd div 1000) * (dd div 1000)").as("d2"))
      .agg(sum(col("d2")).as("num"))
    val trace = x.agg(sum(col("xf") * col("xf")).as("trace_m2"))
    num.crossJoin(broadcast(trace))
      .select(col("num"), lit(wnVal).as("wn"), col("trace_m2"),
        floor(((col("num").cast("double") / lit(wnVal.toDouble)) /
          (col("trace_m2").cast("double") / lit(1000000.0))) *
          lit(1000000.0) + 0.5).cast("long").as("var_share_ppm"))
  }

  /** Working-set cache-planning curve: if the k hottest parts were
    * pinned in cache, what share of lineitem accesses would hit?
    * Evaluated at k ∈ {10, 50, 100, 500} from ONE access-frequency
    * ranking (frequency rank via the bounded-domain frequency table,
    * cumulative hits per k by threshold count) — the static-optimal
    * (Belady-style upper bound) sizing curve a storage/cache layer is
    * planned against. Exact ppm. */
  private def qCachePlanning(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = t(s, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    // part-frequency table is catalog-sized; rank it once
    val ranked = freq
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("c").desc, col("l_partkey"))).cast("long"))
    val tot = freq.agg(sum(col("c")).as("n_access"))
    val sizes = s.range(0, 4).select(
      when(col("id") === 0, 10L).when(col("id") === 1, 50L)
        .when(col("id") === 2, 100L).otherwise(500L).as("cache_size"))
    ranked.crossJoin(broadcast(sizes))
      .filter(col("rnk") <= col("cache_size"))
      .groupBy(col("cache_size"))
      .agg(sum(col("c")).as("hits"))
      .crossJoin(broadcast(tot))
      .select(col("cache_size"), col("hits"),
        expr("hits * 1000000 div n_access").as("hit_ppm"))
      .orderBy(col("cache_size"))
  }

  /** F1-optimal threshold selection for the quality classifier: from
    * ONE scan, precision/recall/F1 at every logit-bin cutoff (21
    * bounded bins — the threshold candidates), and the argmax row
    * flagged via order-encoded integer max (F1 exact ppm, ties to the
    * higher threshold). The decision step that turns q_calibration/
    * q_ece diagnostics into a deployed filter setting. */
  private def qThresholdF1(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = t(s, dir, "documents")
      .select(
        (col("n_chars") >= 200).as("label"),
        (lit(40L) * size(split(col("text"), " ")).cast("long") +
          lit(-10L) * length(regexp_replace(col("text"), "[^0-9]", ""))
            .cast("long") +
          lit(-2L) * abs(col("n_chars") - 500) + lit(-1500L))
          .as("logit_milli"))
      .withColumn("bin",
        greatest(least(expr("logit_milli div 2000"), lit(10L)), lit(-10L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"))
    val tot = binned.agg(sum(col("n")).as("nn"), sum(col("pos")).as("npos"))
    // 21-bin domain: reverse-cumulative predicted-positive counts per
    // threshold via a bounded window
    val wDesc = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned
      .withColumn("pred_pos", sum(col("n")).over(wDesc))
      .withColumn("tp", sum(col("pos")).over(wDesc))
    val scored = cum.crossJoin(broadcast(tot))
      .select(col("bin").as("threshold_bin"), col("pred_pos"), col("tp"),
        expr("tp * 1000000 div pred_pos").as("precision_ppm"),
        expr("tp * 1000000 div npos").as("recall_ppm"),
        expr("2 * tp * 1000000 div (pred_pos + npos)").as("f1_ppm"))
      .localCheckpoint(eager = false)
    val best = scored.agg(
      max(col("f1_ppm") * 1000 + (col("threshold_bin") + 10)).as("enc"))
    scored.crossJoin(broadcast(best))
      .withColumn("is_best",
        col("f1_ppm") * 1000 + (col("threshold_bin") + 10) === col("enc"))
      .drop("enc")
      .orderBy(col("threshold_bin"))
  }

  /** Forecast-error metric suite for the weekly-seasonal naive
    * forecast (ŷ_d = y_{d−7}): WAPE, sMAPE, and signed bias — the
    * three numbers a forecast review actually reads (WAPE for
    * magnitude, sMAPE for scale-free comparison, bias for systematic
    * drift), complementing q_mase's model-vs-naive ratio. Day-domain
    * self-join, exact integer error sums; sMAPE's per-day ratio is
    * the one rounded-to-micro term (order-independent integer sum of
    * per-day micro ratios). */
  private def qForecastEval(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
      .localCheckpoint(eager = false)
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.day") + 7 === col("b.day"))
      .select(col("b.v").as("y"), col("a.v").as("f"))
    pairs
      .select(col("y"), col("f"), abs(col("y") - col("f")).as("ae"),
        expr("abs(y - f) * 2000000 div (y + f)").as("smape_term"))
      .groupBy()
      .agg(count(lit(1)).as("n_days"), sum(col("ae")).as("sae"),
        sum(col("y")).as("sy"), sum(col("y") - col("f")).as("bias_kd"),
        sum(col("smape_term")).as("ssm"))
      .select(col("n_days"),
        expr("sae * 1000000 div sy").as("wape_ppm"),
        expr("ssm div n_days").as("smape_ppm"),
        col("bias_kd"))
  }

  /** Customer-base bridge (the year-over-year "waterfall"): for each
    * consecutive year pair, retained / new / lost customer counts AND
    * the revenue attached to each flow — q_year_overlap gives the
    * similarity coefficients, this gives the business bridge that
    * explains the revenue delta. One customer×year aggregate,
    * self-joined on the customer across adjacent years (full outer so
    * both flows appear), exact cents. */
  private def qCustomerBridge(s: SparkSession, dir: String): DataFrame = {
    val cy = t(s, dir, "orders")
      .groupBy(col("o_custkey"), year(col("o_orderdate")).cast("long")
        .as("yr"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("cents"))
      .localCheckpoint(eager = false)
    // classify each (customer, year-pair) flow; the full-outer join
    // needs the pair key coalesced from whichever side is present
    val flows = cy.as("a").join(cy.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("a.yr") + 1 === col("b.yr"), "full_outer")
      .select(
        coalesce(col("b.yr"), col("a.yr") + 1).as("yr"),
        when(col("a.o_custkey").isNotNull && col("b.o_custkey").isNotNull,
          "retained")
          .when(col("a.o_custkey").isNotNull, "lost").otherwise("new")
          .as("flow"),
        coalesce(col("a.cents"), lit(0L)).as("prev_cents"),
        coalesce(col("b.cents"), lit(0L)).as("cur_cents"))
      .filter(col("yr") >= 1996 && col("yr") <= 2001)
    flows.groupBy(col("yr"), col("flow"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("prev_cents")).as("prev_cents"),
        sum(col("cur_cents")).as("cur_cents"))
      .orderBy(col("yr"), col("flow"))
  }

  /** Same-day multi-order screen (split-billing / double-entry
    * audit): customers placing more than one order on one calendar
    * day — the finance-ops control that catches both split invoices
    * and double-submits. One exact group-by on (customer, day);
    * flagged groups ship their order count, combined value, and the
    * two boundary order keys for investigation. */
  private def qDupOrders(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders")
      .groupBy(col("o_custkey"), epochDay(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Analytics.cents(col("o_totalprice"))).as("total_c"),
        min(col("o_orderkey")).as("k1"), max(col("o_orderkey")).as("k2"))
      .filter(col("n_orders") > 1)
      .orderBy(col("o_custkey"), col("day"))
  }

  /** Functional-dependency discovery audit — the data-profiling pass
    * that finds which column pairs behave as keys: for each candidate
    * FD (X → Y), the number of X values mapping to more than one Y
    * (violations) and whether the dependency holds exactly. Each
    * candidate is one (X, Y)-distinct collapse + an X-keyed reduce —
    * shuffles carry distinct pairs only. Candidates span held and
    * broken FDs so the detector is proven in both directions. */
  private def qFdAudit(s: SparkSession, dir: String): DataFrame = {
    def fd(name: String, df: DataFrame, x: String, y: String): DataFrame = {
      val pairs = df.select(col(x).as("xx"), col(y).as("yy")).distinct()
      pairs.groupBy(col("xx")).agg(countDistinct(col("yy")).as("ny"))
        .agg(count(lit(1)).as("lhs_values"),
          sum(when(col("ny") > 1, 1L).otherwise(0L)).as("violations"))
        .select(lit(name).as("fd"), col("lhs_values"), col("violations"),
          (col("violations") === 0L).as("holds"))
    }
    val ordCust = t(s, dir, "orders").join(t(s, dir, "customer"),
      col("o_custkey") === col("c_custkey"))
    Seq(
      fd("custkey->nationkey", ordCust, "o_custkey", "c_nationkey"),
      fd("custkey->orderpriority", ordCust, "o_custkey", "o_orderpriority"),
      fd("partkey->brand", t(s, dir, "part"), "p_partkey", "p_brand"),
      fd("brand->size", t(s, dir, "part"), "p_brand", "p_size"),
      fd("nationkey->regionkey", t(s, dir, "nation"), "n_nationkey",
        "n_regionkey"))
      .reduce(_ unionAll _)
      .orderBy(col("fd"))
  }

  /** Shipping-SLA latency report: order-to-ship days per priority —
    * exact nearest-rank p50/p90 on the two-pass grouped rank (the
    * established no-funnel path) plus the share of line items
    * breaching a 90-day SLA in exact ppm. The ops dashboard number
    * behind every fulfilment review. */
  private def qShipSla(s: SparkSession, dir: String): DataFrame = {
    val lat = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("prio"),
        (epochDay(col("l_shipdate")) - epochDay(col("o_orderdate")))
          .as("days"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("lk"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      lat.select(col("prio"), col("days").cast("double").as("ord"),
        col("lk")),
      "prio", "ord", "lk", 32)
    def rk(p: Int) = expr(s"greatest((grp_n * $p + 99) div 100, 1)")
    val quant = ranked
      .filter(col("rnk") === rk(50) || col("rnk") === rk(90))
      .groupBy(col("prio"))
      .agg(max(col("grp_n")).as("n"),
        max(when(col("rnk") === rk(50), col("ord"))).cast("long")
          .as("p50_days"),
        max(when(col("rnk") === rk(90), col("ord"))).cast("long")
          .as("p90_days"))
    val breach = lat.groupBy(col("prio"))
      .agg(sum(when(col("days") > 90, 1L).otherwise(0L)).as("breaches"))
    quant.join(breach, "prio")
      .select(col("prio"), col("n"), col("p50_days"), col("p90_days"),
        expr("breaches * 1000000 div n").as("breach_ppm"))
      .orderBy(col("prio"))
  }

  /** Greedy set-cover source selection (3 unrolled rounds): which
    * three sources together cover the most trigram TYPES — the
    * data-selection question behind "which corpora should the next
    * crawl buy". Each round counts only types not yet covered (an
    * anti-join against the picked sources' type sets), picks the
    * argmax deterministically (count desc, source), and the greedy
    * guarantee (≥ 1−1/e of optimal) comes with the algorithm. Type
    * tables shuffle on the type key; rounds are unrolled joins, no
    * driver loop. */
  private def qSetCover(s: SparkSession, dir: String): DataFrame = {
    val types = trigrams2(s, dir).localCheckpoint(eager = false)
    val tot = types.select(col("g")).distinct()
      .agg(count(lit(1)).as("total"))
    def pickNext(excluded: DataFrame, covered: DataFrame): DataFrame = {
      val remaining = types.join(covered, Seq("g"), "left_anti")
      remaining
        .join(excluded, Seq("source"), "left_anti")
        .groupBy(col("source")).agg(count(lit(1)).as("new_types"))
        .orderBy(col("new_types").desc, col("source")).limit(1)
    }
    val empty = types.select(col("g")).filter(lit(false))
    val noneSrc = types.select(col("source")).filter(lit(false))
    val p1 = pickNext(noneSrc, empty).localCheckpoint(eager = false)
    val c1 = types.join(broadcast(p1.select(col("source"))), "source")
      .select(col("g")).distinct().localCheckpoint(eager = false)
    val p2 = pickNext(p1.select(col("source")), c1)
      .localCheckpoint(eager = false)
    val c2 = c1.unionAll(types
        .join(broadcast(p2.select(col("source"))), "source")
        .select(col("g"))).distinct().localCheckpoint(eager = false)
    val p3 = pickNext(
      p1.select(col("source")).unionAll(p2.select(col("source"))), c2)
      .localCheckpoint(eager = false)
    val rounds = p1.select(lit(1L).as("round"), col("source"),
        col("new_types"))
      .unionAll(p2.select(lit(2L).as("round"), col("source"),
        col("new_types")))
      .unionAll(p3.select(lit(3L).as("round"), col("source"),
        col("new_types")))
    import org.apache.spark.sql.expressions.Window
    rounds
      .withColumn("covered_types",
        sum(col("new_types")).over(Window.orderBy(col("round"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .withColumn("coverage_ppm",
        expr("covered_types * 1000000 div total"))
      .select(col("round"), col("source"), col("new_types"),
        col("covered_types"), col("coverage_ppm"))
      .orderBy(col("round"))
  }

  /** Distinct (source, trigram) type pairs — q_novelty's base,
    * shared with the set-cover picker. */
  private def trigrams2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(tk) - 2), " +
          "i -> array_join(slice(tk, i, 3), ' '))")).as("g"))
      .distinct()

  /** k-means elbow curve: assignment SSE against the deterministic
    * seed codebooks at k ∈ {2, 4, 8} — the "how many clusters does
    * this embedding space want" diagnostic, computed as three
    * broadcast-codebook assignment passes whose per-vector cost
    * Σ(|x|² − 2x·c* + |c*|²) is exact fixed point end-to-end (the
    * q_kmeans discipline; the corpus never shuffles). A flattening
    * SSE drop between successive k values is the elbow. */
  private def qElbow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings").localCheckpoint(eager = false)
    def sseAt(k: Int): DataFrame = {
      val cents = emb.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val scored = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          (graft.functions.kernels.fixed_point_dot(col("embedding"),
            col("embedding"))
            - lit(2L) * graft.functions.kernels.fixed_point_dot(
              col("embedding"), col("cv"))
            + graft.functions.kernels.fixed_point_dot(col("cv"), col("cv")))
            .as("d2"))
      scored.groupBy(col("vec_id")).agg(min(col("d2")).as("best_d2"))
        .agg(sum(expr("best_d2 div 1000")).as("sse_scaled"))
        .select(lit(k.toLong).as("k"), col("sse_scaled"))
    }
    val curve = sseAt(2).unionAll(sseAt(4)).unionAll(sseAt(8))
    curve
      .withColumn("drop_from_prev",
        coalesce(lag(col("sse_scaled"), 1).over(Window.orderBy(col("k")))
          - col("sse_scaled"), lit(0L)))
      .orderBy(col("k"))
  }

  /** Segmented trend: OLS slopes before/after the revenue series'
    * exact-SSE changepoint (q_breakpoint's argmin, recomputed here so
    * the query is self-contained), each side's slope from five exact
    * integer moments (q_regression's fixed-tree form) — "the trend
    * changed on day D, from a to b per day". The slope-change column
    * is the story; everything windows over the bounded day domain. */
  private def qSegmentedTrend(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
      .localCheckpoint(eager = false)
    // changepoint by exact SSE minimization (q_breakpoint's identity)
    val pre = daily
      .withColumn("i", row_number().over(Window.orderBy(col("day")))
        .cast("long"))
      .localCheckpoint(eager = false)
    val tot = pre.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
      sum(col("v") * col("v")).as("svv"))
    val cum = pre
      .withColumn("cs", sum(col("v")).over(Window.orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("css", sum(col("v") * col("v")).over(Window.orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val best = cum.crossJoin(broadcast(tot))
      .filter(col("i") >= 2 && col("i") <= col("n") - 2)
      .select(col("i"), col("day"),
        (expr("(css * i - cs * cs) div i") +
          expr("((svv - css) * (n - i) - (sv - cs) * (sv - cs)) div (n - i)"))
          .as("sse"))
      .orderBy(col("sse"), col("i")).limit(1)
      .select(col("i").as("cp_i"), col("day").as("cp_day"))
      .localCheckpoint(eager = false)
    val sides = pre.crossJoin(broadcast(best))
      .select(when(col("i") <= col("cp_i"), "before").otherwise("after")
        .as("side"), col("i"), col("v"), col("cp_day"))
      .groupBy(col("side"), col("cp_day"))
      .agg(count(lit(1)).as("n"), sum(col("i")).as("sx"),
        sum(col("v")).as("sy"), sum(col("i") * col("i")).as("sxx"),
        sum(col("i") * col("v")).as("sxy"))
      .withColumn("slope_milli",
        expr("(n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx)"))
    val piv = sides.groupBy(col("cp_day"))
      .agg(max(when(col("side") === "before", col("slope_milli")))
        .as("slope_before_milli"),
        max(when(col("side") === "after", col("slope_milli")))
          .as("slope_after_milli"),
        max(when(col("side") === "before", col("n"))).as("n_before"),
        max(when(col("side") === "after", col("n"))).as("n_after"))
    piv.select(col("cp_day"), col("n_before"), col("n_after"),
      col("slope_before_milli"), col("slope_after_milli"),
      (col("slope_after_milli") - col("slope_before_milli"))
        .as("slope_change_milli"))
  }

  /** New-product vitality: parts first sold in each quarter, and the
    * share of that quarter's revenue coming from them — "is the
    * catalog refreshing or stagnating". First-sale quarter is one
    * min-reduce per part (the first-occurrence trick); the vitality
    * ratio is exact ppm per quarter. */
  private def qColdStartItems(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("year(l_shipdate) * 4 + (month(l_shipdate) - 1) div 3")
          .cast("long").as("q"),
        Analytics.cents(col("l_extendedprice")).as("cents"))
      .localCheckpoint(eager = false)
    val firstQ = li.groupBy(col("l_partkey")).agg(min(col("q")).as("fq"))
    val perQ = li.join(firstQ, "l_partkey")
      .groupBy(col("q"))
      .agg(sum(col("cents")).as("rev_c"),
        sum(when(col("q") === col("fq"), col("cents")).otherwise(0L))
          .as("new_rev_c"),
        countDistinct(when(col("q") === col("fq"), col("l_partkey")))
          .as("new_parts"))
    perQ.select(col("q"), col("new_parts"), col("rev_c"),
        expr("new_rev_c * 1000000 div rev_c").as("vitality_ppm"))
      .orderBy(col("q"))
  }

  /** Cross-sectional price elasticity of demand: per part, mean unit
    * price and total quantity enter in micro-nat LOGS (rounded per
    * part BEFORE the moment sums — q_entropy's determinism contract),
    * then elasticity = cov(ln p, ln q)/var(ln p) from five exact
    * integer moments in one fixed tree. The classic log-log demand
    * slope, here exactly reproducible because no unrounded
    * transcendental ever enters a sum. */
  private def qPriceElasticity(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .select(
        floor(log(expr("cents div qty").cast("double")) * 1000000 + 0.5)
          .cast("long").as("lp"),
        floor(log(col("qty").cast("double")) * 1000000 + 0.5)
          .cast("long").as("lq"))
    val m = per.agg(count(lit(1)).as("n"), sum(col("lp")).as("sp"),
      sum(col("lq")).as("sq"),
      sum(expr("(lp div 1000) * (lq div 1000)")).as("spq_milli2"),
      sum(expr("(lp div 1000) * (lp div 1000)")).as("spp_milli2"))
    // milli-log moments keep the cross products in int64 at any scale
    val nD = col("n").cast("double")
    m.select(col("n"),
      ((nD * col("spq_milli2").cast("double") -
        (col("sp").cast("double") / 1000.0) *
          (col("sq").cast("double") / 1000.0)) /
        (nD * col("spp_milli2").cast("double") -
          (col("sp").cast("double") / 1000.0) *
            (col("sp").cast("double") / 1000.0))).as("elasticity"))
  }

  /** Borda-count rank aggregation — the positional-voting consensus
    * (complement to q_rank_fusion's RRF): brands ranked by three
    * metrics (revenue, quantity, distinct orders), Borda points =
    * (n_brands − rank) summed across the three ballots, consensus
    * top-10. The metric table is catalog-bounded (brands), so the
    * three rankings are bounded windows; points are exact integers
    * with deterministic tie-breaks everywhere. */
  private def qBorda(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("rev"),
        sum(col("l_quantity").cast("long")).as("qty"),
        countDistinct(col("l_orderkey")).as("ords"))
      .localCheckpoint(eager = false)
    val n = m.agg(count(lit(1)).as("nb"))
    def rank(c: String) = row_number().over(
      Window.orderBy(col(c).desc, col("p_brand"))).cast("long")
    m.withColumn("r1", rank("rev"))
      .withColumn("r2", rank("qty"))
      .withColumn("r3", rank("ords"))
      .crossJoin(broadcast(n))
      .select(col("p_brand"),
        ((col("nb") - col("r1")) + (col("nb") - col("r2")) +
          (col("nb") - col("r3"))).as("borda_points"),
        col("r1"), col("r2"), col("r3"))
      .orderBy(col("borda_points").desc, col("p_brand")).limit(10)
  }

  /** Per-source character-level Shannon entropy — the theoretical
    * bits-per-character floor (compressibility estimate) a storage
    * planner reads before choosing codecs: character histograms per
    * source (bounded alphabet), each class's −p·log₂p rounded to
    * integer micro-bits BEFORE the per-source sum. Low entropy =
    * highly compressible/templated text; also a quiet data-quality
    * tell (binary junk shows up as entropy spikes). */
  private def qCharEntropy(s: SparkSession, dir: String): DataFrame = {
    val chars = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) === 1)
      .groupBy(col("source"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val tot = chars.groupBy(col("source")).agg(sum(col("c")).as("n"))
    chars.join(broadcast(tot), "source")
      .select(col("source"), col("n"),
        floor((col("c").cast("double") / col("n").cast("double")) *
          (log(col("c").cast("double") / col("n").cast("double")) /
            lit(0.6931471805599453)) * lit(-1000000.0) + 0.5)
          .cast("long").as("term_ubits"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_chars"),
        sum(col("term_ubits")).as("entropy_ubits"))
      .orderBy(col("source"))
  }

  /** Greedy knapsack data selection under a token budget: keep the
    * positive-quality docs with the best quality-per-token density
    * until a quarter of the corpus' tokens are spent — the
    * "best data for a fixed training budget" selector (greedy is
    * optimal for the fractional relaxation and within one doc of it
    * here). Density ranking rides the SAME order-preserving key
    * encoding + two-pass prefix sum as q_pareto — no global window;
    * the budget is data-relative so the operator is SF-invariant. */
  private def qKnapsack(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.withTokenEstimate(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("est_tokens"),
        (lit(40L) * size(split(col("text"), " ")).cast("long") +
          lit(-10L) * length(regexp_replace(col("text"), "[^0-9]", ""))
            .cast("long") +
          lit(-2L) * abs(col("n_chars") - 500) + lit(-1500L))
          .as("q_milli"))
      .filter(col("q_milli") > 0)
      .withColumn("density", expr("q_milli * 1000 div est_tokens"))
      .localCheckpoint(eager = false)
    val enc = scored
      .select(when(col("density") < (1L << 36) && col("doc_id") < (1L << 26),
          (lit(1L << 36) - col("density")) * lit(1L << 26) + col("doc_id"))
        .otherwise(raise_error(lit(
          "q_knapsack key encoding overflow")))
        .as("k"), col("est_tokens"), col("q_milli"))
      .localCheckpoint(eager = false)
    val run = graft.ops.ScalablePrefix.runningSum(s,
      enc.select(col("k"), col("est_tokens")), "k", "est_tokens", 32)
    val budget = scored.agg(expr("sum(est_tokens) div 4").as("budget"))
    val qual = scored.agg(sum(col("q_milli")).as("total_q"),
      count(lit(1)).as("n_candidates"))
    run.crossJoin(broadcast(budget))
      .filter(col("run_sum") <= col("budget"))
      .join(enc.select(col("k"), col("q_milli")), "k")
      .agg(count(lit(1)).as("n_selected"),
        sum(col("est_tokens")).as("tokens_used"),
        sum(col("q_milli")).as("quality_sum"))
      .crossJoin(broadcast(qual)).crossJoin(broadcast(budget))
      .select(col("n_candidates"), col("n_selected"), col("budget"),
        col("tokens_used"), col("quality_sum"),
        expr("quality_sum * 1000000 div total_q").as("quality_share_ppm"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_route" -> (qRoute _),
    "q_route_counts" -> (qRouteCounts _),
    "q_agg_success" -> (qAggSuccess _),
    "q_running_avg" -> (qRunningAvg _),
    "q_running_avg_scalable" -> (qRunningAvgScalable _),
    "q_dlq_enrich" -> (qDlqEnrich _),
    "q_retry_ledger" -> (qRetryLedger _),
    "q_retry_final" -> (qRetryFinal _),
    "q_validate" -> (qValidate _),
    "q_avro_roundtrip" -> (qAvroRoundtrip _),
    "q_avro_datum_roundtrip" -> (qAvroDatumRoundtrip _),
    "q_decode_errors" -> (qDecodeErrors _),
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
    "q_sessionize" -> (qSessionize _),
    "q_gap_fill" -> (qGapFill _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_pivot" -> (qPivot _),
    "q_json_extract" -> (qJsonExtract _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_percentile" -> (qPercentile _),
    "q_quantile_sampled" -> (qQuantileSampled _),
    "q_hll_distinct" -> (qHllDistinct _),
    "q_stats_moments" -> (qStatsMoments _),
    "q_shipping_priority" -> (qShippingPriority _),
    "q_region_volume" -> (qRegionVolume _),
    "q_returned_items" -> (qReturnedItems _),
    "q_bracket_revenue" -> (qBracketRevenue _),
    "q_sample" -> (qSample _),
    "q_ngram_counts" -> (qNgramCounts _),
    "q_order_gen" -> (qOrderGen _),
    "q_range_join" -> (qRangeJoin _),
    "q_window_funcs" -> (qWindowFuncs _),
    "q_window_funcs2" -> (qWindowFuncs2 _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_scalar_funcs" -> (qScalarFuncs _),
    "q_text_stats" -> (qTextStats _),
    "q_lang_id" -> (qLangId _),
    "q_quality" -> (qQuality _),
    "q_fingerprint" -> (qFingerprint _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_jaccard_pairs" -> (qJaccardPairs _),
    "q_minhash_pairs" -> (qMinhashPairs _),
    "q_simhash" -> (qSimhash _),
    "q_cosine_topk" -> (qCosineTopk _),
    "q_embed_near_dup" -> (qEmbedNearDup _),
    "q_ivf_search" -> (qIvfSearch _),
    "q_lsh_ann_buckets" -> (qLshAnnBuckets _),
    "q_vec_quantize" -> (qVecQuantize _),
    "q_ann_batch" -> (qAnnBatch _),
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_media_dims" -> (qMediaDims _),
    "q_chunking" -> (qChunking _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_repetition" -> (qRepetition _),
    "q_pii_scrub" -> (qPiiScrub _),
    "q_contamination" -> (qContamination _),
    "q_dup_clusters" -> (qDupClusters _),
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_pack_windows" -> (qPackWindows _),
    "q_sql_surface" -> (qSqlSurface _),
    "q_token_estimate" -> (qTokenEstimate _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_regexp" -> (qRegexp _),
    "q_union_all" -> (qUnionAll _),
    "q_curation_pipeline" -> (qCurationPipeline _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "q_collect_set" -> (qCollectSet _),
    "q_try_cast" -> (qTryCast _),
    "q_exists_subquery" -> (qExistsSubquery _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_outer_join" -> (qOuterJoin _),
    "q_rolling_range" -> (qRollingRange _),
    "q_scd2" -> (qScd2 _),
    "q_tfidf" -> (qTfidf _),
    "q_length_histogram" -> (qLengthHistogram _),
    "q_zorder" -> (qZorder _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_cms_heavy" -> (qCmsHeavy _),
    "q_unpivot" -> (qUnpivot _),
    "q_interval_join" -> (qIntervalJoin _),
    "q_edit_distance" -> (qEditDistance _),
    "q_recursive_cte" -> (qRecursiveCte _),
    "q_lateral_topk" -> (qLateralTopk _),
    "q_arg_max" -> (qArgMax _),
    "q_moving_avg" -> (qMovingAvg _),
    "q_triangles" -> (qTriangles _),
    "q_session_window" -> (qSessionWindow _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_source_mix" -> (qSourceMix _),
    "q_set_ops_all" -> (qSetOpsAll _),
    "q_pagerank" -> (qPagerank _),
    "q_nested_not_in" -> (qNestedNotIn _),
    "q_late_suppliers" -> (qLateSuppliers _),
    "q_ntile_dist" -> (qNtileDist _),
    "q_rank_scalable" -> (qRankScalable _),
    "q_cc_star" -> (qCcStar _),
    "q_hll_rollup" -> (qHllRollup _),
    "q_dedup_keep_best" -> (qDedupKeepBest _),
    "q_median_scalable" -> (qMedianScalable _),
    "q_rollup_grouping" -> (qRollupGrouping _),
    "q_source_v2" -> (qSourceV2 _),
    "q_try_arith" -> (qTryArith _),
    "q_bit_bool_aggs" -> (qBitBoolAggs _),
    "q_weighted_mean" -> (qWeightedMean _),
    "q_listagg" -> (qListagg _),
    "q_csv_roundtrip" -> (qCsvRoundtrip _),
    "q_json_roundtrip" -> (qJsonRoundtrip _),
    "q_agg_filters" -> (qAggFilters _),
    "q_variant" -> (qVariant _),
    "q_funnel" -> (qFunnel _),
    "q_bloom_prune" -> (qBloomPrune _),
    "q_skyline" -> (qSkyline _),
    "q_paragraph_dedup" -> (qParagraphDedup _),
    "q_percentile_exact" -> (qPercentileExact _),
    "q_mode" -> (qMode _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_containment" -> (qContainment _),
    "q_bm25" -> (qBm25 _),
    "q_skyline3d" -> (qSkyline3d _),
    "q_bfs" -> (qBfs _),
    "q_profile" -> (qProfile _),
    "q_outliers_iqr" -> (qOutliersIqr _),
    "q_jaccard_prefix" -> (qJaccardPrefix _),
    "q_sssp" -> (qSssp _),
    "q_retention" -> (qRetention _),
    "q_table_checksum" -> (qTableChecksum _),
    "q_hist_quantile" -> (qHistQuantile _),
    "q_islands" -> (qIslands _),
    "q_market_share" -> (qMarketShare _),
    "q_hll_intersect" -> (qHllIntersect _),
    "q_ivm" -> (qIvm _),
    "q_er_match" -> (qErMatch _),
    "q_percentile_cont" -> (qPercentileCont _),
    "q_interpolate" -> (qInterpolate _),
    "q_volume_shipping" -> (qVolumeShipping _),
    "q_product_profit" -> (qProductProfit _),
    "q_custdist" -> (qCustDist _),
    "q_promo_share" -> (qPromoShare _),
    "q_top_supplier" -> (qTopSupplier _),
    "q_big_orders" -> (qBigOrders _),
    "q_idle_customers" -> (qIdleCustomers _),
    "q_kmv_rollup" -> (qKmvRollup _),
    "q_kmv_jaccard" -> (qKmvJaccard _),
    "q_anomaly" -> (qAnomaly _),
    "q_locf" -> (qLocf _),
    "q_fk_orphans" -> (qFkOrphans _),
    "q_asof_native" -> (qAsofNative _),
    "q_vocab_coverage" -> (qVocabCoverage _),
    "q_merge_upsert" -> (qMergeUpsert _),
    "q_rarity" -> (qRarity _),
    "q_features_asof" -> (qFeaturesAsof _),
    "q_forecast_revenue" -> (qForecastRevenue _),
    "q_rolling_distinct" -> (qRollingDistinct _),
    "q_transitions" -> (qTransitions _),
    "q_trend_test" -> (qTrendTest _),
    "q_chi_square" -> (qChiSquare _),
    "q_twap" -> (qTwap _),
    "q_data_skew" -> (qDataSkew _),
    "q_dedup_rate" -> (qDedupRate _),
    "q_weighted_median" -> (qWeightedMedian _),
    "q_benford" -> (qBenford _),
    "q_recall_at_k" -> (qRecallAtK _),
    "q_regression" -> (qRegression _),
    "q_itemsets" -> (qItemsets _),
    "q_ema" -> (qEma _),
    "q_bpe_pairs" -> (qBpePairs _),
    "q_kmeans" -> (qKmeans _),
    "q_pq_adc" -> (qPqAdc _),
    "q_label_prop" -> (qLabelProp _),
    "q_pmi" -> (qPmi _),
    "q_token_budget" -> (qTokenBudget _),
    "q_pareto" -> (qPareto _),
    "q_ab_test" -> (qAbTest _),
    "q_gini" -> (qGini _),
    "q_ngram_lm" -> (qNgramLm _),
    "q_audio_meta" -> (qAudioMeta _),
    "q_sample_k" -> (qSampleK _),
    "q_attribution" -> (qAttribution _),
    "q_semantic_dedup" -> (qSemanticDedup _),
    "q_embed_outliers" -> (qEmbedOutliers _),
    "q_feature_prep" -> (qFeaturePrep _),
    "q_winsorize" -> (qWinsorize _),
    "q_zipf" -> (qZipf _),
    "q_ks_test" -> (qKsTest _),
    "q_lorenz_gini" -> (qLorenzGini _),
    "q_link_pred" -> (qLinkPred _),
    "q_hits" -> (qHits _),
    "q_acf" -> (qAcf _),
    "q_cusum" -> (qCusum _),
    "q_spearman" -> (qSpearman _),
    "q_mann_whitney" -> (qMannWhitney _),
    "q_kappa" -> (qKappa _),
    "q_kcore" -> (qKcore _),
    "q_negatives" -> (qNegatives _),
    "q_group_split" -> (qGroupSplit _),
    "q_quality_model" -> (qQualityModel _),
    "q_sorted_neighborhood" -> (qSortedNeighborhood _),
    "q_bootstrap" -> (qBootstrap _),
    "q_dq_checks" -> (qDqChecks _),
    "q_cross_val" -> (qCrossVal _),
    "q_video_meta" -> (qVideoMeta _),
    "q_compaction" -> (qCompaction _),
    "q_seasonal" -> (qSeasonal _),
    "q_calibration" -> (qCalibration _),
    "q_degree_dist" -> (qDegreeDist _),
    "q_blocking_audit" -> (qBlockingAudit _),
    "q_minhash_accuracy" -> (qMinhashAccuracy _),
    "q_rfm" -> (qRfm _),
    "q_lag_features" -> (qLagFeatures _),
    "q_assortativity" -> (qAssortativity _),
    "q_entropy" -> (qEntropy _),
    "q_mutual_info" -> (qMutualInfo _),
    "q_confusion" -> (qConfusion _),
    "q_apportion" -> (qApportion _),
    "q_auc" -> (qAuc _),
    "q_theil_sen" -> (qTheilSen _),
    "q_modularity" -> (qModularity _),
    "q_mrr" -> (qMrr _),
    "q_psi" -> (qPsi _),
    "q_woe_iv" -> (qWoeIv _),
    "q_local_clustering" -> (qLocalClustering _),
    "q_ndcg" -> (qNdcg _),
    "q_ridge" -> (qRidge _),
    "q_gains" -> (qGains _),
    "q_hhi" -> (qHhi _),
    "q_silhouette" -> (qSilhouette _),
    "q_mad" -> (qMad _),
    "q_ipf" -> (qIpf _),
    "q_embed_drift" -> (qEmbedDrift _),
    "q_consistent_hash" -> (qConsistentHash _),
    "q_quantile_normalize" -> (qQuantileNormalize _),
    "q_wilson" -> (qWilson _),
    "q_decile_matrix" -> (qDecileMatrix _),
    "q_readability" -> (qReadability _),
    "q_lsh_sweep" -> (qLshSweep _),
    "q_purchase_gaps" -> (qPurchaseGaps _),
    "q_effect_size" -> (qEffectSize _),
    "q_median_ci" -> (qMedianCi _),
    "q_stickiness" -> (qStickiness _),
    "q_markov2" -> (qMarkov2 _),
    "q_hazard" -> (qHazard _),
    "q_dispersion" -> (qDispersion _),
    "q_cohort_ltv" -> (qCohortLtv _),
    "q_laspeyres" -> (qLaspeyres _),
    "q_fifo_match" -> (qFifoMatch _),
    "q_year_overlap" -> (qYearOverlap _),
    "q_runs_test" -> (qRunsTest _),
    "q_pchart" -> (qPchart _),
    "q_keyness" -> (qKeyness _),
    "q_weekday_effect" -> (qWeekdayEffect _),
    "q_time_to_convert" -> (qTimeToConvert _),
    "q_item_recs" -> (qItemRecs _),
    "q_breakpoint" -> (qBreakpoint _),
    "q_kruskal_wallis" -> (qKruskalWallis _),
    "q_partial_corr" -> (qPartialCorr _),
    "q_shift_share" -> (qShiftShare _),
    "q_cronbach" -> (qCronbach _),
    "q_mde" -> (qMde _),
    "q_simpsons" -> (qSimpsons _),
    "q_qcd" -> (qQcd _),
    "q_boilerplate" -> (qBoilerplate _),
    "q_fertility" -> (qFertility _),
    "q_curriculum" -> (qCurriculum _),
    "q_odds_ratio" -> (qOddsRatio _),
    "q_sprt" -> (qSprt _),
    "q_trimmed_mean" -> (qTrimmedMean _),
    "q_lof" -> (qLof _),
    "q_knn_eval" -> (qKnnEval _),
    "q_mcnemar" -> (qMcnemar _),
    "q_epoch_mix" -> (qEpochMix _),
    "q_naive_bayes" -> (qNaiveBayes _),
    "q_holt" -> (qHolt _),
    "q_ppr" -> (qPpr _),
    "q_simhash_hamming" -> (qSimhashHamming _),
    "q_hof_funcs" -> (qHofFuncs _),
    "q_posexplode" -> (qPosexplode _),
    "q_orc_roundtrip" -> (qOrcRoundtrip _),
    "q_cdc_chunks" -> (qCdcChunks _),
    "q_chunk_dedup" -> (qChunkDedup _),
    "q_rrf" -> (qRrf _),
    "q_asof_tolerance" -> (qAsofTolerance _),
    "q_null_audit" -> (qNullAudit _),
    "q_decay_score" -> (qDecayScore _),
    "q_decision_stump" -> (qDecisionStump _),
    "q_stl_lite" -> (qStlLite _),
    "q_source_card" -> (qSourceCard _),
    "q_shuffle_hash_join" -> (qShuffleHashJoin _),
    "q_matryoshka_eval" -> (qMatryoshkaEval _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_partition_prune" -> (qPartitionPrune _),
    "q_merge_schema" -> (qMergeSchema _),
    "q_union_by_name" -> (qUnionByName _),
    "q_peak_concurrency" -> (qPeakConcurrency _),
    "q_array_set_ops" -> (qArraySetOps _),
    "q_open_aging" -> (qOpenAging _),
    "q_rolling_median" -> (qRollingMedian _),
    "q_cuped" -> (qCuped _),
    "q_ohlc_bars" -> (qOhlcBars _),
    "q_did" -> (qDid _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_lateness_audit" -> (qLatenessAudit _),
    "q_topic_sink" -> (qTopicSink _),
    "q_assoc_rules" -> (qAssocRules _),
    "q_abandonment" -> (qAbandonment _),
    "q_decimal_agg" -> (qDecimalAgg _),
    "q_event_pattern" -> (qEventPattern _),
    "q_time_travel" -> (qTimeTravel _),
    "q_inbatch_negatives" -> (qInbatchNegatives _),
    "q_filter_sweep" -> (qFilterSweep _),
    "q_power_iteration" -> (qPowerIteration _),
    "q_jaro_match" -> (qJaroMatch _),
    "q_survival" -> (qSurvival _),
    "q_jsd" -> (qJsd _),
    "q_perm_test" -> (qPermTest _),
    "q_xml_roundtrip" -> (qXmlRoundtrip _),
    "q_unicode_norm" -> (qUnicodeNorm _),
    "q_cem" -> (qCem _),
    "q_haar" -> (qHaar _),
    "q_weighted_reservoir" -> (qWeightedReservoir _),
    "q_noise_inject" -> (qNoiseInject _),
    "q_url_parse" -> (qUrlParse _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_welch_t" -> (qWelchT _),
    "q_anova_f" -> (qAnovaF _),
    "q_levene_bf" -> (qLeveneBf _),
    "q_cliffs_delta" -> (qCliffsDelta _),
    "q_poisson_rate" -> (qPoissonRate _),
    "q_capture_recapture" -> (qCaptureRecapture _),
    "q_good_turing" -> (qGoodTuring _),
    "q_heaps" -> (qHeaps _),
    "q_bot_detect" -> (qBotDetect _),
    "q_fellegi_sunter" -> (qFellegiSunter _),
    "q_period_detect" -> (qPeriodDetect _),
    "q_mase" -> (qMase _),
    "q_session_entropy" -> (qSessionEntropy _),
    "q_dedup_sweep" -> (qDedupSweep _),
    "q_vector_norms" -> (qVectorNorms _),
    "q_temporal_split" -> (qTemporalSplit _),
    "q_robust_scaler" -> (qRobustScaler _),
    "q_novelty" -> (qNovelty _),
    "q_funnel_windows" -> (qFunnelWindows _),
    "q_first_touch" -> (qFirstTouch _),
    "q_paasche" -> (qPaasche _),
    "q_ab_srm" -> (qAbSrm _),
    "q_tail_index" -> (qTailIndex _),
    "q_rolling_corr" -> (qRollingCorr _),
    "q_burst_detect" -> (qBurstDetect _),
    "q_adjacent_dup" -> (qAdjacentDup _),
    "q_join_cardinality" -> (qJoinCardinality _),
    "q_weekday_strength" -> (qWeekdayStrength _),
    "q_hurst" -> (qHurst _),
    "q_eb_shrinkage" -> (qEbShrinkage _),
    "q_ratio_metric" -> (qRatioMetric _),
    "q_ece" -> (qEce _),
    "q_fairness" -> (qFairness _),
    "q_fleiss_kappa" -> (qFleissKappa _),
    "q_map_eval" -> (qMapEval _),
    "q_range_boundaries" -> (qRangeBoundaries _),
    "q_neyman_alloc" -> (qNeymanAlloc _),
    "q_bloom_fpp" -> (qBloomFpp _),
    "q_sax" -> (qSax _),
    "q_rank_fusion" -> (qRankFusion _),
    "q_graph_jaccard" -> (qGraphJaccard _),
    "q_abc_analysis" -> (qAbcAnalysis _),
    "q_session_path" -> (qSessionPath _),
    "q_churn_label" -> (qChurnLabel _),
    "q_crosstab_residuals" -> (qCrosstabResiduals _),
    "q_var_cvar" -> (qVarCvar _),
    "q_voptimal_hist" -> (qVoptimalHist _),
    "q_coverage_curve" -> (qCoverageCurve _),
    "q_multi_touch" -> (qMultiTouch _),
    "q_shapley_attribution" -> (qShapleyAttribution _),
    "q_uplift_by_segment" -> (qUpliftBySegment _),
    "q_anomaly_stl" -> (qAnomalyStl _),
    "q_quantile_bands" -> (qQuantileBands _),
    "q_price_dispersion" -> (qPriceDispersion _),
    "q_pvm_bridge" -> (qPvmBridge _),
    "q_entropy_rate" -> (qEntropyRate _),
    "q_pack_efficiency" -> (qPackEfficiency _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_pca_var_share" -> (qPcaVarShare _),
    "q_cache_planning" -> (qCachePlanning _),
    "q_threshold_f1" -> (qThresholdF1 _),
    "q_forecast_eval" -> (qForecastEval _),
    "q_customer_bridge" -> (qCustomerBridge _),
    "q_dup_orders" -> (qDupOrders _),
    "q_fd_audit" -> (qFdAudit _),
    "q_ship_sla" -> (qShipSla _),
    "q_set_cover" -> (qSetCover _),
    "q_elbow" -> (qElbow _),
    "q_segmented_trend" -> (qSegmentedTrend _),
    "q_cold_start_items" -> (qColdStartItems _),
    "q_price_elasticity" -> (qPriceElasticity _),
    "q_borda" -> (qBorda _),
    "q_char_entropy" -> (qCharEntropy _),
    "q_knapsack" -> (qKnapsack _),
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

    "q_running_avg_scalable" ->
      s"""$routedSql, s AS (
         |  SELECT order_key,
         |         CAST(floor(price * 100 + 0.5) AS BIGINT) AS cents
         |  FROM routed WHERE status = 'success')
         |SELECT order_key, cents,
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

    "q_retry_final" ->
      s"""$routedSql
         |SELECT order_key, status,
         |  CASE status WHEN 'success' THEN 'processed'
         |              WHEN 'transient_failure' THEN 'retry_exhausted'
         |              ELSE 'dlq_permanent' END AS final_disposition,
         |  CAST(CASE WHEN status = 'transient_failure' THEN 4 ELSE 1 END AS BIGINT) AS attempts,
         |  CASE WHEN status = 'transient_failure' THEN 'Processing failed after 3 retries'
         |       WHEN status = 'permanent_failure' THEN
         |         CASE WHEN price IS NULL THEN 'Processing error: Missing price field'
         |              WHEN order_id IS NULL OR length(order_id) = 0
         |                   OR product IS NULL OR length(product) = 0
         |                THEN 'Processing error: Invalid order payload'
         |              WHEN price < 0
         |                THEN printf('Processing error: Invalid price: %.2f', price)
         |              ELSE printf('Price exceeds threshold: %.2f > 1000.0', price) END
         |       ELSE '' END AS final_reason
         |FROM routed ORDER BY order_key""".stripMargin,

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

    "q_avro_datum_roundtrip" ->
      s"""$routedSql
         |SELECT order_key, order_id, product,
         |       CAST(CAST(price AS REAL) AS DOUBLE) AS price,
         |       CAST(length(order_id) + length(product) + 6 AS BIGINT) AS datum_len
         |FROM stream ORDER BY order_key""".stripMargin,

    "q_decode_errors" ->
      """SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'decode_failure'
        |            ELSE 'decoded' END AS outcome, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY outcome""".stripMargin,

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

    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_ns(ts) // 1000000000 AS sec FROM events),
        |g AS (
        |  SELECT user_id, event_id, ts, sec,
        |    sec - lag(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM e),
        |sess AS (
        |  SELECT user_id, sec,
        |    CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(sec) AS session_start, max(sec) - min(sec) AS duration_secs
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_gap_fill" ->
      """WITH b AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000000) // 600 * 600 AS bucket,
        |         count(*) AS n
        |  FROM events WHERE user_id % 37 = 0 GROUP BY 1, 2),
        |s AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM b GROUP BY user_id),
        |d AS (SELECT user_id, unnest(range(lo, hi + 600, 600)) AS bucket FROM s)
        |SELECT d.user_id, d.bucket, coalesce(b.n, 0) AS n
        |FROM d LEFT JOIN b ON d.user_id = b.user_id AND d.bucket = b.bucket
        |ORDER BY d.user_id, d.bucket""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderstatus,
        |  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1,
        |  count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2,
        |  count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3,
        |  count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4,
        |  count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_json_extract" ->
      """SELECT coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  quarter(o_orderdate) AS q,
        |  month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS d,
        |  datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_percentile" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders)
        |SELECT o_orderpriority,
        |  quantile_cont(c, 0.5) / 100.0 AS p50,
        |  quantile_cont(c, 0.9) / 100.0 AS p90,
        |  quantile_cont(c, 0.99) / 100.0 AS p99
        |FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_quantile_sampled" ->
      """WITH samp AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders
        |  WHERE CAST('0x' || substr(md5('qtile|' || CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT) % 10 = 0)
        |SELECT o_orderpriority, count(*) AS n_sampled,
        |  quantile_cont(c, 0.5) / 100.0 AS p50_est,
        |  quantile_cont(c, 0.95) / 100.0 AS p95_est
        |FROM samp GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk, quartile, lead_delta
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk,
        |    ntile(4) OVER w AS quartile,
        |    lead(o_totalprice) OVER w - o_totalprice AS lead_delta
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey)) x
        |WHERE rnk <= 5
        |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,

    "q_window_funcs2" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn, pct_rank, cume,
        |       second_key, first_key, last_key
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    percent_rank() OVER w AS pct_rank,
        |    cume_dist() OVER w AS cume,
        |    nth_value(o_orderkey, 2) OVER wf AS second_key,
        |    first_value(o_orderkey) OVER wf AS first_key,
        |    last_value(o_orderkey) OVER wf AS last_key
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey),
        |         wf AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) x
        |WHERE rn <= 4
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey,
        |  upper(substr(lower(c_name), 1, 1)) || substr(lower(c_name), 2) AS name_title,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |  reverse(c_mktsegment) AS seg_rev,
        |  split_part(c_name, '#', 1) AS name_head,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowvowel,
        |  CAST(instr(c_mktsegment, 'I') AS BIGINT) AS i_pos,
        |  repeat(substr(c_mktsegment, 1, 2), 2) AS seg2x,
        |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS seg_dist
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS pri_upper,
        |  lower(o_orderstatus) AS status_lower,
        |  length(o_orderpriority) AS pri_len,
        |  substr(o_orderpriority, 1, 1) AS pri_code,
        |  o_orderstatus || '#' || CAST(o_orderkey AS VARCHAR) AS tag,
        |  round(o_totalprice) AS price_round,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
        |  abs(o_totalprice - 250000.0) AS price_dist,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_source_v2" -> {
      val words = graft.sources.OrderGen.Words.map(w => s"'$w'").mkString(", ")
      s"""WITH g AS (
         |  SELECT md5('dsv2|' || CAST(range AS VARCHAR)) AS h FROM range(1500)),
         |o AS (
         |  SELECT
         |    ([$words])[CAST(CAST('0x' || substr(h,1,4) AS BIGINT) % 16 AS INT) + 1]
         |      || ' ' ||
         |      ([$words])[CAST(CAST('0x' || substr(h,5,4) AS BIGINT) % 16 AS INT) + 1] AS product,
         |    CAST('0x' || substr(h,9,8) AS BIGINT) % 149501 + 500 AS cents
         |  FROM g)
         |SELECT product, CAST(count(*) AS BIGINT) AS n_orders,
         |  sum(cents) / CAST(100.0 AS DOUBLE) AS total_spend
         |FROM o GROUP BY product ORDER BY product""".stripMargin
    },

    "q_order_gen" -> {
      val words = graft.sources.OrderGen.Words.map(w => s"'$w'").mkString(", ")
      s"""WITH g AS (
         |  SELECT range AS seq, md5('gen1|' || CAST(range AS VARCHAR)) AS h
         |  FROM range(1000)),
         |o AS (
         |  SELECT seq,
         |    substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4) || '-' ||
         |      substr(h,17,4) || '-' || substr(h,21,12) AS order_id,
         |    ([$words])[CAST(CAST('0x' || substr(h,1,4) AS BIGINT) % 16 AS INT) + 1]
         |      || ' ' ||
         |      ([$words])[CAST(CAST('0x' || substr(h,5,4) AS BIGINT) % 16 AS INT) + 1] AS product,
         |    (CAST('0x' || substr(h,9,8) AS BIGINT) % 149501 + 500) / 100.0 AS price
         |  FROM g)
         |SELECT seq, order_id, product, price,
         |  CASE WHEN order_id IS NULL OR length(order_id) = 0
         |            OR product IS NULL OR length(product) = 0
         |            OR price IS NULL OR price < 0 THEN 'permanent_failure'
         |       WHEN price >= 5.0 AND price <= 50.0 THEN 'transient_failure'
         |       WHEN price > 1000.0 THEN 'permanent_failure'
         |       ELSE 'success' END AS status
         |FROM o ORDER BY seq""".stripMargin
    },

    "q_range_join" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_ns(ts) AS pts
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT user_id, epoch_ns(ts) AS ets FROM events)
        |SELECT purchase_id, count(*) AS n_preceding
        |FROM p JOIN e ON p.user_id = e.user_id
        |  AND e.ets >= p.pts - 600000000000 AND e.ets < p.pts
        |GROUP BY purchase_id ORDER BY purchase_id""".stripMargin,

    "q_collect_set" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  CAST(len(list(DISTINCT o_orderstatus)) AS BIGINT) AS n_statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_stratified_sample" ->
      """SELECT lang, rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('strat|' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |  FROM documents) t
        |WHERE rn <= 25 ORDER BY lang, rn""".stripMargin,

    // failure predicates spelled explicitly: overflow iff even key /
    // key >= 2; divide-by-zero iff key % 25 = 0; OOB iff index not 1..2
    "q_try_arith" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey = 0 THEN 9223372036854775807
        |       WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderkey END
        |    AS add_or_null,
        |  CASE WHEN o_orderkey >= 2 THEN NULL
        |       ELSE o_orderkey * 4611686018427387904 END AS mul_or_null,
        |  CASE WHEN o_orderkey % 25 = 0 THEN NULL
        |       ELSE CAST(floor(o_totalprice) AS BIGINT)
        |            / CAST(o_orderkey % 25 AS DOUBLE) END AS div_or_null,
        |  CASE WHEN o_orderkey % 4 + 1 IN (1, 2)
        |       THEN (['low', 'high'])[CAST(o_orderkey % 4 + 1 AS INT)] END
        |    AS elem_or_null
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_bit_bool_aggs" ->
      """SELECT l_returnflag, l_linestatus,
        |  bit_and(l_partkey) AS pk_and,
        |  bit_or(l_partkey) AS pk_or,
        |  bit_xor(l_partkey) AS pk_xor,
        |  bool_and(l_discount > 0.05) AS all_disc,
        |  bool_or(l_tax > 0.07) AS any_tax,
        |  CAST(count_if(l_quantity >= 25.0) AS BIGINT) AS n_bulk
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_weighted_mean" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |           * CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |    / CAST(100.0 AS DOUBLE) AS wavg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_listagg" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_csv_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS bal_cents,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
        |  min(c_name) AS first_name
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_json_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(floor(epoch(min(o_orderdate))) AS BIGINT) AS first_epoch,
        |  max(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_try_cast" ->
      """SELECT o_orderkey,
        |  TRY_CAST(o_orderpriority AS INT) AS pri_as_int,
        |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS pri_digit_int,
        |  TRY_CAST(o_orderstatus AS DOUBLE) AS status_as_double
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_hll_distinct" ->
      """WITH h AS (
        |  SELECT o_orderpriority, o_custkey,
        |    CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM orders),
        |rh AS (
        |  SELECT o_orderpriority, h % 64 AS reg,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE CAST(log2(CAST((h // 64) & (-(h // 64)) AS DOUBLE)) AS INT) + 1
        |    END AS rho
        |  FROM h),
        |regs AS (SELECT o_orderpriority, reg, max(rho) AS mrho FROM rh GROUP BY 1, 2),
        |s AS (
        |  SELECT o_orderpriority,
        |    CAST(sum(CAST(1 AS BIGINT) << (55 - mrho)) AS BIGINT) AS t,
        |    count(*) AS nreg
        |  FROM regs GROUP BY 1),
        |d AS (SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_distinct
        |      FROM orders GROUP BY 1)
        |SELECT s.o_orderpriority,
        |  (0.709 * 64 * 64) /
        |    (CAST(t + (64 - nreg) * (CAST(1 AS BIGINT) << 55) AS DOUBLE)
        |       / 36028797018963968.0) AS hll_estimate,
        |  d.exact_distinct
        |FROM s JOIN d ON s.o_orderpriority = d.o_orderpriority
        |ORDER BY s.o_orderpriority""".stripMargin,

    // region sketches from raw rows; must equal the engine's
    // merge-of-nation-sketches bit-for-bit (max-merge invariance)
    "q_hll_rollup" ->
      """WITH h AS (
        |  SELECT n_nationkey, n_regionkey, l_partkey,
        |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |rh AS (
        |  SELECT n_regionkey, h % 64 AS reg,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE CAST(log2(CAST((h // 64) & (-(h // 64)) AS DOUBLE)) AS INT) + 1
        |    END AS rho
        |  FROM h),
        |regs AS (SELECT n_regionkey, reg, max(rho) AS mrho FROM rh GROUP BY 1, 2),
        |s AS (
        |  SELECT n_regionkey,
        |    CAST(sum(CAST(1 AS BIGINT) << (55 - mrho)) AS BIGINT) AS t,
        |    count(*) AS nreg
        |  FROM regs GROUP BY 1),
        |d AS (SELECT n_regionkey, count(DISTINCT l_partkey) AS exact_distinct,
        |             count(DISTINCT n_nationkey) AS n_nations
        |      FROM h GROUP BY 1)
        |SELECT r_name, CAST(n_nations AS BIGINT) AS n_nations,
        |  (0.709 * 64 * 64) /
        |    (CAST(t + (64 - nreg) * (CAST(1 AS BIGINT) << 55) AS DOUBLE)
        |       / 36028797018963968.0) AS hll_estimate,
        |  d.exact_distinct
        |FROM s JOIN d USING (n_regionkey)
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY r_name""".stripMargin,

    "q_shipping_priority" ->
      """SELECT o_orderkey,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch,
        |  sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
        |    / 10000.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate >= TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_region_volume" ->
      """SELECT n_name,
        |  sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
        |    / 10000.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
        |    / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_bracket_revenue" ->
      """SELECT count(*) AS n_items,
        |  sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
        |    / 10000.0 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15 AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25 AND p_size BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35 AND p_size BETWEEN 1 AND 30)""".stripMargin,

    "q_stats_moments" ->
      """WITH m AS (
        |  SELECT o_orderstatus, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM (SELECT o_orderstatus,
        |          CAST(floor(o_totalprice / 10) AS BIGINT) AS x, o_custkey % 30000 AS y
        |        FROM orders) t
        |  GROUP BY o_orderstatus)
        |SELECT o_orderstatus, n,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
        |  (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    / CAST(n AS DOUBLE) AS var_pop,
        |  sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    / CAST(n AS DOUBLE)) AS stddev_pop,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_xy
        |FROM m ORDER BY o_orderstatus""".stripMargin,

    "q_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE CAST('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 10
        |ORDER BY doc_id""".stripMargin,

    "q_ngram_counts" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(tk) - 1),
        |    i -> array_to_string(tk[i:i+1], ' ')))) AS bigram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t)
        |SELECT bigram, count(*) AS df FROM sh GROUP BY bigram
        |ORDER BY df DESC, bigram LIMIT 20""".stripMargin,

    "q_text_stats" ->
      """SELECT doc_id, len(tk) AS n_tokens, len(list_distinct(tk)) AS n_uniq_tokens,
        |  len(list_distinct(tk)) / len(tk) AS type_token_ratio,
        |  (length(text) - len(tk) + 1) / len(tk) AS avg_token_len
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "q_lang_id" -> {
      val stops = TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH f AS (
         |  SELECT doc_id, lang,
         |    len(list_filter(string_split(text, ' '), t -> list_contains([$stops], t))) AS en_hits,
         |    len(string_split(text, ' ')) AS n_tokens
         |  FROM documents)
         |SELECT doc_id, en_hits, n_tokens, en_hits / n_tokens AS en_density,
         |  CASE WHEN en_hits / n_tokens >= 0.08 THEN 'en' ELSE 'other' END AS pred_lang,
         |  lang,
         |  (CASE WHEN en_hits / n_tokens >= 0.08 THEN 'en' ELSE 'other' END) = lang AS pred_match
         |FROM f ORDER BY doc_id""".stripMargin
    },

    "q_quality" -> {
      val stops = TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH f AS (
         |  SELECT doc_id,
         |    len(list_filter(tk, t -> list_contains([$stops], t))) / len(tk) AS en_density,
         |    len(list_distinct(tk)) / len(tk) AS type_token_ratio,
         |    len(tk) AS n_tokens
         |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t)
         |SELECT doc_id, en_density, type_token_ratio,
         |  least(en_density * 2.0, 1.0) * 0.4 + type_token_ratio * 0.4 +
         |    least(n_tokens / 256.0, 1.0) * 0.2 AS quality_score
         |FROM f ORDER BY doc_id""".stripMargin
    },

    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp, md5(substr(text, 1, 64)) AS fp_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "q_jaccard_pairs" ->
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |cand AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
         |                  HAVING count(*) > ${graft.llm.Dedup.DefaultMaxShingleDf})),
         |pairs AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM cand a JOIN cand b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, shared, c1.n AS n1, c2.n AS n2,
         |  shared / (c1.n + c2.n - shared) AS jaccard
         |FROM pairs JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
         |WHERE shared / (c1.n + c2.n - shared) >= 0.05
         |ORDER BY d1, d2""".stripMargin,

    "q_minhash_pairs" -> {
      val minhs = (0 until 8).map(j =>
        s"min(substr(m${j / 4}, ${1 + 8 * (j % 4)}, 8)) AS h$j").mkString(",\n         |    ")
      val bands = (0 until 8).map(j => s"struct_pack(band := $j, sig := h$j)").mkString(", ")
      s"""WITH $duckShingles,
         |hashed AS (
         |  SELECT doc_id, md5('0|' || s) AS m0, md5('1|' || s) AS m1 FROM sh),
         |sigs AS (
         |  SELECT doc_id,
         |    $minhs
         |  FROM hashed GROUP BY doc_id),
         |buckets AS (
         |  SELECT doc_id, u.band AS band, u.sig AS sig
         |  FROM (SELECT doc_id, unnest([$bands]) AS u FROM sigs) z)
         |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |ORDER BY d1, d2""".stripMargin
    },

    "q_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS h FROM tok),
        |votes AS (
        |  SELECT doc_id, j,
        |    sum(CASE WHEN (h // CAST(2**j AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(range(32)) AS j) js
        |  GROUP BY doc_id, j)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN v > 0 THEN CAST(2**j AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash32
        |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |dots AS (
         |  SELECT vec_id,
         |    ${duckDot("embedding", "qv")} AS dab,
         |    ${duckDot("embedding", "embedding")} AS daa,
         |    ${duckDot("qv", "qv")} AS dbb
         |  FROM embeddings, q)
         |SELECT vec_id, ${duckCos("dab", "daa", "dbb")} AS cosine
         |FROM dots ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin,

    "q_embed_near_dup" ->
      s"""WITH n AS (
         |  SELECT vec_id, label, embedding,
         |    ${duckDot("embedding", "embedding")} AS nrm
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2,
         |    ${duckCos("""list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)))""", "a.nrm", "b.nrm")} AS cosine
         |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT v1, v2, cosine FROM pairs WHERE cosine >= 0.25
         |ORDER BY v1, v2""".stripMargin,

    "q_ivf_search" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |dots AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckDot("e.embedding", "c.cv")} AS d
         |  FROM embeddings e CROSS JOIN cents c),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
         |    FROM dots) x WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |qc AS (SELECT cid AS qcid FROM assign WHERE vec_id = 0),
         |scored AS (
         |  SELECT e.vec_id,
         |    ${duckDot("e.embedding", "qv")} AS dab,
         |    ${duckDot("e.embedding", "e.embedding")} AS daa,
         |    ${duckDot("qv", "qv")} AS dbb
         |  FROM embeddings e
         |  JOIN assign a ON e.vec_id = a.vec_id
         |  JOIN qc ON a.cid = qc.qcid
         |  CROSS JOIN q)
         |SELECT vec_id, ${duckCos("dab", "daa", "dbb")} AS cosine
         |FROM scored ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,

    "q_ann_batch" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id IN (0, 7, 42)),
         |d AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
                         duckDot("e.embedding", "e.embedding"),
                         duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e CROSS JOIN q),
         |r AS (
         |  SELECT qid, vec_id,
         |    CAST(row_number() OVER (PARTITION BY qid
         |      ORDER BY greatest(CAST(0 AS BIGINT),
         |        CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)), vec_id)
         |      AS BIGINT) AS rn
         |  FROM d)
         |SELECT qid, rn, vec_id FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,

    "q_lsh_ann_buckets" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    (CAST('0x' || substr(md5('hp|' || CAST(p AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 2001 - 1000) / 1000.0 AS w
        |  FROM (SELECT unnest(range(12)) AS p) ps
        |  CROSS JOIN (SELECT unnest(range(64)) AS i) dims),
        |dots AS (
        |  SELECT e.vec_id, h.p,
        |    sum(CAST(floor(h.w * CAST(e.embedding[h.i + 1] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)) AS d
        |  FROM embeddings e CROSS JOIN hp h
        |  GROUP BY e.vec_id, h.p),
        |sigs AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN d >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS sig
        |  FROM dots GROUP BY vec_id)
        |SELECT sig, count(*) AS n_vectors, min(vec_id) AS min_vec
        |FROM sigs GROUP BY sig ORDER BY sig""".stripMargin,

    "q_vec_quantize" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS max_abs
        |  FROM embeddings),
        |s AS (
        |  SELECT e.vec_id, e.embedding,
        |    CASE WHEN q.max_abs > 0 THEN q.max_abs / 127.0 ELSE 0.0 END AS scale
        |  FROM embeddings e JOIN q ON e.vec_id = q.vec_id),
        |c AS (
        |  SELECT vec_id, scale, embedding,
        |    CASE WHEN scale > 0
        |      THEN list_transform(embedding,
        |             v -> CAST(floor(CAST(v AS DOUBLE) / scale + 0.5) AS INT))
        |      ELSE list_transform(embedding, v -> 0) END AS codes
        |  FROM s)
        |SELECT vec_id, scale,
        |  array_to_string(list_transform(codes, x -> CAST(x AS VARCHAR)), ',') AS codes_csv,
        |  CAST(list_sum(list_transform(generate_series(1, len(embedding)), i ->
        |    CAST(floor(abs(CAST(embedding[i] AS DOUBLE) - CAST(codes[i] AS DOUBLE) * scale)
        |         * 1000000000 + 0.5) AS BIGINT))) AS BIGINT) AS abs_err_fp
        |FROM c ORDER BY vec_id""".stripMargin,

    "q_curation_pipeline" -> {
      val stops = TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH scored AS (
         |  SELECT doc_id, text,
         |    len(list_filter(tk, t -> list_contains([$stops], t))) / len(tk) AS en_density,
         |    least(len(list_filter(tk, t -> list_contains([$stops], t))) / len(tk) * 2.0, 1.0) * 0.4
         |      + len(list_distinct(tk)) / len(tk) * 0.4
         |      + least(len(tk) / 256.0, 1.0) * 0.2 AS quality_score,
         |    tk
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents) t),
         |gated AS (
         |  SELECT * FROM scored WHERE en_density >= 0.05 AND quality_score >= 0.45),
         |deduped AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM gated) x WHERE rn = 1),
         |tokens AS (
         |  SELECT doc_id, quality_score,
         |    greatest(len(tk),
         |      CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4)) AS BIGINT))
         |      AS est_tokens
         |  FROM deduped)
         |SELECT count(*) AS n_docs_kept,
         |  CAST(sum(est_tokens) AS BIGINT) AS total_est_tokens,
         |  CAST(sum(CAST(floor(quality_score * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         |    / 1000000.0 / count(*) AS mean_quality
         |FROM tokens""".stripMargin
    },

    "q_token_estimate" ->
      """WITH f AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        |SELECT doc_id,
        |  len(tk) AS n_words,
        |  CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4)) AS BIGINT)
        |    AS est_bpe_tokens,
        |  greatest(len(tk),
        |    CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4)) AS BIGINT))
        |    AS est_tokens
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_component,
        |  CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |         * 1000000000 + 0.5) AS BIGINT))) AS BIGINT) AS head8_norm_fp,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_regexp" ->
      """SELECT o_orderkey,
        |  regexp_extract(o_orderpriority, '^([0-9])', 1) AS pri_digit,
        |  regexp_matches(o_orderpriority, '^[1-3]-') AS is_high_pri
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_union_all" ->
      """SELECT src, count(*) AS n FROM (
        |  SELECT o_custkey, 'high_value' AS src FROM orders WHERE o_totalprice > 400000
        |  UNION ALL
        |  SELECT o_custkey, 'f_status' AS src FROM orders WHERE o_orderstatus = 'F') t
        |GROUP BY src ORDER BY src""".stripMargin,

    "q_map_funcs" ->
      """WITH f AS (
        |  SELECT event_id, event_type, CAST(user_id AS VARCHAR) AS uid,
        |         coalesce(json_extract_string(props, '$.k'), '-1') AS kval
        |  FROM events)
        |SELECT event_id,
        |  'k,type,uid' AS keys_csv,
        |  kval || ',' || event_type || ',' || uid AS vals_csv,
        |  CAST(3 AS BIGINT) AS n_entries,
        |  CAST(CASE WHEN TRY_CAST(kval AS BIGINT) > 50 THEN 1 ELSE 0 END +
        |       CASE WHEN TRY_CAST(event_type AS BIGINT) > 50 THEN 1 ELSE 0 END +
        |       CASE WHEN TRY_CAST(uid AS BIGINT) > 50 THEN 1 ELSE 0 END AS BIGINT) AS n_big,
        |  CAST(4 AS BIGINT) AS n_concat,
        |  'k=' || kval || ',type=' || event_type || ',uid=' || uid AS entries_csv
        |FROM f ORDER BY event_id""".stripMargin,

    "q_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id, tk, unnest(range(0, len(tk), 48)) AS start
        |  FROM t WHERE len(tk) > 0)
        |SELECT doc_id, start // 48 AS chunk_idx,
        |  array_to_string(tk[start+1:start+64], ' ') AS chunk,
        |  least(64, len(tk) - start) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_media_dims" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'gif' END AS format,
        |  doc_id % 512 + 16 AS width,
        |  (doc_id * 3) % 512 + 16 AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sql_surface" -> sqlSurfaceText,

    "q_pack_windows" ->
      """WITH e AS (
        |  SELECT doc_id,
        |    greatest(len(tk),
        |      CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4)) AS BIGINT))
        |      AS est_tokens
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t),
        |c AS (
        |  SELECT doc_id, est_tokens,
        |    sum(est_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sum
        |  FROM e)
        |SELECT doc_id, est_tokens,
        |  CAST(run_sum - est_tokens AS BIGINT) AS start_offset,
        |  CAST((run_sum - est_tokens) // 2048 AS BIGINT) AS window_id,
        |  (run_sum - est_tokens) // 2048 <> (run_sum - 1) // 2048 AS crosses_boundary
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(greatest(len(tk) - 1, 0) AS BIGINT) AS n_2grams,
        |    CAST(len(list_distinct(list_transform(generate_series(1, len(tk) - 1),
        |      i -> array_to_string(tk[i:i+1], ' ')))) AS BIGINT) AS uniq_2grams,
        |    CAST(greatest(len(tk) - 2, 0) AS BIGINT) AS n_3grams,
        |    CAST(len(list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |      i -> array_to_string(tk[i:i+2], ' ')))) AS BIGINT) AS uniq_3grams
        |  FROM t)
        |SELECT doc_id, n_2grams, uniq_2grams,
        |  CASE WHEN n_2grams > 0 THEN 1.0 - uniq_2grams / n_2grams ELSE 0.0 END AS dup_2gram_ratio,
        |  n_3grams, uniq_3grams,
        |  CASE WHEN n_3grams > 0 THEN 1.0 - uniq_3grams / n_3grams ELSE 0.0 END AS dup_3gram_ratio
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |           THEN text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com now'
        |         WHEN doc_id % 11 = 0
        |           THEN text || ' see https://example.org/d/' || CAST(doc_id AS VARCHAR) || ' page'
        |         ELSE text END AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text2, 'https?://[a-z0-9./_-]+')) AS BIGINT) AS n_urls,
        |  md5(regexp_replace(regexp_replace(text2,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[a-z0-9./_-]+', '<URL>', 'g')) AS scrub_fp
        |FROM p ORDER BY doc_id""".stripMargin,

    "q_dedup_incremental" ->
      """SELECT doc_id, lang FROM documents
        |WHERE doc_id % 5 <> 0
        |  AND md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id % 5 = 0)
        |ORDER BY doc_id""".stripMargin,

    "q_dup_clusters" -> dupClustersOracle,

    // same semantic answer as q_dup_clusters — the engine runs star
    // contraction instead of min-label propagation
    "q_cc_star" -> dupClustersOracle,

    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE $dupClustersCtes,
         |lab AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node),
         |j AS (SELECT cluster, n_chars, node AS doc_id
         |      FROM lab JOIN documents ON node = documents.doc_id),
         |agg AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
         |    max(n_chars * 1000000000 + (999999999 - doc_id)) AS enc
         |  FROM j GROUP BY cluster)
         |SELECT cluster, 999999999 - enc % 1000000000 AS kept_doc,
         |  enc // 1000000000 AS kept_chars,
         |  n_members, n_members - 1 AS n_dropped
         |FROM agg ORDER BY cluster""".stripMargin,

    "q_contamination" ->
      s"""WITH $duckShingles,
         |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
         |cnt AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
         |hit AS (SELECT sh.doc_id, count(*) AS n_contaminated
         |        FROM sh JOIN bench ON sh.s = bench.s GROUP BY sh.doc_id)
         |SELECT c.doc_id, c.n_shingles,
         |  CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
         |  coalesce(h.n_contaminated, 0) / c.n_shingles AS contamination
         |FROM cnt c LEFT JOIN hit h ON c.doc_id = h.doc_id
         |ORDER BY c.doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  octet_length(encode(text)) % 640 + 1 AS width,
        |  (octet_length(encode(text)) * 7) % 480 + 1 AS height,
        |  CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'png'
        |       WHEN octet_length(encode(text)) % 3 = 1 THEN 'jpeg'
        |       ELSE 'webp' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // shared SQL texts: the oracle runs the same string spark.sql ran
    "q_exists_subquery" -> existsSubqueryText,
    "q_scalar_subquery" -> scalarSubqueryText,

    "q_outer_join" ->
      """WITH bld AS (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_mktsegment = 'BUILDING'),
        |ord AS (
        |  SELECT o_custkey, count(*) AS n_orders_raw,
        |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS spend_c
        |  FROM orders GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |  c_custkey IS NOT NULL AS in_segment,
        |  CAST(coalesce(n_orders_raw, 0) AS BIGINT) AS n_orders,
        |  coalesce(spend_c, 0) / CAST(100.0 AS DOUBLE) AS spend
        |FROM bld FULL JOIN ord ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_rolling_range" ->
      """WITH base AS (
        |  SELECT o_custkey, o_orderkey,
        |    datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        |  FROM orders WHERE o_custkey % 10 = 0)
        |SELECT o_custkey, o_orderkey, day,
        |  sum(price_c) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
        |    / CAST(100.0 AS DOUBLE) AS roll_30d,
        |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_30d
        |FROM base ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_scd2" ->
      """WITH base AS (
        |  SELECT o_custkey, o_orderkey, o_orderpriority,
        |    datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day
        |  FROM orders WHERE o_custkey % 7 = 0),
        |eod AS (
        |  SELECT * FROM (
        |    SELECT *, lead(day) OVER w AS nxt_day
        |    FROM base WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey))
        |  WHERE nxt_day IS NULL OR nxt_day <> day),
        |marked AS (
        |  SELECT *, lag(o_orderpriority) OVER w AS prev
        |  FROM eod WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey)),
        |changed AS (SELECT * FROM marked WHERE prev IS NULL OR prev <> o_orderpriority),
        |versioned AS (
        |  SELECT o_custkey, o_orderpriority, day AS valid_from,
        |    row_number() OVER w AS version,
        |    lead(day) OVER w - 1 AS valid_to_raw
        |  FROM changed WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey))
        |SELECT o_custkey, CAST(version AS BIGINT) AS version, o_orderpriority,
        |  valid_from, coalesce(valid_to_raw, 99999999) AS valid_to,
        |  valid_to_raw IS NULL AS is_current
        |FROM versioned ORDER BY o_custkey, version""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    (tf.tf * (n.n_docs + 1) * 1000000) // (df.df + 1) AS score_fp
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_fp DESC, term) AS rn
        |  FROM scored WHERE doc_id % 20 = 0)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, CAST(score_fp AS BIGINT) AS score_fp
        |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    "q_length_histogram" ->
      """SELECT least(n_chars // 200, 15) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_zorder" -> {
      val terms = graft.functions.kernels.zorder2ComposedSql("x", "y")
      s"""WITH z AS (
         |  SELECT CAST(p_size AS BIGINT) AS x, p_partkey % 4096 AS y FROM part),
         |z2 AS (SELECT x, y, CAST($terms AS BIGINT) AS zval FROM z)
         |SELECT zval // 4096 AS zbucket, CAST(count(*) AS BIGINT) AS n,
         |  CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
         |  CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
         |FROM z2 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q_salted_join" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    / CAST(100.0 AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_bucketed_join" ->
      """SELECT o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    / CAST(100.0 AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_cms_heavy" ->
      """WITH exact AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
        |cells AS (
        |  SELECT d, CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || '|'
        |        || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS w,
        |    sum(cnt) AS counter
        |  FROM exact CROSS JOIN (SELECT unnest([0,1,2]) AS d) ds
        |  GROUP BY 1, 2),
        |probes AS (SELECT user_id, cnt FROM exact WHERE user_id % 10 = 0),
        |est AS (
        |  SELECT p.user_id, p.cnt, min(c.counter) AS cms_est
        |  FROM probes p JOIN (SELECT unnest([0,1,2]) AS d) ds ON true
        |  JOIN cells c ON c.d = ds.d
        |    AND c.w = CAST(('0x' || substr(md5(CAST(ds.d AS VARCHAR) || '|'
        |          || CAST(p.user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64
        |  GROUP BY 1, 2)
        |SELECT user_id, CAST(cnt AS BIGINT) AS exact_count,
        |  CAST(cms_est AS BIGINT) AS cms_est, cms_est >= cnt AS admissible
        |FROM est ORDER BY user_id""".stripMargin,

    "q_unpivot" ->
      """WITH agg AS (
        |  SELECT l_returnflag,
        |    sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS sum_qty_c,
        |    sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sum_price_c,
        |    sum(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) AS sum_disc_fp
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, CAST(value AS BIGINT) AS value FROM (
        |  SELECT l_returnflag, 'sum_qty_c' AS measure, sum_qty_c AS value FROM agg
        |  UNION ALL SELECT l_returnflag, 'sum_price_c', sum_price_c FROM agg
        |  UNION ALL SELECT l_returnflag, 'sum_disc_fp', sum_disc_fp FROM agg)
        |ORDER BY l_returnflag, measure""".stripMargin,

    "q_interval_join" ->
      """WITH iv AS (
        |  SELECT o_orderkey,
        |    datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS s,
        |    datediff('day', TIMESTAMP '1995-01-01', o_orderdate) + 6 AS e,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        |  FROM orders WHERE o_custkey % 50 = 0),
        |promo AS (
        |  SELECT w, w * 30 AS ps, w * 30 + 9 AS pe
        |  FROM (SELECT unnest(generate_series(0, 80)) AS w))
        |SELECT w, CAST(count(*) AS BIGINT) AS n_overlaps,
        |  sum(price_c) / CAST(100.0 AS DOUBLE) AS overlap_spend
        |FROM promo JOIN iv ON s <= pe AND ps <= e
        |GROUP BY w ORDER BY w""".stripMargin,

    "q_edit_distance" ->
      """WITH p AS (
        |  SELECT doc_id, substr(text, 1, 48) AS pfx,
        |    lead(substr(text, 1, 48)) OVER (ORDER BY doc_id) AS nxt
        |  FROM documents)
        |SELECT doc_id, CAST(levenshtein(pfx, nxt) AS BIGINT) AS dist,
        |  CAST((levenshtein(pfx, nxt) * 1000000)
        |    // greatest(length(pfx), length(nxt)) AS BIGINT) AS ratio_fp
        |FROM p WHERE nxt IS NOT NULL AND doc_id % 5 = 0
        |ORDER BY doc_id""".stripMargin,

    // shared SQL texts: the oracle runs the same string spark.sql ran
    "q_recursive_cte" -> recursiveCteText,
    "q_lateral_topk" -> lateralTopkText,

    "q_arg_max" ->
      """WITH base AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 100000000
        |      + o_orderkey AS enc
        |  FROM orders)
        |SELECT o_orderpriority,
        |  arg_max(o_orderkey, enc) AS top_orderkey,
        |  (max(enc) // 100000000) / CAST(100.0 AS DOUBLE) AS max_price
        |FROM base GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_moving_avg" ->
      """WITH daily AS (
        |  SELECT o_orderpriority,
        |    datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day,
        |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c,
        |    count(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, day,
        |  rev_c / CAST(100.0 AS DOUBLE) AS day_revenue,
        |  sum(rev_c) OVER w / CAST(100.0 AS DOUBLE) AS win_revenue,
        |  CAST(sum(n) OVER w AS BIGINT) AS win_orders,
        |  (sum(rev_c) OVER w / CAST(100.0 AS DOUBLE))
        |    / CAST(count(*) OVER w AS BIGINT) AS centered_avg
        |FROM daily
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
        |  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |ORDER BY o_orderpriority, day""".stripMargin,

    "q_triangles" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM edges e1 JOIN edges e2 ON e1.v = e2.u
        |  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT a, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM tri GROUP BY a ORDER BY a""".stripMargin,

    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS sec FROM events),
        |g AS (
        |  SELECT user_id, event_id, sec,
        |    sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
        |  FROM e),
        |sess AS (
        |  SELECT user_id, sec,
        |    CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY sec, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM g)
        |SELECT user_id, min(sec) AS session_start, count(*) AS n_events,
        |  max(sec) - min(sec) AS span_secs
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,

    "q_weighted_sample" ->
      """WITH rated AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 90
        |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 15
        |         ELSE 40 END AS rate,
        |    CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 100 AS h
        |  FROM documents)
        |SELECT doc_id, source FROM rated WHERE h < rate ORDER BY doc_id""".stripMargin,

    "q_source_mix" ->
      """WITH tok AS (
        |  SELECT source, doc_id,
        |    greatest(len(string_split(text, ' ')),
        |      CAST(list_sum(list_transform(string_split(text, ' '),
        |        w -> (length(w) + 3) // 4)) AS BIGINT)) AS est_tokens
        |  FROM documents),
        |agg AS (SELECT source, count(*) AS n_docs, sum(est_tokens) AS toks
        |        FROM tok GROUP BY source),
        |tot AS (SELECT sum(toks) AS total FROM agg)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(toks AS BIGINT) AS est_tokens,
        |  CAST((toks * 1000000) // total AS BIGINT) AS share_ppm
        |FROM agg CROSS JOIN tot ORDER BY source""".stripMargin,

    "q_set_ops_all" ->
      """WITH a AS (SELECT l_returnflag FROM lineitem),
        |b AS (SELECT l_returnflag FROM lineitem WHERE l_linenumber > 1),
        |ea AS (SELECT l_returnflag FROM a EXCEPT ALL SELECT l_returnflag FROM b),
        |ia AS (SELECT l_returnflag FROM a INTERSECT ALL SELECT l_returnflag FROM b),
        |ec AS (SELECT l_returnflag, count(*) AS n_except FROM ea GROUP BY 1),
        |ic AS (SELECT l_returnflag, count(*) AS n_intersect FROM ia GROUP BY 1)
        |SELECT ec.l_returnflag, CAST(n_except AS BIGINT) AS n_except,
        |  CAST(n_intersect AS BIGINT) AS n_intersect
        |FROM ec JOIN ic ON ec.l_returnflag = ic.l_returnflag
        |ORDER BY ec.l_returnflag""".stripMargin,

    "q_pagerank" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |und AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
        |pr0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
        |pr1 AS (
        |  SELECT e.v AS node, 150000 + (85 * sum(p.pr // d.d)) // 100 AS pr
        |  FROM edges e JOIN pr0 p ON e.u = p.node JOIN deg d ON e.u = d.u
        |  GROUP BY e.v),
        |pr2 AS (
        |  SELECT e.v AS node, 150000 + (85 * sum(p.pr // d.d)) // 100 AS pr
        |  FROM edges e JOIN pr1 p ON e.u = p.node JOIN deg d ON e.u = d.u
        |  GROUP BY e.v),
        |pr3 AS (
        |  SELECT e.v AS node, 150000 + (85 * sum(p.pr // d.d)) // 100 AS pr
        |  FROM edges e JOIN pr2 p ON e.u = p.node JOIN deg d ON e.u = d.u
        |  GROUP BY e.v)
        |SELECT pr3.node, CAST(pr3.pr AS BIGINT) AS pr_fp,
        |  CAST(deg.d AS BIGINT) AS degree
        |FROM pr3 JOIN deg ON pr3.node = deg.u
        |ORDER BY pr3.node""".stripMargin,

    // shared SQL text: the oracle runs the same string spark.sql ran
    "q_nested_not_in" -> nestedNotInText,
    "q_late_suppliers" -> lateSuppliersText,

    // shared SQL texts (both engines run the identical string)
    "q_ntile_dist" -> ntileDistText,
    "q_rollup_grouping" -> rollupGroupingText,

    // rank-selection median; oracle = the window row_number formulation
    "q_median_scalable" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c, o_orderkey
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, c,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY c, o_orderkey) AS rnk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM c),
        |m AS (SELECT o_orderpriority, c, n FROM r
        |      WHERE rnk = (n + 1) // 2 OR rnk = (n + 2) // 2)
        |SELECT o_orderpriority,
        |  CAST(sum(c) AS DOUBLE) / count(*) / CAST(100.0 AS DOUBLE)
        |    AS median_price,
        |  CAST(max(n) AS BIGINT) AS n
        |FROM m GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // oracle = the WINDOW formulation; the engine runs the two-pass path
    "q_rank_scalable" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(row_number() OVER w AS BIGINT) AS rnk,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_agg_filters" -> aggFiltersText,

    "q_variant" ->
      """WITH b AS (
        |  SELECT event_id, user_id, event_type,
        |    coalesce(json_extract_string(props, '$.k'), '-1') AS k
        |  FROM events),
        |j AS (
        |  SELECT event_id,
        |    '{"u":' || user_id || ',"t":"' || event_type || '","vals":[' ||
        |      k || ',' || (CAST(k AS BIGINT) * 2) || ']}' AS js
        |  FROM b)
        |SELECT event_id,
        |  CAST(json_extract(js, '$.u') AS BIGINT) AS u,
        |  json_extract_string(js, '$.t') AS t,
        |  CAST(json_extract(js, '$.vals[1]') AS BIGINT) AS k2,
        |  TRY_CAST(json_extract_string(js, '$.t') AS BIGINT) AS t_as_int,
        |  'OBJECT<t: STRING, u: BIGINT, vals: ARRAY<BIGINT>>' AS v_schema
        |FROM j ORDER BY event_id""".stripMargin,

    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS sec
        |  FROM events),
        |u AS (SELECT user_id, count(*) AS n_events FROM e GROUP BY 1),
        |s1 AS (SELECT user_id, min(sec) AS t_signup FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(sec) AS t_click FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click'
        |         AND sec >= t_signup AND sec <= t_signup + 86400
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(sec) AS t_purchase FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase'
        |         AND sec >= t_click AND sec <= t_click + 86400
        |       GROUP BY e.user_id)
        |SELECT u.user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
        |            WHEN t_click IS NOT NULL THEN 2
        |            WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
        |  t_signup, t_click, t_purchase
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // the bloom is answer-transparent (false positives die in the exact
    // join), so the oracle is the plain semi-join the user would write
    "q_bloom_prune" ->
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_items,
        |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    / CAST(100.0 AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 8000)
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q_skyline" ->
      """WITH bysize AS (
        |  SELECT p_size,
        |    min(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * 100000000
        |        + p_partkey) AS enc
        |  FROM part GROUP BY p_size),
        |d AS (SELECT CAST(p_size AS BIGINT) AS p_size, enc // 100000000 AS best_c,
        |             enc % 100000000 AS best_partkey FROM bysize),
        |w AS (SELECT *, min(best_c) OVER (ORDER BY p_size
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM d)
        |SELECT p_size, best_c / CAST(100.0 AS DOUBLE) AS best_price, best_partkey
        |FROM w WHERE pm IS NULL OR best_c < pm ORDER BY p_size""".stripMargin,

    "q_paragraph_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id, tk, unnest(range(0, len(tk), 48)) AS start
        |  FROM t WHERE len(tk) > 0),
        |ch AS (
        |  SELECT doc_id, md5(array_to_string(tk[start+1:start+64], ' ')) AS fp
        |  FROM c),
        |occ AS (SELECT fp, count(*) AS n_occ FROM ch GROUP BY fp)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(*) FILTER (WHERE n_occ > 1) AS BIGINT) AS n_dup_chunks,
        |  (count(*) FILTER (WHERE n_occ > 1) * 1000000) // count(*) AS dup_ppm
        |FROM ch JOIN occ USING (fp) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // rank-selection percentiles; oracle = the window formulation
    "q_percentile_exact" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c, o_orderkey
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, c,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY c, o_orderkey) AS rnk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM c)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rnk = (n * 25 + 99) // 100 THEN c END)
        |    / CAST(100.0 AS DOUBLE) AS p25,
        |  max(CASE WHEN rnk = (n * 90 + 99) // 100 THEN c END)
        |    / CAST(100.0 AS DOUBLE) AS p90,
        |  max(CASE WHEN rnk = (n * 99 + 99) // 100 THEN c END)
        |    / CAST(100.0 AS DOUBLE) AS p99,
        |  CAST(max(n) AS BIGINT) AS n
        |FROM r
        |WHERE rnk IN ((n * 25 + 99) // 100, (n * 90 + 99) // 100,
        |              (n * 99 + 99) // 100)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_mode" ->
      """WITH cnts AS (
        |  SELECT c_nationkey, o_orderpriority, count(*) AS cnt
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |mx AS (SELECT c_nationkey, max(cnt) AS mx FROM cnts GROUP BY 1)
        |SELECT c_nationkey, min(o_orderpriority) AS mode_priority,
        |  CAST(max(mx) AS BIGINT) AS n_orders
        |FROM cnts JOIN mx USING (c_nationkey)
        |WHERE cnt = mx
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS prio,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |v_old AS (
        |  SELECT k, c, md5(prio || '|' || c) AS fp
        |  FROM base WHERE k % 10 <> 0),
        |v_new AS (
        |  SELECT k, c2 AS c, md5(prio || '|' || c2) AS fp
        |  FROM (SELECT k, prio,
        |          c + CASE WHEN k % 7 = 0 THEN 500 ELSE 0 END AS c2
        |        FROM base WHERE k % 10 <> 1))
        |SELECT coalesce(o.k, n.k) AS o_orderkey,
        |  CASE WHEN o.k IS NULL THEN 'insert'
        |       WHEN n.k IS NULL THEN 'delete'
        |       ELSE 'update' END AS change,
        |  o.c / CAST(100.0 AS DOUBLE) AS old_price,
        |  n.c / CAST(100.0 AS DOUBLE) AS new_price
        |FROM v_old o FULL OUTER JOIN v_new n ON o.k = n.k
        |WHERE o.k IS NULL OR n.k IS NULL OR o.fp <> n.fp
        |ORDER BY o_orderkey""".stripMargin,

    "q_containment" ->
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |cand AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
         |                  HAVING count(*) > ${graft.llm.Dedup.DefaultMaxShingleDf})),
         |p AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM cand a JOIN cand b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, CAST(shared AS BIGINT) AS shared,
         |  CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2,
         |  shared / c1.n AS contain_in_1, shared / c2.n AS contain_in_2
         |FROM p JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
         |WHERE greatest(shared / c1.n, shared / c2.n) >= 0.2
         |ORDER BY d1, d2""".stripMargin,

    "q_bm25" -> {
      def termSql(i: Int): String =
        s"CAST(floor(((n_docs - df_$i + CAST(0.5 AS DOUBLE)) / (df_$i + CAST(0.5 AS DOUBLE)))" +
          s" * ((tf_$i * CAST(2.2 AS DOUBLE)) / (tf_$i + CAST(1.2 AS DOUBLE)" +
          s" * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * ((dl * n_docs) / sum_dl))))" +
          s" * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
      val tfs = Bm25Terms.zipWithIndex.map { case (term, i) =>
        s"CAST(len(list_filter(tk, x -> x = '$term')) AS BIGINT) AS tf_$i"
      }.mkString(",\n    ")
      val dfs = Bm25Terms.indices.map(i =>
        s"CAST(count(*) FILTER (WHERE tf_$i > 0) AS BIGINT) AS df_$i")
        .mkString(",\n    ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |s AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
         |    $tfs
         |  FROM t),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(dl) AS BIGINT) AS sum_dl,
         |    $dfs
         |  FROM s),
         |sc AS (SELECT doc_id, dl, tf_0, tf_1, tf_2,
         |    ${Bm25Terms.indices.map(termSql).mkString(" + ")} AS score_fp
         |  FROM s, g)
         |SELECT doc_id, dl, tf_0, tf_1, tf_2, score_fp,
         |  score_fp / CAST(1000000.0 AS DOUBLE) AS score
         |FROM sc ORDER BY score_fp DESC, doc_id LIMIT 50""".stripMargin
    },

    // oracle mirrors the decomposition's candidate set (a superset of
    // the skyline), then applies the textbook NOT EXISTS dominance test
    "q_skyline3d" ->
      """WITH d AS (
        |  SELECT CAST(p_size AS BIGINT) AS size,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
        |    CAST(length(p_name) AS BIGINT) AS name_len,
        |    count(*) AS n_parts, min(p_partkey) AS rep_partkey
        |  FROM part GROUP BY 1, 2, 3),
        |pp AS (
        |  SELECT size, price_c, name_len, n_parts, rep_partkey
        |  FROM (SELECT *, row_number() OVER (PARTITION BY size, price_c
        |                                     ORDER BY name_len) AS rn FROM d)
        |  WHERE rn = 1),
        |cand AS (
        |  SELECT * FROM (
        |    SELECT *, min(name_len) OVER (PARTITION BY size ORDER BY price_c
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |    FROM pp)
        |  WHERE pm IS NULL OR name_len < pm)
        |SELECT size, price_c / CAST(100.0 AS DOUBLE) AS price, name_len,
        |  CAST(n_parts AS BIGINT) AS n_parts, rep_partkey
        |FROM cand a
        |WHERE NOT EXISTS (SELECT 1 FROM cand b
        |  WHERE b.size <= a.size AND b.price_c <= a.price_c
        |    AND b.name_len <= a.name_len
        |    AND (b.size < a.size OR b.price_c < a.price_c
        |         OR b.name_len < a.name_len))
        |ORDER BY size, price""".stripMargin,

    "q_bfs" ->
      """WITH RECURSIVE items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |walk AS (
        |  SELECT u AS node, 0 AS dist
        |  FROM (SELECT DISTINCT u FROM edges) s WHERE u % 100 = 0
        |  UNION
        |  SELECT e.v, w.dist + 1 FROM edges e JOIN walk w ON e.u = w.node
        |  WHERE w.dist < 30)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,

    "q_profile" -> {
      def row(label: String, c: String): String =
        s"""SELECT '$label' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_s,
           |  CAST(max($c) AS VARCHAR) AS max_s FROM c""".stripMargin
      val rows = Seq(
        row("c_custkey", "c_custkey"), row("c_name", "c_name"),
        row("c_nationkey", "c_nationkey"),
        row("c_mktsegment", "c_mktsegment"),
        row("c_acctbal_cents", "bal_c")).mkString("\nUNION ALL\n")
      s"""WITH c AS (SELECT *,
         |  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
         |  FROM customer)
         |$rows
         |ORDER BY col_name""".stripMargin
    },

    "q_outliers_iqr" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c, o_orderkey
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, c,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY c, o_orderkey) AS rnk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM c),
        |f AS (
        |  SELECT o_orderpriority,
        |    max(CASE WHEN rnk = (n * 25 + 99) // 100 THEN c END) AS p25_c,
        |    max(CASE WHEN rnk = (n * 75 + 99) // 100 THEN c END) AS p75_c,
        |    max(n) AS n_total
        |  FROM r
        |  WHERE rnk IN ((n * 25 + 99) // 100, (n * 75 + 99) // 100)
        |  GROUP BY o_orderpriority),
        |g AS (
        |  SELECT o_orderpriority, p25_c, p75_c, n_total,
        |    p25_c - ((p75_c - p25_c) // 2) AS lo_c,
        |    p75_c + ((p75_c - p25_c) // 2) AS hi_c
        |  FROM f)
        |SELECT g.o_orderpriority,
        |  p25_c / CAST(100.0 AS DOUBLE) AS p25,
        |  p75_c / CAST(100.0 AS DOUBLE) AS p75,
        |  lo_c / CAST(100.0 AS DOUBLE) AS lo_fence,
        |  hi_c / CAST(100.0 AS DOUBLE) AS hi_fence,
        |  CAST(max(n_total) AS BIGINT) AS n_total,
        |  CAST(count(*) FILTER (WHERE c.c < lo_c) AS BIGINT) AS n_low,
        |  CAST(count(*) FILTER (WHERE c.c > hi_c) AS BIGINT) AS n_high,
        |  CAST(count(*) FILTER (WHERE c.c < lo_c OR c.c > hi_c) AS BIGINT)
        |    AS n_outliers
        |FROM g JOIN c ON g.o_orderpriority = c.o_orderpriority
        |GROUP BY g.o_orderpriority, p25_c, p75_c, lo_c, hi_c
        |ORDER BY g.o_orderpriority""".stripMargin,

    // prefix filtering is answer-transparent: the oracle is the PLAIN
    // (uncapped) inverted-index Jaccard join a user would write
    "q_jaccard_prefix" ->
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |p AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, CAST(shared AS BIGINT) AS shared,
         |  CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2,
         |  shared / (c1.n + c2.n - shared) AS jaccard
         |FROM p JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
         |WHERE shared / (c1.n + c2.n - shared) >= 0.05
         |ORDER BY d1, d2""".stripMargin,

    "q_sssp" ->
      """WITH RECURSIVE items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v,
        |    1 + (a.l_partkey + b.l_partkey) % 5 AS w
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  WHERE (a.l_partkey + b.l_partkey) % 7 = 0),
        |walk AS (
        |  SELECT u AS node, CAST(0 AS BIGINT) AS dist
        |  FROM (SELECT DISTINCT u FROM edges) s WHERE u % 1000 = 0
        |  UNION
        |  SELECT e.v, w.dist + e.w FROM edges e JOIN walk w ON e.u = w.node
        |  WHERE w.dist + e.w < 100)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,

    "q_retention" ->
      """WITH w AS (
        |  SELECT DISTINCT user_id,
        |    (epoch_ns(ts) // 1000000000) // 604800 AS week
        |  FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
        |FROM w JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_table_checksum" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  bit_xor(CAST('0x' || substr(md5(
        |    o_orderkey || '|' || o_custkey || '|' ||
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 1, 15)
        |    AS BIGINT)) AS checksum
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // merge-of-sums == sum-of-union, so the oracle histograms the raw
    // data at region level directly; quantile pick is the same integer
    // rank threshold
    "q_hist_quantile" ->
      """WITH src AS (
        |  SELECT n_nationkey, n_regionkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |bkt AS (
        |  SELECT n_regionkey,
        |    LEAST(GREATEST(c, 0), 63999999) // 1000000 AS idx
        |  FROM src),
        |cnts AS (SELECT n_regionkey, idx, count(*) AS cnt
        |         FROM bkt GROUP BY 1, 2),
        |cum AS (
        |  SELECT n_regionkey, idx, cnt,
        |    sum(cnt) OVER (PARTITION BY n_regionkey ORDER BY idx) AS cum,
        |    sum(cnt) OVER (PARTITION BY n_regionkey) AS n
        |  FROM cnts),
        |p50 AS (SELECT n_regionkey, min(idx) AS b50 FROM cum
        |        WHERE cum * 2 >= n GROUP BY 1),
        |p95 AS (SELECT n_regionkey, min(idx) AS b95 FROM cum
        |        WHERE cum * 20 >= n * 19 GROUP BY 1),
        |agg AS (
        |  SELECT n_regionkey, count(DISTINCT n_nationkey) AS n_nations,
        |    count(*) AS n_orders
        |  FROM src GROUP BY 1)
        |SELECT r_name, CAST(n_nations AS BIGINT) AS n_nations,
        |  CAST(n_orders AS BIGINT) AS n_orders,
        |  b50 * 10000 AS p50_bucket_lo, b95 * 10000 AS p95_bucket_lo
        |FROM agg JOIN p50 USING (n_regionkey) JOIN p95 USING (n_regionkey)
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY r_name""".stripMargin,

    "q_islands" ->
      """WITH iv0 AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS st,
        |    l_orderkey, l_linenumber
        |  FROM lineitem),
        |iv AS (
        |  SELECT l_suppkey, st,
        |    st + 1 + (l_orderkey + l_linenumber) % 14 AS en,
        |    l_orderkey, l_linenumber
        |  FROM iv0),
        |f AS (
        |  SELECT l_suppkey, st, en,
        |    max(en) OVER (PARTITION BY l_suppkey
        |      ORDER BY st, en, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm,
        |    CASE WHEN max(en) OVER (PARTITION BY l_suppkey
        |      ORDER BY st, en, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR st > max(en) OVER (PARTITION BY l_suppkey
        |      ORDER BY st, en, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS is_start,
        |    l_orderkey, l_linenumber
        |  FROM iv),
        |w AS (
        |  SELECT l_suppkey, st, en,
        |    sum(is_start) OVER (PARTITION BY l_suppkey
        |      ORDER BY st, en, l_orderkey, l_linenumber) AS island
        |  FROM f),
        |isl AS (
        |  SELECT l_suppkey, island, min(st) AS i_start, max(en) AS i_end,
        |    count(*) AS i_n
        |  FROM w GROUP BY 1, 2)
        |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(i_end - i_start + 1) AS BIGINT) AS covered_days,
        |  CAST(sum(i_n) AS BIGINT) AS n_intervals
        |FROM isl GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q_market_share" ->
      """WITH sup AS (
        |  SELECT s_suppkey, r_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |agg AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS total_c,
        |    CAST(sum(CASE WHEN r_name = 'ASIA'
        |      THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS asia_c
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN sup ON l_suppkey = s_suppkey
        |  GROUP BY 1)
        |SELECT o_year,
        |  total_c / CAST(100.0 AS DOUBLE) AS total_revenue,
        |  asia_c / CAST(100.0 AS DOUBLE) AS asia_revenue,
        |  CAST(asia_c AS DOUBLE) / total_c AS asia_share
        |FROM agg ORDER BY o_year""".stripMargin,

    // the oracle recomputes each sketch's registers from raw data (the
    // same md5/rho math as q_hll_rollup); the union sketch is the
    // per-register max over BOTH regions' rows
    "q_hll_intersect" -> {
      def est(t: String, nreg: String): String =
        s"(0.709 * 64 * 64) / (CAST($t + (64 - $nreg) * (CAST(1 AS BIGINT) << 55) AS DOUBLE) / 36028797018963968.0)"
      s"""WITH h AS (
         |  SELECT r_name, l_partkey,
         |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name IN ('ASIA', 'EUROPE')),
         |rh AS (
         |  SELECT r_name, h % 64 AS reg,
         |    CASE WHEN h // 64 = 0 THEN 55
         |         ELSE CAST(log2(CAST((h // 64) & (-(h // 64)) AS DOUBLE)) AS INT) + 1
         |    END AS rho
         |  FROM h),
         |ra AS (SELECT reg, max(rho) AS mrho FROM rh WHERE r_name = 'ASIA' GROUP BY 1),
         |rb AS (SELECT reg, max(rho) AS mrho FROM rh WHERE r_name = 'EUROPE' GROUP BY 1),
         |ru AS (SELECT reg, max(rho) AS mrho FROM rh GROUP BY 1),
         |sa AS (SELECT CAST(sum(CAST(1 AS BIGINT) << (55 - mrho)) AS BIGINT) AS t,
         |              count(*) AS nreg FROM ra),
         |sb AS (SELECT CAST(sum(CAST(1 AS BIGINT) << (55 - mrho)) AS BIGINT) AS t,
         |              count(*) AS nreg FROM rb),
         |su AS (SELECT CAST(sum(CAST(1 AS BIGINT) << (55 - mrho)) AS BIGINT) AS t,
         |              count(*) AS nreg FROM ru),
         |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_intersect
         |       FROM (SELECT l_partkey FROM h GROUP BY l_partkey
         |             HAVING count(DISTINCT r_name) = 2) q)
         |SELECT
         |  ${est("sa.t", "sa.nreg")} AS est_a,
         |  ${est("sb.t", "sb.nreg")} AS est_b,
         |  ${est("su.t", "su.nreg")} AS est_union,
         |  ${est("sa.t", "sa.nreg")} + ${est("sb.t", "sb.nreg")}
         |    - ${est("su.t", "su.nreg")} AS est_intersect,
         |  exact_intersect
         |FROM sa, sb, su, ex""".stripMargin
    },

    // the oracle recomputes version B's aggregate DIRECTLY — the gate
    // proves the incrementally-maintained view equals the rescan
    "q_ivm" ->
      """WITH v_new AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS prio,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |      + CASE WHEN o_orderkey % 7 = 0 THEN 500 ELSE 0 END AS c
        |  FROM orders WHERE o_orderkey % 10 <> 1)
        |SELECT prio AS o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  sum(c) / CAST(100.0 AS DOUBLE) AS total_price
        |FROM v_new GROUP BY prio ORDER BY prio""".stripMargin,

    "q_er_match" ->
      """SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |  a.p_name AS name1, b.p_name AS name2,
        |  a.p_brand AS block_brand, CAST(a.p_size AS BIGINT) AS block_size,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |  AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY k1, k2""".stripMargin,

    // oracle = the same exact integer position/fraction selection over
    // the window row_number formulation
    "q_percentile_cont" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c, o_orderkey
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, c,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY c, o_orderkey) AS rnk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM c),
        |sel AS (
        |  SELECT o_orderpriority, c, rnk, n,
        |    (90 * (n - 1)) // 100 + 1 AS r1,
        |    (90 * (n - 1)) % 100 AS frac
        |  FROM r),
        |f AS (
        |  SELECT o_orderpriority,
        |    max(CASE WHEN rnk = r1 THEN c END) AS v1,
        |    max(CASE WHEN rnk = r1 + 1 THEN c END) AS v2,
        |    max(frac) AS frac, max(n) AS n
        |  FROM sel WHERE rnk = r1 OR rnk = r1 + 1
        |  GROUP BY o_orderpriority)
        |SELECT o_orderpriority,
        |  (v1 * 100 + frac * (coalesce(v2, v1) - v1))
        |    / CAST(10000.0 AS DOUBLE) AS p90_cont,
        |  CAST(n AS BIGINT) AS n
        |FROM f ORDER BY o_orderpriority""".stripMargin,

    "q_interpolate" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |known AS (SELECT day, v FROM daily WHERE day % 3 = 0),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM known),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS day FROM b),
        |j AS (SELECT s.day, k.v FROM spine s LEFT JOIN known k USING (day)),
        |w AS (
        |  SELECT day, v,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t1,
        |    last_value(v IGNORE NULLS)
        |      OVER (ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v1,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (ORDER BY day
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t2,
        |    first_value(v IGNORE NULLS)
        |      OVER (ORDER BY day
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v2
        |  FROM j)
        |SELECT day, v IS NOT NULL AS known,
        |  (CASE WHEN v IS NOT NULL THEN v
        |        ELSE (v1 * (t2 - t1) + (v2 - v1) * (day - t1)) // (t2 - t1)
        |   END) / CAST(100.0 AS DOUBLE) AS value
        |FROM w WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        |ORDER BY day""".stripMargin,

    // shared SQL texts (TPC-H completion sweep): the oracle runs the
    // same string spark.sql ran
    "q_volume_shipping" -> volumeShippingText,
    "q_product_profit" -> productProfitText,
    "q_custdist" -> custDistText,
    "q_promo_share" -> promoShareText,
    "q_top_supplier" -> topSupplierText,
    "q_big_orders" -> bigOrdersText,
    "q_idle_customers" -> idleCustomersText,
    "q_forecast_revenue" -> forecastRevenueText,

    // the oracle replays the KMV sketch literally: k smallest distinct
    // 60-bit hashes per group via ORDER BY h LIMIT k, then the same
    // exact-below-capacity / single-division estimator
    "q_kmv_rollup" ->
      """WITH h AS (
        |  SELECT n_nationkey, n_regionkey, l_partkey,
        |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |dh AS (SELECT DISTINCT n_regionkey, h FROM h),
        |rk AS (
        |  SELECT n_regionkey, h,
        |    row_number() OVER (PARTITION BY n_regionkey ORDER BY h) AS rn
        |  FROM dh),
        |sk AS (
        |  SELECT n_regionkey, count(*) AS cnt, max(h) AS kth
        |  FROM rk WHERE rn <= 64 GROUP BY 1),
        |nn AS (
        |  SELECT n_regionkey, CAST(count(DISTINCT n_nationkey) AS BIGINT)
        |    AS n_nations
        |  FROM h GROUP BY 1),
        |ex AS (
        |  SELECT n_regionkey, CAST(count(DISTINCT l_partkey) AS BIGINT)
        |    AS exact_distinct
        |  FROM h GROUP BY 1)
        |SELECT r_name, n_nations,
        |  CASE WHEN cnt < 64 THEN CAST(cnt AS DOUBLE)
        |       ELSE 63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)
        |  END AS kmv_estimate,
        |  exact_distinct
        |FROM sk
        |JOIN nn USING (n_regionkey)
        |JOIN ex USING (n_regionkey)
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY r_name""".stripMargin,

    "q_kmv_jaccard" ->
      """WITH h AS (
        |  SELECT r_name, l_partkey,
        |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name IN ('ASIA', 'EUROPE')),
        |ka AS (SELECT h FROM (SELECT DISTINCT h FROM h WHERE r_name = 'ASIA') q
        |       ORDER BY h LIMIT 64),
        |kb AS (SELECT h FROM (SELECT DISTINCT h FROM h WHERE r_name = 'EUROPE') q
        |       ORDER BY h LIMIT 64),
        |ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) q
        |       ORDER BY h LIMIT 64),
        |sa AS (SELECT count(*) AS cnt, max(h) AS kth FROM ka),
        |sb AS (SELECT count(*) AS cnt, max(h) AS kth FROM kb),
        |su AS (SELECT count(*) AS cnt, max(h) AS kth FROM ku),
        |mj AS (SELECT CAST(count(*) AS BIGINT) AS m,
        |              (SELECT count(*) FROM ku) AS u
        |       FROM ku
        |       WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
        |ex AS (SELECT
        |    CAST(sum(CASE WHEN nr = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS exact_intersect,
        |    CAST(count(*) AS BIGINT) AS exact_union
        |  FROM (SELECT l_partkey, count(DISTINCT r_name) AS nr
        |        FROM h GROUP BY 1) q)
        |SELECT
        |  CASE WHEN sa.cnt < 64 THEN CAST(sa.cnt AS DOUBLE)
        |       ELSE 63.0 * 1152921504606846976.0 / CAST(sa.kth AS DOUBLE)
        |  END AS est_a,
        |  CASE WHEN sb.cnt < 64 THEN CAST(sb.cnt AS DOUBLE)
        |       ELSE 63.0 * 1152921504606846976.0 / CAST(sb.kth AS DOUBLE)
        |  END AS est_b,
        |  CASE WHEN su.cnt < 64 THEN CAST(su.cnt AS DOUBLE)
        |       ELSE 63.0 * 1152921504606846976.0 / CAST(su.kth AS DOUBLE)
        |  END AS est_union,
        |  CAST(m AS DOUBLE) / u AS est_jaccard,
        |  exact_intersect, exact_union,
        |  CAST(exact_intersect AS DOUBLE) / exact_union AS exact_jaccard
        |FROM sa, sb, su, mj, ex""".stripMargin,

    // the z-score is one division + one sqrt of exact int64 moments —
    // identical IEEE ops in both engines
    "q_anomaly" ->
      """WITH daily AS (
        |  SELECT n_name,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) // 100 AS x
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS q
        |  FROM daily GROUP BY 1)
        |SELECT n_name, day, x AS revenue_usd,
        |  CAST(x * n - s AS DOUBLE) / sqrt(CAST(n * q - s * s AS DOUBLE))
        |    AS z
        |FROM daily JOIN m USING (n_name)
        |WHERE abs(CAST(x * n - s AS DOUBLE)
        |          / sqrt(CAST(n * q - s * s AS DOUBLE))) > 3.0
        |ORDER BY n_name, day""".stripMargin,

    "q_locf" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |known AS (SELECT day, v FROM daily WHERE day % 5 = 0),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM known),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS day FROM b),
        |j AS (SELECT s.day, k.v FROM spine s LEFT JOIN known k USING (day)),
        |w AS (
        |  SELECT day, v,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t1,
        |    last_value(v IGNORE NULLS)
        |      OVER (ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v1
        |  FROM j)
        |SELECT day, v IS NOT NULL AS known,
        |  v1 / CAST(100.0 AS DOUBLE) AS value,
        |  CAST(day - t1 AS BIGINT) AS staleness_days
        |FROM w WHERE t1 IS NOT NULL
        |ORDER BY day""".stripMargin,

    "q_fk_orphans" ->
      """SELECT * FROM (
        |  SELECT 'customer->nation' AS fk_edge,
        |    CAST(count(*) AS BIGINT) AS child_rows,
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS orphans
        |  FROM customer
        |  LEFT JOIN (SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS k
        |             FROM nation) p ON CAST(c_nationkey AS BIGINT) = p.k
        |  UNION ALL
        |  SELECT 'lineitem->orders', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |    ON l_orderkey = p.k
        |  UNION ALL
        |  SELECT 'lineitem->part', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
        |    ON l_partkey = p.k
        |  UNION ALL
        |  SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) p
        |    ON l_suppkey = p.k
        |  UNION ALL
        |  SELECT 'lineitem_corrupted->part', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM (SELECT CASE WHEN l_orderkey % 1000 = 0
        |                    THEN l_partkey + 1000000000
        |                    ELSE l_partkey END AS fk
        |        FROM lineitem) c
        |  LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
        |    ON c.fk = p.k
        |  UNION ALL
        |  SELECT 'nation->region', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM nation
        |  LEFT JOIN (SELECT DISTINCT CAST(r_regionkey AS BIGINT) AS k
        |             FROM region) p ON CAST(n_regionkey AS BIGINT) = p.k
        |  UNION ALL
        |  SELECT 'orders->customer', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
        |    ON o_custkey = p.k
        |  UNION ALL
        |  SELECT 'supplier->nation', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM supplier
        |  LEFT JOIN (SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS k
        |             FROM nation) p ON CAST(s_nationkey AS BIGINT) = p.k
        |) q ORDER BY fk_edge""".stripMargin,

    // the oracle expresses the strict as-of as lag() over the same
    // unique composite time key
    "q_asof_native" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, day,
        |  lag(o_orderkey) OVER w AS prev_orderkey,
        |  day - lag(day) OVER w AS gap_days
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY day * 1099511627776 + o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT doc_id, source, t AS tok
        |  FROM (SELECT doc_id, source,
        |          unnest(string_split(text, ' ')) AS t
        |        FROM documents) q
        |  WHERE length(t) > 0),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS df
        |    FROM (SELECT DISTINCT tok, doc_id FROM tok) d
        |    GROUP BY tok) f
        |  ORDER BY df DESC, tok LIMIT 256)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS oov_tokens,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS oov_ppm
        |FROM tok LEFT JOIN vocab v ON tok.tok = v.tok
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // the oracle replays the MERGE independently: same synthesized CDC
    // batch, same branch semantics, per-priority exact-cents totals
    "q_merge_upsert" ->
      """WITH tgt AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS prio,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |src AS (
        |  SELECT k, prio, c + 500 AS c, 'U' AS op FROM tgt WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT k, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), 'D'
        |  FROM tgt WHERE k % 7 = 1
        |  UNION ALL
        |  SELECT k + 100000000, prio, c + 123, 'I' FROM tgt WHERE k % 13 = 0),
        |m AS (
        |  SELECT
        |    CASE WHEN s.op IS NULL THEN t.prio ELSE s.prio END AS prio,
        |    CASE WHEN s.op IS NULL THEN t.c ELSE s.c END AS c
        |  FROM tgt t FULL OUTER JOIN src s ON t.k = s.k
        |  WHERE s.op IS NULL OR s.op <> 'D')
        |SELECT prio AS o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(c) AS BIGINT) / CAST(100.0 AS DOUBLE) AS total_price
        |FROM m GROUP BY prio ORDER BY prio""".stripMargin,

    "q_rarity" ->
      """WITH tok AS (
        |  SELECT doc_id, t AS tok
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |        FROM documents) q
        |  WHERE length(t) > 0),
        |df AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS df
        |  FROM (SELECT DISTINCT tok, doc_id FROM tok) d GROUP BY tok),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(CAST(sum((nd * 1000000) // df) AS BIGINT) // count(*)
        |    AS BIGINT) AS mean_idf_micro
        |FROM tok JOIN df USING (tok), nd
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the oracle recomputes each leakage-free label as a correlated
    // COUNT — a different algorithm from the running-count as-of
    "q_features_asof" ->
      """SELECT e.event_id, e.user_id,
        |  CAST((SELECT count(*) FROM events c
        |        WHERE c.user_id = e.user_id AND c.event_type = 'click'
        |          AND c.ts < e.ts) AS BIGINT) AS clicks_before
        |FROM events e WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin,

    // the oracle replays both sides: the register math per day (same
    // rho convention as q_hll_rollup) with a per-register rolling max
    // over the day domain, and the exact window by BETWEEN range join
    "q_rolling_distinct" ->
      """WITH o AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    o_custkey,
        |    CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM orders),
        |rh AS (
        |  SELECT day, h % 64 AS reg,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE CAST(log2(CAST((h // 64) & (-(h // 64)) AS DOUBLE)) AS INT) + 1
        |    END AS rho
        |  FROM o),
        |dr AS (SELECT day, reg, max(rho) AS mrho FROM rh GROUP BY 1, 2),
        |grid AS (
        |  SELECT s.day, g.reg
        |  FROM (SELECT DISTINCT day FROM o) s,
        |       (SELECT unnest(range(0, 64)) AS reg) g),
        |roll AS (
        |  SELECT day, reg,
        |    max(m0) OVER (PARTITION BY reg ORDER BY day
        |                  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS m
        |  FROM (SELECT grid.day, grid.reg, coalesce(dr.mrho, 0) AS m0
        |        FROM grid LEFT JOIN dr
        |          ON grid.day = dr.day AND grid.reg = dr.reg) c),
        |est AS (
        |  SELECT day,
        |    (0.709 * 64 * 64) /
        |      (CAST(sum(CAST(1 AS BIGINT) << (55 - m)) AS DOUBLE)
        |        / 36028797018963968.0) AS est_distinct
        |  FROM roll GROUP BY day),
        |ex AS (
        |  SELECT s.day, CAST(count(DISTINCT o.o_custkey) AS BIGINT)
        |    AS exact_distinct
        |  FROM (SELECT DISTINCT day FROM o) s
        |  JOIN o ON o.day BETWEEN s.day - 29 AND s.day
        |  GROUP BY s.day)
        |SELECT day, est_distinct, exact_distinct
        |FROM est JOIN ex USING (day)
        |ORDER BY day""".stripMargin,

    "q_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev,
        |    event_type AS next
        |  FROM events),
        |c AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev, CAST(sum(n) AS BIGINT) AS total
        |      FROM c GROUP BY 1)
        |SELECT prev, next, n,
        |  CAST(n * 1000000 // total AS BIGINT) AS prob_ppm
        |FROM c JOIN t USING (prev)
        |ORDER BY prev, next""".stripMargin,

    "q_trend_test" ->
      """WITH m AS (
        |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        |      AS m,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1
        |                       WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
        |      AS s_stat,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM m a JOIN m b ON a.m < b.m),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM m)
        |SELECT n_months, s_stat, n_pairs,
        |  CAST(s_stat * 1000000 // n_pairs AS BIGINT) AS tau_ppm
        |FROM p, n""".stripMargin,

    // the same two-step truncating division as the engine — d² alone
    // would overflow int64
    "q_chi_square" ->
      """WITH j AS (
        |  SELECT o_orderpriority AS prio, c_mktsegment AS seg
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cells AS (SELECT prio, seg, CAST(count(*) AS BIGINT) AS n
        |          FROM j GROUP BY 1, 2),
        |r AS (SELECT prio, CAST(sum(n) AS BIGINT) AS r FROM cells GROUP BY 1),
        |c AS (SELECT seg, CAST(sum(n) AS BIGINT) AS c FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
        |k AS (
        |  SELECT prio, seg, n, r.r, c.c, nn,
        |    CAST(((n * nn - r.r * c.c) * 1000000 // (r.r * c.c))
        |      * (n * nn - r.r * c.c) // nn AS BIGINT) AS contrib_micro
        |  FROM cells JOIN r USING (prio) JOIN c USING (seg), t),
        |x AS (SELECT CAST(sum(contrib_micro) AS BIGINT) AS chi2_micro FROM k)
        |SELECT prio, seg, n,
        |  CAST((r * c * 1000000) // nn AS BIGINT) AS expected_micro,
        |  contrib_micro, chi2_micro
        |FROM k, x ORDER BY prio, seg""".stripMargin,

    "q_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus,
        |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
        |  FROM events),
        |w AS (
        |  SELECT user_id, v,
        |    (lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |      - tus) // 1000 AS wt
        |  FROM e),
        |g AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
        |    CAST(sum(wt) AS BIGINT) AS span_ms,
        |    CAST(sum(v * wt) AS BIGINT) AS vw
        |  FROM w WHERE wt IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_obs, span_ms,
        |  CAST(vw AS DOUBLE) / span_ms / 1000.0 AS twap
        |FROM g WHERE user_id % 17 = 0 ORDER BY user_id""".stripMargin,

    "q_data_skew" -> {
      def edge(name: String, table: String, key: String): String =
        s"""SELECT '$name' AS join_key, n_keys, n_rows, max_f,
           |  CAST(max_f * 1000000 // n_rows AS BIGINT) AS top_share_ppm,
           |  p50_f, p99_f,
           |  CAST(p99_f * 100 // p50_f AS BIGINT) AS p99_over_p50_pct
           |FROM (
           |  WITH f1 AS (SELECT $key AS k, CAST(count(*) AS BIGINT) AS f
           |              FROM $table GROUP BY 1),
           |  s1 AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
           |           CAST(sum(f) AS BIGINT) AS n_rows,
           |           CAST(max(f) AS BIGINT) AS max_f FROM f1),
           |  w1 AS (SELECT f, sum(cnt) OVER (ORDER BY f) AS cum
           |         FROM (SELECT f, count(*) AS cnt FROM f1 GROUP BY 1) ff),
           |  sel AS (SELECT
           |      CAST(min(CASE WHEN cum >= (SELECT (n_keys + 1) // 2 FROM s1)
           |                    THEN f END) AS BIGINT) AS p50_f,
           |      CAST(min(CASE WHEN cum >= (SELECT (99 * n_keys + 99) // 100
           |                                 FROM s1)
           |                    THEN f END) AS BIGINT) AS p99_f
           |    FROM w1)
           |  SELECT * FROM s1, sel) q""".stripMargin
      s"""SELECT * FROM (
         |${edge("lineitem.l_suppkey", "lineitem", "l_suppkey")}
         |UNION ALL
         |${edge("lineitem.l_partkey", "lineitem", "l_partkey")}
         |UNION ALL
         |${edge("orders.o_custkey", "orders", "o_custkey")}
         |) u ORDER BY join_key""".stripMargin
    },

    "q_dedup_rate" ->
      """WITH d AS (SELECT source, md5(text) AS d FROM documents),
        |per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(DISTINCT d) AS BIGINT) AS n_unique
        |  FROM d GROUP BY source
        |  UNION ALL
        |  SELECT '__all__', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT d) AS BIGINT)
        |  FROM d)
        |SELECT source, n_docs, n_unique,
        |  CAST((n_docs - n_unique) * 1000000 // n_docs AS BIGINT) AS dup_ppm
        |FROM per ORDER BY source""".stripMargin,

    "q_weighted_median" ->
      """WITH wp AS (
        |  SELECT s_nationkey AS nk,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |c AS (
        |  SELECT nk, p, w,
        |    sum(w) OVER (PARTITION BY nk ORDER BY p
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cw,
        |    sum(w) OVER (PARTITION BY nk) AS tw
        |  FROM wp)
        |SELECT CAST(nk AS BIGINT) AS nationkey,
        |  CAST(min(p) AS BIGINT) / CAST(100.0 AS DOUBLE)
        |    AS weighted_median_price,
        |  CAST(max(tw) AS BIGINT) AS total_weight
        |FROM c WHERE cw * 2 >= tw
        |GROUP BY nk ORDER BY nationkey""".stripMargin,

    "q_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
        |        (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
        |        (9, 45757)) v(digit, benford_ppm))
        |SELECT c.digit, n,
        |  CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
        |  CAST(benford_ppm AS BIGINT) AS benford_ppm,
        |  CAST(n * 1000000 // total - benford_ppm AS BIGINT) AS delta_ppm
        |FROM c JOIN e ON c.digit = e.digit CROSS JOIN t
        |ORDER BY c.digit""".stripMargin,

    // the oracle replays BOTH rankings (exact + bucketed) with the same
    // fixed-point distance key and tie order, then scores the overlap
    "q_recall_at_k" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |adots AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckDot("e.embedding", "c.cv")} AS d
         |  FROM embeddings e CROSS JOIN cents c),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
         |    FROM adots) x WHERE rn = 1),
         |q AS (
         |  SELECT e.vec_id AS qid, e.embedding AS qv, a.cid AS qcid
         |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
         |  WHERE e.vec_id IN (0, 7, 42, 99, 123)),
         |td AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
                         duckDot("e.embedding", "e.embedding"),
                         duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e CROSS JOIN q),
         |truth AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY greatest(CAST(0 AS BIGINT),
         |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
         |          vec_id) AS rn
         |    FROM td) x WHERE rn <= 10),
         |rd AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
                         duckDot("e.embedding", "e.embedding"),
                         duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e
         |  JOIN assign a ON e.vec_id = a.vec_id
         |  JOIN q ON a.cid = q.qcid),
         |ret AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY greatest(CAST(0 AS BIGINT),
         |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
         |          vec_id) AS rn
         |    FROM rd) x WHERE rn <= 10)
         |SELECT t.qid, CAST(count(*) AS BIGINT) AS n_truth,
         |  CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_matched,
         |  CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS recall_ppm
         |FROM truth t LEFT JOIN ret r ON t.qid = r.qid AND t.vec_id = r.vec_id
         |GROUP BY t.qid ORDER BY t.qid""".stripMargin,

    "q_regression" ->
      """WITH li AS (
        |  SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS x,
        |         CAST(floor(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |g AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM li
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, n,
        |  ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS slope,
        |  ((CAST(sy AS DOUBLE)
        |    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS intercept,
        |  (((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
        |   / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS r2
        |FROM g ORDER BY n_name""".stripMargin,

    "q_itemsets" ->
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey AS basket, p_brand AS item
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM baskets),
        |freq AS (
        |  SELECT item, CAST(count(*) AS BIGINT) AS supp
        |  FROM baskets GROUP BY item
        |  HAVING count(*) * 20 >= (SELECT n_baskets FROM tot)),
        |fb AS (SELECT b.basket, b.item FROM baskets b JOIN freq f ON b.item = f.item),
        |pairs AS (
        |  SELECT a.item AS i1, b.item AS i2, CAST(count(*) AS BIGINT) AS supp
        |  FROM fb a JOIN fb b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2
        |  HAVING count(*) * 100 >= (SELECT n_baskets FROM tot))
        |SELECT i1, i2, p.supp, f1.supp AS s1, f2.supp AS s2,
        |  p.supp * 1000000 // f1.supp AS conf12_ppm,
        |  p.supp * 1000000 // f2.supp AS conf21_ppm,
        |  (p.supp * 1000000 // f1.supp) * (SELECT n_baskets FROM tot) // f2.supp AS lift_ppm
        |FROM pairs p
        |JOIN freq f1 ON p.i1 = f1.item
        |JOIN freq f2 ON p.i2 = f2.item
        |ORDER BY i1, i2""".stripMargin,

    "q_ema" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |contrib AS (
        |  SELECT day + k AS t, cents << (19 - k) AS c
        |  FROM daily CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS k) ks),
        |e AS (SELECT t, CAST(sum(c) AS BIGINT) AS scaled FROM contrib GROUP BY t)
        |SELECT d.day, e.scaled / 524288.0 AS ema
        |FROM e JOIN (SELECT day FROM daily) d ON e.t = d.day
        |ORDER BY d.day""".stripMargin,

    "q_bpe_pairs" ->
      """WITH words AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0 GROUP BY w),
        |p AS (
        |  SELECT substr(w, CAST(i AS INTEGER), 1) AS a,
        |         substr(w, CAST(i AS INTEGER) + 1, 1) AS b, freq
        |  FROM (SELECT w, freq, unnest(generate_series(1, length(w) - 1)) AS i
        |        FROM words WHERE length(w) >= 2) x)
        |SELECT a, b, CAST(sum(freq) AS BIGINT) AS n
        |FROM p GROUP BY a, b ORDER BY n DESC, a, b LIMIT 30""".stripMargin,

    "q_kmeans" ->
      s"""WITH $kmeansAssignCtes,
         |g AS (
         |  SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |    min(vec_id) AS min_vec
         |  FROM a2 GROUP BY cid)
         |SELECT g.cid, g.n_members, g.min_vec, c1.cf[1] AS c0_fp
         |FROM g JOIN c1 ON g.cid = c1.cid ORDER BY g.cid""".stripMargin,

    "q_semantic_dedup" ->
      s"""WITH $kmeansAssignCtes,
         |n AS (
         |  SELECT e.vec_id, a.cid, e.embedding,
         |    ${duckDot("e.embedding", "e.embedding")} AS nrm
         |  FROM embeddings e JOIN a2 a ON e.vec_id = a.vec_id),
         |pairs AS (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2,
         |    ${duckCos("""list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)))""", "a.nrm", "b.nrm")} AS cosine
         |  FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id < b.vec_id)
         |SELECT v1, v2, cosine FROM pairs WHERE cosine >= 0.35
         |ORDER BY v1, v2""".stripMargin,

    "q_embed_outliers" ->
      s"""WITH $kmeansAssignCtes,
         |best AS (
         |  SELECT vec_id, CAST(max(d) AS BIGINT) AS best_d
         |  FROM d2 GROUP BY vec_id)
         |SELECT vec_id, best_d FROM best
         |ORDER BY best_d, vec_id LIMIT 20""".stripMargin,

    "q_feature_prep" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |g AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS s,
        |    CAST(min(cents) AS BIGINT) AS mn, CAST(max(cents) AS BIGINT) AS mx
        |  FROM o GROUP BY 1)
        |SELECT o_orderkey, o_orderpriority,
        |  CASE WHEN n > 1 THEN (s - cents) // (n - 1) END AS loo_mean_cents,
        |  (cents - mn) * 1000000 // nullif(mx - mn, 0) AS minmax_ppm
        |FROM o JOIN g USING (o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,

    "q_winsorize" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, cents,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY cents, o_orderkey) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS grp_n
        |  FROM o),
        |p AS (
        |  SELECT o_orderpriority,
        |    CAST(max(CASE WHEN rnk = (grp_n * 5 + 99) // 100 THEN cents END) AS BIGINT) AS p05,
        |    CAST(max(CASE WHEN rnk = (grp_n * 95 + 99) // 100 THEN cents END) AS BIGINT) AS p95
        |  FROM r GROUP BY 1)
        |SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_c,
        |  CAST(sum(greatest(p05, least(p95, cents))) AS BIGINT)
        |    // CAST(count(*) AS BIGINT) AS wins_mean_c
        |FROM o JOIN p USING (o_orderpriority)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_zipf" ->
      """WITH f AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0 GROUP BY w
        |  ORDER BY freq DESC, w LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY freq DESC, w) AS BIGINT) AS rank,
        |  w, freq,
        |  CAST(row_number() OVER (ORDER BY freq DESC, w) AS BIGINT) * freq
        |    AS rank_x_freq
        |FROM f ORDER BY rank""".stripMargin,

    "q_ks_test" ->
      """WITH o AS (
        |  SELECT c_nationkey AS nk,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
        |    o_orderpriority <= '2-HIGH' AS g1
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |dom AS (
        |  SELECT nk, v,
        |    CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(sum(CASE WHEN NOT g1 THEN 1 ELSE 0 END) AS BIGINT) AS d2
        |  FROM o GROUP BY 1, 2),
        |tot AS (
        |  SELECT nk, CAST(sum(d1) AS BIGINT) AS n1, CAST(sum(d2) AS BIGINT) AS n2
        |  FROM dom GROUP BY 1 HAVING sum(d1) > 0 AND sum(d2) > 0),
        |cum AS (
        |  SELECT nk,
        |    CAST(sum(d1) OVER (PARTITION BY nk ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
        |    CAST(sum(d2) OVER (PARTITION BY nk ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2
        |  FROM dom)
        |SELECT CAST(t.nk AS BIGINT) AS nationkey, t.n1, t.n2,
        |  (CAST(max(abs(c1 * t.n2 - c2 * t.n1)) AS BIGINT) * 1000 // t.n1)
        |    * 1000 // t.n2 AS ks_ppm
        |FROM cum JOIN tot t ON cum.nk = t.nk
        |GROUP BY 1, 2, 3 ORDER BY nationkey""".stripMargin,

    "q_pq_adc" ->
      """WITH ss AS (SELECT unnest(generate_series(0, 7)) AS s),
        |sc AS (
        |  SELECT s, CAST(vec_id AS BIGINT) AS cid,
        |    list_transform(generate_series(1, 8), j ->
        |      CAST(embedding[s * 8 + j] AS DOUBLE)) AS csub
        |  FROM embeddings CROSS JOIN ss WHERE vec_id < 16),
        |sub AS (
        |  SELECT vec_id, s,
        |    list_transform(generate_series(1, 8), j ->
        |      CAST(embedding[s * 8 + j] AS DOUBLE)) AS sub
        |  FROM embeddings CROSS JOIN ss),
        |d AS (
        |  SELECT v.vec_id, v.s, c.cid,
        |    list_sum(list_transform(generate_series(1, 8), j ->
        |      CAST(floor(v.sub[j] * c.csub[j] * 1000000000 + 0.5) AS BIGINT))) AS d
        |  FROM sub v JOIN sc c ON v.s = c.s),
        |codes AS (
        |  SELECT vec_id, s, cid FROM (
        |    SELECT vec_id, s, cid,
        |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d DESC, cid) AS rn
        |    FROM d) x WHERE rn = 1),
        |lut AS (SELECT s, cid, d FROM d WHERE vec_id = 0)
        |SELECT c.vec_id, CAST(sum(l.d) AS BIGINT) AS adc_fp
        |FROM codes c JOIN lut l ON c.s = l.s AND c.cid = l.cid
        |GROUP BY c.vec_id ORDER BY adc_fp DESC, c.vec_id LIMIT 10""".stripMargin,

    "q_label_prop" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |half AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM half UNION ALL SELECT v, u FROM half),
        |l0 AS (SELECT DISTINCT u AS node, u AS lab FROM edges),
        |c1 AS (
        |  SELECT e.u AS node, l.lab, CAST(count(*) AS BIGINT) AS n
        |  FROM edges e JOIN l0 l ON e.v = l.node GROUP BY 1, 2),
        |l1 AS (
        |  SELECT node, lab FROM (
        |    SELECT node, lab,
        |      row_number() OVER (PARTITION BY node ORDER BY n DESC, lab) AS rn
        |    FROM c1) x WHERE rn = 1),
        |c2 AS (
        |  SELECT e.u AS node, l.lab, CAST(count(*) AS BIGINT) AS n
        |  FROM edges e JOIN l1 l ON e.v = l.node GROUP BY 1, 2),
        |l2 AS (
        |  SELECT node, lab FROM (
        |    SELECT node, lab,
        |      row_number() OVER (PARTITION BY node ORDER BY n DESC, lab) AS rn
        |    FROM c2) x WHERE rn = 1)
        |SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members,
        |  min(node) AS min_node
        |FROM l2 GROUP BY lab ORDER BY community""".stripMargin,

    "q_pmi" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |ucnt AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(tk) AS w FROM tk) u GROUP BY w),
        |bcnt AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cab
        |  FROM (SELECT tk[i] AS w1, tk[i + 1] AS w2
        |        FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
        |              FROM tk) x) b
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM ucnt) AS t_tokens,
        |         (SELECT CAST(sum(cab) AS BIGINT) FROM bcnt) AS t_bigrams)
        |SELECT w1, w2, cab, u1.c AS c1, u2.c AS c2,
        |  (CAST(cab AS DOUBLE) * CAST(t_tokens AS DOUBLE) * CAST(t_tokens AS DOUBLE))
        |    / (CAST(t_bigrams AS DOUBLE) * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
        |FROM bcnt JOIN ucnt u1 ON w1 = u1.w JOIN ucnt u2 ON w2 = u2.w
        |CROSS JOIN tot
        |WHERE cab >= 5 AND u1.c >= 10 AND u2.c >= 10
        |ORDER BY lift DESC, w1, w2 LIMIT 25""".stripMargin,

    "q_token_budget" ->
      """WITH s0 AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |src AS (
        |  SELECT source, tokens,
        |    CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS w
        |  FROM s0),
        |tw AS (SELECT CAST(sum(w) AS BIGINT) AS total_w FROM src)
        |SELECT source, tokens, w,
        |  10000 * w // total_w AS target_tokens,
        |  least(1000000, (10000 * w // total_w) * 1000000 // tokens) AS rate_ppm,
        |  tokens * least(1000000, (10000 * w // total_w) * 1000000 // tokens) // 1000000
        |    AS expected_tokens,
        |  tokens < (10000 * w // total_w) AS undersupplied
        |FROM src CROSS JOIN tw ORDER BY source""".stripMargin,

    "q_pareto" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT cents,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(row_number() OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) AS rn
        |  FROM cust),
        |tot AS (
        |  SELECT CAST(sum(cents) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS n,
        |    CAST(max(cents) AS BIGINT) AS topc
        |  FROM cust)
        |SELECT max(n) AS n_customers, min(rn) AS n_for_80pct,
        |  max(topc) * 1000000 // max(t) AS top_share_ppm
        |FROM r CROSS JOIN tot WHERE cum * 5 >= t * 4""".stripMargin,

    "q_ab_test" ->
      """WITH u AS (
        |  SELECT o_custkey % 2 AS variant, o_custkey,
        |    CAST(max(CASE WHEN o_orderdate >= DATE '1995-01-01'
        |                   AND o_orderdate < DATE '1996-01-01'
        |              THEN 1 ELSE 0 END) AS BIGINT) AS conv
        |  FROM orders GROUP BY 1, 2),
        |g AS (
        |  SELECT variant, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c
        |  FROM u GROUP BY 1),
        |w AS (
        |  SELECT g0.n AS n0, g0.c AS c0, g1.n AS n1, g1.c AS c1
        |  FROM (SELECT n, c FROM g WHERE variant = 0) g0
        |  CROSS JOIN (SELECT n, c FROM g WHERE variant = 1) g1)
        |SELECT n0, c0, n1, c1,
        |  ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |    - (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
        |  / sqrt(((CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE))
        |          / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
        |    * (1.0 - (CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE))
        |             / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
        |    * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) AS z
        |FROM w""".stripMargin,

    "q_gini" ->
      """WITH src AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1)
        |SELECT CAST(sum(n) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_sources,
        |  (CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT)
        |    - CAST(sum(n * n) AS BIGINT)) * 1000000
        |    // (CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT)) AS gini_ppm,
        |  CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT) * 1000
        |    // CAST(sum(n * n) AS BIGINT) AS effective_sources_milli
        |FROM src""".stripMargin,

    "q_ngram_lm" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |bi AS (
        |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
        |        FROM tk) x),
        |bcnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cab FROM bi GROUP BY 1, 2),
        |ucnt AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bi GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(cab * 1000000 // c1) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS mean_cond_ppm
        |FROM bi JOIN bcnt USING (w1, w2) JOIN ucnt USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_audio_meta" ->
      """SELECT doc_id,
        |  doc_id % 2 + 1 AS channels,
        |  (doc_id % 5 + 1) * 8000 AS sample_rate,
        |  CAST(16 AS BIGINT) AS bits,
        |  (doc_id % 100 + 1) * 1600 AS n_frames,
        |  ((doc_id % 100 + 1) * 1600) * 1000 // ((doc_id % 5 + 1) * 8000)
        |    AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sample_k" ->
      """WITH k AS (
        |  SELECT lang, doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS grp_n
        |  FROM k)
        |SELECT lang, rnk, doc_id, grp_n FROM r WHERE rnk <= 5
        |ORDER BY lang, rnk""".stripMargin,

    "q_attribution" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS channel
        |  FROM events WHERE event_type = 'click'),
        |att AS (
        |  SELECT p.event_id, p.v_milli,
        |    (SELECT c.channel FROM c
        |     WHERE c.user_id = p.user_id AND c.ts < p.ts
        |     ORDER BY c.ts DESC LIMIT 1) AS channel
        |  FROM p)
        |SELECT coalesce(channel, -1) AS channel,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(v_milli) AS BIGINT) AS value_milli
        |FROM att GROUP BY 1 ORDER BY channel""".stripMargin,

    "q_lorenz_gini" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT cents,
        |    CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rn
        |  FROM cust),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sx,
        |    CAST(sum(rn * cents) AS BIGINT) AS six
        |  FROM r)
        |SELECT n, sx,
        |  (2.0 * CAST(six AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) AS gini
        |FROM s""".stripMargin,

    "q_link_pred" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |und AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
        |mid AS (SELECT e.u, e.v, d.d FROM edges e JOIN deg d ON e.u = d.u
        |        WHERE d.d <= 64),
        |cand AS (
        |  SELECT e1.v AS x, e2.v AS y, e1.d AS dz
        |  FROM mid e1 JOIN mid e2 ON e1.u = e2.u AND e1.v < e2.v),
        |scored AS (
        |  SELECT x, y, CAST(sum(1000000 // dz) AS BIGINT) AS ra_ppm,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM cand GROUP BY x, y),
        |pred AS (
        |  SELECT * FROM scored s
        |  WHERE NOT EXISTS (SELECT 1 FROM und
        |                    WHERE s.x = und.u AND s.y = und.v)),
        |top AS (SELECT * FROM pred ORDER BY ra_ppm DESC, x, y LIMIT 30)
        |SELECT x, y, n_common, ra_ppm FROM top ORDER BY x, y""".stripMargin,

    "q_hits" ->
      """WITH edges AS (
        |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_partkey % 10 = 0),
        |a1 AS (SELECT p, CAST(count(*) AS BIGINT) AS a1
        |       FROM edges GROUP BY p),
        |h1 AS (SELECT c, CAST(sum(a1.a1) AS BIGINT) AS h1
        |       FROM edges JOIN a1 ON edges.p = a1.p GROUP BY c),
        |a2 AS (SELECT p, CAST(sum(h1.h1) AS BIGINT) AS a2
        |       FROM edges JOIN h1 ON edges.c = h1.c GROUP BY p),
        |h2 AS (SELECT c, CAST(sum(a2.a2) AS BIGINT) AS h2
        |       FROM edges JOIN a2 ON edges.p = a2.p GROUP BY c),
        |ta AS (SELECT 'auth' AS role, p AS node, a2 AS score
        |       FROM a2 ORDER BY a2 DESC, p LIMIT 15),
        |th AS (SELECT 'hub' AS role, c AS node, h2 AS score
        |       FROM h2 ORDER BY h2 DESC, c LIMIT 15)
        |SELECT role, node, score
        |FROM (SELECT * FROM ta UNION ALL SELECT * FROM th)
        |ORDER BY role, node""".stripMargin,

    "q_acf" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |lags AS (SELECT CAST(unnest(generate_series(1, 7)) AS BIGINT) AS lag),
        |pairs AS (
        |  SELECT lag, a.v AS x, b.v AS y
        |  FROM daily a CROSS JOIN lags JOIN daily b ON a.day + lag = b.day),
        |m AS (
        |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM pairs GROUP BY lag)
        |SELECT lag, n_pairs,
        |  CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS acf
        |FROM m ORDER BY lag""".stripMargin,

    "q_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s
        |        FROM daily),
        |scanned AS (
        |  SELECT day,
        |    CAST(count(*) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS t,
        |    CAST(sum(v) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS st,
        |    n, s
        |  FROM daily CROSS JOIN tot),
        |top AS (
        |  SELECT day, t AS days_before, n * st - t * s AS cusum,
        |    CAST(st AS DOUBLE) / t AS mean_before_k,
        |    CAST(s - st AS DOUBLE) / (n - t) AS mean_after_k
        |  FROM scanned WHERE t < n
        |  ORDER BY abs(n * st - t * s) DESC, day LIMIT 10)
        |SELECT day, days_before, cusum, mean_before_k, mean_after_k
        |FROM top ORDER BY day""".stripMargin,

    "q_spearman" ->
      """WITH per_cust AS (
        |  SELECT n_name, o_custkey AS ck,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |rx_rank AS (
        |  SELECT n_name, ck, CAST(x AS DOUBLE) AS ord,
        |    CAST(row_number() OVER (PARTITION BY n_name ORDER BY CAST(x AS DOUBLE), ck)
        |      AS BIGINT) AS rnk
        |  FROM per_cust),
        |rx AS (
        |  SELECT r.n_name, r.ck, t.mr AS rx
        |  FROM rx_rank r JOIN (
        |    SELECT n_name, ord, min(rnk) + max(rnk) AS mr
        |    FROM rx_rank GROUP BY 1, 2) t
        |    ON r.n_name = t.n_name AND r.ord = t.ord),
        |ry_rank AS (
        |  SELECT n_name, ck, CAST(y AS DOUBLE) AS ord,
        |    CAST(row_number() OVER (PARTITION BY n_name ORDER BY CAST(y AS DOUBLE), ck)
        |      AS BIGINT) AS rnk
        |  FROM per_cust),
        |ry AS (
        |  SELECT r.n_name, r.ck, t.mr AS ry
        |  FROM ry_rank r JOIN (
        |    SELECT n_name, ord, min(rnk) + max(rnk) AS mr
        |    FROM ry_rank GROUP BY 1, 2) t
        |    ON r.n_name = t.n_name AND r.ord = t.ord),
        |m AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
        |    CAST(sum(rx * rx) AS BIGINT) AS sxx,
        |    CAST(sum(ry * ry) AS BIGINT) AS syy,
        |    CAST(sum(rx * ry) AS BIGINT) AS sxy
        |  FROM rx JOIN ry USING (n_name, ck) GROUP BY 1)
        |SELECT n_name, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rho
        |FROM m ORDER BY n_name""".stripMargin,

    "q_mann_whitney" ->
      """WITH sample AS (
        |  SELECT o_orderkey AS ok, o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |ranked AS (
        |  SELECT ok, CAST(v AS DOUBLE) AS ord,
        |    CAST(row_number() OVER (ORDER BY CAST(v AS DOUBLE), ok) AS BIGINT)
        |      AS rnk
        |  FROM sample),
        |ties AS (
        |  SELECT ord, min(rnk) + max(rnk) AS mr2,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM ranked GROUP BY ord),
        |tt AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3 FROM ties),
        |mr AS (
        |  SELECT r.ok, t.mr2, s.grp
        |  FROM ranked r JOIN ties t ON r.ord = t.ord
        |  JOIN sample s ON r.ok = s.ok),
        |g AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(mr2) AS BIGINT) AS sr2
        |  FROM mr GROUP BY grp),
        |st AS (
        |  SELECT max(CASE WHEN grp = '1-URGENT' THEN n END) AS n1,
        |    max(CASE WHEN grp = '5-LOW' THEN n END) AS n2,
        |    max(CASE WHEN grp = '1-URGENT' THEN sr2 END) AS r1x2
        |  FROM g)
        |SELECT n1, n2, r1x2 - n1 * (n1 + 1) AS u1_x2, tie3,
        |  CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)
        |    / (2.0 * CAST(n1 * n2 AS DOUBLE)) AS cle,
        |  CAST((r1x2 - n1 * (n1 + 1)) - n1 * n2 AS DOUBLE) /
        |    (2.0 * sqrt(
        |      CAST(n1 * n2 AS DOUBLE) / 12.0 *
        |        (CAST(n1 + n2 + 1 AS DOUBLE) -
        |          CAST(tie3 AS DOUBLE) /
        |            (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))))
        |    AS z
        |FROM st CROSS JOIN tt""".stripMargin,

    "q_kappa" ->
      """WITH rated AS (
        |  SELECT n_chars >= 200 AS a,
        |    len(string_split(text, ' ')) >= 40 AS b
        |  FROM documents),
        |cells AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS cnt
        |  FROM rated GROUP BY a, b),
        |rws AS (SELECT a, CAST(sum(cnt) AS BIGINT) AS ra FROM cells GROUP BY a),
        |cls AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS cb FROM cells GROUP BY b),
        |sc AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS nn,
        |    CAST(sum(CASE WHEN a = b THEN cnt ELSE 0 END) AS BIGINT) AS diag
        |  FROM cells),
        |pe AS (
        |  SELECT CAST(sum(ra * cb) AS BIGINT) AS rc
        |  FROM rws JOIN cls ON rws.a = cls.b)
        |SELECT cells.a, cells.b, cnt, ra, cb,
        |  CAST(nn * diag - rc AS DOUBLE) / CAST(nn * nn - rc AS DOUBLE)
        |    AS kappa
        |FROM cells JOIN rws USING (a) JOIN cls USING (b)
        |CROSS JOIN sc CROSS JOIN pe
        |ORDER BY cells.a, cells.b""".stripMargin,

    "q_kcore" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |half AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM half UNION ALL SELECT v, u FROM half),
        |k1 AS (SELECT u FROM (SELECT u, count(*) AS d FROM edges GROUP BY u)
        |       WHERE d >= 3),
        |e1 AS (SELECT e.u, e.v FROM edges e
        |       JOIN k1 a ON e.u = a.u JOIN k1 b ON e.v = b.u),
        |k2 AS (SELECT u FROM (SELECT u, count(*) AS d FROM e1 GROUP BY u)
        |       WHERE d >= 3),
        |e2 AS (SELECT e.u, e.v FROM e1 e
        |       JOIN k2 a ON e.u = a.u JOIN k2 b ON e.v = b.u),
        |k3 AS (SELECT u FROM (SELECT u, count(*) AS d FROM e2 GROUP BY u)
        |       WHERE d >= 3),
        |e3 AS (SELECT e.u, e.v FROM e2 e
        |       JOIN k3 a ON e.u = a.u JOIN k3 b ON e.v = b.u)
        |SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
        |FROM e3 GROUP BY u ORDER BY node""".stripMargin,

    "q_negatives" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5('neg|' || CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 64 AS bucket
        |  FROM documents),
        |paired AS (
        |  SELECT d.doc_id, c.doc_id AS neg_id,
        |    CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|' ||
        |      CAST(c.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS ph
        |  FROM docs d JOIN docs c ON (d.bucket + 1) % 64 = c.bucket),
        |r AS (
        |  SELECT doc_id, neg_id,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ph, neg_id)
        |      AS BIGINT) AS rnk
        |  FROM paired)
        |SELECT doc_id, rnk, neg_id FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,

    "q_group_split" ->
      """WITH labeled AS (
        |  SELECT o_custkey AS ck,
        |    CAST('0x' || substr(md5('split|' || CAST(o_custkey AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 100 < 80 AS grp_train,
        |    CAST('0x' || substr(md5('split|' || CAST(o_orderkey AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 100 < 80 AS row_train
        |  FROM orders),
        |g AS (
        |  SELECT ck, CAST(sum(CASE WHEN grp_train THEN 1 ELSE 0 END) AS BIGINT) AS tr,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM labeled GROUP BY ck),
        |r AS (
        |  SELECT ck, CAST(sum(CASE WHEN row_train THEN 1 ELSE 0 END) AS BIGINT) AS tr,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM labeled GROUP BY ck),
        |ga AS (
        |  SELECT 'group' AS method, CAST(sum(tr) AS BIGINT) AS train_orders,
        |    CAST(sum(n - tr) AS BIGINT) AS test_orders,
        |    CAST(sum(CASE WHEN tr > 0 AND tr < n THEN 1 ELSE 0 END) AS BIGINT)
        |      AS straddling_customers
        |  FROM g),
        |ra AS (
        |  SELECT 'row' AS method, CAST(sum(tr) AS BIGINT) AS train_orders,
        |    CAST(sum(n - tr) AS BIGINT) AS test_orders,
        |    CAST(sum(CASE WHEN tr > 0 AND tr < n THEN 1 ELSE 0 END) AS BIGINT)
        |      AS straddling_customers
        |  FROM r)
        |SELECT * FROM (SELECT * FROM ga UNION ALL SELECT * FROM ra)
        |ORDER BY method""".stripMargin,

    "q_quality_model" ->
      """WITH w AS (
        |  SELECT CAST(40 AS BIGINT) AS w_words, CAST(-10 AS BIGINT) AS w_digits,
        |    CAST(-2 AS BIGINT) AS w_lendev, CAST(-1500 AS BIGINT) AS bias),
        |scored AS (
        |  SELECT source,
        |    w_words * CAST(len(string_split(text, ' ')) AS BIGINT) +
        |    w_digits * CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) +
        |    w_lendev * abs(n_chars - 500) + bias AS logit_milli
        |  FROM documents CROSS JOIN w)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN logit_milli >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
        |  CAST(sum(CASE WHEN logit_milli >= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS keep_ppm,
        |  CAST(sum(logit_milli) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_logit
        |FROM scored GROUP BY source ORDER BY source""".stripMargin,

    "q_sorted_neighborhood" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS ord,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY CAST(n_chars AS DOUBLE), doc_id) AS BIGINT) AS rnk
        |  FROM documents),
        |offs AS (SELECT CAST(unnest(generate_series(1, 3)) AS BIGINT) AS j)
        |SELECT a.lang, a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(b.ord - a.ord AS BIGINT) AS len_diff
        |FROM ranked a CROSS JOIN offs
        |JOIN ranked b ON a.lang = b.lang AND a.rnk + j = b.rnk
        |WHERE abs(b.ord - a.ord) <= 5.0
        |ORDER BY a.lang, d1, d2""".stripMargin,

    "q_bootstrap" ->
      """WITH src AS (
        |  SELECT o_orderkey AS ok,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
        |  FROM orders),
        |reps AS (
        |  SELECT ok, x, CAST(unnest(generate_series(1, 64)) AS BIGINT) AS b
        |  FROM src),
        |weighted AS (
        |  SELECT b, x,
        |    CASE
        |      WHEN u < 36788 THEN 0 WHEN u < 73576 THEN 1
        |      WHEN u < 91970 THEN 2 WHEN u < 98101 THEN 3
        |      WHEN u < 99634 THEN 4 WHEN u < 99941 THEN 5
        |      WHEN u < 99992 THEN 6 WHEN u < 99999 THEN 7
        |      ELSE 8 END AS w
        |  FROM (
        |    SELECT b, x,
        |      CAST('0x' || substr(md5('boot|' || CAST(ok AS VARCHAR) || '|' ||
        |        CAST(b AS VARCHAR)), 1, 15) AS BIGINT) % 100000 AS u
        |    FROM reps)),
        |means AS (
        |  SELECT b, CAST(sum(w * x) AS BIGINT) * 10
        |    // CAST(sum(w) AS BIGINT) AS mean_milli
        |  FROM weighted GROUP BY b),
        |ranked AS (
        |  SELECT mean_milli,
        |    row_number() OVER (ORDER BY mean_milli, b) AS r
        |  FROM means),
        |pt AS (
        |  SELECT CAST(sum(x) AS BIGINT) * 10 // CAST(count(*) AS BIGINT)
        |    AS point_milli
        |  FROM src)
        |SELECT CAST(count(*) AS BIGINT) AS n_replicas,
        |  point_milli,
        |  max(CASE WHEN r = 4 THEN mean_milli END) AS lo_milli,
        |  max(CASE WHEN r = 61 THEN mean_milli END) AS hi_milli
        |FROM ranked CROSS JOIN pt
        |GROUP BY point_milli""".stripMargin,

    "q_dq_checks" ->
      """WITH scan AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_uniq,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_null,
        |    CAST(sum(CASE WHEN o_orderpriority IN
        |      ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v_accept,
        |    CAST(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_pos,
        |    CAST(sum(CASE WHEN o_totalprice > 400000.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_range
        |  FROM orders),
        |fk AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v
        |  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o_custkey = c_custkey),
        |checks AS (
        |  SELECT 'o_orderkey_unique' AS check_name, n AS n_checked,
        |    v_uniq AS violations FROM scan
        |  UNION ALL SELECT 'o_custkey_not_null', n, v_null FROM scan
        |  UNION ALL SELECT 'o_orderpriority_accepted', n, v_accept FROM scan
        |  UNION ALL SELECT 'o_totalprice_positive', n, v_pos FROM scan
        |  UNION ALL SELECT 'o_totalprice_below_400k', n, v_range FROM scan
        |  UNION ALL SELECT 'o_custkey_references_customer', n, v FROM fk)
        |SELECT check_name, n_checked, violations, violations = 0 AS passed
        |FROM checks ORDER BY check_name""".stripMargin,

    "q_cross_val" ->
      """WITH labeled AS (
        |  SELECT o_custkey,
        |    CAST('0x' || substr(md5('fold|' || CAST(o_custkey AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 5 AS fold,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |per_fold AS (
        |  SELECT fold, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(c) AS BIGINT) AS revenue_cents
        |  FROM labeled GROUP BY fold),
        |tot AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS tot FROM per_fold)
        |SELECT fold, n_customers, n_orders, revenue_cents,
        |  revenue_cents * 1000000 // tot AS share_ppm
        |FROM per_fold CROSS JOIN tot
        |ORDER BY fold""".stripMargin,

    "q_video_meta" ->
      """SELECT doc_id,
        |  (doc_id % 8 + 1) * 160 AS width,
        |  (doc_id % 8 + 1) * 90 AS height,
        |  doc_id % 2 + 1 AS streams,
        |  (doc_id % 50 + 1) * 24 AS n_frames,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 33333 ELSE 41667 END AS BIGINT)
        |    AS us_per_frame,
        |  ((doc_id % 50 + 1) * 24) *
        |    (CASE WHEN doc_id % 3 = 0 THEN 33333 ELSE 41667 END) // 1000
        |    AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_compaction" ->
      """WITH summed AS (
        |  SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS run_sum
        |  FROM documents)
        |SELECT (run_sum - n_chars) // 4000 AS bin,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(n_chars) AS BIGINT) AS bin_chars,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM summed GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_seasonal" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(month(o_orderdate) AS BIGINT) AS m,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1, 2),
        |overall AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(v) AS BIGINT) AS ss
        |  FROM daily)
        |SELECT m AS month, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(v) AS BIGINT) AS sum_k,
        |  ((CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT)) * 1000000)
        |    // (ss // nn) AS index_ppm
        |FROM daily CROSS JOIN overall
        |GROUP BY m, ss, nn ORDER BY month""".stripMargin,

    "q_calibration" ->
      """WITH scored AS (
        |  SELECT n_chars >= 200 AS label,
        |    40 * CAST(len(string_split(text, ' ')) AS BIGINT) +
        |    (-10) * CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) +
        |    (-2) * abs(n_chars - 500) + (-1500) AS logit_milli
        |  FROM documents),
        |binned AS (
        |  SELECT label, logit_milli,
        |    greatest(least(logit_milli // 2000, 10), -10) AS bin
        |  FROM scored)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS positives,
        |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) * 1000000
        |    // CAST(count(*) AS BIGINT) AS pos_rate_ppm,
        |  CAST(sum(logit_milli) AS BIGINT) AS sum_logit
        |FROM binned GROUP BY bin ORDER BY bin""".stripMargin,

    "q_degree_dist" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |half AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM half UNION ALL SELECT v, u FROM half),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree
        |        FROM edges GROUP BY u)
        |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM deg GROUP BY degree ORDER BY degree""".stripMargin,

    "q_blocking_audit" -> {
      val minhs = (0 until 8).map(j =>
        s"min(substr(m${j / 4}, ${1 + 8 * (j % 4)}, 8)) AS h$j").mkString(",\n         |    ")
      val bands = (0 until 8).map(j => s"struct_pack(band := $j, sig := h$j)").mkString(", ")
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |csh AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
         |                  HAVING count(*) > ${graft.llm.Dedup.DefaultMaxShingleDf})),
         |tp AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM csh a JOIN csh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT d1, d2 FROM tp
         |  JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
         |  WHERE shared / (c1.n + c2.n - shared) >= 0.5),
         |hashed AS (
         |  SELECT doc_id, md5('0|' || s) AS m0, md5('1|' || s) AS m1 FROM sh),
         |sigs AS (
         |  SELECT doc_id,
         |    $minhs
         |  FROM hashed GROUP BY doc_id),
         |buckets AS (
         |  SELECT doc_id, u.band AS band, u.sig AS sig
         |  FROM (SELECT doc_id, unnest([$bands]) AS u FROM sigs) z),
         |mh AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM sh),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM mh),
         |nf AS (SELECT CAST(count(*) AS BIGINT) AS true_found FROM truth t
         |       WHERE EXISTS (SELECT 1 FROM mh
         |                     WHERE mh.d1 = t.d1 AND mh.d2 = t.d2))
         |SELECT n_docs, n_docs * (n_docs - 1) // 2 AS n_possible, n_true,
         |  n_candidates, true_found,
         |  (n_docs * (n_docs - 1) // 2 - n_candidates) * 1000000
         |    // (n_docs * (n_docs - 1) // 2) AS reduction_ppm,
         |  true_found * 1000000 // nullif(n_true, 0) AS completeness_ppm
         |FROM nd CROSS JOIN nt CROSS JOIN nc CROSS JOIN nf""".stripMargin
    },

    "q_minhash_accuracy" -> {
      val minhs = (0 until 8).map(j =>
        s"min(substr(m${j / 4}, ${1 + 8 * (j % 4)}, 8)) AS h$j").mkString(",\n         |    ")
      val bands = (0 until 8).map(j => s"struct_pack(band := $j, sig := h$j)").mkString(", ")
      val est = (0 until 8).map(j =>
        s"(CASE WHEN sa.h$j = sb.h$j THEN 1 ELSE 0 END)").mkString(" +\n         |      ")
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |csh AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
         |                  HAVING count(*) > ${graft.llm.Dedup.DefaultMaxShingleDf})),
         |tp AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM csh a JOIN csh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |ex AS (
         |  SELECT d1, d2, CAST(shared AS BIGINT) AS shared,
         |    shared / (c1.n + c2.n - shared) AS jaccard
         |  FROM tp JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id),
         |hashed AS (
         |  SELECT doc_id, md5('0|' || s) AS m0, md5('1|' || s) AS m1 FROM sh),
         |sigs AS (
         |  SELECT doc_id,
         |    $minhs
         |  FROM hashed GROUP BY doc_id),
         |buckets AS (
         |  SELECT doc_id, u.band AS band, u.sig AS sig
         |  FROM (SELECT doc_id, unnest([$bands]) AS u FROM sigs) z),
         |mh AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |j AS (
         |  SELECT mh.d1, mh.d2,
         |    CAST($est AS BIGINT) AS est_matches
         |  FROM mh JOIN sigs sa ON mh.d1 = sa.doc_id
         |  JOIN sigs sb ON mh.d2 = sb.doc_id)
         |SELECT j.d1, j.d2, est_matches, est_matches * 125000 AS est_ppm,
         |  coalesce(ex.shared, 0) AS shared,
         |  coalesce(ex.jaccard, 0.0) AS jaccard
         |FROM j LEFT JOIN ex ON j.d1 = ex.d1 AND j.d2 = ex.d2
         |ORDER BY j.d1, j.d2""".stripMargin
    },

    "q_rfm" ->
      """WITH per_cust AS (
        |  SELECT o_custkey,
        |    CAST(max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT)
        |      AS recency,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS monetary
        |  FROM orders GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per_cust),
        |r AS (
        |  SELECT o_custkey,
        |    (CAST(row_number() OVER (ORDER BY CAST(recency AS DOUBLE), o_custkey)
        |      AS BIGINT) - 1) * 5 // n + 1 AS r_score
        |  FROM per_cust CROSS JOIN nn),
        |f AS (
        |  SELECT o_custkey,
        |    (CAST(row_number() OVER (ORDER BY CAST(freq AS DOUBLE), o_custkey)
        |      AS BIGINT) - 1) * 5 // n + 1 AS f_score
        |  FROM per_cust CROSS JOIN nn),
        |m AS (
        |  SELECT o_custkey,
        |    (CAST(row_number() OVER (ORDER BY CAST(monetary AS DOUBLE), o_custkey)
        |      AS BIGINT) - 1) * 5 // n + 1 AS m_score
        |  FROM per_cust CROSS JOIN nn)
        |SELECT r_score, f_score, m_score,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(monetary) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS mean_monetary_cents
        |FROM per_cust JOIN r USING (o_custkey) JOIN f USING (o_custkey)
        |JOIN m USING (o_custkey)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_lag_features" ->
      """WITH src AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders WHERE o_custkey % 100 = 0)
        |SELECT o_custkey, o_orderkey, day, c,
        |  lag(c, 1) OVER w AS lag1,
        |  lag(c, 2) OVER w AS lag2,
        |  c - lag(c, 1) OVER w AS delta1,
        |  CAST(sum(c) OVER wp AS DOUBLE) / CAST(count(c) OVER wp AS DOUBLE)
        |    AS prev3_mean
        |FROM src
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey),
        |  wp AS (PARTITION BY o_custkey ORDER BY day, o_orderkey
        |         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin,

    "q_assortativity" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |half AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM half UNION ALL SELECT v, u FROM half),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |    CAST(sum(du.d) AS BIGINT) AS sx, CAST(sum(dv.d) AS BIGINT) AS sy,
        |    CAST(sum(du.d * du.d) AS BIGINT) AS sxx,
        |    CAST(sum(dv.d * dv.d) AS BIGINT) AS syy,
        |    CAST(sum(du.d * dv.d) AS BIGINT) AS sxy
        |  FROM edges e JOIN deg du ON e.u = du.u JOIN deg dv ON e.v = dv.u)
        |SELECT n_edges,
        |  CAST(n_edges * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n_edges * syy - sy * sy AS DOUBLE))) AS assortativity
        |FROM m""".stripMargin,

    "q_entropy" ->
      """WITH pn AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |    CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS c4
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS gn,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS g0,
        |    CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS g1,
        |    CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS g2,
        |    CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS g3,
        |    CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS g4
        |  FROM orders)
        |SELECT n_name, n,
        |  CAST(floor((0.0 - (
        |      CASE WHEN c0 > 0 THEN (CAST(c0 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c0 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c2 > 0 THEN (CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c3 > 0 THEN (CAST(c3 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c3 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c4 > 0 THEN (CAST(c4 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c4 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
        |    )) * 1000000 + 0.5) AS BIGINT) AS entropy_unat,
        |  CAST(floor((
        |      CASE WHEN c0 > 0 THEN (CAST(c0 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c0 * gn AS DOUBLE) / CAST(n * g0 AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c1 * gn AS DOUBLE) / CAST(n * g1 AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c2 > 0 THEN (CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c2 * gn AS DOUBLE) / CAST(n * g2 AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c3 > 0 THEN (CAST(c3 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c3 * gn AS DOUBLE) / CAST(n * g3 AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c4 > 0 THEN (CAST(c4 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c4 * gn AS DOUBLE) / CAST(n * g4 AS DOUBLE)) ELSE 0.0 END
        |    ) * 1000000 + 0.5) AS BIGINT) AS kl_unat
        |FROM pn CROSS JOIN g ORDER BY n_name""".stripMargin,

    "q_mutual_info" ->
      """WITH a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'A' AND l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN l_returnflag = 'A' AND l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN l_returnflag = 'N' AND l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(sum(CASE WHEN l_returnflag = 'N' AND l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c4,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS c5,
        |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS fx0,
        |    CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS fx1,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS fx2,
        |    CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS gy0,
        |    CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS gy1
        |  FROM lineitem)
        |SELECT n, c0, c1, c2, c3, c4, c5,
        |  CAST(floor((
        |      CASE WHEN c0 > 0 THEN (CAST(c0 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c0 * n AS DOUBLE) / CAST(fx0 * gy0 AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c1 * n AS DOUBLE) / CAST(fx0 * gy1 AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c2 > 0 THEN (CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c2 * n AS DOUBLE) / CAST(fx1 * gy0 AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c3 > 0 THEN (CAST(c3 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c3 * n AS DOUBLE) / CAST(fx1 * gy1 AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c4 > 0 THEN (CAST(c4 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c4 * n AS DOUBLE) / CAST(fx2 * gy0 AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN c5 > 0 THEN (CAST(c5 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c5 * n AS DOUBLE) / CAST(fx2 * gy1 AS DOUBLE)) ELSE 0.0 END
        |    ) * 1000000 + 0.5) AS BIGINT) AS mi_unat,
        |  CAST(floor((0.0 - (
        |      CASE WHEN fx0 > 0 THEN (CAST(fx0 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(fx0 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN fx1 > 0 THEN (CAST(fx1 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(fx1 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN fx2 > 0 THEN (CAST(fx2 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(fx2 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
        |    )) * 1000000 + 0.5) AS BIGINT) AS h_flag_unat,
        |  CAST(floor((0.0 - (
        |      CASE WHEN gy0 > 0 THEN (CAST(gy0 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(gy0 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
        |    + CASE WHEN gy1 > 0 THEN (CAST(gy1 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(gy1 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
        |    )) * 1000000 + 0.5) AS BIGINT) AS h_status_unat
        |FROM a""".stripMargin,

    "q_confusion" ->
      """WITH f AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['the', 'a', 'of', 'to', 'and', 'in', 'is', 'it', 'for', 'on'], t))) AS BIGINT) AS en_hits,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |thr AS (SELECT CAST(unnest([60, 80, 100]) AS BIGINT) AS thr_milli),
        |j AS (
        |  SELECT thr_milli,
        |    en_hits * 1000 >= thr_milli * n_tokens AS pred,
        |    lang = 'en' AS actual
        |  FROM f CROSS JOIN thr),
        |c AS (
        |  SELECT thr_milli,
        |    CAST(sum(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN NOT pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN NOT pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM j GROUP BY thr_milli),
        |pr AS (
        |  SELECT thr_milli, tp, fp, fn, tn,
        |    CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp) ELSE 0 END AS precision_ppm,
        |    CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn) ELSE 0 END AS recall_ppm
        |  FROM c)
        |SELECT thr_milli, tp, fp, fn, tn, precision_ppm, recall_ppm,
        |  CASE WHEN precision_ppm + recall_ppm > 0
        |    THEN 2 * precision_ppm * recall_ppm // (precision_ppm + recall_ppm)
        |    ELSE 0 END AS f1_ppm,
        |  (tp + tn) * 1000000 // (tp + fp + fn + tn) AS accuracy_ppm
        |FROM pr ORDER BY thr_milli""".stripMargin,

    "q_apportion" ->
      """WITH cnts AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS cnt
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM cnts),
        |based AS (
        |  SELECT n_name, cnt,
        |    (1000 * cnt) // tot AS base, (1000 * cnt) % tot AS rem
        |  FROM cnts CROSS JOIN tot),
        |ex AS (SELECT 1000 - CAST(sum(base) AS BIGINT) AS extra FROM based),
        |rn AS (
        |  SELECT n_name, cnt, base, rem, extra,
        |    row_number() OVER (ORDER BY rem DESC, n_name) AS rn
        |  FROM based CROSS JOIN ex)
        |SELECT n_name, cnt, base, rem,
        |  base + CASE WHEN rn <= extra THEN 1 ELSE 0 END AS seats
        |FROM rn ORDER BY n_name""".stripMargin,

    "q_auc" ->
      """WITH f AS (
        |  SELECT doc_id, lang = 'en' AS pos,
        |    CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['the', 'a', 'of', 'to', 'and', 'in', 'is', 'it', 'for', 'on'], t))) AS BIGINT)
        |      / CAST(len(string_split(text, ' ')) AS BIGINT) AS dens
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, dens AS ord,
        |    CAST(row_number() OVER (ORDER BY dens, doc_id) AS BIGINT) AS rnk
        |  FROM f),
        |ties AS (
        |  SELECT ord, min(rnk) + max(rnk) AS mr2 FROM ranked GROUP BY ord),
        |mr AS (
        |  SELECT r.doc_id, t.mr2, f.pos
        |  FROM ranked r JOIN ties t ON r.ord = t.ord
        |  JOIN f ON r.doc_id = f.doc_id),
        |a AS (
        |  SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
        |    CAST(sum(CASE WHEN pos THEN mr2 ELSE 0 END) AS BIGINT) AS rpos_x2
        |  FROM mr)
        |SELECT n_pos, n_neg, rpos_x2 - n_pos * (n_pos + 1) AS u_x2,
        |  (rpos_x2 - n_pos * (n_pos + 1)) * 1000000 // (2 * n_pos * n_neg)
        |    AS auc_ppm
        |FROM a""".stripMargin,

    "q_theil_sen" ->
      """WITH monthly AS (
        |  SELECT n_name,
        |    year(o_orderdate) * 12 + month(o_orderdate) AS m,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100
        |      AS dollars
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, year(o_orderdate) * 12 + month(o_orderdate)),
        |pairs AS (
        |  SELECT a.n_name, a.m AS mi, b.m AS mj,
        |    ((b.dollars - a.dollars) * 1000) // CAST(b.m - a.m AS BIGINT)
        |      AS slope_milli
        |  FROM monthly a JOIN monthly b
        |    ON a.n_name = b.n_name AND a.m < b.m),
        |ranked AS (
        |  SELECT n_name, mi, mj, slope_milli,
        |    row_number() OVER (PARTITION BY n_name
        |      ORDER BY slope_milli, mi, mj) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n_pairs
        |  FROM pairs)
        |SELECT n_name, n_pairs, slope_milli
        |FROM ranked WHERE rnk = (n_pairs + 1) // 2
        |ORDER BY n_name""".stripMargin,

    "q_modularity" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |half AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM half UNION ALL SELECT v, u FROM half),
        |l0 AS (SELECT DISTINCT u AS node, u AS lab FROM edges),
        |c1 AS (
        |  SELECT e.u AS node, l.lab, CAST(count(*) AS BIGINT) AS n
        |  FROM edges e JOIN l0 l ON e.v = l.node GROUP BY 1, 2),
        |l1 AS (
        |  SELECT node, lab FROM (
        |    SELECT node, lab,
        |      row_number() OVER (PARTITION BY node ORDER BY n DESC, lab) AS rn
        |    FROM c1) x WHERE rn = 1),
        |c2 AS (
        |  SELECT e.u AS node, l.lab, CAST(count(*) AS BIGINT) AS n
        |  FROM edges e JOIN l1 l ON e.v = l.node GROUP BY 1, 2),
        |l2 AS (
        |  SELECT node, lab FROM (
        |    SELECT node, lab,
        |      row_number() OVER (PARTITION BY node ORDER BY n DESC, lab) AS rn
        |    FROM c2) x WHERE rn = 1),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM half),
        |intra AS (
        |  SELECT lu.lab AS community, CAST(count(*) AS BIGINT) AS e_c
        |  FROM half h JOIN l2 lu ON h.u = lu.node
        |  JOIN l2 lv ON h.v = lv.node
        |  WHERE lu.lab = lv.lab GROUP BY lu.lab),
        |degc AS (
        |  SELECT l.lab AS community, CAST(count(*) AS BIGINT) AS d_c
        |  FROM edges e JOIN l2 l ON e.u = l.node GROUP BY l.lab),
        |per AS (
        |  SELECT d.community, d.d_c, COALESCE(i.e_c, 0) AS e_c, m
        |  FROM degc d LEFT JOIN intra i ON d.community = i.community
        |  CROSS JOIN mm),
        |agg AS (
        |  SELECT CAST(max(m) AS BIGINT) AS m,
        |    CAST(count(*) AS BIGINT) AS n_communities,
        |    CAST(sum(4 * m * e_c - d_c * d_c) AS BIGINT) AS num
        |  FROM per)
        |SELECT m, n_communities,
        |  CAST(num AS DOUBLE) / CAST(4 * m * m AS DOUBLE) AS modularity
        |FROM agg""".stripMargin,

    "q_mrr" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        |adots AS (
        |  SELECT e.vec_id, c.cid,
        |    list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) AS d
        |  FROM embeddings e CROSS JOIN cents c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        |    FROM adots) x WHERE rn = 1),
        |q AS (
        |  SELECT e.vec_id AS qid, e.embedding AS qv, a.cid AS qcid
        |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
        |  WHERE e.vec_id IN (0, 7, 42, 99, 123)),
        |td AS (
        |  SELECT q.qid, e.vec_id,
        |    (list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0) / (sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0) * sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0)) AS cosine
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.qid),
        |truth AS (
        |  SELECT qid, vec_id AS nn_id FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY greatest(CAST(0 AS BIGINT),
        |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
        |          vec_id) AS rn
        |    FROM td) x WHERE rn = 1),
        |rd AS (
        |  SELECT q.qid, e.vec_id,
        |    (list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0) / (sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0) * sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0)) AS cosine
        |  FROM embeddings e
        |  JOIN assign a ON e.vec_id = a.vec_id
        |  JOIN q ON a.cid = q.qcid
        |  WHERE e.vec_id <> q.qid),
        |ret AS (
        |  SELECT qid, vec_id AS nn_id, CAST(rn AS BIGINT) AS rn FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY greatest(CAST(0 AS BIGINT),
        |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
        |          vec_id) AS rn
        |    FROM rd) x WHERE rn <= 50),
        |perq AS (
        |  SELECT t.qid, t.nn_id,
        |    COALESCE(r.rn, 0) AS rank_in_ivf,
        |    CASE WHEN COALESCE(r.rn, 0) > 0 THEN 1000000 // r.rn ELSE 0 END
        |      AS rr_ppm
        |  FROM truth t LEFT JOIN ret r ON t.qid = r.qid AND t.nn_id = r.nn_id),
        |m AS (
        |  SELECT CAST(sum(rr_ppm) AS BIGINT) AS srr,
        |    CAST(count(*) AS BIGINT) AS nq
        |  FROM perq)
        |SELECT qid, nn_id, rank_in_ivf, rr_ppm, srr // nq AS mrr_ppm
        |FROM perq CROSS JOIN m ORDER BY qid""".stripMargin,

    "q_psi" ->
      """WITH bins AS (
        |  SELECT CAST(CASE WHEN o_totalprice < 50000 THEN 0 WHEN o_totalprice < 100000 THEN 1
        |    WHEN o_totalprice < 150000 THEN 2 WHEN o_totalprice < 200000 THEN 3
        |    WHEN o_totalprice < 250000 THEN 4 WHEN o_totalprice < 300000 THEN 5
        |    WHEN o_totalprice < 400000 THEN 6 ELSE 7 END AS BIGINT) AS bin,
        |    CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN year(o_orderdate) = 2000 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM orders WHERE year(o_orderdate) IN (1996, 2000)
        |  GROUP BY 1),
        |tots AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        |  FROM bins),
        |terms AS (
        |  SELECT bin, ca, cb,
        |    CASE WHEN ca > 0 AND cb > 0 THEN
        |      CAST(floor((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) -
        |          CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) *
        |        ln(CAST(ca * nb AS DOUBLE) / CAST(na * cb AS DOUBLE)) * 1000000
        |        + 0.5) AS BIGINT)
        |    ELSE 0 END AS term_unat
        |  FROM bins CROSS JOIN tots),
        |tot AS (SELECT CAST(sum(term_unat) AS BIGINT) AS psi_unat FROM terms)
        |SELECT bin, ca, cb, term_unat, psi_unat
        |FROM terms CROSS JOIN tot ORDER BY bin""".stripMargin,

    "q_woe_iv" ->
      """WITH bins AS (
        |  SELECT CAST(CASE WHEN l_extendedprice < 20000 THEN 0
        |    WHEN l_extendedprice < 40000 THEN 1
        |    WHEN l_extendedprice < 60000 THEN 2
        |    WHEN l_extendedprice < 80000 THEN 3 ELSE 4 END AS BIGINT) AS bin,
        |    CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS g,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM lineitem GROUP BY 1),
        |tots AS (
        |  SELECT CAST(sum(g) AS BIGINT) AS tg, CAST(sum(b) AS BIGINT) AS tb
        |  FROM bins),
        |terms AS (
        |  SELECT bin, g, b,
        |    CASE WHEN g > 0 AND b > 0 THEN
        |      CAST(floor(ln(CAST(g * tb AS DOUBLE) / CAST(b * tg AS DOUBLE))
        |        * 1000000 + 0.5) AS BIGINT)
        |    ELSE 0 END AS woe_unat,
        |    CASE WHEN g > 0 AND b > 0 THEN
        |      CAST(floor((CAST(g AS DOUBLE) / CAST(tg AS DOUBLE) -
        |          CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)) *
        |        ln(CAST(g * tb AS DOUBLE) / CAST(b * tg AS DOUBLE)) * 1000000
        |        + 0.5) AS BIGINT)
        |    ELSE 0 END AS term_unat
        |  FROM bins CROSS JOIN tots),
        |tot AS (SELECT CAST(sum(term_unat) AS BIGINT) AS iv_unat FROM terms)
        |SELECT bin, g, b, woe_unat, term_unat, iv_unat
        |FROM terms CROSS JOIN tot ORDER BY bin""".stripMargin,

    "q_local_clustering" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |half AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM half e1 JOIN half e2 ON e1.v = e2.u
        |  JOIN half e3 ON e1.u = e3.u AND e2.v = e3.v),
        |tpn AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
        |    SELECT a AS node FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri) x
        |  GROUP BY node),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT u AS node FROM half UNION ALL SELECT v FROM half) x
        |  GROUP BY node)
        |SELECT deg.node, d, COALESCE(tpn.tri, 0) AS tri,
        |  2 * COALESCE(tpn.tri, 0) * 1000000 // (d * (d - 1)) AS coeff_ppm
        |FROM deg LEFT JOIN tpn ON deg.node = tpn.node
        |WHERE d >= 2 ORDER BY deg.node""".stripMargin,

    "q_ndcg" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        |adots AS (
        |  SELECT e.vec_id, c.cid,
        |    list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) AS d
        |  FROM embeddings e CROSS JOIN cents c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        |    FROM adots) x WHERE rn = 1),
        |q AS (
        |  SELECT e.vec_id AS qid, e.embedding AS qv, a.cid AS qcid
        |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
        |  WHERE e.vec_id IN (0, 7, 42, 99, 123)),
        |td AS (
        |  SELECT q.qid, e.vec_id,
        |    (list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0) / (sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0) * sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0)) AS cosine
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.qid),
        |truth AS (
        |  SELECT qid, vec_id, CAST(11 - rn AS BIGINT) AS rel FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY greatest(CAST(0 AS BIGINT),
        |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
        |          vec_id) AS rn
        |    FROM td) x WHERE rn <= 10),
        |rd AS (
        |  SELECT q.qid, e.vec_id,
        |    (list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0) / (sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0) * sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) / 1000000000.0)) AS cosine
        |  FROM embeddings e
        |  JOIN assign a ON e.vec_id = a.vec_id
        |  JOIN q ON a.cid = q.qcid
        |  WHERE e.vec_id <> q.qid),
        |ret AS (
        |  SELECT qid, vec_id, CAST(rn AS BIGINT) AS rn FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY greatest(CAST(0 AS BIGINT),
        |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
        |          vec_id) AS rn
        |    FROM rd) x WHERE rn <= 10),
        |gains AS (
        |  SELECT r.qid,
        |    COALESCE(t.rel, 0) *
        |      CAST(CASE r.rn WHEN 1 THEN 1000000 WHEN 2 THEN 630930 WHEN 3 THEN 500000
        |        WHEN 4 THEN 430677 WHEN 5 THEN 386853 WHEN 6 THEN 356207
        |        WHEN 7 THEN 333333 WHEN 8 THEN 315465 WHEN 9 THEN 301030
        |        ELSE 289065 END AS BIGINT) AS gain_micro
        |  FROM ret r LEFT JOIN truth t ON r.qid = t.qid AND r.vec_id = t.vec_id)
        |SELECT qid, CAST(sum(gain_micro) AS BIGINT) AS dcg_micro,
        |  CAST(sum(gain_micro) AS BIGINT) * 1000000 // 29966114 AS ndcg_ppm
        |FROM gains GROUP BY qid ORDER BY qid""".stripMargin,

    "q_ridge" ->
      """WITH per_order AS (
        |  SELECT l.l_orderkey, CAST(count(*) AS BIGINT) AS x1,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS y
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY l.l_orderkey, o.o_totalprice),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
        |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
        |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
        |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
        |    CAST(sum(x2 * y) AS BIGINT) AS s2y
        |  FROM per_order),
        |el AS (
        |  SELECT n,
        |    CAST(n AS DOUBLE) AS a, CAST(s1 AS DOUBLE) AS b, CAST(s2 AS DOUBLE) AS c,
        |    CAST(s1 AS DOUBLE) AS d, CAST(s11 + 1000 AS DOUBLE) AS e, CAST(s12 AS DOUBLE) AS f,
        |    CAST(s2 AS DOUBLE) AS g, CAST(s12 AS DOUBLE) AS h, CAST(s22 + 1000 AS DOUBLE) AS i,
        |    CAST(sy AS DOUBLE) AS r0, CAST(s1y AS DOUBLE) AS r1, CAST(s2y AS DOUBLE) AS r2
        |  FROM m),
        |dd AS (
        |  SELECT n, a, b, c, d, e, f, g, h, i, r0, r1, r2,
        |    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g) AS det
        |  FROM el)
        |SELECT n,
        |  (r0 * (e * i - f * h) - b * (r1 * i - f * r2) + c * (r1 * h - e * r2)) / det AS beta0,
        |  (a * (r1 * i - f * r2) - r0 * (d * i - f * g) + c * (d * r2 - r1 * g)) / det AS beta1,
        |  (a * (e * r2 - r1 * h) - b * (d * r2 - r1 * g) + r0 * (d * h - e * g)) / det AS beta2
        |FROM dd""".stripMargin,

    "q_gains" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    40 * CAST(len(string_split(text, ' ')) AS BIGINT) +
        |    (-10) * CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) +
        |    (-2) * abs(n_chars - 500) + (-1500) AS logit_milli,
        |    n_chars >= 200 AS label
        |  FROM documents),
        |n AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos_total
        |  FROM scored),
        |ranked AS (
        |  SELECT doc_id, label,
        |    CAST(row_number() OVER (
        |      ORDER BY CAST(0 - logit_milli AS DOUBLE), doc_id) AS BIGINT) AS rnk
        |  FROM scored),
        |deciles AS (
        |  SELECT (rnk - 1) * 10 // n_total + 1 AS decile,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(max(n_total) AS BIGINT) AS n_total,
        |    CAST(max(pos_total) AS BIGINT) AS pos_total
        |  FROM ranked CROSS JOIN n
        |  GROUP BY 1),
        |cum AS (
        |  SELECT decile, n_docs, n_pos, n_total, pos_total,
        |    CAST(sum(n_docs) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
        |    CAST(sum(n_pos) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
        |  FROM deciles)
        |SELECT decile, n_docs, n_pos, cum_docs, cum_pos,
        |  cum_pos * 1000000 // pos_total AS gain_ppm,
        |  cum_pos * n_total * 1000000 // (cum_docs * pos_total) AS lift_ppm
        |FROM cum ORDER BY decile""".stripMargin,

    "q_hhi" ->
      """WITH nation_rev AS (
        |  SELECT r_name, n_name,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS rev_k
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |totals AS (
        |  SELECT r_name, CAST(sum(rev_k) AS BIGINT) AS total_k
        |  FROM nation_rev GROUP BY r_name),
        |shares AS (
        |  SELECT nation_rev.r_name, total_k,
        |    rev_k * 1000000 // total_k AS share_ppm
        |  FROM nation_rev JOIN totals ON nation_rev.r_name = totals.r_name)
        |SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
        |  CAST(max(total_k) AS BIGINT) AS total_k,
        |  CAST(sum(share_ppm * share_ppm) AS BIGINT) // 1000000 AS hhi_ppm,
        |  CAST(max(share_ppm) AS BIGINT) AS top_share_ppm
        |FROM shares GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_silhouette" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        |dists AS (
        |  SELECT e.vec_id, c.cid,
        |    list_sum(list_transform(generate_series(1,64), i ->
        |      CAST(floor((CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
        |        (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
        |        1000000000 + 0.5) AS BIGINT))) AS d2
        |  FROM embeddings e CROSS JOIN cents c),
        |ranked AS (
        |  SELECT vec_id, cid, d2,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |  FROM dists),
        |ab AS (
        |  SELECT a.vec_id, a.cid, a.d2 AS a2, b.d2 AS b2
        |  FROM ranked a JOIN ranked b
        |    ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
        |pv AS (
        |  SELECT vec_id, cid,
        |    CASE WHEN greatest(a2, b2) > 0
        |      THEN (b2 - a2) * 1000000 // greatest(a2, b2) ELSE 0 END AS s_ppm
        |  FROM ab)
        |SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(s_ppm) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_s_ppm
        |FROM pv GROUP BY cid ORDER BY cid""".stripMargin,

    "q_mad" ->
      """WITH vals AS (
        |  SELECT n_name, o_orderkey AS ok,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |r1 AS (
        |  SELECT n_name, ok, CAST(v AS DOUBLE) AS ord,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY CAST(v AS DOUBLE), ok) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n
        |  FROM vals),
        |med AS (
        |  SELECT n_name, CAST(ord AS BIGINT) AS med_cents
        |  FROM r1 WHERE rnk = (n + 1) // 2),
        |dev AS (
        |  SELECT v.n_name, v.ok, v.v, m.med_cents,
        |    abs(v.v - m.med_cents) AS dev
        |  FROM vals v JOIN med m ON v.n_name = m.n_name),
        |r2 AS (
        |  SELECT n_name, ok, CAST(dev AS DOUBLE) AS ord,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY CAST(dev AS DOUBLE), ok) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n
        |  FROM dev),
        |mad AS (
        |  SELECT n_name, CAST(ord AS BIGINT) AS mad_cents
        |  FROM r2 WHERE rnk = (n + 1) // 2)
        |SELECT d.n_name, CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(d.med_cents) AS BIGINT) AS med_cents,
        |  CAST(max(ma.mad_cents) AS BIGINT) AS mad_cents,
        |  CAST(sum(CASE WHEN d.dev > 3 * ma.mad_cents THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad ma ON d.n_name = ma.n_name
        |GROUP BY d.n_name ORDER BY d.n_name""".stripMargin,

    "q_ipf" ->
      """WITH cells AS (
        |  SELECT o_orderpriority, r_name, CAST(count(*) AS BIGINT) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY o_orderpriority, r_name),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cells),
        |w0 AS (
        |  SELECT o_orderpriority, r_name, n,
        |    (total // 5) * 1000000 AS target_w, n * 1000000 AS w
        |  FROM cells CROSS JOIN tot),
        |w1 AS (
        |  SELECT o_orderpriority, r_name, n, target_w,
        |    w * (target_w * 1000000 // CAST(sum(w) OVER (PARTITION BY o_orderpriority) AS BIGINT)) // 1000000 AS w
        |  FROM w0),
        |w2 AS (
        |  SELECT o_orderpriority, r_name, n, target_w,
        |    w * (target_w * 1000000 // CAST(sum(w) OVER (PARTITION BY r_name) AS BIGINT)) // 1000000 AS w
        |  FROM w1),
        |w3 AS (
        |  SELECT o_orderpriority, r_name, n, target_w,
        |    w * (target_w * 1000000 // CAST(sum(w) OVER (PARTITION BY o_orderpriority) AS BIGINT)) // 1000000 AS w
        |  FROM w2),
        |w4 AS (
        |  SELECT o_orderpriority, r_name, n, target_w,
        |    w * (target_w * 1000000 // CAST(sum(w) OVER (PARTITION BY r_name) AS BIGINT)) // 1000000 AS w
        |  FROM w3)
        |SELECT o_orderpriority, r_name, n, w AS w_ppm
        |FROM w4 ORDER BY o_orderpriority, r_name""".stripMargin,

    "q_embed_drift" ->
      """WITH dims AS (
        |  SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT) AS v_fp
        |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g),
        |means AS (
        |  SELECT label, dim,
        |    (CAST(sum(v_fp) AS BIGINT) // CAST(count(*) AS BIGINT)) // 1000
        |      AS mean_u
        |  FROM dims GROUP BY label, dim)
        |SELECT a.label AS l1, b.label AS l2,
        |  CAST(sum((a.mean_u - b.mean_u) * (a.mean_u - b.mean_u)) AS BIGINT)
        |    AS d2_micro
        |FROM means a JOIN means b ON a.dim = b.dim AND a.label < b.label
        |GROUP BY a.label, b.label ORDER BY l1, l2""".stripMargin,

    "q_consistent_hash" ->
      """WITH v AS (
        |  SELECT CAST(i // 32 AS BIGINT) AS pnode,
        |    CAST('0x' || substr(md5('ring|' || CAST(i AS VARCHAR)), 1, 12) AS BIGINT) AS vhash
        |  FROM (SELECT unnest(generate_series(0, 255)) AS i) g),
        |ring AS (SELECT list_sort(list(vhash)) AS varr FROM v),
        |keys AS (
        |  SELECT c_custkey,
        |    CAST('0x' || substr(md5('key|' || CAST(c_custkey AS VARCHAR)), 1, 12) AS BIGINT) AS khash
        |  FROM customer),
        |assigned AS (
        |  SELECT c_custkey, COALESCE(
        |    list_min(list_filter(varr, x -> x >= khash)), list_min(varr)) AS ahash
        |  FROM keys CROSS JOIN ring),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM keys)
        |SELECT pnode, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(count(*) AS BIGINT) * 1000000 // total AS share_ppm
        |FROM assigned JOIN v ON ahash = vhash CROSS JOIN tot
        |GROUP BY pnode, total ORDER BY pnode""".stripMargin,

    "q_quantile_normalize" ->
      """WITH vals AS (
        |  SELECT n_name, o_orderkey AS ok,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |natr AS (
        |  SELECT n_name, ok,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY CAST(v AS DOUBLE), ok) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n_g
        |  FROM vals),
        |globr AS (
        |  SELECT CAST(v AS BIGINT) AS norm_cents,
        |    CAST(row_number() OVER (ORDER BY CAST(v AS DOUBLE), ok) AS BIGINT)
        |      AS rnk
        |  FROM vals),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM vals),
        |tgt AS (
        |  SELECT n_name, rnk * n_tot // n_g AS target_rank
        |  FROM natr CROSS JOIN tot)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(norm_cents) AS BIGINT) AS sum_norm_cents,
        |  CAST(min(norm_cents) AS BIGINT) AS min_norm_cents,
        |  CAST(max(norm_cents) AS BIGINT) AS max_norm_cents
        |FROM tgt JOIN globr ON tgt.target_rank = globr.rnk
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_wilson" ->
      """WITH a AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, n, x,
        |  (CAST(x AS DOUBLE) / CAST(n AS DOUBLE) + 3.8416 / (2.0 * CAST(n AS DOUBLE))
        |    - 1.96 * sqrt(CAST(x AS DOUBLE) / CAST(n AS DOUBLE) *
        |        (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
        |      + 3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |    / (1.0 + 3.8416 / CAST(n AS DOUBLE)) AS wilson_lo,
        |  (CAST(x AS DOUBLE) / CAST(n AS DOUBLE) + 3.8416 / (2.0 * CAST(n AS DOUBLE))
        |    + 1.96 * sqrt(CAST(x AS DOUBLE) / CAST(n AS DOUBLE) *
        |        (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
        |      + 3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |    / (1.0 + 3.8416 / CAST(n AS DOUBLE)) AS wilson_hi
        |FROM a ORDER BY n_name""".stripMargin,

    "q_decile_matrix" ->
      """WITH spend AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders WHERE year(o_orderdate) IN (1996, 1998)
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT yr, o_custkey,
        |    CAST(row_number() OVER (PARTITION BY yr
        |      ORDER BY CAST(c AS DOUBLE), o_custkey) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY yr) AS BIGINT) AS n
        |  FROM spend),
        |deciled AS (
        |  SELECT yr, o_custkey, (rnk - 1) * 10 // n + 1 AS dec
        |  FROM ranked)
        |SELECT a.dec AS d96, b.dec AS d98, CAST(count(*) AS BIGINT) AS n_cust
        |FROM deciled a JOIN deciled b
        |  ON a.o_custkey = b.o_custkey AND a.yr = 1996 AND b.yr = 1998
        |GROUP BY a.dec, b.dec ORDER BY d96, d98""".stripMargin,

    "q_readability" ->
      """SELECT doc_id,
        |  greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS words,
        |  greatest(1, CAST(length(regexp_replace(text, '[.!?]+', 'S', 'g'))
        |    - length(regexp_replace(text, '[.!?]+', '', 'g')) AS BIGINT)) AS sentences,
        |  greatest(1, CAST(length(regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'))
        |    - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT)) AS syllables,
        |  CAST(floor((0.39 * (CAST(greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE)
        |        / CAST(greatest(1, CAST(length(regexp_replace(text, '[.!?]+', 'S', 'g'))
        |            - length(regexp_replace(text, '[.!?]+', '', 'g')) AS BIGINT)) AS DOUBLE))
        |    + 11.8 * (CAST(greatest(1, CAST(length(regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'))
        |            - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT)) AS DOUBLE)
        |        / CAST(greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE))
        |    - 15.59) * 1000 + 0.5) AS BIGINT) AS fk_milli
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lsh_sweep" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(tk) - 4),
        |    i -> array_to_string(tk[i:i+4], ' ')))) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) toks),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |csh AS (
        |  SELECT doc_id, s FROM sh
        |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
        |                  HAVING count(*) > 1000)),
        |tp AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        |  FROM csh a JOIN csh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |truth AS (
        |  SELECT d1, d2 FROM tp
        |  JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |  WHERE shared / (c1.n + c2.n - shared) >= 0.5),
        |hashed AS (
        |  SELECT doc_id, md5('0|' || s) AS m0, md5('1|' || s) AS m1 FROM sh),
        |sigs AS (
        |  SELECT doc_id,
        |    min(substr(m0, 1, 8)) AS h0,
        |    min(substr(m0, 9, 8)) AS h1,
        |    min(substr(m0, 17, 8)) AS h2,
        |    min(substr(m0, 25, 8)) AS h3,
        |    min(substr(m1, 1, 8)) AS h4,
        |    min(substr(m1, 9, 8)) AS h5,
        |    min(substr(m1, 17, 8)) AS h6,
        |    min(substr(m1, 25, 8)) AS h7
        |  FROM hashed GROUP BY doc_id),
        |b1 AS (
        |  SELECT doc_id, u.band AS band, u.sig AS sig
        |  FROM (SELECT doc_id, unnest([struct_pack(band := 0, sig := h0), struct_pack(band := 1, sig := h1), struct_pack(band := 2, sig := h2), struct_pack(band := 3, sig := h3), struct_pack(band := 4, sig := h4), struct_pack(band := 5, sig := h5), struct_pack(band := 6, sig := h6), struct_pack(band := 7, sig := h7)]) AS u FROM sigs) z),
        |b2 AS (
        |  SELECT doc_id, u.band AS band, u.sig AS sig
        |  FROM (SELECT doc_id, unnest([struct_pack(band := 0, sig := h0 || '-' || h1), struct_pack(band := 1, sig := h2 || '-' || h3), struct_pack(band := 2, sig := h4 || '-' || h5), struct_pack(band := 3, sig := h6 || '-' || h7)]) AS u FROM sigs) z),
        |b4 AS (
        |  SELECT doc_id, u.band AS band, u.sig AS sig
        |  FROM (SELECT doc_id, unnest([struct_pack(band := 0, sig := h0 || '-' || h1 || '-' || h2 || '-' || h3), struct_pack(band := 1, sig := h4 || '-' || h5 || '-' || h6 || '-' || h7)]) AS u FROM sigs) z),
        |c1 AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM b1 a JOIN b1 b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |c2 AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM b2 a JOIN b2 b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |c4 AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM b4 a JOIN b4 b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
        |rows_ AS (
        |  SELECT CAST(1 AS BIGINT) AS rows_per_band, CAST(8 AS BIGINT) AS n_bands,
        |    (SELECT CAST(count(*) AS BIGINT) FROM c1) AS n_candidates,
        |    (SELECT CAST(count(*) AS BIGINT) FROM truth t
        |       WHERE EXISTS (SELECT 1 FROM c1 WHERE c1.d1 = t.d1 AND c1.d2 = t.d2)) AS n_found
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), CAST(4 AS BIGINT),
        |    (SELECT CAST(count(*) AS BIGINT) FROM c2),
        |    (SELECT CAST(count(*) AS BIGINT) FROM truth t
        |       WHERE EXISTS (SELECT 1 FROM c2 WHERE c2.d1 = t.d1 AND c2.d2 = t.d2))
        |  UNION ALL
        |  SELECT CAST(4 AS BIGINT), CAST(2 AS BIGINT),
        |    (SELECT CAST(count(*) AS BIGINT) FROM c4),
        |    (SELECT CAST(count(*) AS BIGINT) FROM truth t
        |       WHERE EXISTS (SELECT 1 FROM c4 WHERE c4.d1 = t.d1 AND c4.d2 = t.d2)))
        |SELECT rows_per_band, n_bands, n_candidates, n_found,
        |  CASE WHEN n_true > 0 THEN n_found * 1000000 // n_true ELSE 0 END
        |    AS recall_ppm
        |FROM rows_ CROSS JOIN nt ORDER BY rows_per_band""".stripMargin,

    "q_purchase_gaps" ->
      """WITH days_ AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
        |      AS day
        |  FROM orders),
        |gaps AS (
        |  SELECT o_custkey, o_orderkey AS ok,
        |    day - lag(day, 1) OVER (PARTITION BY o_custkey
        |      ORDER BY day, o_orderkey) AS gap
        |  FROM days_),
        |ng AS (
        |  SELECT n_name, ok, gap
        |  FROM gaps
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE gap IS NOT NULL),
        |ranked AS (
        |  SELECT n_name, gap,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY CAST(gap AS DOUBLE), ok) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n_gaps
        |  FROM ng)
        |SELECT n_name, CAST(max(n_gaps) AS BIGINT) AS n_gaps,
        |  CAST(min(gap) AS BIGINT) AS median_days,
        |  CAST(max(gap) AS BIGINT) AS p90_days
        |FROM ranked
        |WHERE rnk = (n_gaps + 1) // 2 OR rnk = (9 * n_gaps + 9) // 10
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_effect_size" ->
      """WITH v AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS v
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |g AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS ss
        |  FROM v GROUP BY grp),
        |m AS (
        |  SELECT max(CASE WHEN grp = '1-URGENT' THEN n END) AS n1,
        |    max(CASE WHEN grp = '1-URGENT' THEN sv END) AS s1,
        |    max(CASE WHEN grp = '1-URGENT' THEN ss END) AS ss1,
        |    max(CASE WHEN grp = '5-LOW' THEN n END) AS n2,
        |    max(CASE WHEN grp = '5-LOW' THEN sv END) AS s2,
        |    max(CASE WHEN grp = '5-LOW' THEN ss END) AS ss2
        |  FROM g),
        |e AS (
        |  SELECT n1, n2, s1, s2, ss1, ss2,
        |    (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1,
        |    (CAST(n2 AS DOUBLE) * CAST(ss2 AS DOUBLE)
        |      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
        |      / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) AS v2
        |  FROM m),
        |dd AS (
        |  SELECT n1, n2,
        |    (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |    / sqrt(((CAST(n1 AS DOUBLE) - 1.0) * v1 + (CAST(n2 AS DOUBLE) - 1.0) * v2)
        |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)) AS d
        |  FROM e)
        |SELECT n1, n2, d AS cohen_d,
        |  d * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 9.0))
        |    AS hedges_g
        |FROM dd""".stripMargin,

    "q_median_ci" ->
      """WITH vals AS (
        |  SELECT n_name, o_orderkey AS ok,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |ranked AS (
        |  SELECT n_name, v,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY CAST(v AS DOUBLE), ok) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n
        |  FROM vals),
        |br AS (
        |  SELECT n_name, n,
        |    greatest(1, CAST(floor((CAST(n AS DOUBLE) - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)) AS lo_rank,
        |    least(n, CAST(ceil((CAST(n AS DOUBLE) + 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT) + 1) AS hi_rank,
        |    (n + 1) // 2 AS med_rank
        |  FROM (SELECT DISTINCT n_name, n FROM ranked) x)
        |SELECT r.n_name, CAST(max(r.n) AS BIGINT) AS n,
        |  CAST(max(CASE WHEN rnk = lo_rank THEN v END) AS BIGINT) AS ci_lo_cents,
        |  CAST(max(CASE WHEN rnk = med_rank THEN v END) AS BIGINT) AS median_cents,
        |  CAST(max(CASE WHEN rnk = hi_rank THEN v END) AS BIGINT) AS ci_hi_cents
        |FROM ranked r JOIN br ON r.n_name = br.n_name
        |WHERE rnk = lo_rank OR rnk = med_rank OR rnk = hi_rank
        |GROUP BY r.n_name ORDER BY r.n_name""".stripMargin,

    "q_stickiness" ->
      """WITH d AS (
        |  SELECT user_id,
        |    (epoch_ns(ts) // 1000000000) // 86400 AS day
        |  FROM events),
        |dd AS (SELECT user_id, day, day // 30 AS win FROM d),
        |daily AS (
        |  SELECT win, day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM dd GROUP BY win, day),
        |per_win AS (
        |  SELECT win, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(dau) AS BIGINT) AS sum_dau
        |  FROM daily GROUP BY win),
        |monthly AS (
        |  SELECT win, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        |  FROM dd GROUP BY win)
        |SELECT per_win.win, n_days, sum_dau, mau,
        |  sum_dau * 1000000 // (n_days * mau) AS stickiness_ppm
        |FROM per_win JOIN monthly ON per_win.win = monthly.win
        |ORDER BY per_win.win""".stripMargin,

    "q_markov2" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev,
        |    event_type AS next
        |  FROM events),
        |c AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev, CAST(sum(n) AS BIGINT) AS total
        |      FROM c GROUP BY 1),
        |p1 AS (
        |  SELECT prev, next, n * 1000000 // total AS p_ppm
        |  FROM c JOIN t USING (prev))
        |SELECT a.prev, b.next,
        |  CAST(sum(a.p_ppm * b.p_ppm) AS BIGINT) // 1000000 AS p2_ppm
        |FROM p1 a JOIN p1 b ON a.next = b.prev
        |GROUP BY a.prev, b.next ORDER BY a.prev, b.next""".stripMargin,

    "q_hazard" ->
      """WITH tenure AS (
        |  SELECT CAST(max(year(o_orderdate) * 12 + month(o_orderdate))
        |      - min(year(o_orderdate) * 12 + month(o_orderdate)) AS BIGINT)
        |    AS tenure
        |  FROM orders GROUP BY o_custkey),
        |c AS (
        |  SELECT tenure, CAST(count(*) AS BIGINT) AS churned
        |  FROM tenure GROUP BY tenure),
        |r AS (
        |  SELECT tenure, churned,
        |    CAST(sum(churned) OVER (ORDER BY tenure DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS at_risk
        |  FROM c)
        |SELECT tenure, churned, at_risk,
        |  churned * 1000000 // at_risk AS hazard_ppm
        |FROM r ORDER BY tenure""".stripMargin,

    "q_dispersion" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    (epoch_ns(ts) // 1000000000) // 86400 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY event_type, (epoch_ns(ts) // 1000000000) // 86400),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS scc
        |  FROM daily GROUP BY event_type)
        |SELECT event_type, n_days, sc AS n_events,
        |  (n_days * scc - sc * sc) * 1000000 // ((n_days - 1) * sc) AS fano_ppm
        |FROM m WHERE n_days > 1 ORDER BY event_type""".stripMargin,

    "q_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(year(o_orderdate) * 4 + quarter(o_orderdate) AS BIGINT) AS q,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |cohorts AS (
        |  SELECT o_custkey, CAST(min(q) AS BIGINT) AS cohort_q
        |  FROM o GROUP BY o_custkey),
        |sizes AS (
        |  SELECT cohort_q, CAST(count(*) AS BIGINT) AS n_cust
        |  FROM cohorts GROUP BY cohort_q),
        |per_offset AS (
        |  SELECT cohort_q, q - cohort_q AS qtr_offset,
        |    CAST(sum(c) AS BIGINT) AS cents
        |  FROM o JOIN cohorts USING (o_custkey)
        |  GROUP BY cohort_q, q - cohort_q),
        |cum AS (
        |  SELECT cohort_q, qtr_offset, cents,
        |    CAST(sum(cents) OVER (PARTITION BY cohort_q ORDER BY qtr_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_cents
        |  FROM per_offset)
        |SELECT cohort_q, qtr_offset, n_cust, cum_cents,
        |  cum_cents // n_cust AS ltv_cents
        |FROM cum JOIN sizes USING (cohort_q)
        |ORDER BY cohort_q, qtr_offset""".stripMargin,

    "q_laspeyres" ->
      """WITH py AS (
        |  SELECT l_partkey, CAST(year(l_shipdate) AS BIGINT) AS yr,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY l_partkey, year(l_shipdate)),
        |base AS (
        |  SELECT l_partkey, cents AS cents0, qty AS q0
        |  FROM py WHERE yr = 1996)
        |SELECT yr, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(cents * q0 // qty) AS BIGINT) * 1000000
        |    // CAST(sum(cents0) AS BIGINT) AS index_ppm
        |FROM py JOIN base USING (l_partkey)
        |GROUP BY yr ORDER BY yr""".stripMargin,

    "q_fifo_match" ->
      """WITH li AS (
        |  SELECT l_partkey AS pk, l_orderkey AS ok, l_linenumber AS ln,
        |    l_shipdate AS sd, CAST(l_quantity AS BIGINT) AS qty,
        |    l_returnflag = 'R' AS is_out
        |  FROM lineitem WHERE l_partkey % 50 = 0),
        |ins AS (
        |  SELECT pk,
        |    CAST(sum(qty) OVER w - qty AS BIGINT) AS cum_start,
        |    CAST(sum(qty) OVER w AS BIGINT) AS cum_end
        |  FROM li WHERE NOT is_out
        |  WINDOW w AS (PARTITION BY pk ORDER BY sd, ok, ln
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |outs AS (
        |  SELECT pk,
        |    CAST(sum(qty) OVER w - qty AS BIGINT) AS cum_start,
        |    CAST(sum(qty) OVER w AS BIGINT) AS cum_end
        |  FROM li WHERE is_out
        |  WINDOW w AS (PARTITION BY pk ORDER BY sd, ok, ln
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |matched AS (
        |  SELECT i.pk, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(least(i.cum_end, o.cum_end)
        |      - greatest(i.cum_start, o.cum_start)) AS BIGINT) AS matched_qty
        |  FROM ins i JOIN outs o
        |    ON i.pk = o.pk AND i.cum_start < o.cum_end
        |      AND o.cum_start < i.cum_end
        |  GROUP BY i.pk),
        |totals AS (
        |  SELECT pk,
        |    CAST(sum(CASE WHEN NOT is_out THEN qty ELSE 0 END) AS BIGINT)
        |      AS total_in,
        |    CAST(sum(CASE WHEN is_out THEN qty ELSE 0 END) AS BIGINT)
        |      AS total_out
        |  FROM li GROUP BY pk)
        |SELECT t.pk, total_in, total_out,
        |  COALESCE(n_pairs, 0) AS n_pairs,
        |  COALESCE(matched_qty, 0) AS matched_qty,
        |  COALESCE(matched_qty, 0) = least(total_in, total_out) AS fifo_ok
        |FROM totals t LEFT JOIN matched m ON t.pk = m.pk
        |ORDER BY t.pk""".stripMargin,

    "q_year_overlap" ->
      """WITH cy AS (
        |  SELECT DISTINCT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr
        |  FROM orders),
        |sizes AS (SELECT yr, CAST(count(*) AS BIGINT) AS n FROM cy GROUP BY yr),
        |inter AS (
        |  SELECT a.yr AS y1, b.yr AS y2, CAST(count(*) AS BIGINT) AS inter
        |  FROM cy a JOIN cy b
        |    ON a.o_custkey = b.o_custkey AND a.yr < b.yr
        |  GROUP BY a.yr, b.yr)
        |SELECT y1, y2, s1.n AS n1, s2.n AS n2, inter,
        |  inter * 1000000 // least(s1.n, s2.n) AS overlap_ppm,
        |  inter * 1000000 // (s1.n + s2.n - inter) AS jaccard_ppm
        |FROM inter JOIN sizes s1 ON y1 = s1.yr JOIN sizes s2 ON y2 = s2.yr
        |ORDER BY y1, y2""".stripMargin,

    "q_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT v, CAST(row_number() OVER (ORDER BY CAST(v AS DOUBLE), day) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM daily),
        |med AS (SELECT CAST(v AS BIGINT) AS med FROM ranked WHERE rnk = (n + 1) // 2),
        |signs AS (
        |  SELECT day, v > med AS above,
        |    CASE WHEN (v > med) <> lag(v > med) OVER (ORDER BY day)
        |      THEN 1 ELSE 0 END AS flip
        |  FROM daily CROSS JOIN med),
        |a AS (
        |  SELECT CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN NOT above THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(flip) + 1 AS BIGINT) AS runs
        |  FROM signs)
        |SELECT n1, n2, runs,
        |  (CAST(runs AS DOUBLE) - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
        |  / sqrt((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)))
        |    / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |      * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))) AS z
        |FROM a""".stripMargin,

    "q_pchart" ->
      """WITH weekly AS (
        |  SELECT CAST(datediff('day', TIMESTAMP '1995-01-01', l_shipdate) AS BIGINT) // 7 AS week,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM lineitem GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(d) AS BIGINT) AS dd
        |  FROM weekly),
        |lim AS (
        |  SELECT week, n, d, d * 1000000 // n AS rate_ppm,
        |    greatest(0.0, CAST(dd AS DOUBLE) / CAST(nn AS DOUBLE)
        |      - 3.0 * sqrt(CAST(dd AS DOUBLE) / CAST(nn AS DOUBLE)
        |          * (1.0 - CAST(dd AS DOUBLE) / CAST(nn AS DOUBLE))
        |          / CAST(n AS DOUBLE))) AS lcl,
        |    CAST(dd AS DOUBLE) / CAST(nn AS DOUBLE)
        |      + 3.0 * sqrt(CAST(dd AS DOUBLE) / CAST(nn AS DOUBLE)
        |          * (1.0 - CAST(dd AS DOUBLE) / CAST(nn AS DOUBLE))
        |          / CAST(n AS DOUBLE)) AS ucl
        |  FROM weekly CROSS JOIN tot)
        |SELECT week, n, d, rate_ppm, lcl, ucl,
        |  (CAST(d AS DOUBLE) / CAST(n AS DOUBLE) < lcl
        |    OR CAST(d AS DOUBLE) / CAST(n AS DOUBLE) > ucl) AS out_of_control
        |FROM lim ORDER BY week""".stripMargin,

    "q_keyness" ->
      """WITH toks AS (
        |  SELECT lang = 'en' AS is_en, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |counts AS (
        |  SELECT w,
        |    CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS o1,
        |    CAST(sum(CASE WHEN NOT is_en THEN 1 ELSE 0 END) AS BIGINT) AS o2
        |  FROM toks WHERE length(w) > 0
        |  GROUP BY w HAVING sum(CASE WHEN is_en THEN 1 ELSE 0 END)
        |    + sum(CASE WHEN NOT is_en THEN 1 ELSE 0 END) >= 10),
        |tots AS (
        |  SELECT CAST(sum(o1) AS BIGINT) AS r1, CAST(sum(o2) AS BIGINT) AS r2
        |  FROM counts),
        |g AS (
        |  SELECT w, o1, o2,
        |    CAST(floor(2.0 * (
        |      CASE WHEN o1 > 0 THEN CAST(o1 AS DOUBLE)
        |        * ln(CAST(o1 * (r1 + r2) AS DOUBLE) / CAST(r1 * (o1 + o2) AS DOUBLE))
        |      ELSE 0.0 END
        |      + CASE WHEN o2 > 0 THEN CAST(o2 AS DOUBLE)
        |        * ln(CAST(o2 * (r1 + r2) AS DOUBLE) / CAST(r2 * (o1 + o2) AS DOUBLE))
        |      ELSE 0.0 END) * 1000000 + 0.5) AS BIGINT) AS g2_unat
        |  FROM counts CROSS JOIN tots)
        |SELECT w, o1, o2, g2_unat
        |FROM g ORDER BY g2_unat DESC, w LIMIT 20""".stripMargin,

    "q_weekday_effect" ->
      """WITH daily AS (
        |  SELECT CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) % 7 AS dow,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(cents) AS BIGINT) AS cc
        |  FROM daily),
        |terms AS (
        |  SELECT dow, n, cents,
        |    (cents // 100) * 7000000 // (cc // 100) AS rev_index_ppm,
        |    ((7 * n - nn) * (7 * n - nn)) // (7 * nn) * 1000000 // nn
        |      AS chi_term_micro
        |  FROM daily CROSS JOIN tot),
        |chi AS (SELECT CAST(sum(chi_term_micro) AS BIGINT) AS chi2_micro FROM terms)
        |SELECT dow, n, cents, rev_index_ppm, chi_term_micro, chi2_micro
        |FROM terms CROSS JOIN chi ORDER BY dow""".stripMargin,

    "q_time_to_convert" ->
      """WITH firsts AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS v,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS p
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY user_id),
        |deltas AS (
        |  SELECT user_id, (p - v) // 1000000000 AS delta_s
        |  FROM firsts WHERE v IS NOT NULL AND p IS NOT NULL AND p > v),
        |ranked AS (
        |  SELECT delta_s,
        |    CAST(row_number() OVER (ORDER BY CAST(delta_s AS DOUBLE), user_id) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM deltas)
        |SELECT CAST(max(n) AS BIGINT) AS n_converted,
        |  CAST(min(delta_s) AS BIGINT) AS median_s,
        |  CAST(max(delta_s) AS BIGINT) AS p90_s
        |FROM ranked
        |WHERE rnk = (n + 1) // 2 OR rnk = (9 * n + 9) // 10""".stripMargin,

    "q_item_recs" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |freq AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM items GROUP BY l_partkey),
        |pairs AS (
        |  SELECT a.l_partkey AS i, b.l_partkey AS j,
        |    CAST(count(*) AS BIGINT) AS cij
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT i, j, cij * cij * 1000000 // (fi.cnt * fj.cnt) AS sim2_ppm
        |  FROM pairs
        |  JOIN freq fi ON i = fi.l_partkey
        |  JOIN freq fj ON j = fj.l_partkey),
        |keyed AS (
        |  SELECT i, j, sim2_ppm,
        |    lpad(CAST(1000000 - sim2_ppm AS VARCHAR), 9, '0') || '-' ||
        |      lpad(CAST(j AS VARCHAR), 12, '0') AS k
        |  FROM scored),
        |ranked AS (
        |  SELECT i, j, sim2_ppm,
        |    CAST(row_number() OVER (PARTITION BY i ORDER BY k) AS BIGINT) AS rn
        |  FROM keyed)
        |SELECT i, rn, j AS rec, sim2_ppm
        |FROM ranked WHERE rn <= 3 ORDER BY i, rn""".stripMargin,

    "q_breakpoint" ->
      """WITH daily AS (
        |  SELECT CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100000 AS v
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s FROM daily),
        |pref AS (
        |  SELECT day,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
        |    CAST(sum(v) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s1
        |  FROM daily),
        |scored AS (
        |  SELECT day, t, s1, n, s,
        |    CAST(s1 * s1 AS DOUBLE) / CAST(t AS DOUBLE)
        |      + CAST((s - s1) * (s - s1) AS DOUBLE) / CAST(n - t AS DOUBLE)
        |      AS score
        |  FROM pref CROSS JOIN tot
        |  WHERE t < n),
        |best AS (
        |  SELECT day, t, s1, n, s, score,
        |    row_number() OVER (ORDER BY score DESC, day) AS rk
        |  FROM scored)
        |SELECT day AS split_day, t AS n_before, n - t AS n_after,
        |  s1 // t AS mean_before_k, (s - s1) // (n - t) AS mean_after_k,
        |  score
        |FROM best WHERE rk = 1""".stripMargin,

    "q_kruskal_wallis" ->
      """WITH sample AS (
        |  SELECT o_orderkey AS ok, o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders),
        |ranked AS (
        |  SELECT ok, CAST(v AS DOUBLE) AS ord,
        |    CAST(row_number() OVER (ORDER BY CAST(v AS DOUBLE), ok) AS BIGINT) AS rnk
        |  FROM sample),
        |ties AS (
        |  SELECT ord, min(rnk) + max(rnk) AS mr2, CAST(count(*) AS BIGINT) AS t
        |  FROM ranked GROUP BY ord),
        |tt AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3 FROM ties),
        |pg AS (
        |  SELECT s.grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(t2.mr2) AS BIGINT) AS r2
        |  FROM ranked r JOIN ties t2 ON r.ord = t2.ord
        |  JOIN sample s ON r.ok = s.ok
        |  GROUP BY s.grp),
        |wide AS (
        |  SELECT
        |    max(CASE WHEN grp = '1-URGENT' THEN n END) AS n0,
        |    max(CASE WHEN grp = '1-URGENT' THEN r2 END) AS r0,
        |    max(CASE WHEN grp = '2-HIGH' THEN n END) AS n1,
        |    max(CASE WHEN grp = '2-HIGH' THEN r2 END) AS r1,
        |    max(CASE WHEN grp = '3-MEDIUM' THEN n END) AS n2,
        |    max(CASE WHEN grp = '3-MEDIUM' THEN r2 END) AS r2,
        |    max(CASE WHEN grp = '4-NOT SPECIFIED' THEN n END) AS n3,
        |    max(CASE WHEN grp = '4-NOT SPECIFIED' THEN r2 END) AS r3,
        |    max(CASE WHEN grp = '5-LOW' THEN n END) AS n4,
        |    max(CASE WHEN grp = '5-LOW' THEN r2 END) AS r4
        |  FROM pg),
        |hh AS (
        |  SELECT n0 + n1 + n2 + n3 + n4 AS n_total, tie3,
        |    3.0 * ((CAST(r0 AS DOUBLE) * CAST(r0 AS DOUBLE)) / CAST(n0 AS DOUBLE)
        |      + (CAST(r1 AS DOUBLE) * CAST(r1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
        |      + (CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)) / CAST(n2 AS DOUBLE)
        |      + (CAST(r3 AS DOUBLE) * CAST(r3 AS DOUBLE)) / CAST(n3 AS DOUBLE)
        |      + (CAST(r4 AS DOUBLE) * CAST(r4 AS DOUBLE)) / CAST(n4 AS DOUBLE))
        |      / (CAST(n0 + n1 + n2 + n3 + n4 AS DOUBLE)
        |        * CAST(n0 + n1 + n2 + n3 + n4 + 1 AS DOUBLE))
        |    - 3.0 * CAST(n0 + n1 + n2 + n3 + n4 + 1 AS DOUBLE) AS h_raw
        |  FROM wide CROSS JOIN tt)
        |SELECT n_total, tie3, h_raw,
        |  h_raw / (1.0 - CAST(tie3 AS DOUBLE)
        |    / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
        |      * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE))) AS h
        |FROM hh""".stripMargin,

    "q_partial_corr" ->
      """WITH per_order AS (
        |  SELECT l.l_orderkey, CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS z
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY l.l_orderkey, o.o_totalprice),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(z) AS BIGINT) AS sz,
        |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(z * z) AS BIGINT) AS szz, CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * z) AS BIGINT) AS sxz, CAST(sum(y * z) AS BIGINT) AS syz
        |  FROM per_order),
        |r AS (
        |  SELECT n,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r_xy,
        |    (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
        |      / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * sqrt(CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS r_xz,
        |    (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
        |      / (sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |        * sqrt(CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS r_yz
        |  FROM m)
        |SELECT n, r_xy, r_xz, r_yz,
        |  (r_xz - r_xy * r_yz)
        |    / (sqrt(1.0 - r_xy * r_xy) * sqrt(1.0 - r_yz * r_yz)) AS r_xz_given_y
        |FROM r""".stripMargin,

    "q_shift_share" ->
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |    CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) // 100 AS d1,
        |    CAST(sum(CASE WHEN year(o_orderdate) = 2000 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) // 100 AS d2
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE year(o_orderdate) IN (1996, 2000)
        |  GROUP BY r_name, n_name),
        |regional AS (
        |  SELECT r_name, CAST(sum(d1) AS BIGINT) AS rr1,
        |    CAST(sum(d2) AS BIGINT) AS rr2
        |  FROM rev GROUP BY r_name),
        |national AS (
        |  SELECT CAST(sum(d1) AS BIGINT) AS t1, CAST(sum(d2) AS BIGINT) AS t2
        |  FROM rev),
        |j AS (
        |  SELECT rev.r_name, n_name, d1, d2,
        |    (t2 - t1) * 1000000 // t1 AS g_nat_ppm,
        |    (rr2 - rr1) * 1000000 // rr1 AS g_reg_ppm,
        |    (d2 - d1) * 1000000 // d1 AS g_own_ppm
        |  FROM rev JOIN regional ON rev.r_name = regional.r_name
        |  CROSS JOIN national
        |  WHERE d1 > 0)
        |SELECT r_name, n_name, d1, d2, g_own_ppm,
        |  d1 * g_nat_ppm // 1000000 AS national_eff,
        |  d1 * (g_reg_ppm - g_nat_ppm) // 1000000 AS mix_eff,
        |  d1 * (g_own_ppm - g_reg_ppm) // 1000000 AS competitive_eff
        |FROM j ORDER BY r_name, n_name""".stripMargin,

    "q_cronbach" ->
      """WITH items AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS s1,
        |    n_chars // 10 AS s2,
        |    CAST(length(regexp_replace(text, '[.!?]+', 'S', 'g'))
        |      - length(regexp_replace(text, '[.!?]+', '', 'g')) AS BIGINT) * 10
        |      AS s3
        |  FROM documents),
        |w AS (SELECT s1, s2, s3, s1 + s2 + s3 AS tot FROM items),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(s1) AS BIGINT) AS a1, CAST(sum(s1 * s1) AS BIGINT) AS q1,
        |    CAST(sum(s2) AS BIGINT) AS a2, CAST(sum(s2 * s2) AS BIGINT) AS q2,
        |    CAST(sum(s3) AS BIGINT) AS a3, CAST(sum(s3 * s3) AS BIGINT) AS q3,
        |    CAST(sum(tot) AS BIGINT) AS at, CAST(sum(tot * tot) AS BIGINT) AS qt
        |  FROM w)
        |SELECT n,
        |  (3.0 / 2.0) * (1.0 - (
        |      (CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE) - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
        |    + (CAST(n AS DOUBLE) * CAST(q2 AS DOUBLE) - CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
        |    + (CAST(n AS DOUBLE) * CAST(q3 AS DOUBLE) - CAST(a3 AS DOUBLE) * CAST(a3 AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |    / ((CAST(n AS DOUBLE) * CAST(qt AS DOUBLE) - CAST(at AS DOUBLE) * CAST(at AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
        |    AS alpha
        |FROM m""".stripMargin,

    "q_mde" ->
      """WITH a AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, n, n // 2 AS n_arm, x * 1000000 // n AS p_ppm,
        |  2.8 * sqrt(2.0 * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
        |    / CAST(n // 2 AS DOUBLE)) AS mde
        |FROM a ORDER BY n_name""".stripMargin,

    "q_simpsons" ->
      """WITH li AS (
        |  SELECT n_name, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 100 AS y
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |per_nation AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM li GROUP BY n_name),
        |pooled AS (
        |  SELECT CAST(count(*) AS BIGINT) * CAST(sum(x * y) AS BIGINT)
        |    - CAST(sum(x) AS BIGINT) * CAST(sum(y) AS BIGINT) AS num_pooled
        |  FROM li)
        |SELECT n_name, n, n * sxy - sx * sy AS num_own, num_pooled,
        |  ((n * sxy - sx * sy > 0 AND num_pooled < 0)
        |    OR (n * sxy - sx * sy < 0 AND num_pooled > 0)) AS reversed
        |FROM per_nation CROSS JOIN pooled ORDER BY n_name""".stripMargin,

    "q_qcd" ->
      """WITH li AS (
        |  SELECT p_brand,
        |    l_orderkey * 10 + CAST(l_linenumber AS BIGINT) AS lk,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |ranked AS (
        |  SELECT p_brand, v,
        |    CAST(row_number() OVER (PARTITION BY p_brand
        |      ORDER BY CAST(v AS DOUBLE), lk) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n
        |  FROM li),
        |qs AS (
        |  SELECT p_brand, CAST(max(n) AS BIGINT) AS n,
        |    CAST(max(CASE WHEN rnk = (n + 3) // 4 THEN v END) AS BIGINT) AS q1_cents,
        |    CAST(max(CASE WHEN rnk = (3 * n + 3) // 4 THEN v END) AS BIGINT) AS q3_cents
        |  FROM ranked
        |  WHERE rnk = (n + 3) // 4 OR rnk = (3 * n + 3) // 4
        |  GROUP BY p_brand)
        |SELECT p_brand, n, q1_cents, q3_cents,
        |  (q3_cents - q1_cents) * 1000000 // (q3_cents + q1_cents) AS qcd_ppm
        |FROM qs ORDER BY p_brand""".stripMargin,

    "q_boilerplate" ->
      """WITH sents AS (
        |  SELECT doc_id, source, unnest(string_split(text, '. ')) AS sent
        |  FROM documents),
        |fs AS (SELECT doc_id, source, sent FROM sents WHERE length(sent) > 20),
        |df AS (
        |  SELECT sent, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
        |  FROM fs GROUP BY sent),
        |j AS (SELECT fs.source, fs.sent, df.doc_freq
        |      FROM fs JOIN df ON fs.sent = df.sent)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_sentences,
        |  CAST(sum(CASE WHEN doc_freq >= 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boiler,
        |  CAST(sum(CASE WHEN doc_freq >= 5 THEN length(sent) ELSE 0 END)
        |    AS BIGINT) * 1000000
        |    // CAST(sum(length(sent)) AS BIGINT) AS boiler_char_ppm
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "q_fertility" ->
      """WITH f AS (
        |  SELECT lang, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |      w -> (length(w) + 3) // 4)) AS BIGINT) AS est_tokens
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(words) AS BIGINT) AS total_words,
        |  CAST(sum(est_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(est_tokens) AS BIGINT) * 1000000
        |    // CAST(sum(words) AS BIGINT) AS fertility_ppm,
        |  CAST(sum(n_chars) AS BIGINT) * 1000000
        |    // CAST(sum(est_tokens) AS BIGINT) AS chars_per_token_ppm
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    "q_curriculum" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS words,
        |    CAST(floor((0.39 * (CAST(greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE)
        |          / CAST(greatest(1, CAST(length(regexp_replace(text, '[.!?]+', 'S', 'g'))
        |              - length(regexp_replace(text, '[.!?]+', '', 'g')) AS BIGINT)) AS DOUBLE))
        |      + 11.8 * (CAST(greatest(1, CAST(length(regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'))
        |              - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT)) AS DOUBLE)
        |          / CAST(greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE))
        |      - 15.59) * 1000 + 0.5) AS BIGINT) AS fk_milli
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, words, fk_milli,
        |    CAST(row_number() OVER (
        |      ORDER BY CAST(fk_milli AS DOUBLE), doc_id) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM scored)
        |SELECT (rnk - 1) * 4 // n + 1 AS stage,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(fk_milli) AS BIGINT) AS fk_min_milli,
        |  CAST(max(fk_milli) AS BIGINT) AS fk_max_milli,
        |  CAST(sum(words) AS BIGINT) AS total_words,
        |  CAST(sum(words) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_words
        |FROM ranked GROUP BY 1 ORDER BY stage""".stripMargin,

    "q_odds_ratio" ->
      """WITH cells AS (
        |  SELECT
        |    CAST(sum(CASE WHEN urgent AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN urgent AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT urgent AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN NOT urgent AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM lineitem JOIN (
        |    SELECT o_orderkey, o_orderpriority = '1-URGENT' AS urgent
        |    FROM orders) o ON l_orderkey = o_orderkey)
        |SELECT a, b, c, d,
        |  (a * 1000000 // b) * d // c AS or_ppm,
        |  CAST(floor((ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE))
        |    - 1.96 * sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
        |      + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE)))
        |    * 1000000 + 0.5) AS BIGINT) AS ln_or_lo_micro,
        |  CAST(floor((ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE))
        |    + 1.96 * sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
        |      + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE)))
        |    * 1000000 + 0.5) AS BIGINT) AS ln_or_hi_micro
        |FROM cells""".stripMargin,

    "q_sprt" ->
      """WITH daily AS (
        |  SELECT CAST(datediff('day', TIMESTAMP '1995-01-01', l_shipdate) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
        |  FROM lineitem GROUP BY 1),
        |traced AS (
        |  SELECT day,
        |    CAST(sum(r * 60625 + (n - r) * (-29853)) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS llr_micro
        |  FROM daily),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    min(CASE WHEN llr_micro >= 2772589 THEN day END) AS h1_day,
        |    min(CASE WHEN llr_micro <= -1558145 THEN day END) AS h0_day,
        |    CAST(max(llr_micro) AS BIGINT) AS max_llr_micro,
        |    CAST(min(llr_micro) AS BIGINT) AS min_llr_micro
        |  FROM traced)
        |SELECT n_days,
        |  COALESCE(least(h1_day, h0_day),
        |    COALESCE(h1_day, h0_day, -1)) AS first_cross_day,
        |  CASE WHEN h1_day IS NOT NULL
        |      AND (h0_day IS NULL OR h1_day < h0_day) THEN 'accept_h1'
        |    WHEN h0_day IS NOT NULL THEN 'accept_h0'
        |    ELSE 'continue' END AS decision,
        |  max_llr_micro, min_llr_micro
        |FROM a""".stripMargin,

    "q_trimmed_mean" ->
      """WITH vals AS (
        |  SELECT n_name, o_orderkey AS ok,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |ranked AS (
        |  SELECT n_name, v,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY CAST(v AS DOUBLE), ok) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n
        |  FROM vals)
        |SELECT n_name, CAST(max(n) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS trimmed_mean_cents
        |FROM ranked
        |WHERE rnk > n // 10 AND rnk <= n - n // 10
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_lof" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        |adots AS (
        |  SELECT e.vec_id, c.cid,
        |    list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) AS d
        |  FROM embeddings e CROSS JOIN cents c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        |    FROM adots) x WHERE rn = 1),
        |vecs AS (
        |  SELECT a.cid, e.vec_id, e.embedding
        |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
        |d2 AS (
        |  SELECT a.cid, a.vec_id AS p, b.vec_id AS o,
        |    list_sum(list_transform(generate_series(1,64), i ->
        |      CAST(floor((CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
        |        (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
        |        1000000000 + 0.5) AS BIGINT))) AS d2
        |  FROM vecs a JOIN vecs b
        |    ON a.cid = b.cid AND a.vec_id <> b.vec_id),
        |rnked AS (
        |  SELECT cid, p, o, d2,
        |    row_number() OVER (PARTITION BY p ORDER BY d2, o) AS rnk
        |  FROM d2),
        |kdist AS (SELECT p AS o, d2 AS kdist_o FROM rnked WHERE rnk = 3),
        |neighbors AS (
        |  SELECT r.cid, r.p, r.o, greatest(r.d2, k.kdist_o) AS reach
        |  FROM rnked r JOIN kdist k ON r.o = k.o
        |  WHERE r.rnk <= 3),
        |lrd AS (
        |  SELECT cid, p,
        |    least(3 * 1000000000000000000 // CAST(sum(reach) AS BIGINT),
        |      1000000000000) AS lrd
        |  FROM neighbors GROUP BY cid, p
        |  HAVING sum(reach) > 0),
        |agg AS (
        |  SELECT n.p, CAST(sum(lo.lrd) AS BIGINT) AS sum_lrd_o
        |  FROM neighbors n JOIN lrd lo ON n.o = lo.p
        |  GROUP BY n.p)
        |SELECT l.cid, a.p AS vec_id,
        |  sum_lrd_o * 1000000 // (3 * l.lrd) AS lof_ppm
        |FROM agg a JOIN lrd l ON a.p = l.p
        |ORDER BY lof_ppm DESC, vec_id LIMIT 20""".stripMargin,

    "q_knn_eval" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        |adots AS (
        |  SELECT e.vec_id, c.cid,
        |    list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) AS d
        |  FROM embeddings e CROSS JOIN cents c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        |    FROM adots) x WHERE rn = 1),
        |vecs AS (
        |  SELECT a.cid, e.vec_id, e.embedding, CAST(e.label AS BIGINT) AS label
        |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
        |nb AS (
        |  SELECT p, o, label_o FROM (
        |    SELECT a.vec_id AS p, b.vec_id AS o, b.label AS label_o,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1,64), i ->
        |          CAST(floor((CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
        |            (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
        |            1000000000 + 0.5) AS BIGINT))), b.vec_id) AS rnk
        |    FROM vecs a JOIN vecs b
        |      ON a.cid = b.cid AND a.vec_id <> b.vec_id) x
        |  WHERE rnk <= 3),
        |votes AS (
        |  SELECT p, label_o AS pred FROM (
        |    SELECT p, label_o, count(*) AS votes,
        |      row_number() OVER (PARTITION BY p
        |        ORDER BY count(*) DESC, label_o) AS vr
        |    FROM nb GROUP BY p, label_o) x
        |  WHERE vr = 1)
        |SELECT v.label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN votes.pred = v.label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS correct,
        |  CAST(sum(CASE WHEN votes.pred = v.label THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS acc_ppm
        |FROM votes JOIN vecs v ON votes.p = v.vec_id
        |GROUP BY v.label ORDER BY v.label""".stripMargin,

    "q_mcnemar" ->
      """WITH f AS (
        |  SELECT lang = 'en' AS truth,
        |    CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['the', 'a', 'of', 'to', 'and', 'in', 'is', 'it', 'for', 'on'], t))) AS BIGINT) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
        |  FROM documents),
        |p AS (
        |  SELECT truth, h * 1000 >= 60 * tk AS pred_a,
        |    h * 1000 >= 100 * tk AS pred_b
        |  FROM f),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN pred_a = truth AND pred_b <> truth THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN pred_a <> truth AND pred_b = truth THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM p)
        |SELECT n, b, c,
        |  CASE WHEN b + c > 0 THEN (b - c) * (b - c) * 1000 // (b + c)
        |    ELSE 0 END AS chi2_milli
        |FROM a""".stripMargin,

    "q_epoch_mix" ->
      """WITH bysrc AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |sc AS (
        |  SELECT source, tokens,
        |    CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS sc
        |  FROM bysrc),
        |w AS (
        |  SELECT source, tokens, sc,
        |    CAST((SELECT sum(sc) FROM sc) AS BIGINT) AS tot
        |  FROM sc),
        |b AS (
        |  SELECT *, (1000000000 * sc) // tot AS base,
        |    (1000000000 * sc) % tot AS frac
        |  FROM w),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY frac DESC, source) AS rn,
        |    1000000000 - sum(base) OVER () AS short
        |  FROM b)
        |SELECT source, tokens,
        |  CAST((1000000 * sc) // tot AS BIGINT) AS weight_ppm,
        |  CAST(base + CASE WHEN rn <= short THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
        |FROM r ORDER BY source""".stripMargin,

    "q_naive_bayes" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |tc AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c
        |       FROM toks GROUP BY 1, 2),
        |ct AS (SELECT lang, CAST(count(*) AS BIGINT) AS t FROM toks GROUP BY 1),
        |vb AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM toks),
        |pr AS (
        |  SELECT lang,
        |    CAST((1000000 * count(*)) // (SELECT count(*) FROM documents) AS BIGINT)
        |      AS prior_ppm
        |  FROM documents GROUP BY lang),
        |r AS (
        |  SELECT tc.lang, token, c,
        |    CAST(((c + 1) * 1000000) // (t + v) AS BIGINT) AS p_ppm,
        |    row_number() OVER (PARTITION BY tc.lang
        |      ORDER BY c DESC, token) AS rn
        |  FROM tc JOIN ct ON tc.lang = ct.lang CROSS JOIN vb)
        |SELECT r.lang, CAST(rn AS BIGINT) AS rn, token, c, p_ppm, prior_ppm
        |FROM r JOIN pr ON r.lang = pr.lang
        |WHERE rn <= 5 ORDER BY r.lang, rn""".stripMargin,

    "q_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |num AS (SELECT day, c, row_number() OVER (ORDER BY day) AS rn FROM daily),
        |rec AS (
        |  SELECT rn, day, c, c AS l, CAST(0 AS BIGINT) AS b
        |  FROM num WHERE rn = 1
        |  UNION ALL
        |  SELECT d.rn, d.day, d.c,
        |    (d.c + 4 * (r.l + r.b)) // 5,
        |    (((d.c + 4 * (r.l + r.b)) // 5) - r.l + 9 * r.b) // 10
        |  FROM num d JOIN rec r ON d.rn = r.rn + 1)
        |SELECT day, c AS rev_c, l AS level_c, b AS trend_c,
        |  CAST(l + b AS BIGINT) AS forecast_c
        |FROM rec ORDER BY day""".stripMargin,

    "q_ppr" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |und AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
        |pr0 AS (
        |  SELECT u AS node,
        |    CAST(CASE WHEN u % 100 = 0 THEN 1000000 ELSE 0 END AS BIGINT) AS pr
        |  FROM deg),
        |pr1 AS (
        |  SELECT d.u AS node,
        |    CAST(CAST(CASE WHEN d.u % 100 = 0 THEN 150000 ELSE 0 END AS BIGINT)
        |      + coalesce((85 * m.s) // 100, 0) AS BIGINT) AS pr
        |  FROM deg d LEFT JOIN (
        |    SELECT e.v, sum(p.pr // dd.d) AS s
        |    FROM edges e JOIN pr0 p ON e.u = p.node JOIN deg dd ON e.u = dd.u
        |    GROUP BY e.v) m ON d.u = m.v),
        |pr2 AS (
        |  SELECT d.u AS node,
        |    CAST(CAST(CASE WHEN d.u % 100 = 0 THEN 150000 ELSE 0 END AS BIGINT)
        |      + coalesce((85 * m.s) // 100, 0) AS BIGINT) AS pr
        |  FROM deg d LEFT JOIN (
        |    SELECT e.v, sum(p.pr // dd.d) AS s
        |    FROM edges e JOIN pr1 p ON e.u = p.node JOIN deg dd ON e.u = dd.u
        |    GROUP BY e.v) m ON d.u = m.v),
        |pr3 AS (
        |  SELECT d.u AS node,
        |    CAST(CAST(CASE WHEN d.u % 100 = 0 THEN 150000 ELSE 0 END AS BIGINT)
        |      + coalesce((85 * m.s) // 100, 0) AS BIGINT) AS pr
        |  FROM deg d LEFT JOIN (
        |    SELECT e.v, sum(p.pr // dd.d) AS s
        |    FROM edges e JOIN pr2 p ON e.u = p.node JOIN deg dd ON e.u = dd.u
        |    GROUP BY e.v) m ON d.u = m.v)
        |SELECT p.node, p.pr AS pr_fp, CAST(deg.d AS BIGINT) AS degree,
        |  p.node % 100 = 0 AS is_seed
        |FROM pr3 p JOIN deg ON p.node = deg.u
        |WHERE p.pr > 0 ORDER BY p.node""".stripMargin,

    "q_simhash_hamming" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS h FROM tok),
        |votes AS (
        |  SELECT doc_id, j,
        |    sum(CASE WHEN (h // CAST(2**j AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(range(32)) AS j) js
        |  GROUP BY doc_id, j),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN v > 0 THEN CAST(2**j AS BIGINT) ELSE 0 END) AS BIGINT) AS fp
        |  FROM votes GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, fp, b,
        |    (fp // CAST(2**(8*b) AS BIGINT)) % 256 AS key
        |  FROM sh CROSS JOIN (SELECT unnest(range(4)) AS b) bs),
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
        |    CAST(bit_count(xor(x.fp, y.fp)) AS BIGINT) AS hamming
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id)
        |SELECT d1, d2, hamming FROM pairs
        |WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin,

    "q_hof_funcs" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents WHERE doc_id % 25 = 0)
        |SELECT doc_id,
        |  CAST(len(list_filter(tk, t -> len(t) > 4)) AS BIGINT) AS n_long,
        |  CAST(list_sum(list_transform(tk, t -> len(t))) AS BIGINT) AS total_chars,
        |  CAST(list_sum(list_transform(tk, t -> len(t) * len(t))) AS BIGINT) AS sum_sq,
        |  list_contains(tk, 'spark') AS has_spark,
        |  len(list_filter(tk, t -> t = lower(t))) = len(tk) AS all_lower,
        |  array_to_string(list_sort(tk)[1:3], ',') AS first3
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, tk[i] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |      FROM documents WHERE doc_id % 50 = 0) d
        |CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS i) idx
        |WHERE i <= len(tk)
        |ORDER BY doc_id, pos""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents,
        |  CAST(sum(p_size) AS BIGINT) AS size_sum,
        |  min(p_name) AS first_name
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_cdc_chunks" ->
      s"""WITH $duckCdcChunks
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(max(n_toks) AS BIGINT) AS max_chunk,
         |  CAST(sum(n_toks) AS BIGINT) AS total_toks
         |FROM chunks GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_chunk_dedup" ->
      s"""WITH $duckCdcChunks
         |SELECT d.source, CAST(count(*) AS BIGINT) AS total_chunks,
         |  CAST(count(DISTINCT c.chunk_hash) AS BIGINT) AS uniq_chunks,
         |  CAST((1000000 * count(DISTINCT c.chunk_hash)) // count(*) AS BIGINT)
         |    AS dedup_ppm
         |FROM chunks c JOIN documents d ON c.doc_id = d.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "q_rrf" ->
      """WITH m AS (
        |  SELECT doc_id, n_chars,
        |    len(list_distinct(string_split(text, ' '))) AS nu
        |  FROM documents),
        |ra AS (SELECT doc_id,
        |         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r1
        |       FROM m),
        |rb AS (SELECT doc_id,
        |         row_number() OVER (ORDER BY nu DESC, doc_id) AS r2
        |       FROM m)
        |SELECT ra.doc_id, CAST(r1 AS BIGINT) AS rank_len,
        |  CAST(r2 AS BIGINT) AS rank_uniq,
        |  CAST(1000000000 // (60 + r1) + 1000000000 // (60 + r2) AS BIGINT)
        |    AS rrf_fp
        |FROM ra JOIN rb ON ra.doc_id = rb.doc_id
        |ORDER BY rrf_fp DESC, ra.doc_id LIMIT 25""".stripMargin,

    "q_asof_tolerance" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ns(ts) AS tsn,
        |    last_value(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lp
        |  FROM events)
        |SELECT event_id, user_id,
        |  (lp IS NOT NULL AND tsn - lp <= 3600000000000) AS matched,
        |  CASE WHEN lp IS NOT NULL AND tsn - lp <= 3600000000000
        |       THEN (tsn - lp) // 1000000000 END AS gap_s
        |FROM e WHERE event_type = 'click' ORDER BY event_id""".stripMargin,

    "q_null_audit" ->
      """SELECT nullif(l_returnflag, 'N') AS flag,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(disc) AS BIGINT) AS n_nonnull,
        |  CAST(count(DISTINCT disc) AS BIGINT) AS n_distinct,
        |  CAST(sum(CASE WHEN disc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  min(disc) AS min_disc, max(disc) AS max_disc
        |FROM (SELECT l_returnflag, nullif(l_discount, 0.0) AS disc FROM lineitem) x
        |GROUP BY 1 ORDER BY flag NULLS FIRST""".stripMargin,

    "q_decay_score" ->
      """WITH mx AS (SELECT max(ts) AS mxts FROM events),
        |d AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
        |    least((epoch_ns(mxts) - epoch_ns(ts)) // 2592000000000000, 40) AS k
        |  FROM events, mx)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(vc // CAST(2**k AS BIGINT)) AS BIGINT) AS decayed_cents
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_decision_stump" ->
      """WITH b AS (
        |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 500000 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS p
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT bucket, n, p,
        |    sum(n) OVER (ORDER BY bucket) AS nl,
        |    sum(p) OVER (ORDER BY bucket) AS pl,
        |    sum(n) OVER () AS nt, sum(p) OVER () AS pt
        |  FROM b),
        |g AS (
        |  SELECT *, (1000000 * pl) // nl AS lp,
        |    (1000000 * (pt - pl)) // (nt - nl) AS rp
        |  FROM c WHERE nl < nt),
        |h AS (
        |  SELECT *,
        |    1000000 - (lp*lp + (1000000-lp)*(1000000-lp)) // 1000000 AS gl,
        |    1000000 - (rp*rp + (1000000-rp)*(1000000-rp)) // 1000000 AS gr
        |  FROM g)
        |SELECT CAST((bucket + 1) * 5000 AS BIGINT) AS threshold_dollars,
        |  CAST(nl AS BIGINT) AS left_n, CAST(pl AS BIGINT) AS left_pos,
        |  CAST((nl * gl + (nt - nl) * gr) // nt AS BIGINT) AS gini_ppm
        |FROM h ORDER BY gini_ppm, threshold_dollars LIMIT 5""".stripMargin,

    "q_stl_lite" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |tr AS (
        |  SELECT day, c,
        |    CAST(sum(c) OVER w AS BIGINT) AS tsum,
        |    CAST(count(*) OVER w AS BIGINT) AS tn
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT day, c, tsum // tn AS trend_c,
        |    c - (tsum // tn) AS det, (day + 4) % 7 AS wd
        |  FROM tr),
        |seas AS (
        |  SELECT wd,
        |    CAST(sum(det) AS BIGINT) // CAST(count(*) AS BIGINT) AS seasonal_c
        |  FROM det GROUP BY wd)
        |SELECT day, c AS rev_c, CAST(trend_c AS BIGINT) AS trend_c,
        |  CAST(s.seasonal_c AS BIGINT) AS seasonal_c,
        |  CAST(d.det - s.seasonal_c AS BIGINT) AS residual_c
        |FROM det d JOIN seas s ON d.wd = s.wd
        |ORDER BY day""".stripMargin,

    "q_source_card" ->
      """WITH base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS est_tokens,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS uniq_texts,
        |    CAST(sum(n_chars) AS BIGINT) AS chars
        |  FROM documents GROUP BY source),
        |sl AS (
        |  SELECT source, lang, count(*) AS ln_,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY count(*) DESC, lang) AS rn
        |  FROM documents GROUP BY source, lang)
        |SELECT b.source, n_docs, est_tokens, n_langs, sl.lang AS top_lang,
        |  CAST((1000000 * (n_docs - uniq_texts)) // n_docs AS BIGINT) AS dup_ppm,
        |  CAST(chars // n_docs AS BIGINT) AS mean_chars
        |FROM base b JOIN sl ON b.source = sl.source AND sl.rn = 1
        |ORDER BY b.source""".stripMargin,

    "q_shuffle_hash_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_matryoshka_eval" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id IN (0, 7, 42)),
         |cf AS (
         |  SELECT qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "qv"),
                        duckDot("e.embedding", "e.embedding"),
                        duckDot("qv", "qv"))} AS cos
         |  FROM embeddings e CROSS JOIN q),
         |rf AS (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |    ORDER BY greatest(0, CAST(floor((1.0 - cos) * 1000000000 + 0.5) AS BIGINT)),
         |      vec_id) AS rn
         |  FROM cf),
         |ct AS (
         |  SELECT qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "qv", 16),
                        duckDot("e.embedding", "e.embedding", 16),
                        duckDot("qv", "qv", 16))} AS cos
         |  FROM embeddings e CROSS JOIN q),
         |rt AS (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |    ORDER BY greatest(0, CAST(floor((1.0 - cos) * 1000000000 + 0.5) AS BIGINT)),
         |      vec_id) AS rn
         |  FROM ct)
         |SELECT f.qid, CAST(count(*) AS BIGINT) AS n_overlap,
         |  CAST((1000000 * count(*)) // 10 AS BIGINT) AS overlap_ppm
         |FROM rf f JOIN rt t ON f.qid = t.qid AND f.vec_id = t.vec_id
         |WHERE f.rn <= 10 AND t.rn <= 10
         |GROUP BY f.qid ORDER BY f.qid""".stripMargin,

    "q_source_overlap" ->
      s"""WITH $duckShingles,
         |ss AS (
         |  SELECT DISTINCT d.source, sh.s
         |  FROM sh JOIN documents d ON sh.doc_id = d.doc_id),
         |spread AS (SELECT s, count(*) AS nsrc FROM ss GROUP BY s)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN nsrc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST((1000000 * sum(CASE WHEN nsrc > 1 THEN 1 ELSE 0 END)) // count(*)
         |    AS BIGINT) AS shared_ppm
         |FROM ss JOIN spread USING (s)
         |GROUP BY source ORDER BY source""".stripMargin,

    "q_partition_prune" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(min(o_orderkey) AS BIGINT) AS first_key
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_merge_schema" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_orderpriority, NULL AS price_cents
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(price_cents) AS BIGINT) AS n_with_price,
        |  CAST(sum(price_cents) AS BIGINT) AS price_cents_sum
        |FROM u GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_union_by_name" ->
      """WITH u AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS pri, NULL AS cents
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, NULL,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT pri, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(cents) AS BIGINT) AS n_cents,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum,
        |  CAST(sum(k) AS BIGINT) AS key_sum
        |FROM u GROUP BY pri ORDER BY pri NULLS FIRST""".stripMargin,

    "q_peak_concurrency" ->
      """WITH li AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS od,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS sd
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deltas AS (
        |  SELECT day, CAST(sum(d) AS BIGINT) AS delta FROM (
        |    SELECT od AS day, 1 AS d FROM li
        |    UNION ALL SELECT sd, -1 FROM li) x
        |  GROUP BY day),
        |run AS (
        |  SELECT day, sum(delta) OVER (ORDER BY day) AS open FROM deltas)
        |SELECT day AS peak_day, CAST(open AS BIGINT) AS peak_open
        |FROM run ORDER BY open DESC, day LIMIT 1""".stripMargin,

    "q_array_set_ops" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id,
        |    CAST(len(list_filter(a.tk, t -> list_contains(b.tk, t))) AS BIGINT)
        |      AS n_common,
        |    CAST(len(a.tk) AS BIGINT) AS na, CAST(len(b.tk) AS BIGINT) AS nb
        |  FROM d a JOIN d b ON a.doc_id + 1 = b.doc_id)
        |SELECT doc_id, n_common, na + nb - n_common AS n_union,
        |  na - n_common AS n_only_left,
        |  CAST((1000000 * n_common) // (na + nb - n_common) AS BIGINT)
        |    AS jaccard_ppm
        |FROM p WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin,

    "q_open_aging" ->
      """WITH ref AS (
        |  SELECT max(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) AS r
        |  FROM orders),
        |x AS (
        |  SELECT ((SELECT r FROM ref)
        |      - CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) // 30
        |      AS age_bucket,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS val_c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |          <= (SELECT r FROM ref)
        |    AND CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |          > (SELECT r FROM ref))
        |SELECT CAST(age_bucket AS BIGINT) AS age_bucket,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(val_c) AS BIGINT) AS open_cents
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rolling_median" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT day, c,
        |    list_sort(list(c) OVER (ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM daily)
        |SELECT day, c AS rev_c, CAST(len(arr) AS BIGINT) AS win_n,
        |  CAST(arr[CAST((len(arr) + 1) // 2 AS INT)]
        |     + arr[CAST((len(arr) + 2) // 2 AS INT)] AS BIGINT) AS med_x2_c
        |FROM r ORDER BY day""".stripMargin,

    "q_cuped" ->
      """WITH days AS (
        |  SELECT mn + (mx - mn) // 2 AS split FROM (
        |    SELECT min(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) AS mn,
        |      max(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) AS mx
        |    FROM orders) z),
        |per AS (
        |  SELECT o_custkey,
        |    CAST(sum(CASE WHEN CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |        <= (SELECT split FROM days)
        |      THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |        > (SELECT split FROM days)
        |      THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
        |    CAST('0x' || substr(md5('arm|' || CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) % 2 AS arm
        |  FROM orders GROUP BY o_custkey),
        |th AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM per),
        |tv AS (
        |  SELECT CASE WHEN (n * sxx - sx * sx) // 1000000 > 0
        |    THEN (n * sxy - sx * sy) // ((n * sxx - sx * sx) // 1000000)
        |    ELSE 0 END AS theta_ppm,
        |    (1000 * sx) // n AS xbar_milli
        |  FROM th)
        |SELECT arm, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(x) AS BIGINT) AS x_sum, CAST(sum(y) AS BIGINT) AS y_sum,
        |  CAST(tv.theta_ppm AS BIGINT) AS theta_ppm,
        |  CAST(1000000 * sum(y) - tv.theta_ppm * sum(x)
        |    + tv.theta_ppm * ((count(*) * tv.xbar_milli) // 1000) AS BIGINT) AS adj_micro
        |FROM per CROSS JOIN tv
        |GROUP BY arm, tv.theta_ppm, tv.xbar_milli
        |ORDER BY arm""".stripMargin,

    "q_ohlc_bars" ->
      """WITH p AS (
        |  SELECT epoch_ns(ts) // 600000000000 AS bucket,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc, ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(arg_min(vc, ts) AS BIGINT) AS open_c,
        |  CAST(arg_max(vc, ts) AS BIGINT) AS close_c,
        |  CAST(max(vc) AS BIGINT) AS high_c, CAST(min(vc) AS BIGINT) AS low_c,
        |  CAST(sum(vc) AS BIGINT) AS vol_c
        |FROM p GROUP BY bucket HAVING count(*) >= 3 ORDER BY bucket""".stripMargin,

    "q_did" ->
      """WITH days AS (
        |  SELECT mn + (mx - mn) // 2 AS split FROM (
        |    SELECT min(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) AS mn,
        |      max(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) AS mx
        |    FROM orders) z),
        |cells AS (
        |  SELECT (c_nationkey < 12) AS treated,
        |    (CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      > (SELECT split FROM days)) AS post,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS dollars
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |m AS (SELECT *, (1000 * dollars) // n AS mean_milli FROM cells),
        |w AS (
        |  SELECT
        |    CAST((max(CASE WHEN treated AND post THEN mean_milli END)
        |      - max(CASE WHEN treated AND NOT post THEN mean_milli END))
        |      - (max(CASE WHEN NOT treated AND post THEN mean_milli END)
        |      - max(CASE WHEN NOT treated AND NOT post THEN mean_milli END))
        |      AS BIGINT) AS did_milli
        |  FROM m)
        |SELECT treated, post, n, dollars, CAST(mean_milli AS BIGINT) AS mean_milli,
        |  did_milli
        |FROM m CROSS JOIN w
        |ORDER BY treated, post""".stripMargin,

    "q_k_anonymity" ->
      """WITH classes AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal) AS BIGINT) // 1000 AS bal_b,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(min(n) AS BIGINT) AS min_class,
        |  CAST((1000000 * sum(CASE WHEN n < 5 THEN n ELSE 0 END)) // sum(n)
        |    AS BIGINT) AS below_k_ppm,
        |  CAST(min(l) AS BIGINT) AS min_l,
        |  CAST((1000000 * sum(CASE WHEN l < 3 THEN n ELSE 0 END)) // sum(n)
        |    AS BIGINT) AS below_l_ppm
        |FROM classes""".stripMargin,

    "q_lateness_audit" ->
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tsn,
        |    max(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
        |  FROM events),
        |l AS (
        |  SELECT least(greatest(0, (prior_max - tsn) // 60000000000), 60)
        |    AS late_bucket
        |  FROM x WHERE prior_max IS NOT NULL)
        |SELECT CAST(late_bucket AS BIGINT) AS late_bucket,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_topic_sink" -> {
      val words = graft.sources.OrderGen.Words.map(w => s"'$w'").mkString(", ")
      s"""WITH g AS (
         |  SELECT range AS seq, md5('sink1|' || CAST(range AS VARCHAR)) AS h
         |  FROM range(500))
         |SELECT seq,
         |  substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4) || '-' ||
         |    substr(h,17,4) || '-' || substr(h,21,12) AS order_id,
         |  ([$words])[CAST(CAST('0x' || substr(h,1,4) AS BIGINT) % 16 AS INT) + 1]
         |    || ' ' ||
         |    ([$words])[CAST(CAST('0x' || substr(h,5,4) AS BIGINT) % 16 AS INT) + 1] AS product,
         |  CAST(CAST('0x' || substr(h,9,8) AS BIGINT) % 149501 + 500 AS BIGINT) AS price_cents
         |FROM g ORDER BY seq""".stripMargin
    },

    "q_assoc_rules" ->
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey AS basket, p_brand AS item
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM baskets),
        |freq AS (
        |  SELECT item, CAST(count(*) AS BIGINT) AS supp FROM baskets
        |  GROUP BY item HAVING count(*) * 20 >= (SELECT n_baskets FROM tot)),
        |fb AS (SELECT b.basket, b.item FROM baskets b JOIN freq USING (item)),
        |pairs AS (
        |  SELECT a.item AS i1, b.item AS i2, CAST(count(*) AS BIGINT) AS supp_pair
        |  FROM fb a JOIN fb b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT i1, i2, supp_pair,
        |  CAST((1000000 * supp_pair) // f1.supp AS BIGINT) AS conf12_ppm,
        |  CAST((1000000 * supp_pair) // f2.supp AS BIGINT) AS conf21_ppm,
        |  CAST((1000000 * supp_pair * (SELECT n_baskets FROM tot))
        |    // (f1.supp * f2.supp) AS BIGINT) AS lift_ppm
        |FROM pairs JOIN freq f1 ON i1 = f1.item JOIN freq f2 ON i2 = f2.item
        |ORDER BY i1, i2""".stripMargin,

    "q_abandonment" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000000000 AS sec, ts
        |  FROM events),
        |g AS (
        |  SELECT *, sec - lag(sec) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS gap
        |  FROM e),
        |s AS (
        |  SELECT *, sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
        |  FROM g),
        |per AS (
        |  SELECT user_id, session, arg_max(event_type, event_id) AS last_type,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM s GROUP BY user_id, session),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM per)
        |SELECT last_type, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  CAST((1000000 * count(*)) // (SELECT total FROM tot) AS BIGINT)
        |    AS share_ppm
        |FROM per GROUP BY last_type ORDER BY last_type""".stripMargin,

    "q_decimal_agg" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS sum_dec,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS min_dec,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS max_dec
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_event_pattern" ->
      """WITH per AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT CAST(len(regexp_extract_all(seq, 'v[^e]*c[^e]*p')) AS BIGINT)
        |    AS n_matches,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_time_travel" ->
      """WITH v1 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(range) AS BIGINT) AS offset_sum,
        |    CAST(sum(CAST('0x' || substr(md5('tt1|' || CAST(range AS VARCHAR)), 9, 8)
        |      AS BIGINT) % 149501 + 500) AS BIGINT) AS cents_sum
        |  FROM range(500)),
        |v2 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(range) AS BIGINT) AS offset_sum,
        |    CAST(sum(CAST('0x' || substr(md5('tt2|' || CAST(range AS VARCHAR)), 9, 8)
        |      AS BIGINT) % 149501 + 500) AS BIGINT) AS cents_sum
        |  FROM range(300))
        |SELECT 'latest' AS snapshot, n, offset_sum, cents_sum FROM v2
        |UNION ALL SELECT 'v1', n, offset_sum, cents_sum FROM v1
        |UNION ALL SELECT 'v2', n, offset_sum, cents_sum FROM v2
        |ORDER BY snapshot""".stripMargin,

    "q_inbatch_negatives" ->
      """WITH b AS (
        |  SELECT CAST('0x' || substr(md5('b|' || CAST(vec_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 16 AS batch, label
        |  FROM embeddings),
        |bl AS (
        |  SELECT batch, label, CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2)
        |SELECT batch, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(sum(c * (c - 1) // 2) AS BIGINT) AS same_label_pairs,
        |  CAST(sum(c) * (sum(c) - 1) // 2 AS BIGINT) AS all_pairs,
        |  CAST((1000000 * sum(c * (c - 1) // 2))
        |    // (sum(c) * (sum(c) - 1) // 2) AS BIGINT) AS collision_ppm
        |FROM bl GROUP BY batch ORDER BY batch""".stripMargin,

    "q_filter_sweep" -> {
      val stops = TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH f AS (
         |  SELECT doc_id, len(tk) AS n_tokens,
         |    least(len(list_filter(tk, t -> list_contains([$stops], t))) / len(tk) * 2.0, 1.0) * 0.4
         |      + len(list_distinct(tk)) / len(tk) * 0.4
         |      + least(len(tk) / 256.0, 1.0) * 0.2 AS quality_score
         |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t),
         |buckets AS (
         |  SELECT CAST(floor(quality_score * 10) AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS docs, CAST(sum(n_tokens) AS BIGINT) AS toks
         |  FROM f GROUP BY 1),
         |c AS (
         |  SELECT bucket,
         |    CAST(sum(docs) OVER (ORDER BY bucket DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kept_docs,
         |    CAST(sum(toks) OVER (ORDER BY bucket DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kept_tokens,
         |    CAST(sum(toks) OVER () AS BIGINT) AS total_tokens
         |  FROM buckets)
         |SELECT bucket AS threshold_decile, kept_docs, kept_tokens,
         |  CAST((1000000 * kept_tokens) // total_tokens AS BIGINT) AS kept_ppm
         |FROM c ORDER BY threshold_decile""".stripMargin
    },

    "q_power_iteration" ->
      """WITH x AS (
        |  SELECT vec_id AS i, j,
        |    CAST(floor(CAST(embedding[j] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS xf
        |  FROM embeddings
        |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) js),
        |s1 AS (SELECT i, CAST(sum(xf) AS BIGINT) AS s FROM x GROUP BY i),
        |w1 AS (
        |  SELECT j, CAST(sum(xf * s) AS BIGINT) AS w
        |  FROM x JOIN s1 USING (i) GROUP BY j),
        |m1 AS (SELECT max(abs(w)) // 1000 + 1 AS d FROM w1),
        |v1 AS (SELECT j, w // (SELECT d FROM m1) AS v FROM w1),
        |s2 AS (
        |  SELECT i, CAST(sum(x.xf * v1.v) AS BIGINT) AS s
        |  FROM x JOIN v1 USING (j) GROUP BY i),
        |w2 AS (
        |  SELECT j, CAST(sum(xf * s) AS BIGINT) AS w
        |  FROM x JOIN s2 USING (i) GROUP BY j),
        |m2 AS (SELECT max(abs(w)) // 1000 + 1 AS d FROM w2)
        |SELECT CAST(j AS BIGINT) AS j,
        |  CAST(w // (SELECT d FROM m2) AS BIGINT) AS v
        |FROM w2 ORDER BY j""".stripMargin,

    // DuckDB's own jaro_winkler_similarity at the shared ppm grain —
    // an independent implementation of Winkler '90 against the native
    // kernel, same blocking
    "q_jaro_match" ->
      """SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |  a.p_name AS name1, b.p_name AS name2,
        |  CAST(a.p_size AS BIGINT) AS block_size,
        |  CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000 + 0.5) AS BIGINT) AS jw_ppm
        |FROM part a JOIN part b
        |  ON a.p_size = b.p_size
        |  AND substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
        |  AND a.p_partkey < b.p_partkey
        |WHERE floor(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000 + 0.5) >= 800000
        |ORDER BY k1, k2""".stripMargin,

    "q_survival" ->
      """WITH per AS (
        |  SELECT (CAST(max(CAST(o_orderdate AS DATE)) - DATE '1970-01-01' AS BIGINT)
        |        - CAST(min(CAST(o_orderdate AS DATE)) - DATE '1970-01-01' AS BIGINT)) // 90 AS tq,
        |    max(CAST(o_orderdate AS DATE)) < DATE '2000-07-01' AS churned
        |  FROM orders GROUP BY o_custkey),
        |tab AS (
        |  SELECT tq, sum(CASE WHEN churned THEN 1 ELSE 0 END) AS d, count(*) AS tot
        |  FROM per GROUP BY tq),
        |risk AS (
        |  SELECT tq, d, tot,
        |    sum(tot) OVER (ORDER BY tq DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS at_risk
        |  FROM tab),
        |termed AS (
        |  SELECT tq, d, tot, at_risk,
        |    CASE WHEN at_risk > d THEN
        |      CAST(floor(ln(CAST(at_risk - d AS DOUBLE) / CAST(at_risk AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |    ELSE -13815511 END AS term_micro
        |  FROM risk)
        |SELECT tq, CAST(at_risk AS BIGINT) AS at_risk, CAST(d AS BIGINT) AS churned,
        |  CAST(tot - d AS BIGINT) AS censored,
        |  CAST(sum(term_micro) OVER (ORDER BY tq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS log_surv_micro
        |FROM termed ORDER BY tq""".stripMargin,

    "q_jsd" ->
      """WITH grid AS (
        |  SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang),
        |by_src AS (SELECT source, sum(n) AS n_s FROM grid GROUP BY source),
        |by_lang AS (SELECT lang, sum(n) AS g_l FROM grid GROUP BY lang),
        |tot AS (SELECT sum(n) AS g FROM grid),
        |frame AS (
        |  SELECT s.source, s.n_s, l.lang, l.g_l,
        |    COALESCE(grid.n, 0) AS n, l.g_l - COALESCE(grid.n, 0) AS r_l,
        |    (SELECT g FROM tot) - s.n_s AS rest
        |  FROM by_src s CROSS JOIN by_lang l
        |  LEFT JOIN grid ON grid.source = s.source AND grid.lang = l.lang),
        |termed AS (
        |  SELECT source, n_s,
        |    CAST(floor(CASE WHEN n > 0 THEN
        |      (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE)) *
        |      ln(2.0 * (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE)) /
        |         (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE) + CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)))
        |      * 1000000 ELSE 0.0 END + 0.5) AS BIGINT) AS tp,
        |    CAST(floor(CASE WHEN r_l > 0 THEN
        |      (CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)) *
        |      ln(2.0 * (CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)) /
        |         (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE) + CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)))
        |      * 1000000 ELSE 0.0 END + 0.5) AS BIGINT) AS tq
        |  FROM frame)
        |SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
        |  CAST(sum(tp + tq) AS BIGINT) AS jsd_x2_micro
        |FROM termed GROUP BY source ORDER BY source""".stripMargin,

    "q_perm_test" ->
      """WITH base AS (
        |  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
        |    o_orderpriority = '1-URGENT' AS g1
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |obs AS (
        |  SELECT sum(CASE WHEN g1 THEN c END) AS s1,
        |    sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN NOT g1 THEN c END) AS s0,
        |    sum(CASE WHEN NOT g1 THEN 1 ELSE 0 END) AS n0
        |  FROM base),
        |reps AS (
        |  SELECT r,
        |    sum(CASE WHEN coin THEN c END) AS s1r,
        |    sum(CASE WHEN coin THEN 1 ELSE 0 END) AS n1r,
        |    sum(CASE WHEN NOT coin THEN c END) AS s0r,
        |    sum(CASE WHEN NOT coin THEN 1 ELSE 0 END) AS n0r
        |  FROM (
        |    SELECT base.c, js.r,
        |      CAST('0x' || substr(md5(CAST(base.o_orderkey AS VARCHAR) || ':' || CAST(js.r AS VARCHAR)), 1, 15) AS BIGINT)
        |        % ((SELECT n1 FROM obs) + (SELECT n0 FROM obs)) < (SELECT n1 FROM obs) AS coin
        |    FROM base CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS r) js)
        |  GROUP BY r),
        |scored AS (
        |  SELECT CAST(s1r AS DOUBLE) / CAST(n1r AS DOUBLE)
        |       - CAST(s0r AS DOUBLE) / CAST(n0r AS DOUBLE) AS dr,
        |    CAST((SELECT s1 FROM obs) AS DOUBLE) / CAST((SELECT n1 FROM obs) AS DOUBLE)
        |  - CAST((SELECT s0 FROM obs) AS DOUBLE) / CAST((SELECT n0 FROM obs) AS DOUBLE) AS dobs
        |  FROM reps)
        |SELECT CAST((SELECT n1 FROM obs) AS BIGINT) AS n1,
        |  CAST((SELECT n0 FROM obs) AS BIGINT) AS n0,
        |  max(dobs) AS obs_diff_cents,
        |  CAST(sum(CASE WHEN abs(dr) >= abs(dobs) THEN 1 ELSE 0 END) AS BIGINT) AS exceed,
        |  CAST((1000000 * (1 + sum(CASE WHEN abs(dr) >= abs(dobs) THEN 1 ELSE 0 END))) // 65 AS BIGINT) AS p_ppm
        |FROM scored""".stripMargin,

    // the oracle never sees XML — it asserts the round-trip reproduced
    // the source values (same contract as q_json_roundtrip)
    "q_xml_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |  n_name || ' <&"''> ' || CAST(n_nationkey AS VARCHAR) AS tricky
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    // accents injected via code points (chr) so the oracle text is
    // encoding-unambiguous; nfc_normalize / strip_accents are DuckDB's
    // own utf8proc implementations vs the JDK-Normalizer kernels
    "q_unicode_norm" ->
      """WITH b AS (
        |  SELECT n_nationkey, lower(n_name) AS base FROM nation),
        |built AS (
        |  SELECT n_nationkey,
        |    translate(base, 'aeiou',
        |      chr(225) || chr(233) || chr(237) || chr(246) || chr(252)) AS accented,
        |    replace(replace(replace(replace(replace(base,
        |      'a', 'a' || chr(769)), 'e', 'e' || chr(769)),
        |      'i', 'i' || chr(769)), 'o', 'o' || chr(776)),
        |      'u', 'u' || chr(776)) AS decomposed
        |  FROM b)
        |SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, accented,
        |  nfc_normalize(decomposed) AS recomposed,
        |  strip_accents(accented) AS stripped,
        |  nfc_normalize(decomposed) = accented AS roundtrip_ok
        |FROM built ORDER BY n_nationkey""".stripMargin,

    "q_cem" ->
      """WITH per_cust AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS treated,
        |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
        |  FROM orders GROUP BY o_custkey),
        |cells AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS nation, c.c_mktsegment AS segment,
        |    sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS m_t,
        |    sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS m_c,
        |    sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS s_t,
        |    sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS s_c
        |  FROM per_cust JOIN customer c ON o_custkey = c.c_custkey
        |  GROUP BY 1, 2)
        |SELECT nation, segment, CAST(m_t AS BIGINT) AS m_t, CAST(m_c AS BIGINT) AS m_c,
        |  CAST(s_t // m_t - s_c // m_c AS BIGINT) AS cell_att_cents
        |FROM cells WHERE m_t > 0 AND m_c > 0
        |ORDER BY nation, segment""".stripMargin,

    "q_haar" -> {
      // 8 unrolled levels, generated: level k halves level k-1 by
      // pairwise sum (a) / difference (d); same generator shape as the
      // power-iteration oracle
      val levels = (1 to 8).map { k =>
        val prev = if (k == 1) "base" else s"l${k - 1}"
        s"""l$k AS (
           |  SELECT i // 2 AS i,
           |    CAST(sum(CASE WHEN i % 2 = 0 THEN v ELSE -v END) AS BIGINT) AS d,
           |    CAST(sum(v) AS BIGINT) AS v
           |  FROM $prev GROUP BY i // 2)"""
      }.mkString(",\n")
      val dets = (1 to 8).map(k =>
        s"SELECT $k AS level, i AS idx, d AS coef FROM l$k").mkString("\nUNION ALL\n")
      s"""WITH daily AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS v
         |  FROM orders GROUP BY 1),
         |base AS (
         |  SELECT js.i, CAST(COALESCE(daily.v, 0) AS BIGINT) AS v
         |  FROM (SELECT unnest(generate_series(0, 255)) AS i) js
         |  LEFT JOIN daily ON daily.day = (SELECT min(day) FROM daily) + js.i),
         |$levels
         |SELECT CAST(level AS BIGINT) AS level, CAST(idx AS BIGINT) AS idx,
         |  CAST(coef AS BIGINT) AS coef FROM (
         |$dets
         |UNION ALL
         |SELECT 9 AS level, i AS idx, v AS coef FROM l8)
         |ORDER BY level, idx""".stripMargin
    },

    "q_weighted_reservoir" ->
      """WITH keyed AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w,
        |    CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM orders),
        |scored AS (
        |  SELECT o_orderkey, w,
        |    CAST(floor(ln((CAST(h AS DOUBLE) + 1.0) / 1152921504606846976.0)
        |      / CAST(w AS DOUBLE) * 1000000000000 + 0.5) AS BIGINT) AS key_pico
        |  FROM keyed)
        |SELECT o_orderkey, w AS weight_cents, key_pico
        |FROM scored ORDER BY key_pico DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_noise_inject" ->
      """WITH counts AS (
        |  SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority),
        |seeded AS (
        |  SELECT o_orderpriority, n,
        |    (CAST(CAST('0x' || substr(md5('dp:' || o_orderpriority), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
        |      / 1.152921504606846976e18 AS u
        |  FROM counts)
        |SELECT o_orderpriority, CAST(n AS BIGINT) AS true_count,
        |  CAST(floor((CASE WHEN u < 0.5 THEN ln(2.0 * u)
        |    ELSE -ln(2.0 - 2.0 * u) END) * 1000000 + 0.5) AS BIGINT) AS noise_micro,
        |  CAST(n * 1000000 + floor((CASE WHEN u < 0.5 THEN ln(2.0 * u)
        |    ELSE -ln(2.0 - 2.0 * u) END) * 1000000 + 0.5) AS BIGINT) AS noisy_micro
        |FROM seeded ORDER BY o_orderpriority""".stripMargin,

    // the oracle rebuilds host/path/query with pure string ops — an
    // independent decomposition pinning parse_url's semantics
    "q_url_parse" ->
      """WITH u AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |    'https://' || lower(replace(replace(n_name, ' ', ''), '_', '')) || '.example.com/r'
        |      || CAST(n_regionkey AS VARCHAR) || '/docs?q=n'
        |      || CAST(n_nationkey AS VARCHAR) || '&page=2' AS url,
        |    lower(replace(replace(n_name, ' ', ''), '_', '')) || '.example.com' AS host,
        |    '/r' || CAST(n_regionkey AS VARCHAR) || '/docs' AS path,
        |    'q=n' || CAST(n_nationkey AS VARCHAR) || '&page=2' AS query,
        |    'n' || CAST(n_nationkey AS VARCHAR) AS q_param
        |  FROM nation)
        |SELECT n_nationkey, url, host, path, query, q_param
        |FROM u ORDER BY n_nationkey""".stripMargin,

    // the estimate is Spark's own sketch (not replayable here) — the
    // oracle asserts the advertised error bound held
    "q_approx_distinct" ->
      """SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
        |  TRUE AS within_5pct
        |FROM orders JOIN customer c ON o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_welch_t" ->
      """WITH v AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS v
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |g AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS ss
        |  FROM v GROUP BY grp),
        |m AS (
        |  SELECT max(CASE WHEN grp = '1-URGENT' THEN n END) AS n1,
        |    max(CASE WHEN grp = '1-URGENT' THEN sv END) AS s1,
        |    max(CASE WHEN grp = '1-URGENT' THEN ss END) AS ss1,
        |    max(CASE WHEN grp = '5-LOW' THEN n END) AS n2,
        |    max(CASE WHEN grp = '5-LOW' THEN sv END) AS s2,
        |    max(CASE WHEN grp = '5-LOW' THEN ss END) AS ss2
        |  FROM g),
        |e AS (
        |  SELECT n1, n2, s1, s2,
        |    (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
        |      / CAST(n1 AS DOUBLE) AS se1,
        |    (CAST(n2 AS DOUBLE) * CAST(ss2 AS DOUBLE)
        |      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
        |      / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
        |      / CAST(n2 AS DOUBLE) AS se2
        |  FROM m)
        |SELECT n1, n2,
        |  (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |    - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / sqrt(se1 + se2)
        |    AS t_welch,
        |  (se1 + se2) * (se1 + se2)
        |    / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
        |      + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)) AS df_welch
        |FROM e""".stripMargin,

    "q_anova_f" ->
      """WITH v AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS v
        |  FROM orders),
        |g AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS ss
        |  FROM v GROUP BY grp),
        |m AS (
        |  SELECT max(CASE WHEN grp = '1-URGENT' THEN n END) AS n1,
        |    max(CASE WHEN grp = '1-URGENT' THEN sv END) AS s1,
        |    max(CASE WHEN grp = '1-URGENT' THEN ss END) AS ss1,
        |    max(CASE WHEN grp = '2-HIGH' THEN n END) AS n2,
        |    max(CASE WHEN grp = '2-HIGH' THEN sv END) AS s2,
        |    max(CASE WHEN grp = '2-HIGH' THEN ss END) AS ss2,
        |    max(CASE WHEN grp = '3-MEDIUM' THEN n END) AS n3,
        |    max(CASE WHEN grp = '3-MEDIUM' THEN sv END) AS s3,
        |    max(CASE WHEN grp = '3-MEDIUM' THEN ss END) AS ss3,
        |    max(CASE WHEN grp = '4-NOT SPECIFIED' THEN n END) AS n4,
        |    max(CASE WHEN grp = '4-NOT SPECIFIED' THEN sv END) AS s4,
        |    max(CASE WHEN grp = '4-NOT SPECIFIED' THEN ss END) AS ss4,
        |    max(CASE WHEN grp = '5-LOW' THEN n END) AS n5,
        |    max(CASE WHEN grp = '5-LOW' THEN sv END) AS s5,
        |    max(CASE WHEN grp = '5-LOW' THEN ss END) AS ss5
        |  FROM g),
        |e AS (
        |  SELECT n1 + n2 + n3 + n4 + n5 AS n_total,
        |    CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE) + CAST(s3 AS DOUBLE)
        |      + CAST(s4 AS DOUBLE) + CAST(s5 AS DOUBLE) AS st,
        |    CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
        |      + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE)
        |      + CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE)
        |      + CAST(s5 AS DOUBLE) * CAST(s5 AS DOUBLE) / CAST(n5 AS DOUBLE)
        |      AS bg,
        |    CAST(ss1 AS DOUBLE) + CAST(ss2 AS DOUBLE) + CAST(ss3 AS DOUBLE)
        |      + CAST(ss4 AS DOUBLE) + CAST(ss5 AS DOUBLE) AS sstot
        |  FROM m)
        |SELECT n_total,
        |  bg - st * st / CAST(n_total AS DOUBLE) AS ssb,
        |  sstot - bg AS ssw,
        |  ((bg - st * st / CAST(n_total AS DOUBLE)) / 4.0)
        |    / ((sstot - bg) / (CAST(n_total AS DOUBLE) - 5.0)) AS f_stat
        |FROM e""".stripMargin,

    "q_levene_bf" ->
      """WITH vals AS (
        |  SELECT o_orderpriority AS grp, o_orderkey AS ok,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS v
        |  FROM orders),
        |r AS (
        |  SELECT grp, v,
        |    CAST(row_number() OVER (PARTITION BY grp
        |      ORDER BY CAST(v AS DOUBLE), ok) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n
        |  FROM vals),
        |med AS (SELECT grp, v AS med FROM r WHERE rnk * 2 = n + (n % 2)),
        |z AS (
        |  SELECT vals.grp AS grp, abs(v - med) AS z
        |  FROM vals JOIN med ON vals.grp = med.grp),
        |g AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(z) AS BIGINT) AS sv, CAST(sum(z * z) AS BIGINT) AS ss
        |  FROM z GROUP BY grp),
        |m AS (
        |  SELECT max(CASE WHEN grp = '1-URGENT' THEN n END) AS n1,
        |    max(CASE WHEN grp = '1-URGENT' THEN sv END) AS s1,
        |    max(CASE WHEN grp = '1-URGENT' THEN ss END) AS ss1,
        |    max(CASE WHEN grp = '2-HIGH' THEN n END) AS n2,
        |    max(CASE WHEN grp = '2-HIGH' THEN sv END) AS s2,
        |    max(CASE WHEN grp = '2-HIGH' THEN ss END) AS ss2,
        |    max(CASE WHEN grp = '3-MEDIUM' THEN n END) AS n3,
        |    max(CASE WHEN grp = '3-MEDIUM' THEN sv END) AS s3,
        |    max(CASE WHEN grp = '3-MEDIUM' THEN ss END) AS ss3,
        |    max(CASE WHEN grp = '4-NOT SPECIFIED' THEN n END) AS n4,
        |    max(CASE WHEN grp = '4-NOT SPECIFIED' THEN sv END) AS s4,
        |    max(CASE WHEN grp = '4-NOT SPECIFIED' THEN ss END) AS ss4,
        |    max(CASE WHEN grp = '5-LOW' THEN n END) AS n5,
        |    max(CASE WHEN grp = '5-LOW' THEN sv END) AS s5,
        |    max(CASE WHEN grp = '5-LOW' THEN ss END) AS ss5
        |  FROM g),
        |e AS (
        |  SELECT n1 + n2 + n3 + n4 + n5 AS n_total,
        |    CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE) + CAST(s3 AS DOUBLE)
        |      + CAST(s4 AS DOUBLE) + CAST(s5 AS DOUBLE) AS st,
        |    CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
        |      + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE)
        |      + CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE)
        |      + CAST(s5 AS DOUBLE) * CAST(s5 AS DOUBLE) / CAST(n5 AS DOUBLE)
        |      AS bg,
        |    CAST(ss1 AS DOUBLE) + CAST(ss2 AS DOUBLE) + CAST(ss3 AS DOUBLE)
        |      + CAST(ss4 AS DOUBLE) + CAST(ss5 AS DOUBLE) AS sstot
        |  FROM m)
        |SELECT n_total,
        |  bg - st * st / CAST(n_total AS DOUBLE) AS ssb,
        |  sstot - bg AS ssw,
        |  ((bg - st * st / CAST(n_total AS DOUBLE)) / 4.0)
        |    / ((sstot - bg) / (CAST(n_total AS DOUBLE) - 5.0)) AS f_bf
        |FROM e""".stripMargin,

    "q_cliffs_delta" ->
      """WITH sample AS (
        |  SELECT o_orderkey AS ok, o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |ranked AS (
        |  SELECT ok, CAST(v AS DOUBLE) AS ord,
        |    CAST(row_number() OVER (ORDER BY CAST(v AS DOUBLE), ok) AS BIGINT)
        |      AS rnk
        |  FROM sample),
        |ties AS (
        |  SELECT ord, min(rnk) + max(rnk) AS mr2
        |  FROM ranked GROUP BY ord),
        |mr AS (
        |  SELECT r.ok, t.mr2, s.grp
        |  FROM ranked r JOIN ties t ON r.ord = t.ord
        |  JOIN sample s ON r.ok = s.ok),
        |g AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(mr2) AS BIGINT) AS sr2
        |  FROM mr GROUP BY grp),
        |st AS (
        |  SELECT max(CASE WHEN grp = '1-URGENT' THEN n END) AS n1,
        |    max(CASE WHEN grp = '5-LOW' THEN n END) AS n2,
        |    max(CASE WHEN grp = '1-URGENT' THEN sr2 END) AS r1x2
        |  FROM g)
        |SELECT n1, n2,
        |  ((r1x2 - n1 * (n1 + 1)) - n1 * n2) * 1000000 // (n1 * n2)
        |    AS cliffs_delta_ppm
        |FROM st""".stripMargin,

    "q_poisson_rate" ->
      """WITH c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b
        |  FROM events WHERE event_type IN ('click', 'view'))
        |SELECT a, b,
        |  CAST(a - b AS DOUBLE) / sqrt(CAST(a + b AS DOUBLE)) AS z,
        |  a * 1000000 // b AS rate_ratio_ppm
        |FROM c""".stripMargin,

    "q_capture_recapture" ->
      """WITH flags AS (
        |  SELECT o_custkey,
        |    CAST(max(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(max(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2
        |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY o_custkey),
        |g AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2,
        |    CAST(sum(c1 * c2) AS BIGINT) AS m
        |  FROM flags)
        |SELECT n1, n2, m,
        |  (n1 + 1) * (n2 + 1) // (m + 1) - 1 AS chapman_est
        |FROM g""".stripMargin,

    "q_good_turing" ->
      """WITH tri AS (
        |  SELECT unnest(list_transform(generate_series(1, len(tk) - 2),
        |    i -> array_to_string(tk[i:i+2], ' '))) AS g
        |  FROM (SELECT string_split(text, ' ') AS tk FROM documents) t
        |  WHERE len(tk) >= 3),
        |freq AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS r FROM tri GROUP BY g),
        |fof AS (
        |  SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM freq GROUP BY r)
        |SELECT a.r AS r, a.n_r AS n_r, b.n_r AS n_next,
        |  (a.r + 1) * b.n_r * 1000 // a.n_r AS r_star_milli
        |FROM fof a JOIN fof b ON a.r + 1 = b.r
        |WHERE a.r <= 10 ORDER BY r""".stripMargin,

    "q_heaps" ->
      """WITH total AS (SELECT CAST(count(*) AS BIGINT) AS d_total
        |  FROM documents),
        |tri AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 2),
        |    i -> array_to_string(tk[i:i+2], ' '))) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t
        |  WHERE len(tk) >= 3),
        |first AS (
        |  SELECT g, CAST(min(doc_id) AS BIGINT) AS first_doc
        |  FROM tri GROUP BY g),
        |bucketed AS (
        |  SELECT ((first_doc + 1) * 10 + d_total - 1) // d_total
        |      AS checkpoint,
        |    CAST(count(*) AS BIGINT) AS new_types
        |  FROM first CROSS JOIN total GROUP BY 1)
        |SELECT checkpoint, d_total * checkpoint // 10 AS docs_cum,
        |  new_types,
        |  CAST(sum(new_types) OVER (ORDER BY checkpoint
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS vocab_cum
        |FROM bucketed CROSS JOIN total ORDER BY checkpoint""".stripMargin,

    "q_bot_detect" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus
        |  FROM events),
        |gaps AS (
        |  SELECT user_id,
        |    (tus - lag(tus) OVER (PARTITION BY user_id
        |      ORDER BY tus, event_id)) // 1000 AS gap_ms
        |  FROM e),
        |g AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(gap_ms) AS BIGINT) AS sum_gap_ms,
        |    CAST(sum(CASE WHEN gap_ms <= 3600000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fast
        |  FROM gaps WHERE gap_ms IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_gaps,
        |  sum_gap_ms // n_gaps AS mean_gap_ms,
        |  fast * 1000000 // n_gaps AS fast_ppm,
        |  (n_gaps >= 20 AND (fast * 1000000 // n_gaps > 200000
        |    OR sum_gap_ms // n_gaps < 7200000)) AS bot_flag
        |FROM g ORDER BY user_id""".stripMargin,

    "q_fellegi_sunter" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand, p_type, p_size,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
        |    substr(p_name, 1, 1) AS initial
        |  FROM part)
        |SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |  a.p_brand = b.p_brand AS brand_eq,
        |  a.p_type = b.p_type AS type_eq,
        |  abs(a.price_c - b.price_c) <= 5000 AS price_eq,
        |  CAST(CASE WHEN a.p_brand = b.p_brand THEN 2400000 ELSE -800000 END
        |    + CASE WHEN a.p_type = b.p_type THEN 1800000 ELSE -400000 END
        |    + CASE WHEN abs(a.price_c - b.price_c) <= 5000
        |        THEN 900000 ELSE -300000 END AS BIGINT) AS score_micro
        |FROM p a JOIN p b
        |  ON a.p_size = b.p_size AND a.initial = b.initial
        |  AND a.p_partkey < b.p_partkey
        |WHERE (CASE WHEN a.p_brand = b.p_brand THEN 2400000 ELSE -800000 END
        |    + CASE WHEN a.p_type = b.p_type THEN 1800000 ELSE -400000 END
        |    + CASE WHEN abs(a.price_c - b.price_c) <= 5000
        |        THEN 900000 ELSE -300000 END) >= 2500000
        |ORDER BY k1, k2""".stripMargin,

    "q_period_detect" ->
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |  CAST(sum(c) AS BIGINT) AS sc FROM daily),
        |periods AS (SELECT CAST(unnest(generate_series(2, 10)) AS BIGINT)
        |  AS p),
        |folded AS (
        |  SELECT p, d % p AS r, CAST(sum(c) AS BIGINT) AS sr,
        |    CAST(count(*) AS BIGINT) AS nr
        |  FROM daily CROSS JOIN periods GROUP BY 1, 2),
        |scores AS (
        |  SELECT p, CAST(sum(sr * sr // nr) AS BIGINT) AS ssb_scaled
        |  FROM folded GROUP BY p)
        |SELECT p, ssb_scaled, ssb_scaled - sc * sc // nd AS period_score
        |FROM scores CROSS JOIN tot ORDER BY p""".stripMargin,

    "q_mase" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |e1 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n1,
        |    CAST(sum(abs(b.v - a.v)) AS BIGINT) AS sae1
        |  FROM daily a JOIN daily b ON a.day + 1 = b.day),
        |e7 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n7,
        |    CAST(sum(abs(b.v - a.v)) AS BIGINT) AS sae7
        |  FROM daily a JOIN daily b ON a.day + 7 = b.day)
        |SELECT n1, sae1, n7, sae7,
        |  (sae7 * n1) * 1000000 // (sae1 * n7) AS mase_ppm
        |FROM e1 CROSS JOIN e7""".stripMargin,

    "q_session_entropy" ->
      """WITH byu AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c4
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n,
        |  CAST(floor((0.0 - (
        |    (CASE WHEN c0 > 0 THEN (CAST(c0 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c0 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END)
        |    + (CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END)
        |    + (CASE WHEN c2 > 0 THEN (CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END)
        |    + (CASE WHEN c3 > 0 THEN (CAST(c3 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c3 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END)
        |    + (CASE WHEN c4 > 0 THEN (CAST(c4 AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c4 AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END)
        |    )) * 1000000 + 0.5) AS BIGINT) AS entropy_unat
        |FROM byu ORDER BY user_id""".stripMargin,

    "q_dedup_sweep" ->
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |cand AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
         |                  HAVING count(*) > ${graft.llm.Dedup.DefaultMaxShingleDf})),
         |p AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM cand a JOIN cand b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT d1, d2, CAST(shared AS BIGINT) AS shared,
         |    CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2
         |  FROM p JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
         |  WHERE shared / (c1.n + c2.n - shared) >= 0.05),
         |thr AS (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT) * 100000
         |  AS thr_ppm)
         |SELECT thr_ppm,
         |  CAST(sum(CASE WHEN shared * 1000000 >= thr_ppm * (n1 + n2 - shared)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT CASE WHEN shared * 1000000
         |      >= thr_ppm * (n1 + n2 - shared) THEN d2 END) AS BIGINT)
         |    AS docs_dropped
         |FROM pairs CROSS JOIN thr GROUP BY thr_ppm
         |ORDER BY thr_ppm""".stripMargin,

    "q_vector_norms" ->
      s"""WITH e AS (
         |  SELECT CAST(label AS BIGINT) AS label,
         |    ${duckDot("embedding", "embedding")} AS nrm_fp
         |  FROM embeddings)
         |SELECT label, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(nrm_fp) AS BIGINT) // count(*) AS mean_nrm_fp,
         |  CAST(min(nrm_fp) AS BIGINT) AS min_nrm_fp,
         |  CAST(max(nrm_fp) AS BIGINT) AS max_nrm_fp,
         |  CAST(sum(CASE WHEN nrm_fp < 10000000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS degenerate
         |FROM e GROUP BY label ORDER BY label""".stripMargin,

    "q_temporal_split" ->
      """WITH per AS (
        |  SELECT c_nationkey, o_custkey,
        |    CAST(sum(CASE WHEN o_orderdate < DATE '1998-01-01'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
        |    CAST(sum(CASE WHEN o_orderdate >= DATE '1998-01-01'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_te
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  CAST(sum(n_tr) AS BIGINT) AS train_orders,
        |  CAST(sum(n_te) AS BIGINT) AS test_orders,
        |  CAST(sum(CASE WHEN n_tr > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS train_customers,
        |  CAST(sum(CASE WHEN n_te > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS test_customers,
        |  CAST(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS straddling,
        |  CAST(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000
        |    // CAST(sum(CASE WHEN n_te > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS straddle_ppm
        |FROM per GROUP BY 1 ORDER BY nation""".stripMargin,

    "q_robust_scaler" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c, o_orderkey
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, c,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY CAST(c AS DOUBLE), o_orderkey) AS rnk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM c),
        |f AS (
        |  SELECT o_orderpriority AS prio,
        |    max(CASE WHEN rnk = (n * 25 + 99) // 100 THEN c END) AS p25_c,
        |    max(CASE WHEN rnk = (n * 50 + 99) // 100 THEN c END) AS p50_c,
        |    max(CASE WHEN rnk = (n * 75 + 99) // 100 THEN c END) AS p75_c
        |  FROM r
        |  WHERE rnk IN ((n * 25 + 99) // 100, (n * 50 + 99) // 100,
        |                (n * 75 + 99) // 100)
        |  GROUP BY 1)
        |SELECT o_orderkey, o_orderpriority,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v_c,
        |  (CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) - p50_c)
        |    * 1000000 // (p75_c - p25_c) AS scaled_ppm
        |FROM orders JOIN f ON o_orderpriority = prio
        |WHERE o_orderkey % 997 = 0 ORDER BY o_orderkey""".stripMargin,

    "q_novelty" ->
      """WITH typed AS (
        |  SELECT DISTINCT source, g FROM (
        |    SELECT source,
        |      unnest(list_transform(generate_series(1, len(tk) - 2),
        |        i -> array_to_string(tk[i:i+2], ' '))) AS g
        |    FROM (SELECT source, string_split(text, ' ') AS tk
        |          FROM documents) t
        |    WHERE len(tk) >= 3) u),
        |spread AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_sources
        |  FROM typed GROUP BY g)
        |SELECT source, CAST(count(*) AS BIGINT) AS types,
        |  CAST(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS exclusive_types,
        |  CAST(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS novelty_ppm
        |FROM typed JOIN spread USING (g)
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_funnel_windows" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS sec
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, CAST(min(sec) AS BIGINT) AS t_signup
        |  FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |dt AS (
        |  SELECT e.user_id, CAST(min(e.sec - t_signup) AS BIGINT) AS dt
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'purchase' AND e.sec >= t_signup
        |  GROUP BY e.user_id),
        |signups AS (SELECT CAST(count(*) AS BIGINT) AS signups FROM s1),
        |w AS (SELECT CAST(unnest([3600, 21600, 86400]) AS BIGINT)
        |  AS window_sec)
        |SELECT window_sec,
        |  CAST(sum(CASE WHEN dt <= window_sec THEN 1 ELSE 0 END) AS BIGINT)
        |    AS converted,
        |  signups,
        |  CAST(sum(CASE WHEN dt <= window_sec THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // signups AS cvr_ppm
        |FROM dt CROSS JOIN w CROSS JOIN signups
        |GROUP BY window_sec, signups ORDER BY window_sec""".stripMargin,

    "q_first_touch" ->
      """WITH p AS (
        |  SELECT user_id, ts,
        |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli
        |  FROM events WHERE event_type = 'purchase'),
        |fc AS (
        |  SELECT user_id, ts AS fc_ts, channel AS fc_channel FROM (
        |    SELECT user_id, ts,
        |      CAST(json_extract_string(props, '$.k') AS BIGINT) % 4
        |        AS channel,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS rn
        |    FROM events WHERE event_type = 'click') t
        |  WHERE rn = 1)
        |SELECT CASE WHEN fc_ts IS NOT NULL AND fc_ts <= p.ts
        |    THEN fc_channel ELSE -1 END AS channel,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(v_milli) AS BIGINT) AS value_milli
        |FROM p LEFT JOIN fc ON p.user_id = fc.user_id
        |GROUP BY 1 ORDER BY channel""".stripMargin,

    "q_paasche" ->
      """WITH py AS (
        |  SELECT l_partkey, CAST(year(l_shipdate) AS BIGINT) AS yr,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY l_partkey, year(l_shipdate)),
        |base AS (
        |  SELECT l_partkey, cents AS cents0, qty AS q0
        |  FROM py WHERE yr = 1996)
        |SELECT yr, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(cents) AS BIGINT) * 1000000
        |    // CAST(sum(cents0 * qty // q0) AS BIGINT) AS index_ppm
        |FROM py JOIN base USING (l_partkey)
        |GROUP BY yr ORDER BY yr""".stripMargin,

    "q_ab_srm" ->
      """WITH g AS (
        |  SELECT o_custkey % 2 AS variant,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
        |    max(CASE WHEN variant = 1 THEN n END) AS n1
        |  FROM g)
        |SELECT n0, n1,
        |  (n0 - n1) * (n0 - n1) * 1000 // (n0 + n1) AS chi2_milli,
        |  ((n0 - n1) * (n0 - n1) * 1000 // (n0 + n1)) >= 3841 AS srm_flag
        |FROM w""".stripMargin,

    "q_tail_index" ->
      """WITH top AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
        |    o_orderkey AS ok
        |  FROM orders ORDER BY v DESC, ok LIMIT 201),
        |thr AS (SELECT CAST(min(v) AS BIGINT) AS x_thr FROM top),
        |terms AS (
        |  SELECT CAST(floor(ln(CAST(v AS DOUBLE) / CAST(x_thr AS DOUBLE))
        |    * 1000000 + 0.5) AS BIGINT) AS term_unat, x_thr
        |  FROM top CROSS JOIN thr)
        |SELECT x_thr AS x_thr_cents, CAST(count(*) AS BIGINT) AS k_plus_1,
        |  CAST(sum(term_unat) AS BIGINT) AS sum_unat,
        |  (CAST(count(*) AS BIGINT) - 1) * 1000000000
        |    // CAST(sum(term_unat) AS BIGINT) AS hill_alpha_milli
        |FROM terms GROUP BY x_thr""".stripMargin,

    "q_rolling_corr" ->
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS d,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |s AS (
        |  SELECT d, x, y,
        |    CAST(count(*) OVER w AS BIGINT) AS nw,
        |    CAST(sum(x) OVER w AS BIGINT) AS sx,
        |    CAST(sum(y) OVER w AS BIGINT) AS sy,
        |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
        |    CAST(sum(y * y) OVER w AS BIGINT) AS syy,
        |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy
        |  FROM daily
        |  WINDOW w AS (ORDER BY d RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT d, nw, x, y,
        |  CASE WHEN nw >= 3 THEN
        |    CAST(nw * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(nw * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(nw * syy - sy * sy AS DOUBLE)))
        |  END AS r
        |FROM s ORDER BY d""".stripMargin,

    "q_burst_detect" ->
      """WITH hourly AS (
        |  SELECT epoch_ns(ts) // 3600000000000 AS h,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |f AS (
        |  SELECT h, c,
        |    CAST(sum(c) OVER w AS BIGINT) AS trail,
        |    CAST(count(*) OVER w AS BIGINT) AS n_trail
        |  FROM hourly
        |  WINDOW w AS (ORDER BY h RANGE BETWEEN 24 PRECEDING
        |    AND 1 PRECEDING)),
        |b AS (
        |  SELECT h, c, (n_trail = 24 AND c * 20 > trail) AS burst
        |  FROM f),
        |i AS (
        |  SELECT h, c, burst,
        |    CAST(sum(CASE WHEN burst THEN 0 ELSE 1 END) OVER (ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS island
        |  FROM b)
        |SELECT CAST(min(h) AS BIGINT) AS start_h,
        |  CAST(max(h) AS BIGINT) AS end_h,
        |  CAST(count(*) AS BIGINT) AS hours,
        |  CAST(max(c) AS BIGINT) AS peak,
        |  CAST(sum(c) AS BIGINT) AS events
        |FROM i WHERE burst GROUP BY island ORDER BY start_h""".stripMargin,

    "q_adjacent_dup" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000000 AS tms
        |  FROM events),
        |lagged AS (
        |  SELECT event_type, tms,
        |    lag(event_type) OVER w AS prev_type,
        |    lag(tms) OVER w AS prev_tms
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN prev_type = event_type
        |    AND tms - prev_tms <= 5000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dup_fires,
        |  CAST(sum(CASE WHEN prev_type = event_type
        |    AND tms - prev_tms <= 5000 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS dup_ppm
        |FROM lagged GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_join_cardinality" ->
      """WITH a AS (
        |  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS ca
        |  FROM orders GROUP BY 1),
        |b AS (
        |  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cb
        |  FROM lineitem GROUP BY 1),
        |prods AS (
        |  SELECT a.k, ca * cb AS prod FROM a JOIN b ON a.k = b.k),
        |p AS (SELECT CAST(sum(prod) AS BIGINT) AS predicted,
        |  CAST(max(prod) AS BIGINT) AS hottest_key_rows FROM prods),
        |act AS (
        |  SELECT CAST(count(*) AS BIGINT) AS actual
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
        |SELECT predicted, actual, predicted = actual AS formula_exact,
        |  hottest_key_rows
        |FROM p CROSS JOIN act""".stripMargin,

    "q_weekday_strength" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS sv,
        |  CAST(sum(v * v) AS BIGINT) AS svv FROM daily),
        |bydow AS (
        |  SELECT (day + 4) % 7 AS dow, CAST(sum(v) AS BIGINT) AS sr,
        |    CAST(count(*) AS BIGINT) AS nr
        |  FROM daily GROUP BY 1),
        |bg AS (SELECT CAST(sum(sr * sr // nr) AS BIGINT) AS bg_scaled
        |  FROM bydow)
        |SELECT n AS n_days,
        |  bg_scaled - sv * sv // n AS ssb_scaled,
        |  svv - sv * sv // n AS sst_scaled,
        |  (bg_scaled - sv * sv // n) * 1000000 // (svv - sv * sv // n)
        |    AS strength_ppm
        |FROM bg CROSS JOIN tot""".stripMargin,

    "q_hurst" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rnk, v
        |  FROM daily),
        |ms AS (SELECT CAST(unnest([16, 64]) AS BIGINT) AS m),
        |expanded AS (
        |  SELECT m, (rnk - 1) // m AS blk, (rnk - 1) % m AS pos, v
        |  FROM ranked CROSS JOIN ms),
        |cum AS (
        |  SELECT m, blk, pos, v,
        |    CAST(sum(v) OVER (PARTITION BY m, blk ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cv,
        |    CAST(sum(v) OVER (PARTITION BY m, blk) AS BIGINT) AS sb_all
        |  FROM expanded),
        |withdev AS (
        |  SELECT m, blk, v, m * cv - (pos + 1) * sb_all AS cdev FROM cum),
        |perblock AS (
        |  SELECT m, blk, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(v) AS BIGINT) AS sb, CAST(sum(v * v) AS BIGINT) AS ssb,
        |    CAST(max(cdev) AS BIGINT) AS cmax,
        |    CAST(min(cdev) AS BIGINT) AS cmin
        |  FROM withdev GROUP BY m, blk),
        |rs AS (
        |  SELECT m,
        |    CAST(floor(CAST(cmax - cmin AS DOUBLE)
        |      / sqrt(CAST(m * ssb - sb * sb AS DOUBLE)) * 1000000 + 0.5)
        |      AS BIGINT) AS rs_micro
        |  FROM perblock WHERE nb = m),
        |perm AS (
        |  SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(rs_micro) AS BIGINT) AS srs
        |  FROM rs GROUP BY m),
        |lm AS (
        |  SELECT m, srs // n_blocks AS mean_rs_micro,
        |    CAST(floor(ln(CAST(srs // n_blocks AS DOUBLE) / 1000000.0)
        |      * 1000000 + 0.5) AS BIGINT) AS l_unat
        |  FROM perm)
        |SELECT
        |  max(CASE WHEN m = 16 THEN mean_rs_micro END) AS rs16_micro,
        |  max(CASE WHEN m = 64 THEN mean_rs_micro END) AS rs64_micro,
        |  (max(CASE WHEN m = 64 THEN l_unat END)
        |    - max(CASE WHEN m = 16 THEN l_unat END)) * 1000 // 1386294
        |    AS hurst_milli
        |FROM lm""".stripMargin,

    "q_eb_shrinkage" ->
      """WITH per AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |pr AS (
        |  SELECT nation, n, x, x * 1000000 // n AS r_ppm FROM per),
        |mo AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(r_ppm) AS BIGINT) AS sr,
        |    CAST(sum(r_ppm * r_ppm) AS BIGINT) AS srr
        |  FROM pr),
        |prior AS (
        |  SELECT
        |    CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) / 1000000.0 AS m,
        |    (CAST(srr AS DOUBLE) / CAST(k AS DOUBLE)
        |      - (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |        * (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))) / 1e12 AS v
        |  FROM mo),
        |prior2 AS (
        |  SELECT m, v, m * (1.0 - m) / v - 1.0 AS ab FROM prior)
        |SELECT nation, n, x, r_ppm,
        |  CAST(floor((CAST(x AS DOUBLE) + m * ab)
        |    / (CAST(n AS DOUBLE) + ab) * 1000000 + 0.5) AS BIGINT)
        |    AS shrunk_ppm
        |FROM pr CROSS JOIN prior2 ORDER BY nation""".stripMargin,

    "q_ratio_metric" ->
      """WITH cust AS (
        |  SELECT o_custkey % 2 AS arm, o_custkey,
        |    CAST(count(*) AS BIGINT) AS o,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100)
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1, 2),
        |arms AS (
        |  SELECT arm, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(r) AS BIGINT) AS sr, CAST(sum(o) AS BIGINT) AS so,
        |    CAST(sum(r * r) AS BIGINT) AS srr,
        |    CAST(sum(o * o) AS BIGINT) AS soo,
        |    CAST(sum(r * o) AS BIGINT) AS sro
        |  FROM cust GROUP BY arm),
        |wide AS (
        |  SELECT max(CASE WHEN arm = 0 THEN k END) AS k0,
        |    max(CASE WHEN arm = 1 THEN k END) AS k1,
        |    max(CASE WHEN arm = 0 THEN sr END) AS sr0,
        |    max(CASE WHEN arm = 1 THEN sr END) AS sr1,
        |    max(CASE WHEN arm = 0 THEN so END) AS so0,
        |    max(CASE WHEN arm = 1 THEN so END) AS so1,
        |    max(CASE WHEN arm = 0 THEN srr END) AS srr0,
        |    max(CASE WHEN arm = 1 THEN srr END) AS srr1,
        |    max(CASE WHEN arm = 0 THEN soo END) AS soo0,
        |    max(CASE WHEN arm = 1 THEN soo END) AS soo1,
        |    max(CASE WHEN arm = 0 THEN sro END) AS sro0,
        |    max(CASE WHEN arm = 1 THEN sro END) AS sro1
        |  FROM arms),
        |e AS (
        |  SELECT k0, k1,
        |    CAST(sr0 AS DOUBLE) / CAST(so0 AS DOUBLE) AS ratio0,
        |    CAST(sr1 AS DOUBLE) / CAST(so1 AS DOUBLE) AS ratio1,
        |    ((CAST(srr0 AS DOUBLE) / CAST(k0 AS DOUBLE)
        |        - (CAST(sr0 AS DOUBLE) / CAST(k0 AS DOUBLE))
        |          * (CAST(sr0 AS DOUBLE) / CAST(k0 AS DOUBLE)))
        |      - 2.0 * (CAST(sr0 AS DOUBLE) / CAST(so0 AS DOUBLE))
        |        * (CAST(sro0 AS DOUBLE) / CAST(k0 AS DOUBLE)
        |          - (CAST(sr0 AS DOUBLE) / CAST(k0 AS DOUBLE))
        |            * (CAST(so0 AS DOUBLE) / CAST(k0 AS DOUBLE)))
        |      + (CAST(sr0 AS DOUBLE) / CAST(so0 AS DOUBLE))
        |        * (CAST(sr0 AS DOUBLE) / CAST(so0 AS DOUBLE))
        |        * (CAST(soo0 AS DOUBLE) / CAST(k0 AS DOUBLE)
        |          - (CAST(so0 AS DOUBLE) / CAST(k0 AS DOUBLE))
        |            * (CAST(so0 AS DOUBLE) / CAST(k0 AS DOUBLE))))
        |      / (CAST(k0 AS DOUBLE) * (CAST(so0 AS DOUBLE) / CAST(k0 AS DOUBLE))
        |        * (CAST(so0 AS DOUBLE) / CAST(k0 AS DOUBLE))) AS v0,
        |    ((CAST(srr1 AS DOUBLE) / CAST(k1 AS DOUBLE)
        |        - (CAST(sr1 AS DOUBLE) / CAST(k1 AS DOUBLE))
        |          * (CAST(sr1 AS DOUBLE) / CAST(k1 AS DOUBLE)))
        |      - 2.0 * (CAST(sr1 AS DOUBLE) / CAST(so1 AS DOUBLE))
        |        * (CAST(sro1 AS DOUBLE) / CAST(k1 AS DOUBLE)
        |          - (CAST(sr1 AS DOUBLE) / CAST(k1 AS DOUBLE))
        |            * (CAST(so1 AS DOUBLE) / CAST(k1 AS DOUBLE)))
        |      + (CAST(sr1 AS DOUBLE) / CAST(so1 AS DOUBLE))
        |        * (CAST(sr1 AS DOUBLE) / CAST(so1 AS DOUBLE))
        |        * (CAST(soo1 AS DOUBLE) / CAST(k1 AS DOUBLE)
        |          - (CAST(so1 AS DOUBLE) / CAST(k1 AS DOUBLE))
        |            * (CAST(so1 AS DOUBLE) / CAST(k1 AS DOUBLE))))
        |      / (CAST(k1 AS DOUBLE) * (CAST(so1 AS DOUBLE) / CAST(k1 AS DOUBLE))
        |        * (CAST(so1 AS DOUBLE) / CAST(k1 AS DOUBLE))) AS v1
        |  FROM wide)
        |SELECT k0, k1, ratio0 AS rpo0, ratio1 AS rpo1,
        |  (ratio1 - ratio0) / sqrt(v0 + v1) AS z
        |FROM e""".stripMargin,

    "q_ece" ->
      s"""WITH scored AS (
         |  SELECT n_chars >= 200 AS label,
         |    40 * len(string_split(text, ' '))
         |      - 10 * length(regexp_replace(text, '[^0-9]', '', 'g'))
         |      - 2 * abs(n_chars - 500) - 1500 AS logit_milli
         |  FROM documents),
         |binned AS (
         |  SELECT greatest(least(logit_milli // 2000, 10), -10) AS bin,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos
         |  FROM scored GROUP BY 1),
         |g AS (
         |  SELECT bin, n, pos, CAST($confCaseSql AS BIGINT) AS conf_ppm,
         |    abs(pos * 1000000 // n - CAST($confCaseSql AS BIGINT))
         |      AS gap_ppm
         |  FROM binned)
         |SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         |  CAST(sum(n * gap_ppm) AS BIGINT) // CAST(sum(n) AS BIGINT)
         |    AS ece_ppm,
         |  CAST(max(gap_ppm * 1000 + bin + 10) AS BIGINT) // 1000
         |    AS max_gap_ppm,
         |  CAST(max(gap_ppm * 1000 + bin + 10) AS BIGINT) % 1000 - 10
         |    AS worst_bin
         |FROM g""".stripMargin,

    "q_fairness" ->
      """WITH scored AS (
        |  SELECT lang, n_chars >= 200 AS label,
        |    (40 * len(string_split(text, ' '))
        |      - 10 * length(regexp_replace(text, '[^0-9]', '', 'g'))
        |      - 2 * abs(n_chars - 500) - 1500) >= 0 AS pred
        |  FROM documents),
        |byl AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT) AS kept,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tp
        |  FROM scored GROUP BY lang),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS gn,
        |    CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT) AS gkept,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS gpos,
        |    CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT)
        |      AS gtp
        |  FROM scored)
        |SELECT lang, n,
        |  kept * 1000000 // n AS keep_ppm,
        |  tp * 1000000 // n_pos AS tpr_ppm,
        |  kept * 1000000 // n - gkept * 1000000 // gn AS dp_gap_ppm,
        |  tp * 1000000 // n_pos - gtp * 1000000 // gpos AS eo_gap_ppm
        |FROM byl CROSS JOIN g ORDER BY lang""".stripMargin,

    "q_fleiss_kappa" ->
      """WITH rated AS (
        |  SELECT (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END
        |    + CASE WHEN len(string_split(text, ' ')) >= 40 THEN 1 ELSE 0 END
        |    + CASE WHEN length(regexp_replace(text, '[^0-9]', '', 'g')) <= 5
        |        THEN 1 ELSE 0 END) AS n_pass
        |  FROM documents),
        |p AS (
        |  SELECT CAST(n_pass AS BIGINT) AS n_pass,
        |    CAST(n_pass * (n_pass - 1) + (3 - n_pass) * (2 - n_pass)
        |      AS BIGINT) AS pairs
        |  FROM rated),
        |agg0 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(sum(pairs) AS BIGINT) AS a,
        |    CAST(sum(n_pass) AS BIGINT) AS s
        |  FROM p)
        |SELECT n_items, a, s,
        |  ((CAST(a AS DOUBLE) / (6.0 * CAST(n_items AS DOUBLE)))
        |    - ((CAST(s AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)))
        |        * (CAST(s AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)))
        |      + (1.0 - CAST(s AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)))
        |        * (1.0 - CAST(s AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)))))
        |  / (1.0
        |    - ((CAST(s AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)))
        |        * (CAST(s AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)))
        |      + (1.0 - CAST(s AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)))
        |        * (1.0 - CAST(s AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)))))
        |  AS fleiss_kappa
        |FROM agg0""".stripMargin,

    "q_map_eval" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
         |  WHERE vec_id < 8),
         |adots AS (
         |  SELECT e.vec_id, c.cid, ${duckDot("e.embedding", "c.cv")} AS d
         |  FROM embeddings e CROSS JOIN cents c),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid)
         |        AS rn
         |    FROM adots) x WHERE rn = 1),
         |q AS (
         |  SELECT e.vec_id AS qid, e.embedding AS qv, a.cid AS qcid
         |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
         |  WHERE e.vec_id IN (0, 7, 42, 99, 123)),
         |td AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
                duckDot("e.embedding", "e.embedding"),
                duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> q.qid),
         |truth AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY greatest(CAST(0 AS BIGINT),
         |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
         |          vec_id) AS rn
         |    FROM td) x WHERE rn <= 10),
         |rd AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
                duckDot("e.embedding", "e.embedding"),
                duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e
         |  JOIN assign a ON e.vec_id = a.vec_id
         |  JOIN q ON a.cid = q.qcid
         |  WHERE e.vec_id <> q.qid),
         |ret AS (
         |  SELECT qid, vec_id, CAST(rn AS BIGINT) AS rn FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY greatest(CAST(0 AS BIGINT),
         |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
         |          vec_id) AS rn
         |    FROM rd) x WHERE rn <= 10),
         |marked AS (
         |  SELECT r.qid, r.rn,
         |    CAST(CASE WHEN t.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |      AS rel
         |  FROM ret r LEFT JOIN truth t
         |    ON r.qid = t.qid AND r.vec_id = t.vec_id),
         |cum AS (
         |  SELECT qid, rn, rel,
         |    CAST(sum(rel) OVER (PARTITION BY qid ORDER BY rn
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_rel
         |  FROM marked)
         |SELECT qid, CAST(sum(rel) AS BIGINT) AS hits,
         |  CAST(sum(CASE WHEN rel = 1 THEN cum_rel * 1000000 // rn
         |    ELSE 0 END) AS BIGINT) // 10 AS ap_ppm
         |FROM cum GROUP BY qid ORDER BY qid""".stripMargin,

    "q_range_boundaries" ->
      """WITH vals AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
        |    o_orderkey AS ok
        |  FROM orders),
        |sample AS (
        |  SELECT v, ok FROM vals
        |  WHERE CAST('0x' || substr(md5('bounds|' || CAST(ok AS VARCHAR)),
        |    1, 8) AS BIGINT) % 100 < 2),
        |ranked AS (
        |  SELECT v,
        |    CAST(row_number() OVER (ORDER BY CAST(v AS DOUBLE), ok)
        |      AS BIGINT) AS rnk,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM sample),
        |bounds AS (
        |  SELECT
        |    max(CASE WHEN rnk = greatest(n * 1 // 8, 1) THEN v END) AS b1,
        |    max(CASE WHEN rnk = greatest(n * 2 // 8, 1) THEN v END) AS b2,
        |    max(CASE WHEN rnk = greatest(n * 3 // 8, 1) THEN v END) AS b3,
        |    max(CASE WHEN rnk = greatest(n * 4 // 8, 1) THEN v END) AS b4,
        |    max(CASE WHEN rnk = greatest(n * 5 // 8, 1) THEN v END) AS b5,
        |    max(CASE WHEN rnk = greatest(n * 6 // 8, 1) THEN v END) AS b6,
        |    max(CASE WHEN rnk = greatest(n * 7 // 8, 1) THEN v END) AS b7
        |  FROM ranked),
        |bucketed AS (
        |  SELECT 1 + (CASE WHEN v > b1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > b2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > b3 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > b4 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > b5 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > b6 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v > b7 THEN 1 ELSE 0 END) AS bucket
        |  FROM vals CROSS JOIN bounds),
        |bc AS (
        |  SELECT CAST(bucket AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM bucketed GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM vals)
        |SELECT bucket, n_rows,
        |  (n_rows - n_total // 8) * 1000000 // (n_total // 8) AS skew_ppm
        |FROM bc CROSS JOIN tot ORDER BY bucket""".stripMargin,

    "q_neyman_alloc" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS prio, CAST(count(*) AS BIGINT) AS n_h,
        |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS ss
        |  FROM (SELECT o_orderpriority,
        |          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS v
        |        FROM orders) t
        |  GROUP BY 1),
        |w AS (
        |  SELECT prio, n_h,
        |    CAST(floor(sqrt((CAST(n_h AS DOUBLE) * CAST(ss AS DOUBLE)
        |      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
        |      / (CAST(n_h AS DOUBLE) * (CAST(n_h AS DOUBLE) - 1.0)))
        |      * 1000 + 0.5) AS BIGINT) AS s_milli
        |  FROM g),
        |w2 AS (SELECT prio, n_h, s_milli, n_h * s_milli AS w_milli FROM w),
        |tot AS (SELECT CAST(sum(w_milli) AS BIGINT) AS sw FROM w2)
        |SELECT prio, n_h, s_milli,
        |  w_milli * 1000000 // sw AS share_ppm,
        |  10000 * w_milli // sw AS alloc
        |FROM w2 CROSS JOIN tot ORDER BY prio""".stripMargin,

    // xxhash64 bloom bits aren't oracle-replayable: the QUERY ships the
    // bloom guarantees as booleans next to exact set sizes, and the
    // oracle asserts they held (q_approx_distinct's pattern)
    "q_bloom_fpp" ->
      """WITH dim AS (
        |  SELECT DISTINCT c_custkey AS k FROM customer
        |  WHERE c_mktsegment = 'BUILDING'),
        |probes AS (SELECT DISTINCT o_custkey AS k FROM orders)
        |SELECT CAST((SELECT count(*) FROM dim) AS BIGINT) AS n_build,
        |  CAST(count(*) AS BIGINT) AS n_probe,
        |  CAST(sum(CASE WHEN k IN (SELECT k FROM dim) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS true_members,
        |  TRUE AS no_false_negatives,
        |  TRUE AS fpp_within_bound
        |FROM probes""".stripMargin,

    "q_sax" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT v, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rnk
        |  FROM daily),
        |gstats AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS sv,
        |  CAST(sum(v * v) AS BIGINT) AS svv FROM ranked),
        |seg AS (
        |  SELECT (rnk - 1) // 8 AS seg, CAST(count(*) AS BIGINT) AS ns,
        |    CAST(sum(v) AS BIGINT) AS sb, CAST(min(v) AS BIGINT) AS lo,
        |    CAST(max(v) AS BIGINT) AS hi
        |  FROM ranked GROUP BY 1),
        |z AS (
        |  SELECT seg, sb, lo, hi,
        |    CAST(sb * n - sv * 8 AS DOUBLE) AS lhs,
        |    sqrt((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
        |      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |      * CAST(n AS DOUBLE) * 8.0 AS rhs
        |  FROM seg CROSS JOIN gstats WHERE ns = 8)
        |SELECT seg, sb, lo, hi,
        |  CASE WHEN lhs < rhs * (-0.6745) THEN 'a'
        |    WHEN lhs < 0.0 THEN 'b'
        |    WHEN lhs < rhs * 0.6745 THEN 'c'
        |    ELSE 'd' END AS symbol
        |FROM z ORDER BY seg""".stripMargin,

    "q_rank_fusion" -> {
      val rrfSql =
        """CASE rn WHEN 1 THEN 16393 WHEN 2 THEN 16129 WHEN 3 THEN 15873
          | WHEN 4 THEN 15625 WHEN 5 THEN 15385 WHEN 6 THEN 15152
          | WHEN 7 THEN 14925 WHEN 8 THEN 14706 WHEN 9 THEN 14493
          | ELSE 14286 END""".stripMargin
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
         |  WHERE vec_id < 8),
         |adots AS (
         |  SELECT e.vec_id, c.cid, ${duckDot("e.embedding", "c.cv")} AS d
         |  FROM embeddings e CROSS JOIN cents c),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid)
         |        AS rn
         |    FROM adots) x WHERE rn = 1),
         |q AS (
         |  SELECT e.vec_id AS qid, e.embedding AS qv, a.cid AS qcid
         |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
         |  WHERE e.vec_id IN (0, 7, 42, 99, 123)),
         |td AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
              duckDot("e.embedding", "e.embedding"),
              duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> q.qid),
         |bf10 AS (
         |  SELECT qid, vec_id, CAST($rrfSql AS BIGINT) AS rrf_micro FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY greatest(CAST(0 AS BIGINT),
         |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
         |          vec_id) AS rn
         |    FROM td) x WHERE rn <= 10),
         |rd AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
              duckDot("e.embedding", "e.embedding"),
              duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e
         |  JOIN assign a ON e.vec_id = a.vec_id
         |  JOIN q ON a.cid = q.qcid
         |  WHERE e.vec_id <> q.qid),
         |ivf10 AS (
         |  SELECT qid, vec_id, CAST($rrfSql AS BIGINT) AS rrf_micro FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY greatest(CAST(0 AS BIGINT),
         |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
         |          vec_id) AS rn
         |    FROM rd) x WHERE rn <= 10),
         |fused AS (
         |  SELECT qid, vec_id, CAST(sum(rrf_micro) AS BIGINT) AS rrf_micro,
         |    CAST(count(*) AS BIGINT) AS n_lists
         |  FROM (SELECT * FROM bf10 UNION ALL SELECT * FROM ivf10) u
         |  GROUP BY qid, vec_id),
         |final AS (
         |  SELECT qid, vec_id, n_lists, rrf_micro,
         |    CAST(row_number() OVER (PARTITION BY qid
         |      ORDER BY rrf_micro DESC, vec_id) AS BIGINT) AS frank
         |  FROM fused)
         |SELECT qid, frank, vec_id, n_lists, rrf_micro
         |FROM final WHERE frank <= 5 ORDER BY qid, frank""".stripMargin
    },

    "q_graph_jaccard" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |und AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
        |mid AS (SELECT e.u, e.v FROM edges e JOIN deg d ON e.u = d.u
        |        WHERE d.d <= 64),
        |common AS (
        |  SELECT e1.v AS x, e2.v AS y, CAST(count(*) AS BIGINT) AS n_common
        |  FROM mid e1 JOIN mid e2 ON e1.u = e2.u AND e1.v < e2.v
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT x, y, n_common,
        |    n_common * 1000000 // (dx.d + dy.d - n_common) AS jaccard_ppm
        |  FROM common
        |  JOIN deg dx ON common.x = dx.u
        |  JOIN deg dy ON common.y = dy.u),
        |top AS (SELECT * FROM scored ORDER BY jaccard_ppm DESC, x, y
        |  LIMIT 30)
        |SELECT x, y, n_common, jaccard_ppm FROM top ORDER BY x, y""".stripMargin,

    "q_abc_analysis" ->
      """WITH parts AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |run AS (
        |  SELECT cents,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS run_sum
        |  FROM parts),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM parts),
        |classed AS (
        |  SELECT cents,
        |    CASE WHEN run_sum * 5 <= t * 4 THEN 'A'
        |      WHEN run_sum * 20 <= t * 19 THEN 'B'
        |      ELSE 'C' END AS abc
        |  FROM run CROSS JOIN tot)
        |SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(cents) AS BIGINT) * 1000000 // t AS revenue_share_ppm
        |FROM classed CROSS JOIN tot GROUP BY abc, t ORDER BY abc""".stripMargin,

    "q_session_path" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS tus
        |  FROM events),
        |lagged AS (
        |  SELECT event_type,
        |    lag(event_type, 2) OVER w AS t1,
        |    lag(event_type, 1) OVER w AS t2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
        |SELECT t1 || '>' || t2 || '>' || event_type AS path,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lagged WHERE t1 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin,

    "q_churn_label" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(min(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT)
        |      AS first_d,
        |    CAST(max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT)
        |      AS last_d
        |  FROM orders GROUP BY 1),
        |cuts AS (
        |  SELECT CAST(DATE '1997-01-01' - DATE '1970-01-01' AS BIGINT)
        |      + i * 365 AS cut_d,
        |    CAST(i + 1997 AS BIGINT) AS cohort
        |  FROM (SELECT CAST(unnest(generate_series(0, 2)) AS BIGINT) AS i) t)
        |SELECT cohort, CAST(count(*) AS BIGINT) AS at_risk,
        |  CAST(sum(CASE WHEN last_d < cut_d THEN 1 ELSE 0 END) AS BIGINT)
        |    AS churned_strict,
        |  CAST(sum(CASE WHEN last_d < cut_d + 365 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS churned_365,
        |  CAST(sum(CASE WHEN last_d < cut_d + 365 THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS churn_ppm
        |FROM per CROSS JOIN cuts
        |WHERE first_d < cut_d GROUP BY cohort ORDER BY cohort""".stripMargin,

    "q_crosstab_residuals" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS prio, c_mktsegment AS seg
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cells AS (
        |  SELECT prio, seg, CAST(count(*) AS BIGINT) AS o
        |  FROM base GROUP BY 1, 2),
        |r AS (SELECT prio, CAST(count(*) AS BIGINT) AS rn
        |  FROM base GROUP BY 1),
        |c AS (SELECT seg, CAST(count(*) AS BIGINT) AS cn
        |  FROM base GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM base)
        |SELECT cells.prio, cells.seg, o,
        |  (CAST(o AS DOUBLE)
        |    - CAST(rn * cn AS DOUBLE) / CAST(nn AS DOUBLE))
        |    / sqrt(CAST(rn * cn AS DOUBLE) / CAST(nn AS DOUBLE))
        |    AS std_residual,
        |  abs((CAST(o AS DOUBLE)
        |    - CAST(rn * cn AS DOUBLE) / CAST(nn AS DOUBLE))
        |    / sqrt(CAST(rn * cn AS DOUBLE) / CAST(nn AS DOUBLE))) > 3.0
        |    AS outlier
        |FROM cells JOIN r ON cells.prio = r.prio
        |JOIN c ON cells.seg = c.seg CROSS JOIN n
        |ORDER BY cells.prio, cells.seg""".stripMargin,

    "q_var_cvar" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |deltas AS (
        |  SELECT b.v - a.v AS delta, b.day AS day
        |  FROM daily a JOIN daily b ON a.day + 1 = b.day),
        |ranked AS (
        |  SELECT delta,
        |    CAST(row_number() OVER (ORDER BY delta, day) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM deltas),
        |vr AS (
        |  SELECT delta, rnk, n, greatest((n * 5 + 99) // 100, 1) AS var_rank
        |  FROM ranked)
        |SELECT max(n) AS n_days,
        |  max(CASE WHEN rnk = var_rank THEN delta END) AS var95_kd,
        |  CAST(sum(CASE WHEN rnk <= var_rank THEN delta END) AS BIGINT)
        |    // CAST(sum(CASE WHEN rnk <= var_rank THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cvar95_kd
        |FROM vr""".stripMargin,

    "q_voptimal_hist" ->
      """WITH monthly AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mo,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |pre AS (
        |  SELECT CAST(row_number() OVER (ORDER BY mo) AS BIGINT) AS i,
        |    CAST(sum(v) OVER (ORDER BY mo
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cs,
        |    CAST(sum(v * v) OVER (ORDER BY mo
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS css
        |  FROM monthly),
        |nn AS (SELECT CAST(max(i) AS BIGINT) AS n FROM pre),
        |triples AS (
        |  SELECT x.i AS b1, y.i AS b2, z.i AS b3
        |  FROM pre x CROSS JOIN pre y CROSS JOIN pre z CROSS JOIN nn
        |  WHERE x.i < y.i AND y.i < z.i AND z.i < n),
        |sse AS (
        |  SELECT b1, b2, b3,
        |    ((p1.css - 0) * (p1.i - 0) - (p1.cs - 0) * (p1.cs - 0))
        |      // (p1.i - 0)
        |    + ((p2.css - p1.css) * (p2.i - p1.i)
        |      - (p2.cs - p1.cs) * (p2.cs - p1.cs)) // (p2.i - p1.i)
        |    + ((p3.css - p2.css) * (p3.i - p2.i)
        |      - (p3.cs - p2.cs) * (p3.cs - p2.cs)) // (p3.i - p2.i)
        |    + ((p4.css - p3.css) * (p4.i - p3.i)
        |      - (p4.cs - p3.cs) * (p4.cs - p3.cs)) // (p4.i - p3.i)
        |      AS sse_scaled
        |  FROM triples
        |  JOIN pre p1 ON b1 = p1.i
        |  JOIN pre p2 ON b2 = p2.i
        |  JOIN pre p3 ON b3 = p3.i
        |  CROSS JOIN nn JOIN pre p4 ON p4.i = n)
        |SELECT b1, b2, b3, CAST(sse_scaled AS BIGINT) AS sse_scaled
        |FROM sse ORDER BY sse_scaled, b1, b2, b3 LIMIT 1""".stripMargin,

    "q_coverage_curve" ->
      """WITH total AS (SELECT CAST(count(*) AS BIGINT) AS d_total
        |  FROM documents),
        |docs AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |firsts AS (
        |  SELECT fp, CAST(min(doc_id) AS BIGINT) AS first_doc
        |  FROM docs GROUP BY fp)
        |SELECT ((doc_id + 1) * 10 + d_total - 1) // d_total AS decile,
        |  CAST(count(*) AS BIGINT) AS docs,
        |  CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
        |    AS novel_docs,
        |  (CAST(count(*) AS BIGINT)
        |    - CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
        |      AS BIGINT)) * 1000000 // CAST(count(*) AS BIGINT) AS dup_ppm
        |FROM docs JOIN firsts USING (fp) CROSS JOIN total
        |GROUP BY 1 ORDER BY decile""".stripMargin,

    "q_multi_touch" ->
      """WITH p AS (
        |  SELECT event_id AS pid, user_id, ts,
        |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS c_ts,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS channel
        |  FROM events WHERE event_type = 'click'),
        |paired AS (
        |  SELECT pid, v_milli, channel
        |  FROM p JOIN c ON p.user_id = c.user_id AND c.c_ts < p.ts),
        |counted AS (
        |  SELECT pid, CAST(count(*) AS BIGINT) AS n_clicks
        |  FROM paired GROUP BY pid)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(v_milli * 1000 // n_clicks) AS BIGINT) AS credit_micro
        |FROM paired JOIN counted USING (pid)
        |GROUP BY channel ORDER BY channel""".stripMargin,

    "q_shapley_attribution" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'click' AND
        |      CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(max(CASE WHEN event_type = 'click' AND
        |      CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(max(CASE WHEN event_type = 'click' AND
        |      CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events GROUP BY user_id),
        |coal AS (
        |  SELECT c0, c1, c2, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(conv) AS BIGINT) AS x
        |  FROM per GROUP BY 1, 2, 3),
        |rates AS (
        |  SELECT c0, c1, c2,
        |    CASE WHEN n > 0 THEN x * 1000000 // n ELSE 0 END AS v
        |  FROM coal),
        |wide AS (
        |  SELECT
        |    coalesce(max(CASE WHEN c0=0 AND c1=0 AND c2=0 THEN v END), 0) AS v000,
        |    coalesce(max(CASE WHEN c0=0 AND c1=0 AND c2=1 THEN v END), 0) AS v001,
        |    coalesce(max(CASE WHEN c0=0 AND c1=1 AND c2=0 THEN v END), 0) AS v010,
        |    coalesce(max(CASE WHEN c0=0 AND c1=1 AND c2=1 THEN v END), 0) AS v011,
        |    coalesce(max(CASE WHEN c0=1 AND c1=0 AND c2=0 THEN v END), 0) AS v100,
        |    coalesce(max(CASE WHEN c0=1 AND c1=0 AND c2=1 THEN v END), 0) AS v101,
        |    coalesce(max(CASE WHEN c0=1 AND c1=1 AND c2=0 THEN v END), 0) AS v110,
        |    coalesce(max(CASE WHEN c0=1 AND c1=1 AND c2=1 THEN v END), 0) AS v111
        |  FROM rates)
        |SELECT
        |  (2 * (v100 - v000) + (v110 - v010) + (v101 - v001)
        |    + 2 * (v111 - v011)) // 6 AS shapley0_micro,
        |  (2 * (v010 - v000) + (v110 - v100) + (v011 - v001)
        |    + 2 * (v111 - v101)) // 6 AS shapley1_micro,
        |  (2 * (v001 - v000) + (v101 - v100) + (v011 - v010)
        |    + 2 * (v111 - v110)) // 6 AS shapley2_micro
        |FROM wide""".stripMargin,

    "q_uplift_by_segment" ->
      """WITH users AS (
        |  SELECT c_mktsegment AS segment, o_custkey % 2 AS arm, o_custkey,
        |    CAST(max(CASE WHEN o_orderdate >= DATE '1995-01-01'
        |      AND o_orderdate < DATE '1996-01-01' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2, 3),
        |g AS (
        |  SELECT segment,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x0,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x1
        |  FROM users GROUP BY segment)
        |SELECT segment, n0, n1,
        |  x0 * 1000000 // n0 AS control_ppm,
        |  x1 * 1000000 // n1 AS treat_ppm,
        |  x1 * 1000000 // n1 - x0 * 1000000 // n0 AS uplift_ppm
        |FROM g ORDER BY segment""".stripMargin,

    "q_anomaly_stl" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS c
        |  FROM orders GROUP BY 1),
        |tr AS (
        |  SELECT day, c,
        |    c - (CAST(sum(c) OVER w AS BIGINT) // CAST(count(*) OVER w AS BIGINT)) AS det,
        |    (day + 4) % 7 AS wd
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |seas AS (
        |  SELECT wd,
        |    CAST(sum(det) AS BIGINT) // CAST(count(*) AS BIGINT) AS seasonal_c
        |  FROM tr GROUP BY wd),
        |resid AS (
        |  SELECT day, c, CAST(t.det - s.seasonal_c AS BIGINT) AS r
        |  FROM tr t JOIN seas s ON t.wd = s.wd),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(r) AS BIGINT) AS sr,
        |    CAST(sum(r * r) AS BIGINT) AS srr
        |  FROM resid)
        |SELECT day, c AS rev_c, r AS residual_c,
        |  (CAST(r AS DOUBLE) - CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
        |      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS z
        |FROM resid CROSS JOIN mom
        |WHERE abs((CAST(r AS DOUBLE) - CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
        |      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) > 3.0
        |ORDER BY day""".stripMargin,

    "q_quantile_bands" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |wdd AS (SELECT day, v, (day + 4) % 7 AS wd FROM daily),
        |r AS (
        |  SELECT wd, v,
        |    CAST(row_number() OVER (PARTITION BY wd ORDER BY v, day)
        |      AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY wd) AS BIGINT) AS n
        |  FROM wdd)
        |SELECT wd, max(n) AS n_days,
        |  max(CASE WHEN rnk = greatest((n * 10 + 99) // 100, 1) THEN v END)
        |    AS p10_kd,
        |  max(CASE WHEN rnk = greatest((n * 50 + 99) // 100, 1) THEN v END)
        |    AS p50_kd,
        |  max(CASE WHEN rnk = greatest((n * 90 + 99) // 100, 1) THEN v END)
        |    AS p90_kd
        |FROM r
        |WHERE rnk IN (greatest((n * 10 + 99) // 100, 1),
        |  greatest((n * 50 + 99) // 100, 1),
        |  greatest((n * 90 + 99) // 100, 1))
        |GROUP BY wd ORDER BY wd""".stripMargin,

    "q_price_dispersion" ->
      """WITH unit AS (
        |  SELECT l_partkey,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      // CAST(l_quantity AS BIGINT) AS u
        |  FROM lineitem),
        |g AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(u) AS BIGINT) AS su, CAST(sum(u * u) AS BIGINT) AS suu
        |  FROM unit GROUP BY 1 HAVING count(*) >= 5),
        |cv AS (
        |  SELECT l_partkey, n, su // n AS mean_unit_c,
        |    CAST(floor(sqrt((CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
        |        - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |      / (CAST(su AS DOUBLE) / CAST(n AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT) AS cv_ppm
        |  FROM g),
        |top AS (SELECT * FROM cv ORDER BY cv_ppm DESC, l_partkey LIMIT 20)
        |SELECT l_partkey, n, mean_unit_c, cv_ppm FROM top
        |ORDER BY l_partkey""".stripMargin,

    "q_pvm_bridge" ->
      """WITH py AS (
        |  SELECT l_partkey, CAST(year(l_shipdate) AS BIGINT) AS yr,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |pp AS (SELECT l_partkey, yr, cents, qty, cents // qty AS p FROM py),
        |pairs AS (
        |  SELECT b.yr AS yr,
        |    (b.p - a.p) * b.qty AS price_eff,
        |    (b.qty - a.qty) * a.p AS volume_eff,
        |    b.cents - a.cents AS delta
        |  FROM pp a JOIN pp b
        |    ON a.l_partkey = b.l_partkey AND a.yr + 1 = b.yr)
        |SELECT yr, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(price_eff) AS BIGINT) AS price_effect_c,
        |  CAST(sum(volume_eff) AS BIGINT) AS volume_effect_c,
        |  CAST(sum(delta) AS BIGINT) AS delta_c,
        |  CAST(sum(delta) AS BIGINT) - CAST(sum(price_eff) AS BIGINT)
        |    - CAST(sum(volume_eff) AS BIGINT) AS residual_c
        |FROM pairs GROUP BY yr ORDER BY yr""".stripMargin,

    "q_entropy_rate" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS tus
        |  FROM events),
        |seq AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY tus, event_id) AS nxt
        |  FROM e),
        |trans AS (
        |  SELECT event_type, nxt, CAST(count(*) AS BIGINT) AS c
        |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |ft AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS ct
        |  FROM trans GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM trans),
        |cell AS (
        |  SELECT t.c, f.ct,
        |    CAST(floor((CAST(t.c AS DOUBLE) / CAST(f.ct AS DOUBLE))
        |      * ln(CAST(t.c AS DOUBLE) / CAST(f.ct AS DOUBLE))
        |      * (-1000000.0) + 0.5) AS BIGINT) AS term_unat
        |  FROM trans t JOIN ft f ON t.event_type = f.event_type)
        |SELECT n_all,
        |  CAST(sum(ct * term_unat) AS BIGINT) // n_all
        |    AS entropy_rate_unat
        |FROM cell CROSS JOIN tot GROUP BY n_all""".stripMargin,

    "q_pack_efficiency" ->
      """WITH f AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS tk
        |  FROM documents),
        |est AS (
        |  SELECT source,
        |    greatest(len(tk),
        |      CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4))
        |        AS BIGINT)) AS est_tokens
        |  FROM f),
        |g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(est_tokens) AS BIGINT) AS tokens
        |  FROM est GROUP BY source)
        |SELECT source, n_docs, tokens,
        |  (tokens + 2047) // 2048 AS windows,
        |  tokens * 1000000 // (((tokens + 2047) // 2048) * 2048) AS fill_ppm
        |FROM g ORDER BY source""".stripMargin,

    "q_hard_negatives" ->
      s"""WITH n AS (
         |  SELECT vec_id, label, embedding,
         |    ${duckDot("embedding", "embedding")} AS nrm
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS anchor, b.vec_id AS neg,
         |    CAST(floor(${duckCos(
              """list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)))""",
              "a.nrm", "b.nrm")} * 1000000 + 0.5) AS BIGINT) AS cos_micro
         |  FROM n a JOIN n b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id
         |  WHERE a.vec_id % 7 = 0),
         |banded AS (
         |  SELECT anchor, neg, cos_micro,
         |    CAST(row_number() OVER (PARTITION BY anchor
         |      ORDER BY cos_micro DESC, neg) AS BIGINT) AS rn
         |  FROM pairs WHERE cos_micro >= 100000 AND cos_micro <= 250000)
         |SELECT anchor, rn, neg, cos_micro
         |FROM banded WHERE rn <= 3 ORDER BY anchor, rn""".stripMargin,

    "q_pca_var_share" ->
      """WITH x AS (
        |  SELECT vec_id AS i, j,
        |    CAST(floor(CAST(embedding[j] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS xf
        |  FROM embeddings
        |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) js),
        |s1 AS (SELECT i, CAST(sum(xf) AS BIGINT) AS s FROM x GROUP BY i),
        |w1 AS (
        |  SELECT j, CAST(sum(xf * s) AS BIGINT) AS w
        |  FROM x JOIN s1 USING (i) GROUP BY j),
        |m1 AS (SELECT max(abs(w)) // 1000 + 1 AS d FROM w1),
        |v1 AS (SELECT j, w // (SELECT d FROM m1) AS v FROM w1),
        |s2 AS (
        |  SELECT i, CAST(sum(x.xf * v1.v) AS BIGINT) AS s
        |  FROM x JOIN v1 USING (j) GROUP BY i),
        |w2 AS (
        |  SELECT j, CAST(sum(xf * s) AS BIGINT) AS w
        |  FROM x JOIN s2 USING (i) GROUP BY j),
        |m2 AS (SELECT max(abs(w)) // 1000 + 1 AS d FROM w2),
        |vv2 AS (SELECT j, CAST(w // (SELECT d FROM m2) AS BIGINT) AS v
        |  FROM w2),
        |wn AS (SELECT CAST(sum(v * v) AS BIGINT) AS wn FROM vv2),
        |dd AS (
        |  SELECT i, CAST(sum(xf * v) AS BIGINT) AS dd
        |  FROM x JOIN vv2 USING (j) GROUP BY i),
        |num AS (
        |  SELECT CAST(sum((dd // 1000) * (dd // 1000)) AS BIGINT) AS num
        |  FROM dd),
        |tr AS (SELECT CAST(sum(xf * xf) AS BIGINT) AS trace_m2 FROM x)
        |SELECT num, wn, trace_m2,
        |  CAST(floor(((CAST(num AS DOUBLE) / CAST(wn AS DOUBLE))
        |    / (CAST(trace_m2 AS DOUBLE) / 1000000.0)) * 1000000.0 + 0.5)
        |    AS BIGINT) AS var_share_ppm
        |FROM num CROSS JOIN wn CROSS JOIN tr""".stripMargin,

    "q_cache_planning" ->
      """WITH freq AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |ranked AS (
        |  SELECT c, CAST(row_number() OVER (ORDER BY c DESC, l_partkey)
        |    AS BIGINT) AS rnk
        |  FROM freq),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_access FROM freq),
        |sizes AS (SELECT CAST(unnest([10, 50, 100, 500]) AS BIGINT)
        |  AS cache_size)
        |SELECT cache_size, CAST(sum(c) AS BIGINT) AS hits,
        |  CAST(sum(c) AS BIGINT) * 1000000 // n_access AS hit_ppm
        |FROM ranked CROSS JOIN sizes CROSS JOIN tot
        |WHERE rnk <= cache_size
        |GROUP BY cache_size, n_access ORDER BY cache_size""".stripMargin,

    "q_threshold_f1" ->
      """WITH scored AS (
        |  SELECT n_chars >= 200 AS label,
        |    40 * CAST(len(string_split(text, ' ')) AS BIGINT) +
        |    (-10) * CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) +
        |    (-2) * abs(n_chars - 500) + (-1500) AS logit_milli
        |  FROM documents),
        |binned AS (
        |  SELECT greatest(least(logit_milli // 2000, 10), -10) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM scored GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |  CAST(sum(pos) AS BIGINT) AS npos FROM binned),
        |cum AS (
        |  SELECT bin,
        |    CAST(sum(n) OVER w AS BIGINT) AS pred_pos,
        |    CAST(sum(pos) OVER w AS BIGINT) AS tp
        |  FROM binned
        |  WINDOW w AS (ORDER BY bin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s2 AS (
        |  SELECT bin AS threshold_bin, pred_pos, tp,
        |    tp * 1000000 // pred_pos AS precision_ppm,
        |    tp * 1000000 // npos AS recall_ppm,
        |    2 * tp * 1000000 // (pred_pos + npos) AS f1_ppm
        |  FROM cum CROSS JOIN tot),
        |best AS (
        |  SELECT max(f1_ppm * 1000 + (threshold_bin + 10)) AS enc FROM s2)
        |SELECT threshold_bin, pred_pos, tp, precision_ppm, recall_ppm,
        |  f1_ppm,
        |  f1_ppm * 1000 + (threshold_bin + 10) = enc AS is_best
        |FROM s2 CROSS JOIN best ORDER BY threshold_bin""".stripMargin,

    "q_forecast_eval" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT b.v AS y, a.v AS f
        |  FROM daily a JOIN daily b ON a.day + 7 = b.day),
        |terms AS (
        |  SELECT y, f, abs(y - f) AS ae,
        |    abs(y - f) * 2000000 // (y + f) AS smape_term
        |  FROM pairs),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(ae) AS BIGINT) AS sae, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(y - f) AS BIGINT) AS bias_kd,
        |    CAST(sum(smape_term) AS BIGINT) AS ssm
        |  FROM terms)
        |SELECT n_days, sae * 1000000 // sy AS wape_ppm,
        |  ssm // n_days AS smape_ppm, bias_kd
        |FROM g""".stripMargin,

    "q_customer_bridge" ->
      """WITH cy AS (
        |  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |flows AS (
        |  SELECT coalesce(b.yr, a.yr + 1) AS yr,
        |    CASE WHEN a.o_custkey IS NOT NULL AND b.o_custkey IS NOT NULL
        |      THEN 'retained'
        |      WHEN a.o_custkey IS NOT NULL THEN 'lost' ELSE 'new' END
        |      AS flow,
        |    coalesce(a.cents, 0) AS prev_cents,
        |    coalesce(b.cents, 0) AS cur_cents
        |  FROM cy a FULL OUTER JOIN cy b
        |    ON a.o_custkey = b.o_custkey AND a.yr + 1 = b.yr)
        |SELECT yr, flow, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(prev_cents) AS BIGINT) AS prev_cents,
        |  CAST(sum(cur_cents) AS BIGINT) AS cur_cents
        |FROM flows WHERE yr >= 1996 AND yr <= 2001
        |GROUP BY 1, 2 ORDER BY yr, flow""".stripMargin,

    "q_dup_orders" ->
      """SELECT o_custkey,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |    AS day,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS total_c,
        |  CAST(min(o_orderkey) AS BIGINT) AS k1,
        |  CAST(max(o_orderkey) AS BIGINT) AS k2
        |FROM orders
        |GROUP BY o_custkey, o_orderdate
        |HAVING count(*) > 1
        |ORDER BY o_custkey, day""".stripMargin,

    "q_fd_audit" ->
      """WITH oc AS (
        |  SELECT o_custkey, c_nationkey, o_orderpriority
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |f1 AS (
        |  SELECT 'custkey->nationkey' AS fd,
        |    CAST(count(*) AS BIGINT) AS lhs_values,
        |    CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS violations
        |  FROM (SELECT o_custkey, count(DISTINCT c_nationkey) AS ny
        |        FROM oc GROUP BY 1) t),
        |f2 AS (
        |  SELECT 'custkey->orderpriority' AS fd,
        |    CAST(count(*) AS BIGINT), CAST(sum(CASE WHEN ny > 1 THEN 1
        |      ELSE 0 END) AS BIGINT)
        |  FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS ny
        |        FROM oc GROUP BY 1) t),
        |f3 AS (
        |  SELECT 'partkey->brand' AS fd, CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM (SELECT p_partkey, count(DISTINCT p_brand) AS ny
        |        FROM part GROUP BY 1) t),
        |f4 AS (
        |  SELECT 'brand->size' AS fd, CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM (SELECT p_brand, count(DISTINCT p_size) AS ny
        |        FROM part GROUP BY 1) t),
        |f5 AS (
        |  SELECT 'nationkey->regionkey' AS fd, CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS ny
        |        FROM nation GROUP BY 1) t),
        |u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2
        |  UNION ALL SELECT * FROM f3 UNION ALL SELECT * FROM f4
        |  UNION ALL SELECT * FROM f5)
        |SELECT fd, lhs_values, violations, violations = 0 AS holds
        |FROM u ORDER BY fd""".stripMargin,

    "q_ship_sla" ->
      """WITH lat AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
        |      AS BIGINT) AS days,
        |    l_orderkey * 10 + l_linenumber AS lk
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |r AS (
        |  SELECT prio, days,
        |    CAST(row_number() OVER (PARTITION BY prio
        |      ORDER BY CAST(days AS DOUBLE), lk) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY prio) AS BIGINT) AS n
        |  FROM lat),
        |quant AS (
        |  SELECT prio, max(n) AS n,
        |    max(CASE WHEN rnk = greatest((n * 50 + 99) // 100, 1)
        |      THEN days END) AS p50_days,
        |    max(CASE WHEN rnk = greatest((n * 90 + 99) // 100, 1)
        |      THEN days END) AS p90_days
        |  FROM r
        |  WHERE rnk IN (greatest((n * 50 + 99) // 100, 1),
        |    greatest((n * 90 + 99) // 100, 1))
        |  GROUP BY prio),
        |breach AS (
        |  SELECT prio,
        |    CAST(sum(CASE WHEN days > 90 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS breaches
        |  FROM lat GROUP BY prio)
        |SELECT quant.prio, n, p50_days, p90_days,
        |  breaches * 1000000 // n AS breach_ppm
        |FROM quant JOIN breach ON quant.prio = breach.prio
        |ORDER BY quant.prio""".stripMargin,

    "q_set_cover" ->
      """WITH tri AS (
        |  SELECT DISTINCT source, g FROM (
        |    SELECT source,
        |      unnest(list_transform(generate_series(1, len(tk) - 2),
        |        i -> array_to_string(tk[i:i+2], ' '))) AS g
        |    FROM (SELECT source, string_split(text, ' ') AS tk
        |          FROM documents) t
        |    WHERE len(tk) >= 3) u),
        |tot AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS total FROM tri),
        |p1 AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS new_types
        |  FROM tri GROUP BY source ORDER BY new_types DESC, source LIMIT 1),
        |c1 AS (SELECT DISTINCT g FROM tri
        |  WHERE source IN (SELECT source FROM p1)),
        |p2 AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS new_types
        |  FROM tri
        |  WHERE g NOT IN (SELECT g FROM c1)
        |    AND source NOT IN (SELECT source FROM p1)
        |  GROUP BY source ORDER BY new_types DESC, source LIMIT 1),
        |c2 AS (SELECT DISTINCT g FROM tri
        |  WHERE source IN (SELECT source FROM p1
        |    UNION ALL SELECT source FROM p2)),
        |p3 AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS new_types
        |  FROM tri
        |  WHERE g NOT IN (SELECT g FROM c2)
        |    AND source NOT IN (SELECT source FROM p1
        |      UNION ALL SELECT source FROM p2)
        |  GROUP BY source ORDER BY new_types DESC, source LIMIT 1),
        |rounds AS (
        |  SELECT CAST(1 AS BIGINT) AS round, source, new_types FROM p1
        |  UNION ALL SELECT CAST(2 AS BIGINT), source, new_types FROM p2
        |  UNION ALL SELECT CAST(3 AS BIGINT), source, new_types FROM p3)
        |SELECT round, source, new_types,
        |  CAST(sum(new_types) OVER (ORDER BY round
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS covered_types,
        |  CAST(sum(new_types) OVER (ORDER BY round
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    * 1000000 // total AS coverage_ppm
        |FROM rounds CROSS JOIN tot ORDER BY round""".stripMargin,

    "q_elbow" -> {
      def sseBlock(k: Int): String =
        s"""  SELECT CAST($k AS BIGINT) AS k,
           |    CAST(sum(best // 1000) AS BIGINT) AS sse_scaled FROM (
           |    SELECT e.vec_id,
           |      min(${duckDot("e.embedding", "e.embedding")}
           |        - 2 * ${duckDot("e.embedding", "c.cv")}
           |        + ${duckDot("c.cv", "c.cv")}) AS best
           |    FROM embeddings e CROSS JOIN
           |      (SELECT embedding AS cv FROM embeddings WHERE vec_id < $k) c
           |    GROUP BY e.vec_id) t$k""".stripMargin
      s"""WITH curve AS (
         |${sseBlock(2)}
         |  UNION ALL
         |${sseBlock(4)}
         |  UNION ALL
         |${sseBlock(8)})
         |SELECT k, sse_scaled,
         |  CAST(coalesce(lag(sse_scaled, 1) OVER (ORDER BY k) - sse_scaled,
         |    0) AS BIGINT) AS drop_from_prev
         |FROM curve ORDER BY k""".stripMargin
    },

    "q_segmented_trend" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |pre AS (
        |  SELECT day, v,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
        |    CAST(sum(v) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cs,
        |    CAST(sum(v * v) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS css
        |  FROM daily),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS sv,
        |  CAST(sum(v * v) AS BIGINT) AS svv FROM daily),
        |scored AS (
        |  SELECT i, day,
        |    (css * i - cs * cs) // i
        |      + ((svv - css) * (n - i) - (sv - cs) * (sv - cs)) // (n - i)
        |      AS sse
        |  FROM pre CROSS JOIN tot WHERE i >= 2 AND i <= n - 2),
        |best AS (
        |  SELECT i AS cp_i, day AS cp_day FROM scored
        |  ORDER BY sse, i LIMIT 1),
        |sides AS (
        |  SELECT CASE WHEN i <= cp_i THEN 'before' ELSE 'after' END AS side,
        |    cp_day, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(i) AS BIGINT) AS sx, CAST(sum(v) AS BIGINT) AS sy,
        |    CAST(sum(i * i) AS BIGINT) AS sxx,
        |    CAST(sum(i * v) AS BIGINT) AS sxy
        |  FROM pre CROSS JOIN best GROUP BY 1, 2),
        |sl AS (
        |  SELECT side, cp_day, n,
        |    (n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx)
        |      AS slope_milli
        |  FROM sides)
        |SELECT cp_day,
        |  max(CASE WHEN side = 'before' THEN n END) AS n_before,
        |  max(CASE WHEN side = 'after' THEN n END) AS n_after,
        |  max(CASE WHEN side = 'before' THEN slope_milli END)
        |    AS slope_before_milli,
        |  max(CASE WHEN side = 'after' THEN slope_milli END)
        |    AS slope_after_milli,
        |  max(CASE WHEN side = 'after' THEN slope_milli END)
        |    - max(CASE WHEN side = 'before' THEN slope_milli END)
        |    AS slope_change_milli
        |FROM sl GROUP BY cp_day""".stripMargin,

    "q_cold_start_items" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |    CAST(year(l_shipdate) * 4 + (month(l_shipdate) - 1) // 3
        |      AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |firstq AS (
        |  SELECT l_partkey, CAST(min(q) AS BIGINT) AS fq
        |  FROM li GROUP BY 1)
        |SELECT q,
        |  CAST(count(DISTINCT CASE WHEN q = fq THEN li.l_partkey END)
        |    AS BIGINT) AS new_parts,
        |  CAST(sum(cents) AS BIGINT) AS rev_c,
        |  CAST(sum(CASE WHEN q = fq THEN cents ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(sum(cents) AS BIGINT) AS vitality_ppm
        |FROM li JOIN firstq USING (l_partkey)
        |GROUP BY q ORDER BY q""".stripMargin,

    "q_price_elasticity" ->
      """WITH per AS (
        |  SELECT
        |    CAST(floor(ln(CAST(cents // qty AS DOUBLE)) * 1000000 + 0.5)
        |      AS BIGINT) AS lp,
        |    CAST(floor(ln(CAST(qty AS DOUBLE)) * 1000000 + 0.5)
        |      AS BIGINT) AS lq
        |  FROM (
        |    SELECT l_partkey,
        |      CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |        AS BIGINT) AS cents,
        |      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |    FROM lineitem GROUP BY 1) t),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(lp) AS BIGINT) AS sp, CAST(sum(lq) AS BIGINT) AS sq,
        |    CAST(sum((lp // 1000) * (lq // 1000)) AS BIGINT) AS spq_milli2,
        |    CAST(sum((lp // 1000) * (lp // 1000)) AS BIGINT) AS spp_milli2
        |  FROM per)
        |SELECT n,
        |  (CAST(n AS DOUBLE) * CAST(spq_milli2 AS DOUBLE)
        |    - (CAST(sp AS DOUBLE) / 1000.0) * (CAST(sq AS DOUBLE) / 1000.0))
        |  / (CAST(n AS DOUBLE) * CAST(spp_milli2 AS DOUBLE)
        |    - (CAST(sp AS DOUBLE) / 1000.0) * (CAST(sp AS DOUBLE) / 1000.0))
        |  AS elasticity
        |FROM m""".stripMargin,

    "q_borda" ->
      """WITH m AS (
        |  SELECT p_brand,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS rev,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ords
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM m),
        |r AS (
        |  SELECT p_brand,
        |    CAST(row_number() OVER (ORDER BY rev DESC, p_brand) AS BIGINT)
        |      AS r1,
        |    CAST(row_number() OVER (ORDER BY qty DESC, p_brand) AS BIGINT)
        |      AS r2,
        |    CAST(row_number() OVER (ORDER BY ords DESC, p_brand) AS BIGINT)
        |      AS r3
        |  FROM m)
        |SELECT p_brand,
        |  (nb - r1) + (nb - r2) + (nb - r3) AS borda_points, r1, r2, r3
        |FROM r CROSS JOIN nb
        |ORDER BY borda_points DESC, p_brand LIMIT 10""".stripMargin,

    "q_char_entropy" ->
      """WITH chars AS (
        |  SELECT source, ch, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT source, unnest(string_split(text, '')) AS ch
        |    FROM documents) t
        |  WHERE length(ch) = 1 GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        |  FROM chars GROUP BY 1),
        |terms AS (
        |  SELECT chars.source AS source, n,
        |    CAST(floor((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |        / 0.6931471805599453)
        |      * (-1000000.0) + 0.5) AS BIGINT) AS term_ubits
        |  FROM chars JOIN tot ON chars.source = tot.source)
        |SELECT source, max(n) AS n_chars,
        |  CAST(sum(term_ubits) AS BIGINT) AS entropy_ubits
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,

    "q_knapsack" ->
      """WITH est AS (
        |  SELECT doc_id,
        |    greatest(CAST(len(tk) AS BIGINT),
        |      CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4))
        |        AS BIGINT)) AS est_tokens,
        |    40 * CAST(len(tk) AS BIGINT)
        |      - 10 * CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
        |        AS BIGINT)
        |      - 2 * abs(n_chars - 500) - 1500 AS q_milli
        |  FROM (SELECT doc_id, text, n_chars, string_split(text, ' ') AS tk
        |        FROM documents) t),
        |scored AS (
        |  SELECT doc_id, est_tokens, q_milli,
        |    q_milli * 1000 // est_tokens AS density
        |  FROM est WHERE q_milli > 0),
        |run AS (
        |  SELECT est_tokens, q_milli,
        |    CAST(sum(est_tokens) OVER (
        |      ORDER BY (68719476736 - density) * 67108864 + doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS run_sum
        |  FROM scored),
        |budget AS (SELECT CAST(sum(est_tokens) AS BIGINT) // 4 AS budget
        |  FROM scored),
        |qual AS (SELECT CAST(sum(q_milli) AS BIGINT) AS total_q,
        |  CAST(count(*) AS BIGINT) AS n_candidates FROM scored)
        |SELECT n_candidates, CAST(count(*) AS BIGINT) AS n_selected,
        |  budget, CAST(sum(est_tokens) AS BIGINT) AS tokens_used,
        |  CAST(sum(q_milli) AS BIGINT) AS quality_sum,
        |  CAST(sum(q_milli) AS BIGINT) * 1000000 // total_q
        |    AS quality_share_ppm
        |FROM run CROSS JOIN budget CROSS JOIN qual
        |WHERE run_sum <= budget
        |GROUP BY n_candidates, budget, total_q""".stripMargin,
  )
}
