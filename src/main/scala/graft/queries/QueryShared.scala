package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.functions.{from_avro_ocf, to_avro_ocf}
import graft.llm.{Dedup, Multimodal, Similarity, TextOps}
import graft.model.Schemas
import graft.ops.{Analytics, Router}

/** Helpers shared across the per-domain query traits: table readers,
  * fixed-point/hash conventions, shared SQL texts and oracle CTE
  * fragments, and multi-consumer kernels.
  */
private[graft] trait QueryShared { this: SparkEntry.type =>

  /** The driver's testdata tables (TESTDATA.md). The resolved read
    * relation (file listing + footer schema) is cached per (session,
    * path): the contract surface re-reads the same handful of parquet
    * tables, and re-listing + re-inferring per query is pure per-query
    * overhead (BASELINE.md's ~0.13 s/query floor). Only the RELATION
    * object is reused — no data is persisted, every query still scans
    * parquet. Keyed weakly by the session object (identity equality),
    * so a new session can never alias another's cached plans — but a
    * cached DataFrame strongly references its own SparkSession, which
    * would keep the weak key reachable forever (the WeakHashMap
    * value→key self-reference trap), so STOPPED sessions' entries are
    * additionally evicted eagerly on every access. */
  private[graft] val relationCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  private def evictStoppedSessions(): Unit =
    relationCache.synchronized {
      val it = relationCache.keySet.iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k != null && k.sparkContext.isStopped) it.remove()
      }
    }

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame = {
    evictStoppedSessions()
    relationCache
      .computeIfAbsent(s, _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(s"$dir/$name", _ => s.read.parquet(s"$dir/$name.parquet"))
  }


  /** The shared synthetic quality model (logit in milli-units):
    * 40·words − 10·digits − 2·|n_chars−500| − 1500 over the documents
    * schema. ONE definition for the whole threshold-sweep / fairness /
    * calibration family (q_quality_model, q_gains, q_mcc, q_knapsack,
    * q_rlhf_pairs, …): with the engine side shared, any oracle copy
    * that drifts now fails its hash gate loudly instead of silently
    * evaluating a different model than its siblings. */
  private[graft] def qualityLogitMilli: org.apache.spark.sql.Column =
    lit(40L) * size(split(col("text"), " ")).cast("long") +
      lit(-10L) * length(regexp_replace(col("text"), "[^0-9]", "")).cast("long") +
      lit(-2L) * abs(col("n_chars") - 500) + lit(-1500L)

  /** Engine-portable 60-bit hash (the md5 convention every sketch and
    * sampling query shares — replayable as
    * `CAST('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15) AS BIGINT)`
    * in the DuckDB oracle). */
  private[graft] def h60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Timestamp/date column -> integer epoch days (the oracle writes
    * `CAST(CAST(x AS DATE) - DATE '1970-01-01' AS BIGINT)`). */
  private[graft] def epochDay(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    datediff(c, lit("1970-01-01").cast("date")).cast("long")

  /** The reference's order stream, mapped onto the `orders` table
    * (FIXTURES.md §4): orderId <- o_orderkey, product <- o_orderpriority,
    * price <- o_totalprice mod 1500 — reproducing the producer's
    * uniform(5.0, 1500.0) price range (producer.py:123) so all three
    * routing branches are exercised. */
  private[graft] def ordersAsStream(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey").as("order_key"),
      col("o_orderkey").cast("string").as("orderId"),
      col("o_orderpriority").as("product"),
      (col("o_totalprice") % 1500.0).as("price"),
      col("o_orderdate"))

  private[graft] def routed(s: SparkSession, dir: String): DataFrame =
    Router.route(ordersAsStream(s, dir))
      .withColumn("topic", lit(Schemas.OrdersTopic))
      .withColumn("partition", lit(0))
      .withColumn("offset", col("order_key"))

  /** Shared oracle prefix mirroring ordersAsStream + Router.route. */
  private[graft] val routedSql: String =
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

  private[graft] def highValue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey"))

  private[graft] def fStatus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))

  /** The `events` table normalized so `ts` is ALWAYS a bigint
    * nanos-epoch column — the exact integer representation all
    * event-time arithmetic here runs on (no float drift, no timezone
    * ambiguity). Handles both physical encodings the dataset has
    * shipped with: TIMESTAMP(NANOS) (surfaced via `nanosAsLong`) and
    * TIMESTAMP(MICROS) (read natively as a timestamp and widened —
    * `unix_micros * 1000` is exact). The DuckDB oracle mirrors this
    * with `epoch_ns(ts)`. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ =>
        // TIMESTAMP_NTZ -> instant under the UTC session timezone
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
  }

  private[graft] val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Deterministic per-dataset scratch dir under target/ for the
    * format-roundtrip queries — inside the repo, overwritten
    * idempotently on every run; the sha1 prefix keeps distinct source
    * dirs from colliding (same contract as ops/Bucketing).
    *
    * Round-14 (advice fix): the hash folds in a cheap SOURCE
    * FINGERPRINT (per-parquet mtime + length under `dir`) next to the
    * path, so regenerating the test data in place changes the scratch
    * dir and every `_SUCCESS`-guarded derived layout (q_dpp,
    * q_partition_prune, q_merge_schema, …) rebuilds instead of serving
    * stale derived output. Listing a dozen files is driver-side
    * metadata work, done once per query construction. */
  private[graft] def fmtDir(dir: String, name: String): String = {
    val src = new java.io.File(dir)
    val fp = Option(src.listFiles())
      .map(_.filter(f => f.getName.endsWith(".parquet") && f.isFile)
        .sortBy(_.getName)
        .map(f => s"${f.getName}:${f.lastModified}:${f.length}")
        .mkString("|"))
      .getOrElse("")
    val digest = java.security.MessageDigest.getInstance("SHA-1")
      .digest(s"$dir#$fp".getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
    s"target/fmt_roundtrip/$digest/$name"
  }

  /** ANSI-SQL interoperability: ONE SQL string (CTE + join + window +
    * fixed-point aggregate) executed verbatim by BOTH engines — Spark
    * via `spark.sql` over `registerTables` and DuckDB as its own
    * oracle. Proves the spark.sql surface end-to-end inside the
    * correctness gate, not just the DataFrame DSL. NB: in Spark SQL
    * TEXT a literal like `100.0` parses as DECIMAL(4,1) (the DSL's
    * `lit(100.0)` is a double), and bigint/decimal division yields
    * DECIMAL — hence the explicit CAST AS DOUBLE on the divisor. */
  private[graft] val sqlSurfaceText: String =
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

  /** Correlated EXISTS subquery (TPC-H Q4 shape) as ONE SQL text run
    * verbatim by both engines — exercises Catalyst's subquery
    * decorrelation (EXISTS → left-semi join). */
  private[graft] val existsSubqueryText: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Correlated scalar subquery (TPC-H Q17 shape): per-part average
    * quantity threshold. Catalyst decorrelates the scalar subquery into
    * an aggregate + join. `l_quantity` is integer-valued (1..50), so
    * `avg` reduces exactly in both engines; money stays in cents. */
  private[graft] val scalarSubqueryText: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_small,
      |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |    / CAST(700.0 AS DOUBLE) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#4'
      |  AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * avg(l2.l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** Recursive CTE (Spark 4 WITH RECURSIVE) as ONE shared SQL text: an
    * 80-month spine generated by recursion, left-joined to the order
    * stream so empty months survive with zero counts. The spine depth
    * is calendar-bound (1995–2001), not data-bound, so the text is
    * SF-independent and stays under Spark's recursion level limit. */
  private[graft] val recursiveCteText: String =
    """WITH RECURSIVE months(m) AS (
      |  SELECT 0 UNION ALL SELECT m + 1 FROM months WHERE m < 79)
      |SELECT m, count(o_orderkey) AS n_orders,
      |  coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 0)
      |    / CAST(100.0 AS DOUBLE) AS revenue
      |FROM months LEFT JOIN orders
      |  ON (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 = m
      |GROUP BY m ORDER BY m""".stripMargin

  /** Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 customers
    * per nation) as ONE shared SQL text — the SQL-standard spelling of
    * top-n-per-group, planned by Catalyst as a lateral join. Raw
    * acctbal doubles are emitted unreduced (no arithmetic), so parity
    * is byte-level parquet fidelity. */
  private[graft] val lateralTopkText: String =
    """SELECT n_name, c.c_name, c.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  /** NOT IN anti-subquery (TPC-H Q16 shape) as ONE shared SQL text:
    * supplier diversity per (brand, size) excluding flagged suppliers.
    * NOT IN's three-valued null semantics plan as a null-aware anti
    * join in Catalyst; the subquery column is non-nullable here, so
    * both engines agree (a nullable column would make NOT IN vacuous —
    * the classic SQL trap, deliberately avoided and documented). */
  private[graft] val nestedNotInText: String =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#4' AND p_size IN (1, 5, 9, 13)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  /** Doubly-correlated EXISTS + NOT EXISTS (TPC-H Q21 shape) as ONE
    * shared SQL text: suppliers who shipped late on multi-supplier
    * orders where every OTHER supplier shipped on time. The NOT EXISTS
    * correlates on both the sibling lineitem AND the outer order's
    * date — the hardest decorrelation shape in the contract (Catalyst
    * rewrites both into join form). Interval arithmetic
    * (`+ INTERVAL 60 DAY`) parses identically in both engines. */
  private[graft] val lateSuppliersText: String =
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

  /** Q7 volume-shipping shape: bilateral revenue between two nations by
    * ship year. The nation filter lands on both broadcast dimension
    * joins; the fact-side sum is exact cents. */
  private[graft] val volumeShippingText: String =
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

  /** Q9 product-profit shape: per (nation, year) profit on parts whose
    * name matches a pattern. The schema has no partsupp, so unit cost is
    * a documented proxy: 80% of p_retailprice, in exact cents
    * (`floor(p_retailprice * 80 + 0.5)`). All arithmetic is int64 until
    * the final division. */
  private[graft] val productProfitText: String =
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

  /** Q13 customer-distribution shape: LEFT OUTER join with an extra
    * join-side predicate (which must NOT become a WHERE filter — the
    * customers with zero matching orders survive with count 0), then a
    * histogram of the per-customer counts. Two chained aggregations,
    * both on shuffle keys with full map-side partials. */
  private[graft] val custDistText: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q14 promo-revenue shape: one conditional aggregation over a
    * one-month scan window; the percentage is a single division of two
    * exact cent sums (normalized to BIGINT first — DuckDB's sum(BIGINT)
    * widens to INT128, Spark's stays int64; the CAST makes both engines
    * divide the same 64-bit values). */
  private[graft] val promoShareText: String =
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

  /** Q15 top-supplier shape: a revenue CTE referenced twice — once as
    * the join input and once inside an uncorrelated scalar MAX subquery
    * (the SQL-standard argmax-by-view). Ties all surface (no LIMIT 1),
    * ordered by the unique supplier key. */
  private[graft] val topSupplierText: String =
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

  /** Q18 large-volume-order shape: grouped-HAVING IN subquery over the
    * fact table (Catalyst plans it as a semi join on the aggregated
    * keys), then the 3-way join re-aggregates the surviving orders.
    * Quantities are integral in the data — CAST to BIGINT keeps every
    * sum exact; the date is emitted as a yyyymmdd integer (timestamp
    * rendering differs between engines, integer math does not). */
  private[graft] val bigOrdersText: String =
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

  /** Q6 forecasting-revenue-change shape: the pure scan-filter-agg
    * query — every predicate pushes to the parquet scan, zero joins,
    * one partial+final aggregate. The discount BETWEEN runs on the
    * stored doubles directly (same IEEE comparison in both engines);
    * the money sum is exact cents. */
  private[graft] val forecastRevenueText: String =
    """SELECT
      |  CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
      |    AS BIGINT)) AS BIGINT) / CAST(100.0 AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1997-01-01'
      |  AND l_shipdate < DATE '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Q22 global-sales-opportunity shape: customers above the positive
    * average balance with no urgent orders (scalar-average subquery +
    * predicated anti join), grouped by segment (the schema's stand-in
    * for the phone country code; in this dense data every customer has
    * SOME order, so the anti join carries Q22's extra predicate). The
    * above-average predicate is the exact integer cross-multiply
    * `bal_c * n > total_c` — no double ever enters a comparison. */
  private[graft] val idleCustomersText: String =
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

  /** Window distribution functions (ntile / percent_rank / cume_dist)
    * plus explicit-arithmetic bucketing, as ONE shared SQL text with a
    * named WINDOW clause. The ORDER BY inside the window ends with the
    * unique c_custkey, so no two rows are peers and both engines'
    * rank-based doubles are the same single IEEE division. (DuckDB has
    * no width_bucket, so the bucket is spelled as floor arithmetic —
    * identical doubles either way.) */
  private[graft] val ntileDistText: String =
    """SELECT c_custkey, c_mktsegment,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cdist,
      |  1 + CAST(floor((c_acctbal - (-1000.0)) * 22 / 11000.0) AS BIGINT)
      |    AS balance_bucket
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** GROUP BY ALL partials re-aggregated under ROLLUP with grouping()
    * flags, as ONE shared SQL text — the re-aggregation shape (fine
    * partials once, coarse levels from partials, never a second raw
    * scan) plus the modern GROUP BY ALL surface. The rollup's NULL
    * group labels order NULLS FIRST explicitly: Spark and DuckDB
    * default to opposite null placements, and the hash compare is
    * order-sensitive. */
  private[graft] val rollupGroupingText: String =
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

  /** Aggregate FILTER clauses + boolean aggregates as ONE shared SQL
    * text — the ANSI spelling of conditional aggregation (one scan, no
    * self-joins), all within map-side partial aggregation. Sums run in
    * integer cents; a filter that matches nothing yields NULL, hence
    * the coalesce. */
  private[graft] val aggFiltersText: String =
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
      |  coalesce(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      FILTER (WHERE l_linestatus = 'F'), 0) / CAST(100.0 AS DOUBLE)
      |    AS finished_revenue,
      |  bool_and(l_quantity > 0) AS all_positive_qty,
      |  bool_or(l_tax > 0.07) AS any_high_tax
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Per-group nearest-rank percentile CENTS for each p in `ps`, by
    * rank selection on the two-pass grouped rank — the shared core of
    * q_percentile_exact and q_outliers_iqr, so the nearest-rank
    * formula ((n·p + 99) div 100) is defined once. Returns one row per
    * o_orderpriority with grp_n and a p<P>_c long column per p. */
  private[graft] def orderPricePercentiles(s: SparkSession, dir: String,
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

  /** The deterministic two-version simulation of the orders table
    * shared by the CDC queries — version A drops keys ≡0 mod 10,
    * version B drops keys ≡1 mod 10 and reprices keys ≡0 mod 7.
    * Defined ONCE so q_snapshot_diff's diff and q_ivm's delta can
    * never drift apart (their oracles spell the same simulation).
    * Both versions carry (k, prio, c). */
  private[graft] def orderVersions(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
        Analytics.cents(col("o_totalprice")).as("c"))
    (base.filter(col("k") % 10 =!= 0),
      base.filter(col("k") % 10 =!= 1)
        .withColumn("c",
          col("c") + when(col("k") % 7 === 0, 500L).otherwise(0L)))
  }

  private[graft] val Bm25Terms = Seq("spark", "merge", "window")

  /** DuckDB rendering of Similarity.dotFp (1e-9 fixed point); `dims`
    * defaults to the corpus width, 64 — pass less for prefix
    * (matryoshka-truncated) dots. */
  private[graft] def duckDot(a: String, b: String, dims: Int = 64): String =
    s"list_sum(list_transform(generate_series(1,$dims), i -> " +
      s"CAST(floor(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)))"

  private[graft] def duckCos(dab: String, daa: String, dbb: String): String =
    s"($dab / 1000000000.0) / (sqrt($daa / 1000000000.0) * sqrt($dbb / 1000000000.0))"

  /** Shared a-priori core for q_itemsets / q_assoc_rules: per-basket
    * sorted distinct brand sets built with ONE wide shuffle (partial
    * collect_set dedups map-side), then pairs generated INLINE by two
    * stacked codegen'd explodes over each bounded set (≤ 25 brands →
    * ≤ 300 pairs per basket) instead of the basket self-join — this
    * trades the join formulation's two full-size shuffles for zero
    * (pair supports then map-side-combine onto ≤ 625 keys). The
    * posexplode+slice form, NOT a nested transform lambda: higher-order
    * functions evaluate interpreted and measure 4× slower than the
    * generator pipeline at 5M rows (ScaleSpec pins the shape's
    * equivalence and the probe records both timings).
    *
    * Round-13 re-shape (BENCH_r12 hard-budget breach, 2.69 s): the
    * item-support table and the basket total now come back as DRIVER
    * values from ONE job over the checkpointed sets — posexplode marks
    * pos=0 exactly once per basket, so summing the pos=0 indicator
    * across the item groups recovers n_baskets with no separate count
    * job. The old all-DataFrame shape rebuilt the itemSupp/tot chains
    * once per broadcast-build (3-5 jobs per caller: tot rode in THREE
    * broadcasts, freq in two — each a full re-aggregation of the
    * checkpoint). The collect is bounded by the ITEM DOMAIN (p_brand:
    * 25 values at every SF — a dimension, not data; require-fenced at
    * 1024), the same bounded-driver-state class as the set-cover
    * masks; an unbounded item domain needs the all-DataFrame shape
    * back. Returns (n_baskets, per-item supports, per-pair supports
    * DataFrame); callers apply their own minsup thresholds driver-side
    * and join pairs against the tiny frequent list as a LOCAL relation
    * (broadcast with no build job), reproducing the a-priori prune
    * exactly (a pair surviving the pair threshold with a non-frequent
    * member is dropped by the join, same as never generating it). */
  private[graft] def basketCore(s: SparkSession, dir: String)
      : (Long, Seq[(String, Long)], DataFrame) = {
    val sets = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      .groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .localCheckpoint(eager = false)
    val itemRows = sets
      .select(posexplode(col("items")).as(Seq("pos", "item")))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("supp"),
        sum(when(col("pos") === 0, 1L).otherwise(0L)).as("firsts"))
      .collect()
    require(itemRows.length <= 1024,
      "basketCore collects the per-item support table: valid only while " +
        "the item domain stays bounded (p_brand = 25 at every SF); an " +
        "unbounded item domain needs the all-DataFrame shape")
    val nBaskets = itemRows.map(_.getLong(2)).sum
    val items = itemRows.map(r => (r.getString(0), r.getLong(1))).toSeq
    val pairSupp = sets
      .select(col("items"), posexplode(col("items")).as(Seq("i", "i1")))
      .select(col("i1"),
        explode(expr("slice(items, i + 2, size(items))")).as("i2"))
      .groupBy(col("i1"), col("i2")).agg(count(lit(1)).as("supp_pair"))
    (nBaskets, items, pairSupp)
  }

  /** Shared oracle CTE chain replaying one Lloyd round (seed = lowest-8
    * ids, fixed-point floor-mean update) ending at `a2` (the final
    * assignment) and `c1` (the learned centroids) — consumed by
    * q_kmeans and q_semantic_dedup. */
  private[graft] lazy val kmeansAssignCtes: String =
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
  private[graft] lazy val dupClustersCtes: String =
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

  private[graft] lazy val dupClustersOracle: String =
    s"""WITH RECURSIVE $dupClustersCtes
       |SELECT node AS doc_id, min(label) AS cluster,
       |       min(label) = node AS is_representative
       |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  /** DuckDB replay of TextOps.cdcChunks (mask 16): boundary tokens by
    * the shared h60 convention, running boundary count per doc, chunk
    * text reassembled in position order and md5'd. Ends at `chunks`
    * (doc_id, chunk_id, n_toks, chunk_hash). */
  private[graft] lazy val duckCdcChunks: String =
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
  private[graft] val duckShingles: String =
    """sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(tk) - 4),
      |    i -> array_to_string(tk[i:i+4], ' ')))) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) toks)""".stripMargin

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

  /** Shared fp3 power-iteration kernel (q_power_iteration,
    * q_pca_var_share): the embedding matrix exploded to (i, j, xf)
    * with xf = round(x·1000), and the 2-round uncentered power
    * direction v ← Xᵀ(Xv) with ~3-digit truncating rescale between
    * rounds. Each round broadcasts the 64-long model vector as a
    * literal array and runs one (i)-keyed dot aggregate plus one
    * (j)-keyed update aggregate — the corpus never shuffles; only the
    * 64-element direction crosses to the driver (bounded model state,
    * not data). Returns (exploded matrix, direction). */
  private[graft] def fp3PowerIteration(s: SparkSession, dir: String): (DataFrame, Array[Long]) = {
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
    (x, iterate(iterate(Array.fill(64)(1L))))
  }

  /** Pivots per-group (n, sv, ss) moment rows into ONE row of
    * n1..nk, s1..sk, ss1..ssk columns in the given group order. */
  private[graft] def pivotMoments(g: DataFrame, groups: Seq[String]): DataFrame = {
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
  private[graft] def anovaFromPivot(piv: DataFrame): DataFrame = {
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

  /** All word-trigram occurrences (doc_id, g) — the TYPE space for the
    * vocabulary-statistics queries. The synthetic corpus draws from a
    * ~31-word list, so unigram types saturate instantly; trigram types
    * (~16 k at sf0.01) give the realistic open-vocabulary shape. */
  private[graft] def trigrams(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 2), " +
          "i -> array_join(slice(tk, i, 3), ' '))")).as("g"))

  /** Per-bin sigmoid confidence literals for the quality classifier's
    * 21 logit bins (bin center ≈ 2·bin logits): sigmoids are computed
    * ONCE at build time and embedded as identical integer-ppm literals
    * in both engines — no runtime transcendental ever crosses the
    * engine boundary. */
  private[graft] lazy val confCaseSql: String =
    (-10 to 10).map { b =>
      s"WHEN $b THEN ${math.round(1e6 / (1.0 + math.exp(-2.0 * b)))}"
    }.mkString("CASE bin ", " ", " ELSE 0 END")

  private[graft] def epochDayLit(d: String): org.apache.spark.sql.Column =
    datediff(lit(d).cast("date"), lit("1970-01-01").cast("date")).cast("long")

  /** Distinct (source, trigram) type pairs — q_novelty's base,
    * shared with the set-cover picker. */
  private[graft] def trigrams2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(tk) - 2), " +
          "i -> array_join(slice(tk, i, 3), ' '))")).as("g"))
      .distinct()

  /** Euclidean distance in integer micro from the fixed-point L2
    * kernel (per-pair rounding before any sum — the determinism
    * contract for distance-based statistics). */
  private[graft] def expr2Micro(l2fp: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(sqrt(l2fp.cast("double") / 1e9) * 1e6 + 0.5).cast("long")

}
