package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The generalized analytics operator surface (SURVEY.md §2.5): the
  * reference is single-stream, but the engine exposes Spark's full
  * join/window/rollup/set-op capability over the star schema so a user
  * of the reference can grow into arbitrary OLAP queries.
  *
  * Scale discipline baked in here:
  *  - dimension joins take `broadcast()` hints (nation/region are
  *    constant-size; customer/supplier fall under AQE's auto-broadcast
  *    threshold at bench scale and shuffle-join cleanly beyond it);
  *  - aggregations are partial-agg friendly (plain groupBy over
  *    codegen'd expressions — map-side combine happens automatically);
  *  - fixed-point cents (`floor(x*100 + 0.5)` as bigint) keep monetary
  *    reductions exact and order-independent, which is what makes
  *    results reproducible across partitionings (and engines).
  */
object Analytics {

  /** Integer fixed-point of a price-like double (exact cents). */
  def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  /** Fixed-point at scale 10^d. */
  def fp(c: Column, scale: Long): Column = floor(c * scale + 0.5).cast("long")

  /** TPC-H Q1-shaped pricing summary over lineitem: grouped sums /
    * averages with disc/tax arithmetic, all in fixed point. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        cents(col("l_quantity")).as("qty_c"),
        cents(col("l_extendedprice")).as("price_c"),
        fp(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L).as("disc_c"),
        fp(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 1000000L).as("charge_c"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("count_order"),
        sum(col("qty_c")).as("sq"), sum(col("price_c")).as("sp"),
        sum(col("disc_c")).as("sd"), sum(col("charge_c")).as("sc"))
      .select(
        col("l_returnflag"), col("l_linestatus"), col("count_order"),
        (col("sq") / 100.0).as("sum_qty"),
        (col("sp") / 100.0).as("sum_base_price"),
        (col("sd") / 10000.0).as("sum_disc_price"),
        (col("sc") / 1000000.0).as("sum_charge"),
        ((col("sq") / 100.0) / col("count_order")).as("avg_qty"),
        ((col("sp") / 100.0) / col("count_order")).as("avg_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Star-schema revenue rollup: fact ⋈ broadcast dims. */
  def revenueByNation(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .select(col("o_custkey"), cents(col("o_totalprice")).as("price_c"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"), (sum(col("price_c")) / 100.0).as("revenue"))
      .orderBy(col("n_name"))

  /** Top-k with a total tiebreak so output order is unique. */
  def topK(df: DataFrame, sortDesc: Column, tiebreak: Column, k: Int): DataFrame =
    df.orderBy(sortDesc.desc, tiebreak.asc).limit(k)

  /** Top-n rows per group via row_number (deterministic tiebreak). */
  def topPerGroup(df: DataFrame, part: Column, sortDesc: Column, tiebreak: Column, n: Int): DataFrame =
    df.withColumn("rn",
        row_number().over(Window.partitionBy(part).orderBy(sortDesc.desc, tiebreak.asc)))
      .filter(col("rn") <= n)

  /** Tumbling event-time window by epoch bucketing — the batch analog of
    * `window($"ts", "10 minutes")`, phrased as pure integer epoch math
    * over a nanosecond-epoch column so bucket boundaries are exact
    * (no float seconds, no timestamp-precision truncation). */
  def tumblingNanos(events: DataFrame, tsNanosCol: String, seconds: Int): DataFrame =
    events.withColumn("bucket_start",
      expr(s"($tsNanosCol div 1000000000) div $seconds * $seconds"))

  /** Skew-resistant equi-join: spread each left row across `salts`
    * sub-keys and replicate the (smaller) right side per salt, so a hot
    * join key fans out over `salts` tasks instead of one straggler.
    * Result is identical to the plain join (equivalence-tested); use
    * when AQE's skew handling isn't available or the skew is known
    * up front. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(saltedRight, keys :+ "_salt").drop("_salt")
  }

  /** Slowly-changing-dimension type-2 compaction: collapse an ordered
    * change stream into attribute versions with [valid_from, valid_to]
    * effectivity ranges. The dimension's grain is the DAY, so multiple
    * changes on one day first collapse to that day's LAST value (the
    * standard end-of-day snapshot rule) — without this, a twice-changed
    * day would emit a version with valid_to = valid_from - 1, an
    * inverted range no as-of join could ever match. Then: (1) keep only
    * rows where the attribute differs from its predecessor
    * (gaps-and-islands compression via `lag`), (2) close each surviving
    * version with the next version's start (`lead`). `valid_to_raw` is
    * null on the open (current) version. All three window passes share
    * one partitioning — a single Exchange on the entity key.
    * Deterministic: (day, tiebreak) must be unique within an entity.
    * Invariant (tested): valid_from <= valid_to on every closed row. */
  def scd2(df: DataFrame, entity: String, day: String, tiebreak: String,
      attr: String): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(day), col(tiebreak))
    // last-of-day via lead over the SAME entity window (not a second
    // window keyed on (entity, day), which would cost another Exchange)
    df.withColumn("_nxt_day", lead(col(day), 1).over(w))
      .filter(col("_nxt_day").isNull || col("_nxt_day") =!= col(day))
      .drop("_nxt_day")
      .withColumn("_prev", lag(col(attr), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attr))
      .select(
        col(entity), col(attr), col(day).as("valid_from"),
        row_number().over(w).cast("long").as("version"),
        (lead(col(day), 1).over(w) - 1).as("valid_to_raw"))
  }

  /** Point-in-time ("as-of") lookup via a running last-non-null window:
    * for every row, the most recent event-time of `markCond` rows at or
    * before it within the partition. This is the composed-builtins form
    * of an as-of join (SURVEY.md §2.5) — a single sort-window pass, no
    * join, no shuffle beyond the partition exchange. */
  def asOfLast(part: Column, order: Seq[Column], markCond: Column, value: Column): Column =
    last(when(markCond, value), ignoreNulls = true)
      .over(Window.partitionBy(part).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
}
