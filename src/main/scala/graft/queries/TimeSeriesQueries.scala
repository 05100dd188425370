package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.functions.{from_avro_ocf, to_avro_ocf}
import graft.llm.{Dedup, Multimodal, Similarity, TextOps}
import graft.model.Schemas
import graft.ops.{Analytics, Router}

/** Time-series and lifecycle analytics: trend/seasonality, smoothing, survival/retention/churn, event-time sessionization.
  *
  * Split from the SparkEntry monolith; every member is `private[graft]`
  * and the driver surface stays `SparkEntry.queries` / `oracleSql`
  * (assembled from the per-domain map fragments below).
  */
private[graft] trait TimeSeriesQueries { this: SparkEntry.type =>

  /** Time-series densification (gap filling): every 10-minute bucket in
    * each user's [first, last] activity span gets a row, absent buckets
    * filled with zero — the resample step feeding any windowed model.
    * The dense axis is generated per user with `sequence` (bounded by
    * the user's own span, so generation is distributed and
    * retention-bounded), then left-joined against observed counts. */
  private[graft] def qGapFill(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qSessionize(s: SparkSession, dir: String): DataFrame = {
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

  /** RANGE-frame window (value-based, not row-based): rolling 30-day
    * spend per customer over an integer epoch-day order key. Unlike a
    * ROWS frame, RANGE bounds select peers by key distance — days with
    * no orders shrink the frame contents, and same-day orders are frame
    * peers. One Exchange on the customer key. */
  private[graft] def qRollingRange(s: SparkSession, dir: String): DataFrame = {
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

  /** Centered moving average (ROWS BETWEEN n PRECEDING AND n FOLLOWING)
    * — the two-sided window frame shape, complementing the running
    * (unbounded-preceding) and RANGE (value-based) frames already
    * covered. Daily pre-aggregation first, so the window slides over
    * one row per (priority, day), and all frame sums reduce exact
    * cents. */
  private[graft] def qMovingAvg(s: SparkSession, dir: String): DataFrame = {
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

  /** Sessionization through the BUILT-IN `session_window` function —
    * the same merge machinery Structured Streaming uses for streaming
    * session aggregation, here batch-oracle-certified. Boundary
    * semantics (verified empirically, and by the sf0.1 gate): sessions
    * merge when they overlap OR TOUCH, so an event at exactly the gap
    * distance still merges — the oracle's split rule is `gap > 1800`,
    * identical to the manual lag-gap form. (The exact-gap case first
    * appears at sf0.1; a smaller SF cannot distinguish the rules.) */
  private[graft] def qSessionWindow(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def qAcf(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qCusum(s: SparkSession, dir: String): DataFrame = {
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

  /** Monthly seasonal index of daily revenue — the decomposition-lite
    * seasonality audit: each calendar month's mean daily revenue as a
    * ppm ratio of the overall mean daily revenue (100% = 1e6). Daily
    * values quantize to thousands-of-dollars longs (the q_acf grain,
    * which keeps every product inside int64 at any SF); the index is
    * two exact integer divisions — no float crosses the engines. The
    * fact table collapses to the calendar-bounded daily table in one
    * aggregation; everything after is month-cardinality work. */
  private[graft] def qSeasonal(s: SparkSession, dir: String): DataFrame = {
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

  /** Discrete-time hazard curve of customer attrition: for each
    * tenure month k, the share of customers whose LAST order landed
    * exactly k months after their first, among those who survived to
    * k — the life-table view of churn (the q_retention counterpart on
    * the order ledger). Tenures reduce per customer map-side; the
    * at-risk denominator is a reverse cumulative sum over the BOUNDED
    * tenure-month domain; hazard is exact ppm. */
  private[graft] def qHazard(s: SparkSession, dir: String): DataFrame = {
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

  /** Cohort LTV curve: customers cohorted by first-order quarter,
    * cumulative revenue per cohort member by quarters-since-start —
    * the money view the user-count retention triangle can't give.
    * One pass cohorts (min-quarter per customer broadcast back), one
    * grouped sum per (cohort, offset), cumulative window over the
    * BOUNDED offset domain, LTV = exact cents div cohort size. */
  private[graft] def qCohortLtv(s: SparkSession, dir: String): DataFrame = {
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

  /** Day-of-week revenue index + a uniformity chi-square over the 7
    * cells (0 = Sunday on the 1995-01-01 anchor) — the weekly-
    * periodicity companion to q_seasonal's monthly index. Index and
    * chi-square are exact integer arithmetic (two-step division
    * keeps squares in int64); the 7-cell statistic sums exact longs
    * so the total is order-independent. */
  private[graft] def qWeekdayEffect(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qTimeToConvert(s: SparkSession, dir: String): DataFrame = {
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
    // round-13: rank count = the kernel's grp_n column — the extra
    // max-rank aggregate + crossJoin dropped (the q_qcd trick)
    ranked
      .filter(col("rnk") === expr("(grp_n + 1) div 2") ||
        col("rnk") === expr("(9 * grp_n + 9) div 10"))
      .agg(max(col("grp_n")).as("n_converted"),
        min(col("ord")).cast("long").as("median_s"),
        max(col("ord")).cast("long").as("p90_s"))
  }

  /** LOCF (last-observation-carried-forward) fill with staleness
    * accounting — the step-fill sibling of q_interpolate's linear fill:
    * every day in the domain carries the most recent known value plus
    * how many days old it is (the serving-freshness audit a feature
    * store runs). Same domain-bounded window discipline: the
    * unpartitioned window runs over the ~2.5k-row day spine, never the
    * fact table. */
  private[graft] def qLocf(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qRollingDistinct(s: SparkSession, dir: String): DataFrame = {
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

  /** Mann-Kendall trend test over the monthly revenue series — the
    * nonparametric "is this metric actually trending" statistic:
    * S = Σ_{i<j} sign(v_j − v_i) over all month pairs, with Kendall's
    * tau in exact ppm. The pair join runs over the MONTH DOMAIN (~80
    * rows → ~3k pairs regardless of data volume); the data-sized work
    * is one monthly aggregation. Everything is integer sign arithmetic
    * — no distributional assumption, no doubles until never. */
  private[graft] def qTrendTest(s: SparkSession, dir: String): DataFrame = {
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

  /** Time-weighted average (TWAP-style) of each user's event values:
    * every observation is weighted by how long it remained current
    * (the gap to the user's next event — a lead over the unique
    * per-user (ts, event_id) order), so irregular sampling cannot bias
    * the mean toward burst periods. Weights are exact nanosecond
    * longs; values quantize at 1e3; the ONLY double op is the final
    * weighted division. Last events (no successor) carry no weight —
    * the standard half-open-interval convention. */
  private[graft] def qTwap(s: SparkSession, dir: String): DataFrame = {
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

  /** Integer-exact exponential decay (EMA) of daily revenue: weight
    * 2^-age per day of age over a 20-day horizon. The textbook EMA
    * recurrence is inherently serial; the bounded-horizon form is
    * associative and distributes as a cover-day explode — each day
    * contributes to exactly 20 target days with a left-shift weight, so
    * the whole series needs ONE shuffle on the day key and no
    * sequential scan (the same calendar-bounded-explode idiom as
    * q_rolling_distinct). The final scaled-sum / 2^19 division only
    * moves the double's exponent, so results are bit-identical. */
  private[graft] def qEma(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qHolt(s: SparkSession, dir: String): DataFrame = {
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

  /** STL-lite additive decomposition of the daily revenue series:
    * trend = 7-day centered moving average, seasonal = per-weekday
    * mean of the detrended values, residual = remainder — all in
    * integer cents with truncating division, so the decomposition is
    * exact and engine-portable. The ordered windows run over the
    * day-level AGGREGATE (calendar-bounded, like Holt/EMA); the
    * seasonal profile is a 7-row broadcast. */
  private[graft] def qStlLite(s: SparkSession, dir: String): DataFrame = {
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

  /** 7-day rolling MEDIAN of daily revenue — the robust smoother the
    * rolling mean family can't express. The frame's values are
    * collected and sorted per window (frame width is a constant 7, so
    * the per-row work is O(1)); the median is emitted ×2 (sum of the
    * two middle elements) to stay in exact integer cents for even
    * frames. Day-series window: calendar-bounded like Holt/STL. */
  private[graft] def qRollingMedian(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qLatenessAudit(s: SparkSession, dir: String): DataFrame =
    latenessBuckets(events(s, dir))

  /** Watermark-horizon sweep — the "choose your watermark" planning
    * number: with arrival order = event_id per user (the stream's
    * delivery contract) and lateness = prior running-max event time
    * minus own event time, each candidate horizon (1 / 10 / 60 min)
    * reports how many events a `withWatermark` of that delay would
    * DROP, as an exact ppm of the at-risk stream. The complement of
    * q_lateness_audit's histogram: that measures how late events are,
    * this prices the latency-vs-completeness knob directly. One
    * user-partitioned running-max window + ONE aggregate; the sweep
    * columns unpivot from the same single row. */
  private[graft] def qWatermarkSweep(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = events(s, dir).select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prior_max", max(col("ts")).over(w))
      .filter(col("prior_max").isNotNull)
      .select(greatest(lit(0L), col("prior_max") - col("ts")).as("late_ns"))
    val agg = late.agg(count(lit(1)).as("n_events"),
      sum(when(col("late_ns") > 60000000000L, 1L).otherwise(0L)).as("d1"),
      sum(when(col("late_ns") > 600000000000L, 1L).otherwise(0L)).as("d10"),
      sum(when(col("late_ns") > 3600000000000L, 1L).otherwise(0L)).as("d60"))
    Seq((1L, "d1"), (10L, "d10"), (60L, "d60")).map { case (h, c) =>
      agg.select(lit(h).as("horizon_min"), col("n_events"),
        col(c).as("n_dropped"),
        expr(s"$c * 1000000 div n_events").as("drop_ppm"))
    }.reduce(_ unionAll _).orderBy(col("horizon_min"))
  }

  /** Mann-Kendall trend test per order priority on the MONTHLY order-
    * count series — the nonparametric "is demand trending" screen that
    * needs no distributional assumption (rank-based companion to
    * q_theil_sen's slope, as q_mann_whitney is to q_welch_t).
    * S = Σ_{i<j} sign(c_j − c_i) over month pairs; var(S)·18 stays an
    * EXACT integer including the tie correction Σt(t−1)(2t+5), and
    * only the final z = (S∓1)/√(var18/18) is a fixed 3-op double tree.
    * The unbounded scan reduces to ≤ 5 priorities × ~84 calendar
    * months before the per-priority pair join (~3.5k pairs/group,
    * calendar-bounded at ANY corpus scale — the q_holt argument). */
  private[graft] def qMannKendall(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        ((year(col("o_orderdate")) - 1970) * 12 + month(col("o_orderdate"))
          - 1).cast("long").as("m"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val sStat = monthly.select(col("prio"), col("m").as("m1"), col("c").as("c1"))
      .join(monthly.select(col("prio"), col("m").as("m2"), col("c").as("c2")),
        Seq("prio"))
      .filter(col("m1") < col("m2"))
      .groupBy(col("prio"))
      .agg(sum(when(col("c2") > col("c1"), 1L)
        .when(col("c2") < col("c1"), -1L).otherwise(0L)).as("s_stat"))
    val nMonths = monthly.groupBy(col("prio")).agg(count(lit(1)).as("n_months"))
    val ties = monthly.groupBy(col("prio"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("prio"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
        .as("tie_term"))
    nMonths.join(sStat, "prio").join(ties, "prio")
      .withColumn("var18",
        col("n_months") * (col("n_months") - 1) *
          (lit(2L) * col("n_months") + 5) - col("tie_term"))
      .select(col("prio"), col("n_months"), col("s_stat"), col("var18"),
        (when(col("s_stat") > 0, col("s_stat") - 1)
          .when(col("s_stat") < 0, col("s_stat") + 1).otherwise(0L)
          .cast("double") /
          sqrt(col("var18").cast("double") / lit(18.0))).as("z_mk"))
      .orderBy(col("prio"))
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
  private[graft] def qSurvival(s: SparkSession, dir: String): DataFrame = {
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

  /** Folded-variance periodicity detection over daily event counts:
    * for each candidate period p = 2..10 days, fold days by d mod p
    * and score the fold by its between-group sum of squares — a high
    * score means the daily series repeats at period p. The statistic
    * is Σ_r (S_r² div n_r) − S² div N with the divisions as explicit
    * truncating integer division — order-independent integer sums,
    * deterministic in any engine, no transcendental spectral machinery.
    * Everything windows over the bounded (period × fold) domain; the
    * event scan reduces to one row per day first. */
  private[graft] def qPeriodDetect(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qMase(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qSessionEntropy(s: SparkSession, dir: String): DataFrame = {
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

  /** 7-day rolling correlation between daily click and purchase
    * volumes: the co-movement monitor ("did purchases decouple from
    * clicks this week?"). The event stream collapses to one row per
    * day first; every windowed sum is an exact integer over the
    * gap-safe RANGE frame on the bounded day DOMAIN (calendar-sized,
    * never data-sized), and each day's r is a fixed IEEE tree over
    * those six exact sums. */
  private[graft] def qRollingCorr(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qBurstDetect(s: SparkSession, dir: String): DataFrame = {
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

  /** Weekday-seasonality strength: the share of daily-revenue
    * variance explained by day-of-week, SSB·1e6 div SST with the
    * between-group term in the same explicit truncating-integer-
    * division discipline as q_period_detect — the effect-size number
    * that tells a forecaster whether q_weekday_effect's indices are
    * worth modeling (near 0 ⇒ weekday is noise). */
  private[graft] def qWeekdayStrength(s: SparkSession, dir: String): DataFrame = {
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

  /** SAX (Symbolic Aggregate approXimation) of the daily revenue
    * series: 8-day PAA segments z-normalized against the whole series
    * and mapped to a 4-symbol alphabet at the Gaussian breakpoints
    * ±0.6745 — the classic time-series indexing transform (Lin/Keogh).
    * Segment means stay exact integers ×8 (no division), the z
    * comparison is an integer cross-multiply against σ once σ is a
    * single sqrt, and the breakpoints are micro literals — so the
    * symbol assignment is decided by exact integer comparisons. */
  private[graft] def qSax(s: SparkSession, dir: String): DataFrame = {
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

  /** Top user-journey paths: every 3-step event-type sequence per
    * user (two lags over one scalable user-keyed window), counted
    * corpus-wide — the product-analytics "what do people actually do"
    * table. 5³ = 125 possible paths bound the output; the top-15 ride
    * TakeOrdered. */
  private[graft] def qSessionPath(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qChurnLabel(s: SparkSession, dir: String): DataFrame = {
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

  /** Historical VaR / CVaR of day-over-day revenue changes: the p5
    * nearest-rank loss (VaR) and the exact mean of the tail at or
    * beyond it (CVaR) over the bounded day domain — deltas via the
    * gap-safe day self-join (q_mase's discipline), rank selection on
    * a calendar-sized window, tail mean one integer division. The
    * risk-reporting shape finance teams run on any daily P&L-like
    * series. */
  private[graft] def qVarCvar(s: SparkSession, dir: String): DataFrame = {
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

  /** Mean/median time between failures for the error-event stream —
    * the reliability number an SRE review opens with: global error
    * gaps in exact seconds (error events collapse to one ordered
    * stream; the gap window rides the error-only subset, which is
    * sparse by construction), mean exact integer division, median by
    * nearest-rank selection on the bounded gap list. */
  private[graft] def qMtbf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val errs = events(s, dir)
      .filter(col("event_type") === "error")
      .select(expr("ts div 1000000000").as("sec"), col("event_id"))
    // error events are the sparse tail of the stream: a global window
    // over them is failure-count-bounded, not event-count-bounded
    val gaps = errs
      .withColumn("gap",
        col("sec") - lag(col("sec"), 1).over(
          Window.orderBy(col("sec"), col("event_id"))))
      .filter(col("gap").isNotNull)
      .localCheckpoint(eager = false)
    val ranked = gaps
      .withColumn("rnk", row_number().over(Window.orderBy(col("gap"),
        col("event_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
    ranked.groupBy()
      .agg(max(col("n")).as("n_gaps"), sum(col("gap")).as("total_gap_s"),
        max(when(col("rnk") * 2 === col("n") + (col("n") % 2), col("gap")))
          .as("median_gap_s"))
      .select(col("n_gaps"),
        expr("total_gap_s div n_gaps").as("mtbf_s"),
        col("median_gap_s"))
  }

  /** Forecast combination: does averaging the daily-naive and
    * weekly-naive forecasts beat both parents? (The empirical
    * forecasting classic — combinations usually win.) All three MAEs
    * from ONE day-domain three-way join; the combined forecast is
    * the integer mean (f1+f7) div 2, errors exact integers, the
    * winner decided by exact comparison. */
  private[graft] def qForecastCombo(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
      .localCheckpoint(eager = false)
    val joined = daily.as("y")
      .join(daily.as("f1"), col("y.day") === col("f1.day") + 1)
      .join(daily.as("f7"), col("y.day") === col("f7.day") + 7)
      .select(col("y.v").as("y"), col("f1.v").as("p1"),
        col("f7.v").as("p7"))
      .withColumn("pc", expr("(p1 + p7) div 2"))
    joined.agg(count(lit(1)).as("n_days"),
        sum(abs(col("y") - col("p1"))).as("mae1"),
        sum(abs(col("y") - col("p7"))).as("mae7"),
        sum(abs(col("y") - col("pc"))).as("mae_combo"))
      .select(col("n_days"), col("mae1"), col("mae7"), col("mae_combo"),
        (col("mae_combo") < col("mae1") &&
          col("mae_combo") < col("mae7")).as("combo_wins"))
  }

  /** Click→purchase cross-correlation at lags 0–3 days: which lag
    * maximizes the correlation between daily click and purchase
    * volumes — the data-driven answer to "how long after marketing
    * does buying happen" (q_acf's machinery pointed across two
    * series instead of within one). Day-domain lag joins, five exact
    * moments per lag, r a fixed tree; the argmax lag flags itself. */
  private[graft] def qXcorr(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(expr("ts div 86400000000000").as("d"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .localCheckpoint(eager = false)
    val lags = s.range(0, 4).select(col("id").as("lag"))
    val pairs = daily.as("a").crossJoin(broadcast(lags))
      .join(daily.as("b"), col("a.d") + col("lag") === col("b.d"))
      .select(col("lag"), col("a.x").as("x"), col("b.y").as("y"))
    val m = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val r = (d("n") * d("sxy") - d("sx") * d("sy")) /
      (sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
        sqrt(d("n") * d("syy") - d("sy") * d("sy")))
    val scored = m.select(col("lag"), col("n").as("n_pairs"), r.as("r"))
      .withColumn("r_micro", floor(col("r") * 1000000 + 0.5).cast("long"))
      .localCheckpoint(eager = false)
    val best = scored.agg(max(col("r_micro") * 10 + col("lag")).as("enc"))
    scored.crossJoin(broadcast(best))
      .select(col("lag"), col("n_pairs"), col("r"),
        (col("r_micro") * 10 + col("lag") === col("enc")).as("is_best_lag"))
      .orderBy(col("lag"))
  }

  /** Church-Gale burstiness of the top-20 corpus tokens: the
    * variance-to-mean ratio of per-document occurrence counts —
    * function words arrive ~Poisson (VMR ≈ 1), topical words arrive
    * in bursts (VMR ≫ 1). The complement to q_keyness/q_pmi for
    * vocabulary triage: a "rare" token with high VMR is a topic
    * marker, not noise. Zero-occurrence documents enter the moments
    * through N (Σc and Σc² over present rows only — exact integers);
    * the top-20 gate is a bounded TakeOrdered; VMR is one fixed
    * double tree per output row. */
  private[graft] def qBurstiness(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val top = counts.groupBy(col("w")).agg(sum(col("c")).as("total"))
      .orderBy(col("total").desc, col("w")).limit(20)
    counts.join(broadcast(top), "w")
      .groupBy(col("w"), col("total"))
      .agg(count(lit(1)).as("df"), sum(col("c") * col("c")).as("scc"))
      .crossJoin(broadcast(nDocs))
      .select(col("w"), col("total"), col("df"),
        expr("CAST(floor(CAST(total AS DOUBLE) / CAST(nd AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mean_milli"),
        expr("CAST(floor((CAST(scc AS DOUBLE) / CAST(nd AS DOUBLE) - (CAST(total AS DOUBLE) / CAST(nd AS DOUBLE)) * (CAST(total AS DOUBLE) / CAST(nd AS DOUBLE))) / (CAST(total AS DOUBLE) / CAST(nd AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("vmr_milli"))
      .orderBy(col("total").desc, col("w"))
  }

  /** Rolling-origin backtest of the trailing-3-month-mean forecast —
    * the evaluation PROTOCOL (each origin trains only on its past)
    * that q_forecast_eval's single split doesn't give: six origins,
    * each forecasting the next month from its own trailing window.
    * Fully integer: forecast×3 stays an exact sum, APE =
    * |3v − Σ₃|·10⁶ / 3v in integer ppm — no float touches the
    * metric. Lags ride the bounded month DOMAIN. */
  private[graft] def qRollingOrigin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = t(s, dir, "orders")
      .groupBy(((year(col("o_orderdate")) - 1995) * 12 +
        month(col("o_orderdate")) - 1).cast("long").as("m"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100000").as("v"))
    val w = Window.orderBy(col("m"))
    val lagged = monthly
      .withColumn("v1", lag(col("v"), 1).over(w))
      .withColumn("v2", lag(col("v"), 2).over(w))
      .withColumn("v3", lag(col("v"), 3).over(w))
      .filter(col("v3").isNotNull)
    val mx = lagged.agg(max(col("m")).as("mmax"))
    lagged.crossJoin(broadcast(mx))
      .filter(col("m") > col("mmax") - 6)
      .select(col("m"), col("v").as("actual"),
        expr("(v1 + v2 + v3) div 3").as("forecast"),
        expr("abs(3 * v - (v1 + v2 + v3)) * 1000000 div (3 * v)").as("ape_ppm"))
      .orderBy(col("m"))
  }

  /** Partial autocorrelation of daily revenue at lags 1–3 — the
    * ARIMA order-selection companion to q_acf/q_ljung_box: PACF
    * strips the indirect correlation routed through shorter lags, so
    * "AR(1) or AR(2)?" is read straight off where it cuts out. The
    * Durbin-Levinson recursion is UNROLLED to closed form (φ₂₂ =
    * (r₂−r₁²)/(1−r₁²), φ₃₃ from the level-2 coefficients) — three
    * fixed double trees over the micro-rounded rₖ integers, which
    * come from the same cross-multiplied band join as q_ljung_box. */
  private[graft] def qPacf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100000").as("x"))
    val idxd = daily.withColumn("idx",
      row_number().over(Window.orderBy(col("day"))).cast("long"))
    val tot = idxd.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val dev = idxd.crossJoin(broadcast(tot))
      .select(col("idx"), (col("n") * col("x") - col("sx")).as("d"))
      .localCheckpoint(eager = false)
    val den = dev.agg(sum(col("d") * col("d")).as("den"))
    val rk = dev.as("a").join(dev.as("b"),
        col("b.idx") - col("a.idx") >= 1 && col("b.idx") - col("a.idx") <= 3)
      .groupBy((col("b.idx") - col("a.idx")).as("k"))
      .agg(sum(col("a.d") * col("b.d")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("k"),
        expr("CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("r_micro"))
    // PACF inputs quantize to MILLI so every Durbin-Levinson level is
    // pure integer arithmetic with ONE final double division (a deep
    // mixed-double tree sits on rounding knife-edges; exact integer
    // numerators cannot)
    val wide = rk.groupBy().agg(
      min(when(col("k") === 1, col("r_micro"))).as("r1"),
      min(when(col("k") === 2, col("r_micro"))).as("r2"),
      min(when(col("k") === 3, col("r_micro"))).as("r3"))
      .withColumn("r1m", expr("CAST(floor(r1 / 1000.0 + 0.5) AS BIGINT)"))
      .withColumn("r2m", expr("CAST(floor(r2 / 1000.0 + 0.5) AS BIGINT)"))
      .withColumn("r3m", expr("CAST(floor(r3 / 1000.0 + 0.5) AS BIGINT)"))
      .withColumn("n2", expr("r2m * 1000 - r1m * r1m"))
      .withColumn("d2", expr("1000000 - r1m * r1m"))
      .withColumn("n3", expr("r3m * 1000 * d2 - r1m * (d2 - n2) * r2m - n2 * r1m * 1000"))
      .withColumn("d3", expr("1000000 * d2 - r1m * r1m * (d2 - n2) - n2 * r2m * 1000"))
    wide.selectExpr(
      """stack(3,
        CAST(1 AS BIGINT), r1, r1m,
        CAST(2 AS BIGINT), r2,
          CAST(floor(CAST(n2 * 1000 AS DOUBLE) / CAST(d2 AS DOUBLE) + 0.5) AS BIGINT),
        CAST(3 AS BIGINT), r3,
          CAST(floor(CAST(n3 * 1000 AS DOUBLE) / CAST(d3 AS DOUBLE) + 0.5) AS BIGINT)
      ) AS (lag, acf_micro, pacf_milli)""")
      .orderBy(col("lag"))
  }

  /** Seasonal Mann-Kendall trend test — q_trend_test's S statistic
    * computed WITHIN each calendar month and summed, so the December
    * spike can never masquerade as (or mask) a real year-over-year
    * trend: only same-month pairs across years enter. Pure integer
    * sign arithmetic over the bounded (month × year-pair) domain;
    * the variance Σₘ nₘ(nₘ−1)(2nₘ+5)/18 and z are fixed double
    * trees; per-month S rows ship alongside the total. */
  private[graft] def qSeasonalMk(s: SparkSession, dir: String): DataFrame = {
    val ym = t(s, dir, "orders")
      .groupBy(month(col("o_orderdate")).cast("long").as("mo"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("rev"))
      .localCheckpoint(eager = false)
    val pairs = ym.as("a").join(ym.as("b"),
        col("a.mo") === col("b.mo") && col("a.yr") < col("b.yr"))
      .select(col("a.mo").as("mo"),
        when(col("b.rev") > col("a.rev"), 1L)
          .when(col("b.rev") < col("a.rev"), -1L).otherwise(0L).as("sgn"))
    val perMonth = pairs.groupBy(col("mo")).agg(sum(col("sgn")).as("s_m"))
    val counts = ym.groupBy(col("mo")).agg(count(lit(1)).as("n_m"))
    val tot = perMonth.join(counts, "mo")
      .agg(sum(col("s_m")).as("s_total"),
        sum(expr("CAST(floor(CAST(n_m * (n_m - 1) * (2 * n_m + 5) AS DOUBLE) / 18.0 * 1000 + 0.5) AS BIGINT)")).as("var_milli"))
      .select(col("s_total"), col("var_milli"),
        expr("CAST(floor((CAST(s_total AS DOUBLE) - CASE WHEN s_total > 0 THEN 1.0 WHEN s_total < 0 THEN -1.0 ELSE 0.0 END) / sqrt(var_milli / 1000.0) * 1000 + 0.5) AS BIGINT)").as("z_milli"))
    perMonth.join(counts, "mo").crossJoin(broadcast(tot))
      .select(col("mo"), col("n_m").as("n_years"), col("s_m"),
        col("s_total"), col("z_milli"))
      .orderBy(col("mo"))
  }

  private[graft] def timeSeriesQueryMap: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sessionize" -> (qSessionize _),
    "q_gap_fill" -> (qGapFill _),
    "q_rolling_range" -> (qRollingRange _),
    "q_moving_avg" -> (qMovingAvg _),
    "q_session_window" -> (qSessionWindow _),
    "q_locf" -> (qLocf _),
    "q_rolling_distinct" -> (qRollingDistinct _),
    "q_trend_test" -> (qTrendTest _),
    "q_twap" -> (qTwap _),
    "q_ema" -> (qEma _),
    "q_acf" -> (qAcf _),
    "q_cusum" -> (qCusum _),
    "q_seasonal" -> (qSeasonal _),
    "q_hazard" -> (qHazard _),
    "q_cohort_ltv" -> (qCohortLtv _),
    "q_weekday_effect" -> (qWeekdayEffect _),
    "q_time_to_convert" -> (qTimeToConvert _),
    "q_holt" -> (qHolt _),
    "q_stl_lite" -> (qStlLite _),
    "q_rolling_median" -> (qRollingMedian _),
    "q_lateness_audit" -> (qLatenessAudit _),
    "q_watermark_sweep" -> (qWatermarkSweep _),
    "q_mann_kendall" -> (qMannKendall _),
    "q_survival" -> (qSurvival _),
    "q_period_detect" -> (qPeriodDetect _),
    "q_mase" -> (qMase _),
    "q_session_entropy" -> (qSessionEntropy _),
    "q_rolling_corr" -> (qRollingCorr _),
    "q_burst_detect" -> (qBurstDetect _),
    "q_weekday_strength" -> (qWeekdayStrength _),
    "q_sax" -> (qSax _),
    "q_session_path" -> (qSessionPath _),
    "q_churn_label" -> (qChurnLabel _),
    "q_var_cvar" -> (qVarCvar _),
    "q_mtbf" -> (qMtbf _),
    "q_forecast_combo" -> (qForecastCombo _),
    "q_xcorr" -> (qXcorr _),
    "q_burstiness" -> (qBurstiness _),
    "q_rolling_origin" -> (qRollingOrigin _),
    "q_pacf" -> (qPacf _),
    "q_seasonal_mk" -> (qSeasonalMk _),
  )

  private[graft] def timeSeriesOracleMap: Map[String, String] = Map(
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
    // would overflow int64,
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
    "q_watermark_sweep" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tsn FROM events),
        |p AS (
        |  SELECT tsn, max(tsn) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
        |  FROM e),
        |l AS (
        |  SELECT greatest(CAST(0 AS BIGINT), prior_max - tsn) AS late_ns
        |  FROM p WHERE prior_max IS NOT NULL),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN late_ns > 60000000000 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(sum(CASE WHEN late_ns > 600000000000 THEN 1 ELSE 0 END) AS BIGINT) AS d10,
        |    CAST(sum(CASE WHEN late_ns > 3600000000000 THEN 1 ELSE 0 END) AS BIGINT) AS d60
        |  FROM l)
        |SELECT horizon_min, n_events, n_dropped,
        |  n_dropped * 1000000 // n_events AS drop_ppm
        |FROM (
        |  SELECT CAST(1 AS BIGINT) AS horizon_min, n_events, d1 AS n_dropped FROM a
        |  UNION ALL SELECT CAST(10 AS BIGINT), n_events, d10 FROM a
        |  UNION ALL SELECT CAST(60 AS BIGINT), n_events, d60 FROM a)
        |ORDER BY horizon_min""".stripMargin,
    "q_mann_kendall" ->
      """WITH monthly AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST((year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1
        |      AS BIGINT) AS m,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2),
        |p AS (
        |  SELECT a.prio,
        |    CAST(sum(CASE WHEN b.c > a.c THEN 1
        |                  WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM monthly a JOIN monthly b ON a.prio = b.prio AND a.m < b.m
        |  GROUP BY a.prio),
        |nn AS (SELECT prio, CAST(count(*) AS BIGINT) AS n_months
        |       FROM monthly GROUP BY prio),
        |tie AS (
        |  SELECT prio,
        |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        |  FROM (SELECT prio, c, CAST(count(*) AS BIGINT) AS t
        |        FROM monthly GROUP BY prio, c)
        |  GROUP BY prio)
        |SELECT nn.prio, nn.n_months, p.s_stat,
        |  CAST(nn.n_months * (nn.n_months - 1) * (2 * nn.n_months + 5)
        |    - tie.tie_term AS BIGINT) AS var18,
        |  (CASE WHEN p.s_stat > 0 THEN CAST(p.s_stat - 1 AS DOUBLE)
        |        WHEN p.s_stat < 0 THEN CAST(p.s_stat + 1 AS DOUBLE)
        |        ELSE 0.0 END)
        |    / sqrt(CAST(nn.n_months * (nn.n_months - 1) * (2 * nn.n_months + 5)
        |        - tie.tie_term AS DOUBLE) / 18.0) AS z_mk
        |FROM nn JOIN p ON nn.prio = p.prio JOIN tie ON nn.prio = tie.prio
        |ORDER BY nn.prio""".stripMargin,
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
    "q_mtbf" ->
      """WITH errs AS (
        |  SELECT epoch_ns(ts) // 1000000000 AS sec, event_id
        |  FROM events WHERE event_type = 'error'),
        |gaps AS (
        |  SELECT sec - lag(sec) OVER (ORDER BY sec, event_id) AS gap,
        |    event_id
        |  FROM errs),
        |g2 AS (SELECT gap, event_id FROM gaps WHERE gap IS NOT NULL),
        |ranked AS (
        |  SELECT gap,
        |    CAST(row_number() OVER (ORDER BY gap, event_id) AS BIGINT)
        |      AS rnk,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM g2)
        |SELECT max(n) AS n_gaps,
        |  CAST(sum(gap) AS BIGINT) // max(n) AS mtbf_s,
        |  max(CASE WHEN rnk * 2 = n + (n % 2) THEN gap END)
        |    AS median_gap_s
        |FROM ranked""".stripMargin,
    "q_forecast_combo" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT y.v AS y, f1.v AS p1, f7.v AS p7,
        |    (f1.v + f7.v) // 2 AS pc
        |  FROM daily y
        |  JOIN daily f1 ON y.day = f1.day + 1
        |  JOIN daily f7 ON y.day = f7.day + 7)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(abs(y - p1)) AS BIGINT) AS mae1,
        |  CAST(sum(abs(y - p7)) AS BIGINT) AS mae7,
        |  CAST(sum(abs(y - pc)) AS BIGINT) AS mae_combo,
        |  CAST(sum(abs(y - pc)) AS BIGINT) < CAST(sum(abs(y - p1)) AS BIGINT)
        |    AND CAST(sum(abs(y - pc)) AS BIGINT)
        |      < CAST(sum(abs(y - p7)) AS BIGINT) AS combo_wins
        |FROM j""".stripMargin,
    "q_xcorr" ->
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS d,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |lags AS (SELECT CAST(unnest(generate_series(0, 3)) AS BIGINT)
        |  AS lag),
        |pairs AS (
        |  SELECT lag, a.x AS x, b.y AS y
        |  FROM daily a CROSS JOIN lags JOIN daily b ON a.d + lag = b.d),
        |m AS (
        |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM pairs GROUP BY lag),
        |scored AS (
        |  SELECT lag, n AS n_pairs,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
        |  FROM m),
        |enc AS (
        |  SELECT lag, n_pairs, r,
        |    CAST(floor(r * 1000000 + 0.5) AS BIGINT) * 10 + lag AS e
        |  FROM scored),
        |best AS (SELECT max(e) AS enc FROM enc)
        |SELECT lag, n_pairs, r, e = enc AS is_best_lag
        |FROM enc CROSS JOIN best ORDER BY lag""".stripMargin,
    "q_burstiness" ->
      """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |counts AS (
        |  SELECT doc_id, w, count(*) AS c FROM tok WHERE length(w) > 0
        |  GROUP BY doc_id, w),
        |top AS (
        |  SELECT w, CAST(sum(c) AS BIGINT) AS total FROM counts GROUP BY w
        |  ORDER BY total DESC, w LIMIT 20),
        |agg AS (
        |  SELECT c2.w, t.total, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(c2.c * c2.c) AS BIGINT) AS scc
        |  FROM counts c2 JOIN top t ON c2.w = t.w
        |  GROUP BY c2.w, t.total)
        |SELECT w, total, df,
        |  CAST(floor(CAST(total AS DOUBLE) / CAST(nd AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mean_milli,
        |  CAST(floor((CAST(scc AS DOUBLE) / CAST(nd AS DOUBLE) - (CAST(total AS DOUBLE) / CAST(nd AS DOUBLE)) * (CAST(total AS DOUBLE) / CAST(nd AS DOUBLE))) / (CAST(total AS DOUBLE) / CAST(nd AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS vmr_milli
        |FROM agg CROSS JOIN nd
        |ORDER BY total DESC, w""".stripMargin,
    "q_rolling_origin" ->
      """WITH monthly AS (
        |  SELECT CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100000 AS v
        |  FROM orders GROUP BY 1),
        |lagged AS (
        |  SELECT m, v,
        |    lag(v, 1) OVER (ORDER BY m) AS v1,
        |    lag(v, 2) OVER (ORDER BY m) AS v2,
        |    lag(v, 3) OVER (ORDER BY m) AS v3
        |  FROM monthly),
        |f AS (SELECT * FROM lagged WHERE v3 IS NOT NULL),
        |mx AS (SELECT CAST(max(m) AS BIGINT) AS mmax FROM f)
        |SELECT m, v AS actual,
        |  (v1 + v2 + v3) // 3 AS forecast,
        |  abs(3 * v - (v1 + v2 + v3)) * 1000000 // (3 * v) AS ape_ppm
        |FROM f CROSS JOIN mx WHERE m > mmax - 6
        |ORDER BY m""".stripMargin,
    "q_pacf" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100000 AS x
        |  FROM orders GROUP BY 1),
        |idxd AS (
        |  SELECT x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx FROM daily),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx FROM idxd),
        |dev AS (SELECT idx, n * x - sx AS d FROM idxd CROSS JOIN tot),
        |den AS (SELECT CAST(sum(d * d) AS BIGINT) AS den FROM dev),
        |rk AS (
        |  SELECT b.idx - a.idx AS k,
        |    CAST(floor(CAST(sum(a.d * b.d) AS DOUBLE) / CAST(max(den.den) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS r_micro
        |  FROM dev a JOIN dev b ON b.idx - a.idx BETWEEN 1 AND 3 CROSS JOIN den
        |  GROUP BY 1),
        |wide AS (
        |  SELECT r1, r2, r3, r1m, r2m, r3m, n2, d2,
        |    r3m * 1000 * d2 - r1m * (d2 - n2) * r2m - n2 * r1m * 1000 AS n3,
        |    1000000 * d2 - r1m * r1m * (d2 - n2) - n2 * r2m * 1000 AS d3
        |  FROM (
        |    SELECT r1, r2, r3, r1m, r2m, r3m,
        |      r2m * 1000 - r1m * r1m AS n2, 1000000 - r1m * r1m AS d2
        |    FROM (
        |      SELECT r1, r2, r3,
        |        CAST(floor(r1 / 1000.0 + 0.5) AS BIGINT) AS r1m,
        |        CAST(floor(r2 / 1000.0 + 0.5) AS BIGINT) AS r2m,
        |        CAST(floor(r3 / 1000.0 + 0.5) AS BIGINT) AS r3m
        |      FROM (
        |        SELECT min(CASE WHEN k = 1 THEN r_micro END) AS r1,
        |          min(CASE WHEN k = 2 THEN r_micro END) AS r2,
        |          min(CASE WHEN k = 3 THEN r_micro END) AS r3
        |        FROM rk) q0) q1) q2)
        |SELECT CAST(1 AS BIGINT) AS lag, CAST(r1 AS BIGINT) AS acf_micro,
        |  CAST(r1m AS BIGINT) AS pacf_milli FROM wide
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(r2 AS BIGINT),
        |  CAST(floor(CAST(n2 * 1000 AS DOUBLE) / CAST(d2 AS DOUBLE) + 0.5) AS BIGINT)
        |FROM wide
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), CAST(r3 AS BIGINT),
        |  CAST(floor(CAST(n3 * 1000 AS DOUBLE) / CAST(d3 AS DOUBLE) + 0.5) AS BIGINT)
        |FROM wide
        |ORDER BY lag""".stripMargin,
    "q_seasonal_mk" ->
      """WITH ym AS (
        |  SELECT CAST(month(o_orderdate) AS BIGINT) AS mo,
        |    CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.mo,
        |    CASE WHEN b.rev > a.rev THEN 1 WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
        |  FROM ym a JOIN ym b ON a.mo = b.mo AND a.yr < b.yr),
        |permonth AS (SELECT mo, CAST(sum(sgn) AS BIGINT) AS s_m FROM pairs GROUP BY mo),
        |counts AS (SELECT mo, CAST(count(*) AS BIGINT) AS n_m FROM ym GROUP BY mo),
        |tot AS (
        |  SELECT CAST(sum(s_m) AS BIGINT) AS s_total,
        |    CAST(sum(CAST(floor(CAST(n_m * (n_m - 1) * (2 * n_m + 5) AS DOUBLE) / 18.0 * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS var_milli
        |  FROM permonth JOIN counts USING (mo)),
        |tz AS (
        |  SELECT s_total, var_milli,
        |    CAST(floor((CAST(s_total AS DOUBLE) - CASE WHEN s_total > 0 THEN 1.0 WHEN s_total < 0 THEN -1.0 ELSE 0.0 END) / sqrt(var_milli / 1000.0) * 1000 + 0.5) AS BIGINT) AS z_milli
        |  FROM tot)
        |SELECT p.mo, c.n_m AS n_years, p.s_m, t.s_total, t.z_milli
        |FROM permonth p JOIN counts c USING (mo) CROSS JOIN tz t
        |ORDER BY p.mo""".stripMargin,
  )
}
