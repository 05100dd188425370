package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.functions.{from_avro_ocf, to_avro_ocf}
import graft.llm.{Dedup, Multimodal, Similarity, TextOps}
import graft.model.Schemas
import graft.ops.{Analytics, Router}

/** Warehouse/OLAP surface: TPC-H shapes, joins, windows, rollups, set ops, sampling, sketches, CDC, layout-aware scale patterns.
  *
  * Split from the SparkEntry monolith; every member is `private[graft]`
  * and the driver surface stays `SparkEntry.queries` / `oracleSql`
  * (assembled from the per-domain map fragments below).
  */
private[graft] trait WarehouseQueries3 { this: SparkEntry.type =>

  /** Order-consolidation audit: consecutive orders from the same
    * customer within 7 days are mergeable shipments — counts and
    * share per nation, from one customer-keyed lag window (scalable
    * partitions) — the fulfilment-cost lever ops teams size before
    * batching policies. Exact integer day gaps throughout. */
  private[graft] def qOrderConsolidation(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nation"),
        col("o_custkey"), col("o_orderkey"),
        epochDay(col("o_orderdate")).as("day"))
    val lagged = o.withColumn("prev_day",
      expr("lag(day) OVER (PARTITION BY o_custkey " +
        "ORDER BY day, o_orderkey)"))
    lagged.groupBy(col("nation"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("prev_day").isNotNull &&
          col("day") - col("prev_day") <= 7, 1L).otherwise(0L))
          .as("mergeable"))
      .withColumn("mergeable_ppm",
        expr("mergeable * 1000000 div n_orders"))
      .orderBy(col("nation"))
  }

  /** Top-5 revenue brands per quarter through the bounded per-stratum
    * heap (stratum = quarter, key = fixed-width revenue encoding) —
    * the standard "leaders by period" report with NO per-quarter
    * window funnel: the same operator discipline as the ANN top-k
    * paths, applied to plain BI. */
  private[graft] def qTopkPerQuarter(s: SparkSession, dir: String): DataFrame = {
    val qrev = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(expr("year(l_shipdate) * 4 + (month(l_shipdate) - 1) div 3")
        .cast("long").as("q"), col("p_brand"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("rev_c"))
    // descending revenue as an ascending zero-padded key: lexicographic
    // order == numeric order; the numeric brand id rides as the heap's
    // row id and keys the join back for the display columns
    val keyed = qrev
      .select(col("q").cast("string").as("qs"),
        concat(lpad((lit(100000000000L) - col("rev_c")).cast("string"),
          13, "0"), lit("|"), col("p_brand")).as("k"),
        expr("CAST(substring(p_brand, 7) AS LONG)").as("bid"))
      .localCheckpoint(eager = false)
    val back = qrev.select(col("q").as("q2"), col("p_brand"), col("rev_c"),
      expr("CAST(substring(p_brand, 7) AS LONG)").as("bid2"))
    graft.ops.Sampling.stratifiedTopN(s, keyed, "qs", "k", "bid", n = 5)
      .select(col("qs").cast("long").as("q"),
        col("rn").cast("long").as("rank"), col("bid"))
      .join(back, col("q") === col("q2") && col("bid") === col("bid2"))
      .select(col("q"), col("rank"), col("p_brand"), col("rev_c"))
      .orderBy(col("q"), col("rank"))
  }

  /** Weekly growth accounting — the product-analytics identity
    * WAU(w) = new + retained + resurrected, with churned(w) balancing
    * against WAU(w−1): each user's weekly activity set collapses to
    * distinct (user, week), first-seen is a min-reduce, and the
    * previous-week flag is a self-join on week−1 (gap-safe, no window
    * over users). The output proves the identity per week: new +
    * retained + resurrected = wau. */
  private[graft] def qGrowthAccounting(s: SparkSession, dir: String): DataFrame = {
    val weeks = events(s, dir)
      .select(col("user_id"),
        expr("(ts div 1000000000) div 604800").as("week"))
      .distinct()
      .localCheckpoint(eager = false)
    val first = weeks.groupBy(col("user_id")).agg(min(col("week")).as("fw"))
    val flagged = weeks.join(first, "user_id")
      .join(weeks.select(col("user_id"),
          (col("week") + 1).as("week"), lit(1L).as("prev_active")),
        Seq("user_id", "week"), "left")
      .select(col("week"), col("user_id"),
        when(col("week") === col("fw"), "new")
          .when(col("prev_active").isNotNull, "retained")
          .otherwise("resurrected").as("status"))
    val counts = flagged.groupBy(col("week"))
      .agg(count(lit(1)).as("wau"),
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("new_users"),
        sum(when(col("status") === "retained", 1L).otherwise(0L))
          .as("retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L))
          .as("resurrected"))
    val churned = weeks.join(weeks.select(col("user_id"),
          (col("week") - 1).as("week"), lit(1L).as("next_active")),
        Seq("user_id", "week"), "left")
      .groupBy((col("week") + 1).as("week"))
      .agg(sum(when(col("next_active").isNull, 1L).otherwise(0L))
        .as("churned"))
    counts.join(churned, Seq("week"), "left")
      .select(col("week"), col("wau"), col("new_users"), col("retained"),
        col("resurrected"), coalesce(col("churned"), lit(0L)).as("churned"),
        (col("new_users") + col("retained") + col("resurrected") ===
          col("wau")).as("identity_holds"))
      .orderBy(col("week"))
  }

  /** Exponential retention-curve fit: ln(retention share) regressed on
    * week offset across the pooled cohorts of q_retention — the decay
    * constant ("we lose X% of remaining actives per week") that turns
    * the retention triangle into one planning number. Per-offset
    * retention shares are exact ppm; their logs round to micro-nats
    * BEFORE the OLS moments (the determinism contract), slope one
    * fixed tree. Offset 0 anchors the fit; offsets with zero actives
    * drop. */
  private[graft] def qRetentionFit(s: SparkSession, dir: String): DataFrame = {
    val weeks = events(s, dir)
      .select(col("user_id"),
        expr("(ts div 1000000000) div 604800").as("week"))
      .distinct()
      .localCheckpoint(eager = false)
    val cohorts = weeks.groupBy(col("user_id")).agg(min(col("week")).as("cw"))
    val tri = weeks.join(cohorts, "user_id")
      .groupBy((col("week") - col("cw")).as("off"))
      .agg(countDistinct(col("user_id")).as("active"))
    val base = weeks.join(cohorts, "user_id")
      .filter(col("week") === col("cw"))
      .agg(countDistinct(col("user_id")).as("n0"))
    val pts = tri.crossJoin(broadcast(base))
      .select(col("off"),
        floor(log(col("active").cast("double") / col("n0").cast("double"))
          * 1000000 + 0.5).cast("long").as("lr_unat"))
    val m = pts.agg(count(lit(1)).as("n"), sum(col("off")).as("sx"),
      sum(col("lr_unat")).as("sy"), sum(col("off") * col("off")).as("sxx"),
      sum(col("off") * col("lr_unat")).as("sxy"))
    m.select(col("n").as("n_offsets"),
        expr("(n * sxy - sx * sy) div (n * sxx - sx * sx)")
          .as("decay_unat_per_week"))
  }

  /** Price-ending distribution — the psychological-pricing audit
    * (.99 endings, round-dollar spikes): cents-mod-100 histogram over
    * part retail prices with each ending's share in exact ppm and a
    * flag for endings above twice the uniform share. One integer mod,
    * one bounded group-by (100 possible endings). */
  private[graft] def qPriceEndings(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "part")
      .select((Analytics.cents(col("p_retailprice")) % 100).as("ending"))
      .groupBy(col("ending")).agg(count(lit(1)).as("n"))
    val tot = e.agg(sum(col("n")).as("total"))
    e.crossJoin(broadcast(tot))
      .select(col("ending"), col("n"),
        expr("n * 1000000 div total").as("share_ppm"),
        (col("n") * 50 > col("total")).as("over_2x_uniform"))
      .orderBy(col("ending"))
  }

  /** Design effect of customer clustering on order-level metrics:
    * ICC from the one-way ANOVA variance components (between/within
    * customers on dollar order values), deff = 1 + (m̄−1)·ICC, and
    * the effective sample size n/deff — the number that says how many
    * "independent" orders the dataset really contains (and WHY
    * q_ratio_metric must cluster its variance). Exact integer moments
    * per customer; ICC/deff/n_eff are fixed IEEE trees. */
  private[graft] def qDesignEffect(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .select(col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 100")
          .as("v"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("m"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("ss"))
    val agg0 = per.agg(count(lit(1)).as("k"), sum(col("m")).as("n"),
      sum(col("sv")).as("st"), sum(col("ss")).as("sst"),
      // between-group term Σ s_i²/m_i rounded per group to milli —
      // order-independent exact integers (the pivot trick can't apply
      // to ~thousands of customers)
      sum(expr("(sv * 1000) div m")).as("bg_milli"))
    def d(c: String) = col(c).cast("double")
    val ssb = d("bg_milli") / lit(1000.0) - d("st") * d("st") / d("n")
    val ssw = d("sst") - d("bg_milli") / lit(1000.0)
    val msb = ssb / (d("k") - lit(1.0))
    val msw = ssw / (d("n") - d("k"))
    val mbar = d("n") / d("k")
    val icc = (msb - msw) / (msb + (mbar - lit(1.0)) * msw)
    val deff = lit(1.0) + (mbar - lit(1.0)) * icc
    agg0.select(col("k").as("n_customers"), col("n").as("n_orders"),
      icc.as("icc"), deff.as("deff"),
      (d("n") / deff).as("n_effective"))
  }

  /** Longest consecutive-day activity streak per user — the
    * engagement metric behind every "streak" product feature: distinct
    * activity days per user, islands via the day − dense-rank constant
    * (per-user windows over high-cardinality keys — scalable), longest
    * island per user, top-20 streaks with deterministic ties. */
  private[graft] def qActivityStreaks(s: SparkSession, dir: String): DataFrame = {
    val days = events(s, dir)
      .select(col("user_id"), expr("ts div 86400000000000").as("d"))
      .distinct()
    val ranked = days.withColumn("rn",
      expr("row_number() OVER (PARTITION BY user_id ORDER BY d)"))
    val streaks = ranked
      .groupBy(col("user_id"), (col("d") - col("rn")).as("island"))
      .agg(count(lit(1)).as("len"), min(col("d")).as("start_d"))
    streaks.groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
      .orderBy(col("longest_streak").desc, col("user_id")).limit(20)
      .select(col("user_id"), col("longest_streak"), col("n_streaks"),
        col("active_days"))
      .orderBy(col("user_id"))
  }

  /** Basket-size distribution: line items per order → frequency
    * histogram with exact ppm shares and the cumulative curve over
    * the bounded size domain — the first chart on any commerce
    * dashboard, and the fan-out prior behind every orders⋈lineitem
    * cost estimate (q_join_cardinality's distributional view). */
  private[graft] def qOrderSizeDist(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_orders"))
    val tot = sizes.agg(sum(col("n_orders")).as("total"))
    sizes.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("n_orders * 1000000 div total"))
      // size domain is bounded (max items per order), not data-sized
      .withColumn("cum_ppm",
        sum(col("share_ppm")).over(Window.orderBy(col("sz"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("sz"), col("n_orders"), col("share_ppm"), col("cum_ppm"))
      .orderBy(col("sz"))
  }

  /** Multiple-testing discipline on the per-nation urgent-share
    * screen: each nation's two-proportion z against the rest of the
    * corpus, flagged at the NAIVE 1.96 cut and at the Bonferroni cut
    * for 25 simultaneous tests (z = 3.0902, Φ⁻¹(1−0.025/25) as a
    * build-time literal — the nation domain is fixed). The discovery
    * counts before/after correction are the story: naive screens
    * over-alert by construction. Exact counts; z one fixed tree. */
  private[graft] def qMultipleTesting(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("x"))
      .localCheckpoint(eager = false)
    val tot = per.agg(sum(col("n")).as("gn"), sum(col("x")).as("gx"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val joined = per.crossJoin(broadcast(tot))
      .withColumn("rn", col("gn") - col("n"))
      .withColumn("rx", col("gx") - col("x"))
    val p1 = d(col("x")) / d(col("n"))
    val p2 = d(col("rx")) / d(col("rn"))
    val pp = d(col("gx")) / d(col("gn"))
    val z = (p1 - p2) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / d(col("n")) + lit(1.0) / d(col("rn"))))
    joined.select(col("nation"), col("n"), col("x"), z.as("z"),
        (abs(z) > lit(1.96)).as("naive_sig"),
        (abs(z) > lit(3.0902)).as("bonferroni_sig"))
      .orderBy(col("nation"))
  }

  /** Per-nation geometric-mean order value, reported in LOG space
    * (mean micro-nat log — exp is the one common libm function
    * WITHOUT a correctly-rounded guarantee, so it never crosses the
    * engine boundary): each order's ln rounds to micro-nats before
    * the sum, the mean is one integer division. The multiplicative-
    * average companion to the arithmetic means everywhere else —
    * right-skewed money data is what geometric means are FOR. */
  private[graft] def qGeoMean(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nation"),
        floor(log(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
          .cast("double") / 100.0) * 1000000 + 0.5).cast("long")
          .as("ln_unat"))
    per.groupBy(col("nation"))
      .agg(count(lit(1)).as("n"), sum(col("ln_unat")).as("s_unat"))
      .select(col("nation"), col("n"),
        expr("s_unat div n").as("geo_mean_ln_unat"))
      .orderBy(col("nation"))
  }

  /** ABC×XYZ inventory matrix — the two-axis stocking policy grid:
    * ABC = revenue concentration class (q_abc_analysis's cumulative
    * cuts), XYZ = demand-variability class from each part's quarterly
    * quantity CV (X steady < 0.5, Y < 1.0, Z erratic). The 9-cell
    * matrix of part counts tells planners which cells deserve safety
    * stock vs make-to-order. CV decided by integer cross-multiply on
    * exact moments (no double ever classifies a part). */
  private[graft] def qAbcXyz(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("year(l_shipdate) * 4 + (month(l_shipdate) - 1) div 3")
          .cast("long").as("q"),
        col("l_quantity").cast("long").as("qty"),
        Analytics.cents(col("l_extendedprice")).as("cents"))
    // BOTH axes ride one (part, quarter) pre-aggregate: the fact table
    // is scanned once and the (part, q) → part shuffle chain runs once,
    // instead of the former separate XYZ (quantity) and ABC (revenue)
    // passes each re-reading the checkpointed fact. perPart carries the
    // exact quantity moments AND the revenue cents side by side.
    val perQ = li.groupBy(col("l_partkey"), col("q"))
      .agg(sum(col("qty")).as("dq"), sum(col("cents")).as("cq"))
    val perPart = perQ.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("k"), sum(col("dq")).as("sd"),
        sum(col("dq") * col("dq")).as("sdd"), sum(col("cq")).as("cents"))
      .localCheckpoint(eager = false)
    // CV² vs 0.25 / 1.0 by cross-multiply: (k·sdd − sd²)·k vs
    // thr·(k−1)·sd² — all exact int64 at the quarterly-quantity grain
    val classed = perPart.select(col("l_partkey"), col("cents"),
      when((col("k") * col("sdd") - col("sd") * col("sd")) * col("k") * 4
        <= (col("k") - 1) * col("sd") * col("sd"), "X")
        .when((col("k") * col("sdd") - col("sd") * col("sd")) * col("k")
          <= (col("k") - 1) * col("sd") * col("sd"), "Y")
        .otherwise("Z").as("xyz"),
      when(col("cents") < (1L << 36) && col("l_partkey") < (1L << 26),
        (lit(1L << 36) - col("cents")) * lit(1L << 26) + col("l_partkey"))
        .otherwise(raise_error(lit("q_abc_xyz key overflow"))).as("key"))
    val run = graft.ops.ScalablePrefix.runningSum(s,
      classed.select(col("key").as("k"), col("cents")), "k", "cents", 32)
    // total revenue from the checkpointed per-part frame (one tiny job)
    // rather than a third pass over the prefix RDD
    val tot = perPart.agg(sum(col("cents")).as("t"))
    val abc = run.crossJoin(broadcast(tot))
      .select(expr("k % 67108864").as("l_partkey"),
        when(col("run_sum") * 5 <= col("t") * 4, "A")
          .when(col("run_sum") * 20 <= col("t") * 19, "B")
          .otherwise("C").as("abc"))
    abc.join(classed.select(col("l_partkey"), col("xyz")), "l_partkey")
      .groupBy(col("abc"), col("xyz"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("abc"), col("xyz"))
  }

  /** Customer win-back analysis: customers who went dark for ≥ 2
    * years and then returned — how many, and what their post-return
    * spend looks like, grouped by the year they came back. The
    * dormancy gap is one per-customer lag window (scalable
    * partitions); "revenue after return" keys on the FIRST
    * qualifying return via a min-reduce, exact cents. */
  private[graft] def qWinback(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        epochDay(col("o_orderdate")).as("day"),
        Analytics.cents(col("o_totalprice")).as("cents"))
      .localCheckpoint(eager = false)
    val gapped = o.withColumn("prev_day",
      expr("lag(day) OVER (PARTITION BY o_custkey " +
        "ORDER BY day, o_orderkey)"))
    val firstReturn = gapped
      .filter(col("prev_day").isNotNull &&
        col("day") - col("prev_day") >= 730)
      .groupBy(col("o_custkey"))
      .agg(min(col("day")).as("return_day"))
    val post = o.join(firstReturn, "o_custkey")
      .filter(col("day") >= col("return_day"))
      .groupBy(col("o_custkey"), col("return_day"))
      .agg(count(lit(1)).as("post_orders"), sum(col("cents")).as("post_c"))
    post.groupBy(expr("1970 + return_day div 365").as("return_year_approx"))
      .agg(count(lit(1)).as("winback_customers"),
        sum(col("post_orders")).as("post_orders"),
        sum(col("post_c")).as("post_revenue_c"))
      .orderBy(col("return_year_approx"))
  }

  /** Discount-leakage report per order priority: discount rates in
    * exact milli, the revenue given away as Σ price·disc through the
    * two-step integer division (cents × disc_milli div 1000 per line,
    * THEN summed — order-independent), and the leakage share of gross
    * in ppm. The margin-review table behind "who is discounting and
    * what it costs". */
  private[graft] def qDiscountLeakage(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("prio"),
        Analytics.cents(col("l_extendedprice")).as("cents"),
        expr("CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)")
          .as("disc_milli"))
    li.groupBy(col("prio"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("cents")).as("gross_c"),
        sum(expr("cents * disc_milli div 1000")).as("leak_c"),
        max(col("disc_milli")).as("max_disc_milli"),
        sum(col("disc_milli")).as("sum_disc_milli"))
      .select(col("prio"), col("n_lines"), col("gross_c"), col("leak_c"),
        expr("leak_c * 1000000 div gross_c").as("leak_ppm"),
        expr("sum_disc_milli div n_lines").as("mean_disc_milli"),
        col("max_disc_milli"))
      .orderBy(col("prio"))
  }

  /** Supplier-concentration risk: parts bucketed by how many distinct
    * suppliers ship them, with each bucket's part count and revenue —
    * the single-sourced slice is the supply-chain fragility number
    * procurement reviews open with. Two grouped reduces; the supplier
    * count domain bounds the output. */
  private[graft] def qSupplierRisk(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        sum(Analytics.cents(col("l_extendedprice"))).as("cents"))
      .localCheckpoint(eager = false)
    val tot = per.agg(sum(col("cents")).as("t"),
      count(lit(1)).as("n_parts_total"))
    per.groupBy(col("n_suppliers"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"))
      .crossJoin(broadcast(tot))
      .select(col("n_suppliers"), col("n_parts"),
        expr("n_parts * 1000000 div n_parts_total").as("part_share_ppm"),
        expr("cents * 1000000 div t").as("revenue_share_ppm"))
      .orderBy(col("n_suppliers"))
  }

  /** Treatment-effect stability over time: the customer-parity
    * "experiment" readout per year, with the effect's monotone-trend
    * SIGN from the exact integer slope numerator (q_simpsons'
    * no-division discipline) — a shrinking effect is the novelty-
    * wear-off signature every long-running experiment must check.
    * One pass; per-year gaps in signed exact ppm. */
  private[graft] def qEffectStability(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        (col("o_custkey") % 2).as("arm"), col("o_custkey"))
      .agg(max(when(col("o_totalprice") >= 200000.0, 1L).otherwise(0L))
        .as("conv"))
    val g = per.groupBy(col("yr"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x1"))
      .withColumn("gap_ppm",
        expr("x1 * 1000000 div n1 - x0 * 1000000 div n0"))
      .localCheckpoint(eager = false)
    val trend = g.agg(count(lit(1)).as("k"), sum(col("yr")).as("sx"),
      sum(col("gap_ppm")).as("sy"),
      sum(col("yr") * col("gap_ppm")).as("sxy"))
      .select(signum((col("k") * col("sxy") - col("sx") * col("sy"))
        .cast("double")).cast("long").as("trend_sign"))
    g.crossJoin(broadcast(trend))
      .select(col("yr"), col("n0"), col("n1"), col("gap_ppm"),
        col("trend_sign"))
      .orderBy(col("yr"))
  }

  /** Return rate by discount band — "do discounted items come back
    * more": exact per-band rates plus the Cochran–Armitage-style
    * monotone trend SIGN from the integer slope numerator (band index
    * × rate, no division, no normal approximation) — the
    * dose-response read on a 2×k table. Bands are the discount-milli
    * domain (0–100), so everything after the line scan is bounded. */
  private[graft] def qReturnsByDiscount(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)")
        .as("band"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
    val g = li.groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sum(col("ret")).as("x"))
      .withColumn("rate_ppm", expr("x * 1000000 div n"))
      .localCheckpoint(eager = false)
    val trend = g.agg(count(lit(1)).as("k"), sum(col("band")).as("sb"),
      sum(col("rate_ppm")).as("sr"),
      sum(col("band") * col("rate_ppm")).as("sbr"))
      .select(signum((col("k") * col("sbr") - col("sb") * col("sr"))
        .cast("double")).cast("long").as("trend_sign"))
    g.crossJoin(broadcast(trend))
      .select(col("band"), col("n"), col("x"), col("rate_ppm"),
        col("trend_sign"))
      .orderBy(col("band"))
  }

  /** Classical ratio-to-moving-average seasonal indices — the
    * MULTIPLICATIVE decomposition next to q_stl_lite's additive one:
    * each month's revenue over its centered 12-month moving average
    * in exact ppm (integer division), averaged per month-of-year.
    * Index 1.1e6 ⇒ "this month runs 10% hot"; the month domain
    * bounds every window. */
  private[graft] def qRatioToMa(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = t(s, dir, "orders")
      .groupBy(expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
        .cast("long").as("mo"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
    val w = Window.orderBy(col("mo")).rowsBetween(-6, 5)
    val rat = monthly
      .withColumn("ma_sum", sum(col("v")).over(w))
      .withColumn("ma_n", count(lit(1)).over(w))
      .filter(col("ma_n") === 12)
      .select(expr("mo % 12").as("month_of_year"),
        expr("v * 1000000 div (ma_sum div 12)").as("ratio_ppm"))
    rat.groupBy(col("month_of_year"))
      .agg(count(lit(1)).as("n_months"),
        expr("sum(ratio_ppm) div count(1)").as("seasonal_index_ppm"))
      .orderBy(col("month_of_year"))
  }

  /** Click→purchase dwell-time distribution: each purchase's gap to
    * the user's most recent preceding click through the NATIVE as-of
    * join (the same operator q_attribution rides), then exact
    * nearest-rank p10/p50/p90 of the gap in seconds — the latency
    * distribution whose mean q_time_to_convert reports, now with the
    * robust quantile read. Unattributed purchases are counted but
    * excluded from the gap ranks. */
  private[graft] def qClickToBuyLatency(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("ts").as("click_ts"))
    val gapped = graft.plans.Asof.join(purchases, clicks, Seq("user_id"),
        Seq("c_user"), "ts", "c_ts", Seq("click_ts"), inclusive = false)
      .select(col("event_id"),
        when(col("click_ts").isNotNull,
          expr("(ts - click_ts) div 1000000000")).as("gap_s"))
      .localCheckpoint(eager = false)
    val withGap = gapped.filter(col("gap_s").isNotNull)
    // round-14 (window audit): the gap ranking is DATA-PROPORTIONAL
    // (one row per attributed purchase), so the old unpartitioned
    // row_number + count-over-() funneled every gap through one task.
    // It now rides the two-pass scalable grouped rank under a single
    // constant group (the qKruskalWallis convention); grp_n replaces
    // the count-over-window. Identical ranks: ascending (gap_s,
    // event_id), both exact in double (gaps are second-scale longs).
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      withGap.select(lit("all").as("g"),
        col("gap_s").cast("double").as("ord"), col("event_id")),
      "g", "ord", "event_id", 32)
    def rk(p: Int) = expr(s"greatest((grp_n * $p + 99) div 100, 1)")
    val quant = ranked
      .filter(Seq(10, 50, 90).map(p => col("rnk") === rk(p)).reduce(_ || _))
      .groupBy()
      .agg(max(col("grp_n")).as("attributed"),
        max(when(col("rnk") === rk(10), col("ord"))).cast("long").as("p10_s"),
        max(when(col("rnk") === rk(50), col("ord"))).cast("long").as("p50_s"),
        max(when(col("rnk") === rk(90), col("ord"))).cast("long").as("p90_s"))
    val tot = gapped.agg(count(lit(1)).as("purchases"))
    quant.crossJoin(broadcast(tot))
      .select(col("purchases"), col("attributed"), col("p10_s"),
        col("p50_s"), col("p90_s"))
  }

  /** Loyalty ladder: the share of customers reaching 2+/5+/10+ orders
    * in exact ppm — the repeat-purchase funnel a retention team
    * tracks quarter over quarter. One customer-keyed count, three
    * threshold sums, one row out. */
  private[graft] def qLoyaltyLadder(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("m"))
    per.agg(count(lit(1)).as("customers"),
        sum(when(col("m") >= 2, 1L).otherwise(0L)).as("r2"),
        sum(when(col("m") >= 5, 1L).otherwise(0L)).as("r5"),
        sum(when(col("m") >= 10, 1L).otherwise(0L)).as("r10"))
      .select(col("customers"),
        expr("r2 * 1000000 div customers").as("repeat2_ppm"),
        expr("r5 * 1000000 div customers").as("repeat5_ppm"),
        expr("r10 * 1000000 div customers").as("repeat10_ppm"))
  }

  /** Weekly brand movers: the 10 largest absolute week-over-week
    * revenue swings — the "what changed" report every Monday review
    * starts from. Brand×week totals join on week−1 (gap-safe), deltas
    * exact cents, top-10 by |Δ| via TakeOrdered with deterministic
    * ties. */
  private[graft] def qTopMovers(s: SparkSession, dir: String): DataFrame = {
    val bw = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        expr("(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') + 3) " +
          "div 7").cast("long").as("wk"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("rev_c"))
      .localCheckpoint(eager = false)
    bw.as("a").join(bw.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.wk") + 1 === col("b.wk"))
      .select(col("b.p_brand").as("p_brand"), col("b.wk").as("wk"),
        col("a.rev_c").as("prev_c"), col("b.rev_c").as("cur_c"),
        (col("b.rev_c") - col("a.rev_c")).as("delta_c"))
      .orderBy(abs(col("delta_c")).desc, col("p_brand"), col("wk"))
      .limit(10)
      .select(col("p_brand"), col("wk"), col("prev_c"), col("cur_c"),
        col("delta_c"))
      .orderBy(col("p_brand"), col("wk"))
  }

  /** Channel reach & frequency: unique users touched and mean touches
    * per user for each click channel, plus each channel's reach share
    * of the clicking population — the media-planning table (reach ×
    * frequency is how budgets are argued). One user×channel reduce;
    * exact ppm and milli throughout. */
  private[graft] def qReachFrequency(s: SparkSession, dir: String): DataFrame = {
    val clicks = events(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        (get_json_object(col("props"), "$.k").cast("long") % 4)
          .as("channel"))
    val uc = clicks.groupBy(col("channel"), col("user_id"))
      .agg(count(lit(1)).as("touches"))
      .localCheckpoint(eager = false)
    val tot = uc.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("clickers"))
    uc.groupBy(col("channel"))
      .agg(count(lit(1)).as("reach"), sum(col("touches")).as("touches"))
      .crossJoin(broadcast(tot))
      .select(col("channel"), col("reach"),
        expr("reach * 1000000 div clickers").as("reach_ppm"),
        expr("touches * 1000 div reach").as("freq_milli"))
      .orderBy(col("channel"))
  }

  /** Per-event-type value profile: mean (exact milli), nearest-rank
    * p50/p90 of the event's value column per type — the payload-
    * distribution card for each event family, quantiles on the
    * 5-group bounded rank (never a data-wide window). */
  private[graft] def qEventValueProfile(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("event_type"), col("event_id"),
        Analytics.fp(col("value"), 1000L).as("v_milli"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      e.select(col("event_type"), col("v_milli").cast("double").as("ord"),
        col("event_id")),
      "event_type", "ord", "event_id", 32)
    def rk(p: Int) = expr(s"greatest((grp_n * $p + 99) div 100, 1)")
    val quant = ranked
      .filter(col("rnk") === rk(50) || col("rnk") === rk(90))
      .groupBy(col("event_type"))
      .agg(max(col("grp_n")).as("n"),
        max(when(col("rnk") === rk(50), col("ord"))).cast("long")
          .as("p50_milli"),
        max(when(col("rnk") === rk(90), col("ord"))).cast("long")
          .as("p90_milli"))
    val means = e.groupBy(col("event_type"))
      .agg(sum(col("v_milli")).as("sv"))
    quant.join(means, "event_type")
      .select(col("event_type"), col("n"),
        expr("sv div n").as("mean_milli"), col("p50_milli"),
        col("p90_milli"))
      .orderBy(col("event_type"))
  }

  /** Log-rank test comparing the AUTOMOBILE vs BUILDING customer
    * survival curves — the hypothesis-test companion to q_survival's
    * Kaplan-Meier estimate: "are these two churn curves the same
    * curve?" At each tenure quarter with any churn, the observed
    * group-1 exits are compared to the hypergeometric expectation
    * d·n₁/n given the combined at-risk set; O−E and the variance
    * accumulate over the ~28-row tenure DOMAIN. All at-risk counts
    * are integer cumulative sums over that bounded domain (the
    * per-customer reduction is a plain parallel groupBy — nothing
    * customer-sized ever crosses a window); each expectation/variance
    * term rounds to integer micro-units BEFORE the sum, and the final
    * chi-square is one fixed double tree over three exact integers. */
  private[graft] def qLogRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cutoff = lit("2000-07-01").cast("date")
    val per = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
      .groupBy(col("o_custkey"), col("c_mktsegment"))
      .agg(min(epochDay(col("o_orderdate"))).as("f"),
        max(epochDay(col("o_orderdate"))).as("l"))
      .select(
        when(col("c_mktsegment") === "AUTOMOBILE", 1L).otherwise(2L).as("grp"),
        expr("(l - f) div 90").as("tq"),
        when(col("l") < epochDay(cutoff), 1L).otherwise(0L).as("ev"))
    val cells = per.groupBy(col("grp"), col("tq"))
      .agg(sum(col("ev")).as("d"), count(lit(1)).as("tot"))
      // referenced three times below (grp domain, tq domain, the cells
      // themselves) — materialize once instead of re-running the
      // orders⋈customer reduction per consumer
      .localCheckpoint(eager = false)
    // full grp × tq frame so at-risk counts carry through quarters
    // where one group has no exits (the q_jsd zero-cell pattern)
    val frame = cells.select(col("grp")).distinct()
      .crossJoin(cells.select(col("tq")).distinct())
      .join(cells, Seq("grp", "tq"), "left")
      .na.fill(0L, Seq("d", "tot"))
    val wRisk = Window.partitionBy(col("grp")).orderBy(col("tq").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val byT = frame.withColumn("n_at", sum(col("tot")).over(wRisk))
      .groupBy(col("tq")).agg(
        sum(when(col("grp") === 1, col("d"))).as("d1"),
        sum(col("d")).as("dt"),
        sum(when(col("grp") === 1, col("n_at"))).as("n1"),
        sum(col("n_at")).as("nt"))
      .filter(col("dt") > 0 && col("nt") > 1)
    byT.agg(
        sum(col("d1")).as("o1"),
        sum(expr("CAST(floor(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"))
          .as("e1_micro"),
        sum(expr("CAST(floor(CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE)) * (1.0 - CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE)) * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0) * 1000000 + 0.5) AS BIGINT)"))
          .as("v_micro"))
      .select(col("o1"), col("e1_micro"), col("v_micro"),
        expr("CAST(floor((CAST(o1 AS DOUBLE) - e1_micro / 1000000.0) * (CAST(o1 AS DOUBLE) - e1_micro / 1000000.0) / (v_micro / 1000000.0) * 1000 + 0.5) AS BIGINT)")
          .as("chi2_milli"))
  }

  /** l-diversity privacy audit over the (nation, market-segment)
    * quasi-identifier: k-anonymity says a group is large; l-diversity
    * says the SENSITIVE attribute (order priority) inside it is
    * actually varied — a 500-person cell where everyone is URGENT
    * still leaks. Reports distinct-l, entropy-l (e^H — the effective
    * number of sensitive values, robust to 99:1 skew that distinct-l
    * misses), and the l≥3 release gate. Counts collapse to the
    * (QI, sensitive) grid map-side; each n·ln n rounds to integer
    * micro-nats before the sum (order-independent), e^H is one fixed
    * double tree per ≤150-row output. */
  private[graft] def qLDiversity(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    cells.groupBy(col("nationkey"), col("c_mktsegment"))
      .agg(sum(col("n")).as("k_anon"),
        count(lit(1)).as("l_distinct"),
        sum(expr("CAST(floor(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"))
          .as("nlnn_micro"))
      .select(col("nationkey"), col("c_mktsegment"), col("k_anon"),
        col("l_distinct"),
        expr("CAST(floor(exp(ln(CAST(k_anon AS DOUBLE)) - (nlnn_micro / 1000000.0) / CAST(k_anon AS DOUBLE)) * 1000 + 0.5) AS BIGINT)")
          .as("entropy_l_milli"),
        when(col("l_distinct") >= 3, 1L).otherwise(0L).as("meets_l3"))
      .orderBy(col("nationkey"), col("c_mktsegment"))
  }

  /** Durbin-Watson autocorrelation diagnostic on the residuals of the
    * monthly-revenue trend regression — the standard "is this OLS fit
    * lying to you?" check (DW ≈ 2 means independent residuals; → 0
    * positive serial correlation, the usual failure of naive trend
    * lines on seasonal revenue). Closed-form OLS from five exact
    * integer moments (the q_regression contract — no iteration);
    * residuals are evaluated per month as one fixed double tree and
    * rounded to whole DOLLARS before squaring (cents² would overflow
    * int64 at 5e9-cent months; dollar² sums peak ~1e15). The lag
    * window runs over the ~80-row month DOMAIN, never row-scale data. */
  private[graft] def qDurbinWatson(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = t(s, dir, "orders")
      .groupBy(((year(col("o_orderdate")) - 1995) * 12 +
        month(col("o_orderdate")) - 1).cast("long").as("x"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("yc"))
    val sums = monthly.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"), sum(col("yc")).as("sy"),
      sum(col("x") * col("yc")).as("sxy"))
    val resid = monthly.crossJoin(broadcast(sums))
      .withColumn("b", expr("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"))
      .withColumn("a", expr("(CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"))
      .withColumn("ed", expr("CAST(floor((CAST(yc AS DOUBLE) - a - b * CAST(x AS DOUBLE)) / 100.0 + 0.5) AS BIGINT)"))
      .select(col("x"), col("ed"), col("b"))
    val lagged = resid
      .withColumn("ep", lag(col("ed"), 1).over(Window.orderBy(col("x"))))
    lagged.agg(count(lit(1)).as("n_months"),
        max(expr("CAST(floor(b / 100.0 * 1000 + 0.5) AS BIGINT)")).as("slope_dollar_milli"),
        sum(when(col("ep").isNotNull,
          (col("ed") - col("ep")) * (col("ed") - col("ep")))).as("num"),
        sum(col("ed") * col("ed")).as("den"))
      .select(col("n_months"), col("slope_dollar_milli"),
        expr("CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("dw_milli"),
        expr("CAST(floor((1.0 - CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 2.0) * 1000 + 0.5) AS BIGINT)").as("rho_milli"))
  }

  /** Page-Hinkley sequential drift detector over the daily-revenue
    * series — the STREAMING-style companion to q_cusum's retrospective
    * changepoint scan: PH_t = M_t − min_{τ≤t} M_τ where M is the
    * cumulative sum of slack-adjusted deviations, alarming as soon as
    * the series drifts above its historical minimum by λ. Division-
    * free: deviations are scaled by 200·n so the slack δ = mean/200
    * stays integer (d_t = 200·n·v_t − 201·s, exact), and both the
    * cumulative sum and its running minimum ride the calendar-bounded
    * day DOMAIN (~2.4k rows at any SF — the q_cusum discipline; the
    * fact table never sees a window). λ = 2·s ≡ 1% of total revenue
    * in the scaled units. */
  private[graft] def qPageHinkley(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .select(epochDay(col("o_orderdate")).as("day"),
        Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("day"))
      .agg(expr("sum(c) div 100000").as("v"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val scanned = daily.crossJoin(broadcast(tot))
      .withColumn("d", lit(200) * col("n") * col("v") - lit(201) * col("s"))
      .withColumn("m", sum(col("d")).over(w))
      .withColumn("runmin", min(col("m")).over(w))
      .withColumn("ph", col("m") - col("runmin"))
      .withColumn("alarm", when(col("ph") > lit(2) * col("s"), 1L).otherwise(0L))
    scanned.agg(max(col("n")).as("n_days"),
      sum(col("alarm")).as("n_alarms"),
      min(when(col("alarm") === 1, col("day"))).as("first_alarm_day"),
      max(col("ph")).as("max_ph"),
      max(lit(2) * col("s")).as("lambda_s"))
  }

  /** Rich-club coefficient of the co-purchase graph — do the hubs
    * trade with each other? φ(k) = 2·E₍>k₎ / (N₍>k₎·(N₍>k₎−1)) over
    * the subgraph induced by nodes of degree > k, swept over k ∈
    * {2,4,8,16}. The edge list is the q_triangles convention (same
    * shape, same skew bound); degrees are one groupBy of the edge
    * list; the induced-edge count per k is the edge list joined twice
    * against the (small) degree table and aggregated over the 4-value
    * k DOMAIN — no all-pairs, no windows, every shuffle carries
    * (int, long) pairs. φ in exact ppm by integer division. */
  private[graft] def qRichClub(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    val deg = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val ks = s.range(5).select((lit(2) * pow(lit(2), col("id") - 1))
        .cast("long").as("k")).filter(col("k") >= 2 && col("k") <= 16)
    val nRich = ks.crossJoin(deg).filter(col("deg") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_rich"))
    val eRich = edges
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
      .crossJoin(ks)
      .filter(col("du") > col("k") && col("dv") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("e_rich"))
    nRich.join(eRich, Seq("k"), "left").na.fill(0L, Seq("e_rich"))
      .filter(col("n_rich") > 1)
      .select(col("k"), col("n_rich"), col("e_rich"),
        expr("2 * e_rich * 1000000 div (n_rich * (n_rich - 1))").as("phi_ppm"))
      .orderBy(col("k"))
  }

  /** Newsvendor stocking level per brand — the inventory-theory
    * optimal order quantity: with underage cost 9× overage, stock at
    * the critical fractile F⁻¹(0.9) of weekly demand. Weekly demand
    * collapses map-side to the (brand, week) grid (~25×170 rows at
    * any SF — the windows run on that DOMAIN, never on lineitem); the
    * discrete quantile is the row_number = ⌈0.9·n⌉ row per brand,
    * ties broken by week for determinism. Emits the stock level, the
    * mean (one double division of exact integers), and the implied
    * overstock ratio. */
  private[graft] def qNewsvendor(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekly = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        expr("CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) div 7").as("wk"))
      .agg(expr("CAST(floor(sum(l_quantity) + 0.5) AS BIGINT)").as("dem"))
    val stats = weekly.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_weeks"), sum(col("dem")).as("sd"))
    val ranked = weekly.withColumn("rn",
      row_number().over(Window.partitionBy(col("p_brand"))
        .orderBy(col("dem"), col("wk"))).cast("long"))
    ranked.join(stats, "p_brand")
      .filter(col("rn") === expr("(9 * n_weeks + 9) div 10"))
      .select(col("p_brand"), col("n_weeks"), col("dem").as("stock_q"),
        expr("CAST(floor(CAST(sd AS DOUBLE) / CAST(n_weeks AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mean_dem_milli"),
        expr("CAST(floor(CAST(dem AS DOUBLE) * CAST(n_weeks AS DOUBLE) / CAST(sd AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("stock_to_mean_milli"))
      .orderBy(col("p_brand"))
  }

  /** Economic order quantity per brand — Wilson's EOQ = √(2DS/H)
    * with a $100 order cost and holding cost 20% of the brand's mean
    * unit price: the lot-sizing counterpart to q_newsvendor's safety
    * quantile. Annualized demand comes from total quantity over the
    * observed shipdate span (global span scalar broadcast); every
    * input is an exact integer sum and EOQ/orders-per-year are single
    * fixed double trees over them. */
  private[graft] def qEoq(s: SparkSession, dir: String): DataFrame = {
    val span = t(s, dir, "lineitem").agg(
      (max(epochDay(col("l_shipdate"))) - min(epochDay(col("l_shipdate"))) + 1)
        .as("span_days"))
    val byBrand = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(expr("CAST(floor(sum(l_quantity) + 0.5) AS BIGINT)").as("tq"),
        sum(Analytics.cents(col("p_retailprice"))).as("pc"),
        count(lit(1)).as("n"))
    byBrand.crossJoin(broadcast(span))
      .withColumn("d_annual", expr("CAST(floor(CAST(tq AS DOUBLE) * 365.0 / CAST(span_days AS DOUBLE) + 0.5) AS BIGINT)"))
      .withColumn("h_milli", expr("CAST(floor(0.2 * CAST(pc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 * 1000 + 0.5) AS BIGINT)"))
      .select(col("p_brand"), col("d_annual"), col("h_milli"),
        expr("CAST(floor(sqrt(2.0 * CAST(d_annual AS DOUBLE) * 100.0 / (h_milli / 1000.0))) AS BIGINT)").as("eoq_units"),
        expr("CAST(floor(CAST(d_annual AS DOUBLE) / floor(sqrt(2.0 * CAST(d_annual AS DOUBLE) * 100.0 / (h_milli / 1000.0))) * 1000 + 0.5) AS BIGINT)").as("orders_per_year_milli"))
      .orderBy(col("p_brand"))
  }

  /** Friedman rank test — the nonparametric repeated-measures ANOVA:
    * does any order priority consistently out-earn the others month
    * after month, judged only by WITHIN-month ranks (so a few huge
    * months can't drive the result the way q_anova_f's variance can
    * be driven)? Blocks are calendar months, treatments the 5
    * priorities; ranks come from a window over the (month × 5)-row
    * DOMAIN grid (exact-cent revenue, priority tie-break — both
    * engines rank identically); χ²_F = 12ΣR²/(nk(k+1)) − 3n(k+1) and
    * Kendall's W are fixed double trees over the exact integer rank
    * sums. Incomplete blocks are excluded (rank sums assume k rows). */
  private[graft] def qFriedman(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = t(s, dir, "orders")
      .groupBy(((year(col("o_orderdate")) - 1995) * 12 +
          month(col("o_orderdate")) - 1).cast("long").as("m"),
        col("o_orderpriority"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("rev"))
    val complete = monthly.groupBy(col("m"))
      .agg(count(lit(1)).as("kk")).filter(col("kk") === 5).select(col("m"))
    val ranked = monthly.join(complete, "m")
      .withColumn("r", row_number().over(Window.partitionBy(col("m"))
        .orderBy(col("rev"), col("o_orderpriority"))).cast("long"))
    val rsums = ranked.groupBy(col("o_orderpriority"))
      .agg(sum(col("r")).as("rj"), count(lit(1)).as("n"))
    rsums.agg(max(col("n")).as("n_blocks"), count(lit(1)).as("k"),
        sum(col("rj") * col("rj")).as("sr2"))
      .select(col("n_blocks"), col("k"),
        expr("CAST(floor((12.0 * CAST(sr2 AS DOUBLE) / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) - 3.0 * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) * 1000 + 0.5) AS BIGINT)").as("chi2_milli"),
        expr("CAST(floor((12.0 * CAST(sr2 AS DOUBLE) / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) - 3.0 * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) / (CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)) * 1000 + 0.5) AS BIGINT)").as("kendall_w_milli"))
  }

  /** Hodges-Lehmann shift estimator for the URGENT−LOW order-value
    * gap — the median of all pairwise differences: the robust effect
    * size that pairs with q_mann_whitney the way the mean gap pairs
    * with q_welch_t (breakdown point 29%, immune to the spend tail).
    * Each arm is capped to its 500 lowest-md5 orders (deterministic,
    * SF-independent — the pair matrix is bounded 250k at ANY scale,
    * never n²); the median of differences is an exact
    * two-middle-order-statistics sum (×2, no halving) off one bounded
    * sort. */
  private[graft] def qHodgesLehmann(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def arm(p: String, tag: String) = t(s, dir, "orders")
      .filter(col("o_orderpriority") === p)
      .select(col("o_orderkey").as(s"k_$tag"),
        Analytics.cents(col("o_totalprice")).as(s"c_$tag"),
        h60(concat(lit(s"hl$tag|"), col("o_orderkey").cast("string"))).as("h"))
      .orderBy(col("h"), col(s"k_$tag")).limit(500).drop("h")
    val diffs = arm("1-URGENT", "a").crossJoin(arm("5-LOW", "b"))
      .select((col("c_a") - col("c_b")).as("d"), col("k_a"), col("k_b"))
    val n = diffs.agg(count(lit(1)).as("n_pairs"))
    // unpartitioned window: BOUNDED-BY-CONSTRUCTION — each arm is
    // capped at 500 rows above, so this ranks <= 250k rows at ANY SF
    // (a sampling-capped probe, not a data-proportional funnel)
    val ranked = diffs.withColumn("rn",
      row_number().over(Window.orderBy(col("d"), col("k_a"), col("k_b"))).cast("long"))
    ranked.crossJoin(broadcast(n))
      .filter(col("rn") === expr("(n_pairs + 1) div 2") ||
        col("rn") === expr("n_pairs div 2 + 1"))
      .agg(max(col("n_pairs")).as("n_pairs"), sum(col("d")).as("sd"),
        count(lit(1)).as("c"))
      // odd n: the single middle row counts twice (×2 keeps it exact)
      .select(col("n_pairs"),
        when(col("c") === 1, col("sd") * 2).otherwise(col("sd")).as("hl_x2_cents"))
      .select(col("n_pairs"), col("hl_x2_cents"),
        expr("CAST(floor(hl_x2_cents / 2.0 / 100.0 * 1000 + 0.5) AS BIGINT)").as("hl_shift_dollar_milli"))
  }

  /** t-closeness audit completing the k-anonymity → l-diversity →
    * t-closeness privacy ladder: a group can be large (k) and varied
    * (l) yet still leak because its sensitive DISTRIBUTION differs
    * from the table's — t-closeness bounds the ordered-EMD between
    * the two. For the ordinal priority attribute EMD is
    * Σᵢ|cum(p−q)| / (k−1), computed cross-multiplied so every
    * cumulative term is an EXACT integer (n_gj·N − N_j·n_g — no
    * rational leaves the plan); the cum window runs over the
    * (group × 5)-row DOMAIN grid with zero-filled cells. Emits exact
    * ppm and the t ≤ 0.2 release gate. */
  private[graft] def qTCloseness(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment"), col("o_orderpriority"))
    val cells = base.groupBy(col("nationkey"), col("c_mktsegment"),
      col("o_orderpriority")).agg(count(lit(1)).as("n"))
      // feeds groups, the global margins, and the grid join — one
      // materialization of the orders⋈customer reduction
      .localCheckpoint(eager = false)
    val groups = cells.groupBy(col("nationkey"), col("c_mktsegment"))
      .agg(sum(col("n")).as("ng"))
    val global = cells.groupBy(col("o_orderpriority"))
      .agg(sum(col("n")).as("nj"))
    val tot = global.agg(sum(col("nj")).as("nn"), count(lit(1)).as("k"))
    val grid = groups.crossJoin(broadcast(global))
      .join(cells, Seq("nationkey", "c_mktsegment", "o_orderpriority"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .withColumn("term", col("n") * col("nn") - col("nj") * col("ng"))
    val w = Window.partitionBy(col("nationkey"), col("c_mktsegment"))
      .orderBy(col("o_orderpriority"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.withColumn("cum", sum(col("term")).over(w))
      // the k-th cumulative is identically 0; summing |cum| over all k
      // rows equals the textbook k−1 inner boundaries
      .groupBy(col("nationkey"), col("c_mktsegment"))
      .agg(max(col("ng")).as("n_g"), sum(abs(col("cum"))).as("sabs"),
        max(col("nn")).as("nn"), max(col("k")).as("k"))
      .select(col("nationkey"), col("c_mktsegment"), col("n_g"),
        expr("sabs * 1000000 div (n_g * nn * (k - 1))").as("emd_ppm"),
        expr("CASE WHEN sabs * 1000000 div (n_g * nn * (k - 1)) <= 200000 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END").as("meets_t02"))
      .orderBy(col("nationkey"), col("c_mktsegment"))
  }

  /** Little's law WIP audit — L = λ·W cross-checked against directly
    * observed work-in-progress: throughput λ (orders/day over the
    * span), flow time W (order → LAST ship, exact day sums), and the
    * observed L sampled as the count of open orders on each
    * quarter-start day. The sample-day probe is a broadcast of ~26
    * dates against the per-order [start, end] interval table (one
    * narrow pass — the q_peak_concurrency shape, never a per-day
    * window); agreement ratio in milli flags intake/shipping drift.
    * Orders with no lineitem (no ship date) are excluded from W and
    * from the open set alike. */
  private[graft] def qLittleLaw(s: SparkSession, dir: String): DataFrame = {
    val spans = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(epochDay(col("l_shipdate"))).as("ship_end"))
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        epochDay(col("o_orderdate")).as("start")),
        col("l_orderkey") === col("o_orderkey"))
    val tot = spans.agg(count(lit(1)).as("n_orders"),
      sum(col("ship_end") - col("start")).as("sum_lag"),
      min(col("start")).as("d0"), max(col("start")).as("d1"))
    val sampleDays = spans.sparkSession.range(40)
      .crossJoin(broadcast(tot))
      .select((col("d0") + col("id") * 90).as("day"), col("d1"))
      .filter(col("day") <= col("d1")).select(col("day"))
    val lObs = spans.crossJoin(broadcast(sampleDays))
      .filter(col("start") <= col("day") && col("day") < col("ship_end"))
      .groupBy(col("day")).agg(count(lit(1)).as("open_cnt"))
      .agg(count(lit(1)).as("n_days"), sum(col("open_cnt")).as("sum_open"))
    lObs.crossJoin(broadcast(tot))
      .select(col("n_orders"), col("n_days"),
        expr("CAST(floor(CAST(sum_lag AS DOUBLE) / CAST(n_orders AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("w_days_milli"),
        expr("CAST(floor(CAST(n_orders AS DOUBLE) / CAST(d1 - d0 + 1 AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("lambda_milli"),
        expr("CAST(floor(CAST(n_orders AS DOUBLE) / CAST(d1 - d0 + 1 AS DOUBLE) * (CAST(sum_lag AS DOUBLE) / CAST(n_orders AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("l_little_milli"),
        expr("CAST(floor(CAST(sum_open AS DOUBLE) / CAST(n_days AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("l_observed_milli"),
        expr("CAST(floor(CAST(sum_open AS DOUBLE) / CAST(n_days AS DOUBLE) / (CAST(n_orders AS DOUBLE) / CAST(d1 - d0 + 1 AS DOUBLE) * (CAST(sum_lag AS DOUBLE) / CAST(n_orders AS DOUBLE))) * 1000 + 0.5) AS BIGINT)").as("agreement_milli"))
  }

  /** Mood's median test across the five order priorities — the
    * coarsest, most outlier-proof of the k-group location tests
    * (only above/below the grand median enters; a 1000× spend whale
    * moves nothing): the χ² companion q_kruskal_wallis refines.
    * The grand median collapses onto the distinct-cents value DOMAIN
    * (q_weighted_median's discipline — the fact table never sees a
    * window); the 2×5 contingency is one broadcast-threshold pass;
    * each group's (O−E)²/E contribution rounds to integer micro
    * BEFORE the k-term sum. */
  private[graft] def qMoodMedian(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = t(s, dir, "orders")
      .select(col("o_orderpriority").as("grp"),
        Analytics.cents(col("o_totalprice")).as("c"))
    val dom = vals.groupBy(col("c")).agg(count(lit(1)).as("cnt"))
    val tot = dom.agg(sum(col("cnt")).as("n"))
    val w = Window.orderBy(col("c")).rowsBetween(Window.unboundedPreceding, 0)
    val med = dom.withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("cum") * 2 >= col("n"))
      .agg(min(col("c")).as("med"))
    val cont = vals.crossJoin(broadcast(med))
      .groupBy(col("grp"))
      .agg(sum(when(col("c") > col("med"), 1L).otherwise(0L)).as("a"),
        count(lit(1)).as("ng"))
    val tots = cont.agg(sum(col("a")).as("ta"), sum(col("ng")).as("nn"))
    val terms = cont.crossJoin(broadcast(tots)).crossJoin(broadcast(med))
      .select(expr("""CAST(floor((
          (CAST(a AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(nn AS DOUBLE))
          * (CAST(a AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(nn AS DOUBLE))
          / (CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(nn AS DOUBLE))
        + (CAST(ng - a AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(nn - ta AS DOUBLE) / CAST(nn AS DOUBLE))
          * (CAST(ng - a AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(nn - ta AS DOUBLE) / CAST(nn AS DOUBLE))
          / (CAST(ng AS DOUBLE) * CAST(nn - ta AS DOUBLE) / CAST(nn AS DOUBLE))
        ) * 1000000 + 0.5) AS BIGINT)""").as("term_micro"),
        col("nn"), col("med"))
    terms.groupBy(col("nn").as("n_total"), col("med").as("median_cents"))
      .agg(sum(col("term_micro")).as("chi2_micro"))
      .select(col("n_total"), col("median_cents"), col("chi2_micro"))
  }

  /** Gumbel extreme-value fit on monthly block maxima of daily
    * revenue — the capacity-planning tail model: method-of-moments
    * (β = s√6/π, μ = x̄ − γβ) plus the 100-month return level
    * μ − β·ln(−ln(1−1/100)) that answers "what daily peak should we
    * provision for?". Block maxima reduce map-side to the ~80-row
    * month DOMAIN; mean and variance come from exact integer dollar
    * moments (dollar² keeps Σm² inside both int64 and the 2⁵³ double
    * mantissa at driver SFs); every emitted figure is one fixed
    * double tree. */
  private[graft] def qGumbelFit(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100").as("d"))
    val maxima = daily.groupBy(expr("day div 30").as("blk"))
      .agg(max(col("d")).as("m"))
    maxima.agg(count(lit(1)).as("n_blocks"), sum(col("m")).as("sm"),
        sum(col("m") * col("m")).as("smm"))
      .select(col("n_blocks"),
        expr("CAST(floor(CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mean_max_milli"),
        expr("CAST(floor(sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)) / (CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / pi() * 1000 + 0.5) AS BIGINT)").as("beta_milli"),
        expr("CAST(floor((CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE) - 0.5772156649 * sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)) / (CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / pi()) * 1000 + 0.5) AS BIGINT)").as("mu_milli"),
        expr("CAST(floor((CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE) - 0.5772156649 * sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)) / (CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / pi() - sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)) / (CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / pi() * ln(-ln(1.0 - 1.0 / 100.0))) * 1000 + 0.5) AS BIGINT)").as("return_100_milli"))
  }

  /** Ljung-Box portmanteau test on daily revenue — "is there ANY
    * autocorrelation in the first 7 lags?" as one statistic, the
    * formal companion to q_acf's per-lag readout (and the standard
    * residual-whiteness gate after fitting q_holt/q_stl_lite models).
    * Deviations are cross-multiplied to exact integers (d_t = n·x_t −
    * S — no division before the ratio); lag pairs come from ONE
    * band-join on the dense day index (|Δidx| ≤ 7 — never 7 separate
    * joins); each r²ₖ/(n−k) term rounds to integer pico BEFORE the
    * cumulative sum, and Q_h is emitted for every h ≤ 7 off the
    * 7-row lag DOMAIN. */
  private[graft] def qLjungBox(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100000").as("x"))
    val idxd = daily.withColumn("idx",
      row_number().over(Window.orderBy(col("day"))).cast("long"))
    val tot = idxd.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val dev = idxd.crossJoin(broadcast(tot))
      .select(col("idx"), (col("n") * col("x") - col("sx")).as("d"),
        col("n"))
    val den = dev.agg(sum(col("d") * col("d")).as("den"), max(col("n")).as("n"))
    val nums = dev.as("a").join(dev.as("b"),
        col("b.idx") - col("a.idx") >= 1 && col("b.idx") - col("a.idx") <= 7)
      .groupBy((col("b.idx") - col("a.idx")).as("k"))
      .agg(sum(col("a.d") * col("b.d")).as("num"))
    val terms = nums.crossJoin(broadcast(den))
      .select(col("k"), col("n"),
        expr("CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("r_micro"),
        expr("CAST(floor((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) * 1000000000000 + 0.5) AS BIGINT)").as("term_pico"))
    val wk = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)
    terms.withColumn("cum_pico", sum(col("term_pico")).over(wk))
      .select(col("k"), col("r_micro"),
        expr("CAST(floor(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * (cum_pico / 1000000000000.0) * 1000 + 0.5) AS BIGINT)").as("q_milli"))
      .orderBy(col("k"))
  }

  /** Kaplan-Meier curve WITH its Greenwood 95% confidence band —
    * q_survival's point estimate plus the uncertainty a release
    * decision actually needs: Var(ln Ŝ) ≈ Σ d/(n(n−d)) accumulated
    * in integer pico-nats² per tenure bucket (per-term rounding, the
    * same log-space discipline as the estimate itself), the band as
    * ln Ŝ ± 1.96·SE in micro-nats. All windows run over the bounded
    * tenure-quarter DOMAIN; a bucket where everyone at risk exits
    * pins both the estimate and the variance at their caps. */
  private[graft] def qKmCi(s: SparkSession, dir: String): DataFrame = {
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
      .withColumn("gw_pico",
        when(col("at_risk") > col("d"),
          expr("CAST(floor(CAST(d AS DOUBLE) / (CAST(at_risk AS DOUBLE) * CAST(at_risk - d AS DOUBLE)) * 1000000000000 + 0.5) AS BIGINT)"))
          .otherwise(lit(999999999999L)))
      .withColumn("log_surv_micro", sum(col("term_micro")).over(wCum))
      .withColumn("var_pico", sum(col("gw_pico")).over(wCum))
      .withColumn("se_micro",
        expr("CAST(floor(sqrt(var_pico / 1000000000000.0) * 1000000 + 0.5) AS BIGINT)"))
      .select(col("tq"), col("at_risk"), col("log_surv_micro"), col("se_micro"),
        (col("log_surv_micro") -
          expr("CAST(floor(1.96 * CAST(se_micro AS DOUBLE) + 0.5) AS BIGINT)")).as("lo_micro"),
        (col("log_surv_micro") +
          expr("CAST(floor(1.96 * CAST(se_micro AS DOUBLE) + 0.5) AS BIGINT)")).as("hi_micro"))
      .orderBy(col("tq"))
  }

  /** Quantile treatment effect — URGENT−LOW order value compared at
    * every decile, not just the mean: the distributional view that
    * shows WHERE the gap lives (a tail-only effect and a uniform
    * shift have the same mean difference). Per-arm counts collapse
    * onto the distinct-cents value DOMAIN (q_weighted_median's
    * discipline); the nearest-rank decile is the 10·cum ≥ d·n
    * integer selection — ceil with no division — resolved per (arm,
    * decile) over the broadcast 9-row decile list. */
  private[graft] def qQte(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = t(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(when(col("o_orderpriority") === "1-URGENT", "U").otherwise("L").as("grp"),
        Analytics.cents(col("o_totalprice")).as("c"))
    val dom = base.groupBy(col("grp"), col("c")).agg(count(lit(1)).as("cnt"))
      // value-domain table is read by ng and the cumulative pass —
      // materialize once
      .localCheckpoint(eager = false)
    val ng = dom.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    val wcum = Window.partitionBy(col("grp")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cums = dom.withColumn("cum", sum(col("cnt")).over(wcum)).join(ng, "grp")
    val decs = s.range(1, 10).select(col("id").as("d"))
    val qv = cums.crossJoin(broadcast(decs))
      .filter(col("cum") * 10 >= col("d") * col("n"))
      .groupBy(col("d"), col("grp")).agg(min(col("c")).as("v"))
    qv.groupBy(col("d"))
      .agg(min(when(col("grp") === "U", col("v"))).as("v_urgent"),
        min(when(col("grp") === "L", col("v"))).as("v_low"))
      .select(col("d"), col("v_urgent"), col("v_low"),
        (col("v_urgent") - col("v_low")).as("qte_cents"))
      .orderBy(col("d"))
  }

  /** Energy distance between the URGENT and LOW order-value
    * distributions — the metric that is zero IFF the distributions
    * are equal (Székely's E-statistic), catching shape differences
    * that mean tests (q_welch_t) and even QTE deciles smooth over.
    * Arms are md5-capped to 300 orders each (all three pair sets
    * bounded ~90k at ANY SF); every |Δ| sum is an exact cent
    * integer; 2E|X−Y| − E|X−X'| − E|Y−Y'| is one fixed double tree
    * over three integer sums and three integer counts. */
  private[graft] def qEnergyDistance(s: SparkSession, dir: String): DataFrame = {
    def arm(p: String, tag: String) = t(s, dir, "orders")
      .filter(col("o_orderpriority") === p)
      .select(col("o_orderkey").as("k"),
        Analytics.cents(col("o_totalprice")).as("c"),
        h60(concat(lit(s"ed$tag|"), col("o_orderkey").cast("string"))).as("h"))
      .orderBy(col("h"), col("k")).limit(300).drop("h")
      .localCheckpoint(eager = false)
    val x = arm("1-URGENT", "a")
    val y = arm("5-LOW", "b")
    val sxy = x.as("x").crossJoin(y.as("y"))
      .agg(sum(abs(col("x.c") - col("y.c"))).as("sxy"), count(lit(1)).as("nxy"))
    val sxx = x.as("a").join(x.as("b"), col("a.k") < col("b.k"))
      .agg(sum(abs(col("a.c") - col("b.c"))).as("sxx"), count(lit(1)).as("nxx"))
    val syy = y.as("a").join(y.as("b"), col("a.k") < col("b.k"))
      .agg(sum(abs(col("a.c") - col("b.c"))).as("syy"), count(lit(1)).as("nyy"))
    sxy.crossJoin(sxx).crossJoin(syy)
      .select(col("nxy"),
        expr("CAST(floor(CAST(sxy AS DOUBLE) / CAST(nxy AS DOUBLE) / 100.0 * 1000 + 0.5) AS BIGINT)").as("exy_milli"),
        expr("CAST(floor(CAST(sxx AS DOUBLE) / CAST(nxx AS DOUBLE) / 100.0 * 1000 + 0.5) AS BIGINT)").as("exx_milli"),
        expr("CAST(floor(CAST(syy AS DOUBLE) / CAST(nyy AS DOUBLE) / 100.0 * 1000 + 0.5) AS BIGINT)").as("eyy_milli"),
        expr("CAST(floor((2.0 * CAST(sxy AS DOUBLE) / CAST(nxy AS DOUBLE) - CAST(sxx AS DOUBLE) / CAST(nxx AS DOUBLE) - CAST(syy AS DOUBLE) / CAST(nyy AS DOUBLE)) / 100.0 * 1000 + 0.5) AS BIGINT)").as("energy_milli"))
  }

  /** Individuals/Moving-Range (I-MR) control chart on daily revenue —
    * the variables-chart companion to q_pchart's attribute chart, for
    * the n=1-per-period case every daily KPI lives in: center = x̄,
    * limits = x̄ ± 2.66·M̄R (the Shewhart d₂=1.128 constant folded
    * in). The moving range is one lag over the calendar-bounded day
    * DOMAIN; mean and M̄R come from exact integer sums; breach counts
    * are integers, limits fixed double trees. */
  private[graft] def qImrChart(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100").as("x"))
    val mr = daily
      .withColumn("xp", lag(col("x"), 1).over(Window.orderBy(col("day"))))
      .withColumn("mr", abs(col("x") - col("xp")))
    val stats = mr.agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
      sum(col("mr")).as("smr"), count(col("mr")).as("nmr"))
    mr.crossJoin(broadcast(stats))
      .select(col("day"), col("x"), col("n_days"), col("sx"), col("smr"), col("nmr"))
      .withColumn("ucl", expr("CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) + 2.66 * CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE)"))
      .withColumn("lcl", expr("CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) - 2.66 * CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE)"))
      .agg(max(col("n_days")).as("n_days"),
        expr("CAST(floor(max(CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("center_milli"),
        expr("CAST(floor(max(CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("mrbar_milli"),
        expr("CAST(floor(max(ucl) * 1000 + 0.5) AS BIGINT)").as("ucl_milli"),
        expr("CAST(floor(max(lcl) * 1000 + 0.5) AS BIGINT)").as("lcl_milli"),
        sum(when(col("x").cast("double") > col("ucl"), 1L).otherwise(0L)).as("n_above_ucl"),
        sum(when(col("x").cast("double") < col("lcl"), 1L).otherwise(0L)).as("n_below_lcl"))
  }

  /** Two-level binary segmentation over the daily-revenue series —
    * q_cusum finds ONE level shift; real series have several, and
    * binary segmentation is the standard greedy recursion: split at
    * the global |CUSUM| argmax, then re-run the same exact statistic
    * INSIDE each half. Segment-local C_t = n_s·S_t − t_s·S_s stays a
    * pure integer (prefix sums re-based per segment by subtracting
    * the boundary prefix — no division, no floats); all windows ride
    * the calendar-bounded day DOMAIN, and the level-1 argmax is a
    * broadcast 1-row join, not a collect. */
  private[graft] def qBinarySegmentation(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100000").as("v"))
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    val pre = daily
      .withColumn("tpos", count(lit(1)).over(w))
      .withColumn("st", sum(col("v")).over(w))
      .localCheckpoint(eager = false)
    val tot = pre.agg(max(col("tpos")).as("n"), max(col("st")).as("sAll"))
    val lvl1 = pre.crossJoin(broadcast(tot))
      .withColumn("c", col("n") * col("st") - col("tpos") * col("sAll"))
      .filter(col("tpos") < col("n"))
      .orderBy(abs(col("c")).desc, col("day")).limit(1)
      .select(col("day").as("cp1"), col("tpos").as("t1"), col("st").as("s1"),
        col("n"), col("sAll"), col("c").as("c1"))
    val halves = pre.crossJoin(broadcast(lvl1))
      .withColumn("seg", when(col("day") <= col("cp1"), "left").otherwise("right"))
      .withColumn("t_s", when(col("seg") === "left", col("tpos"))
        .otherwise(col("tpos") - col("t1")))
      .withColumn("st_s", when(col("seg") === "left", col("st"))
        .otherwise(col("st") - col("s1")))
      .withColumn("n_s", when(col("seg") === "left", col("t1"))
        .otherwise(col("n") - col("t1")))
      .withColumn("sum_s", when(col("seg") === "left", col("s1"))
        .otherwise(col("sAll") - col("s1")))
      .withColumn("c", col("n_s") * col("st_s") - col("t_s") * col("sum_s"))
      .filter(col("t_s") < col("n_s") && col("t_s") > 0)
    val lvl2 = halves
      .withColumn("rn", row_number().over(Window.partitionBy(col("seg"))
        .orderBy(abs(col("c")).desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("seg"), col("day").as("cp_day"), col("c").as("cusum"),
        col("t_s").as("pos_in_seg"), col("n_s").as("seg_len"))
    val lvl1Row = lvl1.select(lit("all").as("seg"), col("cp1").as("cp_day"),
      col("c1").as("cusum"), col("t1").as("pos_in_seg"), col("n").as("seg_len"))
    lvl1Row.unionByName(lvl2).orderBy(col("seg"))
  }

  /** Croston-SBA intermittent-demand forecast per brand — the
    * standard answer where q_holt's smoothing breaks down: demand
    * that is ZERO most weeks (spare parts, long-tail SKUs) needs the
    * size-of-demand and interval-between-demands modeled separately.
    * Non-recursive SBA form: forecast = 0.95·(mean nonzero size)/
    * (mean inter-demand interval); intervals come from one lag over
    * each brand's demand-week DOMAIN; every mean is a single double
    * division of exact integer sums. Also emits the zero-week share
    * (the intermittency gate that decides Croston vs Holt). */
  private[graft] def qCroston(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekly = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .filter(col("l_partkey") % 25 === 0)
      .groupBy(col("p_brand"),
        expr("CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) div 7").as("wk"))
      .agg(expr("CAST(floor(sum(l_quantity) + 0.5) AS BIGINT)").as("dem"))
    val span = weekly.agg(min(col("wk")).as("w0"), max(col("wk")).as("w1"))
    val sizes = weekly.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_demand_weeks"), sum(col("dem")).as("sdem"))
    val gaps = weekly
      .withColumn("pw", lag(col("wk"), 1).over(
        Window.partitionBy(col("p_brand")).orderBy(col("wk"))))
      .filter(col("pw").isNotNull)
      .groupBy(col("p_brand"))
      .agg(sum(col("wk") - col("pw")).as("sgap"), count(lit(1)).as("ngap"))
    sizes.join(gaps, "p_brand").crossJoin(broadcast(span))
      .select(col("p_brand"), col("n_demand_weeks"),
        expr("(w1 - w0 + 1 - n_demand_weeks) * 1000000 div (w1 - w0 + 1)").as("zero_share_ppm"),
        expr("CAST(floor(CAST(sdem AS DOUBLE) / CAST(n_demand_weeks AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mean_size_milli"),
        expr("CAST(floor(CAST(sgap AS DOUBLE) / CAST(ngap AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mean_interval_milli"),
        expr("CAST(floor(0.95 * (CAST(sdem AS DOUBLE) / CAST(n_demand_weeks AS DOUBLE)) / (CAST(sgap AS DOUBLE) / CAST(ngap AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("sba_forecast_milli"))
      .orderBy(col("p_brand"))
  }

  /** Mantel-Haenszel common odds ratio of high-value ordering
    * (above-median spend) for URGENT vs LOW, stratified by customer
    * nation — the Simpson's-paradox-proof pooling q_simpsons
    * motivates and q_odds_ratio lacks: per-nation 2×2 tables
    * combined as Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ), never by collapsing the
    * strata. The spend median collapses onto the value DOMAIN
    * (q_mood_median's discipline); each stratum term rounds to
    * integer micro BEFORE the sums; crude and MH odds ratios are
    * emitted side by side so the confounding gap is the readout. */
  private[graft] def qMantelHaenszel(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = t(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nat"),
        (col("o_orderpriority") === "1-URGENT").as("exposed"),
        Analytics.cents(col("o_totalprice")).as("c"))
    val dom = base.groupBy(col("c")).agg(count(lit(1)).as("cnt"))
    val tot = dom.agg(sum(col("cnt")).as("n"))
    val med = dom.withColumn("cum",
        sum(col("cnt")).over(Window.orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .filter(col("cum") * 2 >= col("n")).agg(min(col("c")).as("med"))
    val cells = base.crossJoin(broadcast(med))
      .groupBy(col("nat"))
      .agg(sum(when(col("exposed") && col("c") > col("med"), 1L).otherwise(0L)).as("a"),
        sum(when(col("exposed") && col("c") <= col("med"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("exposed") && col("c") > col("med"), 1L).otherwise(0L)).as("cc"),
        sum(when(!col("exposed") && col("c") <= col("med"), 1L).otherwise(0L)).as("d"))
      .withColumn("ni", col("a") + col("b") + col("cc") + col("d"))
      .filter(col("b") > 0 && col("cc") > 0)
    cells.agg(count(lit(1)).as("n_strata"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("cc")).as("sc"), sum(col("d")).as("sd"),
        sum(expr("CAST(floor(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(ni AS DOUBLE) * 1000000 + 0.5) AS BIGINT)")).as("num_micro"),
        sum(expr("CAST(floor(CAST(b AS DOUBLE) * CAST(cc AS DOUBLE) / CAST(ni AS DOUBLE) * 1000000 + 0.5) AS BIGINT)")).as("den_micro"))
      .select(col("n_strata"),
        expr("CAST(floor(CAST(sa AS DOUBLE) * CAST(sd AS DOUBLE) / (CAST(sb AS DOUBLE) * CAST(sc AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("crude_or_milli"),
        expr("CAST(floor(CAST(num_micro AS DOUBLE) / CAST(den_micro AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mh_or_milli"))
  }

  /** Fano factor + negative-binomial overdispersion of the event
    * arrival process per type — the point-process health check
    * q_poisson_rate assumes away: a Poisson stream has F = var/mean
    * = 1 on ANY window; F ≫ 1 means bursty arrivals (bots, retries,
    * thundering herds) and the NB α = (F−1)/mean is the dispersion a
    * capacity model should use instead. Hourly counts collapse
    * map-side; empty hours enter through the global hour-span H (not
    * by materializing zeros); every moment is an exact integer and
    * F/α are fixed double trees per ≤10-row output. */
  private[graft] def qFanoFactor(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("event_type"), expr("ts div 1000000000 div 3600").as("hr"))
    val span = e.agg((max(col("hr")) - min(col("hr")) + 1).as("h"))
    val hourly = e.groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("c"))
    hourly.groupBy(col("event_type"))
      .agg(sum(col("c")).as("nt"), count(lit(1)).as("nonzero_hours"),
        sum(col("c") * col("c")).as("scc"))
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("nt").as("n_events"),
        col("h").as("n_hours"), col("nonzero_hours"),
        expr("CAST(floor((CAST(scc AS DOUBLE) / CAST(h AS DOUBLE) - (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE)) * (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE))) / (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("fano_milli"),
        expr("CAST(floor(((CAST(scc AS DOUBLE) / CAST(h AS DOUBLE) - (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE)) * (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE))) / (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE)) - 1.0) / (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("nb_alpha_milli"))
      .orderBy(col("event_type"))
  }

  /** Atkinson inequality index (ε = 1) of customer spend per nation —
    * the welfare-grounded complement to q_lorenz_gini: A = 1 −
    * geomean/mean reads directly as "the share of total spend society
    * could discard and be as well off under equality", and ε makes
    * the inequality-aversion explicit where Gini hides it. Σln x
    * rounds per-term to micro (q_geo_mean's contract); one fixed
    * double tree per nation row. */
  private[graft] def qAtkinson(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100").as("xd"))
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey").cast("long").as("nat"))),
        col("o_custkey") === col("c_custkey"))
    cust.groupBy(col("nat"))
      .agg(count(lit(1)).as("n"), sum(col("xd")).as("sx"),
        sum(expr("CAST(floor(ln(CAST(xd AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")).as("slnx_micro"))
      .select(col("nat"), col("n"),
        expr("CAST(floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mean_dollar_milli"),
        expr("CAST(floor(exp((slnx_micro / 1000000.0) / CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("geomean_dollar_milli"),
        expr("CAST(floor((1.0 - exp((slnx_micro / 1000000.0) / CAST(n AS DOUBLE)) / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)").as("atkinson_ppm"))
      .orderBy(col("nat"))
  }

  /** One EM step of a 2-component Gaussian mixture on log customer
    * spend — "is the customer base one population or two?" answered
    * with the actual EM update, distributed: responsibilities are a
    * per-row fixed double tree (equal priors, moment-derived init:
    * μ₁ = Q1, μ₂ = Q3 off the value DOMAIN, shared σ from exact
    * global moments), rounded to integer micro BEFORE the weighted
    * M-step sums — so the new means and mixing weight are ratios of
    * exact integers. Each further EM step at scale is the same
    * single aggregation. */
  private[graft] def qEmGauss2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = t(s, dir, "orders").groupBy(col("o_custkey"))
      // milli-scale log spend: Σx² safe in int64 at any driver SF
      .agg(expr("CAST(floor(ln(sum(o_totalprice)) * 1000 + 0.5) AS BIGINT)").as("x"))
      .select(col("x")).localCheckpoint(eager = false)
    val dom = cust.groupBy(col("x")).agg(count(lit(1)).as("cnt"))
    val tot = cust.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val cums = dom.withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("x")).rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
    val q1 = cums.filter(col("cum") * 4 >= col("n")).agg(min(col("x")).as("mu1"))
    val q3 = cums.filter(col("cum") * 4 >= col("n") * 3).agg(min(col("x")).as("mu2"))
    val params = tot.crossJoin(q1).crossJoin(q3)
      .withColumn("s2", expr("(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)"))
    val resp = cust.crossJoin(broadcast(params))
      .withColumn("r2_micro",
        expr("""CAST(floor(1.0 / (1.0 + exp(
            ((CAST(x AS DOUBLE) - CAST(mu2 AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(mu2 AS DOUBLE))
           - (CAST(x AS DOUBLE) - CAST(mu1 AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(mu1 AS DOUBLE)))
            / (2.0 * s2))) * 1000000 + 0.5) AS BIGINT)"""))
    resp.agg(max(col("n")).as("n"), max(col("mu1")).as("mu1_init_milli"),
        max(col("mu2")).as("mu2_init_milli"),
        sum(col("r2_micro")).as("sr2"),
        sum(expr("r2_micro * x")).as("sr2x"),
        sum(expr("(1000000 - r2_micro) * x")).as("sr1x"))
      .select(col("n"), col("mu1_init_milli"), col("mu2_init_milli"),
        expr("sr2 div n").as("pi2_ppm"),
        expr("CAST(floor(CAST(sr1x AS DOUBLE) / CAST(1000000 * n - sr2 AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mu1_new_micro"),
        expr("CAST(floor(CAST(sr2x AS DOUBLE) / CAST(sr2 AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mu2_new_micro"))
  }

  /** Local bridges of the co-purchase graph — edges whose endpoints
    * share NO common neighbor (span ≥ 3): the weak-tie structure
    * Granovetter's theory says carries novel information, and the
    * edges whose removal most lengthens paths. Complement of the
    * triangle machinery: an edge is wedge-closed iff it appears as
    * an (e1.u, e2.v) pair of some 2-path, so bridges = edges
    * LEFT ANTI JOIN closed pairs — three bounded equi-joins on the
    * q_triangles edge convention, no all-pairs, no windows. Emits
    * count + the 10 highest-degree-sum bridges. */
  private[graft] def qLocalBridges(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    // undirected adjacency for the wedge join
    val adj = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val closed = adj.as("e1").join(adj.as("e2"),
        col("e1.v") === col("e2.u") && col("e1.u") =!= col("e2.v"))
      .select(least(col("e1.u"), col("e2.v")).as("u"),
        greatest(col("e1.u"), col("e2.v")).as("v"))
      .distinct()
    val deg = adj.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    val bridges = edges.join(closed, Seq("u", "v"), "left_anti")
    val top = bridges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .orderBy((col("du") + col("dv")).desc, col("u"), col("v")).limit(10)
    val n = bridges.agg(count(lit(1)).as("n_bridges"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
    top.crossJoin(broadcast(n))
      .select(col("u"), col("v"), col("du") + col("dv") as "deg_sum",
        col("n_bridges"), col("n_edges"))
      .orderBy(col("deg_sum").desc, col("u"), col("v"))
  }

  /** Fisher ideal price index per year — the geometric mean of
    * q_laspeyres (base-period weights, overstates inflation) and the
    * Paasche dual (current weights, understates it): the two biases
    * cancel and Fisher is the index national statistics actually
    * publish. Same 1996 base, same exact integer-cents unit-value
    * convention; Laspeyres and Paasche are integer-ppm ratios off
    * ONE shared part×year aggregate, Fisher one sqrt of their
    * product. */
  private[graft] def qFisherIndex(s: SparkSession, dir: String): DataFrame = {
    val py = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"), year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .localCheckpoint(eager = false)
    val base = py.filter(col("yr") === 1996)
      .select(col("l_partkey"), col("cents").as("cents0"), col("qty").as("q0"))
    py.join(base, "l_partkey")
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_parts"),
        sum(expr("cents * q0 div qty")).as("lnum"),
        sum(col("cents0")).as("lden"),
        sum(col("cents")).as("pnum"),
        sum(expr("cents0 * qty div q0")).as("pden"))
      .select(col("yr"), col("n_parts"),
        expr("lnum * 1000000 div lden").as("laspeyres_ppm"),
        expr("pnum * 1000000 div pden").as("paasche_ppm"),
        expr("CAST(floor(sqrt(CAST(lnum * 1000000 div lden AS DOUBLE) * CAST(pnum * 1000000 div pden AS DOUBLE)) + 0.5) AS BIGINT)").as("fisher_ppm"))
      .orderBy(col("yr"))
  }

  /** RFM value-segment migration matrix, 1996 → 1997 — the customer-
    * base flow table (upgrades, downgrades, churn-in/out) behind
    * every retention deck: spend terciles are assigned PER YEAR off
    * the year's own value DOMAIN (3·cum ≥ k·n integer cuts, so "H"
    * means the same relative thing in both years), customers absent
    * from a year enter as NONE via a full outer join, and each flow
    * carries its share of the origin segment in exact ppm. */
  private[graft] def qRfmMigration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spend = t(s, dir, "orders")
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(col("o_custkey"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("c"))
      .localCheckpoint(eager = false)
    val dom = spend.groupBy(col("yr"), col("c")).agg(count(lit(1)).as("cnt"))
    val ny = dom.groupBy(col("yr")).agg(sum(col("cnt")).as("n"))
    val cuts = dom.withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("yr")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(ny, "yr")
      .crossJoin(broadcast(spend.sparkSession.range(1, 3)
        .select(col("id").as("k"))))
      .filter(col("cum") * 3 >= col("k") * col("n"))
      .groupBy(col("yr"), col("k")).agg(min(col("c")).as("cut"))
      .groupBy(col("yr"))
      .agg(min(when(col("k") === 1, col("cut"))).as("t1"),
        min(when(col("k") === 2, col("cut"))).as("t2"))
    val seg = spend.join(broadcast(cuts), "yr")
      .select(col("o_custkey"), col("yr"),
        when(col("c") <= col("t1"), "L")
          .when(col("c") <= col("t2"), "M").otherwise("H").as("seg"))
    val s96 = seg.filter(col("yr") === 1996)
      .select(col("o_custkey"), col("seg").as("seg_from"))
    val s97 = seg.filter(col("yr") === 1997)
      .select(col("o_custkey"), col("seg").as("seg_to"))
    val flows = s96.join(s97, Seq("o_custkey"), "full_outer")
      .select(coalesce(col("seg_from"), lit("NONE")).as("seg_from"),
        coalesce(col("seg_to"), lit("NONE")).as("seg_to"))
      .groupBy(col("seg_from"), col("seg_to")).agg(count(lit(1)).as("n"))
    val fromTot = flows.groupBy(col("seg_from")).agg(sum(col("n")).as("nf"))
    flows.join(fromTot, "seg_from")
      .select(col("seg_from"), col("seg_to"), col("n"),
        expr("n * 1000000 div nf").as("share_of_origin_ppm"))
      .orderBy(col("seg_from"), col("seg_to"))
  }

  /** Logistic adoption-curve fit of customer acquisition — the
    * S-curve every "when does growth saturate?" forecast rests on:
    * cumulative first-purchase share F_m linearized as
    * ln(F/(1−F)) = a + b·m and fit by closed-form OLS, yielding the
    * growth rate and the midpoint month t₅₀ = −a/b. First-order
    * dates reduce map-side; the cumulative rides the ~80-row month
    * DOMAIN; each logit point rounds to integer micro before the
    * five moment sums (the q_weibull_fit contract). */
  private[graft] def qAdoptionCurve(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstM = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(((year(col("o_orderdate")) - 1995) * 12 +
        month(col("o_orderdate")) - 1).cast("long")).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("adopters"))
    val tot = firstM.agg(sum(col("adopters")).as("na"))
    val pts = firstM
      .withColumn("cum", sum(col("adopters")).over(
        Window.orderBy(col("m")).rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .filter(col("cum") > 0 && col("cum") < col("na"))
      .select(col("m").as("x"),
        expr("CAST(floor(ln(CAST(cum AS DOUBLE) / CAST(na - cum AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)").as("y"))
    pts.agg(count(lit(1)).as("np"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .crossJoin(broadcast(tot))
      .select(col("np").as("n_months"), col("na").as("n_adopters"),
        expr("CAST(floor((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) + 0.5) AS BIGINT)").as("rate_micro_per_month"),
        expr("CAST(floor(-((CAST(sy AS DOUBLE) - (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(np AS DOUBLE)) / ((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 1000 + 0.5) AS BIGINT)").as("t50_month_milli"))
  }

  /** Winner persistence across quarters — "do last quarter's top
    * brands stay on top?" measured two ways per adjacent quarter
    * pair: top-5 retention (the leaderboard view) and the concordant
    * -pair share over ALL brand pairs (the Kendall-style view that
    * sees re-shuffling below the top). Ranks come from windows over
    * the (quarter × 25-brand) DOMAIN grid; the pair comparison is a
    * bounded self-join on that grid — a few hundred rows per quarter
    * pair at any SF. */
  private[graft] def qRankPersistence(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qrev = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(((year(col("l_shipdate")) - 1995) * 4 +
          quarter(col("l_shipdate")) - 1).cast("long").as("q"),
        col("p_brand"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("rev"))
    val ranked = qrev.withColumn("r",
        row_number().over(Window.partitionBy(col("q"))
          .orderBy(col("rev").desc, col("p_brand"))).cast("long"))
      .localCheckpoint(eager = false)
    val adj = ranked.as("a").join(ranked.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("b.q") === col("a.q") + 1)
      .select(col("a.q").as("q"), col("a.p_brand").as("brand"),
        col("a.r").as("r0"), col("b.r").as("r1"))
      .localCheckpoint(eager = false)
    val top5 = adj.groupBy(col("q"))
      .agg(sum(when(col("r0") <= 5 && col("r1") <= 5, 1L).otherwise(0L))
        .as("top5_retained"))
    val conc = adj.as("x").join(adj.as("y"),
        col("x.q") === col("y.q") && col("x.brand") < col("y.brand"))
      .groupBy(col("x.q").as("q"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when((col("x.r0") < col("y.r0")) === (col("x.r1") < col("y.r1")),
          1L).otherwise(0L)).as("concordant"))
    top5.join(conc, "q")
      .select(col("q"), col("top5_retained"), col("n_pairs"),
        expr("concordant * 1000000 div n_pairs").as("concordant_ppm"))
      .orderBy(col("q"))
  }

  /** Bradley-Terry strengths from weekly brand revenue duels — two
    * minorization-maximization iterations of the canonical pairwise-
    * comparison model (the same machinery behind chess Elo pools and
    * RLHF preference models): sᵢ ← Wᵢ / Σⱼ nᵢⱼ/(sᵢ+sⱼ). Duels
    * aggregate map-side to the ~300-row brand-pair grid; each MM
    * denominator term rounds to integer micro before its 24-term
    * sum; iteration-1 strengths re-enter iteration 2 through a
    * broadcast of the 25-row strength table. Top-10 with win counts. */
  private[graft] def qBradleyTerry(s: SparkSession, dir: String): DataFrame = {
    val weekly = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        expr("CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) div 7").as("wk"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("rev"))
      .localCheckpoint(eager = false)
    val duels = weekly.as("a").join(weekly.as("b"),
        col("a.wk") === col("b.wk") && col("a.p_brand") < col("b.p_brand") &&
          col("a.rev") =!= col("b.rev"))
      .select(col("a.p_brand").as("bi"), col("b.p_brand").as("bj"),
        when(col("a.rev") > col("b.rev"), 1L).otherwise(0L).as("wi"))
      .groupBy(col("bi"), col("bj"))
      .agg(count(lit(1)).as("nij"), sum(col("wi")).as("wij"))
      .localCheckpoint(eager = false)
    // symmetric per-brand view: (brand, opponent, games, wins)
    val sym = duels.select(col("bi").as("b"), col("bj").as("o"),
        col("nij"), col("wij").as("w"))
      .unionByName(duels.select(col("bj").as("b"), col("bi").as("o"),
        col("nij"), (col("nij") - col("wij")).as("w")))
      .localCheckpoint(eager = false)
    // iteration 1 from s = 1: s1 = W / (Σ n/2); micro fixed point
    val s1 = sym.groupBy(col("b"))
      .agg(sum(col("w")).as("bw"), sum(col("nij")).as("bn"))
      .select(col("b"), col("bw"),
        expr("CAST(floor(CAST(bw AS DOUBLE) / (CAST(bn AS DOUBLE) / 2.0) * 1000000 + 0.5) AS BIGINT)").as("s1"))
    // iteration 2: denominator terms n/(s1_b + s1_o), micro-rounded
    val s2 = sym
      .join(broadcast(s1.select(col("b"), col("s1").as("sb"))), "b")
      .join(broadcast(s1.select(col("b").as("o"), col("s1").as("so"))), "o")
      .groupBy(col("b"))
      .agg(sum(col("w")).as("w2"),
        sum(expr("CAST(floor(CAST(nij AS DOUBLE) / ((sb + so) / 1000000.0) * 1000000 + 0.5) AS BIGINT)")).as("den_micro"))
      .select(col("b"),
        expr("CAST(floor(CAST(w2 AS DOUBLE) / (den_micro / 1000000.0) * 1000000 + 0.5) AS BIGINT)").as("strength_micro"),
        col("w2").as("wins"))
    s2.join(s1.select(col("b"), col("bw"), col("s1")), "b")
      .select(col("b").as("brand"), col("wins"), col("s1").as("s_iter1_micro"),
        col("strength_micro"))
      .orderBy(col("strength_micro").desc, col("brand")).limit(10)
  }

  /** Lorenz asymmetry coefficient of customer spend — WHERE the
    * inequality lives, which the Gini alone cannot say: S = F(μ) +
    * L(μ); S < 1 means many small customers drive the Gini, S > 1
    * means a few giants do — opposite retention strategies for the
    * same Gini. Both components are exact cumulative shares read off
    * the spend value DOMAIN at the mean (one cumulative window over
    * distinct spend values, integer ppm at the end). */
  private[graft] def qLorenzAsymmetry(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("c"))
    val dom = cust.groupBy(col("c")).agg(count(lit(1)).as("cnt"))
    val tot = dom.agg(sum(col("cnt")).as("n"),
      sum(col("c") * col("cnt")).as("tc"))
    val cums = dom.withColumn("cumn",
        sum(col("cnt")).over(Window.orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cumc",
        sum(col("c") * col("cnt")).over(Window.orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
    cums.filter(col("c") * col("n") <= col("tc"))
      .agg(max(col("cumn")).as("f_cnt"), max(col("cumc")).as("l_cents"),
        max(col("n")).as("n"), max(col("tc")).as("tc"))
      .select(col("n").as("n_customers"),
        expr("f_cnt * 1000000 div n").as("f_mu_ppm"),
        expr("l_cents * 1000000 div tc").as("l_mu_ppm"),
        expr("f_cnt * 1000000 div n + l_cents * 1000000 div tc").as("asymmetry_ppm"))
  }

  /** Gamma fit of order-to-first-ship latency per priority by method
    * of moments (k = μ²/σ², θ = σ²/μ) — the right-skewed latency
    * model capacity planning uses where q_weibull_fit models failure
    * age: k < 1 says the distribution is exponential-ish with a
    * heavy head, large k says latency is effectively deterministic.
    * One grouped pass of exact integer day moments; k and θ are
    * fixed double trees per 5-row output. */
  private[graft] def qGammaFit(s: SparkSession, dir: String): DataFrame = {
    val lag = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(epochDay(col("l_shipdate"))).as("ship"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"),
        epochDay(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), (col("ship") - col("od")).as("d"))
      .filter(col("d") > 0)
    lag.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"),
        sum(col("d") * col("d")).as("sdd"))
      .select(col("o_orderpriority"), col("n"),
        expr("CAST(floor(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mean_days_milli"),
        expr("CAST(floor((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) / ((CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) * 1000 + 0.5) AS BIGINT)").as("shape_milli"),
        expr("CAST(floor(((CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) / (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("scale_days_milli"))
      .orderBy(col("o_orderpriority"))
  }

  /** Realized volatility of daily revenue — the log-return σ that
    * finance puts behind every risk number, pointed at an operations
    * series: per-day log returns ln(vₜ/vₜ₋₁) round to integer micro
    * BEFORE the moment sums (the engine's no-float-reduction
    * contract), σ comes from exact integer moments, and the
    * annualized (×√365) figure is one fixed double tree. The lag
    * rides the calendar-bounded day DOMAIN. */
  private[graft] def qRealizedVol(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))").as("v"))
    val rets = daily
      .withColumn("vp", lag(col("v"), 1).over(Window.orderBy(col("day"))))
      .filter(col("vp").isNotNull)
      .select(expr("CAST(floor(ln(CAST(v AS DOUBLE) / CAST(vp AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)").as("r"))
    rets.agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
        sum(col("r") * col("r")).as("srr"))
      .select(col("n").as("n_returns"),
        expr("CAST(floor(CAST(sr AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)").as("mean_ret_micro"),
        expr("CAST(floor(sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) + 0.5) AS BIGINT)").as("daily_vol_micro"),
        expr("CAST(floor(sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) * sqrt(365.0) + 0.5) AS BIGINT)").as("annualized_vol_micro"))
  }

  /** Maximum drawdown of the cumulative-revenue index — the
    * peak-to-trough risk number that pairs with q_realized_vol the
    * way VaR pairs with σ: how deep did the 30-day-smoothed revenue
    * run rate fall below its running peak, and how long was the
    * longest underwater spell? Running peak and the drawdown are
    * integer windows over the month DOMAIN; depth is exact ppm
    * against the peak; the underwater-spell length uses the islands
    * gap trick on the same domain. */
  private[graft] def qMaxDrawdown(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = t(s, dir, "orders")
      .groupBy(((year(col("o_orderdate")) - 1995) * 12 +
        month(col("o_orderdate")) - 1).cast("long").as("m"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100000").as("v"))
    val w = Window.orderBy(col("m")).rowsBetween(Window.unboundedPreceding, 0)
    val dd = monthly
      .withColumn("peak", max(col("v")).over(w))
      .withColumn("dd_ppm", expr("(peak - v) * 1000000 div peak"))
      .localCheckpoint(eager = false)
    val worst = dd.orderBy(col("dd_ppm").desc, col("m")).limit(1)
      .select(col("m").as("worst_month"), col("dd_ppm").as("max_drawdown_ppm"),
        col("v").as("trough_v"), col("peak").as("peak_v"))
    val spells = dd.filter(col("dd_ppm") > 0)
      .withColumn("grp", col("m") - row_number().over(Window.orderBy(col("m"))))
      .groupBy(col("grp")).agg(count(lit(1)).as("len"))
      .agg(max(col("len")).as("longest_underwater_months"),
        count(lit(1)).as("n_spells"))
    worst.crossJoin(broadcast(spells))
  }

  /** Split-conformal prediction intervals for order value by
    * priority — the distribution-free uncertainty wrapper modern ML
    * serving uses: calibrate the |residual| quantile on one md5 half,
    * then MEASURE the promised 90% coverage on the other half. The
    * conformal quantile is the ⌈0.9(n+1)⌉-th order statistic read off
    * the per-priority residual DOMAIN (exact integer selection); the
    * group-mean predictor is an exact floor division; coverage is an
    * integer ppm on the held-out half. An honest interval shows
    * coverage ≈ 900000 ppm BY CONSTRUCTION — that invariant is the
    * point of the query. */
  private[graft] def qConformalInterval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = t(s, dir, "orders")
      .select(col("o_orderpriority").as("grp"),
        Analytics.cents(col("o_totalprice")).as("c"),
        (h60(concat(lit("cf|"), col("o_orderkey").cast("string"))) % 2).as("half"))
      .localCheckpoint(eager = false)
    val means = base.filter(col("half") === 0)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_calib"), expr("sum(c) div count(1)").as("mu"))
    val calRes = base.filter(col("half") === 0)
      .join(broadcast(means), "grp")
      .select(col("grp"), abs(col("c") - col("mu")).as("r"), col("n_calib"))
    val dom = calRes.groupBy(col("grp"), col("r"))
      .agg(count(lit(1)).as("cnt"), max(col("n_calib")).as("nc"))
    val qhat = dom.withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("grp")).orderBy(col("r"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      // k = ceil(0.9(n+1)) ⟺ 10·cum ≥ 9·(n+1)
      .filter(col("cum") * 10 >= (col("nc") + 1) * 9)
      .groupBy(col("grp")).agg(min(col("r")).as("qhat"))
    base.filter(col("half") === 1)
      .join(broadcast(means), "grp").join(broadcast(qhat), "grp")
      .groupBy(col("grp"))
      .agg(max(col("n_calib")).as("n_calib"), count(lit(1)).as("n_test"),
        max(col("qhat")).as("qhat_cents"),
        sum(when(abs(col("c") - col("mu")) <= col("qhat"), 1L).otherwise(0L))
          .as("covered"))
      .select(col("grp"), col("n_calib"), col("n_test"), col("qhat_cents"),
        expr("covered * 1000000 div n_test").as("coverage_ppm"))
      .orderBy(col("grp"))
  }

  /** German-tank estimator — serial-number inference from a sample:
    * N̂ = m + m/k − 1 from the sample maximum m and sample size k,
    * audited against the true maximum order key in the same plan.
    * The WWII production-estimation classic, here as the audit that
    * the md5 sampling gate behaves like the uniform draw the
    * estimator assumes (a biased sampler shows up as systematic
    * ppm error). Pure integer arithmetic end to end. */
  private[graft] def qGermanTank(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(col("o_orderkey"),
      (h60(concat(lit("gt|"), col("o_orderkey").cast("string"))) % 20).as("g"))
    val truth = base.agg(max(col("o_orderkey")).as("true_max"),
      count(lit(1)).as("n_total"))
    base.filter(col("g") === 0)
      .agg(count(lit(1)).as("k"), max(col("o_orderkey")).as("m"))
      .crossJoin(broadcast(truth))
      .select(col("k").as("n_sampled"), col("m").as("sample_max"),
        col("true_max"),
        expr("m + m div k - 1").as("estimate"),
        expr("abs(m + m div k - 1 - true_max) * 1000000 div true_max").as("err_ppm"))
  }

  /** Leaderboard stability under resampling — split the orders into
    * two deterministic md5 halves, rank brands by revenue in each,
    * and measure how much the top-10 agrees (overlap + Spearman
    * footrule on the common members): the cheap bootstrap-style
    * answer to "is this top-10 signal or noise?" before anyone ships
    * a ranking. Ranks ride windows over the two 25-row brand
    * domains; every comparison is integer. */
  private[graft] def qTopkStability(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        Analytics.cents(col("l_extendedprice")).as("c"),
        (h60(concat(lit("ts|"), col("l_orderkey").cast("string"), lit("|"),
          col("l_linenumber").cast("string"))) % 2).as("half"))
      .groupBy(col("half"), col("p_brand"))
      .agg(sum(col("c")).as("rev"))
    val ranked = rev.withColumn("r",
        row_number().over(Window.partitionBy(col("half"))
          .orderBy(col("rev").desc, col("p_brand"))).cast("long"))
      .filter(col("r") <= 10)
      .localCheckpoint(eager = false)
    val a = ranked.filter(col("half") === 0)
      .select(col("p_brand"), col("r").as("ra"))
    val b = ranked.filter(col("half") === 1)
      .select(col("p_brand"), col("r").as("rb"))
    val common = a.join(b, "p_brand")
    common.agg(count(lit(1)).as("overlap_at_10"),
        sum(abs(col("ra") - col("rb"))).as("footrule"))
      .select(col("overlap_at_10"),
        expr("overlap_at_10 * 1000000 div (20 - overlap_at_10)").as("jaccard_ppm"),
        col("footrule"))
  }

  /** Cohen's h effect size for the return-rate gap between discount
    * bands — the arcsine-stabilized difference of proportions that
    * stays interpretable when rates sit near 0 or 1 (where the raw
    * percentage-point gap of q_returns_by_discount misleads: 1%→2%
    * and 50%→51% are the same pp but wildly different effects).
    * h = 2·asin√p₁ − 2·asin√p₂ per adjacent band pair; proportions
    * are exact integer ratios, h one fixed double tree per row, with
    * the conventional small/medium/large (0.2/0.5/0.8) banding. */
  private[graft] def qCohensH(s: SparkSession, dir: String): DataFrame = {
    val bands = t(s, dir, "lineitem")
      .groupBy(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT) div 2").as("band"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      .localCheckpoint(eager = false)
    bands.as("a").join(bands.as("b"), col("b.band") === col("a.band") + 1)
      .select(col("a.band").as("band_lo"), col("a.n").as("n_lo"),
        col("b.n").as("n_hi"),
        expr("a.r * 1000000 div a.n").as("rate_lo_ppm"),
        expr("b.r * 1000000 div b.n").as("rate_hi_ppm"),
        expr("CAST(floor((2.0 * asin(sqrt(CAST(b.r AS DOUBLE) / CAST(b.n AS DOUBLE))) - 2.0 * asin(sqrt(CAST(a.r AS DOUBLE) / CAST(a.n AS DOUBLE)))) * 1000 + 0.5) AS BIGINT)").as("cohens_h_milli"))
      .withColumn("magnitude",
        when(abs(col("cohens_h_milli")) >= 800, "large")
          .when(abs(col("cohens_h_milli")) >= 500, "medium")
          .when(abs(col("cohens_h_milli")) >= 200, "small")
          .otherwise("negligible"))
      .orderBy(col("band_lo"))
  }

  /** Cook's distance over the monthly-revenue trend fit — WHICH
    * months bend the regression line (q_durbin_watson says whether
    * residuals correlate; this says who has the leverage): hᵢ = 1/n +
    * (xᵢ−x̄)²/Sxx in closed form, Dᵢ = eᵢ²hᵢ/(2s²(1−hᵢ)²), top-10.
    * Five exact integer moments feed every per-month fixed double
    * tree; residuals round to whole dollars before squaring (the
    * q_durbin_watson convention); nothing iterative, nothing
    * driver-side. */
  private[graft] def qCooksDistance(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .groupBy(((year(col("o_orderdate")) - 1995) * 12 +
        month(col("o_orderdate")) - 1).cast("long").as("x"))
      .agg(sum(Analytics.cents(col("o_totalprice"))).as("yc"))
    val sums = monthly.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"), sum(col("yc")).as("sy"),
      sum(col("x") * col("yc")).as("sxy"))
    val resid = monthly.crossJoin(broadcast(sums))
      .withColumn("b", expr("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"))
      .withColumn("ed", expr("CAST(floor((CAST(yc AS DOUBLE) - (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) - b * CAST(x AS DOUBLE)) / 100.0 + 0.5) AS BIGINT)"))
      .withColumn("hnum", expr("CAST(n AS DOUBLE) * CAST(x AS DOUBLE) - CAST(sx AS DOUBLE)"))
      // h_i = 1/n + n(x−x̄)²/(n·Sxx) with Sxx = sxx − sx²/n, all doubles
      .withColumn("h", expr("1.0 / CAST(n AS DOUBLE) + hnum * hnum / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"))
      .localCheckpoint(eager = false)
    val s2 = resid.agg(sum(col("ed") * col("ed")).as("sse"), max(col("n")).as("n"))
      .select(expr("CAST(sse AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0)").as("s2"))
    resid.crossJoin(broadcast(s2))
      .select(col("x").as("m"), col("ed").as("resid_dollars"),
        expr("CAST(floor(h * 1000000 + 0.5) AS BIGINT)").as("leverage_micro"),
        expr("CAST(floor(CAST(ed AS DOUBLE) * CAST(ed AS DOUBLE) * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) * 1000000 + 0.5) AS BIGINT)").as("cooks_d_micro"))
      .orderBy(col("cooks_d_micro").desc, col("m")).limit(10)
  }

  /** Hoeffding concentration audit of the md5 sampler — the
    * theoretical guarantee, checked empirically: for a 5% sample of
    * bounded order values, |sample mean − true mean| must sit inside
    * ε = R·√(ln(2/δ)/2k) at δ = 1%. Emits both sides of the
    * inequality in milli-dollars and the bound-utilization ratio —
    * a sampler whose error EXCEEDS the envelope is broken, one far
    * inside it is better than i.i.d. (stratification bonus). All
    * inputs exact integer sums; the envelope is one fixed tree. */
  private[graft] def qHoeffdingAudit(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      Analytics.cents(col("o_totalprice")).as("c"),
      (h60(concat(lit("hf|"), col("o_orderkey").cast("string"))) % 20).as("g"))
    val truth = base.agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
      max(col("c")).as("cmax"), min(col("c")).as("cmin"))
    base.filter(col("g") === 0)
      .agg(count(lit(1)).as("k"), sum(col("c")).as("sk"))
      .crossJoin(broadcast(truth))
      .select(col("k").as("n_sampled"), col("n").as("n_total"),
        expr("CAST(floor(abs(CAST(sk AS DOUBLE) / CAST(k AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 * 1000 + 0.5) AS BIGINT)").as("abs_err_milli"),
        expr("CAST(floor(CAST(cmax - cmin AS DOUBLE) * sqrt(ln(200.0) / (2.0 * CAST(k AS DOUBLE))) / 100.0 * 1000 + 0.5) AS BIGINT)").as("hoeffding_eps_milli"),
        expr("CAST(floor(abs(CAST(sk AS DOUBLE) / CAST(k AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(cmax - cmin AS DOUBLE) * sqrt(ln(200.0) / (2.0 * CAST(k AS DOUBLE)))) * 1000000 + 0.5) AS BIGINT)").as("bound_utilization_ppm"))
  }

  /** Dickey-Fuller unit-root regression on daily revenue — the
    * stationarity gate every forecasting choice hangs on: regress
    * Δvₜ on vₜ₋₁; γ ≈ 0 (t above the −2.86 critical value) means a
    * random-walk level where trend models overfit, strongly negative
    * γ means mean-reversion where q_holt-style smoothing is sound.
    * Lag pairs ride the day DOMAIN; γ, its standard error, and the
    * t-statistic are fixed double trees over five exact integer
    * moment sums. */
  private[graft] def qDickeyFuller(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100000").as("v"))
    val pairs = daily
      .withColumn("vp", lag(col("v"), 1).over(Window.orderBy(col("day"))))
      .filter(col("vp").isNotNull)
      .select(col("vp").as("x"), (col("v") - col("vp")).as("y"))
    pairs.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").as("n_days"),
        expr("CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)").as("gamma_micro"),
        expr("""CAST(floor(
            ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
            / sqrt(
              ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
              / (CAST(n AS DOUBLE) - 2.0)
              / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
            * 1000 + 0.5) AS BIGINT)""").as("t_stat_milli"),
        lit(-2860L).as("critical_5pct_milli"))
  }

  /** Hypergeometric enrichment of return rates by brand — the GSEA/
    * over-representation primitive: which brands hold significantly
    * more (or fewer) returned items than drawing without replacement
    * from the corpus would give, with the finite-population
    * correction that a plain binomial z omits. Expected count,
    * variance, and z are fixed double trees over exact integer
    * (brand, returned) cell counts; top-10 |z| with direction. */
  private[graft] def qEnrichment(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("nb"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("kb"))
      .localCheckpoint(eager = false)
    val tot = cells.agg(sum(col("nb")).as("nn"), sum(col("kb")).as("kk"))
    cells.crossJoin(broadcast(tot))
      .select(col("p_brand"), col("nb"), col("kb"),
        expr("CAST(floor(CAST(nb AS DOUBLE) * CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("expected_milli"),
        expr("CAST(floor((CAST(kb AS DOUBLE) - CAST(nb AS DOUBLE) * CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE) * (CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)) * (1.0 - CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)) * (CAST(nn - nb AS DOUBLE) / (CAST(nn AS DOUBLE) - 1.0))) * 1000 + 0.5) AS BIGINT)").as("z_milli"))
      .orderBy(abs(col("z_milli")).desc, col("p_brand")).limit(10)
  }

  /** Grouped (delete-one-block) jackknife variance of mean order
    * value over 32 md5 blocks — the distributed variance-estimation
    * workhorse for statistics with no closed-form SE, here calibrated
    * on one that HAS a closed form so the two estimates can be
    * compared in the same row (ratio ≈ 1 is the pass condition).
    * Block sums reduce map-side; the 32 leave-one-out means and
    * their squared deviations are per-row fixed trees over exact
    * integers (dollars keep x² inside int64); nothing resamples,
    * nothing collects. */
  private[graft] def qJackknife(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      expr("CAST(floor(o_totalprice + 0.5) AS BIGINT)").as("d"),
      (h60(concat(lit("jk|"), col("o_orderkey").cast("string"))) % 32).as("g"))
    val blocks = base.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("d")).as("sg"))
      .localCheckpoint(eager = false)
    val tot = blocks.agg(sum(col("ng")).as("n"), sum(col("sg")).as("ss"),
      count(lit(1)).as("gg"))
    val direct = base.agg(sum(col("d") * col("d")).as("sdd"))
    val loo = blocks.crossJoin(broadcast(tot))
      .select(col("gg"), col("n"), col("ss"),
        expr("(CAST(ss AS DOUBLE) - CAST(sg AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST(ng AS DOUBLE))").as("mu_g"))
    val mbar = loo.agg(
      sum(expr("CAST(floor(mu_g * 1000000 + 0.5) AS BIGINT)")).as("smu_micro"))
    loo.crossJoin(broadcast(mbar))
      .agg(max(col("gg")).as("gg"), max(col("n")).as("n"), max(col("ss")).as("ss"),
        sum(expr("CAST(floor((mu_g - (smu_micro / 1000000.0) / CAST(gg AS DOUBLE)) * (mu_g - (smu_micro / 1000000.0) / CAST(gg AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")).as("ssq_micro"))
      .crossJoin(broadcast(direct))
      .select(col("gg").as("n_blocks"),
        expr("CAST(floor(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mean_dollar_milli"),
        expr("CAST(floor(sqrt((CAST(gg AS DOUBLE) - 1.0) / CAST(gg AS DOUBLE) * (ssq_micro / 1000000.0)) * 1000 + 0.5) AS BIGINT)").as("jk_se_milli"),
        expr("CAST(floor(sqrt((CAST(sdd AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("direct_se_milli"),
        expr("CAST(floor(sqrt((CAST(gg AS DOUBLE) - 1.0) / CAST(gg AS DOUBLE) * (ssq_micro / 1000000.0)) / sqrt((CAST(sdd AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("ratio_milli"))
  }

  /** Partial moments of daily revenue around its median — the Omega
    * gain/loss ratio and downside semi-deviation that asymmetric
    * risk preferences need where σ treats up and down alike
    * (q_realized_vol's blind spot). Upside/downside first moments
    * are EXACT integer sums split at the domain-median threshold;
    * the downside second moment rounds per-day to integer before
    * its sum; Omega and the semi-deviation are fixed double trees. */
  private[graft] def qPartialMoments(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100000").as("v"))
      .localCheckpoint(eager = false)
    val dom = daily.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val tot = dom.agg(sum(col("cnt")).as("n"))
    val med = dom.withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .filter(col("cum") * 2 >= col("n")).agg(min(col("v")).as("med"))
    daily.crossJoin(broadcast(med))
      .agg(count(lit(1)).as("n_days"), max(col("med")).as("median_v"),
        sum(when(col("v") > col("med"), col("v") - col("med")).otherwise(0L)).as("up1"),
        sum(when(col("v") < col("med"), col("med") - col("v")).otherwise(0L)).as("dn1"),
        sum(when(col("v") < col("med"),
          (col("med") - col("v")) * (col("med") - col("v"))).otherwise(0L)).as("dn2"))
      .select(col("n_days"), col("median_v"),
        expr("CAST(floor(CAST(up1 AS DOUBLE) / CAST(dn1 AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("omega_milli"),
        expr("CAST(floor(sqrt(CAST(dn2 AS DOUBLE) / CAST(n_days AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("downside_dev_milli"),
        expr("up1 * 1000000 div (up1 + dn1)").as("gain_share_ppm"))
  }

  /** Kendall concordance between two rankings of the SAME brands —
    * revenue rank vs unit-volume rank: if the two disagree (low
    * tau), every "top brand" claim needs a metric qualifier, and
    * dashboards silently switch stories. Ranks come from windows
    * over the 25-brand DOMAIN; tau-a is exact integer pair counting
    * over the ~300 brand pairs; the biggest rank swings ship as
    * evidence. */
  private[graft] def qMetricConcordance(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBrand = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("rev"),
        expr("CAST(floor(sum(l_quantity) + 0.5) AS BIGINT)").as("vol"))
    val ranked = byBrand
      .withColumn("r_rev", row_number().over(
        Window.orderBy(col("rev").desc, col("p_brand"))).cast("long"))
      .withColumn("r_vol", row_number().over(
        Window.orderBy(col("vol").desc, col("p_brand"))).cast("long"))
      .localCheckpoint(eager = false)
    val conc = ranked.as("a").join(ranked.as("b"),
        col("a.p_brand") < col("b.p_brand"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when((col("a.r_rev") < col("b.r_rev")) ===
          (col("a.r_vol") < col("b.r_vol")), 1L).otherwise(0L)).as("concordant"))
      .select(col("n_pairs"), col("concordant"),
        expr("(2 * concordant - n_pairs) * 1000000 div n_pairs").as("tau_ppm"))
    val swing = ranked
      .agg(max(abs(col("r_rev") - col("r_vol"))).as("max_rank_swing"))
    conc.crossJoin(broadcast(swing))
  }

  /** Negative-binomial fit of per-customer purchase frequency — the
    * heterogeneity model behind BG/NBD-style CLV: if order counts
    * were Poisson (homogeneous customers), variance ≈ mean; the NB
    * r = μ²/(σ²−μ) says how concentrated the buying propensity
    * really is (small r = a few heavy buyers drive volume). Exact
    * count moments, fixed double trees, plus the Poisson-overdispersion
    * ratio that justifies the model choice. */
  private[graft] def qNbFit(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("k"))
    counts.agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
        sum(col("k") * col("k")).as("skk"))
      .select(col("n").as("n_customers"),
        expr("CAST(floor(CAST(sk AS DOUBLE) / CAST(n AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("mean_orders_milli"),
        expr("CAST(floor((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) * 1000 + 0.5) AS BIGINT)").as("var_orders_milli"),
        expr("CAST(floor(((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) / (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("vmr_milli"),
        expr("CAST(floor((CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) / greatest((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) - CAST(sk AS DOUBLE) / CAST(n AS DOUBLE), 0.001) * 1000 + 0.5) AS BIGINT)").as("nb_r_milli"))
  }

  /** Zone-map (min/max statistics) skipping audit — the data-skipping
    * arithmetic behind every lakehouse scan planner: rows land in 64
    * zones under two layouts (natural l_orderkey insertion order vs
    * clustered by the predicate column), each zone keeps min/max of
    * l_shipdate, and a quarter-long date predicate counts which zones
    * a planner could skip WITHOUT reading them (max < lo or min > hi).
    * The natural layout skips almost nothing (every zone spans the full
    * date range — the classic unclustered-fact pathology); the
    * clustered layout skips nearly everything outside the quarter. At
    * 100 TB this ratio IS the scan cost, which is why layout
    * (zorder/cluster-by) is a first-class operator. One scan per
    * layout; zones are a bounded 64-row domain. */
  private[graft] def qZoneMap(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").cast("long").as("ok"),
        epochDay(col("l_shipdate")).as("sd"))
      .localCheckpoint(eager = false)
    val bounds = li.agg(max(col("ok")).as("max_ok"), min(col("sd")).as("min_sd"),
      max(col("sd")).as("max_sd"), count(lit(1)).as("n_rows"))
    val lo = epochDayLit("1994-01-01")
    val hi = epochDayLit("1994-03-31")
    def audit(layout: String, zone: org.apache.spark.sql.Column) =
      li.crossJoin(broadcast(bounds))
        .select(zone.as("zone"), col("sd"), col("n_rows"))
        .groupBy(col("zone"))
        .agg(min(col("sd")).as("zmin"), max(col("sd")).as("zmax"),
          count(lit(1)).as("rows"), max(col("n_rows")).as("n_rows"))
        .groupBy()
        .agg(count(lit(1)).as("n_zones"),
          sum(when(col("zmax") < lo || col("zmin") > hi, 1L).otherwise(0L))
            .as("n_skippable"),
          sum(when(col("zmax") < lo || col("zmin") > hi, col("rows"))
            .otherwise(0L)).as("skip_rows"),
          max(col("n_rows")).as("n_rows"))
        .select(lit(layout).as("layout"), col("n_zones"), col("n_skippable"),
          col("skip_rows"),
          expr("skip_rows * 1000000 div n_rows").as("skip_ppm"))
    audit("natural", expr("ok * 64 div (max_ok + 1)"))
      .unionByName(audit("clustered",
        expr("(sd - min_sd) * 64 div (max_sd - min_sd + 1)")))
      .orderBy(col("layout"))
  }

  /** Small-files compaction plan — the lakehouse maintenance operator
    * the topic-dir sink (and any streaming ingest) eventually needs:
    * per-day ingest "files" (row counts over the bounded date domain)
    * are packed into target-sized compaction groups by a rolling
    * capacity split (group = exclusive-prefix-rows div target — the
    * deterministic one-pass packing a distributed compactor uses, same
    * prefix shape as q_pack_windows). Emits each group's file count,
    * rows, date span, and fill ratio vs the 5000-row target; the
    * file-count→group-count ratio is the write-amplification-free
    * read-amplification win. Window runs over the ~2400-row day
    * DOMAIN, never row-cardinality data. */
  private[graft] def qCompactionPlan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("sz"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum(col("sz")).over(w), lit(0L)))
      .withColumn("grp", expr("cum_before div 5000"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_files"), sum(col("sz")).as("n_rows"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .select(col("grp"), col("n_files"), col("n_rows"),
        col("first_day"), col("last_day"),
        expr("n_rows * 1000000 div 5000").as("fill_ppm"))
      .orderBy(col("grp"))
  }

  /** AMS (Alon–Matias–Szegedy) F₂ sketch — the second frequency moment
    * (self-join size) in 8 counters, completing the sketch family next
    * to HLL (F₀), KMV, and Count-Min: 8 independent ±1 hash rows
    * (md5 parity — engine-portable where AMS's 4-wise independence is
    * usually a seeded generator), z_i = Σ_k count(k)·sign_i(k), and
    * F₂ ≈ mean/median of z_i². Scale shape: keys are first compressed
    * by an EXACT map-side-combined count (the shuffle carries one row
    * per distinct key), the 8-row sketch table is then one bounded
    * aggregate — the estimator state is 8 longs no matter the stream.
    * All arithmetic exact int64; the median is the documented LOWER
    * median (4th order statistic of 8) so no half values exist. The
    * oracle replays sketch, estimates, and the exact F₂ = Σ count². */
  private[graft] def qAmsF2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnts = events(s, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val sk = cnts
      .select(col("user_id"), col("cnt"),
        explode(array((0 until 8).map(lit): _*)).as("i"))
      .withColumn("sign", lit(1L) - lit(2L) *
        (h60(concat(lit("ams|"), col("i").cast("string"), lit("|"),
          col("user_id").cast("string"))) % 2))
      .groupBy(col("i")).agg(sum(col("cnt") * col("sign")).as("z"))
      .withColumn("z2", col("z") * col("z"))
    val exact = cnts.agg(sum(col("cnt") * col("cnt")).as("f2_exact"),
      count(lit(1)).as("n_keys"))
    val mean = sk.agg(expr("sum(z2) div 8").as("est_mean"))
    // 8-row bounded domain: the rank window never touches key-cardinality data
    val medianLo = sk
      .withColumn("rn", row_number().over(Window.orderBy(col("z2"), col("i"))))
      .filter(col("rn") === 4).select(col("z2").as("est_median_lo"))
    exact.crossJoin(broadcast(mean)).crossJoin(broadcast(medianLo))
      .select(col("n_keys"), col("f2_exact"), col("est_mean"),
        col("est_median_lo"),
        expr("abs(est_mean - f2_exact) * 1000000 div f2_exact")
          .as("err_mean_ppm"),
        expr("abs(est_median_lo - f2_exact) * 1000000 div f2_exact")
          .as("err_median_ppm"))
  }

  private[graft] def warehouse3QueryMap: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zone_map" -> (qZoneMap _),
    "q_compaction_plan" -> (qCompactionPlan _),
    "q_ams_f2" -> (qAmsF2 _),
    "q_order_consolidation" -> (qOrderConsolidation _),
    "q_topk_per_quarter" -> (qTopkPerQuarter _),
    "q_growth_accounting" -> (qGrowthAccounting _),
    "q_retention_fit" -> (qRetentionFit _),
    "q_price_endings" -> (qPriceEndings _),
    "q_design_effect" -> (qDesignEffect _),
    "q_activity_streaks" -> (qActivityStreaks _),
    "q_order_size_dist" -> (qOrderSizeDist _),
    "q_multiple_testing" -> (qMultipleTesting _),
    "q_geo_mean" -> (qGeoMean _),
    "q_abc_xyz" -> (qAbcXyz _),
    "q_winback" -> (qWinback _),
    "q_discount_leakage" -> (qDiscountLeakage _),
    "q_supplier_risk" -> (qSupplierRisk _),
    "q_effect_stability" -> (qEffectStability _),
    "q_returns_by_discount" -> (qReturnsByDiscount _),
    "q_ratio_to_ma" -> (qRatioToMa _),
    "q_click_to_buy_latency" -> (qClickToBuyLatency _),
    "q_loyalty_ladder" -> (qLoyaltyLadder _),
    "q_top_movers" -> (qTopMovers _),
    "q_reach_frequency" -> (qReachFrequency _),
    "q_event_value_profile" -> (qEventValueProfile _),
    "q_log_rank" -> (qLogRank _),
    "q_l_diversity" -> (qLDiversity _),
    "q_durbin_watson" -> (qDurbinWatson _),
    "q_page_hinkley" -> (qPageHinkley _),
    "q_rich_club" -> (qRichClub _),
    "q_newsvendor" -> (qNewsvendor _),
    "q_eoq" -> (qEoq _),
    "q_friedman" -> (qFriedman _),
    "q_hodges_lehmann" -> (qHodgesLehmann _),
    "q_t_closeness" -> (qTCloseness _),
    "q_little_law" -> (qLittleLaw _),
    "q_mood_median" -> (qMoodMedian _),
    "q_gumbel_fit" -> (qGumbelFit _),
    "q_ljung_box" -> (qLjungBox _),
    "q_km_ci" -> (qKmCi _),
    "q_qte" -> (qQte _),
    "q_energy_distance" -> (qEnergyDistance _),
    "q_imr_chart" -> (qImrChart _),
    "q_binary_segmentation" -> (qBinarySegmentation _),
    "q_croston" -> (qCroston _),
    "q_mantel_haenszel" -> (qMantelHaenszel _),
    "q_fano_factor" -> (qFanoFactor _),
    "q_atkinson" -> (qAtkinson _),
    "q_em_gauss2" -> (qEmGauss2 _),
    "q_local_bridges" -> (qLocalBridges _),
    "q_fisher_index" -> (qFisherIndex _),
    "q_rfm_migration" -> (qRfmMigration _),
    "q_adoption_curve" -> (qAdoptionCurve _),
    "q_rank_persistence" -> (qRankPersistence _),
    "q_bradley_terry" -> (qBradleyTerry _),
    "q_lorenz_asymmetry" -> (qLorenzAsymmetry _),
    "q_gamma_fit" -> (qGammaFit _),
    "q_realized_vol" -> (qRealizedVol _),
    "q_max_drawdown" -> (qMaxDrawdown _),
    "q_conformal_interval" -> (qConformalInterval _),
    "q_german_tank" -> (qGermanTank _),
    "q_topk_stability" -> (qTopkStability _),
    "q_cohens_h" -> (qCohensH _),
    "q_cooks_distance" -> (qCooksDistance _),
    "q_hoeffding_audit" -> (qHoeffdingAudit _),
    "q_dickey_fuller" -> (qDickeyFuller _),
    "q_enrichment" -> (qEnrichment _),
    "q_jackknife" -> (qJackknife _),
    "q_partial_moments" -> (qPartialMoments _),
    "q_metric_concordance" -> (qMetricConcordance _),
    "q_nb_fit" -> (qNbFit _),
  )

  private[graft] def warehouse3OracleMap: Map[String, String] = Map(
    "q_ams_f2" ->
      """WITH c AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY user_id),
        |sk AS (
        |  SELECT CAST(i.range AS BIGINT) AS i,
        |    CAST(sum(cnt * (1 - 2 * (CAST('0x' || substr(md5(
        |      'ams|' || CAST(i.range AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)
        |      ), 1, 15) AS BIGINT) % 2))) AS BIGINT) AS z
        |  FROM c CROSS JOIN range(8) i GROUP BY 1),
        |s2 AS (SELECT i, z, z * z AS z2 FROM sk),
        |ex AS (
        |  SELECT CAST(sum(cnt * cnt) AS BIGINT) AS f2_exact,
        |    CAST(count(*) AS BIGINT) AS n_keys FROM c),
        |mn AS (SELECT CAST(sum(z2) AS BIGINT) // 8 AS est_mean FROM s2),
        |md AS (
        |  SELECT z2 AS est_median_lo FROM (
        |    SELECT z2, row_number() OVER (ORDER BY z2, i) AS rn FROM s2)
        |  WHERE rn = 4)
        |SELECT n_keys, f2_exact, est_mean, est_median_lo,
        |  abs(est_mean - f2_exact) * 1000000 // f2_exact AS err_mean_ppm,
        |  abs(est_median_lo - f2_exact) * 1000000 // f2_exact AS err_median_ppm
        |FROM ex CROSS JOIN mn CROSS JOIN md""".stripMargin,

    "q_compaction_plan" ->
      """WITH f AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS sz
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT day, sz,
        |    CAST(coalesce(sum(sz) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM f)
        |SELECT cum_before // 5000 AS grp,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  min(day) AS first_day, max(day) AS last_day,
        |  CAST(sum(sz) AS BIGINT) * 1000000 // 5000 AS fill_ppm
        |FROM c GROUP BY 1 ORDER BY grp""".stripMargin,

    "q_zone_map" ->
      """WITH li AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS ok,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS sd
        |  FROM lineitem),
        |b AS (
        |  SELECT max(ok) AS max_ok, min(sd) AS min_sd, max(sd) AS max_sd,
        |    CAST(count(*) AS BIGINT) AS n_rows FROM li),
        |zoned AS (
        |  SELECT 'natural' AS layout, ok * 64 // (max_ok + 1) AS zone, sd, n_rows
        |  FROM li CROSS JOIN b
        |  UNION ALL
        |  SELECT 'clustered' AS layout,
        |    (sd - min_sd) * 64 // (max_sd - min_sd + 1) AS zone, sd, n_rows
        |  FROM li CROSS JOIN b),
        |z AS (
        |  SELECT layout, zone, min(sd) AS zmin, max(sd) AS zmax,
        |    CAST(count(*) AS BIGINT) AS rows_z, max(n_rows) AS n_rows
        |  FROM zoned GROUP BY 1, 2),
        |lohi AS (
        |  SELECT CAST(DATE '1994-01-01' - DATE '1970-01-01' AS BIGINT) AS lo,
        |    CAST(DATE '1994-03-31' - DATE '1970-01-01' AS BIGINT) AS hi)
        |SELECT layout, CAST(count(*) AS BIGINT) AS n_zones,
        |  CAST(sum(CASE WHEN zmax < lo OR zmin > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_skippable,
        |  CAST(sum(CASE WHEN zmax < lo OR zmin > hi THEN rows_z ELSE 0 END) AS BIGINT)
        |    AS skip_rows,
        |  CAST(sum(CASE WHEN zmax < lo OR zmin > hi THEN rows_z ELSE 0 END) AS BIGINT)
        |    * 1000000 // max(n_rows) AS skip_ppm
        |FROM z CROSS JOIN lohi GROUP BY layout ORDER BY layout""".stripMargin,
    "q_order_consolidation" ->
      """WITH o AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation, o_custkey,
        |    o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |lagged AS (
        |  SELECT nation, day,
        |    lag(day) OVER (PARTITION BY o_custkey
        |      ORDER BY day, o_orderkey) AS prev_day
        |  FROM o)
        |SELECT nation, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN prev_day IS NOT NULL AND day - prev_day <= 7
        |    THEN 1 ELSE 0 END) AS BIGINT) AS mergeable,
        |  CAST(sum(CASE WHEN prev_day IS NOT NULL AND day - prev_day <= 7
        |    THEN 1 ELSE 0 END) AS BIGINT) * 1000000
        |    // CAST(count(*) AS BIGINT) AS mergeable_ppm
        |FROM lagged GROUP BY nation ORDER BY nation""".stripMargin,
    "q_topk_per_quarter" ->
      """WITH qrev AS (
        |  SELECT CAST(year(l_shipdate) * 4 + (month(l_shipdate) - 1) // 3
        |      AS BIGINT) AS q, p_brand,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS rev_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT q, p_brand, rev_c,
        |    CAST(row_number() OVER (PARTITION BY q
        |      ORDER BY rev_c DESC, p_brand) AS BIGINT) AS rank
        |  FROM qrev)
        |SELECT q, rank, p_brand, rev_c FROM r WHERE rank <= 5
        |ORDER BY q, rank""".stripMargin,
    "q_growth_accounting" ->
      """WITH weeks AS (
        |  SELECT DISTINCT user_id,
        |    (epoch_ns(ts) // 1000000000) // 604800 AS week
        |  FROM events),
        |first AS (
        |  SELECT user_id, CAST(min(week) AS BIGINT) AS fw
        |  FROM weeks GROUP BY 1),
        |flagged AS (
        |  SELECT w.week, w.user_id,
        |    CASE WHEN w.week = f.fw THEN 'new'
        |      WHEN p.user_id IS NOT NULL THEN 'retained'
        |      ELSE 'resurrected' END AS status
        |  FROM weeks w JOIN first f ON w.user_id = f.user_id
        |  LEFT JOIN weeks p
        |    ON w.user_id = p.user_id AND p.week + 1 = w.week),
        |counts AS (
        |  SELECT week, CAST(count(*) AS BIGINT) AS wau,
        |    CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS new_users,
        |    CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS retained,
        |    CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS resurrected
        |  FROM flagged GROUP BY week),
        |churn AS (
        |  SELECT w.week + 1 AS week,
        |    CAST(sum(CASE WHEN nx.user_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS churned
        |  FROM weeks w LEFT JOIN weeks nx
        |    ON w.user_id = nx.user_id AND nx.week = w.week + 1
        |  GROUP BY 1)
        |SELECT counts.week, wau, new_users, retained, resurrected,
        |  coalesce(churned, 0) AS churned,
        |  new_users + retained + resurrected = wau AS identity_holds
        |FROM counts LEFT JOIN churn ON counts.week = churn.week
        |ORDER BY counts.week""".stripMargin,
    "q_retention_fit" ->
      """WITH weeks AS (
        |  SELECT DISTINCT user_id,
        |    (epoch_ns(ts) // 1000000000) // 604800 AS week
        |  FROM events),
        |cohorts AS (
        |  SELECT user_id, CAST(min(week) AS BIGINT) AS cw
        |  FROM weeks GROUP BY 1),
        |tri AS (
        |  SELECT CAST(w.week - c.cw AS BIGINT) AS off,
        |    CAST(count(DISTINCT w.user_id) AS BIGINT) AS active
        |  FROM weeks w JOIN cohorts c ON w.user_id = c.user_id
        |  GROUP BY 1),
        |base AS (
        |  SELECT CAST(count(DISTINCT w.user_id) AS BIGINT) AS n0
        |  FROM weeks w JOIN cohorts c ON w.user_id = c.user_id
        |  WHERE w.week = c.cw),
        |pts AS (
        |  SELECT off,
        |    CAST(floor(ln(CAST(active AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT) AS lr_unat
        |  FROM tri CROSS JOIN base),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(off) AS BIGINT) AS sx,
        |    CAST(sum(lr_unat) AS BIGINT) AS sy,
        |    CAST(sum(off * off) AS BIGINT) AS sxx,
        |    CAST(sum(off * lr_unat) AS BIGINT) AS sxy
        |  FROM pts)
        |SELECT n AS n_offsets,
        |  (n * sxy - sx * sy) // (n * sxx - sx * sx)
        |    AS decay_unat_per_week
        |FROM m""".stripMargin,
    "q_price_endings" ->
      """WITH e AS (
        |  SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) % 100
        |      AS ending,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM part GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM e)
        |SELECT ending, n, n * 1000000 // total AS share_ppm,
        |  n * 50 > total AS over_2x_uniform
        |FROM e CROSS JOIN tot ORDER BY ending""".stripMargin,
    "q_design_effect" ->
      """WITH per AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS ss
        |  FROM (SELECT o_custkey,
        |          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS v
        |        FROM orders) t
        |  GROUP BY 1),
        |agg0 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(m) AS BIGINT) AS n,
        |    CAST(sum(sv) AS BIGINT) AS st, CAST(sum(ss) AS BIGINT) AS sst,
        |    CAST(sum((sv * 1000) // m) AS BIGINT) AS bg_milli
        |  FROM per),
        |e AS (
        |  SELECT k, n,
        |    (CAST(bg_milli AS DOUBLE) / 1000.0
        |      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(k AS DOUBLE) - 1.0) AS msb,
        |    (CAST(sst AS DOUBLE) - CAST(bg_milli AS DOUBLE) / 1000.0)
        |      / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
        |    CAST(n AS DOUBLE) / CAST(k AS DOUBLE) AS mbar
        |  FROM agg0),
        |f AS (
        |  SELECT k, n, mbar,
        |    (msb - msw) / (msb + (mbar - 1.0) * msw) AS icc
        |  FROM e)
        |SELECT k AS n_customers, n AS n_orders, icc,
        |  1.0 + (mbar - 1.0) * icc AS deff,
        |  CAST(n AS DOUBLE) / (1.0 + (mbar - 1.0) * icc) AS n_effective
        |FROM f""".stripMargin,
    "q_activity_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS d
        |  FROM events),
        |ranked AS (
        |  SELECT user_id, d,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
        |  FROM days),
        |streaks AS (
        |  SELECT user_id, d - rn AS island, CAST(count(*) AS BIGINT) AS len
        |  FROM ranked GROUP BY 1, 2),
        |per AS (
        |  SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
        |    CAST(count(*) AS BIGINT) AS n_streaks,
        |    CAST(sum(len) AS BIGINT) AS active_days
        |  FROM streaks GROUP BY 1),
        |top AS (SELECT * FROM per
        |  ORDER BY longest_streak DESC, user_id LIMIT 20)
        |SELECT user_id, longest_streak, n_streaks, active_days
        |FROM top ORDER BY user_id""".stripMargin,
    "q_order_size_dist" ->
      """WITH sizes AS (
        |  SELECT sz, CAST(count(*) AS BIGINT) AS n_orders FROM (
        |    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS sz
        |    FROM lineitem GROUP BY 1) t
        |  GROUP BY sz),
        |tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM sizes),
        |sh AS (
        |  SELECT sz, n_orders, n_orders * 1000000 // total AS share_ppm
        |  FROM sizes CROSS JOIN tot)
        |SELECT sz, n_orders, share_ppm,
        |  CAST(sum(share_ppm) OVER (ORDER BY sz
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_ppm
        |FROM sh ORDER BY sz""".stripMargin,
    "q_multiple_testing" ->
      """WITH per AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS gn,
        |  CAST(sum(x) AS BIGINT) AS gx FROM per),
        |j AS (
        |  SELECT nation, n, x, gn - n AS rn, gx - x AS rx, gn, gx
        |  FROM per CROSS JOIN tot),
        |z AS (
        |  SELECT nation, n, x,
        |    (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
        |      - CAST(rx AS DOUBLE) / CAST(rn AS DOUBLE))
        |    / sqrt((CAST(gx AS DOUBLE) / CAST(gn AS DOUBLE))
        |        * (1.0 - CAST(gx AS DOUBLE) / CAST(gn AS DOUBLE))
        |        * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(rn AS DOUBLE)))
        |      AS z
        |  FROM j)
        |SELECT nation, n, x, z,
        |  abs(z) > 1.96 AS naive_sig,
        |  abs(z) > 3.0902 AS bonferroni_sig
        |FROM z ORDER BY nation""".stripMargin,
    "q_geo_mean" ->
      """WITH per AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    CAST(floor(ln(CAST(CAST(floor(o_totalprice * 100 + 0.5)
        |      AS BIGINT) AS DOUBLE) / 100.0) * 1000000 + 0.5) AS BIGINT)
        |      AS ln_unat
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT nation, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(ln_unat) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS geo_mean_ln_unat
        |FROM per GROUP BY nation ORDER BY nation""".stripMargin,
    "q_abc_xyz" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |    year(l_shipdate) * 4 + (month(l_shipdate) - 1) // 3 AS q,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |perq AS (
        |  SELECT l_partkey, q, CAST(sum(qty) AS BIGINT) AS dq
        |  FROM li GROUP BY 1, 2),
        |xyz AS (
        |  SELECT l_partkey,
        |    CASE WHEN (k * sdd - sd * sd) * k * 4 <= (k - 1) * sd * sd
        |      THEN 'X'
        |      WHEN (k * sdd - sd * sd) * k <= (k - 1) * sd * sd THEN 'Y'
        |      ELSE 'Z' END AS xyz
        |  FROM (SELECT l_partkey, CAST(count(*) AS BIGINT) AS k,
        |          CAST(sum(dq) AS BIGINT) AS sd,
        |          CAST(sum(dq * dq) AS BIGINT) AS sdd
        |        FROM perq GROUP BY 1) t),
        |rev AS (
        |  SELECT l_partkey, CAST(sum(cents) AS BIGINT) AS cents
        |  FROM li GROUP BY 1),
        |run AS (
        |  SELECT l_partkey, cents,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS run_sum
        |  FROM rev),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM rev),
        |abc AS (
        |  SELECT l_partkey,
        |    CASE WHEN run_sum * 5 <= t * 4 THEN 'A'
        |      WHEN run_sum * 20 <= t * 19 THEN 'B' ELSE 'C' END AS abc
        |  FROM run CROSS JOIN tot)
        |SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts
        |FROM abc JOIN xyz USING (l_partkey)
        |GROUP BY 1, 2 ORDER BY abc, xyz""".stripMargin,
    "q_winback" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |gapped AS (
        |  SELECT o_custkey, day,
        |    lag(day) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey)
        |      AS prev_day
        |  FROM o),
        |fr AS (
        |  SELECT o_custkey, CAST(min(day) AS BIGINT) AS return_day
        |  FROM gapped
        |  WHERE prev_day IS NOT NULL AND day - prev_day >= 730
        |  GROUP BY 1),
        |post AS (
        |  SELECT o.o_custkey, return_day,
        |    CAST(count(*) AS BIGINT) AS post_orders,
        |    CAST(sum(cents) AS BIGINT) AS post_c
        |  FROM o JOIN fr ON o.o_custkey = fr.o_custkey
        |  WHERE day >= return_day
        |  GROUP BY 1, 2)
        |SELECT 1970 + return_day // 365 AS return_year_approx,
        |  CAST(count(*) AS BIGINT) AS winback_customers,
        |  CAST(sum(post_orders) AS BIGINT) AS post_orders,
        |  CAST(sum(post_c) AS BIGINT) AS post_revenue_c
        |FROM post GROUP BY 1 ORDER BY return_year_approx""".stripMargin,
    "q_discount_leakage" ->
      """WITH li AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(floor(l_discount * 1000 + 0.5) AS BIGINT) AS disc_milli
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT prio, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(cents) AS BIGINT) AS gross_c,
        |  CAST(sum(cents * disc_milli // 1000) AS BIGINT) AS leak_c,
        |  CAST(sum(cents * disc_milli // 1000) AS BIGINT) * 1000000
        |    // CAST(sum(cents) AS BIGINT) AS leak_ppm,
        |  CAST(sum(disc_milli) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS mean_disc_milli,
        |  CAST(max(disc_milli) AS BIGINT) AS max_disc_milli
        |FROM li GROUP BY prio ORDER BY prio""".stripMargin,
    "q_supplier_risk" ->
      """WITH per AS (
        |  SELECT l_partkey,
        |    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t,
        |  CAST(count(*) AS BIGINT) AS n_parts_total FROM per)
        |SELECT n_suppliers, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(count(*) AS BIGINT) * 1000000 // n_parts_total
        |    AS part_share_ppm,
        |  CAST(sum(cents) AS BIGINT) * 1000000 // t AS revenue_share_ppm
        |FROM per CROSS JOIN tot
        |GROUP BY n_suppliers, n_parts_total, t
        |ORDER BY n_suppliers""".stripMargin,
    "q_effect_stability" ->
      """WITH per AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    o_custkey % 2 AS arm, o_custkey,
        |    CAST(max(CASE WHEN o_totalprice >= 200000.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM orders GROUP BY 1, 2, 3),
        |g AS (
        |  SELECT yr,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
        |      AS x0,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
        |      AS x1
        |  FROM per GROUP BY yr),
        |g2 AS (
        |  SELECT yr, n0, n1,
        |    x1 * 1000000 // n1 - x0 * 1000000 // n0 AS gap_ppm
        |  FROM g),
        |tr AS (
        |  SELECT CAST(sign(CAST(count(*) * sum(yr * gap_ppm)
        |    - sum(yr) * sum(gap_ppm) AS DOUBLE)) AS BIGINT) AS trend_sign
        |  FROM g2)
        |SELECT yr, n0, n1, gap_ppm, trend_sign
        |FROM g2 CROSS JOIN tr ORDER BY yr""".stripMargin,
    "q_returns_by_discount" ->
      """WITH li AS (
        |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS band,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        |  FROM lineitem),
        |g AS (
        |  SELECT band, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(ret) AS BIGINT) AS x
        |  FROM li GROUP BY band),
        |g2 AS (SELECT band, n, x, x * 1000000 // n AS rate_ppm FROM g),
        |tr AS (
        |  SELECT CAST(sign(CAST(count(*) * sum(band * rate_ppm)
        |    - sum(band) * sum(rate_ppm) AS DOUBLE)) AS BIGINT)
        |    AS trend_sign
        |  FROM g2)
        |SELECT band, n, x, rate_ppm, trend_sign
        |FROM g2 CROSS JOIN tr ORDER BY band""".stripMargin,
    "q_ratio_to_ma" ->
      """WITH monthly AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mo,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |rat AS (
        |  SELECT mo % 12 AS month_of_year,
        |    v * 1000000 // (ma_sum // 12) AS ratio_ppm
        |  FROM (
        |    SELECT mo, v,
        |      CAST(sum(v) OVER w AS BIGINT) AS ma_sum,
        |      CAST(count(*) OVER w AS BIGINT) AS ma_n
        |    FROM monthly
        |    WINDOW w AS (ORDER BY mo
        |      ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)) t
        |  WHERE ma_n = 12)
        |SELECT CAST(month_of_year AS BIGINT) AS month_of_year,
        |  CAST(count(*) AS BIGINT) AS n_months,
        |  CAST(sum(ratio_ppm) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS seasonal_index_ppm
        |FROM rat GROUP BY 1 ORDER BY month_of_year""".stripMargin,
    "q_click_to_buy_latency" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |gapped AS (
        |  SELECT p.event_id,
        |    (SELECT (epoch_ns(p.ts) - epoch_ns(c.ts)) // 1000000000
        |     FROM c WHERE c.user_id = p.user_id AND c.ts < p.ts
        |     ORDER BY c.ts DESC LIMIT 1) AS gap_s
        |  FROM p),
        |wg AS (SELECT event_id, CAST(gap_s AS BIGINT) AS gap_s
        |  FROM gapped WHERE gap_s IS NOT NULL),
        |ranked AS (
        |  SELECT gap_s,
        |    CAST(row_number() OVER (ORDER BY gap_s, event_id) AS BIGINT)
        |      AS rnk,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM wg),
        |quant AS (
        |  SELECT max(n) AS attributed,
        |    max(CASE WHEN rnk = greatest((n * 10 + 99) // 100, 1)
        |      THEN gap_s END) AS p10_s,
        |    max(CASE WHEN rnk = greatest((n * 50 + 99) // 100, 1)
        |      THEN gap_s END) AS p50_s,
        |    max(CASE WHEN rnk = greatest((n * 90 + 99) // 100, 1)
        |      THEN gap_s END) AS p90_s
        |  FROM ranked),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS purchases FROM p)
        |SELECT purchases, attributed, p10_s, p50_s, p90_s
        |FROM quant CROSS JOIN tot""".stripMargin,
    "q_loyalty_ladder" ->
      """WITH per AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS m
        |  FROM orders GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS customers,
        |  CAST(sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS repeat2_ppm,
        |  CAST(sum(CASE WHEN m >= 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS repeat5_ppm,
        |  CAST(sum(CASE WHEN m >= 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS repeat10_ppm
        |FROM per""".stripMargin,
    "q_top_movers" ->
      """WITH bw AS (
        |  SELECT p_brand,
        |    CAST((CAST(l_shipdate AS DATE) - DATE '1970-01-01' + 3) // 7
        |      AS BIGINT) AS wk,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS rev_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT b.p_brand, b.wk, a.rev_c AS prev_c, b.rev_c AS cur_c,
        |    b.rev_c - a.rev_c AS delta_c
        |  FROM bw a JOIN bw b
        |    ON a.p_brand = b.p_brand AND a.wk + 1 = b.wk),
        |top AS (SELECT * FROM pairs
        |  ORDER BY abs(delta_c) DESC, p_brand, wk LIMIT 10)
        |SELECT p_brand, wk, prev_c, cur_c, delta_c FROM top
        |ORDER BY p_brand, wk""".stripMargin,
    "q_reach_frequency" ->
      """WITH clicks AS (
        |  SELECT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 4
        |      AS channel
        |  FROM events WHERE event_type = 'click'),
        |uc AS (
        |  SELECT channel, user_id, CAST(count(*) AS BIGINT) AS touches
        |  FROM clicks GROUP BY 1, 2),
        |tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS clickers
        |  FROM uc)
        |SELECT channel, CAST(count(*) AS BIGINT) AS reach,
        |  CAST(count(*) AS BIGINT) * 1000000 // clickers AS reach_ppm,
        |  CAST(sum(touches) AS BIGINT) * 1000 // CAST(count(*) AS BIGINT)
        |    AS freq_milli
        |FROM uc CROSS JOIN tot
        |GROUP BY channel, clickers ORDER BY channel""".stripMargin,
    "q_event_value_profile" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli
        |  FROM events),
        |r AS (
        |  SELECT event_type, v_milli,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(v_milli AS DOUBLE), event_id) AS BIGINT)
        |      AS rnk,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM e),
        |quant AS (
        |  SELECT event_type, max(n) AS n,
        |    max(CASE WHEN rnk = greatest((n * 50 + 99) // 100, 1)
        |      THEN v_milli END) AS p50_milli,
        |    max(CASE WHEN rnk = greatest((n * 90 + 99) // 100, 1)
        |      THEN v_milli END) AS p90_milli
        |  FROM r
        |  WHERE rnk IN (greatest((n * 50 + 99) // 100, 1),
        |    greatest((n * 90 + 99) // 100, 1))
        |  GROUP BY event_type),
        |means AS (
        |  SELECT event_type, CAST(sum(v_milli) AS BIGINT) AS sv
        |  FROM e GROUP BY 1)
        |SELECT quant.event_type, n, sv // n AS mean_milli, p50_milli,
        |  p90_milli
        |FROM quant JOIN means ON quant.event_type = means.event_type
        |ORDER BY quant.event_type""".stripMargin,
    "q_log_rank" ->
      """WITH per AS (
        |  SELECT CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 2 END AS grp,
        |    (CAST(CAST(max(o_orderdate) AS DATE) - DATE '1970-01-01' AS BIGINT)
        |     - CAST(CAST(min(o_orderdate) AS DATE) - DATE '1970-01-01' AS BIGINT)) // 90 AS tq,
        |    CASE WHEN CAST(CAST(max(o_orderdate) AS DATE) - DATE '1970-01-01' AS BIGINT)
        |              < CAST(DATE '2000-07-01' - DATE '1970-01-01' AS BIGINT)
        |         THEN 1 ELSE 0 END AS ev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        |  GROUP BY o_custkey, c_mktsegment),
        |cells AS (
        |  SELECT grp, tq, sum(ev) AS d, count(*) AS tot FROM per GROUP BY grp, tq),
        |frame AS (
        |  SELECT g.grp, t.tq, coalesce(c.d, 0) AS d, coalesce(c.tot, 0) AS tot
        |  FROM (SELECT DISTINCT grp FROM cells) g
        |  CROSS JOIN (SELECT DISTINCT tq FROM cells) t
        |  LEFT JOIN cells c ON c.grp = g.grp AND c.tq = t.tq),
        |risk AS (
        |  SELECT grp, tq, d,
        |    sum(tot) OVER (PARTITION BY grp ORDER BY tq DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at
        |  FROM frame),
        |byt AS (
        |  SELECT tq,
        |    sum(CASE WHEN grp = 1 THEN d END) AS d1,
        |    sum(d) AS dt,
        |    sum(CASE WHEN grp = 1 THEN n_at END) AS n1,
        |    sum(n_at) AS nt
        |  FROM risk GROUP BY tq),
        |acc AS (
        |  SELECT CAST(sum(d1) AS BIGINT) AS o1,
        |    CAST(sum(CAST(floor(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS e1_micro,
        |    CAST(sum(CAST(floor(CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE)) * (1.0 - CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE)) * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS v_micro
        |  FROM byt WHERE dt > 0 AND nt > 1)
        |SELECT o1, e1_micro, v_micro,
        |  CAST(floor((CAST(o1 AS DOUBLE) - e1_micro / 1000000.0) * (CAST(o1 AS DOUBLE) - e1_micro / 1000000.0) / (v_micro / 1000000.0) * 1000 + 0.5) AS BIGINT) AS chi2_milli
        |FROM acc""".stripMargin,
    "q_l_diversity" ->
      """WITH cells AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment,
        |         o_orderpriority, count(*) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2, 3)
        |SELECT nationkey, c_mktsegment,
        |  CAST(sum(n) AS BIGINT) AS k_anon,
        |  CAST(count(*) AS BIGINT) AS l_distinct,
        |  CAST(floor(exp(ln(CAST(CAST(sum(n) AS BIGINT) AS DOUBLE))
        |      - (CAST(sum(CAST(floor(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0)
        |        / CAST(CAST(sum(n) AS BIGINT) AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS entropy_l_milli,
        |  CASE WHEN count(*) >= 3 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS meets_l3
    |FROM cells
        |GROUP BY nationkey, c_mktsegment
        |ORDER BY nationkey, c_mktsegment""".stripMargin,
    "q_durbin_watson" ->
      """WITH monthly AS (
        |  SELECT CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT) AS x,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yc
        |  FROM orders GROUP BY 1),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(yc) AS BIGINT) AS sy,
        |         CAST(sum(x * yc) AS BIGINT) AS sxy
        |  FROM monthly),
        |withb AS (
        |  SELECT m.x, m.yc, s.n, s.sx, s.sy,
        |    (CAST(s.n AS DOUBLE) * CAST(s.sxy AS DOUBLE) - CAST(s.sx AS DOUBLE) * CAST(s.sy AS DOUBLE))
        |      / (CAST(s.n AS DOUBLE) * CAST(s.sxx AS DOUBLE) - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)) AS b
        |  FROM monthly m CROSS JOIN sums s),
        |ed AS (
        |  SELECT x, b,
        |    CAST(floor((CAST(yc AS DOUBLE)
        |      - (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |      - b * CAST(x AS DOUBLE)) / 100.0 + 0.5) AS BIGINT) AS ed
        |  FROM withb),
        |lagged AS (
        |  SELECT x, b, ed, lag(ed) OVER (ORDER BY x) AS ep FROM ed),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_months,
        |    CAST(max(CAST(floor(b / 100.0 * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS slope_dollar_milli,
        |    CAST(sum(CASE WHEN ep IS NOT NULL THEN (ed - ep) * (ed - ep) END) AS BIGINT) AS num,
        |    CAST(sum(ed * ed) AS BIGINT) AS den
        |  FROM lagged)
        |SELECT n_months, slope_dollar_milli,
        |  CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS dw_milli,
        |  CAST(floor((1.0 - CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 2.0) * 1000 + 0.5) AS BIGINT) AS rho_milli
        |FROM acc""".stripMargin,
    "q_page_hinkley" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100000 AS v
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s FROM daily),
        |scanned AS (
        |  SELECT day, n, s,
        |    sum(200 * n * v - 201 * s) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
        |  FROM daily CROSS JOIN tot),
        |ph AS (
        |  SELECT day, n, s,
        |    m - min(m) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
        |  FROM scanned)
        |SELECT CAST(max(n) AS BIGINT) AS n_days,
        |  CAST(sum(CASE WHEN ph > 2 * s THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
        |  CAST(min(CASE WHEN ph > 2 * s THEN day END) AS BIGINT) AS first_alarm_day,
        |  CAST(max(ph) AS BIGINT) AS max_ph,
        |  CAST(max(2 * s) AS BIGINT) AS lambda_s
        |FROM ph""".stripMargin,
    "q_rich_club" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges)
        |  GROUP BY node),
        |ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES (2), (4), (8), (16)) t(k)),
        |nrich AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n_rich
        |  FROM ks CROSS JOIN deg WHERE deg > k GROUP BY k),
        |erich AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS e_rich
        |  FROM edges e
        |  JOIN deg du ON du.node = e.u
        |  JOIN deg dv ON dv.node = e.v
        |  CROSS JOIN ks
        |  WHERE du.deg > k AND dv.deg > k GROUP BY k)
        |SELECT n.k, n.n_rich, coalesce(e.e_rich, 0) AS e_rich,
        |  2 * coalesce(e.e_rich, 0) * 1000000 // (n.n_rich * (n.n_rich - 1)) AS phi_ppm
        |FROM nrich n LEFT JOIN erich e ON n.k = e.k
        |WHERE n.n_rich > 1
        |ORDER BY n.k""".stripMargin,
    "q_newsvendor" ->
      """WITH weekly AS (
        |  SELECT p_brand,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) // 7 AS wk,
        |    CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS dem
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |stats AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_weeks,
        |    CAST(sum(dem) AS BIGINT) AS sd
        |  FROM weekly GROUP BY 1),
        |ranked AS (
        |  SELECT p_brand, wk, dem,
        |    CAST(row_number() OVER (PARTITION BY p_brand ORDER BY dem, wk) AS BIGINT) AS rn
        |  FROM weekly)
        |SELECT r.p_brand, s.n_weeks, r.dem AS stock_q,
        |  CAST(floor(CAST(s.sd AS DOUBLE) / CAST(s.n_weeks AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mean_dem_milli,
        |  CAST(floor(CAST(r.dem AS DOUBLE) * CAST(s.n_weeks AS DOUBLE) / CAST(s.sd AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS stock_to_mean_milli
        |FROM ranked r JOIN stats s ON r.p_brand = s.p_brand
        |WHERE r.rn = (9 * s.n_weeks + 9) // 10
        |ORDER BY r.p_brand""".stripMargin,
    "q_eoq" ->
      """WITH span AS (
        |  SELECT CAST(max(CAST(l_shipdate AS DATE) - DATE '1970-01-01')
        |    - min(CAST(l_shipdate AS DATE) - DATE '1970-01-01') + 1 AS BIGINT) AS span_days
        |  FROM lineitem),
        |bybrand AS (
        |  SELECT p_brand, CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS tq,
        |    CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS pc,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
        |calc AS (
        |  SELECT p_brand,
        |    CAST(floor(CAST(tq AS DOUBLE) * 365.0 / CAST(span_days AS DOUBLE) + 0.5) AS BIGINT) AS d_annual,
        |    CAST(floor(0.2 * CAST(pc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 * 1000 + 0.5) AS BIGINT) AS h_milli
        |  FROM bybrand CROSS JOIN span)
        |SELECT p_brand, d_annual, h_milli,
        |  CAST(floor(sqrt(2.0 * CAST(d_annual AS DOUBLE) * 100.0 / (h_milli / 1000.0))) AS BIGINT) AS eoq_units,
        |  CAST(floor(CAST(d_annual AS DOUBLE) / floor(sqrt(2.0 * CAST(d_annual AS DOUBLE) * 100.0 / (h_milli / 1000.0))) * 1000 + 0.5) AS BIGINT) AS orders_per_year_milli
        |FROM calc ORDER BY p_brand""".stripMargin,
    "q_friedman" ->
      """WITH monthly AS (
        |  SELECT CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
        |    o_orderpriority,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1, 2),
        |complete AS (SELECT m FROM monthly GROUP BY m HAVING count(*) = 5),
        |ranked AS (
        |  SELECT o_orderpriority,
        |    CAST(row_number() OVER (PARTITION BY mo.m ORDER BY rev, o_orderpriority) AS BIGINT) AS r
        |  FROM monthly mo JOIN complete c ON mo.m = c.m),
        |rsums AS (
        |  SELECT o_orderpriority, CAST(sum(r) AS BIGINT) AS rj,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ranked GROUP BY 1),
        |acc AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n_blocks, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(rj * rj) AS BIGINT) AS sr2
        |  FROM rsums)
        |SELECT n_blocks, k,
        |  CAST(floor((12.0 * CAST(sr2 AS DOUBLE) / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) - 3.0 * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) * 1000 + 0.5) AS BIGINT) AS chi2_milli,
        |  CAST(floor((12.0 * CAST(sr2 AS DOUBLE) / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) - 3.0 * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) / (CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)) * 1000 + 0.5) AS BIGINT) AS kendall_w_milli
        |FROM acc""".stripMargin,
    "q_hodges_lehmann" ->
      """WITH arma AS (
        |  SELECT o_orderkey AS k_a, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c_a
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |  ORDER BY CAST('0x' || substr(md5('hla|' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT), o_orderkey
        |  LIMIT 500),
        |armb AS (
        |  SELECT o_orderkey AS k_b, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c_b
        |  FROM orders WHERE o_orderpriority = '5-LOW'
        |  ORDER BY CAST('0x' || substr(md5('hlb|' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT), o_orderkey
        |  LIMIT 500),
        |diffs AS (SELECT c_a - c_b AS d, k_a, k_b FROM arma CROSS JOIN armb),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM diffs),
        |ranked AS (
        |  SELECT d, CAST(row_number() OVER (ORDER BY d, k_a, k_b) AS BIGINT) AS rn
        |  FROM diffs),
        |mid AS (
        |  SELECT n_pairs, sum(d) AS sd, count(*) AS c
        |  FROM ranked CROSS JOIN n
        |  WHERE rn = (n_pairs + 1) // 2 OR rn = n_pairs // 2 + 1
        |  GROUP BY n_pairs),
        |fin AS (
        |  SELECT n_pairs,
        |    CAST(CASE WHEN c = 1 THEN sd * 2 ELSE sd END AS BIGINT) AS hl_x2_cents
        |  FROM mid)
        |SELECT n_pairs, hl_x2_cents,
        |  CAST(floor(hl_x2_cents / 2.0 / 100.0 * 1000 + 0.5) AS BIGINT) AS hl_shift_dollar_milli
        |FROM fin""".stripMargin,
    "q_t_closeness" ->
      """WITH base AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment, o_orderpriority
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cells AS (
        |  SELECT nationkey, c_mktsegment, o_orderpriority, count(*) AS n
        |  FROM base GROUP BY 1, 2, 3),
        |groups AS (
        |  SELECT nationkey, c_mktsegment, CAST(sum(n) AS BIGINT) AS ng
        |  FROM cells GROUP BY 1, 2),
        |gpri AS (
        |  SELECT o_orderpriority, CAST(sum(n) AS BIGINT) AS nj FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(nj) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k FROM gpri),
        |grid AS (
        |  SELECT g.nationkey, g.c_mktsegment, g.ng, gl.o_orderpriority, gl.nj,
        |    CAST(coalesce(c.n, 0) AS BIGINT) AS n, t.nn, t.k
        |  FROM groups g CROSS JOIN gpri gl
        |  LEFT JOIN cells c ON c.nationkey = g.nationkey
        |    AND c.c_mktsegment = g.c_mktsegment
        |    AND c.o_orderpriority = gl.o_orderpriority
        |  CROSS JOIN tot t),
        |cums AS (
        |  SELECT nationkey, c_mktsegment, ng, nn, k,
        |    sum(n * nn - nj * ng) OVER (PARTITION BY nationkey, c_mktsegment
        |      ORDER BY o_orderpriority
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM grid),
        |agg AS (
        |  SELECT nationkey, c_mktsegment, CAST(max(ng) AS BIGINT) AS n_g,
        |    CAST(sum(abs(cum)) AS BIGINT) * 1000000
        |      // (CAST(max(ng) AS BIGINT) * CAST(max(nn) AS BIGINT) * (CAST(max(k) AS BIGINT) - 1)) AS emd_ppm
        |  FROM cums GROUP BY nationkey, c_mktsegment)
        |SELECT nationkey, c_mktsegment, n_g, emd_ppm,
        |  CASE WHEN emd_ppm <= 200000 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS meets_t02
        |FROM agg
        |ORDER BY nationkey, c_mktsegment""".stripMargin,
    "q_little_law" ->
      """WITH se AS (
        |  SELECT l_orderkey,
        |    CAST(max(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS ship_end
        |  FROM lineitem GROUP BY 1),
        |spans AS (
        |  SELECT l_orderkey, ship_end,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS start
        |  FROM se JOIN orders ON l_orderkey = o_orderkey),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(ship_end - start) AS BIGINT) AS sum_lag,
        |    CAST(min(start) AS BIGINT) AS d0, CAST(max(start) AS BIGINT) AS d1
        |  FROM spans),
        |sampledays AS (
        |  SELECT d0 + i * 90 AS day FROM generate_series(0, 39) g(i)
        |  CROSS JOIN tot WHERE d0 + i * 90 <= d1),
        |lobs AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(open_cnt) AS BIGINT) AS sum_open
        |  FROM (SELECT day, count(*) AS open_cnt
        |        FROM spans CROSS JOIN sampledays
        |        WHERE start <= day AND day < ship_end GROUP BY day) q)
        |SELECT n_orders, n_days,
        |  CAST(floor(CAST(sum_lag AS DOUBLE) / CAST(n_orders AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS w_days_milli,
        |  CAST(floor(CAST(n_orders AS DOUBLE) / CAST(d1 - d0 + 1 AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS lambda_milli,
        |  CAST(floor(CAST(n_orders AS DOUBLE) / CAST(d1 - d0 + 1 AS DOUBLE) * (CAST(sum_lag AS DOUBLE) / CAST(n_orders AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS l_little_milli,
        |  CAST(floor(CAST(sum_open AS DOUBLE) / CAST(n_days AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS l_observed_milli,
        |  CAST(floor(CAST(sum_open AS DOUBLE) / CAST(n_days AS DOUBLE) / (CAST(n_orders AS DOUBLE) / CAST(d1 - d0 + 1 AS DOUBLE) * (CAST(sum_lag AS DOUBLE) / CAST(n_orders AS DOUBLE))) * 1000 + 0.5) AS BIGINT) AS agreement_milli
        |FROM lobs CROSS JOIN tot""".stripMargin,
    "q_mood_median" ->
      """WITH vals AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |dom AS (SELECT c, count(*) AS cnt FROM vals GROUP BY c),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM dom),
        |med AS (
        |  SELECT CAST(min(c) AS BIGINT) AS med FROM (
        |    SELECT c, sum(cnt) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM dom) q CROSS JOIN tot WHERE cum * 2 >= n),
        |cont AS (
        |  SELECT grp, CAST(sum(CASE WHEN c > med THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(count(*) AS BIGINT) AS ng
        |  FROM vals CROSS JOIN med GROUP BY grp),
        |tots AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(ng) AS BIGINT) AS nn FROM cont),
        |terms AS (
        |  SELECT nn, med,
        |    CAST(floor((
        |      (CAST(a AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * (CAST(a AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(nn AS DOUBLE))
        |      / (CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(nn AS DOUBLE))
        |    + (CAST(ng - a AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(nn - ta AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * (CAST(ng - a AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(nn - ta AS DOUBLE) / CAST(nn AS DOUBLE))
        |      / (CAST(ng AS DOUBLE) * CAST(nn - ta AS DOUBLE) / CAST(nn AS DOUBLE))
        |    ) * 1000000 + 0.5) AS BIGINT) AS term_micro
        |  FROM cont CROSS JOIN tots CROSS JOIN med)
        |SELECT nn AS n_total, med AS median_cents,
        |  CAST(sum(term_micro) AS BIGINT) AS chi2_micro
        |FROM terms GROUP BY 1, 2""".stripMargin,
    "q_gumbel_fit" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100 AS d
        |  FROM orders GROUP BY 1),
        |maxima AS (
        |  SELECT day // 30 AS blk, CAST(max(d) AS BIGINT) AS m FROM daily GROUP BY 1),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_blocks, CAST(sum(m) AS BIGINT) AS sm,
        |    CAST(sum(m * m) AS BIGINT) AS smm
        |  FROM maxima)
        |SELECT n_blocks,
        |  CAST(floor(CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mean_max_milli,
        |  CAST(floor(sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)) / (CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / pi() * 1000 + 0.5) AS BIGINT) AS beta_milli,
        |  CAST(floor((CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE) - 0.5772156649 * sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)) / (CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / pi()) * 1000 + 0.5) AS BIGINT) AS mu_milli,
        |  CAST(floor((CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE) - 0.5772156649 * sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)) / (CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / pi() - sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)) / (CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / pi() * ln(-ln(1.0 - 1.0 / 100.0))) * 1000 + 0.5) AS BIGINT) AS return_100_milli
        |FROM acc""".stripMargin,
    "q_ljung_box" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100000 AS x
        |  FROM orders GROUP BY 1),
        |idxd AS (
        |  SELECT day, x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx
        |  FROM daily),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx FROM idxd),
        |dev AS (
        |  SELECT idx, n * x - sx AS d, n FROM idxd CROSS JOIN tot),
        |den AS (
        |  SELECT CAST(sum(d * d) AS BIGINT) AS den, CAST(max(n) AS BIGINT) AS n FROM dev),
        |nums AS (
        |  SELECT b.idx - a.idx AS k, CAST(sum(a.d * b.d) AS BIGINT) AS num
        |  FROM dev a JOIN dev b ON b.idx - a.idx BETWEEN 1 AND 7
        |  GROUP BY 1),
        |terms AS (
        |  SELECT k, den.n,
        |    CAST(floor(CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS r_micro,
        |    CAST(floor((CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE)) * (CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE)) / (CAST(den.n AS DOUBLE) - CAST(k AS DOUBLE)) * 1000000000000 + 0.5) AS BIGINT) AS term_pico
        |  FROM nums CROSS JOIN den),
        |cums AS (
        |  SELECT k, n, r_micro,
        |    sum(term_pico) OVER (ORDER BY k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pico
        |  FROM terms)
        |SELECT k, r_micro,
        |  CAST(floor(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * (cum_pico / 1000000000000.0) * 1000 + 0.5) AS BIGINT) AS q_milli
        |FROM cums ORDER BY k""".stripMargin,
    "q_km_ci" ->
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
        |  SELECT tq, d, at_risk,
        |    CASE WHEN at_risk > d THEN
        |      CAST(floor(ln(CAST(at_risk - d AS DOUBLE) / CAST(at_risk AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |    ELSE -13815511 END AS term_micro,
        |    CASE WHEN at_risk > d THEN
        |      CAST(floor(CAST(d AS DOUBLE) / (CAST(at_risk AS DOUBLE) * CAST(at_risk - d AS DOUBLE)) * 1000000000000 + 0.5) AS BIGINT)
        |    ELSE 999999999999 END AS gw_pico
        |  FROM risk),
        |cums AS (
        |  SELECT tq, CAST(at_risk AS BIGINT) AS at_risk,
        |    CAST(sum(term_micro) OVER (ORDER BY tq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS log_surv_micro,
        |    CAST(sum(gw_pico) OVER (ORDER BY tq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS var_pico
        |  FROM termed),
        |fin AS (
        |  SELECT tq, at_risk, log_surv_micro,
        |    CAST(floor(sqrt(var_pico / 1000000000000.0) * 1000000 + 0.5) AS BIGINT) AS se_micro
        |  FROM cums)
        |SELECT tq, at_risk, log_surv_micro, se_micro,
        |  log_surv_micro - CAST(floor(1.96 * CAST(se_micro AS DOUBLE) + 0.5) AS BIGINT) AS lo_micro,
        |  log_surv_micro + CAST(floor(1.96 * CAST(se_micro AS DOUBLE) + 0.5) AS BIGINT) AS hi_micro
        |FROM fin ORDER BY tq""".stripMargin,
    "q_qte" ->
      """WITH base AS (
        |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'U' ELSE 'L' END AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |dom AS (SELECT grp, c, count(*) AS cnt FROM base GROUP BY grp, c),
        |ng AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM dom GROUP BY grp),
        |cums AS (
        |  SELECT d0.grp, d0.c, ng.n,
        |    sum(cnt) OVER (PARTITION BY d0.grp ORDER BY d0.c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM dom d0 JOIN ng ON d0.grp = ng.grp),
        |decs AS (SELECT CAST(i AS BIGINT) AS d FROM generate_series(1, 9) g(i)),
        |qv AS (
        |  SELECT d, grp, CAST(min(c) AS BIGINT) AS v
        |  FROM cums CROSS JOIN decs WHERE cum * 10 >= d * n
        |  GROUP BY d, grp)
        |SELECT d,
        |  CAST(min(CASE WHEN grp = 'U' THEN v END) AS BIGINT) AS v_urgent,
        |  CAST(min(CASE WHEN grp = 'L' THEN v END) AS BIGINT) AS v_low,
        |  CAST(min(CASE WHEN grp = 'U' THEN v END)
        |    - min(CASE WHEN grp = 'L' THEN v END) AS BIGINT) AS qte_cents
        |FROM qv GROUP BY d ORDER BY d""".stripMargin,
    "q_energy_distance" ->
      """WITH armx AS (
        |  SELECT o_orderkey AS k, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |  ORDER BY CAST('0x' || substr(md5('eda|' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT), o_orderkey
        |  LIMIT 300),
        |army AS (
        |  SELECT o_orderkey AS k, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders WHERE o_orderpriority = '5-LOW'
        |  ORDER BY CAST('0x' || substr(md5('edb|' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT), o_orderkey
        |  LIMIT 300),
        |sxy AS (
        |  SELECT CAST(sum(abs(x.c - y.c)) AS BIGINT) AS sxy,
        |    CAST(count(*) AS BIGINT) AS nxy
        |  FROM armx x CROSS JOIN army y),
        |sxx AS (
        |  SELECT CAST(sum(abs(a.c - b.c)) AS BIGINT) AS sxx,
        |    CAST(count(*) AS BIGINT) AS nxx
        |  FROM armx a JOIN armx b ON a.k < b.k),
        |syy AS (
        |  SELECT CAST(sum(abs(a.c - b.c)) AS BIGINT) AS syy,
        |    CAST(count(*) AS BIGINT) AS nyy
        |  FROM army a JOIN army b ON a.k < b.k)
        |SELECT nxy,
        |  CAST(floor(CAST(sxy AS DOUBLE) / CAST(nxy AS DOUBLE) / 100.0 * 1000 + 0.5) AS BIGINT) AS exy_milli,
        |  CAST(floor(CAST(sxx AS DOUBLE) / CAST(nxx AS DOUBLE) / 100.0 * 1000 + 0.5) AS BIGINT) AS exx_milli,
        |  CAST(floor(CAST(syy AS DOUBLE) / CAST(nyy AS DOUBLE) / 100.0 * 1000 + 0.5) AS BIGINT) AS eyy_milli,
        |  CAST(floor((2.0 * CAST(sxy AS DOUBLE) / CAST(nxy AS DOUBLE) - CAST(sxx AS DOUBLE) / CAST(nxx AS DOUBLE) - CAST(syy AS DOUBLE) / CAST(nyy AS DOUBLE)) / 100.0 * 1000 + 0.5) AS BIGINT) AS energy_milli
        |FROM sxy CROSS JOIN sxx CROSS JOIN syy""".stripMargin,
    "q_imr_chart" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100 AS x
        |  FROM orders GROUP BY 1),
        |mr AS (
        |  SELECT day, x, abs(x - lag(x) OVER (ORDER BY day)) AS mr FROM daily),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(mr) AS BIGINT) AS smr, CAST(count(mr) AS BIGINT) AS nmr
        |  FROM mr),
        |lim AS (
        |  SELECT m.day, m.x, s.n_days, s.sx, s.smr, s.nmr,
        |    CAST(s.sx AS DOUBLE) / CAST(s.n_days AS DOUBLE) + 2.66 * CAST(s.smr AS DOUBLE) / CAST(s.nmr AS DOUBLE) AS ucl,
        |    CAST(s.sx AS DOUBLE) / CAST(s.n_days AS DOUBLE) - 2.66 * CAST(s.smr AS DOUBLE) / CAST(s.nmr AS DOUBLE) AS lcl
        |  FROM mr m CROSS JOIN stats s)
        |SELECT CAST(max(n_days) AS BIGINT) AS n_days,
        |  CAST(floor(max(CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS center_milli,
        |  CAST(floor(max(CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS mrbar_milli,
        |  CAST(floor(max(ucl) * 1000 + 0.5) AS BIGINT) AS ucl_milli,
        |  CAST(floor(max(lcl) * 1000 + 0.5) AS BIGINT) AS lcl_milli,
        |  CAST(sum(CASE WHEN CAST(x AS DOUBLE) > ucl THEN 1 ELSE 0 END) AS BIGINT) AS n_above_ucl,
        |  CAST(sum(CASE WHEN CAST(x AS DOUBLE) < lcl THEN 1 ELSE 0 END) AS BIGINT) AS n_below_lcl
        |FROM lim""".stripMargin,
    "q_binary_segmentation" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100000 AS v
        |  FROM orders GROUP BY 1),
        |pre AS (
        |  SELECT day, v, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS tpos,
        |    CAST(sum(v) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS st
        |  FROM daily),
        |tot AS (SELECT CAST(max(tpos) AS BIGINT) AS n, CAST(max(st) AS BIGINT) AS sall FROM pre),
        |lvl1 AS (
        |  SELECT day AS cp1, tpos AS t1, st AS s1, n, sall,
        |    n * st - tpos * sall AS c1
        |  FROM pre CROSS JOIN tot WHERE tpos < n
        |  ORDER BY abs(n * st - tpos * sall) DESC, day LIMIT 1),
        |halves AS (
        |  SELECT p.day,
        |    CASE WHEN p.day <= l.cp1 THEN 'left' ELSE 'right' END AS seg,
        |    CASE WHEN p.day <= l.cp1 THEN p.tpos ELSE p.tpos - l.t1 END AS t_s,
        |    CASE WHEN p.day <= l.cp1 THEN p.st ELSE p.st - l.s1 END AS st_s,
        |    CASE WHEN p.day <= l.cp1 THEN l.t1 ELSE l.n - l.t1 END AS n_s,
        |    CASE WHEN p.day <= l.cp1 THEN l.s1 ELSE l.sall - l.s1 END AS sum_s
        |  FROM pre p CROSS JOIN lvl1 l),
        |h2 AS (
        |  SELECT day, seg, n_s * st_s - t_s * sum_s AS c, t_s, n_s
        |  FROM halves WHERE t_s < n_s AND t_s > 0),
        |lvl2 AS (
        |  SELECT seg, day AS cp_day, CAST(c AS BIGINT) AS cusum,
        |    CAST(t_s AS BIGINT) AS pos_in_seg, CAST(n_s AS BIGINT) AS seg_len
        |  FROM (SELECT h2.*, row_number() OVER (PARTITION BY seg
        |          ORDER BY abs(c) DESC, day) AS rn FROM h2) q
        |  WHERE rn = 1),
        |l1row AS (
        |  SELECT 'all' AS seg, cp1 AS cp_day, CAST(c1 AS BIGINT) AS cusum,
        |    CAST(t1 AS BIGINT) AS pos_in_seg, CAST(n AS BIGINT) AS seg_len
        |  FROM lvl1)
        |SELECT seg, cp_day, cusum, pos_in_seg, seg_len FROM l1row
        |UNION ALL
        |SELECT seg, cp_day, cusum, pos_in_seg, seg_len FROM lvl2
        |ORDER BY seg""".stripMargin,
    "q_croston" ->
      """WITH weekly AS (
        |  SELECT p_brand,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) // 7 AS wk,
        |    CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS dem
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_partkey % 25 = 0
        |  GROUP BY 1, 2),
        |span AS (SELECT CAST(min(wk) AS BIGINT) AS w0, CAST(max(wk) AS BIGINT) AS w1 FROM weekly),
        |sizes AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_demand_weeks,
        |    CAST(sum(dem) AS BIGINT) AS sdem
        |  FROM weekly GROUP BY 1),
        |gaps AS (
        |  SELECT p_brand, CAST(sum(wk - pw) AS BIGINT) AS sgap,
        |    CAST(count(*) AS BIGINT) AS ngap
        |  FROM (SELECT p_brand, wk,
        |          lag(wk) OVER (PARTITION BY p_brand ORDER BY wk) AS pw
        |        FROM weekly) q
        |  WHERE pw IS NOT NULL GROUP BY 1)
        |SELECT s.p_brand, s.n_demand_weeks,
        |  (sp.w1 - sp.w0 + 1 - s.n_demand_weeks) * 1000000 // (sp.w1 - sp.w0 + 1) AS zero_share_ppm,
        |  CAST(floor(CAST(s.sdem AS DOUBLE) / CAST(s.n_demand_weeks AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mean_size_milli,
        |  CAST(floor(CAST(g.sgap AS DOUBLE) / CAST(g.ngap AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mean_interval_milli,
        |  CAST(floor(0.95 * (CAST(s.sdem AS DOUBLE) / CAST(s.n_demand_weeks AS DOUBLE)) / (CAST(g.sgap AS DOUBLE) / CAST(g.ngap AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS sba_forecast_milli
        |FROM sizes s JOIN gaps g ON s.p_brand = g.p_brand CROSS JOIN span sp
        |ORDER BY s.p_brand""".stripMargin,
    "q_mantel_haenszel" ->
      """WITH base AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nat,
        |    o_orderpriority = '1-URGENT' AS exposed,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |dom AS (SELECT c, count(*) AS cnt FROM base GROUP BY c),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM dom),
        |med AS (
        |  SELECT CAST(min(c) AS BIGINT) AS med FROM (
        |    SELECT c, sum(cnt) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM dom) q CROSS JOIN tot WHERE cum * 2 >= n),
        |cells AS (
        |  SELECT nat,
        |    CAST(sum(CASE WHEN exposed AND c > med THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN exposed AND c <= med THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT exposed AND c > med THEN 1 ELSE 0 END) AS BIGINT) AS cc,
        |    CAST(sum(CASE WHEN NOT exposed AND c <= med THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM base CROSS JOIN med GROUP BY nat),
        |f AS (SELECT cells.*, a + b + cc + d AS ni FROM cells WHERE b > 0 AND cc > 0),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
        |    CAST(sum(cc) AS BIGINT) AS sc, CAST(sum(d) AS BIGINT) AS sd,
        |    CAST(sum(CAST(floor(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(ni AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS num_micro,
        |    CAST(sum(CAST(floor(CAST(b AS DOUBLE) * CAST(cc AS DOUBLE) / CAST(ni AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS den_micro
        |  FROM f)
        |SELECT n_strata,
        |  CAST(floor(CAST(sa AS DOUBLE) * CAST(sd AS DOUBLE) / (CAST(sb AS DOUBLE) * CAST(sc AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS crude_or_milli,
        |  CAST(floor(CAST(num_micro AS DOUBLE) / CAST(den_micro AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mh_or_milli
        |FROM acc""".stripMargin,
    "q_fano_factor" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) // 1000000000 // 3600 AS hr FROM events),
        |span AS (SELECT CAST(max(hr) - min(hr) + 1 AS BIGINT) AS h FROM e),
        |hourly AS (
        |  SELECT event_type, hr, count(*) AS c FROM e GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS nt,
        |    CAST(count(*) AS BIGINT) AS nonzero_hours,
        |    CAST(sum(c * c) AS BIGINT) AS scc
        |  FROM hourly GROUP BY 1)
        |SELECT event_type, nt AS n_events, h AS n_hours, nonzero_hours,
        |  CAST(floor((CAST(scc AS DOUBLE) / CAST(h AS DOUBLE) - (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE)) * (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE))) / (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS fano_milli,
        |  CAST(floor(((CAST(scc AS DOUBLE) / CAST(h AS DOUBLE) - (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE)) * (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE))) / (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE)) - 1.0) / (CAST(nt AS DOUBLE) / CAST(h AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS nb_alpha_milli
        |FROM agg CROSS JOIN span
        |ORDER BY event_type""".stripMargin,
    "q_atkinson" ->
      """WITH cust AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS nat,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100 AS xd
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY o.o_custkey, c.c_nationkey),
        |agg AS (
        |  SELECT nat, CAST(count(*) AS BIGINT) AS n, CAST(sum(xd) AS BIGINT) AS sx,
        |    CAST(sum(CAST(floor(ln(CAST(xd AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS slnx_micro
        |  FROM cust GROUP BY nat)
        |SELECT nat, n,
        |  CAST(floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mean_dollar_milli,
        |  CAST(floor(exp((slnx_micro / 1000000.0) / CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS geomean_dollar_milli,
        |  CAST(floor((1.0 - exp((slnx_micro / 1000000.0) / CAST(n AS DOUBLE)) / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS atkinson_ppm
        |FROM agg ORDER BY nat""".stripMargin,
    "q_em_gauss2" ->
      """WITH cust AS (
        |  SELECT CAST(floor(ln(sum(o_totalprice)) * 1000 + 0.5) AS BIGINT) AS x
        |  FROM orders GROUP BY o_custkey),
        |dom AS (SELECT x, count(*) AS cnt FROM cust GROUP BY x),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM cust),
        |cums AS (
        |  SELECT x, sum(cnt) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM dom),
        |q1 AS (SELECT CAST(min(x) AS BIGINT) AS mu1 FROM cums CROSS JOIN tot WHERE cum * 4 >= n),
        |q3 AS (SELECT CAST(min(x) AS BIGINT) AS mu2 FROM cums CROSS JOIN tot WHERE cum * 4 >= n * 3),
        |params AS (
        |  SELECT n, mu1, mu2,
        |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS s2
        |  FROM tot CROSS JOIN q1 CROSS JOIN q3),
        |resp AS (
        |  SELECT p.n, p.mu1, p.mu2, c.x,
        |    CAST(floor(1.0 / (1.0 + exp(
        |      ((CAST(c.x AS DOUBLE) - CAST(p.mu2 AS DOUBLE)) * (CAST(c.x AS DOUBLE) - CAST(p.mu2 AS DOUBLE))
        |     - (CAST(c.x AS DOUBLE) - CAST(p.mu1 AS DOUBLE)) * (CAST(c.x AS DOUBLE) - CAST(p.mu1 AS DOUBLE)))
        |      / (2.0 * p.s2))) * 1000000 + 0.5) AS BIGINT) AS r2_micro
        |  FROM cust c CROSS JOIN params p),
        |acc AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(max(mu1) AS BIGINT) AS mu1_init_milli,
        |    CAST(max(mu2) AS BIGINT) AS mu2_init_milli,
        |    CAST(sum(r2_micro) AS BIGINT) AS sr2,
        |    CAST(sum(r2_micro * x) AS BIGINT) AS sr2x,
        |    CAST(sum((1000000 - r2_micro) * x) AS BIGINT) AS sr1x
        |  FROM resp)
        |SELECT n, mu1_init_milli, mu2_init_milli,
        |  sr2 // n AS pi2_ppm,
        |  CAST(floor(CAST(sr1x AS DOUBLE) / CAST(1000000 * n - sr2 AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mu1_new_micro,
        |  CAST(floor(CAST(sr2x AS DOUBLE) / CAST(sr2 AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mu2_new_micro
        |FROM acc""".stripMargin,
    "q_local_bridges" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |adj AS (
        |  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
        |closed AS (
        |  SELECT DISTINCT least(e1.u, e2.v) AS u, greatest(e1.u, e2.v) AS v
        |  FROM adj e1 JOIN adj e2 ON e1.v = e2.u AND e1.u <> e2.v),
        |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY u),
        |bridges AS (
        |  SELECT e.u, e.v FROM edges e
        |  WHERE NOT EXISTS (SELECT 1 FROM closed c WHERE c.u = e.u AND c.v = e.v)),
        |n AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM bridges) AS n_bridges,
        |    (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges),
        |top AS (
        |  SELECT b.u, b.v, du.deg + dv.deg AS deg_sum
        |  FROM bridges b
        |  JOIN deg du ON du.node = b.u
        |  JOIN deg dv ON dv.node = b.v
        |  ORDER BY deg_sum DESC, b.u, b.v LIMIT 10)
        |SELECT u, v, CAST(deg_sum AS BIGINT) AS deg_sum, n_bridges, n_edges
        |FROM top CROSS JOIN n
        |ORDER BY deg_sum DESC, u, v""".stripMargin,
    "q_fisher_index" ->
      """WITH py AS (
        |  SELECT l_partkey, CAST(year(l_shipdate) AS BIGINT) AS yr,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY l_partkey, year(l_shipdate)),
        |base AS (
        |  SELECT l_partkey, cents AS cents0, qty AS q0 FROM py WHERE yr = 1996),
        |acc AS (
        |  SELECT yr, CAST(count(*) AS BIGINT) AS n_parts,
        |    CAST(sum(cents * q0 // qty) AS BIGINT) AS lnum,
        |    CAST(sum(cents0) AS BIGINT) AS lden,
        |    CAST(sum(cents) AS BIGINT) AS pnum,
        |    CAST(sum(cents0 * qty // q0) AS BIGINT) AS pden
        |  FROM py JOIN base USING (l_partkey) GROUP BY yr)
        |SELECT yr, n_parts,
        |  lnum * 1000000 // lden AS laspeyres_ppm,
        |  pnum * 1000000 // pden AS paasche_ppm,
        |  CAST(floor(sqrt(CAST(lnum * 1000000 // lden AS DOUBLE) * CAST(pnum * 1000000 // pden AS DOUBLE)) + 0.5) AS BIGINT) AS fisher_ppm
        |FROM acc ORDER BY yr""".stripMargin,
    "q_rfm_migration" ->
      """WITH spend AS (
        |  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY 1, 2),
        |dom AS (SELECT yr, c, count(*) AS cnt FROM spend GROUP BY yr, c),
        |ny AS (SELECT yr, CAST(sum(cnt) AS BIGINT) AS n FROM dom GROUP BY yr),
        |cums AS (
        |  SELECT d.yr, d.c, ny.n,
        |    sum(cnt) OVER (PARTITION BY d.yr ORDER BY d.c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM dom d JOIN ny ON d.yr = ny.yr),
        |cutk AS (
        |  SELECT yr, k, CAST(min(c) AS BIGINT) AS cut
        |  FROM cums CROSS JOIN generate_series(1, 2) t(k)
        |  WHERE cum * 3 >= k * n GROUP BY yr, k),
        |cuts AS (
        |  SELECT yr, min(CASE WHEN k = 1 THEN cut END) AS t1,
        |    min(CASE WHEN k = 2 THEN cut END) AS t2
        |  FROM cutk GROUP BY yr),
        |seg AS (
        |  SELECT s.o_custkey, s.yr,
        |    CASE WHEN s.c <= cu.t1 THEN 'L'
        |         WHEN s.c <= cu.t2 THEN 'M' ELSE 'H' END AS seg
        |  FROM spend s JOIN cuts cu ON s.yr = cu.yr),
        |flows AS (
        |  SELECT coalesce(a.seg, 'NONE') AS seg_from,
        |    coalesce(b.seg, 'NONE') AS seg_to, count(*) AS n
        |  FROM (SELECT o_custkey, seg FROM seg WHERE yr = 1996) a
        |  FULL OUTER JOIN (SELECT o_custkey, seg FROM seg WHERE yr = 1997) b
        |    ON a.o_custkey = b.o_custkey
        |  GROUP BY 1, 2),
        |ft AS (SELECT seg_from, CAST(sum(n) AS BIGINT) AS nf FROM flows GROUP BY 1)
        |SELECT f.seg_from, f.seg_to, CAST(f.n AS BIGINT) AS n,
        |  CAST(f.n AS BIGINT) * 1000000 // ft.nf AS share_of_origin_ppm
        |FROM flows f JOIN ft ON f.seg_from = ft.seg_from
        |ORDER BY f.seg_from, f.seg_to""".stripMargin,
    "q_adoption_curve" ->
      """WITH firstm AS (
        |  SELECT m, count(*) AS adopters FROM (
        |    SELECT o_custkey,
        |      CAST(min((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1) AS BIGINT) AS m
        |    FROM orders GROUP BY o_custkey) q
        |  GROUP BY m),
        |tot AS (SELECT CAST(sum(adopters) AS BIGINT) AS na FROM firstm),
        |pts AS (
        |  SELECT m AS x,
        |    CAST(floor(ln(CAST(cum AS DOUBLE) / CAST(na - cum AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
        |  FROM (SELECT m, sum(adopters) OVER (ORDER BY m
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM firstm) c CROSS JOIN tot
        |  WHERE cum > 0 AND cum < na),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS np, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM pts)
        |SELECT np AS n_months, na AS n_adopters,
        |  CAST(floor((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) + 0.5) AS BIGINT) AS rate_micro_per_month,
        |  CAST(floor(-((CAST(sy AS DOUBLE) - (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(np AS DOUBLE)) / ((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 1000 + 0.5) AS BIGINT) AS t50_month_milli
        |FROM acc CROSS JOIN tot""".stripMargin,
    "q_rank_persistence" ->
      """WITH qrev AS (
        |  SELECT CAST((year(l_shipdate) - 1995) * 4 + quarter(l_shipdate) - 1 AS BIGINT) AS q,
        |    p_brand,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT q, p_brand,
        |    CAST(row_number() OVER (PARTITION BY q ORDER BY rev DESC, p_brand) AS BIGINT) AS r
        |  FROM qrev),
        |adj AS (
        |  SELECT a.q, a.p_brand AS brand, a.r AS r0, b.r AS r1
        |  FROM ranked a JOIN ranked b
        |    ON a.p_brand = b.p_brand AND b.q = a.q + 1),
        |top5 AS (
        |  SELECT q, CAST(sum(CASE WHEN r0 <= 5 AND r1 <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS top5_retained
        |  FROM adj GROUP BY q),
        |conc AS (
        |  SELECT x.q, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN (x.r0 < y.r0) = (x.r1 < y.r1) THEN 1 ELSE 0 END) AS BIGINT) AS concordant
        |  FROM adj x JOIN adj y ON x.q = y.q AND x.brand < y.brand
        |  GROUP BY x.q)
        |SELECT t.q, t.top5_retained, c.n_pairs,
        |  c.concordant * 1000000 // c.n_pairs AS concordant_ppm
        |FROM top5 t JOIN conc c ON t.q = c.q
        |ORDER BY t.q""".stripMargin,
    "q_bradley_terry" ->
      """WITH weekly AS (
        |  SELECT p_brand,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) // 7 AS wk,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |duels AS (
        |  SELECT a.p_brand AS bi, b.p_brand AS bj,
        |    CAST(count(*) AS BIGINT) AS nij,
        |    CAST(sum(CASE WHEN a.rev > b.rev THEN 1 ELSE 0 END) AS BIGINT) AS wij
        |  FROM weekly a JOIN weekly b
        |    ON a.wk = b.wk AND a.p_brand < b.p_brand AND a.rev <> b.rev
        |  GROUP BY 1, 2),
        |sym AS (
        |  SELECT bi AS b, bj AS o, nij, wij AS w FROM duels
        |  UNION ALL
        |  SELECT bj AS b, bi AS o, nij, nij - wij AS w FROM duels),
        |s1 AS (
        |  SELECT b, CAST(sum(w) AS BIGINT) AS bw,
        |    CAST(floor(CAST(sum(w) AS DOUBLE) / (CAST(sum(nij) AS DOUBLE) / 2.0) * 1000000 + 0.5) AS BIGINT) AS s1
        |  FROM sym GROUP BY b),
        |s2 AS (
        |  SELECT sym.b, CAST(sum(sym.w) AS BIGINT) AS w2,
        |    CAST(sum(CAST(floor(CAST(sym.nij AS DOUBLE) / ((sb.s1 + so.s1) / 1000000.0) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS den_micro
        |  FROM sym
        |  JOIN s1 sb ON sym.b = sb.b
        |  JOIN s1 so ON sym.o = so.b
        |  GROUP BY sym.b)
        |SELECT s2.b AS brand, s2.w2 AS wins, s1.s1 AS s_iter1_micro,
        |  CAST(floor(CAST(s2.w2 AS DOUBLE) / (s2.den_micro / 1000000.0) * 1000000 + 0.5) AS BIGINT) AS strength_micro
        |FROM s2 JOIN s1 ON s2.b = s1.b
        |ORDER BY strength_micro DESC, brand LIMIT 10""".stripMargin,
    "q_lorenz_asymmetry" ->
      """WITH cust AS (
        |  SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders GROUP BY o_custkey),
        |dom AS (SELECT c, count(*) AS cnt FROM cust GROUP BY c),
        |tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(c * cnt) AS BIGINT) AS tc
        |  FROM dom),
        |cums AS (
        |  SELECT c,
        |    sum(cnt) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn,
        |    sum(c * cnt) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
        |  FROM dom),
        |acc AS (
        |  SELECT CAST(max(cumn) AS BIGINT) AS f_cnt, CAST(max(cumc) AS BIGINT) AS l_cents,
        |    CAST(max(n) AS BIGINT) AS n, CAST(max(tc) AS BIGINT) AS tc
        |  FROM cums CROSS JOIN tot WHERE c * n <= tc)
        |SELECT n AS n_customers,
        |  f_cnt * 1000000 // n AS f_mu_ppm,
        |  l_cents * 1000000 // tc AS l_mu_ppm,
        |  f_cnt * 1000000 // n + l_cents * 1000000 // tc AS asymmetry_ppm
        |FROM acc""".stripMargin,
    "q_gamma_fit" ->
      """WITH se AS (
        |  SELECT l_orderkey,
        |    CAST(min(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS ship
        |  FROM lineitem GROUP BY 1),
        |lags AS (
        |  SELECT o_orderpriority,
        |    ship - CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM se JOIN orders ON l_orderkey = o_orderkey),
        |acc AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(d) AS BIGINT) AS sd, CAST(sum(d * d) AS BIGINT) AS sdd
        |  FROM lags WHERE d > 0 GROUP BY 1)
        |SELECT o_orderpriority, n,
        |  CAST(floor(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mean_days_milli,
        |  CAST(floor((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) / ((CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) * 1000 + 0.5) AS BIGINT) AS shape_milli,
        |  CAST(floor(((CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) / (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS scale_days_milli
        |FROM acc ORDER BY o_orderpriority""".stripMargin,
    "q_realized_vol" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |rets AS (
        |  SELECT CAST(floor(ln(CAST(v AS DOUBLE) / CAST(vp AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS r
        |  FROM (SELECT v, lag(v) OVER (ORDER BY day) AS vp FROM daily) q
        |  WHERE vp IS NOT NULL),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(r) AS BIGINT) AS sr,
        |    CAST(sum(r * r) AS BIGINT) AS srr
        |  FROM rets)
        |SELECT n AS n_returns,
        |  CAST(floor(CAST(sr AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS mean_ret_micro,
        |  CAST(floor(sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) + 0.5) AS BIGINT) AS daily_vol_micro,
        |  CAST(floor(sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) * sqrt(365.0) + 0.5) AS BIGINT) AS annualized_vol_micro
        |FROM acc""".stripMargin,
    "q_max_drawdown" ->
      """WITH monthly AS (
        |  SELECT CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100000 AS v
        |  FROM orders GROUP BY 1),
        |dd AS (
        |  SELECT m, v,
        |    max(v) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM monthly),
        |dd2 AS (SELECT m, v, peak, (peak - v) * 1000000 // peak AS dd_ppm FROM dd),
        |worst AS (
        |  SELECT m AS worst_month, CAST(dd_ppm AS BIGINT) AS max_drawdown_ppm,
        |    v AS trough_v, peak AS peak_v
        |  FROM dd2 ORDER BY dd_ppm DESC, m LIMIT 1),
        |spells AS (
        |  SELECT CAST(max(len) AS BIGINT) AS longest_underwater_months,
        |    CAST(count(*) AS BIGINT) AS n_spells
        |  FROM (SELECT grp, count(*) AS len FROM (
        |          SELECT m, m - row_number() OVER (ORDER BY m) AS grp
        |          FROM dd2 WHERE dd_ppm > 0) i
        |        GROUP BY grp) l)
        |SELECT worst_month, max_drawdown_ppm, trough_v, peak_v,
        |  longest_underwater_months, n_spells
        |FROM worst CROSS JOIN spells""".stripMargin,
    "q_conformal_interval" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
        |    CAST('0x' || substr(md5('cf|' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 2 AS half
        |  FROM orders),
        |means AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n_calib,
        |    CAST(sum(c) AS BIGINT) // CAST(count(*) AS BIGINT) AS mu
        |  FROM base WHERE half = 0 GROUP BY grp),
        |calres AS (
        |  SELECT b.grp, abs(b.c - m.mu) AS r, m.n_calib
        |  FROM base b JOIN means m ON b.grp = m.grp WHERE b.half = 0),
        |dom AS (
        |  SELECT grp, r, count(*) AS cnt, CAST(max(n_calib) AS BIGINT) AS nc
        |  FROM calres GROUP BY grp, r),
        |qhat AS (
        |  SELECT grp, CAST(min(r) AS BIGINT) AS qhat FROM (
        |    SELECT grp, r, nc,
        |      sum(cnt) OVER (PARTITION BY grp ORDER BY r
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM dom) x
        |  WHERE cum * 10 >= (nc + 1) * 9 GROUP BY grp)
        |SELECT b.grp, CAST(max(m.n_calib) AS BIGINT) AS n_calib,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(max(q.qhat) AS BIGINT) AS qhat_cents,
        |  CAST(sum(CASE WHEN abs(b.c - m.mu) <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS coverage_ppm
        |FROM base b JOIN means m ON b.grp = m.grp JOIN qhat q ON b.grp = q.grp
        |WHERE b.half = 1
        |GROUP BY b.grp ORDER BY b.grp""".stripMargin,
    "q_german_tank" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST('0x' || substr(md5('gt|' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 20 AS g
        |  FROM orders),
        |truth AS (
        |  SELECT CAST(max(o_orderkey) AS BIGINT) AS true_max,
        |    CAST(count(*) AS BIGINT) AS n_total
        |  FROM base),
        |samp AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(max(o_orderkey) AS BIGINT) AS m
        |  FROM base WHERE g = 0)
        |SELECT k AS n_sampled, m AS sample_max, true_max,
        |  m + m // k - 1 AS estimate,
        |  abs(m + m // k - 1 - true_max) * 1000000 // true_max AS err_ppm
        |FROM samp CROSS JOIN truth""".stripMargin,
    "q_topk_stability" ->
      """WITH rev AS (
        |  SELECT CAST('0x' || substr(md5('ts|' || CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT) % 2 AS half,
        |    p_brand,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT half, p_brand,
        |    CAST(row_number() OVER (PARTITION BY half ORDER BY rev DESC, p_brand) AS BIGINT) AS r
        |  FROM rev),
        |a AS (SELECT p_brand, r AS ra FROM ranked WHERE half = 0 AND r <= 10),
        |b AS (SELECT p_brand, r AS rb FROM ranked WHERE half = 1 AND r <= 10),
        |common AS (SELECT a.p_brand, ra, rb FROM a JOIN b ON a.p_brand = b.p_brand)
        |SELECT CAST(count(*) AS BIGINT) AS overlap_at_10,
        |  CAST(count(*) AS BIGINT) * 1000000 // (20 - CAST(count(*) AS BIGINT)) AS jaccard_ppm,
        |  CAST(sum(abs(ra - rb)) AS BIGINT) AS footrule
        |FROM common""".stripMargin,
    "q_cohens_h" ->
      """WITH bands AS (
        |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) // 2 AS band,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
        |  FROM lineitem GROUP BY 1),
        |paired AS (
        |  SELECT a.band AS band_lo, a.n AS n_lo, b.n AS n_hi,
        |    a.r * 1000000 // a.n AS rate_lo_ppm,
        |    b.r * 1000000 // b.n AS rate_hi_ppm,
        |    CAST(floor((2.0 * asin(sqrt(CAST(b.r AS DOUBLE) / CAST(b.n AS DOUBLE))) - 2.0 * asin(sqrt(CAST(a.r AS DOUBLE) / CAST(a.n AS DOUBLE)))) * 1000 + 0.5) AS BIGINT) AS cohens_h_milli
        |  FROM bands a JOIN bands b ON b.band = a.band + 1)
        |SELECT band_lo, n_lo, n_hi, rate_lo_ppm, rate_hi_ppm, cohens_h_milli,
        |  CASE WHEN abs(cohens_h_milli) >= 800 THEN 'large'
        |       WHEN abs(cohens_h_milli) >= 500 THEN 'medium'
        |       WHEN abs(cohens_h_milli) >= 200 THEN 'small'
        |       ELSE 'negligible' END AS magnitude
        |FROM paired ORDER BY band_lo""".stripMargin,
    "q_cooks_distance" ->
      """WITH monthly AS (
        |  SELECT CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT) AS x,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yc
        |  FROM orders GROUP BY 1),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(yc) AS BIGINT) AS sy,
        |    CAST(sum(x * yc) AS BIGINT) AS sxy
        |  FROM monthly),
        |resid AS (
        |  SELECT x, n,
        |    CAST(floor((CAST(yc AS DOUBLE) - (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) - b * CAST(x AS DOUBLE)) / 100.0 + 0.5) AS BIGINT) AS ed,
        |    1.0 / CAST(n AS DOUBLE) + (CAST(n AS DOUBLE) * CAST(x AS DOUBLE) - CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(x AS DOUBLE) - CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS h
        |  FROM (SELECT m.x, m.yc, s.n, s.sx, s.sxx, s.sy,
        |          (CAST(s.n AS DOUBLE) * CAST(s.sxy AS DOUBLE) - CAST(s.sx AS DOUBLE) * CAST(s.sy AS DOUBLE))
        |            / (CAST(s.n AS DOUBLE) * CAST(s.sxx AS DOUBLE) - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)) AS b
        |        FROM monthly m CROSS JOIN sums s) q),
        |s2 AS (
        |  SELECT CAST(sum(ed * ed) AS DOUBLE) / (CAST(max(n) AS DOUBLE) - 2.0) AS s2
        |  FROM resid)
        |SELECT x AS m, ed AS resid_dollars,
        |  CAST(floor(h * 1000000 + 0.5) AS BIGINT) AS leverage_micro,
        |  CAST(floor(CAST(ed AS DOUBLE) * CAST(ed AS DOUBLE) * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) * 1000000 + 0.5) AS BIGINT) AS cooks_d_micro
        |FROM resid CROSS JOIN s2
        |ORDER BY cooks_d_micro DESC, m LIMIT 10""".stripMargin,
    "q_hoeffding_audit" ->
      """WITH base AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
        |    CAST('0x' || substr(md5('hf|' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 20 AS g
        |  FROM orders),
        |truth AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sc,
        |    CAST(max(c) AS BIGINT) AS cmax, CAST(min(c) AS BIGINT) AS cmin
        |  FROM base),
        |samp AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(c) AS BIGINT) AS sk
        |  FROM base WHERE g = 0)
        |SELECT k AS n_sampled, n AS n_total,
        |  CAST(floor(abs(CAST(sk AS DOUBLE) / CAST(k AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 * 1000 + 0.5) AS BIGINT) AS abs_err_milli,
        |  CAST(floor(CAST(cmax - cmin AS DOUBLE) * sqrt(ln(200.0) / (2.0 * CAST(k AS DOUBLE))) / 100.0 * 1000 + 0.5) AS BIGINT) AS hoeffding_eps_milli,
        |  CAST(floor(abs(CAST(sk AS DOUBLE) / CAST(k AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(cmax - cmin AS DOUBLE) * sqrt(ln(200.0) / (2.0 * CAST(k AS DOUBLE)))) * 1000000 + 0.5) AS BIGINT) AS bound_utilization_ppm
        |FROM samp CROSS JOIN truth""".stripMargin,
    "q_dickey_fuller" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100000 AS v
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT vp AS x, v - vp AS y
        |  FROM (SELECT v, lag(v) OVER (ORDER BY day) AS vp FROM daily) q
        |  WHERE vp IS NOT NULL),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM pairs)
        |SELECT n AS n_days,
        |  CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS gamma_micro,
        |  CAST(floor(
        |    ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |    / sqrt(
        |      ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |        - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |          * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
        |      / (CAST(n AS DOUBLE) - 2.0)
        |      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |    * 1000 + 0.5) AS BIGINT) AS t_stat_milli,
        |  CAST(-2860 AS BIGINT) AS critical_5pct_milli
        |FROM acc""".stripMargin,
    "q_enrichment" ->
      """WITH cells AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS kb
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(nb) AS BIGINT) AS nn, CAST(sum(kb) AS BIGINT) AS kk FROM cells)
        |SELECT p_brand, nb, kb,
        |  CAST(floor(CAST(nb AS DOUBLE) * CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS expected_milli,
        |  CAST(floor((CAST(kb AS DOUBLE) - CAST(nb AS DOUBLE) * CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE) * (CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)) * (1.0 - CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)) * (CAST(nn - nb AS DOUBLE) / (CAST(nn AS DOUBLE) - 1.0))) * 1000 + 0.5) AS BIGINT) AS z_milli
        |FROM cells CROSS JOIN tot
        |ORDER BY abs(CAST(floor((CAST(kb AS DOUBLE) - CAST(nb AS DOUBLE) * CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE) * (CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)) * (1.0 - CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)) * (CAST(nn - nb AS DOUBLE) / (CAST(nn AS DOUBLE) - 1.0))) * 1000 + 0.5) AS BIGINT)) DESC, p_brand
        |LIMIT 10""".stripMargin,
    "q_jackknife" ->
      """WITH base AS (
        |  SELECT CAST(floor(o_totalprice + 0.5) AS BIGINT) AS d,
        |    CAST('0x' || substr(md5('jk|' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 32 AS g
        |  FROM orders),
        |blocks AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS ng, CAST(sum(d) AS BIGINT) AS sg
        |  FROM base GROUP BY g),
        |tot AS (
        |  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS ss,
        |    CAST(count(*) AS BIGINT) AS gg
        |  FROM blocks),
        |direct AS (SELECT CAST(sum(d * d) AS BIGINT) AS sdd FROM base),
        |loo AS (
        |  SELECT gg, n, ss,
        |    (CAST(ss AS DOUBLE) - CAST(sg AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST(ng AS DOUBLE)) AS mu_g
        |  FROM blocks CROSS JOIN tot),
        |mbar AS (
        |  SELECT CAST(sum(CAST(floor(mu_g * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS smu_micro
        |  FROM loo),
        |acc AS (
        |  SELECT CAST(max(gg) AS BIGINT) AS gg, CAST(max(n) AS BIGINT) AS n,
        |    CAST(max(ss) AS BIGINT) AS ss,
        |    CAST(sum(CAST(floor((mu_g - (smu_micro / 1000000.0) / CAST(gg AS DOUBLE)) * (mu_g - (smu_micro / 1000000.0) / CAST(gg AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS ssq_micro
        |  FROM loo CROSS JOIN mbar)
        |SELECT gg AS n_blocks,
        |  CAST(floor(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mean_dollar_milli,
        |  CAST(floor(sqrt((CAST(gg AS DOUBLE) - 1.0) / CAST(gg AS DOUBLE) * (ssq_micro / 1000000.0)) * 1000 + 0.5) AS BIGINT) AS jk_se_milli,
        |  CAST(floor(sqrt((CAST(sdd AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS direct_se_milli,
        |  CAST(floor(sqrt((CAST(gg AS DOUBLE) - 1.0) / CAST(gg AS DOUBLE) * (ssq_micro / 1000000.0)) / sqrt((CAST(sdd AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS ratio_milli
        |FROM acc CROSS JOIN direct""".stripMargin,
    "q_partial_moments" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100000 AS v
        |  FROM orders GROUP BY 1),
        |dom AS (SELECT v, count(*) AS cnt FROM daily GROUP BY v),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM dom),
        |med AS (
        |  SELECT CAST(min(v) AS BIGINT) AS med FROM (
        |    SELECT v, sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM dom) q CROSS JOIN tot WHERE cum * 2 >= n),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days, CAST(max(med) AS BIGINT) AS median_v,
        |    CAST(sum(CASE WHEN v > med THEN v - med ELSE 0 END) AS BIGINT) AS up1,
        |    CAST(sum(CASE WHEN v < med THEN med - v ELSE 0 END) AS BIGINT) AS dn1,
        |    CAST(sum(CASE WHEN v < med THEN (med - v) * (med - v) ELSE 0 END) AS BIGINT) AS dn2
        |  FROM daily CROSS JOIN med)
        |SELECT n_days, median_v,
        |  CAST(floor(CAST(up1 AS DOUBLE) / CAST(dn1 AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS omega_milli,
        |  CAST(floor(sqrt(CAST(dn2 AS DOUBLE) / CAST(n_days AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS downside_dev_milli,
        |  up1 * 1000000 // (up1 + dn1) AS gain_share_ppm
        |FROM acc""".stripMargin,
    "q_metric_concordance" ->
      """WITH bybrand AS (
        |  SELECT p_brand,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev,
        |    CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS vol
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |ranked AS (
        |  SELECT p_brand,
        |    CAST(row_number() OVER (ORDER BY rev DESC, p_brand) AS BIGINT) AS r_rev,
        |    CAST(row_number() OVER (ORDER BY vol DESC, p_brand) AS BIGINT) AS r_vol
        |  FROM bybrand),
        |conc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN (a.r_rev < b.r_rev) = (a.r_vol < b.r_vol) THEN 1 ELSE 0 END) AS BIGINT) AS concordant
        |  FROM ranked a JOIN ranked b ON a.p_brand < b.p_brand),
        |swing AS (SELECT CAST(max(abs(r_rev - r_vol)) AS BIGINT) AS max_rank_swing FROM ranked)
        |SELECT n_pairs, concordant,
        |  (2 * concordant - n_pairs) * 1000000 // n_pairs AS tau_ppm,
        |  max_rank_swing
        |FROM conc CROSS JOIN swing""".stripMargin,
    "q_nb_fit" ->
      """WITH counts AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k FROM orders GROUP BY o_custkey),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sk,
        |    CAST(sum(k * k) AS BIGINT) AS skk
        |  FROM counts)
        |SELECT n AS n_customers,
        |  CAST(floor(CAST(sk AS DOUBLE) / CAST(n AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS mean_orders_milli,
        |  CAST(floor((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) * 1000 + 0.5) AS BIGINT) AS var_orders_milli,
        |  CAST(floor(((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) / (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS vmr_milli,
        |  CAST(floor((CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) / greatest((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) - CAST(sk AS DOUBLE) / CAST(n AS DOUBLE), 0.001) * 1000 + 0.5) AS BIGINT) AS nb_r_milli
        |FROM acc""".stripMargin,
  )
}
