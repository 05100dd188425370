package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.functions.{from_avro_ocf, to_avro_ocf}
import graft.llm.{Dedup, Multimodal, Similarity, TextOps}
import graft.model.Schemas
import graft.ops.{Analytics, Router}

/** Statistical inference: classical tests, robust statistics, regression, calibration/eval metrics — exact fixed-point formulations.
  *
  * Split from the SparkEntry monolith; every member is `private[graft]`
  * and the driver surface stays `SparkEntry.queries` / `oracleSql`
  * (assembled from the per-domain map fragments below).
  */
private[graft] trait StatsQueries { this: SparkEntry.type =>

  /** Exact interpolated percentiles over integer cents: interpolation is
    * `(1-f)*lower + f*upper` on exact longs in both engines. */
  private[graft] def qPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority"), Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("o_orderpriority"))
      .agg(
        (expr("percentile(c, 0.5)") / 100.0).as("p50"),
        (expr("percentile(c, 0.9)") / 100.0).as("p90"),
        (expr("percentile(c, 0.99)") / 100.0).as("p99"))
      .orderBy(col("o_orderpriority"))

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
  private[graft] def qSpearman(s: SparkSession, dir: String): DataFrame = {
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
    // BOTH axes ranked through ONE groupedRank range pass: the axis tag
    // joins the group key (nation U+0001 axis — the separator cannot
    // appear in a nation name), so x-ranks and y-ranks are independent
    // rank domains inside a single shuffle + offset-collect instead of
    // two. The stacked frame is 2× rows, but one range pass over 2n is
    // strictly cheaper than two passes over n (half the scheduling
    // round-trips and driver collects), and the two midrank frames come
    // back together as a groupBy pivot rather than a join.
    val stacked = perCust.select(
        concat(col("n_name"), lit("\u0001x")).as("g"),
        col("x").cast("double").as("ord"), col("ck"))
      .unionAll(perCust.select(
        concat(col("n_name"), lit("\u0001y")).as("g"),
        col("y").cast("double").as("ord"), col("ck")))
    // round-13 re-shape: midranks come straight from the collapsed
    // (axis-group, value) tie table via one prefix sum — mr2 =
    // 2·cum − t + 1 = min_rnk + max_rnk — so the per-row rank pass and
    // its tie aggregation drop out; one row-level join attaches mr2
    // (Spearman DOES need per-row ranks to pair rx with ry per
    // customer, so this join is irreducible).
    val ties = stacked.groupBy(col("g"), col("ord"))
      .agg(count(lit(1)).as("t"))
    val mr2v = graft.ops.ScalablePrefix.groupedPrefixSum(s,
        ties.select(col("g"), col("ord"), col("t")), "g", "ord", "t", 32)
      .select(col("g"), col("ord"),
        (lit(2L) * col("cum_w") - col("t") + 1L).as("mr2"))
    val mr = stacked.join(mr2v, Seq("g", "ord"))
      .select(substring_index(col("g"), "\u0001", 1).as("n_name"),
        substring_index(col("g"), "\u0001", -1).as("axis"),
        col("ck"), col("mr2"))
      .groupBy(col("n_name"), col("ck"))
      .agg(max(when(col("axis") === "x", col("mr2"))).as("rx"),
        max(when(col("axis") === "y", col("mr2"))).as("ry"))
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
  private[graft] def qMannWhitney(s: SparkSession, dir: String): DataFrame = {
    // round-13 re-shape (guide §2.3/§2.4): a midrank depends only on
    // the VALUE, so the per-row global rank (a range pass over every
    // sampled order) plus two row-level join-backs collapse to one
    // (value → counts) aggregate, a prefix sum over the collapsed
    // value domain (mr2(v) = 2·cum − t + 1 = min_rnk + max_rnk of the
    // tie group — exact integers), and per-group rank sums as
    // Σ t_grp(v)·mr2(v). No row-level join survives; every shuffle is
    // bounded by the distinct-value domain.
    val vals = t(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority").as("grp"),
        Analytics.cents(col("o_totalprice")).as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("grp") === "1-URGENT", 1L).otherwise(0L)).as("t1"))
      .localCheckpoint(eager = false)
    val withMr = graft.ops.ScalablePrefix.groupedPrefixSum(s,
        vals.select(lit("all").as("g"), col("v").cast("double").as("ord"),
          col("t")),
        "g", "ord", "t", 32)
      .select(col("ord"), (lit(2L) * col("cum_w") - col("t") + 1L).as("mr2"))
      .join(vals.select(col("v").cast("double").as("ord"), col("t"),
        col("t1")), "ord")
    val stats = withMr.agg(
      sum(col("t1")).as("n1"),
      sum(col("t") - col("t1")).as("n2"),
      sum(col("t1") * col("mr2")).as("r1x2"),
      sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
    stats
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
  private[graft] def qKappa(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qBootstrap(s: SparkSession, dir: String): DataFrame = {
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

  /** Calibration (reliability) table for the quality classifier: bin
    * the q_quality_model logit, and per bin compare predicted
    * confidence against the ACTUAL positive rate of a reference label
    * (docs >= 200 chars) — the standard post-training audit before a
    * filter's threshold is trusted. Bins are fixed-width integer
    * buckets of the exact milli-logit (clamped to ±10), so the whole
    * table is one scan + one 21-row aggregation; rates are exact ppm.
    * A well-calibrated filter shows monotone rates across bins. */
  private[graft] def qCalibration(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(
        (col("n_chars") >= 200).as("label"),
        qualityLogitMilli
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
  private[graft] def qEntropy(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qMutualInfo(s: SparkSession, dir: String): DataFrame = {
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

  /** ROC AUC of the lang-ID density score as an English detector —
    * the threshold-free companion to q_confusion's fixed-threshold
    * sweep. AUC is computed as the rank-sum statistic (AUC =
    * U/(n⁺·n⁻), the probability a random positive outranks a random
    * negative), so it rides the SAME scalable machinery as
    * q_mann_whitney: two-pass range-partitioned global rank, tie
    * midranks as 2·rank integers, U exact int64, one final ppm
    * integer division. No score histogram, no threshold grid — exact
    * AUC at any corpus size. */
  private[graft] def qAuc(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qTheilSen(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qMrr(s: SparkSession, dir: String): DataFrame = {
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

  /** Weight-of-evidence / information-value screen: 5 fixed price
    * brackets of lineitem vs the returned flag — the classic credit-
    * scoring feature-power audit (IV < 0.02 ⇒ the feature is useless;
    * > 0.3 ⇒ strong). WOE_i = ln((g_i·B)/(b_i·G)) and the IV terms
    * are per-row double trees over exact counts shipped as micro-nat
    * integers; total IV = sum of the integer terms (the q_psi
    * contract). One scan, 5-group agg, broadcast totals. */
  private[graft] def qWoeIv(s: SparkSession, dir: String): DataFrame = {
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

  /** NDCG@10 of the IVF index against graded brute-force relevance
    * (truth rank r ⇒ gain 11−r) — the position-sensitive ranking
    * metric next to q_recall_at_k (set overlap) and q_mrr (first
    * hit). The 1/log2(i+1) discount enters as 10 integer micro-
    * weights (q_benford's no-transcendental-crosses-the-boundary
    * convention), IDCG is a compile-time integer constant, and
    * NDCG is one ppm integer division — bit-exact at any scale. */
  private[graft] def qNdcg(s: SparkSession, dir: String): DataFrame = {
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

  /** Median-absolute-deviation outlier screen per nation — the
    * robust companion to q_outliers_iqr (MAD shrugs off the 50%
    * contamination that wrecks mean/stddev fences). BOTH medians
    * (value, then |value−median|) ride the two-pass range-partitioned
    * grouped rank — no per-nation window funnel; the 25-row median
    * tables travel back broadcast; the k=3 fence and outlier counts
    * are exact integer cents. */
  private[graft] def qMad(s: SparkSession, dir: String): DataFrame = {
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
    // groupedRank already carries the group size (grp_n), so median
    // selection is a plain filter — no per-group count agg + join back
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame =
      graft.ops.ScalablePrefix.groupedRank(s,
        df.select(col("n_name"), col(valueCol).cast("double").as("ord"),
          col("ok")),
        "n_name", "ord", "ok", 32)
        .filter(col("rnk") === expr("(grp_n + 1) div 2"))
        .select(col("n_name"), col("ord").cast("long").as(out))
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

  /** Wilson score interval for the urgent-order share per nation —
    * the proportion CI that stays sane at small n and extreme p̂
    * (where the naive normal interval leaves [0,1]). Counts are
    * exact longs; both bounds are fixed trees of +,−,×,÷,√ over
    * those longs — every operator correctly rounded IEEE, so the
    * doubles are bit-identical in any engine. One broadcast-joined
    * scan, 25-group agg. */
  private[graft] def qWilson(s: SparkSession, dir: String): DataFrame = {
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

  /** Minimum detectable effect for an A/B test on the urgent-order
    * rate per nation: MDE = (z_α/2 + z_β)·√(2p̄(1−p̄)/n_arm) at 95%
    * power-80% — the experiment-sizing companion to q_ab_test ("is
    * this nation's traffic even enough to detect a 1-point move?").
    * Counts exact; the z constants are literals; MDE is a fixed
    * IEEE tree. */
  private[graft] def qMde(s: SparkSession, dir: String): DataFrame = {
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

  /** Wald SPRT over the daily return-rate stream: H₀ p=0.32 vs H₁
    * p=0.34 at α=0.05, β=0.2 — the sequential test that stops THE DAY
    * the evidence suffices instead of waiting for a fixed horizon.
    * The per-day log-likelihood increments are INTEGER micro-nat
    * constants (ln ratios precomputed as literals — q_ndcg's
    * no-transcendental-crosses-the-boundary convention), the LLR
    * trace is a prefix sum over the bounded day domain, and the
    * first boundary crossing is a conditional min — exact int64
    * end-to-end. */
  private[graft] def qSprt(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qTrimmedMean(s: SparkSession, dir: String): DataFrame = {
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
    // grp_n rides along with every rank — the decile fences are plain
    // row filters, no count agg + broadcast join
    ranked
      .filter(col("rnk") > expr("grp_n div 10") &&
        col("rnk") <= expr("grp_n - grp_n div 10"))
      .groupBy(col("n_name"))
      .agg(max(col("grp_n")).as("n"), count(lit(1)).as("n_kept"),
        sum(col("ord").cast("long")).as("sum_cents"))
      .withColumn("trimmed_mean_cents", expr("sum_cents div n_kept"))
      .select(col("n_name"), col("n"), col("n_kept"),
        col("trimmed_mean_cents"))
      .orderBy(col("n_name"))
  }

  /** McNemar's paired test between two lang-ID thresholds (60 vs 100
    * milli-density) on the SAME docs — the right test for comparing
    * two classifiers on one dataset (independent-sample tests
    * overstate confidence when predictions are paired). Only the
    * discordant cells matter: χ² = (b−c)²/(b+c), and with integer
    * density compares it is exact int64 end-to-end (milli-scaled). */
  private[graft] def qMcnemar(s: SparkSession, dir: String): DataFrame = {
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

  /** Winsorized group means (robust-statistics cleaning): clip each
    * order's price to its priority's [p05, p95] nearest-rank fence and
    * compare the group mean before/after — the outlier-resistant
    * aggregate reporting pipelines use when a few fat-finger rows drag
    * the plain mean. Fences come off the two-pass grouped rank (no
    * per-group sort task) and broadcast back; means are exact integer
    * division. */
  private[graft] def qWinsorize(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qPercentileCont(s: SparkSession, dir: String): DataFrame = {
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

  private[graft] def qPercentileExact(s: SparkSession, dir: String): DataFrame =
    orderPricePercentiles(s, dir, Seq(25, 90, 99))
      .select(col("o_orderpriority"),
        (col("p25_c") / 100.0).as("p25"),
        (col("p90_c") / 100.0).as("p90"),
        (col("p99_c") / 100.0).as("p99"),
        col("grp_n").as("n"))
      .orderBy(col("o_orderpriority"))

  /** Robust (IQR-fence) outlier detection per group, composed from the
    * rank-selection percentile path: p25/p75 come from groupedRank (no
    * per-group sort task), fences are pure integer-cents arithmetic
    * (k·IQR with k = 1/2 — Tukey's 1.5 flags nothing on this
    * short-tailed synthetic distribution, so the tighter fence keeps
    * the oracle discriminating), and the per-group fence row is
    * broadcast back onto the fact scan for one counting pass. No
    * double appears before the final /100 rendering. */
  private[graft] def qOutliersIqr(s: SparkSession, dir: String): DataFrame = {
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

  /** Time-series anomaly detection: flag days whose nation-level daily
    * revenue sits more than 3 population-sigmas from that nation's mean.
    * The moments are EXACT int64 (n, sum, sum-of-squares in whole
    * dollars — dollars, not cents, so n·Q stays far inside int64 at
    * bench scale), broadcast back onto the daily series; the z-score is
    * then ONE division and ONE sqrt of exact integers —
    * z = (x·n − S) / sqrt(n·Q − S²) — bit-identical IEEE in both
    * engines. The heavy work (daily totals) is a parallel aggregation;
    * the per-nation moment table is 25 rows. */
  private[graft] def qAnomaly(s: SparkSession, dir: String): DataFrame = {
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

  /** EXACT weighted median — order statistics where each value counts
    * with a weight (here: per-nation median part price weighted by
    * quantity sold; the "half the volume sold below this price"
    * number). Shape discipline — histogram drill-down, the classic
    * exact-quantile two-phase scan:
    *   1. weights collapse onto the (nation, price) VALUE DOMAIN
    *      (distinct cents, not line items), checkpointed once;
    *   2. a coarse price-bucket histogram (8192-cent buckets) is a
    *      map-side-combined aggregate whose size is bounded by the
    *      PRICE DOMAIN (nations × priceRange/8192 ≈ 32 k rows), never
    *      by data volume — bounded model state, so the per-nation
    *      cumulative over buckets and the median-bucket pick run
    *      driver-side;
    *   3. one narrow filtered pass reads ONLY the median bucket
    *      (≤ 8192 distinct prices per nation — bounded by the bucket
    *      width) and finds the first price whose running weight
    *      reaches half the total: integer cross-multiply
    *      `2·cum_w >= total`.
    * No global range shuffle and no per-nation window over the full
    * domain (that would cap parallelism at 25 tasks and buffer a
    * nation's whole price domain in one of them); the in-bucket
    * window is bounded by the bucket width, not the data. All
    * arithmetic is exact int64, so the result is bit-identical to the
    * one-pass prefix formulation. */
  private[graft] def qWeightedMedian(s: SparkSession, dir: String): DataFrame =
    graft.ops.GroupedQuantile.weightedQuantiles(s, weightedPriceSrc(s, dir),
        "nk", "p", "w", Seq((1L, 2L)))
      .select(col("nk").as("nationkey"),
        (col("value") / 100.0).as("weighted_median_price"),
        col("total_weight"))
      .orderBy(col("nationkey"))

  /** Shared source for the weighted-quantile family: per-nation part
    * price in exact cents, weighted by quantity sold. */
  private def weightedPriceSrc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long").as("nk"),
        Analytics.cents(col("l_extendedprice")).as("p"),
        col("l_quantity").cast("long").as("w"))

  /** Exact weighted QUARTILES per nation — the full spread, not just
    * the median: p25/p50/p75 of part price weighted by quantity sold,
    * all three from ONE histogram pass + ONE drill-down pass through
    * [[graft.ops.GroupedQuantile]] (adding quantiles costs selector
    * rows, not corpus passes). Same integer cross-multiply convention
    * `den·cum_w >= num·total`, so every value is bit-identical to the
    * oracle's window formulation. */
  private[graft] def qWeightedQuartiles(s: SparkSession, dir: String): DataFrame =
    graft.ops.GroupedQuantile.weightedQuantiles(s, weightedPriceSrc(s, dir),
        "nk", "p", "w", Seq((1L, 4L), (1L, 2L), (3L, 4L)))
      .select(col("nk").as("nationkey"), col("pct"),
        (col("value") / 100.0).as("price"),
        col("total_weight"))
      .orderBy(col("nationkey"), col("pct"))

  /** Benford first-digit audit — the classic fabricated-numbers screen
    * run on monetary columns: observed first-digit shares of
    * o_totalprice vs Benford's log10(1+1/d) expectation. Expectations
    * are integer ppm LITERALS (log10 evaluated at authoring time), so
    * no transcendental function output ever crosses the engine
    * boundary; shares and deltas are exact integer arithmetic. */
  private[graft] def qBenford(s: SparkSession, dir: String): DataFrame = {
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

  /** Chi-square independence audit between order priority and customer
    * market segment: the contingency table in one join+aggregation,
    * expectations and per-cell contributions in exact integer
    * cross-multiplies — contrib = (n·N − r·c)²·1e6 div (r·c·N) — so
    * the statistic is a sum of exact longs (order-independent; a
    * naive double Σ would be partitioning-dependent). The grand total
    * rides along via a broadcast scalar. */
  private[graft] def qChiSquare(s: SparkSession, dir: String): DataFrame = {
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

  /** Exact OLS regression per nation: slope / intercept / r² of line
    * revenue (whole dollars) against quantity, from five exact integer
    * sums — ONE shuffle on the group key with map-side partial
    * aggregation, dimension lookup broadcast. The closed-form
    * combination is a fixed tree of deterministic double ops applied to
    * the exact sums (same discipline as q_stats_moments, which stops at
    * corr), so results are bit-identical across engines — unlike the
    * built-in regr_slope/regr_intercept/regr_r2, whose double
    * accumulation order is partition-dependent. */
  private[graft] def qRegression(s: SparkSession, dir: String): DataFrame = {
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

  /** Two-proportion A/B z-test: customers split into variants by key
    * parity, exposure = any order, conversion = at least one order in
    * 1995 (≈0.78 at every SF — a genuinely two-sided proportion; the
    * events table's purchase rate saturates at 1.0, which degenerates
    * the pooled variance). Counts are exact longs from ONE
    * customer-keyed aggregation pass; z is the pooled-variance
    * statistic as a fixed tree of double ops — the experiment-readout
    * companion to q_chi_square (independence) and q_trend_test
    * (monotone trend). */
  private[graft] def qAbTest(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qKsTest(s: SparkSession, dir: String): DataFrame = {
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

  /** CUPED variance-reduced experiment readout: customers split into
    * two deterministic md5 arms, pre-period revenue is the covariate,
    * post-period revenue the metric; θ = cov(x,y)/var(x) pooled across
    * arms in exact ppm (den pre-scaled so the ratio stays in int64),
    * and each arm reports its raw and θ-adjusted totals. All sums are
    * whole dollars — int64-safe at verify scale; at larger corpus
    * scale the same query runs on mean-centered per-partition partial
    * sums (the standard rescaling discipline). */
  private[graft] def qCuped(s: SparkSession, dir: String): DataFrame = {
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

  /** PCA top direction by distributed power iteration (2 rounds,
    * uncentered): v ← Xᵀ(Xv), rescaled to ~3 digits between rounds —
    * every reduction is a sum of int64 products over fp3-quantized
    * inputs, so the direction replays bit-for-bit in the oracle
    * (truncating division on the rescale in both engines). The corpus
    * never moves: each round is one broadcast of the 64-long model
    * vector, one (i)-keyed dot aggregate, one (j)-keyed update
    * aggregate — the same model-to-data shape as Lloyd's k-means. */
  private[graft] def qPowerIteration(s: SparkSession, dir: String): DataFrame = {
    val (_, v2) = fp3PowerIteration(s, dir)
    import s.implicits._
    v2.zipWithIndex.map { case (v, idx) => (idx + 1L, v) }.toSeq
      .toDF("j", "v").orderBy(col("j"))
  }

  /** Welch's unequal-variance t-test (URGENT vs LOW mean order value)
    * — the default two-sample test when variances can't be assumed
    * equal (q_effect_size's pooled d assumes they can). One grouped
    * scan collects exact integer moments per arm; t and the
    * Welch–Satterthwaite df are fixed double trees over those exact
    * integers (+,−,×,÷,√ all correctly rounded IEEE → bit-identical in
    * any engine). Zero shuffles beyond the 2-group reduce. */
  private[graft] def qWelchT(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qAnovaF(s: SparkSession, dir: String): DataFrame = {
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

  /** Cliff's delta ordinal effect size (URGENT vs LOW): δ = P(x>y) −
    * P(x<y) = 2·U1/(n1·n2) − 1, so it falls out of the same exact
    * midrank machinery as q_mann_whitney — reported in exact ppm via
    * the truncating integer division both engines share. The
    * distribution-free magnitude companion to q_mann_whitney's
    * significance z (as q_effect_size is to q_welch_t). */
  private[graft] def qCliffsDelta(s: SparkSession, dir: String): DataFrame = {
    // round-13 re-shape: same value-domain midrank collapse as
    // q_mann_whitney (mr2(v) = 2·cum − t + 1; per-group rank sums are
    // Σ t_grp(v)·mr2(v)) — the per-row rank pass and both row-level
    // join-backs drop out.
    val vals = t(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority").as("grp"),
        Analytics.cents(col("o_totalprice")).as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("grp") === "1-URGENT", 1L).otherwise(0L)).as("t1"))
      .localCheckpoint(eager = false)
    val withMr = graft.ops.ScalablePrefix.groupedPrefixSum(s,
        vals.select(lit("all").as("g"), col("v").cast("double").as("ord"),
          col("t")),
        "g", "ord", "t", 32)
      .select(col("ord"), (lit(2L) * col("cum_w") - col("t") + 1L).as("mr2"))
      .join(vals.select(col("v").cast("double").as("ord"), col("t"),
        col("t1")), "ord")
    val stats = withMr.agg(
      sum(col("t1")).as("n1"),
      sum(col("t") - col("t1")).as("n2"),
      sum(col("t1") * col("mr2")).as("r1x2"))
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
  private[graft] def qPoissonRate(s: SparkSession, dir: String): DataFrame = {
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

  /** Robust feature scaling ((x − median)/IQR, the outlier-proof
    * alternative to z-scoring): per-priority median/q1/q3 selected on
    * the two-pass grouped rank (the q_percentile_exact machinery),
    * then a deterministic order sample is emitted with its scaled
    * value in exact ppm — (v − med)·1e6 div IQR, integer end-to-end.
    * The broadcast of the 5-row fence table back onto the scan is the
    * same shape q_outliers_iqr pins. */
  private[graft] def qRobustScaler(s: SparkSession, dir: String): DataFrame = {
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

  /** Sample-ratio-mismatch (SRM) guard for the q_ab_test experiment:
    * a 50/50 customer-parity split whose observed arm sizes drift is
    * a broken randomizer — the FIRST check any experiment readout
    * must pass. χ²(1 df) = (n0−n1)²/(n0+n1) against the even split,
    * shipped in exact milli via integer cross-multiply (squares of
    * arm-count deltas stay far inside int64 at any scale). */
  private[graft] def qAbSrm(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qHurst(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qEbShrinkage(s: SparkSession, dir: String): DataFrame = {
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

  /** Expected calibration error of the quality classifier — the ONE
    * number that says whether q_calibration's reliability table is
    * trustworthy: ECE = Σ_b (n_b/N)·|acc_b − conf_b| over the fixed
    * logit bins, with per-bin confidence a build-time sigmoid literal
    * (confCaseSql) and everything else exact integers. The worst bin
    * ships alongside via an order-encoded integer argmax. */
  private[graft] def qEce(s: SparkSession, dir: String): DataFrame = {
    val binned = t(s, dir, "documents")
      .select(
        (col("n_chars") >= 200).as("label"),
        qualityLogitMilli
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

  /** Fleiss' kappa for THREE deterministic quality raters (chars ≥
    * 200, words ≥ 40, digits ≤ 5) — multi-rater chance-corrected
    * agreement, extending q_kappa's two-rater Cohen form. With n = 3
    * raters and 2 categories, per-item pair-agreement numerators are
    * tiny integers (6 if unanimous, 2 if split), so P̄ and P̄ₑ reduce
    * to one integer reduce + a fixed double tree over (A, S, N). */
  private[graft] def qFleissKappa(s: SparkSession, dir: String): DataFrame = {
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

  /** Neyman optimal allocation for stratified sampling: sample-size
    * shares ∝ N_h·S_h (stratum size × std) beat proportional
    * allocation whenever strata variances differ — the survey-
    * statistics answer to "how many rows should each stratum
    * contribute to a 10k eval set". Per-stratum std is one sqrt over
    * exact integer moments; the weights are rounded to integer milli
    * BEFORE the cross-stratum sum, so shares and allocations are
    * pure integer arithmetic. */
  private[graft] def qNeymanAlloc(s: SparkSession, dir: String): DataFrame = {
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

  /** Per-segment uplift readout: treatment/control conversion (the
    * q_ab_test experiment) split by market segment, uplift in signed
    * exact ppm per segment — heterogeneous-treatment-effect reporting,
    * the step between "the experiment moved the average" and "for
    * whom". One customer-keyed pass, exact counts throughout. */
  private[graft] def qUpliftBySegment(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qAnomalyStl(s: SparkSession, dir: String): DataFrame = {
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

  /** Entropy rate of the user-event Markov chain: H = −Σᵢⱼ πᵢ pᵢⱼ
    * ln pᵢⱼ with the empirical state distribution as π — how
    * predictable the NEXT event is given the current one (the
    * sequence-complexity number beside q_markov2's matrix). The 25
    * transition cells are domain-bounded; each cell's term is rounded
    * to micro-nats BEFORE the sum (q_entropy's contract), weighted by
    * exact from-state counts, and the final division is one div. */
  private[graft] def qEntropyRate(s: SparkSession, dir: String): DataFrame = {
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

  /** Variance share of the PCA top direction — the one-number answer
    * to "is this embedding space effectively one-dimensional":
    * λ₁/trace in exact-integer-fed ppm, with λ₁ the Rayleigh quotient
    * of q_power_iteration's 2-round fixed-point direction (replayed
    * identically here and in the oracle's CTE chain) and the trace a
    * plain integer sum of squared milli components. num, wn, trace
    * are exact int64; the final share is one fixed IEEE tree over
    * them. Model (the 64 weights) moves by broadcast; the corpus
    * never shuffles. */
  private[graft] def qPcaVarShare(s: SparkSession, dir: String): DataFrame = {
    val (x, v2) = fp3PowerIteration(s, dir)
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

  /** F1-optimal threshold selection for the quality classifier: from
    * ONE scan, precision/recall/F1 at every logit-bin cutoff (21
    * bounded bins — the threshold candidates), and the argmax row
    * flagged via order-encoded integer max (F1 exact ppm, ties to the
    * higher threshold). The decision step that turns q_calibration/
    * q_ece diagnostics into a deployed filter setting. */
  private[graft] def qThresholdF1(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = t(s, dir, "documents")
      .select(
        (col("n_chars") >= 200).as("label"),
        qualityLogitMilli
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

  /** Network-interference (SUTVA-violation) screen for the customer-
    * parity experiment: among CONTROL customers, does conversion
    * correlate with the share of co-purchase neighbors who are in
    * TREATMENT? A nonzero correlation means spillovers are leaking
    * the treatment through the graph and the q_ab_test readout is
    * biased. Neighbor exposure comes from the hub-capped co-purchase
    * edge list (never all-pairs); the correlation is Pearson r over
    * exact integer ppm exposures and 0/1 outcomes — one fixed tree. */
  private[graft] def qInterference(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_partkey") % 20 === 0)
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
      .localCheckpoint(eager = false)
    val partDeg = items.groupBy(col("part")).agg(count(lit(1)).as("pd"))
    val capped = items.join(broadcast(partDeg.filter(col("pd") <= 64)
      .select(col("part"))), "part")
    val edges = capped.as("a").join(capped.as("b"),
        col("a.part") === col("b.part") &&
          col("a.cust") =!= col("b.cust"))
      .select(col("a.cust").as("u"), col("b.cust").as("v"))
      .distinct()
    val exposure = edges
      .groupBy(col("u"))
      .agg(count(lit(1)).as("n_nbr"),
        sum(when(col("v") % 2 === 1, 1L).otherwise(0L)).as("treated_nbr"))
      .withColumn("exp_ppm", expr("treated_nbr * 1000000 div n_nbr"))
    val conv = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(when(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
          col("o_orderdate") < lit("1996-01-01").cast("date"), 1L)
        .otherwise(0L)).as("y"))
    val ctrl = exposure.filter(col("u") % 2 === 0)
      .join(conv, col("u") === col("o_custkey"))
      .select(col("exp_ppm").as("x"), col("y"))
    val m = ctrl.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(expr("(x div 1000) * (x div 1000)"))
        .as("sxx_m2"), sum(col("x") * col("y")).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val num = d("n") * d("sxy") - d("sx") * d("sy")
    val dx = d("n") * d("sxx_m2") * lit(1000000.0) - d("sx") * d("sx")
    val dy = d("n") * d("sy") - d("sy") * d("sy")
    m.select(col("n").as("n_control"),
      expr("sx div n").as("mean_exposure_ppm"),
      (num / (sqrt(dx) * sqrt(dy))).as("interference_r"))
  }

  /** Wilson lower-bound ranking of brands by return rate — "sort by
    * rating" done right: the raw return share of a 20-item brand
    * can't outrank a 2000-item brand on noise, because each brand is
    * scored by the LOWER end of its Wilson interval (q_wilson's fixed
    * IEEE tree, reused as a ranking key). Top-10 most-returned brands
    * by the bound, exact counts alongside. */
  private[graft] def qWilsonRank(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"))
    def d(c: String) = col(c).cast("double")
    val z2 = lit(3.8416)  // 1.96²
    val p = d("x") / d("n")
    val denom = lit(1.0) + z2 / d("n")
    val center = p + z2 / (lit(2.0) * d("n"))
    val margin = lit(1.96) * sqrt(p * (lit(1.0) - p) / d("n") +
      z2 / (lit(4.0) * d("n") * d("n")))
    g.select(col("p_brand"), col("n"), col("x"),
        ((center - margin) / denom).as("wilson_lo"))
      .orderBy(col("wilson_lo").desc, col("p_brand")).limit(10)
  }

  /** Youden-J optimal threshold for the quality classifier —
    * sensitivity + specificity − 1 maximized over the 21 logit-bin
    * cutoffs (q_threshold_f1's machinery with the screening-test
    * objective instead of the retrieval one: J weighs the negatives
    * F1 ignores). Exact ppm, argmax via order-encoded integer max. */
  private[graft] def qThresholdYouden(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = t(s, dir, "documents")
      .select(
        (col("n_chars") >= 200).as("label"),
        qualityLogitMilli
          .as("logit_milli"))
      .withColumn("bin",
        greatest(least(expr("logit_milli div 2000"), lit(10L)), lit(-10L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"))
    val tot = binned.agg(sum(col("n")).as("nn"), sum(col("pos")).as("npos"))
    val wDesc = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned
      .withColumn("pred_pos", sum(col("n")).over(wDesc))
      .withColumn("tp", sum(col("pos")).over(wDesc))
    val scored = cum.crossJoin(broadcast(tot))
      .select(col("bin").as("threshold_bin"), col("tp"),
        (col("pred_pos") - col("tp")).as("fp"),
        expr("tp * 1000000 div npos").as("tpr_ppm"),
        expr("(pred_pos - tp) * 1000000 div (nn - npos)").as("fpr_ppm"))
      .withColumn("youden_ppm", col("tpr_ppm") - col("fpr_ppm"))
      .localCheckpoint(eager = false)
    val best = scored.agg(
      max(col("youden_ppm") * 1000 + (col("threshold_bin") + 10)).as("enc"))
    scored.crossJoin(broadcast(best))
      .withColumn("is_best",
        col("youden_ppm") * 1000 + (col("threshold_bin") + 10) === col("enc"))
      .drop("enc")
      .orderBy(col("threshold_bin"))
  }

  /** Sample-size planning table: orders-conversion arms needed per
    * effect size {1, 2, 5} pp at 95%/80% — the inverse of q_mde
    * ("how long must the test run" instead of "what can this n
    * see"): n = (z_α+z_β)²·2·p̄(1−p̄)/δ² with the z's build-time
    * literals and p̄ the observed conversion — one fixed tree per
    * effect row over exact counts. */
  private[graft] def qSampleSize(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(when(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
          col("o_orderdate") < lit("1996-01-01").cast("date"), 1L)
        .otherwise(0L)).as("conv"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val effects = s.range(0, 3).select(
      when(col("id") === 0, 10000L).when(col("id") === 1, 20000L)
        .otherwise(50000L).as("effect_ppm"))
    val p = col("c").cast("double") / col("n").cast("double")
    // (1.96 + 0.8416)² = 7.849 (build-time literal)
    val delta = col("effect_ppm").cast("double") / lit(1000000.0)
    base.crossJoin(broadcast(effects))
      .select(col("effect_ppm"), col("n").as("n_observed"),
        floor(lit(7.849) * lit(2.0) * p * (lit(1.0) - p) /
          (delta * delta) + 0.5).cast("long").as("n_per_arm"))
      .orderBy(col("effect_ppm"))
  }

  /** Skewness and excess kurtosis of DAILY revenue — the shape
    * diagnostics behind "can I use normal approximations on this
    * series" (q_anomaly's 3σ assumes them). Raw fourth powers of
    * daily revenue outgrow int64 (caught by the oracle gate), so the
    * series is STANDARDIZED first: per-day z rounds to exact milli
    * integers (scale-invariant — z⁴ stays bounded at ANY data
    * volume), and the z-power sums reduce order-independently. g₁/g₂
    * ship as milli integers. */
  private[graft] def qSkewKurtosis(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "div 100000").as("v"))
      .localCheckpoint(eager = false)
    val m = daily.agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
      sum(col("v") * col("v")).as("s2"))
    def d(c: String) = col(c).cast("double")
    val mean = d("s1") / d("n")
    val sigma = sqrt((d("n") * d("s2") - d("s1") * d("s1")) /
      (d("n") * d("n")))
    val z = daily.crossJoin(broadcast(m))
      .select(floor((col("v").cast("double") - mean) / sigma * 1000 + 0.5)
        .cast("long").as("zm"))
    z.agg(count(lit(1)).as("n_days"),
        sum(col("zm") * col("zm") * col("zm")).as("z3"),
        sum(col("zm") * col("zm") * col("zm") * col("zm")).as("z4"))
      .select(col("n_days"),
        expr("z3 div (n_days * 1000000)").as("skewness_milli"),
        expr("z4 div (n_days * 1000000000) - 3000").as("ex_kurtosis_milli"))
  }

  /** Guardrail-metric readout for the customer-parity experiment:
    * three health metrics (orders per customer, mean order value,
    * urgent share) compared across arms with NON-INFERIORITY flags —
    * |Δ| within a 2% relative margin passes. Experiments ship on the
    * primary metric but ROLL BACK on guardrails; this is that table,
    * exact integers with margin checks by cross-multiply. */
  private[graft] def qAbGuardrails(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .groupBy((col("o_custkey") % 2).as("arm"))
      .agg(countDistinct(col("o_custkey")).as("users"),
        count(lit(1)).as("orders"),
        sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("urgent"))
    val w = per.groupBy().agg(
      max(when(col("arm") === 0, col("users"))).as("u0"),
      max(when(col("arm") === 0, col("orders"))).as("o0"),
      max(when(col("arm") === 0, col("cents"))).as("c0"),
      max(when(col("arm") === 0, col("urgent"))).as("g0"),
      max(when(col("arm") === 1, col("users"))).as("u1"),
      max(when(col("arm") === 1, col("orders"))).as("o1"),
      max(when(col("arm") === 1, col("cents"))).as("c1"),
      max(when(col("arm") === 1, col("urgent"))).as("g1"))
    // metric_i per arm as exact rationals a/b; non-inferiority
    // |a1/b1 − a0/b0| <= 0.02·(a0/b0) ⇔ |a1·b0 − a0·b1|·50 <= a0·b1
    // — pure integer cross-multiplies
    def ni(a1: String, b1: String, a0: String, b0: String) =
      abs(col(a1) * col(b0) - col(a0) * col(b1)) * 50 <=
        col(a0) * col(b1)
    w.select(
      expr("o1 * 1000 div u1 - o0 * 1000 div u0").as("opu_gap_milli"),
      ni("o1", "u1", "o0", "u0").as("orders_per_user_ok"),
      expr("c1 div o1 - c0 div o0").as("aov_gap_cents"),
      ni("c1", "o1", "c0", "o0").as("avg_order_value_ok"),
      expr("g1 * 1000000 div o1 - g0 * 1000000 div o0")
        .as("urgent_gap_ppm"),
      ni("g1", "o1", "g0", "o0").as("urgent_share_ok"))
  }

  /** Tukey HSD post-hoc pairwise comparison across the five order
    * priorities — the follow-up q_anova_f licenses: WHICH pairs of
    * group means differ, with the studentized-range correction that
    * keeps the familywise error at 5% (10 naive t-tests would not).
    * Group moments (n, Σy, Σy²) in whole dollars are one map-side
    * combined pass (dollar² sums peak ~4e15 — int64-safe where cents²
    * is not); within-group SS rounds per GROUP before the k-term sum;
    * the 10 pairs come from a self-join of the 5-row group table with
    * the MSE scalar broadcast; q = |Δmean|/√(MSE/2·(1/nᵢ+1/nⱼ)) as a
    * fixed double tree vs the q(5,∞,.05) = 3.858 critical literal. */
  private[graft] def qTukeyHsd(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "orders")
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(floor(o_totalprice + 0.5) AS BIGINT)").as("yd"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("yd")).as("sy"),
        sum(col("yd") * col("yd")).as("syy"))
      .withColumn("ssw_g", expr("CAST(floor(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)"))
    val mse = g.agg(sum(col("ssw_g")).as("ssw"), sum(col("n")).as("nt"),
        count(lit(1)).as("k"))
      .select(expr("CAST(ssw AS DOUBLE) / CAST(nt - k AS DOUBLE)").as("mse"))
    g.as("i").join(g.as("j"), col("i.grp") < col("j.grp"))
      .crossJoin(broadcast(mse))
      .select(col("i.grp").as("grp_i"), col("j.grp").as("grp_j"),
        col("i.n").as("n_i"), col("j.n").as("n_j"),
        expr("CAST(floor((CAST(i.sy AS DOUBLE) / CAST(i.n AS DOUBLE) - CAST(j.sy AS DOUBLE) / CAST(j.n AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("mean_diff_milli"),
        expr("CAST(floor(abs(CAST(i.sy AS DOUBLE) / CAST(i.n AS DOUBLE) - CAST(j.sy AS DOUBLE) / CAST(j.n AS DOUBLE)) / sqrt(mse / 2.0 * (1.0 / CAST(i.n AS DOUBLE) + 1.0 / CAST(j.n AS DOUBLE))) * 1000 + 0.5) AS BIGINT)").as("q_milli"))
      .withColumn("significant", when(col("q_milli") >= 3858, 1L).otherwise(0L))
      .orderBy(col("grp_i"), col("grp_j"))
  }

  /** Weibull reliability fit of order-to-first-ship latency by
    * median-rank regression — the lifetime model behind q_mtbf's
    * point estimate: shape k < 1 means infant-mortality (delays
    * front-loaded), k > 1 wear-out (delays compound), k ≈ 1 the
    * memoryless exponential. Latencies collapse onto the distinct-
    * day DOMAIN; the regression runs ln(−ln(1−F)) on ln(t) with the
    * (i−0.3)/(n+0.4) median-rank correction, each transformed
    * coordinate rounded to integer micro BEFORE the five moment sums
    * (the q_regression determinism contract); shape and scale =
    * exp(−a/b) are fixed double trees. */
  private[graft] def qWeibullFit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lag = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(epochDay(col("l_shipdate"))).as("ship"))
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        epochDay(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("ship") - col("od")).as("d"))
      .filter(col("d") > 0)
    val dom = lag.groupBy(col("d")).agg(count(lit(1)).as("cnt"))
    val tot = dom.agg(sum(col("cnt")).as("n"))
    val pts = dom.withColumn("cum",
        sum(col("cnt")).over(Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .filter(col("cum") < col("n"))
      .select(
        expr("CAST(floor(ln(CAST(d AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)").as("x"),
        expr("CAST(floor(ln(-ln(1.0 - (CAST(cum AS DOUBLE) - 0.3) / (CAST(n AS DOUBLE) + 0.4))) * 1000000 + 0.5) AS BIGINT)").as("y"))
    pts.agg(count(lit(1)).as("np"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("np").as("n_points"),
        expr("CAST(floor((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("shape_milli"),
        expr("CAST(floor(exp(-((CAST(sy AS DOUBLE) - (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(np AS DOUBLE)) / ((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) / 1000000.0) * 1000 + 0.5) AS BIGINT)").as("scale_days_milli"))
  }

  /** Theil-T inequality decomposition of customer spend by nation —
    * the property Gini famously lacks: Theil splits EXACTLY into
    * between-group + Σ share·within-group, so "is spend concentration
    * a nation story or a within-nation story?" is one query. Spend
    * collapses to whole dollars; each x·ln(x·N/S) term (global) and
    * x·ln(x·n_g/S_g) term (within, group constants broadcast) rounds
    * to integer milli BEFORE its sum — nothing float crosses a
    * shuffle; shares and the final divisions are fixed double trees
    * over the 25-row nation DOMAIN. */
  private[graft] def qTheilDecomp(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100").as("xd"))
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey").cast("long").as("nat"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("nat"), col("xd"))
      // the per-customer table feeds byNat AND the two term sums — one
      // materialization instead of re-deriving the orders groupBy+join
      // lineage per consumer (13 → 6 exchanges, audit-measured)
      .localCheckpoint(eager = false)
    val byNat = cust.groupBy(col("nat"))
      .agg(count(lit(1)).as("ng"), sum(col("xd")).as("sg"))
      .localCheckpoint(eager = false)
    val tot = byNat.agg(sum(col("ng")).as("nn"), sum(col("sg")).as("ss"))
    val terms = cust.crossJoin(broadcast(tot))
      .join(broadcast(byNat), "nat")
      .groupBy(col("nat"))
      .agg(
        sum(expr("CAST(floor(CAST(xd AS DOUBLE) * ln(CAST(xd AS DOUBLE) * CAST(nn AS DOUBLE) / CAST(ss AS DOUBLE)) * 1000 + 0.5) AS BIGINT)")).as("tglob_milli"),
        sum(expr("CAST(floor(CAST(xd AS DOUBLE) * ln(CAST(xd AS DOUBLE) * CAST(ng AS DOUBLE) / CAST(sg AS DOUBLE)) * 1000 + 0.5) AS BIGINT)")).as("twith_milli"))
    val global = terms.join(byNat, "nat").crossJoin(broadcast(tot))
      .agg(sum(col("tglob_milli")).as("tg_all"), max(col("ss")).as("ss"))
      .select(expr("CAST(floor(CAST(tg_all AS DOUBLE) / 1000.0 / CAST(ss AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("t_total_micro"))
    terms.join(byNat, "nat").crossJoin(broadcast(tot))
      .crossJoin(broadcast(global))
      .select(col("nat"), col("ng"),
        expr("sg * 1000000 div ss").as("spend_share_ppm"),
        expr("CAST(floor(CAST(twith_milli AS DOUBLE) / 1000.0 / CAST(sg AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("t_within_micro"),
        expr("CAST(floor(CAST(sg AS DOUBLE) / CAST(ss AS DOUBLE) * ln((CAST(sg AS DOUBLE) / CAST(ss AS DOUBLE)) / (CAST(ng AS DOUBLE) / CAST(nn AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)").as("between_term_micro"),
        col("t_total_micro"))
      .orderBy(col("nat"))
  }

  /** Pairwise Pearson correlation matrix of the four lineitem
    * numeric features (quantity, price, discount, tax) — the
    * feature-triage table every model pipeline starts from, as ONE
    * map-side-combined moment pass: 4 first moments, 4 second
    * moments, 6 cross products, all exact integers (price in whole
    * dollars so every product stays inside int64 through sf10), then
    * each of the 6 r values is a fixed double tree unpivoted via
    * stack(). No per-pair scan, no mllib, no double ever summed. */
  private[graft] def qCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val f = t(s, dir, "lineitem").select(
      expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"),
      expr("CAST(floor(l_extendedprice + 0.5) AS BIGINT)").as("p"),
      expr("CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)").as("d"),
      expr("CAST(floor(l_tax * 1000 + 0.5) AS BIGINT)").as("x"))
    val m = f.agg(count(lit(1)).as("n"),
      sum(col("q")).as("sq"), sum(col("p")).as("sp"),
      sum(col("d")).as("sd"), sum(col("x")).as("sx"),
      sum(col("q") * col("q")).as("sqq"), sum(col("p") * col("p")).as("spp"),
      sum(col("d") * col("d")).as("sdd"), sum(col("x") * col("x")).as("sxx"),
      sum(col("q") * col("p")).as("sqp"), sum(col("q") * col("d")).as("sqd"),
      sum(col("q") * col("x")).as("sqx"), sum(col("p") * col("d")).as("spd"),
      sum(col("p") * col("x")).as("spx"), sum(col("d") * col("x")).as("sdx"))
    def r(sxy: String, sx: String, sy: String, sxx: String, syy: String) =
      s"""CAST(floor((CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE))
         | / sqrt((CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE) - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE))
         |      * (CAST(n AS DOUBLE) * CAST($syy AS DOUBLE) - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE)))
         | * 1000000 + 0.5) AS BIGINT)""".stripMargin.replace("\n", " ")
    m.selectExpr("n", s"""stack(6,
      'quantity|price',    ${r("sqp", "sq", "sp", "sqq", "spp")},
      'quantity|discount', ${r("sqd", "sq", "sd", "sqq", "sdd")},
      'quantity|tax',      ${r("sqx", "sq", "sx", "sqq", "sxx")},
      'price|discount',    ${r("spd", "sp", "sd", "spp", "sdd")},
      'price|tax',         ${r("spx", "sp", "sx", "spp", "sxx")},
      'discount|tax',      ${r("sdx", "sd", "sx", "sdd", "sxx")}
      ) AS (pair, r_ppm)""")
      .orderBy(col("pair"))
  }

  /** Top principal component of the embedding matrix by THREE
    * unrolled power iterations — distributed linear algebra without
    * ever materializing the 64×64 Gram matrix: each iteration is
    * v ← normalize(Xᵀ(Xv)) as two narrow joins and two grouped sums
    * (the row pass carries ONE scalar per vector; the dim pass ONE
    * scalar per dimension — nothing O(d²) exists anywhere). All
    * arithmetic is integer micro-units with explicit floor-division
    * rescaling between passes (negative-safe: floor via double, the
    * same op in both engines — never `div`, which truncates);
    * the 64-long direction moves through the DRIVER as a broadcast
    * literal between iterations (the shared fp3PowerIteration
    * convention, QueryShared.scala — bounded model state, not data),
    * so no distributed vector is ever checkpointed and each iteration
    * is exactly one job (row-pass dot + dim-pass update + 64-row
    * collect). Emits the top-8 |loading| dims and the Rayleigh
    * explained-variance share. */
  private[graft] def qTopPc(s: SparkSession, dir: String): DataFrame = {
    val xq = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("vec_id"), (col("i0") + 1).cast("long").as("i"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("xq"))
      .localCheckpoint(eager = false)
    // one iteration: v ← normalize(Xᵀ(Xv)); v rides in as a literal
    // array, only 64 (i, w) pairs come back. The rescale arithmetic is
    // the exact same IEEE tree the distributed form used
    // (floor(w/vmax·1e6 + 0.5) on doubles), so results are bit-identical.
    def iterate(v: Array[Long]): Array[Long] = {
      val varr = array(v.map(lit).toSeq: _*)
      val sdot = xq.withColumn("v", element_at(varr, col("i").cast("int")))
        .groupBy(col("vec_id"))
        .agg(expr("CAST(floor(CAST(sum(xq * v) AS DOUBLE) / 100000.0) AS BIGINT)").as("sm"))
      val w = xq.join(sdot, "vec_id").groupBy(col("i"))
        .agg(sum(col("xq") * col("sm")).as("w"))
        .orderBy(col("i")).collect().map(_.getLong(1))
      val vmax = w.map(math.abs).max
      w.map(x => math.floor(x.toDouble / vmax.toDouble * 1000000.0 + 0.5).toLong)
    }
    val v3 = iterate(iterate(iterate(Array.fill(64)(1000000L))))
    val varr3 = array(v3.map(lit).toSeq: _*)
    val rd = xq.withColumn("v", element_at(varr3, col("i").cast("int")))
      .groupBy(col("vec_id"))
      .agg(expr("CAST(floor(CAST(sum(xq * v) AS DOUBLE) / 10000000.0) AS BIGINT)").as("dm"),
        expr("CAST(floor(CAST(sum(xq * xq) AS DOUBLE) / 100000.0) AS BIGINT)").as("n2m"))
    val sums = rd.agg(sum(col("dm") * col("dm")).as("sdm2"),
      sum(col("n2m")).as("sn2m"))
    val vtv = v3.map(x => x * x).sum
    val top8 = v3.zipWithIndex
      .map { case (v, i0) => (i0 + 1L, v) }
      .sortBy { case (i, v) => (-math.abs(v), i) }
      .take(8)
      .zipWithIndex
      .map { case ((dim, v), r) => (r + 1L, dim, v) }
    import s.implicits._
    top8.toSeq.toDF("rank", "dim", "loading_micro")
      .crossJoin(broadcast(sums))
      .select(col("rank"), col("dim"), col("loading_micro"),
        expr(s"CAST(floor(CAST(sdm2 AS DOUBLE) * 1000000000.0 / (CAST($vtv AS DOUBLE) * CAST(sn2m AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)").as("evr_ppm"))
      .orderBy(col("rank"))
  }

  /** One exact Newton/IRLS step of logistic regression — P(URGENT)
    * on log order value — from the zero start (p = ½, W = ¼I), where
    * the step has the CLOSED form 2·(XᵀX)⁻¹Xᵀ(2y−1): the whole
    * iteration is five integer moment sums and a 2×2 inverse as
    * fixed double trees. This is the distributed-GLM primitive — at
    * 100 TB each further IRLS step is the same one aggregation with
    * reweighted moments, never a solver on the driver. Emits the
    * step's (β₀, β₁) and the fitted probability at the mean
    * regressor. */
  private[graft] def qLogisticIrls(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("y"),
      // milli-scale regressor: Σx² stays inside int64 through sf10
      expr("CAST(floor(ln(o_totalprice) * 1000 + 0.5) AS BIGINT)").as("x"))
    base.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n"),
        // u1 = Σ(2y−1), u2 = Σx(2y−1); β = 2·[Σx²·u1 − Σx·u2, n·u2 − Σx·u1]/det
        expr("CAST(floor(2.0 * (CAST(sxx AS DOUBLE) * CAST(2 * sy - n AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(2 * sxy - sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)").as("beta0_micro"),
        expr("CAST(floor(2.0 * (CAST(n AS DOUBLE) * CAST(2 * sxy - sx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(2 * sy - n AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000.0 * 1000000 + 0.5) AS BIGINT)").as("beta1_per_ln_micro"),
        expr("""CAST(floor(1.0 / (1.0 + exp(-(
            2.0 * (CAST(sxx AS DOUBLE) * CAST(2 * sy - n AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(2 * sxy - sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          + 2.0 * (CAST(n AS DOUBLE) * CAST(2 * sxy - sx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(2 * sy - n AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          ))) * 1000 + 0.5) AS BIGINT)""").as("p_at_mean_milli"))
  }

  /** Bowley skewness + Moors kurtosis per priority — the QUANTILE-
    * based shape measures that exist precisely because q_skew_kurtosis'
    * moment versions explode on heavy tails (a single whale order
    * dominates x³/x⁴; octiles don't move). All eight octiles come
    * from one cumulative pass over each group's value DOMAIN with the
    * 8·cum ≥ k·n integer selection (no division, no interpolation);
    * the two ratios are fixed double trees per 5-row output. */
  private[graft] def qRobustShape(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = t(s, dir, "orders")
      .select(col("o_orderpriority").as("grp"),
        Analytics.cents(col("o_totalprice")).as("c"))
    val dom = vals.groupBy(col("grp"), col("c")).agg(count(lit(1)).as("cnt"))
    val ng = dom.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    val cums = dom.withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("grp")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(ng, "grp")
    val oct = cums.crossJoin(broadcast(
        s.range(1, 8).select(col("id").as("k"))))
      .filter(col("cum") * 8 >= col("k") * col("n"))
      .groupBy(col("grp"), col("k")).agg(min(col("c")).as("e"))
    val wide = oct.groupBy(col("grp")).agg(
      min(when(col("k") === 1, col("e"))).as("e1"),
      min(when(col("k") === 2, col("e"))).as("e2"),
      min(when(col("k") === 3, col("e"))).as("e3"),
      min(when(col("k") === 4, col("e"))).as("e4"),
      min(when(col("k") === 5, col("e"))).as("e5"),
      min(when(col("k") === 6, col("e"))).as("e6"),
      min(when(col("k") === 7, col("e"))).as("e7"))
    wide.select(col("grp"), col("e2").as("q1_cents"), col("e4").as("med_cents"),
        col("e6").as("q3_cents"),
        expr("CAST(floor(CAST(e6 + e2 - 2 * e4 AS DOUBLE) / CAST(e6 - e2 AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("bowley_milli"),
        expr("CAST(floor(CAST((e7 - e5) + (e3 - e1) AS DOUBLE) / CAST(e6 - e2 AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("moors_milli"))
      .orderBy(col("grp"))
  }

  /** Winsorization sensitivity sweep — how much does the headline
    * mean move as the tail cap tightens (p99 → p95 → p90)? The
    * metric-engineering audit run before anyone standardizes "mean
    * order value": a KPI that swings hundreds of ppm between caps is
    * a tail story, not a center story. Caps are exact nearest-rank
    * cuts on the value DOMAIN, and each winsorized SUM is read off
    * the same cumulative pass (Σ_{c≤cap} c·cnt + cap·(n − F(cap)))
    * — one scan, zero re-aggregation per cap. */
  private[graft] def qWinsorSensitivity(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dom = t(s, dir, "orders")
      .select(Analytics.cents(col("o_totalprice")).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("cnt"))
    val tot = dom.agg(sum(col("cnt")).as("n"), sum(col("c") * col("cnt")).as("tc"))
    val cums = dom
      .withColumn("cumn", sum(col("cnt")).over(Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cumc", sum(col("c") * col("cnt")).over(Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .localCheckpoint(eager = false)
    val ks = s.range(3).select((lit(90) + col("id") * lit(5) -
      when(col("id") === 2, 1L).otherwise(0L)).as("k")) // 90, 95, 99
    val caps = cums.crossJoin(broadcast(ks))
      .filter(col("cumn") * 100 >= col("k") * col("n"))
      .groupBy(col("k")).agg(min(col("c")).as("cap"))
    caps.join(cums, col("cap") === col("c"))
      .select(col("k"), col("cap").as("cap_cents"),
        expr("CAST(floor(CAST(cumc + cap * (n - cumn) AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 * 1000 + 0.5) AS BIGINT)").as("winsor_mean_milli"),
        expr("(tc - (cumc + cap * (n - cumn))) * 1000000 div tc").as("mass_removed_ppm"))
      .orderBy(col("k"))
  }

  /** One-step Huber M-estimate of mean order value — the robust
    * center that downweights (never discards) the spend tail:
    * ψ-weights w = min(1, 1.345σ̂/|x−med|) with σ̂ = 1.4826·MAD, both
    * read off value DOMAINS (median, then residual median); each
    * weight rounds to integer micro per row BEFORE the weighted
    * sums, so the estimate is a ratio of exact integers next to the
    * raw mean it corrects. */
  private[graft] def qHuberMean(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = t(s, dir, "orders")
      .select(expr("CAST(floor(o_totalprice + 0.5) AS BIGINT)").as("d"))
      .localCheckpoint(eager = false)
    def medOf(df: DataFrame, c: String): DataFrame = {
      val dom = df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      val tt = dom.agg(sum(col("cnt")).as("n"))
      dom.withColumn("cum", sum(col("cnt")).over(Window.orderBy(col(c))
          .rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(tt))
        .filter(col("cum") * 2 >= col("n")).agg(min(col(c)).as("med"))
    }
    val med = medOf(vals, "d")
    val mad = medOf(vals.crossJoin(broadcast(med))
      .select(abs(col("d") - col("med")).as("r")), "r")
      .withColumnRenamed("med", "mad")
    val weighted = vals.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .withColumn("wq", expr("CAST(floor(least(1.0, 1.345 * 1.4826 * CAST(mad AS DOUBLE) / CAST(greatest(abs(d - med), CAST(1 AS BIGINT)) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"))
    weighted.agg(count(lit(1)).as("n"), max(col("med")).as("median_dollar"),
        max(col("mad")).as("mad_dollar"),
        sum(col("d")).as("sd"), sum(col("wq")).as("sw"),
        sum(col("wq") * col("d")).as("swd"))
      .select(col("n"), col("median_dollar"), col("mad_dollar"),
        expr("CAST(floor(CAST(swd AS DOUBLE) / CAST(sw AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("huber_mean_milli"),
        expr("CAST(floor(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("raw_mean_milli"))
  }

  /** Upper-tail dependence between daily order COUNT and daily
    * revenue — do the busiest days and the richest days coincide at
    * the extremes? λ_U ≈ P(both above their own p90)/0.1: the copula
    * diagnostic that correlation misses (two series can correlate
    * 0.9 yet decouple exactly where capacity planning cares).
    * Both thresholds are nearest-rank cuts on each variable's own
    * DOMAIN; the joint exceedance count is one pass; λ and the
    * independence baseline ship side by side in exact ppm. */
  private[graft] def qTailDependence(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(epochDay(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"),
        expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100000").as("y"))
      .localCheckpoint(eager = false)
    def p90(c: String): DataFrame = {
      val dom = daily.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      val tt = dom.agg(sum(col("cnt")).as("n"))
      dom.withColumn("cum", sum(col("cnt")).over(Window.orderBy(col(c))
          .rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(tt))
        .filter(col("cum") * 10 >= col("n") * 9)
        .agg(min(col(c)).as(s"q_$c"))
    }
    daily.crossJoin(broadcast(p90("x"))).crossJoin(broadcast(p90("y")))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("x") > col("q_x"), 1L).otherwise(0L)).as("ex_x"),
        sum(when(col("y") > col("q_y"), 1L).otherwise(0L)).as("ex_y"),
        sum(when(col("x") > col("q_x") && col("y") > col("q_y"), 1L).otherwise(0L)).as("ex_both"))
      .select(col("n_days"), col("ex_x"), col("ex_y"), col("ex_both"),
        expr("ex_both * 1000000 div greatest(ex_x, CAST(1 AS BIGINT))").as("lambda_u_ppm"),
        expr("ex_x * ex_y * 1000000 div (n_days * n_days)").as("independence_ppm"))
  }

  /** Delta-method standard error for the RATIO metric revenue-per-order
    * with CUSTOMER as the randomization unit (the experimentation-
    * platform staple: a naive per-order variance understates the SE
    * because orders cluster within customers). Per segment, the exact
    * integer moments (n, Σr, Σs, Σr², Σs², Σrs) come from one grouped
    * scan at dollar grain; R̂ = Σr/Σs and
    * var(R̂) ≈ (s_r² − 2R̂·s_rs + R̂²·s_s²)/(n·μ_s²) are fixed double
    * trees over those longs (+,−,×,÷,√ correctly rounded IEEE →
    * bit-identical in any engine, q_welch_t's contract). One shuffle
    * (customer rollup) + one 5-group reduce at any corpus scale. */
  private[graft] def qDeltaMethod(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 100"))
          .as("r"),
        count(lit(1)).as("cnt"))
    val m = per.groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_cust"), sum(col("r")).as("sr"),
        sum(col("cnt")).as("ss"), sum(col("r") * col("r")).as("srr"),
        sum(col("cnt") * col("cnt")).as("sss"),
        sum(col("r") * col("cnt")).as("srs"))
    def d(c: String) = col(c).cast("double")
    val n = d("n_cust")
    val ratio = d("sr") / d("ss")
    val varR = (n * d("srr") - d("sr") * d("sr")) / (n * (n - lit(1.0)))
    val varS = (n * d("sss") - d("ss") * d("ss")) / (n * (n - lit(1.0)))
    val covRS = (n * d("srs") - d("sr") * d("ss")) / (n * (n - lit(1.0)))
    val muS = d("ss") / n
    val varRatio = (varR - lit(2.0) * ratio * covRS + ratio * ratio * varS) /
      (n * (muS * muS))
    m.select(col("segment"), col("n_cust"), col("sr").as("rev_total"),
        col("ss").as("orders_total"), ratio.as("ratio"),
        sqrt(varRatio).as("se_delta"))
      .orderBy(col("segment"))
  }

  /** Isotonic (monotone) calibration of the q_quality_model logit via
    * the minimax characterization μ̂ᵢ = max_{j≤i} min_{k≥i} mean(j..k)
    * (Barlow et al. 1972) — the nonparametric recalibration that fixes
    * non-monotone reliability bins without assuming a sigmoid (Platt)
    * shape. The scorer is the q_calibration logit DEGRADED by
    * deterministic md5 noise (a replayable stand-in for a weak
    * classifier — the noiseless logit separates this corpus perfectly,
    * leaving PAVA nothing to pool); its bin rates genuinely violate
    * monotonicity at both SFs, so the fit does real pooling. The
    * unbounded scan reduces to 21 fixed score bins; interval means
    * over bin spans are exact ppm integers from prefix sums, and the
    * max-of-min runs relationally over the ≤21³ (bin, j, k) triples —
    * bounded model state, so every post-scan step is O(1) at any
    * corpus scale. The fit is PAVA on the ppm-rounded bin rates
    * (rounding happens before the minimax, identically in both
    * engines). */
  private[graft] def qIsotonic(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = t(s, dir, "documents")
      .select(
        (col("n_chars") >= 200).as("label"),
        (lit(40L) * size(split(col("text"), " ")).cast("long") +
          lit(-10L) * length(regexp_replace(col("text"), "[^0-9]", ""))
            .cast("long") +
          lit(-2L) * abs(col("n_chars") - 500) + lit(-1500L) +
          h60(concat(lit("cal|"), col("doc_id").cast("string"))) % 4001 -
          lit(2000L))
          .as("score_milli"))
      .withColumn("bin",
        greatest(least(expr("score_milli div 400"), lit(10L)), lit(-10L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"))
    // 21-row model table from here on: prefix sums, interval means, minimax.
    val pre = bins
      .withColumn("cn", sum(col("n")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cp", sum(col("pos")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .localCheckpoint(eager = false)
    val lo = pre.select(col("bin").as("j"), (col("cn") - col("n")).as("cn0"),
      (col("cp") - col("pos")).as("cp0"))
    val hi = pre.select(col("bin").as("k"), col("cn").as("cn1"),
      col("cp").as("cp1"))
    val intervals = lo.crossJoin(hi).filter(col("j") <= col("k"))
      .select(col("j"), col("k"),
        expr("(cp1 - cp0) * 1000000 div (cn1 - cn0)").as("mean_ppm"))
    val fit = pre.select(col("bin"))
      .join(intervals, col("j") <= col("bin") && col("bin") <= col("k"))
      .groupBy(col("bin"), col("j"))
      .agg(min(col("mean_ppm")).as("mn"))
      .groupBy(col("bin"))
      .agg(max(col("mn")).as("iso_ppm"))
    bins.join(fit, "bin")
      .select(col("bin"), col("n"), col("pos"),
        expr("pos * 1000000 div n").as("raw_ppm"), col("iso_ppm"))
      .orderBy(col("bin"))
  }

  private[graft] def statsQueryMap: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_delta_method" -> (qDeltaMethod _),
    "q_isotonic" -> (qIsotonic _),
    "q_percentile" -> (qPercentile _),
    "q_percentile_exact" -> (qPercentileExact _),
    "q_outliers_iqr" -> (qOutliersIqr _),
    "q_percentile_cont" -> (qPercentileCont _),
    "q_anomaly" -> (qAnomaly _),
    "q_chi_square" -> (qChiSquare _),
    "q_weighted_median" -> (qWeightedMedian _),
    "q_weighted_quartiles" -> (qWeightedQuartiles _),
    "q_benford" -> (qBenford _),
    "q_regression" -> (qRegression _),
    "q_ab_test" -> (qAbTest _),
    "q_winsorize" -> (qWinsorize _),
    "q_ks_test" -> (qKsTest _),
    "q_spearman" -> (qSpearman _),
    "q_mann_whitney" -> (qMannWhitney _),
    "q_kappa" -> (qKappa _),
    "q_bootstrap" -> (qBootstrap _),
    "q_calibration" -> (qCalibration _),
    "q_entropy" -> (qEntropy _),
    "q_mutual_info" -> (qMutualInfo _),
    "q_auc" -> (qAuc _),
    "q_theil_sen" -> (qTheilSen _),
    "q_mrr" -> (qMrr _),
    "q_woe_iv" -> (qWoeIv _),
    "q_ndcg" -> (qNdcg _),
    "q_mad" -> (qMad _),
    "q_wilson" -> (qWilson _),
    "q_mde" -> (qMde _),
    "q_sprt" -> (qSprt _),
    "q_trimmed_mean" -> (qTrimmedMean _),
    "q_mcnemar" -> (qMcnemar _),
    "q_cuped" -> (qCuped _),
    "q_power_iteration" -> (qPowerIteration _),
    "q_welch_t" -> (qWelchT _),
    "q_anova_f" -> (qAnovaF _),
    "q_cliffs_delta" -> (qCliffsDelta _),
    "q_poisson_rate" -> (qPoissonRate _),
    "q_robust_scaler" -> (qRobustScaler _),
    "q_ab_srm" -> (qAbSrm _),
    "q_hurst" -> (qHurst _),
    "q_eb_shrinkage" -> (qEbShrinkage _),
    "q_ece" -> (qEce _),
    "q_fleiss_kappa" -> (qFleissKappa _),
    "q_neyman_alloc" -> (qNeymanAlloc _),
    "q_uplift_by_segment" -> (qUpliftBySegment _),
    "q_anomaly_stl" -> (qAnomalyStl _),
    "q_entropy_rate" -> (qEntropyRate _),
    "q_pca_var_share" -> (qPcaVarShare _),
    "q_threshold_f1" -> (qThresholdF1 _),
    "q_interference" -> (qInterference _),
    "q_wilson_rank" -> (qWilsonRank _),
    "q_threshold_youden" -> (qThresholdYouden _),
    "q_sample_size" -> (qSampleSize _),
    "q_skew_kurtosis" -> (qSkewKurtosis _),
    "q_ab_guardrails" -> (qAbGuardrails _),
    "q_tukey_hsd" -> (qTukeyHsd _),
    "q_weibull_fit" -> (qWeibullFit _),
    "q_theil_decomp" -> (qTheilDecomp _),
    "q_corr_matrix" -> (qCorrMatrix _),
    "q_top_pc" -> (qTopPc _),
    "q_logistic_irls" -> (qLogisticIrls _),
    "q_robust_shape" -> (qRobustShape _),
    "q_winsor_sensitivity" -> (qWinsorSensitivity _),
    "q_huber_mean" -> (qHuberMean _),
    "q_tail_dependence" -> (qTailDependence _),
  )

  private[graft] def statsOracleMap: Map[String, String] = Map(
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
    // (uncapped) inverted-index Jaccard join a user would write,
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
    "q_weighted_quartiles" ->
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
        |  FROM wp),
        |q AS (SELECT * FROM (VALUES (1, 4, 25), (1, 2, 50), (3, 4, 75))
        |      t(num, den, pct))
        |SELECT CAST(nk AS BIGINT) AS nationkey,
        |  CAST(pct AS BIGINT) AS pct,
        |  CAST(min(p) AS BIGINT) / CAST(100.0 AS DOUBLE) AS price,
        |  CAST(max(tw) AS BIGINT) AS total_weight
        |FROM c CROSS JOIN q WHERE cw * den >= num * tw
        |GROUP BY nk, pct ORDER BY nationkey, pct""".stripMargin,
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
    // fixed-point distance key and tie order, then scores the overlap,
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
    "q_delta_method" ->
      """WITH per AS (
        |  SELECT c_mktsegment AS segment, o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100) AS BIGINT) AS r,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(r) AS BIGINT) AS sr, CAST(sum(cnt) AS BIGINT) AS ss,
        |    CAST(sum(r * r) AS BIGINT) AS srr,
        |    CAST(sum(cnt * cnt) AS BIGINT) AS sss,
        |    CAST(sum(r * cnt) AS BIGINT) AS srs
        |  FROM per GROUP BY segment),
        |d AS (
        |  SELECT segment, n_cust, sr, ss,
        |    CAST(n_cust AS DOUBLE) AS n,
        |    CAST(sr AS DOUBLE) / CAST(ss AS DOUBLE) AS ratio,
        |    ((CAST(n_cust AS DOUBLE) * CAST(srr AS DOUBLE)) - (CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)))
        |      / (CAST(n_cust AS DOUBLE) * (CAST(n_cust AS DOUBLE) - 1.0)) AS var_r,
        |    ((CAST(n_cust AS DOUBLE) * CAST(sss AS DOUBLE)) - (CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)))
        |      / (CAST(n_cust AS DOUBLE) * (CAST(n_cust AS DOUBLE) - 1.0)) AS var_s,
        |    ((CAST(n_cust AS DOUBLE) * CAST(srs AS DOUBLE)) - (CAST(sr AS DOUBLE) * CAST(ss AS DOUBLE)))
        |      / (CAST(n_cust AS DOUBLE) * (CAST(n_cust AS DOUBLE) - 1.0)) AS cov_rs,
        |    CAST(ss AS DOUBLE) / CAST(n_cust AS DOUBLE) AS mu_s
        |  FROM m)
        |SELECT segment, n_cust, sr AS rev_total, ss AS orders_total, ratio,
        |  sqrt(((var_r - ((2.0 * ratio) * cov_rs)) + ((ratio * ratio) * var_s))
        |       / (n * (mu_s * mu_s))) AS se_delta
        |FROM d ORDER BY segment""".stripMargin,
    "q_isotonic" ->
      """WITH scored AS (
        |  SELECT n_chars >= 200 AS label,
        |    40 * CAST(len(string_split(text, ' ')) AS BIGINT) +
        |    (-10) * CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) +
        |    (-2) * abs(n_chars - 500) + (-1500) +
        |    CAST('0x' || substr(md5('cal|' || CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 4001 - 2000 AS score_milli
        |  FROM documents),
        |bins AS (
        |  SELECT greatest(least(score_milli // 400, 10), -10) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM scored GROUP BY 1),
        |pre AS (
        |  SELECT bin, n, pos,
        |    CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
        |    CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS cp
        |  FROM bins),
        |iv AS (
        |  SELECT l.bin AS j, h.bin AS k,
        |    CAST((h.cp - (l.cp - l.pos)) * 1000000
        |      // (h.cn - (l.cn - l.n)) AS BIGINT) AS mean_ppm
        |  FROM pre l, pre h WHERE l.bin <= h.bin),
        |mm AS (
        |  SELECT p.bin, i.j, CAST(min(i.mean_ppm) AS BIGINT) AS mn
        |  FROM pre p JOIN iv i ON i.j <= p.bin AND p.bin <= i.k
        |  GROUP BY p.bin, i.j),
        |fit AS (
        |  SELECT bin, CAST(max(mn) AS BIGINT) AS iso_ppm FROM mm GROUP BY bin)
        |SELECT b.bin, b.n, b.pos, b.pos * 1000000 // b.n AS raw_ppm, f.iso_ppm
        |FROM bins b JOIN fit f ON b.bin = f.bin ORDER BY b.bin""".stripMargin,
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
    // kernel, same blocking,
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
    // oracle asserts they held (q_approx_distinct's pattern),
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
    "q_interference" ->
      """WITH items AS (
        |  SELECT DISTINCT o_custkey AS cust, l_partkey AS part
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_partkey % 20 = 0),
        |pd AS (SELECT part, CAST(count(*) AS BIGINT) AS pd
        |  FROM items GROUP BY 1),
        |capped AS (
        |  SELECT cust, part FROM items
        |  WHERE part IN (SELECT part FROM pd WHERE pd <= 64)),
        |edges AS (
        |  SELECT DISTINCT a.cust AS u, b.cust AS v
        |  FROM capped a JOIN capped b
        |    ON a.part = b.part AND a.cust <> b.cust),
        |exposure AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS n_nbr,
        |    CAST(sum(CASE WHEN v % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS treated_nbr
        |  FROM edges GROUP BY u),
        |conv AS (
        |  SELECT o_custkey,
        |    CAST(max(CASE WHEN o_orderdate >= DATE '1995-01-01'
        |      AND o_orderdate < DATE '1996-01-01' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |ctrl AS (
        |  SELECT treated_nbr * 1000000 // n_nbr AS x, y
        |  FROM exposure JOIN conv ON u = o_custkey
        |  WHERE u % 2 = 0),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum((x // 1000) * (x // 1000)) AS BIGINT) AS sxx_m2,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM ctrl)
        |SELECT n AS n_control, sx // n AS mean_exposure_ppm,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx_m2 AS DOUBLE) * 1000000.0
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * sqrt(CAST(n AS DOUBLE) * CAST(sy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |  AS interference_r
        |FROM m""".stripMargin,
    "q_wilson_rank" ->
      """WITH g AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand),
        |sc AS (
        |  SELECT p_brand, n, x,
        |    ((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
        |      + 3.8416 / (2.0 * CAST(n AS DOUBLE)))
        |     - 1.96 * sqrt((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
        |        / CAST(n AS DOUBLE)
        |        + 3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |    / (1.0 + 3.8416 / CAST(n AS DOUBLE)) AS wilson_lo
        |  FROM g)
        |SELECT p_brand, n, x, wilson_lo FROM sc
        |ORDER BY wilson_lo DESC, p_brand LIMIT 10""".stripMargin,
    "q_threshold_youden" ->
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
        |  SELECT bin AS threshold_bin, tp, pred_pos - tp AS fp,
        |    tp * 1000000 // npos AS tpr_ppm,
        |    (pred_pos - tp) * 1000000 // (nn - npos) AS fpr_ppm,
        |    tp * 1000000 // npos
        |      - (pred_pos - tp) * 1000000 // (nn - npos) AS youden_ppm
        |  FROM cum CROSS JOIN tot),
        |best AS (
        |  SELECT max(youden_ppm * 1000 + (threshold_bin + 10)) AS enc
        |  FROM s2)
        |SELECT threshold_bin, tp, fp, tpr_ppm, fpr_ppm, youden_ppm,
        |  youden_ppm * 1000 + (threshold_bin + 10) = enc AS is_best
        |FROM s2 CROSS JOIN best ORDER BY threshold_bin""".stripMargin,
    "q_sample_size" ->
      """WITH base AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT)
        |    AS c
        |  FROM (SELECT o_custkey,
        |          CAST(max(CASE WHEN o_orderdate >= DATE '1995-01-01'
        |            AND o_orderdate < DATE '1996-01-01' THEN 1 ELSE 0 END)
        |            AS BIGINT) AS conv
        |        FROM orders GROUP BY o_custkey) t),
        |effects AS (SELECT CAST(unnest([10000, 20000, 50000]) AS BIGINT)
        |  AS effect_ppm)
        |SELECT effect_ppm, n AS n_observed,
        |  CAST(floor(7.849 * 2.0
        |    * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (1.0 - CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |    / ((CAST(effect_ppm AS DOUBLE) / 1000000.0)
        |      * (CAST(effect_ppm AS DOUBLE) / 1000000.0)) + 0.5) AS BIGINT)
        |    AS n_per_arm
        |FROM base CROSS JOIN effects ORDER BY effect_ppm""".stripMargin,
    "q_skew_kurtosis" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      // 100000 AS v
        |  FROM orders GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s1,
        |    CAST(sum(v * v) AS BIGINT) AS s2
        |  FROM daily),
        |z AS (
        |  SELECT CAST(floor((CAST(v AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |    * 1000 + 0.5) AS BIGINT) AS zm
        |  FROM daily CROSS JOIN m)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(zm * zm * zm) AS BIGINT)
        |    // (CAST(count(*) AS BIGINT) * 1000000) AS skewness_milli,
        |  CAST(sum(zm * zm * zm * zm) AS BIGINT)
        |    // (CAST(count(*) AS BIGINT) * 1000000000) - 3000
        |    AS ex_kurtosis_milli
        |FROM z""".stripMargin,
    "q_ab_guardrails" ->
      """WITH per AS (
        |  SELECT o_custkey % 2 AS arm,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS users,
        |    CAST(count(*) AS BIGINT) AS orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END) AS BIGINT) AS urgent
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT max(CASE WHEN arm = 0 THEN users END) AS u0,
        |    max(CASE WHEN arm = 0 THEN orders END) AS o0,
        |    max(CASE WHEN arm = 0 THEN cents END) AS c0,
        |    max(CASE WHEN arm = 0 THEN urgent END) AS g0,
        |    max(CASE WHEN arm = 1 THEN users END) AS u1,
        |    max(CASE WHEN arm = 1 THEN orders END) AS o1,
        |    max(CASE WHEN arm = 1 THEN cents END) AS c1,
        |    max(CASE WHEN arm = 1 THEN urgent END) AS g1
        |  FROM per)
        |SELECT
        |  o1 * 1000 // u1 - o0 * 1000 // u0 AS opu_gap_milli,
        |  abs(o1 * u0 - o0 * u1) * 50 <= o0 * u1 AS orders_per_user_ok,
        |  c1 // o1 - c0 // o0 AS aov_gap_cents,
        |  abs(c1 * o0 - c0 * o1) * 50 <= c0 * o1 AS avg_order_value_ok,
        |  g1 * 1000000 // o1 - g0 * 1000000 // o0 AS urgent_gap_ppm,
        |  abs(g1 * o0 - g0 * o1) * 50 <= g0 * o1 AS urgent_share_ok
        |FROM w""".stripMargin,
    "q_tukey_hsd" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS sy,
        |    CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)
        |             * CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS syy
        |  FROM orders GROUP BY 1),
        |g2 AS (
        |  SELECT grp, n, sy, syy,
        |    CAST(floor(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS ssw_g
        |  FROM g),
        |mse AS (
        |  SELECT CAST(sum(ssw_g) AS DOUBLE) / CAST(sum(n) - count(*) AS DOUBLE) AS mse
        |  FROM g2),
        |pairs AS (
        |  SELECT i.grp AS grp_i, j.grp AS grp_j, i.n AS n_i, j.n AS n_j,
        |    CAST(floor((CAST(i.sy AS DOUBLE) / CAST(i.n AS DOUBLE) - CAST(j.sy AS DOUBLE) / CAST(j.n AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS mean_diff_milli,
        |    CAST(floor(abs(CAST(i.sy AS DOUBLE) / CAST(i.n AS DOUBLE) - CAST(j.sy AS DOUBLE) / CAST(j.n AS DOUBLE)) / sqrt(mse / 2.0 * (1.0 / CAST(i.n AS DOUBLE) + 1.0 / CAST(j.n AS DOUBLE))) * 1000 + 0.5) AS BIGINT) AS q_milli
        |  FROM g2 i JOIN g2 j ON i.grp < j.grp CROSS JOIN mse)
        |SELECT grp_i, grp_j, n_i, n_j, mean_diff_milli, q_milli,
        |  CASE WHEN q_milli >= 3858 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS significant
        |FROM pairs
        |ORDER BY grp_i, grp_j""".stripMargin,
    "q_weibull_fit" ->
      """WITH se AS (
        |  SELECT l_orderkey,
        |    CAST(min(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS ship
        |  FROM lineitem GROUP BY 1),
        |lags AS (
        |  SELECT ship - CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM se JOIN orders ON l_orderkey = o_orderkey),
        |dom AS (SELECT d, count(*) AS cnt FROM lags WHERE d > 0 GROUP BY d),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM dom),
        |pts AS (
        |  SELECT
        |    CAST(floor(ln(CAST(d AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(ln(-ln(1.0 - (CAST(cum AS DOUBLE) - 0.3) / (CAST(n AS DOUBLE) + 0.4))) * 1000000 + 0.5) AS BIGINT) AS y
        |  FROM (SELECT d, sum(cnt) OVER (ORDER BY d
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM dom) q CROSS JOIN tot
        |  WHERE cum < n),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS np, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM pts)
        |SELECT np AS n_points,
        |  CAST(floor((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS shape_milli,
        |  CAST(floor(exp(-((CAST(sy AS DOUBLE) - (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(np AS DOUBLE)) / ((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) / 1000000.0) * 1000 + 0.5) AS BIGINT) AS scale_days_milli
        |FROM acc""".stripMargin,
    "q_theil_decomp" ->
      """WITH cust AS (
        |  SELECT c.c_nationkey AS nat0,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100 AS xd
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY o.o_custkey, c.c_nationkey),
        |cust2 AS (SELECT CAST(nat0 AS BIGINT) AS nat, xd FROM cust),
        |bynat AS (
        |  SELECT nat, CAST(count(*) AS BIGINT) AS ng, CAST(sum(xd) AS BIGINT) AS sg
        |  FROM cust2 GROUP BY nat),
        |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS nn, CAST(sum(sg) AS BIGINT) AS ss FROM bynat),
        |terms AS (
        |  SELECT c2.nat,
        |    CAST(sum(CAST(floor(CAST(xd AS DOUBLE) * ln(CAST(xd AS DOUBLE) * CAST(nn AS DOUBLE) / CAST(ss AS DOUBLE)) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS tglob_milli,
        |    CAST(sum(CAST(floor(CAST(xd AS DOUBLE) * ln(CAST(xd AS DOUBLE) * CAST(ng AS DOUBLE) / CAST(sg AS DOUBLE)) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS twith_milli
        |  FROM cust2 c2 CROSS JOIN tot JOIN bynat b ON c2.nat = b.nat
        |  GROUP BY c2.nat),
        |tt AS (
        |  SELECT CAST(floor(CAST(sum(tglob_milli) AS DOUBLE) / 1000.0 / CAST(max(ss) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS t_total_micro
        |  FROM terms CROSS JOIN tot)
        |SELECT t.nat, b.ng,
        |  b.sg * 1000000 // tot.ss AS spend_share_ppm,
        |  CAST(floor(CAST(t.twith_milli AS DOUBLE) / 1000.0 / CAST(b.sg AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS t_within_micro,
        |  CAST(floor(CAST(b.sg AS DOUBLE) / CAST(tot.ss AS DOUBLE) * ln((CAST(b.sg AS DOUBLE) / CAST(tot.ss AS DOUBLE)) / (CAST(b.ng AS DOUBLE) / CAST(tot.nn AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS between_term_micro,
        |  tt.t_total_micro
        |FROM terms t JOIN bynat b ON t.nat = b.nat CROSS JOIN tot CROSS JOIN tt
        |ORDER BY t.nat""".stripMargin,
    "q_corr_matrix" -> {
      def r(sxy: String, sx: String, sy: String, sxx: String, syy: String) =
        s"""CAST(floor((CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE) - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST($syy AS DOUBLE) - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)"""
      s"""WITH f AS (
         |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         |    CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS p,
         |    CAST(floor(l_discount * 1000 + 0.5) AS BIGINT) AS d,
         |    CAST(floor(l_tax * 1000 + 0.5) AS BIGINT) AS x
         |  FROM lineitem),
         |acc AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
         |    CAST(sum(d) AS BIGINT) AS sd, CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(q * q) AS BIGINT) AS sqq, CAST(sum(p * p) AS BIGINT) AS spp,
         |    CAST(sum(d * d) AS BIGINT) AS sdd, CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(q * p) AS BIGINT) AS sqp, CAST(sum(q * d) AS BIGINT) AS sqd,
         |    CAST(sum(q * x) AS BIGINT) AS sqx, CAST(sum(p * d) AS BIGINT) AS spd,
         |    CAST(sum(p * x) AS BIGINT) AS spx, CAST(sum(d * x) AS BIGINT) AS sdx
         |  FROM f)
         |SELECT n, 'quantity|price' AS pair, ${r("sqp", "sq", "sp", "sqq", "spp")} AS r_ppm FROM acc
         |UNION ALL SELECT n, 'quantity|discount', ${r("sqd", "sq", "sd", "sqq", "sdd")} FROM acc
         |UNION ALL SELECT n, 'quantity|tax', ${r("sqx", "sq", "sx", "sqq", "sxx")} FROM acc
         |UNION ALL SELECT n, 'price|discount', ${r("spd", "sp", "sd", "spp", "sdd")} FROM acc
         |UNION ALL SELECT n, 'price|tax', ${r("spx", "sp", "sx", "spp", "sxx")} FROM acc
         |UNION ALL SELECT n, 'discount|tax', ${r("sdx", "sd", "sx", "sdd", "sxx")} FROM acc
         |ORDER BY pair""".stripMargin
    },
    "q_top_pc" -> {
      def iter(k: Int, prev: String) =
        s"""s$k AS (
           |  SELECT vec_id, CAST(floor(CAST(sum(xq * v) AS DOUBLE) / 100000.0) AS BIGINT) AS sm
           |  FROM xq JOIN $prev USING (i) GROUP BY vec_id),
           |w$k AS (
           |  SELECT i, CAST(sum(xq * sm) AS BIGINT) AS w
           |  FROM xq JOIN s$k USING (vec_id) GROUP BY i),
           |m$k AS (SELECT CAST(max(abs(w)) AS BIGINT) AS vmax FROM w$k),
           |v$k AS (
           |  SELECT i, CAST(floor(CAST(w AS DOUBLE) / CAST(vmax AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v
           |  FROM w$k CROSS JOIN m$k)""".stripMargin
      s"""WITH xq AS (
         |  SELECT vec_id, i,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xq
         |  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)),
         |v0 AS (SELECT CAST(i AS BIGINT) AS i, CAST(1000000 AS BIGINT) AS v
         |       FROM generate_series(1, 64) t(i)),
         |${iter(1, "v0")},
         |${iter(2, "v1")},
         |${iter(3, "v2")},
         |rd AS (
         |  SELECT vec_id,
         |    CAST(floor(CAST(sum(xq * v) AS DOUBLE) / 10000000.0) AS BIGINT) AS dm,
         |    CAST(floor(CAST(sum(xq * xq) AS DOUBLE) / 100000.0) AS BIGINT) AS n2m
         |  FROM xq JOIN v3 USING (i) GROUP BY vec_id),
         |sums AS (
         |  SELECT CAST(sum(dm * dm) AS BIGINT) AS sdm2, CAST(sum(n2m) AS BIGINT) AS sn2m
         |  FROM rd),
         |vtv AS (SELECT CAST(sum(v * v) AS BIGINT) AS vtv FROM v3),
         |top AS (
         |  SELECT i, v, CAST(row_number() OVER (ORDER BY abs(v) DESC, i) AS BIGINT) AS rank
         |  FROM v3 ORDER BY abs(v) DESC, i LIMIT 8)
         |SELECT rank, i AS dim, v AS loading_micro,
         |  CAST(floor(CAST(sdm2 AS DOUBLE) * 1000000000.0 / (CAST(vtv AS DOUBLE) * CAST(sn2m AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS evr_ppm
         |FROM top CROSS JOIN sums CROSS JOIN vtv
         |ORDER BY rank""".stripMargin
    },
    "q_logistic_irls" ->
      """WITH base AS (
        |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
        |    CAST(floor(ln(o_totalprice) * 1000 + 0.5) AS BIGINT) AS x
        |  FROM orders),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM base)
        |SELECT n,
        |  CAST(floor(2.0 * (CAST(sxx AS DOUBLE) * CAST(2 * sy - n AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(2 * sxy - sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS beta0_micro,
        |  CAST(floor(2.0 * (CAST(n AS DOUBLE) * CAST(2 * sxy - sx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(2 * sy - n AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000.0 * 1000000 + 0.5) AS BIGINT) AS beta1_per_ln_micro,
        |  CAST(floor(1.0 / (1.0 + exp(-(
        |      2.0 * (CAST(sxx AS DOUBLE) * CAST(2 * sy - n AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(2 * sxy - sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    + 2.0 * (CAST(n AS DOUBLE) * CAST(2 * sxy - sx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(2 * sy - n AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    ))) * 1000 + 0.5) AS BIGINT) AS p_at_mean_milli
        |FROM acc""".stripMargin,
    "q_robust_shape" ->
      """WITH vals AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |dom AS (SELECT grp, c, count(*) AS cnt FROM vals GROUP BY grp, c),
        |ng AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM dom GROUP BY grp),
        |cums AS (
        |  SELECT d.grp, d.c, ng.n,
        |    sum(cnt) OVER (PARTITION BY d.grp ORDER BY d.c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM dom d JOIN ng ON d.grp = ng.grp),
        |oct AS (
        |  SELECT grp, k, CAST(min(c) AS BIGINT) AS e
        |  FROM cums CROSS JOIN generate_series(1, 7) t(k)
        |  WHERE cum * 8 >= k * n GROUP BY grp, k),
        |wide AS (
        |  SELECT grp,
        |    min(CASE WHEN k = 1 THEN e END) AS e1,
        |    min(CASE WHEN k = 2 THEN e END) AS e2,
        |    min(CASE WHEN k = 3 THEN e END) AS e3,
        |    min(CASE WHEN k = 4 THEN e END) AS e4,
        |    min(CASE WHEN k = 5 THEN e END) AS e5,
        |    min(CASE WHEN k = 6 THEN e END) AS e6,
        |    min(CASE WHEN k = 7 THEN e END) AS e7
        |  FROM oct GROUP BY grp)
        |SELECT grp, CAST(e2 AS BIGINT) AS q1_cents, CAST(e4 AS BIGINT) AS med_cents,
        |  CAST(e6 AS BIGINT) AS q3_cents,
        |  CAST(floor(CAST(e6 + e2 - 2 * e4 AS DOUBLE) / CAST(e6 - e2 AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS bowley_milli,
        |  CAST(floor(CAST((e7 - e5) + (e3 - e1) AS DOUBLE) / CAST(e6 - e2 AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS moors_milli
        |FROM wide ORDER BY grp""".stripMargin,
    "q_winsor_sensitivity" ->
      """WITH dom AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c, count(*) AS cnt
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(c * cnt) AS BIGINT) AS tc
        |  FROM dom),
        |cums AS (
        |  SELECT c,
        |    sum(cnt) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn,
        |    sum(c * cnt) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
        |  FROM dom),
        |ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES (90), (95), (99)) t(k)),
        |caps AS (
        |  SELECT k, CAST(min(c) AS BIGINT) AS cap
        |  FROM cums CROSS JOIN ks CROSS JOIN tot
        |  WHERE cumn * 100 >= k * n GROUP BY k)
        |SELECT caps.k, caps.cap AS cap_cents,
        |  CAST(floor(CAST(cu.cumc + caps.cap * (tot.n - cu.cumn) AS DOUBLE) / CAST(tot.n AS DOUBLE) / 100.0 * 1000 + 0.5) AS BIGINT) AS winsor_mean_milli,
        |  CAST((tot.tc - (cu.cumc + caps.cap * (tot.n - cu.cumn))) * 1000000 // tot.tc AS BIGINT) AS mass_removed_ppm
        |FROM caps JOIN cums cu ON caps.cap = cu.c CROSS JOIN tot
        |ORDER BY caps.k""".stripMargin,
    "q_huber_mean" ->
      """WITH vals AS (
        |  SELECT CAST(floor(o_totalprice + 0.5) AS BIGINT) AS d FROM orders),
        |dom1 AS (SELECT d, count(*) AS cnt FROM vals GROUP BY d),
        |t1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM dom1),
        |med AS (
        |  SELECT CAST(min(d) AS BIGINT) AS med FROM (
        |    SELECT d, sum(cnt) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM dom1) q CROSS JOIN t1 WHERE cum * 2 >= n),
        |res AS (SELECT abs(v.d - m.med) AS r FROM vals v CROSS JOIN med m),
        |dom2 AS (SELECT r, count(*) AS cnt FROM res GROUP BY r),
        |t2 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM dom2),
        |mad AS (
        |  SELECT CAST(min(r) AS BIGINT) AS mad FROM (
        |    SELECT r, sum(cnt) OVER (ORDER BY r
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM dom2) q CROSS JOIN t2 WHERE cum * 2 >= n),
        |weighted AS (
        |  SELECT v.d, m.med, a.mad,
        |    CAST(floor(least(1.0, 1.345 * 1.4826 * CAST(a.mad AS DOUBLE) / CAST(greatest(abs(v.d - m.med), 1) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wq
        |  FROM vals v CROSS JOIN med m CROSS JOIN mad a)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(med) AS BIGINT) AS median_dollar,
        |  CAST(max(mad) AS BIGINT) AS mad_dollar,
        |  CAST(floor(CAST(sum(wq * d) AS DOUBLE) / CAST(sum(wq) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS huber_mean_milli,
        |  CAST(floor(CAST(sum(d) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS raw_mean_milli
        |FROM weighted""".stripMargin,
    "q_tail_dependence" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100000 AS y
        |  FROM orders GROUP BY 1),
        |qx AS (
        |  SELECT CAST(min(x) AS BIGINT) AS q_x FROM (
        |    SELECT x, sum(cnt) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, n
        |    FROM (SELECT x, count(*) AS cnt FROM daily GROUP BY x) d
        |    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM daily) t) q
        |  WHERE cum * 10 >= n * 9),
        |qy AS (
        |  SELECT CAST(min(y) AS BIGINT) AS q_y FROM (
        |    SELECT y, sum(cnt) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, n
        |    FROM (SELECT y, count(*) AS cnt FROM daily GROUP BY y) d
        |    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM daily) t) q
        |  WHERE cum * 10 >= n * 9),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CASE WHEN x > q_x THEN 1 ELSE 0 END) AS BIGINT) AS ex_x,
        |    CAST(sum(CASE WHEN y > q_y THEN 1 ELSE 0 END) AS BIGINT) AS ex_y,
        |    CAST(sum(CASE WHEN x > q_x AND y > q_y THEN 1 ELSE 0 END) AS BIGINT) AS ex_both
        |  FROM daily CROSS JOIN qx CROSS JOIN qy)
        |SELECT n_days, ex_x, ex_y, ex_both,
        |  ex_both * 1000000 // greatest(ex_x, 1) AS lambda_u_ppm,
        |  ex_x * ex_y * 1000000 // (n_days * n_days) AS independence_ppm
        |FROM acc""".stripMargin,
  )
}
