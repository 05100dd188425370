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
private[graft] trait WarehouseQueries2 { this: SparkEntry.type =>

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
  private[graft] def qProfile(s: SparkSession, dir: String): DataFrame = {
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

  /** Cohort retention — the classic product-analytics triangle: users
    * cohorted by their first-activity week, then counted distinct per
    * (cohort_week, week_offset). Two aggregations keyed by user — the
    * shuffle carries users, never events — then one count-distinct per
    * cell; all week arithmetic is integer epoch-seconds (the ns-epoch
    * policy), so the cells hash-match bit-for-bit. */
  private[graft] def qRetention(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qTableChecksum(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def qHistQuantile(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qIslands(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qMarketShare(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qHllIntersect(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qIvm(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
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

  /** Entity-resolution matching with blocking — the structured-data
    * dedup complement to the document near-dup family: candidate pairs
    * come ONLY from equi-joined (brand, size) blocks (the standard ER
    * blocking discipline — the expensive edit-distance scorer never
    * sees a cross-block pair, and the join is a plain shuffle on the
    * block key), then pairs score by name edit distance and match at
    * ≤3 edits. At corpus scale the block key is the knob: tighter
    * blocks trade recall for candidate volume, exactly like the
    * shingle-prefix trade-off in the text family. */
  private[graft] def qErMatch(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qInterpolate(s: SparkSession, dir: String): DataFrame = {
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

  /** Referential-integrity audit over the star schema: every FK edge
    * scanned once, orphan children counted via a null-probe LEFT join
    * against the DISTINCT (and broadcast-small) parent key set — the
    * anti-join formulated as one aggregation, no row ever leaves the
    * scan. A deliberately corrupted copy of one edge (every 1000th
    * part key shifted out of range) proves the audit actually detects
    * violations rather than vacuously passing. */
  private[graft] def qFkOrphans(s: SparkSession, dir: String): DataFrame = {
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

  /** Join-key skew diagnostic — the "does this key need salting"
    * report the salted-join pattern depends on: for each candidate
    * shuffle key, the per-key frequency distribution summarized as
    * top-key share (ppm) and nearest-rank p50/p99 frequencies. The
    * percentiles come from the frequency-OF-frequencies table (one
    * row per DISTINCT per-key count — tiny at any scale), so the only
    * window runs over that bounded domain: no rank pass ever touches
    * the key-cardinality-sized table, let alone the data. */
  private[graft] def qDataSkew(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qTransitions(s: SparkSession, dir: String): DataFrame = {
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

  /** A-priori frequent-itemset mining (pairs) + association rules over
    * order baskets (items = part brands). The candidate space is pruned
    * to frequent items FIRST — the a-priori monotonicity bound: no pair
    * can be frequent unless both members are — so the per-basket
    * self-join scales with Σ frequent-basket-size², never |items|²; the
    * item-support table is tiny and rides along broadcast. Support,
    * confidence (both directions), and lift are exact integer ppm. */
  private[graft] def qItemsets(s: SparkSession, dir: String): DataFrame = {
    // shared collect_set + inline-pair core (QueryShared.basketCore):
    // one wide shuffle, pair generation inside the row, no self-join;
    // item supports + basket total are driver values (bounded by the
    // 25-value brand domain), so the frequent list joins as a LOCAL
    // relation — no broadcast-build jobs re-running the agg chains
    val (nBaskets, items, pairSupp) = basketCore(s, dir)
    val freq = items.filter { case (_, supp) => supp * 20 >= nBaskets } // item minsup 5%
    pairSupp.withColumnRenamed("supp_pair", "supp")
      .filter(col("supp") * 100 >= lit(nBaskets))     // pair minsup 1%
      .join(broadcast(s.createDataFrame(freq).toDF("i1", "s1")), "i1")
      .join(broadcast(s.createDataFrame(freq).toDF("i2", "s2")), "i2")
      .select(col("i1"), col("i2"), col("supp"), col("s1"), col("s2"),
        expr("supp * 1000000 div s1").as("conf12_ppm"),
        expr("supp * 1000000 div s2").as("conf21_ppm"),
        // two-step division: supp*n_baskets*1e6 would overflow int64
        // once baskets reach ~10^7 (ANSI would kill the query at the
        // very scale a-priori is for); conf12 <= 1e6 keeps the
        // intermediate bounded by 1e6 * n_baskets
        expr(s"(supp * 1000000 div s1) * ${nBaskets}L div s2").as("lift_ppm"))
      .orderBy(col("i1"), col("i2"))
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
  private[graft] def qPareto(s: SparkSession, dir: String): DataFrame = {
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

  /** ML feature preparation in one pass: leave-one-out target encoding
    * (the category mean EXCLUDING the current row — the standard
    * leakage-safe categorical encoding) and per-group min-max scaling,
    * both from ONE grouped aggregate broadcast back onto the fact scan.
    * All integer arithmetic: LOO = (Σ−x) div (n−1), scale in exact ppm;
    * degenerate groups (n=1 / constant) yield null, not a crash. */
  private[graft] def qFeaturePrep(s: SparkSession, dir: String): DataFrame = {
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

  /** Exact Gini coefficient of customer revenue inequality via the
    * closed form over ascending-sorted values, G = (2·Σi·xᵢ −
    * (n+1)·Σxᵢ) / (n·Σxᵢ): ranks come from the two-pass
    * range-partitioned prefix sum (run_cnt IS the ascending rank — no
    * global window funnel), moment sums are exact longs, and G is one
    * fixed double tree. Completes the concentration family: q_pareto
    * answers "how many carry 80%", q_gini (Simpson) scores categorical
    * diversity, this scores continuous inequality. Same loud key-
    * encoding guard as q_pareto (cents < 2^37, custkey < 2^26). */
  private[graft] def qLorenzGini(s: SparkSession, dir: String): DataFrame = {
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

  /** Personalized PageRank (3 unrolled iterations, damping 0.85) over
    * the qPagerank co-purchase graph, with ALL teleport mass pinned to
    * the seed set (partkey ≡ 0 mod 100) — the "related to these
    * parts" ranking. Exact int64 fixed point at 1e6 like qPagerank;
    * the one structural difference is the per-iteration LEFT join from
    * the node universe (deg), because a node's teleport term exists
    * even when no in-neighbor contributed mass this round. Edge and
    * degree relations materialize once; each iteration is one
    * equi-join + dest-keyed aggregation + node-keyed left join. */
  private[graft] def qPpr(s: SparkSession, dir: String): DataFrame = {
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

  /** As-of join WITH TOLERANCE: each click takes the user's most
    * recent purchase only when it happened within the last hour,
    * otherwise no match — the bounded-staleness point-in-time lookup
    * (feature stores call this the max-age rule). Same single
    * sort-window pass as the plain as-of (Analytics.asOfLast); the
    * tolerance is a post-predicate, not a second join. */
  private[graft] def qAsofTolerance(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qNullAudit(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def qDecayScore(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def qDecisionStump(s: SparkSession, dir: String): DataFrame = {
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

  /** Join-strategy hint surface: the same orders⋈lineitem aggregate
    * forced through a SHUFFLE_HASH join — no sort phase, the right
    * choice when both sides are large but one partitions into
    * RAM-sized hash maps (vs sort-merge's spill-friendly default).
    * The answer is hint-invariant (the oracle is the plain join);
    * PlanAuditSpec pins the ShuffledHashJoin operator so a planner
    * regression can't silently fall back. */
  private[graft] def qShuffleHashJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), Analytics.cents(col("l_extendedprice")).as("lc"))
      .hint("shuffle_hash")
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("lc")).as("rev_cents"))
      .orderBy(col("o_orderpriority"))

  /** Hive-style partitioned layout + partition pruning: orders written
    * `partitionBy(o_orderpriority)`, then a single-priority read whose
    * filter never touches the other partitions' files — THE mechanism
    * that turns a 100 TB scan into a 20 TB scan when the predicate
    * matches the layout. PlanAuditSpec pins the PartitionFilters
    * entry; the oracle is the same aggregate off the unpartitioned
    * table. */
  private[graft] def qPartitionPrune(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders")
    val out = fmtDir(dir, "orders_bypri")
    // round-13 (guide §6): the layout write is once per (dir) and
    // _SUCCESS-guarded — the q_dpp convention; re-writing the
    // partitioned copy on every run re-timed one-time layout ETL as
    // query work. The pre-write repartition clusters each partition
    // value into one task so every o_orderpriority dir holds ONE
    // right-sized file instead of one per shuffle partition (the
    // small-files tax on every subsequent scan).
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
      src.repartition(col("o_orderpriority"))
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    }
    s.read.parquet(out)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(Analytics.cents(col("o_totalprice"))).as("price_cents"),
        min(col("o_orderkey")).as("first_key"))
      .orderBy(col("o_orderpriority"))
  }

  /** Dynamic partition pruning — q_partition_prune's STATIC file skip
    * upgraded to the runtime form that matters for star joins at
    * 100 TB: orders live partitioned by order month, and the months to
    * read are only known after aggregating ANOTHER table (lineitem's
    * above-average shipping months). Catalyst plants a
    * DynamicPruningSubquery on the partitioned scan fed by the reused
    * broadcast of the dim side, so the fact table's file listing is cut
    * at RUNTIME to the surviving months — no literal month list exists
    * anywhere in the query. PlanAuditSpec pins `dynamicpruning` in the
    * scan's PartitionFilters. The layout write is once per (JVM, dir)
    * (_SUCCESS-guarded); the oracle computes the same aggregate off the
    * unpartitioned table. */
  private[graft] def qDpp(s: SparkSession, dir: String): DataFrame = {
    val out = fmtDir(dir, "orders_bymonth")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
      // round-13 (guide §6): cluster by the partition column before the
      // write so each month dir holds ONE file (was one per shuffle
      // partition — 3× the files, 3× the open/listing cost every scan)
      t(s, dir, "orders")
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .repartition(col("o_month"))
        .write.mode("overwrite").partitionBy("o_month").parquet(out)
    }
    val fact = s.read.parquet(out)
    val monthly = t(s, dir, "lineitem")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("o_month"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("ship_cents"))
    // relative threshold via an unpartitioned window over the BOUNDED
    // ~84-month aggregate (the documented post-aggregate convention) —
    // NOT via crossJoin(broadcast(global agg)): a join inside the dim
    // side defeats the PartitionPruning rule (measured), the window
    // form keeps the dim a single filterable subtree so the
    // DynamicPruningSubquery is planted
    val hot = monthly
      .withColumn("avg_cents",
        expr("sum(ship_cents) over () div count(1) over ()"))
      .filter(col("ship_cents") > col("avg_cents"))
      .select(col("o_month"), col("ship_cents"))
    fact.join(broadcast(hot), "o_month")
      .groupBy(col("o_month"), col("ship_cents"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Analytics.cents(col("o_totalprice"))).as("order_cents"))
      .select(col("o_month"), col("n_orders"), col("order_cents"),
        col("ship_cents"))
      .orderBy(col("o_month"))
  }

  /** Schema-evolution read (mergeSchema): two parquet generations —
    * v1 without, v2 with a `price_cents` column — read as ONE relation
    * whose merged schema null-fills the missing column, then
    * aggregated. This is the lakehouse append-only evolution contract:
    * old files stay valid, new columns arrive as nullable. */
  private[graft] def qMergeSchema(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders")
    val v1 = fmtDir(dir, "evo_v1")
    val v2 = fmtDir(dir, "evo_v2")
    // round-13 (guide §6): both generations are deterministic functions
    // of the source table — once per dir, _SUCCESS-guarded (the q_dpp
    // convention); the query's subject is the merged-schema READ
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(v1, "_SUCCESS"))) {
      src.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").parquet(v1)
    }
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(v2, "_SUCCESS"))) {
      src.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderpriority"),
          Analytics.cents(col("o_totalprice")).as("price_cents"))
        .write.mode("overwrite").parquet(v2)
    }
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
  private[graft] def qUnionByName(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qPeakConcurrency(s: SparkSession, dir: String): DataFrame = {
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

  /** Open-order aging report as of the book's last order date: lines
    * ordered but not yet shipped at the reference day, bucketed by
    * 30-day age, with line counts and open value — the snapshot
    * (point-in-time) inventory query. Reference day is a broadcast
    * scalar; the rest is one filtered scan + small aggregate. */
  private[graft] def qOpenAging(s: SparkSession, dir: String): DataFrame = {
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

  /** OHLC time bars over the purchase stream: per 10-minute bucket,
    * open/close by earliest/latest event (min_by/max_by on the
    * purchase timestamp — globally unique in this stream, an
    * assumption pinned in QueriesSpec so a regenerated dataset fails
    * loudly), high/low, and volume. One map-side-combining aggregate
    * over the bucketed scan — the canonical market-bar shape. */
  private[graft] def qOhlcBars(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def qDid(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qKAnonymity(s: SparkSession, dir: String): DataFrame = {
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

  /** Association rules over the frequent brand pairs (qItemsets'
    * candidate shape): directional confidence and symmetric lift in
    * exact ppm — support counts stay integers, so the engine and
    * oracle agree bit-for-bit where a floating P(A∩B)/P(A)P(B) would
    * drift. Basket list materializes once; every stage is the
    * inverted-index pair join, never baskets×baskets. */
  private[graft] def qAssocRules(s: SparkSession, dir: String): DataFrame = {
    // shared collect_set + inline-pair core (QueryShared.basketCore);
    // the frequent list is a driver value (25-value brand domain) —
    // joined as a LOCAL relation, no broadcast-build jobs
    val (nBaskets, items, pairSupp) = basketCore(s, dir)
    val freq = items.filter { case (_, supp) => supp * 20 >= nBaskets }
    pairSupp
      .filter(col("supp_pair") >= 20)
      .join(broadcast(s.createDataFrame(freq).toDF("i1", "s1")), "i1")
      .join(broadcast(s.createDataFrame(freq).toDF("i2", "s2")), "i2")
      .select(col("i1"), col("i2"), col("supp_pair"),
        expr("(1000000 * supp_pair) div s1").as("conf12_ppm"),
        expr("(1000000 * supp_pair) div s2").as("conf21_ppm"),
        expr(s"(1000000 * supp_pair * ${nBaskets}L) div (s1 * s2)").as("lift_ppm"))
      .orderBy(col("i1"), col("i2"))
  }

  /** Session-outcome distribution (the abandonment report): sessions
    * cut at 30-minute gaps per user (the sessionize rule), each
    * session labeled by its LAST event — well-defined because the
    * stream is in-order per user (ts nondecreasing in event_id, a
    * contract pinned in QueriesSpec), so arg-max on event_id IS the
    * final event. Share of sessions ending in each state, purchase =
    * converted, anything else = abandoned. */
  private[graft] def qAbandonment(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qDecimalAgg(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def qEventPattern(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def qJaroMatch(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qPermTest(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qCem(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qHaar(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qWeightedReservoir(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qNoiseInject(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qUrlParse(s: SparkSession, dir: String): DataFrame = {
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
    * (approx_count_distinct at rsd=1%, gated at 5%): the estimate
    * itself is engine-specific (Spark's sketch, deterministic for
    * fixed data) so the oracle can't replay it — instead the QUERY
    * ships the property that matters (|est − exact| ≤ 5% of exact) as
    * a boolean next to the exact count, and the oracle asserts it must
    * be TRUE. If a Spark upgrade or sketch regression drifts the
    * estimate out of its bound, this row hash-mismatches. The sketch
    * runs at rsd=1% while the gate stays 5%: rsd is a 1σ parameter,
    * not a hard bound — at rsd=5% a single sparse-mode hash collision
    * on an 11-customer nation breached the 5% gate at sf0.001
    * (est 10 vs exact 11, found + fixed in round 13) — so the sketch
    * precision must dominate the asserted bound with margin.
    * Complements q_hll_distinct (the custom oracle-replayable
    * sketch). */
  private[graft] def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(countDistinct(col("o_custkey")).as("exact_customers"),
        approx_count_distinct(col("o_custkey"), 0.01).as("est"))
      .select(col("nation"), col("exact_customers"),
        (abs(col("est") - col("exact_customers")) * 100 <=
          col("exact_customers") * 5).as("within_5pct"))
      .orderBy(col("nation"))
  }

  /** Brown–Forsythe robust variance-equality test (the median-based
    * Levene): per-priority LOWER-median order value selected on the
    * two-pass scalable grouped rank (no per-group sort funnel),
    * absolute deviations stay exact int64 dollars, then the same
    * pivoted fixed-tree ANOVA as q_anova_f runs on the deviations.
    * Gates whether q_anova_f's equal-variance reading is trustworthy. */
  private[graft] def qLeveneBf(s: SparkSession, dir: String): DataFrame = {
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

  /** Chapman capture-recapture estimate of the active-customer
    * universe from two observation windows (1996 and 1997 order
    * activity): N̂ = (n1+1)(n2+1)/(m+1) − 1 — the ecology estimator
    * that data teams reuse to size "how many customers exist that we
    * only ever see a fraction of". One scan, one customer-keyed
    * reduce, pure integer arithmetic. */
  private[graft] def qCaptureRecapture(s: SparkSession, dir: String): DataFrame = {
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

  /** Per-user inter-event-gap profile + bot screen: millisecond gaps
    * from one user-keyed lag window (user_id is high-cardinality, so
    * the window partitions scale out), then exact integer gap moments
    * per user — mean gap, share of gaps under an hour in ppm — and a
    * deterministic bot flag (≥20 gaps, and >20% fast or mean gap
    * under 2h). The abuse/automation screen every event pipeline runs
    * before trusting engagement counts. */
  private[graft] def qBotDetect(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qFellegiSunter(s: SparkSession, dir: String): DataFrame = {
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

  /** Temporal train/test split audit (cutoff 1998-01-01): per nation,
    * order and customer counts on each side plus the STRADDLING
    * customers — the population whose test-period behavior is partly
    * memorized by any model trained on the pre-period (the temporal
    * cousin of q_group_split's row-vs-group leakage audit). One
    * customer-keyed reduce carrying two booleans; straddle share in
    * exact ppm of test-side customers. */
  private[graft] def qTemporalSplit(s: SparkSession, dir: String): DataFrame = {
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

  /** Funnel conversion-window sweep: signup→purchase conversion at
    * 1 h / 6 h / 24 h windows, all from ONE pass — per user the first
    * signup and the earliest subsequent purchase delta, then each
    * window is a threshold count over that tiny per-user table (the
    * sweep discipline of q_filter_sweep/q_dedup_sweep applied to
    * funnel design: pick the attribution window from evidence, not
    * convention). */
  private[graft] def qFunnelWindows(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qFirstTouch(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qPaasche(s: SparkSession, dir: String): DataFrame = {
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

  /** Hill tail-index estimator of the order-value distribution: over
    * the top-201 order statistics (TakeOrdered — a per-partition heap,
    * never a global sort), α̂ = k / Σ ln(xᵢ/x_thr) with each log term
    * rounded to integer micro-nats BEFORE the sum (q_entropy's
    * contract: the rounding absorbs cross-engine ln ulp and makes the
    * reduction order-independent). α̂ ≈ 1 means an extreme heavy tail
    * (top orders dominate revenue); the quantitative companion to
    * q_pareto/q_lorenz_gini. */
  private[graft] def qTailIndex(s: SparkSession, dir: String): DataFrame = {
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

  /** Telemetry double-fire screen: consecutive identical events per
    * user within 5 s (same type, near-same timestamp) are SDK retries /
    * double-sends that silently inflate engagement. One user-keyed lag
    * window (high-cardinality partitions — scalable), exact integer
    * millisecond deltas, per-type dup counts and ppm share. */
  private[graft] def qAdjacentDup(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qJoinCardinality(s: SparkSession, dir: String): DataFrame = {
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

  /** Cluster-randomized ratio-metric test (revenue per order, arms by
    * customer parity): the randomization unit is the CUSTOMER but the
    * metric is a ratio of order-level sums, so naive per-order
    * variance is wrong — the delta method over per-customer cluster
    * totals is the correct standard error (the experimentation-
    * platform workhorse). Six exact integer moments per arm over
    * cluster totals; R, var(R), and z are fixed IEEE trees. */
  private[graft] def qRatioMetric(s: SparkSession, dir: String): DataFrame = {
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

  /** Range-partitioner boundary audit — how a distributed sort picks
    * split points: 7 boundary values from a 2% md5-deterministic
    * sample's nearest-rank octiles (the replayable stand-in for
    * RangePartitioner's reservoir), then the FULL table is bucketed
    * against the broadcast boundaries and each bucket's skew vs the
    * ideal n/8 ships in signed ppm. Large skews mean the sample
    * under-resolved the distribution — the audit behind every
    * repartitionByRange sizing decision. */
  private[graft] def qRangeBoundaries(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qBloomFpp(s: SparkSession, dir: String): DataFrame = {
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

  /** ABC inventory classification (the 80/95 Pareto cut applied as a
    * labeling operator): parts ranked by revenue through the SAME
    * order-preserving key encoding + two-pass prefix sum as q_pareto
    * (no global window funnel), then A = first 80% of cumulative
    * revenue, B = next 15%, C = tail — per-class part counts and
    * exact revenue shares. The planner's view of q_pareto's
    * concentration number. */
  private[graft] def qAbcAnalysis(s: SparkSession, dir: String): DataFrame = {
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

  /** Standardized residuals for q_chi_square's priority × segment
    * grid — WHICH cells drive the dependence, not just whether it
    * exists: r = (o − e)/√e with e the exact rational expected count
    * (row·col/N), every residual one fixed tree over exact integers.
    * |r| > 3 flags the outlier cells a reviewer should read first. */
  private[graft] def qCrosstabResiduals(s: SparkSession, dir: String): DataFrame = {
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

  /** V-optimal 4-bucket histogram of the monthly revenue series by
    * EXHAUSTIVE RELATIONAL ENUMERATION — the dynamic program
    * re-expressed as a join: every boundary triple (b1 < b2 < b3)
    * over the ~84-month domain is a candidate (≈ 90k rows — domain-
    * bounded, data-independent), each segment's SSE comes from the
    * O(1) prefix-sum identity, and the argmin is a TakeOrdered(1).
    * The same enumerate-domain-then-argmin move as q_breakpoint,
    * scaled to three changepoints; SSE stays exact int64 at the
    * month × thousand-dollar grain. */
  private[graft] def qVoptimalHist(s: SparkSession, dir: String): DataFrame = {
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

  /** Linear (even-credit) multi-touch attribution — the third member
    * of the attribution trio (q_attribution last-touch, q_first_touch
    * first-touch): every click strictly before a purchase shares the
    * purchase's value equally. Credit per click = value·1e6 div
    * n_clicks in exact micro (truncating; the dropped remainder is
    * < n_clicks micro per purchase, stated in the contract). The
    * purchase×click pairing is a user-keyed range join — bounded by
    * per-user activity, never a cross product. */
  private[graft] def qMultiTouch(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qShapleyAttribution(s: SparkSession, dir: String): DataFrame = {
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

  /** Weekday revenue bands (P10/P50/P90 of daily revenue per
    * day-of-week): the seasonal-profile chart behind staffing and
    * alert thresholds. Daily values collapse to the day domain first;
    * each weekday's nearest-rank quantiles ride a 7-group bounded
    * rank — never a data-sized window. */
  private[graft] def qQuantileBands(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qPriceDispersion(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qPvmBridge(s: SparkSession, dir: String): DataFrame = {
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

  /** Working-set cache-planning curve: if the k hottest parts were
    * pinned in cache, what share of lineitem accesses would hit?
    * Evaluated at k ∈ {10, 50, 100, 500} from ONE access-frequency
    * ranking (frequency rank via the bounded-domain frequency table,
    * cumulative hits per k by threshold count) — the static-optimal
    * (Belady-style upper bound) sizing curve a storage/cache layer is
    * planned against. Exact ppm. */
  private[graft] def qCachePlanning(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = t(s, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    // round-14 (window audit): only ranks <= 500 (the largest cache
    // size) are ever consumed, so the rank filter is a LITERAL on the
    // raw int row_number — InferWindowGroupLimit plants the
    // WindowGroupLimit[Partial] heap before the exchange and the
    // global sort ships at most 500 survivors per input partition
    // instead of the whole part catalog (the stratifiedTopNBy
    // contract; the cast to long happens after the filter because a
    // cast in the predicate defeats the rule)
    val ranked = freq
      .withColumn("__rnk", row_number().over(
        Window.orderBy(col("c").desc, col("l_partkey"))))
      .filter(col("__rnk") <= 500)
      .withColumn("rnk", col("__rnk").cast("long")).drop("__rnk")
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

  /** Forecast-error metric suite for the weekly-seasonal naive
    * forecast (ŷ_d = y_{d−7}): WAPE, sMAPE, and signed bias — the
    * three numbers a forecast review actually reads (WAPE for
    * magnitude, sMAPE for scale-free comparison, bias for systematic
    * drift), complementing q_mase's model-vs-naive ratio. Day-domain
    * self-join, exact integer error sums; sMAPE's per-day ratio is
    * the one rounded-to-micro term (order-independent integer sum of
    * per-day micro ratios). */
  private[graft] def qForecastEval(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qCustomerBridge(s: SparkSession, dir: String): DataFrame = {
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

  /** Functional-dependency discovery audit — the data-profiling pass
    * that finds which column pairs behave as keys: for each candidate
    * FD (X → Y), the number of X values mapping to more than one Y
    * (violations) and whether the dependency holds exactly. Each
    * candidate is one (X, Y)-distinct collapse + an X-keyed reduce —
    * shuffles carry distinct pairs only. Candidates span held and
    * broken FDs so the detector is proven in both directions. */
  private[graft] def qFdAudit(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qShipSla(s: SparkSession, dir: String): DataFrame = {
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

  /** Greedy set-cover source selection (3 rounds): which three
    * sources together cover the most trigram TYPES — the
    * data-selection question behind "which corpora should the next
    * crawl buy". Scale shape: ONE corpus pass collapses each type to
    * its source-coverage BITMASK, and a second tiny aggregate folds
    * the masks into a histogram with at most 2^k rows (k = size of
    * the source CATALOG — dozens, bounded by the corpus inventory,
    * never by data) — the exact sufficient statistic for set cover.
    * All greedy rounds then run driver-side on the histogram (the
    * bounded-model convention), so adding rounds costs nothing
    * distributed; the old formulation re-anti-joined the full type
    * table per round. Tie-break unchanged: count desc, source asc.
    * Greedy keeps its ≥ 1−1/e guarantee. */
  private[graft] def qSetCover(s: SparkSession, dir: String): DataFrame = {
    val types = trigrams2(s, dir).localCheckpoint(eager = false)
    // the source catalog is a bounded corpus inventory; 62 bits of mask
    val sources = types.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    require(sources.length <= 62,
      s"set-cover mask formulation holds for catalog-sized source lists, got ${sources.length}")
    val bitOf = sources.zipWithIndex.map { case (src, i) => src -> (1L << i) }.toMap
    val maskMap = map(sources.toSeq.flatMap(src => Seq(lit(src), lit(bitOf(src)))): _*)
    // (source, g) is distinct, so SUM of distinct power-of-two bits == OR
    val hist = types
      .select(col("g"), element_at(maskMap, col("source")).as("b"))
      .groupBy(col("g")).agg(sum(col("b")).as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = hist.map(_._2).sum // every type has ≥ 1 source
    var covered = 0L // bitmask of picked sources
    var coveredTypes = 0L
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, Long)]
    var round = 1L
    var done = false
    while (round <= 3L && !done) {
      // new_types(s) = Σ cnt over masks containing s and disjoint from
      // the picked set; a source with zero new types cannot be picked
      // (it had no rows in the old remaining-groupBy formulation)
      val cands = sources
        .filter(src => (covered & bitOf(src)) == 0L)
        .map { src =>
          val bit = bitOf(src)
          val nt = hist.collect {
            case (m, c) if (m & bit) != 0L && (m & covered) == 0L => c
          }.sum
          (src, nt)
        }
        .filter(_._2 > 0L)
      if (cands.isEmpty) done = true
      else {
        val (src, nt) = cands.minBy { case (s0, n0) => (-n0, s0) }
        coveredTypes += nt
        covered |= bitOf(src)
        rows += ((round, src, nt, coveredTypes, coveredTypes * 1000000L / total))
        round += 1L
      }
    }
    import s.implicits._
    rows.toSeq
      .toDF("round", "source", "new_types", "covered_types", "coverage_ppm")
      .orderBy(col("round"))
  }

  /** Segmented trend: OLS slopes before/after the revenue series'
    * exact-SSE changepoint (q_breakpoint's argmin, recomputed here so
    * the query is self-contained), each side's slope from five exact
    * integer moments (q_regression's fixed-tree form) — "the trend
    * changed on day D, from a to b per day". The slope-change column
    * is the story; everything windows over the bounded day domain. */
  private[graft] def qSegmentedTrend(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qColdStartItems(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qPriceElasticity(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def qBorda(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // round-13 re-shape (guide §2.3): a countDistinct mixed with plain
    // sums plans as an Expand that doubles the rows into the first
    // aggregate; the manual two-level form — pre-aggregate by
    // (brand, order), then count groups — shuffles each (brand, order)
    // pair once with map-side partials and no Expand. Sums of sums are
    // exact-integer associative, so the result is unchanged.
    val m = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_orderkey"))
      .agg(sum(Analytics.cents(col("l_extendedprice"))).as("rev"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .groupBy(col("p_brand"))
      .agg(sum(col("rev")).as("rev"), sum(col("qty")).as("qty"),
        count(lit(1)).as("ords"))
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

  private[graft] def warehouse2QueryMap: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> (qProfile _),
    "q_retention" -> (qRetention _),
    "q_table_checksum" -> (qTableChecksum _),
    "q_hist_quantile" -> (qHistQuantile _),
    "q_islands" -> (qIslands _),
    "q_market_share" -> (qMarketShare _),
    "q_hll_intersect" -> (qHllIntersect _),
    "q_ivm" -> (qIvm _),
    "q_er_match" -> (qErMatch _),
    "q_interpolate" -> (qInterpolate _),
    "q_fk_orphans" -> (qFkOrphans _),
    "q_merge_upsert" -> (qMergeUpsert _),
    "q_transitions" -> (qTransitions _),
    "q_data_skew" -> (qDataSkew _),
    "q_itemsets" -> (qItemsets _),
    "q_pareto" -> (qPareto _),
    "q_feature_prep" -> (qFeaturePrep _),
    "q_lorenz_gini" -> (qLorenzGini _),
    "q_ppr" -> (qPpr _),
    "q_asof_tolerance" -> (qAsofTolerance _),
    "q_null_audit" -> (qNullAudit _),
    "q_decay_score" -> (qDecayScore _),
    "q_decision_stump" -> (qDecisionStump _),
    "q_shuffle_hash_join" -> (qShuffleHashJoin _),
    "q_partition_prune" -> (qPartitionPrune _),
    "q_dpp" -> (qDpp _),
    "q_merge_schema" -> (qMergeSchema _),
    "q_union_by_name" -> (qUnionByName _),
    "q_peak_concurrency" -> (qPeakConcurrency _),
    "q_open_aging" -> (qOpenAging _),
    "q_ohlc_bars" -> (qOhlcBars _),
    "q_did" -> (qDid _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_assoc_rules" -> (qAssocRules _),
    "q_abandonment" -> (qAbandonment _),
    "q_decimal_agg" -> (qDecimalAgg _),
    "q_event_pattern" -> (qEventPattern _),
    "q_jaro_match" -> (qJaroMatch _),
    "q_perm_test" -> (qPermTest _),
    "q_cem" -> (qCem _),
    "q_haar" -> (qHaar _),
    "q_weighted_reservoir" -> (qWeightedReservoir _),
    "q_noise_inject" -> (qNoiseInject _),
    "q_url_parse" -> (qUrlParse _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_levene_bf" -> (qLeveneBf _),
    "q_capture_recapture" -> (qCaptureRecapture _),
    "q_bot_detect" -> (qBotDetect _),
    "q_fellegi_sunter" -> (qFellegiSunter _),
    "q_temporal_split" -> (qTemporalSplit _),
    "q_funnel_windows" -> (qFunnelWindows _),
    "q_first_touch" -> (qFirstTouch _),
    "q_paasche" -> (qPaasche _),
    "q_tail_index" -> (qTailIndex _),
    "q_adjacent_dup" -> (qAdjacentDup _),
    "q_join_cardinality" -> (qJoinCardinality _),
    "q_ratio_metric" -> (qRatioMetric _),
    "q_range_boundaries" -> (qRangeBoundaries _),
    "q_bloom_fpp" -> (qBloomFpp _),
    "q_abc_analysis" -> (qAbcAnalysis _),
    "q_crosstab_residuals" -> (qCrosstabResiduals _),
    "q_voptimal_hist" -> (qVoptimalHist _),
    "q_multi_touch" -> (qMultiTouch _),
    "q_shapley_attribution" -> (qShapleyAttribution _),
    "q_quantile_bands" -> (qQuantileBands _),
    "q_price_dispersion" -> (qPriceDispersion _),
    "q_pvm_bridge" -> (qPvmBridge _),
    "q_cache_planning" -> (qCachePlanning _),
    "q_forecast_eval" -> (qForecastEval _),
    "q_customer_bridge" -> (qCustomerBridge _),
    "q_fd_audit" -> (qFdAudit _),
    "q_ship_sla" -> (qShipSla _),
    "q_set_cover" -> (qSetCover _),
    "q_segmented_trend" -> (qSegmentedTrend _),
    "q_cold_start_items" -> (qColdStartItems _),
    "q_price_elasticity" -> (qPriceElasticity _),
    "q_borda" -> (qBorda _),
  )

  private[graft] def warehouse2OracleMap: Map[String, String] = Map(
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
    // rank threshold,
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
    // per-register max over BOTH regions' rows,
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
    // proves the incrementally-maintained view equals the rescan,
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
    // the window row_number formulation,
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
    // same string spark.sql ran,
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
    // unique composite time key,
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
    "q_shuffle_hash_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_partition_prune" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  CAST(min(o_orderkey) AS BIGINT) AS first_key
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_dpp" ->
      """WITH monthly AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS o_month,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS ship_cents
        |  FROM lineitem GROUP BY 1),
        |hot AS (
        |  SELECT o_month, ship_cents FROM (
        |    SELECT o_month, ship_cents,
        |      CAST(sum(ship_cents) OVER () AS BIGINT)
        |        // CAST(count(*) OVER () AS BIGINT) AS avg_cents
        |    FROM monthly)
        |  WHERE ship_cents > avg_cents),
        |f AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders)
        |SELECT h.o_month, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(f.c) AS BIGINT) AS order_cents, h.ship_cents
        |FROM f JOIN hot h USING (o_month)
        |GROUP BY h.o_month, h.ship_cents
        |ORDER BY h.o_month""".stripMargin,
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
    // the source values (same contract as q_json_roundtrip),
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
    // independent decomposition pinning parse_url's semantics,
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
    // oracle asserts the advertised error bound held,
    "q_approx_distinct" ->
      """SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
        |  TRUE AS within_5pct
        |FROM orders JOIN customer c ON o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
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
  )
}
