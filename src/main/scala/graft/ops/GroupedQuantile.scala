package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed weighted quantiles per group — histogram
  * drill-down, the classic two-phase exact-quantile scan re-expressed
  * on DataFrames:
  *
  *   1. weights collapse onto the (group, value) VALUE DOMAIN
  *      (one map-side-combined aggregate; distinct values, not rows),
  *      checkpointed once so both phases read it without recomputing
  *      upstream lineage;
  *   2. a coarse value-bucket histogram is a second map-side-combined
  *      aggregate whose size is bounded by the VALUE DOMAIN over the
  *      bucket width (groups × valueRange/bucketWidth), never by data
  *      volume — bounded model state, so the per-group cumulative over
  *      buckets and the quantile-bucket picks run driver-side;
  *   3. one narrow filtered pass reads ONLY the picked buckets
  *      (≤ bucketWidth distinct values per group×quantile — bounded by
  *      the bucket width) and selects the first value whose running
  *      weight reaches the quantile: integer cross-multiply
  *      `den·cum_w >= num·total` (the lower-quantile convention;
  *      num/den = 1/2 is the weighted median).
  *
  * Contrast with the two formulations it replaces: a per-group window
  * over the full domain caps parallelism at |groups| tasks and buffers
  * a group's whole value domain in one of them; a global
  * range-partitioned prefix scan (ScalablePrefix) is work-optimal but
  * pays a full-domain range shuffle and three evaluations. Here no
  * data-proportional state is ever windowed, shuffled by range, or
  * collected: the histogram is domain-bounded and the in-bucket window
  * is bucket-bounded. All arithmetic is exact int64, so results are
  * bit-identical to the window formulation (GroupedQuantileSpec) and
  * engine-portable (the DuckDB oracles replay the same integers).
  */
object GroupedQuantile {

  /** Exact weighted quantiles of `valueCol` (long) weighted by
    * `weightCol` (long, non-negative) per `groupCol` (long).
    *
    * `quantiles`: (num, den) pairs with 0 < num <= den; each selects
    * the first value whose inclusive cumulative weight `cum` satisfies
    * `den·cum >= num·total` in ascending value order.
    *
    * Returns (groupCol, pct, value, total_weight) — one row per
    * group × quantile, `pct` = 100·num/den as an integer label
    * (callers pick num/den so pct is exact, e.g. quartiles).
    *
    * `bucketWidth` trades histogram size (valueRange/bucketWidth rows
    * per group to the driver) against drill-down bucket size
    * (bucketWidth distinct values per group×quantile through the final
    * window); both bounds are properties of the VALUE DOMAIN, not the
    * data volume. Signed-domain caveat: `div` truncates toward zero,
    * so bucket 0 spans (−bucketWidth, bucketWidth) — up to
    * 2·bucketWidth−1 distinct values. Results stay correct (truncating
    * division is still monotone in v), but size the width for the 2×
    * bucket when values straddle zero. */
  def weightedQuantiles(spark: SparkSession, df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String, quantiles: Seq[(Long, Long)],
      bucketWidth: Long = 8192L, maxHistRows: Long = 2000000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxHistRows > 0, "maxHistRows must be positive")
    require(quantiles.nonEmpty && quantiles.forall { case (n, d) => n > 0 && n <= d },
      "quantiles must satisfy 0 < num <= den")
    // duplicate RATIOS would join each wp row into the same window
    // partition twice (cum_w double-counts — silently wrong), and
    // distinct ratios sharing a pct LABEL would be merged by the final
    // groupBy(g, pct) (silently fewer rows) — both rejected up front
    locally {
      @annotation.tailrec def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
      val norm = quantiles.map { case (n, d) => val g = gcd(n, d); (n / g, d / g) }
      require(norm.distinct.size == norm.size,
        s"duplicate quantile ratios: $quantiles")
      val pcts = quantiles.map { case (n, d) => 100L * n / d }
      require(pcts.distinct.size == pcts.size,
        s"quantiles must map to distinct pct labels, got $pcts for $quantiles")
    }
    import spark.implicits._
    val wp = df
      .select(col(groupCol).cast("long").as("g"),
        col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w"))
      .groupBy(col("g"), col("v")).agg(sum(col("w")).as("w"))
      .localCheckpoint(eager = false)
    val histDf = wp.groupBy(col("g"), expr(s"v div $bucketWidth").as("b"))
      .agg(sum(col("w")).as("bw"), min(col("w")).as("mw"))
    // the driver-side state is bounded by groups × valueRange/bucketWidth
    // — a property of the VALUE DOMAIN, but one the caller controls via
    // bucketWidth. A width far too small for the domain (e.g. 1 over an
    // int64 range) would collect the full (group, bucket) domain and OOM
    // the driver, so the size is checked distributed-side BEFORE the
    // bulk of it reaches the driver (same fail-loudly convention as the
    // HeavyHitters certification). Round-14 (guide §1.1/§2.4): the
    // guard count() + checkpointed re-read collect() pair is fused into
    // ONE job — each output task of the SAME collect throws past
    // maxHistRows rows (a histogram over the cap certainly has an
    // over-cap task or an over-cap total, checked driver-side below),
    // so the worst-case driver exposure is shufflePartitions ×
    // maxHistRows only in the near-boundary case, and the scheduling
    // round-trip plus the checkpoint materialization are gone. The
    // per-row closure runs on the domain-BOUNDED histogram, never on
    // data-proportional rows.
    val maxHist = maxHistRows
    val bw = bucketWidth
    import spark.implicits._
    val capped = histDf.as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var n = 0L
        it.map { r =>
          n += 1
          if (n > maxHist) throw new IllegalStateException(
            s"weightedQuantiles histogram partition exceeds maxHistRows = " +
              s"$maxHist (group, bucket) rows — raise bucketWidth (= $bw) " +
              s"for this value domain, or raise maxHistRows if the driver " +
              s"can hold it")
          r
        }
      }
    val hist =
      try capped.collect()
      catch { case e: Throwable =>
        // surface the distributed-side guard as the documented
        // IllegalStateException, not Spark's task-failure wrapper
        var c: Throwable = e
        while (c != null && !c.isInstanceOf[IllegalStateException]) c = c.getCause
        throw (if (c != null) c else e)
      }
    if (hist.length > maxHistRows)
      throw new IllegalStateException(
        s"weightedQuantiles histogram has ${hist.length} (group, bucket) rows " +
          s"> maxHistRows = $maxHistRows — raise bucketWidth (= $bucketWidth) " +
          s"for this value domain, or raise maxHistRows if the driver can hold it")
    // the correctness precondition is that every COLLAPSED (group,
    // value) weight is non-negative — that is exactly what keeps the
    // cumulative weight monotone, in buckets and in the drill-down
    // window alike. min(w) rides along in the same aggregation, so the
    // check is free and complete (a net-positive bucket hiding a
    // negative value would otherwise mis-pick silently)
    hist.find(_._4 < 0).foreach { case (g, b, _, mw) =>
      throw new IllegalArgumentException(
        s"weightedQuantiles requires non-negative weights: group $g bucket $b " +
          s"holds a value with collapsed weight $mw")
    }
    // driver: per group, ascending-bucket cumulative → for each
    // quantile the bucket holding it, the weight strictly below that
    // bucket, and the group total
    val maxDen = quantiles.map(_._2).max
    val sel = hist.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val byB = rows.sortBy(_._2)
      val total = byB.map(_._3).sum
      // the integer cross-multiplies below (den·cum vs num·total, both
      // driver-side and in the Column filter) must not wrap int64 —
      // wrapped comparisons would mis-pick SILENTLY under non-ANSI
      // Spark semantics. Checked here where the totals are in hand.
      require(total >= 0 && total <= Long.MaxValue / maxDen,
        s"weightedQuantiles: group $g total weight $total overflows " +
          s"the den=$maxDen cross-multiply — rescale the weights")
      val cums = byB.scanLeft(0L)(_ + _._3).tail // inclusive through each bucket
      quantiles.map { case (num, den) =>
        val i = cums.indexWhere(c => den * c >= num * total)
        val (_, b, _, _) = byB(i)
        val before = if (i == 0) 0L else cums(i - 1)
        (g, num, den, 100L * num / den, b, before, total)
      }
    }.toDF("g", "num", "den", "pct", "b_q", "w_before", "total")
    wp.join(broadcast(sel), "g")
      .filter(expr(s"v div $bucketWidth") === col("b_q"))
      .withColumn("cum_w",
        sum(col("w")).over(
          Window.partitionBy(col("g"), col("num"), col("den")).orderBy(col("v")))
          + col("w_before"))
      .filter(col("cum_w") * col("den") >= col("num") * col("total"))
      .groupBy(col("g"), col("pct"))
      .agg(min(col("v")).as("value"), max(col("total")).as("total_weight"))
      .select(col("g").as(groupCol), col("pct"), col("value"), col("total_weight"))
  }
}
