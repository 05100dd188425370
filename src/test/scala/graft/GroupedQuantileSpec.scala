package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GroupedQuantile

/** GroupedQuantile.weightedQuantiles (histogram drill-down) must be
  * row-for-row identical to the reference window formulation — the
  * per-group cumulative-weight scan — for every quantile, including
  * the edges the bucketing could get wrong: values ON bucket
  * boundaries, quantiles that hit a cumulative total exactly
  * (den·cum == num·total), whole groups inside one bucket, and
  * num == den (the weighted max). Tiny bucket widths force the
  * drill-down across many buckets so the bucket arithmetic is
  * actually exercised. */
class GroupedQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val quartiles = Seq((1L, 4L), (1L, 2L), (3L, 4L), (1L, 1L))

  /** Reference: window cumulative scan, same lower-quantile convention. */
  private def windowed(df: DataFrame, qs: Seq[(Long, Long)]): Set[(Long, Long, Long, Long)] = {
    val c = df.groupBy(col("g"), col("v")).agg(sum(col("w")).as("w"))
      .withColumn("cw", sum(col("w")).over(Window.partitionBy(col("g")).orderBy(col("v"))))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(col("g"))))
    qs.map { case (num, den) =>
      c.filter(col("cw") * den >= col("tw") * num)
        .groupBy(col("g"))
        .agg(min(col("v")).as("value"), max(col("tw")).as("total_weight"))
        .select(col("g"), lit(100L * num / den).as("pct"), col("value"),
          col("total_weight"))
    }.reduce(_ unionAll _)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  private def drilled(df: DataFrame, qs: Seq[(Long, Long)], bkt: Long): Set[(Long, Long, Long, Long)] =
    GroupedQuantile.weightedQuantiles(spark, df, "g", "v", "w", qs, bkt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("matches the window formulation on random grouped data, tiny buckets") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 3000).map { _ =>
      (rnd.nextInt(7).toLong, rnd.nextInt(500).toLong, (rnd.nextInt(9) + 1).toLong)
    }
    val df = rows.toDF("g", "v", "w")
    for (bkt <- Seq(1L, 7L, 64L, 100000L))
      assert(drilled(df, quartiles, bkt) === windowed(df, quartiles),
        s"bucketWidth=$bkt")
  }

  test("values exactly on bucket boundaries") {
    val df = Seq(
      (0L, 0L, 5L), (0L, 64L, 5L), (0L, 128L, 5L), (0L, 192L, 5L),
      (1L, 63L, 1L), (1L, 64L, 1L), (1L, 65L, 1L))
      .toDF("g", "v", "w")
    assert(drilled(df, quartiles, 64L) === windowed(df, quartiles))
  }

  test("quantile hits a cumulative total exactly (den*cum == num*total)") {
    // g=0: w = 1,1,1,1 → total 4; p25 hits cum=1 exactly, p50 cum=2, p75 cum=3
    val df = Seq((0L, 10L, 1L), (0L, 20L, 1L), (0L, 30L, 1L), (0L, 40L, 1L))
      .toDF("g", "v", "w")
    assert(drilled(df, quartiles, 16L) === windowed(df, quartiles))
    // the exact-hit rows themselves: p25=10 (1·4 >= 1·4), p50=20, p75=30, max=40
    assert(drilled(df, quartiles, 16L) ===
      Set((0L, 25L, 10L, 4L), (0L, 50L, 20L, 4L), (0L, 75L, 30L, 4L), (0L, 100L, 40L, 4L)))
  }

  test("degenerate groups: single value, single row, duplicate values collapse") {
    val df = Seq(
      (0L, 5L, 100L),              // all weight on one value
      (1L, 77L, 3L),               // single row
      (2L, 9L, 2L), (2L, 9L, 4L),  // duplicates collapse before scanning
      (2L, 11L, 6L))
      .toDF("g", "v", "w")
    assert(drilled(df, quartiles, 4L) === windowed(df, quartiles))
  }

  test("negative weights fail loudly even when the bucket nets positive") {
    // bucket [4,8) sums to 5-3+2 = 4 >= 0, but v=5 carries -3: a
    // net-only check would pass and the in-bucket cumulative would be
    // non-monotone — the guard must catch the per-value negative
    val df = Seq((0L, 4L, 5L), (0L, 5L, -3L), (0L, 6L, 2L), (0L, 900L, 4L))
      .toDF("g", "v", "w")
    val e = intercept[IllegalArgumentException] {
      GroupedQuantile.weightedQuantiles(spark, df, "g", "v", "w", Seq((1L, 2L)), 4L)
        .collect()
    }
    assert(e.getMessage.contains("non-negative"))
  }

  test("skewed weights: one value holds the majority across buckets") {
    val rnd = new scala.util.Random(7)
    val bulk = (1 to 500).map(_ => (0L, rnd.nextInt(1000).toLong, 1L))
    val df = (bulk :+ ((0L, 501L, 100000L))).toDF("g", "v", "w")
    assert(drilled(df, quartiles, 32L) === windowed(df, quartiles))
  }

  test("a histogram past maxHistRows fails loudly BEFORE collecting " +
    "(driver-OOM guard for a too-small bucketWidth)") {
    // 400 distinct values at bucketWidth 1 = 400 (group, bucket) rows;
    // cap at 100 -> the distributed count trips the guard and nothing
    // is collected (the HeavyHitters fail-loudly convention)
    val df = (1 to 400).map(i => (0L, i.toLong, 1L)).toDF("g", "v", "w")
    val e = intercept[IllegalStateException] {
      GroupedQuantile.weightedQuantiles(spark, df, "g", "v", "w",
        Seq((1L, 2L)), bucketWidth = 1L, maxHistRows = 100L).collect()
    }
    assert(e.getMessage.contains("raise bucketWidth"))
    // the same data passes with an adequate width — and still matches
    // the window formulation
    assert(drilled(df, Seq((1L, 2L)), 64L) === windowed(df, Seq((1L, 2L))))
  }
}
