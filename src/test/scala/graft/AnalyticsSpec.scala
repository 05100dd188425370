package graft

import org.apache.spark.sql.functions._

import graft.ops.Analytics

/** Unit semantics for the round-3 analytics operators: SCD2 compaction
  * and salted-join equivalence (the plan-level pins live in
  * PlanAuditSpec; these check the answers). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("scd2 compacts runs and closes versions with the successor start") {
    // entity 1: A(d1) A(d3) B(d5) B(d6) A(d9) -> A[1,4] B[5,8] A[9,open]
    // entity 2: single row -> one open version
    val df = Seq(
      (1L, 1L, 10L, "A"), (1L, 3L, 11L, "A"), (1L, 5L, 12L, "B"),
      (1L, 6L, 13L, "B"), (1L, 9L, 14L, "A"),
      (2L, 4L, 15L, "C"))
      .toDF("ent", "day", "tie", "attr")
    val got = Analytics.scd2(df, "ent", "day", "tie", "attr")
      .orderBy($"ent", $"version")
      .select($"ent", $"version", $"attr", $"valid_from", $"valid_to_raw")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(got === Array(
      (1L, 1L, "A", 1L, 4L),
      (1L, 2L, "B", 5L, 8L),
      (1L, 3L, "A", 9L, -1L),
      (2L, 1L, "C", 4L, -1L)))
  }

  test("scd2 same-day changes collapse to the end-of-day value (no inverted ranges)") {
    // X then Y on day 2 -> the daily-grain dimension records only Y;
    // emitting both would close X with valid_to = 1 < valid_from = 2
    val df = Seq((1L, 2L, 1L, "X"), (1L, 2L, 2L, "Y"), (1L, 5L, 3L, "Z"))
      .toDF("ent", "day", "tie", "attr")
    val got = Analytics.scd2(df, "ent", "day", "tie", "attr")
      .orderBy($"version")
      .select($"attr", $"valid_from", $"valid_to_raw").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got === Array(("Y", 2L, 4L), ("Z", 5L, -1L)))
  }

  test("scd2 invariant on real data: every closed version has valid_from <= valid_to") {
    val base = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_custkey", $"o_orderkey", $"o_orderpriority",
        datediff($"o_orderdate", lit("1995-01-01").cast("date")).cast("long").as("day"))
    val bad = Analytics.scd2(base, "o_custkey", "day", "o_orderkey", "o_orderpriority")
      .filter($"valid_to_raw".isNotNull && $"valid_to_raw" < $"valid_from")
    assert(bad.count() === 0)
  }

  test("salted join result equals the plain join under aggregation") {
    val left = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0), (3L, 7.0))
      .toDF("k", "v")
    val right = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "g")
    val salted = Analytics.saltedJoin(left, right, Seq("k"), salts = 3)
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy($"g").collect()
    val plain = left.join(right, "k")
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy($"g").collect()
    assert(salted === plain)
  }

  test("q_regression r2 stays in [0,1] and groups are non-empty") {
    val rows = SparkEntry.queries("q_regression")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r2 = r.getDouble(4)
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
      assert(r.getLong(1) > 0)
    }
  }

  test("itemset rules satisfy support/confidence consistency") {
    val rows = SparkEntry.queries("q_itemsets")(spark, "/root/testdata/sf0.001")
      .collect()
    rows.foreach { r =>
      val (supp, s1, s2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (c12, c21) = (r.getLong(5), r.getLong(6))
      assert(supp <= s1 && supp <= s2, "pair support exceeds item support")
      assert(c12 == supp * 1000000 / s1 && c21 == supp * 1000000 / s2)
      assert(c12 <= 1000000 && c21 <= 1000000)
    }
  }

  test("token budget allocation caps rates at 1 and flags undersupply") {
    val rows = SparkEntry.queries("q_token_budget")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tokens, target, rate, expected, under) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))
      assert(rate <= 1000000L, "no upsampling")
      assert(expected <= tokens, "cannot sample more than the source has")
      if (under) assert(rate === 1000000L && tokens < target,
        "undersupplied sources must be taken whole")
      else assert(expected <= target, "oversupplied sources must not exceed target")
    }
  }

  test("EMA equals the serial recurrence on a dense planted series") {
    // days 0..30, cents = day+1; serial half-life recurrence truncated
    // to the 20-day horizon must match the cover-day-explode form
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ema").toString
    val days = (0 to 30).map(d => (d.toLong, (d + 1) * 100L))
    days.toDF("day", "cents")
      .select(expr("CAST(timestamp_millis(day * 86400000) AS TIMESTAMP)").as("o_orderdate"),
        ($"cents" / 100.0).as("o_totalprice"),
        monotonically_increasing_id().as("o_orderkey"),
        lit(1L).as("o_custkey"), lit("O").as("o_orderstatus"),
        lit("x").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q_ema")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val cents = days.toMap
    for (t <- 0L to 30L) {
      val expect = (math.max(0L, t - 19) to t)
        .map(d => cents(d).toDouble * math.pow(0.5, (t - d).toDouble)).sum
      assert(math.abs(got(t) - expect) < 1e-6, s"day $t: ${got(t)} vs $expect")
    }
  }
}
