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
}
