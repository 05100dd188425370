package graft

import org.apache.spark.sql.functions._

import graft.plans.Asof

/** The native as-of join: custom logical node + planner strategy +
  * physical merge operator (the whole-operator extension tier). */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes (key, time, payload) and trades (key, time) with controlled
  // overlap; times made unique per key so expectations are unambiguous
  private def quotes = Seq(
    ("A", 10L, "a10"), ("A", 20L, "a20"), ("A", 30L, "a30"),
    ("B", 15L, "b15"), ("C", 99L, "c99")
  ).toDF("q_sym", "q_ts", "q_px")

  private def trades = Seq(
    ("A", 5L), ("A", 10L), ("A", 25L), ("A", 99L),
    ("B", 14L), ("B", 15L), ("D", 50L)
  ).toDF("t_sym", "t_ts")

  private def run(inclusive: Boolean): Map[(String, Long), String] =
    Asof.join(trades, quotes, Seq("t_sym"), Seq("q_sym"), "t_ts", "q_ts",
        Seq("q_px"), inclusive)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getString(2)))
      .toMap

  test("inclusive as-of takes the greatest quote time <= trade time") {
    val m = run(inclusive = true)
    assert(m(("A", 5L)) === null)     // before any quote
    assert(m(("A", 10L)) === "a10")   // equality matches
    assert(m(("A", 25L)) === "a20")
    assert(m(("A", 99L)) === "a30")
    assert(m(("B", 14L)) === null)
    assert(m(("B", 15L)) === "b15")
    assert(m(("D", 50L)) === null)    // key with no quotes at all
  }

  test("strict as-of excludes the equal timestamp") {
    val m = run(inclusive = false)
    assert(m(("A", 10L)) === null)    // a10 no longer eligible
    assert(m(("A", 25L)) === "a20")
    assert(m(("B", 15L)) === null)
  }

  test("physical plan uses AsofJoinExec (not a window or cartesian)") {
    val df = Asof.join(trades, quotes, Seq("t_sym"), Seq("q_sym"),
      "t_ts", "q_ts", Seq("q_px"), inclusive = true)
    // the exec node renders without its Exec suffix; AQE hides the
    // inner plan from tree traversal, so assert on the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("matches a brute-force reference on random data, any partitioning") {
    val n = 500
    val left = spark.range(n).select(
      (col("id") % 17).as("k"),
      ((col("id") * 37) % 1000).as("lt"))
    val right = spark.range(300).select(
      (col("id") % 13).as("rk"),
      ((col("id") * 53) % 997).as("rt"),
      concat(lit("p"), col("id")).as("pay"))
    val got = Asof.join(
        left.repartition(7), right.repartition(3),
        Seq("k"), Seq("rk"), "lt", "rt", Seq("pay"), inclusive = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(t => (t._1, t._2))
    val rrows = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected = left.collect()
      .map { lr =>
        val (k, lt) = (lr.getLong(0), lr.getLong(1))
        val cands = rrows.filter(t => t._1 == k && t._2 <= lt)
        val pay = if (cands.isEmpty) null
          else cands.maxBy(_._2)._3
        (k, lt, pay)
      }
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === expected.toSeq)
  }

  test("self as-of (fresh right attribute ids) finds the previous row") {
    val o = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L), (4L, "B", 7L))
      .toDF("pk", "k", "ts")
    val prev = Asof.join(o, o.select(col("k").as("rk"), col("ts").as("rts"),
        col("pk").as("prev_pk")),
        Seq("k"), Seq("rk"), "ts", "rts", Seq("prev_pk"), inclusive = false)
      .select(col("pk"), col("prev_pk"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(prev === Map(1L -> -1L, 2L -> 1L, 3L -> 2L, 4L -> -1L))
  }

  test("un-renamed self as-of (identical plans, colliding names) stays correct") {
    // the hostile case for attribute deduplication: right is literally
    // the same plan, and the payload NAME collides with a left column —
    // the internal re-aliasing must survive the optimizer (a stripped
    // alias would silently bind the payload to the left side's column)
    val o = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L))
      .toDF("pk", "k", "ts")
    val got = Asof.join(o, o, Seq("k"), Seq("k"), "ts", "ts",
        Seq("pk"), inclusive = false)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(got === Map(1L -> -1L, 2L -> 1L, 3L -> 2L))
  }

  test("left-side filters push through the as-of join to the parquet scan") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val right = orders.select(col("o_custkey").as("rk"),
      col("o_orderkey").as("rt"), col("o_totalprice").as("prev_price"))
    val joined = Asof.join(orders, right, Seq("o_custkey"), Seq("rk"),
      "o_orderkey", "rt", Seq("prev_price"), inclusive = false)
    // filter applied ABOVE the join, on left columns only
    val filtered = joined.filter(col("o_totalprice") > 50000.0)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), " +
      "GreaterThan(o_totalprice,50000.0)]"), plan)
    // and the payload-referencing conjunct must NOT push
    val mixed = joined.filter(col("o_totalprice") > 50000.0 &&
      col("prev_price") < 90000.0)
    val semantics = mixed.collect()
    val reference = joined.collect().filter(r =>
      r.getDouble(2) > 50000.0 && !r.isNullAt(3) && r.getDouble(3) < 90000.0)
    assert(semantics.length === reference.length)
  }

  test("chained as-of joins on the same key reuse the left partitioning") {
    // outputPartitioning = left.outputPartitioning, so a second as-of
    // keyed the same way must NOT re-exchange the already-clustered
    // left stream: 3 exchanges total (left once, each right once)
    val left = spark.range(1000).select(($"id" % 7).as("k"), $"id".as("lt"))
    val r1 = spark.range(300).select(($"id" % 7).as("rk"),
      ($"id" * 3 % 997).as("rt"), $"id".as("p1"))
    val r2 = spark.range(300).select(($"id" % 7).as("rk2"),
      ($"id" * 5 % 991).as("rt2"), $"id".as("p2"))
    val once = Asof.join(left, r1, Seq("k"), Seq("rk"), "lt", "rt", Seq("p1"))
    val twice = Asof.join(once, r2, Seq("k"), Seq("rk2"), "lt", "rt2", Seq("p2"))
    val plan = twice.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 3, s"expected 3 exchanges, got $exchanges:\n$plan")
    assert(twice.count() === 1000L)
  }

  test("null keys and null times never match (SQL null semantics)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("sym", StringType, nullable = true),
      StructField("ts", LongType, nullable = true)))
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(null, 10L),       // null key: must stay unmatched
        Row("A", null),       // null time: must stay unmatched
        Row("A", 10L))),      // control: matches normally
      schema)
    val rschema = StructType(Seq(StructField("q_sym", StringType, nullable = true),
      StructField("q_ts", LongType, nullable = true),
      StructField("q_px", StringType, nullable = true)))
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(null, 1L, "NULLKEY"),  // a null-keyed quote must match nothing
        Row("A", null, "NULLTS"),  // a null-time quote is never a candidate
        Row("A", 5L, "a5"))),
      rschema)
    val got = Asof.join(l, r, Seq("sym"), Seq("q_sym"), "ts", "q_ts",
        Seq("q_px"), inclusive = true)
      .collect().map(row => (Option(row.getString(0)).getOrElse("<null>"),
        if (row.isNullAt(1)) -1L else row.getLong(1),
        if (row.isNullAt(2)) null else row.getString(2))).toSet
    assert(got === Set(
      ("<null>", 10L, null), // null left key: unmatched, NOT paired with NULLKEY
      ("A", -1L, null),      // null left time: unmatched
      ("A", 10L, "a5")))     // the valid row still matches the valid quote
  }

  test("empty right side yields all-null payloads") {
    val got = Asof.join(trades, quotes.filter(lit(false)),
        Seq("t_sym"), Seq("q_sym"), "t_ts", "q_ts", Seq("q_px"))
      .collect()
    assert(got.length === 7)
    assert(got.forall(_.isNullAt(2)))
  }
}
