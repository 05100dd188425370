package graft

/** Every driver-contract query runs on sf0.001 without error; the
  * flagship returns rows (the driver's smoke check). Oracle-level value
  * verification runs at sf0.01 via graft.Verify + DuckDB (driver gate). */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registerTables exposes the dataset to spark.sql") {
    SparkEntry.registerTables(spark, sf)
    val n = spark.sql(
      "SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey")
      .head().getLong(0)
    assert(n > 0)
  }

  test("registerTables exposes events (nanos timestamps) to spark.sql") {
    SparkEntry.registerTables(spark, sf)
    val n = spark.sql("SELECT count(*) FROM events WHERE ts > 0").head().getLong(0)
    assert(n > 0)
  }

  test("documents doc_ids are dense (q_edit_distance successor join contract)") {
    // qEditDistance replaces the global-window lead() with an equi-join on
    // doc_id+1; that is only equivalent to the oracle's lead() form when
    // doc_ids are 0..n-1 with no gaps. Pin the assumption here so a
    // regenerated dataset that breaks it fails loudly, not as a hash skew.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val row = spark.read.parquet(s"$d/documents.parquet")
        .selectExpr("max(doc_id) AS mx", "min(doc_id) AS mn", "count(*) AS n")
        .head()
      assert(row.getLong(2) > 0, s"$d has no documents")
      assert(row.getLong(1) == 0L && row.getLong(0) == row.getLong(2) - 1,
        s"$d doc_ids not dense: min=${row.getLong(1)} max=${row.getLong(0)} n=${row.getLong(2)}")
    }
  }

  test("click (user_id, ts) pairs are unique (q_features_asof contract)") {
    // qFeaturesAsof's running-count as-of equals the correlated-COUNT
    // oracle only when no user has two clicks at the same timestamp
    // (ties would make the as-of candidate order-dependent). Pin it.
    import org.apache.spark.sql.functions._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      SparkEntry.registerTables(spark, d)
      val dups = spark.table("events")
        .filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts")).count()
        .filter(col("count") > 1).count()
      assert(dups === 0L, s"$d has duplicate (user, ts) click pairs")
    }
  }

  test("skyline frontier is exactly the undominated size groups") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_skyline")(spark, sf).collect()
    // frontier prices must strictly decrease as size increases
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => b < a },
      s"frontier not strictly decreasing: ${prices.mkString(",")}")
    // every non-frontier size group must be dominated by some strictly
    // smaller frontier size with price <= its best price
    val all = spark.read.parquet(s"$sf/part.parquet")
      .groupBy(col("p_size"))
      .agg(min(expr("CAST(floor(p_retailprice*100+0.5) AS BIGINT)")).as("c"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1)))
    val frontier = rows.map(r => (r.getLong(0), math.round(r.getDouble(1) * 100))).toMap
    all.filterNot { case (sz, _) => frontier.contains(sz) }.foreach { case (sz, c) =>
      assert(frontier.exists { case (fs, fc) => fs < sz && fc <= c },
        s"size $sz (best $c) is on neither side: not in frontier, not dominated")
    }
    // qSkyline's (cents, partkey) pair encoding requires partkey < 1e8
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val mx = spark.read.parquet(s"$d/part.parquet")
        .selectExpr("max(p_partkey)").head().getLong(0)
      assert(mx < 100000000L, s"$d p_partkey $mx exceeds the skyline encoding stride")
    }
  }

  test("epoch mix allocations sum exactly to the 1-billion-token budget") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_epoch_mix")(spark, sf)
      .agg(sum(col("alloc_tokens")), sum(col("weight_ppm"))).head()
    assert(rows.getLong(0) === 1000000000L,
      s"largest-remainder apportionment must be exact, got ${rows.getLong(0)}")
    // ppm weights truncate, so they sum to at most 1e6
    assert(rows.getLong(1) <= 1000000L && rows.getLong(1) > 990000L)
  }

  test("holt smoothing replays the sequential reference fold") {
    val out = SparkEntry.queries("q_holt")(spark, sf)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference: plain Scala fold over the same daily series
    val daily = out.map { case (d, c, _, _) => (d, c) }
    var l = daily.head._2; var b = 0L
    val first = Seq((daily.head._1, daily.head._2, l, b))
    val ref = first ++ daily.tail.map { case (d, c) =>
      val nl = (c + 4 * (l + b)) / 5
      val nb = ((nl - l) + 9 * b) / 10
      l = nl; b = nb; (d, c, l, b)
    }
    assert(out.toSeq === ref)
  }

  test("ppr keeps teleport mass on seeds and never goes negative") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_ppr")(spark, sf)
    assert(df.filter(col("pr_fp") < 0).count() === 0L)
    // every seed node retains at least its own teleport term
    assert(df.filter(col("is_seed") && col("pr_fp") < 150000L).count() === 0L)
    assert(df.filter(col("is_seed")).count() > 0L)
  }

  test("naive bayes emits a 5-row model per class with ppm-bounded probabilities") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_naive_bayes")(spark, sf)
    val perClass = df.groupBy(col("lang")).count().collect()
    assert(perClass.nonEmpty && perClass.forall(_.getLong(1) === 5L))
    assert(df.filter(col("p_ppm") <= 0 || col("p_ppm") > 1000000L).count() === 0L)
    assert(df.filter(col("prior_ppm") <= 0 || col("prior_ppm") >= 1000000L).count() === 0L)
  }

  test("simhash band join has exact recall at hamming <= 3 (vs brute force)") {
    import org.apache.spark.sql.functions._
    val sh = graft.llm.Dedup.simhash32(
        spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (i, a) <- sh; (j, b) <- sh if i < j
      h = java.lang.Long.bitCount((a ^ b) & 0xFFFFFFFFL) if h <= 3
    } yield (i, j, h.toLong)).toSet
    val banded = SparkEntry.queries("q_simhash_hamming")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute)
  }

  test("purchase timestamps are globally unique (q_ohlc_bars open/close contract)") {
    import org.apache.spark.sql.functions._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      SparkEntry.registerTables(spark, d)
      val r = spark.table("events").filter(col("event_type") === "purchase")
        .agg(count(lit(1)), countDistinct(col("ts"))).head()
      assert(r.getLong(0) === r.getLong(1),
        s"$d purchase ts not unique — min_by/max_by open/close would be tie-broken")
    }
  }

  test("lateness audit discriminates: synthetic out-of-order stream fills late buckets") {
    import spark.implicits._
    // user 1: in order; user 2: third event arrives 5 minutes behind
    // its running max; user 3: 90 min behind (clamps into bucket 60)
    val ev = Seq(
      (1L, 1L, 1000L * 60000000000L), (1L, 2L, 1001L * 60000000000L),
      (2L, 3L, 1000L * 60000000000L), (2L, 4L, 1010L * 60000000000L),
      (2L, 5L, 1005L * 60000000000L),
      (3L, 6L, 2000L * 60000000000L), (3L, 7L, 1910L * 60000000000L)
    ).toDF("user_id", "event_id", "ts")
    val got = SparkEntry.latenessBuckets(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 2L, 5L -> 1L, 60L -> 1L), s"got $got")
  }

  test("event ts is nondecreasing in event_id per user (q_abandonment last-event contract)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      SparkEntry.registerTables(spark, d)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val bad = spark.table("events")
        .withColumn("pts", lag(col("ts"), 1).over(w))
        .filter(col("pts") > col("ts")).count()
      assert(bad === 0L,
        s"$d has out-of-order events — max_by(event_type, event_id) would not be the last event")
    }
  }

  test("length-batching bucket formula is the exact ceil-power-of-two") {
    // qLengthBatching buckets by shiftleft(1, length(bin(n-1))) — the
    // no-float-log form of 2^ceil(log2 n). Pin it against the integer
    // reference for every n in [1, 1030] so an engine change to bin()
    // or shiftleft() semantics fails here, not as an oracle hash skew.
    import spark.implicits._
    val got = (1L to 1030L).toDF("n")
      .selectExpr("n",
        "CASE WHEN n <= 1 THEN 1L ELSE shiftleft(1L, length(bin(n - 1))) END AS b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (1L to 1030L).foreach { n =>
      var p = 1L
      while (p < n) p <<= 1
      assert(got(n) == p, s"n=$n got=${got(n)} want=$p")
      assert(got(n) >= n && (got(n) == 1L || got(n) / 2 < n))
    }
  }

  test("rlhf packed score+id stays inside its integer envelope") {
    // qRlhfPairs packs (score_milli + 100000) * 1e9 + doc_id into one
    // long so min/max ARE deterministic argmin/argmax. That decode is
    // only exact while score_milli > -100000 (offset keeps the product
    // positive — `div` truncation would break on negatives) and
    // doc_id < 1e9. Pin both bounds on real data so a regenerated
    // corpus that violates them fails here, not as an oracle skew.
    import org.apache.spark.sql.functions._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val r = spark.read.parquet(s"$d/documents.parquet")
        .select(
          (lit(40L) * size(split(col("text"), " ")).cast("long") +
            lit(-10L) * length(regexp_replace(col("text"), "[^0-9]", ""))
              .cast("long") +
            lit(-2L) * abs(col("n_chars") - 500) + lit(-1500L))
            .as("score_milli"), col("doc_id"))
        .agg(min(col("score_milli")), max(col("score_milli")),
          max(col("doc_id")))
        .head()
      assert(r.getLong(0) > -100000L, s"$d score underflows packing offset")
      assert(r.getLong(1) < 9100000L, s"$d score overflows packing range")
      assert(r.getLong(2) < 1000000000L, s"$d doc_id overflows packing slot")
    }
  }

  test("isotonic fit is monotone and stays within the raw rate envelope") {
    // The minimax max-min-mean construction must produce a nondecreasing
    // sequence bounded by [min(raw), max(raw)] — the defining PAVA
    // invariants; a violated monotonicity means the interval join or the
    // prefix sums regressed even if the oracle happens to agree.
    val rows = SparkEntry.queries("q_isotonic")(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("bin")).collect()
    assert(rows.nonEmpty)
    val iso = rows.map(_.getAs[Long]("iso_ppm"))
    val raw = rows.map(_.getAs[Long]("raw_ppm"))
    iso.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b, s"isotonic fit not monotone: $a > $b")
    case _ => }
    assert(iso.min >= raw.min && iso.max <= raw.max,
      "isotonic fit escapes the raw-rate envelope")
  }

  test("mann-kendall S and var18 stay inside their combinatorial bounds") {
    val rows = SparkEntry.queries("q_mann_kendall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_months")
      val sStat = r.getAs[Long]("s_stat")
      val var18 = r.getAs[Long]("var18")
      assert(math.abs(sStat) <= n * (n - 1) / 2, s"S out of bounds: $r")
      assert(var18 >= 0 && var18 <= n * (n - 1) * (2 * n + 5),
        s"var18 out of bounds: $r")
    }
  }

  test("incremental dedup partitions the batch exactly") {
    // n_batch must equal dup_vs_snapshot + dup_in_batch + ingested per
    // source — the three disposition classes are a partition of the
    // batch; any overlap or leak breaks the conservation law even if
    // each individual count matches a drifted oracle.
    val rows = SparkEntry.queries("q_incremental_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_batch") ==
        r.getAs[Long]("n_dup_vs_snapshot") + r.getAs[Long]("n_dup_in_batch") +
          r.getAs[Long]("n_ingested"), s"batch not partitioned: $r")
    }
  }

  test("log compaction conserves keys and records") {
    val rows = SparkEntry.queries("q_log_compaction")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_keys") ==
        r.getAs[Long]("n_live") + r.getAs[Long]("n_tombstoned"), s"keys leak: $r")
      assert(r.getAs[Long]("n_records") >= r.getAs[Long]("n_keys"),
        s"more keys than records: $r")
    }
  }

  test("every query has oracle SQL or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, sf).count()
      assert(n >= 0)
    }
  }
}
