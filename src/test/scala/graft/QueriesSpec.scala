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
