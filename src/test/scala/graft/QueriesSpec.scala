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
