package graft

import org.apache.spark.sql.functions._

/** The DataSourceV2 order table: row-for-row equality with the
  * column-expression generator, planner-driven column pruning, and
  * executor-side partition planning. */
class OrdersSourceSpec extends SparkSpec {

  private def src(rows: Long, parts: Int) =
    spark.read.format("graft.sources.OrdersSource")
      .option("rows", rows).option("seed", "gen1").option("numPartitions", parts)
      .load()

  test("DSv2 rows are identical to OrderGen.orders for the same seed") {
    val viaSource = src(500, 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).sorted
    val viaExprs = graft.sources.OrderGen.orders(spark, 500, "gen1").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).sorted
    assert(viaSource === viaExprs)
  }

  test("projection is pruned down to the scan (ReadSchema)") {
    val plan = src(100, 2).select(col("product"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), s"no DSv2 scan:\n$plan")
    assert(!plan.contains("order_id"), s"pruning lost — scan reads order_id:\n$plan")
    assert(!plan.contains("price"), s"pruning lost — scan reads price:\n$plan")
  }

  test("scan plans the requested number of input partitions") {
    assert(src(1000, 8).rdd.getNumPartitions === 8)
    // never more ranges than rows
    assert(src(3, 8).rdd.getNumPartitions <= 3)
    assert(src(3, 8).count() === 3)
  }

  test("envelope mode is byte-identical to OrderGen.toEnvelopes") {
    val viaSource = spark.read.format("graft.sources.OrdersSource")
      .option("rows", 200).option("seed", "gen1")
      .option("numPartitions", 4).option("mode", "envelope")
      .load()
    assert(viaSource.schema === graft.model.Schemas.envelope)
    val a = viaSource
      .select(col("offset"), md5(col("key")).as("k"), md5(col("value")).as("v"),
        col("topic"), col("partition"), col("timestamp").cast("long").as("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4), r.getLong(5))).sorted
    val b = graft.sources.OrderGen.toEnvelopes(
        graft.sources.OrderGen.orders(spark, 200, "gen1"))
      .select(col("offset"), md5(col("key")).as("k"), md5(col("value")).as("v"),
        col("topic"), col("partition"), col("timestamp").cast("long").as("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4), r.getLong(5))).sorted
    assert(a === b)
  }

  test("envelope mode decodes through the full consumer pipeline") {
    val env = spark.read.format("graft.sources.OrdersSource")
      .option("rows", 300).option("seed", "gen1")
      .option("numPartitions", 4).option("mode", "envelope")
      .load()
    val routed = graft.ops.Router.route(
      graft.stream.OrderPipeline.process(env))
    val counts = routed.groupBy(col("status")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts.values.sum === 300L)
    assert(counts.keySet.subsetOf(Set("success", "transient_failure", "permanent_failure")))
  }

  test("micro-batch stream drains the table in rate-limited batches, no gaps") {
    val stream = spark.readStream.format("graft.sources.OrdersSource")
      .option("rows", 250).option("seed", "gen1")
      .option("numPartitions", 2).option("rowsPerBatch", 100)
      .load()
    val q = stream.writeStream.format("memory").queryName("dsv2_stream")
      .option("checkpointLocation", tmpDir("graft-dsv2-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("dsv2_stream").select(col("seq")).collect()
      .map(_.getLong(0)).sorted
    // every index exactly once — offsets advanced without skips or dups
    assert(got === (0L until 250L).toArray)
    // admission control actually batched: AvailableNow over 250 rows at
    // 100 rows/batch needs >= 3 batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      q.recentProgress.map(_.numInputRows).mkString(","))
  }
}
