package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomPrune

/** The bloom runtime filter's contract: zero false negatives (every
  * built key passes the probe — anything else silently drops matching
  * fact rows), a bounded false-positive rate at the design sizing, and
  * actual pruning power on a disjoint probe set. */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("every built key passes the membership probe (no false negatives)") {
    val keys = (0L until 500L).map(_ * 7 + 3).toDF("k")
    val bloom = BloomPrune.buildWords(keys, "k", numBits = 8192, numHashes = 3)
    val n = keys.filter(BloomPrune.mightContain(bloom, col("k"))).count()
    assert(n === 500L)
  }

  test("false-positive rate is bounded on a disjoint probe set") {
    // 500 keys in 8192 bits at k=3 → expected fp ≈ (1-e^(-3*500/8192))^3 ≈ 0.4%
    val keys = (0L until 500L).map(_ * 7 + 3).toDF("k")
    val bloom = BloomPrune.buildWords(keys, "k", numBits = 8192, numHashes = 3)
    val probes = (1000000L until 1010000L).toDF("k") // disjoint from keys
    val fp = probes.filter(BloomPrune.mightContain(bloom, col("k"))).count()
    assert(fp < 300L, s"false-positive rate too high: $fp / 10000")
  }

  test("probe with all-zero words admits nothing") {
    // empty dim side (e.g. no supplier passes the threshold at tiny SF):
    // the bloom must prune everything, and the exact join keeps the
    // answer correct (empty)
    val bloom = BloomPrune.buildWords(Seq.empty[Long].toDF("k"), "k", 1024, 3)
    val n = (0L until 1000L).toDF("k")
      .filter(BloomPrune.mightContain(bloom, col("k"))).count()
    assert(n === 0L)
  }

  test("q_bloom_prune keeps the exact-join answer and broadcasts the dim") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q_bloom_prune")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim side not broadcast:\n$plan")
    assert(plan.contains("xxhash64"), s"bloom probe absent from plan:\n$plan")
    // bloom is answer-transparent: equals the plain semi-join aggregate
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
      .filter($"s_acctbal" > 8000.0).select($"s_suppkey")
    val expected = li.join(sup, li("l_suppkey") === sup("s_suppkey"), "left_semi")
      .groupBy($"l_suppkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
  }
}
