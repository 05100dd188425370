package graft

import org.apache.spark.sql.functions._

import graft.functions.Hll

/** The deterministic HLL sketch (custom Aggregator / UDAF surface). */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def hashCol = conv(substring(
    md5(col("id").cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  test("estimate is within HLL error bounds for m=64 (~13% rel err)") {
    val n = 20000
    val est = spark.range(n).select(hashCol.as("h"))
      .agg(Hll.hll_sketch(col("h"))).head().getDouble(0)
    assert(math.abs(est - n) / n < 0.4, s"estimate $est vs $n")
  }

  test("estimate is a pure function of the distinct set") {
    val a = spark.range(1000).select(hashCol.as("h"))
    val dup = a.union(a).union(a) // duplicates must not move the estimate
    val e1 = a.agg(Hll.hll_sketch(col("h"))).head().getDouble(0)
    val e2 = dup.agg(Hll.hll_sketch(col("h"))).head().getDouble(0)
    val e3 = dup.repartition(7).agg(Hll.hll_sketch(col("h"))).head().getDouble(0)
    assert(e1 === e2)  // dup-insensitive
    assert(e1 === e3)  // partitioning/merge-order-insensitive
  }

  test("rho is 1 + trailing zeros, capped for zero remainder") {
    assert(Hll.rho(0L) === Hll.MaxRho)
    assert(Hll.rho(1L) === 1)
    assert(Hll.rho(8L) === 4)
    assert(Hll.rho(6L) === 2)
  }

  test("estimate of merged sub-sketches equals direct estimate of the union") {
    import org.apache.spark.sql.functions._
    // split the same id space into 5 disjoint groups, sketch each,
    // merge the sketch ROWS — must equal sketching the union directly
    val ids = spark.range(5000).select(col("id"), (col("id") % 5).as("g"), hashCol.as("h"))
    val direct = ids.agg(Hll.hll_sketch(col("h"))).head().getDouble(0)
    val merged = ids.groupBy(col("g")).agg(Hll.hll_registers(col("h")).as("regs"))
      .agg(Hll.hll_merge(col("regs")).as("m"))
      .select(Hll.hll_estimate_registers(col("m")))
      .head().getDouble(0)
    assert(merged === direct)
  }
}
