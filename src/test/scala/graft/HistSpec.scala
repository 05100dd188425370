package graft

import org.apache.spark.sql.functions._

import graft.functions.Hist

/** Mergeable equi-width histogram sketch semantics. */
class HistSpec extends SparkSpec {
  import spark.implicits._

  test("bucket math clamps and partitions the range exactly") {
    assert(Hist.bucket(-5L, 0L, 6400L) === 0)       // below-range clamp
    assert(Hist.bucket(0L, 0L, 6400L) === 0)
    assert(Hist.bucket(99L, 0L, 6400L) === 0)
    assert(Hist.bucket(100L, 0L, 6400L) === 1)      // exact boundary
    assert(Hist.bucket(6399L, 0L, 6400L) === 63)
    assert(Hist.bucket(6400L, 0L, 6400L) === 63)    // above-range clamp
    assert(Hist.bucket(999999L, 0L, 6400L) === 63)
  }

  test("merge of per-group sketches equals the sketch of the union") {
    val vals = (1L to 1000L).map(v => (v % 7, v))
    val df = vals.toDF("g", "v")
    val merged = df.groupBy($"g")
      .agg(Hist.hist_registers($"v", 0L, 1024L).as("regs"))
      .agg(Hist.hist_merge($"regs").as("regs"))
      .as[Seq[Long]].head()
    val direct = df.agg(Hist.hist_registers($"v", 0L, 1024L).as("regs"))
      .as[Seq[Long]].head()
    assert(merged === direct)
    assert(merged.sum === 1000L)                    // every value counted
  }

  test("sketches survive a parquet round-trip and merge after reload") {
    // the 100 TB usage pattern: materialize fine-grain sketches to a
    // table once, answer coarse rollups later from the stored arrays
    val df = (1L to 500L).map(v => (v % 5, v)).toDF("g", "v")
    val sketches = df.groupBy($"g")
      .agg(Hist.hist_registers($"v", 0L, 512L).as("regs"))
    val dir = tmpDir("hist-sketch")
    sketches.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
      .agg(Hist.hist_merge($"regs").as("regs")).as[Seq[Long]].head()
    val direct = df.agg(Hist.hist_registers($"v", 0L, 512L).as("regs"))
      .as[Seq[Long]].head()
    assert(reloaded === direct)
  }

  test("rank-threshold quantile from the sketch brackets the exact value") {
    // 0..1023 uniform over [0,1024): the nearest-rank p50 is the value
    // at rank ceil(n/2) = 512, i.e. 511; the selected bucket must
    // contain it
    val df = (0L until 1024L).toDF("v")
    val regs = df.agg(Hist.hist_registers($"v", 0L, 1024L).as("regs"))
      .as[Seq[Long]].head()
    val n = regs.sum
    val cums = regs.scanLeft(0L)(_ + _).tail
    val b50 = cums.indexWhere(_ * 2 >= n)
    val width = 1024L / Hist.B
    val exactP50 = 511L
    assert(b50 * width <= exactP50 && exactP50 < (b50 + 1) * width)
  }
}
