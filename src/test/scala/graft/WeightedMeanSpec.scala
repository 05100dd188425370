package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions.col

import graft.functions.WeightedMean

/** The typed-Aggregator UDAF (functions/WeightedMean.scala). */
class WeightedMeanSpec extends SparkSpec {
  import spark.implicits._

  private val wm = F.udaf(WeightedMean,
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))

  test("weighted mean matches the closed form") {
    // cents values 100,200,300 with weights 1,2,3 -> (100+400+900)/6/100
    val df = Seq((100L, 1L), (200L, 2L), (300L, 3L)).toDF("c", "w")
    val got = df.agg(wm(col("c"), col("w"))).head().getDouble(0)
    assert(got === 1400.0 / 6.0 / 100.0)
  }

  test("result is partitioning-invariant (merge path)") {
    val df = spark.range(1, 10001)
      .select((col("id") % 997 * 13).as("c"), (col("id") % 7 + 1).as("w"))
    val one = df.coalesce(1).agg(wm(col("c"), col("w"))).head().getDouble(0)
    val many = df.repartition(17).agg(wm(col("c"), col("w"))).head().getDouble(0)
    assert(one === many)
  }

  test("zero total weight yields NaN, not a crash") {
    val df = Seq((500L, 0L), (700L, 0L)).toDF("c", "w")
    assert(df.agg(wm(col("c"), col("w"))).head().getDouble(0).isNaN)
  }
}
