package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Analytics, Router, ScalablePrefix}
import graft.sources.OrderGen

/** Dev tool: push the core operator paths well past bench scale
  * (generated orders, no testdata dependency) and report wall times —
  * the local stand-in for "would this hold at 100 TB": everything here
  * must scale linearly with rows and shuffle only fixed-size state.
  * Usage: runMain graft.ScaleProbe [rows] */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 5000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale-probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val gen = OrderGen.orders(spark, rows, "probe")
      .withColumnRenamed("order_id", "orderId")

    timed(s"route+counts ($rows rows)") {
      Router.statusCounts(Router.route(gen)).collect()
    }
    timed("exact cents aggregate") {
      Router.route(gen).filter(col("status") === Router.Success)
        .agg(sum(Analytics.cents(col("price")))).collect()
    }
    timed("two-pass prefix sum") {
      ScalablePrefix.runningSum(spark,
        gen.select(col("seq").as("k"), Analytics.cents(col("price")).as("v")),
        "k", "v", numPartitions = cpus.toInt * 4)
        .agg(max(col("run_sum"))).collect()
    }
    timed("codec encode+decode (500k)") {
      val enc = OrderGen.toEnvelopes(
        OrderGen.orders(spark, rows / 10, "probe-codec"))
      graft.stream.OrderPipeline.process(enc).count()
    }
    spark.stop()
  }
}
