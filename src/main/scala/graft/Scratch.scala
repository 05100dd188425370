package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway dev profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 10000).map(i => (i.toLong, (i * 7919 % 1000).toLong))
      .toDF("k", "c")
    // global (no partitionBy) rank + literal filter
    val g = df.withColumn("rn",
        row_number().over(Window.orderBy(col("c").desc, col("k"))))
      .filter(col("rn") <= 500)
    println("=== global ===")
    println(g.queryExecution.optimizedPlan.treeString.take(1200))
    // partitioned rank + literal filter
    val p = df.withColumn("rn",
        row_number().over(Window.partitionBy(col("c") % 3)
          .orderBy(col("c").desc, col("k"))))
      .filter(col("rn") <= 500)
    println("=== partitioned ===")
    println(p.queryExecution.optimizedPlan.treeString.take(1200))
    spark.stop()
  }
}
