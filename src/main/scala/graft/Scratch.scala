package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def tbl(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    tbl("lineitem").count()
    // q_sssp's edge set + seeds, per-sweep candidate-volume probe:
    // candidate rows per sweep WITHOUT the frontier filter (e ⋈ full
    // dist) vs WITH it (e ⋈ changed-only)
    val items = tbl("lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey") &&
          (col("a.l_partkey") + col("b.l_partkey")) % 7 === 0)
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .withColumn("w", lit(1L) + (col("u") + col("v")) % 5)
      .repartition(col("u"))
      .localCheckpoint(eager = false)
    println(s"[scratch] edges=${edges.count()}")
    val seeds = edges.select(col("u").as("node")).distinct()
      .filter(col("node") % 1000 === 0)
    val e = edges.select(col("u"), col("v"), col("w"))
    def sweep(d: org.apache.spark.sql.DataFrame) = {
      val cand = e.join(
          d.filter(col("chg")).select(col("node").as("u"), col("dist")), "u")
        .select(col("v").as("node"), (col("dist") + col("w")).as("dist"))
      d.select(col("node"), col("dist"), lit(true).as("old"))
        .unionByName(cand.select(col("node"), col("dist"), lit(false).as("old")))
        .groupBy(col("node"))
        .agg(min(col("dist")).as("nd"), min(when(col("old"), col("dist"))).as("od"))
        .select(col("node"), col("nd").as("dist"),
          (col("od").isNull || col("nd") < col("od")).as("chg"))
    }
    var dist = seeds.select(col("node"), lit(0L).as("dist"), lit(true).as("chg"))
      .localCheckpoint(eager = false)
    var sweepNo = 0
    var active = dist.agg(count(when(col("chg"), lit(1)))).head().getLong(0)
    while (active > 0 && sweepNo < 40) {
      sweepNo += 1
      // materialize EVERY sweep here (probe only) to read the per-sweep
      // candidate volume: frontier size × incident edges
      val candRows = e.join(
          dist.filter(col("chg")).select(col("node").as("u")), "u").count()
      val next = sweep(dist).localCheckpoint(eager = false)
      active = next.agg(count(when(col("chg"), lit(1)))).head().getLong(0)
      val total = next.count()
      println(f"[scratch] sweep $sweepNo%2d cand_rows=$candRows%8d " +
        f"frontier_after=$active%7d dist_rows=$total%7d " +
        f"nonfrontier_cand=${e.join(dist.select(col("node").as("u")), "u").count()}%8d")
      dist = next
    }
    spark.stop()
  }
}
