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
    tbl("documents").count()
    // dupClusters convergence probe: materialized rounds + sweeps at sf0.1
    val pairs = graft.llm.Dedup.jaccardPairs(tbl("documents"), "doc_id", "text",
      k = 5, minSim = 0.05)
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .union(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .repartition(col("b"))
      .localCheckpoint(eager = false)
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    def sweep(l: org.apache.spark.sql.DataFrame) = {
      val neighborMin = edges
        .join(l.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      l.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
    }
    def signature(l: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = l.agg(count(lit(1)), expr("bit_xor(xxhash64(node, label))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // per-SWEEP signature trace: how many single sweeps until fixpoint
    var l = labels.localCheckpoint(eager = false)
    var sig = signature(l)
    var sweeps = 0
    var done = false
    while (!done && sweeps < 30) {
      sweeps += 1
      val n = sweep(l).localCheckpoint(eager = false)
      val ns = signature(n)
      done = ns == sig
      println(s"[scratch] sweep $sweeps changed=${ns != sig}")
      sig = ns; l = n
    }
    println(s"[scratch] single-sweep fixpoint after $sweeps sweeps (incl. detection sweep)")
    spark.stop()
  }
}
