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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    def tbl(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    // warmup
    tbl("lineitem").count()
    val items = tbl("lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges0 = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .repartition(col("u"))
      .localCheckpoint(eager = false)
    t("edges build+ckpt")(edges0.count())
    val seeds = t("seeds topk") {
      val s = edges0.select(col("u").as("node")).distinct()
        .withColumn("h", conv(substring(md5(
            concat(lit("dp|"), col("node").cast("string")).cast("binary")),
          1, 15), 16, 10).cast("long"))
        .orderBy(col("h"), col("node")).limit(3).drop("h")
        .localCheckpoint(eager = false)
      s.count(); s
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val vis = t("labeled BFS loop") {
      // inline copy of labeledDistances with per-round timing
      val e = edges0.select(col("u"), col("v"))
      var visited = seeds.select(col("node").as("src"), col("node"), lit(0L).as("dist"))
        .localCheckpoint(eager = false)
      var frontier = visited.select(col("src"), col("node"))
      var level = 0L
      var n = t("  lvl0 count")(frontier.count())
      while (n > 0 && level < 30) {
        val l1 = e.join(frontier.withColumnRenamed("node", "u"), "u")
          .select(col("src"), col("v").as("node")).distinct()
          .join(visited, Seq("src", "node"), "left_anti")
          .withColumn("dist", lit(level + 1))
        val l2 = e.join(l1.select(col("src"), col("node").as("u")), "u")
          .select(col("src"), col("v").as("node")).distinct()
          .join(visited, Seq("src", "node"), "left_anti")
          .join(l1.select(col("src"), col("node")), Seq("src", "node"), "left_anti")
          .withColumn("dist", lit(level + 2))
        val newFrontier = t(s"  ckpt plan lvl ${level + 2}")(
          l1.union(l2).localCheckpoint(eager = false))
        level += 2
        visited = visited.union(newFrontier)
        frontier = newFrontier.filter(col("dist") === level)
          .select(col("src"), col("node"))
        n = t(s"  round to lvl $level")(frontier.count())
        println(s"[scratch]   frontier n=$n")
      }
      visited
    }
    t("final aggs") {
      val perSeed = vis.groupBy(col("src").as("seed"))
        .agg(count(lit(1)).as("n_reached"), max(col("dist")).as("eccentricity"))
      val mx = perSeed.agg(max(col("eccentricity")).as("diameter_lower_bound"))
      perSeed.crossJoin(broadcast(mx)).orderBy(col("seed")).count()
    }
    spark.stop()
  }
}
