package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition by distributed degree peeling — the graph
  * family's missing paradigm beside traversal (BFS/SSSP), propagation
  * (CC/label prop) and enumeration (triangles): repeatedly remove
  * every node of degree < k, and the nodes removed while raising the
  * floor to k have coreness k−1. Coreness is THE standard graph
  * sparsifier for community/influence pipelines (keep the k-core,
  * drop the tendrils).
  *
  * The live-NODE set is tracked separately from the edge set: a node
  * whose last neighbor is peeled has degree 0 relative to the
  * remaining edges and must still be assigned its coreness in the
  * next round (an edges-only formulation silently drops it — the
  * middle of every odd-length tendril).
  *
  * Scale shape: each peel round is one degree aggregation + a left
  * join + two anti-joins — all hash-partitioned on the node key, no
  * global structure on the driver (only the per-round emptiness check
  * reaches it, the BFS/Bellman-Ford convention). Rounds are bounded
  * by degeneracy × longest-tendril, NOT node count; the edge set
  * shrinks monotonically, so late rounds are cheap. Loud failure on
  * round overrun (never silent truncation). */
object KCore {

  /** Edges (u, v), canonical u < v, no self-loops. Returns
    * (node, coreness). */
  def coreness(s: SparkSession, edges: DataFrame, maxRounds: Int = 200): DataFrame = {
    var remaining = edges.select(col("u"), col("v")).localCheckpoint(eager = true)
    var nodes = remaining.select(explode(array(col("u"), col("v"))).as("node"))
      .distinct().localCheckpoint(eager = true)
    val results = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var k = 1
    var rounds = 0
    while (!nodes.isEmpty) {
      var changed = true
      while (changed) {
        rounds += 1
        require(rounds <= maxRounds,
          s"k-core peeling exceeded $maxRounds rounds — raise maxRounds " +
            "for graphs with longer tendrils")
        val deg = remaining.select(explode(array(col("u"), col("v"))).as("node"))
          .groupBy(col("node")).agg(count(lit(1)).as("d"))
        val low = nodes.join(deg, Seq("node"), "left")
          .filter(coalesce(col("d"), lit(0L)) < k)
          .select(col("node"))
          .localCheckpoint(eager = true)
        if (low.isEmpty) changed = false
        else {
          results += low.withColumn("coreness", lit(k - 1).cast("long"))
          nodes = nodes.join(low, Seq("node"), "left_anti")
            .localCheckpoint(eager = true)
          remaining = remaining
            .join(low.withColumnRenamed("node", "u"), Seq("u"), "left_anti")
            .join(low.withColumnRenamed("node", "v"), Seq("v"), "left_anti")
            .localCheckpoint(eager = true)
        }
      }
      k += 1 // the floor rises; termination: k exceeds the max degree
    }
    if (results.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("coreness",
            org.apache.spark.sql.types.LongType))))
    else results.reduce(_ unionByName _)
  }
}
