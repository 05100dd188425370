package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Level-synchronous multi-source BFS — hop distances from a seed set
  * over an undirected edge list. The iterative-traversal complement to
  * the engine's connected-components operators (min-label, star
  * contraction): CC answers "which cluster", BFS answers "how far".
  *
  * Scale design: the classic Pregel/GraphX BFS shape — each level is
  * ONE join of the current frontier against the edge list plus one
  * anti-join against the settled set; no driver-side graph state, only
  * the frontier count crosses to the driver per level. Rounds = the
  * eccentricity of the seed set (small on the short-diameter graphs
  * BFS is used for); every intermediate is checkpointed so the plan
  * never stacks across levels. A node's distance is final the level it
  * is first reached (unit weights), so the settled set only ever
  * grows — there is no relaxation pass to repeat.
  */
object Bfs {

  /** (node, dist) for every node reachable from `seeds`; seeds are at
    * dist 0. `edges` must contain BOTH directions of each undirected
    * edge. Fails loudly if the traversal has not exhausted within
    * `maxIter` levels — a silent cap would emit wrong (censored)
    * distances. */
  def distances(edges: DataFrame, seeds: DataFrame,
      maxIter: Int = 30): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    // only FRONTIERS are checkpointed — the settled set is their union,
    // so every node's blocks are stored exactly once (checkpointing
    // `visited` per level would hold O(|V| × levels) executor storage;
    // localCheckpoint blocks are only released by the ContextCleaner
    // on GC, not by unpersist)
    var visited = seeds.select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(eager = true)
    var frontier = visited.select(col("node"))
    var level = 0L
    var n = frontier.count()
    while (n > 0 && level < maxIter) {
      level += 1
      val nbrs = e.join(frontier.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node")).distinct()
      val newFrontier = nbrs.join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(level))
        .localCheckpoint(eager = true)
      visited = visited.union(newFrontier)
      frontier = newFrontier.select(col("node"))
      n = newFrontier.count()
    }
    if (n > 0) throw new IllegalStateException(
      s"BFS frontier still active after $maxIter levels — the graph is " +
        s"deeper than maxIter; raise it (distances would be censored)")
    visited
  }

  /** Weighted multi-source shortest paths by distributed Bellman-Ford
    * relaxation: each round candidate distances come from ONE
    * edges⋈dist join + min-aggregation, then min-merge into the
    * settled table; the loop ends when no distance improves. Unlike
    * unit-weight BFS a settled distance CAN improve later (a longer
    * hop path may be cheaper), so the merge is a relaxation, not an
    * append — rounds ≤ the hop count of the longest shortest path.
    * `edges` needs (u, v, w) with non-negative long weights, both
    * directions for undirected graphs. Fails loudly at maxIter:
    * censored distances are silent wrong answers. */
  def weightedDistances(edges: DataFrame, seeds: DataFrame,
      maxIter: Int = 30): DataFrame = {
    val e = edges.select(col("u"), col("v"), col("w"))
    var dist = seeds.select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(eager = true)
    var improved = 1L
    var iter = 0
    while (improved > 0 && iter < maxIter) {
      iter += 1
      val cand = e.join(dist.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"), (col("dist") + col("w")).as("nd"))
        .groupBy(col("node")).agg(min(col("nd")).as("nd"))
      // unlike BFS, the whole state table CAN change each round, so it
      // is re-checkpointed per round; superseded rounds' blocks are
      // released by the ContextCleaner once unreachable (explicit
      // unpersist is a no-op on localCheckpoint'd frames — the
      // dupClusters convention)
      val merged = dist.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("dist"), col("nd")),
            coalesce(col("nd"), col("dist"))).as("d2"),
          (col("dist").isNull ||
            (col("nd").isNotNull && col("nd") < col("dist"))).as("better"))
        .localCheckpoint(eager = true)
      improved = merged.filter(col("better")).count()
      dist = merged.select(col("node"), col("d2").as("dist"))
    }
    if (improved > 0) throw new IllegalStateException(
      s"Bellman-Ford still relaxing after $maxIter rounds — a shortest " +
        s"path has more hops than maxIter; raise it (distances would be " +
        s"censored)")
    dist
  }
}
