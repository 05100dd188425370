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
        .localCheckpoint(eager = true)
      visited = visited
        .union(newFrontier.withColumn("dist", lit(level)))
        .localCheckpoint(eager = true)
      frontier = newFrontier.select(col("node"))
      n = newFrontier.count()
    }
    if (n > 0) throw new IllegalStateException(
      s"BFS frontier still active after $maxIter levels — the graph is " +
        s"deeper than maxIter; raise it (distances would be censored)")
    visited
  }
}
