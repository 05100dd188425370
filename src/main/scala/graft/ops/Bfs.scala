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
    // LAZY checkpoints throughout: the convergence count is the first
    // action over each checkpointed table, so the count job materializes
    // the blocks as a side effect — one job per round instead of an
    // eager-materialize job plus a count job (the job floor, not data,
    // dominates each level on all but enormous frontiers)
    var visited = seeds.select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(eager = false)
    var frontier = visited.select(col("node"))
    var level = 0L
    var n = frontier.count()
    while (n > 0 && level < maxIter) {
      // TWO levels per materialization: at small per-level data the
      // job-scheduling floor dominates each round, so halving the
      // checkpoint+count round-trips roughly halves wall time. Level
      // l+2 is exactly nbrs(level l+1) minus visited minus level l+1 —
      // any l+2 node reachable straight from the frontier would have
      // landed in l+1 and is excluded by the anti-join.
      val l1 = e.join(frontier.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(level + 1))
      val l2 = e.join(l1.select(col("node").as("u")), "u")
        .select(col("v").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .join(l1.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(level + 2))
      // lazy: the count below scans every partition (the dist filter
      // prunes rows, not partitions), so it materializes the blocks
      val newFrontier = l1.union(l2).localCheckpoint(eager = false)
      level += 2
      visited = visited.union(newFrontier)
      // only the deepest layer can still expand: nbrs(l1) ⊆ visited ∪ l1 ∪ l2
      frontier = newFrontier.filter(col("dist") === level).select(col("node"))
      n = frontier.count()
    }
    if (n > 0) throw new IllegalStateException(
      s"BFS frontier still active after $maxIter levels — the graph is " +
        s"deeper than maxIter; raise it (distances would be censored)")
    visited
  }

  /** Per-source labeled BFS: like `distances`, but each seed row carries
    * a `src` label and distances are tracked PER (src, node) — N
    * independent traversals advanced by ONE set of per-level jobs
    * instead of N concurrent loops (the wall time is max-eccentricity
    * scheduling round-trips either way, but the job count, driver
    * pressure, and thread orchestration all drop to a single loop's).
    * State is |sources| × |reachable| rows at worst — the caller picks
    * a bounded probe set (this is a probe tool, not all-pairs).
    * `seeds` needs (src, node); returns (src, node, dist). */
  def labeledDistances(edges: DataFrame, seeds: DataFrame,
      maxIter: Int = 30): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    var visited = seeds.select(col("src"), col("node"), lit(0L).as("dist"))
      .localCheckpoint(eager = false)
    var frontier = visited.select(col("src"), col("node"))
    var level = 0L
    var n = frontier.count()
    while (n > 0 && level < maxIter) {
      // same two-levels-per-materialization shape as `distances`; the
      // anti-joins key on (src, node) so traversals stay independent
      val l1 = e.join(frontier.withColumnRenamed("node", "u"), "u")
        .select(col("src"), col("v").as("node")).distinct()
        .join(visited, Seq("src", "node"), "left_anti")
        .withColumn("dist", lit(level + 1))
      val l2 = e.join(l1.select(col("src"), col("node").as("u")), "u")
        .select(col("src"), col("v").as("node")).distinct()
        .join(visited, Seq("src", "node"), "left_anti")
        .join(l1.select(col("src"), col("node")), Seq("src", "node"), "left_anti")
        .withColumn("dist", lit(level + 2))
      val newFrontier = l1.union(l2).localCheckpoint(eager = false)
      level += 2
      visited = visited.union(newFrontier)
      frontier = newFrontier.filter(col("dist") === level)
        .select(col("src"), col("node"))
      n = frontier.count()
    }
    if (n > 0) throw new IllegalStateException(
      s"labeled BFS frontier still active after $maxIter levels — raise " +
        s"maxIter (distances would be censored)")
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
    // one relaxation sweep: min over (current table ∪ one-hop
    // candidates) — a single union + min-aggregation. The candidate
    // pre-aggregation and full-outer merge the textbook form writes are
    // folded into that one agg (min is associative), so a sweep costs
    // one join + one shuffle agg instead of join + agg + full-outer.
    // Round-13: a co-partitioned full-outer least-merge (candidate agg
    // by node, then an exchange-free SMJ against the settled table) was
    // tried and REJECTED by A/B measurement — q_sssp min-of-7 3.28 s vs
    // 2.66 s for this shape: the per-sweep SMJ sorts cost more than the
    // union's extra shuffled bytes at any scale where the settled table
    // is small relative to the candidate stream.
    // Round-14: a DELTA/FRONTIER variant (a `chg` flag rides the table;
    // only changed nodes' edges feed the next candidate join, with
    // old/new mins folded into the same union+agg) was A/B'd and
    // REJECTED at this scale — back-to-back min-of-7 3.14 s vs 2.97 s,
    // medians 3.56 vs 3.25 — despite needing one FEWER materialized
    // round: the wider union (extra bool), the second aggregate and the
    // per-sweep frontier filter cost more than the candidate shrinkage
    // saves when the whole graph is a few thousand edges. The probe
    // numbers say the trade flips at scale (q_sssp sf0.1 graph,
    // 19 sweeps: non-frontier candidate stream GROWS to 3,020 rows/sweep
    // = every settled edge re-relaxed, ~34k rows total; frontier stream
    // peaks at 429 and decays to 1, ~3.0k total — at corpus scale the
    // non-frontier stream is the FULL edge set per sweep), so a 100 TB
    // deployment should flip to the frontier form once per-sweep data
    // dominates the job floor.
    def relaxed(d: DataFrame): DataFrame =
      d.unionByName(
          e.join(d.withColumnRenamed("node", "u"), "u")
            .select(col("v").as("node"), (col("dist") + col("w")).as("dist")))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
    // lazy checkpoint: the signature agg right below is the first action
    // and materializes the blocks in the same job (halves the per-round
    // job floor vs eager-then-agg)
    var dist = seeds.select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(eager = false)
    // convergence signature: per-node distances are monotone
    // non-increasing and the node set only grows, so the table changed
    // iff (count, fingerprint) changed — one tiny agg over the fresh
    // checkpoint instead of a join against the round-start table. The
    // fingerprint is bit_xor(xxhash64(node, dist)): order-independent
    // and overflow-free (a Σdist would wrap once node ids × path
    // weights reach int64 scale), the StarCC convention.
    def signature(d: DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)),
        expr("bit_xor(xxhash64(node, dist))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = signature(dist)
    var improved = true
    var iter = 0
    while (improved && iter < maxIter) {
      iter += 1
      // FOUR relaxations per materialized round: relaxing any number of
      // times between convergence checks preserves Bellman-Ford
      // semantics, and at small per-round data the checkpoint+count
      // job floor dominates — so fusing sweeps into one materialization
      // cuts wall time by the fusion factor. 4 is the measured sweet
      // spot (6 fused sweeps re-scan the mostly-settled table enough
      // extra times to cost MORE than the rounds they save).
      // The whole state table CAN change each round, so it is
      // re-checkpointed; superseded rounds' blocks are released by the
      // ContextCleaner once unreachable (the dupClusters convention).
      val next = relaxed(relaxed(relaxed(relaxed(dist))))
        .localCheckpoint(eager = false)
      val nextSig = signature(next)
      improved = nextSig != sig
      // Early fixed-point probe (shaves the final materialized round):
      // once the NODE COUNT stops growing the frontier is dying, and
      // the table is converged iff relaxed(next) == next — checkable
      // with ONE extra sweep+agg over the fresh checkpoint, far
      // cheaper than the full 4-sweep round the plain signature loop
      // would spend to discover "nothing changed". Sound because
      // Bellman-Ford's fixed point is exactly relax-invariance; only
      // probed on count-stable rounds so growth-phase rounds pay
      // nothing extra.
      if (improved && nextSig._1 == sig._1 &&
          signature(relaxed(next)) == nextSig) improved = false
      sig = nextSig
      dist = next
    }
    if (improved) throw new IllegalStateException(
      s"Bellman-Ford still relaxing after $maxIter rounds (4 relaxation " +
        s"sweeps each — a shortest path has more hops than ~4x maxIter); " +
        s"raise it (distances would be censored)")
    dist
  }
}
