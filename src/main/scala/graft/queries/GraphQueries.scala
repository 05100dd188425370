package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.functions.{from_avro_ocf, to_avro_ocf}
import graft.llm.{Dedup, Multimodal, Similarity, TextOps}
import graft.model.Schemas
import graft.ops.{Analytics, Router}

/** Graph analytics: BFS/SSSP traversals, connected components, label propagation, degree/motif statistics over co-purchase graphs.
  *
  * Split from the SparkEntry monolith; every member is `private[graft]`
  * and the driver surface stays `SparkEntry.queries` / `oracleSql`
  * (assembled from the per-domain map fragments below).
  */
private[graft] trait GraphQueries { this: SparkEntry.type =>

  /** The SAME clustering answer as q_dup_clusters, computed by
    * alternating large-star/small-star contraction (ops/StarCC.scala)
    * instead of min-label propagation: O(log n) rounds regardless of
    * component diameter, vs O(diameter) for min-label — the formulation
    * that survives adversarial topology at 100 TB. One recursive
    * ground-truth oracle gates both algorithms. */
  private[graft] def qCcStar(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
      k = 5, minSim = 0.05)
    // jaccardPairs guarantees d1 < d2 and distinct pairs, so the
    // canonical fast path skips the re-canonicalization exchange AND
    // stops the singleton re-attach from re-running candidate
    // generation (round-14, guide §2.4)
    val (labels, _) = graft.ops.StarCC.labels(pairs, "d1", "d2",
      canonicalPairs = true)
    labels
      .select(col("node").as("doc_id"), col("label").as("cluster"),
        (col("label") === col("node")).as("is_representative"))
      .orderBy(col("doc_id"))
  }

  /** Triangle enumeration over the co-purchase graph (parts appearing
    * in the same order): the canonical multi-way self-join. Edges are
    * canonicalized u < v, and a triangle is a wedge (e1.v = e2.u)
    * closed by a third edge — three equi-joins, each
    * hash-partitionable; at corpus scale the standard refinement is
    * degree-ordering the endpoints so high-degree hubs don't dominate
    * the wedge join. Probe restricted to partkey % 10 to bound wedges
    * at verify scale. */
  private[graft] def qTriangles(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    // materialize the edge list ONCE: referenced three times below, an
    // unmaterialized edge list would replicate the items self-join
    // lineage into every branch (13 hash exchanges instead of ~5 —
    // measured via Explain --audit). LAZY checkpoint so constructing
    // the DataFrame (plan audits, explain dumps) runs no job; the edge
    // RDD persists for the session — acceptable for a query-contract
    // entry (edge lists are tiny), but a long-lived service would
    // manage the materialization lifecycle explicitly à la dupClusters
    val edges = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    edges.as("e1")
      .join(edges.as("e2"), col("e1.v") === col("e2.u"))
      .join(edges.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .groupBy(col("e1.u").as("a"))
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("a"))
  }

  /** PageRank (3 unrolled iterations, damping 0.85) over the undirected
    * co-purchase graph — the second iterative graph operator next to
    * connected components. All arithmetic is exact int64 fixed point at
    * 1e6: per-edge contribution = pr div degree (integer division),
    * update = 150000 + (85 * sum) div 100 — order-independent
    * reductions, so the result is partitioning-proof and the oracle
    * replays the identical recurrence. Each iteration is one equi-join
    * + one aggregation keyed by destination (the standard distributed
    * PR shape); the edge list materializes once (lazy checkpoint). */
  private[graft] def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem").filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val und = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val edges = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .localCheckpoint(eager = false)
    // per-edge contribution denominators materialize ONCE: each of the 3
    // iterations joins this same (u, v, d) relation against the evolving
    // pr vector — without the checkpoint, every iteration re-runs the
    // edges⋈deg join (and the edge self-join lineage behind it)
    val withDeg = edges.join(deg, "u").localCheckpoint(eager = false)
    var pr = deg.select(col("u").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to 3) {
      pr = withDeg.join(pr, withDeg("u") === pr("node"))
        .select(col("v"), expr("pr div d").as("contrib"))
        .groupBy(col("v"))
        .agg(expr("150000 + (85 * sum(contrib)) div 100").as("pr"))
        .select(col("v").as("node"), col("pr"))
    }
    pr.join(deg, pr("node") === deg("u"))
      .select(col("node"), col("pr").as("pr_fp"), col("d").as("degree"))
      .orderBy(col("node"))
  }

  /** k-core decomposition (k=3, 3 unrolled peel rounds) over the
    * co-purchase graph: each round drops nodes with degree < k and
    * their incident edges — the standard dense-subgraph screen (spam
    * rings, bot cliques, well-connected catalog cores). One degree
    * aggregation + two semi-joins per round, every shuffle carrying
    * (long, long) edges only; round results are localCheckpoint'd so
    * no round replays its predecessors. A fixed round count keeps the
    * oracle replayable CTE-for-CTE (the q_label_prop discipline);
    * at 100 TB the same loop runs to fixpoint with a driver-side
    * emptiness check per round. Emits surviving nodes with their
    * residual in-core degree. */
  private[graft] def qKcore(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val half = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    var e = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    for (_ <- 1 to 3) {
      val keep = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= 3).select(col("u"))
        .localCheckpoint(eager = false)
      e = e.join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(eager = false)
    }
    e.groupBy(col("u").as("node")).agg(count(lit(1)).as("core_degree"))
      .orderBy(col("node"))
  }

  /** Degree distribution of the co-purchase graph — the power-law
    * audit run before trusting any graph algorithm's cost model (a
    * heavy tail says: salt the hubs, cap the wedges). Two aggregations
    * (node degree, then nodes per degree), both shuffling only longs;
    * output is bounded by the max degree, not the data. */
  private[graft] def qDegreeDist(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val half = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val edges = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
    edges.groupBy(col("u")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))
  }

  /** Degree assortativity of the co-purchase graph: Pearson r between
    * the endpoint degrees over every directed edge — do hubs link to
    * hubs (r>0, social-style) or to leaves (r<0, hub-and-spoke)? The
    * number that decides whether hub-capping (q_link_pred's guard) is
    * load-bearing. Degrees join back onto the edge list (two narrow
    * hash joins on the node key); five exact integer moments, one
    * fixed double tree. */
  private[graft] def qAssortativity(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val half = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val edges = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
    edges
      .join(deg.select(col("u"), col("d").as("du")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
      .agg(count(lit(1)).as("n_edges"),
        sum(col("du")).as("sx"), sum(col("dv")).as("sy"),
        sum(col("du") * col("du")).as("sxx"),
        sum(col("dv") * col("dv")).as("syy"),
        sum(col("du") * col("dv")).as("sxy"))
      .withColumn("assortativity",
        (col("n_edges") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n_edges") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n_edges") * col("syy") - col("sy") * col("sy")).cast("double"))))
      .select(col("n_edges"), col("assortativity"))
  }

  /** Newman modularity of the 2-round label-propagation partition
    * over the co-purchase graph — the quality score that tells you
    * whether the communities the propagation found are real
    * structure or noise (Q≈0). Exact-integer formulation:
    * Q = Σ_c (4m·e_c − d_c²) / (4m²), so the numerator is a sum of
    * longs (intra-edge counts and community degree sums from two
    * narrow joins against the broadcast-size label table) and the
    * ONLY double op is the final division. Reuses LabelProp.run —
    * the partition scored is literally q_label_prop's output. */
  private[graft] def qModularity(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val half = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    val edges = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    val labels = graft.ops.LabelProp.run(edges, rounds = 2)
      .localCheckpoint(eager = false)
    val m = half.agg(count(lit(1)).as("m"))
    val intra = half
      .join(labels.select(col("node").as("u"), col("lab").as("lu")), "u")
      .join(labels.select(col("node").as("v"), col("lab").as("lv")), "v")
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("community")).agg(count(lit(1)).as("e_c"))
    val degc = edges
      .join(labels.select(col("node").as("u"), col("lab")), "u")
      .groupBy(col("lab").as("community")).agg(count(lit(1)).as("d_c"))
    degc.join(intra, Seq("community"), "left")
      .withColumn("e_c", coalesce(col("e_c"), lit(0L)))
      .crossJoin(broadcast(m))
      .agg(max(col("m")).as("m"), count(lit(1)).as("n_communities"),
        sum(lit(4L) * col("m") * col("e_c") - col("d_c") * col("d_c"))
          .as("num"))
      .withColumn("modularity",
        col("num").cast("double") / (lit(4L) * col("m") * col("m")).cast("double"))
      .select(col("m"), col("n_communities"), col("modularity"))
  }

  /** Multi-source BFS hop distances over the co-purchase graph (parts
    * appearing in the same order), seeds = part keys ≡0 mod 100 — the
    * iterative-traversal operator class (CC tells you the cluster, BFS
    * the distance). Level-synchronous frontier expansion: one
    * edge-join + one anti-join per level, frontier count only to the
    * driver (ops/Bfs.scala). Oracle = recursive-CTE reachability with
    * min(dist). */
  private[graft] def qBfs(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    val seeds = edges.select(col("u").as("node")).distinct()
      .filter(col("node") % 100 === 0)
    graft.ops.Bfs.distances(edges, seeds).orderBy(col("node"))
  }

  /** Weighted shortest paths (distance to the nearest hub) over a
    * sparsified co-purchase graph — Bellman-Ford relaxation
    * (ops/Bfs.weightedDistances): the weighted complement of q_bfs's
    * unit-hop traversal. Deterministic weights 1 + (u+v) mod 5; the
    * (u+v) mod 7 sparsifier keeps multi-hop structure (the dense graph
    * is all but 1 hop deep). Oracle = cost-bounded recursive-CTE
    * reachability with min(cost). */
  private[graft] def qSssp(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey") &&
          (col("a.l_partkey") + col("b.l_partkey")) % 7 === 0)
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .withColumn("w", lit(1L) + (col("u") + col("v")) % 5)
      // hash-partition by the join side ONCE before checkpointing: the
      // checkpointed relation keeps its outputPartitioning, so every
      // relaxation sweep's edges⋈dist join reuses it instead of
      // re-shuffling the edge table each sweep (~4 sweeps × rounds)
      .repartition(col("u"))
      .localCheckpoint(eager = false)
    val seeds = edges.select(col("u").as("node")).distinct()
      .filter(col("node") % 1000 === 0)
    // the oracle's recursion is bounded at cost < 100, which omits any
    // node whose TRUE shortest distance reaches the horizon (a path
    // under the horizon would itself be the shorter distance) — the
    // engine applies the identical horizon so the contract cannot
    // silently diverge on a deeper graph (observed max is 18 at sf0.1)
    graft.ops.Bfs.weightedDistances(edges, seeds)
      .filter(col("dist") < 100).orderBy(col("node"))
  }

  /** Label-propagation community detection (2 synchronous rounds,
    * deterministic min-label ties) over the co-purchase graph — the
    * community member of the graph family; CC/BFS/PageRank/triangles
    * answer reachability/centrality/density, this answers membership.
    * Output: per-community size and smallest member. */
  private[graft] def qLabelProp(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val half = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val edges = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    graft.ops.LabelProp.run(edges, rounds = 2)
      .groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_node"))
      .orderBy(col("community"))
  }

  /** Neighbor-set Jaccard link scores over the co-purchase graph —
    * the normalized companion to q_link_pred's resource-allocation
    * index: |N(x)∩N(y)| from the same hub-capped wedge join,
    * |N(x)∪N(y)| = d(x)+d(y)−common, similarity exact ppm. Candidate
    * pairs only ever materialize through shared neighbors (never
    * all-pairs), and the hub cap bounds any node's wedge fan-out. */
  private[graft] def qGraphJaccard(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem").filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val und = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    val edges = und.union(und.select(col("v").as("u"), col("u").as("v")))
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .localCheckpoint(eager = false)
    val mid = edges.join(deg.filter(col("d") <= 64), "u")
    val common = mid.as("e1").join(mid.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .groupBy(col("e1.v").as("x"), col("e2.v").as("y"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(deg.select(col("u").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("u").as("y"), col("d").as("dy")), "y")
      .select(col("x"), col("y"), col("n_common"),
        expr("n_common * 1000000 div (dx + dy - n_common)")
          .as("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("x"), col("y")).limit(30)
      .select(col("x"), col("y"), col("n_common"), col("jaccard_ppm"))
      .orderBy(col("x"), col("y"))
  }

  /** One Borůvka round of distributed minimum-spanning-forest — the
    * MST primitive that parallelizes where Kruskal's sort-and-union
    * does not: every node picks its cheapest incident edge in ONE
    * grouped min (deterministic (w, neighbor) tie-break), picks are
    * canonicalized and deduplicated, and the round's contraction
    * statistics (picked edges, mutual picks, forest weight) fall out
    * of counting. Per-round shuffle carries one (node, edge) pair
    * per node — the textbook log-rounds MST building block. */
  private[graft] def qBoruvkaRound(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey") &&
          (col("a.l_partkey") + col("b.l_partkey")) % 7 === 0)
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .withColumn("w", lit(1L) + (col("u") + col("v")) % 5)
      .localCheckpoint(eager = false)
    val adj = edges.unionByName(
      edges.select(col("v").as("u"), col("u").as("v"), col("w")))
    val picks = adj
      .groupBy(col("u"))
      .agg(min(struct(col("w"), col("v"))).as("mn"))
      .select(col("u"), col("mn.v").as("v"), col("mn.w").as("w"))
    val canon = picks.select(least(col("u"), col("v")).as("a"),
      greatest(col("u"), col("v")).as("b"), col("w"))
    val chosen = canon.groupBy(col("a"), col("b"))
      .agg(max(col("w")).as("w"), count(lit(1)).as("times"))
    chosen.agg(count(lit(1)).as("n_chosen"),
        sum(when(col("times") === 2, 1L).otherwise(0L)).as("mutual_pairs"),
        sum(col("w")).as("forest_weight"))
      .crossJoin(broadcast(
        adj.select(col("u")).distinct().agg(count(lit(1)).as("n_nodes"))))
      .select(col("n_nodes"), col("n_chosen"), col("mutual_pairs"),
        col("forest_weight"))
  }

  /** Diameter probe of the co-purchase graph — per-seed eccentricity
    * from three md5-chosen sources via the engine's level-synchronous
    * multi-source BFS, reported with the max (a certified LOWER bound
    * on the true diameter — the standard scalable substitute for the
    * all-pairs computation nobody runs at graph scale). Each BFS
    * level is one frontier⋈edges join + anti-join; only frontier
    * counts cross to the driver. */
  private[graft] def qDiameterProbe(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges0 = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      // partitioned by the frontier-join side before the checkpoint —
      // each BFS level's frontier⋈edges join then reuses the stored
      // partitioning instead of re-shuffling the edge table per level
      .repartition(col("u"))
      .localCheckpoint(eager = false)
    val seeds = edges0.select(col("u").as("node")).distinct()
      .withColumn("h", h60(concat(lit("dp|"), col("node").cast("string"))))
      .orderBy(col("h"), col("node")).limit(3).drop("h")
    // the three probes run as ONE labeled multi-source BFS (src = the
    // seed id): per level a single frontier⋈edges join advances all
    // three traversals, so the whole probe costs max(ecc) scheduling
    // round-trips with one job per level — no per-seed loops, no
    // driver-side thread orchestration, no ids on the driver
    val perSeed = graft.ops.Bfs.labeledDistances(edges0,
        seeds.select(col("node").as("src"), col("node")))
      .groupBy(col("src").as("seed"))
      .agg(count(lit(1)).as("n_reached"), max(col("dist")).as("eccentricity"))
    val mx = perSeed.agg(max(col("eccentricity")).as("diameter_lower_bound"))
    perSeed
      .crossJoin(broadcast(mx))
      .select(col("seed"), col("n_reached"), col("eccentricity"),
        col("diameter_lower_bound"))
      .orderBy(col("seed"))
  }

  /** k-core decomposition (ops/KCore.scala — distributed degree
    * peeling, the graph sparsifier) over a planted-structure graph
    * whose coreness is known analytically: a K5 clique (coreness 4),
    * a 20-cycle (2), ten 5-chains and twenty clique-attached spokes
    * (1). The ENGINE peels generically — join-per-round, live-node
    * set tracked so tendril midpoints that lose their last neighbor
    * still get labeled — while the oracle enumerates the planted
    * answer; KCoreSpec pins agreement with a sequential reference
    * peeler on random graphs, so the planted case cannot overfit. */
  private[graft] def qCoreness(s: SparkSession, dir: String): DataFrame = {
    val r = s.range(0, 25).select(col("id"))
    val clique = r.filter(col("id") < 5).as("a")
      .crossJoin(r.filter(col("id") < 5).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("u"), col("b.id").as("v"))
    val cycle = s.range(0, 20).select(
      least(col("id") + 10, lit(10) + (col("id") + 1) % 20).as("u"),
      greatest(col("id") + 10, lit(10) + (col("id") + 1) % 20).as("v"))
    val chains = s.range(0, 40).select(
      expr("30 + (id div 4) * 5 + id % 4").as("u"),
      expr("30 + (id div 4) * 5 + id % 4 + 1").as("v"))
    val spokes = s.range(0, 20).select(
      (col("id") % 5).as("u"), (col("id") + 80).as("v"))
    val edges = clique.unionByName(cycle).unionByName(chains).unionByName(spokes)
    graft.ops.KCore.coreness(s, edges)
      .select(col("node").cast("long").as("node"), col("coreness"))
      .orderBy(col("node"))
  }

  private[graft] def graphQueryMap: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_coreness" -> (qCoreness _),
    "q_triangles" -> (qTriangles _),
    "q_pagerank" -> (qPagerank _),
    "q_cc_star" -> (qCcStar _),
    "q_bfs" -> (qBfs _),
    "q_sssp" -> (qSssp _),
    "q_label_prop" -> (qLabelProp _),
    "q_kcore" -> (qKcore _),
    "q_degree_dist" -> (qDegreeDist _),
    "q_assortativity" -> (qAssortativity _),
    "q_modularity" -> (qModularity _),
    "q_graph_jaccard" -> (qGraphJaccard _),
    "q_boruvka_round" -> (qBoruvkaRound _),
    "q_diameter_probe" -> (qDiameterProbe _),
  )

  private[graft] def graphOracleMap: Map[String, String] = Map(
    "q_coreness" ->
      """WITH nodes AS (
        |  SELECT x AS node, 4 AS coreness FROM generate_series(0, 4) g(x)
        |  UNION ALL
        |  SELECT x, 2 FROM generate_series(10, 29) g(x)
        |  UNION ALL
        |  SELECT x, 1 FROM generate_series(30, 79) g(x)
        |  UNION ALL
        |  SELECT x, 1 FROM generate_series(80, 99) g(x))
        |SELECT CAST(node AS BIGINT) AS node,
        |       CAST(coreness AS BIGINT) AS coreness
        |FROM nodes ORDER BY node""".stripMargin,
    "q_triangles" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM edges e1 JOIN edges e2 ON e1.v = e2.u
        |  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT a, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM tri GROUP BY a ORDER BY a""".stripMargin,
    "q_pagerank" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |und AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
        |pr0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
        |pr1 AS (
        |  SELECT e.v AS node, 150000 + (85 * sum(p.pr // d.d)) // 100 AS pr
        |  FROM edges e JOIN pr0 p ON e.u = p.node JOIN deg d ON e.u = d.u
        |  GROUP BY e.v),
        |pr2 AS (
        |  SELECT e.v AS node, 150000 + (85 * sum(p.pr // d.d)) // 100 AS pr
        |  FROM edges e JOIN pr1 p ON e.u = p.node JOIN deg d ON e.u = d.u
        |  GROUP BY e.v),
        |pr3 AS (
        |  SELECT e.v AS node, 150000 + (85 * sum(p.pr // d.d)) // 100 AS pr
        |  FROM edges e JOIN pr2 p ON e.u = p.node JOIN deg d ON e.u = d.u
        |  GROUP BY e.v)
        |SELECT pr3.node, CAST(pr3.pr AS BIGINT) AS pr_fp,
        |  CAST(deg.d AS BIGINT) AS degree
        |FROM pr3 JOIN deg ON pr3.node = deg.u
        |ORDER BY pr3.node""".stripMargin,

    // shared SQL text: the oracle runs the same string spark.sql ran,
    "q_cc_star" -> dupClustersOracle,
    "q_bfs" ->
      """WITH RECURSIVE items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |walk AS (
        |  SELECT u AS node, 0 AS dist
        |  FROM (SELECT DISTINCT u FROM edges) s WHERE u % 100 = 0
        |  UNION
        |  SELECT e.v, w.dist + 1 FROM edges e JOIN walk w ON e.u = w.node
        |  WHERE w.dist < 30)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,
    "q_sssp" ->
      """WITH RECURSIVE items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v,
        |    1 + (a.l_partkey + b.l_partkey) % 5 AS w
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  WHERE (a.l_partkey + b.l_partkey) % 7 = 0),
        |walk AS (
        |  SELECT u AS node, CAST(0 AS BIGINT) AS dist
        |  FROM (SELECT DISTINCT u FROM edges) s WHERE u % 1000 = 0
        |  UNION
        |  SELECT e.v, w.dist + e.w FROM edges e JOIN walk w ON e.u = w.node
        |  WHERE w.dist + e.w < 100)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,
    "q_label_prop" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |half AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM half UNION ALL SELECT v, u FROM half),
        |l0 AS (SELECT DISTINCT u AS node, u AS lab FROM edges),
        |c1 AS (
        |  SELECT e.u AS node, l.lab, CAST(count(*) AS BIGINT) AS n
        |  FROM edges e JOIN l0 l ON e.v = l.node GROUP BY 1, 2),
        |l1 AS (
        |  SELECT node, lab FROM (
        |    SELECT node, lab,
        |      row_number() OVER (PARTITION BY node ORDER BY n DESC, lab) AS rn
        |    FROM c1) x WHERE rn = 1),
        |c2 AS (
        |  SELECT e.u AS node, l.lab, CAST(count(*) AS BIGINT) AS n
        |  FROM edges e JOIN l1 l ON e.v = l.node GROUP BY 1, 2),
        |l2 AS (
        |  SELECT node, lab FROM (
        |    SELECT node, lab,
        |      row_number() OVER (PARTITION BY node ORDER BY n DESC, lab) AS rn
        |    FROM c2) x WHERE rn = 1)
        |SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members,
        |  min(node) AS min_node
        |FROM l2 GROUP BY lab ORDER BY community""".stripMargin,
    "q_kcore" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |half AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM half UNION ALL SELECT v, u FROM half),
        |k1 AS (SELECT u FROM (SELECT u, count(*) AS d FROM edges GROUP BY u)
        |       WHERE d >= 3),
        |e1 AS (SELECT e.u, e.v FROM edges e
        |       JOIN k1 a ON e.u = a.u JOIN k1 b ON e.v = b.u),
        |k2 AS (SELECT u FROM (SELECT u, count(*) AS d FROM e1 GROUP BY u)
        |       WHERE d >= 3),
        |e2 AS (SELECT e.u, e.v FROM e1 e
        |       JOIN k2 a ON e.u = a.u JOIN k2 b ON e.v = b.u),
        |k3 AS (SELECT u FROM (SELECT u, count(*) AS d FROM e2 GROUP BY u)
        |       WHERE d >= 3),
        |e3 AS (SELECT e.u, e.v FROM e2 e
        |       JOIN k3 a ON e.u = a.u JOIN k3 b ON e.v = b.u)
        |SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
        |FROM e3 GROUP BY u ORDER BY node""".stripMargin,
    "q_degree_dist" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |half AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM half UNION ALL SELECT v, u FROM half),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree
        |        FROM edges GROUP BY u)
        |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM deg GROUP BY degree ORDER BY degree""".stripMargin,
    "q_assortativity" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |half AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM half UNION ALL SELECT v, u FROM half),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |    CAST(sum(du.d) AS BIGINT) AS sx, CAST(sum(dv.d) AS BIGINT) AS sy,
        |    CAST(sum(du.d * du.d) AS BIGINT) AS sxx,
        |    CAST(sum(dv.d * dv.d) AS BIGINT) AS syy,
        |    CAST(sum(du.d * dv.d) AS BIGINT) AS sxy
        |  FROM edges e JOIN deg du ON e.u = du.u JOIN deg dv ON e.v = dv.u)
        |SELECT n_edges,
        |  CAST(n_edges * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n_edges * syy - sy * sy AS DOUBLE))) AS assortativity
        |FROM m""".stripMargin,
    "q_modularity" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |half AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM half UNION ALL SELECT v, u FROM half),
        |l0 AS (SELECT DISTINCT u AS node, u AS lab FROM edges),
        |c1 AS (
        |  SELECT e.u AS node, l.lab, CAST(count(*) AS BIGINT) AS n
        |  FROM edges e JOIN l0 l ON e.v = l.node GROUP BY 1, 2),
        |l1 AS (
        |  SELECT node, lab FROM (
        |    SELECT node, lab,
        |      row_number() OVER (PARTITION BY node ORDER BY n DESC, lab) AS rn
        |    FROM c1) x WHERE rn = 1),
        |c2 AS (
        |  SELECT e.u AS node, l.lab, CAST(count(*) AS BIGINT) AS n
        |  FROM edges e JOIN l1 l ON e.v = l.node GROUP BY 1, 2),
        |l2 AS (
        |  SELECT node, lab FROM (
        |    SELECT node, lab,
        |      row_number() OVER (PARTITION BY node ORDER BY n DESC, lab) AS rn
        |    FROM c2) x WHERE rn = 1),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM half),
        |intra AS (
        |  SELECT lu.lab AS community, CAST(count(*) AS BIGINT) AS e_c
        |  FROM half h JOIN l2 lu ON h.u = lu.node
        |  JOIN l2 lv ON h.v = lv.node
        |  WHERE lu.lab = lv.lab GROUP BY lu.lab),
        |degc AS (
        |  SELECT l.lab AS community, CAST(count(*) AS BIGINT) AS d_c
        |  FROM edges e JOIN l2 l ON e.u = l.node GROUP BY l.lab),
        |per AS (
        |  SELECT d.community, d.d_c, COALESCE(i.e_c, 0) AS e_c, m
        |  FROM degc d LEFT JOIN intra i ON d.community = i.community
        |  CROSS JOIN mm),
        |agg AS (
        |  SELECT CAST(max(m) AS BIGINT) AS m,
        |    CAST(count(*) AS BIGINT) AS n_communities,
        |    CAST(sum(4 * m * e_c - d_c * d_c) AS BIGINT) AS num
        |  FROM per)
        |SELECT m, n_communities,
        |  CAST(num AS DOUBLE) / CAST(4 * m * m AS DOUBLE) AS modularity
        |FROM agg""".stripMargin,
    "q_graph_jaccard" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |und AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
        |mid AS (SELECT e.u, e.v FROM edges e JOIN deg d ON e.u = d.u
        |        WHERE d.d <= 64),
        |common AS (
        |  SELECT e1.v AS x, e2.v AS y, CAST(count(*) AS BIGINT) AS n_common
        |  FROM mid e1 JOIN mid e2 ON e1.u = e2.u AND e1.v < e2.v
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT x, y, n_common,
        |    n_common * 1000000 // (dx.d + dy.d - n_common) AS jaccard_ppm
        |  FROM common
        |  JOIN deg dx ON common.x = dx.u
        |  JOIN deg dy ON common.y = dy.u),
        |top AS (SELECT * FROM scored ORDER BY jaccard_ppm DESC, x, y
        |  LIMIT 30)
        |SELECT x, y, n_common, jaccard_ppm FROM top ORDER BY x, y""".stripMargin,
    "q_boruvka_round" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |edges AS (
        |  SELECT u, v, 1 + (u + v) % 5 AS w FROM (
        |    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |    FROM items a JOIN items b
        |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |    WHERE (a.l_partkey + b.l_partkey) % 7 = 0) e),
        |adj AS (
        |  SELECT u, v, w FROM edges UNION ALL SELECT v AS u, u AS v, w FROM edges),
        |picks AS (
        |  SELECT u, v, w FROM (
        |    SELECT u, v, w, row_number() OVER (PARTITION BY u ORDER BY w, v) AS rn
        |    FROM adj) x WHERE rn = 1),
        |canon AS (
        |  SELECT least(u, v) AS a, greatest(u, v) AS b, w FROM picks),
        |chosen AS (
        |  SELECT a, b, CAST(max(w) AS BIGINT) AS w, count(*) AS times
        |  FROM canon GROUP BY a, b),
        |nn AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_nodes FROM adj)
        |SELECT n_nodes, CAST(count(*) AS BIGINT) AS n_chosen,
        |  CAST(sum(CASE WHEN times = 2 THEN 1 ELSE 0 END) AS BIGINT) AS mutual_pairs,
        |  CAST(sum(w) AS BIGINT) AS forest_weight
        |FROM chosen CROSS JOIN nn
        |GROUP BY n_nodes""".stripMargin,
    "q_diameter_probe" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey % 10 = 0),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |seeds AS (
        |  SELECT CAST(node AS BIGINT) AS node FROM (SELECT DISTINCT u AS node FROM edges) n
        |  ORDER BY CAST('0x' || substr(md5('dp|' || CAST(node AS VARCHAR)), 1, 15) AS BIGINT), node
        |  LIMIT 3),
        |walk AS (
        |  WITH RECURSIVE w(seed, node, dist) AS (
        |    SELECT node AS seed, node, 0 FROM seeds
        |    UNION
        |    SELECT w.seed, e.v, w.dist + 1
        |    FROM w JOIN edges e ON w.node = e.u
        |    WHERE w.dist < 30)
        |  SELECT seed, node, CAST(min(dist) AS BIGINT) AS dist
        |  FROM w GROUP BY seed, node),
        |per AS (
        |  SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
        |    CAST(max(dist) AS BIGINT) AS eccentricity
        |  FROM walk GROUP BY seed),
        |mx AS (SELECT CAST(max(eccentricity) AS BIGINT) AS diameter_lower_bound FROM per)
        |SELECT seed, n_reached, eccentricity, diameter_lower_bound
        |FROM per CROSS JOIN mx
        |ORDER BY seed""".stripMargin,
  )
}
