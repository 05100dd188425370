package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.,
  * Phys. Rev. E 76, 2007) — the community member of the graph family
  * (CC answers "connected?", this answers "densely connected with
  * whom?"). Deterministic variant: all nodes update simultaneously
  * each round, every node adopts the most frequent label among its
  * neighbors, and ties break to the smallest label — so the result is
  * a pure function of the edge set and round count, replayable by the
  * SQL oracle round for round.
  *
  * Scale shape: one round = one join of the edge list against the
  * (node, label) table — both shuffled on the node key and re-usable
  * across rounds — followed by a map-side-combining count and an
  * argmax aggregate. Nothing but the label table (|V| rows) persists
  * between rounds; labels are localCheckpoint'd so the plan stays
  * linear in rounds. Rounds are a fixed budget (community diameter),
  * not |V|.
  */
object LabelProp {

  /** `rounds` synchronous updates over an undirected edge list
    * (`u`, `v` both directions present); returns (node, label). */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    // LAZY checkpoints (round-13): the round count is FIXED — there is
    // no per-round convergence check, so nothing needs a driver action
    // between rounds. Lazy checkpoints still cut lineage (each round's
    // plan is an RDD scan of its predecessor), but all rounds now
    // materialize inside the CALLER's first action as one job instead
    // of rounds+1 eager-materialize round-trips; a caller that consumes
    // the labels twice (q_modularity) still computes them once, because
    // the first action caches the checkpoint blocks.
    var labels = edges.select(col("u").as("node"))
      .distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint(eager = false)
    for (_ <- 0 until rounds) {
      labels = edges
        .join(labels, edges("v") === labels("node"))
        .groupBy(edges("u").as("node2"), col("lab"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("node2").as("node"))
        .agg(max(struct(col("n"), (-col("lab")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("lab"))
        .localCheckpoint(eager = false)
    }
    labels
  }
}
