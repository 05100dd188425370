package graft

import org.apache.spark.sql.functions._

import graft.ops.KCore

/** Distributed degree peeling vs a sequential reference coreness
  * (the textbook min-degree removal), on random graphs — the planted
  * q_coreness fixture cannot overfit if arbitrary topologies agree. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: repeatedly remove a minimum-degree node;
    * coreness(v) = max over time of min-degree seen when v is removed
    * (the classic Batagelj–Zaveršnik invariant, O(E log V) here). */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set.empty) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set.empty) += u
    }
    val core = scala.collection.mutable.Map.empty[Long, Long]
    var level = 0L
    while (adj.nonEmpty) {
      val minDeg = adj.valuesIterator.map(_.size).min.toLong
      if (minDeg > level) level = minDeg
      val (node, nbrs) = adj.minBy(_._2.size)
      core(node) = level
      nbrs.foreach { n =>
        val s = adj(n); s -= node
      }
      adj.remove(node)
      ()
    }
    core.toMap
  }

  test("distributed peeling matches the sequential reference on random " +
    "graphs (several densities)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 4) {
      val n = 30 + trial * 10
      val p = 0.05 + 0.05 * trial
      val edges = (for {
        u <- 0L until n
        v <- (u + 1) until n
        if rnd.nextDouble() < p
      } yield (u, v)).toSeq
      if (edges.nonEmpty) {
        val df = edges.toDF("u", "v")
        val got = KCore.coreness(spark, df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = reference(edges)
        assert(got === want, s"trial $trial (n=$n, p=$p)")
      }
    }
  }

  test("tendril midpoints that lose their last neighbor still get " +
    "labeled (the edges-only formulation drops them)") {
    // path a-b-c: peeling at k=2 removes a and c first; b is then
    // isolated and must STILL be reported with coreness 1
    val got = KCore.coreness(spark, Seq((1L, 2L), (2L, 3L)).toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("round overrun fails loudly") {
    // a 100-chain peels ~50 rounds at k=2; cap at 5 must throw
    val chain = (0L until 100L).map(i => (i, i + 1)).toDF("u", "v")
    val e = intercept[IllegalArgumentException] {
      KCore.coreness(spark, chain, maxRounds = 5)
    }
    assert(e.getMessage.contains("exceeded"))
  }
}
