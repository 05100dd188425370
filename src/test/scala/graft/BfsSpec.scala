package graft

import org.apache.spark.sql.functions._

import graft.ops.Bfs

/** Level-synchronous BFS: distances, unreachability, loud depth cap. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("u", "v")

  test("bfs computes hop distances from a multi-source seed set") {
    // chain 1-2-3-4-5, branch 3-6; seeds {1, 6}
    val edges = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
    val got = Bfs.distances(edges, Seq(1L, 6L).toDF("node"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 6L -> 0L, 2L -> 1L, 3L -> 1L,
      4L -> 2L, 5L -> 3L))
  }

  test("bfs leaves disconnected components out of the result") {
    val edges = undirected((1L, 2L), (10L, 11L))
    val got = Bfs.distances(edges, Seq(1L).toDF("node"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L))
  }

  test("bellman-ford relaxes an already-settled distance via a cheaper path") {
    // 1-2 costs 10 direct, but 3 via 1-3(1) + 3-2(2): node 2 settles at
    // 10 in round one and must IMPROVE to 3 in round two
    val edges = (Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L)) ++
      Seq((2L, 1L, 10L), (3L, 1L, 1L), (2L, 3L, 2L))).toDF("u", "v", "w")
    val got = Bfs.weightedDistances(edges, Seq(1L).toDF("node"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 3L, 3L -> 1L))
  }

  test("bellman-ford multi-source takes the nearest seed") {
    val edges = undirected((1L, 2L), (2L, 3L), (3L, 4L))
      .withColumn("w", lit(5L))
    val got = Bfs.weightedDistances(edges, Seq(1L, 4L).toDF("node"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 4L -> 0L, 2L -> 5L, 3L -> 5L))
  }

  test("bfs fails loudly when the graph outruns maxIter") {
    val edges = undirected((1L to 6L).sliding(2).map(w => (w(0), w(1))).toSeq: _*)
    val e = intercept[IllegalStateException] {
      Bfs.distances(edges, Seq(1L).toDF("node"), maxIter = 3).count()
    }
    assert(e.getMessage.contains("censored"))
  }

  test("label propagation separates two cliques joined by one bridge") {
    // cliques {1,2,3,4} and {11,12,13,14}, bridge 4-11: the bridge
    // endpoints see 3 clique neighbors vs 1 bridge neighbor, so each
    // clique converges to its own min label and the bridge cannot
    // merge them
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = undirected(
      (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L, 14L)) :+
        ((4L, 11L))): _*)
    val labels = graft.ops.LabelProp.run(edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).map(labels).toSet === Set(1L))
    assert(Seq(11L, 12L, 13L, 14L).map(labels).toSet === Set(11L))
  }

  test("label propagation is deterministic on a tie-heavy ring") {
    // a 6-ring where every node has exactly two neighbors: all counts
    // tie at 1, so the min-label rule fully determines the outcome;
    // two runs must agree exactly
    val ring = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L))
    val a = graft.ops.LabelProp.run(ring, rounds = 2)
      .as[(Long, Long)].collect().sorted
    val b = graft.ops.LabelProp.run(ring, rounds = 2)
      .as[(Long, Long)].collect().sorted
    assert(a === b)
  }
}
