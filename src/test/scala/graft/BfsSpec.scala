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
}
