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

  test("bfs fails loudly when the graph outruns maxIter") {
    val edges = undirected((1L to 6L).sliding(2).map(w => (w(0), w(1))).toSeq: _*)
    val e = intercept[IllegalStateException] {
      Bfs.distances(edges, Seq(1L).toDF("node"), maxIter = 3).count()
    }
    assert(e.getMessage.contains("censored"))
  }
}
