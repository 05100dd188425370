package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Ranking}

/** BM25 ranking and containment near-dup semantics. */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 scores rank by term frequency and penalize length") {
    val docs = Seq(
      (1L, "cat cat cat dog"),       // tf(cat)=3, short
      (2L, "cat dog " + Seq.fill(50)("filler").mkString(" ")), // tf=1, long
      (3L, "dog dog dog dog"),       // tf(cat)=0
      (4L, "cat dog")                // tf=1, shortest
    ).toDF("doc_id", "text")
    val got = Ranking.bm25(docs, "doc_id", "text", Seq("cat"))
      .select($"doc_id", $"tf_0", $"score_fp")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L)._1 === 3L && got(3L)._1 === 0L)
    assert(got(3L)._2 === 0L)                    // absent term scores zero
    assert(got(1L)._2 > got(4L)._2)              // higher tf wins
    assert(got(4L)._2 > got(2L)._2)              // same tf: shorter doc wins
  }

  test("bm25 cross-term score is the sum of fixed-point contributions") {
    val docs = Seq((1L, "a b c"), (2L, "a a b")).toDF("doc_id", "text")
    val both = Ranking.bm25(docs, "doc_id", "text", Seq("a", "b"))
      .select($"doc_id", $"score_fp").as[(Long, Long)].collect().toMap
    val a = Ranking.bm25(docs, "doc_id", "text", Seq("a"))
      .select($"doc_id", $"score_fp").as[(Long, Long)].collect().toMap
    val b = Ranking.bm25(docs, "doc_id", "text", Seq("b"))
      .select($"doc_id", $"score_fp").as[(Long, Long)].collect().toMap
    assert(both(1L) === a(1L) + b(1L))
    assert(both(2L) === a(2L) + b(2L))
  }

  test("containment catches a sub-document that Jaccard misses") {
    val quoted = "alpha beta gamma delta epsilon zeta eta theta"
    val host = quoted + " " + (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, quoted),                  // fully contained in 2
      (2L, host),
      (3L, "totally different words here with no overlap at all ok")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", k = 5,
        minContain = 0.9)
      .select($"d1", $"d2", $"contain_in_1").as[(Long, Long, Double)].collect()
    assert(cont.toSeq === Seq((1L, 2L, 1.0)))    // doc1 fully inside doc2
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", k = 5,
        minSim = 0.5).count()
    assert(jac === 0L)                           // symmetric Jaccard is blind
  }

  test("prefix-filtered jaccard equals the plain inverted-index join") {
    // every doc shares a boilerplate phrase (the hot-shingle case the
    // df cap exists for); docs 1/2 are near-dups, 3/4 unrelated
    val boiler = "standard license header text common to all docs"
    val docs = Seq(
      (1L, boiler + " alpha beta gamma delta epsilon zeta eta"),
      (2L, boiler + " alpha beta gamma delta epsilon zeta theta"),
      (3L, boiler + " one two three four five six seven eight"),
      (4L, boiler + " red orange yellow green blue indigo violet")
    ).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"d1", $"d2", $"shared", $"n1", $"n2")
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val plain = norm(Dedup.jaccardPairs(docs, "doc_id", "text", k = 5,
      minSim = 0.3, maxShingleDf = Int.MaxValue))
    val prefixed = norm(Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
      k = 5, minSim = 0.3))
    assert(plain.nonEmpty)              // the boilerplate makes pairs qualify
    assert(prefixed === plain)          // candidate reduction is lossless
  }

  test("containment pair generation respects the shingle df cap") {
    // the same 5-token phrase in every doc: with cap 2 the shared
    // shingle is a stop shingle, so no candidates survive
    val docs = (1L to 4L).map(i => (i, s"one two three four five x$i"))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(docs, "doc_id", "text", k = 5,
      minContain = 0.1, maxShingleDf = 2)
    assert(capped.count() === 0L)
    val uncapped = Dedup.containmentPairs(docs, "doc_id", "text", k = 5,
      minContain = 0.1, maxShingleDf = Int.MaxValue)
    assert(uncapped.count() === 6L)              // all C(4,2) pairs
  }
}
