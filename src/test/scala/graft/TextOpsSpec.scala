package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextOps}

/** Text-quality operators: repetition fractions, PII scrubbing,
  * benchmark contamination. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition ratio flags duplicated n-grams") {
    val docs = Seq(
      (1L, "a b a b a b"),        // 2-grams: ab ba ab ba ab -> 2 uniq of 5
      (2L, "w x y z q"),          // all distinct
      (3L, "solo")                // fewer tokens than k
    ).toDF("doc_id", "text")
    val got = TextOps.withRepetition(docs, "text", 2)
      .select($"doc_id", $"n_2grams", $"uniq_2grams", $"dup_2gram_ratio")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((5L, 2L, 1.0 - 2.0 / 5.0)))
    assert(got(2L) === ((4L, 4L, 0.0)))
    assert(got(3L) === ((0L, 0L, 0.0)))
  }

  test("pii scrub counts and redacts emails and urls") {
    val docs = Seq(
      (1L, "reach me at jane.doe@corp.example.org or on https://site.example/x page"),
      (2L, "no contact info here")).toDF("doc_id", "text")
    val got = TextOps.withPiiScrub(docs, "text")
      .select($"doc_id", $"n_emails", $"n_urls", $"scrubbed")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L)._1 === 1L && got(1L)._2 === 1L)
    assert(got(1L)._3 === "reach me at <EMAIL> or on <URL> page")
    assert(got(2L) === ((0L, 0L, "no contact info here")))
  }

  test("dupClusters finds connected components with min-id labels") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("d1", "d2")
    val got = Dedup.dupClusters(pairs, "d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (20L, 20L, true), (21L, 20L, false)))
  }

  test("dupClusters fails loudly when a component's diameter exceeds maxIter") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("d1", "d2")
    intercept[IllegalStateException] {
      Dedup.dupClusters(chain, "d1", "d2", maxIter = 2).collect()
    }
    // and succeeds once the budget covers the diameter
    val ok = Dedup.dupClusters(chain, "d1", "d2", maxIter = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ok === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("contamination is 1.0 for benchmark members and 0 for disjoint docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // benchmark member
      (2L, "one two three four five six seven"),     // disjoint
      (3L, "x alpha beta gamma delta epsilon y")     // partial overlap
    ).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 1L)
    val got = Dedup.contamination(docs, "doc_id", "text", bench, "text", k = 5)
      .select($"doc_id", $"n_shingles", $"n_contaminated", $"contamination")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L)._3 === 1.0)
    assert(got(2L)._3 === 0.0)
    // doc 3's 3 shingles: exactly one ("alpha beta gamma delta epsilon")
    // is in the benchmark
    assert(got(3L) === ((3L, 1L, 1.0 / 3.0)))
  }

  test("mergePair folds left-to-right without overlap (aaa + (a,a) -> [aa, a])") {
    val df = Seq(
      (Seq("a", "a", "a"), "aaa"),
      (Seq("a", "b", "a", "b"), "abab"),
      (Seq("x", "y"), "xy")
    ).toDF("syms", "tag")
    val got = df.select($"tag", TextOps.mergePair($"syms", "a", "a").as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("aaa") === Seq("aa", "a"))
    assert(got("abab") === Seq("a", "b", "a", "b"))
    assert(got("xy") === Seq("x", "y"))
    val ab = df.select($"tag", TextOps.mergePair($"syms", "a", "b").as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(ab("abab") === Seq("ab", "ab"))
  }

  test("bpeTrain learns the dominant pair first and merge counts decrease") {
    // corpus engineered so "lo" is the clear first merge: "low" x6,
    // "lower" x2, "lowest" x3 share l-o; then "ow" merges as (lo, w)
    val corpus = Seq(
      (1L, ("low " * 6).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("lowest " * 3).trim)
    ).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(corpus, "text", nMerges = 3)
    assert(merges.length === 3)
    assert(merges.head._1 === "l" && merges.head._2 === "o" && merges.head._3 === 11L)
    assert(merges(1) === (("lo", "w", 11L)))
    // counts never increase across rounds (pair merging can only shrink)
    assert(merges.map(_._3) === merges.map(_._3).sorted.reverse)
  }

  test("bpeTrain stops early when no pairs remain") {
    val tiny = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(tiny, "text", nMerges = 5)
    assert(merges.isEmpty) // all words are single characters
  }

  test("property: mergePair fold equals the left-to-right scan on random arrays") {
    // reference implementation: explicit non-overlapping left-to-right scan
    def refMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "ab", "aa")
    val cases = (0 until 300).map { i =>
      val syms = Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size)))
      (i.toLong, syms)
    }
    val df = cases.toDF("id", "syms")
    for ((a, b) <- Seq(("a", "b"), ("a", "a"), ("ab", "c"), ("b", "aa"))) {
      val got = df.select($"id", TextOps.mergePair($"syms", a, b).as("m"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      cases.foreach { case (id, syms) =>
        assert(got(id) === refMerge(syms, a, b),
          s"pair ($a,$b) on $syms: ${got(id)} != ${refMerge(syms, a, b)}")
      }
    }
  }

  test("cdc chunking is shift-local: a prefix edit only disturbs chunks before the first boundary") {
    // the CDC property that motivates content-defined over fixed-size
    // chunking: prepending text re-cuts at most the prefix region;
    // every chunk at or after the first boundary hash-survives
    val doc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy($"doc_id").limit(1).select($"text").head().getString(0)
    val both = Seq((0L, doc), (1L, "prepended junk words " + doc))
      .toDF("doc_id", "text")
    val chunks = TextOps.cdcChunks(both, "doc_id", "text")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getString(3)).toSeq }
    // everything from the original's first boundary on must survive as
    // a suffix of the edited version's chunk sequence (the prepended
    // words may themselves introduce boundaries, so compare suffixes)
    val stable = chunks(0L).tail
    assert(chunks(1L).takeRight(stable.size) === stable,
      "chunks after the first boundary must be content-stable under a prefix edit")
  }
}
