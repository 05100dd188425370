package graft

import org.apache.spark.sql.functions._

import graft.functions.kernels

/** Native kernel expressions must be semantically identical to the
  * composed-builtin forms they replace (they exist for speed only). */
class KernelsSpec extends SparkSpec {
  import spark.implicits._

  test("word_shingles equals composed-builtin shingling") {
    val docs = Seq(
      "a b c d e f g",
      "x y",                       // shorter than k -> empty
      "a a a a a a",               // duplicates collapse
      "the quick brown fox jumps over the lazy dog").toDF("text")
    val toks = split($"text", " ")
    val k = 5
    val builtin = when(size(toks) >= k,
      array_distinct(transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<string>"))
    val rows = docs.select(
      kernels.word_shingles(toks, k).as("fast"), builtin.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("fixed_point_dot equals interpreted aggregate/zip_with form") {
    val vecs = Seq(
      (Array(1.0f, 2.0f, -3.5f), Array(0.5f, -1.25f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (Array(1e-5f, -1e-5f, 1f), Array(1e-5f, 1e-5f, -1f))).toDF("a", "b")
    val builtin = aggregate(
      zip_with($"a", $"b", (x, y) =>
        floor(x.cast("double") * y.cast("double") * 1e9 + 0.5).cast("long")),
      lit(0L), (acc, t) => acc + t)
    val rows = vecs.select(
      kernels.fixed_point_dot($"a", $"b").as("fast"), builtin.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("fixed_point_dot handles nulls") {
    val df = Seq((Option.empty[Array[Float]], Option(Array(1.0f))))
      .toDF("a", "b")
    assert(df.select(kernels.fixed_point_dot($"a", $"b")).head().isNullAt(0))
  }

  test("fixed_point_dot is null on length mismatch (zip_with parity)") {
    val df = Seq((Array(1.0f, 1.0f, 1.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(kernels.fixed_point_dot($"a", $"b")).head().isNullAt(0))
  }

  test("word_shingles skips null tokens like concat_ws") {
    val df = Seq(Seq(Some("a"), None, Some("b"), Some("c"))).toDF("toks")
    val got = df.select(kernels.word_shingles($"toks", 3)).head().getSeq[String](0)
    val ref = df.select(
      array_distinct(transform(sequence(lit(1), size($"toks") - 2),
        i => concat_ws(" ", slice($"toks", i, lit(3)))))).head().getSeq[String](0)
    assert(got === ref)
  }
}
