package graft

import org.apache.spark.sql.functions._

import graft.functions.{chunking, ChunkDocument}

/** The custom Generator (UDTF surface): overlapping token-window
  * document chunking. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk_document emits overlapping windows covering every token") {
    val df = Seq((1L, (0 until 10).map(i => s"t$i"))).toDF("id", "toks")
    val rows = df.select($"id",
        chunking.chunk_document($"toks", 4, 1).as(Seq("chunk_idx", "chunk", "n")))
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    // step = 3: starts 0,3,6,9
    assert(rows.toSeq === Seq(
      (0, "t0 t1 t2 t3", 4),
      (1, "t3 t4 t5 t6", 4),
      (2, "t6 t7 t8 t9", 4),
      (3, "t9", 1)))
  }

  test("chunk_document emits one window for short docs, none for empty/null") {
    val df = Seq(
      (1L, Some(Seq("a", "b"))),
      (2L, Some(Seq.empty[String])),
      (3L, Option.empty[Seq[String]])).toDF("id", "toks")
    val rows = df.select($"id",
        chunking.chunk_document($"toks", 64, 16).as(Seq("chunk_idx", "chunk", "n")))
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3)))
    assert(rows.toSeq === Seq((1L, "a b", 2)))
  }

  test("chunk_document rejects overlap >= maxTokens") {
    intercept[IllegalArgumentException] {
      ChunkDocument(org.apache.spark.sql.catalyst.expressions.Literal(null), 16, 16)
    }
  }

  test("chunk_document works as a SQL generator (LATERAL VIEW)") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chunk_document",
      es => ChunkDocument(es.head,
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int]),
      "scala_udf")
    Seq((7L, "a b c d e f")).toDF("id", "text").createOrReplaceTempView("chunk_in")
    val got = spark.sql(
      """SELECT id, c.chunk_idx, c.chunk, c.n_chunk_tokens
        |FROM chunk_in
        |LATERAL VIEW chunk_document(split(text, ' '), 4, 2) c""".stripMargin)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(got.toSeq === Seq((0, "a b c d", 4), (1, "c d e f", 4), (2, "e f", 2)))
  }

  test("every token position is covered by at least one chunk") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // chunk c covers positions [c*48, c*48 + n) — the distinct union
    // per doc must be exactly 0..n_tokens-1
    val covered = docs
      .select($"doc_id",
        chunking.chunk_document(split($"text", " "), 64, 16)
          .as(Seq("chunk_idx", "chunk", "n")))
      .select($"doc_id",
        explode(sequence($"chunk_idx" * 48, $"chunk_idx" * 48 + $"n" - 1)).as("pos"))
      .groupBy($"doc_id")
      .agg(countDistinct($"pos").as("covered"), max($"pos").as("max_pos"))
    val mismatches = docs
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
      .join(covered, "doc_id")
      .filter($"covered" =!= $"n_tokens" || $"max_pos" =!= $"n_tokens" - 1)
      .count()
    assert(mismatches === 0)
  }
}
