package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical relevance ranking for retrieval-style selection over a
  * document corpus — BM25 in its log-free rational form (the same
  * trick as the engine's rational TF-IDF): the rational idf
  * (N − df + 0.5)/(df + 0.5) replaces Robertson's log of the same
  * ratio so every operation is a basic IEEE op that is bit-identical
  * across engines (no libm transcendentals whose last-bit rounding
  * differs).
  *
  * SEMANTICS CAVEAT — this is a deliberate deviation, not an
  * equivalent: log is monotone, so SINGLE-term rankings match
  * log-idf BM25 exactly, but the cross-term SUM is not
  * order-preserving — the rational idf spreads term weights
  * multiplicatively where the log compresses them (df 1 vs 10 at
  * N=1000: rational ratio ≈ 7.1, log ratio ≈ 1.4), so rare terms
  * dominate multi-term scores more than in log BM25, and for
  * df > N/2 the rational idf stays positive where the log turns
  * negative. The scoring function is exactly what the oracle
  * replays; callers wanting classic log-idf ordering should apply
  * ln() to the idf factor and accept engine-dependent last-bit
  * rounding.
  *
  * Scale design: term frequencies and document length are per-row
  * array expressions over ONE scan (no explode, no shuffle); the
  * corpus statistics (N, Σdl, per-term df) are a single tiny aggregate
  * broadcast back via cross join; scoring is then pure per-row
  * arithmetic, and the top-k emit is TakeOrderedAndProject. Per-term
  * contributions are quantized to 1e-6 fixed point and summed as
  * longs, so the cross-term sum is order-independent.
  */
object Ranking {

  // k1 = 1.2, b = 0.75 (the standard defaults). The derived constants
  // (k1+1 = 2.2, 1-b = 0.25) are spelled as LITERALS, not Scala
  // arithmetic: the oracle SQL parses "2.2" directly, and a
  // compile-time 1.2+1.0 could round differently in the last bit than
  // the parsed literal.
  private val K1 = lit(1.2)
  private val K1Plus1 = lit(2.2)
  private val OneMinusB = lit(0.25)
  private val B = lit(0.75)

  /** Per-document BM25 scores for `terms` over `textCol`, plus the
    * per-term tf columns (tf_0..) and dl the score derives from.
    * `score_fp` is the 1e-6 fixed-point score (exact long); `score`
    * its double rendering. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val toks = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
    val withTf = terms.zipWithIndex.foldLeft(
        toks.withColumn("dl", size(col("tk")).cast("long"))) {
      case (df, (term, i)) =>
        df.withColumn(s"tf_$i",
          size(filter(col("tk"), x => x === lit(term))).cast("long"))
    }.drop("tk")
    val statAggs =
      count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)

    val scored = withTf.crossJoin(broadcast(stats))
    // per-term contribution, quantized; the formula's operation order
    // is mirrored verbatim in the oracle SQL so every intermediate
    // double is bit-identical
    def contrib(i: Int): Column = {
      val tf = col(s"tf_$i"); val dfT = col(s"df_$i")
      val idf = (col("n_docs") - dfT + lit(0.5)) / (dfT + lit(0.5))
      val relDl = (col("dl") * col("n_docs")) / col("sum_dl")
      val den = tf + K1 * (OneMinusB + B * relDl)
      val num = tf * K1Plus1
      floor(idf * (num / den) * lit(1000000) + lit(0.5)).cast("long")
    }
    scored
      .withColumn("score_fp",
        terms.indices.map(contrib).reduce(_ + _))
      .withColumn("score", col("score_fp") / 1000000.0)
      .drop("n_docs", "sum_dl")
      .drop(terms.indices.map(i => s"df_$i"): _*)
  }
}
