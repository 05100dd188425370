package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: token
  * statistics, quality scoring, language-ID heuristic, fingerprinting.
  *
  * Everything is built-in codegen'd expressions (split / higher-order
  * array functions / md5) — no UDFs — so the operators scale as narrow
  * maps over the document partitioning: 100 TB of documents is
  * embarrassingly parallel here, no shuffle at all until an aggregation.
  *
  * Determinism: all scores are derived from integer counts via fixed
  * double arithmetic, so results are bit-stable across engines and runs.
  */
object TextOps {

  /** Tiny English stopword set for the n-gram/stopword language
    * heuristic. Fixed and ordered — part of the operator's contract. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Adds n_tokens, n_uniq_tokens, type_token_ratio, avg_token_len. */
  def withTokenStats(df: DataFrame, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    df.withColumn("n_tokens", size(tk))
      .withColumn("n_uniq_tokens", size(array_distinct(tk)))
      .withColumn("type_token_ratio", col("n_uniq_tokens") / col("n_tokens"))
      .withColumn("avg_token_len",
        (length(col(textCol)) - col("n_tokens") + 1) / col("n_tokens"))
  }

  /** Stopword hits (count of tokens in [[EnStopwords]], duplicates
    * included — frequency matters for language ID). */
  def stopwordHits(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(EnStopwords)))

  /** Language-ID heuristic: stopword density over a small English
    * function-word list; >= threshold predicts English. The classic
    * cheap first-pass filter before an n-gram model. */
  def withLangId(df: DataFrame, textCol: String, threshold: Double = 0.08): DataFrame =
    df.withColumn("en_hits", stopwordHits(col(textCol)))
      .withColumn("n_tokens", size(tokens(col(textCol))))
      .withColumn("en_density", col("en_hits") / col("n_tokens"))
      .withColumn("pred_lang", when(col("en_density") >= threshold, "en").otherwise("other"))

  /** Composite quality score in [0,1]: mixes stopword density (fluency
    * proxy), type-token ratio (repetition proxy), and a length factor —
    * the usual heuristic pre-filter shape for pretraining corpora. */
  def withQualityScore(df: DataFrame, textCol: String): DataFrame = {
    val withStats = withTokenStats(df, textCol)
      .withColumn("en_hits", stopwordHits(col(textCol)))
      .withColumn("en_density", col("en_hits") / col("n_tokens"))
    withStats.withColumn("quality_score",
      least(col("en_density") * 2.0, lit(1.0)) * 0.4 +
        col("type_token_ratio") * 0.4 +
        least(col("n_tokens") / 256.0, lit(1.0)) * 0.2)
  }

  /** BPE-style token-count estimate without a tokenizer model: each
    * word contributes ceil(len/4) subword units (the ~4-chars-per-token
    * rule of thumb), floored at the whitespace token count. Pure
    * integer arithmetic, so the estimate is engine-portable. */
  def withTokenEstimate(df: DataFrame, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    df.withColumn("n_words", size(tk).cast("long"))
      .withColumn("est_bpe_tokens",
        aggregate(tk, lit(0L),
          (acc, w) => acc + floor((length(w) + lit(3)) / 4).cast("long")))
      .withColumn("est_tokens", greatest(col("n_words"), col("est_bpe_tokens")))
  }

  /** Content fingerprints: full-text md5 and a 64-char-prefix md5
    * (cheap near-head dedup key). */
  def withFingerprints(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp", md5(col(textCol).cast("binary")))
      .withColumn("fp_prefix", md5(substring(col(textCol), 1, 64).cast("binary")))

  /** Gopher-style repetition signal: the fraction of a document's
    * k-grams that are duplicates (1 - distinct/total) — high values
    * flag templated/degenerate text (cf. the Gopher data-quality
    * filters' duplicate n-gram fractions). Pure per-row arithmetic:
    * the `word_shingles` kernel already emits the DISTINCT shingle
    * set, so this is one kernel call plus two `size`s — no shuffle. */
  def withRepetition(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val tk = tokens(col(textCol))
    val total = greatest(size(tk) - (k - 1), lit(0))
    df.withColumn(s"n_${k}grams", total.cast("long"))
      .withColumn(s"uniq_${k}grams",
        size(graft.functions.kernels.word_shingles(tk, k)).cast("long"))
      .withColumn(s"dup_${k}gram_ratio",
        when(total > 0,
          lit(1.0) - col(s"uniq_${k}grams") / col(s"n_${k}grams")).otherwise(0.0))
  }

  /** PII patterns chosen to evaluate identically under Java regex and
    * RE2 (no backrefs, no lookaround): plain classes + quantifiers. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlPattern = "https?://[a-z0-9./_-]+"

  /** PII scrubbing: count and redact email/URL occurrences — the
    * pre-training privacy pass. Counting + replacement are codegen'd
    * regexp expressions; a row never leaves its partition. */
  def withPiiScrub(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)).cast("long"))
      .withColumn("n_urls", regexp_count(col(textCol), lit(UrlPattern)).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          UrlPattern, "<URL>"))

  /** (w1, w2) structs of adjacent array elements — the shared bigram
    * idiom behind PMI collocations, bigram-LM scoring, and BPE pair
    * counting; one definition so the three cannot drift. */
  def adjacentPairs(arr: Column): Column =
    zip_with(slice(arr, lit(1), size(arr) - 1), slice(arr, lit(2), size(arr) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))

  /** Non-empty single-character symbols of a word — BPE's initial
    * alphabet (split("") emits empty edge strings; drop them). */
  def charSymbols(w: Column): Column =
    filter(split(w, ""), c => c =!= lit(""))

  /** Word-frequency table for BPE training: the corpus collapses to
    * (distinct word, count) FIRST — the classic tokenizer-training
    * reduction. All later merge rounds run over the vocabulary (≈10⁵–10⁶
    * rows regardless of corpus size), so a 100 TB corpus pays exactly one
    * full scan + one shuffle on the word key, ever. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Adjacent-symbol pair counts over a (syms: array<string>, freq)
    * vocabulary — the argmax of this table is the next BPE merge. Pure
    * zip_with/explode over the tiny vocab; no corpus access. */
  def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.w1").as("a"), col("p.w2").as("b"))
      .agg(sum(col("freq")).as("n"))

  /** Replaces every left-to-right occurrence of the adjacent pair (a,b)
    * with the merged symbol inside a symbol array — one linear fold per
    * word, expressed as a higher-order aggregate so it stays inside the
    * row (no explode, no shuffle). */
  def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Byte-pair-encoding vocabulary training (Sennrich et al., ACL 2016):
    * repeatedly merge the most frequent adjacent symbol pair. Each round
    * is one aggregation over the word-frequency vocabulary plus one
    * narrow rewrite of the words that actually contain the winning pair;
    * only the single winning pair (3 values) ever reaches the driver.
    * Ties break lexicographically so training is deterministic. The
    * vocabulary is localCheckpoint'd every few rounds to keep the plan
    * linear in rounds, not quadratic. Returns (left, right, count) in
    * merge order. */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int): Seq[(String, String, Long)] = {
    var vocab = wordFreq(df, textCol)
      .select(charSymbols(col("w")).as("syms"), col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    while (round < nMerges) {
      val top = bpePairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) { round = nMerges }
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((a, b, n))
        // rewrite only words containing the pair; the rest pass through
        val hasPair = exists(adjacentPairs(col("syms")),
          p => p.getField("w1") === lit(a) && p.getField("w2") === lit(b))
        vocab = vocab
          .withColumn("syms",
            when(hasPair, mergePair(col("syms"), a, b)).otherwise(col("syms")))
        round += 1
        if (round % 4 == 0) vocab = vocab.localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** Content-defined chunking at token granularity: a token whose
    * engine-portable 60-bit hash ≡ 0 (mod `mask`) OPENS a new chunk, so
    * boundaries depend only on content — insertions shift chunk
    * contents locally instead of re-cutting the whole document (the
    * storage-dedup CDC property, cf. LBFS/Gear chunking). Emits one row
    * per (doc, chunk) with the token count and an md5 identity hash of
    * the chunk text. The running boundary count is a PER-DOCUMENT
    * window (doc-count parallelism at scale); the chunk text is
    * reassembled order-deterministically via sort_array over (pos,
    * token). Expected chunk length = `mask` tokens. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      mask: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .select(col(idCol), posexplode(tokens(col(textCol))))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("col").as("t"))
    val h = conv(substring(md5(col("t").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tok
      .withColumn("boundary", when(h % mask === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", sum(col("boundary")).over(w))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_toks"),
        md5(concat_ws(" ",
          transform(sort_array(collect_list(struct(col("pos"), col("t")))),
            x => x.getField("t"))).cast("binary")).as("chunk_hash"))
  }
}
