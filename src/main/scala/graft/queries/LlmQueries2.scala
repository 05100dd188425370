package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Similarity, TextOps}
import graft.ops.Analytics

/** LLM training-data pipeline: dedup (exact/MinHash/SimHash/PPJoin), similarity search (IVF/PQ/LSH), text analysis, tokenizer ops, multimodal metadata, curation.
  *
  * Split from the SparkEntry monolith; every member is `private[graft]`
  * and the driver surface stays `SparkEntry.queries` / `oracleSql`
  * (assembled from the per-domain map fragments below).
  */
private[graft] trait LlmQueries2 { this: SparkEntry.type =>

  /** MAP@10 of the IVF index against brute-force binary relevance —
    * the order-sensitive companion to q_recall_at_k and the graded
    * q_ndcg: AP's precision@k prefix sums live on the 10-row per-query
    * ranking (bounded window), every term an exact integer-ppm
    * division, mean over queries an integer div. Same shared IVF
    * assignment and bounded-heap top-k scaffolding as q_ndcg. */
  private[graft] def qMapEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents,
      "cid", "cv").localCheckpoint(eager = false)
    val queries = emb.filter(col("vec_id").isin(0, 7, 42, 99, 123))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(assign.select(col("vec_id").as("qid"), col("cid").as("qcid")),
        "qid")
    def keyed(scored: DataFrame): DataFrame = scored.select(col("qid"),
      col("vec_id"),
      lpad(greatest(lit(0L),
          floor((lit(1.0) - col("cosine")) * 1e9 + 0.5).cast("long"))
        .cast("string"), 12, "0").as("distkey"))
    val truth10 = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .crossJoin(broadcast(queries.select(col("qid"), col("qv"))))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 10)
      .select(col("qid").cast("long").as("qid"), col("vec_id"),
        lit(1L).as("rel"))
    val ivf10 = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .join(assign, "vec_id")
        .join(broadcast(queries), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 10)
      .select(col("qid").cast("long").as("qid"), col("rn").cast("long")
        .as("rn"), col("vec_id"))
    val marked = ivf10
      .join(truth10, Seq("qid", "vec_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    // 10-row per-query window: bounded, not a funnel
    val cum = marked.withColumn("cum_rel",
      sum(col("rel")).over(Window.partitionBy(col("qid"))
        .orderBy(col("rn"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.withColumn("term_ppm",
        when(col("rel") === 1L, expr("cum_rel * 1000000 div rn"))
          .otherwise(lit(0L)))
      .groupBy(col("qid"))
      .agg(sum(col("term_ppm")).as("sum_terms"),
        sum(col("rel")).as("hits"))
      .select(col("qid"), col("hits"),
        expr("sum_terms div 10").as("ap_ppm"))
      .orderBy(col("qid"))
  }

  /** Reciprocal-rank fusion of two retrieval lists (brute-force cosine
    * vs IVF ranking): RRF(d) = Σ 1/(60+rank) with the ten possible
    * rank discounts embedded as integer micro literals — rank fusion
    * is THE standard way RAG stacks merge lexical and vector hits, and
    * with literal discounts the fused score is an exact integer sum.
    * Reuses q_ndcg's shared IVF assignment and bounded-heap top-10s;
    * fused top-5 per query via rank selection over ≤20 candidates. */
  private[graft] def qRankFusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rrfCase =
      """CASE rn WHEN 1 THEN 16393 WHEN 2 THEN 16129 WHEN 3 THEN 15873
        | WHEN 4 THEN 15625 WHEN 5 THEN 15385 WHEN 6 THEN 15152
        | WHEN 7 THEN 14925 WHEN 8 THEN 14706 WHEN 9 THEN 14493
        | ELSE 14286 END""".stripMargin
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents,
      "cid", "cv").localCheckpoint(eager = false)
    val queries = emb.filter(col("vec_id").isin(0, 7, 42, 99, 123))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(assign.select(col("vec_id").as("qid"), col("cid").as("qcid")),
        "qid")
    def keyed(scored: DataFrame): DataFrame = scored.select(col("qid"),
      col("vec_id"),
      lpad(greatest(lit(0L),
          floor((lit(1.0) - col("cosine")) * 1e9 + 0.5).cast("long"))
        .cast("string"), 12, "0").as("distkey"))
    val bf10 = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .crossJoin(broadcast(queries.select(col("qid"), col("qv"))))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 10)
      .select(col("qid").cast("long").as("qid"), col("vec_id"),
        expr(rrfCase).cast("long").as("rrf_micro"))
    val ivf10 = graft.ops.Sampling.stratifiedTopN(s, keyed(emb
        .join(assign, "vec_id")
        .join(broadcast(queries), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))),
      "qid", "distkey", "vec_id", n = 10)
      .select(col("qid").cast("long").as("qid"), col("vec_id"),
        expr(rrfCase).cast("long").as("rrf_micro"))
    val fused = bf10.unionAll(ivf10)
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("rrf_micro")).as("rrf_micro"),
        count(lit(1)).as("n_lists"))
    // ≤20 candidates per query: the window is bounded, not a funnel
    fused
      .withColumn("frank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("rrf_micro").desc, col("vec_id"))).cast("long"))
      .filter(col("frank") <= 5)
      .select(col("qid"), col("frank"), col("vec_id"), col("n_lists"),
        col("rrf_micro"))
      .orderBy(col("qid"), col("frank"))
  }

  /** Marginal-novelty (coverage) curve: for each corpus tenth (by
    * doc_id), the share of its documents whose exact content digest
    * was already seen earlier — "is the next batch of data still
    * adding new documents, or just duplicate mass?" Each digest's
    * FIRST doc is one min-reduce (q_heaps' trick at the document
    * level); a doc is novel iff it IS its digest's first occurrence. */
  private[graft] def qCoverageCurve(s: SparkSession, dir: String): DataFrame = {
    val total = t(s, dir, "documents").agg(count(lit(1)).as("d_total"))
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .localCheckpoint(eager = false)
    val firsts = docs.groupBy(col("fp")).agg(min(col("doc_id")).as("first_doc"))
    docs.join(firsts, "fp")
      .crossJoin(broadcast(total))
      .select(expr("((doc_id + 1) * 10 + d_total - 1) div d_total")
        .as("decile"),
        when(col("doc_id") === col("first_doc"), 1L).otherwise(0L)
          .as("novel"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("docs"), sum(col("novel")).as("novel_docs"))
      .withColumn("dup_ppm",
        expr("(docs - novel_docs) * 1000000 div docs"))
      .orderBy(col("decile"))
  }

  /** Packing-efficiency audit for the q_pack_windows layout: per
    * source, how much of the 2048-token context budget the packed
    * windows actually fill (fill ppm), plus boundary-crossing doc
    * counts — the "are we wasting context" number a pretraining
    * pipeline tracks per mixture component. Pure arithmetic over the
    * same token estimates; the per-source window count is the exact
    * ceiling of its token mass. */
  private[graft] def qPackEfficiency(s: SparkSession, dir: String): DataFrame = {
    val windowTokens = 2048L
    val base = TextOps.withTokenEstimate(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("source"), col("est_tokens"))
    base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("est_tokens")).as("tokens"))
      .select(col("source"), col("n_docs"), col("tokens"),
        expr(s"(tokens + $windowTokens - 1) div $windowTokens")
          .as("windows"),
        expr(s"tokens * 1000000 div " +
          s"(((tokens + $windowTokens - 1) div $windowTokens) * $windowTokens)")
          .as("fill_ppm"))
      .orderBy(col("source"))
  }

  /** Hard-negative mining for contrastive training: for each anchor
    * in a deterministic subset, the top-3 same-label neighbors in the
    * "hard band" — similar enough to confuse (cosine ≥ 0.10) but not
    * near-duplicates (cosine ≤ 0.25, q_embed_near_dup's cut) — via
    * the label-blocked pair join (never all-pairs) and a bounded
    * per-anchor heap. Near-dups make FALSE negatives (they're really
    * positives), easy ones teach nothing; the band is where the
    * training signal lives. */
  private[graft] def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val n = emb.select(col("vec_id"), col("label"), col("embedding"),
      graft.functions.kernels.fixed_point_dot(col("embedding"),
        col("embedding")).as("nrm"))
      .localCheckpoint(eager = false)
    val anchors = n.filter(col("vec_id") % 7 === 0)
    val pairs = anchors.as("a").join(n.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("anchor"), col("b.vec_id").as("neg"),
        (Similarity.dotFp(col("a.embedding"), col("b.embedding"))
          .cast("double") / 1e9 /
          (sqrt(col("a.nrm").cast("double") / 1e9) *
            sqrt(col("b.nrm").cast("double") / 1e9))).as("cosine"))
      .withColumn("cos_micro",
        floor(col("cosine") * 1000000 + 0.5).cast("long"))
      .filter(col("cos_micro") >= 100000L && col("cos_micro") <= 250000L)
    // per-anchor candidates are label-block bounded; rank top-3
    pairs
      .withColumn("rn", row_number().over(Window.partitionBy(col("anchor"))
        .orderBy(col("cos_micro").desc, col("neg"))).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("anchor"), col("rn"), col("neg"), col("cos_micro"))
      .orderBy(col("anchor"), col("rn"))
  }

  /** Same-day multi-order screen (split-billing / double-entry
    * audit): customers placing more than one order on one calendar
    * day — the finance-ops control that catches both split invoices
    * and double-submits. One exact group-by on (customer, day);
    * flagged groups ship their order count, combined value, and the
    * two boundary order keys for investigation. */
  private[graft] def qDupOrders(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders")
      .groupBy(col("o_custkey"), epochDay(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Analytics.cents(col("o_totalprice"))).as("total_c"),
        min(col("o_orderkey")).as("k1"), max(col("o_orderkey")).as("k2"))
      .filter(col("n_orders") > 1)
      .orderBy(col("o_custkey"), col("day"))
  }

  /** k-means elbow curve: assignment SSE against the deterministic
    * seed codebooks at k ∈ {2, 4, 8} — the "how many clusters does
    * this embedding space want" diagnostic, computed as three
    * broadcast-codebook assignment passes whose per-vector cost
    * Σ(|x|² − 2x·c* + |c*|²) is exact fixed point end-to-end (the
    * q_kmeans discipline; the corpus never shuffles). A flattening
    * SSE drop between successive k values is the elbow. */
  private[graft] def qElbow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings").localCheckpoint(eager = false)
    def sseAt(k: Int): DataFrame = {
      val cents = emb.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val scored = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          (graft.functions.kernels.fixed_point_dot(col("embedding"),
            col("embedding"))
            - lit(2L) * graft.functions.kernels.fixed_point_dot(
              col("embedding"), col("cv"))
            + graft.functions.kernels.fixed_point_dot(col("cv"), col("cv")))
            .as("d2"))
      scored.groupBy(col("vec_id")).agg(min(col("d2")).as("best_d2"))
        .agg(sum(expr("best_d2 div 1000")).as("sse_scaled"))
        .select(lit(k.toLong).as("k"), col("sse_scaled"))
    }
    val curve = sseAt(2).unionAll(sseAt(4)).unionAll(sseAt(8))
    curve
      .withColumn("drop_from_prev",
        coalesce(lag(col("sse_scaled"), 1).over(Window.orderBy(col("k")))
          - col("sse_scaled"), lit(0L)))
      .orderBy(col("k"))
  }

  /** Per-source character-level Shannon entropy — the theoretical
    * bits-per-character floor (compressibility estimate) a storage
    * planner reads before choosing codecs: character histograms per
    * source (bounded alphabet), each class's −p·log₂p rounded to
    * integer micro-bits BEFORE the per-source sum. Low entropy =
    * highly compressible/templated text; also a quiet data-quality
    * tell (binary junk shows up as entropy spikes). */
  private[graft] def qCharEntropy(s: SparkSession, dir: String): DataFrame = {
    val chars = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) === 1)
      .groupBy(col("source"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val tot = chars.groupBy(col("source")).agg(sum(col("c")).as("n"))
    chars.join(broadcast(tot), "source")
      .select(col("source"), col("n"),
        floor((col("c").cast("double") / col("n").cast("double")) *
          (log(col("c").cast("double") / col("n").cast("double")) /
            lit(0.6931471805599453)) * lit(-1000000.0) + 0.5)
          .cast("long").as("term_ubits"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_chars"),
        sum(col("term_ubits")).as("entropy_ubits"))
      .orderBy(col("source"))
  }

  /** Greedy knapsack data selection under a token budget: keep the
    * positive-quality docs with the best quality-per-token density
    * until a quarter of the corpus' tokens are spent — the
    * "best data for a fixed training budget" selector (greedy is
    * optimal for the fractional relaxation and within one doc of it
    * here). Density ranking rides the SAME order-preserving key
    * encoding + two-pass prefix sum as q_pareto — no global window;
    * the budget is data-relative so the operator is SF-invariant. */
  private[graft] def qKnapsack(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.withTokenEstimate(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("est_tokens"),
        qualityLogitMilli
          .as("q_milli"))
      .filter(col("q_milli") > 0)
      .withColumn("density", expr("q_milli * 1000 div est_tokens"))
      .localCheckpoint(eager = false)
    val enc = scored
      .select(when(col("density") < (1L << 36) && col("doc_id") < (1L << 26),
          (lit(1L << 36) - col("density")) * lit(1L << 26) + col("doc_id"))
        .otherwise(raise_error(lit(
          "q_knapsack key encoding overflow")))
        .as("k"), col("est_tokens"), col("q_milli"))
      .localCheckpoint(eager = false)
    val run = graft.ops.ScalablePrefix.runningSum(s,
      enc.select(col("k"), col("est_tokens")), "k", "est_tokens", 32)
    val budget = scored.agg(expr("sum(est_tokens) div 4").as("budget"))
    val qual = scored.agg(sum(col("q_milli")).as("total_q"),
      count(lit(1)).as("n_candidates"))
    run.crossJoin(broadcast(budget))
      .filter(col("run_sum") <= col("budget"))
      .join(enc.select(col("k"), col("q_milli")), "k")
      .agg(count(lit(1)).as("n_selected"),
        sum(col("est_tokens")).as("tokens_used"),
        sum(col("q_milli")).as("quality_sum"))
      .crossJoin(broadcast(qual)).crossJoin(broadcast(budget))
      .select(col("n_candidates"), col("n_selected"), col("budget"),
        col("tokens_used"), col("quality_sum"),
        expr("quality_sum * 1000000 div total_q").as("quality_share_ppm"))
  }

  /** Per-dimension embedding standardization audit: mean and variance
    * of every coordinate in exact milli fixed point (posexplode →
    * one (dim)-keyed reduce; 64 output rows) plus a needs-centering
    * flag when |mean| exceeds 5% of the coordinate's std — the check
    * run before cosine similarity is trusted (uncentered dimensions
    * bias every dot product the same direction). */
  private[graft] def qDimStats(s: SparkSession, dir: String): DataFrame = {
    val x = t(s, dir, "embeddings")
      .select(posexplode(col("embedding")))
      .select((col("pos") + 1).cast("long").as("dim"),
        expr("CAST(floor(CAST(col AS DOUBLE) * 1000 + 0.5) AS BIGINT)")
          .as("xf"))
    val m = x.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("xf")).as("sx"),
        sum(col("xf") * col("xf")).as("sxx"))
    def d(c: String) = col(c).cast("double")
    val mean = d("sx") / d("n")
    val variance = (d("n") * d("sxx") - d("sx") * d("sx")) /
      (d("n") * d("n"))
    m.select(col("dim"), col("n"),
        floor(mean * 1000 + 0.5).cast("long").as("mean_micro"),
        floor(variance + 0.5).cast("long").as("var_milli2"),
        (abs(mean) * lit(20.0) > sqrt(variance)).as("needs_centering"))
      .orderBy(col("dim"))
  }

  /** Pairwise-cosine histogram over deterministic anchor pairs — the
    * distance-concentration (hubness) diagnostic: if most similarities
    * pile into one narrow bucket, nearest-neighbor search in this
    * space is fragile. Anchors are a hash subset; each anchor compares
    * within its label block (the established never-all-pairs
    * discipline), and cosines land in 8 fixed buckets of width 0.25
    * over [−1, 1) via integer micro floor-division. */
  private[graft] def qCosineHist(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val n = emb.select(col("vec_id"), col("label"), col("embedding"),
      graft.functions.kernels.fixed_point_dot(col("embedding"),
        col("embedding")).as("nrm"))
      .localCheckpoint(eager = false)
    val anchors = n.filter(col("vec_id") % 5 === 0)
    val cos = anchors.as("a").join(n.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .select((Similarity.dotFp(col("a.embedding"), col("b.embedding"))
        .cast("double") / 1e9 /
        (sqrt(col("a.nrm").cast("double") / 1e9) *
          sqrt(col("b.nrm").cast("double") / 1e9))).as("cosine"))
      .select(floor(col("cosine") * 1000000 + 0.5).cast("long")
        .as("cos_micro"))
    val bucketed = cos
      .select(greatest(lit(-4L), least(lit(3L),
        expr("CASE WHEN cos_micro >= 0 THEN cos_micro div 250000 " +
          "ELSE -((-cos_micro + 249999) div 250000) END"))).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
    val tot = bucketed.agg(sum(col("n_pairs")).as("total"))
    bucketed.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_pairs"),
        expr("n_pairs * 1000000 div total").as("share_ppm"))
      .orderBy(col("bucket"))
  }

  /** Per-source orthography profile: uppercase, digit, punctuation,
    * and whitespace character shares in exact ppm — the cheap
    * formatting fingerprint that catches shouting boilerplate,
    * table-dump sources, and code-vs-prose mixes before any model
    * sees them. One scan, four regexp strips, integer ratios. */
  private[graft] def qCasingProfile(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("source"),
        length(col("text")).cast("long").as("chars"),
        length(regexp_replace(col("text"), "[^A-Z]", "")).cast("long")
          .as("upper"),
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long")
          .as("digits"),
        length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("long")
          .as("punct"),
        length(regexp_replace(col("text"), "[^ ]", "")).cast("long")
          .as("spaces"))
    d.groupBy(col("source"))
      .agg(sum(col("chars")).as("chars"), sum(col("upper")).as("u"),
        sum(col("digits")).as("dg"), sum(col("punct")).as("p"),
        sum(col("spaces")).as("sp"))
      .select(col("source"), col("chars"),
        expr("u * 1000000 div chars").as("upper_ppm"),
        expr("dg * 1000000 div chars").as("digit_ppm"),
        expr("p * 1000000 div chars").as("punct_ppm"),
        expr("sp * 1000000 div chars").as("space_ppm"))
      .orderBy(col("source"))
  }

  /** Cross-source duplicate provenance: exact-content digests shared
    * by documents in DIFFERENT sources, counted per source pair —
    * mirror scrapes and syndication show up as hot pairs, and the
    * keep-policy ("which source owns the canonical copy") needs
    * exactly this table. Digests join on the 16-byte key (never
    * text); pairs are per-digest distinct-source combinations, so a
    * digest in k sources contributes k(k−1)/2 pairs — bounded by the
    * source-catalog size, not the corpus. */
  private[graft] def qCrossSourceDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(md5(col("text").cast("binary")).as("fp"), col("source"))
      .distinct()
      .localCheckpoint(eager = false)
    d.as("a").join(d.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source1"), col("b.source").as("source2"))
      .agg(count(lit(1)).as("shared_digests"))
      .orderBy(col("shared_digests").desc, col("source1"), col("source2"))
      .limit(20)
      .select(col("source1"), col("source2"), col("shared_digests"))
      .orderBy(col("source1"), col("source2"))
  }

  /** One-way ANOVA of document length across the 5 languages —
    * "does length differ by language" decided with the same pivoted
    * fixed-tree machinery as q_anova_f (5 langs pivot into one row;
    * every double sum a fixed 5-term tree). Length differences by
    * language bias every length-based quality filter, which is why
    * the corpus card needs this number. */
  private[graft] def qLengthAnova(s: SparkSession, dir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val g = t(s, dir, "documents")
      .select(col("lang").as("grp"), col("n_chars").as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("ss"))
    anovaFromPivot(pivotMoments(g, langs)).select(col("n_total"),
      col("ssb"), col("ssw"), col("f_stat"))
  }

  /** Corpus token-length distribution (1–14 chars, 15+ bucketed) —
    * the tokenizer-design diagnostic behind q_fertility: long-tail
    * token lengths mean BPE will split aggressively. One explode, one
    * bounded group-by, exact ppm shares. */
  private[graft] def qTokenLengthDist(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(least(length(col("w")).cast("long"), lit(15L)).as("len"))
    val g = toks.groupBy(col("len")).agg(count(lit(1)).as("n"))
    val tot = g.agg(sum(col("n")).as("total"))
    g.crossJoin(broadcast(tot))
      .select(col("len"), col("n"),
        expr("n * 1000000 div total").as("share_ppm"))
      .orderBy(col("len"))
  }

  /** IVF bucket-balance audit: the centroid assignment's bucket sizes
    * with the imbalance ratio (largest bucket over the even split) —
    * a skewed index makes probe latency bimodal, which is why every
    * ANN deployment graphs exactly this. Rides the shared
    * deterministic assignment; output is codebook-bounded. */
  private[graft] def qIvfBalance(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents,
      "cid", "cv")
    val sizes = assign.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
    val tot = sizes.agg(sum(col("n_vecs")).as("total"),
      max(col("n_vecs")).as("mx"))
    sizes.crossJoin(broadcast(tot))
      .select(col("cid"), col("n_vecs"),
        expr("n_vecs * 1000000 div total").as("share_ppm"),
        expr("mx * 8 * 1000 div total").as("imbalance_milli"))
      .orderBy(col("cid"))
  }

  /** Corpus length-distribution drift between src0 and
    * src1 (PSI over 8 fixed length brackets, micro-nat integer
    * terms — q_psi's discipline pointed at TEXT): the "did the new
    * crawl change shape" audit run before mixing a fresh source into
    * training data. PSI < 0.1 is conventionally stable. */
  private[graft] def qLengthPsi(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"),
        least(expr("n_chars div 125"), lit(7L)).as("bracket"))
    val cells = d.groupBy(col("bracket"))
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L))
        .as("a"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("b"))
      .localCheckpoint(eager = false)
    val tot = cells.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    val terms = cells.crossJoin(broadcast(tot))
      .filter(col("a") > 0 && col("b") > 0)
      .select(col("bracket"), col("a"), col("b"),
        floor((col("a").cast("double") / col("na").cast("double") -
          col("b").cast("double") / col("nb").cast("double")) *
          log((col("a").cast("double") / col("na").cast("double")) /
            (col("b").cast("double") / col("nb").cast("double"))) *
          1000000 + 0.5).cast("long").as("term_unat"))
      .localCheckpoint(eager = false)
    val psi = terms.agg(sum(col("term_unat")).as("psi_unat"))
    terms.crossJoin(broadcast(psi))
      .select(col("bracket"), col("a"), col("b"), col("term_unat"),
        col("psi_unat"))
      .orderBy(col("bracket"))
  }

  /** Two-NN intrinsic-dimension estimate (Facco et al. 2017) of the
    * embedding space: ID ≈ ln 2 / mean ln(r₂/r₁) over each point's
    * two nearest same-label neighbors — embeddings that LOOK
    * 64-dimensional usually live on a much lower-dimensional manifold,
    * and this is the one-number check. Neighbor pairs come from the
    * label-blocked join (never all-pairs); the two smallest distances
    * ride the bounded per-anchor heap; each anchor's ln(r₂/r₁) rounds
    * to micro-nats BEFORE the mean (determinism contract); ties with
    * r₁ = r₂ drop (they carry no slope information). */
  private[graft] def qIntrinsicDim(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val n = emb.select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint(eager = false)
    val pairs = n.as("a").join(n.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("anchor"), col("b.vec_id").as("nbr"),
        graft.functions.kernels.fixed_point_l2(col("a.embedding"),
          col("b.embedding")).as("d2"))
    // numeric ordering (d2, nbr) == the old lpad-string key's
    // lexicographic order (both non-negative, within pad width:
    // d2 ≤ 64·4e9 < 1e16) — Sampling.stratifiedTopNBy drops the
    // two per-pair string materializations from the hot path
    val top2 = graft.ops.Sampling.stratifiedTopNBy(
      pairs.select(col("anchor"), col("nbr"), col("d2")),
      "anchor", Seq(col("d2"), col("nbr")), "d2", n = 2)
    val ratios = top2.groupBy(col("anchor"))
      .agg(min(when(col("rn") === 1, col("d2"))).as("d1"),
        min(when(col("rn") === 2, col("d2"))).as("d2b"))
      .filter(col("d1") > 0 && col("d2b") > col("d1"))
      .select(floor(log(col("d2b").cast("double") /
          col("d1").cast("double")) * lit(500000.0) + 0.5).cast("long")
        .as("lr_unat"))
    // ln(r2/r1) = ln(d2²_ratio)/2 → the 0.5 factor folds into the
    // micro scale (500000 = 1e6 / 2)
    ratios.agg(count(lit(1)).as("n_anchors"), sum(col("lr_unat")).as("slr"))
      .select(col("n_anchors"),
        expr("slr div n_anchors").as("mean_lnr_unat"),
        expr("693147 * n_anchors div slr").as("intrinsic_dim_approx"))
  }

  /** Yule's characteristic K per source — the classic repeat-rate
    * lexical-diversity constant (K = 10⁴·(Σm²V(m) − N)/N²), stable
    * under corpus growth where raw type/token ratio is not: template
    * spam and boilerplate floods push K up an order of magnitude.
    * Token frequencies collapse map-side to the (source, token) grid;
    * Σm² and N are exact integer moments of that grid (dollar-scale
    * magnitudes — no overflow path), and K is one fixed double tree
    * per ≤10-row output. */
  private[graft] def qYuleK(s: SparkSession, dir: String): DataFrame = {
    val tf = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("m"))
    tf.groupBy(col("source"))
      .agg(sum(col("m")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("m") * col("m")).as("s2"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        expr("CAST(floor(10000.0 * (CAST(s2 AS DOUBLE) - CAST(n_tokens AS DOUBLE)) / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) * 1000 + 0.5) AS BIGINT)")
          .as("yule_k_milli"))
      .orderBy(col("source"))
  }

  /** Johnson-Lindenstrauss distortion audit of a 64→16 random ±1
    * projection (Achlioptas '03 signs, md5-derived so the oracle
    * replays them bit-for-bit): before trusting a cheap projected
    * index, measure how far pairwise distances actually drift —
    * E[‖Py‖²/k] = ‖y‖², so the per-pair ratio should concentrate
    * near 1. Coordinates quantize to integer micro-units FIRST
    * (order-independent integer sums — no float reduction crosses a
    * shuffle); the 1024-entry sign matrix is a broadcast-joined
    * constant; pairs are consecutive vec_ids (n pairs from n rows, no
    * all-pairs). Summary: mean/min/max ratio and the within-±30%
    * share in exact ppm. */
  private[graft] def qJlDistortion(s: SparkSession, dir: String): DataFrame = {
    val xq = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("vec_id"), (col("i0") + 1).as("i"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("xq"))
    val signs = s.range(16).select(col("id").as("j"))
      .crossJoin(s.range(64).select((col("id") + 1).as("i")))
      .select(col("j"), col("i"),
        (h60(concat(lit("jl|"), col("j").cast("string"), lit("|"),
          col("i").cast("string"))) % 2 * 2 - 1).as("sgn"))
    val y = xq.join(broadcast(signs), "i")
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("sgn") * col("xq")).as("y"))
    val dy2 = y.as("a").join(y.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id") && col("a.j") === col("b.j"))
      .groupBy(col("a.vec_id").as("pid"))
      .agg(sum((col("a.y") - col("b.y")) * (col("a.y") - col("b.y"))).as("dy2"))
    val dx2 = xq.as("a").join(xq.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id") && col("a.i") === col("b.i"))
      .groupBy(col("a.vec_id").as("pid"))
      .agg(sum((col("a.xq") - col("b.xq")) * (col("a.xq") - col("b.xq"))).as("dx2"))
    val ratios = dy2.join(dx2, "pid").filter(col("dx2") > 0)
      .select(expr("CAST(floor(CAST(dy2 AS DOUBLE) / 16.0 / CAST(dx2 AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("r_milli"))
    ratios.agg(count(lit(1)).as("n_pairs"),
      expr("sum(r_milli) div count(1)").as("mean_ratio_milli"),
      min(col("r_milli")).as("min_ratio_milli"),
      max(col("r_milli")).as("max_ratio_milli"),
      expr("sum(CASE WHEN r_milli BETWEEN 700 AND 1300 THEN 1 ELSE 0 END) * 1000000 div count(1)").as("within_30pct_ppm"))
  }

  /** Hubness audit of the embedding space — the high-dimensional
    * pathology that silently breaks k-NN retrieval: a few "hub"
    * vectors appear in everyone's neighbor list while anti-hubs
    * appear in none, so recall collapses long before average
    * distance says anything is wrong. In-degree of the label-blocked
    * 3-NN graph (pairs from the blocked join, never all-pairs; the
    * per-anchor top-3 rides the bounded heap), zero-filled against
    * the full vector set, histogrammed over the 0..6+ DOMAIN with
    * the max in-degree alongside. */
  private[graft] def qHubness(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val n = emb.select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint(eager = false)
    val pairs = n.as("a").join(n.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("anchor"), col("b.vec_id").as("nbr"),
        graft.functions.kernels.fixed_point_l2(col("a.embedding"),
          col("b.embedding")).as("d2"))
    // numeric (d2, nbr) ordering == the old lpad-string key order
    // (non-negative, within pad width) with the per-pair string
    // allocations removed — see q_intrinsic_dim
    val top3 = graft.ops.Sampling.stratifiedTopNBy(
      pairs.select(col("anchor"), col("nbr"), col("d2")),
      "anchor", Seq(col("d2"), col("nbr")), "nbr", n = 3)
    val indeg = top3.groupBy(col("nbr")).agg(count(lit(1)).as("indeg"))
    val full = emb.select(col("vec_id"))
      .join(indeg, col("vec_id") === col("nbr"), "left")
      .na.fill(0L, Seq("indeg"))
    val mx = full.agg(max(col("indeg")).as("max_indeg"))
    full.groupBy(least(col("indeg"), lit(6L)).as("indeg_bucket"))
      .agg(count(lit(1)).as("n_vectors"))
      .crossJoin(broadcast(mx))
      .orderBy(col("indeg_bucket"))
  }

  /** Rényi entropy spectrum (α = 0, 1, 2, ∞) of each source's token
    * distribution — four diversity numbers that disagree exactly when
    * the corpus is skewed: H₀ counts vocabulary, H₁ is Shannon, H₂
    * weights repeats quadratically (collision entropy — the dedup
    * view), H∞ sees only the single most abundant token. A template
    * flood leaves H₀ intact and crushes H₂/H∞ — the gap IS the
    * signal. All four derive from exact integer moments of the
    * (source, token) grid (Σm ln m rounds per-term to micro-nats,
    * the q_l_diversity contract); each H is a fixed double tree. */
  private[graft] def qRenyiSpectrum(s: SparkSession, dir: String): DataFrame = {
    val tf = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("m"))
    tf.groupBy(col("source"))
      .agg(sum(col("m")).as("n"), count(lit(1)).as("v"),
        sum(col("m") * col("m")).as("s2"), max(col("m")).as("mmax"),
        sum(expr("CAST(floor(CAST(m AS DOUBLE) * ln(CAST(m AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")).as("mlnm_micro"))
      .select(col("source"), col("n").as("n_tokens"), col("v").as("n_types"),
        expr("CAST(floor(ln(CAST(v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)").as("h0_micro"),
        expr("CAST(floor((ln(CAST(n AS DOUBLE)) - (mlnm_micro / 1000000.0) / CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)").as("h1_micro"),
        expr("CAST(floor((2.0 * ln(CAST(n AS DOUBLE)) - ln(CAST(s2 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)").as("h2_micro"),
        expr("CAST(floor((ln(CAST(n AS DOUBLE)) - ln(CAST(mmax AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)").as("hinf_micro"))
      .orderBy(col("source"))
  }

  /** Davies-Bouldin index over the labeled embedding clusters — the
    * third clustering-quality lens next to q_silhouette (per-point)
    * and q_elbow (inertia curve): DB penalizes the WORST neighbor per
    * cluster ((sᵢ+sⱼ)/dᵢⱼ maximized over j), so one merged pair of
    * clusters shows up even when the average looks fine. Coordinates
    * quantize to integer micro (the q_jl_distortion contract);
    * centroids are explicit floor(Σ/n) integers; scatters are RMS
    * distances from exact integer squares; only the final max/mean
    * ride double trees over the 10-label DOMAIN. */
  private[graft] def qDbi(s: SparkSession, dir: String): DataFrame = {
    val xq = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("vec_id"), col("label"), (col("i0") + 1).as("i"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("xq"))
    val cent = xq.groupBy(col("label"), col("i"))
      .agg(sum(col("xq")).as("csum"), count(lit(1)).as("cnt"))
      .select(col("label"), col("i"),
        expr("CAST(floor(CAST(csum AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT)").as("c"),
        col("cnt"))
    val s2v = xq.join(cent.select(col("label"), col("i"), col("c")), Seq("label", "i"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum((col("xq") - col("c")) * (col("xq") - col("c"))).as("s2"))
    val scat = s2v.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("s2")).as("ss2"))
      .select(col("label"), col("n_vecs"),
        expr("sqrt(CAST(ss2 AS DOUBLE) / CAST(n_vecs AS DOUBLE))").as("s_rms"))
    val cd = cent.as("a").join(cent.as("b"),
        col("a.i") === col("b.i") && col("a.label") =!= col("b.label"))
      .groupBy(col("a.label").as("li"), col("b.label").as("lj"))
      .agg(sum((col("a.c") - col("b.c")) * (col("a.c") - col("b.c"))).as("d2"))
    val rij = cd
      .join(scat.select(col("label").as("li"), col("s_rms").as("si")), "li")
      .join(scat.select(col("label").as("lj"), col("s_rms").as("sj")), "lj")
      .select(col("li"), ((col("si") + col("sj")) / sqrt(col("d2").cast("double"))).as("r"))
    val perLabel = rij.groupBy(col("li").as("label"))
      .agg(expr("CAST(floor(max(r) * 1000 + 0.5) AS BIGINT)").as("rmax_milli"))
    val dbi = perLabel.agg(expr("sum(rmax_milli) div count(1)").as("dbi_milli"))
    scat.join(perLabel, "label").crossJoin(broadcast(dbi))
      .select(col("label"), col("n_vecs"),
        expr("CAST(floor(s_rms + 0.5) AS BIGINT)").as("s_rms_micro"),
        col("rmax_milli"), col("dbi_milli"))
      .orderBy(col("label"))
  }

  /** Top-10 most correlated embedding DIMENSION pairs — the
    * redundancy audit that says whether the 64 dims actually carry
    * 64 dims of signal (q_top_pc finds the dominant direction; this
    * names the near-duplicate coordinate pairs a cheaper model could
    * drop). One self-join per vector over the exploded (dim, value)
    * table builds all 2016 pair products as exact integer micro
    * sums; per-dim moments come from the same pass; each r is a
    * fixed double tree and only the bounded top-10 survives. */
  private[graft] def qDimCorr(s: SparkSession, dir: String): DataFrame = {
    val xq = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("vec_id"), (col("i0") + 1).cast("long").as("i"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("xq"))
      .localCheckpoint(eager = false)
    val mom = xq.groupBy(col("i"))
      .agg(count(lit(1)).as("n"), sum(col("xq")).as("s"),
        sum(col("xq") * col("xq")).as("ss"))
    val cross = xq.as("a").join(xq.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.xq") * col("b.xq")).as("sxy"))
    cross
      .join(broadcast(mom.select(col("i"), col("n"), col("s").as("si"), col("ss").as("ssi"))), "i")
      .join(broadcast(mom.select(col("i").as("j"), col("s").as("sj"), col("ss").as("ssj"))), "j")
      .select(col("i"), col("j"),
        expr("CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(ssi AS DOUBLE) - CAST(si AS DOUBLE) * CAST(si AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(ssj AS DOUBLE) - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)").as("r_ppm"))
      .orderBy(abs(col("r_ppm")).desc, col("i"), col("j")).limit(10)
  }

  /** Purity and NMI of the IVF bucketing against the ground-truth
    * labels — the label-based clustering evaluation that completes
    * the geometric pair (q_silhouette, q_dbi): purity says how
    * dominated each bucket is, NMI corrects for trivially winning by
    * making more buckets. Assignment replays q_ivf_balance's
    * deterministic seed centroids; the (bucket × label) contingency
    * collapses map-side; every entropy/MI term rounds to integer
    * micro-nats before its sum (the q_jsd discipline) and NMI is one
    * fixed double tree. */
  private[graft] def qClusterPurity(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents,
      "cid", "cv")
    val cont = assign
      .join(emb.select(col("vec_id"), col("label").cast("long").as("label")), "vec_id")
      .groupBy(col("cid"), col("label")).agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val byC = cont.groupBy(col("cid"))
      .agg(sum(col("n")).as("nc"), max(col("n")).as("maxn"))
    val byL = cont.groupBy(col("label")).agg(sum(col("n")).as("nl"))
    val tot = byC.agg(sum(col("nc")).as("nn"), count(lit(1)).as("n_buckets"),
      sum(col("maxn")).as("smax"))
    val mi = cont
      .join(broadcast(byC.select(col("cid"), col("nc"))), "cid")
      .join(broadcast(byL), "label")
      .crossJoin(broadcast(tot.select(col("nn"))))
      .agg(sum(expr("CAST(floor(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE) * ln(CAST(n AS DOUBLE) * CAST(nn AS DOUBLE) / (CAST(nc AS DOUBLE) * CAST(nl AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)")).as("mi_micro"))
    val hc = byC.crossJoin(broadcast(tot.select(col("nn").as("n2"))))
      .agg(sum(expr("CAST(floor(-(CAST(nc AS DOUBLE) / CAST(n2 AS DOUBLE)) * ln(CAST(nc AS DOUBLE) / CAST(n2 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")).as("hc_micro"))
    val hl = byL.crossJoin(broadcast(tot.select(col("nn").as("n3"))))
      .agg(sum(expr("CAST(floor(-(CAST(nl AS DOUBLE) / CAST(n3 AS DOUBLE)) * ln(CAST(nl AS DOUBLE) / CAST(n3 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")).as("hl_micro"))
    tot.crossJoin(mi).crossJoin(hc).crossJoin(hl)
      .select(col("nn").as("n_vecs"), col("n_buckets"),
        expr("smax * 1000000 div nn").as("purity_ppm"),
        col("mi_micro"), col("hc_micro"), col("hl_micro"),
        expr("CAST(floor(CAST(mi_micro AS DOUBLE) / sqrt(CAST(hc_micro AS DOUBLE) * CAST(hl_micro AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("nmi_milli"))
  }

  /** IVF recall-vs-probes sweep — THE accuracy/throughput curve every
    * ANN deployment is tuned on: ground-truth cosine top-10 per query
    * (brute force over the bounded query panel) against the IVF
    * candidate top-10 when only the p nearest centroid buckets are
    * probed, p ∈ {1, 2, 4}. All ranking uses the shared fixed-point
    * dot kernel with (score, id) tie-breaks, so both engines produce
    * the same SETS; windows partition by query id over bounded panels
    * (|Q| = vec_id % 100 — SF-proportional, never the corpus). */
  private[graft] def qIvfProbeRecall(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings").localCheckpoint(eager = false)
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val qs = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .localCheckpoint(eager = false)
    // ground truth: brute cosine top-10 per query (self excluded)
    val scored = qs.crossJoin(emb)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Similarity.dotFp(col("qv"), col("embedding")).as("d"),
        Similarity.dotFp(col("embedding"), col("embedding")).as("nv"),
        Similarity.dotFp(col("qv"), col("qv")).as("nq"))
      .withColumn("cosk",
        expr("CAST(floor((d / 1000000000.0) / (sqrt(nq / 1000000000.0) * sqrt(nv / 1000000000.0)) * 1000000000 + 0.5) AS BIGINT)"))
      .localCheckpoint(eager = false)
    val gt = scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cosk").desc, col("vec_id"))))
      .filter(col("rn") <= 10).select(col("qid"), col("vec_id"))
    // IVF side: bucket of every vector; per-query centroid ranking
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents,
      "cid", "cv")
    val qc = qs.crossJoin(broadcast(cents))
      .select(col("qid"), col("cid"),
        Similarity.dotFp(col("qv"), col("cv")).as("dc"))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dc").desc, col("cid"))))
    val probes = s.range(3).select(pow(lit(2), col("id")).cast("long").as("p"))
    val cand = qc.crossJoin(broadcast(probes))
      .filter(col("crank") <= col("p"))
      .join(assign, "cid")
      .select(col("p"), col("qid"), col("vec_id"))
      .filter(col("vec_id") =!= col("qid"))
    val ivfTop = cand
      .join(scored.select(col("qid"), col("vec_id"), col("cosk")),
        Seq("qid", "vec_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p"), col("qid"))
          .orderBy(col("cosk").desc, col("vec_id"))))
      .filter(col("rn") <= 10)
    val hits = ivfTop.join(gt, Seq("qid", "vec_id"))
      .groupBy(col("p"), col("qid")).agg(count(lit(1)).as("hit"))
    val perQ = qs.select(col("qid")).crossJoin(broadcast(probes))
      .join(hits, Seq("p", "qid"), "left").na.fill(0L, Seq("hit"))
    perQ.groupBy(col("p"))
      .agg(count(lit(1)).as("n_queries"), sum(col("hit")).as("sum_hits"))
      .select(col("p"), col("n_queries"),
        expr("sum_hits * 1000000 div (n_queries * 10)").as("recall_ppm"))
      .orderBy(col("p"))
  }

  /** One sweep of Tukey median polish over the weekday × month
    * revenue grid — the robust two-way decomposition (row effects,
    * column effects, residuals) that finds "Mondays in Dec-97 were
    * weird" where a mean-based ANOVA smears the outlier across the
    * whole row. Low-median convention keeps every effect an EXACT
    * integer (no halving, no floats); both median selections are
    * rn = ⌈n/2⌉ order statistics over the bounded 7×~84 grid
    * domain. Emits the top-10 |residual| cells with their
    * decomposition. */
  private[graft] def qMedianPolish(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = t(s, dir, "orders")
      // pmod, not %: signed remainder would split each weekday into
      // two strata (-3 and 4 are both Mondays) the moment the fixture
      // gains pre-1995 dates — both engines replicate the same signed
      // %, so the hash gate could never catch the wrong decomposition
      .groupBy(pmod(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long"), lit(7L)).as("dow"),
        ((year(col("o_orderdate")) - 1995) * 12 +
          month(col("o_orderdate")) - 1).cast("long").as("m"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) div 100000").as("v"))
      .localCheckpoint(eager = false)
    val rowMed = grid
      .withColumn("rn", row_number().over(Window.partitionBy(col("dow"))
        .orderBy(col("v"), col("m"))))
      .withColumn("nr", count(lit(1)).over(Window.partitionBy(col("dow"))))
      .filter(col("rn") === expr("(nr + 1) div 2"))
      .select(col("dow"), col("v").as("row_eff"))
    val r1 = grid.join(broadcast(rowMed), "dow")
      .withColumn("res1", col("v") - col("row_eff"))
    val colMed = r1
      .withColumn("rn", row_number().over(Window.partitionBy(col("m"))
        .orderBy(col("res1"), col("dow"))))
      .withColumn("nc", count(lit(1)).over(Window.partitionBy(col("m"))))
      .filter(col("rn") === expr("(nc + 1) div 2"))
      .select(col("m"), col("res1").as("col_eff"))
    r1.join(broadcast(colMed), "m")
      .select(col("dow"), col("m"), col("v"), col("row_eff"), col("col_eff"),
        (col("res1") - col("col_eff")).as("residual"))
      .orderBy(abs(col("residual")).desc, col("dow"), col("m")).limit(10)
  }

  /** Decision-curve analysis (net benefit) of the document quality
    * model — the threshold readout that answers the question
    * q_threshold_f1/q_threshold_youden can't: "at MY cost ratio, is
    * using this model better than treating everyone (or no one)?"
    * NB(t) = TP/N − FP/N·t/(1−t), evaluated at each logit bin's
    * implied probability, against the treat-all reference. Same
    * 21-bin score domain and reverse-cumulative window as the other
    * threshold queries; every count exact, each NB one fixed double
    * tree. */
  private[graft] def qDecisionCurve(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = t(s, dir, "documents")
      .select(
        (col("n_chars") >= 200).as("label"),
        qualityLogitMilli
          .as("logit_milli"))
      .withColumn("bin",
        greatest(least(expr("logit_milli div 2000"), lit(10L)), lit(-10L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"))
    val tot = binned.agg(sum(col("n")).as("nn"), sum(col("pos")).as("npos"))
    val wDesc = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("pred_pos", sum(col("n")).over(wDesc))
      .withColumn("tp", sum(col("pos")).over(wDesc))
      .crossJoin(broadcast(tot))
      .withColumn("t", expr("1.0 / (1.0 + exp(-CAST(bin AS DOUBLE) * 2.0))"))
      .select(col("bin").as("threshold_bin"), col("tp"),
        (col("pred_pos") - col("tp")).as("fp"),
        expr("CAST(floor((CAST(tp AS DOUBLE) / CAST(nn AS DOUBLE) - CAST(pred_pos - tp AS DOUBLE) / CAST(nn AS DOUBLE) * (t / (1.0 - t))) * 1000000 + 0.5) AS BIGINT)").as("nb_model_micro"),
        expr("CAST(floor((CAST(npos AS DOUBLE) / CAST(nn AS DOUBLE) - CAST(nn - npos AS DOUBLE) / CAST(nn AS DOUBLE) * (t / (1.0 - t))) * 1000000 + 0.5) AS BIGINT)").as("nb_all_micro"))
      .orderBy(col("threshold_bin"))
  }

  /** Chao1 richness estimate of the unseen vocabulary per source —
    * "how many distinct tokens would this source show at infinite
    * crawl depth?": V + F₁²/(2F₂) from the hapax/dis counts, the
    * abundance-based cousin of q_capture_recapture and the
    * population-level complement to q_heaps' growth exponent. One
    * frequency-of-frequencies aggregation; the estimator and its
    * coverage deficit are fixed double trees per ≤10-row output. */
  private[graft] def qChao1(s: SparkSession, dir: String): DataFrame = {
    val tf = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("m"))
    tf.groupBy(col("source"))
      .agg(count(lit(1)).as("v_obs"),
        sum(when(col("m") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("m") === 2, 1L).otherwise(0L)).as("f2"))
      .filter(col("f2") > 0)
      .select(col("source"), col("v_obs"), col("f1"), col("f2"),
        expr("CAST(floor(CAST(v_obs AS DOUBLE) + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE) / (2.0 * CAST(f2 AS DOUBLE)) + 0.5) AS BIGINT)").as("chao1_est"),
        expr("CAST(floor(CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE) / (2.0 * CAST(f2 AS DOUBLE)) / (CAST(v_obs AS DOUBLE) + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE) / (2.0 * CAST(f2 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)").as("unseen_share_ppm"))
      .orderBy(col("source"))
  }

  /** Vocabulary overlap between sources — the Szymkiewicz-Simpson
    * coefficient |A∩B|/min(|A|,|B|) plus Jaccard for every source
    * pair, top-10: the dataset-card answer to "which sources are
    * re-crawls of each other" BEFORE any document-level dedup runs
    * (q_cross_source_dups finds shared docs; this finds shared
    * REGISTERS). The pair counts come from the inverted index — a
    * self-join keyed on token, never source × source × vocabulary —
    * and every coefficient is exact ppm integer division. */
  private[graft] def qVocabOverlap(s: SparkSession, dir: String): DataFrame = {
    val sv = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .localCheckpoint(eager = false)
    val sizes = sv.groupBy(col("source")).agg(count(lit(1)).as("v"))
    val inter = sv.as("a").join(sv.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("both"))
    inter
      .join(broadcast(sizes.select(col("source").as("s1"), col("v").as("v1"))), "s1")
      .join(broadcast(sizes.select(col("source").as("s2"), col("v").as("v2"))), "s2")
      .select(col("s1"), col("s2"), col("both"),
        expr("both * 1000000 div least(v1, v2)").as("overlap_ppm"),
        expr("both * 1000000 div (v1 + v2 - both)").as("jaccard_ppm"))
      .orderBy(col("overlap_ppm").desc, col("s1"), col("s2")).limit(10)
  }

  /** Horvitz-Thompson estimation through the deterministic sampler —
    * the audit that turns q_weighted_sample's mixture gate into a
    * STATISTICAL instrument: each stratum's inclusion probability is
    * known by construction (the md5 gate's rate), so the inverse-
    * probability-weighted total Σx/π must land near the true total,
    * and the query measures exactly how near in ppm. Per-row weights
    * are exact integer milli (x·100000/rate via integer division);
    * the comparison runs against the full-scan truth in the same
    * plan. */
  private[graft] def qHorvitzThompson(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 90L)
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 15L)
      .otherwise(40L)
    val base = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), rate.as("rate"),
        (h60(concat(lit("ht|"), col("doc_id").cast("string"))) % 100).as("g"))
    val truth = base.agg(count(lit(1)).as("n_total"),
      sum(col("n_chars")).as("true_total"))
    val sampled = base.filter(col("g") < col("rate"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(expr("n_chars * 100000 div rate")).as("ht_milli"))
    sampled.crossJoin(broadcast(truth))
      .select(col("n_sampled"), col("n_total"),
        col("ht_milli"), col("true_total"),
        expr("abs(ht_milli div 1000 - true_total) * 1000000 div true_total").as("err_ppm"))
  }

  /** Energy-distance two-sample test IN EMBEDDING SPACE — are label-0
    * and label-1 vectors drawn from the same distribution? The
    * multivariate companion to q_energy_distance's scalar test and
    * the statistical upgrade of q_embed_drift's mean-only view
    * (energy distance sees covariance and shape, not just the
    * centroid). Arms are md5-capped (bounded pair matrices at any
    * SF); distances come from the shared fixed-point L2 kernel, each
    * rounded to integer micro BEFORE its sum. */
  private[graft] def qEmbedTwoSample(s: SparkSession, dir: String): DataFrame = {
    def arm(lbl: Int, tag: String) = t(s, dir, "embeddings")
      .filter(col("label") === lbl)
      .select(col("vec_id").as("k"), col("embedding").as("e"),
        h60(concat(lit(s"e2s$tag|"), col("vec_id").cast("string"))).as("h"))
      .orderBy(col("h"), col("k")).limit(200).drop("h")
      .localCheckpoint(eager = false)
    val x = arm(0, "a")
    val y = arm(1, "b")
    def dmicro(ea: org.apache.spark.sql.Column, eb: org.apache.spark.sql.Column) =
      expr2Micro(graft.functions.kernels.fixed_point_l2(ea, eb))
    val sxy = x.as("x").crossJoin(y.as("y"))
      .select(dmicro(col("x.e"), col("y.e")).as("d"))
      .agg(sum(col("d")).as("sd"), count(lit(1)).as("n"))
      .select(expr("CAST(floor(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)").as("exy_micro"),
        col("n").as("nxy"))
    val sxx = x.as("a").join(x.as("b"), col("a.k") < col("b.k"))
      .select(dmicro(col("a.e"), col("b.e")).as("d"))
      .agg(sum(col("d")).as("sd"), count(lit(1)).as("n"))
      .select(expr("CAST(floor(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)").as("exx_micro"))
    val syy = y.as("a").join(y.as("b"), col("a.k") < col("b.k"))
      .select(dmicro(col("a.e"), col("b.e")).as("d"))
      .agg(sum(col("d")).as("sd"), count(lit(1)).as("n"))
      .select(expr("CAST(floor(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)").as("eyy_micro"))
    sxy.crossJoin(sxx).crossJoin(syy)
      .select(col("nxy"), col("exy_micro"), col("exx_micro"), col("eyy_micro"),
        (lit(2L) * col("exy_micro") - col("exx_micro") - col("eyy_micro"))
          .as("energy_micro"))
  }

  /** Effective sample size of the inverse-probability weights behind
    * q_horvitz_thompson — Kish's ESS = (Σw)²/Σw² and the design
    * effect n/ESS: the number that says how much statistical power
    * the 90/15/40 mixture sampling actually costs (unequal weights
    * waste information even when the estimator stays unbiased).
    * Weights are exact integer milli per stratum; both figures are
    * fixed double trees over three integer sums. */
  private[graft] def qEssWeights(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 90L)
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 15L)
      .otherwise(40L)
    t(s, dir, "documents")
      .select(col("doc_id"), rate.as("rate"),
        (h60(concat(lit("ht|"), col("doc_id").cast("string"))) % 100).as("g"))
      .filter(col("g") < col("rate"))
      .select(expr("100000 div rate").as("w"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("w")).as("sw"),
        sum(col("w") * col("w")).as("sww"))
      .select(col("n_sampled"), col("sw").as("sum_w_milli"),
        expr("CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("ess_milli"),
        expr("CAST(floor(CAST(n_sampled AS DOUBLE) / (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE)) * 1000 + 0.5) AS BIGINT)").as("design_effect_milli"))
  }

  /** Matthews correlation coefficient of the document quality model
    * at the zero-logit operating point — the single-number binary
    * metric that survives class imbalance where accuracy and even F1
    * inflate (MCC is the only one of the family that uses ALL four
    * confusion cells symmetrically). Cells are exact integer counts
    * from one pass; the √ of a four-factor product runs as
    * √a·√b·√c·√d to keep every intermediate inside double range. */
  private[graft] def qMcc(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select((col("n_chars") >= 200).as("label"),
        (qualityLogitMilli >= 0)
          .as("pred"))
    scored.agg(
        sum(when(col("pred") && col("label"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("label"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("label"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("label"), 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("CAST(floor((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE)) / (sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE)) * sqrt(CAST(tn + fp AS DOUBLE)) * sqrt(CAST(tn + fn AS DOUBLE))) * 1000 + 0.5) AS BIGINT)").as("mcc_milli"),
        expr("(tp + tn) * 1000000 div (tp + fp + fn + tn)").as("accuracy_ppm"))
  }

  /** BPE tokenizer APPLICATION — the encode half that `TextOps.bpeTrain`
    * (q_bpe_pairs) trains for: a fixed rank-ordered merge table is applied
    * to every word as sequential global rewrites over the space-separated
    * symbol form (the classic fast approximation: each merge is one
    * deterministic left-to-right pass, identical in any engine), and the
    * per-source token accounting falls out — tokens, chars/token
    * compression, and the merge-coverage delta vs character-level
    * tokenization. Shape: one Generate (word explode) feeding a narrow
    * per-row rewrite chain (pure codegen'd string expressions, no UDF),
    * then ONE map-side-combined aggregate keyed by the ~5-value source
    * column — the corpus text never shuffles, only the 4-counter partials
    * do. The merge table is model-as-literal (broadcast-free: it compiles
    * into the expression tree), exactly how a trained vocabulary ships to
    * a 1000-executor encode job. */
  private[graft] def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val merges = Seq("t h" -> "th", "th e" -> "the", "i n" -> "in",
      "o w" -> "ow", "a t" -> "at", "e r" -> "er", "s t" -> "st",
      "a r" -> "ar")
    val spaced = trim(regexp_replace(col("w"), "(.)", "$1 "))
    val encoded = merges.foldLeft(spaced) { case (c, (from, to)) =>
      regexp_replace(c, from, to)
    }
    t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      // leading/trailing/repeated spaces split into empty "words"
      // (chars=0, toks=1) that would skew n_words and the per-token
      // ratios — drop them before aggregating, as a tokenizer would
      .filter(col("w") =!= "")
      .select(col("source"), length(col("w")).cast("long").as("chars"),
        size(split(encoded, " ")).cast("long").as("toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"), sum(col("chars")).as("n_chars"),
        sum(col("toks")).as("n_tokens"))
      .select(col("source"), col("n_words"), col("n_chars"), col("n_tokens"),
        expr("n_chars * 1000000 div n_tokens").as("chars_per_token_ppm"),
        expr("(n_chars - n_tokens) * 1000000 div n_chars").as("merge_savings_ppm"))
      .orderBy(col("source"))
  }

  /** Mojibake (encoding-corruption) detection and repair — the ftfy-style
    * screen a multilingual crawl needs before dedup: UTF-8 bytes decoded
    * as Latin-1 turn every accented vowel into a 'Ã'-led pair, silently
    * splitting duplicate clusters and poisoning n-gram stats. Corruption
    * is synthesized from nation names in BOTH engines (accent injection
    * via translate, then the double-encode rewrite), so the detector
    * (the 'Ã' marker) and the inverse repair table are value-checked
    * against ground truth: repaired text must equal the original
    * accented form field-for-field. Pure per-row string expressions —
    * zero shuffle, embarrassingly parallel at corpus scale; the repair
    * table is model-as-literal in the expression tree like q_bpe_encode's
    * merges. */
  private[graft] def qMojibake(s: SparkSession, dir: String): DataFrame = {
    val base = lower(col("n_name"))
    val accented = translate(base, "aeou", "áéöü")
    // UTF-8 bytes of each accented vowel re-read as Latin-1: the
    // canonical double-encode corruption (á = C3 A1 → "Ã¡", …)
    val pairs = Seq("á" -> "Ã¡", "é" -> "Ã©", "ö" -> "Ã¶", "ü" -> "Ã¼")
    val corrupted = pairs.foldLeft(accented) { case (c, (good, bad)) =>
      regexp_replace(c, good, bad)
    }
    val repaired = pairs.foldLeft(corrupted) { case (c, (good, bad)) =>
      regexp_replace(c, bad, good)
    }
    t(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        corrupted.as("corrupted"), repaired.as("repaired"),
        corrupted.contains("Ã").as("had_mojibake"),
        (repaired === accented).as("repaired_ok"))
      .orderBy(col("n_nationkey"))
  }

  /** Training-shard manifest — the handoff artifact between curation and
    * the training job: every document is assigned a deterministic shard
    * by salted md5 (replayable on any engine, stable across reruns), and
    * the manifest rows carry what a data loader needs to plan an epoch:
    * docs, whitespace tokens, chars, an ORDER-INDEPENDENT content
    * checksum (bit_xor of 60-bit digests of doc_id|text — a changed
    * document changes the shard checksum, not just a changed membership;
    * verifiable shard integrity without sorting anything), and the
    * balance deviation vs
    * the ideal even split in signed ppm. Shape: one scan, one map-side-
    * combined aggregate on the 16-value shard key, grand total joined
    * back by broadcast — no window, no second scan of the text. */
  private[graft] def qShardManifest(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(
      (conv(substring(md5(concat(lit("shard|"), col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("long") % 16).as("shard"),
      size(split(col("text"), " ")).cast("long").as("toks"),
      length(col("text")).cast("long").as("chars"),
      h60(concat(col("doc_id").cast("string"), lit("|"), col("text")))
        .as("digest"))
    val manifest = d.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        sum(col("chars")).as("n_chars"),
        expr("bit_xor(digest)").as("checksum"))
    val total = manifest.agg(sum(col("n_docs")).as("total_docs"))
    manifest.crossJoin(broadcast(total))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("checksum"),
        expr("n_docs * 16 * 1000000 div total_docs - 1000000").as("skew_ppm"))
      .orderBy(col("shard"))
  }

  /** Temperature-scaled mixture sampling — the multilingual/multi-source
    * rebalancing rule (w_s ∝ n_s^α, α = ½ here): raw token counts make
    * the big source dominate, α < 1 flattens the mixture so small
    * sources upsample (mBERT/XLM-R exponent-smoothing). Pipeline
    * shape: ONE scan collapses documents to 5 per-source token counts;
    * sqrt lands on int64 micro units immediately (IEEE sqrt is
    * correctly rounded, so floor(sqrt·1e6+½) is bit-portable; the
    * cross-source normalizer then sums INTEGERS — order-independent
    * where a double Σ√n would be partial-aggregation-order dependent).
    * Emits each source's mixture weight (ppm), its token quota under a
    * ¼-corpus training budget, and the implied epochs over its own
    * data in milli (epochs > 1000 ⇒ the flattened mixture repeats the
    * small source — the visible upsampling). */
  private[graft] def qTemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy(col("source")).agg(sum(col("toks")).as("n_tokens"))
      .withColumn("sq_micro",
        expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"))
    val tot = counts.agg(sum(col("sq_micro")).as("sq_tot"),
      sum(col("n_tokens")).as("n_tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        expr("sq_micro * 1000000 div sq_tot").as("weight_ppm"),
        expr("(n_tot div 4) * sq_micro div sq_tot").as("token_quota"),
        expr("((n_tot div 4) * sq_micro div sq_tot) * 1000 div n_tokens")
          .as("epochs_milli"))
      .orderBy(col("source"))
  }

  /** Johnson–Lindenstrauss random projection 64→16 dims with a
    * per-pair distortion audit — the embedding-compression primitive
    * for ANN-index memory (4× smaller vectors, distances preserved in
    * expectation): a deterministic ±1 projection matrix (md5-parity
    * signs — Achlioptas's database-friendly JL, engine-portable where
    * a Gaussian matrix is a seeded generator), y = Rx in exact int64
    * over fp3-quantized inputs, then for 32 audit pairs the projected
    * vs original squared-distance ratio (E[‖Δy‖²] = 16·‖Δx‖², so
    * ratio_ppm ≈ 1e6). Scale shape: the 64×16 sign matrix is
    * model-as-broadcast and the projection is one map-side join +
    * grouped sum per vector — the corpus never shuffles raw vectors;
    * the audit pairs are a bounded probe set. */
  private[graft] def qRandomProjection(s: SparkSession, dir: String): DataFrame = {
    val xq = t(s, dir, "embeddings").filter(col("vec_id") < 64)
      .select(col("vec_id").as("v"), posexplode(col("embedding")))
      .select(col("v"), (col("pos") + 1).cast("long").as("i"),
        expr("CAST(floor(CAST(col AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("xq"))
      .localCheckpoint(eager = false)
    val signs = s.range(1, 65).select(col("id").as("i"))
      .crossJoin(s.range(1, 17).select(col("id").as("j")))
      .withColumn("sign", lit(1L) - lit(2L) *
        (h60(concat(lit("rp|"), col("i").cast("string"), lit("|"),
          col("j").cast("string"))) % 2))
    val y = xq.join(broadcast(signs), "i")
      .groupBy(col("v"), col("j")).agg(sum(col("xq") * col("sign")).as("y"))
    val ax = xq.filter(col("v") % 2 === 0)
      .select(expr("v div 2").as("p"), col("i"), col("xq").as("xa"))
    val bx = xq.filter(col("v") % 2 === 1)
      .select(expr("v div 2").as("p"), col("i"), col("xq").as("xb"))
    val d2o = ax.join(bx, Seq("p", "i"))
      .groupBy(col("p"))
      .agg(sum((col("xa") - col("xb")) * (col("xa") - col("xb"))).as("d2_orig"))
    val ya = y.filter(col("v") % 2 === 0)
      .select(expr("v div 2").as("p"), col("j"), col("y").as("ya"))
    val yb = y.filter(col("v") % 2 === 1)
      .select(expr("v div 2").as("p"), col("j"), col("y").as("yb"))
    val d2p = ya.join(yb, Seq("p", "j"))
      .groupBy(col("p"))
      .agg(sum((col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2_proj"))
    d2o.join(d2p, "p")
      .select(expr("p * 2").as("d1"), expr("p * 2 + 1").as("d2"),
        col("d2_orig"), col("d2_proj"),
        expr("d2_proj * 1000000 div (d2_orig * 16)").as("ratio_ppm"))
      .orderBy(col("d1"))
  }

  /** Tokenizer-ablation sweep — the merge-count vs compression curve
    * behind "how big should the vocabulary be": the SAME fixed merge
    * table as q_bpe_encode applied at depths 0/2/4/8, all four token
    * counts computed from ONE scan (the rewrite chains share prefixes:
    * depth-4 extends depth-2's codegen'd expression, so the corpus
    * text is read once and never shuffled — only the 4-counter partials
    * do). Emits tokens and chars-per-token ppm per depth; the marginal
    * compression of each merge pair is the diminishing-returns readout
    * a vocab-size decision reads. */
  private[graft] def qBpeSweep(s: SparkSession, dir: String): DataFrame = {
    val merges = Seq("t h" -> "th", "th e" -> "the", "i n" -> "in",
      "o w" -> "ow", "a t" -> "at", "e r" -> "er", "s t" -> "st",
      "a r" -> "ar")
    def enc(c: org.apache.spark.sql.Column, ms: Seq[(String, String)]) =
      ms.foldLeft(c) { case (x, (f, to)) => regexp_replace(x, f, to) }
    val spaced = trim(regexp_replace(col("w"), "(.)", "$1 "))
    val e2 = enc(spaced, merges.take(2))
    val e4 = enc(e2, merges.slice(2, 4))
    val e8 = enc(e4, merges.slice(4, 8))
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(length(col("w")).cast("long").as("chars"),
        size(split(e2, " ")).cast("long").as("t2"),
        size(split(e4, " ")).cast("long").as("t4"),
        size(split(e8, " ")).cast("long").as("t8"))
      .agg(count(lit(1)).as("n_words"), sum(col("chars")).as("c0"),
        sum(col("t2")).as("s2"), sum(col("t4")).as("s4"),
        sum(col("t8")).as("s8"))
      .select(col("n_words"), col("c0"),
        expr("stack(4, 0L, c0, 2L, s2, 4L, s4, 8L, s8)")
          .as(Seq("n_merges", "n_tokens")))
      .select(col("n_merges"), col("n_words"), col("n_tokens"),
        expr("c0 * 1000000 div n_tokens").as("chars_per_token_ppm"))
      .orderBy(col("n_merges"))
  }

  /** Length-bucketed batching audit — the padding-waste arithmetic
    * behind bucketed training batches: documents land in power-of-two
    * token-length buckets (bucket = 2^⌈log₂ n⌉ via the engine-portable
    * length-of-binary trick — no float log at the boundary), and each
    * bucket reports the pad waste of batching at the BUCKET max next to
    * the waste of naively padding everything to the GLOBAL max. The
    * delta is the throughput a length-bucketed loader buys (the
    * complementary strategy to q_pack_windows' concat-and-split
    * packing). One scan, one bounded ~12-bucket aggregate; all ratios
    * exact integer ppm. */
  private[graft] def qLengthBatching(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .filter(col("n") >= 1)
      .withColumn("bucket_max",
        when(col("n") <= 1, 1L)
          .otherwise(expr("shiftleft(1L, length(bin(n - 1)))")))
    val buckets = d.groupBy(col("bucket_max"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    val global = d.agg(max(col("n")).as("gmax"), count(lit(1)).as("gdocs"),
      sum(col("n")).as("gtokens"))
    buckets.crossJoin(broadcast(global))
      .select(col("bucket_max"), col("n_docs"), col("n_tokens"),
        expr("(n_docs * bucket_max - n_tokens) * 1000000 div (n_docs * bucket_max)")
          .as("pad_waste_ppm"),
        expr("(gdocs * gmax - gtokens) * 1000000 div (gdocs * gmax)")
          .as("global_pad_waste_ppm"))
      .orderBy(col("bucket_max"))
  }

  /** T5-style span-corruption accounting (Raffel et al., JMLR'20 §3.1.4
    * denoising objective): every token position draws a deterministic
    * mask-start decision (15 %) and a span length (1–3) from digits of
    * the shared h60 digest of (doc_id ≪ 20) + pos, overlapping spans
    * merge, and each document reports its token count, masked-token
    * count, merged-span count, realized corruption ppm and mean span
    * length ppm — the pre-flight audit that the masking schedule hits
    * its target rate before a pretraining run. Scale shape: pure
    * per-row arithmetic — whether position p is covered by a span from
    * p−1/p−2 is recomputed from THEIR hashes right at p (span length ≤
    * 3 bounds the lookback), so there is no window, no self-join, and
    * the only shuffle is the final per-doc aggregate. */
  private[graft] def qSpanCorruption(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), w => w =!= ""))
          .as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
    def h(k: Int) =
      h60(col("doc_id") * 1048576L + col("pos") - lit(k.toLong))
    def startAt(k: Int) =
      (col("pos") >= k) && (h(k) % 100 < 15)
    // span length from the NEXT digit pair of the same digest:
    // (h % 300) div 100 == (h div 100) % 3, but the mod-300 form keeps
    // the intermediate ≤ 299 — h60 itself exceeds 2^53, so dividing it
    // as a double would round before the floor
    def lenAt(k: Int) =
      lit(1L) + ((h(k) % 300) / lit(100L)).cast("long")
    val flags = toks.select(col("doc_id"),
      (startAt(0) || (startAt(1) && lenAt(1) > 1) ||
        (startAt(2) && lenAt(2) > 2)).cast("long").as("masked"),
      (startAt(0) && !(startAt(1) && lenAt(1) > 1) &&
        !(startAt(2) && lenAt(2) > 2)).cast("long").as("span_begin"))
    flags.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("masked")).as("n_masked"),
        sum(col("span_begin")).as("n_spans"))
      .select(col("doc_id"), col("n_tokens"), col("n_masked"), col("n_spans"),
        expr("n_masked * 1000000 div n_tokens").as("corruption_ppm"),
        expr("CASE WHEN n_spans > 0 THEN n_masked * 1000000 div n_spans " +
          "ELSE 0 END").as("mean_span_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Incremental (cross-snapshot) dedup — the steady-state shape of a
    * production crawl pipeline: dedup is NOT re-run over the union of
    * all history; the new batch dedups (a) against the accepted
    * snapshot by content digest anti-join and (b) within itself
    * keeping the smallest doc_id. Snapshots here are two overlapping
    * md5 slices of the corpus (a re-crawl re-fetches unchanged pages →
    * identical bytes → identical digest — the case this operator
    * exists for). Per source: batch size, dups vs the snapshot, dups
    * inside the batch, survivors ingested. Scale shape: only 16-byte
    * digests shuffle (never text), the vs-old check is a digest
    * semi/anti join, the within-batch keep-best is one hash groupBy —
    * the same core as exact dedup, applied delta-to-corpus instead of
    * corpus-to-corpus. */
  private[graft] def qIncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val digested = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), md5(col("text")).as("dg"),
        (h60(concat(lit("snap|"), col("doc_id").cast("string"))) % 10)
          .as("slice"))
    val oldDg = digested.filter(col("slice") < 8).select(col("dg")).distinct()
    val batch = digested.filter(col("slice") >= 6)
      .select(col("doc_id"), col("source"), col("dg"))
    val vsOld = batch.join(oldDg, Seq("dg"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_dup_vs_snapshot"))
    val fresh = batch.join(oldDg, Seq("dg"), "left_anti")
    val kept = fresh.groupBy(col("dg"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("copies"))
    val keptBySource = kept
      .join(fresh.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_ingested"),
        sum(col("copies") - 1).as("n_dup_in_batch"))
    batch.groupBy(col("source")).agg(count(lit(1)).as("n_batch"))
      .join(vsOld, Seq("source"), "left")
      .join(keptBySource, Seq("source"), "left")
      .select(col("source"), col("n_batch"),
        coalesce(col("n_dup_vs_snapshot"), lit(0L)).as("n_dup_vs_snapshot"),
        coalesce(col("n_dup_in_batch"), lit(0L)).as("n_dup_in_batch"),
        coalesce(col("n_ingested"), lit(0L)).as("n_ingested"))
      .orderBy(col("source"))
  }

  /** Preference-pair mining (the DPO/RLHF dataset-construction step):
    * documents group into prompt cells (source × 5 length buckets);
    * inside each cell the deterministic quality logit picks CHOSEN
    * (best) and REJECTED (worst), emitted only when the margin clears
    * 500 milli-logits — weak preferences teach nothing. Ties cannot
    * occur: score and id pack into one integer (score offset to
    * positive, ×1e9 + doc_id) so min/max ARE argmin/argmax with a
    * total order — the exact-integer analog of max_by with a
    * deterministic tiebreak, and one map-side-combining aggregate
    * per cell at any corpus scale. */
  private[graft] def qRlhfPairs(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        least(expr("n_chars div 200"), lit(4L)).as("len_bucket"),
        qualityLogitMilli
          .as("score_milli"))
      .withColumn("packed",
        (col("score_milli") + 100000L) * 1000000000L + col("doc_id"))
    scored.groupBy(col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("packed")).as("mx"), min(col("packed")).as("mn"))
      .filter(col("n_docs") >= 2)
      .select(col("source"), col("len_bucket"), col("n_docs"),
        expr("mx % 1000000000").as("chosen_id"),
        expr("mx div 1000000000 - 100000").as("chosen_milli"),
        expr("mn % 1000000000").as("rejected_id"),
        expr("mn div 1000000000 - 100000").as("rejected_milli"))
      .withColumn("margin_milli", col("chosen_milli") - col("rejected_milli"))
      .filter(col("margin_milli") >= 500)
      .orderBy(col("source"), col("len_bucket"))
  }

  /** REAL pixel decode → transform → re-encode, end to end: each
    * selected document synthesizes a complete binary PGM (pixel
    * (x,y) = (id·7 + x·31 + y·17) mod 256 — real netpbm bytes, not a
    * stub), `image_stats` reads EVERY pixel (exact integer sums), the
    * image is box-downsampled by 2 (floor of block mean, re-encoded as
    * PGM), and the downsampled image's stats are read back. The oracle
    * replays the whole pipeline over a generate_series pixel grid —
    * the first query where the multimodal stage's pixel DATA, not just
    * container headers, crosses the engine boundary. Per-row kernels
    * only (one narrow map over the doc subset); compressed codecs
    * would swap into the same seam via mapPartitions. */
  private[graft] def qImagePipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 8).cast("int").as("w"),
        (lit(12) + col("doc_id") % 4).cast("int").as("h"))
    d.select(col("doc_id"),
        image_stats(synth_pgm(col("doc_id"), col("w"), col("h"))).as("s"),
        image_stats(image_downsample(
          synth_pgm(col("doc_id"), col("w"), col("h")), 2)).as("ds"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.px_sum").as("px_sum"),
        expr("s.px_sum * 1000 div s.n_px").as("mean_milli"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"),
        col("ds.width").cast("long").as("ds_width"),
        col("ds.height").cast("long").as("ds_height"),
        col("ds.px_sum").as("ds_px_sum"))
      .orderBy(col("doc_id"))
  }

  /** REAL PCM sample decode: each selected document synthesizes a
    * complete RIFF/WAVE (PCM16-LE mono 16 kHz, sample s(t) =
    * ((id·7919 + t·2654435761) mod 65536) − 32768) and `audio_stats`
    * reads every sample — exact counts/sums (abs, squares), peak,
    * sign-change crossings, rail-clipping — from which duration and
    * RMS derive arithmetically (floor∘sqrt of an exact int64 is
    * bit-portable). The oracle replays the congruence over
    * generate_series with a lag window for crossings. The audio twin
    * of q_image_pipeline: sample DATA, not just the fmt header,
    * crosses the engine boundary. */
  private[graft] def qAudioPcm(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(200) + col("doc_id") % 50).cast("int").as("n"))
    d.select(col("doc_id"),
        audio_stats(synth_wav_pcm(col("doc_id"), col("n"))).as("a"))
      .select(col("doc_id"),
        col("a.n_samples").as("n_samples"),
        expr("a.n_samples * 1000 div 16000").as("duration_ms"),
        col("a.sum_abs").as("sum_abs"),
        floor(sqrt(expr("a.sum_sq div a.n_samples").cast("double")))
          .cast("long").as("rms_floor"),
        col("a.peak").cast("long").as("peak"),
        col("a.zero_crossings").as("zero_crossings"),
        col("a.clip_count").as("clip_count"))
      .orderBy(col("doc_id"))
  }

  /** REAL COMPRESSED-image decode, oracle-checked end to end: each
    * selected document synthesizes a complete PNG — grayscale-8 IHDR,
    * DEFLATE-compressed IDAT, chunk CRCs, and all FIVE scanline
    * filters cycling by row (pixel (x,y) = (id·7 + x·31 + y·17) mod
    * 256, the synth_pgm congruence) — and `png_stats` decodes it back:
    * chunk walk with CRC verification, java.util.zip INFLATE, full
    * None/Sub/Up/Average/Paeth reconstruction, then exact integer
    * pixel statistics. The oracle replays the congruence over a
    * generate_series grid, so the gate proves
    * decode(deflate(filter(px))) == px over real zlib bytes — closing
    * the "real corpora are compressed" gap in the multimodal story
    * (round-7 advice #6). Per-row kernels only; the corpus-scale shape
    * is identical to q_image_pipeline's narrow map. */
  private[graft] def qPngDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 8).cast("int").as("w"),
        (lit(12) + col("doc_id") % 4).cast("int").as("h"))
    d.select(col("doc_id"),
        png_stats(synth_png(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.px_sum").as("px_sum"),
        expr("s.px_sum * 1000 div s.n_px").as("mean_milli"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** REAL ENTROPY-CODED image decode, oracle-checked end to end: each
    * selected document synthesizes a complete baseline JPEG (SOF0,
    * Annex K Huffman DHTs, all-ones DQT, byte-stuffed entropy scan)
    * whose 8×8 block (bx, by) is the CONSTANT value (id·7 + bx·31 +
    * by·17) mod 256 — block-constant spectra are DC-only, so the lossy
    * codec is exactly invertible and `jpeg_stats` (marker walk,
    * stream-defined Huffman decode, dequantize, IDCT) returns
    * bit-exact pixels the oracle replays with integer arithmetic.
    * Dims span non-multiples of 8, so partial boundary blocks and the
    * DC prediction chain are both exercised. The compressed-image gap
    * closer on top of q_png_decode (round-8 advice #2). */
  private[graft] def qJpegDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(24) + col("doc_id") % 16).cast("int").as("w"),
        (lit(16) + col("doc_id") % 8).cast("int").as("h"))
    d.select(col("doc_id"),
        jpeg_stats(synth_jpeg(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.px_sum").as("px_sum"),
        expr("s.px_sum * 1000 div s.n_px").as("mean_milli"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** Color JPEG decode: 3-component 4:4:4 baseline with per-component
    * block-constant congruences — exercises the interleaved-MCU scan
    * and THREE independent DC prediction chains while staying exactly
    * invertible (DC-only spectra). No color transform on either side:
    * components are raw planes, so the oracle replays each channel's
    * block congruence directly. */
  private[graft] def qJpegRgbDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(24) + col("doc_id") % 16).cast("int").as("w"),
        (lit(16) + col("doc_id") % 8).cast("int").as("h"))
    d.select(col("doc_id"),
        jpeg_stats_rgb(synth_jpeg_rgb(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.channels").cast("long").as("channels"),
        col("s.px_sum").as("px_sum"),
        col("s.r_sum").as("r_sum"),
        col("s.g_sum").as("g_sum"),
        col("s.b_sum").as("b_sum"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** 4:2:0 chroma-subsampled JPEG decode — the layout mainstream
    * encoders default to: Y at 2×2 sampling (four blocks per MCU),
    * Cb/Cr point-downsampled by 2 and replication-upsampled on
    * decode. Y is block-constant per 8×8, chroma per 16×16 region, so
    * the subsample→DCT→upsample chain is exactly invertible and the
    * oracle replays both congruence granularities. Exercises the
    * 6-block MCU raster order and MCU-padded plane composition. */
  private[graft] def qJpeg420Decode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(24) + col("doc_id") % 16).cast("int").as("w"),
        (lit(16) + col("doc_id") % 8).cast("int").as("h"))
    d.select(col("doc_id"),
        jpeg_stats_rgb(synth_jpeg_420(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.channels").cast("long").as("channels"),
        col("s.px_sum").as("px_sum"),
        col("s.r_sum").as("r_sum"),
        col("s.g_sum").as("g_sum"),
        col("s.b_sum").as("b_sum"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** Real-world-convention JPEG decode: block-constant RGB → pinned
    * JFIF RGB→YCbCr (fixed-point, Jpeg.forwardYcc) → 4:4:4 baseline
    * codec → decode → pinned YCbCr→RGB inverse. Block constants keep
    * the codec layer exactly invertible, and both transforms are
    * integer maps the oracle replays term by term — so the FULL
    * real-JPEG pipeline (transform + entropy + DCT + quantize) is
    * value-verified, closing the round-9 "decodes real-world JPEGs"
    * gap. */
  private[graft] def qJpegYcbcr(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(24) + col("doc_id") % 16).cast("int").as("w"),
        (lit(16) + col("doc_id") % 8).cast("int").as("h"))
    d.select(col("doc_id"),
        jpeg_stats_ycbcr(synth_jpeg_ycbcr(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.channels").cast("long").as("channels"),
        col("s.px_sum").as("px_sum"),
        col("s.r_sum").as("r_sum"),
        col("s.g_sum").as("g_sum"),
        col("s.b_sum").as("b_sum"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** PROGRESSIVE JPEG decode (SOF2 — the mode most real web JPEGs
    * use): the full JFIF pipeline through the progressive codec —
    * spectral-selection scans (split luma bands), successive
    * approximation (DC Al=1 + refinement, AC Al=2→1→0 refinements),
    * EOB-run coding — then the pinned YCbCr→RGB inverse.
    * Block-constant input keeps every layer exactly invertible, so
    * the oracle replays the identical integer pipeline as
    * q_jpeg_ycbcr; the AC-content paths are pinned separately by the
    * progressive-equals-baseline coefficient property in JpegSpec. */
  private[graft] def qJpegProgressive(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(32) + col("doc_id") % 16).cast("int").as("w"),
        (lit(16) + col("doc_id") % 8).cast("int").as("h"))
    d.select(col("doc_id"),
        jpeg_stats_ycbcr(synth_jpeg_prog(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.channels").cast("long").as("channels"),
        col("s.px_sum").as("px_sum"),
        col("s.r_sum").as("r_sum"),
        col("s.g_sum").as("g_sum"),
        col("s.b_sum").as("b_sum"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** PROGRESSIVE JPEG at 4:2:0 chroma subsampling — the web's DEFAULT
    * progressive layout (round-11 verdict item: wire the MCU
    * interleave geometry between the progressive scans and the 4:2:0
    * upsampler): SOF2, Y at 2×2 through the libjpeg scan script with
    * interleaved DC over MCU-padded grids and per-component AC over
    * own grids, JFIF transform, replication upsample. RGB constant
    * per 16×16 region keeps every layer exactly invertible, so the
    * oracle replays forward ∘ identity ∘ inverse; arbitrary-pixel
    * coverage (incl. partial MCUs where padded and own grids differ)
    * is pinned by the progressive-420-equals-baseline-420 property in
    * JpegSpec. Dims 33..48 × 17..24 always exercise partial MCUs. */
  private[graft] def qJpegProgressive420(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(33) + col("doc_id") % 16).cast("int").as("w"),
        (lit(17) + col("doc_id") % 8).cast("int").as("h"))
    d.select(col("doc_id"),
        jpeg_stats_ycbcr(synth_jpeg_prog420(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.channels").cast("long").as("channels"),
        col("s.px_sum").as("px_sum"),
        col("s.r_sum").as("r_sum"),
        col("s.g_sum").as("g_sum"),
        col("s.b_sum").as("b_sum"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** JPEG coding-mode triage over a mixed corpus: baseline grayscale,
    * baseline YCbCr, progressive-marked (SOF2) and arithmetic-marked
    * (SOF9) containers, a truncated frame, and a non-JPEG payload —
    * six modes keyed on doc_id. jpeg_kind routes each WITHOUT
    * decoding, the step a 100 TB web-corpus pipeline runs before
    * dispatching to decoders (progressive is the majority of real web
    * JPEGs; nulling it blind loses the corpus). The oracle knows each
    * row's mode by construction. */
  private[graft] def qJpegTriage(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        expr("(doc_id div 25) % 6").cast("int").as("mode"),
        (lit(24) + col("doc_id") % 16).cast("int").as("w"),
        (lit(16) + col("doc_id") % 8).cast("int").as("h"))
    val base = synth_jpeg(col("doc_id"), col("w"), col("h"))
    val blob = when(col("mode") === 0, base)
      .when(col("mode") === 1, synth_jpeg_ycbcr(col("doc_id"), col("w"), col("h")))
      .when(col("mode") === 2, // a REAL progressive container now (the
        // marker-rewrite fixture became redundant once the progressive
        // encoder landed); kind() still reads it as "progressive"
        synth_jpeg_prog(col("doc_id"), col("w"), col("h")))
      .when(col("mode") === 3,
        jpeg_with_sof(synth_jpeg_rgb(col("doc_id"), col("w"), col("h")), 0xc9))
      .when(col("mode") === 4, expr("substring(base_blob, 1, 3)"))
      .otherwise(concat(lit("plain text payload ".getBytes), col("doc_id").cast("string").cast("binary")))
    val perRow = d.withColumn("base_blob", base)
      .select(col("doc_id"), col("mode"), jpeg_kind(blob).as("kind"))
    perRow.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_blobs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("kind"))
  }

  /** Grayscale+alpha PNG decode (color type 4, the 2-byte filter
    * offset): the oracle gate the round-9 verdict flagged as missing
    * for the already-implemented GA path — distinct gray and alpha
    * congruences through the interleave, per-plane sums replayed. */
  private[graft] def qPngGaDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 8).cast("int").as("w"),
        (lit(12) + col("doc_id") % 4).cast("int").as("h"))
    d.select(col("doc_id"),
        png_stats_rgb(synth_png_ga(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.channels").cast("long").as("channels"),
        col("s.px_sum").as("px_sum"),
        col("s.r_sum").as("gray_sum"),
        col("s.a_sum").as("a_sum"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** 16-bit PNG decode (depth 16, color type 0): big-endian u16
    * samples through the byte-level filter chain (bpp=2 left-neighbor
    * offset). The congruence spans the full u16 range so high and low
    * sample bytes both vary — a decoder that treats depth-16 rows as
    * two 8-bit pixels, or filters with bpp=1, cannot match the sums.
    * Closes the round-9 verdict's "16-bit either implemented or
    * scope-stated" item by implementing it. */
  private[graft] def qPng16Decode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 8).cast("int").as("w"),
        (lit(12) + col("doc_id") % 4).cast("int").as("h"))
    d.select(col("doc_id"),
        png_stats16(synth_png16(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.channels").cast("long").as("channels"),
        col("s.n_samples").as("n_samples"),
        col("s.sample_sum").as("sample_sum"),
        col("s.sample_min").cast("long").as("sample_min"),
        col("s.sample_max").cast("long").as("sample_max"))
      .orderBy(col("doc_id"))
  }

  /** G.711 telephony audio decode (µ-law and A-law, by doc parity):
    * companded bytes expanded to linear PCM with the public ITU
    * formulas — EXACT integer maps the oracle replays arithmetically
    * (complement/xor, exponent-mantissa expansion, the inverted A-law
    * sign convention) — then exact integer statistics. The
    * speech-corpus feature-extraction step: most PSTN/VoIP audio at
    * 100 TB is exactly this format. */
  private[graft] def qAudioG711(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.audio._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(200) + col("doc_id") % 50).cast("int").as("n"),
        expr("(doc_id div 25) % 2 = 1").as("alaw"))
    d.select(col("doc_id"),
        audio_stats_g711(synth_wav_g711(col("doc_id"), col("n"), col("alaw"))).as("s"))
      .select(col("doc_id"), col("s.law").as("law"),
        col("s.n_samples").as("n_samples"),
        col("s.sum_abs").as("sum_abs"),
        col("s.sum_sq").as("sum_sq"),
        col("s.peak").cast("long").as("peak"),
        col("s.zero_crossings").as("zero_crossings"))
      .orderBy(col("doc_id"))
  }

  /** WAV container triage over a six-mode mixed corpus (PCM 16/8/24,
    * µ-law, A-law, non-WAV): wav_kind routes by format tag and PCM
    * width WITHOUT decoding — the audio twin of q_jpeg_triage's
    * dispatch step. */
  private[graft] def qWavTriage(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    import graft.functions.audio._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        expr("(doc_id div 25) % 6").cast("int").as("mode"),
        (lit(40) + col("doc_id") % 20).cast("int").as("n"))
    val blob = when(col("mode") === 0, synth_wav_pcm(col("doc_id"), col("n")))
      .when(col("mode") === 1, synth_wav_bits(col("doc_id"), col("n"), 8))
      .when(col("mode") === 2, synth_wav_bits(col("doc_id"), col("n"), 24))
      .when(col("mode") === 3, synth_wav_g711(col("doc_id"), col("n"), lit(false)))
      .when(col("mode") === 4, synth_wav_g711(col("doc_id"), col("n"), lit(true)))
      .otherwise(concat(lit("just text ".getBytes),
        col("doc_id").cast("string").cast("binary")))
    d.select(col("doc_id"), wav_kind(blob).as("kind"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_blobs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("kind"))
  }

  /** ZIP container ingest — the third container of the family (gzip
    * members, WARC, ZIP): central-directory-driven walk (EOCD → CD →
    * per-entry local headers), deflate inflation with CRC32 + size
    * verification. Corrupt docs get their FIRST entry's compressed
    * bytes flipped: that entry nulls and the walk CONTINUES — the
    * per-entry-isolation contrast to WARC's terminal member loss,
    * because central-directory framing survives payload damage. The
    * fixture writer (java.util.zip.ZipOutputStream) defers sizes to
    * data descriptors, so a naive local-header walk would misframe
    * every entry — the CD walk is load-bearing, not a style choice. */
  private[graft] def qZipIngest(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.zip.{synth_zip, zip_entries}
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(3) + col("doc_id") % 4).cast("int").as("n"),
        expr("(doc_id div 25) % 4 = 3").as("corrupt"))
    d.select(col("doc_id"),
        zip_entries(synth_zip(col("doc_id"), col("n"), col("corrupt")))
          .as(Seq("entry_idx", "name", "method", "usize", "payload", "ok")))
      .select(col("doc_id"), col("entry_idx").cast("long").as("entry_idx"),
        col("name"), col("method"), col("usize"),
        col("payload").cast("string").as("text"), col("ok"))
      .orderBy(col("doc_id"), col("entry_idx"))
  }

  /** Binary-quantized similarity search: embeddings collapse to the
    * 64 sign bits (sign_sketch — 16 bytes/vector instead of 256, the
    * SimHash principle with identity hyperplanes), probes broadcast,
    * and the top-5 Hamming neighbors per probe come from ONE corpus
    * scan with two xor+popcount ops per candidate — the cheap first
    * stage of the binary-rerank ANN pattern (the float rerank stage is
    * q_cosine_topk). The oracle packs the same bits (two 32-bit
    * halves — no 1<<63 signed ambiguity) and replays the distances,
    * so the sketch layout and the Hamming math are value-verified.
    * Ties broken by vec_id for cross-engine determinism. */
  private[graft] def qHammingTopk(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.kernels.sign_sketch
    import org.apache.spark.sql.expressions.Window
    val sk = t(s, dir, "embeddings")
      .select(col("vec_id"), sign_sketch(col("embedding")).as("sk"))
      .select(col("vec_id"), col("sk.lo").as("lo"), col("sk.hi").as("hi"))
    val probes = sk.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("probe_id"), col("lo").as("plo"), col("hi").as("phi"))
    sk.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        expr("bit_count(lo ^ plo) + bit_count(hi ^ phi)").as("hamming"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("hamming"), col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("hamming").cast("long").as("hamming"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Aho–Corasick keyword scan: ONE pass per document counts every
    * occurrence of a six-term dictionary simultaneously (end-position
    * semantics, overlaps included) — the blocklist / PII-term /
    * contamination-probe primitive whose per-pattern-scan alternative
    * costs a pass per term. The oracle replays counts positionally
    * (substr over every start position), so the automaton's
    * goto/fail/output transitions are value-verified against the
    * naive definition. */
  private[graft] def qKeywordScan(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.matching.multi_match_counts
    val pats = Seq("data", "the", "ing", "tion", "ent", "model")
    val d = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), substring(col("text"), 1, 400).as("t"))
    d.select(col("doc_id"),
        posexplode(multi_match_counts(col("t"), pats)).as(Seq("pat_idx", "cnt")))
      .select(col("doc_id"), col("pat_idx").cast("long").as("pat_idx"),
        col("cnt"))
      .orderBy(col("doc_id"), col("pat_idx"))
  }

  /** URL parse + normalization over a five-mode synthesized corpus
    * (mixed-case scheme/host with default https port, http:80,
    * explicit non-default port with empty path, ftp, malformed):
    * the pinned RFC 3986 subset with the web-corpus normalization
    * rules (lowercase scheme/host, drop default ports, empty path →
    * "/", strip fragment, query kept byte-exact) — the step before
    * host-level grouping and URL-level dedup. The oracle knows every
    * component by construction. */
  private[graft] def qUrlNormalize(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.url.url_parse
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), expr("(doc_id div 25) % 5").cast("int").as("mode"))
    val u = when(col("mode") === 0,
        concat(lit("HTTPS://Example"), col("doc_id"), lit(".Test:443/Path/To/"),
          col("doc_id"), lit("?b=2&a="), col("doc_id"), lit("#frag")))
      .when(col("mode") === 1,
        concat(lit("http://mirror"), col("doc_id"), lit(".example.org:80/index.html")))
      .when(col("mode") === 2,
        concat(lit("http://files"), col("doc_id"), lit(".example.net:8080")))
      .when(col("mode") === 3,
        concat(lit("ftp://archive"), col("doc_id"), lit(".example/pub/data-"),
          col("doc_id"), lit(".bin")))
      .otherwise(concat(lit("not a url at all "), col("doc_id")))
    d.select(col("doc_id"), url_parse(u).as("s"))
      .select(col("doc_id"),
        col("s.scheme").as("scheme"), col("s.host").as("host"),
        col("s.port").cast("long").as("port"), col("s.path").as("path"),
        col("s.query").as("query"), col("s.fragment").as("fragment"),
        col("s.normalized").as("normalized"))
      .orderBy(col("doc_id"))
  }

  /** USTAR archive ingest — the dataset-shard container (WebDataset
    * tarballs, checkpoint releases): 512-byte headers with verified
    * checksums, octal size framing, directory entries routed as
    * metadata, payload blocks unpadded. Corrupt docs get their LAST
    * file header's checksum damaged: everything before it extracts,
    * then ONE terminal null row — tar's size field IS the framing, so
    * the walk cannot honestly continue (the WARC semantics, contrast
    * q_zip_ingest's per-entry isolation). */
  private[graft] def qTarIngest(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.tar.{synth_tar, tar_entries}
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(2) + col("doc_id") % 3).cast("int").as("n"),
        expr("(doc_id div 25) % 5 = 4").as("corrupt"))
    d.select(col("doc_id"),
        tar_entries(synth_tar(col("doc_id"), col("n"), col("corrupt")))
          .as(Seq("entry_idx", "name", "entry_type", "size", "payload", "ok")))
      .select(col("doc_id"), col("entry_idx").cast("long").as("entry_idx"),
        col("name"), col("entry_type"), col("size"),
        col("payload").cast("string").as("text"), col("ok"))
      .orderBy(col("doc_id"), col("entry_idx"))
  }

  /** 24-bit BMP decode: the bottom-up row flip and the BGR byte swap
    * are the whole trap surface — per-channel congruence sums catch a
    * reader that misses either (swapped channels or mirrored rows
    * shift every sum). Lossless, oracle replays the congruences. */
  private[graft] def qBmpDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.bmp._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(15) + col("doc_id") % 9).cast("int").as("w"), // odd widths: padding
        (lit(12) + col("doc_id") % 4).cast("int").as("h"))
    d.select(col("doc_id"),
        bmp_stats_rgb(synth_bmp(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.px_sum").as("px_sum"),
        col("s.r_sum").as("r_sum"),
        col("s.g_sum").as("g_sum"),
        col("s.b_sum").as("b_sum"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** 16-bit RGB PNG decode (color type 2, depth 16): three
    * full-u16-range channel congruences through the 6-byte filter
    * offset — per-channel sums catch a decoder that mixes the
    * interleave or filters with the wrong left-neighbor distance. */
  private[graft] def qPng16RgbDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 8).cast("int").as("w"),
        (lit(12) + col("doc_id") % 4).cast("int").as("h"))
    d.select(col("doc_id"),
        png_stats16_rgb(synth_png16_rgb(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.channels").cast("long").as("channels"),
        col("s.s_sum").as("s_sum"),
        col("s.r_sum").as("r_sum"),
        col("s.g_sum").as("g_sum"),
        col("s.b_sum").as("b_sum"),
        col("s.s_min").cast("long").as("s_min"),
        col("s.s_max").cast("long").as("s_max"))
      .orderBy(col("doc_id"))
  }

  /** Container → text → corpus dedup, end to end: WARC blobs keyed on
    * doc_id mod 7 (so distinct source files carry IDENTICAL records —
    * the mirrored-crawl shape), split + parsed + stripped per
    * partition, then EXACT duplicate detection across the whole
    * corpus by grouping on the extracted text. The aggregation
    * shuffles only (text, count) pairs — at 100 TB the text key would
    * be its 16-byte digest (q_dedup_exact's convention); here the
    * short synthetic text doubles as its own key so the oracle can
    * replay it verbatim. */
  private[graft] def qWarcDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.warc._
    import graft.functions.kernels.strip_html
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), (col("doc_id") % 7).as("mirror_id"))
      .select(col("doc_id"),
        warc_records(synth_warc(col("mirror_id"),
          (lit(3) + col("mirror_id") % 4).cast("int"), lit(false)))
          .as(Seq("rec_idx", "warc_type", "target_uri", "content_length",
            "payload", "ok")))
    d.select(strip_html(col("payload").cast("string")).as("clean_text"),
        col("doc_id"))
      .groupBy(col("clean_text"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_source_files"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("clean_text"))
  }

  /** WARC container ingest — the container layer of the web-corpus
    * pipeline: synth multi-member WARC blobs (one gzip member per
    * record, the Common-Crawl layout), split + inflate + CRC-verify
    * each member, parse the WARC routing headers, and push each
    * payload through strip_html — container → records → text in one
    * generator pipeline, per-partition, no shuffle. Docs in the
    * corrupt class get their LAST member's gzip magic zeroed: the
    * reader emits the n−1 good records then ONE malformed row with
    * null routing fields (framing is genuinely lost past a corrupt
    * member — no magic-scan guessing), which the oracle accounts for
    * row by row. */
  private[graft] def qWarcIngest(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.warc._
    import graft.functions.kernels.strip_html
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(3) + col("doc_id") % 4).cast("int").as("n"),
        expr("(doc_id div 25) % 4 = 3").as("corrupt"))
    d.select(col("doc_id"),
        warc_records(synth_warc(col("doc_id"), col("n"), col("corrupt")))
          .as(Seq("rec_idx", "warc_type", "target_uri", "content_length",
            "payload", "ok")))
      .select(col("doc_id"), col("rec_idx").cast("long").as("rec_idx"),
        col("warc_type"), col("target_uri"), col("content_length"),
        strip_html(col("payload").cast("string")).as("clean_text"),
        col("ok"))
      .orderBy(col("doc_id"), col("rec_idx"))
  }

  /** WARC-over-zstd — the NORTH-STAR ingest path (Common-Crawl-style
    * shards ship as zstd members): a skippable frame then the WARC
    * file as one zstd frame (alternating Predefined / explicit-table
    * sequence coding by id), decoded by the round-11 full zstd codec,
    * THEN the WARC record walk and strip_html chain of q_warc_ingest.
    * Corruption stays at the WARC layer (the zstd layer must pass it
    * through intact), so the gate proves the COMPOSITION: codec
    * round-trip ∘ container walk ∘ text pipeline, one query. */
  private[graft] def qWarcZstd(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.warc._
    import graft.functions.zstdio._
    import graft.functions.kernels.strip_html
    val skippable = Array[Byte](0x5a, 0x2a, 0x4d, 0x18, 3, 0, 0, 0, 1, 2, 3)
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(3) + col("doc_id") % 4).cast("int").as("n"),
        expr("(doc_id div 25) % 4 = 3").as("corrupt"))
    val shard = concat(lit(skippable),
      zstd_compress(synth_warc(col("doc_id"), col("n"), col("corrupt")),
        col("doc_id") % 2 === 0))
    d.select(col("doc_id"),
        warc_records(zstd_decompress(shard))
          .as(Seq("rec_idx", "warc_type", "target_uri", "content_length",
            "payload", "ok")))
      .select(col("doc_id"), col("rec_idx").cast("long").as("rec_idx"),
        col("warc_type"), col("target_uri"), col("content_length"),
        strip_html(col("payload").cast("string")).as("clean_text"),
        col("ok"))
      .orderBy(col("doc_id"), col("rec_idx"))
  }

  /** Truecolor PNG decode (color type 2): three distinct per-channel
    * congruences through the 3-byte-per-pixel filter offset — a
    * decoder that confuses channel interleave or filters with the
    * grayscale offset cannot match the per-channel sums the oracle
    * replays. Widens q_png_decode's grayscale scope (round-8 advice
    * #3). */
  private[graft] def qPngRgbDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 8).cast("int").as("w"),
        (lit(12) + col("doc_id") % 4).cast("int").as("h"))
    d.select(col("doc_id"),
        png_stats_rgb(synth_png_rgb(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.channels").cast("long").as("channels"),
        col("s.px_sum").as("px_sum"),
        col("s.r_sum").as("r_sum"),
        col("s.g_sum").as("g_sum"),
        col("s.b_sum").as("b_sum"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** Adam7-interlaced PNG decode: the same grayscale congruence as
    * q_png_decode in a PROGRESSIVE container — seven
    * independently-filtered sub-images de-interlaced back to the
    * pixel grid. Same oracle as q_png_decode (identical pixels), so
    * the gate isolates the de-interlace scatter. */
  private[graft] def qPngAdam7Decode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 8).cast("int").as("w"),
        (lit(12) + col("doc_id") % 4).cast("int").as("h"))
    d.select(col("doc_id"),
        png_stats(synth_png_adam7(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.px_sum").as("px_sum"),
        expr("s.px_sum * 1000 div s.n_px").as("mean_milli"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** Web-corpus text extraction: each document's text is wrapped in a
    * realistic HTML shell (head/style/script elements, headings,
    * paragraph tags, escaped entities) and `strip_html` recovers the
    * visible text — script/style content dropped, tags to spaces,
    * entities decoded post-strip with &amp; last, whitespace
    * collapsed. The oracle builds the SAME shell in SQL and replays
    * the exact regex/replace chain (RE2-compatible by construction),
    * so the extraction semantics are pinned cross-engine. */
  private[graft] def qHtmlStrip(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.kernels.strip_html
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), substring(col("text"), 1, 120).as("tt"))
    val html = concat(
      lit("<html><head><title>Doc</title><style>p { color: #000; }</style>" +
        "</head><body><script type=\"text/javascript\">var x = \"<p>\";" +
        "</script><h1>Doc &quot;"),
      col("doc_id"),
      lit("&quot;</h1>\n<p>"),
      col("tt"),
      lit("</p>\n<p>Tom &amp; Jerry &lt;3 &nbsp; &amp;amp; more</p></body></html>"))
    d.select(col("doc_id"),
        strip_html(html).as("clean"))
      .select(col("doc_id"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(encode(col("clean"), "UTF-8")).as("digest"))
      .orderBy(col("doc_id"))
  }

  /** Compressed-blob-column ingest: each document's text round-trips
    * through REAL gzip framing (RFC 1952 — the per-record compression
    * of WARC / compressed JSON fields), and a deliberately corrupted
    * frame routes to null under the PERMISSIVE decode contract. The
    * oracle replays the identity (md5 of the round-tripped text) and
    * the corrupt-frame null — proving decompress ∘ compress = id over
    * real gzip bytes, and that corruption routes instead of failing. */
  private[graft] def qGzipRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.kernels.{gzip_compress, gzip_decompress}
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), col("text"))
    val gz = gzip_compress(encode(col("text"), "UTF-8"))
    d.select(col("doc_id"),
        length(col("text")).cast("long").as("orig_len"),
        md5(gzip_decompress(gz)).as("digest"),
        // corrupt the gzip MAGIC (first byte) — must decode to null
        gzip_decompress(concat(lit(Array[Byte](0x00)), substring(gz, 2, 1 << 24)))
          .isNull.as("corrupt_is_null"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing document fingerprints (Schleimer–Wilkerson–Aiken,
    * SIGMOD 2003 — the MOSS algorithm): rolling Rabin–Karp k-gram
    * hashes, minimum per w-window with rightmost tie-break, distinct
    * selected (pos, hash) pairs. The ROLLING-hash fingerprint family
    * member (md5 = whole-doc, SimHash = bag-of-words, MinHash =
    * set-resemblance; winnowing adds the LOCALITY guarantee: any
    * shared substring ≥ w+k−1 chars shares a hash). The oracle
    * replays the k explicit polynomial terms and the window argmin
    * (rightmost tie via a combined (hash, −pos) key) in SQL. */
  private[graft] def qWinnowFingerprint(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.kernels.winnow_fingerprints
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), substring(col("text"), 1, 200).as("tt"))
    d.select(col("doc_id"), winnow_fingerprints(col("tt"), 5, 4).as("fp"))
      .select(col("doc_id"),
        size(col("fp")).cast("long").as("n_fp"),
        expr("aggregate(fp, CAST(0 AS BIGINT), (acc, x) -> acc + x.hash)")
          .as("hash_sum"),
        coalesce(expr("array_min(transform(fp, x -> x.hash))"), lit(0L))
          .as("hash_min"),
        coalesce(expr("array_max(transform(fp, x -> x.hash))"), lit(0L))
          .as("hash_max"),
        expr("aggregate(fp, CAST(0 AS BIGINT), (acc, x) -> acc + x.pos)")
          .as("pos_sum"))
      .orderBy(col("doc_id"))
  }

  /** PCM sample decode at the OTHER two real-world widths — 8-bit
    * unsigned (telephony/retro, centered to signed by the decoder)
    * and 24-bit LE signed (studio masters) — alongside q_audio_pcm's
    * 16-bit: exact integer statistics from both containers, the rails
    * and sums replayed by the oracle over generate_series. */
  private[graft] def qAudioBitdepths(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(200) + col("doc_id") % 50).cast("int").as("n"))
    d.select(col("doc_id"),
        audio_stats(synth_wav_bits(col("doc_id"), col("n"), 8)).as("a8"),
        audio_stats(synth_wav_bits(col("doc_id"), col("n"), 24)).as("a24"))
      .select(col("doc_id"),
        col("a8.n_samples").as("n8"),
        col("a8.sum_abs").as("sum_abs_8"),
        col("a8.peak").cast("long").as("peak_8"),
        col("a8.clip_count").as("clips_8"),
        col("a24.n_samples").as("n24"),
        col("a24.sum_abs").as("sum_abs_24"),
        col("a24.sum_sq").as("sum_sq_24"),
        col("a24.peak").cast("long").as("peak_24"),
        col("a24.zero_crossings").as("crossings_24"))
      .orderBy(col("doc_id"))
  }

  /** REAL GIF decode — variable-width LSB-first LZW decompression,
    * color-table expansion, 4-pass de-interlacing: each selected
    * document synthesizes the SAME image as a plain AND an interlaced
    * GIF89a; both decode to identical exact statistics (the oracle
    * replays the palette ∘ index congruence composition — the
    * q_png_palette_decode palette over the synth grid). Completes the
    * real-pixel story for all three image headers the engine parses
    * (PNG deflate, JPEG entropy scan, GIF LZW). */
  private[graft] def qGifDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 8).cast("int").as("w"),
        (lit(12) + col("doc_id") % 4).cast("int").as("h"))
    d.select(col("doc_id"),
        gif_stats(synth_gif(col("doc_id"), col("w"), col("h"))).as("s"),
        gif_stats(synth_gif(col("doc_id"), col("w"), col("h"),
          interlaced = true)).as("si"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.px_sum").as("px_sum"),
        col("s.r_sum").as("r_sum"),
        col("s.g_sum").as("g_sum"),
        col("s.b_sum").as("b_sum"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"),
        col("si.px_sum").as("interlaced_px_sum"))
      .orderBy(col("doc_id"))
  }

  /** RGBA PNG decode (color type 6 — the web's most common
    * alpha-bearing type): four distinct channel congruences through
    * the 4-byte filter offset, alpha summed separately. */
  private[graft] def qPngRgbaDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 8).cast("int").as("w"),
        (lit(12) + col("doc_id") % 4).cast("int").as("h"))
    d.select(col("doc_id"),
        png_stats_rgb(synth_png_rgba(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.channels").cast("long").as("channels"),
        col("s.px_sum").as("px_sum"),
        col("s.r_sum").as("r_sum"),
        col("s.g_sum").as("g_sum"),
        col("s.b_sum").as("b_sum"),
        col("s.a_sum").as("a_sum"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** Palette PNG decode (color type 3): the synth_pgm congruence as
    * PLTE indices, expanded through a 256-entry palette whose channels
    * are themselves congruences — the oracle replays the COMPOSITION
    * of the two, so an indexing or palette-order bug cannot pass. */
  private[graft] def qPngPaletteDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.media._
    val d = t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 8).cast("int").as("w"),
        (lit(12) + col("doc_id") % 4).cast("int").as("h"))
    d.select(col("doc_id"),
        png_stats_rgb(synth_png_pal(col("doc_id"), col("w"), col("h"))).as("s"))
      .select(col("doc_id"),
        col("s.width").cast("long").as("width"),
        col("s.height").cast("long").as("height"),
        col("s.channels").cast("long").as("channels"),
        col("s.px_sum").as("px_sum"),
        col("s.r_sum").as("r_sum"),
        col("s.g_sum").as("g_sum"),
        col("s.b_sum").as("b_sum"),
        col("s.px_min").cast("long").as("px_min"),
        col("s.px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  /** Exact corpus-wide top-20 tokens WITHOUT shuffling the token
    * domain — [[graft.ops.HeavyHitters]]: per-partition Misra-Gries
    * summaries tree-merge to one ≤2048-entry candidate set (bounded
    * model state), then ONE aggregation recounts only candidates
    * (everything else folds into a single overflow group). The result
    * is certified exact at runtime (k-th count must clear the
    * N/(m+1) Misra-Gries bound, or the domain is fully inside the
    * summary) — the scale path for "most frequent tokens over 100 TB"
    * where groupBy-the-domain would shuffle billions of distinct
    * keys. The oracle recomputes the naive full groupBy. */
  private[graft] def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    graft.ops.HeavyHitters.exactTopK(s, toks, "token", k = 20, capacity = 2048)
      .select(col("item").as("token"), col("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }

  private[graft] def llm2QueryMap: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_png_decode" -> (qPngDecode _),
    "q_jpeg_decode" -> (qJpegDecode _),
    "q_jpeg_rgb_decode" -> (qJpegRgbDecode _),
    "q_jpeg_420_decode" -> (qJpeg420Decode _),
    "q_jpeg_ycbcr" -> (qJpegYcbcr _),
    "q_jpeg_progressive" -> (qJpegProgressive _),
    "q_jpeg_progressive_420" -> (qJpegProgressive420 _),
    "q_jpeg_triage" -> (qJpegTriage _),
    "q_warc_ingest" -> (qWarcIngest _),
    "q_warc_zstd" -> (qWarcZstd _),
    "q_warc_dedup" -> (qWarcDedup _),
    "q_png16_decode" -> (qPng16Decode _),
    "q_png16_rgb_decode" -> (qPng16RgbDecode _),
    "q_audio_g711" -> (qAudioG711 _),
    "q_wav_triage" -> (qWavTriage _),
    "q_zip_ingest" -> (qZipIngest _),
    "q_tar_ingest" -> (qTarIngest _),
    "q_bmp_decode" -> (qBmpDecode _),
    "q_keyword_scan" -> (qKeywordScan _),
    "q_url_normalize" -> (qUrlNormalize _),
    "q_hamming_topk" -> (qHammingTopk _),
    "q_png_ga_decode" -> (qPngGaDecode _),
    "q_png_rgb_decode" -> (qPngRgbDecode _),
    "q_png_rgba_decode" -> (qPngRgbaDecode _),
    "q_png_adam7_decode" -> (qPngAdam7Decode _),
    "q_gif_decode" -> (qGifDecode _),
    "q_audio_bitdepths" -> (qAudioBitdepths _),
    "q_winnow_fingerprint" -> (qWinnowFingerprint _),
    "q_gzip_roundtrip" -> (qGzipRoundtrip _),
    "q_html_strip" -> (qHtmlStrip _),
    "q_png_palette_decode" -> (qPngPaletteDecode _),
    "q_image_pipeline" -> (qImagePipeline _),
    "q_audio_pcm" -> (qAudioPcm _),
    "q_incremental_dedup" -> (qIncrementalDedup _),
    "q_rlhf_pairs" -> (qRlhfPairs _),
    "q_span_corruption" -> (qSpanCorruption _),
    "q_bpe_sweep" -> (qBpeSweep _),
    "q_length_batching" -> (qLengthBatching _),
    "q_temperature_mix" -> (qTemperatureMix _),
    "q_random_projection" -> (qRandomProjection _),
    "q_map_eval" -> (qMapEval _),
    "q_rank_fusion" -> (qRankFusion _),
    "q_coverage_curve" -> (qCoverageCurve _),
    "q_pack_efficiency" -> (qPackEfficiency _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_dup_orders" -> (qDupOrders _),
    "q_elbow" -> (qElbow _),
    "q_char_entropy" -> (qCharEntropy _),
    "q_knapsack" -> (qKnapsack _),
    "q_dim_stats" -> (qDimStats _),
    "q_cosine_hist" -> (qCosineHist _),
    "q_casing_profile" -> (qCasingProfile _),
    "q_cross_source_dups" -> (qCrossSourceDups _),
    "q_length_anova" -> (qLengthAnova _),
    "q_token_length_dist" -> (qTokenLengthDist _),
    "q_ivf_balance" -> (qIvfBalance _),
    "q_length_psi" -> (qLengthPsi _),
    "q_intrinsic_dim" -> (qIntrinsicDim _),
    "q_yule_k" -> (qYuleK _),
    "q_jl_distortion" -> (qJlDistortion _),
    "q_hubness" -> (qHubness _),
    "q_renyi_spectrum" -> (qRenyiSpectrum _),
    "q_dbi" -> (qDbi _),
    "q_dim_corr" -> (qDimCorr _),
    "q_cluster_purity" -> (qClusterPurity _),
    "q_ivf_probe_recall" -> (qIvfProbeRecall _),
    "q_median_polish" -> (qMedianPolish _),
    "q_decision_curve" -> (qDecisionCurve _),
    "q_chao1" -> (qChao1 _),
    "q_vocab_overlap" -> (qVocabOverlap _),
    "q_horvitz_thompson" -> (qHorvitzThompson _),
    "q_embed_two_sample" -> (qEmbedTwoSample _),
    "q_ess_weights" -> (qEssWeights _),
    "q_mcc" -> (qMcc _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_mojibake" -> (qMojibake _),
    "q_shard_manifest" -> (qShardManifest _),
  )

  private[graft] def llm2OracleMap: Map[String, String] = Map(
    "q_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT t AS token
        |  FROM (SELECT unnest(string_split(text, ' ')) AS t
        |        FROM documents) q
        |  WHERE length(t) > 0)
        |SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM tok GROUP BY token
        |ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    "q_png_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h, gx.x, gy.y,
        |         (d.doc_id * 7 + gx.x * 31 + gy.y * 17) % 256 AS v
        |  FROM d
        |  CROSS JOIN generate_series(0, 23) AS gx(x)
        |  CROSS JOIN generate_series(0, 15) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(SUM(v) AS BIGINT) AS px_sum,
        |       CAST(SUM(v) * 1000 // COUNT(*) AS BIGINT) AS mean_milli,
        |       CAST(MIN(v) AS BIGINT) AS px_min,
        |       CAST(MAX(v) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_html_strip" ->
      """WITH d AS (
        |  SELECT doc_id, substr(text, 1, 120) AS tt
        |  FROM documents WHERE doc_id % 25 = 0),
        |h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc</title><style>p { color: #000; }</style>'
        |    || '</head><body><script type="text/javascript">var x = "<p>";'
        |    || '</script><h1>Doc &quot;' || doc_id || '&quot;</h1>' || chr(10)
        |    || '<p>' || tt
        |    || '</p>' || chr(10)
        |    || '<p>Tom &amp; Jerry &lt;3 &nbsp; &amp;amp; more</p></body></html>'
        |    AS html
        |  FROM d),
        |stripped AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(html,
        |            '(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>',
        |            ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
        |        '&quot;', '"'), '&#39;', CHR(39)), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id, CAST(length(clean) AS BIGINT) AS clean_len,
        |       md5(clean) AS digest
        |FROM stripped ORDER BY doc_id""".stripMargin,
    "q_gzip_roundtrip" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS orig_len,
        |       md5(text) AS digest, TRUE AS corrupt_is_null
        |FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id""".stripMargin,
    "q_winnow_fingerprint" ->
      """WITH d AS (
        |  SELECT doc_id, substr(text, 1, 200) AS t
        |  FROM documents WHERE doc_id % 25 = 0),
        |g AS ( -- k=5 gram hash at 0-based position p: polynomial base
        |       -- 257 over char codes, mod 2^31-1 (term factors are
        |       -- 257^i mod M, so every product fits int64)
        |  SELECT d.doc_id, gp.p,
        |         (CAST(ascii(substr(t, gp.p + 1, 1)) AS BIGINT) * 67503107
        |          + CAST(ascii(substr(t, gp.p + 2, 1)) AS BIGINT) * 16974593
        |          + CAST(ascii(substr(t, gp.p + 3, 1)) AS BIGINT) * 66049
        |          + CAST(ascii(substr(t, gp.p + 4, 1)) AS BIGINT) * 257
        |          + ascii(substr(t, gp.p + 5, 1))) % 2147483647 AS h
        |  FROM d CROSS JOIN generate_series(0, 195) AS gp(p)
        |  WHERE gp.p <= length(t) - 5),
        |win AS ( -- w=4 window min with RIGHTMOST tie: minimize the
        |         -- combined key (h, -p) packed as h*1024 + (1023-p).
        |         -- PACKING BOUND: requires p < 1024 — holds because t
        |         -- is capped at 200 chars; widen the radix before
        |         -- reusing this oracle on longer substrings.
        |  SELECT doc_id,
        |         MIN(h * 1024 + (1023 - p)) OVER (
        |           PARTITION BY doc_id ORDER BY p
        |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mc,
        |         COUNT(*) OVER (
        |           PARTITION BY doc_id ORDER BY p
        |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt
        |  FROM g),
        |sel AS (SELECT DISTINCT doc_id,
        |          1023 - (mc % 1024) AS pos, mc // 1024 AS h
        |        FROM win WHERE cnt = 4),
        |agg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp,
        |         CAST(SUM(h) AS BIGINT) AS hash_sum,
        |         CAST(MIN(h) AS BIGINT) AS hash_min,
        |         CAST(MAX(h) AS BIGINT) AS hash_max,
        |         CAST(SUM(pos) AS BIGINT) AS pos_sum
        |  FROM sel GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(n_fp, 0) AS n_fp,
        |       COALESCE(hash_sum, 0) AS hash_sum,
        |       COALESCE(hash_min, 0) AS hash_min,
        |       COALESCE(hash_max, 0) AS hash_max,
        |       COALESCE(pos_sum, 0) AS pos_sum
        |FROM d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "q_audio_bitdepths" ->
      """WITH d AS (
        |  SELECT doc_id, 200 + doc_id % 50 AS n
        |  FROM documents WHERE doc_id % 25 = 0),
        |smp AS (
        |  SELECT d.doc_id, d.n, gt.t,
        |         ((d.doc_id * 7919 + gt.t * 2654435761) % 256) - 128 AS s8,
        |         ((d.doc_id * 7919 + gt.t * 2654435761) % 16777216) - 8388608 AS s24
        |  FROM d CROSS JOIN generate_series(0, 249) AS gt(t)
        |  WHERE gt.t < d.n),
        |lagged AS (
        |  SELECT doc_id, n, t, s8, s24,
        |         LAG(s24) OVER (PARTITION BY doc_id ORDER BY t) AS prev24
        |  FROM smp)
        |SELECT doc_id,
        |       CAST(MIN(n) AS BIGINT) AS n8,
        |       CAST(SUM(abs(s8)) AS BIGINT) AS sum_abs_8,
        |       CAST(MAX(abs(s8)) AS BIGINT) AS peak_8,
        |       CAST(SUM(CASE WHEN s8 = 127 OR s8 = -128 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS clips_8,
        |       CAST(MIN(n) AS BIGINT) AS n24,
        |       CAST(SUM(abs(s24)) AS BIGINT) AS sum_abs_24,
        |       CAST(SUM(s24 * s24) AS BIGINT) AS sum_sq_24,
        |       CAST(MAX(abs(s24)) AS BIGINT) AS peak_24,
        |       CAST(SUM(CASE WHEN prev24 IS NOT NULL AND prev24 * s24 < 0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS crossings_24
        |FROM lagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_gif_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h,
        |         (v * 7 + 3) % 256 AS r,
        |         (v * 11 + 5) % 256 AS g,
        |         (v * 13 + 7) % 256 AS b
        |  FROM (
        |    SELECT d0.doc_id, d0.w, d0.h,
        |           (d0.doc_id * 7 + gx.x * 31 + gy.y * 17) % 256 AS v
        |    FROM d AS d0
        |    CROSS JOIN generate_series(0, 23) AS gx(x)
        |    CROSS JOIN generate_series(0, 15) AS gy(y)
        |    WHERE gx.x < d0.w AND gy.y < d0.h) AS d
        |  )
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(SUM(r + g + b) AS BIGINT) AS px_sum,
        |       CAST(SUM(r) AS BIGINT) AS r_sum,
        |       CAST(SUM(g) AS BIGINT) AS g_sum,
        |       CAST(SUM(b) AS BIGINT) AS b_sum,
        |       CAST(MIN(LEAST(r, g, b)) AS BIGINT) AS px_min,
        |       CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS px_max,
        |       CAST(SUM(r + g + b) AS BIGINT) AS interlaced_px_sum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same pixels as q_png_decode, progressive container — shared SQL
    "q_png_adam7_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h, gx.x, gy.y,
        |         (d.doc_id * 7 + gx.x * 31 + gy.y * 17) % 256 AS v
        |  FROM d
        |  CROSS JOIN generate_series(0, 23) AS gx(x)
        |  CROSS JOIN generate_series(0, 15) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(SUM(v) AS BIGINT) AS px_sum,
        |       CAST(SUM(v) * 1000 // COUNT(*) AS BIGINT) AS mean_milli,
        |       CAST(MIN(v) AS BIGINT) AS px_min,
        |       CAST(MAX(v) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_jpeg_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 24 + doc_id % 16 AS w, 16 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h, gx.x, gy.y,
        |         (d.doc_id * 7 + (gx.x // 8) * 31 + (gy.y // 8) * 17) % 256 AS v
        |  FROM d
        |  CROSS JOIN generate_series(0, 39) AS gx(x)
        |  CROSS JOIN generate_series(0, 23) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(SUM(v) AS BIGINT) AS px_sum,
        |       CAST(SUM(v) * 1000 // COUNT(*) AS BIGINT) AS mean_milli,
        |       CAST(MIN(v) AS BIGINT) AS px_min,
        |       CAST(MAX(v) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_jpeg_rgb_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 24 + doc_id % 16 AS w, 16 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h,
        |         (d.doc_id * 7 + (gx.x // 8) * 31 + (gy.y // 8) * 17) % 256 AS r,
        |         (d.doc_id * 11 + (gx.x // 8) * 13 + (gy.y // 8) * 29) % 256 AS g,
        |         (d.doc_id * 3 + (gx.x // 8) * 37 + (gy.y // 8) * 23) % 256 AS b
        |  FROM d
        |  CROSS JOIN generate_series(0, 39) AS gx(x)
        |  CROSS JOIN generate_series(0, 23) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       CAST(SUM(r + g + b) AS BIGINT) AS px_sum,
        |       CAST(SUM(r) AS BIGINT) AS r_sum,
        |       CAST(SUM(g) AS BIGINT) AS g_sum,
        |       CAST(SUM(b) AS BIGINT) AS b_sum,
        |       CAST(MIN(LEAST(r, g, b)) AS BIGINT) AS px_min,
        |       CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_jpeg_420_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 24 + doc_id % 16 AS w, 16 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h,
        |         (d.doc_id * 7 + (gx.x // 8) * 31 + (gy.y // 8) * 17) % 256 AS r,
        |         (d.doc_id * 11 + (gx.x // 16) * 13 + (gy.y // 16) * 29) % 256 AS g,
        |         (d.doc_id * 3 + (gx.x // 16) * 37 + (gy.y // 16) * 23) % 256 AS b
        |  FROM d
        |  CROSS JOIN generate_series(0, 39) AS gx(x)
        |  CROSS JOIN generate_series(0, 23) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       CAST(SUM(r + g + b) AS BIGINT) AS px_sum,
        |       CAST(SUM(r) AS BIGINT) AS r_sum,
        |       CAST(SUM(g) AS BIGINT) AS g_sum,
        |       CAST(SUM(b) AS BIGINT) AS b_sum,
        |       CAST(MIN(LEAST(r, g, b)) AS BIGINT) AS px_min,
        |       CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_jpeg_ycbcr" ->
      """WITH d AS (
        |  SELECT doc_id, 24 + doc_id % 16 AS w, 16 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |rgb AS (
        |  SELECT d.doc_id, d.w, d.h,
        |         (d.doc_id * 7 + (gx.x // 8) * 31 + (gy.y // 8) * 17) % 256 AS r,
        |         (d.doc_id * 11 + (gx.x // 8) * 13 + (gy.y // 8) * 29) % 256 AS g,
        |         (d.doc_id * 3 + (gx.x // 8) * 37 + (gy.y // 8) * 23) % 256 AS b
        |  FROM d
        |  CROSS JOIN generate_series(0, 39) AS gx(x)
        |  CROSS JOIN generate_series(0, 23) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h),
        |ycc AS ( -- pinned JFIF forward transform (Jpeg.forwardYcc):
        |         -- ×65536 fixed point, chroma rounding 32767 (the
        |         -- one-half−1 trick keeps Cb/Cr in [0,255] clamp-free);
        |         -- every numerator is non-negative so // is unambiguous
        |  SELECT doc_id, w, h,
        |         (19595 * r + 38470 * g + 7471 * b + 32768) // 65536 AS y,
        |         (32768 * b - 11059 * r - 21709 * g + 8388608 + 32767) // 65536 AS cb,
        |         (32768 * r - 27439 * g - 5329 * b + 8388608 + 32767) // 65536 AS cr
        |  FROM rgb),
        |rt AS ( -- the codec layer is exactly invertible on block
        |        -- constants, so decode(encode(ycc)) = ycc; replay the
        |        -- pinned inverse (Jpeg.inverseYcc): +2^24 bias keeps
        |        -- numerators positive, clamp like every real decoder
        |  SELECT doc_id, w, h,
        |         LEAST(255, GREATEST(0, (y * 65536 + 91881 * (cr - 128)
        |           + 32768 + 16777216) // 65536 - 256)) AS r2,
        |         LEAST(255, GREATEST(0, (y * 65536 - 22554 * (cb - 128)
        |           - 46802 * (cr - 128) + 32768 + 16777216) // 65536 - 256)) AS g2,
        |         LEAST(255, GREATEST(0, (y * 65536 + 116130 * (cb - 128)
        |           + 32768 + 16777216) // 65536 - 256)) AS b2
        |  FROM ycc)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       CAST(SUM(r2 + g2 + b2) AS BIGINT) AS px_sum,
        |       CAST(SUM(r2) AS BIGINT) AS r_sum,
        |       CAST(SUM(g2) AS BIGINT) AS g_sum,
        |       CAST(SUM(b2) AS BIGINT) AS b_sum,
        |       CAST(MIN(LEAST(r2, g2, b2)) AS BIGINT) AS px_min,
        |       CAST(MAX(GREATEST(r2, g2, b2)) AS BIGINT) AS px_max
        |FROM rt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_jpeg_progressive" -> // same pinned transform pipeline as
      // q_jpeg_ycbcr (the progressive codec layer is exactly identity
      // on block constants, like the baseline layer), different dims
      """WITH d AS (
        |  SELECT doc_id, 32 + doc_id % 16 AS w, 16 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |rgb AS (
        |  SELECT d.doc_id, d.w, d.h,
        |         (d.doc_id * 7 + (gx.x // 8) * 31 + (gy.y // 8) * 17) % 256 AS r,
        |         (d.doc_id * 11 + (gx.x // 8) * 13 + (gy.y // 8) * 29) % 256 AS g,
        |         (d.doc_id * 3 + (gx.x // 8) * 37 + (gy.y // 8) * 23) % 256 AS b
        |  FROM d
        |  CROSS JOIN generate_series(0, 47) AS gx(x)
        |  CROSS JOIN generate_series(0, 23) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h),
        |ycc AS (
        |  SELECT doc_id, w, h,
        |         (19595 * r + 38470 * g + 7471 * b + 32768) // 65536 AS y,
        |         (32768 * b - 11059 * r - 21709 * g + 8388608 + 32767) // 65536 AS cb,
        |         (32768 * r - 27439 * g - 5329 * b + 8388608 + 32767) // 65536 AS cr
        |  FROM rgb),
        |rt AS (
        |  SELECT doc_id, w, h,
        |         LEAST(255, GREATEST(0, (y * 65536 + 91881 * (cr - 128)
        |           + 32768 + 16777216) // 65536 - 256)) AS r2,
        |         LEAST(255, GREATEST(0, (y * 65536 - 22554 * (cb - 128)
        |           - 46802 * (cr - 128) + 32768 + 16777216) // 65536 - 256)) AS g2,
        |         LEAST(255, GREATEST(0, (y * 65536 + 116130 * (cb - 128)
        |           + 32768 + 16777216) // 65536 - 256)) AS b2
        |  FROM ycc)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       CAST(SUM(r2 + g2 + b2) AS BIGINT) AS px_sum,
        |       CAST(SUM(r2) AS BIGINT) AS r_sum,
        |       CAST(SUM(g2) AS BIGINT) AS g_sum,
        |       CAST(SUM(b2) AS BIGINT) AS b_sum,
        |       CAST(MIN(LEAST(r2, g2, b2)) AS BIGINT) AS px_min,
        |       CAST(MAX(GREATEST(r2, g2, b2)) AS BIGINT) AS px_max
        |FROM rt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_jpeg_progressive_420" -> // the q_jpeg_progressive pipeline at
      // the 16×16 region granularity (region constants survive the
      // 4:2:0 subsample -> progressive DCT -> upsample chain exactly)
      """WITH d AS (
        |  SELECT doc_id, 33 + doc_id % 16 AS w, 17 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |rgb AS (
        |  SELECT d.doc_id, d.w, d.h,
        |         (d.doc_id * 7 + (gx.x // 16) * 31 + (gy.y // 16) * 17) % 256 AS r,
        |         (d.doc_id * 11 + (gx.x // 16) * 13 + (gy.y // 16) * 29) % 256 AS g,
        |         (d.doc_id * 3 + (gx.x // 16) * 37 + (gy.y // 16) * 23) % 256 AS b
        |  FROM d
        |  CROSS JOIN generate_series(0, 48) AS gx(x)
        |  CROSS JOIN generate_series(0, 24) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h),
        |ycc AS (
        |  SELECT doc_id, w, h,
        |         (19595 * r + 38470 * g + 7471 * b + 32768) // 65536 AS y,
        |         (32768 * b - 11059 * r - 21709 * g + 8388608 + 32767) // 65536 AS cb,
        |         (32768 * r - 27439 * g - 5329 * b + 8388608 + 32767) // 65536 AS cr
        |  FROM rgb),
        |rt AS (
        |  SELECT doc_id, w, h,
        |         LEAST(255, GREATEST(0, (y * 65536 + 91881 * (cr - 128)
        |           + 32768 + 16777216) // 65536 - 256)) AS r2,
        |         LEAST(255, GREATEST(0, (y * 65536 - 22554 * (cb - 128)
        |           - 46802 * (cr - 128) + 32768 + 16777216) // 65536 - 256)) AS g2,
        |         LEAST(255, GREATEST(0, (y * 65536 + 116130 * (cb - 128)
        |           + 32768 + 16777216) // 65536 - 256)) AS b2
        |  FROM ycc)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       CAST(SUM(r2 + g2 + b2) AS BIGINT) AS px_sum,
        |       CAST(SUM(r2) AS BIGINT) AS r_sum,
        |       CAST(SUM(g2) AS BIGINT) AS g_sum,
        |       CAST(SUM(b2) AS BIGINT) AS b_sum,
        |       CAST(MIN(LEAST(r2, g2, b2)) AS BIGINT) AS px_min,
        |       CAST(MAX(GREATEST(r2, g2, b2)) AS BIGINT) AS px_max
        |FROM rt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_jpeg_triage" -> // the oracle knows each row's coding mode by
      // construction (mode -> container synthesis is deterministic)
      """WITH d AS (
        |  SELECT doc_id, (doc_id // 25) % 6 AS mode
        |  FROM documents WHERE doc_id % 25 = 0),
        |k AS (
        |  SELECT doc_id, CASE mode
        |    WHEN 0 THEN 'baseline' WHEN 1 THEN 'baseline'
        |    WHEN 2 THEN 'progressive' WHEN 3 THEN 'arithmetic'
        |    WHEN 4 THEN 'malformed' ELSE 'not_jpeg' END AS kind
        |  FROM d)
        |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_blobs,
        |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM k GROUP BY kind ORDER BY kind""".stripMargin,
    "q_warc_zstd" -> // identical record contract to q_warc_ingest:
      // the zstd layer (skippable + one frame, checksum-verified) is
      // exactly identity on the WARC bytes, corruption lives at the
      // WARC layer
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 4 AS n,
        |         ((doc_id // 25) % 4 = 3) AS corrupt
        |  FROM documents WHERE doc_id % 25 = 0),
        |good AS (
        |  SELECT d.doc_id, gs.i AS rec_idx,
        |         'response' AS warc_type,
        |         'https://example.test/' || d.doc_id || '/' || gs.i AS target_uri,
        |         CAST(length('<html><body><p>doc ' || d.doc_id || ' rec ' ||
        |           gs.i || '</p><script>var x=1;</script><b>tok' ||
        |           (d.doc_id * 31 + gs.i * 7) % 997 ||
        |           '</b> &amp; tail</body></html>') AS BIGINT) AS content_length,
        |         'doc ' || d.doc_id || ' rec ' || gs.i || ' tok' ||
        |           (d.doc_id * 31 + gs.i * 7) % 997 || ' & tail' AS clean_text,
        |         TRUE AS ok
        |  FROM d CROSS JOIN generate_series(0, 6) AS gs(i)
        |  WHERE gs.i < d.n - CASE WHEN d.corrupt THEN 1 ELSE 0 END),
        |bad AS (
        |  SELECT doc_id, n - 1 AS rec_idx, CAST(NULL AS VARCHAR) AS warc_type,
        |         CAST(NULL AS VARCHAR) AS target_uri,
        |         CAST(NULL AS BIGINT) AS content_length,
        |         CAST(NULL AS VARCHAR) AS clean_text, FALSE AS ok
        |  FROM d WHERE corrupt)
        |SELECT * FROM (SELECT * FROM good UNION ALL SELECT * FROM bad)
        |ORDER BY doc_id, rec_idx""".stripMargin,
    "q_warc_ingest" -> // the oracle replays record synthesis (ASCII
      // payloads: Content-Length == char count) and the strip_html
      // chain's known output; corrupt docs lose their LAST member ->
      // n-1 good rows plus one terminal null-routed row
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 4 AS n,
        |         ((doc_id // 25) % 4 = 3) AS corrupt
        |  FROM documents WHERE doc_id % 25 = 0),
        |good AS (
        |  SELECT d.doc_id, gs.i AS rec_idx,
        |         'response' AS warc_type,
        |         'https://example.test/' || d.doc_id || '/' || gs.i AS target_uri,
        |         CAST(length('<html><body><p>doc ' || d.doc_id || ' rec ' ||
        |           gs.i || '</p><script>var x=1;</script><b>tok' ||
        |           (d.doc_id * 31 + gs.i * 7) % 997 ||
        |           '</b> &amp; tail</body></html>') AS BIGINT) AS content_length,
        |         'doc ' || d.doc_id || ' rec ' || gs.i || ' tok' ||
        |           (d.doc_id * 31 + gs.i * 7) % 997 || ' & tail' AS clean_text,
        |         TRUE AS ok
        |  FROM d CROSS JOIN generate_series(0, 6) AS gs(i)
        |  WHERE gs.i < d.n - CASE WHEN d.corrupt THEN 1 ELSE 0 END),
        |bad AS (
        |  SELECT doc_id, n - 1 AS rec_idx, CAST(NULL AS VARCHAR) AS warc_type,
        |         CAST(NULL AS VARCHAR) AS target_uri,
        |         CAST(NULL AS BIGINT) AS content_length,
        |         CAST(NULL AS VARCHAR) AS clean_text, FALSE AS ok
        |  FROM d WHERE corrupt)
        |SELECT * FROM (SELECT * FROM good UNION ALL SELECT * FROM bad)
        |ORDER BY doc_id, rec_idx""".stripMargin,
    "q_hamming_topk" -> // pack the same sign bits as two 32-bit
      // halves, replay xor+popcount distances and the ranked top-5
      """WITH v AS (
        |  SELECT vec_id, embedding FROM embeddings),
        |g AS (
        |  SELECT v.vec_id, gs.i,
        |         CASE WHEN embedding[gs.i] > 0 THEN 1 ELSE 0 END AS b
        |  FROM v CROSS JOIN generate_series(1, 64) AS gs(i)),
        |s AS (
        |  SELECT vec_id,
        |    SUM(CASE WHEN i <= 32 AND b = 1 THEN (1::BIGINT << (i - 1))
        |        ELSE 0 END) AS lo,
        |    SUM(CASE WHEN i > 32 AND b = 1 THEN (1::BIGINT << (i - 33))
        |        ELSE 0 END) AS hi
        |  FROM g GROUP BY vec_id),
        |d AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
        |         bit_count(xor(p.lo, c.lo)) + bit_count(xor(p.hi, c.hi)) AS h
        |  FROM s p JOIN s c ON c.vec_id != p.vec_id
        |  WHERE p.vec_id % 97 = 0),
        |r AS (
        |  SELECT probe_id, vec_id, h,
        |         ROW_NUMBER() OVER (PARTITION BY probe_id
        |           ORDER BY h, vec_id) AS rank
        |  FROM d)
        |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id,
        |       CAST(h AS BIGINT) AS hamming
        |FROM r WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    "q_keyword_scan" -> // the naive positional definition of
      // all-occurrence counts, replayed per (doc, pattern, position)
      """WITH d AS (
        |  SELECT doc_id, substr(text, 1, 400) AS t
        |  FROM documents WHERE doc_id % 5 = 0),
        |pats(idx, pat) AS (VALUES (0, 'data'), (1, 'the'), (2, 'ing'),
        |  (3, 'tion'), (4, 'ent'), (5, 'model'))
        |SELECT d.doc_id, CAST(pats.idx AS BIGINT) AS pat_idx,
        |       CAST(SUM(CASE WHEN gp.p + length(pats.pat) - 1 <= length(d.t)
        |         AND substr(d.t, gp.p, length(pats.pat)) = pats.pat
        |         THEN 1 ELSE 0 END) AS BIGINT) AS cnt
        |FROM d CROSS JOIN pats
        |CROSS JOIN generate_series(1, 400) AS gp(p)
        |GROUP BY d.doc_id, pats.idx
        |ORDER BY d.doc_id, pat_idx""".stripMargin,
    "q_url_normalize" -> // components known by construction per mode
      """WITH d AS (
        |  SELECT doc_id, (doc_id // 25) % 5 AS mode
        |  FROM documents WHERE doc_id % 25 = 0)
        |SELECT doc_id,
        |  CASE mode WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'http'
        |    WHEN 2 THEN 'http' WHEN 3 THEN 'ftp' END AS scheme,
        |  CASE mode WHEN 0 THEN 'Example' || doc_id || '.Test'
        |    WHEN 1 THEN 'mirror' || doc_id || '.example.org'
        |    WHEN 2 THEN 'files' || doc_id || '.example.net'
        |    WHEN 3 THEN 'archive' || doc_id || '.example' END AS host,
        |  CASE mode WHEN 0 THEN 443 WHEN 1 THEN 80 WHEN 2 THEN 8080
        |    WHEN 3 THEN -1 END AS port,
        |  CASE mode WHEN 0 THEN '/Path/To/' || doc_id
        |    WHEN 1 THEN '/index.html' WHEN 2 THEN ''
        |    WHEN 3 THEN '/pub/data-' || doc_id || '.bin' END AS path,
        |  CASE mode WHEN 0 THEN 'b=2&a=' || doc_id
        |    WHEN 1 THEN '' WHEN 2 THEN '' WHEN 3 THEN '' END AS query,
        |  CASE mode WHEN 0 THEN 'frag'
        |    WHEN 1 THEN '' WHEN 2 THEN '' WHEN 3 THEN '' END AS fragment,
        |  CASE mode
        |    WHEN 0 THEN 'https://example' || doc_id || '.test/Path/To/' ||
        |      doc_id || '?b=2&a=' || doc_id
        |    WHEN 1 THEN 'http://mirror' || doc_id || '.example.org/index.html'
        |    WHEN 2 THEN 'http://files' || doc_id || '.example.net:8080/'
        |    WHEN 3 THEN 'ftp://archive' || doc_id || '.example/pub/data-' ||
        |      doc_id || '.bin' END AS normalized
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_tar_ingest" -> // dir entry + files; corrupt docs lose the LAST
      // file to a checksum failure -> terminal null row at index n
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS n,
        |         ((doc_id // 25) % 5 = 4) AS corrupt
        |  FROM documents WHERE doc_id % 25 = 0),
        |dirs AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS entry_idx,
        |         'data-' || doc_id || '/' AS name, 'dir' AS entry_type,
        |         CAST(0 AS BIGINT) AS size, CAST(NULL AS VARCHAR) AS text,
        |         TRUE AS ok
        |  FROM d),
        |files AS (
        |  SELECT d.doc_id, CAST(gs.i + 1 AS BIGINT) AS entry_idx,
        |         'data-' || d.doc_id || '/part-' || gs.i || '.txt' AS name,
        |         'file' AS entry_type,
        |         CAST(length(repeat('shard ' || gs.i || ' of tar ' ||
        |           d.doc_id || ' holds sample ' ||
        |           (d.doc_id * 19 + gs.i * 23) % 911 || chr(10), 4))
        |           AS BIGINT) AS size,
        |         repeat('shard ' || gs.i || ' of tar ' || d.doc_id ||
        |           ' holds sample ' || (d.doc_id * 19 + gs.i * 23) % 911 ||
        |           chr(10), 4) AS text,
        |         TRUE AS ok
        |  FROM d CROSS JOIN generate_series(0, 4) AS gs(i)
        |  WHERE gs.i < d.n - CASE WHEN d.corrupt THEN 1 ELSE 0 END),
        |bad AS (
        |  SELECT doc_id, CAST(n AS BIGINT) AS entry_idx,
        |         CAST(NULL AS VARCHAR) AS name, CAST(NULL AS VARCHAR) AS entry_type,
        |         CAST(NULL AS BIGINT) AS size, CAST(NULL AS VARCHAR) AS text,
        |         FALSE AS ok
        |  FROM d WHERE corrupt)
        |SELECT * FROM (SELECT * FROM dirs UNION ALL SELECT * FROM files
        |  UNION ALL SELECT * FROM bad)
        |ORDER BY doc_id, entry_idx""".stripMargin,
    "q_bmp_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 15 + doc_id % 9 AS w, 12 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h,
        |         (d.doc_id * 7 + gx.x * 31 + gy.y * 17) % 256 AS r,
        |         (d.doc_id * 11 + gx.x * 13 + gy.y * 29) % 256 AS g,
        |         (d.doc_id * 3 + gx.x * 37 + gy.y * 23) % 256 AS b
        |  FROM d
        |  CROSS JOIN generate_series(0, 23) AS gx(x)
        |  CROSS JOIN generate_series(0, 15) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(SUM(r + g + b) AS BIGINT) AS px_sum,
        |       CAST(SUM(r) AS BIGINT) AS r_sum,
        |       CAST(SUM(g) AS BIGINT) AS g_sum,
        |       CAST(SUM(b) AS BIGINT) AS b_sum,
        |       CAST(MIN(LEAST(r, g, b)) AS BIGINT) AS px_min,
        |       CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_zip_ingest" -> // replay entry synthesis; corrupt docs null THEIR
      // FIRST entry only (per-entry isolation via the central directory)
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 4 AS n,
        |         ((doc_id // 25) % 4 = 3) AS corrupt
        |  FROM documents WHERE doc_id % 25 = 0),
        |e AS (
        |  SELECT d.doc_id, gs.i AS entry_idx, d.corrupt,
        |         repeat('entry ' || gs.i || ' of archive ' || d.doc_id ||
        |           ' carries token ' || (d.doc_id * 13 + gs.i * 17) % 983 ||
        |           ' and a tail line' || chr(10), 3) AS text
        |  FROM d CROSS JOIN generate_series(0, 6) AS gs(i)
        |  WHERE gs.i < d.n)
        |SELECT doc_id, CAST(entry_idx AS BIGINT) AS entry_idx,
        |       CASE WHEN corrupt AND entry_idx = 0 THEN NULL
        |            ELSE 'doc-' || doc_id || '-' || entry_idx || '.txt' END AS name,
        |       CASE WHEN corrupt AND entry_idx = 0 THEN NULL
        |            ELSE 'deflate' END AS method,
        |       CASE WHEN corrupt AND entry_idx = 0 THEN NULL
        |            ELSE CAST(length(text) AS BIGINT) END AS usize,
        |       CASE WHEN corrupt AND entry_idx = 0 THEN NULL
        |            ELSE text END AS text,
        |       NOT (corrupt AND entry_idx = 0) AS ok
        |FROM e ORDER BY doc_id, entry_idx""".stripMargin,
    "q_audio_g711" -> // replay the ITU G.711 expansions arithmetically:
      // µ-law complement + exponent/mantissa, A-law xor-0x55 with the
      // INVERTED sign convention (bit 7 set = positive)
      """WITH d AS (
        |  SELECT doc_id, 200 + doc_id % 50 AS n,
        |         ((doc_id // 25) % 2 = 1) AS alaw
        |  FROM documents WHERE doc_id % 25 = 0),
        |smp AS (
        |  SELECT d.doc_id, d.alaw, gs.t,
        |         (d.doc_id * 7919 + gs.t * 2654435761) % 256 AS byte
        |  FROM d CROSS JOIN generate_series(0, 248) AS gs(t)
        |  WHERE gs.t < d.n),
        |lin AS (
        |  SELECT doc_id, alaw, t,
        |    CASE WHEN NOT alaw THEN ( -- u-law: u = ~code
        |      CASE WHEN (255 - byte) >= 128 THEN -1 ELSE 1 END *
        |      (((255 - byte) % 16 * 8 + 132) *
        |        CASE ((255 - byte) // 16) % 8 WHEN 0 THEN 1 WHEN 1 THEN 2
        |          WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32
        |          WHEN 6 THEN 64 ELSE 128 END - 132))
        |    ELSE ( -- A-law: a = code XOR 0x55, bit 7 set = POSITIVE
        |      CASE WHEN xor(byte, 85) >= 128 THEN 1 ELSE -1 END *
        |      CASE WHEN (xor(byte, 85) // 16) % 8 = 0
        |        THEN xor(byte, 85) % 16 * 16 + 8
        |        ELSE (xor(byte, 85) % 16 * 16 + 264) *
        |          CASE (xor(byte, 85) // 16) % 8 WHEN 1 THEN 1 WHEN 2 THEN 2
        |            WHEN 3 THEN 4 WHEN 4 THEN 8 WHEN 5 THEN 16 WHEN 6 THEN 32
        |            ELSE 64 END END)
        |    END AS s
        |  FROM smp),
        |lagged AS (
        |  SELECT doc_id, alaw, s,
        |         LAG(s) OVER (PARTITION BY doc_id ORDER BY t) AS prev
        |  FROM lin)
        |SELECT doc_id,
        |       CASE WHEN MIN(alaw) THEN 'alaw' ELSE 'ulaw' END AS law,
        |       CAST(COUNT(*) AS BIGINT) AS n_samples,
        |       CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
        |       CAST(SUM(s * s) AS BIGINT) AS sum_sq,
        |       CAST(MAX(ABS(s)) AS BIGINT) AS peak,
        |       CAST(SUM(CASE WHEN prev * s < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS zero_crossings
        |FROM lagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_wav_triage" -> // mode -> kind is deterministic by construction
      """WITH d AS (
        |  SELECT doc_id, (doc_id // 25) % 6 AS mode
        |  FROM documents WHERE doc_id % 25 = 0),
        |k AS (
        |  SELECT doc_id, CASE mode
        |    WHEN 0 THEN 'pcm16' WHEN 1 THEN 'pcm8' WHEN 2 THEN 'pcm24'
        |    WHEN 3 THEN 'ulaw' WHEN 4 THEN 'alaw' ELSE 'not_wav' END AS kind
        |  FROM d)
        |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_blobs,
        |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM k GROUP BY kind ORDER BY kind""".stripMargin,
    "q_warc_dedup" -> // replay record synthesis keyed on the MIRROR id
      // (doc_id mod 7): identical texts across source files, counted
      """WITH d AS (
        |  SELECT doc_id, doc_id % 7 AS mid
        |  FROM documents WHERE doc_id % 25 = 0),
        |recs AS (
        |  SELECT d.doc_id, d.mid, gs.i,
        |         'doc ' || d.mid || ' rec ' || gs.i || ' tok' ||
        |           (d.mid * 31 + gs.i * 7) % 997 || ' & tail' AS clean_text
        |  FROM d CROSS JOIN generate_series(0, 6) AS gs(i)
        |  WHERE gs.i < 3 + d.mid % 4)
        |SELECT clean_text, CAST(COUNT(*) AS BIGINT) AS n_copies,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_source_files,
        |       MIN(doc_id) AS first_doc
        |FROM recs GROUP BY clean_text ORDER BY clean_text""".stripMargin,
    "q_png16_rgb_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h,
        |         (d.doc_id * 7 + gx.x * 311 + gy.y * 173) % 65536 AS r,
        |         (d.doc_id * 11 + gx.x * 131 + gy.y * 293) % 65536 AS g,
        |         (d.doc_id * 3 + gx.x * 373 + gy.y * 233) % 65536 AS b
        |  FROM d
        |  CROSS JOIN generate_series(0, 23) AS gx(x)
        |  CROSS JOIN generate_series(0, 15) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       CAST(SUM(r + g + b) AS BIGINT) AS s_sum,
        |       CAST(SUM(r) AS BIGINT) AS r_sum,
        |       CAST(SUM(g) AS BIGINT) AS g_sum,
        |       CAST(SUM(b) AS BIGINT) AS b_sum,
        |       CAST(MIN(LEAST(r, g, b)) AS BIGINT) AS s_min,
        |       CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS s_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_png16_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h,
        |         (d.doc_id * 7 + gx.x * 31 + gy.y * 17) % 65536 AS s
        |  FROM d
        |  CROSS JOIN generate_series(0, 23) AS gx(x)
        |  CROSS JOIN generate_series(0, 15) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(1 AS BIGINT) AS channels,
        |       CAST(COUNT(*) AS BIGINT) AS n_samples,
        |       CAST(SUM(s) AS BIGINT) AS sample_sum,
        |       CAST(MIN(s) AS BIGINT) AS sample_min,
        |       CAST(MAX(s) AS BIGINT) AS sample_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_png_ga_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h,
        |         (d.doc_id * 7 + gx.x * 31 + gy.y * 17) % 256 AS gray,
        |         (d.doc_id * 5 + gx.x * 19 + gy.y * 41) % 256 AS a
        |  FROM d
        |  CROSS JOIN generate_series(0, 23) AS gx(x)
        |  CROSS JOIN generate_series(0, 15) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(2 AS BIGINT) AS channels,
        |       CAST(SUM(gray + a) AS BIGINT) AS px_sum,
        |       CAST(SUM(gray) AS BIGINT) AS gray_sum,
        |       CAST(SUM(a) AS BIGINT) AS a_sum,
        |       CAST(MIN(LEAST(gray, a)) AS BIGINT) AS px_min,
        |       CAST(MAX(GREATEST(gray, a)) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_png_rgb_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h, gx.x, gy.y,
        |         (d.doc_id * 7 + gx.x * 31 + gy.y * 17) % 256 AS r,
        |         (d.doc_id * 11 + gx.x * 13 + gy.y * 29) % 256 AS g,
        |         (d.doc_id * 3 + gx.x * 37 + gy.y * 23) % 256 AS b
        |  FROM d
        |  CROSS JOIN generate_series(0, 23) AS gx(x)
        |  CROSS JOIN generate_series(0, 15) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       CAST(SUM(r + g + b) AS BIGINT) AS px_sum,
        |       CAST(SUM(r) AS BIGINT) AS r_sum,
        |       CAST(SUM(g) AS BIGINT) AS g_sum,
        |       CAST(SUM(b) AS BIGINT) AS b_sum,
        |       CAST(MIN(LEAST(r, g, b)) AS BIGINT) AS px_min,
        |       CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_png_rgba_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h, gx.x, gy.y,
        |         (d.doc_id * 7 + gx.x * 31 + gy.y * 17) % 256 AS r,
        |         (d.doc_id * 11 + gx.x * 13 + gy.y * 29) % 256 AS g,
        |         (d.doc_id * 3 + gx.x * 37 + gy.y * 23) % 256 AS b,
        |         (d.doc_id * 5 + gx.x * 19 + gy.y * 41) % 256 AS a
        |  FROM d
        |  CROSS JOIN generate_series(0, 23) AS gx(x)
        |  CROSS JOIN generate_series(0, 15) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(4 AS BIGINT) AS channels,
        |       CAST(SUM(r + g + b + a) AS BIGINT) AS px_sum,
        |       CAST(SUM(r) AS BIGINT) AS r_sum,
        |       CAST(SUM(g) AS BIGINT) AS g_sum,
        |       CAST(SUM(b) AS BIGINT) AS b_sum,
        |       CAST(SUM(a) AS BIGINT) AS a_sum,
        |       CAST(MIN(LEAST(r, g, b, a)) AS BIGINT) AS px_min,
        |       CAST(MAX(GREATEST(r, g, b, a)) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_png_palette_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h,
        |         (v * 7 + 3) % 256 AS r,
        |         (v * 11 + 5) % 256 AS g,
        |         (v * 13 + 7) % 256 AS b
        |  FROM (
        |    SELECT d0.doc_id, d0.w, d0.h,
        |           (d0.doc_id * 7 + gx.x * 31 + gy.y * 17) % 256 AS v
        |    FROM d AS d0
        |    CROSS JOIN generate_series(0, 23) AS gx(x)
        |    CROSS JOIN generate_series(0, 15) AS gy(y)
        |    WHERE gx.x < d0.w AND gy.y < d0.h) AS d
        |  )
        |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |       CAST(MIN(h) AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       CAST(SUM(r + g + b) AS BIGINT) AS px_sum,
        |       CAST(SUM(r) AS BIGINT) AS r_sum,
        |       CAST(SUM(g) AS BIGINT) AS g_sum,
        |       CAST(SUM(b) AS BIGINT) AS b_sum,
        |       CAST(MIN(LEAST(r, g, b)) AS BIGINT) AS px_min,
        |       CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_image_pipeline" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 25 = 0),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h, gx.x, gy.y,
        |         (d.doc_id * 7 + gx.x * 31 + gy.y * 17) % 256 AS v
        |  FROM d
        |  CROSS JOIN generate_series(0, 23) AS gx(x)
        |  CROSS JOIN generate_series(0, 15) AS gy(y)
        |  WHERE gx.x < d.w AND gy.y < d.h),
        |orig AS (
        |  SELECT doc_id, CAST(MIN(w) AS BIGINT) AS width,
        |         CAST(MIN(h) AS BIGINT) AS height,
        |         CAST(SUM(v) AS BIGINT) AS px_sum,
        |         CAST(SUM(v) * 1000 // COUNT(*) AS BIGINT) AS mean_milli,
        |         CAST(MIN(v) AS BIGINT) AS px_min,
        |         CAST(MAX(v) AS BIGINT) AS px_max
        |  FROM px GROUP BY doc_id),
        |blocks AS (
        |  SELECT doc_id, x // 2 AS ox, y // 2 AS oy,
        |         CAST(SUM(v) // 4 AS BIGINT) AS dv
        |  FROM px WHERE x < 2 * (w // 2) AND y < 2 * (h // 2)
        |  GROUP BY doc_id, x // 2, y // 2),
        |ds AS (
        |  SELECT doc_id, CAST(MAX(ox) + 1 AS BIGINT) AS ds_width,
        |         CAST(MAX(oy) + 1 AS BIGINT) AS ds_height,
        |         CAST(SUM(dv) AS BIGINT) AS ds_px_sum
        |  FROM blocks GROUP BY doc_id)
        |SELECT orig.doc_id, width, height, px_sum, mean_milli, px_min,
        |       px_max, ds_width, ds_height, ds_px_sum
        |FROM orig JOIN ds ON orig.doc_id = ds.doc_id
        |ORDER BY orig.doc_id""".stripMargin,
    "q_audio_pcm" ->
      """WITH d AS (
        |  SELECT doc_id, 200 + doc_id % 50 AS n
        |  FROM documents WHERE doc_id % 25 = 0),
        |smp AS (
        |  SELECT d.doc_id, d.n, gt.t,
        |         ((d.doc_id * 7919 + gt.t * 2654435761) % 65536) - 32768 AS s
        |  FROM d CROSS JOIN generate_series(0, 249) AS gt(t)
        |  WHERE gt.t < d.n),
        |lagged AS (
        |  SELECT doc_id, n, t, s,
        |         LAG(s) OVER (PARTITION BY doc_id ORDER BY t) AS prev
        |  FROM smp)
        |SELECT doc_id,
        |       CAST(MIN(n) AS BIGINT) AS n_samples,
        |       CAST(MIN(n) * 1000 // 16000 AS BIGINT) AS duration_ms,
        |       CAST(SUM(abs(s)) AS BIGINT) AS sum_abs,
        |       CAST(floor(sqrt(CAST(SUM(s * s) // MIN(n) AS DOUBLE))) AS BIGINT) AS rms_floor,
        |       CAST(MAX(abs(s)) AS BIGINT) AS peak,
        |       CAST(SUM(CASE WHEN prev IS NOT NULL AND prev * s < 0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
        |       CAST(SUM(CASE WHEN s = 32767 OR s = -32768 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS clip_count
        |FROM lagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_incremental_dedup" ->
      """WITH digested AS (
        |  SELECT doc_id, source, md5(text) AS dg,
        |    CAST('0x' || substr(md5('snap|' || CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 10 AS slice
        |  FROM documents),
        |old_dg AS (SELECT DISTINCT dg FROM digested WHERE slice < 8),
        |batch AS (SELECT doc_id, source, dg FROM digested WHERE slice >= 6),
        |vs_old AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_dup_vs_snapshot
        |  FROM batch WHERE dg IN (SELECT dg FROM old_dg) GROUP BY source),
        |fresh AS (
        |  SELECT * FROM batch WHERE dg NOT IN (SELECT dg FROM old_dg)),
        |kept AS (
        |  SELECT dg, CAST(min(doc_id) AS BIGINT) AS doc_id,
        |    CAST(count(*) AS BIGINT) AS copies
        |  FROM fresh GROUP BY dg),
        |kept_src AS (
        |  SELECT f.source, CAST(count(*) AS BIGINT) AS n_ingested,
        |    CAST(sum(k.copies - 1) AS BIGINT) AS n_dup_in_batch
        |  FROM kept k JOIN fresh f ON k.doc_id = f.doc_id
        |  GROUP BY f.source)
        |SELECT b.source, CAST(count(*) AS BIGINT) AS n_batch,
        |  CAST(coalesce(any_value(v.n_dup_vs_snapshot), 0) AS BIGINT)
        |    AS n_dup_vs_snapshot,
        |  CAST(coalesce(any_value(ks.n_dup_in_batch), 0) AS BIGINT)
        |    AS n_dup_in_batch,
        |  CAST(coalesce(any_value(ks.n_ingested), 0) AS BIGINT) AS n_ingested
        |FROM batch b
        |LEFT JOIN vs_old v ON b.source = v.source
        |LEFT JOIN kept_src ks ON b.source = ks.source
        |GROUP BY b.source ORDER BY b.source""".stripMargin,
    "q_rlhf_pairs" ->
      """WITH scored AS (
        |  SELECT doc_id, source,
        |    least(n_chars // 200, 4) AS len_bucket,
        |    40 * CAST(len(string_split(text, ' ')) AS BIGINT) +
        |    (-10) * CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) +
        |    (-2) * abs(n_chars - 500) + (-1500) AS score_milli
        |  FROM documents),
        |packed AS (
        |  SELECT source, len_bucket, doc_id,
        |    (score_milli + 100000) * 1000000000 + doc_id AS p
        |  FROM scored),
        |cells AS (
        |  SELECT source, len_bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(max(p) AS BIGINT) AS mx, CAST(min(p) AS BIGINT) AS mn
        |  FROM packed GROUP BY 1, 2)
        |SELECT source, len_bucket, n_docs,
        |  mx % 1000000000 AS chosen_id,
        |  mx // 1000000000 - 100000 AS chosen_milli,
        |  mn % 1000000000 AS rejected_id,
        |  mn // 1000000000 - 100000 AS rejected_milli,
        |  (mx // 1000000000 - 100000) - (mn // 1000000000 - 100000)
        |    AS margin_milli
        |FROM cells
        |WHERE n_docs >= 2
        |  AND (mx // 1000000000 - 100000) - (mn // 1000000000 - 100000) >= 500
        |ORDER BY source, len_bucket""".stripMargin,
    // same digest digits: start iff h % 100 < 15, len = 1 + (h%300)//100;
    // coverage of p by a span from p-1/p-2 recomputed from their hashes
    "q_span_corruption" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(ws, (w, i) -> CAST(i - 1 AS BIGINT))) AS pos
        |  FROM d),
        |h AS (
        |  SELECT doc_id, pos,
        |    CAST('0x' || substr(md5(CAST(doc_id * 1048576 + pos AS VARCHAR)), 1, 15) AS BIGINT) AS h0,
        |    CAST('0x' || substr(md5(CAST(doc_id * 1048576 + pos - 1 AS VARCHAR)), 1, 15) AS BIGINT) AS h1,
        |    CAST('0x' || substr(md5(CAST(doc_id * 1048576 + pos - 2 AS VARCHAR)), 1, 15) AS BIGINT) AS h2
        |  FROM toks),
        |f AS (
        |  SELECT doc_id,
        |    (h0 % 100 < 15) AS s0,
        |    (pos >= 1 AND h1 % 100 < 15) AS s1,
        |    (pos >= 2 AND h2 % 100 < 15) AS s2,
        |    1 + (h1 % 300) // 100 AS l1,
        |    1 + (h2 % 300) // 100 AS l2
        |  FROM h),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN s0 OR (s1 AND l1 > 1) OR (s2 AND l2 > 2)
        |      THEN 1 ELSE 0 END AS masked,
        |    CASE WHEN s0 AND NOT (s1 AND l1 > 1) AND NOT (s2 AND l2 > 2)
        |      THEN 1 ELSE 0 END AS span_begin
        |  FROM f),
        |a AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(masked) AS BIGINT) AS n_masked,
        |    CAST(sum(span_begin) AS BIGINT) AS n_spans
        |  FROM g GROUP BY 1)
        |SELECT doc_id, n_tokens, n_masked, n_spans,
        |  n_masked * 1000000 // n_tokens AS corruption_ppm,
        |  CASE WHEN n_spans > 0 THEN n_masked * 1000000 // n_spans
        |    ELSE 0 END AS mean_span_ppm
        |FROM a ORDER BY doc_id""".stripMargin,
    "q_length_batching" ->
      """WITH d AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents
        |  WHERE len(string_split(text, ' ')) >= 1),
        |b AS (
        |  SELECT CASE WHEN n <= 1 THEN CAST(1 AS BIGINT)
        |    ELSE CAST(1 << length(bin(n - 1)) AS BIGINT) END AS bucket_max, n
        |  FROM d),
        |bk AS (
        |  SELECT bucket_max, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n) AS BIGINT) AS n_tokens
        |  FROM b GROUP BY 1),
        |g AS (
        |  SELECT max(n) AS gmax, CAST(count(*) AS BIGINT) AS gdocs,
        |    CAST(sum(n) AS BIGINT) AS gtokens FROM d)
        |SELECT bucket_max, n_docs, n_tokens,
        |  (n_docs * bucket_max - n_tokens) * 1000000 // (n_docs * bucket_max)
        |    AS pad_waste_ppm,
        |  (gdocs * gmax - gtokens) * 1000000 // (gdocs * gmax)
        |    AS global_pad_waste_ppm
        |FROM bk CROSS JOIN g ORDER BY bucket_max""".stripMargin,

    "q_bpe_sweep" ->
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wf AS (SELECT w, CAST(length(w) AS BIGINT) AS chars FROM w WHERE w <> ''),
        |b AS (
        |  SELECT chars, regexp_replace(regexp_replace(
        |    trim(regexp_replace(w, '(.)', '\1 ', 'g')),
        |    't h', 'th', 'g'), 'th e', 'the', 'g') AS r2 FROM wf),
        |c AS (
        |  SELECT chars, r2, regexp_replace(regexp_replace(r2,
        |    'i n', 'in', 'g'), 'o w', 'ow', 'g') AS r4 FROM b),
        |d AS (
        |  SELECT chars, r2, r4, regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(r4, 'a t', 'at', 'g'), 'e r', 'er', 'g'),
        |    's t', 'st', 'g'), 'a r', 'ar', 'g') AS r8 FROM c),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(sum(chars) AS BIGINT) AS c0,
        |    CAST(sum(len(string_split(r2, ' '))) AS BIGINT) AS s2,
        |    CAST(sum(len(string_split(r4, ' '))) AS BIGINT) AS s4,
        |    CAST(sum(len(string_split(r8, ' '))) AS BIGINT) AS s8
        |  FROM d)
        |SELECT CAST(0 AS BIGINT) AS n_merges, n_words, c0 AS n_tokens,
        |  c0 * 1000000 // c0 AS chars_per_token_ppm FROM agg
        |UNION ALL SELECT CAST(2 AS BIGINT), n_words, s2, c0 * 1000000 // s2 FROM agg
        |UNION ALL SELECT CAST(4 AS BIGINT), n_words, s4, c0 * 1000000 // s4 FROM agg
        |UNION ALL SELECT CAST(8 AS BIGINT), n_words, s8, c0 * 1000000 // s8 FROM agg
        |ORDER BY n_merges""".stripMargin,
    "q_random_projection" ->
      """WITH x AS (
        |  SELECT CAST(vec_id AS BIGINT) AS v,
        |    list_transform(embedding, e ->
        |      CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS xq
        |  FROM embeddings WHERE vec_id < 64),
        |sgn AS (
        |  SELECT CAST(i.range + 1 AS INT) AS i, CAST(j.range + 1 AS BIGINT) AS j,
        |    1 - 2 * (CAST('0x' || substr(md5(
        |      'rp|' || CAST(i.range + 1 AS VARCHAR) || '|' || CAST(j.range + 1 AS VARCHAR)
        |      ), 1, 15) AS BIGINT) % 2) AS sign
        |  FROM range(64) i CROSS JOIN range(16) j),
        |y AS (
        |  SELECT x.v, s.j, CAST(sum(x.xq[s.i] * s.sign) AS BIGINT) AS y
        |  FROM x CROSS JOIN sgn s GROUP BY 1, 2),
        |d2o AS (
        |  SELECT a.v // 2 AS p,
        |    CAST(list_sum(list_transform(generate_series(1, 64), i ->
        |      (a.xq[i] - b.xq[i]) * (a.xq[i] - b.xq[i]))) AS BIGINT) AS d2_orig
        |  FROM x a JOIN x b ON b.v = a.v + 1 AND a.v % 2 = 0),
        |d2p AS (
        |  SELECT a.v // 2 AS p,
        |    CAST(sum((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS d2_proj
        |  FROM y a JOIN y b ON b.v = a.v + 1 AND a.v % 2 = 0 AND a.j = b.j
        |  GROUP BY 1)
        |SELECT p * 2 AS d1, p * 2 + 1 AS d2, d2_orig, d2_proj,
        |  d2_proj * 1000000 // (d2_orig * 16) AS ratio_ppm
        |FROM d2o JOIN d2p USING (p) ORDER BY d1""".stripMargin,

    "q_temperature_mix" ->
      """WITH c AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |q AS (
        |  SELECT source, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS sq_micro
        |  FROM c),
        |tot AS (
        |  SELECT CAST(sum(sq_micro) AS BIGINT) AS sq_tot,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tot FROM q)
        |SELECT source, n_tokens,
        |  sq_micro * 1000000 // sq_tot AS weight_ppm,
        |  (n_tot // 4) * sq_micro // sq_tot AS token_quota,
        |  ((n_tot // 4) * sq_micro // sq_tot) * 1000 // n_tokens AS epochs_milli
        |FROM q CROSS JOIN tot
        |ORDER BY source""".stripMargin,
    "q_map_eval" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
         |  WHERE vec_id < 8),
         |adots AS (
         |  SELECT e.vec_id, c.cid, ${duckDot("e.embedding", "c.cv")} AS d
         |  FROM embeddings e CROSS JOIN cents c),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid)
         |        AS rn
         |    FROM adots) x WHERE rn = 1),
         |q AS (
         |  SELECT e.vec_id AS qid, e.embedding AS qv, a.cid AS qcid
         |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
         |  WHERE e.vec_id IN (0, 7, 42, 99, 123)),
         |td AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
                duckDot("e.embedding", "e.embedding"),
                duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> q.qid),
         |truth AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY greatest(CAST(0 AS BIGINT),
         |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
         |          vec_id) AS rn
         |    FROM td) x WHERE rn <= 10),
         |rd AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
                duckDot("e.embedding", "e.embedding"),
                duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e
         |  JOIN assign a ON e.vec_id = a.vec_id
         |  JOIN q ON a.cid = q.qcid
         |  WHERE e.vec_id <> q.qid),
         |ret AS (
         |  SELECT qid, vec_id, CAST(rn AS BIGINT) AS rn FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY greatest(CAST(0 AS BIGINT),
         |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
         |          vec_id) AS rn
         |    FROM rd) x WHERE rn <= 10),
         |marked AS (
         |  SELECT r.qid, r.rn,
         |    CAST(CASE WHEN t.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |      AS rel
         |  FROM ret r LEFT JOIN truth t
         |    ON r.qid = t.qid AND r.vec_id = t.vec_id),
         |cum AS (
         |  SELECT qid, rn, rel,
         |    CAST(sum(rel) OVER (PARTITION BY qid ORDER BY rn
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_rel
         |  FROM marked)
         |SELECT qid, CAST(sum(rel) AS BIGINT) AS hits,
         |  CAST(sum(CASE WHEN rel = 1 THEN cum_rel * 1000000 // rn
         |    ELSE 0 END) AS BIGINT) // 10 AS ap_ppm
         |FROM cum GROUP BY qid ORDER BY qid""".stripMargin,
    "q_rank_fusion" -> {
      val rrfSql =
        """CASE rn WHEN 1 THEN 16393 WHEN 2 THEN 16129 WHEN 3 THEN 15873
          | WHEN 4 THEN 15625 WHEN 5 THEN 15385 WHEN 6 THEN 15152
          | WHEN 7 THEN 14925 WHEN 8 THEN 14706 WHEN 9 THEN 14493
          | ELSE 14286 END""".stripMargin
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
         |  WHERE vec_id < 8),
         |adots AS (
         |  SELECT e.vec_id, c.cid, ${duckDot("e.embedding", "c.cv")} AS d
         |  FROM embeddings e CROSS JOIN cents c),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid)
         |        AS rn
         |    FROM adots) x WHERE rn = 1),
         |q AS (
         |  SELECT e.vec_id AS qid, e.embedding AS qv, a.cid AS qcid
         |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
         |  WHERE e.vec_id IN (0, 7, 42, 99, 123)),
         |td AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
              duckDot("e.embedding", "e.embedding"),
              duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> q.qid),
         |bf10 AS (
         |  SELECT qid, vec_id, CAST($rrfSql AS BIGINT) AS rrf_micro FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY greatest(CAST(0 AS BIGINT),
         |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
         |          vec_id) AS rn
         |    FROM td) x WHERE rn <= 10),
         |rd AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
              duckDot("e.embedding", "e.embedding"),
              duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e
         |  JOIN assign a ON e.vec_id = a.vec_id
         |  JOIN q ON a.cid = q.qcid
         |  WHERE e.vec_id <> q.qid),
         |ivf10 AS (
         |  SELECT qid, vec_id, CAST($rrfSql AS BIGINT) AS rrf_micro FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY greatest(CAST(0 AS BIGINT),
         |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
         |          vec_id) AS rn
         |    FROM rd) x WHERE rn <= 10),
         |fused AS (
         |  SELECT qid, vec_id, CAST(sum(rrf_micro) AS BIGINT) AS rrf_micro,
         |    CAST(count(*) AS BIGINT) AS n_lists
         |  FROM (SELECT * FROM bf10 UNION ALL SELECT * FROM ivf10) u
         |  GROUP BY qid, vec_id),
         |final AS (
         |  SELECT qid, vec_id, n_lists, rrf_micro,
         |    CAST(row_number() OVER (PARTITION BY qid
         |      ORDER BY rrf_micro DESC, vec_id) AS BIGINT) AS frank
         |  FROM fused)
         |SELECT qid, frank, vec_id, n_lists, rrf_micro
         |FROM final WHERE frank <= 5 ORDER BY qid, frank""".stripMargin
    },
    "q_coverage_curve" ->
      """WITH total AS (SELECT CAST(count(*) AS BIGINT) AS d_total
        |  FROM documents),
        |docs AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |firsts AS (
        |  SELECT fp, CAST(min(doc_id) AS BIGINT) AS first_doc
        |  FROM docs GROUP BY fp)
        |SELECT ((doc_id + 1) * 10 + d_total - 1) // d_total AS decile,
        |  CAST(count(*) AS BIGINT) AS docs,
        |  CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
        |    AS novel_docs,
        |  (CAST(count(*) AS BIGINT)
        |    - CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
        |      AS BIGINT)) * 1000000 // CAST(count(*) AS BIGINT) AS dup_ppm
        |FROM docs JOIN firsts USING (fp) CROSS JOIN total
        |GROUP BY 1 ORDER BY decile""".stripMargin,
    "q_pack_efficiency" ->
      """WITH f AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS tk
        |  FROM documents),
        |est AS (
        |  SELECT source,
        |    greatest(len(tk),
        |      CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4))
        |        AS BIGINT)) AS est_tokens
        |  FROM f),
        |g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(est_tokens) AS BIGINT) AS tokens
        |  FROM est GROUP BY source)
        |SELECT source, n_docs, tokens,
        |  (tokens + 2047) // 2048 AS windows,
        |  tokens * 1000000 // (((tokens + 2047) // 2048) * 2048) AS fill_ppm
        |FROM g ORDER BY source""".stripMargin,
    "q_hard_negatives" ->
      s"""WITH n AS (
         |  SELECT vec_id, label, embedding,
         |    ${duckDot("embedding", "embedding")} AS nrm
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS anchor, b.vec_id AS neg,
         |    CAST(floor(${duckCos(
              """list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)))""",
              "a.nrm", "b.nrm")} * 1000000 + 0.5) AS BIGINT) AS cos_micro
         |  FROM n a JOIN n b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id
         |  WHERE a.vec_id % 7 = 0),
         |banded AS (
         |  SELECT anchor, neg, cos_micro,
         |    CAST(row_number() OVER (PARTITION BY anchor
         |      ORDER BY cos_micro DESC, neg) AS BIGINT) AS rn
         |  FROM pairs WHERE cos_micro >= 100000 AND cos_micro <= 250000)
         |SELECT anchor, rn, neg, cos_micro
         |FROM banded WHERE rn <= 3 ORDER BY anchor, rn""".stripMargin,
    "q_dup_orders" ->
      """SELECT o_custkey,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |    AS day,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS total_c,
        |  CAST(min(o_orderkey) AS BIGINT) AS k1,
        |  CAST(max(o_orderkey) AS BIGINT) AS k2
        |FROM orders
        |GROUP BY o_custkey, o_orderdate
        |HAVING count(*) > 1
        |ORDER BY o_custkey, day""".stripMargin,
    "q_elbow" -> {
      def sseBlock(k: Int): String =
        s"""  SELECT CAST($k AS BIGINT) AS k,
           |    CAST(sum(best // 1000) AS BIGINT) AS sse_scaled FROM (
           |    SELECT e.vec_id,
           |      min(${duckDot("e.embedding", "e.embedding")}
           |        - 2 * ${duckDot("e.embedding", "c.cv")}
           |        + ${duckDot("c.cv", "c.cv")}) AS best
           |    FROM embeddings e CROSS JOIN
           |      (SELECT embedding AS cv FROM embeddings WHERE vec_id < $k) c
           |    GROUP BY e.vec_id) t$k""".stripMargin
      s"""WITH curve AS (
         |${sseBlock(2)}
         |  UNION ALL
         |${sseBlock(4)}
         |  UNION ALL
         |${sseBlock(8)})
         |SELECT k, sse_scaled,
         |  CAST(coalesce(lag(sse_scaled, 1) OVER (ORDER BY k) - sse_scaled,
         |    0) AS BIGINT) AS drop_from_prev
         |FROM curve ORDER BY k""".stripMargin
    },
    "q_char_entropy" ->
      """WITH chars AS (
        |  SELECT source, ch, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT source, unnest(string_split(text, '')) AS ch
        |    FROM documents) t
        |  WHERE length(ch) = 1 GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        |  FROM chars GROUP BY 1),
        |terms AS (
        |  SELECT chars.source AS source, n,
        |    CAST(floor((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |        / 0.6931471805599453)
        |      * (-1000000.0) + 0.5) AS BIGINT) AS term_ubits
        |  FROM chars JOIN tot ON chars.source = tot.source)
        |SELECT source, max(n) AS n_chars,
        |  CAST(sum(term_ubits) AS BIGINT) AS entropy_ubits
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,
    "q_knapsack" ->
      """WITH est AS (
        |  SELECT doc_id,
        |    greatest(CAST(len(tk) AS BIGINT),
        |      CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4))
        |        AS BIGINT)) AS est_tokens,
        |    40 * CAST(len(tk) AS BIGINT)
        |      - 10 * CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
        |        AS BIGINT)
        |      - 2 * abs(n_chars - 500) - 1500 AS q_milli
        |  FROM (SELECT doc_id, text, n_chars, string_split(text, ' ') AS tk
        |        FROM documents) t),
        |scored AS (
        |  SELECT doc_id, est_tokens, q_milli,
        |    q_milli * 1000 // est_tokens AS density
        |  FROM est WHERE q_milli > 0),
        |run AS (
        |  SELECT est_tokens, q_milli,
        |    CAST(sum(est_tokens) OVER (
        |      ORDER BY (68719476736 - density) * 67108864 + doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS run_sum
        |  FROM scored),
        |budget AS (SELECT CAST(sum(est_tokens) AS BIGINT) // 4 AS budget
        |  FROM scored),
        |qual AS (SELECT CAST(sum(q_milli) AS BIGINT) AS total_q,
        |  CAST(count(*) AS BIGINT) AS n_candidates FROM scored)
        |SELECT n_candidates, CAST(count(*) AS BIGINT) AS n_selected,
        |  budget, CAST(sum(est_tokens) AS BIGINT) AS tokens_used,
        |  CAST(sum(q_milli) AS BIGINT) AS quality_sum,
        |  CAST(sum(q_milli) AS BIGINT) * 1000000 // total_q
        |    AS quality_share_ppm
        |FROM run CROSS JOIN budget CROSS JOIN qual
        |WHERE run_sum <= budget
        |GROUP BY n_candidates, budget, total_q""".stripMargin,
    "q_dim_stats" ->
      """WITH x AS (
        |  SELECT j AS dim,
        |    CAST(floor(CAST(embedding[j] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
        |      AS xf
        |  FROM embeddings
        |  CROSS JOIN (SELECT CAST(unnest(generate_series(1, 64)) AS BIGINT)
        |    AS j) js),
        |m AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xf) AS BIGINT) AS sx,
        |    CAST(sum(xf * xf) AS BIGINT) AS sxx
        |  FROM x GROUP BY dim)
        |SELECT dim, n,
        |  CAST(floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 1000 + 0.5)
        |    AS BIGINT) AS mean_micro,
        |  CAST(floor((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) + 0.5) AS BIGINT)
        |    AS var_milli2,
        |  abs(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * 20.0
        |    > sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |    AS needs_centering
        |FROM m ORDER BY dim""".stripMargin,
    "q_cosine_hist" ->
      s"""WITH n AS (
         |  SELECT vec_id, label, embedding,
         |    ${duckDot("embedding", "embedding")} AS nrm
         |  FROM embeddings),
         |cos AS (
         |  SELECT CAST(floor(${duckCos(
              """list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)))""",
              "a.nrm", "b.nrm")} * 1000000 + 0.5) AS BIGINT) AS cos_micro
         |  FROM n a JOIN n b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE a.vec_id % 5 = 0),
         |bucketed AS (
         |  SELECT greatest(-4, least(3,
         |    CASE WHEN cos_micro >= 0 THEN cos_micro // 250000
         |      ELSE -((-cos_micro + 249999) // 250000) END)) AS bucket,
         |    CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM cos GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS total FROM bucketed)
         |SELECT CAST(bucket AS BIGINT) AS bucket, n_pairs,
         |  n_pairs * 1000000 // total AS share_ppm
         |FROM bucketed CROSS JOIN tot ORDER BY bucket""".stripMargin,
    "q_casing_profile" ->
      """WITH d AS (
        |  SELECT source, CAST(length(text) AS BIGINT) AS chars,
        |    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT)
        |      AS u,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
        |      AS dg,
        |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
        |      AS BIGINT) AS p,
        |    CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT)
        |      AS sp
        |  FROM documents)
        |SELECT source, CAST(sum(chars) AS BIGINT) AS chars,
        |  CAST(sum(u) AS BIGINT) * 1000000 // CAST(sum(chars) AS BIGINT)
        |    AS upper_ppm,
        |  CAST(sum(dg) AS BIGINT) * 1000000 // CAST(sum(chars) AS BIGINT)
        |    AS digit_ppm,
        |  CAST(sum(p) AS BIGINT) * 1000000 // CAST(sum(chars) AS BIGINT)
        |    AS punct_ppm,
        |  CAST(sum(sp) AS BIGINT) * 1000000 // CAST(sum(chars) AS BIGINT)
        |    AS space_ppm
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q_cross_source_dups" ->
      """WITH d AS (
        |  SELECT DISTINCT md5(text) AS fp, source FROM documents),
        |pairs AS (
        |  SELECT a.source AS source1, b.source AS source2,
        |    CAST(count(*) AS BIGINT) AS shared_digests
        |  FROM d a JOIN d b ON a.fp = b.fp AND a.source < b.source
        |  GROUP BY 1, 2),
        |top AS (SELECT * FROM pairs
        |  ORDER BY shared_digests DESC, source1, source2 LIMIT 20)
        |SELECT source1, source2, shared_digests FROM top
        |ORDER BY source1, source2""".stripMargin,
    "q_length_anova" ->
      """WITH g AS (
        |  SELECT lang AS grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS sv,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
        |  FROM documents GROUP BY 1),
        |m AS (
        |  SELECT max(CASE WHEN grp = 'de' THEN n END) AS n1,
        |    max(CASE WHEN grp = 'de' THEN sv END) AS s1,
        |    max(CASE WHEN grp = 'de' THEN ss END) AS ss1,
        |    max(CASE WHEN grp = 'en' THEN n END) AS n2,
        |    max(CASE WHEN grp = 'en' THEN sv END) AS s2,
        |    max(CASE WHEN grp = 'en' THEN ss END) AS ss2,
        |    max(CASE WHEN grp = 'es' THEN n END) AS n3,
        |    max(CASE WHEN grp = 'es' THEN sv END) AS s3,
        |    max(CASE WHEN grp = 'es' THEN ss END) AS ss3,
        |    max(CASE WHEN grp = 'fr' THEN n END) AS n4,
        |    max(CASE WHEN grp = 'fr' THEN sv END) AS s4,
        |    max(CASE WHEN grp = 'fr' THEN ss END) AS ss4,
        |    max(CASE WHEN grp = 'zh' THEN n END) AS n5,
        |    max(CASE WHEN grp = 'zh' THEN sv END) AS s5,
        |    max(CASE WHEN grp = 'zh' THEN ss END) AS ss5
        |  FROM g),
        |e AS (
        |  SELECT n1 + n2 + n3 + n4 + n5 AS n_total,
        |    CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE) + CAST(s3 AS DOUBLE)
        |      + CAST(s4 AS DOUBLE) + CAST(s5 AS DOUBLE) AS st,
        |    CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
        |      + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE)
        |      + CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE)
        |      + CAST(s5 AS DOUBLE) * CAST(s5 AS DOUBLE) / CAST(n5 AS DOUBLE)
        |      AS bg,
        |    CAST(ss1 AS DOUBLE) + CAST(ss2 AS DOUBLE) + CAST(ss3 AS DOUBLE)
        |      + CAST(ss4 AS DOUBLE) + CAST(ss5 AS DOUBLE) AS sstot
        |  FROM m)
        |SELECT n_total,
        |  bg - st * st / CAST(n_total AS DOUBLE) AS ssb,
        |  sstot - bg AS ssw,
        |  ((bg - st * st / CAST(n_total AS DOUBLE)) / 4.0)
        |    / ((sstot - bg) / (CAST(n_total AS DOUBLE) - 5.0)) AS f_stat
        |FROM e""".stripMargin,
    "q_token_length_dist" ->
      """WITH toks AS (
        |  SELECT least(CAST(length(w) AS BIGINT), 15) AS len FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0),
        |g AS (SELECT len, CAST(count(*) AS BIGINT) AS n
        |  FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
        |SELECT len, n, n * 1000000 // total AS share_ppm
        |FROM g CROSS JOIN tot ORDER BY len""".stripMargin,
    "q_ivf_balance" ->
      s"""WITH adots AS (
         |  SELECT e.vec_id, c.cid, ${duckDot("e.embedding", "c.cv")} AS d
         |  FROM embeddings e CROSS JOIN
         |    (SELECT vec_id AS cid, embedding AS cv FROM embeddings
         |     WHERE vec_id < 8) c),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid)
         |        AS rn
         |    FROM adots) x WHERE rn = 1),
         |sizes AS (
         |  SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs
         |  FROM assign GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS total,
         |  CAST(max(n_vecs) AS BIGINT) AS mx FROM sizes)
         |SELECT cid, n_vecs,
         |  n_vecs * 1000000 // total AS share_ppm,
         |  mx * 8 * 1000 // total AS imbalance_milli
         |FROM sizes CROSS JOIN tot ORDER BY cid""".stripMargin,
    "q_length_psi" ->
      """WITH d AS (
        |  SELECT source, least(n_chars // 125, 7) AS bracket
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |cells AS (
        |  SELECT bracket,
        |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b
        |  FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS na,
        |  CAST(sum(b) AS BIGINT) AS nb FROM cells),
        |terms AS (
        |  SELECT bracket, a, b,
        |    CAST(floor((CAST(a AS DOUBLE) / CAST(na AS DOUBLE)
        |        - CAST(b AS DOUBLE) / CAST(nb AS DOUBLE))
        |      * ln((CAST(a AS DOUBLE) / CAST(na AS DOUBLE))
        |        / (CAST(b AS DOUBLE) / CAST(nb AS DOUBLE)))
        |      * 1000000 + 0.5) AS BIGINT) AS term_unat
        |  FROM cells CROSS JOIN tot WHERE a > 0 AND b > 0),
        |psi AS (SELECT CAST(sum(term_unat) AS BIGINT) AS psi_unat
        |  FROM terms)
        |SELECT CAST(bracket AS BIGINT) AS bracket, a, b, term_unat,
        |  psi_unat
        |FROM terms CROSS JOIN psi ORDER BY bracket""".stripMargin,
    "q_intrinsic_dim" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS anchor, b.vec_id AS nbr,
        |    list_sum(list_transform(generate_series(1,64), i ->
        |      CAST(floor((CAST(a.embedding[i] AS DOUBLE)
        |          - CAST(b.embedding[i] AS DOUBLE)) *
        |        (CAST(a.embedding[i] AS DOUBLE)
        |          - CAST(b.embedding[i] AS DOUBLE)) *
        |        1000000000 + 0.5) AS BIGINT))) AS d2
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |top2 AS (
        |  SELECT anchor, d2,
        |    row_number() OVER (PARTITION BY anchor ORDER BY d2, nbr) AS rn
        |  FROM pairs),
        |ratios AS (
        |  SELECT CAST(floor(ln(CAST(d2b AS DOUBLE) / CAST(d1 AS DOUBLE))
        |      * 500000.0 + 0.5) AS BIGINT) AS lr_unat
        |  FROM (
        |    SELECT anchor,
        |      CAST(min(CASE WHEN rn = 1 THEN d2 END) AS BIGINT) AS d1,
        |      CAST(min(CASE WHEN rn = 2 THEN d2 END) AS BIGINT) AS d2b
        |    FROM top2 WHERE rn <= 2 GROUP BY anchor) t
        |  WHERE d1 > 0 AND d2b > d1)
        |SELECT CAST(count(*) AS BIGINT) AS n_anchors,
        |  CAST(sum(lr_unat) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS mean_lnr_unat,
        |  693147 * CAST(count(*) AS BIGINT) // CAST(sum(lr_unat) AS BIGINT)
        |    AS intrinsic_dim_approx
        |FROM ratios""".stripMargin,
    "q_yule_k" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (
        |  SELECT source, w, count(*) AS m FROM tok WHERE length(w) > 0
        |  GROUP BY source, w),
        |agg AS (
        |  SELECT source, CAST(sum(m) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(m * m) AS BIGINT) AS s2
        |  FROM tf GROUP BY source)
        |SELECT source, n_tokens, n_types,
        |  CAST(floor(10000.0 * (CAST(s2 AS DOUBLE) - CAST(n_tokens AS DOUBLE)) / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS yule_k_milli
        |FROM agg
        |ORDER BY source""".stripMargin,
    "q_jl_distortion" ->
      """WITH xq AS (
        |  SELECT vec_id, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xq
        |  FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)),
        |signs AS (
        |  SELECT j, i,
        |    CAST('0x' || substr(md5('jl|' || CAST(j AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 2 * 2 - 1 AS sgn
        |  FROM generate_series(0, 15) AS tj(j)
        |  CROSS JOIN generate_series(1, 64) AS ti(i)),
        |y AS (
        |  SELECT vec_id, j, CAST(sum(sgn * xq) AS BIGINT) AS y
        |  FROM xq JOIN signs USING (i) GROUP BY vec_id, j),
        |dy2 AS (
        |  SELECT a.vec_id AS pid,
        |    CAST(sum((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS dy2
        |  FROM y a JOIN y b ON a.vec_id + 1 = b.vec_id AND a.j = b.j
        |  GROUP BY 1),
        |dx2 AS (
        |  SELECT a.vec_id AS pid,
        |    CAST(sum((a.xq - b.xq) * (a.xq - b.xq)) AS BIGINT) AS dx2
        |  FROM xq a JOIN xq b ON a.vec_id + 1 = b.vec_id AND a.i = b.i
        |  GROUP BY 1),
        |ratios AS (
        |  SELECT CAST(floor(CAST(dy2 AS DOUBLE) / 16.0 / CAST(dx2 AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS r_milli
        |  FROM dy2 JOIN dx2 USING (pid) WHERE dx2 > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(r_milli) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_ratio_milli,
        |  CAST(min(r_milli) AS BIGINT) AS min_ratio_milli,
        |  CAST(max(r_milli) AS BIGINT) AS max_ratio_milli,
        |  CAST(sum(CASE WHEN r_milli BETWEEN 700 AND 1300 THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS within_30pct_ppm
        |FROM ratios""".stripMargin,
    "q_hubness" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS anchor, b.vec_id AS nbr,
        |    list_sum(list_transform(generate_series(1,64), i ->
        |      CAST(floor((CAST(a.embedding[i] AS DOUBLE)
        |          - CAST(b.embedding[i] AS DOUBLE)) *
        |        (CAST(a.embedding[i] AS DOUBLE)
        |          - CAST(b.embedding[i] AS DOUBLE)) *
        |        1000000000 + 0.5) AS BIGINT))) AS d2
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |top3 AS (
        |  SELECT nbr FROM (
        |    SELECT nbr, row_number() OVER (PARTITION BY anchor ORDER BY d2, nbr) AS rn
        |    FROM pairs) q WHERE rn <= 3),
        |indeg AS (SELECT nbr, CAST(count(*) AS BIGINT) AS indeg FROM top3 GROUP BY nbr),
        |full_set AS (
        |  SELECT e.vec_id, coalesce(i.indeg, 0) AS indeg
        |  FROM embeddings e LEFT JOIN indeg i ON e.vec_id = i.nbr),
        |mx AS (SELECT CAST(max(indeg) AS BIGINT) AS max_indeg FROM full_set)
        |SELECT CAST(least(indeg, 6) AS BIGINT) AS indeg_bucket,
        |  CAST(count(*) AS BIGINT) AS n_vectors, max_indeg
        |FROM full_set CROSS JOIN mx
        |GROUP BY 1, max_indeg
        |ORDER BY indeg_bucket""".stripMargin,
    "q_renyi_spectrum" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (
        |  SELECT source, w, count(*) AS m FROM tok WHERE length(w) > 0
        |  GROUP BY source, w),
        |agg AS (
        |  SELECT source, CAST(sum(m) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v,
        |    CAST(sum(m * m) AS BIGINT) AS s2, CAST(max(m) AS BIGINT) AS mmax,
        |    CAST(sum(CAST(floor(CAST(m AS DOUBLE) * ln(CAST(m AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS mlnm_micro
        |  FROM tf GROUP BY source)
        |SELECT source, n AS n_tokens, v AS n_types,
        |  CAST(floor(ln(CAST(v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS h0_micro,
        |  CAST(floor((ln(CAST(n AS DOUBLE)) - (mlnm_micro / 1000000.0) / CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS h1_micro,
        |  CAST(floor((2.0 * ln(CAST(n AS DOUBLE)) - ln(CAST(s2 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS h2_micro,
        |  CAST(floor((ln(CAST(n AS DOUBLE)) - ln(CAST(mmax AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS hinf_micro
        |FROM agg ORDER BY source""".stripMargin,
    "q_dbi" ->
      """WITH xq AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xq
        |  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)),
        |cent AS (
        |  SELECT label, i,
        |    CAST(floor(CAST(sum(xq) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS c
        |  FROM xq GROUP BY label, i),
        |s2v AS (
        |  SELECT x.label, x.vec_id,
        |    CAST(sum((x.xq - c.c) * (x.xq - c.c)) AS BIGINT) AS s2
        |  FROM xq x JOIN cent c ON x.label = c.label AND x.i = c.i
        |  GROUP BY x.label, x.vec_id),
        |scat AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |    sqrt(CAST(sum(s2) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS s_rms
        |  FROM s2v GROUP BY label),
        |cd AS (
        |  SELECT a.label AS li, b.label AS lj,
        |    CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS d2
        |  FROM cent a JOIN cent b ON a.i = b.i AND a.label <> b.label
        |  GROUP BY 1, 2),
        |rij AS (
        |  SELECT li, (si.s_rms + sj.s_rms) / sqrt(CAST(d2 AS DOUBLE)) AS r
        |  FROM cd JOIN scat si ON cd.li = si.label
        |  JOIN scat sj ON cd.lj = sj.label),
        |perlabel AS (
        |  SELECT li AS label, CAST(floor(max(r) * 1000 + 0.5) AS BIGINT) AS rmax_milli
        |  FROM rij GROUP BY 1),
        |dbi AS (
        |  SELECT CAST(sum(rmax_milli) AS BIGINT) // CAST(count(*) AS BIGINT) AS dbi_milli
        |  FROM perlabel)
        |SELECT s.label, s.n_vecs, CAST(floor(s.s_rms + 0.5) AS BIGINT) AS s_rms_micro,
        |  p.rmax_milli, d.dbi_milli
        |FROM scat s JOIN perlabel p ON s.label = p.label CROSS JOIN dbi d
        |ORDER BY s.label""".stripMargin,
    "q_dim_corr" ->
      """WITH xq AS (
        |  SELECT vec_id, CAST(i AS BIGINT) AS i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xq
        |  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)),
        |mom AS (
        |  SELECT i, CAST(count(*) AS BIGINT) AS n, CAST(sum(xq) AS BIGINT) AS s,
        |    CAST(sum(xq * xq) AS BIGINT) AS ss
        |  FROM xq GROUP BY i),
        |crossp AS (
        |  SELECT a.i AS i, b.i AS j, CAST(sum(a.xq * b.xq) AS BIGINT) AS sxy
        |  FROM xq a JOIN xq b ON a.vec_id = b.vec_id AND a.i < b.i
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT c.i, c.j,
        |    CAST(floor((CAST(mi.n AS DOUBLE) * CAST(c.sxy AS DOUBLE) - CAST(mi.s AS DOUBLE) * CAST(mj.s AS DOUBLE)) / sqrt((CAST(mi.n AS DOUBLE) * CAST(mi.ss AS DOUBLE) - CAST(mi.s AS DOUBLE) * CAST(mi.s AS DOUBLE)) * (CAST(mi.n AS DOUBLE) * CAST(mj.ss AS DOUBLE) - CAST(mj.s AS DOUBLE) * CAST(mj.s AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS r_ppm
        |  FROM crossp c JOIN mom mi ON c.i = mi.i JOIN mom mj ON c.j = mj.i)
        |SELECT i, j, r_ppm FROM r
        |ORDER BY abs(r_ppm) DESC, i, j LIMIT 10""".stripMargin,
    "q_cluster_purity" ->
      s"""WITH cents AS (
         |  SELECT CAST(vec_id AS BIGINT) AS cid, embedding AS cv
         |  FROM embeddings WHERE vec_id < 8),
         |dots AS (
         |  SELECT e.vec_id, c.cid, ${duckDot("e.embedding", "c.cv")} AS d
         |  FROM embeddings e CROSS JOIN cents c),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
         |    FROM dots) x WHERE rn = 1),
         |cont AS (
         |  SELECT a.cid, CAST(e.label AS BIGINT) AS label, count(*) AS n
         |  FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id
         |  GROUP BY 1, 2),
         |byc AS (
         |  SELECT cid, CAST(sum(n) AS BIGINT) AS nc, CAST(max(n) AS BIGINT) AS maxn
         |  FROM cont GROUP BY cid),
         |byl AS (SELECT label, CAST(sum(n) AS BIGINT) AS nl FROM cont GROUP BY label),
         |tot AS (
         |  SELECT CAST(sum(nc) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS n_buckets,
         |    CAST(sum(maxn) AS BIGINT) AS smax
         |  FROM byc),
         |mi AS (
         |  SELECT CAST(sum(CAST(floor(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE) * ln(CAST(n AS DOUBLE) * CAST(nn AS DOUBLE) / (CAST(nc AS DOUBLE) * CAST(nl AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS mi_micro
         |  FROM cont JOIN byc USING (cid) JOIN byl USING (label) CROSS JOIN tot),
         |hc AS (
         |  SELECT CAST(sum(CAST(floor(-(CAST(nc AS DOUBLE) / CAST(nn AS DOUBLE)) * ln(CAST(nc AS DOUBLE) / CAST(nn AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS hc_micro
         |  FROM byc CROSS JOIN tot),
         |hl AS (
         |  SELECT CAST(sum(CAST(floor(-(CAST(nl AS DOUBLE) / CAST(nn AS DOUBLE)) * ln(CAST(nl AS DOUBLE) / CAST(nn AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS hl_micro
         |  FROM byl CROSS JOIN tot)
         |SELECT nn AS n_vecs, n_buckets, smax * 1000000 // nn AS purity_ppm,
         |  mi_micro, hc_micro, hl_micro,
         |  CAST(floor(CAST(mi_micro AS DOUBLE) / sqrt(CAST(hc_micro AS DOUBLE) * CAST(hl_micro AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS nmi_milli
         |FROM tot CROSS JOIN mi CROSS JOIN hc CROSS JOIN hl""".stripMargin,
    "q_ivf_probe_recall" ->
      s"""WITH cents AS (
         |  SELECT CAST(vec_id AS BIGINT) AS cid, embedding AS cv
         |  FROM embeddings WHERE vec_id < 8),
         |qs AS (
         |  SELECT CAST(vec_id AS BIGINT) AS qid, embedding AS qv
         |  FROM embeddings WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.qid, CAST(e.vec_id AS BIGINT) AS vec_id,
         |    CAST(floor((${duckDot("q.qv", "e.embedding")} / 1000000000.0) / (sqrt(${duckDot("q.qv", "q.qv")} / 1000000000.0) * sqrt(${duckDot("e.embedding", "e.embedding")} / 1000000000.0)) * 1000000000 + 0.5) AS BIGINT) AS cosk
         |  FROM qs q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
         |gt AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid ORDER BY cosk DESC, vec_id) AS rn
         |    FROM scored) x WHERE rn <= 10),
         |dots AS (
         |  SELECT CAST(e.vec_id AS BIGINT) AS vec_id, c.cid,
         |    ${duckDot("e.embedding", "c.cv")} AS d
         |  FROM embeddings e CROSS JOIN cents c),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
         |    FROM dots) x WHERE rn = 1),
         |qcd AS (
         |  SELECT q.qid, c.cid, ${duckDot("q.qv", "c.cv")} AS dc
         |  FROM qs q CROSS JOIN cents c),
         |qc AS (
         |  SELECT qid, cid,
         |    row_number() OVER (PARTITION BY qid ORDER BY dc DESC, cid) AS crank
         |  FROM qcd),
         |probes AS (SELECT CAST(p AS BIGINT) AS p FROM (VALUES (1), (2), (4)) t(p)),
         |cand AS (
         |  SELECT pr.p, qc.qid, a.vec_id
         |  FROM qc CROSS JOIN probes pr
         |  JOIN assign a ON a.cid = qc.cid
         |  WHERE qc.crank <= pr.p AND a.vec_id <> qc.qid),
         |ivftop AS (
         |  SELECT p, qid, vec_id FROM (
         |    SELECT c.p, c.qid, c.vec_id,
         |      row_number() OVER (PARTITION BY c.p, c.qid
         |        ORDER BY s.cosk DESC, c.vec_id) AS rn
         |    FROM cand c JOIN scored s ON c.qid = s.qid AND c.vec_id = s.vec_id) x
         |  WHERE rn <= 10),
         |hits AS (
         |  SELECT i.p, i.qid, count(*) AS hit
         |  FROM ivftop i JOIN gt g ON i.qid = g.qid AND i.vec_id = g.vec_id
         |  GROUP BY 1, 2),
         |perq AS (
         |  SELECT pr.p, q.qid, coalesce(h.hit, 0) AS hit
         |  FROM qs q CROSS JOIN probes pr
         |  LEFT JOIN hits h ON h.p = pr.p AND h.qid = q.qid)
         |SELECT p, CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) * 1000000 // (CAST(count(*) AS BIGINT) * 10) AS recall_ppm
         |FROM perq GROUP BY p ORDER BY p""".stripMargin,
    "q_median_polish" ->
      """WITH grid AS (
        |  SELECT ((CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) % 7) + 7) % 7 AS dow,
        |    CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100000 AS v
        |  FROM orders GROUP BY 1, 2),
        |rowmed AS (
        |  SELECT dow, v AS row_eff FROM (
        |    SELECT dow, v,
        |      row_number() OVER (PARTITION BY dow ORDER BY v, m) AS rn,
        |      count(*) OVER (PARTITION BY dow) AS nr
        |    FROM grid) x WHERE rn = (nr + 1) // 2),
        |r1 AS (
        |  SELECT g.dow, g.m, g.v, rm.row_eff, g.v - rm.row_eff AS res1
        |  FROM grid g JOIN rowmed rm ON g.dow = rm.dow),
        |colmed AS (
        |  SELECT m, res1 AS col_eff FROM (
        |    SELECT m, res1,
        |      row_number() OVER (PARTITION BY m ORDER BY res1, dow) AS rn,
        |      count(*) OVER (PARTITION BY m) AS nc
        |    FROM r1) x WHERE rn = (nc + 1) // 2)
        |SELECT r1.dow, r1.m, r1.v, r1.row_eff, cm.col_eff,
        |  r1.res1 - cm.col_eff AS residual
        |FROM r1 JOIN colmed cm ON r1.m = cm.m
        |ORDER BY abs(r1.res1 - cm.col_eff) DESC, r1.dow, r1.m LIMIT 10""".stripMargin,
    "q_decision_curve" ->
      """WITH scored AS (
        |  SELECT n_chars >= 200 AS label,
        |    40 * CAST(len(string_split(text, ' ')) AS BIGINT) +
        |    (-10) * CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) +
        |    (-2) * abs(n_chars - 500) + (-1500) AS logit_milli
        |  FROM documents),
        |binned AS (
        |  SELECT greatest(least(logit_milli // 2000, 10), -10) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM scored GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |  CAST(sum(pos) AS BIGINT) AS npos FROM binned),
        |cum AS (
        |  SELECT bin,
        |    CAST(sum(n) OVER w AS BIGINT) AS pred_pos,
        |    CAST(sum(pos) OVER w AS BIGINT) AS tp
        |  FROM binned
        |  WINDOW w AS (ORDER BY bin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |nb AS (
        |  SELECT bin, tp, pred_pos, nn, npos,
        |    1.0 / (1.0 + exp(-CAST(bin AS DOUBLE) * 2.0)) AS t
        |  FROM cum CROSS JOIN tot)
        |SELECT bin AS threshold_bin, tp, pred_pos - tp AS fp,
        |  CAST(floor((CAST(tp AS DOUBLE) / CAST(nn AS DOUBLE) - CAST(pred_pos - tp AS DOUBLE) / CAST(nn AS DOUBLE) * (t / (1.0 - t))) * 1000000 + 0.5) AS BIGINT) AS nb_model_micro,
        |  CAST(floor((CAST(npos AS DOUBLE) / CAST(nn AS DOUBLE) - CAST(nn - npos AS DOUBLE) / CAST(nn AS DOUBLE) * (t / (1.0 - t))) * 1000000 + 0.5) AS BIGINT) AS nb_all_micro
        |FROM nb ORDER BY threshold_bin""".stripMargin,
    "q_chao1" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (
        |  SELECT source, w, count(*) AS m FROM tok WHERE length(w) > 0
        |  GROUP BY source, w),
        |agg AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS v_obs,
        |    CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM tf GROUP BY source)
        |SELECT source, v_obs, f1, f2,
        |  CAST(floor(CAST(v_obs AS DOUBLE) + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE) / (2.0 * CAST(f2 AS DOUBLE)) + 0.5) AS BIGINT) AS chao1_est,
        |  CAST(floor(CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE) / (2.0 * CAST(f2 AS DOUBLE)) / (CAST(v_obs AS DOUBLE) + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE) / (2.0 * CAST(f2 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS unseen_share_ppm
        |FROM agg WHERE f2 > 0
        |ORDER BY source""".stripMargin,
    "q_vocab_overlap" ->
      """WITH sv AS (
        |  SELECT DISTINCT source, w FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0),
        |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS v FROM sv GROUP BY source),
        |inter AS (
        |  SELECT a.source AS s1, b.source AS s2, CAST(count(*) AS BIGINT) AS both
        |  FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT i.s1, i.s2, i.both,
        |  i.both * 1000000 // least(z1.v, z2.v) AS overlap_ppm,
        |  i.both * 1000000 // (z1.v + z2.v - i.both) AS jaccard_ppm
    |FROM inter i
        |JOIN sizes z1 ON i.s1 = z1.source
        |JOIN sizes z2 ON i.s2 = z2.source
        |ORDER BY overlap_ppm DESC, i.s1, i.s2 LIMIT 10""".stripMargin,
    "q_horvitz_thompson" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN source IN ('src0', 'src1', 'src2', 'src3', 'src4') THEN 90
        |         WHEN source IN ('src5', 'src6', 'src7', 'src8', 'src9') THEN 15
        |         ELSE 40 END AS rate,
        |    CAST('0x' || substr(md5('ht|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS g
        |  FROM documents),
        |truth AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(n_chars) AS BIGINT) AS true_total
        |  FROM base),
        |sampled AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_sampled,
        |    CAST(sum(n_chars * 100000 // rate) AS BIGINT) AS ht_milli
        |  FROM base WHERE g < rate)
        |SELECT n_sampled, n_total, ht_milli, true_total,
        |  abs(ht_milli // 1000 - true_total) * 1000000 // true_total AS err_ppm
        |FROM sampled CROSS JOIN truth""".stripMargin,
    "q_embed_two_sample" -> {
      def l2fp(a: String, b: String) =
        s"list_sum(list_transform(generate_series(1,64), i -> " +
          s"CAST(floor((CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
          s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)))"
      def dmic(a: String, b: String) =
        s"CAST(floor(sqrt(CAST(${l2fp(a, b)} AS DOUBLE) / 1e9) * 1e6 + 0.5) AS BIGINT)"
      s"""WITH armx AS (
         |  SELECT vec_id AS k, embedding AS e FROM embeddings WHERE label = 0
         |  ORDER BY CAST('0x' || substr(md5('e2sa|' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT), vec_id
         |  LIMIT 200),
         |army AS (
         |  SELECT vec_id AS k, embedding AS e FROM embeddings WHERE label = 1
         |  ORDER BY CAST('0x' || substr(md5('e2sb|' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT), vec_id
         |  LIMIT 200),
         |sxy AS (
         |  SELECT CAST(floor(CAST(sum(${dmic("x.e", "y.e")}) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS exy_micro,
         |    CAST(count(*) AS BIGINT) AS nxy
         |  FROM armx x CROSS JOIN army y),
         |sxx AS (
         |  SELECT CAST(floor(CAST(sum(${dmic("a.e", "b.e")}) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS exx_micro
         |  FROM armx a JOIN armx b ON a.k < b.k),
         |syy AS (
         |  SELECT CAST(floor(CAST(sum(${dmic("a.e", "b.e")}) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS eyy_micro
         |  FROM army a JOIN army b ON a.k < b.k)
         |SELECT nxy, exy_micro, exx_micro, eyy_micro,
         |  2 * exy_micro - exx_micro - eyy_micro AS energy_micro
         |FROM sxy CROSS JOIN sxx CROSS JOIN syy""".stripMargin
    },
    "q_ess_weights" ->
      """WITH sampled AS (
        |  SELECT 100000 // (CASE WHEN source IN ('src0', 'src1', 'src2', 'src3', 'src4') THEN 90
        |    WHEN source IN ('src5', 'src6', 'src7', 'src8', 'src9') THEN 15
        |    ELSE 40 END) AS w
        |  FROM documents
        |  WHERE CAST('0x' || substr(md5('ht|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
        |    < CASE WHEN source IN ('src0', 'src1', 'src2', 'src3', 'src4') THEN 90
        |        WHEN source IN ('src5', 'src6', 'src7', 'src8', 'src9') THEN 15
        |        ELSE 40 END),
        |acc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_sampled, CAST(sum(w) AS BIGINT) AS sw,
        |    CAST(sum(w * w) AS BIGINT) AS sww
        |  FROM sampled)
        |SELECT n_sampled, sw AS sum_w_milli,
        |  CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS ess_milli,
        |  CAST(floor(CAST(n_sampled AS DOUBLE) / (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS design_effect_milli
        |FROM acc""".stripMargin,
    "q_mcc" ->
      """WITH scored AS (
        |  SELECT n_chars >= 200 AS label,
        |    (40 * CAST(len(string_split(text, ' ')) AS BIGINT) +
        |     (-10) * CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) +
        |     (-2) * abs(n_chars - 500) + (-1500)) >= 0 AS pred
        |  FROM documents),
        |cells AS (
        |  SELECT
        |    CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM scored)
        |SELECT tp, fp, fn, tn,
        |  CAST(floor((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE)) / (sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE)) * sqrt(CAST(tn + fp AS DOUBLE)) * sqrt(CAST(tn + fn AS DOUBLE))) * 1000 + 0.5) AS BIGINT) AS mcc_milli,
        |  (tp + tn) * 1000000 // (tp + fp + fn + tn) AS accuracy_ppm
        |FROM cells""".stripMargin,
    "q_bpe_encode" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |wf AS (SELECT * FROM w WHERE w <> ''),
        |e AS (
        |  SELECT source, CAST(length(w) AS BIGINT) AS chars,
        |    CAST(len(string_split(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |        trim(regexp_replace(w, '(.)', '\1 ', 'g')),
        |        't h', 'th', 'g'), 'th e', 'the', 'g'), 'i n', 'in', 'g'),
        |        'o w', 'ow', 'g'), 'a t', 'at', 'g'), 'e r', 'er', 'g'),
        |        's t', 'st', 'g'), 'a r', 'ar', 'g'),
        |      ' ')) AS BIGINT) AS toks
        |  FROM wf)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(chars) AS BIGINT) AS n_chars,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(chars) AS BIGINT) * 1000000 // CAST(sum(toks) AS BIGINT)
        |    AS chars_per_token_ppm,
        |  (CAST(sum(chars) AS BIGINT) - CAST(sum(toks) AS BIGINT)) * 1000000
        |    // CAST(sum(chars) AS BIGINT) AS merge_savings_ppm
        |FROM e GROUP BY source ORDER BY source""".stripMargin,
    "q_mojibake" ->
      """WITH n AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |    translate(lower(n_name), 'aeou', 'áéöü') AS accented
        |  FROM nation),
        |c AS (
        |  SELECT n_nationkey, accented,
        |    replace(replace(replace(replace(accented,
        |      'á', 'Ã¡'), 'é', 'Ã©'), 'ö', 'Ã¶'), 'ü', 'Ã¼') AS corrupted
        |  FROM n)
        |SELECT n_nationkey, corrupted,
        |  replace(replace(replace(replace(corrupted,
        |    'Ã¡', 'á'), 'Ã©', 'é'), 'Ã¶', 'ö'), 'Ã¼', 'ü') AS repaired,
        |  contains(corrupted, 'Ã') AS had_mojibake,
        |  replace(replace(replace(replace(corrupted,
        |    'Ã¡', 'á'), 'Ã©', 'é'), 'Ã¶', 'ö'), 'Ã¼', 'ü') = accented
        |    AS repaired_ok
        |FROM c ORDER BY n_nationkey""".stripMargin,
    "q_shard_manifest" ->
      """WITH d AS (
        |  SELECT CAST('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 16 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    CAST(length(text) AS BIGINT) AS chars,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15) AS BIGINT) AS digest
        |  FROM documents),
        |m AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(toks) AS BIGINT) AS n_tokens,
        |    CAST(sum(chars) AS BIGINT) AS n_chars,
        |    bit_xor(digest) AS checksum
        |  FROM d GROUP BY shard),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM m)
        |SELECT shard, n_docs, n_tokens, n_chars, checksum,
        |  n_docs * 16 * 1000000 // total_docs - 1000000 AS skew_ppm
        |FROM m CROSS JOIN tot ORDER BY shard""".stripMargin,
  )
}
