package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal, Similarity, TextOps}
import graft.ops.Analytics

/** LLM training-data pipeline: dedup (exact/MinHash/SimHash/PPJoin), similarity search (IVF/PQ/LSH), text analysis, tokenizer ops, multimodal metadata, curation.
  *
  * Split from the SparkEntry monolith; every member is `private[graft]`
  * and the driver surface stays `SparkEntry.queries` / `oracleSql`
  * (assembled from the per-domain map fragments below).
  */
private[graft] trait LlmQueries1 { this: SparkEntry.type =>

  /** Stratified sampling: exactly n docs per language stratum, chosen
    * by deterministic hash order — the reproducible per-class subset
    * builder for balanced corpus construction. Runs on the bounded
    * per-partition top-n path (graft.ops.Sampling): no single-task
    * stratum stage, no unbounded agg buffer — see Sampling.scaladoc. */
  private[graft] def qStratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.stratifiedTopN(s,
        t(s, dir, "documents")
          .withColumn("h",
            md5(concat(lit("strat|"), col("doc_id").cast("string")).cast("binary")))
          .select(col("lang"), col("h"), col("doc_id")),
        stratumCol = "lang", keyCol = "h", idCol = "doc_id", n = 25)
      .orderBy(col("lang"), col("rn"))

  /** Deterministic hash-based Bernoulli sampling (reproducible corpus
    * subsets — a pipeline staple; salt makes draws independent). */
  private[graft] def qSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(
        conv(substring(md5(concat(lit("sample|"), col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long") % 100 < 10)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Corpus bigram document frequency (n-gram statistics). */
  private[graft] def qNgramCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(Dedup.shingles(TextOps.tokens(col("text")), 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("bigram"))
      .limit(20)

  /** Tokenizer-vocabulary coverage audit: build the top-256 vocabulary
    * by document frequency (deterministic tie-break on the token),
    * broadcast it, and report each source's out-of-vocabulary token
    * rate in exact ppm — the coverage check run before committing to a
    * tokenizer. The vocab build shuffles (token, doc) pairs once for
    * the distinct, then (token) counts; the tiny ranked vocab
    * broadcasts back onto the token stream, so the corpus is scanned
    * twice and never sorted. */
  private[graft] def qVocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = tok.select(col("tok"), col("doc_id")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(256)
    tok.join(broadcast(vocab.select(col("tok"), lit(1).as("in_v"))),
        Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_ppm", expr("oov_tokens * 1000000 div n_tokens"))
      .orderBy(col("source"))
  }

  private[graft] def qTextStats(s: SparkSession, dir: String): DataFrame =
    TextOps.withTokenStats(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("n_uniq_tokens").cast("long").as("n_uniq_tokens"),
        col("type_token_ratio"), col("avg_token_len"))
      .orderBy(col("doc_id"))

  private[graft] def qLangId(s: SparkSession, dir: String): DataFrame =
    TextOps.withLangId(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("en_hits").cast("long").as("en_hits"),
        col("n_tokens").cast("long").as("n_tokens"), col("en_density"),
        col("pred_lang"), col("lang"), (col("pred_lang") === col("lang")).as("pred_match"))
      .orderBy(col("doc_id"))

  private[graft] def qQuality(s: SparkSession, dir: String): DataFrame =
    TextOps.withQualityScore(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("en_density"), col("type_token_ratio"),
        col("quality_score"))
      .orderBy(col("doc_id"))

  private[graft] def qFingerprint(s: SparkSession, dir: String): DataFrame =
    TextOps.withFingerprints(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("fp"), col("fp_prefix"))
      .orderBy(col("doc_id"))

  private[graft] def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(t(s, dir, "documents"), "doc_id", "text")
      .select(col("keep_id"), col("dup_count"))
      .orderBy(col("keep_id"))

  private[graft] def qJaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", k = 5, minSim = 0.05)
      .select(col("d1"), col("d2"), col("shared"), col("n1"), col("n2"), col("jaccard"))
      .orderBy(col("d1"), col("d2"))

  private[graft] def qMinhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidates(t(s, dir, "documents"), "doc_id", "text",
        k = 5, numHashes = 8, rowsPerBand = 1)
      .orderBy(col("d1"), col("d2"))

  private[graft] def qSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash32(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  private[graft] def qCosineTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.topK(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") === 0).select(col("embedding").as("qv")), "qv", 20)
  }

  private[graft] def qEmbedNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        "label", minSim = 0.25)
      .orderBy(col("v1"), col("v2"))

  private[graft] def qIvfSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
    val qc = assign.filter(col("vec_id") === 0).select(col("cid").as("qcid"))
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    emb.join(assign, "vec_id")
      .join(broadcast(qc), col("cid") === col("qcid"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  /** ANN index-quality evaluation: recall@10 of the IVF index against
    * the exact brute-force ground truth, per query — the metric an ANN
    * deployment gates on before trading exactness for probe speed.
    * Both rankings run through the SAME bounded per-partition heap
    * (no per-query window); the IVF assignment is computed once and
    * reused for the query buckets and the corpus buckets; recall is an
    * exact integer ppm. */
  private[graft] def qRecallAtK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
      .localCheckpoint(eager = false)
    val queries = emb.filter(col("vec_id").isin(0, 7, 42, 99, 123))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(assign.select(col("vec_id").as("qid"), col("cid").as("qcid")), "qid")
    def top10(scored: DataFrame): DataFrame = {
      val keyed = scored.select(col("qid"), col("vec_id"),
        lpad(greatest(lit(0L),
            floor((lit(1.0) - col("cosine")) * 1e9 + 0.5).cast("long")).cast("string"),
          12, "0").as("distkey"))
      graft.ops.Sampling.stratifiedTopN(s, keyed, "qid", "distkey", "vec_id", n = 10)
        .select(col("qid").cast("long").as("qid"), col("vec_id"))
    }
    val truth = top10(emb
      .crossJoin(broadcast(queries.select(col("qid"), col("qv"))))
      .select(col("qid"), col("vec_id"),
        Similarity.cosineFp(col("embedding"), col("qv")).as("cosine")))
    val retrieved = top10(emb.join(assign, "vec_id")
      .join(broadcast(queries), col("cid") === col("qcid"))
      .select(col("qid"), col("vec_id"),
        Similarity.cosineFp(col("embedding"), col("qv")).as("cosine")))
    truth.join(retrieved.withColumn("hit", lit(1L)), Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0L))).as("n_matched"))
      .withColumn("recall_ppm", expr("n_matched * 1000000 div n_truth"))
      .orderBy(col("qid"))
  }

  /** Int8 embedding quantization audit: per-vector scale, the full
    * code vector (rendered as CSV for engine-portable comparison), and
    * the exact fixed-point reconstruction error. */
  private[graft] def qVecQuantize(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(t(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("scale"),
        array_join(transform(col("codes"), c => c.cast("string")), ",").as("codes_csv"),
        col("abs_err_fp"))
      .orderBy(col("vec_id"))

  /** Batched ANN serving: top-5 neighbors for EACH of several query
    * vectors in one pass — broadcast the query batch, score every
    * (query, vector) pair, then per-query top-k through the SAME
    * bounded per-partition heap operator the stratified sampler uses
    * (stratum = query id, key = fixed-width fixed-point distance, so
    * string order == numeric order). No per-query window, no unbounded
    * buffer: the serving path scales with corpus size times queries /
    * partitions. */
  private[graft] def qAnnBatch(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id").isin(0, 7, 42))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"),
        Similarity.cosineFp(col("embedding"), col("qv")).as("cosine"))
      // ascending sortable key: fixed-point (1 - cosine), zero-padded to
      // fixed width so lexicographic == numeric order. Clamped at 0:
      // fixed-point rounding can push cosine a hair ABOVE 1 for
      // near-identical vectors, and a negative key would sort reversed
      // lexicographically vs numerically
      .select(col("qid"), col("vec_id"),
        lpad(greatest(lit(0L),
            floor((lit(1.0) - col("cosine")) * 1e9 + 0.5).cast("long")).cast("string"),
          12, "0").as("distkey"))
    graft.ops.Sampling.stratifiedTopN(s, scored, "qid", "distkey", "vec_id", n = 5)
      .select(col("qid").cast("long").as("qid"), col("rn"), col("vec_id"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98) — the diversity-aware second stage a RAG retriever runs
    * after ANN: for each of three query vectors, the top-8 cosine
    * candidates (q_ann_batch's exact quantized-distance rule) are
    * greedily re-ranked with MMR(c) = rel(c) − max_{s∈selected}
    * sim(c, s) (λ = ½ up to the monotone 2× rescale), three picks per
    * query, ties to the smaller vec_id. Output rows carry the
    * relevance AND the redundancy each pick paid, so the
    * relevance-vs-diversity trade is auditable. Scale shape: candidate
    * generation is the bounded per-stratum heap top-N (no global
    * sort) and the vector fetch is one broadcast join, so the corpus
    * is scanned exactly twice no matter how large it grows; the
    * candidate frame itself is BOUNDED MODEL STATE (queries × k′ =
    * 24 rows of 64-float vectors), so the pairwise sims and the three
    * greedy picks run driver-side — the qKcenter convention — instead
    * of as distributed joins+windows over 24 rows. The driver-side
    * fixed-point cosine is bit-identical to the fixed_point_dot
    * kernel (same per-term floor(x·y·1e9 + 0.5) longs, same IEEE
    * division tree), so the oracle hash is unchanged. */
  private[graft] def qMmrRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id").isin(0, 7, 42))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        lpad(greatest(lit(0L),
            floor((lit(1.0) - Similarity.cosineFp(col("embedding"), col("qv")))
              * 1e9 + 0.5).cast("long")).cast("string"),
          12, "0").as("distkey"))
    val ids = graft.ops.Sampling
      .stratifiedTopN(s, scored, "qid", "distkey", "vec_id", n = 8)
      .select(col("qid").cast("long").as("qid"), col("vec_id"))
    // ONE distributed job: fetch the 24 candidate vectors + their
    // relevance (rel computed by the codegen'd kernel, same as before)
    val cand = emb
      .join(broadcast(ids), "vec_id")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("vec_id"), col("embedding"),
        Similarity.cosineFp(col("embedding"), col("qv")).as("rel"))
      .collect()
    // driver-side replica of fixed_point_dot / cosineFp (Kernels.scala
    // FixedPointDot contract: per-term floor(x*y*1e9 + 0.5) summed long)
    def dotFp(a: Seq[Float], b: Seq[Float]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) {
        acc += math.floor(a(i).toDouble * b(i).toDouble * 1e9 + 0.5).toLong
        i += 1
      }
      acc
    }
    def cosFp(a: Seq[Float], b: Seq[Float]): Double =
      (dotFp(a, b) / 1e9) /
        (math.sqrt(dotFp(a, a) / 1e9) * math.sqrt(dotFp(b, b) / 1e9))
    final case class C(vecId: Long, v: Seq[Float], rel: Double)
    val byQ = cand.map { r =>
      (r.getLong(0), C(r.getLong(1), r.getSeq[Float](2), r.getDouble(3)))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = byQ.toSeq.flatMap { case (qid, cs) =>
      // greedy MMR: pick 1 = argmax rel; picks 2..3 = argmax rel − red,
      // red = max sim to selected; all ties to the smaller vec_id
      var selected = Vector.empty[C]
      var rows = Vector.empty[(Long, Long, Long, Double, Double, Double)]
      var rank = 1L
      while (rank <= 3L && selected.size < cs.length) {
        val rem = cs.filterNot(c => selected.exists(_.vecId == c.vecId))
        val scored = rem.map { c =>
          val red =
            if (selected.isEmpty) 0.0
            else selected.map(sc => cosFp(c.v, sc.v)).max
          (c, red, c.rel - red)
        }
        val (best, red, mmr) = scored.minBy { case (c, _, m) => (-m, c.vecId) }
        rows :+= ((qid, rank, best.vecId, best.rel, red, mmr))
        selected :+= best
        rank += 1
      }
      rows
    }
    import s.implicits._
    out.toDF("qid", "rank", "vec_id", "rel", "red", "mmr")
      .orderBy(col("qid"), col("rank"))
  }

  /** Gonzalez (1985) farthest-first k-center seeding, oracle-gated:
    * 5 picks over the embedding corpus — the first by lowest id, each
    * next at MAXIMUM fixed-point gap to its nearest chosen seed — with
    * the gap each pick was chosen at. Pick 5's gap is the k-center
    * coverage radius of the first four seeds (the 2-approximation
    * guarantee's certificate), so the row set doubles as the seeding
    * audit a clustering pipeline runs before committing to k. Scale
    * shape: k bounded passes, each ONE corpus aggregate (argmax of the
    * min-gap, seeds moved by broadcast); only k (id, gap) pairs ever
    * reach the driver — the power-iteration bounded-model convention.
    * The oracle replays all four greedy picks unrolled. */
  private[graft] def qKcenter(s: SparkSession, dir: String): DataFrame = {
    val picks = graft.llm.Clustering.farthestFirstWithGaps(
      t(s, dir, "embeddings"), "vec_id", "embedding", k = 5)
    import s.implicits._
    picks.zipWithIndex
      .map { case ((id, gap), i) => (i.toLong + 1, id, gap) }
      .toDF("pick", "vec_id", "gap_fp")
      .orderBy(col("pick"))
  }

  /** SRP-LSH bucket histogram: the centroid-free ANN scale path
    * (bucket join replaces all-pairs; see Similarity.srpSignature). */
  private[graft] def qLshAnnBuckets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        Similarity.srpSignature(col("embedding"), numPlanes = 12, dim = 64).as("sig"))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec"))
      .orderBy(col("sig"))

  private[graft] def qTokenEstimate(s: SparkSession, dir: String): DataFrame =
    TextOps.withTokenEstimate(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("n_words"), col("est_bpe_tokens"), col("est_tokens"))
      .orderBy(col("doc_id"))

  /** Array/collection function sweep over the embedding column. */
  private[graft] def qArrayFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        col("embedding").getItem(0).cast("double").as("first_component"),
        graft.functions.kernels.fixed_point_dot(
          slice(col("embedding"), 1, 8), slice(col("embedding"), 1, 8)).as("head8_norm_fp"),
        size(filter(col("embedding"), x => x > 0)).cast("long").as("n_positive"))
      .orderBy(col("vec_id"))

  /** The composed curation pipeline (the realistic shape of a training
    * -data job): language gate -> quality gate -> exact dedup -> token
    * accounting, one declarative plan end to end. */
  private[graft] def qCurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.withQualityScore(t(s, dir, "documents"), "text")
    val gated = scored.filter(col("en_density") >= 0.05 && col("quality_score") >= 0.45)
    val deduped = TextOps.withFingerprints(gated, "text")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    val withTokens = TextOps.withTokenEstimate(deduped, "text")
    withTokens.agg(
      count(lit(1)).as("n_docs_kept"),
      sum(col("est_tokens")).as("total_est_tokens"),
      (sum(floor(col("quality_score") * 1000000 + 0.5).cast("long")) / 1000000.0 /
        count(lit(1))).as("mean_quality"))
  }

  /** Gopher-style duplicate n-gram fractions (k=2 and k=3). */
  private[graft] def qRepetition(s: SparkSession, dir: String): DataFrame =
    TextOps.withRepetition(
        TextOps.withRepetition(t(s, dir, "documents"), "text", 2), "text", 3)
      .select(col("doc_id"), col("n_2grams"), col("uniq_2grams"),
        col("dup_2gram_ratio"), col("n_3grams"), col("uniq_3grams"),
        col("dup_3gram_ratio"))
      .orderBy(col("doc_id"))

  /** PII scrub over documents with deterministically injected contact
    * lines (the raw corpus has none): count + redact, then fingerprint
    * the scrubbed text so the oracle verifies the REPLACEMENT output,
    * not just the counts. */
  private[graft] def qPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val withPii = t(s, dir, "documents").withColumn("text2",
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact u"), col("doc_id"), lit("@example.com now")))
        .when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" see https://example.org/d/"), col("doc_id"), lit(" page")))
        .otherwise(col("text")))
    TextOps.withPiiScrub(withPii, "text2")
      .select(col("doc_id"), col("n_emails"), col("n_urls"),
        md5(col("scrubbed").cast("binary")).as("scrub_fp"))
      .orderBy(col("doc_id"))
  }

  /** Incremental dedup: new documents are kept only if their content
    * fingerprint does not already exist in the PRIOR corpus (here the
    * doc_id % 5 == 0 subset) — the anti-join-on-digest shape every
    * continuously-ingesting curation pipeline runs per batch. The
    * shuffle carries 16-byte digests, never text. */
  private[graft] def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val prior = docs.filter(col("doc_id") % 5 === 0)
      .select(md5(col("text").cast("binary")).as("fp"))
      .distinct()
    docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("fp", md5(col("text").cast("binary")))
      .join(prior, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup clustering: Jaccard candidate pairs -> connected
    * components -> cluster label = min doc id (the kept representative).
    * Emits every clustered doc with its cluster and representative
    * flag; singleton docs (no near-dup) are not rows, by construction. */
  private[graft] def qDupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.dupClusters(
        Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", k = 5, minSim = 0.05),
        "d1", "d2", canonicalPairs = true)
      .select(col("node").as("doc_id"), col("label").as("cluster"),
        col("is_representative"))
      .orderBy(col("doc_id"))

  /** The dedup DECISION step: near-dup clusters keep their BEST member
    * (longest text, ties to the smaller doc_id) rather than the
    * arbitrary min-id — what a curation pipeline actually ships.
    * Composition of the clustering with an order-encoded argmax per
    * cluster; the encoding (n_chars·10⁹ + (10⁹−1−doc_id)) is the same
    * tie-free pair trick as q_arg_max, valid while doc_id < 10⁹.
    * Emits one row per cluster: the kept doc and the drop count. */
  private[graft] def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val clustered = Dedup.dupClusters(
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", k = 5, minSim = 0.05),
      "d1", "d2", canonicalPairs = true)
      .select(col("node").as("doc_id"), col("label").as("cluster"))
    clustered
      .join(t(s, dir, "documents").select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        max(col("n_chars") * 1000000000L + (lit(999999999L) - col("doc_id"))).as("enc"))
      .select(col("cluster"),
        (lit(999999999L) - col("enc") % 1000000000L).as("kept_doc"),
        expr("enc div 1000000000").as("kept_chars"),
        col("n_members"), (col("n_members") - 1).as("n_dropped"))
      .orderBy(col("cluster"))
  }

  /** N-gram decontamination: overlap of each doc's 5-gram shingles with
    * a small "benchmark" subset (doc_id % 97 == 0), benchmark side
    * broadcast. */
  private[graft] def qContamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.contamination(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "text", k = 5)
      .orderBy(col("doc_id"))
  }

  /** Concat-and-split sequence packing (the GPT-style pretraining batch
    * construction): documents are concatenated in doc_id order and
    * split into fixed 2048-token context windows; each doc reports its
    * global token offset, its window index, and whether it straddles a
    * window boundary. The token-offset prefix sum runs on
    * ScalablePrefix's two-pass range-partitioned path — the second
    * oracle-gated production use of that 100 TB formulation. */
  private[graft] def qPackWindows(s: SparkSession, dir: String): DataFrame = {
    val windowTokens = 2048L
    val base = TextOps.withTokenEstimate(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("est_tokens"))
    graft.ops.ScalablePrefix.runningSum(s, base, "doc_id", "est_tokens", numPartitions = 32)
      .select(col("doc_id"), col("est_tokens"),
        (col("run_sum") - col("est_tokens")).as("start_offset"),
        // integer `div`, not `/`: Column./ on longs is DOUBLE division,
        // which loses exactness past 2^53 total tokens
        expr(s"(run_sum - est_tokens) div $windowTokens").as("window_id"),
        (expr(s"(run_sum - est_tokens) div $windowTokens") =!=
          expr(s"(run_sum - 1) div $windowTokens")).as("crosses_boundary"))
      .orderBy(col("doc_id"))
  }

  private[graft] def qMultimodalMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.withMediaMeta(
        t(s, dir, "documents").withColumn("blob", encode(col("text"), "UTF-8")), "blob")
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("format"))
      .orderBy(col("doc_id"))

  /** Document chunking through the custom Generator (UDTF surface):
    * 64-token windows starting every 48 tokens (16-token overlap) —
    * the RAG/pretraining chunker as a streaming per-partition expand. */
  private[graft] def qChunking(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.chunking.chunk_document(TextOps.tokens(col("text")), 64, 16)
          .as(Seq("chunk_idx", "chunk", "n_chunk_tokens")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"), col("n_chunk_tokens").cast("long").as("n_chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Real container-header parsing, oracle-checked: synthesize a PNG /
    * JPEG / GIF header carrying doc_id-derived dimensions, parse it back
    * with the pure-JVM `image_dims` kernel, emit the parsed values. The
    * oracle replays the dimension arithmetic — a mismatch anywhere in
    * synthesis or parsing (endianness, offsets, segment walk) fails the
    * hash compare. */
  private[graft] def qMediaDims(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 512 + 16).cast("int").as("w_in"),
        ((col("doc_id") * 3) % 512 + 16).cast("int").as("h_in"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg").otherwise("gif").as("fmt_in"))
      .withColumn("blob",
        Multimodal.synthesizeHeader(col("fmt_in"), col("w_in"), col("h_in")))
      .select(col("doc_id"), graft.functions.media.image_dims(col("blob")).as("d"))
      .select(col("doc_id"), col("d.format").as("format"),
        col("d.width").cast("long").as("width"),
        col("d.height").cast("long").as("height"))
      .orderBy(col("doc_id"))

  /** Audio-container metadata extraction — the audio half of the
    * multimodal plumbing (q_media_dims covers images): REAL RIFF/WAVE
    * headers are synthesized from deterministic PCM parameters, parsed
    * back by the pure-JVM chunk walker (functions.media.audio_meta),
    * and duration is derived as exact integer ms. The oracle replays
    * the parameter arithmetic symbolically. */
  private[graft] def qAudioMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 2 + 1).cast("int").as("ch_in"),
        ((col("doc_id") % 5 + 1) * 8000).cast("int").as("rate_in"),
        lit(16).as("bits_in"),
        ((col("doc_id") % 100 + 1) * 1600).cast("long").as("frames_in"))
      .withColumn("blob", Multimodal.synthesizeWavHeader(
        col("ch_in"), col("rate_in"), col("bits_in"), col("frames_in")))
      .select(col("doc_id"), graft.functions.media.audio_meta(col("blob")).as("m"))
      .select(col("doc_id"),
        col("m.channels").cast("long").as("channels"),
        col("m.sample_rate").cast("long").as("sample_rate"),
        col("m.bits").cast("long").as("bits"),
        col("m.n_frames").as("n_frames"),
        expr("m.n_frames * 1000 div m.sample_rate").as("duration_ms"))
      .orderBy(col("doc_id"))

  /** Video-container metadata extraction — the third modality next to
    * q_media_dims (PNG/JPEG/GIF) and q_audio_meta (WAV): REAL RIFF/AVI
    * MainAVIHeader parsing (functions/Media.parseAvi) over containers
    * synthesized in pure column expressions from per-doc parameters.
    * The oracle replays the parameter arithmetic symbolically, so a
    * hash match proves synthesize∘parse = identity field-for-field;
    * clip duration is exact integer µs→ms. Per-row work, no shuffle
    * until the final sort. */
  private[graft] def qVideoMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        ((col("doc_id") % 8 + 1) * 160).cast("int").as("w_in"),
        ((col("doc_id") % 8 + 1) * 90).cast("int").as("h_in"),
        (col("doc_id") % 2 + 1).cast("int").as("streams_in"),
        ((col("doc_id") % 50 + 1) * 24).cast("long").as("frames_in"),
        when(col("doc_id") % 3 === 0, 33333L).otherwise(41667L)
          .as("uspf_in"))
      .withColumn("blob", Multimodal.synthesizeAviHeader(
        col("w_in"), col("h_in"), col("streams_in"), col("frames_in"),
        col("uspf_in")))
      .select(col("doc_id"), graft.functions.media.video_meta(col("blob")).as("m"))
      .select(col("doc_id"),
        col("m.width").cast("long").as("width"),
        col("m.height").cast("long").as("height"),
        col("m.streams").cast("long").as("streams"),
        col("m.n_frames").as("n_frames"),
        col("m.us_per_frame").as("us_per_frame"),
        expr("m.n_frames * m.us_per_frame div 1000").as("duration_ms"))
      .orderBy(col("doc_id"))

  /** Exact-k-per-group deterministic sampling (k=5 per language): the
    * eval-set construction primitive — rate-based sampling
    * (q_stratified_sample) cannot promise exactly k rows per stratum;
    * ranking a replayable 48-bit md5 key does. Runs on the two-pass
    * grouped rank (no per-language window funnel); the 48-bit key stays
    * below 2^53 so groupedRank's double order is exact. */
  private[graft] def qSampleK(s: SparkSession, dir: String): DataFrame = {
    val keyed = t(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 12), 16, 10)
          .cast("long").cast("double").as("h"))
    graft.ops.ScalablePrefix.groupedRank(s, keyed,
        groupCol = "lang", orderCol = "h", idCol = "doc_id", numPartitions = 32)
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("rnk"), col("doc_id"), col("grp_n"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** TF-IDF top terms per document with a LOG-FREE rational score:
    * score_fp = (tf * (N+1) * 10^6) div (df+1) — exact int64 arithmetic,
    * strictly monotone in tf and in -df like the classic tf·idf, and
    * bit-identical across engines (ln() differs by ULPs between libms,
    * so the standard formulation can't be hash-compared). Plan shape:
    * one explode + two aggregations (tf keyed by (doc,term), df keyed by
    * term) + a shuffle join on term — each stage partial-aggregates
    * map-side, nothing is ever collected. */
  private[graft] def qTfidf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .filter(col("doc_id") % 20 === 0)
      .withColumn("score_fp", expr("(tf * (n_docs + 1) * 1000000) div (df + 1)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score_fp").desc, col("term"))).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"), col("tf"),
        col("df"), col("score_fp"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Corpus length histogram via integer bucketing — the standard
    * pre-training length-distribution audit. Pure map + tiny agg. */
  private[graft] def qLengthHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(least(expr("n_chars div 200"), lit(15L)).as("bucket"),
        col("n_chars"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("bucket"))

  /** Fuzzy matching via edit distance (levenshtein is built-in and
    * integer-exact in both engines): each probe document against its
    * successor's 48-char prefix. The successor lookup is an EQUI-join on
    * doc_id+1 — doc ids are dense, so this replaces the global-window
    * `lead` (which would serialize into one partition) with a
    * partitionable join; the oracle uses the window form and must
    * agree. ratio_fp is the normalized distance in exact ppm. */
  private[graft] def qEditDistance(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 48).as("pfx"))
    val nxt = d.select((col("doc_id") - 1).as("a_id"), col("pfx").as("nxt"))
    d.filter(col("doc_id") % 5 === 0)
      .join(nxt, col("doc_id") === col("a_id"))
      .withColumn("dist", levenshtein(col("pfx"), col("nxt")).cast("long"))
      .withColumn("ratio_fp",
        expr("(dist * 1000000) div greatest(length(pfx), length(nxt))"))
      .select(col("doc_id"), col("dist"), col("ratio_fp"))
      .orderBy(col("doc_id"))
  }

  /** Domain-mixture sampling: per-source keep rates (upsample curated
    * domains, downsample bulk web — the pretraining mixture knob) via
    * the deterministic md5-hash Bernoulli gate, so the "random" sample
    * is replayable byte-for-byte by the oracle. A pure narrow filter:
    * no shuffle, no state, embarrassingly parallel at corpus scale. */
  private[graft] def qWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 90)
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 15)
      .otherwise(40)
    t(s, dir, "documents")
      .filter(
        conv(substring(md5(concat(lit("mix|"), col("doc_id").cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long") % 100 < rate)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Dataset-card accounting: documents and estimated tokens per source
    * with each source's exact share in ppm (integer arithmetic — no
    * float ratios). The grand total is a global window over the
    * PER-SOURCE AGGREGATE (one row per source), not over the corpus:
    * the scan + tokenization runs once, and the single-partition window
    * touches only the handful of post-agg rows. (A crossJoin with a
    * re-aggregated total would re-execute the whole heavy lineage —
    * partial-agg shapes differ, so ReuseExchange can't dedupe it.) */
  private[graft] def qSourceMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    TextOps.withTokenEstimate(t(s, dir, "documents"), "text")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("est_tokens")).as("toks"))
      .withColumn("total",
        sum(col("toks")).over(Window.partitionBy()))
      .select(col("source"), col("n_docs"), col("toks").as("est_tokens"),
        expr("(toks * 1000000) div total").as("share_ppm"))
      .orderBy(col("source"))
  }

  /** Negative-pair mining for contrastive training data: every doc
    * gets 3 deterministic pseudo-random negatives. Docs hash into 64
    * buckets (the replayable md5 convention); each anchor draws its
    * candidates from the NEXT bucket — different bucket ⇒ anchor ≠
    * negative by construction, and the candidate fan-out is bounded by
    * one bucket (~corpus/64) instead of the full corpus. Within the
    * candidate set, per-anchor selection ranks by a pair hash through
    * a row_number window PARTITIONED BY anchor — millions of anchor
    * keys hash-spread across executors, no funnel. The emitted triple
    * (anchor, negative, draw rank) replays bit-for-bit. */
  private[graft] def qNegatives(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        (h60(concat(lit("neg|"), col("doc_id").cast("string"))) % 64)
          .as("bucket"))
      .localCheckpoint(eager = false)
    val cands = docs.select(col("doc_id").as("neg_id"),
      col("bucket").as("nbucket"))
    val paired = docs
      .join(cands, (col("bucket") + 1) % 64 === col("nbucket"))
      .withColumn("ph",
        h60(concat(col("doc_id").cast("string"), lit("|"),
          col("neg_id").cast("string"))))
    paired
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("ph"), col("neg_id"))))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk").cast("long").as("rnk"), col("neg_id"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** Quality-classifier inference — the fastText-style model-scoring
    * step of a curation pipeline, with the MODEL AS DATA: a one-row
    * weight table cross-joined (broadcast) onto the corpus, so
    * swapping trained weights never changes the plan. Features are
    * cheap deterministic text statistics (words, digit chars, length
    * deviation from 500); the logit is an exact integer dot product in
    * milli units — ranking-stable, hash-comparable, no transcendental
    * sigmoid needed because the keep decision only needs the sign.
    * Emits per-source accounting: docs, kept docs, keep rate (ppm),
    * mean logit — the dataset-card row for the filter. */
  private[graft] def qQualityModel(s: SparkSession, dir: String): DataFrame = {
    val weights = s.range(1).select(
      lit(40L).as("w_words"), lit(-10L).as("w_digits"),
      lit(-2L).as("w_lendev"), lit(-1500L).as("bias"))
    val scored = t(s, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("words"),
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long")
          .as("digits"),
        abs(col("n_chars") - 500).as("lendev"))
      .crossJoin(broadcast(weights))
      .withColumn("logit_milli",
        col("w_words") * col("words") + col("w_digits") * col("digits") +
          col("w_lendev") * col("lendev") + col("bias"))
    scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("logit_milli") >= 0, 1L).otherwise(0L)).as("kept"),
        sum(col("logit_milli")).as("sum_logit"))
      .withColumn("keep_ppm", expr("kept * 1000000 div n_docs"))
      .withColumn("mean_logit",
        col("sum_logit").cast("double") / col("n_docs").cast("double"))
      .select(col("source"), col("n_docs"), col("kept"), col("keep_ppm"),
        col("mean_logit"))
      .orderBy(col("source"))
  }

  /** Sorted-neighborhood dedup blocking — the third blocking family
    * next to LSH buckets (q_minhash_pairs) and learned clusters
    * (q_semantic_dedup): sort the corpus by a cheap composite key
    * (lang, length, id) and compare each doc only to its w−1=3 sort
    * successors. Ranks come from the two-pass grouped rank per lang
    * (no global-window funnel); the sliding window is an equi-join on
    * rank+j — at 100 TB both sides range-partition on the same key, so
    * the neighbor join is co-partitioned and narrow. Emits candidate
    * pairs within a length tolerance of 5 chars — the candidate set a
    * real pipeline would hand to an exact verifier. */
  private[graft] def qSortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      t(s, dir, "documents")
        .select(col("lang"), col("n_chars").cast("double").as("ord"),
          col("doc_id")),
      "lang", "ord", "doc_id", 32)
      .select(col("lang"), col("doc_id"), col("rnk"), col("ord"))
      .localCheckpoint(eager = false)
    val offsets = s.range(1, 4).select(col("id").as("j"))
    ranked.as("a")
      .crossJoin(broadcast(offsets))
      .join(ranked.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.rnk") + col("j") === col("b.rnk"))
      .filter(abs(col("b.ord") - col("a.ord")) <= 5.0)
      .select(col("a.lang").as("lang"), col("a.doc_id").as("d1"),
        col("b.doc_id").as("d2"),
        (col("b.ord") - col("a.ord")).cast("long").as("len_diff"))
      .orderBy(col("lang"), col("d1"), col("d2"))
  }

  /** Small-files compaction planner — the lakehouse maintenance op:
    * assign files (docs standing in, n_chars as size) to target-sized
    * output bins by GREEDY SEQUENTIAL packing in id order, formulated
    * on the two-pass range-partitioned prefix sum: a file's bin is its
    * EXCLUSIVE cumulative size div the 4000-char target — no window
    * funnel, no driver-side loop, identical at any corpus size. Emits
    * the plan's bin manifest (files, bytes, id range per bin) — what a
    * compaction executor would consume. */
  private[graft] def qCompaction(s: SparkSession, dir: String): DataFrame = {
    val sized = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val summed = graft.ops.ScalablePrefix.runningSum(s, sized,
      keyCol = "doc_id", valueCol = "n_chars", numPartitions = 32)
    summed
      .withColumn("bin", expr("(run_sum - n_chars) div 4000"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bin_chars"),
        min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
      .orderBy(col("bin"))
  }

  /** Blocking-quality audit for the MinHash-LSH dedup path — the two
    * numbers an entity-resolution/dedup pipeline must report before
    * the blocking strategy is trusted (Christen's RR/PC metrics):
    * REDUCTION RATIO (how many of the all-pairs comparisons the
    * blocking avoided) and PAIRS COMPLETENESS (what fraction of true
    * near-dups — exact Jaccard >= 0.5 — the candidate set still
    * contains). Truth comes from the inverted-index exact join,
    * candidates from the 8-band LSH; the intersection is a semi-join
    * on the pair key. Everything lands in ONE row of exact longs/ppm;
    * the n_possible product is the only value that can exceed int64
    * (at ~10^9.5 docs — documented, not guarded). */
  private[graft] def qBlockingAudit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", k = 5, minSim = 0.5)
      .select(col("d1"), col("d2"))
      .localCheckpoint(eager = false)
    // one signature pass feeds the buckets AND the doc count (a doc has
    // a signature iff it has >= 1 shingle) — minhashCandidates would
    // recompute the signatures, and a shingleIndex count would re-explode
    // the corpus a third time
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text",
        k = 5, numHashes = 8)
      .localCheckpoint(eager = false)
    val buckets = Dedup.lshBuckets(sigs, "doc_id", numHashes = 8, rowsPerBand = 1)
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
      .localCheckpoint(eager = false)
    val nDocs = sigs.agg(count(lit(1)).as("n_docs"))
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    val nFound = truth.join(cand, Seq("d1", "d2"), "left_semi")
      .agg(count(lit(1)).as("true_found"))
    nDocs.crossJoin(broadcast(nTrue)).crossJoin(broadcast(nCand))
      .crossJoin(broadcast(nFound))
      .withColumn("n_possible", expr("n_docs * (n_docs - 1) div 2"))
      .select(col("n_docs"), col("n_possible"), col("n_true"),
        col("n_candidates"), col("true_found"),
        expr("(n_possible - n_candidates) * 1000000 div n_possible")
          .as("reduction_ppm"),
        expr("true_found * 1000000 div nullif(n_true, 0)")
          .as("completeness_ppm"))
  }

  /** MinHash sketch-accuracy probe — the q_recall_at_k discipline
    * applied to the dedup sketch: for every LSH candidate pair, the
    * SKETCH's Jaccard estimate (matching signature components / 8,
    * exact ppm) next to the EXACT shingle Jaccard, so the sketch's
    * variance is measured on real data instead of assumed from theory.
    * Signatures join back to the pair key (two narrow hash joins);
    * pairs whose shared shingles were all df-capped keep estimate > 0
    * and exact 0 — visible, not hidden (coalesce, left join). */
  private[graft] def qMinhashAccuracy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", k = 5, numHashes = 8)
      .localCheckpoint(eager = false)
    // candidates from the SAME checkpointed signatures (minhashCandidates
    // would recompute them from the corpus)
    val buckets = Dedup.lshBuckets(sigs, "doc_id", numHashes = 8, rowsPerBand = 1)
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
      // two consumers: the shared-count prune and the final join
      .localCheckpoint(eager = false)
    // Round-13 re-shape: exact Jaccard is computed ONLY for the sketch's
    // candidate pairs — the output left-joins exact onto candidates, so
    // restricting the truth computation to them is semantically
    // identical and prunes the shared-shingle pair stream BEFORE the
    // (d1, d2) aggregation (the query's dominant shuffle). The LSH
    // candidate frame is orders of magnitude smaller than the full
    // shared-shingle pair space, and AQE picks broadcast vs shuffled
    // semi-join from its measured size — the standard sketch-then-
    // exact-verify pipeline shape at any scale. (The old shape computed
    // the FULL truth table and discarded the non-candidate rows; the
    // floors probe measured that at 6.15x growth per 10x docs — a real
    // scale liability, not a fixed stage floor.)
    val shAll = Dedup.hashedIndex(docs, "doc_id", "text", 5)
      .repartition(col("sk"))
      .localCheckpoint(eager = false)
    val counts = shAll.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val hot = shAll.groupBy(col("sk")).agg(count(lit(1)).as("df"))
      .filter(col("df") > Dedup.DefaultMaxShingleDf).select(col("sk"))
    val sh = shAll.join(broadcast(hot), Seq("sk"), "left_anti")
    val exact = sh.as("a").join(sh.as("b"),
        col("a.sk") === col("b.sk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .join(cand, Seq("d1", "d2"), "left_semi")
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("shared"))
      .join(counts.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(counts.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jaccard",
        col("shared") / (col("n1") + col("n2") - col("shared")))
      .select(col("d1"), col("d2"), col("shared"), col("jaccard"))
    val a = sigs.select(col("doc_id").as("d1") +:
      (0 until 8).map(j => col(s"h$j").as(s"a$j")): _*)
    val b = sigs.select(col("doc_id").as("d2") +:
      (0 until 8).map(j => col(s"h$j").as(s"b$j")): _*)
    val estExpr = (0 until 8).map(j =>
      when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L)).reduce(_ + _)
    cand.join(a, "d1").join(b, "d2")
      .withColumn("est_matches", estExpr)
      .join(exact, Seq("d1", "d2"), "left")
      .select(col("d1"), col("d2"), col("est_matches"),
        (col("est_matches") * 125000L).as("est_ppm"),
        coalesce(col("shared"), lit(0L)).as("shared"),
        coalesce(col("jaccard"), lit(0.0)).as("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** Confusion-matrix evaluation of the n-gram lang-ID heuristic
    * against the corpus's labeled `lang` column, swept over three
    * density thresholds — the precision/recall/F1 curve every
    * curation classifier ships with. The density compare is kept in
    * integers (hits·1000 ≥ thr·tokens ⟺ density ≥ thr/1000), so the
    * whole query — matrix cells, precision, recall, F1, accuracy in
    * ppm — is exact int64 arithmetic end-to-end. One text scan fans
    * out ×3 thresholds AFTER reducing each doc to two small ints;
    * the shuffle carries (threshold, 4 longs). */
  private[graft] def qConfusion(s: SparkSession, dir: String): DataFrame = {
    val thr = s.range(1)
      .select(explode(array(lit(60L), lit(80L), lit(100L))).as("thr_milli"))
    val scored = TextOps.withLangId(t(s, dir, "documents"), "text")
      .select(col("en_hits").cast("long").as("en_hits"),
        col("n_tokens").cast("long").as("n_tokens"),
        (col("lang") === "en").as("actual"))
    scored.crossJoin(broadcast(thr))
      .withColumn("pred",
        col("en_hits") * 1000L >= col("thr_milli") * col("n_tokens"))
      .groupBy(col("thr_milli"))
      .agg(
        sum(when(col("pred") && col("actual"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("actual"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("actual"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("actual"), 1L).otherwise(0L)).as("tn"))
      .withColumn("precision_ppm",
        expr("CASE WHEN tp + fp > 0 THEN tp * 1000000 div (tp + fp) ELSE 0 END"))
      .withColumn("recall_ppm",
        expr("CASE WHEN tp + fn > 0 THEN tp * 1000000 div (tp + fn) ELSE 0 END"))
      .withColumn("f1_ppm",
        expr("CASE WHEN precision_ppm + recall_ppm > 0 THEN " +
          "2 * precision_ppm * recall_ppm div (precision_ppm + recall_ppm) " +
          "ELSE 0 END"))
      .withColumn("accuracy_ppm",
        expr("(tp + tn) * 1000000 div (tp + fp + fn + tn)"))
      .orderBy(col("thr_milli"))
  }

  /** Decile gains/lift table for the quality model — "if I keep only
    * the top-k% by score, what fraction of the good docs do I
    * capture?" — the curve that decides every corpus-budget cut.
    * Ranking rides the two-pass scalable global rank; decile
    * assignment, cumulative capture, and lift are exact integer
    * arithmetic; the cumulative window runs over 10 DECILE rows
    * (bounded by bucket count, not data). */
  private[graft] def qGains(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = t(s, dir, "documents")
      .select(col("doc_id"),
        qualityLogitMilli.as("logit_milli"),
        (col("n_chars") >= 200).as("label"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      scored.select(lit("all").as("g"),
        (lit(0L) - col("logit_milli")).cast("double").as("ord"), col("doc_id")),
      "g", "ord", "doc_id", 32)
    val n = scored.agg(count(lit(1)).as("n_total"),
      sum(when(col("label"), 1L).otherwise(0L)).as("pos_total"))
    val deciles = ranked
      .join(scored.select(col("doc_id"), col("label")), "doc_id")
      .crossJoin(broadcast(n))
      .withColumn("decile", expr("(rnk - 1) * 10 div n_total + 1"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
        max(col("n_total")).as("n_total"), max(col("pos_total")).as("pos_total"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciles
      .withColumn("cum_docs", sum(col("n_docs")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .withColumn("gain_ppm", expr("cum_pos * 1000000 div pos_total"))
      // lift runs on a DOUBLE tree (mirrored verbatim in the oracle):
      // the int64 form cum_pos*n_total*1e6 wraps past ~9e12 doc-scale
      // products — Spark would wrap silently where DuckDB errors, the
      // worst kind of engine divergence. Exact below 2^53 regardless.
      .withColumn("lift_ppm",
        floor(col("cum_pos").cast("double") * col("n_total").cast("double")
            * lit(1000000.0)
            / (col("cum_docs").cast("double") * col("pos_total").cast("double")))
          .cast("long"))
      .select(col("decile"), col("n_docs"), col("n_pos"), col("cum_docs"),
        col("cum_pos"), col("gain_ppm"), col("lift_ppm"))
      .orderBy(col("decile"))
  }

  /** Simplified silhouette per cluster (centroid form): a = L2² to
    * own centroid, b = min L2² to any other, s = (b−a)/max(a,b) —
    * the cluster-quality audit that tells you whether the learned
    * blocking keys (q_semantic_dedup) actually separate. Distances
    * are exact fixed-point longs (per-dimension floor at 1e9, the
    * q_kmeans convention), so assignment, margins, and the ppm
    * silhouette are all integer arithmetic; per-vector work is a
    * broadcast of 8 centroids — one linear pass, no shuffle until
    * the 8-row agg. */
  private[graft] def qSilhouette(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val dists = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        graft.functions.kernels.fixed_point_l2(col("embedding"), col("cv"))
          .as("d2"))
    val ranked = dists
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("best"),
        sort_array(collect_list(struct(col("d2"), col("cid")))).as("all"))
      .select(col("vec_id"), col("best.cid").as("cid"),
        col("best.d2").as("a2"),
        col("all")(1)("d2").as("b2"))
    val perVec = ranked
      .withColumn("s_ppm",
        when(greatest(col("a2"), col("b2")) > 0,
          expr("(b2 - a2) * 1000000 div greatest(a2, b2)"))
          .otherwise(lit(0L)))
    perVec.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("s_ppm")).as("sum_s_ppm"))
      .withColumn("mean_s_ppm", expr("sum_s_ppm div n_vecs"))
      .select(col("cid"), col("n_vecs"), col("mean_s_ppm"))
      .orderBy(col("cid"))
  }

  /** Per-label embedding centroid drift: exact fixed-point mean
    * vector per label, then pairwise squared L2 between centroids —
    * the cohort-drift screen that catches a class whose embedding
    * distribution moved (new scraper, new preprocessing) before it
    * poisons training. Dimension explosion shuffles (label, dim,
    * fp) longs — never float vectors; means truncate to micro grain
    * so centroid-difference squares stay in int64 at any corpus
    * size; the 45-pair join runs on the 640-row centroid table. */
  private[graft] def qEmbedDrift(s: SparkSession, dir: String): DataFrame = {
    val dims = t(s, dir, "embeddings")
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")))
      .select(col("label"), col("pos").cast("long").as("dim"),
        floor(col("col").cast("double") * 1e9 + 0.5).cast("long").as("v_fp"))
    val means = dims.groupBy(col("label"), col("dim"))
      .agg(expr("CAST(sum(v_fp) AS BIGINT) div count(1)").as("mean_fp"))
      .withColumn("mean_u", expr("mean_fp div 1000"))
      .localCheckpoint(eager = false)
    means.as("a").join(means.as("b"),
        col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("l1"), col("b.label").as("l2"))
      .agg(sum((col("a.mean_u") - col("b.mean_u")) *
        (col("a.mean_u") - col("b.mean_u"))).as("d2_micro"))
      .orderBy(col("l1"), col("l2"))
  }

  /** Flesch-Kincaid grade level per document from three integer
    * counts — words (token count), sentences ([.!?] RUNS via the
    * replace-single-minus-replace-empty length trick, so "?!" is one
    * boundary), syllables (vowel-group runs, the standard cheap
    * approximation). The grade is one fixed double tree over exact
    * ints shipped as milli-points; pure per-row codegen'd
    * expressions, zero shuffle before the final sort. */
  private[graft] def qReadability(s: SparkSession, dir: String): DataFrame = {
    val lowered = lower(col("text"))
    val words = greatest(lit(1L), size(split(col("text"), " ")).cast("long"))
    val sentences = greatest(lit(1L),
      (length(regexp_replace(col("text"), "[.!?]+", "S")) -
        length(regexp_replace(col("text"), "[.!?]+", ""))).cast("long"))
    val syllables = greatest(lit(1L),
      (length(regexp_replace(lowered, "[aeiouy]+", "V")) -
        length(regexp_replace(lowered, "[aeiouy]+", ""))).cast("long"))
    t(s, dir, "documents")
      .select(col("doc_id"), words.as("words"), sentences.as("sentences"),
        syllables.as("syllables"))
      .withColumn("fk_milli",
        floor((lit(0.39) * (col("words").cast("double") / col("sentences").cast("double")) +
          lit(11.8) * (col("syllables").cast("double") / col("words").cast("double")) -
          lit(15.59)) * 1000 + 0.5).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** LSH band-geometry sweep: candidate volume and truth recall at
    * rowsPerBand ∈ {1,2,4} from ONE checkpointed signature table —
    * the parameter-tuning audit behind every MinHash deployment (more
    * rows per band ⇒ fewer, higher-precision candidates; the sweep
    * shows exactly what each setting trades). Truth is the exact-
    * Jaccard join via the LOSSLESS prefix filter (jaccardPairsPrefix:
    * same answer as the plain candidate join, >100× fewer candidate
    * pairs to verify); each geometry is just a different band/sig
    * projection of the SAME signatures — the corpus is shingled
    * once. */
  private[graft] def qLshSweep(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val truth = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", k = 5,
        minSim = 0.5)
      .select(col("d1"), col("d2"))
      .localCheckpoint(eager = false)
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", k = 5,
      numHashes = 8)
      .localCheckpoint(eager = false)
    // Candidate sets NEST across the sweep: a pair agreeing on a 4-row
    // band agrees on both contained 2-row bands and all four 1-row
    // bands, so candidates(r=4) ⊆ candidates(r=2) ⊆ candidates(r=1).
    // Hence ONE bucket self-join at r=1 generates the superset, the
    // signatures ride along on both sides, and the r=2 / r=4
    // memberships are per-row band-equality flags — no second
    // self-join, no union, no distinct-per-config. Identical counts to
    // the three independent bucket joins, one shuffle instead of
    // three.
    // r=1 buckets with the signature riding along — a narrow explode
    // over the checkpointed signature table (NOT lshBuckets + join
    // back on doc_id, which would re-shuffle the exploded rows)
    val withSig = sigs.select((col("doc_id") +:
        explode(array((0 until 8).map(b =>
          struct(lit(b).as("band"), col(s"h$b").as("sig"))): _*)).as("bs") +:
        (0 until 8).map(j => col(s"h$j"))): _*)
      .select((col("doc_id") +: col("bs.band").as("band") +:
        col("bs.sig").as("sig") +: (0 until 8).map(j => col(s"h$j"))): _*)
    val cand = withSig.as("a").join(withSig.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select((col("a.doc_id").as("d1") +: col("b.doc_id").as("d2") +:
        (0 until 4).map(bb =>
          (col(s"a.h${2 * bb}") === col(s"b.h${2 * bb}") &&
            col(s"a.h${2 * bb + 1}") === col(s"b.h${2 * bb + 1}"))
            .as(s"eq2_$bb"))): _*)
      .groupBy(col("d1"), col("d2"))
      // collapse bucket-collision multiplicity (the old distinct) and
      // fold the band flags: hit2 = any aligned 2-run equal, hit4 =
      // either 4-run equal (= both its 2-runs equal)
      .agg(max(col("eq2_0")).as("e0"), max(col("eq2_1")).as("e1"),
        max(col("eq2_2")).as("e2"), max(col("eq2_3")).as("e3"))
      .withColumn("hit2", col("e0") || col("e1") || col("e2") || col("e3"))
      .withColumn("hit4", (col("e0") && col("e1")) || (col("e2") && col("e3")))
      .join(truth.withColumn("t", lit(1L)), Seq("d1", "d2"), "left")
      .withColumn("t", coalesce(col("t"), lit(0L)))
      .localCheckpoint(eager = false)
    val perR = cand.agg(
      count(lit(1)).as("c1"), sum(col("t")).as("f1"),
      sum(when(col("hit2"), 1L).otherwise(0L)).as("c2"),
      sum(when(col("hit2"), col("t")).otherwise(0L)).as("f2"),
      sum(when(col("hit4"), 1L).otherwise(0L)).as("c4"),
      sum(when(col("hit4"), col("t")).otherwise(0L)).as("f4"))
    import s.implicits._
    Seq(1L, 2L, 4L).toDF("r")
      .crossJoin(broadcast(perR))
      .select(col("r").as("rows_per_band"),
        (lit(8L) / col("r")).cast("long").as("n_bands"),
        when(col("r") === 1, col("c1")).when(col("r") === 2, col("c2"))
          .otherwise(col("c4")).as("n_candidates"),
        when(col("r") === 1, col("f1")).when(col("r") === 2, col("f2"))
          .otherwise(col("f4")).as("n_found"))
      .select(col("rows_per_band"), col("n_bands"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_found"), lit(0L)).as("n_found"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
      .withColumn("recall_ppm",
        expr("CASE WHEN n_true > 0 THEN n_found * 1000000 div n_true ELSE 0 END"))
      .select(col("rows_per_band"), col("n_bands"), col("n_candidates"),
        col("n_found"), col("recall_ppm"))
      .orderBy(col("rows_per_band"))
  }

  /** Distribution-free order-statistic CI for the median order value
    * per nation: the binomial rank bracket [⌊(n−1.96√n)/2⌋,
    * ⌈(n+1.96√n)/2⌉+1] selects two data values that cover the true
    * median at ~95% — no normality, no bootstrap replicas. Rank
    * selection rides the two-pass scalable grouped rank; the rank
    * endpoints are floor/ceil of a fixed double tree (√ correctly
    * rounded), everything else exact integers. */
  private[graft] def qMedianCi(s: SparkSession, dir: String): DataFrame = {
    val vals = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey").as("ok"),
        Analytics.cents(col("o_totalprice")).as("v"))
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      vals.select(col("n_name"), col("v").cast("double").as("ord"), col("ok")),
      "n_name", "ord", "ok", 32)
      .localCheckpoint(eager = false)
    // the rank bracket derives per ROW from grp_n (same IEEE tree on
    // the same values, so identical endpoints) — no per-group count
    // agg + broadcast join back
    val nD = col("grp_n").cast("double")
    ranked
      .withColumn("lo_rank", greatest(lit(1L),
        floor((nD - lit(1.96) * sqrt(nD)) / lit(2.0)).cast("long")))
      .withColumn("hi_rank", least(col("grp_n"),
        ceil((nD + lit(1.96) * sqrt(nD)) / lit(2.0)).cast("long") + 1L))
      .withColumn("med_rank", expr("(grp_n + 1) div 2"))
      .filter(col("rnk") === col("lo_rank") ||
        col("rnk") === col("med_rank") || col("rnk") === col("hi_rank"))
      .groupBy(col("n_name"))
      .agg(max(col("grp_n")).as("n"),
        max(when(col("rnk") === col("lo_rank"), col("ord"))).cast("long")
          .as("ci_lo_cents"),
        max(when(col("rnk") === col("med_rank"), col("ord"))).cast("long")
          .as("median_cents"),
        max(when(col("rnk") === col("hi_rank"), col("ord"))).cast("long")
          .as("ci_hi_cents"))
      .orderBy(col("n_name"))
  }

  /** Log-likelihood keyness (G²) of words in the English subcorpus
    * vs the rest — the corpus-linguistics keyword extractor (what
    * makes THIS slice lexically distinctive), the statistically
    * grounded upgrade over raw TF-IDF deltas. Word counts are exact
    * longs from one token shuffle; each word's G² is a per-row
    * double tree over integer ratios shipped as micro-nats; top-20
    * by (G², word) is a TakeOrdered, not a global sort. */
  private[graft] def qKeyness(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select((col("lang") === "en").as("is_en"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = toks.groupBy(col("w"))
      .agg(sum(when(col("is_en"), 1L).otherwise(0L)).as("o1"),
        sum(when(!col("is_en"), 1L).otherwise(0L)).as("o2"))
      .filter(col("o1") + col("o2") >= 10)
      .localCheckpoint(eager = false)
    val tots = counts.agg(sum(col("o1")).as("r1"), sum(col("o2")).as("r2"))
    def term(o: String, r: String): org.apache.spark.sql.Column = {
      // each factor casts to double BEFORE the multiply (oracle
      // mirrors): o*(r1+r2) as int64 wraps once per-word counts times
      // total tokens pass 2^63 (~1e6 * 1e13 at corpus scale) — Spark
      // wraps silently, DuckDB errors, and log(ratio) goes NaN
      val ratio = (col(o).cast("double") * (col("r1") + col("r2")).cast("double")) /
        (col(r).cast("double") * (col("o1") + col("o2")).cast("double"))
      when(col(o) > 0, col(o).cast("double") * log(ratio)).otherwise(lit(0.0))
    }
    counts.crossJoin(broadcast(tots))
      .withColumn("g2_unat",
        floor(lit(2.0) * (term("o1", "r1") + term("o2", "r2")) * 1000000 + 0.5)
          .cast("long"))
      .select(col("w"), col("o1"), col("o2"), col("g2_unat"))
      .orderBy(col("g2_unat").desc, col("w"))
      .limit(20)
  }

  /** Cronbach's alpha over three cheap length-family quality items
    * (words, chars/10, 10·sentence-runs) — the internal-consistency
    * audit for any multi-item score: if alpha is low the items don't
    * measure one construct and summing them is meaningless. Item and
    * total variances come from exact integer moments in ONE pass;
    * alpha = k/(k−1)·(1 − Σvarᵢ/var_total) is a fixed double tree
    * with the k=3 item variances pivoted into one row. */
  private[graft] def qCronbach(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "documents")
      .select(
        size(split(col("text"), " ")).cast("long").as("s1"),
        expr("n_chars div 10").as("s2"),
        ((length(regexp_replace(col("text"), "[.!?]+", "S")) -
          length(regexp_replace(col("text"), "[.!?]+", ""))).cast("long") *
          10L).as("s3"))
      .withColumn("tot", col("s1") + col("s2") + col("s3"))
    val m = items.agg(count(lit(1)).as("n"),
      sum(col("s1")).as("a1"), sum(col("s1") * col("s1")).as("q1"),
      sum(col("s2")).as("a2"), sum(col("s2") * col("s2")).as("q2"),
      sum(col("s3")).as("a3"), sum(col("s3") * col("s3")).as("q3"),
      sum(col("tot")).as("at"), sum(col("tot") * col("tot")).as("qt"))
    def v(q: String, a: String): org.apache.spark.sql.Column = {
      val nD = col("n").cast("double")
      (nD * col(q).cast("double") - col(a).cast("double") * col(a).cast("double")) /
        (nD * (nD - lit(1.0)))
    }
    m.withColumn("alpha",
        (lit(3.0) / lit(2.0)) *
          (lit(1.0) - (v("q1", "a1") + v("q2", "a2") + v("q3", "a3")) /
            v("qt", "at")))
      .select(col("n"), col("alpha"))
  }

  /** Simpson's-paradox detector: the quantity→price association per
    * nation vs pooled — a nation whose slope SIGN flips against the
    * pooled slope is the classic aggregation trap that breaks naive
    * fleet-level conclusions. Slope signs compare the exact integer
    * OLS numerator n·Σxy − ΣxΣy (no division, no doubles), per
    * group and pooled; dollar grain keeps the pooled product in
    * int64. */
  private[graft] def qSimpsons(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("l_quantity").cast("long").as("x"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) div 100")
          .as("y"))
      .localCheckpoint(eager = false)
    val perNation = li.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
      .withColumn("num_own", col("n") * col("sxy") - col("sx") * col("sy"))
    val pooled = li.agg(count(lit(1)).as("np"), sum(col("x")).as("sxp"),
        sum(col("y")).as("syp"), sum(col("x") * col("y")).as("sxyp"))
      .withColumn("num_pooled",
        col("np") * col("sxyp") - col("sxp") * col("syp"))
      .select(col("num_pooled"))
    perNation.crossJoin(broadcast(pooled))
      .withColumn("reversed",
        (col("num_own") > 0 && col("num_pooled") < 0) ||
          (col("num_own") < 0 && col("num_pooled") > 0))
      .select(col("n_name"), col("n"), col("num_own"), col("num_pooled"),
        col("reversed"))
      .orderBy(col("n_name"))
  }

  /** Boilerplate detection by cross-document sentence frequency: a
    * sentence appearing in ≥5 DISTINCT docs is boilerplate (nav
    * bars, license blurbs, scraper artifacts) — the line-level
    * counterpart to q_paragraph_dedup's token-window chunks. One
    * sentence explode, one distinct-doc df shuffle on md5-sized
    * keys, then the per-source boilerplate CHARACTER share in exact
    * ppm — the number a cleaning pass reports before stripping. */
  private[graft] def qBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val sents = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), "\\. ")).as("sent"))
      .filter(length(col("sent")) > 20)
      .localCheckpoint(eager = false)
    val df = sents.groupBy(col("sent"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
    sents.join(df, "sent")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("doc_freq") >= 5, 1L).otherwise(0L)).as("n_boiler"),
        sum(length(col("sent")).cast("long")).as("total_chars"),
        sum(when(col("doc_freq") >= 5, length(col("sent")).cast("long"))
          .otherwise(0L)).as("boiler_chars"))
      .withColumn("boiler_char_ppm",
        expr("boiler_chars * 1000000 div total_chars"))
      .select(col("source"), col("n_sentences"), col("n_boiler"),
        col("boiler_char_ppm"))
      .orderBy(col("source"))
  }

  /** Tokenizer fertility per language: estimated BPE tokens per
    * whitespace word — the multilingual budget planner (a language
    * with 2× fertility costs 2× the context window for the same
    * text; the number that decides per-language sampling weights).
    * Reuses q_token_estimate's (len+3)/4 sub-word estimate; sums
    * are exact longs, fertility and chars-per-token exact ppm. */
  private[graft] def qFertility(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("words"),
        aggregate(transform(split(col("text"), " "),
            w => floor((length(w) + lit(3)).cast("double") / lit(4.0))
              .cast("long")),
          lit(0L), (a, v) => a + v).as("est_tokens"))
    toks.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("words")).as("total_words"),
        sum(col("est_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("fertility_ppm",
        expr("total_tokens * 1000000 div total_words"))
      .withColumn("chars_per_token_ppm",
        expr("total_chars * 1000000 div total_tokens"))
      .select(col("lang"), col("n_docs"), col("total_words"),
        col("total_tokens"), col("fertility_ppm"),
        col("chars_per_token_ppm"))
      .orderBy(col("lang"))
  }

  /** Curriculum staging: docs bucketed into 4 difficulty stages by
    * Flesch-Kincaid quartile (easy → hard), with the per-stage token
    * budget — the ordering table a curriculum-learning schedule
    * consumes. Difficulty ranks ride the scalable global rank;
    * stages are exact integer quartiles; per-stage token sums are
    * exact longs. */
  private[graft] def qCurriculum(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        greatest(lit(1L), size(split(col("text"), " ")).cast("long"))
          .as("words"),
        greatest(lit(1L),
          (length(regexp_replace(col("text"), "[.!?]+", "S")) -
            length(regexp_replace(col("text"), "[.!?]+", ""))).cast("long"))
          .as("sents"),
        greatest(lit(1L),
          (length(regexp_replace(lower(col("text")), "[aeiouy]+", "V")) -
            length(regexp_replace(lower(col("text")), "[aeiouy]+", "")))
            .cast("long")).as("syls"))
      .withColumn("fk_milli",
        floor((lit(0.39) * (col("words").cast("double") / col("sents").cast("double")) +
          lit(11.8) * (col("syls").cast("double") / col("words").cast("double")) -
          lit(15.59)) * 1000 + 0.5).cast("long"))
      .localCheckpoint(eager = false)
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      scored.select(lit("all").as("g"),
        col("fk_milli").cast("double").as("ord"), col("doc_id")),
      "g", "ord", "doc_id", 32)
    // the single group's size IS grp_n on every row — no global agg +
    // crossJoin round-trip
    ranked
      .withColumn("stage", expr("(rnk - 1) * 4 div grp_n + 1"))
      .join(scored.select(col("doc_id"), col("words"), col("fk_milli")),
        "doc_id")
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("fk_milli")).as("fk_min_milli"),
        max(col("fk_milli")).as("fk_max_milli"),
        sum(col("words")).as("total_words"))
      .withColumn("mean_words", expr("total_words div n_docs"))
      .orderBy(col("stage"))
  }

  /** Local Outlier Factor (k=3) within IVF buckets, exact integers
    * end-to-end: fixed-point L2² pairwise distances INSIDE each
    * centroid bucket (the LSH-style scale move — never all-pairs),
    * k-distance by rank, reachability = max(d, kdist(o)), lrd as a
    * 1e18-scaled integer reciprocal, LOF in exact ppm. The density-
    * aware outlier score that catches points q_embed_outliers'
    * global-distance screen misses (a point can be near the global
    * mean yet alone in its neighborhood). Top-20 by LOF via
    * TakeOrdered. */
  private[graft] def qLof(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
      .select(col("vec_id"), col("cid"))
    val vecs = emb.join(assign, "vec_id")
      .select(col("cid"), col("vec_id"), col("embedding"))
      .localCheckpoint(eager = false)
    // round-12 re-shape: filter rnk <= 3 BEFORE the checkpoint so
    // InferWindowGroupLimit turns the ranking into a per-partition
    // top-3 heap (partial + final) and the checkpoint materializes
    // 3 rows per point, not every in-bucket pair — the checkpoint
    // used to sit between the window and the filter, blocking both
    val top3 = vecs.as("a").join(vecs.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.cid").as("cid"), col("a.vec_id").as("p"),
        col("b.vec_id").as("o"),
        graft.functions.kernels.fixed_point_l2(col("a.embedding"),
          col("b.embedding")).as("d2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("p")).orderBy(col("d2"), col("o"))))
      .filter(col("rnk") <= 3)
      .localCheckpoint(eager = false)
    val kdist = top3.filter(col("rnk") === 3)
      .select(col("p").as("o"), col("d2").as("kdist_o"))
    val neighbors = top3
      .join(kdist, "o")
      .withColumn("reach", greatest(col("d2"), col("kdist_o")))
    val lrd = neighbors.groupBy(col("cid"), col("p"))
      .agg(sum(col("reach")).as("sum_reach"))
      .filter(col("sum_reach") > 0)
      // cap keeps sum_lrd_o·1e6 in int64 even for near-duplicate points
      .withColumn("lrd",
        expr("least(3 * 1000000000000000000 div sum_reach, 1000000000000)"))
      .localCheckpoint(eager = false)
    neighbors.select(col("p"), col("o"))
      .join(lrd.select(col("p").as("o"), col("lrd").as("lrd_o")), "o")
      .groupBy(col("p"))
      .agg(sum(col("lrd_o")).as("sum_lrd_o"))
      .join(lrd.select(col("cid"), col("p"), col("lrd")), "p")
      .withColumn("lof_ppm", expr("sum_lrd_o * 1000000 div (3 * lrd)"))
      .select(col("cid"), col("p").as("vec_id"), col("lof_ppm"))
      .orderBy(col("lof_ppm").desc, col("vec_id"))
      .limit(20)
  }

  /** k-NN classifier evaluation (k=3, IVF-bucketed): majority label
    * of the 3 nearest in-bucket neighbors vs the true label, per-
    * class accuracy in exact ppm — the "is this embedding space even
    * label-separable" sanity check before training anything on it.
    * Votes are integer counts; the majority pick is rank-1 by
    * (votes desc, label) — deterministic ties; distances reuse the
    * q_lof fixed-point pairwise kernel inside buckets only. */
  private[graft] def qKnnEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
      .select(col("vec_id"), col("cid"))
    val vecs = emb.join(assign, "vec_id")
      .select(col("cid"), col("vec_id"), col("embedding"),
        col("label").cast("long").as("label"))
      .localCheckpoint(eager = false)
    val neighbors = vecs.as("a").join(vecs.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("p"), col("b.vec_id").as("o"),
        col("b.label").as("label_o"),
        graft.functions.kernels.fixed_point_l2(col("a.embedding"),
          col("b.embedding")).as("d2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("p")).orderBy(col("d2"), col("o"))))
      .filter(col("rnk") <= 3)
    val votes = neighbors.groupBy(col("p"), col("label_o"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(
        Window.partitionBy(col("p")).orderBy(col("votes").desc, col("label_o"))))
      .filter(col("vr") === 1)
      .select(col("p").as("vec_id"), col("label_o").as("pred"))
    votes.join(vecs.select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L))
          .as("correct"))
      .withColumn("acc_ppm", expr("correct * 1000000 div n"))
      .orderBy(col("label"))
  }

  /** EXACT per-group median without a per-group sort task: rank
    * selection on the two-pass grouped rank. The median of n values is
    * the mean of the values at 1-based ranks (n+1)/2 and (n+2)/2 —
    * when n is odd both formulas name the SAME rank, so the filter
    * keeps one row and the count-based mean below divides by 1, which
    * is why the aggregate divides by count(*) rather than a literal
    * 2 — selecting those ranks from
    * groupedRank's output turns the "sort each group through one task"
    * median into two narrow scans plus a 2-row-per-group aggregate.
    * Values are integer cents carried as exact doubles, so the final
    * mean-of-two and /100 are the only float ops, identical in both
    * engines; the oracle uses the window row_number formulation. */
  private[graft] def qMedianScalable(s: SparkSession, dir: String): DataFrame = {
    val ranked = graft.ops.ScalablePrefix.groupedRank(s,
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          Analytics.cents(col("o_totalprice")).cast("double").as("c"),
          col("o_orderkey")),
      groupCol = "o_orderpriority", orderCol = "c", idCol = "o_orderkey",
      numPartitions = 32)
    ranked
      .filter(col("rnk") === expr("(grp_n + 1) div 2") ||
        col("rnk") === expr("(grp_n + 2) div 2"))
      .groupBy(col("o_orderpriority"))
      .agg((sum(col("ord")) / count(lit(1)) / 100.0).as("median_price"),
        max(col("grp_n")).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Chunk-level (paragraph) dedup — the composition of the chunking
    * Generator with digest dedup: documents are split into overlapping
    * token windows, each chunk is fingerprinted, fingerprints occurring
    * in more than one chunk mark their chunks as duplicated, and each
    * document reports its duplicated-chunk ratio in exact ppm. The
    * shuffle carries 16-byte digests (never chunk text), and the
    * occurrence count joins back on the same digest key. */
  private[graft] def qParagraphDedup(s: SparkSession, dir: String): DataFrame = {
    val chunks = t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.chunking.chunk_document(TextOps.tokens(col("text")), 64, 16)
          .as(Seq("chunk_idx", "chunk", "n_chunk_tokens")))
      .select(col("doc_id"), md5(col("chunk").cast("binary")).as("fp"))
    val occ = chunks.groupBy(col("fp")).agg(count(lit(1)).as("n_occ"))
    chunks.join(occ, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        expr("(n_dup_chunks * 1000000) div n_chunks").as("dup_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Sub-document (containment) duplication: asymmetric |A∩B|/|A| over
    * the shared-shingle candidate pairs — catches a short document
    * quoted inside a long one, which symmetric Jaccard scores near
    * zero. Same inverted-index join as q_jaccard_pairs (no all-pairs;
    * df skew guard on). */
  private[graft] def qContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 5, minContain = 0.2)
      .select(col("d1"), col("d2"), col("shared"), col("n1"), col("n2"),
        col("contain_in_1"), col("contain_in_2"))
      .orderBy(col("d1"), col("d2"))

  /** BM25 retrieval scoring (log-free rational idf — same trick as the
    * rational TF-IDF): top-50 documents for a 3-term query. tf/dl are
    * per-row array expressions over one scan, corpus stats (N, Σdl,
    * df) one tiny broadcast aggregate, per-term contributions 1e-6
    * fixed-point longs so the cross-term sum is order-independent, and
    * the emit is TakeOrderedAndProject. */
  private[graft] def qBm25(s: SparkSession, dir: String): DataFrame =
    graft.llm.Ranking.bm25(t(s, dir, "documents"), "doc_id", "text", Bm25Terms)
      .select(col("doc_id"), col("dl"), col("tf_0"), col("tf_1"), col("tf_2"),
        col("score_fp"), col("score"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(50)

  /** The prefix-filtered Jaccard join (AllPairs/PPJoin candidate
    * reduction, Dedup.jaccardPairsPrefix) — identical answer to the
    * plain inverted-index join, which is exactly what the oracle runs:
    * the optimization is answer-transparent. Candidate volume drops
    * from Σ df² over all shingles to the per-doc rarest-prefix index,
    * and boilerplate hot shingles sort LAST so they fall out of every
    * prefix — the skew guard emerges from the algorithm instead of a
    * tuning knob. */
  private[graft] def qJaccardPrefix(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairsPrefix(t(s, dir, "documents"), "doc_id", "text",
        k = 5, minSim = 0.05)
      .select(col("d1"), col("d2"), col("shared"), col("n1"), col("n2"),
        col("jaccard"))
      .orderBy(col("d1"), col("d2"))

  /** Dataset-card dedup accounting: per-source exact-duplicate rate in
    * ppm — the number every corpus datasheet reports next to the
    * source mix. One digest aggregation (the shuffle carries 16-byte
    * md5 digests, never text), then counts per source; a corpus-wide
    * total rides along via unionAll. */
  private[graft] def qDedupRate(s: SparkSession, dir: String): DataFrame = {
    val digests = t(s, dir, "documents")
      .select(col("source"), md5(col("text").cast("binary")).as("d"))
    def rate(df: DataFrame, label: org.apache.spark.sql.Column): DataFrame =
      df.groupBy(label.as("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("d")).as("n_unique"))
        .withColumn("dup_ppm",
          expr("(n_docs - n_unique) * 1000000 div n_docs"))
    rate(digests, col("source"))
      .unionAll(rate(digests, lit("__all__")))
      .orderBy(col("source"))
  }

  /** Unigram-rarity scoring — the log-free surprisal proxy that ranks
    * documents by how unusual their vocabulary is (the cheap
    * perplexity stand-in a quality filter runs before any model): mean
    * inverse document frequency of the doc's token occurrences, in
    * exact 1e6 fixed point. The df table joins on the token key as a
    * plain shuffle join (a corpus-scale vocabulary need not be
    * broadcastable); the corpus size is ONE broadcast scalar. */
  private[graft] def qRarity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tok = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val dfTab = tok.select(col("tok"), col("doc_id")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("nd"))
    tok.join(dfTab, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(expr("(nd * 1000000) div df")).as("sum_micro"))
      .select(col("doc_id"), col("n_tokens"),
        expr("sum_micro div n_tokens").as("mean_idf_micro"))
      .orderBy(col("doc_id"))
  }

  /** First BPE merge-table round over the document corpus: word
    * frequencies (the one corpus-wide scan+shuffle tokenizer training
    * ever pays), then adjacent character-pair counts weighted by word
    * frequency — the argmax of this table is the first merge of a BPE
    * tokenizer (Sennrich et al., ACL 2016). The full iterative trainer
    * (TextOps.bpeTrain) replays this per round over the collapsed
    * vocabulary only; this query pins round 1 against the oracle. */
  private[graft] def qBpePairs(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextOps.bpePairCounts(
      graft.llm.TextOps.wordFreq(t(s, dir, "documents"), "text")
        .select(graft.llm.TextOps.charSymbols(col("w")).as("syms"), col("freq")))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(30)

  /** Distributed Lloyd's k-means over the embedding corpus (k=8, one
    * update round from the deterministic lowest-id seed), then the
    * final assignment summarized per cluster with the learned first
    * coordinate as a model checksum. The corpus never shuffles — the
    * k × dim model moves by broadcast, assignment argmax is a
    * map-side-combining aggregate, and the update reduces (cid, dim)
    * partial sums (Clustering.lloyd). Oracle = the same round unrolled
    * in SQL over the same fixed-point arithmetic. */
  private[graft] def qKmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = graft.llm.Clustering.lloyd(emb, "vec_id", "embedding", k = 8, rounds = 1)
    graft.llm.Clustering.assign(emb, "vec_id", "embedding", cents)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), min(col("vec_id")).as("min_vec"))
      .join(broadcast(cents.select(col("cid"), element_at(col("cf"), 1).as("c0_fp"))), "cid")
      .orderBy(col("cid"))
  }

  /** Semantic deduplication (SemDeDup-style, cf. Abbas et al. 2023):
    * k-means clusters become LEARNED blocking keys, and near-duplicate
    * cosine pairs are mined only within a cluster — q_embed_near_dup's
    * blocking with the label column replaced by the model's own
    * geometry, so the pair join stays linear in cluster size with no
    * labeled data. Composes Clustering.lloyd/assign with
    * Similarity.nearDupPairs unchanged. */
  private[graft] def qSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = graft.llm.Clustering.lloyd(emb, "vec_id", "embedding", k = 8, rounds = 1)
    val assigned = emb
      .join(graft.llm.Clustering.assign(emb, "vec_id", "embedding", cents), "vec_id")
    Similarity.nearDupPairs(assigned, "vec_id", "embedding", "cid", minSim = 0.35)
      .orderBy(col("v1"), col("v2"))
  }

  /** Embedding outlier screen (out-of-distribution filter): the 20
    * vectors whose best similarity to ANY learned centroid is lowest —
    * far from every cluster ⇒ likely noise/OOD, the curation
    * counterpart of q_semantic_dedup's "too close" pairs. One scored
    * assignment pass (broadcast model, map-side argmax), then a
    * bounded TakeOrdered — no window, no second scan. */
  private[graft] def qEmbedOutliers(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = graft.llm.Clustering.lloyd(emb, "vec_id", "embedding", k = 8, rounds = 1)
    graft.llm.Clustering.assignScored(emb, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("d").as("best_d"))
      .orderBy(col("best_d"), col("vec_id"))
      .limit(20)
  }

  /** Product-quantization ADC search: 64-dim vectors compress to 8
    * per-subspace codes against a deterministic sub-centroid codebook
    * (the 16 lowest-id vectors' slices); the query scores candidates
    * through the broadcast lookup table WITHOUT touching the original
    * vectors — the memory-bound path of IVF-PQ ANN at billion-vector
    * scale (q_ivf_search supplies the bucketing half). Top-10 by exact
    * integer ADC score. */
  private[graft] def qPqAdc(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = Similarity.subVectors(emb.filter(col("vec_id") < 16), "embedding", 8, 8)
      .select(col("s"), col("vec_id").as("cid"), col("sub").as("csub"))
    val codes = Similarity.pqAssign(emb, "vec_id", "embedding", cents, 8, 8)
    val lut = Similarity.subVectors(emb.filter(col("vec_id") === 0), "embedding", 8, 8)
      .select(col("s"), col("sub").as("qsub"))
      .join(cents, "s")
      .select(col("s"), col("cid"), Similarity.dotFp(col("qsub"), col("csub")).as("d"))
    Similarity.pqAdcScores(codes, "vec_id", lut)
      .orderBy(col("adc_fp").desc, col("vec_id"))
      .limit(10)
  }

  /** PMI-style collocation extraction: bigram lift = p(w1 w2) /
    * (p(w1) p(w2)) over the token stream — the corpus statistic behind
    * phrase induction ("new york" as one token) in tokenizer/vocab
    * pipelines. Counts are exact longs from one bigram shuffle and one
    * unigram shuffle; the unigram table rides back broadcast; the score
    * is one fixed tree of double ops (monotone transform of log-PMI, so
    * ranking-equivalent and bit-portable). Minimum-count gates kill the
    * long noise tail before the join. */
  private[graft] def qPmi(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents").select(split(col("text"), " ").as("tk"))
    // both count tables are materialized ONCE (lazy checkpoint): uni
    // feeds the totals and two broadcast joins, bcnt the totals and
    // the main pass — unmaterialized, each consumer replays the
    // documents scan + explode + aggregate (the qItemsets convention)
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val bi = toks.select(explode(graft.llm.TextOps.adjacentPairs(col("tk"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cab"))
      .localCheckpoint(eager = false)
    val totals = uni.agg(sum(col("c")).as("t_tokens"))
      .crossJoin(bi.agg(sum(col("cab")).as("t_bigrams")))
    bi.filter(col("cab") >= 5)
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), "w2")
      .crossJoin(broadcast(totals))
      .filter(col("c1") >= 10 && col("c2") >= 10)
      .select(col("w1"), col("w2"), col("cab"), col("c1"), col("c2"),
        ((col("cab").cast("double") * col("t_tokens").cast("double")
          * col("t_tokens").cast("double")) /
         (col("t_bigrams").cast("double") * col("c1").cast("double")
          * col("c2").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(25)
  }

  /** Source-mixture token-budget allocation: given per-source mixture
    * weights, split a token budget into per-source targets and emit the
    * sampling rate (ppm, capped at 1 — no upsampling) that realizes
    * each target, plus an undersupply flag where the source simply
    * lacks the tokens. The planning step of "hit this data mixture" in
    * LLM pre-training runs; one aggregate over the corpus, then pure
    * integer arithmetic on the per-source table. */
  private[graft] def qTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("tokens"))
      .withColumn("w", substring(col("source"), 4, 10).cast("long") % 4 + 1)
    val tw = src.agg(sum(col("w")).as("total_w"))
    src.crossJoin(broadcast(tw))
      .select(col("source"), col("tokens"), col("w"),
        expr("10000 * w div total_w").as("target_tokens"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("target_tokens * 1000000 div tokens")))
      .withColumn("expected_tokens", expr("tokens * rate_ppm div 1000000"))
      .withColumn("undersupplied", col("tokens") < col("target_tokens"))
      .orderBy(col("source"))
  }

  /** Bigram-LM fluency scoring: each document's mean conditional
    * probability P(w2|w1) over its bigrams, in exact ppm — the
    * corpus-statistics fluency screen (low mean ⇒ token soup), the
    * conditional cousin of q_rarity's unigram surprisal. Bigram and
    * unigram counts come from two aggregations; the per-doc score joins
    * bigram occurrences against the count tables on the bigram key
    * (shuffle join — corpus-scale vocabulary, NOT broadcast) and
    * reduces with one integer mean per doc. */
  private[graft] def qNgramLm(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
    val bi = toks.select(col("doc_id"),
        explode(graft.llm.TextOps.adjacentPairs(col("tk"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .localCheckpoint(eager = false)
    val bcnt = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
    val ucnt = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    bi.join(bcnt, Seq("w1", "w2")).join(ucnt, Seq("w1"))
      .select(col("doc_id"), expr("cab * 1000000 div c1").as("cond_ppm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(cond_ppm) div count(1)").as("mean_cond_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Zipf rank–frequency diagnostic over the token distribution: for
    * the top-20 tokens, rank × frequency — near-constant under Zipf's
    * law, so drift in the product flags a skewed/degenerate corpus
    * (boilerplate floods, template spam) without any log/regression
    * fit. One token aggregation, a bounded top-k, integer products. */
  private[graft] def qZipf(s: SparkSession, dir: String): DataFrame = {
    val freq = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(20)
    import org.apache.spark.sql.expressions.Window
    // 20 rows: the window is a formality, not a funnel
    freq.withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("w"))).cast("long"))
      .select(col("rank"), col("w"), col("freq"),
        (col("rank") * col("freq")).as("rank_x_freq"))
      .orderBy(col("rank"))
  }

  /** Gini–Simpson diversity of the corpus source mix: 1 − Σ(nᵢ/N)² and
    * the inverse-Simpson "effective source count" — the dataset-card
    * diversity number next to q_source_mix's shares. Exact integer
    * arithmetic end to end (one tiny aggregation over per-source
    * counts); Σnᵢ² stays far inside int64 at any driver SF. */
  private[graft] def qGini(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    src.agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_sources"),
        sum(col("n") * col("n")).as("ss"))
      .select(col("n_docs"), col("n_sources"),
        expr("(n_docs * n_docs - ss) * 1000000 div (n_docs * n_docs)")
          .as("gini_ppm"),
        expr("n_docs * n_docs * 1000 div ss").as("effective_sources_milli"))
  }

  /** Temperature-scaled training-mixture allocation (τ = 0.5): a
    * source's sampling weight ∝ sqrt(its token count) — the standard
    * up-weighting of small sources when composing a pre-training data
    * epoch — then a 1-billion-token budget is apportioned by largest
    * remainder, so per-source allocations are exact integers that sum
    * to the budget. sqrt of an exact int64 is correctly-rounded IEEE
    * in both engines; everything downstream is int64. The windows run
    * over the per-source AGGREGATE — cardinality is the source
    * catalog (20 here), a bounded dimension independent of corpus
    * size, so the single-partition window is scale-safe. */
  private[graft] def qEpochMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 1000000000L
    val bySrc = t(s, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tk"))
      .groupBy(col("source")).agg(sum(col("tk")).as("tokens"))
      .withColumn("sc", floor(sqrt(col("tokens").cast("double"))).cast("long"))
    val all = Window.partitionBy()
    bySrc
      .withColumn("tot", sum(col("sc")).over(all))
      .withColumn("base", expr(s"($budget * sc) div tot"))
      .withColumn("frac", expr(s"($budget * sc) % tot"))
      .withColumn("short", lit(budget) - sum(col("base")).over(all))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("frac").desc, col("source"))).cast("long"))
      .select(col("source"), col("tokens"),
        expr("(1000000 * sc) div tot").as("weight_ppm"),
        (col("base") + when(col("rn") <= col("short"), 1L).otherwise(0L))
          .as("alloc_tokens"))
      .orderBy(col("source"))
  }

  /** Multinomial naive-Bayes trainer for the language label: ONE
    * token-explode scan materializes the (class, token) count table
    * (a localCheckpoint — |V|×|classes| rows, independent of corpus
    * row count), and the per-class token totals and vocabulary size
    * are derived FROM that table (Σc per class; distinct-token count)
    * rather than re-exploding the corpus. The model row is the
    * add-1-smoothed conditional in exact ppm,
    * `(c+1)·10⁶ div (T+|V|)`, beside the class prior. Top-5 tokens
    * per class via a window whose input is the vocabulary-sized count
    * table, not the corpus. Class-total and vocab frames are
    * broadcast (≤ |classes| and 1 row). */
  private[graft] def qNaiveBayes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("lang"),
      explode(TextOps.tokens(col("text"))).as("token"))
    val tc = toks.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val classTot = tc.groupBy(col("lang")).agg(sum(col("c")).as("t"))
    val vocab = tc.select(col("token")).distinct().agg(count(lit(1)).as("v"))
    val priors = docs.groupBy(col("lang")).agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("ntot"))))
      .select(col("lang"), expr("(1000000 * nd) div ntot").as("prior_ppm"))
    tc.join(broadcast(classTot), "lang")
      .crossJoin(broadcast(vocab))
      .withColumn("p_ppm", expr("((c + 1) * 1000000) div (t + v)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("c").desc, col("token"))).cast("long"))
      .filter(col("rn") <= 5)
      .join(broadcast(priors), "lang")
      .select(col("lang"), col("rn"), col("token"), col("c"),
        col("p_ppm"), col("prior_ppm"))
      .orderBy(col("lang"), col("rn"))
  }

  /** SimHash near-dup candidate pairs through 4×8-bit band buckets:
    * docs sharing any band of their 32-bit fingerprint meet in a
    * bucket-equi-join (never all-pairs), and by pigeonhole a pair
    * within hamming ≤ 3 differs in at most 3 of the 4 bands, so
    * banding has EXACT recall at that radius — the sub-quadratic
    * candidate shape that keeps simhash dedup viable at corpus scale.
    * The fingerprint frame materializes once and fans into the four
    * band projections; the bucket join carries only (id, fp, key). */
  private[graft] def qSimhashHamming(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.simhash32(t(s, dir, "documents"), "doc_id", "text")
      .localCheckpoint(eager = false)
    val bands = (0 until 4).map { b =>
      sh.select(col("doc_id"), col("simhash32"), lit(b).as("band"),
        expr(s"(simhash32 div ${1L << (8 * b)}) % 256").as("key"))
    }.reduce(_ union _)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        expr("bit_count(x.simhash32 ^ y.simhash32)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("d1"), col("d2"))
  }

  /** Higher-order array-function sweep — lambda expressions evaluated
    * inside whole-stage codegen, no UDF: filter (long-token count),
    * aggregate (char total and sum of squared lengths via transform),
    * exists / forall (membership and case audit), and array_sort +
    * slice rendered to a string. Pure per-row map over a pruned scan;
    * zero shuffle. */
  private[graft] def qHofFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
      .withColumn("tk", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        expr("size(filter(tk, t -> length(t) > 4))").cast("long").as("n_long"),
        expr("aggregate(tk, CAST(0 AS BIGINT), (a, t) -> a + length(t))")
          .as("total_chars"),
        expr("aggregate(transform(tk, t -> CAST(length(t) * length(t) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x)").as("sum_sq"),
        expr("exists(tk, t -> t = 'spark')").as("has_spark"),
        expr("forall(tk, t -> t = lower(t))").as("all_lower"),
        expr("array_join(slice(array_sort(tk), 1, 3), ',')").as("first3"))
      .orderBy(col("doc_id"))

  /** Positional explode (the ordinal-generator surface): token with its
    * 0-based position, bounded to the first 10 per document — the
    * oracle replays ordinality via generate_series ≤ len. */
  private[graft] def qPosexplode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .filter(col("pos") < 10)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("token"))
      .orderBy(col("doc_id"), col("pos"))

  /** Per-document content-defined chunking profile (TextOps.cdcChunks,
    * mask 16): chunk count, largest chunk, and total tokens — the
    * storage-layout audit run before chunk-level dedup. One explode →
    * per-doc window → two aggregations; every stage keyed by doc. */
  private[graft] def qCdcChunks(s: SparkSession, dir: String): DataFrame =
    TextOps.cdcChunks(t(s, dir, "documents"), "doc_id", "text")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("n_toks")).as("max_chunk"),
        sum(col("n_toks")).as("total_toks"))
      .orderBy(col("doc_id"))

  /** Chunk-level storage dedup ratio per source: distinct chunk hashes
    * over total chunks (ppm) — what CDC chunking would save if each
    * chunk were stored once. The distinct runs on 16-byte md5 chunk
    * identities, never chunk text, keyed by (source, hash). */
  private[graft] def qChunkDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextOps.cdcChunks(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("total_chunks"),
        countDistinct(col("chunk_hash")).as("uniq_chunks"))
      .select(col("source"), col("total_chunks"), col("uniq_chunks"),
        expr("(1000000 * uniq_chunks) div total_chunks").as("dedup_ppm"))
      .orderBy(col("source"))
  }

  /** Reciprocal-rank fusion (k = 60) of two document rankings — by
    * length and by distinct-token count — the standard way to combine
    * retrieval signals without score calibration. BOTH ranks come from
    * the two-pass range-partitioned rank (ScalablePrefix.groupedRank),
    * not a single-task global window, and the fused score is exact
    * integer: 10⁹ div (60 + r₁) + 10⁹ div (60 + r₂). Top-25 via
    * TakeOrderedAndProject. */
  private[graft] def qRrf(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "documents")
      .select(col("doc_id"), lit("all").as("g"),
        col("n_chars").cast("double").as("len_ord"),
        size(array_distinct(TextOps.tokens(col("text"))))
          .cast("double").as("uniq_ord"))
      .localCheckpoint(eager = false)
    // round-13 re-shape (the q_spearman stacking trick): both rankings
    // ride ONE groupedRank range pass under an axis-tag group key, and
    // the doc_id join collapses to a pivot aggregate.
    val stacked = m.select(lit("l").as("ax"), (-col("len_ord")).as("o"),
        col("doc_id"))
      .unionAll(m.select(lit("u").as("ax"), (-col("uniq_ord")).as("o"),
        col("doc_id")))
    graft.ops.ScalablePrefix.groupedRank(s, stacked,
        groupCol = "ax", orderCol = "o", idCol = "doc_id",
        numPartitions = 32)
      .groupBy(col("doc_id"))
      .agg(max(when(col("ax") === "l", col("rnk"))).as("rank_len"),
        max(when(col("ax") === "u", col("rnk"))).as("rank_uniq"))
      .select(col("doc_id"), col("rank_len"), col("rank_uniq"),
        expr("1000000000 div (60 + rank_len) + 1000000000 div (60 + rank_uniq)")
          .as("rrf_fp"))
      .orderBy(col("rrf_fp").desc, col("doc_id")).limit(25)
  }

  /** Per-source dataset card — the datasheet a curation run publishes
    * beside a corpus: volume (docs, tokens, chars), language spread
    * (count + plurality language), and the within-source exact-dup
    * rate (1 − distinct md5 / docs, in ppm). One corpus scan feeds
    * both aggregates; the plurality-language rank runs over the
    * (source × lang) table — catalog-bounded, not corpus-sized. */
  private[graft] def qSourceCard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val base = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("est_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(md5(col("text").cast("binary"))).as("uniq_texts"),
        sum(col("n_chars")).as("chars"))
    val top = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("ln"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("ln").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    base.join(broadcast(top), "source")
      .select(col("source"), col("n_docs"), col("est_tokens"),
        col("n_langs"), col("top_lang"),
        expr("(1000000 * (n_docs - uniq_texts)) div n_docs").as("dup_ppm"),
        expr("chars div n_docs").as("mean_chars"))
      .orderBy(col("source"))
  }

  /** Matryoshka-truncation retrieval audit: for each query vector, the
    * top-10 neighbor set by FULL 64-dim cosine vs by the FIRST-16-DIM
    * prefix cosine, reporting the overlap — the acceptance test run
    * before serving truncated embeddings (MRL-style) to cut index cost
    * 4×. Both rankings use the broadcast-query + per-query
    * stratifiedTopN shape (no global sort, no all-pairs); the overlap
    * join carries only (qid, vec_id) pairs. */
  private[graft] def qMatryoshkaEval(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id").isin(0, 7, 42))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def topIds(proj: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val scored = emb.crossJoin(broadcast(queries))
        .select(col("qid"), col("vec_id"),
          lpad(greatest(lit(0L),
              floor((lit(1.0) - Similarity.cosineFp(proj(col("embedding")),
                proj(col("qv")))) * 1e9 + 0.5).cast("long")).cast("string"),
            12, "0").as("distkey"))
      graft.ops.Sampling.stratifiedTopN(s, scored, "qid", "distkey", "vec_id", n = 10)
        .select(col("qid"), col("vec_id"))
    }
    topIds(identity).as("f")
      .join(topIds(v => slice(v, 1, 16)).as("tr"),
        col("f.qid") === col("tr.qid") && col("f.vec_id") === col("tr.vec_id"))
      .groupBy(col("f.qid").cast("long").as("qid"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("qid"), col("n_overlap"),
        expr("(1000000 * n_overlap) div 10").as("overlap_ppm"))
      .orderBy(col("qid"))
  }

  /** Cross-source shingle overlap — the train/eval separation audit at
    * source granularity: per source, how many of its distinct 5-gram
    * shingles also occur in ANOTHER source (shared_ppm high = the
    * source adds little novel text). Shape: distinct (source, shingle)
    * pairs → shingle spread count → per-source aggregate; the shuffle
    * key is the shingle, the same inverted-index discipline as
    * jaccardPairs (never all-pairs of sources). */
  private[graft] def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // shuffle discipline: 8-byte xxhash64 shingle keys, never the
    // shingle strings (jaccardPairs convention — the oracle counts the
    // strings; a 64-bit collision is the accepted 2^-64 risk)
    val ss = Dedup.shingleIndex(docs, "doc_id", "text", k = 5)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), xxhash64(col("s")).as("s")).distinct()
      .localCheckpoint(eager = false)
    // round-13 re-shape (the q_novelty trick): n_shared = n_shingles −
    // n_exclusive, and an exclusive shingle's one source is min(source)
    // in the per-shingle aggregate — two bounded-output aggregations
    // replace the full (source, shingle) ⋈ spread re-join exchange.
    val perSrc = ss.groupBy(col("source")).agg(count(lit(1)).as("n_shingles"))
    val excl = ss.groupBy(col("s"))
      .agg(count(lit(1)).as("nsrc"), min(col("source")).as("source"))
      .filter(col("nsrc") === 1)
      .groupBy(col("source")).agg(count(lit(1)).as("n_excl"))
    perSrc.join(excl, Seq("source"), "left")
      .select(col("source"), col("n_shingles"),
        (col("n_shingles") - coalesce(col("n_excl"), lit(0L))).as("n_shared"))
      .withColumn("shared_ppm", expr("(1000000 * n_shared) div n_shingles"))
      .orderBy(col("source"))
  }

  /** Array set algebra between each document and its successor
    * (doc_id + 1 equi-join, the dense-id contract pinned in
    * QueriesSpec): intersection / union cardinalities and the token
    * Jaccard in exact ppm — order-free set measures, so the engines'
    * different array orderings can't skew the hash gate. */
  private[graft] def qArraySetOps(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        array_distinct(TextOps.tokens(col("text"))).as("tk"))
    docs.as("a")
      .join(docs.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"),
        size(expr("array_intersect(a.tk, b.tk)")).cast("long").as("n_common"),
        size(expr("array_union(a.tk, b.tk)")).cast("long").as("n_union"),
        size(expr("array_except(a.tk, b.tk)")).cast("long").as("n_only_left"))
      .withColumn("jaccard_ppm", expr("(1000000 * n_common) div n_union"))
      .filter(col("doc_id") % 10 === 0)
      .orderBy(col("doc_id"))
  }

  /** In-batch negative collision audit for contrastive training:
    * vectors land in deterministic md5 batches of ~n/16, and within a
    * batch every same-label pair is a FALSE negative if used as an
    * in-batch negative. Per batch: member count, same-label pairs
    * (Σ C(c,2) over label groups), all pairs C(n,2), and the
    * collision rate in ppm — the audit run before trusting in-batch
    * sampling. Two bounded aggregates; no pair materialization. */
  private[graft] def qInbatchNegatives(s: SparkSession, dir: String): DataFrame = {
    val b = t(s, dir, "embeddings")
      .select((h60(concat(lit("b|"), col("vec_id").cast("string"))) % 16)
        .as("batch"), col("label"))
    val byLabel = b.groupBy(col("batch"), col("label"))
      .agg(count(lit(1)).as("c"))
    byLabel.groupBy(col("batch"))
      .agg(sum(col("c")).as("n"),
        sum(expr("c * (c - 1) div 2")).as("same_label_pairs"))
      .select(col("batch"), col("n"), col("same_label_pairs"),
        expr("n * (n - 1) div 2").as("all_pairs"),
        expr("(1000000 * same_label_pairs) div (n * (n - 1) div 2)")
          .as("collision_ppm"))
      .orderBy(col("batch"))
  }

  /** Quality-filter calibration sweep: for every threshold decile of
    * the composite quality score, the documents and tokens that would
    * survive "keep score ≥ t" — the curve consulted before committing
    * a filter threshold (keep X% of tokens ↔ threshold t). One scored
    * scan into 11 buckets, then a reverse cumulative over the bucket
    * table (bounded at 11 rows by construction). */
  private[graft] def qFilterSweep(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextOps.withQualityScore(t(s, dir, "documents"), "text")
      .select(floor(col("quality_score") * 10).cast("long").as("bucket"),
        col("n_tokens").cast("long").as("toks"))
    val buckets = scored.groupBy(col("bucket"))
      .agg(count(lit(1)).as("docs"), sum(col("toks")).as("toks"))
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    buckets
      .withColumn("kept_docs", sum(col("docs")).over(w))
      .withColumn("kept_tokens", sum(col("toks")).over(w))
      .withColumn("total_tokens", sum(col("toks")).over(all))
      .select(col("bucket").as("threshold_decile"), col("kept_docs"),
        col("kept_tokens"),
        expr("(1000000 * kept_tokens) div total_tokens").as("kept_ppm"))
      .orderBy(col("threshold_decile"))
  }

  /** Jensen-Shannon divergence of each source's language mix vs the
    * REST of the corpus — the symmetric, bounded drift score for
    * mixture monitoring (KL alone, q_entropy, explodes on
    * missing-language zeros; JSD's midpoint m=(p+q)/2 never does).
    * Each of the ≤10 terms per source is p·ln(2p/(p+q)) rounded to
    * integer micro-nats FIRST, so the reported 2·JSD is a sum of
    * integers (order-independent; the ÷2 is left to the reader —
    * integer halving of a possibly-odd negative total floor/truncates
    * differently across engines). Counts collapse to the (source,
    * lang) grid map-side; nothing data-sized crosses the shuffle. */
  private[graft] def qJsd(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val grid = docs.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
    val bySrc = grid.groupBy(col("source")).agg(sum(col("n")).as("n_s"))
    val byLang = grid.groupBy(col("lang")).agg(sum(col("n")).as("g_l"))
    val total = grid.agg(sum(col("n")).as("g")).select(col("g"))
    // full (source × lang) frame so zero-count cells contribute their
    // q-side term: rest-of-corpus still has the language
    val frame = bySrc.crossJoin(byLang)
      .join(grid, Seq("source", "lang"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(total))
      .withColumn("r_l", col("g_l") - col("n"))
      .withColumn("rest", col("g") - col("n_s"))
    val termed = frame.select(col("source"), col("n_s"),
      expr("""CAST(floor(CASE WHEN n > 0 THEN
              |  (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE)) *
              |  ln(2.0 * (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE)) /
              |     (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE) + CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)))
              |  * 1000000 ELSE 0.0 END + 0.5) AS BIGINT)""".stripMargin).as("tp"),
      expr("""CAST(floor(CASE WHEN r_l > 0 THEN
              |  (CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)) *
              |  ln(2.0 * (CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)) /
              |     (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE) + CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)))
              |  * 1000000 ELSE 0.0 END + 0.5) AS BIGINT)""".stripMargin).as("tq"))
    termed.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"),
        sum(col("tp") + col("tq")).as("jsd_x2_micro"))
      .orderBy(col("source"))
  }

  /** Unicode canonicalization — the text-normalization step every
    * multilingual dedup pipeline needs BEFORE hashing (NFC and NFD
    * spellings of the same text md5 to different digests, silently
    * splitting duplicate clusters; Spark ships no normalizer at all):
    * accented forms are synthesized from nation names in BOTH engines
    * (precomposed via translate; decomposed via combining-mark
    * replace), then the native [[graft.functions.NfcNormalize]] /
    * [[graft.functions.StripAccents]] kernels (JDK Normalizer) are
    * checked against DuckDB's independent utf8proc implementations
    * (`nfc_normalize` / `strip_accents`). */
  private[graft] def qUnicodeNorm(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.kernels
    val base = lower(col("n_name"))
    // precomposed (NFC) accent injection; translate is code-point-wise
    val accented = translate(base, "aeiou", "áéíöü")
    // the SAME text decomposed (NFD): base letter + combining mark
    val decomposed = Seq("a" -> "á", "e" -> "é", "i" -> "í",
      "o" -> "ö", "u" -> "ü")
      .foldLeft(base) { case (c, (from, to)) => regexp_replace(c, from, to) }
    t(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        accented.as("accented"),
        kernels.nfc_normalize(decomposed).as("recomposed"),
        kernels.strip_accents(accented).as("stripped"))
      .withColumn("roundtrip_ok", col("recomposed") === col("accented"))
      .orderBy(col("n_nationkey"))
  }

  /** Good-Turing frequency smoothing over the corpus vocabulary:
    * r* = (r+1)·N_{r+1}/N_r for r = 1..10 from the token
    * frequency-of-frequencies — the open-vocabulary mass estimate
    * (r*=1's N_1/N is the unseen-token probability) every n-gram LM
    * pipeline needs. The corpus collapses to term frequencies once;
    * the N_r table is vocabulary-of-counts sized (tiny at any scale),
    * so the r↔r+1 join is a broadcast no-op. Exact integer milli
    * throughout; rows where N_{r+1}=0 drop (r* undefined there). */
  private[graft] def qGoodTuring(s: SparkSession, dir: String): DataFrame = {
    val freq = trigrams(s, dir)
      .groupBy(col("g")).agg(count(lit(1)).as("r"))
    val fof = freq.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
      .localCheckpoint(eager = false)
    fof.as("a")
      .join(broadcast(fof.as("b")), col("a.r") + 1 === col("b.r"))
      .filter(col("a.r") <= 10)
      .select(col("a.r").as("r"), col("a.n_r").as("n_r"),
        col("b.n_r").as("n_next"))
      .withColumn("r_star_milli", expr("(r + 1) * n_next * 1000 div n_r"))
      .orderBy(col("r"))
  }

  /** Heaps'-law vocabulary-growth curve: distinct token types seen by
    * each tenth of the corpus (doc_id order). The scalable trick is
    * that vocab(≤d) needs no per-checkpoint distinct pass — each
    * type's FIRST document position determines every checkpoint it
    * counts toward, so one min-reduce per token plus a cumulative sum
    * over the 10-row checkpoint domain answers all checkpoints at
    * once. The sublinearity audit behind "will more data keep adding
    * vocabulary". */
  private[graft] def qHeaps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = t(s, dir, "documents").agg(count(lit(1)).as("d_total"))
    val first = trigrams(s, dir)
      .groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
    val bucketed = first.crossJoin(broadcast(total))
      .select(expr("((first_doc + 1) * 10 + d_total - 1) div d_total")
        .as("checkpoint"))
      .groupBy(col("checkpoint")).agg(count(lit(1)).as("new_types"))
    // 10 checkpoint rows: the window is a formality, not a funnel
    bucketed.crossJoin(broadcast(total))
      .withColumn("vocab_cum",
        sum(col("new_types")).over(Window.orderBy(col("checkpoint"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("checkpoint"),
        expr("d_total * checkpoint div 10").as("docs_cum"),
        col("new_types"), col("vocab_cum"))
      .orderBy(col("checkpoint"))
  }

  /** Dedup-threshold calibration sweep: candidate pairs and docs
    * dropped at each Jaccard threshold 0.50/0.60/0.70/0.80/0.90, all
    * from ONE exact-Jaccard candidate-pair table (the inverted-index
    * join — never all-pairs). The decide-the-threshold audit a dedup
    * pipeline runs before committing to a similarity cut, sibling to
    * q_filter_sweep's quality-threshold sweep. Dropped docs = distinct
    * higher-id members of qualifying pairs (the keep-lowest-id rule). */
  private[graft] def qDedupSweep(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 5, minSim = 0.05)
      .localCheckpoint(eager = false)
    // round-13: a histogram re-shape (collapse each pair to its max
    // qualifying threshold index, suffix-sum two ≤10-row histograms)
    // was tried and REJECTED by measurement — TimeQ min-of-5 1.02 s
    // (this shape) vs 1.17 s (histogram shape): at bench scale the
    // candidate-pair table is small enough that the 9× fanout is
    // cheaper than the extra aggregation stages. Kept as-is.
    val thresholds = s.range(1, 10).select((col("id") * 100000).as("thr_ppm"))
    // exact rational qualification: shared/(n1+n2-shared) >= thr as an
    // integer cross-multiply — no double ever decides a boundary pair
    val q = col("shared") * 1000000 >=
      col("thr_ppm") * (col("n1") + col("n2") - col("shared"))
    pairs.crossJoin(broadcast(thresholds))
      .groupBy(col("thr_ppm"))
      .agg(sum(when(q, 1L).otherwise(0L)).as("n_pairs"),
        countDistinct(when(q, col("d2"))).as("docs_dropped"))
      .orderBy(col("thr_ppm"))
  }

  /** Embedding-norm audit: per-label L2-norm profile (mean in exact
    * fixed point, min/max) plus degenerate-vector counts — the data-
    * quality gate before any cosine math is trusted (zero or tiny
    * norms poison similarity search silently). Norms are exact
    * fixed-point integers via the same 1e-9 per-term quantization the
    * similarity stack uses; one label-keyed reduce, no shuffle of the
    * vectors themselves beyond it. */
  private[graft] def qVectorNorms(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("label").cast("long").as("label"),
        graft.functions.kernels.fixed_point_dot(col("embedding"),
          col("embedding")).as("nrm_fp"))
    emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("nrm_fp")).as("sum_nrm_fp"),
        min(col("nrm_fp")).as("min_nrm_fp"),
        max(col("nrm_fp")).as("max_nrm_fp"),
        sum(when(col("nrm_fp") < 10000000L, 1L).otherwise(0L))
          .as("degenerate"))
      .select(col("label"), col("n"),
        expr("sum_nrm_fp div n").as("mean_nrm_fp"),
        col("min_nrm_fp"), col("max_nrm_fp"), col("degenerate"))
      .orderBy(col("label"))
  }

  /** Per-source corpus novelty: the share of each source's trigram
    * TYPES that appear in no other source — near-zero novelty means
    * the source is redundant with the rest of the corpus (mirror
    * scrapes, syndication), novelty ≈ 1 means it contributes unique
    * text. Type-level source counts collapse the corpus once; a type
    * is exclusive when its distinct-source count is 1. Exact ppm. */
  private[graft] def qNovelty(s: SparkSession, dir: String): DataFrame = {
    val typed = t(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(tk) - 2), " +
          "i -> array_join(slice(tk, i, 3), ' '))")).as("g"))
      .distinct()
      .localCheckpoint(eager = false)
    // round-13 re-shape (guide §2.3/§2.4): the old shape joined the
    // full (source, type) table back against the per-type spread —
    // one extra full-width exchange of the type table. An exclusive
    // type (n_sources = 1) is ATTRIBUTABLE to its unique source via
    // min(source) inside the same per-type aggregate, so per-source
    // exclusive counts fall out of two aggregations whose outputs are
    // both bounded by the source domain — the big join never happens.
    val types = typed.groupBy(col("source")).agg(count(lit(1)).as("types"))
    val excl = typed.groupBy(col("g"))
      .agg(count(lit(1)).as("n_sources"), min(col("source")).as("source"))
      .filter(col("n_sources") === 1)
      .groupBy(col("source")).agg(count(lit(1)).as("excl"))
    types.join(excl, Seq("source"), "left")
      .select(col("source"), col("types"),
        coalesce(col("excl"), lit(0L)).as("exclusive_types"))
      .withColumn("novelty_ppm",
        expr("exclusive_types * 1000000 div types"))
      .orderBy(col("source"))
  }

  /** Fairness audit of the quality classifier across languages:
    * demographic-parity gap (keep-rate vs corpus) and equal-
    * opportunity gap (TPR among label-positives vs corpus) per
    * language, all exact ppm integers — the per-slice eval any
    * production filter ships with. One scan, one group-by; the
    * corpus row is broadcast back. */
  private[graft] def qFairness(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(col("lang"),
        (col("n_chars") >= 200).as("label"),
        (qualityLogitMilli >= 0L)
          .as("pred"))
      .localCheckpoint(eager = false)
    val byLang = scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred"), 1L).otherwise(0L)).as("kept"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("pred") && col("label"), 1L).otherwise(0L)).as("tp"))
    val glob = scored.agg(
      count(lit(1)).as("gn"),
      sum(when(col("pred"), 1L).otherwise(0L)).as("gkept"),
      sum(when(col("label"), 1L).otherwise(0L)).as("gpos"),
      sum(when(col("pred") && col("label"), 1L).otherwise(0L)).as("gtp"))
    byLang.crossJoin(broadcast(glob))
      .select(col("lang"), col("n"),
        expr("kept * 1000000 div n").as("keep_ppm"),
        expr("tp * 1000000 div n_pos").as("tpr_ppm"),
        expr("kept * 1000000 div n - gkept * 1000000 div gn")
          .as("dp_gap_ppm"),
        expr("tp * 1000000 div n_pos - gtp * 1000000 div gpos")
          .as("eo_gap_ppm"))
      .orderBy(col("lang"))
  }

  private[graft] def llm1QueryMap: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample" -> (qSample _),
    "q_ngram_counts" -> (qNgramCounts _),
    "q_text_stats" -> (qTextStats _),
    "q_lang_id" -> (qLangId _),
    "q_quality" -> (qQuality _),
    "q_fingerprint" -> (qFingerprint _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_jaccard_pairs" -> (qJaccardPairs _),
    "q_minhash_pairs" -> (qMinhashPairs _),
    "q_simhash" -> (qSimhash _),
    "q_cosine_topk" -> (qCosineTopk _),
    "q_embed_near_dup" -> (qEmbedNearDup _),
    "q_ivf_search" -> (qIvfSearch _),
    "q_lsh_ann_buckets" -> (qLshAnnBuckets _),
    "q_vec_quantize" -> (qVecQuantize _),
    "q_ann_batch" -> (qAnnBatch _),
    "q_mmr_rerank" -> (qMmrRerank _),
    "q_kcenter" -> (qKcenter _),
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_media_dims" -> (qMediaDims _),
    "q_chunking" -> (qChunking _),
    "q_repetition" -> (qRepetition _),
    "q_pii_scrub" -> (qPiiScrub _),
    "q_contamination" -> (qContamination _),
    "q_dup_clusters" -> (qDupClusters _),
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_pack_windows" -> (qPackWindows _),
    "q_token_estimate" -> (qTokenEstimate _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_curation_pipeline" -> (qCurationPipeline _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "q_tfidf" -> (qTfidf _),
    "q_length_histogram" -> (qLengthHistogram _),
    "q_edit_distance" -> (qEditDistance _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_source_mix" -> (qSourceMix _),
    "q_dedup_keep_best" -> (qDedupKeepBest _),
    "q_median_scalable" -> (qMedianScalable _),
    "q_paragraph_dedup" -> (qParagraphDedup _),
    "q_containment" -> (qContainment _),
    "q_bm25" -> (qBm25 _),
    "q_jaccard_prefix" -> (qJaccardPrefix _),
    "q_vocab_coverage" -> (qVocabCoverage _),
    "q_rarity" -> (qRarity _),
    "q_dedup_rate" -> (qDedupRate _),
    "q_recall_at_k" -> (qRecallAtK _),
    "q_bpe_pairs" -> (qBpePairs _),
    "q_kmeans" -> (qKmeans _),
    "q_pq_adc" -> (qPqAdc _),
    "q_pmi" -> (qPmi _),
    "q_token_budget" -> (qTokenBudget _),
    "q_gini" -> (qGini _),
    "q_ngram_lm" -> (qNgramLm _),
    "q_audio_meta" -> (qAudioMeta _),
    "q_sample_k" -> (qSampleK _),
    "q_semantic_dedup" -> (qSemanticDedup _),
    "q_embed_outliers" -> (qEmbedOutliers _),
    "q_zipf" -> (qZipf _),
    "q_negatives" -> (qNegatives _),
    "q_quality_model" -> (qQualityModel _),
    "q_sorted_neighborhood" -> (qSortedNeighborhood _),
    "q_video_meta" -> (qVideoMeta _),
    "q_compaction" -> (qCompaction _),
    "q_blocking_audit" -> (qBlockingAudit _),
    "q_minhash_accuracy" -> (qMinhashAccuracy _),
    "q_confusion" -> (qConfusion _),
    "q_gains" -> (qGains _),
    "q_silhouette" -> (qSilhouette _),
    "q_embed_drift" -> (qEmbedDrift _),
    "q_readability" -> (qReadability _),
    "q_lsh_sweep" -> (qLshSweep _),
    "q_median_ci" -> (qMedianCi _),
    "q_keyness" -> (qKeyness _),
    "q_cronbach" -> (qCronbach _),
    "q_simpsons" -> (qSimpsons _),
    "q_boilerplate" -> (qBoilerplate _),
    "q_fertility" -> (qFertility _),
    "q_curriculum" -> (qCurriculum _),
    "q_lof" -> (qLof _),
    "q_knn_eval" -> (qKnnEval _),
    "q_epoch_mix" -> (qEpochMix _),
    "q_naive_bayes" -> (qNaiveBayes _),
    "q_simhash_hamming" -> (qSimhashHamming _),
    "q_hof_funcs" -> (qHofFuncs _),
    "q_posexplode" -> (qPosexplode _),
    "q_cdc_chunks" -> (qCdcChunks _),
    "q_chunk_dedup" -> (qChunkDedup _),
    "q_rrf" -> (qRrf _),
    "q_source_card" -> (qSourceCard _),
    "q_matryoshka_eval" -> (qMatryoshkaEval _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_array_set_ops" -> (qArraySetOps _),
    "q_inbatch_negatives" -> (qInbatchNegatives _),
    "q_filter_sweep" -> (qFilterSweep _),
    "q_jsd" -> (qJsd _),
    "q_unicode_norm" -> (qUnicodeNorm _),
    "q_good_turing" -> (qGoodTuring _),
    "q_heaps" -> (qHeaps _),
    "q_dedup_sweep" -> (qDedupSweep _),
    "q_vector_norms" -> (qVectorNorms _),
    "q_novelty" -> (qNovelty _),
    "q_fairness" -> (qFairness _),
  )

  private[graft] def llm1OracleMap: Map[String, String] = Map(
    "q_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE CAST('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 10
        |ORDER BY doc_id""".stripMargin,
    "q_ngram_counts" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(tk) - 1),
        |    i -> array_to_string(tk[i:i+1], ' ')))) AS bigram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t)
        |SELECT bigram, count(*) AS df FROM sh GROUP BY bigram
        |ORDER BY df DESC, bigram LIMIT 20""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id, len(tk) AS n_tokens, len(list_distinct(tk)) AS n_uniq_tokens,
        |  len(list_distinct(tk)) / len(tk) AS type_token_ratio,
        |  (length(text) - len(tk) + 1) / len(tk) AS avg_token_len
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "q_lang_id" -> {
      val stops = TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH f AS (
         |  SELECT doc_id, lang,
         |    len(list_filter(string_split(text, ' '), t -> list_contains([$stops], t))) AS en_hits,
         |    len(string_split(text, ' ')) AS n_tokens
         |  FROM documents)
         |SELECT doc_id, en_hits, n_tokens, en_hits / n_tokens AS en_density,
         |  CASE WHEN en_hits / n_tokens >= 0.08 THEN 'en' ELSE 'other' END AS pred_lang,
         |  lang,
         |  (CASE WHEN en_hits / n_tokens >= 0.08 THEN 'en' ELSE 'other' END) = lang AS pred_match
         |FROM f ORDER BY doc_id""".stripMargin
    },
    "q_quality" -> {
      val stops = TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH f AS (
         |  SELECT doc_id,
         |    len(list_filter(tk, t -> list_contains([$stops], t))) / len(tk) AS en_density,
         |    len(list_distinct(tk)) / len(tk) AS type_token_ratio,
         |    len(tk) AS n_tokens
         |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t)
         |SELECT doc_id, en_density, type_token_ratio,
         |  least(en_density * 2.0, 1.0) * 0.4 + type_token_ratio * 0.4 +
         |    least(n_tokens / 256.0, 1.0) * 0.2 AS quality_score
         |FROM f ORDER BY doc_id""".stripMargin
    },
    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp, md5(substr(text, 1, 64)) AS fp_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "q_jaccard_pairs" ->
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |cand AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
         |                  HAVING count(*) > ${graft.llm.Dedup.DefaultMaxShingleDf})),
         |pairs AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM cand a JOIN cand b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, shared, c1.n AS n1, c2.n AS n2,
         |  shared / (c1.n + c2.n - shared) AS jaccard
         |FROM pairs JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
         |WHERE shared / (c1.n + c2.n - shared) >= 0.05
         |ORDER BY d1, d2""".stripMargin,
    "q_minhash_pairs" -> {
      val minhs = (0 until 8).map(j =>
        s"min(substr(m${j / 4}, ${1 + 8 * (j % 4)}, 8)) AS h$j").mkString(",\n         |    ")
      val bands = (0 until 8).map(j => s"struct_pack(band := $j, sig := h$j)").mkString(", ")
      s"""WITH $duckShingles,
         |hashed AS (
         |  SELECT doc_id, md5('0|' || s) AS m0, md5('1|' || s) AS m1 FROM sh),
         |sigs AS (
         |  SELECT doc_id,
         |    $minhs
         |  FROM hashed GROUP BY doc_id),
         |buckets AS (
         |  SELECT doc_id, u.band AS band, u.sig AS sig
         |  FROM (SELECT doc_id, unnest([$bands]) AS u FROM sigs) z)
         |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |ORDER BY d1, d2""".stripMargin
    },
    "q_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS h FROM tok),
        |votes AS (
        |  SELECT doc_id, j,
        |    sum(CASE WHEN (h // CAST(2**j AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(range(32)) AS j) js
        |  GROUP BY doc_id, j)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN v > 0 THEN CAST(2**j AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash32
        |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |dots AS (
         |  SELECT vec_id,
         |    ${duckDot("embedding", "qv")} AS dab,
         |    ${duckDot("embedding", "embedding")} AS daa,
         |    ${duckDot("qv", "qv")} AS dbb
         |  FROM embeddings, q)
         |SELECT vec_id, ${duckCos("dab", "daa", "dbb")} AS cosine
         |FROM dots ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin,
    "q_embed_near_dup" ->
      s"""WITH n AS (
         |  SELECT vec_id, label, embedding,
         |    ${duckDot("embedding", "embedding")} AS nrm
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2,
         |    ${duckCos("""list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)))""", "a.nrm", "b.nrm")} AS cosine
         |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT v1, v2, cosine FROM pairs WHERE cosine >= 0.25
         |ORDER BY v1, v2""".stripMargin,
    "q_ivf_search" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |dots AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckDot("e.embedding", "c.cv")} AS d
         |  FROM embeddings e CROSS JOIN cents c),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
         |    FROM dots) x WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |qc AS (SELECT cid AS qcid FROM assign WHERE vec_id = 0),
         |scored AS (
         |  SELECT e.vec_id,
         |    ${duckDot("e.embedding", "qv")} AS dab,
         |    ${duckDot("e.embedding", "e.embedding")} AS daa,
         |    ${duckDot("qv", "qv")} AS dbb
         |  FROM embeddings e
         |  JOIN assign a ON e.vec_id = a.vec_id
         |  JOIN qc ON a.cid = qc.qcid
         |  CROSS JOIN q)
         |SELECT vec_id, ${duckCos("dab", "daa", "dbb")} AS cosine
         |FROM scored ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "q_lsh_ann_buckets" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    (CAST('0x' || substr(md5('hp|' || CAST(p AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 2001 - 1000) / 1000.0 AS w
        |  FROM (SELECT unnest(range(12)) AS p) ps
        |  CROSS JOIN (SELECT unnest(range(64)) AS i) dims),
        |dots AS (
        |  SELECT e.vec_id, h.p,
        |    sum(CAST(floor(h.w * CAST(e.embedding[h.i + 1] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)) AS d
        |  FROM embeddings e CROSS JOIN hp h
        |  GROUP BY e.vec_id, h.p),
        |sigs AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN d >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS sig
        |  FROM dots GROUP BY vec_id)
        |SELECT sig, count(*) AS n_vectors, min(vec_id) AS min_vec
        |FROM sigs GROUP BY sig ORDER BY sig""".stripMargin,
    "q_vec_quantize" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS max_abs
        |  FROM embeddings),
        |s AS (
        |  SELECT e.vec_id, e.embedding,
        |    CASE WHEN q.max_abs > 0 THEN q.max_abs / 127.0 ELSE 0.0 END AS scale
        |  FROM embeddings e JOIN q ON e.vec_id = q.vec_id),
        |c AS (
        |  SELECT vec_id, scale, embedding,
        |    CASE WHEN scale > 0
        |      THEN list_transform(embedding,
        |             v -> CAST(floor(CAST(v AS DOUBLE) / scale + 0.5) AS INT))
        |      ELSE list_transform(embedding, v -> 0) END AS codes
        |  FROM s)
        |SELECT vec_id, scale,
        |  array_to_string(list_transform(codes, x -> CAST(x AS VARCHAR)), ',') AS codes_csv,
        |  CAST(list_sum(list_transform(generate_series(1, len(embedding)), i ->
        |    CAST(floor(abs(CAST(embedding[i] AS DOUBLE) - CAST(codes[i] AS DOUBLE) * scale)
        |         * 1000000000 + 0.5) AS BIGINT))) AS BIGINT) AS abs_err_fp
        |FROM c ORDER BY vec_id""".stripMargin,
    "q_ann_batch" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id IN (0, 7, 42)),
         |d AS (
         |  SELECT q.qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
                         duckDot("e.embedding", "e.embedding"),
                         duckDot("q.qv", "q.qv"))} AS cosine
         |  FROM embeddings e CROSS JOIN q),
         |r AS (
         |  SELECT qid, vec_id,
         |    CAST(row_number() OVER (PARTITION BY qid
         |      ORDER BY greatest(CAST(0 AS BIGINT),
         |        CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)), vec_id)
         |      AS BIGINT) AS rn
         |  FROM d)
         |SELECT qid, rn, vec_id FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    // unrolled greedy farthest-first: pick 1 = min id; each later pick
    // = argmax over ALL vectors of the min fixed-point gap to the
    // chosen set (gap desc, id asc — chosen seeds gap to 0 and never
    // win while anything positive remains), exactly the Spark loop
    "q_kcenter" -> {
      def gapCte(g: String, sel: String): String =
        s"""$g AS (
           |  SELECT v.id, min(v.self - list_sum(list_transform(generate_series(1, 64), i ->
           |      CAST(floor(CAST(v.embedding[i] AS DOUBLE) * CAST(s.cf[i] AS DOUBLE) + 0.5) AS BIGINT)))) AS gap
           |  FROM fs v JOIN fs s ON s.id IN (SELECT sid FROM $sel)
           |  GROUP BY v.id)""".stripMargin
      s"""WITH f AS (
         |  SELECT CAST(vec_id AS BIGINT) AS id, embedding,
         |    list_transform(embedding, v ->
         |      CAST(floor(CAST(v AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)) AS cf
         |  FROM embeddings),
         |fs AS (
         |  SELECT id, embedding, cf,
         |    list_sum(list_transform(generate_series(1, 64), i ->
         |      CAST(floor(CAST(embedding[i] AS DOUBLE) * CAST(cf[i] AS DOUBLE) + 0.5) AS BIGINT))) AS self
         |  FROM f),
         |p1 AS (SELECT min(id) AS sid FROM fs),
         |${gapCte("g1", "p1")},
         |p2 AS (SELECT id AS sid, gap FROM g1 ORDER BY gap DESC, id LIMIT 1),
         |sel2 AS (SELECT sid FROM p1 UNION ALL SELECT sid FROM p2),
         |${gapCte("g2", "sel2")},
         |p3 AS (SELECT id AS sid, gap FROM g2 ORDER BY gap DESC, id LIMIT 1),
         |sel3 AS (SELECT sid FROM sel2 UNION ALL SELECT sid FROM p3),
         |${gapCte("g3", "sel3")},
         |p4 AS (SELECT id AS sid, gap FROM g3 ORDER BY gap DESC, id LIMIT 1),
         |sel4 AS (SELECT sid FROM sel3 UNION ALL SELECT sid FROM p4),
         |${gapCte("g4", "sel4")},
         |p5 AS (SELECT id AS sid, gap FROM g4 ORDER BY gap DESC, id LIMIT 1)
         |SELECT pick, vec_id, gap_fp FROM (
         |  SELECT CAST(1 AS BIGINT) AS pick, sid AS vec_id,
         |    CAST(0 AS BIGINT) AS gap_fp FROM p1
         |  UNION ALL SELECT CAST(2 AS BIGINT), sid, CAST(gap AS BIGINT) FROM p2
         |  UNION ALL SELECT CAST(3 AS BIGINT), sid, CAST(gap AS BIGINT) FROM p3
         |  UNION ALL SELECT CAST(4 AS BIGINT), sid, CAST(gap AS BIGINT) FROM p4
         |  UNION ALL SELECT CAST(5 AS BIGINT), sid, CAST(gap AS BIGINT) FROM p5)
         |ORDER BY pick""".stripMargin
    },
    // unrolled 3-step greedy MMR: candidate rule identical to
    // q_ann_batch (quantized fixed-point distance, vec_id ties);
    // each step excludes the selected set and maxes pairwise sims
    // against it; score = rel - red (the λ=1/2 MMR up to a monotone
    // 2x), ties to the smaller vec_id.
    "q_mmr_rerank" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id IN (0, 7, 42)),
         |d AS (
         |  SELECT q.qid, e.vec_id, e.embedding,
         |    ${duckCos(duckDot("e.embedding", "q.qv"),
                         duckDot("e.embedding", "e.embedding"),
                         duckDot("q.qv", "q.qv"))} AS rel
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
         |cand AS (
         |  SELECT qid, vec_id, embedding, rel FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY greatest(CAST(0 AS BIGINT),
         |        CAST(floor((1 - rel) * 1000000000 + 0.5) AS BIGINT)), vec_id) AS rn
         |    FROM d) WHERE rn <= 8),
         |sims AS (
         |  SELECT a.qid, a.vec_id AS ca, b.vec_id AS cb,
         |    ${duckCos(duckDot("a.embedding", "b.embedding"),
                         duckDot("a.embedding", "a.embedding"),
                         duckDot("b.embedding", "b.embedding"))} AS sim
         |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
         |s1 AS (
         |  SELECT qid, vec_id, rel, CAST(0 AS DOUBLE) AS red FROM (
         |    SELECT qid, vec_id, rel,
         |      row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn
         |    FROM cand) WHERE rn = 1),
         |r2 AS (
         |  SELECT c.qid, c.vec_id, c.rel, max(s.sim) AS red
         |  FROM cand c
         |  JOIN sims s ON s.qid = c.qid AND s.ca = c.vec_id
         |  JOIN s1 ON s1.qid = s.qid AND s1.vec_id = s.cb
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM s1 x WHERE x.qid = c.qid AND x.vec_id = c.vec_id)
         |  GROUP BY 1, 2, 3),
         |s2 AS (
         |  SELECT qid, vec_id, rel, red FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY rel - red DESC, vec_id) AS rn FROM r2) WHERE rn = 1),
         |sel2 AS (
         |  SELECT qid, vec_id FROM s1 UNION ALL SELECT qid, vec_id FROM s2),
         |r3 AS (
         |  SELECT c.qid, c.vec_id, c.rel, max(s.sim) AS red
         |  FROM cand c
         |  JOIN sims s ON s.qid = c.qid AND s.ca = c.vec_id
         |  JOIN sel2 ON sel2.qid = s.qid AND sel2.vec_id = s.cb
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM sel2 x WHERE x.qid = c.qid AND x.vec_id = c.vec_id)
         |  GROUP BY 1, 2, 3),
         |s3 AS (
         |  SELECT qid, vec_id, rel, red FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY rel - red DESC, vec_id) AS rn FROM r3) WHERE rn = 1)
         |SELECT qid, rank, vec_id, rel, red, rel - red AS mmr FROM (
         |  SELECT qid, CAST(1 AS BIGINT) AS rank, vec_id, rel, red FROM s1
         |  UNION ALL SELECT qid, CAST(2 AS BIGINT), vec_id, rel, red FROM s2
         |  UNION ALL SELECT qid, CAST(3 AS BIGINT), vec_id, rel, red FROM s3)
         |ORDER BY qid, rank""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  octet_length(encode(text)) % 640 + 1 AS width,
        |  (octet_length(encode(text)) * 7) % 480 + 1 AS height,
        |  CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'png'
        |       WHEN octet_length(encode(text)) % 3 = 1 THEN 'jpeg'
        |       ELSE 'webp' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // shared SQL texts: the oracle runs the same string spark.sql ran,
    "q_media_dims" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'gif' END AS format,
        |  doc_id % 512 + 16 AS width,
        |  (doc_id * 3) % 512 + 16 AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id, tk, unnest(range(0, len(tk), 48)) AS start
        |  FROM t WHERE len(tk) > 0)
        |SELECT doc_id, start // 48 AS chunk_idx,
        |  array_to_string(tk[start+1:start+64], ' ') AS chunk,
        |  least(64, len(tk) - start) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(greatest(len(tk) - 1, 0) AS BIGINT) AS n_2grams,
        |    CAST(len(list_distinct(list_transform(generate_series(1, len(tk) - 1),
        |      i -> array_to_string(tk[i:i+1], ' ')))) AS BIGINT) AS uniq_2grams,
        |    CAST(greatest(len(tk) - 2, 0) AS BIGINT) AS n_3grams,
        |    CAST(len(list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |      i -> array_to_string(tk[i:i+2], ' ')))) AS BIGINT) AS uniq_3grams
        |  FROM t)
        |SELECT doc_id, n_2grams, uniq_2grams,
        |  CASE WHEN n_2grams > 0 THEN 1.0 - uniq_2grams / n_2grams ELSE 0.0 END AS dup_2gram_ratio,
        |  n_3grams, uniq_3grams,
        |  CASE WHEN n_3grams > 0 THEN 1.0 - uniq_3grams / n_3grams ELSE 0.0 END AS dup_3gram_ratio
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |           THEN text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com now'
        |         WHEN doc_id % 11 = 0
        |           THEN text || ' see https://example.org/d/' || CAST(doc_id AS VARCHAR) || ' page'
        |         ELSE text END AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text2, 'https?://[a-z0-9./_-]+')) AS BIGINT) AS n_urls,
        |  md5(regexp_replace(regexp_replace(text2,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[a-z0-9./_-]+', '<URL>', 'g')) AS scrub_fp
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_contamination" ->
      s"""WITH $duckShingles,
         |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
         |cnt AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
         |hit AS (SELECT sh.doc_id, count(*) AS n_contaminated
         |        FROM sh JOIN bench ON sh.s = bench.s GROUP BY sh.doc_id)
         |SELECT c.doc_id, c.n_shingles,
         |  CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
         |  coalesce(h.n_contaminated, 0) / c.n_shingles AS contamination
         |FROM cnt c LEFT JOIN hit h ON c.doc_id = h.doc_id
         |ORDER BY c.doc_id""".stripMargin,
    "q_dup_clusters" -> dupClustersOracle,

    // same semantic answer as q_dup_clusters — the engine runs star
    // contraction instead of min-label propagation,
    "q_dedup_incremental" ->
      """SELECT doc_id, lang FROM documents
        |WHERE doc_id % 5 <> 0
        |  AND md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id % 5 = 0)
        |ORDER BY doc_id""".stripMargin,
    "q_pack_windows" ->
      """WITH e AS (
        |  SELECT doc_id,
        |    greatest(len(tk),
        |      CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4)) AS BIGINT))
        |      AS est_tokens
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t),
        |c AS (
        |  SELECT doc_id, est_tokens,
        |    sum(est_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sum
        |  FROM e)
        |SELECT doc_id, est_tokens,
        |  CAST(run_sum - est_tokens AS BIGINT) AS start_offset,
        |  CAST((run_sum - est_tokens) // 2048 AS BIGINT) AS window_id,
        |  (run_sum - est_tokens) // 2048 <> (run_sum - 1) // 2048 AS crosses_boundary
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_token_estimate" ->
      """WITH f AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        |SELECT doc_id,
        |  len(tk) AS n_words,
        |  CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4)) AS BIGINT)
        |    AS est_bpe_tokens,
        |  greatest(len(tk),
        |    CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4)) AS BIGINT))
        |    AS est_tokens
        |FROM f ORDER BY doc_id""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_component,
        |  CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |         * 1000000000 + 0.5) AS BIGINT))) AS BIGINT) AS head8_norm_fp,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_curation_pipeline" -> {
      val stops = TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH scored AS (
         |  SELECT doc_id, text,
         |    len(list_filter(tk, t -> list_contains([$stops], t))) / len(tk) AS en_density,
         |    least(len(list_filter(tk, t -> list_contains([$stops], t))) / len(tk) * 2.0, 1.0) * 0.4
         |      + len(list_distinct(tk)) / len(tk) * 0.4
         |      + least(len(tk) / 256.0, 1.0) * 0.2 AS quality_score,
         |    tk
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents) t),
         |gated AS (
         |  SELECT * FROM scored WHERE en_density >= 0.05 AND quality_score >= 0.45),
         |deduped AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM gated) x WHERE rn = 1),
         |tokens AS (
         |  SELECT doc_id, quality_score,
         |    greatest(len(tk),
         |      CAST(list_sum(list_transform(tk, w -> (length(w) + 3) // 4)) AS BIGINT))
         |      AS est_tokens
         |  FROM deduped)
         |SELECT count(*) AS n_docs_kept,
         |  CAST(sum(est_tokens) AS BIGINT) AS total_est_tokens,
         |  CAST(sum(CAST(floor(quality_score * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         |    / 1000000.0 / count(*) AS mean_quality
         |FROM tokens""".stripMargin
    },
    "q_stratified_sample" ->
      """SELECT lang, rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('strat|' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |  FROM documents) t
        |WHERE rn <= 25 ORDER BY lang, rn""".stripMargin,

    // failure predicates spelled explicitly: overflow iff even key /
    // key >= 2; divide-by-zero iff key % 25 = 0; OOB iff index not 1..2,
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    (tf.tf * (n.n_docs + 1) * 1000000) // (df.df + 1) AS score_fp
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_fp DESC, term) AS rn
        |  FROM scored WHERE doc_id % 20 = 0)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, CAST(score_fp AS BIGINT) AS score_fp
        |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "q_length_histogram" ->
      """SELECT least(n_chars // 200, 15) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_edit_distance" ->
      """WITH p AS (
        |  SELECT doc_id, substr(text, 1, 48) AS pfx,
        |    lead(substr(text, 1, 48)) OVER (ORDER BY doc_id) AS nxt
        |  FROM documents)
        |SELECT doc_id, CAST(levenshtein(pfx, nxt) AS BIGINT) AS dist,
        |  CAST((levenshtein(pfx, nxt) * 1000000)
        |    // greatest(length(pfx), length(nxt)) AS BIGINT) AS ratio_fp
        |FROM p WHERE nxt IS NOT NULL AND doc_id % 5 = 0
        |ORDER BY doc_id""".stripMargin,

    // shared SQL texts: the oracle runs the same string spark.sql ran,
    "q_weighted_sample" ->
      """WITH rated AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 90
        |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 15
        |         ELSE 40 END AS rate,
        |    CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 100 AS h
        |  FROM documents)
        |SELECT doc_id, source FROM rated WHERE h < rate ORDER BY doc_id""".stripMargin,
    "q_source_mix" ->
      """WITH tok AS (
        |  SELECT source, doc_id,
        |    greatest(len(string_split(text, ' ')),
        |      CAST(list_sum(list_transform(string_split(text, ' '),
        |        w -> (length(w) + 3) // 4)) AS BIGINT)) AS est_tokens
        |  FROM documents),
        |agg AS (SELECT source, count(*) AS n_docs, sum(est_tokens) AS toks
        |        FROM tok GROUP BY source),
        |tot AS (SELECT sum(toks) AS total FROM agg)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(toks AS BIGINT) AS est_tokens,
        |  CAST((toks * 1000000) // total AS BIGINT) AS share_ppm
        |FROM agg CROSS JOIN tot ORDER BY source""".stripMargin,
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE $dupClustersCtes,
         |lab AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node),
         |j AS (SELECT cluster, n_chars, node AS doc_id
         |      FROM lab JOIN documents ON node = documents.doc_id),
         |agg AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
         |    max(n_chars * 1000000000 + (999999999 - doc_id)) AS enc
         |  FROM j GROUP BY cluster)
         |SELECT cluster, 999999999 - enc % 1000000000 AS kept_doc,
         |  enc // 1000000000 AS kept_chars,
         |  n_members, n_members - 1 AS n_dropped
         |FROM agg ORDER BY cluster""".stripMargin,
    "q_median_scalable" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c, o_orderkey
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, c,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY c, o_orderkey) AS rnk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM c),
        |m AS (SELECT o_orderpriority, c, n FROM r
        |      WHERE rnk = (n + 1) // 2 OR rnk = (n + 2) // 2)
        |SELECT o_orderpriority,
        |  CAST(sum(c) AS DOUBLE) / count(*) / CAST(100.0 AS DOUBLE)
        |    AS median_price,
        |  CAST(max(n) AS BIGINT) AS n
        |FROM m GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // oracle = the WINDOW formulation; the engine runs the two-pass path,
    "q_paragraph_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id, tk, unnest(range(0, len(tk), 48)) AS start
        |  FROM t WHERE len(tk) > 0),
        |ch AS (
        |  SELECT doc_id, md5(array_to_string(tk[start+1:start+64], ' ')) AS fp
        |  FROM c),
        |occ AS (SELECT fp, count(*) AS n_occ FROM ch GROUP BY fp)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(*) FILTER (WHERE n_occ > 1) AS BIGINT) AS n_dup_chunks,
        |  (count(*) FILTER (WHERE n_occ > 1) * 1000000) // count(*) AS dup_ppm
        |FROM ch JOIN occ USING (fp) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // rank-selection percentiles; oracle = the window formulation,
    "q_containment" ->
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |cand AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
         |                  HAVING count(*) > ${graft.llm.Dedup.DefaultMaxShingleDf})),
         |p AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM cand a JOIN cand b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, CAST(shared AS BIGINT) AS shared,
         |  CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2,
         |  shared / c1.n AS contain_in_1, shared / c2.n AS contain_in_2
         |FROM p JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
         |WHERE greatest(shared / c1.n, shared / c2.n) >= 0.2
         |ORDER BY d1, d2""".stripMargin,
    "q_bm25" -> {
      def termSql(i: Int): String =
        s"CAST(floor(((n_docs - df_$i + CAST(0.5 AS DOUBLE)) / (df_$i + CAST(0.5 AS DOUBLE)))" +
          s" * ((tf_$i * CAST(2.2 AS DOUBLE)) / (tf_$i + CAST(1.2 AS DOUBLE)" +
          s" * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * ((dl * n_docs) / sum_dl))))" +
          s" * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
      val tfs = Bm25Terms.zipWithIndex.map { case (term, i) =>
        s"CAST(len(list_filter(tk, x -> x = '$term')) AS BIGINT) AS tf_$i"
      }.mkString(",\n    ")
      val dfs = Bm25Terms.indices.map(i =>
        s"CAST(count(*) FILTER (WHERE tf_$i > 0) AS BIGINT) AS df_$i")
        .mkString(",\n    ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |s AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
         |    $tfs
         |  FROM t),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(dl) AS BIGINT) AS sum_dl,
         |    $dfs
         |  FROM s),
         |sc AS (SELECT doc_id, dl, tf_0, tf_1, tf_2,
         |    ${Bm25Terms.indices.map(termSql).mkString(" + ")} AS score_fp
         |  FROM s, g)
         |SELECT doc_id, dl, tf_0, tf_1, tf_2, score_fp,
         |  score_fp / CAST(1000000.0 AS DOUBLE) AS score
         |FROM sc ORDER BY score_fp DESC, doc_id LIMIT 50""".stripMargin
    },

    // oracle mirrors the decomposition's candidate set (a superset of
    // the skyline), then applies the textbook NOT EXISTS dominance test,
    "q_jaccard_prefix" ->
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |p AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, CAST(shared AS BIGINT) AS shared,
         |  CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2,
         |  shared / (c1.n + c2.n - shared) AS jaccard
         |FROM p JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
         |WHERE shared / (c1.n + c2.n - shared) >= 0.05
         |ORDER BY d1, d2""".stripMargin,
    "q_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT doc_id, source, t AS tok
        |  FROM (SELECT doc_id, source,
        |          unnest(string_split(text, ' ')) AS t
        |        FROM documents) q
        |  WHERE length(t) > 0),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS df
        |    FROM (SELECT DISTINCT tok, doc_id FROM tok) d
        |    GROUP BY tok) f
        |  ORDER BY df DESC, tok LIMIT 256)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS oov_tokens,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS oov_ppm
        |FROM tok LEFT JOIN vocab v ON tok.tok = v.tok
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // the oracle replays the MERGE independently: same synthesized CDC
    // batch, same branch semantics, per-priority exact-cents totals,
    "q_rarity" ->
      """WITH tok AS (
        |  SELECT doc_id, t AS tok
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |        FROM documents) q
        |  WHERE length(t) > 0),
        |df AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS df
        |  FROM (SELECT DISTINCT tok, doc_id FROM tok) d GROUP BY tok),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(CAST(sum((nd * 1000000) // df) AS BIGINT) // count(*)
        |    AS BIGINT) AS mean_idf_micro
        |FROM tok JOIN df USING (tok), nd
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the oracle recomputes each leakage-free label as a correlated
    // COUNT — a different algorithm from the running-count as-of,
    "q_dedup_rate" ->
      """WITH d AS (SELECT source, md5(text) AS d FROM documents),
        |per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(DISTINCT d) AS BIGINT) AS n_unique
        |  FROM d GROUP BY source
        |  UNION ALL
        |  SELECT '__all__', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT d) AS BIGINT)
        |  FROM d)
        |SELECT source, n_docs, n_unique,
        |  CAST((n_docs - n_unique) * 1000000 // n_docs AS BIGINT) AS dup_ppm
        |FROM per ORDER BY source""".stripMargin,
    "q_recall_at_k" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
         |adots AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckDot("e.embedding", "c.cv")} AS d
         |  FROM embeddings e CROSS JOIN cents c),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
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
         |  FROM embeddings e CROSS JOIN q),
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
         |  JOIN q ON a.cid = q.qcid),
         |ret AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY greatest(CAST(0 AS BIGINT),
         |          CAST(floor((1 - cosine) * 1000000000 + 0.5) AS BIGINT)),
         |          vec_id) AS rn
         |    FROM rd) x WHERE rn <= 10)
         |SELECT t.qid, CAST(count(*) AS BIGINT) AS n_truth,
         |  CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_matched,
         |  CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS recall_ppm
         |FROM truth t LEFT JOIN ret r ON t.qid = r.qid AND t.vec_id = r.vec_id
         |GROUP BY t.qid ORDER BY t.qid""".stripMargin,
    "q_bpe_pairs" ->
      """WITH words AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0 GROUP BY w),
        |p AS (
        |  SELECT substr(w, CAST(i AS INTEGER), 1) AS a,
        |         substr(w, CAST(i AS INTEGER) + 1, 1) AS b, freq
        |  FROM (SELECT w, freq, unnest(generate_series(1, length(w) - 1)) AS i
        |        FROM words WHERE length(w) >= 2) x)
        |SELECT a, b, CAST(sum(freq) AS BIGINT) AS n
        |FROM p GROUP BY a, b ORDER BY n DESC, a, b LIMIT 30""".stripMargin,
    "q_kmeans" ->
      s"""WITH $kmeansAssignCtes,
         |g AS (
         |  SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |    min(vec_id) AS min_vec
         |  FROM a2 GROUP BY cid)
         |SELECT g.cid, g.n_members, g.min_vec, c1.cf[1] AS c0_fp
         |FROM g JOIN c1 ON g.cid = c1.cid ORDER BY g.cid""".stripMargin,
    "q_pq_adc" ->
      """WITH ss AS (SELECT unnest(generate_series(0, 7)) AS s),
        |sc AS (
        |  SELECT s, CAST(vec_id AS BIGINT) AS cid,
        |    list_transform(generate_series(1, 8), j ->
        |      CAST(embedding[s * 8 + j] AS DOUBLE)) AS csub
        |  FROM embeddings CROSS JOIN ss WHERE vec_id < 16),
        |sub AS (
        |  SELECT vec_id, s,
        |    list_transform(generate_series(1, 8), j ->
        |      CAST(embedding[s * 8 + j] AS DOUBLE)) AS sub
        |  FROM embeddings CROSS JOIN ss),
        |d AS (
        |  SELECT v.vec_id, v.s, c.cid,
        |    list_sum(list_transform(generate_series(1, 8), j ->
        |      CAST(floor(v.sub[j] * c.csub[j] * 1000000000 + 0.5) AS BIGINT))) AS d
        |  FROM sub v JOIN sc c ON v.s = c.s),
        |codes AS (
        |  SELECT vec_id, s, cid FROM (
        |    SELECT vec_id, s, cid,
        |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d DESC, cid) AS rn
        |    FROM d) x WHERE rn = 1),
        |lut AS (SELECT s, cid, d FROM d WHERE vec_id = 0)
        |SELECT c.vec_id, CAST(sum(l.d) AS BIGINT) AS adc_fp
        |FROM codes c JOIN lut l ON c.s = l.s AND c.cid = l.cid
        |GROUP BY c.vec_id ORDER BY adc_fp DESC, c.vec_id LIMIT 10""".stripMargin,
    "q_pmi" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |ucnt AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(tk) AS w FROM tk) u GROUP BY w),
        |bcnt AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cab
        |  FROM (SELECT tk[i] AS w1, tk[i + 1] AS w2
        |        FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
        |              FROM tk) x) b
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM ucnt) AS t_tokens,
        |         (SELECT CAST(sum(cab) AS BIGINT) FROM bcnt) AS t_bigrams)
        |SELECT w1, w2, cab, u1.c AS c1, u2.c AS c2,
        |  (CAST(cab AS DOUBLE) * CAST(t_tokens AS DOUBLE) * CAST(t_tokens AS DOUBLE))
        |    / (CAST(t_bigrams AS DOUBLE) * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
        |FROM bcnt JOIN ucnt u1 ON w1 = u1.w JOIN ucnt u2 ON w2 = u2.w
        |CROSS JOIN tot
        |WHERE cab >= 5 AND u1.c >= 10 AND u2.c >= 10
        |ORDER BY lift DESC, w1, w2 LIMIT 25""".stripMargin,
    "q_token_budget" ->
      """WITH s0 AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |src AS (
        |  SELECT source, tokens,
        |    CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS w
        |  FROM s0),
        |tw AS (SELECT CAST(sum(w) AS BIGINT) AS total_w FROM src)
        |SELECT source, tokens, w,
        |  10000 * w // total_w AS target_tokens,
        |  least(1000000, (10000 * w // total_w) * 1000000 // tokens) AS rate_ppm,
        |  tokens * least(1000000, (10000 * w // total_w) * 1000000 // tokens) // 1000000
        |    AS expected_tokens,
        |  tokens < (10000 * w // total_w) AS undersupplied
        |FROM src CROSS JOIN tw ORDER BY source""".stripMargin,
    "q_gini" ->
      """WITH src AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1)
        |SELECT CAST(sum(n) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_sources,
        |  (CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT)
        |    - CAST(sum(n * n) AS BIGINT)) * 1000000
        |    // (CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT)) AS gini_ppm,
        |  CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT) * 1000
        |    // CAST(sum(n * n) AS BIGINT) AS effective_sources_milli
        |FROM src""".stripMargin,
    "q_ngram_lm" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |bi AS (
        |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
        |        FROM tk) x),
        |bcnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cab FROM bi GROUP BY 1, 2),
        |ucnt AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bi GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(cab * 1000000 // c1) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS mean_cond_ppm
        |FROM bi JOIN bcnt USING (w1, w2) JOIN ucnt USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_audio_meta" ->
      """SELECT doc_id,
        |  doc_id % 2 + 1 AS channels,
        |  (doc_id % 5 + 1) * 8000 AS sample_rate,
        |  CAST(16 AS BIGINT) AS bits,
        |  (doc_id % 100 + 1) * 1600 AS n_frames,
        |  ((doc_id % 100 + 1) * 1600) * 1000 // ((doc_id % 5 + 1) * 8000)
        |    AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_sample_k" ->
      """WITH k AS (
        |  SELECT lang, doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS grp_n
        |  FROM k)
        |SELECT lang, rnk, doc_id, grp_n FROM r WHERE rnk <= 5
        |ORDER BY lang, rnk""".stripMargin,
    "q_semantic_dedup" ->
      s"""WITH $kmeansAssignCtes,
         |n AS (
         |  SELECT e.vec_id, a.cid, e.embedding,
         |    ${duckDot("e.embedding", "e.embedding")} AS nrm
         |  FROM embeddings e JOIN a2 a ON e.vec_id = a.vec_id),
         |pairs AS (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2,
         |    ${duckCos("""list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)))""", "a.nrm", "b.nrm")} AS cosine
         |  FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id < b.vec_id)
         |SELECT v1, v2, cosine FROM pairs WHERE cosine >= 0.35
         |ORDER BY v1, v2""".stripMargin,
    "q_embed_outliers" ->
      s"""WITH $kmeansAssignCtes,
         |best AS (
         |  SELECT vec_id, CAST(max(d) AS BIGINT) AS best_d
         |  FROM d2 GROUP BY vec_id)
         |SELECT vec_id, best_d FROM best
         |ORDER BY best_d, vec_id LIMIT 20""".stripMargin,
    "q_zipf" ->
      """WITH f AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0 GROUP BY w
        |  ORDER BY freq DESC, w LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY freq DESC, w) AS BIGINT) AS rank,
        |  w, freq,
        |  CAST(row_number() OVER (ORDER BY freq DESC, w) AS BIGINT) * freq
        |    AS rank_x_freq
        |FROM f ORDER BY rank""".stripMargin,
    "q_negatives" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5('neg|' || CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 64 AS bucket
        |  FROM documents),
        |paired AS (
        |  SELECT d.doc_id, c.doc_id AS neg_id,
        |    CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|' ||
        |      CAST(c.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS ph
        |  FROM docs d JOIN docs c ON (d.bucket + 1) % 64 = c.bucket),
        |r AS (
        |  SELECT doc_id, neg_id,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ph, neg_id)
        |      AS BIGINT) AS rnk
        |  FROM paired)
        |SELECT doc_id, rnk, neg_id FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "q_quality_model" ->
      """WITH w AS (
        |  SELECT CAST(40 AS BIGINT) AS w_words, CAST(-10 AS BIGINT) AS w_digits,
        |    CAST(-2 AS BIGINT) AS w_lendev, CAST(-1500 AS BIGINT) AS bias),
        |scored AS (
        |  SELECT source,
        |    w_words * CAST(len(string_split(text, ' ')) AS BIGINT) +
        |    w_digits * CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) +
        |    w_lendev * abs(n_chars - 500) + bias AS logit_milli
        |  FROM documents CROSS JOIN w)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN logit_milli >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
        |  CAST(sum(CASE WHEN logit_milli >= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS keep_ppm,
        |  CAST(sum(logit_milli) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_logit
        |FROM scored GROUP BY source ORDER BY source""".stripMargin,
    "q_sorted_neighborhood" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS ord,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY CAST(n_chars AS DOUBLE), doc_id) AS BIGINT) AS rnk
        |  FROM documents),
        |offs AS (SELECT CAST(unnest(generate_series(1, 3)) AS BIGINT) AS j)
        |SELECT a.lang, a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(b.ord - a.ord AS BIGINT) AS len_diff
        |FROM ranked a CROSS JOIN offs
        |JOIN ranked b ON a.lang = b.lang AND a.rnk + j = b.rnk
        |WHERE abs(b.ord - a.ord) <= 5.0
        |ORDER BY a.lang, d1, d2""".stripMargin,
    "q_video_meta" ->
      """SELECT doc_id,
        |  (doc_id % 8 + 1) * 160 AS width,
        |  (doc_id % 8 + 1) * 90 AS height,
        |  doc_id % 2 + 1 AS streams,
        |  (doc_id % 50 + 1) * 24 AS n_frames,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 33333 ELSE 41667 END AS BIGINT)
        |    AS us_per_frame,
        |  ((doc_id % 50 + 1) * 24) *
        |    (CASE WHEN doc_id % 3 = 0 THEN 33333 ELSE 41667 END) // 1000
        |    AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_compaction" ->
      """WITH summed AS (
        |  SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS run_sum
        |  FROM documents)
        |SELECT (run_sum - n_chars) // 4000 AS bin,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(n_chars) AS BIGINT) AS bin_chars,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM summed GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_blocking_audit" -> {
      val minhs = (0 until 8).map(j =>
        s"min(substr(m${j / 4}, ${1 + 8 * (j % 4)}, 8)) AS h$j").mkString(",\n         |    ")
      val bands = (0 until 8).map(j => s"struct_pack(band := $j, sig := h$j)").mkString(", ")
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |csh AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
         |                  HAVING count(*) > ${graft.llm.Dedup.DefaultMaxShingleDf})),
         |tp AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM csh a JOIN csh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT d1, d2 FROM tp
         |  JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
         |  WHERE shared / (c1.n + c2.n - shared) >= 0.5),
         |hashed AS (
         |  SELECT doc_id, md5('0|' || s) AS m0, md5('1|' || s) AS m1 FROM sh),
         |sigs AS (
         |  SELECT doc_id,
         |    $minhs
         |  FROM hashed GROUP BY doc_id),
         |buckets AS (
         |  SELECT doc_id, u.band AS band, u.sig AS sig
         |  FROM (SELECT doc_id, unnest([$bands]) AS u FROM sigs) z),
         |mh AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM sh),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM mh),
         |nf AS (SELECT CAST(count(*) AS BIGINT) AS true_found FROM truth t
         |       WHERE EXISTS (SELECT 1 FROM mh
         |                     WHERE mh.d1 = t.d1 AND mh.d2 = t.d2))
         |SELECT n_docs, n_docs * (n_docs - 1) // 2 AS n_possible, n_true,
         |  n_candidates, true_found,
         |  (n_docs * (n_docs - 1) // 2 - n_candidates) * 1000000
         |    // (n_docs * (n_docs - 1) // 2) AS reduction_ppm,
         |  true_found * 1000000 // nullif(n_true, 0) AS completeness_ppm
         |FROM nd CROSS JOIN nt CROSS JOIN nc CROSS JOIN nf""".stripMargin
    },
    "q_minhash_accuracy" -> {
      val minhs = (0 until 8).map(j =>
        s"min(substr(m${j / 4}, ${1 + 8 * (j % 4)}, 8)) AS h$j").mkString(",\n         |    ")
      val bands = (0 until 8).map(j => s"struct_pack(band := $j, sig := h$j)").mkString(", ")
      val est = (0 until 8).map(j =>
        s"(CASE WHEN sa.h$j = sb.h$j THEN 1 ELSE 0 END)").mkString(" +\n         |      ")
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |csh AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
         |                  HAVING count(*) > ${graft.llm.Dedup.DefaultMaxShingleDf})),
         |tp AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM csh a JOIN csh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |ex AS (
         |  SELECT d1, d2, CAST(shared AS BIGINT) AS shared,
         |    shared / (c1.n + c2.n - shared) AS jaccard
         |  FROM tp JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id),
         |hashed AS (
         |  SELECT doc_id, md5('0|' || s) AS m0, md5('1|' || s) AS m1 FROM sh),
         |sigs AS (
         |  SELECT doc_id,
         |    $minhs
         |  FROM hashed GROUP BY doc_id),
         |buckets AS (
         |  SELECT doc_id, u.band AS band, u.sig AS sig
         |  FROM (SELECT doc_id, unnest([$bands]) AS u FROM sigs) z),
         |mh AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |j AS (
         |  SELECT mh.d1, mh.d2,
         |    CAST($est AS BIGINT) AS est_matches
         |  FROM mh JOIN sigs sa ON mh.d1 = sa.doc_id
         |  JOIN sigs sb ON mh.d2 = sb.doc_id)
         |SELECT j.d1, j.d2, est_matches, est_matches * 125000 AS est_ppm,
         |  coalesce(ex.shared, 0) AS shared,
         |  coalesce(ex.jaccard, 0.0) AS jaccard
         |FROM j LEFT JOIN ex ON j.d1 = ex.d1 AND j.d2 = ex.d2
         |ORDER BY j.d1, j.d2""".stripMargin
    },
    "q_confusion" -> {
      // interpolated like every sibling classifier oracle (q_lang_id,
      // q_quality, …) — an inline copy of the stopword list would
      // silently decouple this confusion matrix from the classifier
      // the moment TextOps.EnStopwords is tuned
      val stops = TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH f AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text, ' '), t -> list_contains([$stops], t))) AS BIGINT) AS en_hits,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |thr AS (SELECT CAST(unnest([60, 80, 100]) AS BIGINT) AS thr_milli),
        |j AS (
        |  SELECT thr_milli,
        |    en_hits * 1000 >= thr_milli * n_tokens AS pred,
        |    lang = 'en' AS actual
        |  FROM f CROSS JOIN thr),
        |c AS (
        |  SELECT thr_milli,
        |    CAST(sum(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN NOT pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN NOT pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM j GROUP BY thr_milli),
        |pr AS (
        |  SELECT thr_milli, tp, fp, fn, tn,
        |    CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp) ELSE 0 END AS precision_ppm,
        |    CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn) ELSE 0 END AS recall_ppm
        |  FROM c)
        |SELECT thr_milli, tp, fp, fn, tn, precision_ppm, recall_ppm,
        |  CASE WHEN precision_ppm + recall_ppm > 0
        |    THEN 2 * precision_ppm * recall_ppm // (precision_ppm + recall_ppm)
        |    ELSE 0 END AS f1_ppm,
        |  (tp + tn) * 1000000 // (tp + fp + fn + tn) AS accuracy_ppm
        |FROM pr ORDER BY thr_milli""".stripMargin
    },
    "q_gains" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    40 * CAST(len(string_split(text, ' ')) AS BIGINT) +
        |    (-10) * CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) +
        |    (-2) * abs(n_chars - 500) + (-1500) AS logit_milli,
        |    n_chars >= 200 AS label
        |  FROM documents),
        |n AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos_total
        |  FROM scored),
        |ranked AS (
        |  SELECT doc_id, label,
        |    CAST(row_number() OVER (
        |      ORDER BY CAST(0 - logit_milli AS DOUBLE), doc_id) AS BIGINT) AS rnk
        |  FROM scored),
        |deciles AS (
        |  SELECT (rnk - 1) * 10 // n_total + 1 AS decile,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(max(n_total) AS BIGINT) AS n_total,
        |    CAST(max(pos_total) AS BIGINT) AS pos_total
        |  FROM ranked CROSS JOIN n
        |  GROUP BY 1),
        |cum AS (
        |  SELECT decile, n_docs, n_pos, n_total, pos_total,
        |    CAST(sum(n_docs) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
        |    CAST(sum(n_pos) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
        |  FROM deciles)
        |SELECT decile, n_docs, n_pos, cum_docs, cum_pos,
        |  cum_pos * 1000000 // pos_total AS gain_ppm,
        |  CAST(floor(CAST(cum_pos AS DOUBLE) * CAST(n_total AS DOUBLE) * 1000000.0
        |    / (CAST(cum_docs AS DOUBLE) * CAST(pos_total AS DOUBLE))) AS BIGINT)
        |    AS lift_ppm
        |FROM cum ORDER BY decile""".stripMargin,
    "q_silhouette" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        |dists AS (
        |  SELECT e.vec_id, c.cid,
        |    list_sum(list_transform(generate_series(1,64), i ->
        |      CAST(floor((CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
        |        (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
        |        1000000000 + 0.5) AS BIGINT))) AS d2
        |  FROM embeddings e CROSS JOIN cents c),
        |ranked AS (
        |  SELECT vec_id, cid, d2,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |  FROM dists),
        |ab AS (
        |  SELECT a.vec_id, a.cid, a.d2 AS a2, b.d2 AS b2
        |  FROM ranked a JOIN ranked b
        |    ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
        |pv AS (
        |  SELECT vec_id, cid,
        |    CASE WHEN greatest(a2, b2) > 0
        |      THEN (b2 - a2) * 1000000 // greatest(a2, b2) ELSE 0 END AS s_ppm
        |  FROM ab)
        |SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(s_ppm) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_s_ppm
        |FROM pv GROUP BY cid ORDER BY cid""".stripMargin,
    "q_embed_drift" ->
      """WITH dims AS (
        |  SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT) AS v_fp
        |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g),
        |means AS (
        |  SELECT label, dim,
        |    (CAST(sum(v_fp) AS BIGINT) // CAST(count(*) AS BIGINT)) // 1000
        |      AS mean_u
        |  FROM dims GROUP BY label, dim)
        |SELECT a.label AS l1, b.label AS l2,
        |  CAST(sum((a.mean_u - b.mean_u) * (a.mean_u - b.mean_u)) AS BIGINT)
        |    AS d2_micro
        |FROM means a JOIN means b ON a.dim = b.dim AND a.label < b.label
        |GROUP BY a.label, b.label ORDER BY l1, l2""".stripMargin,
    "q_readability" ->
      """SELECT doc_id,
        |  greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS words,
        |  greatest(1, CAST(length(regexp_replace(text, '[.!?]+', 'S', 'g'))
        |    - length(regexp_replace(text, '[.!?]+', '', 'g')) AS BIGINT)) AS sentences,
        |  greatest(1, CAST(length(regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'))
        |    - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT)) AS syllables,
        |  CAST(floor((0.39 * (CAST(greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE)
        |        / CAST(greatest(1, CAST(length(regexp_replace(text, '[.!?]+', 'S', 'g'))
        |            - length(regexp_replace(text, '[.!?]+', '', 'g')) AS BIGINT)) AS DOUBLE))
        |    + 11.8 * (CAST(greatest(1, CAST(length(regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'))
        |            - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT)) AS DOUBLE)
        |        / CAST(greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE))
        |    - 15.59) * 1000 + 0.5) AS BIGINT) AS fk_milli
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lsh_sweep" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(tk) - 4),
        |    i -> array_to_string(tk[i:i+4], ' ')))) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) toks),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |tp AS (
        |  -- UNCAPPED truth, exactly like the engine side: the query's
        |  -- truth is jaccardPairsPrefix, which is LOSSLESS (no
        |  -- hot-shingle df cap — RankingSpec pins it equal to the
        |  -- uncapped plain join), so the oracle must not cap either
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |truth AS (
        |  SELECT d1, d2 FROM tp
        |  JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
        |  WHERE shared / (c1.n + c2.n - shared) >= 0.5),
        |hashed AS (
        |  SELECT doc_id, md5('0|' || s) AS m0, md5('1|' || s) AS m1 FROM sh),
        |sigs AS (
        |  SELECT doc_id,
        |    min(substr(m0, 1, 8)) AS h0,
        |    min(substr(m0, 9, 8)) AS h1,
        |    min(substr(m0, 17, 8)) AS h2,
        |    min(substr(m0, 25, 8)) AS h3,
        |    min(substr(m1, 1, 8)) AS h4,
        |    min(substr(m1, 9, 8)) AS h5,
        |    min(substr(m1, 17, 8)) AS h6,
        |    min(substr(m1, 25, 8)) AS h7
        |  FROM hashed GROUP BY doc_id),
        |b1 AS (
        |  SELECT doc_id, u.band AS band, u.sig AS sig
        |  FROM (SELECT doc_id, unnest([struct_pack(band := 0, sig := h0), struct_pack(band := 1, sig := h1), struct_pack(band := 2, sig := h2), struct_pack(band := 3, sig := h3), struct_pack(band := 4, sig := h4), struct_pack(band := 5, sig := h5), struct_pack(band := 6, sig := h6), struct_pack(band := 7, sig := h7)]) AS u FROM sigs) z),
        |b2 AS (
        |  SELECT doc_id, u.band AS band, u.sig AS sig
        |  FROM (SELECT doc_id, unnest([struct_pack(band := 0, sig := h0 || '-' || h1), struct_pack(band := 1, sig := h2 || '-' || h3), struct_pack(band := 2, sig := h4 || '-' || h5), struct_pack(band := 3, sig := h6 || '-' || h7)]) AS u FROM sigs) z),
        |b4 AS (
        |  SELECT doc_id, u.band AS band, u.sig AS sig
        |  FROM (SELECT doc_id, unnest([struct_pack(band := 0, sig := h0 || '-' || h1 || '-' || h2 || '-' || h3), struct_pack(band := 1, sig := h4 || '-' || h5 || '-' || h6 || '-' || h7)]) AS u FROM sigs) z),
        |c1 AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM b1 a JOIN b1 b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |c2 AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM b2 a JOIN b2 b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |c4 AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM b4 a JOIN b4 b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
        |rows_ AS (
        |  SELECT CAST(1 AS BIGINT) AS rows_per_band, CAST(8 AS BIGINT) AS n_bands,
        |    (SELECT CAST(count(*) AS BIGINT) FROM c1) AS n_candidates,
        |    (SELECT CAST(count(*) AS BIGINT) FROM truth t
        |       WHERE EXISTS (SELECT 1 FROM c1 WHERE c1.d1 = t.d1 AND c1.d2 = t.d2)) AS n_found
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), CAST(4 AS BIGINT),
        |    (SELECT CAST(count(*) AS BIGINT) FROM c2),
        |    (SELECT CAST(count(*) AS BIGINT) FROM truth t
        |       WHERE EXISTS (SELECT 1 FROM c2 WHERE c2.d1 = t.d1 AND c2.d2 = t.d2))
        |  UNION ALL
        |  SELECT CAST(4 AS BIGINT), CAST(2 AS BIGINT),
        |    (SELECT CAST(count(*) AS BIGINT) FROM c4),
        |    (SELECT CAST(count(*) AS BIGINT) FROM truth t
        |       WHERE EXISTS (SELECT 1 FROM c4 WHERE c4.d1 = t.d1 AND c4.d2 = t.d2)))
        |SELECT rows_per_band, n_bands, n_candidates, n_found,
        |  CASE WHEN n_true > 0 THEN n_found * 1000000 // n_true ELSE 0 END
        |    AS recall_ppm
        |FROM rows_ CROSS JOIN nt ORDER BY rows_per_band""".stripMargin,
    "q_median_ci" ->
      """WITH vals AS (
        |  SELECT n_name, o_orderkey AS ok,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |ranked AS (
        |  SELECT n_name, v,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY CAST(v AS DOUBLE), ok) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n
        |  FROM vals),
        |br AS (
        |  SELECT n_name, n,
        |    greatest(1, CAST(floor((CAST(n AS DOUBLE) - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)) AS lo_rank,
        |    least(n, CAST(ceil((CAST(n AS DOUBLE) + 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT) + 1) AS hi_rank,
        |    (n + 1) // 2 AS med_rank
        |  FROM (SELECT DISTINCT n_name, n FROM ranked) x)
        |SELECT r.n_name, CAST(max(r.n) AS BIGINT) AS n,
        |  CAST(max(CASE WHEN rnk = lo_rank THEN v END) AS BIGINT) AS ci_lo_cents,
        |  CAST(max(CASE WHEN rnk = med_rank THEN v END) AS BIGINT) AS median_cents,
        |  CAST(max(CASE WHEN rnk = hi_rank THEN v END) AS BIGINT) AS ci_hi_cents
        |FROM ranked r JOIN br ON r.n_name = br.n_name
        |WHERE rnk = lo_rank OR rnk = med_rank OR rnk = hi_rank
        |GROUP BY r.n_name ORDER BY r.n_name""".stripMargin,
    "q_keyness" ->
      """WITH toks AS (
        |  SELECT lang = 'en' AS is_en, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |counts AS (
        |  SELECT w,
        |    CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS o1,
        |    CAST(sum(CASE WHEN NOT is_en THEN 1 ELSE 0 END) AS BIGINT) AS o2
        |  FROM toks WHERE length(w) > 0
        |  GROUP BY w HAVING sum(CASE WHEN is_en THEN 1 ELSE 0 END)
        |    + sum(CASE WHEN NOT is_en THEN 1 ELSE 0 END) >= 10),
        |tots AS (
        |  SELECT CAST(sum(o1) AS BIGINT) AS r1, CAST(sum(o2) AS BIGINT) AS r2
        |  FROM counts),
        |g AS (
        |  SELECT w, o1, o2,
        |    CAST(floor(2.0 * (
        |      CASE WHEN o1 > 0 THEN CAST(o1 AS DOUBLE)
        |        * ln((CAST(o1 AS DOUBLE) * CAST(r1 + r2 AS DOUBLE))
        |             / (CAST(r1 AS DOUBLE) * CAST(o1 + o2 AS DOUBLE)))
        |      ELSE 0.0 END
        |      + CASE WHEN o2 > 0 THEN CAST(o2 AS DOUBLE)
        |        * ln((CAST(o2 AS DOUBLE) * CAST(r1 + r2 AS DOUBLE))
        |             / (CAST(r2 AS DOUBLE) * CAST(o1 + o2 AS DOUBLE)))
        |      ELSE 0.0 END) * 1000000 + 0.5) AS BIGINT) AS g2_unat
        |  FROM counts CROSS JOIN tots)
        |SELECT w, o1, o2, g2_unat
        |FROM g ORDER BY g2_unat DESC, w LIMIT 20""".stripMargin,
    "q_cronbach" ->
      """WITH items AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS s1,
        |    n_chars // 10 AS s2,
        |    CAST(length(regexp_replace(text, '[.!?]+', 'S', 'g'))
        |      - length(regexp_replace(text, '[.!?]+', '', 'g')) AS BIGINT) * 10
        |      AS s3
        |  FROM documents),
        |w AS (SELECT s1, s2, s3, s1 + s2 + s3 AS tot FROM items),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(s1) AS BIGINT) AS a1, CAST(sum(s1 * s1) AS BIGINT) AS q1,
        |    CAST(sum(s2) AS BIGINT) AS a2, CAST(sum(s2 * s2) AS BIGINT) AS q2,
        |    CAST(sum(s3) AS BIGINT) AS a3, CAST(sum(s3 * s3) AS BIGINT) AS q3,
        |    CAST(sum(tot) AS BIGINT) AS at, CAST(sum(tot * tot) AS BIGINT) AS qt
        |  FROM w)
        |SELECT n,
        |  (3.0 / 2.0) * (1.0 - (
        |      (CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE) - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
        |    + (CAST(n AS DOUBLE) * CAST(q2 AS DOUBLE) - CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
        |    + (CAST(n AS DOUBLE) * CAST(q3 AS DOUBLE) - CAST(a3 AS DOUBLE) * CAST(a3 AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |    / ((CAST(n AS DOUBLE) * CAST(qt AS DOUBLE) - CAST(at AS DOUBLE) * CAST(at AS DOUBLE)) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
        |    AS alpha
        |FROM m""".stripMargin,
    "q_simpsons" ->
      """WITH li AS (
        |  SELECT n_name, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 100 AS y
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |per_nation AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM li GROUP BY n_name),
        |pooled AS (
        |  SELECT CAST(count(*) AS BIGINT) * CAST(sum(x * y) AS BIGINT)
        |    - CAST(sum(x) AS BIGINT) * CAST(sum(y) AS BIGINT) AS num_pooled
        |  FROM li)
        |SELECT n_name, n, n * sxy - sx * sy AS num_own, num_pooled,
        |  ((n * sxy - sx * sy > 0 AND num_pooled < 0)
        |    OR (n * sxy - sx * sy < 0 AND num_pooled > 0)) AS reversed
        |FROM per_nation CROSS JOIN pooled ORDER BY n_name""".stripMargin,
    "q_boilerplate" ->
      """WITH sents AS (
        |  SELECT doc_id, source, unnest(string_split(text, '. ')) AS sent
        |  FROM documents),
        |fs AS (SELECT doc_id, source, sent FROM sents WHERE length(sent) > 20),
        |df AS (
        |  SELECT sent, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
        |  FROM fs GROUP BY sent),
        |j AS (SELECT fs.source, fs.sent, df.doc_freq
        |      FROM fs JOIN df ON fs.sent = df.sent)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_sentences,
        |  CAST(sum(CASE WHEN doc_freq >= 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boiler,
        |  CAST(sum(CASE WHEN doc_freq >= 5 THEN length(sent) ELSE 0 END)
        |    AS BIGINT) * 1000000
        |    // CAST(sum(length(sent)) AS BIGINT) AS boiler_char_ppm
        |FROM j GROUP BY source ORDER BY source""".stripMargin,
    "q_fertility" ->
      """WITH f AS (
        |  SELECT lang, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |      w -> (length(w) + 3) // 4)) AS BIGINT) AS est_tokens
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(words) AS BIGINT) AS total_words,
        |  CAST(sum(est_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(est_tokens) AS BIGINT) * 1000000
        |    // CAST(sum(words) AS BIGINT) AS fertility_ppm,
        |  CAST(sum(n_chars) AS BIGINT) * 1000000
        |    // CAST(sum(est_tokens) AS BIGINT) AS chars_per_token_ppm
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,
    "q_curriculum" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS words,
        |    CAST(floor((0.39 * (CAST(greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE)
        |          / CAST(greatest(1, CAST(length(regexp_replace(text, '[.!?]+', 'S', 'g'))
        |              - length(regexp_replace(text, '[.!?]+', '', 'g')) AS BIGINT)) AS DOUBLE))
        |      + 11.8 * (CAST(greatest(1, CAST(length(regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'))
        |              - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT)) AS DOUBLE)
        |          / CAST(greatest(1, CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE))
        |      - 15.59) * 1000 + 0.5) AS BIGINT) AS fk_milli
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, words, fk_milli,
        |    CAST(row_number() OVER (
        |      ORDER BY CAST(fk_milli AS DOUBLE), doc_id) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM scored)
        |SELECT (rnk - 1) * 4 // n + 1 AS stage,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(fk_milli) AS BIGINT) AS fk_min_milli,
        |  CAST(max(fk_milli) AS BIGINT) AS fk_max_milli,
        |  CAST(sum(words) AS BIGINT) AS total_words,
        |  CAST(sum(words) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_words
        |FROM ranked GROUP BY 1 ORDER BY stage""".stripMargin,
    "q_lof" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        |adots AS (
        |  SELECT e.vec_id, c.cid,
        |    list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) AS d
        |  FROM embeddings e CROSS JOIN cents c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        |    FROM adots) x WHERE rn = 1),
        |vecs AS (
        |  SELECT a.cid, e.vec_id, e.embedding
        |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
        |d2 AS (
        |  SELECT a.cid, a.vec_id AS p, b.vec_id AS o,
        |    list_sum(list_transform(generate_series(1,64), i ->
        |      CAST(floor((CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
        |        (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
        |        1000000000 + 0.5) AS BIGINT))) AS d2
        |  FROM vecs a JOIN vecs b
        |    ON a.cid = b.cid AND a.vec_id <> b.vec_id),
        |rnked AS (
        |  SELECT cid, p, o, d2,
        |    row_number() OVER (PARTITION BY p ORDER BY d2, o) AS rnk
        |  FROM d2),
        |kdist AS (SELECT p AS o, d2 AS kdist_o FROM rnked WHERE rnk = 3),
        |neighbors AS (
        |  SELECT r.cid, r.p, r.o, greatest(r.d2, k.kdist_o) AS reach
        |  FROM rnked r JOIN kdist k ON r.o = k.o
        |  WHERE r.rnk <= 3),
        |lrd AS (
        |  SELECT cid, p,
        |    least(3 * 1000000000000000000 // CAST(sum(reach) AS BIGINT),
        |      1000000000000) AS lrd
        |  FROM neighbors GROUP BY cid, p
        |  HAVING sum(reach) > 0),
        |agg AS (
        |  SELECT n.p, CAST(sum(lo.lrd) AS BIGINT) AS sum_lrd_o
        |  FROM neighbors n JOIN lrd lo ON n.o = lo.p
        |  GROUP BY n.p)
        |SELECT l.cid, a.p AS vec_id,
        |  sum_lrd_o * 1000000 // (3 * l.lrd) AS lof_ppm
        |FROM agg a JOIN lrd l ON a.p = l.p
        |ORDER BY lof_ppm DESC, vec_id LIMIT 20""".stripMargin,
    "q_knn_eval" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        |adots AS (
        |  SELECT e.vec_id, c.cid,
        |    list_sum(list_transform(generate_series(1,64), i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT))) AS d
        |  FROM embeddings e CROSS JOIN cents c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        |    FROM adots) x WHERE rn = 1),
        |vecs AS (
        |  SELECT a.cid, e.vec_id, e.embedding, CAST(e.label AS BIGINT) AS label
        |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
        |nb AS (
        |  SELECT p, o, label_o FROM (
        |    SELECT a.vec_id AS p, b.vec_id AS o, b.label AS label_o,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1,64), i ->
        |          CAST(floor((CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
        |            (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
        |            1000000000 + 0.5) AS BIGINT))), b.vec_id) AS rnk
        |    FROM vecs a JOIN vecs b
        |      ON a.cid = b.cid AND a.vec_id <> b.vec_id) x
        |  WHERE rnk <= 3),
        |votes AS (
        |  SELECT p, label_o AS pred FROM (
        |    SELECT p, label_o, count(*) AS votes,
        |      row_number() OVER (PARTITION BY p
        |        ORDER BY count(*) DESC, label_o) AS vr
        |    FROM nb GROUP BY p, label_o) x
        |  WHERE vr = 1)
        |SELECT v.label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN votes.pred = v.label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS correct,
        |  CAST(sum(CASE WHEN votes.pred = v.label THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS acc_ppm
        |FROM votes JOIN vecs v ON votes.p = v.vec_id
        |GROUP BY v.label ORDER BY v.label""".stripMargin,
    "q_epoch_mix" ->
      """WITH bysrc AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |sc AS (
        |  SELECT source, tokens,
        |    CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS sc
        |  FROM bysrc),
        |w AS (
        |  SELECT source, tokens, sc,
        |    CAST((SELECT sum(sc) FROM sc) AS BIGINT) AS tot
        |  FROM sc),
        |b AS (
        |  SELECT *, (1000000000 * sc) // tot AS base,
        |    (1000000000 * sc) % tot AS frac
        |  FROM w),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY frac DESC, source) AS rn,
        |    1000000000 - sum(base) OVER () AS short
        |  FROM b)
        |SELECT source, tokens,
        |  CAST((1000000 * sc) // tot AS BIGINT) AS weight_ppm,
        |  CAST(base + CASE WHEN rn <= short THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
        |FROM r ORDER BY source""".stripMargin,
    "q_naive_bayes" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |tc AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c
        |       FROM toks GROUP BY 1, 2),
        |ct AS (SELECT lang, CAST(count(*) AS BIGINT) AS t FROM toks GROUP BY 1),
        |vb AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM toks),
        |pr AS (
        |  SELECT lang,
        |    CAST((1000000 * count(*)) // (SELECT count(*) FROM documents) AS BIGINT)
        |      AS prior_ppm
        |  FROM documents GROUP BY lang),
        |r AS (
        |  SELECT tc.lang, token, c,
        |    CAST(((c + 1) * 1000000) // (t + v) AS BIGINT) AS p_ppm,
        |    row_number() OVER (PARTITION BY tc.lang
        |      ORDER BY c DESC, token) AS rn
        |  FROM tc JOIN ct ON tc.lang = ct.lang CROSS JOIN vb)
        |SELECT r.lang, CAST(rn AS BIGINT) AS rn, token, c, p_ppm, prior_ppm
        |FROM r JOIN pr ON r.lang = pr.lang
        |WHERE rn <= 5 ORDER BY r.lang, rn""".stripMargin,
    "q_simhash_hamming" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS h FROM tok),
        |votes AS (
        |  SELECT doc_id, j,
        |    sum(CASE WHEN (h // CAST(2**j AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(range(32)) AS j) js
        |  GROUP BY doc_id, j),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN v > 0 THEN CAST(2**j AS BIGINT) ELSE 0 END) AS BIGINT) AS fp
        |  FROM votes GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, fp, b,
        |    (fp // CAST(2**(8*b) AS BIGINT)) % 256 AS key
        |  FROM sh CROSS JOIN (SELECT unnest(range(4)) AS b) bs),
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
        |    CAST(bit_count(xor(x.fp, y.fp)) AS BIGINT) AS hamming
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id)
        |SELECT d1, d2, hamming FROM pairs
        |WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin,
    "q_hof_funcs" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents WHERE doc_id % 25 = 0)
        |SELECT doc_id,
        |  CAST(len(list_filter(tk, t -> len(t) > 4)) AS BIGINT) AS n_long,
        |  CAST(list_sum(list_transform(tk, t -> len(t))) AS BIGINT) AS total_chars,
        |  CAST(list_sum(list_transform(tk, t -> len(t) * len(t))) AS BIGINT) AS sum_sq,
        |  list_contains(tk, 'spark') AS has_spark,
        |  len(list_filter(tk, t -> t = lower(t))) = len(tk) AS all_lower,
        |  array_to_string(list_sort(tk)[1:3], ',') AS first3
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, tk[i] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |      FROM documents WHERE doc_id % 50 = 0) d
        |CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS i) idx
        |WHERE i <= len(tk)
        |ORDER BY doc_id, pos""".stripMargin,
    "q_cdc_chunks" ->
      s"""WITH $duckCdcChunks
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(max(n_toks) AS BIGINT) AS max_chunk,
         |  CAST(sum(n_toks) AS BIGINT) AS total_toks
         |FROM chunks GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_chunk_dedup" ->
      s"""WITH $duckCdcChunks
         |SELECT d.source, CAST(count(*) AS BIGINT) AS total_chunks,
         |  CAST(count(DISTINCT c.chunk_hash) AS BIGINT) AS uniq_chunks,
         |  CAST((1000000 * count(DISTINCT c.chunk_hash)) // count(*) AS BIGINT)
         |    AS dedup_ppm
         |FROM chunks c JOIN documents d ON c.doc_id = d.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q_rrf" ->
      """WITH m AS (
        |  SELECT doc_id, n_chars,
        |    len(list_distinct(string_split(text, ' '))) AS nu
        |  FROM documents),
        |ra AS (SELECT doc_id,
        |         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r1
        |       FROM m),
        |rb AS (SELECT doc_id,
        |         row_number() OVER (ORDER BY nu DESC, doc_id) AS r2
        |       FROM m)
        |SELECT ra.doc_id, CAST(r1 AS BIGINT) AS rank_len,
        |  CAST(r2 AS BIGINT) AS rank_uniq,
        |  CAST(1000000000 // (60 + r1) + 1000000000 // (60 + r2) AS BIGINT)
        |    AS rrf_fp
        |FROM ra JOIN rb ON ra.doc_id = rb.doc_id
        |ORDER BY rrf_fp DESC, ra.doc_id LIMIT 25""".stripMargin,
    "q_source_card" ->
      """WITH base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS est_tokens,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS uniq_texts,
        |    CAST(sum(n_chars) AS BIGINT) AS chars
        |  FROM documents GROUP BY source),
        |sl AS (
        |  SELECT source, lang, count(*) AS ln_,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY count(*) DESC, lang) AS rn
        |  FROM documents GROUP BY source, lang)
        |SELECT b.source, n_docs, est_tokens, n_langs, sl.lang AS top_lang,
        |  CAST((1000000 * (n_docs - uniq_texts)) // n_docs AS BIGINT) AS dup_ppm,
        |  CAST(chars // n_docs AS BIGINT) AS mean_chars
        |FROM base b JOIN sl ON b.source = sl.source AND sl.rn = 1
        |ORDER BY b.source""".stripMargin,
    "q_matryoshka_eval" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id IN (0, 7, 42)),
         |cf AS (
         |  SELECT qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "qv"),
                        duckDot("e.embedding", "e.embedding"),
                        duckDot("qv", "qv"))} AS cos
         |  FROM embeddings e CROSS JOIN q),
         |rf AS (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |    ORDER BY greatest(0, CAST(floor((1.0 - cos) * 1000000000 + 0.5) AS BIGINT)),
         |      vec_id) AS rn
         |  FROM cf),
         |ct AS (
         |  SELECT qid, e.vec_id,
         |    ${duckCos(duckDot("e.embedding", "qv", 16),
                        duckDot("e.embedding", "e.embedding", 16),
                        duckDot("qv", "qv", 16))} AS cos
         |  FROM embeddings e CROSS JOIN q),
         |rt AS (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |    ORDER BY greatest(0, CAST(floor((1.0 - cos) * 1000000000 + 0.5) AS BIGINT)),
         |      vec_id) AS rn
         |  FROM ct)
         |SELECT f.qid, CAST(count(*) AS BIGINT) AS n_overlap,
         |  CAST((1000000 * count(*)) // 10 AS BIGINT) AS overlap_ppm
         |FROM rf f JOIN rt t ON f.qid = t.qid AND f.vec_id = t.vec_id
         |WHERE f.rn <= 10 AND t.rn <= 10
         |GROUP BY f.qid ORDER BY f.qid""".stripMargin,
    "q_source_overlap" ->
      s"""WITH $duckShingles,
         |ss AS (
         |  SELECT DISTINCT d.source, sh.s
         |  FROM sh JOIN documents d ON sh.doc_id = d.doc_id),
         |spread AS (SELECT s, count(*) AS nsrc FROM ss GROUP BY s)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN nsrc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST((1000000 * sum(CASE WHEN nsrc > 1 THEN 1 ELSE 0 END)) // count(*)
         |    AS BIGINT) AS shared_ppm
         |FROM ss JOIN spread USING (s)
         |GROUP BY source ORDER BY source""".stripMargin,
    "q_array_set_ops" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id,
        |    CAST(len(list_filter(a.tk, t -> list_contains(b.tk, t))) AS BIGINT)
        |      AS n_common,
        |    CAST(len(a.tk) AS BIGINT) AS na, CAST(len(b.tk) AS BIGINT) AS nb
        |  FROM d a JOIN d b ON a.doc_id + 1 = b.doc_id)
        |SELECT doc_id, n_common, na + nb - n_common AS n_union,
        |  na - n_common AS n_only_left,
        |  CAST((1000000 * n_common) // (na + nb - n_common) AS BIGINT)
        |    AS jaccard_ppm
        |FROM p WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin,
    "q_inbatch_negatives" ->
      """WITH b AS (
        |  SELECT CAST('0x' || substr(md5('b|' || CAST(vec_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 16 AS batch, label
        |  FROM embeddings),
        |bl AS (
        |  SELECT batch, label, CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2)
        |SELECT batch, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(sum(c * (c - 1) // 2) AS BIGINT) AS same_label_pairs,
        |  CAST(sum(c) * (sum(c) - 1) // 2 AS BIGINT) AS all_pairs,
        |  CAST((1000000 * sum(c * (c - 1) // 2))
        |    // (sum(c) * (sum(c) - 1) // 2) AS BIGINT) AS collision_ppm
        |FROM bl GROUP BY batch ORDER BY batch""".stripMargin,
    "q_filter_sweep" -> {
      val stops = TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH f AS (
         |  SELECT doc_id, len(tk) AS n_tokens,
         |    least(len(list_filter(tk, t -> list_contains([$stops], t))) / len(tk) * 2.0, 1.0) * 0.4
         |      + len(list_distinct(tk)) / len(tk) * 0.4
         |      + least(len(tk) / 256.0, 1.0) * 0.2 AS quality_score
         |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t),
         |buckets AS (
         |  SELECT CAST(floor(quality_score * 10) AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS docs, CAST(sum(n_tokens) AS BIGINT) AS toks
         |  FROM f GROUP BY 1),
         |c AS (
         |  SELECT bucket,
         |    CAST(sum(docs) OVER (ORDER BY bucket DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kept_docs,
         |    CAST(sum(toks) OVER (ORDER BY bucket DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kept_tokens,
         |    CAST(sum(toks) OVER () AS BIGINT) AS total_tokens
         |  FROM buckets)
         |SELECT bucket AS threshold_decile, kept_docs, kept_tokens,
         |  CAST((1000000 * kept_tokens) // total_tokens AS BIGINT) AS kept_ppm
         |FROM c ORDER BY threshold_decile""".stripMargin
    },
    "q_jsd" ->
      """WITH grid AS (
        |  SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang),
        |by_src AS (SELECT source, sum(n) AS n_s FROM grid GROUP BY source),
        |by_lang AS (SELECT lang, sum(n) AS g_l FROM grid GROUP BY lang),
        |tot AS (SELECT sum(n) AS g FROM grid),
        |frame AS (
        |  SELECT s.source, s.n_s, l.lang, l.g_l,
        |    COALESCE(grid.n, 0) AS n, l.g_l - COALESCE(grid.n, 0) AS r_l,
        |    (SELECT g FROM tot) - s.n_s AS rest
        |  FROM by_src s CROSS JOIN by_lang l
        |  LEFT JOIN grid ON grid.source = s.source AND grid.lang = l.lang),
        |termed AS (
        |  SELECT source, n_s,
        |    CAST(floor(CASE WHEN n > 0 THEN
        |      (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE)) *
        |      ln(2.0 * (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE)) /
        |         (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE) + CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)))
        |      * 1000000 ELSE 0.0 END + 0.5) AS BIGINT) AS tp,
        |    CAST(floor(CASE WHEN r_l > 0 THEN
        |      (CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)) *
        |      ln(2.0 * (CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)) /
        |         (CAST(n AS DOUBLE)/CAST(n_s AS DOUBLE) + CAST(r_l AS DOUBLE)/CAST(rest AS DOUBLE)))
        |      * 1000000 ELSE 0.0 END + 0.5) AS BIGINT) AS tq
        |  FROM frame)
        |SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
        |  CAST(sum(tp + tq) AS BIGINT) AS jsd_x2_micro
        |FROM termed GROUP BY source ORDER BY source""".stripMargin,
    "q_unicode_norm" ->
      """WITH b AS (
        |  SELECT n_nationkey, lower(n_name) AS base FROM nation),
        |built AS (
        |  SELECT n_nationkey,
        |    translate(base, 'aeiou',
        |      chr(225) || chr(233) || chr(237) || chr(246) || chr(252)) AS accented,
        |    replace(replace(replace(replace(replace(base,
        |      'a', 'a' || chr(769)), 'e', 'e' || chr(769)),
        |      'i', 'i' || chr(769)), 'o', 'o' || chr(776)),
        |      'u', 'u' || chr(776)) AS decomposed
        |  FROM b)
        |SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, accented,
        |  nfc_normalize(decomposed) AS recomposed,
        |  strip_accents(accented) AS stripped,
        |  nfc_normalize(decomposed) = accented AS roundtrip_ok
        |FROM built ORDER BY n_nationkey""".stripMargin,
    "q_good_turing" ->
      """WITH tri AS (
        |  SELECT unnest(list_transform(generate_series(1, len(tk) - 2),
        |    i -> array_to_string(tk[i:i+2], ' '))) AS g
        |  FROM (SELECT string_split(text, ' ') AS tk FROM documents) t
        |  WHERE len(tk) >= 3),
        |freq AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS r FROM tri GROUP BY g),
        |fof AS (
        |  SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM freq GROUP BY r)
        |SELECT a.r AS r, a.n_r AS n_r, b.n_r AS n_next,
        |  (a.r + 1) * b.n_r * 1000 // a.n_r AS r_star_milli
        |FROM fof a JOIN fof b ON a.r + 1 = b.r
        |WHERE a.r <= 10 ORDER BY r""".stripMargin,
    "q_heaps" ->
      """WITH total AS (SELECT CAST(count(*) AS BIGINT) AS d_total
        |  FROM documents),
        |tri AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 2),
        |    i -> array_to_string(tk[i:i+2], ' '))) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t
        |  WHERE len(tk) >= 3),
        |first AS (
        |  SELECT g, CAST(min(doc_id) AS BIGINT) AS first_doc
        |  FROM tri GROUP BY g),
        |bucketed AS (
        |  SELECT ((first_doc + 1) * 10 + d_total - 1) // d_total
        |      AS checkpoint,
        |    CAST(count(*) AS BIGINT) AS new_types
        |  FROM first CROSS JOIN total GROUP BY 1)
        |SELECT checkpoint, d_total * checkpoint // 10 AS docs_cum,
        |  new_types,
        |  CAST(sum(new_types) OVER (ORDER BY checkpoint
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS vocab_cum
        |FROM bucketed CROSS JOIN total ORDER BY checkpoint""".stripMargin,
    "q_dedup_sweep" ->
      s"""WITH $duckShingles,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |cand AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE s NOT IN (SELECT s FROM sh GROUP BY s
         |                  HAVING count(*) > ${graft.llm.Dedup.DefaultMaxShingleDf})),
         |p AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
         |  FROM cand a JOIN cand b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT d1, d2, CAST(shared AS BIGINT) AS shared,
         |    CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2
         |  FROM p JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
         |  WHERE shared / (c1.n + c2.n - shared) >= 0.05),
         |thr AS (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT) * 100000
         |  AS thr_ppm)
         |SELECT thr_ppm,
         |  CAST(sum(CASE WHEN shared * 1000000 >= thr_ppm * (n1 + n2 - shared)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT CASE WHEN shared * 1000000
         |      >= thr_ppm * (n1 + n2 - shared) THEN d2 END) AS BIGINT)
         |    AS docs_dropped
         |FROM pairs CROSS JOIN thr GROUP BY thr_ppm
         |ORDER BY thr_ppm""".stripMargin,
    "q_vector_norms" ->
      s"""WITH e AS (
         |  SELECT CAST(label AS BIGINT) AS label,
         |    ${duckDot("embedding", "embedding")} AS nrm_fp
         |  FROM embeddings)
         |SELECT label, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(nrm_fp) AS BIGINT) // count(*) AS mean_nrm_fp,
         |  CAST(min(nrm_fp) AS BIGINT) AS min_nrm_fp,
         |  CAST(max(nrm_fp) AS BIGINT) AS max_nrm_fp,
         |  CAST(sum(CASE WHEN nrm_fp < 10000000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS degenerate
         |FROM e GROUP BY label ORDER BY label""".stripMargin,
    "q_novelty" ->
      """WITH typed AS (
        |  SELECT DISTINCT source, g FROM (
        |    SELECT source,
        |      unnest(list_transform(generate_series(1, len(tk) - 2),
        |        i -> array_to_string(tk[i:i+2], ' '))) AS g
        |    FROM (SELECT source, string_split(text, ' ') AS tk
        |          FROM documents) t
        |    WHERE len(tk) >= 3) u),
        |spread AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_sources
        |  FROM typed GROUP BY g)
        |SELECT source, CAST(count(*) AS BIGINT) AS types,
        |  CAST(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS exclusive_types,
        |  CAST(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS novelty_ppm
        |FROM typed JOIN spread USING (g)
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_fairness" ->
      """WITH scored AS (
        |  SELECT lang, n_chars >= 200 AS label,
        |    (40 * len(string_split(text, ' '))
        |      - 10 * length(regexp_replace(text, '[^0-9]', '', 'g'))
        |      - 2 * abs(n_chars - 500) - 1500) >= 0 AS pred
        |  FROM documents),
        |byl AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT) AS kept,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tp
        |  FROM scored GROUP BY lang),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS gn,
        |    CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT) AS gkept,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS gpos,
        |    CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT)
        |      AS gtp
        |  FROM scored)
        |SELECT lang, n,
        |  kept * 1000000 // n AS keep_ppm,
        |  tp * 1000000 // n_pos AS tpr_ppm,
        |  kept * 1000000 // n - gkept * 1000000 // gn AS dp_gap_ppm,
        |  tp * 1000000 // n_pos - gtp * 1000000 // gpos AS eo_gap_ppm
        |FROM byl CROSS JOIN g ORDER BY lang""".stripMargin,
  )
}
