package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines: exact
  * (hash-groupBy), n-gram Jaccard (shared-shingle candidate join),
  * MinHash+LSH (shingle -> minhash -> band -> bucket join), and SimHash.
  *
  * Scale design:
  *  - exact dedup is one hash aggregation on the text digest — the
  *    canonical 100 TB shape (shuffle on a 16-byte key, not the text);
  *  - Jaccard runs on shared-shingle CANDIDATES only (inverted-index
  *    join), never all-pairs; at extreme scale the candidate join keys
  *    should be salted if a shingle becomes hot;
  *  - MinHash/LSH reduces each doc to an 8-hash signature, and the
  *    candidate join runs on (band, band-signature) buckets — the
  *    standard sub-quadratic near-dup path (cf. Broder's shingling and
  *    the MMDS LSH construction);
  *  - hashes are md5-based so results are engine-independent (the
  *    DuckDB oracle computes the identical signatures).
  */
object Dedup {

  /** Distinct k-token shingles of a token array (w-shingling). Native
    * kernel expression — the composed-builtin form
    * (`transform(sequence(...), i -> concat_ws(' ', slice(...)))`) is
    * interpreted per element and was the profiled bottleneck. */
  def shingles(toks: Column, k: Int): Column =
    graft.functions.kernels.word_shingles(toks, k)

  /** (doc_id, shingle) inverted index. */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol), explode(shingles(TextOps.tokens(col(textCol)), k)).as("s"))

  /** Exact dedup by content digest: representative (min id) + group
    * size per distinct text. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Default document-frequency cap for candidate generation: a shingle
    * in d docs contributes O(d^2) candidate pairs, so at corpus scale a
    * boilerplate shingle (license header, template) is a guaranteed hot
    * key. 1000 bounds any one shingle to <=500k candidate pairs while
    * keeping every discriminative shingle; exact-research callers that
    * want the unguarded join opt out with `maxShingleDf = Int.MaxValue`. */
  val DefaultMaxShingleDf = 1000

  /** Exact n-gram Jaccard over shared-shingle candidate pairs.
    * Output: (d1, d2, shared, n1, n2, jaccard) for jaccard >= minSim.
    *
    * The candidate join runs on a 64-bit shingle hash, not the shingle
    * string: an 8-byte shuffle key instead of ~30-byte text. Hash
    * collisions would inflate `shared` by 1 per colliding pair; at
    * 2^-64 per pair this is ignorable far beyond 100 TB corpora (and
    * a full-accuracy variant would just re-verify on strings).
    * The skew guard defaults ON (see DefaultMaxShingleDf). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSim: Double): DataFrame =
    jaccardPairs(docs, idCol, textCol, k, minSim, maxShingleDf = DefaultMaxShingleDf)

  /** `maxShingleDf` is the skew guard for corpus-scale runs: a shingle
    * occurring in d documents contributes O(d^2) candidate pairs, so
    * boilerplate shingles (headers, licenses) explode the join. Capping
    * document frequency drops those "stop shingles" from CANDIDATE
    * GENERATION only — standard near-dup practice (they carry no
    * discriminative signal). Note the Jaccard denominator still counts
    * them, so reported similarity is exact w.r.t. the full shingle sets
    * only when maxShingleDf is unbounded (as in the oracle query). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSim: Double, maxShingleDf: Int): DataFrame =
    candidatePairs(docs, idCol, textCol, k, maxShingleDf)
      .withColumn("jaccard", col("shared") / (col("n1") + col("n2") - col("shared")))
      .filter(col("jaccard") >= minSim)

  /** (doc, 64-bit shingle hash) index over the whole corpus. */
  private[graft] def hashedIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    shingleIndex(docs, idCol, textCol, k)
      .select(col(idCol), xxhash64(col("s")).as("sk"))

  /** Shared-shingle candidate pairs with full-set sizes:
    * (d1, d2, shared, n1, n2) — the common candidate-generation core
    * behind jaccardPairs and containmentPairs, so the skew guard and
    * join shape are defined ONCE. The df cap drops hot shingles from
    * candidate generation only; n1/n2 still count the full sets. */
  private def candidatePairs(docs: DataFrame, idCol: String,
      textCol: String, k: Int, maxShingleDf: Int): DataFrame = {
    // materialize the hashed index ONCE, hash-partitioned on the
    // candidate-join key: it feeds the per-doc sizes, the hot-shingle
    // count, and BOTH sides of the self-join — unmaterialized, each use
    // would re-tokenize and re-shingle the corpus text (4 full text
    // passes), and the self-join would shuffle the index twice. With
    // the checkpoint's stored partitioning both join sides are already
    // co-partitioned, so the join plans with no exchange at all; only
    // the (id, 8-byte hash) index is ever stored, never text.
    val shAll = hashedIndex(docs, idCol, textCol, k)
      .repartition(col("sk"))
      .localCheckpoint(eager = false)
    val counts = shAll.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val sh =
      if (maxShingleDf == Int.MaxValue) shAll
      else {
        // stop shingles are RARE by construction (df > cap), so compute
        // the hot-key list with a map-side-combined count (the shuffle
        // carries distinct shingle hashes, not rows) and drop them via a
        // broadcast anti-join — the full index never reshuffles, unlike
        // a count-over-window formulation that moves every row
        val hot = shAll.groupBy(col("sk")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDf).select(col("sk"))
        shAll.join(broadcast(hot), Seq("sk"), "left_anti")
      }
    sh.as("a").join(sh.as("b"),
        col("a.sk") === col("b.sk") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("shared"))
      .join(counts.select(col(idCol).as("d1"), col("n").as("n1")), "d1")
      .join(counts.select(col(idCol).as("d2"), col("n").as("n2")), "d2")
  }

  /** Asymmetric shingle CONTAINMENT over shared-shingle candidate
    * pairs: containment(A in B) = |A ∩ B| / |A|. Detects sub-document
    * duplication (a short doc quoted inside a long one) that symmetric
    * Jaccard misses: full inclusion of a small doc has near-zero
    * Jaccard but containment 1.0 — the check a curation pipeline runs
    * before dropping "distinct" documents that are really excerpts.
    * Same inverted-index candidate join as jaccardPairs (never
    * all-pairs; df skew guard ON by default); emits both directions'
    * containment per unordered candidate pair, keeping pairs where
    * either direction reaches minContain. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minContain: Double,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame =
    candidatePairs(docs, idCol, textCol, k, maxShingleDf)
      .withColumn("contain_in_1", col("shared") / col("n1"))
      .withColumn("contain_in_2", col("shared") / col("n2"))
      .filter(greatest(col("contain_in_1"), col("contain_in_2")) >= minContain)

  /** Prefix-filtered exact Jaccard join (the AllPairs/PPJoin candidate
    * reduction): identical output to the UNCAPPED jaccardPairs, with
    * candidate generation restricted to each document's PREFIX — its
    * |A| - ⌈t·|A|⌉ + 1 globally-rarest shingles (global order =
    * ascending document frequency, hash tiebreak).
    *
    * Losslessness: Jaccard(A,B) ≥ t implies |A∩B| ≥ t·|A| (since
    * |B| ≥ |A∩B|, the denominator is ≥ |A|, so t ≤ j ≤ o/|A|). If no
    * common shingle fell in A's prefix, every common shingle would sit
    * among A's last ⌈t·|A|⌉ - 1 positions — fewer than the required
    * overlap. Hence the smallest common shingle lies in BOTH prefixes
    * and the prefix-index join generates every qualifying pair.
    *
    * Scale: candidate volume drops from Σ df² over ALL shingles to the
    * prefix-only index — and boilerplate shingles (the hot keys the df
    * cap guards against) have the LARGEST df, sort LAST, and fall out
    * of every prefix, so prefix filtering subsumes the skew guard
    * while staying exact. Candidates are then verified against the
    * full shingle sets (two joins keyed by (doc, shingle-hash)). */
  /** The per-doc rarest-prefix shingle index jaccardPairsPrefix joins
    * on — exposed so scale probes can measure the candidate-volume
    * reduction (Σ C(df,2) over this index vs over the full index). */
  private[graft] def prefixIndex(docs: DataFrame, idCol: String,
      textCol: String, k: Int, minSim: Double): DataFrame =
    prefixIndexFrom(hashedIndex(docs, idCol, textCol, k), idCol, minSim)

  private def prefixIndexFrom(shAll: DataFrame, idCol: String,
      minSim: Double): DataFrame = {
    val counts = shAll.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val dfs = shAll.groupBy(col("sk")).agg(count(lit(1)).as("df"))
    // per-doc global-rarity rank; partitioned by doc (high cardinality,
    // no window funnel) — ceil(t*n) in exact integer arithmetic
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("df"), col("sk"))
    shAll.join(dfs, "sk")
      .withColumn("rn", row_number().over(w))
      .join(counts, idCol)
      // epsilon guards the FP ceil: if n·t lands a hair ABOVE an exact
      // integer, a bare ceil would shorten the prefix by one and could
      // drop a qualifying pair; erring longer only adds candidates.
      // The epsilon must dominate the product's ROUNDING ERROR (a few
      // ulp ≈ x·2e-16), so it scales with the value — an absolute
      // 1e-9 alone is smaller than one ulp once n·t exceeds ~1e7
      // (10M-shingle documents at corpus scale)
      .filter(col("rn") <=
        col("n") - ceil(col("n") * minSim
          - (lit(1e-9) + col("n") * minSim * lit(1e-12))).cast("long") + 1L)
      .select(col(idCol), col("sk"))
  }

  def jaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minSim: Double): DataFrame = {
    // the hashed index feeds five consumers (doc counts, shingle dfs,
    // the prefix join, and both verification joins) — materialize it
    // once rather than re-running the shingle kernel per consumer.
    // (At corpus scale the index may be too large for block storage;
    // there a disk-persisted or recompute strategy is the caller's
    // trade-off — within one query, one materialization wins.)
    // Round-14 A/B, REJECTED: storing the checkpoint hash-partitioned
    // by doc (so the per-doc window, the size counts and the d1-keyed
    // verify join reuse the partitioning) measured flat on
    // q_jaccard_prefix (1.77 vs 1.74 s min-of-7) and WORSE on
    // q_lsh_sweep (2.79 vs 2.43 s): the added full-index exchange is
    // real, while the "saved" exchanges were already being satisfied
    // by AQE broadcasts of the small aggregated sides.
    val shAll = hashedIndex(docs, idCol, textCol, k)
      .localCheckpoint(eager = false)
    val counts = shAll.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val prefix = prefixIndexFrom(shAll, idCol, minSim)
    val candPairs = prefix.as("a").join(prefix.as("b"),
        col("a.sk") === col("b.sk") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .distinct()
    // exact verification on the FULL sets: count shared shingles per
    // candidate pair
    val shared = candPairs
      .join(shAll.select(col(idCol).as("d1"), col("sk")), "d1")
      .join(shAll.select(col(idCol).as("d2"), col("sk")), Seq("d2", "sk"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("shared"))
    shared
      .join(counts.select(col(idCol).as("d1"), col("n").as("n1")), "d1")
      .join(counts.select(col(idCol).as("d2"), col("n").as("n2")), "d2")
      .withColumn("jaccard", col("shared") / (col("n1") + col("n2") - col("shared")))
      .filter(col("jaccard") >= minSim)
  }

  /** MinHash signature columns h0..h{n-1}: hash_j(doc) = min over the
    * doc's shingles of md5(j || '|' || shingle). String-min over md5
    * hex is a valid (engine-portable) min-hash family.
    *
    * Computed entirely with per-row array expressions (transform +
    * array_min) — no explode, no shuffle: each doc's signature is a
    * narrow map, so signature extraction over 100 TB is scan-bound.
    * Docs with fewer than k tokens have no shingles and no signature. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int): DataFrame = {
    // one shingle row -> numHashes codegen'd hash columns -> partial-agg
    // mins: the shuffle carries only (doc_id, numHashes hashes) after
    // map-side combine, never the shingle set. Each md5 yields four
    // independent 32-bit (8-hex) windows, so numHashes hash functions
    // cost ceil(numHashes/4) md5 evaluations per shingle.
    val sh = shingleIndex(docs, idCol, textCol, k)
    val salted = (0 until (numHashes + 3) / 4).map { salt =>
      md5(concat(lit(s"$salt|"), col("s")).cast("binary")).as(s"m$salt")
    }
    val withMd5 = sh.select(col(idCol) +: salted: _*)
    val mins = (0 until numHashes).map { j =>
      min(substring(col(s"m${j / 4}"), 1 + 8 * (j % 4), 8)).as(s"h$j")
    }
    withMd5.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** LSH band buckets from signatures: bands of `rowsPerBand` hashes,
    * band signature = concatenated hashes. */
  def lshBuckets(sigs: DataFrame, idCol: String, numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be divisible by rowsPerBand ($rowsPerBand) — " +
        "trailing hashes would be computed but never bucketed")
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"h$j"))
      struct(lit(b).as("band"), concat_ws("-", cols: _*).as("sig"))
    }
    sigs.select(col(idCol), explode(array(bands: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Near-dup candidate pairs: docs sharing any LSH band bucket. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val buckets = lshBuckets(
      minhashSignatures(docs, idCol, textCol, k, numHashes), idCol, numHashes, rowsPerBand)
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .distinct()
  }

  /** 32-bit SimHash over tokens (frequency-weighted): per bit j, sum
    * +1/-1 votes from bit j of each token's 32-bit md5-derived hash;
    * positive majority sets the bit. Engine-portable via md5 + integer
    * bit ops.
    *
    * Runs as ONE per-row kernel pass (graft.functions.SimHash32) — no
    * explode, no shuffle: the scan is the whole cost at corpus scale.
    * Docs with no tokens yield no row (parity with the exploded form,
    * which drops them at the explode). */
  def simhash32(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        graft.functions.kernels.simhash32(TextOps.tokens(col(textCol))).as("simhash32"))
      .filter(col("simhash32").isNotNull)

  /** Near-dup CLUSTERS from candidate pairs: connected components by
    * iterative min-label propagation — each round every node adopts the
    * minimum label among itself and its neighbors; fixpoint in
    * O(component diameter) rounds (near-dup clusters are shallow, so
    * 3-5 rounds in practice). This is the standard scalable CC shape
    * (cf. the MapReduce CC literature): each round is ONE join keyed by
    * node + one aggregation, no driver-side graph state — only the
    * convergence check (a count) touches the driver. The cluster label
    * is the component's minimum node id, i.e. exactly the
    * representative exact-dedup keeps. */
  def dupClusters(pairs: DataFrame, d1: String, d2: String, maxIter: Int = 20,
      canonicalPairs: Boolean = false): DataFrame = {
    // materialize the edge list ONCE: every iteration joins against it,
    // and without this the (potentially expensive) pair-generation
    // lineage above would re-execute per round.
    // `canonicalPairs = true` is the caller's guarantee that every row
    // has d1 < d2 and the (d1, d2) rows are distinct (jaccardPairs
    // output) — the two union branches are then disjoint and each
    // distinct, so the `.distinct()` (a full exchange + two hash
    // aggregates before the repartition) is a no-op and is skipped
    val undirected = pairs.select(col(d1).as("a"), col(d2).as("b"))
      .union(pairs.select(col(d2).as("a"), col(d1).as("b")))
    val edges = (if (canonicalPairs) undirected else undirected.distinct())
      // hash-partition by the sweep-join side before checkpointing: the
      // checkpointed relation keeps its outputPartitioning, so every
      // sweep's edges⋈labels join reuses it instead of re-shuffling the
      // edge table each sweep (2 sweeps × rounds otherwise)
      .repartition(col("b"))
      // lazy (round-13): round 1's signature agg is the first action
      // and materializes the edge blocks in the same job — one fewer
      // scheduling round-trip over the expensive pair-generation lineage
      .localCheckpoint(eager = false)
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    // one min-label propagation sweep, fused (no materialization)
    def sweep(l: DataFrame): DataFrame = {
      val neighborMin = edges
        .join(l.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      l.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
    }
    // convergence signature: the node set is fixed and labels only ever
    // DECREASE, so the table changed iff its content fingerprint did —
    // one tiny agg over the fresh checkpoint instead of a join against
    // the round-start table every round. The fingerprint is
    // (count, bit_xor(xxhash64(node, label))) — order-independent and
    // OVERFLOW-FREE (a Σlabel would wrap for 60-bit h60-scale ids or
    // throw under ANSI arithmetic; xor cannot), the StarCC
    // edge-fingerprint convention.
    def signature(l: DataFrame): (Long, Long) = {
      val r = l.agg(count(lit(1)),
        expr("bit_xor(xxhash64(node, label))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var iter = 0
    var converged = false
    var sig = (Long.MinValue, Long.MinValue)
    while (!converged && iter < maxIter) {
      // TWO propagation sweeps per materialized round: labels only ever
      // decrease, so extra sweeps between convergence checks are safe,
      // and at small per-round data the checkpoint+count job floor
      // dominates — fusing halves the round-trips. Zero signature
      // change across two sweeps implies a fixed point.
      // Round-14 A/B (sf0.1 dup-pair graph, which single-sweeps to
      // fixpoint — star-shaped clusters): THREE fused sweeps measured
      // strictly worse (q_dup_clusters min-of-7 2.03 vs 1.51 s,
      // q_dedup_keep_best 1.82 vs 1.46 s — same 2 materialized rounds,
      // 50% more sweep work); ONE sweep per round measured flat
      // (1.55/1.48 s) — same round count on diameter-1 data, and it
      // gives up the fused detection margin on deeper graphs. 2 stays.
      // Superseded
      // rounds' blocks are released by the ContextCleaner on GC
      // (Dataset.unpersist does not cover localCheckpoint blocks).
      // lazy checkpoint: the signature agg below is the first action over
      // `next`, so it materializes the blocks in the same job — one job
      // per round instead of eager-materialize + agg
      val next = sweep(sweep(labels)).localCheckpoint(eager = false)
      val nextSig = signature(next)
      converged = iter > 0 && nextSig == sig
      // round 0 has no prior signature: sig starts at a sentinel no
      // real (count, fingerprint) can equal (counts are non-negative)
      sig = nextSig
      labels = next
      iter += 1
    }
    // silent wrong labels would surface only as an inexplicable result
    // mismatch far from the cause — fail loudly instead
    if (!converged) throw new IllegalStateException(
      s"dupClusters did not converge within $maxIter rounds (2 propagation " +
        s"sweeps each, so a component's diameter exceeds ~2x maxIter); raise " +
        s"maxIter (labels would be split clusters)")
    labels.withColumn("is_representative", col("node") === col("label"))
  }

  /** Duplicated-SPAN accounting (the ExactSubstr idea): every
    * `window`-char substring at `stride` fingerprints to an md5
    * digest; a span is duplicated if its digest occurs in >=2 DISTINCT
    * documents. Returns (doc_id, n_spans, n_dup_spans).
    *
    * Scale shape (round-12 skew guard, round-11 verdict #6): ONE wide
    * exchange keyed (digest, salt(doc_id)) feeds BOTH consumers — the
    * dup-digest count chain and the flag join — via ReusedExchange
    * (the round-11 single-explode fix, kept), and the doc-derived salt
    * dilutes a hot boilerplate digest (license header in millions of
    * docs) over `salts` partitions instead of landing it on one.
    * Dup detection is the TWO-LEVEL aggregate (digest, salt) then
    * (digest): count_distinct(doc_id) partitions exactly across
    * doc-derived salts, and its first level runs on the existing
    * exchange; the second level moves only the pre-aggregated
    * (digest, salt) rows. The dup FLAG joins back on digest alone so
    * Catalyst/AQE keeps the auto-broadcast path when the dup set is
    * small (forcing the flag to (digest, salt) granularity was tried
    * and REJECTED by the 10x probe: the salted flag frame outgrows
    * the broadcast threshold and drags the span-volume side through
    * a sort-merge join — growth 29.5x; a per-(doc, digest)
    * pre-collapse before the wide shuffle was likewise rejected at
    * 17.4x: windows are near-unique within a document, so it
    * deduplicated nothing and added a second span-volume exchange —
    * BASELINE.md records all three measurements). Only 16-byte
    * digests shuffle, never text. */
  def dupSpanFractions(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 24, stride: Int = 4, salts: Int = 64): DataFrame = {
    // Documents shorter than `window` chars have no spans: guarded HERE
    // (not just in callers) because sequence(1, len-(w-1), stride) throws
    // on start > stop — the empty array explodes to zero rows, so such
    // docs contribute no output row (round-12 advice #2).
    val spans = docs.select(col(idCol).as("doc_id"),
      explode(expr(
        s"CASE WHEN length($textCol) >= $window THEN " +
          s"transform(sequence(1, length($textCol) - ${window - 1}, $stride)," +
          s" i -> md5(cast(substring($textCol, i, $window) as binary))) " +
          s"ELSE array() END"))
        .as("digest"))
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts)))
      .repartition(col("digest"), col("salt"))
    val bySalt = spans.groupBy(col("digest"), col("salt"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    val dup = bySalt.groupBy(col("digest"))
      .agg(sum(col("nd")).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select(col("digest"), lit(1L).as("is_dup"))
    spans.join(dup, Seq("digest"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_spans"))
  }

  /** Benchmark contamination: per document, the fraction of its k-token
    * shingles that also occur in a benchmark/eval corpus — the standard
    * n-gram decontamination check before pretraining. The benchmark's
    * distinct shingle hashes are BROADCAST (eval sets are small by
    * definition), so the corpus side is a narrow scan + broadcast join +
    * one aggregation keyed by doc — no corpus-wide shuffle of text.
    * Documents with fewer than k tokens have no shingles and no row. */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, k: Int): DataFrame = {
    val docSh = shingleIndex(docs, idCol, textCol, k)
      .select(col(idCol), xxhash64(col("s")).as("sk"))
      // two aggregation subtrees (counts + hits) read this index; left
      // unmaterialized each would re-tokenize and re-shingle the whole
      // corpus — the candidatePairs checkpoint discipline applies here
      // identically
      .localCheckpoint(eager = false)
    val benchSh = benchmark
      .select(explode(shingles(TextOps.tokens(col(benchTextCol)), k)).as("s"))
      .select(xxhash64(col("s")).as("sk")).distinct()
    val counts = docSh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val hits = docSh.join(broadcast(benchSh), "sk")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
    counts.join(hits, Seq(idCol), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contamination", col("n_contaminated") / col("n_shingles"))
  }

  /** The explode-based formulation simhash32 replaced (32 bit-vote rows
    * per token through two shuffles). Kept as the semantic reference for
    * the kernel's parity test — do not use at scale. */
  private[graft] def simhash32Exploded(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("t"))
      .withColumn("h", conv(substring(md5(col("t").cast("binary")), 1, 8), 16, 10).cast("long"))
    val votes = tok
      .withColumn("j", explode(array((0 until 32).map(lit(_)): _*)))
      .groupBy(col(idCol), col("j"))
      .agg(sum(when(expr("(h div cast(pow(2, j) as bigint)) % 2") === 1, 1).otherwise(-1)).as("v"))
    votes.groupBy(col(idCol))
      .agg(sum(when(col("v") > 0, expr("cast(pow(2, j) as bigint)")).otherwise(0L)).as("simhash32"))
  }
}
