package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, mirroring how ANN systems scale:
  *  - brute-force cosine top-k — the exact baseline; one broadcast of
  *    the query vector, a narrow map computing dots, a top-k reduction
  *    (`orderBy.limit` -> TakeOrderedAndProject, which is a per-partition
  *    heap + driver merge, NOT a global sort);
  *  - IVF-style bucketed search — vectors are pre-assigned to their
  *    nearest centroid (inverted file), and a query probes only its
  *    centroid's bucket: the classic recall/throughput trade
  *    (cf. Faiss/IVF literature). Here centroids are a deterministic
  *    seed set so the oracle can replay assignment exactly.
  *
  * Fixed-point discipline: dot products are quantized per term to 1e-9
  * (`floor(x*y*1e9 + 0.5)` summed as bigints) — order-independent exact
  * integer reduction, bit-identical across engines and partitionings,
  * at a resolution far below float32 embedding noise.
  */
object Similarity {

  private val Scale = 1e9

  /** Fixed-point dot product of two float-array columns (exact bigint).
    * Native kernel expression — the `aggregate(zip_with(...))` form is
    * interpreted per element (graft.functions.FixedPointDot docs). */
  def dotFp(a: Column, b: Column): Column =
    graft.functions.kernels.fixed_point_dot(a, b)

  /** Cosine similarity from fixed-point dots (deterministic doubles). */
  def cosineFp(a: Column, b: Column): Column =
    (dotFp(a, b) / Scale) /
      (sqrt(dotFp(a, a) / Scale) * sqrt(dotFp(b, b) / Scale))

  /** Brute-force cosine top-k against one query vector (broadcast). */
  def topK(emb: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int): DataFrame =
    emb.crossJoin(broadcast(query))
      .select(col(idCol), cosineFp(col(vecCol), col(queryVecCol)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** IVF assignment: nearest centroid per vector (argmax dot via
    * row_number over exact fixed-point dots — deterministic ties). */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val dots = emb.crossJoin(broadcast(centroids))
      .select(col(idCol), col(cidCol), dotFp(col(vecCol), col(cvecCol)).as("d"))
    dots.withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("d").desc, col(cidCol))))
      .filter(col("rn") === 1)
      .select(col(idCol), col(cidCol))
  }

  /** Deterministic sign-random-projection (SRP) LSH: hyperplane
    * components are md5-derived values in [-1, 1] (a pure function of
    * (plane, dim), reproducible in any engine), and signature bit p is
    * the sign of the fixed-point dot with hyperplane p. Vectors in the
    * same signature bucket are ANN candidates — the classic
    * sub-quadratic alternative to IVF when no centroids exist
    * (Charikar's SRP construction). */
  def hyperplane(p: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val hex = md.digest(s"hp|$p|$i".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 2001 - 1000) / 1000.0
    }
  }

  /** SRP signature column: long with one sign bit per hyperplane.
    * `numPlanes` is capped at 64 — past that `1L << p` wraps mod 64
    * and two planes share a bit, whose `+`-combine then CARRIES into
    * the neighbor bit and scrambles the whole signature (colliding
    * unrelated vectors, separating true neighbors) with no error. */
  def srpSignature(vecCol: Column, numPlanes: Int, dim: Int): Column = {
    require(numPlanes >= 1 && numPlanes <= 64,
      s"srpSignature supports 1..64 hyperplanes per long, got $numPlanes")
    (0 until numPlanes).map { p =>
      when(dotFp(typedLit(hyperplane(p, dim).toSeq), vecCol) >= 0, 1L << p)
        .otherwise(0L)
    }.reduce(_ + _)
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * 4x storage/bandwidth compression for ANN indexes: per-vector scale
    * = max|x| / 127, codes = round-half-up(x / scale) in [-127, 127].
    * Rounding is `floor(x + 0.5)` (pure IEEE, engine-portable — NOT
    * `round()`, whose half-even/decimal-string behavior differs across
    * engines). A zero vector quantizes to all-zero codes with scale 0.
    * Adds: `scale` (double), `codes` (array<int>), and `abs_err_fp`
    * (total |x - code*scale| quantized at 1e-9 and summed exactly — the
    * reconstruction-error audit). One per-row native kernel pass
    * (graft.functions.QuantizeInt8); the composed-builtin form below is
    * the semantic reference for its parity test. */
  def quantizeInt8(emb: DataFrame, vecCol: String): DataFrame =
    emb.withColumn("q", graft.functions.kernels.quantize_int8(col(vecCol)))
      .withColumn("scale", col("q.scale"))
      .withColumn("codes", col("q.codes"))
      .withColumn("abs_err_fp", col("q.abs_err_fp"))
      .drop("q")

  /** Interpreted higher-order-function formulation of [[quantizeInt8]]
    * — kept only as the kernel's parity reference; do not use at scale
    * (per-element closure evaluation). */
  private[graft] def quantizeInt8Composed(emb: DataFrame, vecCol: String): DataFrame = {
    val x = col(vecCol)
    val maxAbs = array_max(transform(x, v => abs(v.cast("double"))))
    val scale = when(maxAbs > 0, maxAbs / 127.0).otherwise(lit(0.0))
    emb.withColumn("scale", scale)
      .withColumn("codes",
        when(col("scale") > 0,
          transform(x, v => floor(v.cast("double") / col("scale") + 0.5).cast("int")))
          .otherwise(transform(x, _ => lit(0))))
      .withColumn("abs_err_fp",
        aggregate(
          zip_with(x, col("codes"), (v, c) =>
            floor(abs(v.cast("double") - c.cast("double") * col("scale")) * 1e9 + 0.5)
              .cast("long")),
          lit(0L), (acc, t) => acc + t))
  }

  /** Embedding near-dup pairs within blocking keys (e.g. a coarse
    * cluster/label): all pairs inside a block with cosine >= minSim.
    * Blocking keeps the pair join linear in block size — the same role
    * LSH bands play for text. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      blockCol: String, minSim: Double): DataFrame = {
    // norms once per vector, not once per pair
    val withNorm = emb.withColumn("nrm", dotFp(col(vecCol), col(vecCol)))
    withNorm.as("a").join(withNorm.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("v1"), col(s"b.$idCol").as("v2"),
        ((dotFp(col(s"a.$vecCol"), col(s"b.$vecCol")) / Scale) /
          (sqrt(col("a.nrm") / Scale) * sqrt(col("b.nrm") / Scale))).as("cosine"))
      .filter(col("cosine") >= minSim)
  }

  /** Per-subspace split of a vector column: one row per (row, subspace
    * s) with the s-th `subdim`-wide slice. The explode is bounded by
    * the subspace count — a constant fan-out, like the LSH band split. */
  def subVectors(df: DataFrame, vecCol: String,
      subspaces: Int, subdim: Int): DataFrame =
    df.withColumn("s", explode(sequence(lit(0), lit(subspaces - 1))))
      .withColumn("sub", slice(col(vecCol), col("s") * subdim + 1, lit(subdim)))

  /** Product-quantization code assignment (Jégou et al., TPAMI 2011):
    * each vector's subspace slice maps to its nearest sub-centroid
    * (argmax fixed-point dot, ties to the smallest centroid id), so a
    * dim-D float vector compresses to `subspaces` small codes — the
    * memory step that makes billion-vector ANN fit. `cents` carries
    * (s, cid, csub); the argmax is a map-side-combining aggregate and
    * the centroid table rides along broadcast: the corpus never
    * shuffles except on its own id. */
  def pqAssign(emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, subspaces: Int, subdim: Int): DataFrame =
    subVectors(emb, vecCol, subspaces, subdim)
      .select(col(idCol), col("s"), col("sub"))
      .join(broadcast(cents), "s")
      .select(col(idCol), col("s"), col("cid"),
        dotFp(col("sub"), col("csub")).as("d"))
      .groupBy(col(idCol), col("s"))
      .agg(max(struct(col("d"), (-col("cid")).as("nc"))).as("m"))
      .select(col(idCol), col("s"), (-col("m.nc")).as("cid"))

  /** Asymmetric-distance (ADC) scoring of PQ codes against one query:
    * the query's dot with every sub-centroid forms a (subspaces × k)
    * lookup table — tiny, broadcast — and each vector's score is the
    * sum of its codes' table entries: exactly dotFp(query,
    * reconstruction), as integer arithmetic. Scoring touches only the
    * codes, never the original vectors. */
  def pqAdcScores(codes: DataFrame, idCol: String, lut: DataFrame): DataFrame =
    codes.join(broadcast(lut), Seq("s", "cid"))
      .groupBy(col(idCol))
      .agg(sum(col("d")).as("adc_fp"))
}
