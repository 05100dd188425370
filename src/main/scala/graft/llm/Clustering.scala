package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over embedding columns — the clustering
  * member of the ANN/curation family (IVF assignment in [[Similarity]]
  * probes FIXED centroids; this learns them). Reference capability:
  * corpus clustering for data curation / topic balancing.
  *
  * Scale shape (the only one that survives 100 TB):
  *  - the model (k × dim fixed-point longs) is the ONLY globally shared
  *    state; it moves by broadcast, never by shuffling the corpus;
  *  - assignment is a narrow map over the vectors (corpus stays put),
  *    followed by a map-side-combining argmax aggregate on the vector
  *    key — no window funnel;
  *  - the centroid update reduces (cid, dim) partial sums with map-side
  *    combine; k × dim rows is all that ever crosses the wire;
  *  - each round's model is localCheckpoint'd so the plan stays linear
  *    in rounds (the MLlib iteration discipline).
  *
  * Determinism (the oracle contract): coordinates enter 1e-9 fixed
  * point; dots are per-term floor'd long sums; argmax ties break to the
  * smallest centroid id; the centroid mean is floor(sum / n) in exact
  * double arithmetic (sums stay < 2^53). Spherical variant: similarity
  * = dot product, the natural metric for normalized-ish embeddings
  * (cf. Dhillon & Modha, Machine Learning 42, 2001).
  *
  * In FULL-batch Lloyd a centroid abandoned by every vector drops out
  * of the model (both engines mirror this via the same join), so k can
  * only shrink — callers who need constant k re-seed externally. The
  * MINI-batch variant instead carries unsampled centroids forward
  * unchanged (Sculley's update touches only centroids with members in
  * the round's sample): sampling absence is noise, not abandonment,
  * and dropping on it would collapse the model — a cluster missing
  * from a 5% sample is overwhelmingly still real.
  */
object Clustering {

  /** Coordinates -> 1e-9 fixed-point longs (the shared currency of the
    * embedding operators). */
  private def toFp(vec: Column): Column =
    transform(vec, v =>
      floor(v.cast("double") * lit(1000000000d) + lit(0.5)).cast("long"))

  /** Exact dot of a float vector against a fixed-point centroid:
    * per-term floor to long, long-sum — associative, order-free. Runs
    * as the codegen'd FixedPointDotCent kernel: this is the innermost
    * loop of every Lloyd round (corpus × k evaluations), where the
    * interpreted aggregate(zip_with(...)) form paid per-element
    * closure calls and an intermediate array per pair (the same
    * bottleneck Kernels.scala documents for the similarity family).
    * KernelsSpec pins bit-parity against the composed form. */
  private def dotCent(vec: Column, cent: Column): Column =
    graft.functions.kernels.fixed_point_dot_cent(vec, cent)

  /** Nearest-centroid assignment WITH the winning similarity: (id,
    * cid, d) per vector. Argmax runs as a map-side-combining aggregate
    * (max over (dot, -cid) structs), not a per-vector window — ties to
    * the smallest cid. The score is the model-fit signal outlier
    * screens rank on. */
  def assignScored(emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .select(col(idCol), col("cid"),
        dotCent(col(vecCol), col("cf")).as("d"))
      .groupBy(col(idCol))
      .agg(max(struct(col("d"), (-col("cid")).as("nc"))).as("m"))
      .select(col(idCol), (-col("m.nc")).as("cid"), col("m.d").as("d"))

  /** Nearest-centroid assignment: (id, cid) per vector. */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame =
    assignScored(emb, idCol, vecCol, cents).drop("d")

  /** Deterministic farthest-first (Gonzalez 1985 k-center) seeding:
    * start from the lowest id, then k-1 times pick the vector with the
    * MAXIMUM distance to its nearest chosen seed (ties to the smallest
    * id). Each pick is one aggregate over the corpus — k passes total —
    * and returns seed ids, spread across the data's extremes, where the
    * lowest-id seed can collapse onto one dense region. Distance here
    * is the fixed-point self-dot minus dot with the seed (monotone in
    * squared Euclidean for equal-norm vectors). */
  def farthestFirst(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[Long] =
    farthestFirstWithGaps(emb, idCol, vecCol, k).map(_._1)

  /** [[farthestFirst]] plus the nearest-seed gap each pick was chosen
    * at (pick 1 reports 0 — it is chosen by id, not distance). The gap
    * sequence is non-increasing, and pick k+1's gap IS the k-center
    * coverage radius of the first k seeds — which is why q_kcenter
    * asks for one seed more than it keeps. */
  def farthestFirstWithGaps(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[(Long, Long)] = {
    val first = emb.agg(min(col(idCol).cast("long"))).head().getLong(0)
    val chosen = scala.collection.mutable.ArrayBuffer((first, 0L))
    val withSelf = emb.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v"),
        dotCent(col(vecCol), toFp(col(vecCol))).as("self"))
      .localCheckpoint(true)
    while (chosen.size < k) {
      val seeds = withSelf.filter(col("id").isInCollection(chosen.map(_._1).toSeq))
        .select(col("id").as("sid"), toFp(col("v")).as("sf"))
      // nearest-seed distance per vector, then global argmax
      val far = withSelf.crossJoin(broadcast(seeds))
        .select(col("id"), col("self"),
          (col("self") - dotCent(col("v"), col("sf"))).as("gap"))
        .groupBy(col("id"))
        .agg(min(col("gap")).as("nearest_gap"))
        .orderBy(col("nearest_gap").desc, col("id"))
        .limit(1).head()
      chosen += ((far.getLong(0), far.getLong(1)))
    }
    chosen.toSeq
  }

  /** Within-cluster inertia proxy of a model over the corpus: the sum
    * over vectors of (self-dot − dot(v, centroid)) in fixed point —
    * monotone in k-means cost; ONE aggregate, no shuffle of vectors. */
  def inertia(emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): Long = {
    val a = assign(emb, idCol, vecCol, cents)
    emb.join(a, idCol).join(broadcast(cents), "cid")
      .select((dotCent(col(vecCol), toFp(col(vecCol)))
        - dotCent(col(vecCol), col("cf"))).as("gap"))
      .agg(sum(col("gap"))).head().getLong(0)
  }

  /** Mini-batch Lloyd iterations (Sculley, WWW 2010): each update
    * round computes centroids from a deterministic md5-hash sample of
    * the corpus instead of a full pass — the 100 TB training path,
    * where full-corpus rounds are the dominant cost and a few-percent
    * sample moves centroids almost as far. The sample is replayable
    * (pure function of id and round), so training stays deterministic;
    * the FINAL assignment still covers the full corpus. `perMille` =
    * sample rate in 1/1000 units. */
  def lloydMiniBatch(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, perMille: Int, seedIds: Seq[Long] = Nil): DataFrame = {
    require(perMille > 0 && perMille <= 1000, "perMille in (0, 1000]")
    var cents = seedCentroids(emb, idCol, vecCol, k, seedIds)
    for (r <- 0 until rounds) {
      // replayable per-round Bernoulli gate on md5(id, round)
      val h = conv(substring(md5(concat(col(idCol).cast("string"),
        lit(s"|mb$r")).cast("binary")), 1, 12), 16, 10).cast("long")
      val batch = emb.filter(h % 1000 < perMille)
      val a = assign(batch, idCol, vecCol, cents)
      val updated = batch.join(a, idCol)
        .select(col("cid"), posexplode(toFp(col(vecCol))))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .select(col("cid"), col("pos"),
          floor(col("s").cast("double") / col("n").cast("double"))
            .cast("long").as("m"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("nf"))
      // a centroid with no member IN THIS SAMPLE carries forward
      // unchanged (Sculley's update): rebuilding the model from the
      // batch alone would permanently delete any centroid the round's
      // sample happened to miss, and an empty batch would erase the
      // whole model
      cents = cents.join(updated, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("nf"), col("cf")).as("cf"))
        .localCheckpoint(true)
    }
    cents
  }

  /** Shared deterministic seeding: the k LOWEST-id vectors (a TakeOrdered
    * over (id) — NOT `filter(id < k)`, which silently yields fewer or
    * zero seeds whenever ids are sparse, 1-based, or re-keyed), or the
    * caller's explicit `seedIds`. */
  private def seedCentroids(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, seedIds: Seq[Long]): DataFrame = {
    val seed =
      if (seedIds.isEmpty) emb.orderBy(col(idCol).cast("long")).limit(k)
      else emb.filter(col(idCol).cast("long").isInCollection(seedIds))
    seed
      .select(col(idCol).cast("long").as("cid"), toFp(col(vecCol)).as("cf"))
      .localCheckpoint(true)
  }

  /** `rounds` Lloyd iterations from a deterministic seed (by default
    * the k lowest-id vectors; pass `seedIds` from [[farthestFirst]] for
    * spread seeds); returns the final centroid model
    * (cid, cf: array<long>). */
  def lloyd(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, seedIds: Seq[Long] = Nil): DataFrame = {
    var cents = seedCentroids(emb, idCol, vecCol, k, seedIds)
    for (_ <- 0 until rounds) {
      val a = assign(emb, idCol, vecCol, cents)
      cents = emb.join(a, idCol)
        .select(col("cid"), posexplode(toFp(col(vecCol))))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        // exact-double floor division: |s| < 2^53 for any realistic
        // cluster (coords ~1e9 fp x members), so the double is the
        // integer itself and floor(s/n) is engine-portable
        .select(col("cid"), col("pos"),
          floor(col("s").cast("double") / col("n").cast("double"))
            .cast("long").as("m"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cf"))
        .localCheckpoint(true)
    }
    cents
  }
}
