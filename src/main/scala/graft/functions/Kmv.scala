package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic KMV (k-minimum-values / bottom-k) distinct sketch as a
  * typed `Aggregator` — the set-algebra member of the sketch family
  * (HLL = distinct counts, CMS = frequencies, Hist = quantiles).
  *
  * The sketch of a set is its K smallest DISTINCT 60-bit hashes, sorted
  * ascending — a pure function of the input SET, so estimates are
  * bit-identical across engines, partitionings, and merge orders
  * (verified against a DuckDB `ORDER BY h LIMIT k` oracle).
  *
  * Why it exists alongside HLL: a KMV sketch is a uniform sample of the
  * hashed universe, so two sketches support SET ALGEBRA that registers
  * cannot: union = k-smallest of the merged sketches (exact, closed),
  * and the fraction of the union sketch present in BOTH inputs is an
  * unbiased Jaccard estimator (Beyer et al., SIGMOD 2007, "On synopses
  * for distinct-value estimation under multiset operations") — giving
  * intersection estimates with relative-error bounds where HLL
  * inclusion-exclusion degrades. Merge is "union then keep k smallest":
  * associative, commutative, idempotent → map-side partials work like
  * any built-in aggregate at cluster scale.
  *
  * Estimator: with fewer than K distinct hashes the sketch IS the set
  * (estimate = exact size); at capacity, E[|S|] = (K-1) / U(k-th min)
  * where U normalizes the hash to (0,1] over the 60-bit space — i.e.
  * (K-1) * 2^60 / kth. The only double op is that single division.
  */
object Kmv {
  val K = 64
  /** 2^60 as an exact double (hash space size; 60-bit hashes come from
    * conv(substr(md5(x),1,15),16,10), same convention as Hll). */
  val HashSpace: Double = 1152921504606846976.0

  /** Sorted insert of h into buf (ascending, distinct, capacity K).
    * No-op if h is present or buf is full with max < h. */
  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val n = buf.length
    if (n == K && h >= buf(n - 1)) return buf
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < n && buf(lo) == h) return buf
    val outLen = math.min(n + 1, K)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = h
    System.arraycopy(buf, lo, out, lo + 1, outLen - lo - 1)
    out
  }

  /** Merge two sorted distinct arrays, keeping the K smallest. */
  private def mergeSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0; var j = 0; var o = 0
    while (o < K && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      // skip the duplicate when both sides hold v
      if (takeA && j < b.length && b(j) == v) j += 1
      out(o) = v
      o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  class KmvAggregator extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], hash60: Long): Array[Long] =
      insert(buf, hash60)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeSorted(a, b)
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Sketch over a 60-bit hash column → sorted array of the K smallest
    * distinct hashes. */
  lazy val kmv_sketch: Column => Column = {
    val fn = udaf(new KmvAggregator, Encoders.scalaLong)
    (c: Column) => fn(c)
  }

  /** Rollup merge of sketch COLUMNS as a pure expression: coarser
    * groups merge fine-group sketches instead of rescanning raw data —
    * collect_list's row order is nondeterministic, but distinct + sort
    * + slice is order-insensitive, so the result is still a pure
    * function of the input set. Group-cardinality work only (the
    * collect_list holds one ≤K array per FINE group, e.g. ≤25 nations
    * per region — never per-row state). */
  def kmv_merge(sketches: Column): Column =
    slice(array_sort(array_distinct(flatten(collect_list(sketches)))), 1, K)

  /** Union of two sketch VALUES (k smallest of the concatenation) —
    * closed under sketching: kmv(A ∪ B) exactly. */
  def kmv_union(a: Column, b: Column): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, K)

  /** Distinct-count estimate from a sketch: exact below capacity; at
    * capacity (K-1) * 2^60 / kth-smallest — one double division. */
  def kmv_estimate(sk: Column): Column =
    when(size(sk) < K, size(sk).cast("double"))
      .otherwise(lit((K - 1).toDouble * HashSpace) /
        element_at(sk, K).cast("double"))

  /** Jaccard-similarity estimate between two sketched sets: the
    * fraction of the union sketch present in BOTH inputs (each union
    * element is a uniform draw from A ∪ B; it lands in A ∩ B with
    * probability J). Exact when both sets are below capacity. */
  def kmv_jaccard(a: Column, b: Column): Column = {
    val u = kmv_union(a, b)
    val inBoth = filter(u, x => array_contains(a, x) && array_contains(b, x))
    size(inBoth).cast("double") / size(u).cast("double")
  }
}
