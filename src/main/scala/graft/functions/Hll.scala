package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic HyperLogLog sketch as a typed `Aggregator` — the
  * UDAF/TypedImperativeAggregate surface of SURVEY.md §2.5, and the
  * "novel sketch" custom-operator case.
  *
  * Differences from `approx_count_distinct` (and why both exist):
  * Spark's HLL++ uses engine-private hashing, so its estimates cannot be
  * verified by an external oracle. This sketch hashes with md5 (engine-
  * portable) and evaluates the raw Flajolet estimator with an EXACT
  * integer register sum (terms 2^(55-rho) as longs), so the estimate is
  * a deterministic pure function of the input SET — bit-identical across
  * engines, partitionings, and merge orders. Standard HLL trade-offs
  * apply (m=64 registers, ~13% relative error; no small-range bias
  * correction — this is the raw estimator, documented as such).
  *
  * Merge is elementwise register max — associative and commutative, so
  * partial aggregation (map-side combine) works exactly like any
  * built-in aggregate at cluster scale.
  */
object Hll {
  val M = 64          // registers (b = 6 bits)
  val MaxRho = 55     // 60-bit hash minus 6 register bits, +1, capped
  val Scale: Double = 36028797018963968.0 // 2^55
  val Alpha: Double = 0.709 * 64 * 64     // alpha_64 * m^2

  /** rho = 1 + trailing zeros of the 54-bit remainder (0 remainder ->
    * MaxRho). Input hash must be a non-negative 60-bit value (e.g.
    * conv(substr(md5(x),1,15),16,10)). */
  def rho(w: Long): Int =
    if (w == 0L) MaxRho else java.lang.Long.numberOfTrailingZeros(w) + 1

  class HllAggregator extends Aggregator[Long, Array[Int], Double] {
    override def zero: Array[Int] = new Array[Int](M)
    override def reduce(buf: Array[Int], hash60: Long): Array[Int] = {
      val reg = (hash60 % M).toInt
      val r = rho(hash60 / M)
      if (r > buf(reg)) buf(reg) = r
      buf
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Int]): Double = {
      var total = 0L
      var i = 0
      while (i < M) { total += 1L << (MaxRho - buf(i)); i += 1 }
      Alpha / (total.toDouble / Scale)
    }
    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column function: HLL estimate over a 60-bit hash column. */
  lazy val hll_sketch: Column => Column = {
    val fn = udaf(new HllAggregator, Encoders.scalaLong)
    (c: Column) => fn(c)
  }

  /** Like HllAggregator but finishes with the REGISTER ARRAY instead of
    * the estimate — the materialized-sketch form that makes rollups
    * re-aggregable: store per-fine-group registers once, then any
    * coarser grouping merges sketches instead of rescanning raw data.
    * This is how distinct-count cubes stay O(groups), not O(data), at
    * 100 TB. */
  class HllRegistersAggregator extends Aggregator[Long, Array[Int], Seq[Int]] {
    private val inner = new HllAggregator
    override def zero: Array[Int] = inner.zero
    override def reduce(buf: Array[Int], hash60: Long): Array[Int] =
      inner.reduce(buf, hash60)
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = inner.merge(a, b)
    override def finish(buf: Array[Int]): Seq[Int] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Seq[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
  }

  /** Merges sketch rows (register arrays) by elementwise max — the
    * rollup aggregate. Estimate-of-merge == estimate-of-union exactly,
    * because max is associative/commutative/idempotent. */
  class HllMergeAggregator extends Aggregator[Seq[Int], Array[Int], Seq[Int]] {
    override def zero: Array[Int] = new Array[Int](M)
    override def reduce(buf: Array[Int], regs: Seq[Int]): Array[Int] = {
      // a null sketch row (outer-join miss) contributes nothing — the
      // built-in aggregate convention; a short array would silently
      // merge a DIFFERENT sketch geometry, so it fails loudly instead
      if (regs == null) return buf
      require(regs.length == M,
        s"hll_merge: register row has ${regs.length} registers, expected $M")
      var i = 0
      while (i < M) { if (regs(i) > buf(i)) buf(i) = regs(i); i += 1 }
      buf
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Int]): Seq[Int] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Seq[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
  }

  lazy val hll_registers: Column => Column = {
    val fn = udaf(new HllRegistersAggregator, Encoders.scalaLong)
    (c: Column) => fn(c)
  }

  lazy val hll_merge: Column => Column = {
    val fn = udaf(new HllMergeAggregator,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]())
    (c: Column) => fn(c)
  }

  /** Estimate from a register-array column: the same exact-integer
    * register sum and single-division arithmetic as HllAggregator
    * .finish, as a pure expression (the higher-order fold runs over 64
    * elements per GROUP — group-cardinality work, never row-work). */
  def hll_estimate_registers(regs: Column): Column = {
    import org.apache.spark.sql.functions._
    val total = aggregate(regs, lit(0L), (acc, r) =>
      acc + call_function("shiftleft", lit(1L), (lit(MaxRho) - r).cast("int")))
    lit(Alpha) / (total.cast("double") / lit(Scale))
  }
}
