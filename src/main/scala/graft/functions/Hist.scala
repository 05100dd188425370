package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable equi-width histogram sketch — the QUANTILE member of the
  * engine's sketch family (Hll = distinct count, Count-Min = frequency,
  * this = rank/quantile). One long[B] of bucket counts per group over a
  * declared [lo, hi) value range; merge is elementwise SUM, which is
  * associative/commutative, so partial aggregation and sketch rollups
  * (fine group → coarse group) work exactly like any built-in
  * aggregate: rollup cost is O(groups × B), never O(data).
  *
  * Every operation is integer arithmetic on exact longs (bucketing is
  * one multiply + divide; quantile selection is a cross-multiplied
  * rank threshold), so sketches and estimates are bit-identical across
  * engines, partitionings, and merge orders — oracle-verifiable, which
  * Spark's approx_percentile (engine-private GK sketch) is not.
  * Estimate granularity is the bucket width (hi-lo)/B — the standard
  * equi-width trade-off, documented; values outside [lo, hi) clamp to
  * the edge buckets. */
object Hist {
  val B = 64

  /** Bucket index for value v over [lo, hi): exact integer math,
    * clamped to the edge buckets. */
  def bucket(v: Long, lo: Long, hi: Long): Int = {
    val c = if (v < lo) lo else if (v >= hi) hi - 1 else v
    (((c - lo) * B) / (hi - lo)).toInt
  }

  class HistAggregator(lo: Long, hi: Long)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(hi > lo, s"empty histogram range [$lo, $hi)")
    override def zero: Array[Long] = new Array[Long](B)
    override def reduce(buf: Array[Long], v: Long): Array[Long] = {
      buf(bucket(v, lo, hi)) += 1L
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < B) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Sum-merge of sketch rows (bucket-count arrays) — the rollup
    * aggregate: count-of-merge == count-of-union exactly. */
  class HistMergeAggregator
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](B)
    override def reduce(buf: Array[Long], regs: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < B) { buf(i) += regs(i); i += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < B) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Histogram sketch over a long column, range [lo, hi). */
  def hist_registers(c: Column, lo: Long, hi: Long): Column =
    udaf(new HistAggregator(lo, hi), Encoders.scalaLong)(c)

  lazy val hist_merge: Column => Column = {
    val fn = udaf(new HistMergeAggregator,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    (c: Column) => fn(c)
  }
}
