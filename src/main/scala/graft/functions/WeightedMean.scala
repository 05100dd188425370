package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact weighted mean as a plain TYPED `Aggregator` UDAF — the
  * vanilla `functions.udaf` registration path (the custom-sketch HLL
  * aggregator covers the hand-rolled-buffer corner; this is the shape
  * a library user writes for ordinary typed aggregation).
  *
  * Input is (valueCents, weight); the buffer is (Σ w·x, Σ w) in exact
  * longs, so partial aggregation is order-independent and mergeable —
  * map-side combine works and the result is bit-identical to the
  * oracle's sum-of-products form regardless of partitioning. The
  * single double division happens once, in `finish`.
  */
object WeightedMean extends Aggregator[(Long, Long), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0L) Double.NaN else r._1.toDouble / r._2.toDouble / 100.0
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
