package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed prefix (cumulative) aggregation — the 100 TB path for
  * the reference's running aggregate (A1).
  *
  * `Window.orderBy(key)` with no partitionBy funnels the whole dataset
  * through ONE task: correct, and fine at verify scale, but a
  * scalability cliff. The classic fix is a two-pass scan
  * (Blelloch-style):
  *   1. range-partition by key and sort within partitions (one
  *      shuffle, same as any global sort);
  *   2. pass 1: per-partition totals (tiny: numPartitions rows to the
  *      driver);
  *   3. exclusive scan of those totals gives each partition's offset;
  *   4. pass 2: narrow per-partition cumulative sum + broadcast offset.
  *
  * Work is O(n) with ~numPartitions values collected centrally, so it
  * scales to arbitrarily many executors while producing EXACTLY the
  * same rows as the window formulation (equivalence-tested).
  * Values are exact longs (integer cents), so the reduction is
  * order-independent and bit-stable.
  */
object ScalablePrefix {

  /** Adds `run_cnt` and `run_sum` (cumulative count and sum of
    * `valueCol`, a long) in ascending `keyCol` order. */
  def runningSum(spark: SparkSession, df: DataFrame, keyCol: String,
      valueCol: String, numPartitions: Int): DataFrame = {
    val sorted = df
      .repartitionByRange(numPartitions, col(keyCol))
      .sortWithinPartitions(col(keyCol))

    val schema = sorted.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val valIdx = schema.fieldIndex(valueCol)

    // primitives extracted immediately (InternalRow instances are reused
    // by the scan); the RDD is scanned twice rather than cached — at
    // target scale a recompute-scan is cheaper than caching the dataset,
    // and the range-sort is deterministic so both passes see equal data
    val rdd = sorted.queryExecution.toRdd.mapPartitions(
      _.map(ir => (ir.getLong(keyIdx), ir.getLong(valIdx))), preservesPartitioning = true)

    // pass 1: per-partition (count, sum) — numPartitions tuples
    val partTotals = rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var c = 0L; var s = 0L
        it.foreach { kv => c += 1; s += kv._2 }
        Iterator((pid, (c, s)))
      }
      .collect().sortBy(_._1).map(_._2)

    // exclusive scan -> per-partition starting offsets
    val offsets = partTotals.scanLeft((0L, 0L)) {
      case ((c0, s0), (c, s)) => (c0 + c, s0 + s)
    }

    // pass 2: narrow cumulative emit
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var (c, s) = offsets(pid)
      it.map { case (k, v) =>
        c += 1; s += v
        Row(k, v, c, s)
      }
    }

    spark.createDataFrame(out, StructType(Seq(
      StructField(keyCol, LongType), StructField(valueCol, LongType),
      StructField("run_cnt", LongType), StructField("run_sum", LongType))))
  }
}
