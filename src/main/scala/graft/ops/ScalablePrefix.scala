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
      _.map { ir =>
        // same loud-null contract as groupedRank/groupedPrefixSum:
        // getLong on a null slot silently reads 0, which would rank the
        // row under key 0 and corrupt every later cumulative value
        if (ir.isNullAt(keyIdx) || ir.isNullAt(valIdx))
          throw new IllegalArgumentException(
            "runningSum requires non-null (key, value) values")
        (ir.getLong(keyIdx), ir.getLong(valIdx))
      }, preservesPartitioning = true)

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

  /** Per-group rank by (orderCol, idCol) — the two-pass answer to
    * `row_number().over(Window.partitionBy(group).orderBy(...))` when
    * the group column is LOW-cardinality (segments, languages): the
    * window form funnels each group through one task, while this path
    * range-partitions on (group, order, id) so every partition holds a
    * contiguous slice of at most a few groups and ranks are assembled
    * from per-(partition, group) counts — only O(partitions × groups
    * crossing a boundary) tuples ever reach the driver.
    *
    * Returns (groupCol, idCol, rnk, grp_n, ord): 1-based dense position
    * in ascending (orderCol, idCol) order, the group's total count —
    * enough to derive percent_rank/cume_dist/ntile arithmetically —
    * and the order value itself (so rank-selection consumers like the
    * exact median need no join back to the source).
    * (orderCol double, idCol long; (orderCol, idCol) must be unique
    * within a group, which an id tiebreak guarantees. All three
    * columns must be NON-NULL: window ORDER BY null placement differs
    * between engines (Spark NULLS FIRST, DuckDB NULLS LAST), so no
    * null ranking could match both — a null here fails loudly instead
    * of silently ranking as 0.0.) */
  def groupedRank(spark: SparkSession, df: DataFrame, groupCol: String,
      orderCol: String, idCol: String, numPartitions: Int): DataFrame = {
    val sorted = df
      .select(col(groupCol).cast("string"), col(orderCol).cast("double"),
        col(idCol).cast("long"))
      .repartitionByRange(numPartitions, col(groupCol), col(orderCol), col(idCol))
      .sortWithinPartitions(col(groupCol), col(orderCol), col(idCol))

    val rdd = sorted.queryExecution.toRdd.mapPartitions(
      _.map { ir =>
        if (ir.isNullAt(0) || ir.isNullAt(1) || ir.isNullAt(2))
          throw new IllegalArgumentException(
            "groupedRank requires non-null (group, order, id) values")
        (ir.getUTF8String(0).toString, ir.getDouble(1), ir.getLong(2))
      },
      preservesPartitioning = true)

    // pass 1: per-(partition, group) counts — tiny, because the range
    // partitioning keeps each group contiguous across partitions
    val partGroupCounts = rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (g, _, _) => counts.update(g, counts.getOrElse(g, 0L) + 1L) }
        counts.iterator.map { case (g, c) => (pid, g, c) }
      }
      .collect()

    // exclusive scan per group over partition order -> starting offsets;
    // plus each group's total for the caller's distribution arithmetic
    val offsets = scala.collection.mutable.HashMap.empty[(Int, String), Long]
    val running = scala.collection.mutable.HashMap.empty[String, Long]
    partGroupCounts.sortBy(_._1).foreach { case (pid, g, c) =>
      offsets((pid, g)) = running.getOrElse(g, 0L)
      running(g) = running.getOrElse(g, 0L) + c
    }
    val totals = running.toMap
    val offB = spark.sparkContext.broadcast(offsets.toMap)
    val totB = spark.sparkContext.broadcast(totals)

    // pass 2: narrow per-partition rank emit
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val local = scala.collection.mutable.HashMap.empty[String, Long]
      it.map { case (g, ord, id) =>
        val r = local.getOrElse(g, offB.value((pid, g))) + 1L
        local(g) = r
        Row(g, id, r, totB.value(g), ord)
      }
    }

    spark.createDataFrame(out, StructType(Seq(
      StructField(groupCol, org.apache.spark.sql.types.StringType),
      StructField(idCol, LongType),
      StructField("rnk", LongType), StructField("grp_n", LongType),
      StructField("ord", org.apache.spark.sql.types.DoubleType))))
  }

  /** Per-group cumulative sum of a WEIGHT column in ascending orderCol
    * order — the two-pass answer to
    * `sum(w).over(Window.partitionBy(group).orderBy(ord))` when the
    * group column is LOW-cardinality (nations, segments): the window
    * form funnels each group's whole value domain through one task,
    * while this path range-partitions on (group, order) so every
    * partition holds a contiguous slice and cumulative weights are
    * assembled from per-(partition, group) subtotals — only
    * O(partitions × groups crossing a boundary) tuples reach the
    * driver. The weight reduction is exact int64, so the result is
    * order-independent and bit-stable.
    *
    * Returns (groupCol, ord, w, cum_w, grp_total): the order value
    * (double — callers keep it within 2^53), the row's weight, the
    * inclusive running weight, and the group's total weight — enough
    * for weighted quantiles (`2·cum_w >= grp_total` selects the
    * weighted median) without any join back. orderCol must be unique
    * within a group (callers pre-collapse onto the value domain) and
    * all inputs non-null, enforced loudly for the same cross-engine
    * null-placement reason as groupedRank. */
  def groupedPrefixSum(spark: SparkSession, df: DataFrame, groupCol: String,
      orderCol: String, weightCol: String, numPartitions: Int): DataFrame = {
    val sorted = df
      .select(col(groupCol).cast("string"), col(orderCol).cast("double"),
        col(weightCol).cast("long"))
      .repartitionByRange(numPartitions, col(groupCol), col(orderCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))

    val rdd = sorted.queryExecution.toRdd.mapPartitions(
      _.map { ir =>
        if (ir.isNullAt(0) || ir.isNullAt(1) || ir.isNullAt(2))
          throw new IllegalArgumentException(
            "groupedPrefixSum requires non-null (group, order, weight) values")
        (ir.getUTF8String(0).toString, ir.getDouble(1), ir.getLong(2))
      },
      preservesPartitioning = true)

    // pass 1: per-(partition, group) weight subtotals — tiny, because
    // the range partitioning keeps each group contiguous
    val partGroupSums = rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (g, _, w) => sums.update(g, sums.getOrElse(g, 0L) + w) }
        sums.iterator.map { case (g, w) => (pid, g, w) }
      }
      .collect()

    // exclusive scan per group over partition order -> starting weight
    // offsets; the final running value is each group's total
    val offsets = scala.collection.mutable.HashMap.empty[(Int, String), Long]
    val running = scala.collection.mutable.HashMap.empty[String, Long]
    partGroupSums.sortBy(_._1).foreach { case (pid, g, w) =>
      offsets((pid, g)) = running.getOrElse(g, 0L)
      running(g) = running.getOrElse(g, 0L) + w
    }
    val totals = running.toMap
    val offB = spark.sparkContext.broadcast(offsets.toMap)
    val totB = spark.sparkContext.broadcast(totals)

    // pass 2: narrow per-partition cumulative emit
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val local = scala.collection.mutable.HashMap.empty[String, Long]
      it.map { case (g, ord, w) =>
        val c = local.getOrElse(g, offB.value((pid, g))) + w
        local(g) = c
        Row(g, ord, w, c, totB.value(g))
      }
    }

    spark.createDataFrame(out, StructType(Seq(
      StructField(groupCol, org.apache.spark.sql.types.StringType),
      StructField("ord", org.apache.spark.sql.types.DoubleType),
      StructField(weightCol, LongType),
      StructField("cum_w", LongType), StructField("grp_total", LongType))))
  }
}
