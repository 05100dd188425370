package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded stratified top-n — the scale path for per-class sampling.
  *
  * Shape (round-13 optimization): `row_number().over(partitionBy
  * (stratum).orderBy(key, id))` + `rn <= n` — Spark's
  * InferWindowGroupLimit rule (3.5+) plants a WindowGroupLimit
  * [Partial] heap BEFORE the exchange, so each input partition ships
  * at most `strata × n` survivor rows, exactly the bounded-shuffle
  * property the previous hand-rolled `mapPartitions` TreeSet gave —
  * but the heap now runs over UnsafeRows with codegen'd comparators
  * instead of deserializing every input row into Scala `(String,
  * String, Long)` tuples (guide §4: no Scala closures in the hot
  * path; the pair-volume callers feed millions of rows through this).
  * The final per-stratum pass handles ≤ numPartitions × n rows —
  * identical to the old merge phase. Ordering is unchanged: Spark's
  * UTF8String comparison is unsigned-byte lexicographic, the order
  * the old TreeSet's utf8Order replicated by hand (equivalence was
  * already pinned by SamplingSpec both ways).
  */
object Sampling {

  /** Top-n rows per stratum in ascending (keyCol, idCol) order.
    * Output: (stratumCol, rn (1-based long), idCol), one row per kept
    * id. stratumCol/keyCol must be strings, idCol a long, and (keyCol,
    * idCol) pairs must be DISTINCT per stratum (idCol is an id). */
  def stratifiedTopN(spark: SparkSession, df: DataFrame, stratumCol: String,
      keyCol: String, idCol: String, n: Int): DataFrame =
    stratifiedTopNBy(df, stratumCol,
      Seq(col(keyCol).cast("string")), idCol, n)

  /** Same contract with an explicit ordering column list — the
    * zero-allocation path for numeric sort keys: pair-volume callers
    * (label-blocked kNN graphs) previously lpad-encoded longs into
    * fixed-width strings so the single string key ordered numerically;
    * passing the longs directly drops two string materializations per
    * pair from the hot path while producing the identical order
    * (zero-padded decimal of a non-negative long IS its numeric
    * order). `idCol` is always the final tie-break.
    *
    * SCALE-CONTRACT dependency (round-14 advice note): the bounded
    * shuffle rests entirely on the InferWindowGroupLimit optimizer
    * rule firing — Spark 3.5+, a raw-int rank predicate (no cast, see
    * below), and `spark.sql.window.group.limit.threshold` (default
    * 1000) >= n. Lowering that config below n, or a future cast/rule
    * drift, silently degrades this to a FULL per-stratum window sort —
    * a scale regression with identical results. PlanAuditSpec /
    * ScaleSpec pin the WindowGroupLimit[Partial] operator so the
    * degradation fails a test instead of shipping. */
  def stratifiedTopNBy(df: DataFrame, stratumCol: String,
      orderCols: Seq[Column], idCol: String, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    // the rank filter must compare the RAW int row_number attribute so
    // InferWindowGroupLimit pattern-matches it (a cast in the predicate
    // defeats the rule and the partial heap is never planted); the
    // public long `rn` is cast after the filter
    df.select(col(stratumCol).cast("string").as(stratumCol) +:
        col(idCol).cast("long").as(idCol) +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"__ord$i") }: _*)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(orderCols.indices.map(i => col(s"__ord$i")) :+
            col(idCol): _*)))
      .filter(col("__rn") <= n)
      .select(col(stratumCol), col("__rn").cast("long").as("rn"), col(idCol))
  }
}
