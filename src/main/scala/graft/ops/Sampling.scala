package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded stratified top-n — the scale path for per-class sampling.
  *
  * `row_number().over(Window.partitionBy(stratum))` funnels each
  * stratum through ONE task, and `groupBy(stratum).agg(collect_list)`
  * is no better: the agg buffer materializes the whole stratum before
  * any trim. The scalable shape keeps a **bounded** heap per stratum
  * inside each input partition (`mapPartitions`, O(strata * n) state,
  * no shuffle of the input), so the only shuffled rows are the
  * <= numPartitions * strata * n survivors; the final merge per
  * stratum handles <= numPartitions * n tuples — a few KB regardless
  * of data size. Rows are EXACTLY those of the window formulation
  * (same (key, id) lexicographic order; equivalence-tested).
  */
object Sampling {

  /** Orders (key, id) by the key's UTF-8 BYTES, unsigned — exactly the
    * order Spark's `array_sort`/UTF8String comparison uses in the merge
    * phase. Java String.compareTo (UTF-16 code units) DISAGREES with it
    * for supplementary-plane characters, which would let the
    * partition-local trim evict a row the merge ordering wanted. */
  private val utf8Order: Ordering[(String, Long)] = new Ordering[(String, Long)] {
    override def compare(a: (String, Long), b: (String, Long)): Int = {
      val x = a._1.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b._1.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val len = math.min(x.length, y.length)
      var i = 0
      while (i < len) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      val c = x.length - y.length
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Top-n rows per stratum in ascending (keyCol, idCol) order.
    * Output: (stratumCol, rn (1-based long), idCol), one row per kept
    * id. stratumCol/keyCol must be strings, idCol a long, and (keyCol,
    * idCol) pairs must be DISTINCT (idCol is an id) — exact duplicate
    * pairs are collapsed by the bounded-set trim. */
  def stratifiedTopN(spark: SparkSession, df: DataFrame, stratumCol: String,
      keyCol: String, idCol: String, n: Int): DataFrame = {
    import spark.implicits._
    require(n > 0, "n must be positive")
    val survivors = df
      .select(col(stratumCol).cast("string"), col(keyCol).cast("string"),
        col(idCol).cast("long"))
      .as[(String, String, Long)]
      .mapPartitions { it =>
        // one n-bounded ordered set per stratum seen in this partition
        val heaps = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.TreeSet[(String, Long)]]
        it.foreach { case (stratum, key, id) =>
          val heap = heaps.getOrElseUpdate(stratum,
            scala.collection.mutable.TreeSet.empty[(String, Long)](utf8Order))
          heap.add((key, id))
          if (heap.size > n) heap.remove(heap.last) // drop current max
        }
        heaps.iterator.flatMap { case (stratum, heap) =>
          heap.iterator.map { case (key, id) => (stratum, key, id) }
        }
      }
      .toDF(stratumCol, keyCol, idCol)
    survivors
      .groupBy(col(stratumCol))
      .agg(slice(array_sort(collect_list(struct(col(keyCol), col(idCol)))), 1, n).as("top"))
      .select(col(stratumCol), posexplode(col("top")))
      .select(col(stratumCol), (col("pos") + 1).cast("long").as("rn"),
        col(s"col.$idCol").as(idCol))
  }
}
