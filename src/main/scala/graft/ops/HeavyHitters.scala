package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT top-k frequent items at scale — Misra-Gries candidate
  * generation + exact recount, the classic two-pass heavy-hitters
  * protocol:
  *
  *   pass 1 (candidates): each partition folds its items into a
  *     Misra-Gries (decrement-all) summary of capacity m — NOT the
  *     distinct Space-Saving (replace-min) algorithm: counts here
  *     UNDERESTIMATE (ĉ ≤ c_true ≤ ĉ + D), which the certification
  *     below depends on; summaries
  *     combine up the `treeAggregate` tree with the standard MG merge
  *     (sum counts, then subtract the (m+1)-th largest and drop
  *     non-positives), so the driver receives ONE summary of at most
  *     m entries no matter how many partitions ran — bounded model
  *     state. The merged summary retains every item with global
  *     frequency > N/(m+1) (the mergeable-summaries guarantee:
  *     Misra–Gries 1982; Agarwal, Cormode, Huang, Phillips, Wei, Yi,
  *     "Mergeable Summaries", PODS 2012).
  *
  *   pass 2 (exact recount): one aggregation counts ONLY the ≤ m
  *     candidate items (everything else collapses into a single
  *     overflow group that also yields the total N) — the full item
  *     domain never shuffles, which is the point: a naive
  *     `groupBy(item).count().orderBy(...).limit(k)` shuffles every
  *     distinct item (at corpus scale: billions of tokens), while this
  *     path shuffles at most m+1 groups.
  *
  *   certification: the result is PROVABLY the exact top-k when the
  *     k-th candidate's exact count t satisfies t·(m+1) > N — every
  *     non-candidate has frequency ≤ N/(m+1) < t, so no non-candidate
  *     can belong to the top-k. The check is an integer
  *     cross-multiply on exact longs; if it fails (capacity too small
  *     for the skew of the data), the call throws rather than return
  *     a silently-unproven answer — raise `capacity` and rerun.
  */
object HeavyHitters {

  /** Exact top-k most frequent values of `itemCol` (string) with exact
    * counts, certified by the Misra-Gries bound. Returns (item, cnt),
    * descending by cnt with ascending-item tiebreak, exactly k rows
    * (fewer only if the domain has fewer than k items).
    *
    * `capacity` (m) bounds both the per-partition summary and the
    * candidate set; it must exceed the skew ratio N/c_k for the data
    * (certification enforces this at runtime). Memory: O(m) per task
    * and on the driver. */
  def exactTopK(spark: SparkSession, df: DataFrame, itemCol: String,
      k: Int, capacity: Int = 4096): DataFrame = {
    require(k > 0 && capacity > k, s"need capacity > k > 0, got k=$k capacity=$capacity")
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .as[String]

    type MG = scala.collection.mutable.HashMap[String, Long]
    // the MG fold and merge live in graft.ops.MisraGries, shared with
    // the streaming processor so the two paths cannot desynchronize
    val summary = items.rdd.treeAggregate(
      new scala.collection.mutable.HashMap[String, Long]())(
      (s: MG, item: String) => { MisraGries.add(s, item, capacity); s },
      (a: MG, b: MG) => MisraGries.merge(a, b, capacity))
    val candidates = summary.keys.toSeq
    if (candidates.isEmpty) // empty input: nothing to count or certify
      return Seq.empty[(String, Long)].toDF("item", "cnt")

    // pass 2: exact counts for candidates; everything else folds into
    // one overflow group so total N comes from the same aggregation
    val counted = items.toDF("item")
      .groupBy(when(col("item").isInCollection(candidates), col("item")).as("item"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val n = counted.map(_.getLong(1)).sum
    val overflow = counted.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    val exact = counted.filter(!_.isNullAt(0))
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (i, c) => (-c, i) }
    val top = exact.take(k).toSeq
    // certification — when the overflow group is empty the candidates
    // ARE the whole item domain (exact trivially); otherwise every
    // non-candidate has frequency <= N/(m+1), so the k-th count must
    // clear that bound or the top-k is unproven
    if (overflow > 0) {
      if (top.length < k)
        throw new IllegalStateException(
          s"exactTopK not certifiable: only ${top.length} candidates for k=$k " +
            s"with ${overflow} items outside the summary — raise capacity (= $capacity)")
      val t = top.last._2
      // overflow-safe form of t·(m+1) > N: for positive longs,
      // t·(m+1) > n  ⟺  t > n/(m+1) with floor division (both sides
      // integer), so no multiplication that could wrap at
      // t > Long.MaxValue/(m+1) is ever evaluated
      if (t <= n / (capacity + 1L))
        throw new IllegalStateException(
          s"exactTopK not certifiable: k-th count $t <= N/(m+1) = $n/${capacity + 1} — " +
            s"raise capacity (= $capacity) above N/c_k for this data")
    }
    top.toDF("item", "cnt")
  }
}
