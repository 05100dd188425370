package graft.ops

/** The Misra-Gries summary fold (the classic decrement-all variant —
  * NOT Space-Saving/replace-min, whose counts OVERestimate; here every
  * count underestimates: ĉ ≤ c_true ≤ ĉ + D) shared by the batch
  * heavy-hitters pass ([[HeavyHitters.exactTopK]]) and the streaming
  * processor (OrderPipeline.StreamingHeavyHittersProcessor) — one
  * implementation so the two "twins" can never desynchronize. The
  * summary is a plain mutable map bounded at `capacity` entries;
  * every count ĉ satisfies ĉ ≤ c_true ≤ ĉ + D where D is the total
  * number of decrement rounds returned by `add`. */
object MisraGries {

  /** Fold one item into the summary. Returns the number of decrement
    * rounds performed (0 or 1): when the summary is full and the item
    * untracked, every counter drops by one, zeros are evicted, and the
    * arriving item is dropped — the standard MG step (amortized O(1)
    * per item via the eviction sweep). */
  def add(s: scala.collection.mutable.HashMap[String, Long], item: String,
      capacity: Int): Int =
    s.get(item) match {
      case Some(c) => s.update(item, c + 1); 0
      case None =>
        if (s.size < capacity) { s.update(item, 1L); 0 }
        else {
          val dead = List.newBuilder[String]
          s.foreachEntry { (i, c) => if (c == 1L) dead += i else s.update(i, c - 1) }
          dead.result().foreach(s.remove)
          1
        }
    }

  /** Merge summary `b` into `a` (capacity-bounded): sum counts, then
    * if over capacity subtract the (capacity+1)-th largest count and
    * drop non-positives — the mergeable-summaries combine that
    * preserves the N/(capacity+1) error bound (Agarwal et al., PODS
    * 2012). Returns `a`. */
  def merge(a: scala.collection.mutable.HashMap[String, Long],
      b: scala.collection.mutable.HashMap[String, Long], capacity: Int)
      : scala.collection.mutable.HashMap[String, Long] = {
    b.foreachEntry { (i, c) => a.update(i, a.getOrElse(i, 0L) + c) }
    if (a.size > capacity) {
      val cut = a.values.toArray.sorted(Ordering.Long.reverse).apply(capacity)
      val dead = List.newBuilder[String]
      a.foreachEntry { (i, c) => if (c - cut <= 0L) dead += i else a.update(i, c - cut) }
      dead.result().foreach(a.remove)
    }
    a
  }
}
