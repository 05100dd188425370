package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning — the scale pattern behind "runtime
  * filters" / "dynamic filtering" in every warehouse engine: before a
  * fact ⋈ dim join whose dim side is selective, compress the dim keys
  * into a few KB of bloom bits, broadcast them, and drop fact rows that
  * cannot possibly join BEFORE they pay the shuffle. False positives
  * are later removed by the exact join, so the final answer is
  * unchanged — the bloom only shrinks the data that reaches the
  * exchange. At 100 TB this turns "shuffle the whole fact table" into
  * "shuffle the ~matching fraction", for the price of one tiny
  * aggregate over the dim keys.
  *
  * The build is distributed: each key contributes `numHashes` bit
  * positions (xxhash64 with per-hash seeds, codegen'd), positions are
  * bit_or-combined per 64-bit word map-side, and only
  * `numBits/64` (word, bits) rows — a few KB — ever reach the driver.
  * The probe is a pure expression over a literal array: no UDF, no
  * broadcast variable, fully inside whole-stage codegen.
  */
object BloomPrune {

  /** A built filter: the bit words TOGETHER WITH the hash count they
    * were built with. Probing with a different k than the build would
    * silently drop matching rows (false negatives) — carrying k inside
    * the value makes that disagreement unrepresentable. */
  final case class BloomWords(words: Array[Long], numHashes: Int) {
    def numBits: Long = words.length * 64L
  }

  /** Aggregate `keys[keyCol]` into bloom words. `numBits` must be a
    * multiple of 64. Sizing rule of thumb: ~10 bits/key for ~1% false
    * positives at k=3; oversizing only costs bytes in the plan. */
  def buildWords(keys: DataFrame, keyCol: String, numBits: Int,
      numHashes: Int): BloomWords = {
    require(numBits % 64 == 0, s"numBits must be a multiple of 64: $numBits")
    require(numHashes >= 1)
    val bits = (0 until numHashes).map(j =>
      pmod(xxhash64(col(keyCol), lit(j)), lit(numBits.toLong)))
    val rows = keys
      .select(explode(array(bits: _*)).as("bit"))
      // word = bit >> 6, in-word position = bit & 63 (bit is non-negative)
      .select(shiftright(col("bit"), 6).as("word"),
        call_function("shiftleft", lit(1L),
          col("bit").bitwiseAND(lit(63L)).cast("int")).as("mask"))
      .groupBy(col("word"))
      .agg(call_function("bit_or", col("mask")).as("bits"))
      .collect()
    val words = new Array[Long](numBits / 64)
    rows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    BloomWords(words, numHashes)
  }

  /** Membership predicate: true iff every hash bit of `key` is set.
    * Admits every built key by construction (no false negatives);
    * false positives are the caller's exact join's problem. */
  def mightContain(bloom: BloomWords, key: Column): Column = {
    val arr = typedLit(bloom.words.toSeq)
    (0 until bloom.numHashes).map { j =>
      val bit = pmod(xxhash64(key, lit(j)), lit(bloom.numBits))
      element_at(arr, shiftright(bit, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          bit.bitwiseAND(lit(63L)).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }
}
