package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** IMA ADPCM (DVI4) — the classic 4-bits-per-sample telephony/game
  * audio codec (public algorithm: IMA Digital Audio Focus Group 1992;
  * the WAVE format-0x11 payload). Unlike the memoryless G.711 maps,
  * ADPCM is a SEQUENTIAL state machine — predictor + step index evolve
  * per nibble — so its oracle is a recursive replay, pinning that the
  * engine's per-row kernels stay exact even when the per-element
  * recurrence cannot be expressed as independent arithmetic.
  *
  * State update per 4-bit code (the spec's fixed tables):
  *   step = STEP(si); diff = step>>3 (+ step>>2 if bit0) (+ step>>1 if
  *   bit1) (+ step if bit2); predictor ∓= diff by bit3, clamped to
  *   int16; si += INDEX(code&7) = {-1,-1,-1,-1,2,4,6,8}, clamped 0..88.
  *
  * Pinned block layout (scope stated): 2-byte LE initial predictor,
  * 1-byte initial step index (0..88), 1 reserved byte, then nibble
  * pairs LOW nibble first — every sample decodes FROM a nibble (the
  * header is state, not sample 0). Malformed (short header, step
  * index > 88) → null. Per-row kernel, no shuffle. */
object Adpcm {

  final val Step: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private final val Index = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode a block; returns the samples, or None on malformed input. */
  def decode(b: Array[Byte]): Option[Array[Int]] = {
    if (b == null || b.length < 4) return None
    var pred = ((b(0) & 0xff) | ((b(1) & 0xff) << 8)).toShort.toInt
    var si = b(2) & 0xff
    if (si > 88) return None
    val n = (b.length - 4) * 2
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      val byte = b(4 + (k >> 1)) & 0xff
      val code = if ((k & 1) == 0) byte & 0xf else (byte >> 4) & 0xf
      val step = Step(si)
      var diff = step >> 3
      if ((code & 1) != 0) diff += step >> 2
      if ((code & 2) != 0) diff += step >> 1
      if ((code & 4) != 0) diff += step
      pred = if ((code & 8) != 0) pred - diff else pred + diff
      if (pred > 32767) pred = 32767
      if (pred < -32768) pred = -32768
      si += Index(code & 7)
      if (si < 0) si = 0
      if (si > 88) si = 88
      out(k) = pred
      k += 1
    }
    Some(out)
  }

  /** Encode samples against the same state machine (mirror of decode:
    * greedy bit quantization of diff/step). */
  def encode(pred0: Int, si0: Int, samples: Array[Int]): Array[Byte] = {
    require(si0 >= 0 && si0 <= 88, s"step index out of range: $si0")
    require(samples.length % 2 == 0, "nibble pairs: even sample count")
    val out = new Array[Byte](4 + samples.length / 2)
    out(0) = (pred0 & 0xff).toByte
    out(1) = ((pred0 >> 8) & 0xff).toByte
    out(2) = si0.toByte
    var pred = pred0.toShort.toInt
    var si = si0
    var k = 0
    while (k < samples.length) {
      val step = Step(si)
      var delta = samples(k) - pred
      var code = 0
      if (delta < 0) { code = 8; delta = -delta }
      if (delta >= step) { code |= 4; delta -= step }
      if (delta >= (step >> 1)) { code |= 2; delta -= step >> 1 }
      if (delta >= (step >> 2)) { code |= 1 }
      // replay the decoder update so the states stay in lockstep
      var diff = step >> 3
      if ((code & 1) != 0) diff += step >> 2
      if ((code & 2) != 0) diff += step >> 1
      if ((code & 4) != 0) diff += step
      pred = if ((code & 8) != 0) pred - diff else pred + diff
      if (pred > 32767) pred = 32767
      if (pred < -32768) pred = -32768
      si += Index(code & 7)
      if (si < 0) si = 0
      if (si > 88) si = 88
      val at = 4 + (k >> 1)
      if ((k & 1) == 0) out(at) = (code & 0xf).toByte
      else out(at) = (out(at) | (code << 4)).toByte
      k += 1
    }
    out
  }

  /** The synthesis the oracle replays nibble by nibble: initial
    * predictor ((id·37) mod 4001) − 2000, initial step index
    * (id·7) mod 89, and code k = (id·3 + k·5) mod 16. */
  def synth(id: Long, n: Int): Array[Byte] = {
    require(n > 0 && n % 2 == 0 && n <= 4096, s"bad sample count $n")
    val out = new Array[Byte](4 + n / 2)
    val pred0 = ((id * 37) % 4001 - 2000).toInt
    out(0) = (pred0 & 0xff).toByte
    out(1) = ((pred0 >> 8) & 0xff).toByte
    out(2) = ((id * 7) % 89).toByte
    var k = 0
    while (k < n) {
      val code = (((id * 3 + k * 5L) % 16).toInt) & 0xf
      val at = 4 + (k >> 1)
      if ((k & 1) == 0) out(at) = code.toByte
      else out(at) = (out(at) | (code << 4)).toByte
      k += 1
    }
    out
  }
}

/** `synth_adpcm(id, n)` -> an IMA ADPCM block per [[Adpcm.synth]]. */
case class SynthAdpcm(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    (left.dataType, right.dataType) match {
      case (LongType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"synth_adpcm expects (long id, int n), got $other")
    }
  override def nullSafeEval(idA: Any, nA: Any): Any =
    Adpcm.synth(idA.asInstanceOf[Long], nA.asInstanceOf[Int])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthAdpcm =
    copy(left = l, right = r)
  override def prettyName: String = "synth_adpcm"
}

/** `adpcm_stats(binary)` -> struct(n_samples, sum_abs, sum_sq, peak,
  * last_pred, last_step_index) from the REAL sequential decode, or
  * null on malformed blocks. sum_sq via addExact (int64-overflow
  * detection per the audio_stats contract). */
case class AdpcmStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType), StructField("sum_abs", LongType),
    StructField("sum_sq", LongType), StructField("peak", IntegerType),
    StructField("last_pred", IntegerType),
    StructField("last_step_index", IntegerType)))
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"adpcm_stats expects binary input, got $other")
  }
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    Adpcm.decode(b) match {
      case None => null
      case Some(samples) =>
        var sumAbs = 0L; var sumSq = 0L; var peak = 0
        var i = 0
        while (i < samples.length) {
          val s = samples(i)
          val a = math.abs(s)
          sumAbs = Math.addExact(sumAbs, a.toLong)
          sumSq = Math.addExact(sumSq, s.toLong * s)
          if (a > peak) peak = a
          i += 1
        }
        // final state re-derivation for the struct: cheap second pass
        // is avoided by recomputing inline above? last_pred is just the
        // final sample; step index re-walked here:
        val lastPred = if (samples.isEmpty) ((b(0) & 0xff) | ((b(1) & 0xff) << 8)).toShort.toInt
          else samples(samples.length - 1)
        var si = b(2) & 0xff
        var k = 0
        while (k < samples.length) {
          val byte = b(4 + (k >> 1)) & 0xff
          val code = if ((k & 1) == 0) byte & 0xf else (byte >> 4) & 0xf
          si += ((code & 7) match {
            case 0 | 1 | 2 | 3 => -1
            case 4 => 2
            case 5 => 4
            case 6 => 6
            case _ => 8
          })
          if (si < 0) si = 0
          if (si > 88) si = 88
          k += 1
        }
        new GenericInternalRow(Array[Any](samples.length.toLong, sumAbs,
          sumSq, peak, lastPred, si))
    }
  }
  override protected def withNewChildInternal(newChild: Expression): AdpcmStats =
    copy(child = newChild)
  override def prettyName: String = "adpcm_stats"
}

object adpcm {
  def synth_adpcm(id: Column, n: Column): Column =
    ColumnBridge.column(SynthAdpcm(ColumnBridge.expression(id),
      ColumnBridge.expression(n)))
  def adpcm_stats(blob: Column): Column =
    ColumnBridge.column(AdpcmStats(ColumnBridge.expression(blob)))
}
