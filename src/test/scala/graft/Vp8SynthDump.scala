package graft

import graft.functions.Vp8Enc

/** Writes the Vp8Enc.synth coverage matrix to fixtures/vp8s (raw .vp8
  * VP8 key frames). tools/gen_vp8_synth_truth.py then decodes each with
  * the SYSTEM libwebp and dumps its YUV420 planes — giving the
  * encoder-subset streams (simple filter, lf deltas, multi-partition,
  * quant deltas, delta/absolute segmentation, skip MBs) an independent
  * ground truth libwebp's own encoder never emits.
  * Run: Test/runMain graft.Vp8SynthDump */
object Vp8SynthDump {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("fixtures/vp8s")
    dir.mkdirs()
    var n = 0
    for {
      (w, h) <- Seq((16, 16), (32, 32), (48, 16), (35, 19), (64, 64), (80, 48))
      m <- 0 until 6
      id <- Seq(1L, 9L)
    } {
      val blob = Vp8Enc.synth(id, w, h, m)
      val name = f"s${n}%02d_${w}x${h}_m${m}_id$id.vp8"
      java.nio.file.Files.write(new java.io.File(dir, name).toPath, blob)
      n += 1
    }
    println(s"wrote $n synth streams to $dir")
  }
}
