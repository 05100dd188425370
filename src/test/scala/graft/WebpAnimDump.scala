package graft

import graft.functions.WebpAnim

/** Writes the WebpAnim.synthAnim fixture set to fixtures/vp8anim
  * (animated WebP: mixed VP8 / VP8+raw-ALPH / VP8L frames).
  * tools/gen_vp8_anim_truth.py then decodes every ANMF frame with the
  * SYSTEM libwebp and writes expected.json — the per-frame oracle for
  * q_webp_anim_frames. Run: Test/runMain graft.WebpAnimDump */
object WebpAnimDump {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("fixtures/vp8anim")
    dir.mkdirs()
    for (id <- 0L until 12L) {
      val blob = WebpAnim.synthAnim(id, corrupt = false)
      java.nio.file.Files.write(
        new java.io.File(dir, f"anim$id%02d.webp").toPath, blob)
    }
    println("wrote 12 animation fixtures")
  }
}
