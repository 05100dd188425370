package graft

import graft.functions.Vp8

/** Dev scratch harness: per-fixture first-mismatch survey for the VP8
  * decoder (run: Test/runMain graft.Vp8Debug [skipfilter]). */
object Vp8Debug {
  def main(args: Array[String]): Unit = {
    val skip = args.contains("skipfilter")
    if (args.contains("headers")) Vp8.DebugHeaders = true
    val dir = new java.io.File(
      if (args.contains("synth")) "fixtures/vp8s" else "fixtures/vp8")
    val files = dir.listFiles()
      .filter(f => f.getName.endsWith(".webp") || f.getName.endsWith(".vp8"))
      .sortBy(_.getName)
    var pass = 0
    val only = args.find(_.startsWith("only=")).map(_.drop(5))
    for (f <- files if only.forall(f.getName.contains)) {
      val webp = java.nio.file.Files.readAllBytes(f.toPath)
      val yuvFile = new java.io.File(dir,
        f.getName.stripSuffix(".webp").stripSuffix(".vp8") + ".yuv")
      if (!yuvFile.exists()) {
        println(f"${f.getName}%-22s NO-TRUTH (libwebp rejected) -> mine: " +
          Vp8.decode(unwrap(webp), skipFilter = skip).map(y => s"${y.width}x${y.height}").getOrElse("None"))
      } else {
      val expected = java.nio.file.Files.readAllBytes(yuvFile.toPath)
      Vp8.decode(unwrap(webp), skipFilter = skip) match {
        case None => println(f"${f.getName}%-22s DECODE-NONE")
        case Some(yuv) =>
          val w = yuv.width; val h = yuv.height
          val cw = (w + 1) / 2; val ch = (h + 1) / 2
          var firstY = -1; var diffY = 0
          var i = 0
          while (i < yuv.y.length) {
            if (yuv.y(i) != expected(i)) { if (firstY < 0) firstY = i; diffY += 1 }
            i += 1
          }
          var diffU = 0; i = 0
          while (i < yuv.u.length) {
            if (yuv.u(i) != expected(w * h + i)) diffU += 1
            i += 1
          }
          var diffV = 0; i = 0
          while (i < yuv.v.length) {
            if (yuv.v(i) != expected(w * h + cw * ch + i)) diffV += 1
            i += 1
          }
          if (diffY + diffU + diffV == 0) { pass += 1; println(f"${f.getName}%-22s OK") }
          else if (args.contains("map")) {
            // per-4x4-subblock diff-count map of the Y plane
            println(s"${f.getName} subblock diff map (rows of ${w / 4 + 1}):")
            for (sy <- 0 until (h + 3) / 4) {
              val row = (0 until (w + 3) / 4).map { sx =>
                var d = 0
                for (yy <- sy * 4 until math.min(sy * 4 + 4, h);
                     xx <- sx * 4 until math.min(sx * 4 + 4, w))
                  if (yuv.y(yy * w + xx) != expected(yy * w + xx)) d += 1
                f"$d%2d"
              }.mkString(" ")
              println("  " + row)
            }
            val fx = if (firstY < 0) -1 else firstY % w
            val fy = if (firstY < 0) -1 else firstY / w
            println(f"${f.getName}%-22s ydiff=$diffY%5d (first $fx,$fy) udiff=$diffU vdiff=$diffV")
          } else {
            val fx = if (firstY < 0) -1 else firstY % w
            val fy = if (firstY < 0) -1 else firstY / w
            println(f"${f.getName}%-22s ydiff=$diffY%5d (first $fx,$fy mb ${fx / 16},${fy / 16} sub ${(fx % 16) / 4},${(fy % 16) / 4}) udiff=$diffU%5d vdiff=$diffV%5d")
          }
      }
      }
    }
    println(s"pass $pass / ${files.length} (skipFilter=$skip)")
  }

  private def unwrap(data: Array[Byte]): Array[Byte] = {
    if (data.length < 12 || data(0) != 'R' || data(1) != 'I' ||
      data(2) != 'F' || data(3) != 'F') return data
    var p = 12
    while (p + 8 <= data.length) {
      val tag = new String(data, p, 4, "ISO-8859-1")
      val len = (data(p + 4) & 0xffL) | ((data(p + 5) & 0xffL) << 8) |
        ((data(p + 6) & 0xffL) << 16) | ((data(p + 7) & 0xffL) << 24)
      if (tag == "VP8 ")
        return java.util.Arrays.copyOfRange(data, p + 8, p + 8 + len.toInt)
      p += 8 + len.toInt + (len.toInt & 1)
    }
    data
  }
}
