package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** Multimodal plumbing: binary columns, partition-wise decode, feature
  * extraction shape, resize math, frame sampling batch shape. Header
  * parsing (PNG/JPEG/GIF/WAV/AVI) is real byte inspection, and pixel/
  * sample DATA decode is real for the uncompressed formats (PGM via
  * image_stats/image_downsample, PCM16 WAV via audio_stats); only
  * compressed-codec decode remains behind the documented
  * mapPartitions seam with a deterministic stub. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .withColumn("blob", encode($"text", "UTF-8"))

  test("partition-wise decode emits one metadata row per payload") {
    val metas = Multimodal.decodePartitions(spark, docs, "doc_id", "blob")
    assert(metas.count() === docs.count())
    val m = metas.filter(_.doc_id == 0).head()
    assert(m.n_bytes > 0 && m.width >= 1 && m.width <= 640 &&
      m.height >= 1 && m.height <= 480)
    assert(Set("png", "jpeg", "webp").contains(m.format))
  }

  test("columnar metadata agrees with the partition-wise decoder") {
    val viaMapPartitions = Multimodal.decodePartitions(spark, docs, "doc_id", "blob")
      .collect().map(m => m.doc_id -> ((m.n_bytes, m.width, m.height, m.format))).toMap
    val viaColumns = Multimodal.withMediaMeta(docs, "blob")
      .select($"doc_id", $"n_bytes", $"width", $"height", $"format")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(viaMapPartitions === viaColumns)
  }

  test("feature extraction returns normalized fixed-width vectors") {
    val feats = Multimodal.extractFeatures(spark, docs, "doc_id", "blob")
    val f = feats.head()
    assert(f.features.length === 16)
    assert(math.abs(f.features.sum - 1.0f) < 1e-3)
    assert(feats.count() === docs.count())
  }

  test("resize preserves aspect ratio and caps the long side") {
    val resized = Multimodal.resizeMeta(
      Multimodal.withMediaMeta(docs, "blob"), maxSide = 64)
    val bad = resized.filter($"out_width" > 64 || $"out_height" > 64).count()
    assert(bad === 0)
    // unscaled rows keep their dimensions
    val same = resized.filter($"scale" === 1.0)
      .filter($"out_width" =!= $"width" || $"out_height" =!= $"height").count()
    assert(same === 0)
  }

  test("frame sampling explodes every nth frame index") {
    val sampled = Multimodal.sampleFrames(
      docs.limit(1).withColumn("n_frames", lit(10)), "doc_id", $"n_frames", every = 3)
    assert(sampled.select($"frame_idx").as[Int].collect().toSeq === Seq(0, 3, 6, 9))
  }

  /** Encode with the JDK's own ImageIO writers — an implementation
    * INDEPENDENT of our header synthesis — and parse the bytes back. */
  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no ImageIO writer for $fmt")
    out.toByteArray
  }

  test("MediaHeaders parses real ImageIO-encoded containers") {
    import graft.functions.MediaHeaders
    assert(MediaHeaders.parse(imageBytes("png", 123, 45)) === Some(("png", 123, 45)))
    assert(MediaHeaders.parse(imageBytes("jpg", 77, 301)) === Some(("jpeg", 77, 301)))
    assert(MediaHeaders.parse(imageBytes("gif", 300, 7)) === Some(("gif", 300, 7)))
  }

  test("MediaHeaders is permissive on garbage and truncation") {
    import graft.functions.MediaHeaders
    assert(MediaHeaders.parse(null) === None)
    assert(MediaHeaders.parse(Array[Byte]()) === None)
    assert(MediaHeaders.parse("not an image at all".getBytes) === None)
    val png = imageBytes("png", 10, 10)
    assert(MediaHeaders.parse(png.take(12)) === None)         // cut inside IHDR
    val jpeg = imageBytes("jpg", 10, 10)
    assert(MediaHeaders.parse(jpeg.take(4)) === None)         // SOI only
  }

  test("decodePartitions uses real header dims for parseable containers") {
    val withImages = Seq(
      (1L, imageBytes("png", 321, 54)),
      (2L, imageBytes("jpg", 400, 300)),
      (3L, "plain text payload".getBytes)).toDF("doc_id", "blob")
    val metas = Multimodal.decodePartitions(spark, withImages, "doc_id", "blob")
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).format === "png" && metas(1L).width === 321 && metas(1L).height === 54)
    assert(metas(2L).format === "jpeg" && metas(2L).width === 400 && metas(2L).height === 300)
    assert(metas(3L).format !== "gif") // falls back to the stub
  }

  test("synthesizeHeader round-trips through image_dims for all formats") {
    val df = Seq(("png", 17, 500), ("jpeg", 511, 16), ("gif", 100, 527))
      .toDF("fmt", "w", "h")
    val got = df.select($"fmt", $"w", $"h",
        graft.functions.media.image_dims(
          Multimodal.synthesizeHeader($"fmt", $"w", $"h")).as("d"))
      .select($"fmt", $"w", $"h", $"d.format", $"d.width", $"d.height")
      .collect()
    got.foreach { r =>
      assert(r.getString(3) === r.getString(0))
      assert(r.getInt(4) === r.getInt(1))
      assert(r.getInt(5) === r.getInt(2))
    }
  }

  test("garbage dimensions and short SOF segments report None, not Some(garbage)") {
    import graft.functions.MediaHeaders
    // PNG IHDR with the width high bit set reads as a negative signed
    // int; GIF with a zeroed screen descriptor is not an image; a JPEG
    // SOF whose declared length (2) cannot cover precision+h+w would
    // read its dimensions from the NEXT segment's bytes
    val badPng = imageBytes("png", 4, 4)
    badPng(16) = 0xff.toByte // width -> negative through be32
    assert(MediaHeaders.parse(badPng) === None)
    val zeroGif = "GIF89a".getBytes("US-ASCII") ++ new Array[Byte](7)
    assert(MediaHeaders.parse(zeroGif) === None)
    val shortSof = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xc0.toByte, 0, 2, // SOF0, declared len 2: no payload
      0, 0x11, 0, 0x22, 0x33, 0x44) // bytes a buggy parser would read as dims
    assert(MediaHeaders.parse(shortSof) === None)
  }

  test("image_downsample carries the source maxval (pixels stay relative to it)") {
    // a maxval-15 image's pixels are 15ths of full scale; re-labeling
    // them against 255 would render near-black. The output must keep
    // maxval 15 and parse back with it.
    val px = Array.tabulate(16)(i => (i % 16).toByte)
    val in = graft.functions.Pgm.encode(4, 4, px, maxval = 15)
    val out = graft.functions.ImageDownsample(
      org.apache.spark.sql.catalyst.expressions.Literal(in,
        org.apache.spark.sql.types.BinaryType), 2)
      .eval(null).asInstanceOf[Array[Byte]]
    val Some((w, h, mx, _)) = graft.functions.Pgm.parse(out)
    assert((w, h) === (2, 2))
    assert(mx === 15, "maxval must survive the re-encode")
  }

  test("synthesizeWavHeader round-trips through audio_meta") {
    val df = Seq((1, 8000, 16, 12345L), (2, 44100, 16, 1L), (2, 48000, 16, 0L))
      .toDF("ch", "rate", "bits", "frames")
    val got = df.select($"ch", $"rate", $"bits", $"frames",
        graft.functions.media.audio_meta(Multimodal.synthesizeWavHeader(
          $"ch", $"rate", $"bits", $"frames")).as("m"))
      .select($"ch", $"rate", $"bits", $"frames",
        $"m.channels", $"m.sample_rate", $"m.bits", $"m.n_frames")
      .collect()
    got.foreach { r =>
      assert(r.getInt(4) === r.getInt(0))
      assert(r.getInt(5) === r.getInt(1))
      assert(r.getInt(6) === r.getInt(2))
      assert(r.getLong(7) === r.getLong(3))
    }
  }

  test("parseWav is permissive: garbage, truncation, stray chunks, odd sizes") {
    import graft.functions.MediaHeaders
    assert(MediaHeaders.parseWav(null) === None)
    assert(MediaHeaders.parseWav(Array[Byte](1, 2, 3)) === None)
    assert(MediaHeaders.parseWav("RIFFxxxxNOPE".getBytes("US-ASCII")) === None)
    // a valid header via the synth column, then corrupt it
    val full = spark.range(1).select(
        graft.llm.Multimodal.synthesizeWavHeader(lit(2), lit(16000), lit(16), lit(100L)))
      .head().getAs[Array[Byte]](0)
    assert(MediaHeaders.parseWav(full) === Some((2, 16000, 16, 100L)))
    // truncated mid-fmt -> None, never a throw
    assert(MediaHeaders.parseWav(full.take(20)) === None)
    // an ODD-sized stray chunk before fmt must be word-aligned over
    val stray = "4A554E4B" + "03000000" + "414243" + "00" // "JUNK" len 3 + pad
    val strayBytes = stray.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val shifted = full.take(12) ++ strayBytes ++ full.drop(12)
    assert(MediaHeaders.parseWav(shifted) === Some((2, 16000, 16, 100L)))
    // hostile chunk size near Int.MaxValue must not wrap the cursor
    // negative (was an ArrayIndexOutOfBoundsException)
    val hostile = "52494646" + "24000000" + "57415645" +
      "4A554E4B" + "F0FFFF7F" // JUNK declaring size 0x7FFFFFF0
    val hostileBytes = hostile.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(MediaHeaders.parseWav(hostileBytes) === None)
    // a fmt chunk DECLARING size < 16 must not fabricate fields from
    // the following bytes
    val shortFmt = full.clone()
    shortFmt(16) = 4 // fmt size LE32 := 4
    assert(MediaHeaders.parseWav(shortFmt) === None)
  }

  test("synthesizeWavHeader fails loudly outside the PCM contract") {
    // 12-bit samples: blockAlign is fractional — must raise, not emit
    // a plausible-looking corrupt header
    val e = intercept[Exception] {
      spark.range(1).select(graft.llm.Multimodal.synthesizeWavHeader(
        lit(2), lit(16000), lit(12), lit(100L))).collect()
    }
    assert(e.getMessage.contains("PCM header contract"), e.getMessage)
  }

  test("synthesizeAviHeader round-trips through video_meta") {
    val row = spark.range(1).select(
      graft.functions.media.video_meta(graft.llm.Multimodal.synthesizeAviHeader(
        lit(1280), lit(720), lit(2), lit(240L), lit(41667L))).as("m"))
      .selectExpr("m.width", "m.height", "m.streams", "m.n_frames",
        "m.us_per_frame")
      .collect()(0)
    assert(row.getInt(0) === 1280)
    assert(row.getInt(1) === 720)
    assert(row.getInt(2) === 2)
    assert(row.getLong(3) === 240L)
    assert(row.getLong(4) === 41667L)
  }

  test("parseAvi is permissive: garbage, truncation, hostile sizes, stray chunks") {
    import graft.functions.MediaHeaders
    assert(MediaHeaders.parseAvi(null) === None)
    assert(MediaHeaders.parseAvi(Array[Byte](1, 2, 3)) === None)
    // a WAV container is RIFF but not AVI
    val wav = spark.range(1).select(
        graft.llm.Multimodal.synthesizeWavHeader(lit(2), lit(16000), lit(16), lit(100L)))
      .collect()(0).getAs[Array[Byte]](0)
    assert(MediaHeaders.parseAvi(wav) === None)
    val full = spark.range(1).select(
        graft.llm.Multimodal.synthesizeAviHeader(
          lit(640), lit(480), lit(1), lit(120L), lit(33333L)))
      .collect()(0).getAs[Array[Byte]](0)
    assert(MediaHeaders.parseAvi(full) === Some((640, 480, 1, 120L, 33333L)))
    // truncation inside the hdrl list
    assert(MediaHeaders.parseAvi(full.take(30)) === None)
    // a stray word-aligned JUNK chunk BEFORE the hdrl list still parses
    val junk = "4A554E4B" + "04000000" + "00000000" // JUNK size 4 + payload
    val junkBytes = junk.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val shifted = full.take(12) ++ junkBytes ++ full.drop(12)
    assert(MediaHeaders.parseAvi(shifted) === Some((640, 480, 1, 120L, 33333L)))
    // hostile chunk size near Int.MaxValue must not wrap the cursor
    val hostile = "52494646" + "24000000" + "41564920" +
      "4A554E4B" + "F0FFFF7F"
    val hostileBytes = hostile.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(MediaHeaders.parseAvi(hostileBytes) === None)
    // an avih chunk DECLARING size < 56 must not fabricate fields
    val shortAvih = full.clone()
    shortAvih(24) = 8 // avih size LE32 := 8
    assert(MediaHeaders.parseAvi(shortAvih) === None)
  }

  test("synthesizeAviHeader fails loudly outside the header contract") {
    val e = intercept[Exception] {
      spark.range(1).select(graft.llm.Multimodal.synthesizeAviHeader(
        lit(0), lit(480), lit(1), lit(120L), lit(33333L))).collect()
    }
    assert(e.getMessage.contains("AVI header contract"), e.getMessage)
  }

  // ---- real pixel/sample decode (PGM + PCM16 WAV) ----

  test("synth_pgm -> image_stats decodes every pixel exactly") {
    import graft.functions.media.{image_stats, synth_pgm}
    val id = 5L; val w = 7; val h = 4
    val got = spark.range(1).select(
      image_stats(synth_pgm(lit(id), lit(w), lit(h))).as("s"))
      .select($"s.width", $"s.height", $"s.n_px", $"s.px_sum", $"s.px_min", $"s.px_max")
      .head()
    val px = for (y <- 0 until h; x <- 0 until w)
      yield ((id * 7 + x * 31 + y * 17) % 256).toInt
    assert(got.getInt(0) === w && got.getInt(1) === h)
    assert(got.getLong(2) === w.toLong * h)
    assert(got.getLong(3) === px.map(_.toLong).sum)
    assert(got.getInt(4) === px.min && got.getInt(5) === px.max)
  }

  test("image_downsample is the floor-of-block-mean, re-encoded as real PGM") {
    import graft.functions.media.{image_downsample, image_stats, synth_pgm}
    val id = 9L; val w = 9; val h = 5 // odd dims: trailing row/col dropped
    val got = spark.range(1).select(
      image_stats(image_downsample(synth_pgm(lit(id), lit(w), lit(h)), 2)).as("s"))
      .select($"s.width", $"s.height", $"s.px_sum").head()
    def p(x: Int, y: Int) = ((id * 7 + x * 31 + y * 17) % 256).toInt
    val outSum = (for (oy <- 0 until 2; ox <- 0 until 4) yield {
      val s = p(2 * ox, 2 * oy) + p(2 * ox + 1, 2 * oy) +
        p(2 * ox, 2 * oy + 1) + p(2 * ox + 1, 2 * oy + 1)
      (s / 4).toLong
    }).sum
    assert(got.getInt(0) === 4 && got.getInt(1) === 2)
    assert(got.getLong(2) === outSum)
  }

  test("synth_wav_pcm -> audio_stats reads real PCM16 samples") {
    import graft.functions.media.{audio_stats, synth_wav_pcm}
    val id = 3L; val n = 257
    val got = spark.range(1).select(
      audio_stats(synth_wav_pcm(lit(id), lit(n))).as("s"))
      .select($"s.n_samples", $"s.sum_abs", $"s.sum_sq", $"s.peak",
        $"s.zero_crossings", $"s.clip_count").head()
    val samples = (0 until n).map(t =>
      ((((id * 7919 + t * 2654435761L) % 65536) + 65536) % 65536).toInt - 32768)
    assert(got.getLong(0) === n.toLong)
    assert(got.getLong(1) === samples.map(s => math.abs(s).toLong).sum)
    assert(got.getLong(2) === samples.map(s => s.toLong * s).sum)
    assert(got.getInt(3) === samples.map(math.abs).max)
    assert(got.getLong(4) === samples.sliding(2)
      .count(p => p.head.toLong * p.last < 0).toLong)
    assert(got.getLong(5) === samples.count(s => s == 32767 || s == -32768).toLong)
    // and the header parses as a well-formed 16 kHz mono PCM16 WAV
    val bytes = spark.range(1)
      .select(synth_wav_pcm(lit(id), lit(n)).as("b")).head().getAs[Array[Byte]](0)
    assert(graft.functions.MediaHeaders.parseWav(bytes) === Some((1, 16000, 16, n.toLong)))
  }

  test("audio_stats survives hostile declared chunk sizes (returns null, never crashes)") {
    import graft.functions.media.{audio_stats, synth_wav_pcm}
    val good = spark.range(1)
      .select(synth_wav_pcm(lit(1L), lit(8)).as("b")).head().getAs[Array[Byte]](0)
    // data chunk declares 0x7FFFFFF0 bytes but carries 16: the Int sum
    // dataOff + dataLen used to wrap negative and index out of bounds
    val hugeSize = good.clone()
    hugeSize(40) = 0xf0.toByte; hugeSize(41) = 0xff.toByte
    hugeSize(42) = 0xff.toByte; hugeSize(43) = 0x7f.toByte
    // declared size 0x80000000 (negative as Int32): used to emit a
    // bogus all-zero stats row
    val negSize = good.clone()
    negSize(40) = 0x00.toByte; negSize(41) = 0x00.toByte
    negSize(42) = 0x00.toByte; negSize(43) = 0x80.toByte
    val out = Seq(hugeSize, negSize).toDF("b")
      .select(audio_stats($"b").as("s")).collect()
    assert(out.forall(_.isNullAt(0)), "hostile sizes must yield null")
  }

  test("JFIF YCbCr pipeline at the DataFrame level: synth_jpeg_ycbcr -> " +
    "jpeg_stats_ycbcr matches the pinned transform composition, and " +
    "arbitrary-image tolerance holds through the expressions") {
    import graft.functions.media.{jpeg_stats_ycbcr, synth_jpeg_ycbcr}
    import graft.functions.Jpeg
    // exact: block-constant RGB through the full expression pipeline
    val (w, h, id) = (24, 16, 9L)
    val got = spark.range(1).select(
        jpeg_stats_ycbcr(synth_jpeg_ycbcr(lit(id), lit(w), lit(h))).as("s"))
      .select($"s.r_sum", $"s.g_sum", $"s.b_sum").head()
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val k = 3 * (y * w + x)
      rgb(k) = (((id * 7 + (x / 8) * 31L + (y / 8) * 17L) % 256 + 256) % 256).toByte
      rgb(k + 1) = (((id * 11 + (x / 8) * 13L + (y / 8) * 29L) % 256 + 256) % 256).toByte
      rgb(k + 2) = (((id * 3 + (x / 8) * 37L + (y / 8) * 23L) % 256 + 256) % 256).toByte
    }
    val expected = Jpeg.ycbcrToRgb(Jpeg.rgbToYcbcr(rgb))
    val sums = new Array[Long](3)
    for (k <- expected.indices) sums(k % 3) += expected(k) & 0xff
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ===
      ((sums(0), sums(1), sums(2))))
    // tolerance: an arbitrary (non-block-constant) image through the
    // REAL codec + both transforms stays within the documented ±8
    val px = Array.tabulate(3 * w * h)(k => ((k * 41 + 7) % 256).toByte)
    val Some((_, _, _, out)) = Jpeg.decodeToRgb(Jpeg.encodeJfifRgb(w, h, px))
    for (k <- px.indices)
      assert(math.abs((out(k) & 0xff) - (px(k) & 0xff)) <= 8, s"px $k")
  }

  test("audio_stats: a 24-bit payload whose sum_sq exceeds int64 yields " +
    "null, not a silently wrapped statistic (round-9 advice)") {
    import graft.functions.media.audio_stats
    // 140,000 full-rail 24-bit samples: sum_sq = 140000 * (2^23-1)^2
    // ~= 9.85e18 > Long.MaxValue 9.22e18 -> the exact-int64 contract
    // is unsatisfiable and AudioStats must say so loudly
    def wav24(n: Int, sample: Int): Array[Byte] = {
      val out = new Array[Byte](44 + 3 * n)
      def le32(off: Int, v: Long): Unit = {
        out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
        out(off + 2) = ((v >> 16) & 0xff).toByte
        out(off + 3) = ((v >> 24) & 0xff).toByte
      }
      def le16(off: Int, v: Int): Unit = {
        out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      }
      def ascii(off: Int, s: String): Unit =
        for (i <- 0 until s.length) out(off + i) = s.charAt(i).toByte
      ascii(0, "RIFF"); le32(4, 36L + 3 * n); ascii(8, "WAVE")
      ascii(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
      le32(24, 16000); le32(28, 48000L); le16(32, 3); le16(34, 24)
      ascii(36, "data"); le32(40, 3L * n)
      for (t <- 0 until n) {
        out(44 + 3 * t) = (sample & 0xff).toByte
        out(44 + 3 * t + 1) = ((sample >> 8) & 0xff).toByte
        out(44 + 3 * t + 2) = ((sample >> 16) & 0xff).toByte
      }
      out
    }
    val rail = (1 << 23) - 1
    val overflowing = wav24(140000, rail)
    val fine = wav24(1000, rail) // same rail, sum_sq ~7e16: exact
    val rows = Seq(overflowing, fine).toDF("b")
      .select(audio_stats($"b").as("s")).collect()
    assert(rows(0).isNullAt(0), "overflowing sum_sq must yield null")
    val ok = rows(1).getStruct(0)
    assert(ok.getLong(0) === 1000L)
    assert(ok.getLong(2) === 1000L * rail.toLong * rail.toLong)
    assert(ok.getLong(5) === 1000L, "every sample sits at the rail")
  }

  test("pixel/sample decoders are PERMISSIVE: non-matching payloads -> null") {
    import graft.functions.media.{audio_stats, image_downsample, image_stats}
    val junk = Seq(Array[Byte](1, 2, 3), "P5 broken".getBytes("US-ASCII"),
      "RIFFxxxx".getBytes("US-ASCII")).toDF("b")
    val out = junk.select(image_stats($"b").as("i"),
      image_downsample($"b", 2).as("d"), audio_stats($"b").as("a")).collect()
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)))
  }
}
