package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZstdCodec

/** RFC 8878 full codec, validated against the REFERENCE zstd
  * implementation (zstd-jni, already on the Spark classpath) in both
  * directions:
  *   - our compressor's frames must decode with reference zstd
  *     (checksum verified by the native side),
  *   - reference-compressed frames at several levels (which exercise
  *     repeat offsets, treeless literals, custom FSE tables, RLE
  *     blocks, 4-stream Huffman) must decode with our decoder.
  * Plus truncation/bit-flip fuzz pinning the permissive-null contract
  * and multi-frame/skippable walking. */
class ZstdCodecSpec extends AnyFunSuite {

  private def lcgBytes(seed: Long, n: Int, alphabet: Int): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % alphabet + 'a').toByte
    }
  }

  private def textLike(seed: Long, n: Int): Array[Byte] = {
    val words = Array("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "zstd", "frame", "block", "sequence", "entropy")
    val sb = new StringBuilder
    var s = seed
    while (sb.length < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      sb.append(words(((s >>> 33) % words.length).toInt)).append(' ')
    }
    sb.substring(0, n).getBytes("US-ASCII")
  }

  private def jniDecompress(frame: Array[Byte], expectLen: Int): Array[Byte] =
    com.github.luben.zstd.Zstd.decompress(frame, math.max(expectLen, 1))

  private def jniCompress(src: Array[Byte], level: Int, checksum: Boolean): Array[Byte] = {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      ctx.setLevel(level)
      ctx.setChecksum(checksum)
      ctx.compress(src)
    } finally ctx.close()
  }

  private val corpus: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.empty[Byte],
    "one" -> Array('x'.toByte),
    "tiny" -> "abc".getBytes,
    "allsame-small" -> Array.fill(100)('z'.toByte),
    "allsame-big" -> Array.fill(300 * 1024)('q'.toByte),
    "text-1k" -> textLike(1, 1024),
    "text-64k" -> textLike(2, 64 * 1024),
    "text-200k" -> textLike(3, 200 * 1024), // multi-block
    "doubled" -> { val t = textLike(4, 30000); t ++ t },
    "random-ascii" -> lcgBytes(5, 5000, 26),
    "random-binary" -> { // incompressible: raw-block path
      var s = 99L
      Array.fill(4096) {
        s = s * 6364136223846793005L + 1442695040888963407L
        (s >>> 33).toByte
      }
    },
    "nonascii" -> { // alphabet > 127: literals fall back to raw
      var s = 7L
      Array.fill(2000) {
        s = s * 6364136223846793005L + 1442695040888963407L
        (128 + ((s >>> 33) % 64)).toByte
      }
    })

  test("our frames decode with reference zstd (both table modes)") {
    for ((name, src) <- corpus; explicit <- Seq(false, true)) {
      val frame = ZstdCodec.compress(src, explicit)
      val back = jniDecompress(frame, src.length)
      assert(back.sameElements(src), s"$name explicit=$explicit")
      // and with our own decoder
      val mine = ZstdCodec.decompress(frame)
      assert(mine.exists(_.sameElements(src)), s"$name self explicit=$explicit")
    }
  }

  test("compression is real: doubled text shrinks well below raw") {
    val t = textLike(10, 20000)
    val frame = ZstdCodec.compress(t ++ t, explicitTables = false)
    assert(frame.length < t.length, // < half of raw: the self-match fires
      s"expected < ${t.length}, got ${frame.length}")
  }

  test("reference frames decode with our decoder (levels, checksum)") {
    for ((name, src) <- corpus; level <- Seq(1, 3, 9, 19);
         checksum <- Seq(false, true)) {
      val frame = jniCompress(src, level, checksum)
      val mine = ZstdCodec.decompress(frame)
      assert(mine.exists(_.sameElements(src)),
        s"$name level=$level checksum=$checksum")
    }
  }

  test("multi-frame payloads: frame + skippable + frame concatenate") {
    val a = textLike(20, 4000)
    val b = lcgBytes(21, 1000, 26)
    val skippable = Array[Byte](0x52, 0x2a, 0x4d, 0x18, 4, 0, 0, 0, 1, 2, 3, 4)
    val payload = ZstdCodec.compress(a, false) ++ skippable ++
      jniCompress(b, 3, true)
    val out = ZstdCodec.decompress(payload)
    assert(out.exists(_.sameElements(a ++ b)))
    // skippable-only payload has no content frame -> null
    assert(ZstdCodec.decompress(skippable).isEmpty)
  }

  test("truncation at every byte -> null (never a wrong answer)") {
    val src = textLike(30, 3000)
    val frame = ZstdCodec.compress(src, explicitTables = true)
    for (k <- 0 until frame.length) {
      val cut = frame.take(k)
      val r = ZstdCodec.decompress(cut)
      assert(r.isEmpty, s"truncated at $k decoded to Some")
    }
  }

  test("single-byte corruption -> null or the original (checksum gate)") {
    val src = textLike(31, 2000)
    val frame = ZstdCodec.compress(src, explicitTables = false)
    for (k <- 0 until frame.length) {
      val bad = frame.clone()
      bad(k) = (bad(k) ^ 0x41).toByte
      val r = ZstdCodec.decompress(bad)
      assert(r.isEmpty || r.exists(_.sameElements(src)), s"flip at $k")
    }
  }

  test("dictionary-flagged frames WITHOUT the dictionary route to null") {
    // hand-build: magic, FHD with dict-id flag 1, window descriptor,
    // 1-byte dict id, then a raw last block
    val f = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte,
      0x01, // FHD: dict-id flag only
      0x00, // window descriptor (1 KiB)
      0x07, // dictionary id = 7
      0x09, 0x00, 0x00, // block header: last=1, raw, size=1
      0x41)
    assert(ZstdCodec.decompress(f).isEmpty)
  }

  test("reserved block type and FHD reserved bit -> null") {
    val okFrame = ZstdCodec.compress("abcdef".getBytes, false)
    val badFhd = okFrame.clone()
    badFhd(4) = (badFhd(4) | 0x08).toByte // FHD reserved bit
    assert(ZstdCodec.decompress(badFhd).isEmpty)
    assert(ZstdCodec.decompress("not zstd at all".getBytes).isEmpty)
    assert(ZstdCodec.decompress(null).isEmpty)
    assert(ZstdCodec.decompress(Array.empty[Byte]).isEmpty)
  }

  test("xxh64 matches the reference checksum end-to-end") {
    // jni verifies the checksum our compressor writes; additionally pin
    // a few known xxh64 values (seed 0) from the published test vectors
    assert(ZstdCodec.xxh64(Array.empty[Byte], 0, 0) == 0xef46db3751d8e999L)
    val abc = "abc".getBytes("US-ASCII")
    assert(ZstdCodec.xxh64(abc, 0, 3) == 0x44bc2cf5ad770999L)
  }

  test("TRAINED structured dictionaries (reference-built) decode: " +
    "entropy-table seeding, dict window, dict-id checks") {
    // train a real dictionary with the reference implementation over
    // doc-shaped samples, compress small docs against it, decode with
    // OUR dict parser — validating the §5 layout (huf + OF/ML/LL FSE
    // tables + reps + content) against ground truth
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(1 << 20, 16 * 1024)
    for (i <- 0 until 200) trainer.addSample(textLike(i, 800))
    val dict = trainer.trainSamples()
    assert(dict.length > 100)
    for (seed <- 50L until 60L; level <- Seq(1, 3, 19)) {
      val src = textLike(seed, 700)
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      val frame = try { ctx.setLevel(level); ctx.loadDict(dict); ctx.compress(src) }
        finally ctx.close()
      val mine = ZstdCodec.decompressWithDict(frame, dict)
      assert(mine.exists(_.sameElements(src)), s"seed=$seed level=$level")
      // without the dictionary the frame must refuse, not misdecode
      assert(ZstdCodec.decompress(frame).isEmpty, s"no-dict seed=$seed")
      // with a DIFFERENT trained dictionary: id mismatch -> null
      val trainer2 = new com.github.luben.zstd.ZstdDictTrainer(1 << 20, 16 * 1024)
      for (i <- 500 until 700) trainer2.addSample(textLike(i, 800))
      val wrong = trainer2.trainSamples()
      assert(ZstdCodec.decompressWithDict(frame, wrong).isEmpty ||
        !ZstdCodec.decompressWithDict(frame, wrong).get.sameElements(src))
    }
  }

  test("RAW dictionaries round-trip both directions vs reference zstd") {
    val dict = textLike(7, 2000)
    for (seed <- 70L until 78L) {
      val src = textLike(seed, 1500)
      // ours-compress -> reference-decompress with the same raw dict
      val frame = ZstdCodec.compressWithDict(src, dict)
      val dctx = new com.github.luben.zstd.ZstdDecompressCtx()
      val back = try { dctx.loadDict(dict); dctx.decompress(frame, src.length) }
        finally dctx.close()
      assert(back.sameElements(src), s"jni side seed=$seed")
      // and with our own decoder
      assert(ZstdCodec.decompressWithDict(frame, dict)
        .exists(_.sameElements(src)), s"self seed=$seed")
    }
    // the dict genuinely helps: text whose first half IS the dict
    val half = textLike(99, 400)
    val doc = half ++ textLike(100, 400)
    val withD = ZstdCodec.compressWithDict(doc, half)
    val withoutD = ZstdCodec.compress(doc)
    assert(withD.length < withoutD.length,
      s"dict should shrink: ${withD.length} vs ${withoutD.length}")
    // garbage structured dict (magic + junk) -> null, never a throw
    val junk = Array[Byte](0x37, 0xa4.toByte, 0x30, 0xec.toByte, 1, 2, 3, 4, 5)
    assert(ZstdCodec.decompressWithDict(withD, junk).isEmpty)
    assert(ZstdCodec.decompressWithDict(withD, null).isEmpty)
  }

  test("pure-random blobs never throw and never 'decode' (10k fuzz)") {
    var s = 42L
    for (k <- 0 until 10000) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val len = ((s >>> 33) % 64).toInt
      val blob = new Array[Byte](len)
      var i = 0
      while (i < len) {
        s = s * 6364136223846793005L + 1442695040888963407L
        blob(i) = (s >>> 33).toByte
        i += 1
      }
      // magic-prefixed variant: forces the frame parser deep in
      val framed = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte) ++ blob
      assert(ZstdCodec.decompress(blob).isEmpty ||
        blob.take(4).sameElements(Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte)))
      ZstdCodec.decompress(framed) // must not throw; usually None
    }
  }

  test("decompression bombs hit the admission cap, not the heap") {
    // declared content size beyond the 128 MiB cap -> rejected from
    // the header alone
    val big = new java.io.ByteArrayOutputStream()
    big.write(Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte), 0, 4)
    big.write(0x20 | (3 << 6)) // single-segment, 8-byte content size
    var v = 1L << 40
    for (_ <- 0 until 8) { big.write((v & 0xff).toInt); v >>= 8 }
    big.write(Array[Byte](0x09, 0, 0, 0x41), 0, 4) // last raw block "A"
    assert(ZstdCodec.decompress(big.toByteArray).isEmpty)
    // undeclared-size RLE bomb: blocks expand until the cap trips;
    // must return None without exhausting memory
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write(Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte), 0, 4)
    bomb.write(0x00) // FHD: no content size, window descriptor follows
    bomb.write(0xff) // max window descriptor (clamped by MaxWindow gate)
    assert(ZstdCodec.decompress(bomb.toByteArray).isEmpty) // window too big
    val bomb2 = new java.io.ByteArrayOutputStream()
    bomb2.write(Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte), 0, 4)
    bomb2.write(0x00)
    bomb2.write(0x70) // ~128 KiB window: admissible
    val rleHeader = (0 << 0) | (1 << 1) | (131071 << 3) // non-last RLE, max size
    for (_ <- 0 until 2000) { // would be ~256 MiB expanded
      bomb2.write(rleHeader & 0xff); bomb2.write((rleHeader >> 8) & 0xff)
      bomb2.write((rleHeader >> 16) & 0xff); bomb2.write('z')
    }
    assert(ZstdCodec.decompress(bomb2.toByteArray).isEmpty)
    // 8-byte content size with bit 63 set would wrap negative; it must
    // fail admission, not bypass the contentSize compares
    val neg = new java.io.ByteArrayOutputStream()
    neg.write(Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte), 0, 4)
    neg.write(0x20 | (3 << 6)) // single-segment, 8-byte content size
    for (i <- 0 until 8) neg.write(if (i == 7) 0x80 else 0x00) // 2^63
    neg.write(Array[Byte](0x01, 0, 0), 0, 3) // last raw block, 0 bytes
    assert(ZstdCodec.decompress(neg.toByteArray).isEmpty)
  }

  test("many-block frames decode in O(frame), not O(blocks x frame)") {
    // one frame = 2000 raw blocks of 4 KiB: with per-block window
    // re-materialization this would cost ~16 GB of memcpy; with the
    // single growable window it is linear and finishes instantly
    val payload = textLike(99, 4096)
    val f = new java.io.ByteArrayOutputStream()
    f.write(Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte), 0, 4)
    f.write(0x00); f.write(0x70) // no FCS, ~128 KiB window
    val n = 2000
    for (i <- 0 until n) {
      val bh = ((if (i == n - 1) 1 else 0) << 0) | (0 << 1) | (4096 << 3)
      f.write(bh & 0xff); f.write((bh >> 8) & 0xff); f.write((bh >> 16) & 0xff)
      f.write(payload, 0, 4096)
    }
    val t0 = System.nanoTime()
    val out = ZstdCodec.decompress(f.toByteArray)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(out.exists(_.length == n * 4096))
    assert(ms < 5000, s"decode took $ms ms — window re-materialization regressed")
  }

  test("seekable shards: member range-reads, table walk, corrupt gates") {
    import graft.functions.ZstdSeekable
    val chunks = (0 until 7).map(i => textLike(i * 3 + 1, 500 + i * 37)).toArray
    val shard = ZstdSeekable.pack(chunks)
    val table = ZstdSeekable.seekTable(shard)
    assert(table.exists(_.length == 7))
    assert(table.get.forall(_.checksum.isDefined))
    for (i <- chunks.indices)
      assert(ZstdSeekable.read(shard, i).exists(_.sameElements(chunks(i))), s"member $i")
    assert(ZstdSeekable.read(shard, 7).isEmpty)
    assert(ZstdSeekable.read(shard, -1).isEmpty)
    // the shard is ALSO a plain multi-frame payload: whole-shard
    // inflate walks members and skips the seek table
    assert(ZstdCodec.decompress(shard)
      .exists(_.sameElements(chunks.reduce(_ ++ _))))
    // footer corruption kills the seek path (whole-shard path unaffected)
    val badFooter = shard.clone()
    badFooter(shard.length - 1) = 0x00
    assert(ZstdSeekable.seekTable(badFooter).isEmpty)
    // a flipped byte inside one member: that member's read -> None
    // (frame checksum/parse or the seek-table checksum catches it),
    // OTHER members still read fine (the point of range reads)
    val m0 = table.get(0)
    val flipped = shard.clone()
    flipped((m0.cOffset + m0.cSize / 2).toInt) =
      (flipped((m0.cOffset + m0.cSize / 2).toInt) ^ 0x55).toByte
    assert(ZstdSeekable.read(flipped, 0).isEmpty ||
      ZstdSeekable.read(flipped, 0).get.sameElements(chunks(0)))
    assert(ZstdSeekable.read(flipped, 3).exists(_.sameElements(chunks(3))))
    // empty shard: zero members is a valid table
    val empty = ZstdSeekable.pack(Array.empty)
    assert(ZstdSeekable.seekTable(empty).exists(_.isEmpty))
  }

  test("large random-structured input with explicit tables round-trips") {
    // mixed structure: repetitive runs + word salad + binary islands
    val parts = (0 until 40).map { i =>
      if (i % 3 == 0) Array.fill(1000 + i * 13)((i + 'A').toByte)
      else if (i % 3 == 1) textLike(i, 2000)
      else lcgBytes(i, 500, 200)
    }
    val src = parts.reduce(_ ++ _)
    for (explicit <- Seq(false, true)) {
      val frame = ZstdCodec.compress(src, explicit)
      assert(jniDecompress(frame, src.length).sameElements(src))
      assert(ZstdCodec.decompress(frame).exists(_.sameElements(src)))
    }
  }
}
