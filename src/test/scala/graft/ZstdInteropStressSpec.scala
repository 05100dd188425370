package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZstdCodec

/** Randomized interop STRESS vs reference zstd: 870 cases across
  * every compression level (-5 fast .. 22 ultra), window-log
  * overrides, five data shapes (word-ish / random / long runs /
  * skewed / periodic) at sizes up to 2 MB, plus trained-dictionary
  * frames — the wide-spectrum complement to ZstdCodecSpec's targeted
  * cases. */
class ZstdInteropStressSpec extends AnyFunSuite {

  private def gen(seed: Long, n: Int, mode: Int): Array[Byte] = {
    var s = seed
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val r = (s >>> 33)
      out(i) = mode match {
        case 0 => ('a' + r % 26).toByte // word-ish
        case 1 => r.toByte // random binary
        case 2 => ('a' + (i / 200) % 26).toByte // long runs
        case 3 => if (r % 10 < 7) 'x'.toByte else r.toByte // skewed
        case _ => (i % 251).toByte // periodic
      }
      i += 1
    }
    out
  }

  test("stress: reference frames at every level/window decode with ours") {
    var cases = 0
    for (seed <- 0 until 40) {
      val mode = seed % 5
      val n = (seed * 7919) % 1000000 + 1
      val src = gen(seed, n, mode)
      for (level <- Seq(-5, 1, 5, 12, 19, 22); wlog <- Seq(0, 10, 18)) {
        val ctx = new com.github.luben.zstd.ZstdCompressCtx()
        val frame = try {
          ctx.setLevel(level)
          if (wlog > 0) ctx.setWindowLog(wlog)
          ctx.setChecksum(seed % 2 == 0)
          ctx.compress(src)
        } finally ctx.close()
        val mine = ZstdCodec.decompress(frame)
        assert(mine.exists(_.sameElements(src)),
          s"seed=$seed mode=$mode n=$n level=$level wlog=$wlog")
        cases += 1
      }
    }
    info(s"$cases reference->ours cases green")
  }

  test("stress: our frames at size extremes decode with reference") {
    var cases = 0
    for (seed <- 100 until 130) {
      val mode = seed % 5
      val n = (seed * 104729) % 2000000 + 1
      val src = gen(seed, n, mode)
      for (explicit <- Seq(false, true)) {
        val frame = ZstdCodec.compress(src, explicit)
        val back = com.github.luben.zstd.Zstd.decompress(frame, n)
        assert(back.sameElements(src), s"seed=$seed n=$n explicit=$explicit")
        cases += 1
      }
    }
    info(s"$cases ours->reference cases green")
  }

  test("stress: dict interop across sizes") {
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(1 << 22, 32 * 1024)
    for (i <- 0 until 300) trainer.addSample(gen(i, 2000, i % 5))
    val dict = trainer.trainSamples()
    for (seed <- 200 until 230; level <- Seq(1, 7, 19)) {
      val src = gen(seed, (seed * 31) % 60000 + 10, seed % 5)
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      val frame = try { ctx.setLevel(level); ctx.loadDict(dict); ctx.compress(src) }
        finally ctx.close()
      assert(ZstdCodec.decompressWithDict(frame, dict)
        .exists(_.sameElements(src)), s"seed=$seed level=$level")
    }
  }
}
