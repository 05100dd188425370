package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Jpeg, MediaHeaders}

/** The pure-JVM baseline JPEG codec behind `q_jpeg_decode` (ITU-T
  * T.81 baseline sequential, 8-bit grayscale): encode runs a real
  * float FDCT + all-ones quantization + Annex K Huffman entropy
  * coding with byte stuffing; decode builds its Huffman tables from
  * the stream's DHT segments, entropy-decodes with unstuffing, and
  * IDCTs. Two exactness regimes, both pinned here:
  *   - BLOCK-CONSTANT images (every 8×8 block one value) have DC-only
  *     spectra that survive round(FDCT)/IDCT bit-exactly — the oracle
  *     contract for q_jpeg_decode;
  *   - arbitrary images round-trip within ±2 gray levels (the codec
  *     is honestly lossy; the bound pins that the loss is rounding,
  *     not a transform/zigzag/Huffman bug — a transposed DCT or a
  *     wrong zigzag blows the bound out immediately). */
class JpegSpec extends AnyFunSuite {

  private def blockConstant(w: Int, h: Int, id: Long): Array[Byte] = {
    val a = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      a(y * w + x) =
        (((id * 7 + (x / 8) * 31L + (y / 8) * 17L) % 256 + 256) % 256).toByte
    a
  }

  test("block-constant images round-trip bit-exactly (dims not multiple of 8 too)") {
    for ((w, h) <- Seq((8, 8), (16, 16), (17, 13), (24, 9), (1, 1), (7, 22))) {
      val p = blockConstant(w, h, 42L + w + h)
      val Some((dw, dh, dp)) = Jpeg.decode(Jpeg.encode(w, h, p))
      assert((dw, dh) === (w, h), s"dims for ${w}x$h")
      assert(dp.toSeq === p.toSeq, s"pixels for ${w}x$h")
    }
  }

  test("arbitrary images round-trip within ±2 gray levels (property)") {
    val gen = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 24)
      seed <- Gen.choose(0L, 1000000L)
    } yield (w, h, seed)
    val prop = Prop.forAll(gen) { case (w, h, seed) =>
      val p = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w)
        p(y * w + x) = (((seed * 31 + x * 97L + y * 61L + x * y * 13L) % 256
          + 256) % 256).toByte
      Jpeg.decode(Jpeg.encode(w, h, p)).exists { case (dw, dh, dp) =>
        dw == w && dh == h && (0 until w * h).forall { k =>
          math.abs((dp(k) & 0xff) - (p(k) & 0xff)) <= 2
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("the asymmetric congruence catches transposition: wide vs tall differ") {
    // a transposed FDCT/IDCT pair cancels out in a roundtrip, so ALSO
    // pin the encoded container against the header parser's dims and
    // check a wide image decodes with its own geometry
    val p = blockConstant(24, 8, 7)
    val enc = Jpeg.encode(24, 8, p)
    assert(MediaHeaders.parse(enc) === Some(("jpeg", 24, 8)))
    val Some((dw, dh, _)) = Jpeg.decode(enc)
    assert((dw, dh) === (24, 8))
  }

  test("the entropy stream really is stuffed: raw 0xFF bytes are escaped") {
    // scan the whole container: after SOS, any 0xFF must be followed
    // by 0x00 (stuffing) or a marker code — decode would desync
    // otherwise; this pins the writer's stuffing discipline directly
    val enc = Jpeg.encode(32, 32, blockConstant(32, 32, 99))
    var i = 2
    var sos = -1
    while (sos < 0 && i + 4 < enc.length) {
      if ((enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xda) {
        val len = ((enc(i + 2) & 0xff) << 8) | (enc(i + 3) & 0xff)
        sos = i + 2 + len
      } else i += 1
    }
    assert(sos > 0)
    for (k <- sos until enc.length - 2)
      if ((enc(k) & 0xff) == 0xff)
        assert((enc(k + 1) & 0xff) == 0x00 || (enc(k + 1) & 0xff) >= 0xd0,
          s"unstuffed 0xFF at $k")
  }

  test("decoder builds Huffman tables from the stream's DHT, not constants") {
    // swap the Annex K DHT for a DIFFERENT valid table pair (flat
    // 8-bit codes for every DC/AC symbol) and re-encode the entropy
    // data by hand? — too invasive; instead corrupt one DHT byte so
    // the stream's table disagrees with the encoder's: a decoder that
    // used built-in constants would still decode happily, one that
    // honors the stream fails. We remove a code from BITS so the
    // symbol the stream uses becomes undecodable.
    val enc = Jpeg.encode(16, 16, blockConstant(16, 16, 3))
    var i = 2
    var dht = -1
    while (dht < 0 && i + 4 < enc.length) {
      if ((enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc4) dht = i
      else i += 1
    }
    assert(dht > 0)
    val bad = enc.clone()
    // first BITS array starts at dht+5 (marker 2 + len 2 + TcTh 1):
    // zero all 16 DC BITS counts -> every DC symbol undecodable
    for (k <- 0 until 16) bad(dht + 5 + k) = 0
    // (the table is now invalid for this stream; len stays consistent
    // because BITS counts drive how many HUFFVALs follow — zeroing
    // makes the decoder read 0 vals and mis-walk the segment, which
    // must surface as None, never a throw or a wrong image)
    assert(Jpeg.decode(bad) === None)
  }

  test("permissive None on malformed input, never a throw") {
    val enc = Jpeg.encode(8, 8, blockConstant(8, 8, 1))
    val cases = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      Array.fill(16)(0x55.toByte),     // not a JPEG
      enc.take(2),                     // SOI only
      enc.take(enc.length / 2),        // truncated mid-stream
      { val b = enc.clone(); b(0) = 0; b }) // corrupt SOI
    cases.foreach(b => assert(Jpeg.decode(b) === None))
    // trailing bytes AFTER a complete scan do not invalidate the
    // image (libjpeg semantics: all MCUs decoded = done) — permissive
    // in the accepting direction too
    assert(Jpeg.decode(enc.dropRight(2) :+ 0xff.toByte).isDefined)
    // progressive frame type (SOF2) is out of scope -> None
    val prog = enc.clone()
    var i = 2
    while (i + 1 < prog.length) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; i = prog.length
      } else i += 1
    }
    assert(Jpeg.decode(prog) === None)
  }

  test("image_dims sees synth-jpeg containers as real JPEGs") {
    // cross-parser agreement: the SOF-scanning header parser (written
    // before the codec existed) must read the codec's output
    val enc = Jpeg.encode(40, 24, blockConstant(40, 24, 11))
    assert(MediaHeaders.parse(enc) === Some(("jpeg", 40, 24)))
  }
}
