package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.{Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PercentDecode, Punycode}

/** RFC 3492 punycode (both directions) and WHATWG percent-decoding. */
class PunycodeSpec extends AnyFunSuite {

  test("punycode: RFC 3492 sample strings and well-known IDNA vectors") {
    // RFC 3492 §7.1 sample (L) "Why can't they just speak in <Chinese>?"
    // is long; the widely-circulated short vectors suffice here:
    assert(Punycode.decode("mnchen-3ya") === Some("münchen"))
    assert(Punycode.decode("bcher-kva") === Some("bücher"))
    assert(Punycode.decode("n3h") === Some("☃")) // snowman
    assert(Punycode.encode("münchen") === Some("mnchen-3ya"))
    assert(Punycode.encode("bücher") === Some("bcher-kva"))
    assert(Punycode.encode("☃") === Some("n3h"))
    // RFC 3492 §7.1 (S) mixed-case annotation example, lowercased:
    // "3B-ww4c5e180e575a65lsy2b" <-> "3<nen>B<gumi><kinpachi><sensei>"
    assert(Punycode.decode("3B-ww4c5e180e575a65lsy2b") ===
      Some("3年B組金八先生"))
  }

  test("punycode: encode -> decode round-trips arbitrary BMP labels " +
    "(property)") {
    val cpGen = Gen.frequency(
      6 -> Gen.choose('a'.toInt, 'z'.toInt),
      2 -> Gen.choose(0xa0, 0x2fff),
      1 -> Gen.choose(0x3040, 0x9fff))
    val gen = Gen.nonEmptyListOf(cpGen).map(_.take(30))
    val prop = Prop.forAll(gen) { cps =>
      val label = {
        val sb = new java.lang.StringBuilder()
        cps.foreach(sb.appendCodePoint)
        sb.toString
      }
      Punycode.encode(label).flatMap(Punycode.decode).contains(label)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("idna: mixed hosts decode labelwise; invalid labels null the host") {
    assert(Punycode.idnaDecode("www.xn--mnchen-3ya.de") ===
      Some("www.münchen.de"))
    assert(Punycode.idnaDecode("plain.example.com") ===
      Some("plain.example.com"))
    assert(Punycode.idnaDecode("xn--zzz!!.bad").isEmpty)
    assert(Punycode.idnaDecode("XN--N3H.net") === Some("☃.net"))
    // fuzz: arbitrary garbage labels never throw
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 500) {
      val s = "xn--" + rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      Punycode.idnaDecode(s)
    }
  }

  test("percent decode: forgiving WHATWG rules") {
    assert(PercentDecode.decode("hello%20world", plusAsSpace = false) ===
      "hello world")
    assert(PercentDecode.decode("caf%C3%A9", plusAsSpace = false) === "café")
    assert(PercentDecode.decode("a+b%2Bc", plusAsSpace = true) === "a b+c")
    assert(PercentDecode.decode("bad%2 escape%", plusAsSpace = false) ===
      "bad%2 escape%") // malformed escapes verbatim
    assert(PercentDecode.decode("lone%C3 tail", plusAsSpace = false) ===
      "lone� tail") // decoded byte stream repairs, never throws
    assert(PercentDecode.decode("100%25+done", plusAsSpace = false) ===
      "100%+done")
    assert(PercentDecode.decode("%e2%82%ac", plusAsSpace = false) === "€")
    // multibyte passthrough chars survive untouched
    assert(PercentDecode.decode("é%20€", plusAsSpace = false) ===
      "é €")
  }
}
