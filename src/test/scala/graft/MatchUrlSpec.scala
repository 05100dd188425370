package graft

import org.apache.spark.sql.functions._

import graft.functions.{matching, url, Url}

/** Aho–Corasick multi-pattern scan + the pinned URL subset: the
  * textbook fail-link cases (suffix outputs, overlapping matches),
  * code-point handling, and URL normalization edges. */
class MatchUrlSpec extends SparkSpec {
  import spark.implicits._

  private def counts(text: String, pats: Seq[String]): Seq[Long] =
    Seq(text).toDF("t")
      .select(matching.multi_match_counts($"t", pats).as("c"))
      .head().getSeq[Long](0)

  test("the textbook AC case: he/she/his/hers over 'ushers' — fail links " +
    "must report SUFFIX matches ('he' inside 'she')") {
    assert(counts("ushers", Seq("he", "she", "his", "hers")) ===
      Seq(1L, 1L, 0L, 1L))
  }

  test("overlapping occurrences all count (end-position semantics)") {
    assert(counts("aaaa", Seq("aa")) === Seq(3L))
    assert(counts("abababa", Seq("aba")) === Seq(3L))
    // and patterns that are prefixes of each other both fire
    assert(counts("aaab", Seq("a", "aa", "aaa")) === Seq(3L, 2L, 1L))
  }

  test("code points: a supplementary-plane pattern matches without " +
    "splitting its surrogate pair") {
    assert(counts("x🙂y🙂🙂z", Seq("🙂", "🙂🙂")) === Seq(3L, 1L))
  }

  test("empty text and absent patterns count zero; automaton is " +
    "deterministic across rows") {
    assert(counts("", Seq("a", "b")) === Seq(0L, 0L))
    val rows = Seq("the data", "no match here at all!", "the the the")
      .toDF("t")
      .select(matching.multi_match_counts($"t", Seq("the", "data")).as("c"))
      .collect().map(_.getSeq[Long](0))
    assert(rows(0) === Seq(1L, 1L))
    assert(rows(1) === Seq(0L, 0L))
    assert(rows(2) === Seq(3L, 0L))
  }

  test("url normalization: case, default ports, empty path, fragment") {
    val Some(p) = Url.parse("HTTPS://WWW.Example.COM:443/A/B?x=1&y=2#sec")
    assert(p.scheme === "HTTPS" && p.host === "WWW.Example.COM" && p.port === 443)
    assert(p.path === "/A/B" && p.query === "x=1&y=2" && p.fragment === "sec")
    assert(p.normalized === "https://www.example.com/A/B?x=1&y=2")
    assert(Url.parse("http://h:80").get.normalized === "http://h/")
    assert(Url.parse("http://h:8080").get.normalized === "http://h:8080/")
    assert(Url.parse("ftp://h:21/f").get.normalized === "ftp://h:21/f",
      "non-http schemes keep their explicit port (no default table entry)")
    // query parameter ORDER is preserved (semantic for some endpoints)
    assert(Url.parse("http://h/p?b=2&a=1").get.normalized === "http://h/p?b=2&a=1")
  }

  test("url malformed inputs are null, never a throw") {
    val bad = Seq("", "no-scheme.example/x", "http//missing.colon", "://nohost",
      "http://", "http://user@host/secret", "http://h:99999/", "http://h:2x/",
      "1http://h/", "http://:8080/",
      "héttp://h/x") // RFC 3986 schemes are ASCII: Unicode letters reject
    for (u <- bad) assert(Url.parse(u) === None, u)
    val out = (bad :+ "http://ok.example/fine").toDF("u")
      .select(url.url_parse($"u").as("s")).collect()
    assert(out.init.forall(_.isNullAt(0)))
    assert(out.last.getStruct(0).getString(6) === "http://ok.example/fine")
  }
}
