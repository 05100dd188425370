package graft

import org.apache.spark.sql.functions._

import graft.functions.kernels

/** Native kernel expressions must be semantically identical to the
  * composed-builtin forms they replace (they exist for speed only). */
class KernelsSpec extends SparkSpec {
  import spark.implicits._

  test("word_shingles equals composed-builtin shingling") {
    val docs = Seq(
      "a b c d e f g",
      "x y",                       // shorter than k -> empty
      "a a a a a a",               // duplicates collapse
      "the quick brown fox jumps over the lazy dog").toDF("text")
    val toks = split($"text", " ")
    val k = 5
    val builtin = when(size(toks) >= k,
      array_distinct(transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<string>"))
    val rows = docs.select(
      kernels.word_shingles(toks, k).as("fast"), builtin.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("fixed_point_dot equals interpreted aggregate/zip_with form") {
    val vecs = Seq(
      (Array(1.0f, 2.0f, -3.5f), Array(0.5f, -1.25f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (Array(1e-5f, -1e-5f, 1f), Array(1e-5f, 1e-5f, -1f))).toDF("a", "b")
    val builtin = aggregate(
      zip_with($"a", $"b", (x, y) =>
        floor(x.cast("double") * y.cast("double") * 1e9 + 0.5).cast("long")),
      lit(0L), (acc, t) => acc + t)
    val rows = vecs.select(
      kernels.fixed_point_dot($"a", $"b").as("fast"), builtin.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("fixed_point_dot_cent equals the interpreted zip_with form (incl. null parity)") {
    // float vector against a 1e-9 fixed-point LONG centroid — the
    // Lloyd-round hot loop this kernel replaces
    val rows = Seq(
      (Array(1.0f, 2.0f, -3.5f), Array(500000000L, -1250000000L, 2000000000L)),
      (Array(0.0f, -0.0f, 1e-6f), Array(1L, -1L, 999999999L)),
      (Array(1f, 1f, 1f), Array(0L, 0L, 0L))).toDF("v", "c")
    val builtin = aggregate(
      zip_with($"v", $"c", (x, c) =>
        floor(x.cast("double") * c.cast("double") + lit(0.5)).cast("long")),
      lit(0L), (acc, t) => acc + t)
    rows.select(kernels.fixed_point_dot_cent($"v", $"c").as("fast"), builtin.as("ref"))
      .collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // length mismatch and null element -> null, matching zip_with
    val mism = Seq((Array(1.0f, 2.0f), Array(1L, 2L, 3L))).toDF("v", "c")
    assert(mism.select(kernels.fixed_point_dot_cent($"v", $"c")).head().isNullAt(0))
    val withNull = Seq((Seq[java.lang.Float](1.0f, null), Seq[java.lang.Long](1L, 2L)))
      .toDF("v", "c")
    assert(withNull.select(kernels.fixed_point_dot_cent($"v", $"c")).head().isNullAt(0))
  }

  test("fixed_point_l2 equals interpreted aggregate/zip_with form") {
    val vecs = Seq(
      (Array(1.0f, 2.0f, -3.5f), Array(0.5f, -1.25f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (Array(1e-5f, -1e-5f, 1f), Array(1e-5f, 1e-5f, -1f))).toDF("a", "b")
    val builtin = aggregate(
      zip_with($"a", $"b", (x, y) =>
        floor((x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double")) * 1e9 + 0.5).cast("long")),
      lit(0L), (acc, t) => acc + t)
    val rows = vecs.select(
      kernels.fixed_point_l2($"a", $"b").as("fast"), builtin.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("fixed_point_l2 is null on length mismatch and null element (zip_with parity)") {
    val mismatch = Seq((Array(1.0f, 1.0f, 1.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(mismatch.select(kernels.fixed_point_l2($"a", $"b")).head().isNullAt(0))
    val nullElem = Seq(
      (Seq(Some(1.0f), None, Some(3.0f)), Seq(Some(1.0f), Some(2.0f), Some(3.0f))))
      .toDF("a", "b")
    assert(nullElem.select(kernels.fixed_point_l2($"a", $"b")).head().isNullAt(0))
  }

  test("fixed_point_dot handles nulls") {
    val df = Seq((Option.empty[Array[Float]], Option(Array(1.0f))))
      .toDF("a", "b")
    assert(df.select(kernels.fixed_point_dot($"a", $"b")).head().isNullAt(0))
  }

  test("fixed_point_dot is null on length mismatch (zip_with parity)") {
    val df = Seq((Array(1.0f, 1.0f, 1.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(kernels.fixed_point_dot($"a", $"b")).head().isNullAt(0))
  }

  test("fixed_point_dot is null on a null ELEMENT (zip_with parity)") {
    val df = Seq(
      (Seq(Some(1.0f), None, Some(3.0f)), Seq(Some(1.0f), Some(2.0f), Some(3.0f))),
      (Seq(Some(1.0f), Some(2.0f)), Seq(Some(1.0f), None))).toDF("a", "b")
    val builtin = aggregate(
      zip_with($"a", $"b", (x, y) =>
        floor(x.cast("double") * y.cast("double") * 1e9 + 0.5).cast("long")),
      lit(0L), (acc, t) => acc + t)
    df.select(kernels.fixed_point_dot($"a", $"b").as("fast"), builtin.as("ref"))
      .collect().foreach { r =>
        assert(r.isNullAt(0) && r.isNullAt(1))
      }
  }

  test("simhash32 kernel equals the exploded bit-vote formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = graft.llm.Dedup.simhash32(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val ref = graft.llm.Dedup.simhash32Exploded(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(fast.nonEmpty && fast === ref)
  }

  test("simhash32 kernel null/empty semantics") {
    val df = Seq(
      (1L, Some(Seq(Some("a"), Some("b")))),
      (2L, Some(Seq.empty[Option[String]])),      // no tokens -> null
      (3L, Option.empty[Seq[Option[String]]]),    // null array -> null
      (4L, Some(Seq(Option.empty[String])))       // all-null tokens -> null
    ).toDF("id", "toks")
    val got = df.select($"id", kernels.simhash32($"toks").as("s"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).isDefined && got(2L).isEmpty && got(3L).isEmpty && got(4L).isEmpty)
  }

  test("quantize_int8 kernel equals the composed HOF formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def render(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", $"scale",
        array_join(transform($"codes", c => c.cast("string")), ",").as("cs"),
        $"abs_err_fp")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    val fast = render(graft.llm.Similarity.quantizeInt8(emb, "embedding"))
    val ref = render(graft.llm.Similarity.quantizeInt8Composed(emb, "embedding"))
    assert(fast.nonEmpty && fast === ref)
  }

  test("quantize_int8 NaN propagation matches the composed form") {
    val df = Seq((1L, Seq(1.0f, Float.NaN, -2.0f))).toDF("vec_id", "embedding")
    def render(d: org.apache.spark.sql.DataFrame) = d
      .select($"scale".isNaN.as("nan_scale"),
        array_join(transform($"codes", c => c.cast("string")), ",").as("cs"),
        $"abs_err_fp")
      .collect().map(r => (r.getBoolean(0), r.getString(1), r.getLong(2)))
    val fast = render(graft.llm.Similarity.quantizeInt8(df, "embedding"))
    val ref = render(graft.llm.Similarity.quantizeInt8Composed(df, "embedding"))
    assert(fast === ref)
    assert(fast.head._1, "NaN input must yield NaN scale")
  }

  test("quantize_int8 kernel edge cases: zero vector, null element, null array") {
    val df = Seq(
      (1L, Some(Seq(Some(0.0f), Some(0.0f)))),    // zero vector -> scale 0, codes 0
      (2L, Some(Seq(Some(1.0f), None))),          // null element -> null
      (3L, Option.empty[Seq[Option[Float]]]))     // null array -> null
      .toDF("id", "v")
    val got = df.select($"id", kernels.quantize_int8($"v").as("q")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got(2L) && got(3L))
    val zero = df.filter($"id" === 1L)
      .select(kernels.quantize_int8($"v").as("q"))
      .select($"q.scale", $"q.codes", $"q.abs_err_fp").head()
    assert(zero.getDouble(0) === 0.0)
    assert(zero.getSeq[Int](1) === Seq(0, 0))
    assert(zero.getLong(2) === 0L)
  }

  test("zorder2 matches the composed 32-term shift/mask form") {
    // same generator the q_zorder oracle uses — drift-proof by sharing
    val terms = kernels.zorder2ComposedSql("x", "y")
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (70000L, 3L)) // 70000 exercises the 16-bit mask
      .toDF("x", "y")
    val got = df.select(kernels.zorder2($"x", $"y")).collect().map(_.getLong(0))
    val ref = df.select(expr(s"($terms)") // composed form masks via & 1 per bit
      .cast("long")).collect().map(_.getLong(0))
    // the composed form has no 16-bit input mask; (x & 65535) aligns it
    val refMasked = df.selectExpr("x & 65535 AS x", "y & 65535 AS y")
      .select(expr(s"($terms)").cast("long")).collect().map(_.getLong(0))
    assert(got === refMasked)
    // spot values: interleave of all-ones is all-ones over 32 bits
    assert(got(3) === 0xffffffffL)
    assert(got(1) === 1L && got(2) === 2L)
    assert(ref.length === got.length) // composed form evaluated (sanity)
  }

  test("zorder2 z-locality: sorting by zval bounds both dimensions per range") {
    // 64x64 grid -> 4096 points; split sorted zvals into 64 ranges of 64:
    // each range must span at most a 8x8 tile in (x, y) (Morton property)
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val z = pts.toDF("x", "y")
      .select($"x", $"y", kernels.zorder2($"x", $"y").as("z"))
      .orderBy($"z").collect().map(r => (r.getLong(0), r.getLong(1)))
    z.grouped(64).foreach { tile =>
      assert(tile.map(_._1).max - tile.map(_._1).min <= 7, "x range too wide")
      assert(tile.map(_._2).max - tile.map(_._2).min <= 7, "y range too wide")
    }
  }

  test("jaro_winkler_ppm matches classic Winkler '90 fixtures") {
    // fixtures verified against DuckDB's jaro_winkler_similarity
    // (the oracle implementation q_jaro_match replays against):
    // round(jw * 1e6) with the 0.7 boost threshold, empty -> 0
    val cases = Seq(
      ("martha", "marhta", 961111L),     // the canonical transposition pair
      ("DIXON", "DICKSONX", 813333L),    // prefix boost l=2
      ("abc", "abc", 1000000L),          // identity
      ("", "abc", 0L),                   // empty -> 0
      ("", "", 0L),                      // BOTH empty -> 0 (DuckDB convention)
      ("JELLYFISH", "SMELLYFISH", 896296L), // no common prefix, no boost
      ("hello world", "world hello", 503030L),
      ("a", "b", 0L),
      ("xy", "yx", 0L),                  // window 0: no matches at all
      ("aab", "aba", 555556L),           // jaro 5/9 <= 0.7: boost NOT applied
      ("CRAP", "TRAP", 833333L))
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(kernels.jaro_winkler_ppm($"a", $"b")).collect().map(_.getLong(0))
    got.zip(cases).foreach { case (g, (a, b, want)) =>
      assert(g === want, s"jw('$a','$b')")
    }
  }

  test("jaro_winkler_ppm is null-safe and symmetric") {
    val df = Seq((Option("abc"), Option.empty[String])).toDF("a", "b")
    assert(df.select(kernels.jaro_winkler_ppm($"a", $"b")).head().isNullAt(0))
    val pairs = Seq(("PROMO BRUSHED", "PROMO BURNISHED"), ("cold widget", "cold rod"))
      .toDF("a", "b")
    val fwd = pairs.select(kernels.jaro_winkler_ppm($"a", $"b")).collect().map(_.getLong(0))
    val rev = pairs.select(kernels.jaro_winkler_ppm($"b", $"a")).collect().map(_.getLong(0))
    assert(fwd.toSeq === rev.toSeq)
  }

  test("word_shingles skips null tokens like concat_ws") {
    val df = Seq(Seq(Some("a"), None, Some("b"), Some("c"))).toDF("toks")
    val got = df.select(kernels.word_shingles($"toks", 3)).head().getSeq[String](0)
    val ref = df.select(
      array_distinct(transform(sequence(lit(1), size($"toks") - 2),
        i => concat_ws(" ", slice($"toks", i, lit(3)))))).head().getSeq[String](0)
    assert(got === ref)
  }

  test("strip_html: script/style content dropped, entities decode after " +
    "tags, double-escaped stays escaped, tags never glue words") {
    def strip(s: String): String =
      Seq(s).toDF("t").select(kernels.strip_html($"t")).head().getString(0)
    assert(strip("<p>a</p><p>b</p>") === "a b",
      "tag removal must not concatenate adjacent words")
    assert(strip("<script>var s = '<p>hidden</p>';</script>visible") === "visible")
    assert(strip("<STYLE type='x'>p{}</STYLE>ok") === "ok", "case-insensitive")
    assert(strip("&lt;b&gt;not a tag&lt;/b&gt;") === "<b>not a tag</b>",
      "escaped markup is TEXT — decoded, not stripped")
    assert(strip("Tom &amp; Jerry") === "Tom & Jerry")
    assert(strip("&amp;lt;") === "&lt;",
      "double-escaped entity must survive single decode (&amp; last)")
    assert(strip("  a\n\t b   c ") === "a b c")
    assert(strip("<div\nclass='x'>multiline tag</div>") === "multiline tag")
  }

  test("gzip blob column: roundtrip identity, corrupt -> null, bomb -> null") {
    val df = Seq("the corpus record body", "").toDF("t")
    val rt = df.select(
      kernels.gzip_decompress(kernels.gzip_compress(encode($"t", "UTF-8")))
        .cast("string").as("rt"), $"t")
    assert(rt.collect().forall(r => r.getString(0) == r.getString(1)))
    // corrupt magic and truncated stream -> null, never a throw
    val gz = df.limit(1).select(
      kernels.gzip_compress(encode($"t", "UTF-8")).as("g"))
    assert(gz.select(kernels.gzip_decompress(
      concat(lit(Array[Byte](0)), substring($"g", 2, 1 << 20)))).head().isNullAt(0))
    assert(gz.select(kernels.gzip_decompress(
      substring($"g", 1, 8))).head().isNullAt(0))
    // zip bomb guard: 100 MB of zeros compresses to ~100 KB but must
    // decode to null (over the 64 MiB cap), not an executor OOM
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      val chunk = new Array[Byte](1 << 20)
      (1 to 100).foreach(_ => g.write(chunk))
      g.close()
      bos.toByteArray
    }
    assert(bomb.length < (1 << 21), "bomb fixture itself must be small")
    val bdf = Seq(bomb).toDF("b")
    assert(bdf.select(kernels.gzip_decompress($"b")).head().isNullAt(0))
  }

  private def winnowHashes(text: String, k: Int, w: Int): Set[Long] = {
    val df = Seq(text).toDF("t")
    df.select(kernels.winnow_fingerprints($"t", k, w).as("fp"))
      .select(explode($"fp").as("f")).select($"f.hash")
      .collect().map(_.getLong(0)).toSet
  }

  test("winnowing locality guarantee: any shared substring of length >= " +
    "w+k-1 shares at least one fingerprint hash (SWA 2003 theorem)") {
    val (k, w) = (5, 4)
    val shared = "the quick brown fox jumps over" // length 30 >= w+k-1 = 8
    val a = s"AAAA zz $shared qq BBBB different tail text here"
    val b = s"completely other prefix words $shared and another ending"
    val ha = winnowHashes(a, k, w)
    val hb = winnowHashes(b, k, w)
    assert((ha intersect hb).nonEmpty,
      "documents sharing a 30-char substring must share a fingerprint")
    // and two unrelated texts (no common k-gram at all) share nothing
    val hc = winnowHashes("abcdefghijklmnopqrstuvwxyz0123456789", k, w)
    val hd = winnowHashes("ZYXWVUTSRQPONMLKJIHGFEDCBA!@#$%^&*()", k, w)
    assert((hc intersect hd).isEmpty)
  }

  test("winnowing density and edges: short texts empty, fingerprints are " +
    "a subset of the gram hashes, positions strictly increase") {
    val (k, w) = (5, 4)
    assert(winnowHashes("1234567", k, w).isEmpty) // 3 grams < w
    val text = "some moderately long sentence for density checking 123"
    val df = Seq(text).toDF("t")
    val fp = df.select(kernels.winnow_fingerprints($"t", k, w).as("fp"))
      .select(explode($"fp").as("f")).select($"f.pos", $"f.hash")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // positions strictly ascending (the recorded argmin only moves right)
    assert(fp.map(_._1).toSeq === fp.map(_._1).sorted.toSeq.distinct)
    // expected density ~ 2/(w+1); at minimum every w-th gram is selected
    val nGrams = text.length - k + 1
    assert(fp.length >= nGrams / w,
      s"too sparse: ${fp.length} fingerprints over $nGrams grams")
  }

  test("sign_sketch: bit placement, strict-positive rule, fixed-width " +
    "contract (null for short vectors)") {
    // dim 0 -> lo bit 0, dim 31 -> lo bit 31, dim 32 -> hi bit 0,
    // dim 63 -> hi bit 31; zero and negative dims contribute 0 bits
    val v = Array.tabulate(64)(i =>
      if (i == 0 || i == 31 || i == 32 || i == 63) 1.0f
      else if (i == 5) 0.0f else -0.25f)
    val row = Seq(Tuple1(v)).toDF("e")
      .select(kernels.sign_sketch($"e").as("s"))
      .select($"s.lo", $"s.hi").head()
    assert(row.getLong(0) === ((1L << 0) | (1L << 31)))
    assert(row.getLong(1) === ((1L << 0) | (1L << 31)))
    val short = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("e")
      .select(kernels.sign_sketch($"e")).head()
    assert(short.isNullAt(0), "non-64-dim vectors violate the contract -> null")
    // hamming via the packed halves equals the per-dim sign diff count
    val a = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val b = Array.tabulate(64)(i => if (i % 5 == 0) 1.0f else -1.0f)
    val rows = Seq((a, b)).toDF("a", "b")
      .select(kernels.sign_sketch($"a").as("sa"), kernels.sign_sketch($"b").as("sb"))
      .select(expr("bit_count(sa.lo ^ sb.lo) + bit_count(sa.hi ^ sb.hi)"))
      .head().getInt(0)
    val expected = (0 until 64).count(i => (i % 3 == 0) != (i % 5 == 0))
    assert(rows === expected)
  }

  test("winnowing hashes Unicode CODE POINTS, not UTF-16 units: " +
    "supplementary characters count as one gram element (round-9 advice)") {
    val (k, w) = (5, 4)
    // 🙂 is U+1F642, a surrogate PAIR in UTF-16 — code-point iteration
    // sees 26 elements here, code-unit iteration would see 27 and
    // shift every gram after the emoji
    val text = "ab🙂cd éfgh ijkl mnop qrst"
    val cps = text.codePoints().toArray
    assert(cps.length === text.length - 1, "fixture must contain a surrogate pair")
    // direct replay of the documented kernel: base-257 rolling hash
    // over code points, mod 2^31-1, w-window min with rightmost ties
    val M = 2147483647L; val B = 257L
    val nG = cps.length - k + 1
    val h = Array.tabulate(nG) { p =>
      (p until p + k).foldLeft(0L)((acc, i) => (acc * B + cps(i)) % M)
    }
    val expected = scala.collection.mutable.LinkedHashSet.empty[(Int, Long)]
    for (st <- 0 to nG - w) {
      var mi = st
      for (j <- st + 1 until st + w) if (h(j) <= h(mi)) mi = j
      expected += ((mi, h(mi)))
    }
    val got = Seq(text).toDF("t")
      .select(kernels.winnow_fingerprints($"t", k, w).as("fp"))
      .select(explode($"fp").as("f")).select($"f.pos", $"f.hash")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got === expected.toSet)
  }
}
