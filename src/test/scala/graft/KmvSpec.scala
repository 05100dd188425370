package graft

import org.apache.spark.sql.functions._

import graft.functions.Kmv

/** The KMV bottom-k distinct sketch (set-algebra member of the sketch
  * family): sketch = k smallest distinct hashes, estimates, union
  * closure, and the Jaccard estimator. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def hashCol(c: String = "id") = conv(substring(
    md5(col(c).cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  private def sketchOf(n: Long): Seq[Long] =
    spark.range(n).select(hashCol().as("h"))
      .agg(Kmv.kmv_sketch(col("h"))).head().getSeq[Long](0)

  test("sketch is exactly the k smallest distinct hashes, sorted") {
    val n = 5000L
    val sk = sketchOf(n)
    val expected = spark.range(n).select(hashCol().as("h"))
      .distinct().orderBy(col("h")).limit(Kmv.K)
      .collect().map(_.getLong(0)).toSeq
    assert(sk === expected)
  }

  test("sketch is a pure function of the distinct set (dups, partitioning)") {
    val a = spark.range(2000).select(hashCol().as("h"))
    val dup = a.union(a).union(a)
    val s1 = a.agg(Kmv.kmv_sketch(col("h"))).head().getSeq[Long](0)
    val s2 = dup.agg(Kmv.kmv_sketch(col("h"))).head().getSeq[Long](0)
    val s3 = dup.repartition(7).agg(Kmv.kmv_sketch(col("h"))).head().getSeq[Long](0)
    assert(s1 === s2)
    assert(s1 === s3)
  }

  test("below capacity the estimate is the exact distinct count") {
    val est = spark.range(40).select(hashCol().as("h"))
      .agg(Kmv.kmv_estimate(Kmv.kmv_sketch(col("h"))))
      .head().getDouble(0)
    assert(est === 40.0)
  }

  test("at capacity the estimate is within KMV error bounds (~1/sqrt(k-2))") {
    // sigma ~ 1/sqrt(62) ~ 12.7%; allow 4 sigma
    for (n <- Seq(1000L, 20000L)) {
      val est = spark.range(n).select(hashCol().as("h"))
        .agg(Kmv.kmv_estimate(Kmv.kmv_sketch(col("h"))))
        .head().getDouble(0)
      assert(math.abs(est - n) / n < 0.5, s"estimate $est vs $n")
    }
  }

  test("union of sketches IS the sketch of the union (closure)") {
    val whole = sketchOf(4000)
    val evens = spark.range(4000).filter(col("id") % 2 === 0)
      .select(hashCol().as("h")).agg(Kmv.kmv_sketch(col("h")).as("sk"))
    val odds = spark.range(4000).filter(col("id") % 2 === 1)
      .select(hashCol().as("h")).agg(Kmv.kmv_sketch(col("h")).as("sk"))
    val merged = evens.select(col("sk").as("a"))
      .crossJoin(odds.select(col("sk").as("b")))
      .select(Kmv.kmv_union(col("a"), col("b")))
      .head().getSeq[Long](0)
    assert(merged === whole)
  }

  test("kmv_merge rolls fine-group sketches up to the sketch of the union") {
    val whole = sketchOf(6000)
    val rolled = spark.range(6000)
      .select((col("id") % 5).as("g"), hashCol().as("h"))
      .groupBy(col("g")).agg(Kmv.kmv_sketch(col("h")).as("sk"))
      .agg(Kmv.kmv_merge(col("sk")))
      .head().getSeq[Long](0)
    assert(rolled === whole)
  }

  test("jaccard estimate tracks the true overlap") {
    // A = [0, 3000), B = [1500, 4500): true J = 1500/4500 = 1/3
    val a = spark.range(0, 3000).select(hashCol().as("h"))
      .agg(Kmv.kmv_sketch(col("h")).as("sk")).select(col("sk").as("a"))
    val b = spark.range(1500, 4500).select(hashCol().as("h"))
      .agg(Kmv.kmv_sketch(col("h")).as("sk")).select(col("sk").as("b"))
    val est = a.crossJoin(b)
      .select(Kmv.kmv_jaccard(col("a"), col("b")))
      .head().getDouble(0)
    // binomial sigma = sqrt(J(1-J)/k) ~ 5.9%; allow 4 sigma
    assert(math.abs(est - 1.0 / 3.0) < 0.25, s"jaccard estimate $est")
  }

  test("jaccard is exact below capacity") {
    // 20 shared of 30 total distinct values; sketches hold everything
    val a = spark.range(0, 25).select(hashCol().as("h"))
      .agg(Kmv.kmv_sketch(col("h")).as("sk")).select(col("sk").as("a"))
    val b = spark.range(5, 30).select(hashCol().as("h"))
      .agg(Kmv.kmv_sketch(col("h")).as("sk")).select(col("sk").as("b"))
    val est = a.crossJoin(b)
      .select(Kmv.kmv_jaccard(col("a"), col("b")))
      .head().getDouble(0)
    assert(est === 20.0 / 30.0)
  }

  test("property: sketch = k smallest distinct, any order / any split point") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(0L, 1L << 50))
      cut <- Gen.chooseNum(0, 1000)
    } yield (xs, cut)
    val prop = Prop.forAll(gen) { case (xs, cutRaw) =>
      val agg = new Kmv.KmvAggregator
      val expected = xs.distinct.sorted.take(Kmv.K)
      val folded = xs.foldLeft(agg.zero)(agg.reduce)
      val cut = if (xs.isEmpty) 0 else cutRaw % (xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      folded.toSeq == expected && merged.toSeq == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("disjoint sets estimate zero jaccard") {
    val a = spark.range(0, 2000).select(hashCol().as("h"))
      .agg(Kmv.kmv_sketch(col("h")).as("sk")).select(col("sk").as("a"))
    val b = spark.range(5000, 7000).select(hashCol().as("h"))
      .agg(Kmv.kmv_sketch(col("h")).as("sk")).select(col("sk").as("b"))
    val est = a.crossJoin(b)
      .select(Kmv.kmv_jaccard(col("a"), col("b")))
      .head().getDouble(0)
    assert(est === 0.0)
  }
}
