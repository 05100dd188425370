package graft

import org.apache.spark.sql.functions._

import graft.ops.HeavyHitters

/** HeavyHitters.exactTopK (Misra-Gries candidates + exact recount)
  * must return EXACTLY what the full groupBy-count-orderBy-limit
  * computes — on skewed data where certification holds — and must
  * THROW rather than return an unproven answer when the capacity is
  * too small for the data's skew (near-uniform data, tiny summary).
  * The certification is the contract: no silently-approximate path. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame, k: Int): Seq[(String, Long)] =
    df.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
      .limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("matches full groupBy top-k on zipf-skewed data across many partitions") {
    val rnd = new scala.util.Random(11)
    // zipf-ish: item i drawn with weight ~ 1/i over a 2000-item domain
    val weights = (1 to 2000).map(i => 1.0 / i)
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val rows = (1 to 60000).map { _ =>
      val u = rnd.nextDouble() * total
      val i = cum.indexWhere(_ >= u) + 1
      s"tok$i"
    }
    val df = rows.toDF("item").repartition(13)
    val got = HeavyHitters.exactTopK(spark, df, "item", k = 20, capacity = 256)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === reference(df, 20))
  }

  test("small domain (< capacity): exact regardless of skew, overflow group empty") {
    val rows = (1 to 5000).map(i => s"t${i % 37}")
    val df = rows.toDF("item").repartition(7)
    val got = HeavyHitters.exactTopK(spark, df, "item", k = 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === reference(df, 10))
  }

  test("ties at the k-th rank break by ascending item, same as the reference") {
    // 6 items, counts 5,5,5,3,3,3 — k=4 cuts inside a tie group
    val rows = Seq.fill(5)("a") ++ Seq.fill(5)("c") ++ Seq.fill(5)("b") ++
      Seq.fill(3)("z") ++ Seq.fill(3)("x") ++ Seq.fill(3)("y")
    val df = rows.toDF("item").repartition(3)
    val got = HeavyHitters.exactTopK(spark, df, "item", k = 4, capacity = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 5L), ("b", 5L), ("c", 5L), ("x", 3L)))
  }

  test("near-uniform data with tiny capacity throws instead of guessing") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 20000).map(_ => s"u${rnd.nextInt(5000)}")
    val df = rows.toDF("item").repartition(5)
    val e = intercept[IllegalStateException] {
      HeavyHitters.exactTopK(spark, df, "item", k = 10, capacity = 16)
    }
    assert(e.getMessage.contains("not certifiable"))
  }

  test("empty input returns an empty frame") {
    val df = Seq.empty[String].toDF("item")
    assert(HeavyHitters.exactTopK(spark, df, "item", k = 5, capacity = 32).count() === 0)
  }
}
