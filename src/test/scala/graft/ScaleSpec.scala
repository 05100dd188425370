package graft

import org.apache.spark.sql.functions._

import graft.ops.Analytics

/** Scale techniques: bucketed co-located joins (no shuffle exchange)
  * and salted skew joins (identical results, spread hot keys). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val n = 10000
    // force the sort-merge path so the assertion tests bucketing, not
    // broadcast, and keep the non-adaptive plan readable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      spark.range(n).select($"id".as("k"), ($"id" % 97).as("v"))
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bucketed_a")
      spark.range(n).select($"id".as("k"), ($"id" % 31).as("w"))
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bucketed_b")
      // positive control: the same join over non-bucketed data shuffles
      // (physical node prints as "Exchange hashpartitioning")
      val unbucketed = spark.range(n).select($"id".as("k"))
        .join(spark.range(n).select($"id".as("k")), "k")
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(joined.count() === n)
      spark.sql("DROP TABLE bucketed_a"); spark.sql("DROP TABLE bucketed_b")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("jaccard stop-shingle cap prunes boilerplate candidates only") {
    import graft.llm.Dedup
    // docs 1..4 share a boilerplate prefix (hot shingles); 5 and 6 are
    // genuine near-dups beyond it
    val boiler = "common header line shared by every document here"
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta"),
      (2L, s"$boiler eta theta iota kappa lambda mu"),
      (3L, s"$boiler nu xi omicron pi rho sigma"),
      (4L, s"$boiler tau upsilon phi chi psi omega"),
      (5L, "unique payload one two three four five six seven eight nine"),
      (6L, "unique payload one two three four five six seven eight ten"))
      .toDF("doc_id", "text")
    val unbounded = Dedup.jaccardPairs(docs, "doc_id", "text", 5, 0.01)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", 5, 0.01, maxShingleDf = 3)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unbounded.contains((5L, 6L)) && capped.contains((5L, 6L)))
    // boilerplate-only pairs disappear under the cap
    assert(unbounded.exists(p => p._1 <= 4 && p._2 <= 4))
    assert(!capped.exists(p => p._1 <= 4 && p._2 <= 4))
  }

  test("default jaccard skew guard bounds candidates at 10k-doc hot shingle") {
    import graft.llm.Dedup
    // one boilerplate 5-gram in ALL 10k docs: unguarded, that single
    // shingle alone yields ~5e7 candidate pairs (the O(d^2) explosion);
    // the default-on cap drops it from candidate generation, and since
    // every other shingle is unique per doc, no candidates remain
    val docs = spark.range(10000).select($"id".as("doc_id"),
      concat(lit("the quick brown fox jumps u"), $"id", lit("a u"), $"id",
        lit("b u"), $"id", lit("c u"), $"id", lit("d")).as("text"))
    assert(Dedup.DefaultMaxShingleDf < 10000)
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", k = 5, minSim = 0.0)
    assert(pairs.count() === 0)
  }

  test("bounded stratified top-n equals the window formulation and plants the partial heap") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Sampling
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("h", md5(concat(lit("strat|"), $"doc_id".cast("string")).cast("binary")))
      .select($"lang", $"h", $"doc_id")
    val viaWindow = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy($"lang").orderBy($"h", $"doc_id")).cast("long"))
      .filter($"rn" <= 25).select($"lang", $"rn", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val bounded = Sampling.stratifiedTopN(spark, docs, "lang", "h", "doc_id", 25)
    // the scale property: InferWindowGroupLimit must plant the
    // Partial-mode bounded heap BEFORE the exchange, so each input
    // partition ships at most strata × n survivor rows (the same
    // bound the old mapPartitions TreeSet enforced by hand)
    val plan = bounded.queryExecution.executedPlan.toString
    assert("WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined,
      s"bounded top-n must run through a partial WindowGroupLimit heap:\n$plan")
    val got = bounded.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(got === viaWindow)
    // the numeric-order variant produces the identical rows when the
    // lpad-string key encodes the same (non-negative, in-pad-width)
    // numeric order — the q_hubness / q_intrinsic_dim migration
    val numeric = docs
      .select($"lang", conv(substring($"h", 1, 15), 16, 10).cast("long").as("hv"),
        $"doc_id")
    val viaNumericWindow = numeric
      .withColumn("rn", row_number().over(
        Window.partitionBy($"lang").orderBy($"hv", $"doc_id")).cast("long"))
      .filter($"rn" <= 25).select($"lang", $"rn", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val gotNumeric = Sampling.stratifiedTopNBy(numeric, "lang",
        Seq($"hv"), "doc_id", 25)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(gotNumeric === viaNumericWindow)
  }

  test("two-pass grouped rank equals the window formulation, no WindowExec") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.ScalablePrefix
    // low-cardinality groups (3) over enough rows that every group
    // spans several of the 7 range partitions, with duplicate order
    // values to exercise the id tiebreak
    val df = spark.range(0, 5000)
      .select(($"id" % 3).cast("string").as("g"),
        (($"id" * 37) % 101).cast("double").as("v"), $"id".as("k"))
    val viaWindow = df
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"g").orderBy($"v", $"k")).cast("long"))
      .withColumn("grp_n", count(lit(1)).over(Window.partitionBy($"g")))
      .select($"g", $"k", $"rnk", $"grp_n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val twoPass = ScalablePrefix.groupedRank(spark, df, "g", "v", "k", numPartitions = 7)
    assert(!twoPass.queryExecution.executedPlan.toString.contains("Window"),
      "grouped rank must not use a window")
    val got = twoPass.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(got === viaWindow)
  }

  test("two-pass grouped prefix sum equals the window formulation, no WindowExec") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.ScalablePrefix
    // low-cardinality groups over enough rows that every group spans
    // several range partitions — the q_weighted_median shape (value
    // domain pre-collapsed, so the order column is unique per group)
    val df = spark.range(0, 5000)
      .select(($"id" % 3).cast("string").as("g"),
        $"id".cast("double").as("p"), (($"id" * 7) % 13 + 1).as("w"))
    val viaWindow = df
      .withColumn("cum_w", sum($"w").over(
        Window.partitionBy($"g").orderBy($"p")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("grp_total", sum($"w").over(Window.partitionBy($"g")))
      .select($"g", $"p", $"w", $"cum_w", $"grp_total")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sorted
    val twoPass = ScalablePrefix.groupedPrefixSum(spark, df, "g", "p", "w",
      numPartitions = 7)
    assert(!twoPass.queryExecution.executedPlan.toString.contains("Window"),
      "grouped prefix sum must not use a window")
    val got = twoPass.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sorted
    assert(got === viaWindow)
  }

  test("grouped prefix sum rejects null inputs loudly") {
    import graft.ops.ScalablePrefix
    val df = Seq(("a", Some(1.0), 1L), ("a", None, 2L)).toDF("g", "p", "w")
    val e = intercept[org.apache.spark.SparkException] {
      ScalablePrefix.groupedPrefixSum(spark, df, "g", "p", "w", 2).collect()
    }
    assert(e.getMessage.contains("non-null"), e.getMessage)
  }

  test("interval bucket decomposition equals the theta join") {
    // 50k intervals (length 0..12) vs 100 windows (length 20): the
    // equi-join-on-bucket + dedup-by-max-start form must reproduce the
    // plain theta join pair-for-pair — the same rewrite q_interval_join
    // uses, checked here on adversarial bucket-straddling intervals
    val iv = spark.range(50000).select($"id".as("ivid"),
      ($"id" % 9973).as("s"), ($"id" % 9973 + $"id" % 13).as("e"))
    val win = spark.range(100).select($"id".as("w"),
      ($"id" * 97).as("ps"), ($"id" * 97 + 20).as("pe"))
    val theta = iv.join(win, $"s" <= $"pe" && $"ps" <= $"e")
      .select($"ivid", $"w").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val B = 64
    val bucketed = iv
      .withColumn("bucket", explode(sequence(expr(s"s div $B"), expr(s"e div $B"))))
      .join(win.withColumn("bucket",
        explode(sequence(expr(s"ps div $B"), expr(s"pe div $B")))), "bucket")
      .filter($"s" <= $"pe" && $"ps" <= $"e")
      .filter($"bucket" === expr(s"greatest(s, ps) div $B"))
      .select($"ivid", $"w").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(bucketed === theta)
    assert(theta.nonEmpty)
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // the runtime complement to manual salting: AQE detects the hot
    // key's oversized shuffle partition after the map stage and splits
    // it across tasks — pin that the machinery actually engages
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = spark.range(300000)
        .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 50).as("k"),
          $"id".as("payload"))
      val right = spark.range(50).select($"id".as("k"), ($"id" * 2).as("dim"))
      val j = left.join(right, Seq("k"))
      assert(j.count() === 300000) // count() plans separately; collect the join itself
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"), s"AQE did not split the skewed partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("prefix filtering collapses boilerplate candidate volume") {
    // 2000 docs share one boilerplate sentence; only doc pairs (2i,2i+1)
    // are true near-dups. The FULL inverted index pays C(2000,2) ≈ 2M
    // candidates per boilerplate shingle; the prefix index keeps only
    // each doc's rarest shingles, so boilerplate (max df) drops out
    val docs = spark.range(2000).select($"id".as("doc_id"),
      concat(lit("shared boilerplate header common to every document here "),
        lit("tail "), ($"id" / 2).cast("long").cast("string"), lit(" "),
        ($"id" / 2 % 7).cast("long").cast("string"), lit(" "),
        ($"id" / 2 % 11).cast("long").cast("string"), lit(" "),
        ($"id" / 2 % 13).cast("long").cast("string"), lit(" "),
        ($"id" % 2).cast("string")).as("text"))
    def volume(index: org.apache.spark.sql.DataFrame): Long =
      index.groupBy($"sk").agg(count(lit(1)).as("df"))
        .agg(sum(expr("df * (df - 1) / 2"))).as[Double].head().toLong
    // t = 0.7: the prefix is n - ceil(0.7n) + 1 ≈ the 4 rarest of 10
    // shingles — entirely the per-pair tail shingles, so every
    // boilerplate hot key (df = 2000) drops out; true pairs share 9 of
    // 11 shingles (j ≈ 0.82) and still qualify
    val full = volume(graft.llm.Dedup.shingleIndex(docs, "doc_id", "text", 5)
      .select($"doc_id", xxhash64($"s").as("sk")))
    val pref = volume(graft.llm.Dedup.prefixIndex(docs, "doc_id", "text",
      5, 0.7))
    assert(full > 1000000L)              // boilerplate blows up the full index
    assert(pref < full / 100L)           // prefix kills the hot shingles
    // and the filtered join still finds every true near-dup pair
    val pairs = graft.llm.Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
      5, 0.7).select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert((0L until 1000L).map(i => (2 * i, 2 * i + 1)).forall(pairs.contains))
  }

  test("bellman-ford rounds follow graph depth, not node count (100k nodes)") {
    // star-of-stars: node i links to its block hub, hubs link to node 0
    // — 100,001 edges, depth 4, so relaxation ends in ~5 rounds no
    // matter how many nodes there are
    val n = 100000L
    val leafEdges = spark.range(n).filter($"id" % 1000 =!= 0)
      .select($"id".as("u"), ($"id" - $"id" % 1000).as("v"))
    val hubEdges = spark.range(n / 1000).filter($"id" =!= 0)
      .select(($"id" * 1000).as("u"), lit(0L).as("v"))
    val e = leafEdges.union(hubEdges)
    val edges = e.union(e.select($"v".as("u"), $"u".as("v")))
      .withColumn("w", lit(1L) + $"u" % 3)
    val dist = graft.ops.Bfs.weightedDistances(edges, Seq(0L).toDF("node"),
      maxIter = 8)
    assert(dist.count() === n)           // every node reached
    assert(dist.agg(max($"dist")).as[Long].head() <= 8L) // ≤ 2 hops × max w
  }

  test("native as-of join handles 1M x 100k rows in one merge pass") {
    // 1M left rows x 100k right rows over 1000 keys: a window-composed
    // as-of would union + sort both sides and buffer per key; the
    // native operator streams each partition once with O(1) state
    val left = spark.range(1000000).select(
      ($"id" % 1000).as("k"), ($"id" * 7 % 100000).as("lt"))
    val right = spark.range(100000).select(
      ($"id" % 1000).as("rk"), ($"id" * 13 % 99991).as("rt"),
      ($"id" * 31).as("pay"))
    val t0 = System.nanoTime()
    val joined = graft.plans.Asof.join(left, right,
      Seq("k"), Seq("rk"), "lt", "rt", Seq("pay"), inclusive = true)
    val n = joined.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n === 1000000L)
    info(f"1M x 100k as-of merge in $secs%.1f s")
    // spot-check one key against a brute-force reference
    val k0got = joined.filter($"k" === 0).orderBy($"lt")
      .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    val rrows = right.filter($"rk" === 0).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val k0exp = left.filter($"k" === 0).collect().map(_.getLong(1)).sorted
      .map { lt =>
        val c = rrows.filter(_._1 <= lt)
        (lt, if (c.isEmpty) -1L else c.maxBy(_._1)._2)
      }
    assert(k0got.toSeq === k0exp.toSeq)
  }

  test("kmv sketch estimate stays bounded-state at 5M rows") {
    val n = 5000000L
    val est = spark.range(n)
      .select(conv(substring(md5($"id".cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .agg(graft.functions.Kmv.kmv_estimate(
        graft.functions.Kmv.kmv_sketch($"h")))
      .head().getDouble(0)
    // k=64 -> sigma ~ 12.7%; allow 4 sigma at 5M distinct
    assert(math.abs(est - n) / n < 0.5, s"estimate $est vs $n")
  }

  test("salted join equals plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = spark.range(5000)
      .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 50).as("k"),
        $"id".as("payload"))
    val right = spark.range(50).select($"id".as("k"), ($"id" * 2).as("dim"))
    val plain = left.join(right, Seq("k"))
      .select($"k", $"payload", $"dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val salted = Analytics.saltedJoin(left, right, Seq("k"), salts = 8)
      .select($"k", $"payload", $"dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(salted === plain)
  }

  test("k-means assigns 100k vectors without shuffling the corpus") {
    // 100k x 16-dim deterministic vectors; k=8, 2 rounds. The probe
    // pins the scale contract: assignment covers every vector, the
    // model stays at <= k centroids, and wall time is round-bounded
    // (each round = 1 broadcast + 2 aggregates), not corpus-bounded.
    val n = 100000L
    val emb = spark.range(n).select($"id".as("vec_id"),
      expr("transform(sequence(0, 15), i -> " +
        "CAST(pmod(vec_id * 31 + i * 17, 997) / 997.0 AS FLOAT))").as("embedding"))
    val t0 = System.nanoTime()
    val cents = graft.llm.Clustering.lloyd(emb, "vec_id", "embedding", k = 8, rounds = 2)
    val k = cents.count()
    val assigned = graft.llm.Clustering.assign(emb, "vec_id", "embedding", cents).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(k <= 8 && k > 0)
    assert(assigned === n)
    info(f"100k x 16-dim k-means, 2 rounds + final assign in $secs%.1f s")
  }

  test("mini-batch k-means matches full Lloyd's clusters at 100k vectors") {
    // well-separated planted clusters: a 5% mini-batch must land the
    // same partition of the data as the full-pass update, in a
    // fraction of the per-round work; determinism comes from the
    // replayable md5 round-sample
    val n = 100000L
    val emb = spark.range(n).select($"id".as("vec_id"),
      expr("transform(sequence(0, 7), i -> " +
        "CAST(CASE WHEN i = CAST(vec_id % 4 AS INT) * 2 THEN 1.0 " +
        "ELSE pmod(vec_id, 97) / 9700.0 END AS FLOAT))").as("embedding"))
    val seeds = Seq(0L, 1L, 2L, 3L) // one per planted cluster (id % 4)
    val full = graft.llm.Clustering.lloyd(
      emb, "vec_id", "embedding", k = 4, rounds = 2, seedIds = seeds)
    val mini = graft.llm.Clustering.lloydMiniBatch(
      emb, "vec_id", "embedding", k = 4, rounds = 2, perMille = 50, seedIds = seeds)
    val af = graft.llm.Clustering.assign(emb, "vec_id", "embedding", full)
    val am = graft.llm.Clustering.assign(emb, "vec_id", "embedding", mini)
    // same partition: every vector gets the same centroid id under both
    val diff = af.withColumnRenamed("cid", "cf")
      .join(am.withColumnRenamed("cid", "cm"), "vec_id")
      .filter($"cf" =!= $"cm").count()
    assert(diff === 0L, s"$diff/$n vectors assigned differently")
    // and both runs are internally deterministic
    val again = graft.llm.Clustering.lloydMiniBatch(
      emb, "vec_id", "embedding", k = 4, rounds = 2, perMille = 50, seedIds = seeds)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    val once = mini.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    assert(again === once)
  }

  test("BPE rounds cost vocabulary size, not corpus size (1M words)") {
    // 100k docs x 10 words but only ~1000 distinct words: after the
    // one corpus collapse, every merge round runs over <= 1000 rows
    val docs = spark.range(100000).select($"id".as("doc_id"),
      expr("array_join(transform(sequence(0, 9), i -> " +
        "concat('w', pmod(id * 7 + i * 131, 1000))), ' ')").as("text"))
    val vocabRows = graft.llm.TextOps.wordFreq(docs, "text").count()
    assert(vocabRows <= 1000L, s"vocab should collapse, got $vocabRows")
    val t0 = System.nanoTime()
    val merges = graft.llm.TextOps.bpeTrain(docs, "text", nMerges = 5)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.length === 5)
    // every word starts with 'w': (w, <digit-ish>) dominates round 1
    assert(merges.head._1 === "w")
    assert(merges.head._3 <= 1000000L)
    info(f"5 BPE merges over 1M-word corpus in $secs%.1f s")
  }

  test("inline pair generation equals the basket self-join (5M rows)") {
    // 500k baskets x 10 items from a zipf-ish pool (20 hot items, a
    // 980-item tail). basketCore's collect_set + inline-pair shape
    // (one wide shuffle, pairs born inside the row) must produce the
    // EXACT pair-support table of the textbook basket self-join (two
    // full-size shuffles) — compared by full-table signature so the
    // check costs one aggregate per side, not an except at 5M rows.
    val baskets = spark.range(5000000).select(
      ($"id" / 10).cast("long").as("basket"),
      when($"id" % 10 < 7, concat(lit("hot"), pmod($"id" * 13, lit(20))))
        .otherwise(concat(lit("cold"), pmod($"id" * 13, lit(980)))).as("item"))
      .distinct()
      .localCheckpoint(eager = true)
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum($"supp"),
        bit_xor(xxhash64($"i1", $"i2", $"supp"))).head()
    val t0 = System.nanoTime()
    val inline = baskets.groupBy($"basket")
      .agg(sort_array(collect_set($"item")).as("items"))
      .select($"items", posexplode($"items").as(Seq("i", "i1")))
      .select($"i1",
        explode(expr("slice(items, i + 2, size(items))")).as("i2"))
      .groupBy($"i1", $"i2").agg(count(lit(1)).as("supp"))
    val sInline = sig(inline)
    val t1 = System.nanoTime()
    val joined = baskets.select($"basket", $"item".as("i1"))
      .join(baskets.select($"basket", $"item".as("i2")), Seq("basket"))
      .filter($"i1" < $"i2")
      .groupBy($"i1", $"i2").agg(count(lit(1)).as("supp"))
    val sJoin = sig(joined)
    val t2 = System.nanoTime()
    assert(sInline == sJoin,
      s"pair supports diverge: inline=$sInline join=$sJoin")
    assert(sInline.getLong(0) > 0)
    // the inline figure INCLUDES the collect_set build the real queries
    // amortize across three consumers (totals, item supports, pairs);
    // pair generation alone off a built sets table measures ~1.3 s vs
    // the 3 s self-join at this size
    info(f"5M rows: inline pairs ${(t1 - t0) / 1e9}%.1f s (incl. set " +
      f"build) vs self-join ${(t2 - t1) / 1e9}%.1f s, " +
      f"${sInline.getLong(0)} distinct pairs")
  }

  test("BPE encode applies the merge table with zero text shuffles (1M docs)") {
    // q_bpe_encode's scale shape: the merge table compiles into the
    // expression tree (model-as-literal), the per-word rewrite chain is
    // pure codegen'd string work, and the ONLY exchange in the whole
    // plan is the final map-side-combined aggregate on the tiny source
    // key — the corpus text itself never crosses the network
    val docs = spark.range(1000000).select(
      concat(lit("src"), pmod($"id", lit(5))).as("source"),
      expr("array_join(transform(sequence(0, 7), i -> " +
        "concat('the', pmod(id * 31 + i * 7, 100), 'star')), ' ')").as("text"))
    val merges = Seq("t h" -> "th", "th e" -> "the", "s t" -> "st",
      "a r" -> "ar")
    val spaced = trim(regexp_replace($"w", "(.)", "$1 "))
    val encoded = merges.foldLeft(spaced) { case (c, (from, to)) =>
      regexp_replace(c, from, to)
    }
    val agg = docs
      .select($"source", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .select($"source", length($"w").cast("long").as("chars"),
        size(split(encoded, " ")).cast("long").as("toks"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_words"), sum($"chars").as("n_chars"),
        sum($"toks").as("n_tokens"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = agg.queryExecution.executedPlan.toString
      val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(hashEx === 1, s"text must not shuffle — expected only the " +
        s"final source-key aggregate exchange, got $hashEx:\n$plan")
      val t0 = System.nanoTime()
      val rows = agg.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(rows.length === 5)
      assert(rows.map(_.getLong(1)).sum === 8000000L) // 8 words/doc, none empty
      info(f"1M-doc (8M-word) BPE encode in $secs%.1f s, one exchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("shard manifest is one scan + one 16-key aggregate (1M docs)") {
    // q_shard_manifest's scale shape: shard assignment and the content
    // digest are per-row expressions over ONE scan, the manifest is a
    // map-side-combined aggregate on the 16-value shard key (the only
    // hash exchange), and the grand total joins back by broadcast —
    // no window, no second scan of the text
    val docs = spark.range(1000000).select($"id".as("doc_id"),
      concat(lit("body "), $"id").as("text"))
    val d = docs.select(
      (conv(substring(md5(concat(lit("shard|"), $"doc_id".cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("long") % 16).as("shard"),
      size(split($"text", " ")).cast("long").as("toks"),
      length($"text").cast("long").as("chars"),
      conv(substring(md5(concat($"doc_id".cast("string"), lit("|"), $"text").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("digest"))
    val manifest = d.groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("n_tokens"),
        sum($"chars").as("n_chars"), expr("bit_xor(digest)").as("checksum"))
    val total = manifest.agg(sum($"n_docs").as("total_docs"))
    val out = manifest.crossJoin(broadcast(total))
      .select($"shard", $"n_docs", $"checksum",
        expr("n_docs * 16 * 1000000 div total_docs - 1000000").as("skew_ppm"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = out.queryExecution.executedPlan.toString
      // every hash exchange must be the SHARD-KEY aggregate exchange,
      // i.e. downstream of the map-side partial combine — at most 16
      // rows per task ever shuffle, never the document rows. (Without
      // AQE the grand-total branch re-derives the manifest, so the same
      // post-partial exchange can appear twice; AQE's ReuseExchange
      // collapses them at execution.)
      val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      val shardEx = "Exchange hashpartitioning\\(shard".r.findAllIn(plan).length
      assert(hashEx === shardEx && hashEx >= 1,
        s"a non-shard-key exchange shuffles document rows:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastExchange"), s"total must broadcast:\n$plan")
      val t0 = System.nanoTime()
      val rows = out.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(rows.length === 16)
      assert(rows.map(_.getLong(1)).sum === 1000000L)
      // salted md5 sharding balances: within ±2% of the even split
      assert(rows.map(_.getLong(3)).forall(p => math.abs(p) < 20000L),
        s"shard skew over 2%: ${rows.map(_.getLong(3)).mkString(",")}")
      info(f"1M-doc shard manifest in $secs%.1f s, one exchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
