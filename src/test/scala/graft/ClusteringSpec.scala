package graft

import org.apache.spark.sql.functions._

import graft.llm.{Clustering, Similarity}

/** Semantics of the learned-codebook operators: Lloyd's k-means
  * (Clustering) and product quantization (Similarity.pqAssign/ADC).
  * The oracle queries pin engine-portability; these pin the math. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated axis clusters in 6-dim; ids 0,1,2 are one
  // member of each cluster, so the lowest-id seed starts one centroid
  // per planted cluster
  private def planted() = {
    val base = Seq(
      Seq(1f, 0f, 0f, 0f, 0f, 0f), // cluster A template
      Seq(0f, 0f, 1f, 0f, 0f, 0f), // cluster B
      Seq(0f, 0f, 0f, 0f, 1f, 0f)  // cluster C
    )
    val rows = (0 until 30).map { i =>
      val c = i % 3
      val jitter = 0.01f * ((i / 3) % 5)
      (i.toLong, base(c).map(v => if (v > 0) v else jitter))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("lloyd recovers planted clusters and assignment is stable") {
    val emb = planted()
    val cents = Clustering.lloyd(emb, "vec_id", "embedding", k = 3, rounds = 2)
    assert(cents.count() === 3)
    val a = Clustering.assign(emb, "vec_id", "embedding", cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every vector lands with its planted cluster's seed (0, 1, or 2)
    for (i <- 0 until 30)
      assert(a(i.toLong) === (i % 3).toLong,
        s"vec $i assigned to ${a(i.toLong)}, expected ${i % 3}")
  }

  test("default seeding is the k LOWEST ids, not filter(id < k): sparse ids still seed k centroids") {
    // shift every id by 1000: filter(id < 3) would match nothing and
    // silently return an EMPTY model; the TakeOrdered seeding must
    // yield the same three planted-cluster seeds
    val emb = planted().select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val cents = Clustering.lloyd(emb, "vec_id", "embedding", k = 3, rounds = 2)
    assert(cents.count() === 3)
    assert(cents.select("cid").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1000L, 1001L, 1002L))
    val a = Clustering.assign(emb, "vec_id", "embedding", cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (i <- 0 until 30)
      assert(a(1000L + i) === 1000L + (i % 3))
  }

  test("mini-batch keeps centroids its round sample missed (and survives an empty batch)") {
    val emb = planted()
    // perMille = 1: with 30 ids, most rounds sample zero rows — the
    // model must remain the full seeded k, not collapse to empty
    val tiny = Clustering.lloydMiniBatch(emb, "vec_id", "embedding",
      k = 3, rounds = 3, perMille = 1)
    assert(tiny.count() === 3, "unsampled rounds must not erase centroids")
    // and a healthy sample rate still converges to the planted partition
    val mini = Clustering.lloydMiniBatch(emb, "vec_id", "embedding",
      k = 3, rounds = 2, perMille = 1000) // full batch: must equal lloyd
    val full = Clustering.lloyd(emb, "vec_id", "embedding", k = 3, rounds = 2)
    val mc = mini.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    val fc = full.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    assert(mc.toSeq === fc.toSeq,
      "perMille=1000 mini-batch must reproduce full Lloyd exactly")
  }

  test("lloyd centroid is the fixed-point floor-mean of its members") {
    // one cluster, k=1: centroid must equal floor(mean) of the fp coords
    val emb = Seq(
      (0L, Seq(1.0f, 2.0f)),
      (1L, Seq(2.0f, 3.0f)),
      (2L, Seq(4.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val cf = Clustering.lloyd(emb, "vec_id", "embedding", k = 1, rounds = 1)
      .select($"cf").head().getSeq[Long](0)
    // fp coords: [1e9,2e9,4e9] -> mean floor(7e9/3) ; [2e9,3e9,7e9] -> 4e9
    assert(cf === Seq(7000000000L / 3, 4000000000L))
  }

  test("ADC score equals the exact dot against the reconstruction") {
    val emb = planted()
    val cents = Similarity.subVectors(emb.filter($"vec_id" < 6), "embedding", 2, 3)
      .select($"s", $"vec_id".as("cid"), $"sub".as("csub"))
    val codes = Similarity.pqAssign(emb, "vec_id", "embedding", cents, 2, 3)
    // reconstruction check for one vector: its ADC score vs the query
    // must equal sum over subspaces of dotFp(query_sub, centroid_sub)
    val lut = Similarity.subVectors(emb.filter($"vec_id" === 0L), "embedding", 2, 3)
      .select($"s", $"sub".as("qsub"))
      .join(cents, "s")
      .select($"s", $"cid", Similarity.dotFp($"qsub", $"csub").as("d"))
    val scores = Similarity.pqAdcScores(codes, "vec_id", lut)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val codeMap = codes.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val lutMap = lut.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (v <- Seq(0L, 7L, 20L)) {
      val manual = (0 to 1).map(s => lutMap((s, codeMap((v, s))))).sum
      assert(scores(v) === manual, s"vec $v adc mismatch")
    }
  }

  test("farthest-first seeds hit all planted clusters even when ids collide") {
    // all of ids 0..9 sit in cluster A; B and C only appear later — the
    // lowest-id seed would start 3 centroids inside A, farthest-first
    // must pick one representative from each planted cluster
    val rows =
      (0 until 10).map(i => (i.toLong, Seq(1f, 0f, 0f, 0f, 0.001f * i, 0f))) ++
      (10 until 20).map(i => (i.toLong, Seq(0f, 0f, 1f, 0f, 0.001f * i, 0f))) ++
      (20 until 30).map(i => (i.toLong, Seq(0f, 0f, 0f, 0f, 1f, 0.001f * i)))
    val emb = rows.toDF("vec_id", "embedding")
    val seeds = Clustering.farthestFirst(emb, "vec_id", "embedding", k = 3)
    assert(seeds.length === 3)
    val regions = seeds.map(s => s / 10).toSet
    assert(regions === Set(0L, 1L, 2L), s"seeds $seeds miss a planted cluster")
    // and Lloyd from those seeds separates the three clusters
    val cents = Clustering.lloyd(emb, "vec_id", "embedding", k = 3, rounds = 2,
      seedIds = seeds)
    val a = Clustering.assign(emb, "vec_id", "embedding", cents)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byRegion = a.groupBy(_._1 / 10).view.mapValues(_.map(_._2).toSet).toMap
    assert(byRegion.values.forall(_.size == 1), "a planted cluster split")
    assert(byRegion.values.toSet.size === 3, "planted clusters merged")
  }

  test("lloyd inertia never increases across rounds") {
    val emb = planted()
    val seeds = Clustering.farthestFirst(emb, "vec_id", "embedding", k = 3)
    val i0 = Clustering.inertia(emb, "vec_id", "embedding",
      Clustering.lloyd(emb, "vec_id", "embedding", 3, rounds = 0, seeds))
    val i1 = Clustering.inertia(emb, "vec_id", "embedding",
      Clustering.lloyd(emb, "vec_id", "embedding", 3, rounds = 1, seeds))
    val i2 = Clustering.inertia(emb, "vec_id", "embedding",
      Clustering.lloyd(emb, "vec_id", "embedding", 3, rounds = 2, seeds))
    assert(i1 <= i0, s"round 1 increased inertia: $i0 -> $i1")
    assert(i2 <= i1, s"round 2 increased inertia: $i1 -> $i2")
  }

  test("PQ ADC recall@10 on real embeddings stays above the coarse bound") {
    // index-quality evaluation for the compressed path (the PQ analog
    // of q_recall_at_k's IVF eval): ADC ranking vs the exact ranking
    // over sf0.001 embeddings. 8x8 PQ against 16 sub-centroids is a
    // coarse codebook, so the bound is deliberately loose — the probe
    // pins "the compressed index is not garbage", deterministically.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.subVectors(emb.filter($"vec_id" < 16), "embedding", 8, 8)
      .select($"s", $"vec_id".as("cid"), $"sub".as("csub"))
    val codes = Similarity.pqAssign(emb, "vec_id", "embedding", cents, 8, 8)
    val lut = Similarity.subVectors(emb.filter($"vec_id" === 0L), "embedding", 8, 8)
      .select($"s", $"sub".as("qsub"))
      .join(cents, "s")
      .select($"s", $"cid", Similarity.dotFp($"qsub", $"csub").as("d"))
    val adcTop = Similarity.pqAdcScores(codes, "vec_id", lut)
      .orderBy($"adc_fp".desc, $"vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    val q = emb.filter($"vec_id" === 0L).select($"embedding".as("qv"))
    val exactTop = emb.crossJoin(q)
      .select($"vec_id", Similarity.dotFp($"embedding", $"qv").as("d"))
      .orderBy($"d".desc, $"vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = (adcTop intersect exactTop).size
    assert(recall >= 3, s"ADC recall@10 = $recall/10 — compressed index broken")
  }

  test("codebook vectors code to themselves when slices are distinct") {
    // 4 vectors with unique orthogonal slices: each codes to its own id
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f, 0f)),
      (3L, Seq(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.subVectors(emb, "embedding", 1, 4)
      .select($"s", $"vec_id".as("cid"), $"sub".as("csub"))
    val codes = Similarity.pqAssign(emb, "vec_id", "embedding", cents, 1, 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (v <- 0L to 3L) assert(codes(v) === v)
  }
}
