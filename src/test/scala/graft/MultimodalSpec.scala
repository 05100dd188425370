package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** Multimodal plumbing: binary columns, partition-wise decode, feature
  * extraction shape, resize math, frame sampling batch shape. The
  * decode/encode internals are stubs; the Spark plumbing is real. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .withColumn("blob", encode($"text", "UTF-8"))

  test("partition-wise decode emits one metadata row per payload") {
    val metas = Multimodal.decodePartitions(spark, docs, "doc_id", "blob")
    assert(metas.count() === docs.count())
    val m = metas.filter(_.doc_id == 0).head()
    assert(m.n_bytes > 0 && m.width >= 1 && m.width <= 640 &&
      m.height >= 1 && m.height <= 480)
    assert(Set("png", "jpeg", "webp").contains(m.format))
  }

  test("columnar metadata agrees with the partition-wise decoder") {
    val viaMapPartitions = Multimodal.decodePartitions(spark, docs, "doc_id", "blob")
      .collect().map(m => m.doc_id -> ((m.n_bytes, m.width, m.height, m.format))).toMap
    val viaColumns = Multimodal.withMediaMeta(docs, "blob")
      .select($"doc_id", $"n_bytes", $"width", $"height", $"format")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(viaMapPartitions === viaColumns)
  }

  test("feature extraction returns normalized fixed-width vectors") {
    val feats = Multimodal.extractFeatures(spark, docs, "doc_id", "blob")
    val f = feats.head()
    assert(f.features.length === 16)
    assert(math.abs(f.features.sum - 1.0f) < 1e-3)
    assert(feats.count() === docs.count())
  }

  test("resize preserves aspect ratio and caps the long side") {
    val resized = Multimodal.resizeMeta(
      Multimodal.withMediaMeta(docs, "blob"), maxSide = 64)
    val bad = resized.filter($"out_width" > 64 || $"out_height" > 64).count()
    assert(bad === 0)
    // unscaled rows keep their dimensions
    val same = resized.filter($"scale" === 1.0)
      .filter($"out_width" =!= $"width" || $"out_height" =!= $"height").count()
    assert(same === 0)
  }

  test("frame sampling explodes every nth frame index") {
    val sampled = Multimodal.sampleFrames(
      docs.limit(1).withColumn("n_frames", lit(10)), "doc_id", $"n_frames", every = 3)
    assert(sampled.select($"frame_idx").as[Int].collect().toSeq === Seq(0, 3, 6, 9))
  }
}
