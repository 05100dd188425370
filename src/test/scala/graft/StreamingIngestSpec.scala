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
}
