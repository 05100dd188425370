package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{OrderGen, TopicDirSink}

/** V2 write-protocol semantics: manifest-only visibility, last-job-wins
  * replacement, and null-safe framing. The value-level round trip is
  * oracle-gated as q_topic_sink. */
class TopicDirSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("topic_sink_spec")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def writeOrders(dir: String, n: Long, seed: String): Unit =
    OrderGen.toEnvelopes(OrderGen.orders(spark, n, seed))
      .select(col("key"), col("value"), col("offset"))
      .write.format("graft.sources.TopicDirSink").mode("append").save(dir)

  test("round trip preserves every framed message") {
    val dir = freshDir()
    writeOrders(dir, 200L, "rt")
    val back = TopicDirSink.readSegments(spark, dir)
    assert(back.count() === 200L)
    assert(back.agg(countDistinct(col("offset"))).head().getLong(0) === 200L)
  }

  test("orphan segments not in the manifest are invisible") {
    val dir = freshDir()
    writeOrders(dir, 50L, "orphan")
    // a crashed/duplicate task's leftover: visible filename, real bytes,
    // but never committed into the manifest
    val rogue = Paths.get(dir, "segments", "segment-rogue-00000-99")
    Files.write(rogue, Array.fill[Byte](64)(7))
    assert(TopicDirSink.readSegments(spark, dir).count() === 50L,
      "reader must trust only the manifest")
  }

  test("a second write job replaces the manifest wholesale (last job wins)") {
    val dir = freshDir()
    writeOrders(dir, 50L, "first")
    writeOrders(dir, 30L, "second")
    val back = TopicDirSink.readSegments(spark, dir)
    assert(back.count() === 30L, "superseded segments must be invisible")
  }

  test("time travel: every committed snapshot stays readable by version") {
    val dir = freshDir()
    writeOrders(dir, 50L, "first")
    writeOrders(dir, 30L, "second")
    assert(TopicDirSink.readSegments(spark, dir, Some(1)).count() === 50L)
    assert(TopicDirSink.readSegments(spark, dir, Some(2)).count() === 30L)
    assert(TopicDirSink.readSegments(spark, dir).count() === 30L)
    val boom = intercept[IllegalArgumentException] {
      TopicDirSink.readSegments(spark, dir, Some(9)).count()
    }
    assert(boom.getMessage.contains("snapshot 9"))
  }

  test("null keys and empty values survive framing") {
    val dir = freshDir()
    val rows: Seq[(Array[Byte], Array[Byte], Long)] = Seq(
      (null, Array[Byte](1, 2, 3), 0L),
      (Array[Byte](9), Array.emptyByteArray, 1L))
    rows.toDF("key", "value", "offset")
      .write.format("graft.sources.TopicDirSink").mode("append").save(dir)
    val got = TopicDirSink.readSegments(spark, dir)
      .orderBy(col("offset"))
      .collect()
      .map(r => (Option(r.getAs[Array[Byte]]("key")).map(_.toSeq),
        r.getAs[Array[Byte]]("value").toSeq))
    assert(got.toSeq === Seq((None, Seq[Byte](1, 2, 3)), (Some(Seq[Byte](9)), Seq.empty[Byte])))
  }

  test("readSegments on an unwritten dir is an empty frame, not an error") {
    assert(TopicDirSink.readSegments(spark, freshDir()).count() === 0L)
  }

  test("foreachBatch streaming publish: one committed topic dir per micro-batch") {
    // the streaming producer story: each micro-batch lands in its own
    // V2-committed dir (batch id in the path), so replaying a batch
    // overwrites its own manifest idempotently instead of duplicating
    val srcDir = freshDir()
    val outRoot = freshDir()
    val env = OrderGen.toEnvelopes(OrderGen.orders(spark, 90L, "fb"))
      .select(col("key"), col("value"), col("offset"))
    env.write.mode("overwrite").parquet(srcDir)
    val q = spark.readStream.schema(env.schema).option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.format("graft.sources.TopicDirSink")
          .mode("append").save(s"$outRoot/batch-$id")
        (): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val dirs = Paths.get(outRoot).toFile.listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty)
    val total = dirs.map(d => TopicDirSink.readSegments(spark, d.toString).count()).sum
    assert(total === 90L, s"all envelopes must be committed exactly once, got $total")
  }
}
