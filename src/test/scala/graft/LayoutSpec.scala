package graft

import org.apache.spark.sql.functions._

/** Data-lake layout behaviors beyond single-file parquet: schema
  * evolution across file generations (mergeSchema) and writer-side
  * file-size / intra-file ordering discipline — the knobs that keep a
  * 100 TB table readable (bounded file counts, sorted row groups for
  * min/max pruning, old files readable after a column is added). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("ensureBucketed gives sanitization-colliding dirs distinct tables") {
    // "/x/sf-1" and "/x/sf_1" sanitize to the same identifier; the sha1
    // path tag in the table name is what keeps them from silently
    // sharing one bucketed copy.
    val base = tmpDir("graft-bkt-collide-")
    val d1 = s"$base/sf-1"; val d2 = s"$base/sf_1"
    Seq((1L, "a")).toDF("k", "v").write.parquet(d1)
    Seq((2L, "b")).toDF("k", "v").write.parquet(d2)
    val t1 = graft.ops.Bucketing.ensureBucketed(
      spark, d1, "collide", spark.read.parquet(d1), "k", 2)
    val t2 = graft.ops.Bucketing.ensureBucketed(
      spark, d2, "collide", spark.read.parquet(d2), "k", 2)
    assert(t1 !== t2)
    assert(spark.table(t1).head().getLong(0) === 1L)
    assert(spark.table(t2).head().getLong(0) === 2L)
  }

  test("mergeSchema reads old and new file generations as one table") {
    val dir = tmpDir("graft-evolve-")
    // generation 1: (id, v); generation 2 adds a column (id, v, lang)
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/g=1")
    Seq((3L, 30.0, "en"), (4L, 40.0, "de")).toDF("id", "v", "lang")
      .write.mode("overwrite").parquet(s"$dir/g=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted === Array("g", "id", "lang", "v"))
    val rows = merged.orderBy($"id")
      .select($"id", $"v", $"lang").collect()
      .map(r => (r.getLong(0), r.getDouble(1), if (r.isNullAt(2)) null else r.getString(2)))
    // old-generation rows surface the added column as null
    assert(rows === Array((1L, 10.0, null), (2L, 20.0, null),
      (3L, 30.0, "en"), (4L, 40.0, "de")))
  }

  test("writer bounds records per file and keeps rows sorted within partitions") {
    val dir = tmpDir("graft-writer-")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(1)
      .sortWithinPartitions($"doc_id")
      .write.option("maxRecordsPerFile", 100)
      .mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    // 500 docs at <=100 records per file -> at least 5 files
    assert(files.length >= 5, s"expected split files, got ${files.length}")
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select($"doc_id").as[Long].collect()
      assert(ids.length <= 100, s"${f.getName} exceeds maxRecordsPerFile")
      // sortWithinPartitions survives the file split -> each file is a
      // sorted run with tight min/max (the pruning property)
      assert(ids.sameElements(ids.sorted), s"${f.getName} not sorted")
      (ids.head, ids.last)
    }.sortBy(_._1)
    // file-level min/max ranges must not overlap (global sorted layout)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, "file ranges overlap")
      case _ =>
    }
  }
}
