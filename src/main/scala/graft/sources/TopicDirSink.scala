package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Kafka-producer-shaped EXACTLY-ONCE batch sink as a DataSourceV2
  * write (the write half of the V2 story; OrdersSource is the read
  * half). Each task streams its rows into one length-framed log
  * segment under `segments/` (written as a dot-prefixed in-progress
  * file, atomically renamed on TASK commit), and the JOB commit
  * atomically publishes a `manifest` listing exactly the committed
  * segments. A reader that trusts only the manifest can never observe
  * partial output: a retried or aborted task leaves at most an
  * invisible orphan, which is the file-layout analog of the reference
  * producer's acks/flush delivery contract (producer.py:137–145).
  *
  * Scale design: writers never coordinate (one file per task, no
  * renames into a shared name), the only serial step is the driver's
  * O(#tasks) manifest write, and visibility is flipped by ONE atomic
  * rename — the same commit discipline as Spark's own file sources,
  * demonstrated here through the full V2 BatchWrite/DataWriter
  * protocol including abort cleanup. */
class TopicDirSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TopicDirSink.MessageSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TopicDirSink.SegmentTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object TopicDirSink {

  /** The framed message shape: Kafka envelope key/value plus offset. */
  val MessageSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("offset", LongType, nullable = false)))

  private[sources] class SegmentTable(path: String) extends Table with SupportsWrite {
    require(path != null, "TopicDirSink requires a save path")
    override def name(): String = s"graft_topic_dir($path)"
    override def schema(): StructType = MessageSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_WRITE)
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      val in = info.schema()
      require(in.length == 3 &&
        in(0).dataType == BinaryType && in(1).dataType == BinaryType &&
        in(2).dataType == LongType,
        s"TopicDirSink expects (key binary, value binary, offset bigint), got $in")
      new WriteBuilder {
        override def build(): Write = new Write {
          override def toBatch: BatchWrite = new SegmentBatchWrite(path, info.queryId())
        }
      }
    }
  }

  private case class SegmentCommit(file: String, n: Long) extends WriterCommitMessage

  private class SegmentBatchWrite(path: String, queryId: String) extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new SegmentWriterFactory(path, queryId)
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val dir = Paths.get(path)
      Files.createDirectories(dir)
      val body = messages.collect { case SegmentCommit(f, n) => s"$f\t$n" }
        .sorted.mkString("", "\n", "\n")
      // snapshot-per-commit: each job publishes manifest-<v> (v = max
      // existing + 1) and then flips the `manifest` pointer with ONE
      // atomic rename. The latest read follows the pointer; any older
      // version stays readable by number — snapshot isolation + time
      // travel, lakehouse-style, with no coordination beyond the
      // driver's single commit call per job.
      // claim the next version with CREATE-IF-ABSENT (hard link fails
      // atomically when the target exists), NOT a bare ATOMIC_MOVE:
      // POSIX rename replaces an existing target, so two jobs that
      // both read max=N would both "win" manifest-(N+1) and the first
      // committer's snapshot would silently vanish — the lost-update
      // race snapshot isolation exists to prevent. On contention the
      // loser simply claims the next number.
      val tmpV = dir.resolve(s".manifest.$queryId.tmp")
      Files.write(tmpV, body.getBytes("UTF-8"))
      var version = TopicDirSink.versions(dir).lastOption.getOrElse(0) + 1
      var claimed = false
      while (!claimed) {
        try {
          Files.createLink(dir.resolve(f"manifest-$version%06d"), tmpV)
          claimed = true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => version += 1
        }
      }
      Files.deleteIfExists(tmpV)
      // the pointer flip is last-writer-wins, so a slower committer
      // holding an OLDER claimed version could overwrite a newer one
      // (readers following the pointer would then miss a committed
      // snapshot until the next commit). Two defenses: (a) skip the
      // flip when the current pointer already names a version >= ours
      // (narrows the window to the read–move gap), and (b) readSegments
      // resolves "latest" as max(pointer, max committed version), so
      // even a raced stale flip can never hide a committed snapshot.
      val pointer = dir.resolve("manifest")
      val current = try {
        if (Files.exists(pointer))
          new String(Files.readAllBytes(pointer), "UTF-8").trim.toInt
        else 0
      } catch { case _: NumberFormatException => 0 }
      if (current < version) {
        val tmpP = dir.resolve(s".manifest.ptr.$queryId.tmp")
        Files.write(tmpP, f"$version%06d%n".getBytes("UTF-8"))
        Files.move(tmpP, pointer,
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      messages.foreach {
        case SegmentCommit(f, _) =>
          Files.deleteIfExists(Paths.get(path, "segments", f))
        case _ => ()
      }
  }

  private class SegmentWriterFactory(path: String, queryId: String)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new SegmentWriter(path, queryId, partitionId, taskId)
  }

  /** One log segment per task. Framing per message:
    * [keyLen int][key][valueLen int][value][offset long], length −1
    * encoding a null blob — the minimal self-delimiting record frame,
    * readable by any DataInputStream. */
  private class SegmentWriter(path: String, queryId: String, partitionId: Int,
      taskId: Long) extends DataWriter[InternalRow] {
    private val name = f"segment-$queryId-$partitionId%05d-$taskId"
    private val dir = Paths.get(path, "segments")
    Files.createDirectories(dir)
    private val tmp = dir.resolve(s".$name.inprogress")
    private val out = new DataOutputStream(
      new java.io.BufferedOutputStream(Files.newOutputStream(tmp)))
    private var n = 0L
    private def blob(b: Array[Byte]): Unit =
      if (b == null) out.writeInt(-1) else { out.writeInt(b.length); out.write(b) }
    override def write(row: InternalRow): Unit = {
      blob(if (row.isNullAt(0)) null else row.getBinary(0))
      blob(if (row.isNullAt(1)) null else row.getBinary(1))
      out.writeLong(row.getLong(2))
      n += 1
    }
    override def commit(): WriterCommitMessage = {
      out.close()
      Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      SegmentCommit(name, n)
    }
    override def abort(): Unit = { out.close(); Files.deleteIfExists(tmp) }
    override def close(): Unit = ()
  }

  /** Committed snapshot versions present in `dir`, ascending. */
  private[sources] def versions(dir: java.nio.file.Path): Seq[Int] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
        .map(_.getFileName.toString)
        .filter(_.matches("manifest-\\d{6}"))
        .map(_.stripPrefix("manifest-").toInt)
        .toSeq.sorted
      finally s.close()
    }

  /** Manifest-trusting reader: only segments of the requested snapshot
    * (default: the one the `manifest` pointer names — the latest
    * commit) are parsed; orphans from failed or superseded tasks are
    * invisible, and older snapshots remain readable by version (time
    * travel). Parsing is per-partition imperative (the one legitimate
    * flatMap case: decoding a binary frame Spark has no codec for);
    * each segment file is one input row of the binaryFile source, so
    * parallelism = segment count = writing tasks. */
  def readSegments(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val dir = Paths.get(path)
    val chosen: Option[Int] = version.orElse {
      // "latest" = max(pointer, max committed manifest version): the
      // pointer flip is racy under concurrent commits (see commit()),
      // so the committed-version listing is the source of truth and
      // the pointer merely a fast path that can only ever lag, never
      // point ahead of a committed snapshot
      val pointer = dir.resolve("manifest")
      val ptrV =
        if (Files.exists(pointer))
          try Some(new String(Files.readAllBytes(pointer), "UTF-8").trim.toInt)
          catch { case _: NumberFormatException => None }
        else None
      val maxV = versions(dir).lastOption
      (ptrV ++ maxV).maxOption
    }
    val committed: Set[String] = chosen match {
      case Some(v) =>
        val mf = dir.resolve(f"manifest-$v%06d")
        require(Files.exists(mf), s"snapshot $v does not exist under $path")
        scala.jdk.CollectionConverters.ListHasAsScala(Files.readAllLines(mf))
          .asScala.filter(_.nonEmpty).map(_.split("\t")(0)).toSet
      case None => Set.empty
    }
    val segDir = Paths.get(path, "segments")
    if (committed.isEmpty || !Files.isDirectory(segDir))
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), MessageSchema)
    spark.read.format("binaryFile").load(segDir.toString)
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("f"), col("content"))
      .filter(col("f").isInCollection(committed))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        val in = new DataInputStream(new ByteArrayInputStream(bytes))
        def blob(): Array[Byte] = {
          val l = in.readInt()
          if (l < 0) null else { val a = new Array[Byte](l); in.readFully(a); a }
        }
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte], Long)]
        while (in.available() > 0) buf += ((blob(), blob(), in.readLong()))
        buf.toSeq
      }
      .toDF("key", "value", "offset")
  }
}
