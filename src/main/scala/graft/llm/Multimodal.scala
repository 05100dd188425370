package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a partition-wise decode /
  * feature-extract stage.
  *
  * The decode step is STUBBED (this environment has no image/audio
  * libraries): `decodeStub` derives deterministic fake dimensions from
  * the byte stream. Everything around it — the binary column handling,
  * schema, batch shape, partition-wise execution — is real: swap
  * `decodeStub` for a JNI/javacv decoder and nothing else changes.
  * Heavy per-record decode belongs in `mapPartitions` (amortizes
  * per-partition library init, keeps the decode off the driver, scales
  * with executor count).
  */
object Multimodal {

  /** Decoded-media metadata record. */
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, format: String)

  /** STUB decoder: replaces the real `decode(bytes) => (w, h, format)`.
    * Deterministic pure function of the payload so tests and the oracle
    * can replay it. A real build would parse the container header here. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    MediaMeta(id, n, n % 640 + 1, (n * 7) % 480 + 1,
      (n % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" })
  }

  /** Partition-wise decode of (id, payload) rows — the real pipeline
    * shape for expensive decoders. */
  def decodePartitions(spark: SparkSession, df: DataFrame,
      idCol: String, blobCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init of a real decoder would go here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Column-expression form of the stub metadata (codegen-friendly,
    * used by the oracle-checked plumbing query — same arithmetic as
    * `decodeStub`). */
  def withMediaMeta(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(blobCol)))
      .withColumn("width", col("n_bytes") % 640 + 1)
      .withColumn("height", (col("n_bytes") * 7) % 480 + 1)
      .withColumn("format",
        when(col("n_bytes") % 3 === 0, "png")
          .when(col("n_bytes") % 3 === 1, "jpeg")
          .otherwise("webp"))
}
