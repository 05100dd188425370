package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
    * shape for expensive decoders. Container HEADERS are parsed for
    * real (PNG IHDR / JPEG SOF / GIF descriptor via
    * graft.functions.MediaHeaders — pure JVM byte inspection, no codec
    * library); only unrecognized containers fall back to the stub. */
  def decodePartitions(spark: SparkSession, df: DataFrame,
      idCol: String, blobCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init of a real pixel decoder would go here
        it.map { case (id, bytes) =>
          graft.functions.MediaHeaders.parse(bytes) match {
            case Some((fmt, w, h)) => MediaMeta(id, bytes.length, w, h, fmt)
            case None => decodeStub(id, bytes)
          }
        }
      }
  }

  /** Deterministic container-header synthesis (hex-assembled in pure
    * column expressions, then `unhex`): a complete PNG signature+IHDR,
    * JPEG SOI+APP0+SOF0, or GIF89a screen descriptor carrying the given
    * dimensions. This is how the header PARSER is oracle-tested without
    * codec libraries: Spark synthesizes real container bytes and parses
    * them back; the oracle replays the dimension arithmetic. */
  def synthesizeHeader(format: Column, width: Column, height: Column): Column = {
    val wBe = lpad(hex(width), 4, "0")
    val hBe = lpad(hex(height), 4, "0")
    val wLe = concat(substring(wBe, 3, 2), substring(wBe, 1, 2))
    val hLe = concat(substring(hBe, 3, 2), substring(hBe, 1, 2))
    val png = concat(
      lit("89504E470D0A1A0A"),             // signature
      lit("0000000D49484452"),             // IHDR length=13 + type
      lpad(hex(width), 8, "0"), lpad(hex(height), 8, "0"),
      lit("0806000000"),                   // depth/color/comp/filter/interlace
      lit("00000000"))                     // CRC (not validated by header parse)
    val jpeg = concat(
      lit("FFD8"),                         // SOI
      lit("FFE000104A46494600010100000100010000"), // APP0, len 16
      lit("FFC00011"),                     // SOF0, len 17
      lit("08"), hBe, wBe,                 // precision, height, width
      lit("03011100021101031101"),         // 3 components
      lit("FFD9"))                         // EOI
    val gif = concat(
      lit("474946383961"),                 // "GIF89a"
      wLe, hLe,
      lit("F7000000"))                     // GCT flags/bg/aspect
    // same out-of-contract guard as the WAV/AVI siblings: JPEG/GIF
    // dimensions are 16-bit, and a width > 65535 would silently lose
    // its high hex digits to the lpad(…, 4) truncation — assembling a
    // plausible-looking header with WRONG dimensions that round-trips
    // (PNG fields are 32-bit, so the bound is the shared 16-bit one
    // only where the 2-byte encodings are used)
    val valid = width > 0 && height > 0 &&
      (format === "png" || (width <= 65535 && height <= 65535))
    unhex(when(!valid, raise_error(lit(
        "synthesizeHeader: dimensions outside the container contract")))
      .when(format === "png", png).when(format === "jpeg", jpeg).otherwise(gif))
  }

  /** Deterministic RIFF/WAVE header synthesis (hex-assembled column
    * expressions, then `unhex`) — the audio counterpart of
    * [[synthesizeHeader]]: a complete RIFF + fmt + data chunk header
    * carrying the given PCM parameters, with no sample payload (the
    * parser reads sizes, not samples). */
  def synthesizeWavHeader(channels: Column, sampleRate: Column,
      bits: Column, nFrames: Column): Column = {
    def le16(x: Column): Column = {
      val be = lpad(hex(x), 4, "0")
      concat(substring(be, 3, 2), substring(be, 1, 2))
    }
    def le32(x: Column): Column = {
      val be = lpad(hex(x), 8, "0")
      concat(substring(be, 7, 2), substring(be, 5, 2),
        substring(be, 3, 2), substring(be, 1, 2))
    }
    // integer byte width (Column `/` is double division; the guard
    // below rejects bits not divisible by 8 before truncation matters)
    val blockAlign = channels.cast("long") *
      (bits.cast("long") / lit(8)).cast("long")
    val dataSize = nFrames.cast("long") * blockAlign
    val byteRate = sampleRate.cast("long") * blockAlign
    // out-of-contract parameters would silently assemble corrupt
    // little-endian fields (lpad(hex) truncates high digits) — fail
    // loudly instead, the q_pareto encoding-guard convention. The size
    // bounds are DIVISION-form pre-checks on the factors: checking the
    // products (dataSize + 36 <= 2^32-1) would itself be bypassable by
    // int64 wrap-around for huge nFrames
    val valid = bits.cast("long") % 8 === 0 &&
      bits.cast("long").between(8, 65535) &&
      channels.cast("long").between(1, 65535) &&
      blockAlign.between(1, 65535) &&
      sampleRate.cast("long").between(1, 0xFFFFFFFFL) &&
      nFrames.cast("long").between(0, (lit(0xFFFFFFFFL) - 36) / blockAlign) &&
      sampleRate.cast("long") <= lit(0xFFFFFFFFL) / blockAlign
    val header = concat(
      lit("52494646"), le32(dataSize + 36), lit("57415645"), // RIFF size WAVE
      lit("666D7420"), lit("10000000"), lit("0100"),         // fmt , len 16, PCM
      le16(channels), le32(sampleRate),
      le32(byteRate),
      le16(blockAlign), le16(bits),
      lit("64617461"), le32(dataSize))                        // data chunk header
    unhex(when(valid, header).otherwise(raise_error(lit(
      "synthesizeWavHeader: parameters outside the PCM header contract"))))
  }

  /** Deterministic RIFF/AVI header synthesis — the video counterpart
    * of [[synthesizeWavHeader]]: RIFF('AVI ') + LIST('hdrl') + a full
    * 56-byte MainAVIHeader (dwMicroSecPerFrame, dwTotalFrames,
    * dwStreams, dwWidth, dwHeight; flags carry AVIF_HASINDEX like real
    * muxers emit), no movi payload (the parser reads headers, not
    * frames). Out-of-contract parameters fail loudly — lpad(hex)
    * would otherwise truncate high digits into plausible corruption. */
  def synthesizeAviHeader(width: Column, height: Column, streams: Column,
      nFrames: Column, usPerFrame: Column): Column = {
    def le32(x: Column): Column = {
      val be = lpad(hex(x), 8, "0")
      concat(substring(be, 7, 2), substring(be, 5, 2),
        substring(be, 3, 2), substring(be, 1, 2))
    }
    val valid = width.cast("long").between(1, 0xFFFFFFFFL) &&
      height.cast("long").between(1, 0xFFFFFFFFL) &&
      streams.cast("long").between(1, 0xFFFFFFFFL) &&
      nFrames.cast("long").between(0, 0xFFFFFFFFL) &&
      usPerFrame.cast("long").between(1, 0xFFFFFFFFL)
    // sizes: avih data 56; hdrl list = 'hdrl'(4) + avih hdr(8) + 56 = 68;
    // riff = 'AVI '(4) + LIST hdr(8) + 68 = 80
    val header = concat(
      lit("52494646"), le32(lit(80L)), lit("41564920"),      // RIFF 80 'AVI '
      lit("4C495354"), le32(lit(68L)), lit("6864726C"),      // LIST 68 'hdrl'
      lit("61766968"), le32(lit(56L)),                       // avih 56
      le32(usPerFrame.cast("long")),                         // dwMicroSecPerFrame
      lit("00000000"), lit("00000000"), lit("10000000"),     // maxBps, padding, AVIF_HASINDEX
      le32(nFrames.cast("long")),                            // dwTotalFrames
      lit("00000000"),                                       // dwInitialFrames
      le32(streams.cast("long")),                            // dwStreams
      lit("00000000"),                                       // dwSuggestedBufferSize
      le32(width.cast("long")), le32(height.cast("long")),   // dwWidth, dwHeight
      lit("00000000"), lit("00000000"),
      lit("00000000"), lit("00000000"))                      // dwReserved[4]
    unhex(when(valid, header).otherwise(raise_error(lit(
      "synthesizeAviHeader: parameters outside the AVI header contract"))))
  }

  /** Feature extraction: a 16-bin byte histogram normalized to [0,1] —
    * the stand-in for an image/audio embedding model. Output shape
    * (fixed-width Array[Float]) and the mapPartitions batch contract
    * are exactly what a real encoder would use; only the math inside
    * is the stub. */
  final case class MediaFeatures(doc_id: Long, features: Array[Float])

  def extractFeatures(spark: SparkSession, df: DataFrame,
      idCol: String, blobCol: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Float](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) / 16) += 1f; i += 1 }
          val n = math.max(bytes.length, 1).toFloat
          var j = 0
          while (j < 16) { hist(j) /= n; j += 1 }
          MediaFeatures(id, hist)
        }
      }
  }

  /** Resize stage: recomputes target dimensions preserving aspect
    * ratio (the metadata transform of an image resize; the pixel work
    * is the stubbed part). */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame =
    df.withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_width",
        greatest(floor(col("width") * col("scale")), lit(1)).cast("long"))
      .withColumn("out_height",
        greatest(floor(col("height") * col("scale")), lit(1)).cast("long"))

  /** Frame sampling: every nth frame index of a fake video of
    * `n_frames` frames — the batch-shape of video pipelines (one row
    * per sampled frame, exploded from the container row). */
  def sampleFrames(df: DataFrame, idCol: String, nFrames: Column, every: Int): DataFrame =
    df.withColumn("frame_idx",
        // zero-frame containers sample nothing (explode of empty array)
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(every)))
          .otherwise(array().cast("array<int>"))))
      .select(col(idCol), col("frame_idx"))

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
