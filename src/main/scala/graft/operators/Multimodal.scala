package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` + typed metadata.
  *
  * The container ships no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB (`fakeDecode`) — but everything Spark
  * cares about is real and tested: the schema (binary payload + metadata
  * struct), the batched `mapPartitions` execution shape (the Scala analogue
  * of `mapInPandas` — per-partition batch processing, no per-row driver
  * round-trips), partitioning behavior, and the frame-sampling explode.
  * Swapping `fakeDecode` for a JNI/codec call changes no plan shape.
  */
object Multimodal {

  /** One decoded media record (the post-"decode" shape). */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      feature: Array[Double])

  /** Wrap a text table into a media table: payload = utf-8 bytes as `binary`,
    * metadata struct carried alongside. At 100 TB the payload column stays
    * columnar parquet binary — never stringified, never collected. */
  def asMediaTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decode kernel — deterministic fake standing in for a real codec.
    * Derives "dimensions" and an 4-dim "feature vector" purely from payload
    * bytes so tests and oracles are stable. */
  private[operators] def fakeDecode(docId: Long, mime: String, content: Array[Byte]): MediaFeatures = {
    val n = content.length.toLong
    var h = 1125899906842597L // deterministic FNV-ish rolling hash of the payload
    var i = 0
    while (i < content.length) { h = 31 * h + content(i); i += 1 }
    MediaFeatures(
      doc_id = docId,
      mime = mime,
      n_bytes = n,
      width = (n % 640L) + 1L,
      height = (n % 480L) + 1L,
      feature = Array((n % 251L).toDouble, (n % 127L).toDouble, (h % 1009L).toDouble, (h % 509L).toDouble))
  }

  /** "Decode + featurize" over the media table: batched per-partition pass
    * (mapPartitions), mirroring how a pandas-UDF batch kernel would run.
    * Output is a flat typed Dataset ready for downstream SQL. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("meta.mime").as("mime"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch => batch.map { case (id, mime, bytes) => fakeDecode(id, mime, bytes) } }
  }

  /** Frame sampling: every `step`-th byte offset becomes a "frame" row —
    * the explode/posexplode shape of video frame extraction. Pure columnar
    * (sequence + posexplode), no kernel needed. */
  def sampleFrames(media: DataFrame, step: Int): DataFrame =
    media
      .select(
        col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        // zero-byte payloads must yield zero frames, not an illegal
        // sequence(0, -1, step) boundary error
        posexplode(
          when(col("meta.n_bytes") > 0L,
            sequence(lit(0L), col("meta.n_bytes") - 1, lit(step.toLong)))
            .otherwise(array().cast("array<bigint>")))
          .as(Seq("frame_idx", "byte_offset")))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("byte_offset").as("byte_offset"))
}
