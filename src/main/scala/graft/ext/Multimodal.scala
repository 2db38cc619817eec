package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A decoded media record: metadata derived from an opaque binary
  * payload. In production the decoder is a real image/audio library; in
  * this container the decode step is a clearly-marked deterministic fake
  * ([[Multimodal.fakeDecode]]) — the Spark-side plumbing (binary column,
  * typed schema, partition-wise batch decode, no shuffle) is real.
  */
case class MediaMeta(doc_id: Long, byte_len: Long, header_hex: String,
                     width: Int, height: Int, frames: Int)

/** Multimodal-column handling: treat image/audio/video as opaque
  * `binary` columns + typed metadata, decoded partition-wise.
  *
  * Scale notes: decode runs inside `mapPartitions` — one library init
  * per partition (the expensive part with real codecs), streaming
  * through rows without materializing the partition. The binary column
  * never shuffles; only the small metadata rows do, if the caller
  * aggregates. At 100 TB the payloads live in parquet binary columns
  * (or object-store URIs for > a-few-MB blobs) and decode parallelism
  * is the scan parallelism.
  */
object Multimodal {

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec unavailable in this container. Derives metadata purely from
    * the payload bytes so results are reproducible and oracle-checkable:
    * width/height/frames are simple functions of the byte length. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val header = payload.take(8).map(b => f"${b & 0xff}%02X").mkString
    MediaMeta(docId, n, header,
      width = (n % 640).toInt, height = ((n * 7) % 480).toInt,
      frames = ((n % 30) + 1).toInt)
  }

  /** Attach a binary `payload` column. A frame that ALREADY carries one
    * (a true media table — see [[mediaFixtureFrame]]) passes through
    * untouched; otherwise UTF-8 of `text` stands in (the driver corpus
    * has no media column). */
  def withPayload(docs: DataFrame): DataFrame =
    if (docs.columns.contains("payload")) docs
    else docs.withColumn("payload", col("text").cast("binary"))

  /** Deterministic TRUE-BINARY media fixture: per doc, an 8-byte PNG
    * magic header followed by (doc_id % 5 + 1) blocks of the 16 md5
    * bytes of the id — variable-length real `BINARY` (via unhex), so
    * writing it to parquet exercises the actual binary IO path instead
    * of a string cast. ScaleUp emits this as `media.parquet` beside the
    * scaled tables; byte_len = 8 + 16 * (doc_id % 5 + 1) and
    * header_hex = the PNG magic, both spec-asserted after a parquet
    * round-trip. */
  def mediaFixtureFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      unhex(concat(lit("89504E470D0A1A0A"),
        expr("repeat(md5(cast(doc_id as string)), cast(doc_id % 5 + 1 as int))")))
        .as("payload"))

  /** Partition-wise decode: binary payloads -> typed metadata Dataset. */
  def decodeMeta(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs init their native context once per partition here
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }
}
