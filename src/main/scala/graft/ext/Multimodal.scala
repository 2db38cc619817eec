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

  /** Partition-wise CONTENT FEATURE extraction: payload bytes -> a
    * fixed-dim Double vector, the bridge from the binary column into
    * the similarity tier (an [[AnnIndex]] builds from this frame
    * unchanged — `MultimodalSpec` drives that hand-off). The
    * featurizer is the container-imposed deterministic fake (dim j =
    * the byte at offset floor(n*j/dims) scaled to [0,1]); a real
    * deployment swaps in a vision/audio encoder inside the SAME
    * mapPartitions (one model init per partition, batch the partition
    * iterator through the encoder). The plumbing is the real thing:
    * binary in, fixed-width vector schema out, no shuffle, scan
    * parallelism = decode parallelism. */
  val FeatureDims = 8
  def features(docs: DataFrame, dims: Int = FeatureDims): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real encoders init once per partition here, then batch
        it.map { case (id, b) =>
          val n = b.length
          val fs = Array.tabulate(dims) { j =>
            if (n == 0) 0.0
            else (b(((n.toLong * j) / dims).toInt) & 0xff) / 255.0
          }
          (id, fs)
        }
      }
      .toDF("doc_id", "features")
  }

  /** Partition-wise FRAME SAMPLING: treat the payload as `frames`
    * equal byte-spans (the fake container format [[fakeDecode]]
    * declares) and emit every `step`-th frame's slice — (doc_id,
    * frame_idx, frame_len, frame_md5). The md5 stands in for the
    * decoded frame tensor so the result is oracle-checkable; a real
    * video pipeline decodes the slice instead and hands each frame to
    * [[features]]' encoder. Output is one row per SAMPLED frame —
    * frame explosion happens executor-side inside the iterator, so a
    * 10k-frame payload never materializes as a driver array, and the
    * binary column itself still never shuffles. */
  def sampleFrames(docs: DataFrame, step: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, b) =>
          val n = b.length.toLong
          val frames = (n % 30 + 1).toInt // fakeDecode's frame count
          (0 until frames by step).iterator.map { f =>
            val start = (n * f / frames).toInt
            val end = (n * (f + 1) / frames).toInt
            md.reset()
            val hex = md.digest(java.util.Arrays.copyOfRange(b, start, end))
              .map(x => f"${x & 0xff}%02x").mkString
            (id, f, (end - start).toLong, hex)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_len", "frame_md5")
  }

  /** Frame-LEVEL content features — [[sampleFrames]]' slicing composed
    * with [[features]]' byte-offset featurizer, one vector per SAMPLED
    * frame: the shape video retrieval runs on (frame embeddings, not
    * whole-clip embeddings). Same executor-side iterator flatMap as
    * sampleFrames — a 10k-frame payload never materializes driver-side
    * and the binary column never shuffles; a real pipeline swaps the
    * featurizer for a vision encoder inside the same mapPartitions. */
  def frameFeatures(docs: DataFrame, step: Int = 3,
                    dims: Int = FeatureDims): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) =>
          val n = b.length.toLong
          val frames = (n % 30 + 1).toInt // fakeDecode's frame count
          (0 until frames by step).iterator.map { f =>
            val start = (n * f / frames).toInt
            val end = (n * (f + 1) / frames).toInt
            val len = end - start
            val fs = Array.tabulate(dims) { j =>
              if (len == 0) 0.0
              else (b(start + ((len.toLong * j) / dims).toInt) & 0xff) / 255.0
            }
            (id, f, fs)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "features")
  }

  /** RESIZE planning on the decoded metadata: fit (width, height) into
    * a `box` square preserving aspect ratio, integer fixed-point
    * arithmetic (scale in 1/256ths, capped at 1x — no upscaling) so
    * the plan is oracle-exact. The byte transform itself is what a
    * real image library does with the computed target; computing
    * targets as a column operation is the part that belongs to the
    * engine (and is the cheap, shuffle-free projection it should be). */
  def resizePlan(meta: DataFrame, box: Int = 64): DataFrame =
    meta.select(col("doc_id"), col("width"), col("height"),
        least(lit(256L),
          lit(box * 256L) / greatest(col("width").cast("long"), lit(1L)),
          lit(box * 256L) / greatest(col("height").cast("long"), lit(1L)))
          .cast("long").as("scale_256"))
      .select(col("doc_id"), col("width"), col("height"),
        (col("width") * col("scale_256") / 256L).cast("int").as("out_w"),
        (col("height") * col("scale_256") / 256L).cast("int").as("out_h"))

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
