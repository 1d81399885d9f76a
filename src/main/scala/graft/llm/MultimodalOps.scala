package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the pipeline as
  * opaque `BINARY` columns with typed metadata, and decode/feature-extract
  * runs batched inside `mapPartitions` over a typed Dataset.
  *
  * The actual image/audio decoding libraries are not available in this
  * environment, so [[FakeDecoder.decode]] is a clearly-marked deterministic
  * STUB — but everything Spark-side is real and tested: the binary schema,
  * the encoder plumbing, the per-partition batched decode shape (decode
  * `BatchSize` records at a time, exactly how you'd feed a vectorized or
  * GPU decoder), and the partitioning (decode is a narrow map — no
  * shuffle; repartition upstream only to right-size decode tasks).
  */
object MultimodalOps {

  /** A media record: opaque payload + envelope metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  final case class MediaMeta(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Long, height: Long, first_byte: Long)

  /** Batch shape for the (stubbed) decoder — mirrors feeding a vectorized
    * decode kernel 32 records at a time. */
  val BatchSize = 32

  object FakeDecoder {
    /** STUB — deterministic fake standing in for e.g. libjpeg/ffmpeg decode.
      * Real implementation would parse the payload container; the fake
      * derives "dimensions" from payload bytes so results are verifiable.
      */
    def decode(batch: Seq[MediaRecord]): Seq[MediaMeta] =
      batch.map { r =>
        val n = r.payload.length.toLong
        MediaMeta(
          doc_id = r.doc_id,
          media_type = r.media_type,
          n_bytes = n,
          width = 64 + (n % 512),
          height = 64 + ((n * 7) % 512),
          first_byte = if (n > 0) r.payload(0).toLong & 0xffL else -1L)
      }
  }

  /** Wrap the documents table as a media table: payload = UTF-8 bytes of the
    * text (standing in for image bytes), media_type derived from source. */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      concat(lit("image/"), col("source")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batched decode via mapPartitions: the per-partition iterator is grouped
    * into `BatchSize` chunks and each chunk hits the decoder once. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(BatchSize).flatMap(batch => FakeDecoder.decode(batch))
    }
  }

  /** M1 — full plumbing: documents → binary media column → batched decode →
    * typed metadata, ordered for the oracle. */
  def mediaPipeline(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeMeta(spark, asMediaTable(documents)).toDF().orderBy("doc_id")

  /** Thumbnail metadata: source dims + the fitted target box. */
  final case class ThumbMeta(
      doc_id: Long, width: Long, height: Long, thumb_w: Long, thumb_h: Long)

  /** M2 — RESIZE (thumbnail): fit each image into a `box`×`box` target
    * preserving aspect ratio (never upscale). The dimension arithmetic is
    * pure per-record, so this is an honest narrow `map` downstream of the
    * decode kernel (the batched-kernel shape lives in [[decodeMeta]],
    * where a real implementation feeds the pixel work) — no shuffle. */
  def resizeMeta(spark: SparkSession, media: DataFrame, box: Long = 128): Dataset[ThumbMeta] = {
    import spark.implicits._
    decodeMeta(spark, media).map { m =>
      val maxd = math.max(m.width, m.height)
      val (tw, th) =
        if (maxd <= box) (m.width, m.height)
        else (math.floor(m.width * box.toDouble / maxd).toLong,
          math.floor(m.height * box.toDouble / maxd).toLong)
      ThumbMeta(m.doc_id, m.width, m.height, tw, th)
    }
  }

  /** One sampled frame: byte offset into the payload + the byte there. */
  final case class FrameSample(
      doc_id: Long, frame_idx: Long, frame_offset: Long, frame_byte: Long)

  /** M3 — FRAME-SAMPLE: treat the payload as a fixed-rate stream and
    * sample `frames` evenly-spaced offsets (a video keyframe-sampling
    * stand-in) — the decoder-side generator shape: `frames` rows out per
    * record in. Offset arithmetic is per-record, so a plain flatMap (the
    * batched-kernel shape lives in [[decodeMeta]]). frame_idx is the
    * sample ordinal i itself — for n ≥ 1 every offset i·n/frames is < n,
    * so only empty payloads yield no frames. */
  def sampleFrames(spark: SparkSession, media: DataFrame, frames: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      val n = r.payload.length.toLong
      (0 until frames).iterator
        .map(i => (i.toLong, i.toLong * n / frames)) // evenly spaced, integer floor
        .filter(_._2 < n)
        .map { case (i, off) =>
          FrameSample(r.doc_id, i, off, r.payload(off.toInt).toLong & 0xffL)
        }
    }
  }
}
