package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, functions => F}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque binary columns
  * with typed metadata, decoded/feature-extracted in partition-batched
  * typed pipelines.
  *
  * The decode step is a STUB: this container ships no image/audio codecs,
  * so `decodeFeatures` derives deterministic fake features from byte
  * statistics. Everything around it — binary schema, typed Dataset
  * encoders, mapPartitions batch shape, partition sizing — is the real
  * plumbing a codec-backed decoder would drop into.
  */
object multimodal {

  /** A media row: opaque payload + cheap metadata extracted at scan time. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], n_bytes: Long, magic: String)

  /** Decoded features. A real implementation would parse the container
    * format (JPEG SOF markers, WAV headers, …); the stub is deterministic
    * in the payload bytes. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, magic: String,
      width: Int, height: Int, channels: Int)

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Wrap a text column as a fake binary payload (stand-in for real media
    * bytes) + metadata: size and a 4-char "magic" prefix. */
  def toMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    df.select(
        F.col(idCol).cast(LongType).as("doc_id"),
        F.encode(F.col(textCol), "UTF-8").as("payload"),
        F.octet_length(F.encode(F.col(textCol), "UTF-8")).cast(LongType).as("n_bytes"),
        F.substring(F.col(textCol), 1, 4).as("magic"))
      .as[MediaRow]
  }

  /** STUB decoder: partition-batched feature extraction. The real version
    * would run a codec over `payload` inside this mapPartitions (one
    * library init per partition, not per row — the batch shape matters
    * at scale). */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] =
    ds.mapPartitions { rows =>
      // per-partition "codec init" would go here
      rows.map { r =>
        // ??? real decode — replaced by a deterministic fake:
        MediaFeatures(r.doc_id, r.n_bytes, r.magic,
          width = (r.n_bytes % 640).toInt,
          height = (r.n_bytes % 480).toInt,
          channels = 3)
      }
    }

  /** Resize stage: recomputes geometry toward a bounding box preserving
    * aspect ratio. STUB pixel path (real version transforms `payload`);
    * the metadata math and typed plumbing are real. */
  def resize(ds: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[MediaFeatures] =
    ds.map { f =>
      val w = math.max(1, f.width); val h = math.max(1, f.height)
      val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
      f.copy(width = math.max(1, (w * scale).toInt),
        height = math.max(1, (h * scale).toInt))
    }

  final case class Frame(doc_id: Long, frame_idx: Long, offset: Long, n_bytes: Long)
  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]

  /** Frame-sampling stage for video-like payloads: every `stride` bytes
    * becomes one sampled "frame" descriptor (offset + length). STUB frame
    * extraction; the explode-shaped plumbing (one input row → N frame
    * rows, computed lazily, no driver materialization) is real. */
  def sampleFrames(ds: Dataset[MediaRow], stride: Long): Dataset[Frame] =
    ds.flatMap { r =>
      val n = math.max(1L, (r.n_bytes + stride - 1) / stride)
      (0L until n).iterator.map(i =>
        Frame(r.doc_id, i, i * stride, math.min(stride, r.n_bytes - i * stride)))
    }
}
