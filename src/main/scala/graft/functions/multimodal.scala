package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession, functions => F}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque binary columns
  * with typed metadata, decoded/feature-extracted in partition-batched
  * typed pipelines.
  *
  * The decode step is REAL for the formats the JDK ships codecs for
  * (PNG, JPEG, GIF, BMP via ImageIO): `decodeFeatures` parses the
  * payload bytes and reports true pixel dimensions and band counts.
  * Payloads no installed reader understands (text fixtures, audio,
  * codecs outside the JDK) fall back to deterministic byte-statistics
  * features so the pipeline stays total — the fallback is the
  * extension point where a container with real audio/video codecs
  * would plug in, with the schema, encoders, mapPartitions batch shape
  * and partition sizing unchanged.
  */
object multimodal {

  /** A media row: opaque payload + cheap metadata extracted at scan time. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], n_bytes: Long, magic: String)

  /** Decoded features: true pixel geometry for ImageIO-readable
    * payloads, deterministic byte-statistics otherwise. */
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

  /** Ingest a directory of REAL media files through Spark's built-in
    * `binaryFile` source — the production path from object storage to
    * [[decodeFeatures]]. Each file becomes one [[MediaRow]]: `doc_id` a
    * stable 64-bit path fingerprint (xxhash64 — reproducible across
    * runs and cluster layouts), `magic` the upper-cased extension.
    * `binaryFile` streams file contents as a binary column with
    * predicate pushdown on (path, length, modificationTime); cap
    * per-task memory with `spark.sql.sources.binaryFile.maxLength` when
    * payloads can be large. `glob` filters at LISTING time
    * (pathGlobFilter) — unmatched files are never opened. */
  def fromBinaryFiles(spark: SparkSession, dir: String,
      glob: String = "*"): Dataset[MediaRow] =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        F.xxhash64(F.col("path")).as("doc_id"),
        F.col("content").as("payload"),
        F.col("length").as("n_bytes"),
        F.upper(F.regexp_extract(F.col("path"), "\\.([A-Za-z0-9]+)$", 1))
          .as("magic"))
      .as[MediaRow](mediaRowEnc)

  /** Partition-batched media decode. ImageIO parses each payload
    * in-memory (PNG/JPEG/GIF/BMP — the JDK's shipped readers): real
    * width, height and raster band count. Unreadable payloads fall back
    * to deterministic byte-statistics features (the audio/video
    * extension point). Codec setup happens once per PARTITION, not per
    * row — the batch shape that matters at scale: a 100 TB scan pays
    * library init per task, and the decode itself never touches disk
    * (`setUseCache(false)` keeps ImageIO off its temp-file cache). */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] =
    ds.mapPartitions { rows =>
      // per-partition codec init
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img != null)
          MediaFeatures(r.doc_id, r.n_bytes, r.magic,
            width = img.getWidth, height = img.getHeight,
            channels = img.getRaster.getNumBands)
        else
          MediaFeatures(r.doc_id, r.n_bytes, r.magic,
            width = (r.n_bytes % 640).toInt,
            height = (r.n_bytes % 480).toInt,
            channels = 3)
      }
    }

  /** Deterministic tiny PNG: TYPE_3BYTE_BGR pixels derived from
    * (seed, x, y), written through the JDK's real PNG encoder — the
    * fixture generator for decode tests and oracled queries (the DIMS
    * are predictable arithmetic even though the byte stream is
    * encoder-specific). */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((seed * 31 + y.toLong * width + x) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
