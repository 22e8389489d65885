package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession, functions => F}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque binary columns
  * with typed metadata, decoded/feature-extracted in partition-batched
  * typed pipelines.
  *
  * The decode step is REAL for the formats the JDK ships codecs for:
  * images (PNG, JPEG, GIF, BMP via ImageIO — `decodeFeatures` parses
  * the payload bytes and reports true pixel dimensions and band
  * counts) and uncompressed audio (WAV/AIFF/AU via
  * `javax.sound.sampled` — `decodeAudioFeatures` reports true sample
  * rate, channel count and frame length). Payloads no installed reader
  * understands (text fixtures, compressed codecs outside the JDK) fall
  * back to deterministic byte-statistics features so the pipeline
  * stays total — the fallback is the extension point where a container
  * with real video codecs would plug in, with the schema, encoders,
  * mapPartitions batch shape and partition sizing unchanged.
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

  /** Decoded audio features: true PCM geometry for payloads the JDK's
    * shipped readers understand (WAV/AIFF/AU), byte-statistics fallback
    * otherwise. `duration_ms` = frames * 1000 / sample_rate (integer
    * floor — deterministic, oracle-friendly). */
  final case class AudioFeatures(doc_id: Long, n_bytes: Long, magic: String,
      sample_rate: Int, channels: Int, frames: Long, duration_ms: Long)

  implicit val audioFeaturesEnc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]

  /** Partition-batched audio decode — the audio sibling of
    * [[decodeFeatures]], REAL for the containers the JDK ships parsers
    * for (WAV/AIFF/AU via `javax.sound.sampled.AudioSystem`): sample
    * rate, channel count and frame length come from actually parsing
    * the payload header, never from trusted metadata. Unreadable
    * payloads (compressed codecs outside the JDK) fall back to
    * deterministic byte-statistics features so the pipeline stays
    * total — the same extension-point posture as the image path. The
    * decode is in-memory per row, init-free per partition, and emits a
    * flat case-class row — codegen resumes immediately downstream. */
  def decodeAudioFeatures(ds: Dataset[MediaRow]): Dataset[AudioFeatures] =
    ds.mapPartitions { rows =>
      rows.map { r =>
        val parsed =
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            try {
              val fmt = in.getFormat
              val frames = in.getFrameLength
              val sr = math.round(fmt.getSampleRate)
              Some(AudioFeatures(r.doc_id, r.n_bytes, r.magic,
                sample_rate = sr, channels = fmt.getChannels,
                frames = frames,
                duration_ms = if (sr > 0) frames * 1000L / sr else 0L))
            } finally in.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        parsed.getOrElse(AudioFeatures(r.doc_id, r.n_bytes, r.magic,
          sample_rate = (8000 + r.n_bytes % 8000).toInt,
          channels = 1 + (r.n_bytes % 2).toInt,
          frames = r.n_bytes / 2,
          duration_ms = 0L))
      }
    }

  /** Deterministic PCM WAV: 16-bit signed little-endian samples derived
    * from (seed, frame, channel), written through the JDK's real WAVE
    * encoder — the audio fixture generator for decode tests and oracled
    * queries (frame count / rate / channels are predictable arithmetic
    * even though the byte stream is container-specific). */
  def syntheticWav(frames: Int, sampleRate: Int, channels: Int,
      seed: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, channels, 2 * channels, sampleRate.toFloat,
      false)
    val data = new Array[Byte](frames * 2 * channels)
    var i = 0
    while (i < frames * channels) {
      val v = ((seed * 2654435761L + i * 40503L) & 0xffffL).toInt - 32768
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ---------------- video (MP4 container metadata) ----------------

  /** Decoded video-container features: true presentation duration,
    * track count and video-track pixel dimensions parsed from the MP4
    * box structure itself (never from trusted metadata columns);
    * byte-statistics fallback for payloads that are not ISO-BMFF. */
  final case class VideoFeatures(doc_id: Long, n_bytes: Long, magic: String,
      duration_ms: Long, n_tracks: Int, width: Int, height: Int)

  implicit val videoFeaturesEnc: Encoder[VideoFeatures] =
    Encoders.product[VideoFeatures]

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  /** The ISO-BMFF boxes inside [from, to): (type, payloadFrom,
    * payloadTo). Handles 32-bit sizes, 64-bit largesize (size == 1) and
    * to-end-of-enclosure boxes (size == 0); stops cleanly on torn or
    * nonsensical headers rather than looping. */
  private def mp4Boxes(b: Array[Byte], lo: Int,
      hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var off = lo
      def hasNext: Boolean = off + 8 <= hi
      def next(): (String, Int, Int) = {
        val size0 = be32(b, off)
        val tpe = new String(b, off + 4, 4, "ISO-8859-1")
        val (payloadFrom, boxEnd) =
          if (size0 == 1L && off + 16 <= hi) {
            val size = be64(b, off + 8)
            (off + 16, off + math.min(size, (hi - off).toLong).toInt)
          } else if (size0 == 0L) (off + 8, hi)
          else (off + 8, off + math.min(math.max(size0, 8L), (hi - off).toLong).toInt)
        val r = (tpe, payloadFrom, math.max(payloadFrom, boxEnd))
        off = math.max(boxEnd, off + 8) // always advance
        r
      }
    }

  /** Partition-batched MP4 metadata decode — the video sibling of
    * [[decodeFeatures]]/[[decodeAudioFeatures]], REAL for the ISO-BMFF
    * container family (MP4/MOV/M4A): the presentation duration comes
    * from actually parsing `moov/mvhd` (duration ÷ timescale, v0 and v1
    * layouts), the track count from counting `trak` boxes, and the
    * pixel dimensions from the first `tkhd` with a nonzero 16.16
    * fixed-point width × height (the video track — audio tracks carry
    * zero dims). SAMPLE payloads aren't decoded — box walking reads
    * only headers, so a task scans megabytes of `mdat` without touching
    * it. Non-BMFF payloads fall back to deterministic byte-statistics
    * features (the extension point for real codec containers), keeping
    * the pipeline total with the mapPartitions batch shape unchanged. */
  def decodeVideoFeatures(ds: Dataset[MediaRow]): Dataset[VideoFeatures] =
    ds.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        val parsed =
          try {
            mp4Boxes(b, 0, b.length).collectFirst { case ("moov", f, t) =>
              var durationMs = 0L
              var nTracks = 0
              var w = 0
              var h = 0
              mp4Boxes(b, f, t).foreach {
                case ("mvhd", p, _) =>
                  val version = b(p) & 0xff
                  val (ts, dur) =
                    if (version == 1) (be32(b, p + 20), be64(b, p + 24))
                    else (be32(b, p + 12), be32(b, p + 16))
                  if (ts > 0) durationMs = dur * 1000L / ts
                case ("trak", tf, tt) =>
                  nTracks += 1
                  mp4Boxes(b, tf, tt).foreach {
                    case ("tkhd", p, _) if w == 0 && h == 0 =>
                      val version = b(p) & 0xff
                      // v1 tkhd: creation/modification/duration are 64-bit
                      val geomOff = if (version == 1) p + 88 else p + 76
                      val tw = (be32(b, geomOff) >> 16).toInt
                      val th = (be32(b, geomOff + 4) >> 16).toInt
                      if (tw > 0 && th > 0) { w = tw; h = th }
                    case _ => ()
                  }
                case _ => ()
              }
              VideoFeatures(r.doc_id, r.n_bytes, r.magic,
                duration_ms = durationMs, n_tracks = nTracks,
                width = w, height = h)
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        parsed.getOrElse(VideoFeatures(r.doc_id, r.n_bytes, r.magic,
          duration_ms = 0L, n_tracks = 0,
          width = (r.n_bytes % 1920).toInt, height = (r.n_bytes % 1080).toInt))
      }
    }

  /** Minimal structurally-valid MP4: `ftyp` + `moov` (v0 `mvhd` at
    * timescale 1000 + one `trak`/`tkhd` per track — track 1 carries the
    * 16.16 fixed-point video geometry, later tracks zero dims) + a stub
    * `mdat`. The video fixture generator for decode tests and oracled
    * queries: duration/track/geometry are predictable arithmetic while
    * the bytes exercise the REAL box parser. */
  def syntheticMp4(durationMs: Long, width: Int, height: Int,
      nTracks: Int): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(payload.length + 8)
      bb.putInt(payload.length + 8).put(tpe.getBytes("ISO-8859-1"))
        .put(payload)
      bb.array()
    }
    val unityMatrix = { // 2.30 / 16.16 fixed-point identity transform
      val m = java.nio.ByteBuffer.allocate(36)
      m.putInt(0x00010000).putInt(0).putInt(0)
      m.putInt(0).putInt(0x00010000).putInt(0)
      m.putInt(0).putInt(0).putInt(0x40000000)
      m.array()
    }
    val mvhd = {
      val p = java.nio.ByteBuffer.allocate(100)
      p.putInt(0)                   // version 0 + flags
      p.putInt(0).putInt(0)         // creation, modification
      p.putInt(1000)                // timescale: ms
      p.putInt(durationMs.toInt)    // duration
      p.putInt(0x00010000)          // rate 1.0
      p.putShort(0x0100.toShort)    // volume 1.0
      p.put(new Array[Byte](10))    // reserved
      p.put(unityMatrix)
      p.put(new Array[Byte](24))    // pre_defined
      p.putInt(nTracks + 1)         // next_track_ID
      box("mvhd", p.array())
    }
    val traks = (1 to nTracks).map { id =>
      val p = java.nio.ByteBuffer.allocate(84)
      p.putInt(3)                   // version 0, flags: enabled+in movie
      p.putInt(0).putInt(0)         // creation, modification
      p.putInt(id)                  // track_ID
      p.putInt(0)                   // reserved
      p.putInt(durationMs.toInt)    // duration (movie timescale)
      p.put(new Array[Byte](8))     // reserved
      p.putShort(0).putShort(0)     // layer, alternate_group
      p.putShort(if (id == 1) 0 else 0x0100.toShort) // volume (audio only)
      p.putShort(0)                 // reserved
      p.put(unityMatrix)
      p.putInt(if (id == 1) width << 16 else 0)  // 16.16 fixed
      p.putInt(if (id == 1) height << 16 else 0)
      box("trak", box("tkhd", p.array()))
    }
    val ftyp = {
      val p = java.nio.ByteBuffer.allocate(20)
      p.put("isom".getBytes("ISO-8859-1")).putInt(0x200)
      p.put("isom".getBytes("ISO-8859-1"))
      p.put("iso2".getBytes("ISO-8859-1"))
      p.put("mp41".getBytes("ISO-8859-1"))
      box("ftyp", p.array())
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    val mdat = box("mdat", new Array[Byte](8))
    ftyp ++ moov ++ mdat
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
