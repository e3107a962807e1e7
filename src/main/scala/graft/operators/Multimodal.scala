package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns beside typed metadata, mirroring how a 100 TB
  * training-data lake stores media (bytes in parquet/blob store, features
  * extracted in-pipeline).
  *
  * All three modalities take REAL decode paths with zero external
  * dependencies: images (PNG/JPEG/GIF/BMP, sniffed by magic bytes) through
  * `javax.imageio` — luma histograms over actual pixels, [[resize]] renders
  * a true scaled raster and re-encodes PNG; audio (WAV/PCM) through
  * `javax.sound.sampled` — RMS envelopes over decoded samples; video
  * (MJPEG-in-AVI) through a RIFF container parse ([[decodeVideo]]) whose
  * frames decode as JPEGs — frame-averaged histograms. Bytes NO codec
  * claims fall back to the deterministic fakes ([[fakeDecodeFeatures]],
  * [[resizeStub]] semantics). Either way the Spark-side plumbing (schema,
  * batched `mapPartitions`, feature width) is identical. Batching per
  * partition matters at scale: the codec is amortized per-partition (like
  * an Arrow batch UDF), not per-row.
  */
object Multimodal {

  // ImageIO's default scratch-file cache writes a temp file per decode —
  // pure overhead for byte-array streams on an executor.
  ImageIO.setUseCache(false)

  /** Canonical media-row schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),   // "image" | "audio" | "video"
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  final case class MediaFeatures(media_id: Long, modality: String,
                                 n_bytes: Long, checksum: Long,
                                 feature: Array[Float])

  /** Magic-byte sniff — decides whether to hand bytes to ImageIO at all
    * (cheap guard; ImageIO reader discovery per non-image row is not).
    */
  def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||  // PNG
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) || // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||          // GIF
      (b(0) == 'B' && b(1) == 'M'))                                          // BMP

  /** Real image decode via the JDK's ImageIO; None for non-image or
    * corrupt payloads (callers fall back to the deterministic fake).
    */
  def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    if (payload == null || !looksLikeImage(payload)) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** Pixel-derived features: a `dim`-bucket luma histogram normalized by
    * pixel count. Deterministic for lossless formats (decoded raster ==
    * encoded raster) and stable across encoders for the same pixels.
    */
  def imageFeatures(img: BufferedImage, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val w = img.getWidth
    val h = img.getHeight
    if (w == 0 || h == 0) return out
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000
        out(math.min(dim - 1, luma * dim / 256)) += 1.0f
        x += 1
      }
      y += 1
    }
    // Long product: w * h overflows Int beyond ~2^31 pixels
    val n = (w.toLong * h).toFloat
    var i = 0
    while (i < dim) { out(i) /= n; i += 1 }
    out
  }

  // ---- audio (real decode via javax.sound.sampled — in the JDK) ----------

  /** Magic-byte sniff for RIFF/WAVE containers. */
  def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Real WAV/PCM decode through `javax.sound.sampled` (JDK, zero external
    * deps): any WAV the JDK can read is converted to signed 16-bit PCM,
    * channels averaged to mono, normalized to [-1, 1]. None for non-WAV or
    * corrupt payloads (callers fall back to the deterministic fake).
    */
  def decodeAudio(payload: Array[Byte]): Option[Array[Float]] =
    if (payload == null || !looksLikeWav(payload)) None
    else
      try {
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels, 2 * fmt.getChannels,
          fmt.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
        val bytes = try pcm.readAllBytes() finally pcm.close()
        val ch = fmt.getChannels
        val frames = bytes.length / (2 * ch)
        if (frames == 0) Some(Array.emptyFloatArray)
        else {
          val mono = new Array[Float](frames)
          var f = 0
          while (f < frames) {
            var sum = 0f
            var c = 0
            while (c < ch) {
              val o = (f * ch + c) * 2
              // little-endian signed 16-bit
              val s = ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort
              sum += s / 32768.0f
              c += 1
            }
            mono(f) = sum / ch
            f += 1
          }
          Some(mono)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Sample-derived features: `dim` windowed RMS values — the signal's
    * energy envelope at fixed resolution. Deterministic (PCM decode is
    * exact), comparable across clips of different lengths.
    */
  def audioFeatures(samples: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = samples.length
    if (n == 0) return out
    var w = 0
    while (w < dim) {
      val lo = (w.toLong * n / dim).toInt
      val hi = math.max(lo + 1, ((w + 1).toLong * n / dim).toInt)
      var acc = 0.0
      var i = lo
      while (i < math.min(hi, n)) { acc += samples(i).toDouble * samples(i); i += 1 }
      val cnt = math.min(hi, n) - lo
      out(w) = if (cnt <= 0) 0f else math.sqrt(acc / cnt).toFloat
      w += 1
    }
    out
  }

  // ---- video (real MJPEG-in-AVI decode — RIFF walk + ImageIO, in the JDK) --

  /** A parsed AVI clip: dimensions and per-frame timing from the `avih`
    * header, raw video-stream chunks (JPEGs for MJPEG) from the `movi`
    * list.
    */
  final case class VideoClip(width: Int, height: Int, microSecPerFrame: Long,
                             frames: Vector[Array[Byte]]) {
    def durationMs: Long = microSecPerFrame * frames.length / 1000
  }

  /** Magic-byte sniff for RIFF/AVI containers. */
  def looksLikeAvi(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Real AVI container parse: walk the RIFF chunk tree (little-endian
    * sizes, even padding), read dimensions + frame timing from the `avih`
    * main header, and collect the video-stream data chunks (`##dc`/`##db`)
    * out of the `movi` list. None for non-AVI or structurally broken
    * payloads (callers fall back to the deterministic fake). Truncated
    * trailing chunks are clamped, not fatal — exactly how lenient players
    * treat interrupted recordings.
    */
  def decodeVideo(payload: Array[Byte]): Option[VideoClip] =
    if (payload == null || !looksLikeAvi(payload)) None
    else
      try {
        def le32(o: Int): Long =
          ((payload(o) & 0xFF) | (payload(o + 1) & 0xFF) << 8 |
            (payload(o + 2) & 0xFF) << 16) | (payload(o + 3).toLong & 0xFF) << 24
        def fourcc(o: Int): String = new String(payload, o, 4, "US-ASCII")
        var width = 0
        var height = 0
        var uspf = 0L
        val frames = Vector.newBuilder[Array[Byte]]
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (off + 8 <= end) {
            val id = fourcc(off)
            val sz = le32(off + 4).toInt
            // a declared size with the high bit set (>2 GiB "length") would
            // walk the cursor BACKWARDS — malformed, refuse the container
            require(sz >= 0, s"negative chunk size at offset $off")
            val dataStart = off + 8
            val dataEnd = math.min(dataStart.toLong + sz, end.toLong).toInt
            if (id == "RIFF" || id == "LIST") {
              if (dataEnd >= dataStart + 4) walk(dataStart + 4, dataEnd)
            } else if (id == "avih" && sz >= 40) {
              uspf = le32(dataStart)
              width = le32(dataStart + 32).toInt
              height = le32(dataStart + 36).toInt
            } else if (id(0).isDigit && id(1).isDigit &&
                (id.endsWith("dc") || id.endsWith("db"))) {
              frames += java.util.Arrays.copyOfRange(payload, dataStart, dataEnd)
            }
            // advance in Long (dataStart + sz overflows Int near 2 GiB),
            // clamping to end so an oversized declared length terminates
            val next = dataStart.toLong + sz + (sz & 1) // chunks pad to even
            off = if (next > end) end else next.toInt
          }
        }
        walk(12, payload.length)
        if (width <= 0 || height <= 0) None
        else Some(VideoClip(width, height, uspf, frames.result()))
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Frame-derived features: decode up to `maxFrames` evenly-sampled video
    * frames (MJPEG frames are plain JPEGs — ImageIO again) and average
    * their luma histograms — the clip's brightness profile, length-
    * independent. None when no frame decodes (unknown intra-frame codec):
    * callers fall back rather than fabricate.
    */
  def videoFeatures(clip: VideoClip, dim: Int,
                    maxFrames: Int = 8): Option[Array[Float]] = {
    val n = clip.frames.length
    if (n == 0) return None
    val picks =
      if (n <= maxFrames) clip.frames
      else (0 until maxFrames).map(i => clip.frames((i.toLong * n / maxFrames).toInt))
    val decoded = picks.flatMap(decodeImage(_)).map(imageFeatures(_, dim))
    if (decoded.isEmpty) None
    else {
      val out = new Array[Float](dim)
      decoded.foreach { f =>
        var i = 0
        while (i < dim) { out(i) += f(i); i += 1 }
      }
      var i = 0
      while (i < dim) { out(i) /= decoded.length; i += 1 }
      Some(out)
    }
  }

  /** Fallback decoder for payloads NO real codec claims (unknown bytes,
    * corrupt containers): deterministic features derived from the raw
    * bytes, same signature and batch shape as the real paths.
    */
  def fakeDecodeFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Dispatching decoder: real pixel features for decodable images, real
    * RMS-envelope features for decodable WAV audio, real frame-averaged
    * features for decodable MJPEG/AVI video — the deterministic fake only
    * for bytes no codec claims.
    */
  def decodeFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val bytes = if (payload == null) Array.emptyByteArray else payload
    decodeImage(bytes).map(imageFeatures(_, dim))
      .orElse(decodeAudio(bytes).map(audioFeatures(_, dim)))
      .orElse(decodeVideo(bytes).flatMap(videoFeatures(_, dim)))
      .getOrElse(fakeDecodeFeatures(bytes, dim))
  }

  /** Metadata pass — pure expressions, no decode: byte size + checksum per
    * payload. Runs entirely scan-side.
    */
  def describe(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("modality"),
      octet_length(col("payload")).as("n_bytes"),
      crc32(col("payload")).as("checksum"))

  /** Feature extraction over batched partitions. `mapPartitions` (not a
    * per-row UDF) so the decoder initializes once per partition/batch —
    * the JVM analog of a Pandas-batch UDF. Image payloads decode through
    * ImageIO ([[decodeFeatures]]); others use the fake. Output is a typed
    * Dataset with a fixed-width feature vector ready for [[Similarity]] /
    * [[Dedup]].
    */
  def extractFeatures(media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "modality", "payload").mapPartitions { rows: Iterator[Row] =>
      // Per-partition init point: open codec / model session HERE once.
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val bytes = if (payload == null) Array.emptyByteArray else payload
        MediaFeatures(
          media_id = r.getAs[Long]("media_id"),
          modality = r.getAs[String]("modality"),
          n_bytes = bytes.length.toLong,
          checksum = { val c = new java.util.zip.CRC32(); c.update(bytes); c.getValue },
          feature = decodeFeatures(bytes, dim))
      }
    }
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  // ---- MJPEG-AVI writer (RIFF assembly, zero external deps) ----------------

  private def le32Bytes(v: Long): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def le16Bytes(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32Bytes(data.length.toLong) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)

  private def riffList(listType: String, data: Array[Byte]): Array[Byte] =
    riffChunk("LIST", listType.getBytes("US-ASCII") ++ data)

  /** Encode frames as a REAL MJPEG-in-AVI clip: each frame JPEG-encoded via
    * ImageIO, wrapped in a standards-shaped RIFF tree (`avih` main header,
    * `strl` with a `vids/MJPG` stream header + BITMAPINFOHEADER, `movi`
    * with one `00dc` chunk per frame). Any MJPEG-capable player or parser
    * — including [[decodeVideo]] — reads it back.
    */
  def encodeMjpegAvi(frames: Seq[BufferedImage], fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "a clip needs at least one frame")
    require(fps > 0, "fps must be positive")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val jpegs = frames.map(encodeJpeg)
    val maxJpeg = jpegs.map(_.length).max
    val avih = Array.concat(
      le32Bytes(1000000L / fps),        // dwMicroSecPerFrame
      le32Bytes(0), le32Bytes(0), le32Bytes(0), // maxBytesPerSec, padding, flags
      le32Bytes(jpegs.length.toLong),   // dwTotalFrames
      le32Bytes(0), le32Bytes(1),       // initialFrames, streams
      le32Bytes(maxJpeg.toLong),        // suggestedBufferSize
      le32Bytes(w.toLong), le32Bytes(h.toLong),
      le32Bytes(0), le32Bytes(0), le32Bytes(0), le32Bytes(0)) // reserved
    val strh = Array.concat(
      "vids".getBytes("US-ASCII"), "MJPG".getBytes("US-ASCII"),
      le32Bytes(0), le16Bytes(0), le16Bytes(0), // flags, priority, language
      le32Bytes(0),                     // initialFrames
      le32Bytes(1), le32Bytes(fps.toLong), // scale, rate → fps frames/sec
      le32Bytes(0), le32Bytes(jpegs.length.toLong), // start, length
      le32Bytes(maxJpeg.toLong), le32Bytes(0xFFFFFFFFL), // bufSize, quality
      le32Bytes(0),                     // sampleSize
      le16Bytes(0), le16Bytes(0), le16Bytes(w), le16Bytes(h)) // rcFrame
    val strf = Array.concat(            // BITMAPINFOHEADER
      le32Bytes(40), le32Bytes(w.toLong), le32Bytes(h.toLong),
      le16Bytes(1), le16Bytes(24),      // planes, bitcount
      "MJPG".getBytes("US-ASCII"),
      le32Bytes(w.toLong * h * 3),
      le32Bytes(0), le32Bytes(0), le32Bytes(0), le32Bytes(0))
    val hdrl = riffList("hdrl", Array.concat(
      riffChunk("avih", avih),
      riffList("strl", Array.concat(
        riffChunk("strh", strh), riffChunk("strf", strf)))))
    val movi = riffList("movi",
      Array.concat(jpegs.map(riffChunk("00dc", _)): _*))
    val body = Array.concat("AVI ".getBytes("US-ASCII"), hdrl, movi)
    Array.concat("RIFF".getBytes("US-ASCII"),
      le32Bytes(body.length.toLong), body)
  }

  private def scaleImage(img: BufferedImage, width: Int, height: Int): BufferedImage = {
    val out = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try g.drawImage(img, 0, 0, width, height, null)
    finally g.dispose()
    out
  }

  /** 64-bit perceptual difference hash (dHash): luma of a 9×8 rescale,
    * one bit per adjacent-pixel comparison per row. Robust to re-encode,
    * resize and small local edits — the standard near-duplicate IMAGE
    * fingerprint (exact hashes only catch byte-identical files).
    */
  def dHash(img: BufferedImage): Long = {
    val s = scaleImage(img, 9, 8)
    def luma(rgb: Int): Int = {
      val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
      val b = rgb & 0xFF
      (r * 299 + g * 587 + b * 114) / 1000
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        h = (h << 1) | (if (luma(s.getRGB(x, y)) > luma(s.getRGB(x + 1, y))) 1L
          else 0L)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Perceptual hashes for a media table: ImageIO decode → [[dHash]] per
    * row, per-partition so the codec initializes once; undecodable
    * payloads are dropped (they have no perceptual identity). Returns
    * (media_id, dhash).
    */
  def dHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeImage(Option(payload).getOrElse(Array.emptyByteArray))
          .map(img => (id, dHash(img)))
      })
      .toDF("media_id", "dhash")
  }

  /** Near-duplicate image pairs at Hamming distance ≤ `maxHamming` over
    * [[dHashes]]: the 64-bit hash splits into four 16-bit blocks and
    * candidates must share (block index, block value) — the SimHash
    * pigeonhole, guaranteeing 100% recall at distance ≤ 3 — then the
    * exact popcount-of-XOR verifies. Shuffles carry (block, id, hash)
    * triples; all-pairs never forms. Returns (id_a, id_b, hamming),
    * id_a < id_b, deduped across blocks.
    */
  def nearDupImages(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-block pigeonhole guarantees recall only to distance 3: $maxHamming")
    val hashes = dHashes(media)
    val blocks = hashes.select(col("media_id"), col("dhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("blk"),
          shiftrightunsigned(col("dhash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("v"))): _*)).as("b"))
      .select(col("media_id"), col("dhash"),
        col("b.blk").as("blk"), col("b.v").as("v"))
    val a = blocks.select(col("blk"), col("v"),
      col("media_id").as("id_a"), col("dhash").as("ha"))
    val b = blocks.select(col("blk"), col("v"),
      col("media_id").as("id_b"), col("dhash").as("hb"))
    a.join(b, Seq("blk", "v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Resize: decodable image payloads are truly rescaled (ImageIO decode →
    * Graphics2D render at target dims → PNG re-encode, mime updated);
    * non-image payloads keep the deterministic byte-stride downsample of
    * [[resizeStub]]. Per-partition execution so a codec initializes once.
    */
  def resize(media: DataFrame, width: Int, height: Int): Dataset[Row] = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val target = width * height
    media.select(mediaSchema.fieldNames.map(col): _*).mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        decodeImage(payload) match {
          case Some(img) =>
            Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
              "image/png", encodePng(scaleImage(img, width, height)),
              width, height, r.getAs[Any]("duration_ms"))
          case None =>
            val out = new Array[Byte](math.min(target, math.max(payload.length, 1)))
            var i = 0
            while (i < out.length) {
              // Long arithmetic: i * payload.length overflows Int for
              // MB-scale payloads → negative index.
              out(i) = if (payload.isEmpty) 0
                else payload((i.toLong * payload.length / out.length).toInt)
              i += 1
            }
            Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
              r.getAs[String]("mime"), out, width, height, r.getAs[Any]("duration_ms"))
        }
      }
    }(enc)
  }

  /** STUB resize (fallback semantics of [[resize]], kept addressable for
    * non-image pipelines): deterministic byte-stride downsample; payload
    * replaced in place, width/height metadata updated.
    */
  def resizeStub(media: DataFrame, width: Int, height: Int): Dataset[Row] = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val target = width * height
    media.select(mediaSchema.fieldNames.map(col): _*).mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        val out = new Array[Byte](math.min(target, math.max(payload.length, 1)))
        var i = 0
        while (i < out.length) {
          // Long arithmetic: i * payload.length overflows Int for MB-scale
          // payloads (4095 * 1_048_576 > Int.MaxValue) → negative index.
          out(i) = if (payload.isEmpty) 0
            else payload((i.toLong * payload.length / out.length).toInt)
          i += 1
        }
        Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
          r.getAs[String]("mime"), out, width, height, r.getAs[Any]("duration_ms"))
      }
    }(enc)
  }

  /** Frame-sampling plumbing for video-like payloads: split payload into
    * fixed-size "frames" and explode — the partition/row-count shape of real
    * frame extraction (1 row in → N frame rows out), with deterministic
    * fake frame bytes.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = floor(octet_length(col("payload")) / frameBytes).cast("int")
    media
      .withColumn("frame_idx",
        // payloads shorter than one frame yield ZERO rows (explode of the
        // empty array drops them) — not a truncated pseudo-frame
        explode(when(nFrames > 0,
            filter(sequence(lit(0), nFrames - 1), i => i % everyNth === 0))
          .otherwise(array().cast("array<int>"))))
      .select(col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_payload"))
  }

  /** Build a media table from any (id, text) source by packing text bytes as
    * the payload — the test harness's stand-in for real blobs.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit("image").as("modality"),
      lit("application/octet-stream").as("mime"),
      to_binary(col(textCol), lit("utf-8")).as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** Build a media table of REAL PNGs from any (id, text) source: utf-8
    * bytes packed 3-per-RGB-pixel into a fixed-width raster, PNG-encoded
    * per partition. PNG is lossless, so downstream decodes recover exactly
    * these pixels — a deterministic real-codec corpus for exercising the
    * ImageIO path ([[decodeFeatures]], [[resize]]) without binary fixtures.
    */
  def textToPng(df: DataFrame, idCol: String, textCol: String,
                rasterWidth: Int = 32): Dataset[Row] = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("text"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val bytes = Option(r.getAs[String]("text"))
            .getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val img = textRaster(bytes, rasterWidth, 0)
          Row(r.getAs[Long]("media_id"), "image", "image/png", encodePng(img),
            rasterWidth, img.getHeight, null)
        }
      }(enc)
  }

  /** Pack bytes 3-per-RGB-pixel into a `rasterWidth`-wide image of at least
    * `minHeight` rows — the deterministic raster both synthetic-media
    * builders share.
    */
  private def textRaster(bytes: Array[Byte], rasterWidth: Int,
                         minHeight: Int): BufferedImage = {
    val nPix = math.max(1, (bytes.length + 2) / 3)
    val h = math.max(minHeight, (nPix + rasterWidth - 1) / rasterWidth)
    val img = new BufferedImage(rasterWidth, h, BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < rasterWidth * h) {
      def b(i: Int) = if (i < bytes.length) bytes(i) & 0xFF else 0
      img.setRGB(p % rasterWidth, p / rasterWidth,
        (b(p * 3) << 16) | (b(p * 3 + 1) << 8) | b(p * 3 + 2))
      p += 1
    }
    img
  }

  /** Build a media table of REAL MJPEG-AVI clips from any (id, text)
    * source: the text splits into `nFrames` slices, each slice rasterized
    * ([[textRaster]] at a fixed height so all frames share dimensions),
    * JPEG-encoded, and wrapped in a real AVI container — a deterministic
    * real-codec video corpus for the [[decodeVideo]] path, no binary
    * fixtures needed.
    */
  def textToAvi(df: DataFrame, idCol: String, textCol: String,
                nFrames: Int = 4, rasterWidth: Int = 32,
                rasterHeight: Int = 32, fps: Int = 10): Dataset[Row] = {
    require(nFrames > 0)
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("text"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val bytes = Option(r.getAs[String]("text"))
            .getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val per = math.max(1, (bytes.length + nFrames - 1) / nFrames)
          // every frame must share dimensions: clamp a slice to the raster's
          // byte capacity so an oversized text can't grow its frame taller
          val cap = rasterWidth * rasterHeight * 3
          val frames = (0 until nFrames).map { f =>
            val lo = math.min(f * per, bytes.length)
            val hi = math.min(lo + math.min(per, cap), bytes.length)
            textRaster(java.util.Arrays.copyOfRange(bytes, lo, hi),
              rasterWidth, rasterHeight)
          }
          val clip = encodeMjpegAvi(frames, fps)
          Row(r.getAs[Long]("media_id"), "video", "video/x-msvideo", clip,
            rasterWidth, rasterHeight, 1000L * nFrames / fps)
        }
      }(enc)
  }
}
