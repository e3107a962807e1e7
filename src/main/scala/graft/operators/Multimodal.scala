package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns beside typed metadata, mirroring how a 100 TB
  * training-data lake stores media (bytes in parquet/blob store, features
  * extracted in-pipeline).
  *
  * The decode step is STUBBED — this container has no image/audio codecs —
  * with a deterministic fake ([[fakeDecodeFeatures]]) so every piece of
  * Spark-side plumbing (schema, batched `mapPartitions`, partition sizing,
  * feature schema) is real and tested; swap the stub for a JNI/codec call
  * in production. Batching per partition matters at scale: the codec is
  * amortized per-partition (like an Arrow batch UDF), not per-row.
  */
object Multimodal {

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

  /** STUB decoder: deterministic features derived from the payload bytes.
    * Stands in for `decode → resize → embed`; same signature and batch
    * shape as a real codec-backed implementation.
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

  /** Metadata pass — pure expressions, no decode: byte size + checksum per
    * payload. Runs entirely scan-side.
    */
  def describe(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("modality"),
      octet_length(col("payload")).as("n_bytes"),
      crc32(col("payload")).as("checksum"))

  /** Feature extraction over batched partitions. `mapPartitions` (not a
    * per-row UDF) so a real decoder can init once per partition/batch —
    * the JVM analog of a Pandas-batch UDF. Output is a typed Dataset with a
    * fixed-width feature vector ready for [[Similarity]] / [[Dedup]].
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
          feature = fakeDecodeFeatures(bytes, dim))
      }
    }
  }

  /** STUB resize: deterministic byte-stride downsample standing in for
    * `decode → resize → re-encode`. The plumbing is the real part: payload
    * replaced in place, width/height metadata updated, executed per
    * partition so a real codec initializes once.
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
}
