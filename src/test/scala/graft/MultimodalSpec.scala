package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "hello world"), (2L, ""), (3L, "spark")).toDF("doc_id", "text"),
    "doc_id", "text")

  test("fromText builds the canonical media schema") {
    assert(media.schema.fieldNames.toSeq ===
      Multimodal.mediaSchema.fieldNames.toSeq)
  }

  test("describe: scan-side byte size + checksum") {
    val got = Multimodal.describe(media).orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getInt(2).toLong))
    assert(got.toSeq === Seq((1L, 11L), (2L, 0L), (3L, 5L)))
  }

  test("extractFeatures: deterministic stub features with real batch plumbing") {
    val f = Multimodal.extractFeatures(media, dim = 4).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).n_bytes === 11L)
    assert(f(1L).feature.length === 4)
    // deterministic: same payload → same feature
    val again = Multimodal.extractFeatures(media, dim = 4).collect()
      .map(x => x.media_id -> x.feature.toSeq).toMap
    assert(again(1L) === f(1L).feature.toSeq)
    // checksum matches CRC32 of payload bytes
    val crc = new java.util.zip.CRC32()
    crc.update("hello world".getBytes("UTF-8"))
    assert(f(1L).checksum === crc.getValue)
  }

  test("resizeStub: payload downsampled, metadata updated, schema stable") {
    val out = Multimodal.resizeStub(media, 2, 2).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Array[Byte]]("payload").length === 4)
    assert(out(1L).getAs[Int]("width") === 2 && out(1L).getAs[Int]("height") === 2)
    // deterministic
    val again = Multimodal.resizeStub(media, 2, 2).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("payload").toSeq).toMap
    assert(again(1L) === out(1L).getAs[Array[Byte]]("payload").toSeq)
  }

  test("sampleFrames: 1 row in → N frame rows out, fixed-size slices") {
    val frames = Multimodal.sampleFrames(
        media.where("media_id = 1"), frameBytes = 4, everyNth = 1)
      .orderBy("frame_idx").collect()
    assert(frames.length === 2) // 11 bytes → 2 full 4-byte frames
    assert(new String(frames(0).getAs[Array[Byte]]("frame_payload")) === "hell")
    assert(new String(frames(1).getAs[Array[Byte]]("frame_payload")) === "o wo")
    // payloads shorter than one frame (incl. empty) yield zero rows
    val shorter = Multimodal.sampleFrames(
      media.where("media_id IN (2, 3)"), frameBytes = 8, everyNth = 1)
    assert(shorter.count() === 0)
  }
}
