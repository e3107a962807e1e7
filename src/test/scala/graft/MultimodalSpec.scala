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

  private def makePng(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeFeatures: real PNG decodes through ImageIO to a pixel luma histogram") {
    // half black, half white → histogram mass split between extreme buckets
    val png = makePng(8, 8)((x, _) => if (x < 4) 0x000000 else 0xFFFFFF)
    assert(Multimodal.looksLikeImage(png))
    val f = Multimodal.decodeFeatures(png, dim = 4)
    assert(math.abs(f(0) - 0.5f) < 1e-6 && math.abs(f(3) - 0.5f) < 1e-6)
    assert(f(1) === 0.0f && f(2) === 0.0f)
    // and it is NOT the byte-fake (which would sum payload bytes, not pixels)
    assert(f.toSeq !== Multimodal.fakeDecodeFeatures(png, 4).toSeq)
    // non-image bytes fall back to the fake
    val txt = "not an image".getBytes("UTF-8")
    assert(Multimodal.decodeFeatures(txt, 4).toSeq ===
      Multimodal.fakeDecodeFeatures(txt, 4).toSeq)
    // image magic with corrupt body falls back too, not a crash
    val corrupt = png.take(10)
    assert(Multimodal.decodeFeatures(corrupt, 4).toSeq ===
      Multimodal.fakeDecodeFeatures(corrupt, 4).toSeq)
  }

  test("resize: real PNG payload rescales to target dims and re-encodes decodably") {
    val png = makePng(16, 16)((x, y) => (x * 16) << 16 | (y * 16) << 8)
    val df = Seq((1L, "image", "image/png", png, 16, 16, null.asInstanceOf[java.lang.Long]))
      .toDF("media_id", "modality", "mime", "payload", "width", "height", "duration_ms")
      .withColumn("duration_ms", col("duration_ms").cast("long"))
    val out = Multimodal.resize(df, 4, 4).collect()(0)
    assert(out.getAs[Int]("width") === 4 && out.getAs[Int]("height") === 4)
    assert(out.getAs[String]("mime") === "image/png")
    val rescaled = Multimodal.decodeImage(out.getAs[Array[Byte]]("payload"))
    assert(rescaled.isDefined)
    assert(rescaled.get.getWidth === 4 && rescaled.get.getHeight === 4)
    // non-image payloads take the stub byte-stride path
    val stub = Multimodal.resize(media, 2, 2).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(stub(1L).getAs[Array[Byte]]("payload").length === 4)
  }

  test("textToPng: lossless raster round-trips the text bytes through a real codec") {
    val src = Seq((7L, "the quick brown fox")).toDF("doc_id", "text")
    val row = Multimodal.textToPng(src, "doc_id", "text").collect()(0)
    assert(row.getAs[String]("mime") === "image/png")
    val img = Multimodal.decodeImage(row.getAs[Array[Byte]]("payload")).get
    val bytes = "the quick brown fox".getBytes("UTF-8")
    val recovered = (0 until bytes.length).map { i =>
      val rgb = img.getRGB((i / 3) % img.getWidth, (i / 3) / img.getWidth)
      ((rgb >> (16 - 8 * (i % 3))) & 0xFF).toByte
    }
    assert(recovered === bytes.toSeq)
    // deterministic across runs (bench/verify stability)
    val again = Multimodal.textToPng(src, "doc_id", "text").collect()(0)
    assert(again.getAs[Array[Byte]]("payload").toSeq ===
      row.getAs[Array[Byte]]("payload").toSeq)
  }

  test("decodeVideo: a generated MJPEG-AVI clip parses back frame-exact") {
    // writer → parser round trip on a real container: dimensions and
    // frame timing from the avih header, one movi chunk per frame, each
    // chunk a decodable JPEG of the original dimensions
    val imgs = (0 until 5).map { f =>
      val img = new java.awt.image.BufferedImage(
        16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16)
        img.setRGB(x, y, (f * 40 + x) << 16 | (y * 10) << 8)
      img
    }
    val clipBytes = Multimodal.encodeMjpegAvi(imgs, fps = 5)
    assert(Multimodal.looksLikeAvi(clipBytes))
    val clip = Multimodal.decodeVideo(clipBytes).get
    assert(clip.width === 16 && clip.height === 12)
    assert(clip.frames.length === 5)
    assert(clip.microSecPerFrame === 200000L)
    assert(clip.durationMs === 1000L)
    clip.frames.foreach { fb =>
      val frame = Multimodal.decodeImage(fb).get // MJPEG frame == JPEG
      assert(frame.getWidth === 16 && frame.getHeight === 12)
    }
    // non-AVI and truncated payloads refuse instead of garbage
    assert(Multimodal.decodeVideo("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeVideo(clipBytes.take(20)).isEmpty)
    // malformed chunk sizes must terminate, not loop or walk backwards:
    // (a) negative declared size, (b) size just under 2 GiB (Int overflow)
    for (evil <- Seq(0xFF.toByte, 0x7F.toByte)) {
      val bad = clipBytes.clone()
      bad(16) = 0xFC.toByte; bad(17) = 0xFF.toByte // first subchunk size
      bad(18) = 0xFF.toByte; bad(19) = evil
      val r = Multimodal.decodeVideo(bad) // must return promptly
      assert(r.isEmpty || r.get.frames != null)
    }
  }

  test("video features come from decoded frames, not the byte-hash fallback") {
    val docs = Seq((1L, "a" * 900), (2L, "z" * 900)).toDF("doc_id", "text")
    val avi = Multimodal.textToAvi(docs, "doc_id", "text", nFrames = 3).toDF()
    assert(avi.select("modality").distinct().head().getString(0) === "video")
    val row = avi.where("media_id = 1").head()
    val payload = row.getAs[Array[Byte]]("payload")
    val clip = Multimodal.decodeVideo(payload).get
    // dispatched features == frame-averaged luma histograms, and != the
    // fallback's byte accumulation over the container bytes
    val dispatched = Multimodal.decodeFeatures(payload, dim = 8)
    val direct = Multimodal.videoFeatures(clip, dim = 8).get
    assert(dispatched.toSeq === direct.toSeq)
    assert(dispatched.toSeq !== Multimodal.fakeDecodeFeatures(payload, 8).toSeq)
    // different text → different frames → different features
    val other = Multimodal.decodeFeatures(
      avi.where("media_id = 2").head().getAs[Array[Byte]]("payload"), dim = 8)
    assert(dispatched.toSeq !== other.toSeq)
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

  test("dHash/nearDupImages: identity at 0, small edits near, distinct apart") {
    val base = "the quick brown fox jumps over the lazy dog " * 20
    val texts = Seq(
      (1L, base),
      (2L, base),                       // byte-identical → hamming 0
      (3L, "X" + base.substring(1)),    // one-char edit → tiny hamming
      (4L, Seq.fill(200)("zqw").mkString("_"))) // unrelated content
    val media = Multimodal.textToPng(
      texts.toDF("doc_id", "text"), "doc_id", "text")
    val pairs = Multimodal.nearDupImages(media.toDF(), maxHamming = 3)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming"))).toSeq
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.get((1L, 2L)) === Some(0L), s"identity pair missing: $pairs")
    assert(byPair.contains((1L, 3L)) || byPair.contains((2L, 3L)),
      s"small edit must stay within hamming 3: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated image must not pair: $pairs")
  }

  test("dHash is deterministic and undecodable payloads drop") {
    val media = Multimodal.textToPng(
      Seq((7L, "deterministic hash input " * 30)).toDF("doc_id", "text"),
      "doc_id", "text")
    val h1 = Multimodal.dHashes(media.toDF()).head().getLong(1)
    val h2 = Multimodal.dHashes(media.toDF()).head().getLong(1)
    assert(h1 === h2)
    val junk = Multimodal.fromText(
      Seq((8L, "not an image")).toDF("doc_id", "text"), "doc_id", "text")
    assert(Multimodal.dHashes(junk.toDF()).count() === 0)
  }
}
