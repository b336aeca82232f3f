package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = Seq(
    Multimodal.MediaRow(1L, "image", "fake image bytes".getBytes("UTF-8")),
    Multimodal.MediaRow(2L, "audio", ("a" * 640).getBytes("UTF-8")),
    Multimodal.MediaRow(3L, "video", ("v" * 4096).getBytes("UTF-8"))
  ).toDS()

  test("ImageIoCodec decodes real PNG and BMP rasters") {
    val png = Multimodal.pngBytes(33, 21, seed = 7L)
    val m = Multimodal.ImageIoCodec.decode("image", png)
    assert((m.width, m.height, m.channels, m.nFrames) === ((33, 21, 3, 1)))
    assert(m.byteLen === png.length.toLong)
    // second container: BMP through the same javax.imageio path
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    val bmp = Multimodal.ImageIoCodec.decode("image", out.toByteArray)
    assert((bmp.width, bmp.height, bmp.channels) === ((33, 21, 3)))
    // payloads no reader recognizes must fail loudly, not fake metadata
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decode("image", "not an image".getBytes)
    }
  }

  test("ImageIoCodec header-parses real WAV and AIFF audio containers") {
    val wav = Multimodal.wavBytes(22050, 2, 480, seed = 9L)
    val m = Multimodal.ImageIoCodec.decode("audio", wav)
    assert((m.sampleRateHz, m.channels, m.nFrames) === ((22050, 2, 480)))
    assert(m.byteLen === wav.length.toLong)
    assert(m.width === 0 && m.height === 0)
    // second container: AIFF through the same javax.sound path
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val pcm = new Array[Byte](2 * 100)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 100L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    val aiff = Multimodal.ImageIoCodec.decode("audio", out.toByteArray)
    assert((aiff.sampleRateHz, aiff.channels, aiff.nFrames) === ((8000, 1, 100)))
    // payloads no reader recognizes must fail loudly, not fake metadata
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decode("audio", "not audio at all".getBytes)
    }
  }

  test("decode is deterministic and preserves byte lengths") {
    val a = Multimodal.decode(media, Multimodal.StubCodec).collect().sortBy(_.media_id)
    val b = Multimodal.decode(media, Multimodal.StubCodec).collect().sortBy(_.media_id)
    assert(a.map(_.byteLen).toSeq === Seq(16L, 640L, 4096L))
    assert(a.map(r => (r.media_id, r.width, r.height, r.nFrames)).toSeq ===
           b.map(r => (r.media_id, r.width, r.height, r.nFrames)).toSeq)
    val img = a.find(_.kind == "image").get
    assert(img.channels === 3 && img.width >= 64 && img.height >= 64)
    val aud = a.find(_.kind == "audio").get
    assert(aud.sampleRateHz === 16000 && aud.nFrames === 20)
  }

  test("feature vectors have fixed width and fold all bytes") {
    val feats = Multimodal.decode(media, Multimodal.StubCodec).collect().map(_.features)
    assert(feats.forall(_.length === 8))
    assert(feats.forall(_.sum > 0f))
  }

  test("frame sampling explodes only video rows at the given stride") {
    val dec = Multimodal.decode(media, Multimodal.StubCodec).toDF()
    val frames = Multimodal.sampleFrames(dec, stride = 2)
      .groupBy("media_id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(frames.length === 1)
    val (id, n, mx) = frames.head
    assert(id === 3L)
    assert(n === 2L && mx === 2) // nFrames=4 → idx 0, 2
  }

  test("patch plan: ceil grid, token count, edge padding") {
    import spark.implicits._
    val imgs = Seq((1L, 64, 64), (2L, 65, 48), (3L, 1, 1))
      .toDF("media_id", "width", "height")
    val got = Multimodal.patchPlan(imgs, patch = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7))).toMap
    assert(got(1L) === ((4, 4, 16, 0, 0)))   // exact fit
    assert(got(2L) === ((5, 3, 15, 15, 0)))  // 65→5 cols, 15px pad
    assert(got(3L) === ((1, 1, 1, 15, 15)))  // tiny image, one padded patch
  }

  test("resize plan computes scales for image rows only") {
    val dec = Multimodal.decode(media, Multimodal.StubCodec).toDF()
    val plan = Multimodal.resizePlan(dec, 224, 224).collect()
    assert(plan.length === 1)
    val r = plan.head
    assert(r.getAs[Long]("media_id") === 1L)
    assert(math.abs(r.getAs[Double]("scale_x") -
      r.getAs[Int]("width").toDouble / 224) < 1e-12)
  }
}
