package graft.multimodal

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Perceptual hashing: closed-form dHash agreement, brightness/contrast
  * (recolor) and pixel-replication (resize) invariance, and the
  * Hamming-banded pair finder against a brute-force reference.
  */
class ImageHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def grayImage(w: Int, h: Int)(g: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = g(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("dHash matches an independent bit-by-bit computation on the fixture") {
    val grp = 7L; val vr = 2
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ImageHash.fixturePng(grp, vr)))
    def cell(x: Int, y: Int): Int = {
      val base = (((grp + 3) * (5 * x + 11 * y + 7 * x * y + 1)) % 256).toInt
      if (x == 8 && y == vr) (base + 128) % 256 else base
    }
    var want = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (cell(x, y) > cell(x + 1, y)) want |= 1L << (y * 8 + x)
    assert(ImageHash.dHash64(img) === want)
  }

  test("recolor invariance: brightness shift and contrast scale keep the dHash") {
    // values bounded so neither transform wraps or saturates
    def base(x: Int, y: Int): Int = (x * 19 + y * 7) % 100
    val img = grayImage(9, 8)(base)
    val brighter = grayImage(9, 8)((x, y) => base(x, y) + 40)
    val contrast = grayImage(9, 8)((x, y) => base(x, y) * 2)
    val d = ImageHash.dHash64(img)
    assert(ImageHash.dHash64(brighter) === d,
      "a global brightness shift must not change gradient signs")
    assert(ImageHash.dHash64(contrast) === d,
      "a monotone contrast scale must not change gradient signs")
    // aHash survives the brightness shift too (mean shifts with cells)
    assert(ImageHash.aHash64(brighter) === ImageHash.aHash64(img))
  }

  test("resize invariance: k× pixel replication keeps both hashes") {
    def base(x: Int, y: Int): Int = (x * 31 + y * 17 + 5) % 256
    val img = grayImage(9, 8)(base)
    val up3 = grayImage(27, 24)((x, y) => base(x / 3, y / 3))
    assert(ImageHash.dHash64(up3) === ImageHash.dHash64(img))
    val img8 = grayImage(8, 8)(base)
    val up8 = grayImage(32, 32)((x, y) => base(x / 4, y / 4))
    assert(ImageHash.aHash64(up8) === ImageHash.aHash64(img8))
  }

  test("grid smaller than the image aborts loudly") {
    val ex = intercept[IllegalArgumentException] {
      ImageHash.dHash64(grayImage(4, 4)((_, _) => 0))
    }
    assert(ex.getMessage.contains("hash grid"))
  }

  test("hammingPairs ≡ brute force, including exact-dup expansion") {
    // deterministic fingerprints: planted clusters around 40 bases (a
    // few bit flips each) + exact duplicates, mixed with scattered noise
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val rows = (0L until 240L).map { i =>
      val base = mix(i % 40)
      val fp = (i / 40) match {
        case 0 => base                              // the base itself
        case 1 => base ^ 1L                         // hamming 1
        case 2 => base ^ (1L << 63) ^ (1L << 5)     // hamming 2 (sign bit)
        case 3 => base ^ 0x0f0fL                    // hamming 8 — out of bound
        case 4 => base                              // exact dup of the base
        case _ => mix(1000 + i)                     // scattered noise
      }
      (i, fp)
    }
    val df = rows.toDF("id", "fp")
    val got = ImageHash.hammingPairs(df, "id", "fp", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (a, fa) <- rows; (b, fb) <- rows if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got === brute)
    assert(brute.exists(_._3 == 0) && brute.exists(_._3 == 1) &&
      brute.exists(_._3 == 2), "fixture should plant hamming 0, 1 and 2")
  }

  test("deduplicate: variant cluster collapses to min id, singleton keeps itself") {
    val media = Seq(
      Multimodal.MediaRow(5L, "image", ImageHash.fixturePng(3, 0)),
      Multimodal.MediaRow(2L, "image", ImageHash.fixturePng(3, 1)),
      Multimodal.MediaRow(9L, "image", ImageHash.fixturePng(3, 2)),
      Multimodal.MediaRow(7L, "image", ImageHash.fixturePng(42, 1)))
      .toDS()
    val got = ImageHash.deduplicate(media, maxHamming = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(2L) === ((2L, true)))
    assert(got(5L) === ((2L, false)))
    assert(got(9L) === ((2L, false)))
    assert(got(7L) === ((7L, true)))
  }

  test("imageHashes: re-encoded exact copies pair at hamming 0, variants within 2") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", ImageHash.fixturePng(3, 0)),
      Multimodal.MediaRow(2L, "image", ImageHash.fixturePng(3, 0)),
      Multimodal.MediaRow(3L, "image", ImageHash.fixturePng(3, 2)),
      Multimodal.MediaRow(4L, "image", ImageHash.fixturePng(9, 1)))
      .toDS()
    val hashed = ImageHash.imageHashes(media)
    val fps = hashed.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = ImageHash.hammingPairs(hashed, "media_id", "dhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 2 &&
      pairs((1L, 3L)) >= 1)
    // every pair the hashes imply within the bound is present with the
    // right distance, and nothing else (different grps may or may not
    // land inside the bound — the operator must agree with the hashes)
    val ids = fps.keys.toSeq.sorted
    for (a <- ids; b <- ids if a < b) {
      val h = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if (h <= 3) assert(pairs((a, b)) === h)
      else assert(!pairs.contains((a, b)))
    }
  }
}
