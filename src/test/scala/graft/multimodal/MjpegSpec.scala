package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The MJPEG-in-MP4 lane: sample addressing (stsz+stsc+stco) must
  * round-trip byte-exact, and keyframe dHashes must survive the lossy
  * codec to match the fixture's modular closed form.
  */
class MjpegSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The fixture frame's intended dHash, from the modular closed form
    * (no decode) — the same arithmetic the DuckDB oracle replays.
    */
  private def closedFormDhash(grp: Long, j: Int): Long = {
    val a = 1 + (grp % 6).toInt
    val b = ((grp / 6) % 7).toInt
    var fp = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if ((a * x + b * y + j) % 7 > (a * (x + 1) + b * y + j) % 7)
        fp |= 1L << (y * 8 + x)
    fp
  }

  test("writeWithSamples → sampleRanges round-trips exact payload bytes") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6))
    val mp4 = Mp4.writeWithSamples(72, 64, 1000L, 120L, "jpeg", frames)
    val ranges = Mp4.sampleRanges(mp4)
    assert(ranges.map(_._2) === Seq(3, 1, 2))
    val got = ranges.map { case (off, sz) =>
      mp4.slice(off.toInt, off.toInt + sz).toSeq }
    assert(got === frames.map(_.toSeq))
    // metadata stays intact alongside the payloads
    val meta = Mp4.parseMeta(mp4)
    assert(meta.codec === "jpeg" && meta.nSamples === 3L &&
      meta.sampleBytes === 6L && meta.widthPx === 72)
  }

  test("payload-less containers have no sample ranges") {
    val mp4 = Mp4.write(640, 480, 1000L, 5000L)
    assert(Mp4.sampleRanges(mp4) === Seq.empty)
  }

  test("a truncated container aborts with a precise error") {
    val mp4 = Mp4.writeWithSamples(72, 64, 1000L, 120L, "jpeg",
      Seq(Array.fill[Byte](32)(7)))
    val cut = mp4.take(mp4.length - 16)
    val ex = intercept[IllegalArgumentException](Mp4.sampleRanges(cut))
    assert(ex.getMessage.toLowerCase.contains("truncat"))
  }

  test("keyframe dHashes survive the lossy JPEG codec bit-for-bit") {
    for (grp <- Seq(0L, 7L, 23L, 41L); nf <- Seq(1, 3)) {
      val mp4 = ImageHash.fixtureMjpegMp4(grp, nf)
      val ranges = Mp4.sampleRanges(mp4)
      assert(ranges.length === nf)
      ranges.zipWithIndex.foreach { case ((off, sz), j) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(mp4, off.toInt, sz))
        assert(img != null, s"frame $j of grp $grp undecodable")
        assert(ImageHash.dHash64(img) === closedFormDhash(grp, j),
          s"grp $grp frame $j")
      }
    }
  }

  test("videoNearDupPairs ≡ brute cross-video frame join; threshold and guards hold") {
    import spark.implicits._
    // 12 videos over 4 grps: same-grp videos share every frame pattern
    val media = (0L until 12L).map { id =>
      Multimodal.MediaRow(id, "video",
        ImageHash.fixtureMjpegMp4(id % 4, 2 + (id % 3).toInt))
    }.toDS()
    val hashes = ImageHash.videoKeyframeHashes(media)
      .select("media_id", "frame_idx", "dhash").localCheckpoint()
    val got = ImageHash.videoNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    val fps = hashes.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val brute = (for {
      (va, _, fa) <- fps; (vb, _, fb) <- fps
      if va < vb
      h = java.lang.Long.bitCount(fa ^ fb)
      if h <= 3
    } yield ((va, vb), h)).groupBy(_._1).view
      .mapValues(xs => (xs.size.toLong, xs.map(_._2).min)).toMap
    assert(got === brute)
    assert(got.nonEmpty)
    // same-grp pairs share identical frame patterns → min hamming 0
    assert(got((0L, 4L))._2 === 0)
    // a high threshold filters pairs, never invents them
    val thresh = ImageHash.videoNearDupPairs(hashes, maxHamming = 3,
        minSharedFrames = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(thresh === brute.filter(_._2._1 >= 5).keySet)
    // packing guards abort loudly
    val bad = Seq((-1L, 0, 42L)).toDF("media_id", "frame_idx", "dhash")
    val ex = intercept[Exception] {
      ImageHash.videoNearDupPairs(bad).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(ex).exists(m => m != null &&
      m.contains("packed-id ordering")))
  }

  test("videoKeyframeHashes: distributed hashes match the closed form; frameStep strides") {
    import spark.implicits._
    val media = Seq(0L, 5L, 17L).map { grp =>
      Multimodal.MediaRow(grp, "video", ImageHash.fixtureMjpegMp4(grp, 4))
    }.toDS()
    val all = ImageHash.videoKeyframeHashes(media)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(all.size === 12)
    all.foreach { case ((grp, j), h) =>
      assert(h === closedFormDhash(grp, j), s"grp $grp frame $j") }
    val strided = ImageHash.videoKeyframeHashes(media, frameStep = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(strided === Set(0L, 5L, 17L).flatMap(g => Seq(g -> 0, g -> 2)))
  }
}
