package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AudioHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def closedFormAfp(grp: Long, vr: Int): Long = {
    val a = 1 + (grp % 6).toInt
    val b = ((grp / 6) % 7).toInt
    def amp(w: Int) = 1 + (a * w + b + (if (w == 64) vr else 0)) % 7
    var fp = 0L
    for (i <- 0 until 64) if (amp(i) > amp(i + 1)) fp |= 1L << i
    fp
  }

  test("fixture fingerprints match the modular closed form bit-for-bit") {
    for (grp <- Seq(0L, 5L, 41L, 97L); vr <- Seq(0, 3)) {
      val fp = AudioHash.energyFingerprint64(
        AudioHash.pcm16Frames(AudioHash.fixtureWav(grp, vr)))
      assert(fp === closedFormAfp(grp, vr), s"grp $grp vr $vr")
    }
  }

  test("gain invariance: halving every sample keeps the fingerprint") {
    val frames = AudioHash.pcm16Frames(AudioHash.fixtureWav(7L, 1))
    val fp = AudioHash.energyFingerprint64(frames)
    assert(AudioHash.energyFingerprint64(frames.map(_ / 2)) === fp)
    assert(AudioHash.energyFingerprint64(frames.map(_ * 2)) === fp)
  }

  test("stereo mixdown: a dual-mono re-master keeps the fingerprint") {
    val grp = 23L
    val mono = AudioHash.pcm16Frames(AudioHash.fixtureWav(grp, 0))
    // re-encode the same signal as 2-channel (both channels identical)
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val data = new Array[Byte](mono.length * 4)
    mono.zipWithIndex.foreach { case (v, i) =>
      for (c <- 0 to 1) {
        data((i * 2 + c) * 2) = (v & 0xff).toByte
        data((i * 2 + c) * 2 + 1) = ((v >> 8) & 0xff).toByte
      }
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, mono.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val stereo = AudioHash.pcm16Frames(out.toByteArray)
    assert(AudioHash.energyFingerprint64(stereo) ===
      AudioHash.energyFingerprint64(mono))
  }

  test("variants of one grp sit within Hamming 1; clip too short aborts") {
    val base = AudioHash.energyFingerprint64(
      AudioHash.pcm16Frames(AudioHash.fixtureWav(11L, 0)))
    for (vr <- 1 to 3) {
      val v = AudioHash.energyFingerprint64(
        AudioHash.pcm16Frames(AudioHash.fixtureWav(11L, vr)))
      assert(java.lang.Long.bitCount(base ^ v) <= 1, s"vr $vr")
    }
    val ex = intercept[IllegalArgumentException] {
      AudioHash.energyFingerprint64(Array.fill(64)(1))
    }
    assert(ex.getMessage.contains("too short"))
  }

  test("audio fingerprints ride the at-rest hash layout unchanged (triad at rest)") {
    import spark.implicits._
    val media = (0L until 80L).map { id =>
      Multimodal.MediaRow(id, "audio",
        AudioHash.fixtureWav(id % 20, (id / 20 % 4).toInt))
    }.toDS()
    val hashed = AudioHash.audioHashes(media).localCheckpoint()
    val path = java.nio.file.Files
      .createTempDirectory("graft-audiostore").toString + "/afps"
    ImageStorage.writeBucketed(hashed, "audio_rest_pairs", path,
      maxHamming = 3, nBuckets = 4, fpCol = "afp")
    try {
      val atRest = ImageStorage.pairs(spark, "audio_rest_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val adHoc = AudioHash.neardupPairs(hashed, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(atRest === adHoc)
      assert(atRest.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS audio_rest_pairs")
      spark.sql(s"DROP TABLE IF EXISTS " +
        ImageStorage.membersTable("audio_rest_pairs"))
    }
  }

  test("distributed audioHashes + neardupPairs ≡ brute Hamming join") {
    import spark.implicits._
    val media = (0L until 120L).map { id =>
      Multimodal.MediaRow(id, "audio",
        AudioHash.fixtureWav(id % 30, (id / 30 % 4).toInt))
    }.toDS()
    val hashed = AudioHash.audioHashes(media).localCheckpoint()
    val got = AudioHash.neardupPairs(hashed, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fps = hashed.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb)
      if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }
}
