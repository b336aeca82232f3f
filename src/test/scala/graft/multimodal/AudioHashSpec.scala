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

  test("direct RIFF fast path decodes identically to javax.sound and declines non-PCM16") {
    // the fast path must be byte-identical to the provider path on the
    // canonical fixtures (mono; the WAVs AudioSystem.write emits)
    for (g <- Seq(0L, 7L, 41L); v <- Seq(0, 2)) {
      val bytes = AudioHash.fixtureWav(g, v)
      val fast = AudioHash.wavPcm16Frames(bytes)
      assert(fast.isDefined, "canonical WAV must take the fast path")
      assert(fast.get.toSeq === AudioHash.pcm16Frames(bytes).toSeq)
    }
    // a stereo PCM16 WAV: fast path mixes down exactly like the
    // javax path (write one through AudioSystem to get a real header)
    val stereoPcm = Array.tabulate[Byte](400 * 2 * 2)(i => (i * 7).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(stereoPcm), fmt, 400L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val stereo = out.toByteArray
    val fastStereo = AudioHash.wavPcm16Frames(stereo)
    assert(fastStereo.isDefined)
    assert(fastStereo.get.toSeq === AudioHash.pcm16Frames(stereo).toSeq)
    // non-RIFF payloads decline (and the public path still aborts
    // loudly through the javax fallback's error)
    assert(AudioHash.wavPcm16Frames("FORMxxxxAIFF".getBytes).isEmpty)
    // a truncated data chunk aborts with the RIFF parser's message
    val cut = AudioHash.fixtureWav(0L, 0).dropRight(10)
    val ex = intercept[IllegalArgumentException] {
      AudioHash.wavPcm16Frames(cut)
    }
    assert(ex.getMessage.contains("truncated or corrupt WAV"))
  }

  test("spectral fingerprint separates same-envelope clips the energy hash collides on") {
    // every spectral fixture has constant amplitude → identical energy
    // envelope → the envelope hash collides corpus-wide; the lag-1
    // autocorrelation fingerprint must still separate distinct (a, b)
    // modular patterns and match the closed form R_w = A²(15 − 2⌊15/2^m⌋)
    // m = (a·w + b) mod 3 depends only on (a mod 3, b mod 3), and
    // a ≡ 0 (mod 3) gives a constant sequence (fingerprint 0) for any
    // b — pick the six distinct non-constant residue combos
    val grps = Seq(0L, 1L, 6L, 7L, 12L, 13L)
    val clips = grps.map(g => g -> AudioHash.spectralFixtureWav(g, 0))
    val envFps = clips.map { case (_, b) =>
      AudioHash.energyFingerprint64(AudioHash.pcm16Frames(b)) }
    assert(envFps.distinct.size === 1, "envelope hash must collide")
    val specFps = clips.map { case (g, bytes) =>
      val got = AudioHash.spectralFingerprint64(AudioHash.pcm16Frames(bytes))
      val a = 1 + (g % 6).toInt
      val bb = ((g / 6) % 7).toInt
      def m(w: Int) = (a * w + bb) % 3
      var want = 0L
      for (i <- 0 until 64) if (m(i) > m(i + 1)) want |= 1L << i
      assert(got === want, s"grp $g closed form")
      got
    }
    assert(specFps.distinct.size === grps.size,
      "spectral fingerprints must separate distinct patterns")
    // gain invariance: spectralFixture at 3x gain keeps the fingerprint
    val base = AudioHash.pcm16Frames(clips.head._2)
    assert(AudioHash.spectralFingerprint64(base.map(_ * 3)) ===
      specFps.head)
    // variant perturbs only the last window → within Hamming 1
    val v1 = AudioHash.spectralFingerprint64(AudioHash.pcm16Frames(
      AudioHash.spectralFixtureWav(grps.head, 1)))
    assert(java.lang.Long.bitCount(v1 ^ specFps.head) <= 1)
    // too-short clip aborts loudly
    val ex = intercept[IllegalArgumentException] {
      AudioHash.spectralFingerprint64(new Array[Int](129))
    }
    assert(ex.getMessage.contains("too short"))
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
