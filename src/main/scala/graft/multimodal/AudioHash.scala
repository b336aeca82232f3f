package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** Acoustic fingerprinting + Hamming-banded near-duplicate pairs — the
  * AUDIO arm of the dedup family, completing the text/image/audio
  * triad. A training-data pipeline dedups audio the way it dedups
  * images (re-encoded, re-attenuated, re-containered copies of the
  * same clip), and byte hashing cannot see through a re-encode; the
  * cheap classic is a fingerprint over the signal's ENERGY ENVELOPE:
  *
  *   - split the PCM frames into 65 equal time windows (the box-grid
  *     convention of [[ImageHash.grayGrid]]),
  *   - per-window energy `E_w = Σ |sample|` — exact integer,
  *   - bit `i` set iff `E_i > E_{i+1}` — 64 bits encoding the
  *     envelope's gradient signs, the temporal analog of dHash,
  *     invariant to uniform gain (scaling every sample by k scales
  *     every energy by k — comparisons unchanged) and to container
  *     re-encodes of the same PCM.
  *
  * All arithmetic is exact integer over lossless PCM, so the
  * fingerprint is a pure function of the samples — replayable
  * bit-for-bit by an oracle given a closed-form waveform (the
  * `mm_audio_neardup` gate). Landmark/constellation fingerprints
  * (Wang 2003, the Shazam paper) discriminate harder content; this
  * envelope hash is the exact-arithmetic member of the family, and
  * the banding downstream is fingerprint-agnostic.
  *
  * Near-dup pairs reuse the image path's machinery verbatim:
  * [[ImageHash.hammingPairs]] pigeonhole banding, exact-collapse
  * before banding, and (via [[ImageStorage]], which is hash-column
  * agnostic) the same at-rest layout. 100 TB shape: decode + hash are
  * partition-local — PCM never shuffles, only 8-byte fingerprints do.
  */
object AudioHash {

  /** Decode 16-bit signed PCM (WAV/AIFF/AU — whatever
    * `javax.sound.sampled` recognizes) into per-frame values, channels
    * summed (an exact integer mixdown: gain-invariant downstream, and
    * a mono re-master of a stereo clip keeps its envelope shape).
    *
    * Canonical 16-bit PCM WAV takes a DIRECT from-spec RIFF parse
    * (the Mp4/Hdf5 posture): `AudioSystem.getAudioInputStream` runs a
    * provider lookup that serializes on a global registry, and a
    * 100k-clip decode stage measured ~1.2× parallelism on 32 threads
    * through it — the partition-local decode claim was false in
    * practice until the hot container format stopped taking the lock.
    * Anything the fast path declines (AIFF/AU, compressed or
    * non-16-bit WAV, extensible-format headers) falls back to
    * javax.sound for breadth; both paths produce identical frames.
    */
  def pcm16Frames(bytes: Array[Byte]): Array[Int] =
    wavPcm16Frames(bytes).getOrElse(javaxPcm16Frames(bytes))

  /** Direct RIFF/WAVE parse of plain 16-bit PCM: `RIFF…WAVE`, a
    * `fmt ` chunk with format code 1 (PCM) and 16 bits/sample, and a
    * `data` chunk of little-endian samples. Returns None (fall back)
    * on anything else; aborts loudly only on structurally corrupt
    * chunk sizes.
    */
  private[multimodal] def wavPcm16Frames(
      bytes: Array[Byte]): Option[Array[Int]] = {
    def ascii(o: Int) = new String(bytes, o, 4, "US-ASCII")
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (bytes.length < 44 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
      return None
    var o = 12
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (o + 8 <= bytes.length && (channels < 0 || dataOff < 0)) {
      val id = ascii(o)
      val sz = u32(o + 4)
      require(sz >= 0 && o + 8 + sz <= bytes.length,
        s"RIFF chunk '$id' size $sz exceeds file length ${bytes.length} — " +
          "truncated or corrupt WAV")
      if (id == "fmt ") {
        if (sz < 16) return None
        val fmtCode = u16(o + 8)
        val bits = u16(o + 8 + 14)
        if (fmtCode != 1 || bits != 16) return None // not plain PCM16
        channels = u16(o + 8 + 2)
        if (channels < 1) return None
      } else if (id == "data") {
        dataOff = o + 8
        dataLen = sz.toInt
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      o += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (channels < 0 || dataOff < 0) return None
    val n = dataLen / (2 * channels)
    Some(Array.tabulate(n) { f =>
      var s = 0
      var c = 0
      while (c < channels) {
        val off = dataOff + (f * channels + c) * 2
        s += (bytes(off + 1).toInt << 8) | (bytes(off) & 0xff)
        c += 1
      }
      s
    })
  }

  private def javaxPcm16Frames(bytes: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16,
      s"audio fingerprinting needs 16-bit signed PCM, got " +
        s"${fmt.getEncoding}/${fmt.getSampleSizeInBits}-bit")
    val data = ais.readAllBytes()
    val ch = fmt.getChannels
    val big = fmt.isBigEndian
    val n = data.length / (2 * ch)
    Array.tabulate(n) { f =>
      var s = 0
      var c = 0
      while (c < ch) {
        val off = (f * ch + c) * 2
        val v =
          if (big) (data(off).toInt << 8) | (data(off + 1) & 0xff)
          else (data(off + 1).toInt << 8) | (data(off) & 0xff)
        s += v
        c += 1
      }
      s
    }
  }

  /** 64-bit energy-envelope fingerprint: 65 box windows over the frame
    * sequence (window w covers frames [⌊wN/65⌋, ⌊(w+1)N/65⌋) — the
    * [[ImageHash.grayGrid]] boxing, exact under k× frame replication),
    * bit `i` = `E_i > E_{i+1}`. Bit 63 is the sign bit — an ordinary
    * two's-complement long, like the image hashes.
    */
  def energyFingerprint64(frames: Array[Int]): Long = {
    val n = frames.length
    require(n >= 65,
      s"clip too short for the 65-window envelope: $n frames")
    val e = new Array[Long](65)
    var w = 0
    while (w < 65) {
      // long box bounds: Int `w * n` wraps past ~33M frames (a 12-min
      // 44.1 kHz clip) and would index negative
      val i0 = (w.toLong * n / 65).toInt
      val i1 = ((w + 1).toLong * n / 65).toInt
      var sum = 0L
      var i = i0
      while (i < i1) { sum += math.abs(frames(i).toLong); i += 1 }
      e(w) = sum
      w += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (e(i) > e(i + 1)) fp |= 1L << i
      i += 1
    }
    fp
  }

  /** 64-bit SPECTRAL fingerprint: per box window, the lag-1
    * AUTOCORRELATION `R_w = Σ x[i]·x[i+1]` (both indices inside the
    * window), bit `i` = `R_i > R_{i+1}` — exact integer throughout.
    *
    * Why a second hash: the energy envelope sees only `Σ|x|` per
    * window, so any two clips with the same loudness contour collide
    * regardless of content. Lag-1 autocorrelation is a first
    * spectral-moment proxy (low-frequency content drives it positive,
    * Nyquist-heavy content negative — the discrete version of the
    * spectral centroid's sign structure), so same-envelope clips with
    * different frequency content now separate
    * ([[spectralFixtureWav]] + AudioHashSpec pin exactly that).
    * Uniform gain scales every `R` by k² — comparisons unchanged, the
    * same invariance as the envelope. Overflow headroom: |x| ≤ 2¹⁸
    * after an 8-channel mixdown, so each product ≤ 2³⁶ and a
    * 33M-frame window sum stays ≤ 2⁵⁶, inside Long.
    */
  def spectralFingerprint64(frames: Array[Int]): Long = {
    val n = frames.length
    require(n >= 130,
      s"clip too short for the 65-window spectral fingerprint: $n frames")
    val r = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val i0 = (w.toLong * n / 65).toInt
      val i1 = ((w + 1).toLong * n / 65).toInt
      var sum = 0L
      var i = i0
      while (i < i1 - 1) { sum += frames(i).toLong * frames(i + 1); i += 1 }
      r(w) = sum
      w += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (r(i) > r(i + 1)) fp |= 1L << i
      i += 1
    }
    fp
  }

  /** Decode audio rows and SPECTRALLY fingerprint them — the
    * [[audioHashes]] shape with [[spectralFingerprint64]]. Returns
    * `(media_id, sfp)`; feed [[spectralNeardupPairs]] or the at-rest
    * [[ImageStorage]] with `fpCol = "sfp"` — the banding downstream
    * is fingerprint-agnostic and unchanged.
    */
  def spectralHashes(media: Dataset[Multimodal.MediaRow]): DataFrame =
    hashesWith(media, "sfp", spectralFingerprint64)

  /** [[neardupPairs]] on the spectral fingerprint. */
  def spectralNeardupPairs(hashes: DataFrame,
                           maxHamming: Int = 3): DataFrame =
    ImageHash.hammingPairs(hashes, "media_id", "sfp", maxHamming)

  /** Decode audio rows and fingerprint them, partition-local (the
    * [[ImageHash.imageHashes]] shape). Returns `(media_id, afp)`.
    */
  def audioHashes(media: Dataset[Multimodal.MediaRow]): DataFrame =
    hashesWith(media, "afp", energyFingerprint64)

  /** Shared decode + fingerprint pass: partition-local, one row per
    * clip, failures wrapped with the media id so an undecodable
    * payload names itself.
    */
  private def hashesWith(media: Dataset[Multimodal.MediaRow],
                         outCol: String,
                         fp: Array[Int] => Long): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        try (r.media_id, fp(pcm16Frames(r.bytes)))
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"undecodable audio payload for media ${r.media_id} " +
              s"(${r.bytes.length} bytes): ${e.getMessage}", e)
        }
      }
    }.toDF("media_id", outCol)
  }

  /** All media pairs within `maxHamming` on the envelope fingerprint —
    * [[ImageHash.hammingPairs]] applied to the audio hash column; same
    * contract `(id_a < id_b, hamming)`, same exact-collapse banding.
    */
  def neardupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    ImageHash.hammingPairs(hashes, "media_id", "afp", maxHamming)

  /** End-to-end acoustic deduplication — the audio twin of
    * [[ImageHash.deduplicate]]: decode+fingerprint partition-local,
    * Hamming-banded near-dup pairs, connected components (shared
    * large-star/small-star loop, `checkpointDir` per the
    * [[graft.core.Durable]] policy), min-id canonical per cluster.
    * Returns every media row's verdict `(media_id, cluster, kept)`;
    * transitive closure is deliberate, tighten `maxHamming` rather
    * than fighting chains.
    */
  def deduplicate(media: Dataset[Multimodal.MediaRow], maxHamming: Int = 3,
                  checkpointDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val hashed = audioHashes(media)
    val pairs = neardupPairs(hashed, maxHamming)
      .select(col("id_a"), col("id_b"))
    val comps = graft.dedup.Dedup.connectedComponents(pairs,
      checkpointDir = checkpointDir)
    hashed.select(col("media_id"))
      .join(comps.withColumnRenamed("id", "media_id"), Seq("media_id"),
        "left")
      .select(col("media_id"),
        coalesce(col("canonical_id"), col("media_id")).as("cluster"))
      .withColumn("kept", col("media_id") === col("cluster"))
  }

  /** Closed-form square-wave WAV fixture for the oracle gate: 65
    * windows × 16 frames of a mono square wave, window `w` at
    * amplitude `(1 + (a·w + b + [w = 64] · variant) mod 7) · 1000`
    * with `a = 1 + grp mod 6` (adjacent windows always differ) and
    * `b = (grp/6) mod 7` — the [[ImageHash.fixtureMjpegMp4]] modular
    * family, transposed to time. PCM is lossless, so `E_w =
    * 16 · A_w` exactly and every comparison replays in SQL from the
    * modular form alone. The variant perturbs only the LAST window,
    * which feeds exactly one comparison (bit 63) — planted
    * near-duplicates within Hamming 1.
    */
  def fixtureWav(grp: Long, variant: Int): Array[Byte] =
    wavFromWindowAmps(w => (1 + ((1 + (grp % 6).toInt) * w +
      ((grp / 6) % 7).toInt + (if (w == 64) variant else 0)) % 7) * 1000)

  /** Bench-scale fixture: same square-wave construction as
    * [[fixtureWav]] but with a 97-value amplitude alphabet keyed by a
    * full multiplicative mix of `cluster`, so distinct clusters get
    * distinct envelopes. fixtureWav's 42-pattern space is deliberately
    * tiny for oracle replay; at 100k clips it would collapse into
    * ~600-member exact-fingerprint groups and the pair set would go
    * quadratic — this variant keeps clusters apart (64 pseudo-random
    * gradient-sign bits, cross-cluster Hamming ~32) while the variant
    * still perturbs only the last window (planted near-duplicates
    * within Hamming 1 inside a cluster).
    */
  def benchWav(cluster: Long, variant: Int): Array[Byte] =
    wavFromWindowAmps(w => (1 + (((cluster * 131 + w * 17 +
      (if (w == 64) variant * 23 else 0)) % 97 + 97) % 97).toInt) * 300)

  /** Mono 16-bit LE square-wave WAV: 65 windows × 16 frames, window
    * `w` alternating ±`amp(w)`.
    */
  private def wavFromWindowAmps(amp: Int => Int): Array[Byte] =
    wavFromSampleFn((w, j) => if (j % 2 == 0) amp(w) else -amp(w))

  /** Closed-form SPECTRAL fixture for the `mm_audio_spectral_neardup`
    * gate: constant amplitude 1000 in EVERY window (so the energy
    * envelope of every doc is identical — the collision the spectral
    * hash exists to break), but window `w` carries a square wave of
    * half-period `2^m` with `m = (a·w + b + [w = 64]·variant) mod 3`,
    * the [[fixtureWav]] modular family moved from amplitude to
    * FREQUENCY. Within a 16-frame window the lag-1 products are
    * `+A²` inside a half-period run and `−A²` at each sign flip
    * (⌊15/2^m⌋ flips), so `R_w = A²·(15 − 2⌊15/2^m⌋)` — strictly
    * increasing in `m`, and every fingerprint bit replays in SQL as
    * `m_i > m_{i+1}`. The variant perturbs only the last window
    * (bit 63) — planted near-duplicates within Hamming 1.
    */
  def spectralFixtureWav(grp: Long, variant: Int): Array[Byte] = {
    val a = 1 + (grp % 6).toInt
    val b = ((grp / 6) % 7).toInt
    wavFromSampleFn { (w, j) =>
      val h = 1 << ((a * w + b + (if (w == 64) variant else 0)) % 3)
      if ((j / h) % 2 == 0) 1000 else -1000
    }
  }

  /** Mono 16-bit LE WAV of 65 windows × 16 frames, sample (w, j) from
    * `value(window, frameInWindow)`.
    */
  private def wavFromSampleFn(value: (Int, Int) => Int): Array[Byte] = {
    val frames = new Array[Byte](65 * 16 * 2) // mono 16-bit LE
    var w = 0
    while (w < 65) {
      var j = 0
      while (j < 16) {
        val v = value(w, j)
        val off = (w * 16 + j) * 2
        frames(off) = (v & 0xff).toByte
        frames(off + 1) = ((v >> 8) & 0xff).toByte
        j += 1
      }
      w += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(frames), fmt, 65L * 16)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
