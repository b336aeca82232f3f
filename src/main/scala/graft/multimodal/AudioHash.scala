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
    */
  def pcm16Frames(bytes: Array[Byte]): Array[Int] = {
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

  /** Decode audio rows and fingerprint them, partition-local (the
    * [[ImageHash.imageHashes]] shape). Returns `(media_id, afp)`.
    */
  def audioHashes(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        try (r.media_id, energyFingerprint64(pcm16Frames(r.bytes)))
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"undecodable audio payload for media ${r.media_id} " +
              s"(${r.bytes.length} bytes): ${e.getMessage}", e)
        }
      }
    }.toDF("media_id", "afp")
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
  private def wavFromWindowAmps(amp: Int => Int): Array[Byte] = {
    val frames = new Array[Byte](65 * 16 * 2) // mono 16-bit LE
    var w = 0
    while (w < 65) {
      val a = amp(w)
      var j = 0
      while (j < 16) {
        val v = if (j % 2 == 0) a else -a
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
