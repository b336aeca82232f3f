package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables.table
import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing. The harness has no binary tables, so
  * payloads are synthesized: text bytes stand in for opaque media in the
  * hygiene checks, real PNG bytes (JDK imageio) feed the image decode
  * path, and real PCM WAV bytes (JDK javax.sound) feed the audio decode
  * path — all four queries are oracle-checked.
  */
object MultimodalPack extends QueryPack {
  // at-rest gates use QueryPack.gateCorpus for unique, shutdown-hook
  // reclaimed corpus homes

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload hygiene: byte length + SHA-256 digest survive the
    // string→binary boundary identically on both engines.
    "mm_binary_meta" -> ((s, dir) => {
      table(s, dir, "documents")
        .withColumn("bytes", encode(col("text"), "UTF-8"))
        .select(col("doc_id"), length(col("bytes")).as("byte_len"),
          sha2(col("bytes"), 256).as("sha"))
        .orderBy("doc_id")
    }),

    // ViT patch-grid plan: image dims derived deterministically from the
    // byte length IN THE QUERY (both engines compute them identically),
    // then the ceil-division patch layout is exact integer arithmetic.
    "mm_patch_plan" -> ((s, dir) => {
      val bl = length(encode(col("text"), "UTF-8"))
      val imgs = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          (lit(64) + pmod(bl, lit(960))).as("width"),
          (lit(64) + pmod(bl * 7, lit(540))).as("height"))
      Multimodal.patchPlan(imgs, patch = 16)
        .orderBy("media_id")
    }),

    // Patch-BUDGET batch packing — the vision-language twin of token
    // bin packing: images must stay whole, a training batch holds a
    // fixed ViT patch budget, so batching IS bin packing over
    // patchPlan's n_patches. Pure composition of two green-gated
    // operators; the oracle replays the closed-form patch counts
    // through the same recursive FFD.
    "mm_patch_pack" -> ((s, dir) => {
      val bl = length(encode(col("text"), "UTF-8"))
      val imgs = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          (lit(64) + pmod(bl, lit(960))).as("width"),
          (lit(64) + pmod(bl * 7, lit(540))).as("height"))
      graft.text.BinPacking.packBinsFFD(
          Multimodal.patchPlan(imgs, patch = 16),
          "media_id", "n_patches", capacity = 4096L, numShards = 8)
        .select("media_id", "n_patches", "shard", "bin")
        .orderBy("media_id")
    }),

    // Real decode through the partition-local batch transform: PNG
    // payloads are synthesized per doc with JDK imageio at dimensions
    // derived from the text byte length, then decoded back by
    // ImageIoCodec — the oracle checks the decoded raster dims against
    // the closed-form dimension formulas (and 3 channels: TYPE_3BYTE_BGR
    // has no alpha), so a decoder that misreads IHDR fails the gate.
    "mm_decode" -> ((s, dir) => {
      import s.implicits._
      val bl = length(encode(col("text"), "UTF-8"))
      val dims = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        (lit(8) + pmod(bl, lit(24))).cast("int").as("w"),
        (lit(8) + pmod(bl * 7, lit(16))).cast("int").as("h"))
      val mkPng = udf((id: Long, w: Int, h: Int) =>
        Multimodal.pngBytes(w, h, seed = id))
      val media = dims.select(col("media_id"), lit("image").as("kind"),
        mkPng(col("media_id"), col("w"), col("h")).as("bytes"))
        .as[Multimodal.MediaRow]
      Multimodal.decode(media, Multimodal.ImageIoCodec).toDF()
        .select(col("media_id"), col("width"), col("height"), col("channels"))
        .orderBy("media_id")
    }),

    // Real audio header decode: PCM WAV payloads are synthesized per doc
    // with javax.sound at (sample rate, channels, frame count) derived
    // from the text byte length, then header-parsed back by ImageIoCodec's
    // audio arm — the oracle checks the parsed format fields against the
    // closed-form parameter formulas, so a reader that misparses the fmt
    // chunk (rate, channel count) or the data-chunk length (frames) fails
    // the gate.
    "mm_audio_meta" -> ((s, dir) => {
      import s.implicits._
      val bl = length(encode(col("text"), "UTF-8"))
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        element_at(
          array(lit(8000), lit(16000), lit(22050), lit(44100)),
          (pmod(bl, lit(4)) + 1).cast("int")).as("sr"),
        (lit(1) + pmod(bl, lit(2))).cast("int").as("ch"),
        (lit(64) + pmod(bl * 3, lit(256))).cast("int").as("nf"))
      val mkWav = udf((id: Long, sr: Int, ch: Int, nf: Int) =>
        Multimodal.wavBytes(sr, ch, nf, seed = id))
      val media = params.select(col("media_id"), lit("audio").as("kind"),
        mkWav(col("media_id"), col("sr"), col("ch"), col("nf")).as("bytes"))
        .as[Multimodal.MediaRow]
      Multimodal.decode(media, Multimodal.ImageIoCodec).toDF()
        .select(col("media_id"),
          col("sampleRateHz").as("sample_rate_hz"),
          col("channels"), col("nFrames").as("n_frames"))
        .orderBy("media_id")
    }),

    // Perceptual-hash image near-dup: per-doc 9×8 PNGs are synthesized
    // on executors from a closed-form luminance grid (grp plants ~5-doc
    // clusters; var perturbs only the last column, which feeds exactly
    // one dHash comparison, so cluster members sit within Hamming 2),
    // decoded + dHashed for real (JDK imageio → box resample → exact
    // integer luminance), then paired by the pigeonhole Hamming banding.
    // The oracle recomputes the dHash BIT-FOR-BIT from the same closed
    // form and replays the banding in SQL — a hash that misreads pixels,
    // a resampler that drifts off the floor-mean contract, or a band
    // split that misses a chunk all fail the gate.
    "mm_phash_neardup" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        pmod(col("doc_id"), lit(100)).cast("long").as("grp"),
        pmod(expr("doc_id div 100"), lit(4)).cast("int").as("vr"))
      val mkPng = udf((grp: Long, vr: Int) =>
        graft.multimodal.ImageHash.fixturePng(grp, vr))
      val media = params.select(col("media_id"), lit("image").as("kind"),
          mkPng(col("grp"), col("vr")).as("bytes"))
        .as[Multimodal.MediaRow]
      val hashed = graft.multimodal.ImageHash.imageHashes(media)
      graft.multimodal.ImageHash
        .hammingPairs(hashed, "media_id", "dhash", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // End-to-end image dedup over the same planted fixture: pairs →
    // connected components (large-star/small-star) → min-id canonical
    // verdict per media row. The oracle recomputes the hashes, takes
    // ALL-pairs edges within the bound, and closes them with the
    // recursive-reach components idiom — a different algorithm, same
    // semantics (pigeonhole banding is complete within the bound).
    "mm_phash_dedup" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        pmod(col("doc_id"), lit(100)).cast("long").as("grp"),
        pmod(expr("doc_id div 100"), lit(4)).cast("int").as("vr"))
      val mkPng = udf((grp: Long, vr: Int) =>
        graft.multimodal.ImageHash.fixturePng(grp, vr))
      val media = params.select(col("media_id"), lit("image").as("kind"),
          mkPng(col("grp"), col("vr")).as("bytes"))
        .as[Multimodal.MediaRow]
      graft.multimodal.ImageHash.deduplicate(media, maxHamming = 3)
        .orderBy("media_id")
    }),

    // Near-dup pairs off the AT-REST hash corpus (ImageStorage): the
    // fixture corpus is decoded+hashed ONCE and written as the two
    // bucketed tables (band rows keyed (chunk, v), collapse members
    // keyed fp) — the layout a 100 TB image deployment keeps so
    // recurring passes skip re-decode AND re-shuffle (plan-asserted in
    // ImageStorageSpec) — then paired off storage. The contract equals
    // the ad-hoc hammingPairs, so the same closed-form oracle applies.
    "mm_phash_at_rest" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        pmod(col("doc_id"), lit(100)).cast("long").as("grp"),
        pmod(expr("doc_id div 100"), lit(4)).cast("int").as("vr"))
      val mkPng = udf((grp: Long, vr: Int) =>
        graft.multimodal.ImageHash.fixturePng(grp, vr))
      val media = params.select(col("media_id"), lit("image").as("kind"),
          mkPng(col("grp"), col("vr")).as("bytes"))
        .as[Multimodal.MediaRow]
      val hashed = graft.multimodal.ImageHash.imageHashes(media)
      val (tbl, path) = gateCorpus("img")
      graft.multimodal.ImageStorage.writeBucketed(
        hashed, tbl, path, maxHamming = 3, nBuckets = 8)
      graft.multimodal.ImageStorage.pairs(s, tbl, maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // Incremental image batch check: docs ≡ 0 (mod 3) re-enter as a NEW
    // batch (ids shifted +1000000) against the at-rest corpus of the
    // rest (mod 3, not 4: grp = doc_id % 100 and 100 ≡ 0 (mod 4), so a
    // %4 split would put every grp cluster wholly on one side and the
    // gate would be vacuous; 3 is coprime with 100, so clusters mix).
    // Every batch image near-duplicates its grp cluster mates, so the
    // oracle is the brute batch×corpus Hamming join over the same
    // closed-form fingerprints.
    "mm_phash_batch_check" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        pmod(col("doc_id"), lit(100)).cast("long").as("grp"),
        pmod(expr("doc_id div 100"), lit(4)).cast("int").as("vr"))
      val mkPng = udf((grp: Long, vr: Int) =>
        graft.multimodal.ImageHash.fixturePng(grp, vr))
      val media = params.select(col("media_id"), lit("image").as("kind"),
          mkPng(col("grp"), col("vr")).as("bytes"))
        .as[Multimodal.MediaRow]
      val corpus = media.filter(pmod(col("media_id"), lit(3L)) =!= 0)
        .as[Multimodal.MediaRow]
      val batch = media.filter(pmod(col("media_id"), lit(3L)) === 0)
        .select((col("media_id") + 1000000L).as("media_id"), col("kind"),
          col("bytes"))
        .as[Multimodal.MediaRow]
      val (tbl, path) = gateCorpus("imgbatch")
      graft.multimodal.ImageStorage.writeBucketed(
        graft.multimodal.ImageHash.imageHashes(corpus),
        tbl, path, maxHamming = 3, nBuckets = 8)
      graft.multimodal.ImageStorage.checkBatch(s, tbl,
          graft.multimodal.ImageHash.imageHashes(batch), maxHamming = 3)
        .orderBy("batch_id", "id")
    }),

    // Acoustic near-dup — the audio arm of the dedup triad: per-doc
    // square-wave WAVs are synthesized from a closed-form modular
    // amplitude pattern (grp plants clusters; the variant perturbs only
    // the last window, which feeds exactly one envelope comparison),
    // PCM-decoded and energy-fingerprinted for real, then paired by the
    // same pigeonhole Hamming banding as images. The oracle recomputes
    // the fingerprint bit-for-bit from the modular form (PCM is
    // lossless, energies are exact integers) and replays the banding.
    "mm_audio_neardup" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        pmod(col("doc_id"), lit(100)).cast("long").as("grp"),
        pmod(expr("doc_id div 100"), lit(4)).cast("int").as("vr"))
      val mkWav = udf((grp: Long, vr: Int) =>
        graft.multimodal.AudioHash.fixtureWav(grp, vr))
      val media = params.select(col("media_id"), lit("audio").as("kind"),
          mkWav(col("grp"), col("vr")).as("bytes"))
        .as[Multimodal.MediaRow]
      graft.multimodal.AudioHash.neardupPairs(
          graft.multimodal.AudioHash.audioHashes(media), maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // Audio fingerprints through the SAME at-rest layout (ImageStorage
    // is fingerprint-agnostic): the corpus is hashed once, persisted
    // band-bucketed, and paired off storage — the triad (text, image,
    // audio) all keep the same at-rest shape. Same result contract as
    // the ad-hoc mm_audio_neardup, same closed-form oracle.
    "mm_audio_at_rest" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        pmod(col("doc_id"), lit(100)).cast("long").as("grp"),
        pmod(expr("doc_id div 100"), lit(4)).cast("int").as("vr"))
      val mkWav = udf((grp: Long, vr: Int) =>
        graft.multimodal.AudioHash.fixtureWav(grp, vr))
      val media = params.select(col("media_id"), lit("audio").as("kind"),
          mkWav(col("grp"), col("vr")).as("bytes"))
        .as[Multimodal.MediaRow]
      val (tbl, path) = gateCorpus("audio")
      graft.multimodal.ImageStorage.writeBucketed(
        graft.multimodal.AudioHash.audioHashes(media),
        tbl, path, maxHamming = 3, nBuckets = 8,
        fpCol = "afp")
      graft.multimodal.ImageStorage
        .pairs(s, tbl, maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // SPECTRAL acoustic near-dup — the frequency-sensitive second hash
    // of the audio arm: every fixture doc has the SAME energy envelope
    // (constant amplitude — the envelope hash collides corpus-wide by
    // construction), but per-window square-wave HALF-PERIODS follow
    // the modular closed form, and the exact-integer lag-1
    // autocorrelation fingerprint separates them. The oracle replays
    // R_w = A²·(15 − 2⌊15/2^m⌋) monotonicity as m_i > m_{i+1} and the
    // same banding as every Hamming gate.
    "mm_audio_spectral_neardup" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        pmod(col("doc_id"), lit(100)).cast("long").as("grp"),
        pmod(expr("doc_id div 100"), lit(4)).cast("int").as("vr"))
      val mkWav = udf((grp: Long, vr: Int) =>
        graft.multimodal.AudioHash.spectralFixtureWav(grp, vr))
      val media = params.select(col("media_id"), lit("audio").as("kind"),
          mkWav(col("grp"), col("vr")).as("bytes"))
        .as[Multimodal.MediaRow]
      graft.multimodal.AudioHash.spectralNeardupPairs(
          graft.multimodal.AudioHash.spectralHashes(media), maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // MJPEG-in-MP4 keyframe perceptual hashing — the one video codec
    // lane with REAL pixel decode: per-doc containers are synthesized
    // with real JPEG frame payloads addressed by stsc/stco, the
    // from-spec sample walk recovers each frame's bytes, ImageIO
    // decodes them, and the exact-integer dHash follows. The fixture's
    // uniform 8×8 cells align with JPEG DCT blocks and keep ≥36 luma
    // between adjacent cells, so every comparison sign survives the
    // lossy codec and the oracle computes the hash from the modular
    // closed form — a sample walk that misplaces an offset, a decoder
    // that misreads the scan, or a resampler off the box-mean contract
    // all fail the gate.
    "mm_video_keyframe_phash" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        pmod(col("doc_id"), lit(50)).cast("long").as("grp"),
        (lit(2) + pmod(col("doc_id"), lit(3))).cast("int").as("nf"))
      val mkMp4 = udf((grp: Long, nf: Int) =>
        graft.multimodal.ImageHash.fixtureMjpegMp4(grp, nf))
      val media = params.select(col("media_id"), lit("video").as("kind"),
          mkMp4(col("grp"), col("nf")).as("bytes"))
        .as[Multimodal.MediaRow]
      graft.multimodal.ImageHash.videoKeyframeHashes(media)
        .select(col("media_id"), col("frame_idx"), col("dhash"))
        .orderBy("media_id", "frame_idx")
    }),

    // VIDEO-level near-dup over the same MJPEG fixtures: keyframe
    // hashes → banded frame pairs → per-video-pair fold (shared frame
    // pairs + min hamming). The oracle computes every frame hash from
    // the modular closed form and takes the brute cross-video frame
    // join — the banding and packed-id machinery must be invisible.
    "mm_video_neardup" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        pmod(col("doc_id"), lit(50)).cast("long").as("grp"),
        (lit(2) + pmod(col("doc_id"), lit(3))).cast("int").as("nf"))
      val mkMp4 = udf((grp: Long, nf: Int) =>
        graft.multimodal.ImageHash.fixtureMjpegMp4(grp, nf))
      val media = params.select(col("media_id"), lit("video").as("kind"),
          mkMp4(col("grp"), col("nf")).as("bytes"))
        .as[Multimodal.MediaRow]
      graft.multimodal.ImageHash.videoNearDupPairs(
          graft.multimodal.ImageHash.videoKeyframeHashes(media)
            .select("media_id", "frame_idx", "dhash"),
          maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // End-to-end acoustic dedup over the same planted fixture: pairs →
    // connected components → min-id canonical verdicts. The oracle
    // recomputes the fingerprints, takes ALL-pairs edges within the
    // bound, and closes them with the recursive-reach idiom — a
    // different algorithm, same semantics (pigeonhole banding is
    // complete within the bound).
    "mm_audio_dedup" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        pmod(col("doc_id"), lit(100)).cast("long").as("grp"),
        pmod(expr("doc_id div 100"), lit(4)).cast("int").as("vr"))
      val mkWav = udf((grp: Long, vr: Int) =>
        graft.multimodal.AudioHash.fixtureWav(grp, vr))
      val media = params.select(col("media_id"), lit("audio").as("kind"),
          mkWav(col("grp"), col("vr")).as("bytes"))
        .as[Multimodal.MediaRow]
      graft.multimodal.AudioHash.deduplicate(media, maxHamming = 3)
        .orderBy("media_id")
    }),

    // Video near-dup off an AT-REST packed-keyframe corpus: hashes are
    // decoded once, packed into frame-instance ids and persisted
    // through the fingerprint-agnostic ImageStorage; the banded
    // candidate join consumes the storage bucketing and the per-video
    // fold is unchanged — same result contract and oracle as the
    // ad-hoc mm_video_neardup.
    "mm_video_at_rest" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        pmod(col("doc_id"), lit(50)).cast("long").as("grp"),
        (lit(2) + pmod(col("doc_id"), lit(3))).cast("int").as("nf"))
      val mkMp4 = udf((grp: Long, nf: Int) =>
        graft.multimodal.ImageHash.fixtureMjpegMp4(grp, nf))
      val media = params.select(col("media_id"), lit("video").as("kind"),
          mkMp4(col("grp"), col("nf")).as("bytes"))
        .as[Multimodal.MediaRow]
      val packed = graft.multimodal.ImageHash.packKeyframeHashes(
        graft.multimodal.ImageHash.videoKeyframeHashes(media)
          .select("media_id", "frame_idx", "dhash"))
      val (tbl, path) = gateCorpus("vid")
      graft.multimodal.ImageStorage.writeBucketed(
        packed, tbl, path, maxHamming = 3, nBuckets = 8,
        idCol = "fid", fpCol = "dhash")
      graft.multimodal.ImageHash.videoNearDupPairsAtRest(
          s, tbl, maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // Real ISO-BMFF (MP4) container parse through the from-spec Mp4
    // codec: per-doc width/height/timescale/duration, codec fourcc and
    // per-sample sizes are closed-form in doc_id, synthesized into a
    // valid ftyp+moov tree (incl. stsd/stts/stsz sample tables) on
    // executors, and recovered by the independent box-walk parser —
    // n_frames is the REAL stsz sample count, not duration ticks.
    "mm_video_meta" -> ((s, dir) => {
      import s.implicits._
      val params = table(s, dir, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        (lit(160) + pmod(col("doc_id"), lit(8)) * 80).cast("int").as("w"),
        (lit(90) + pmod(col("doc_id"), lit(6)) * 90).cast("int").as("h"),
        (lit(1000) + pmod(col("doc_id"), lit(3)) * 500).cast("long").as("tsc"),
        (lit(2400) + pmod(col("doc_id") * 7, lit(9000))).cast("long").as("dur"))
      val mkMp4 = udf((w: Int, h: Int, tsc: Long, dur: Long) => {
        val fourcc = Seq("avc1", "hev1", "av01")((dur % 3).toInt)
        val n = (3 + dur % 5).toInt
        val sizes = (0 until n).map(i => (100 + (dur + i) % 7).toInt)
        graft.multimodal.Mp4.write(w, h, tsc, dur, fourcc, sizes)
      })
      val media = params.select(col("media_id"), lit("video").as("kind"),
        mkMp4(col("w"), col("h"), col("tsc"), col("dur")).as("bytes"))
        .as[Multimodal.MediaRow]
      Multimodal.decode(media, Multimodal.ImageIoCodec).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("sampleRateHz").as("timescale"),
          col("durationTicks").as("duration_ticks"),
          col("codec"), col("nFrames").as("n_frames"),
          col("sampleBytes").as("sample_bytes"))
        .orderBy("media_id")
    }))

  /** Shared dHash replay for the phash oracles: the 9×8 cell grid is
    * closed-form in doc_id; bit y*8+x compares horizontal neighbors;
    * bit 63 enters as the signed two's-complement weight so the BIGINT
    * fingerprint matches Spark's long bit-for-bit.
    */
  private val PhashFpCte: String =
    """p AS (
         SELECT doc_id AS media_id, doc_id % 100 AS grp,
                (doc_id // 100) % 4 AS vr
         FROM documents),
       cells AS (
         SELECT media_id, x.x AS x, y.y AS y,
           CASE WHEN x.x = 8 AND y.y = vr
                THEN (((grp+3) * (5*x.x + 11*y.y + 7*x.x*y.y + 1)) % 256
                      + 128) % 256
                ELSE ((grp+3) * (5*x.x + 11*y.y + 7*x.x*y.y + 1)) % 256
                END AS g
         FROM p, range(0, 9) x(x), range(0, 8) y(y)),
       bits AS (
         SELECT a.media_id, a.y * 8 + a.x AS pos,
           CASE WHEN a.g > b.g THEN 1 ELSE 0 END AS bit
         FROM cells a JOIN cells b
           ON b.media_id = a.media_id AND b.y = a.y AND b.x = a.x + 1
         WHERE a.x < 8),
       fp AS (
         SELECT media_id, CAST(SUM(CASE WHEN bit = 0 THEN 0
             WHEN pos = 63 THEN -9223372036854775808
             ELSE (CAST(1 AS BIGINT) << CAST(pos AS INTEGER)) END)
           AS BIGINT) AS f
         FROM bits GROUP BY media_id)"""

  /** Shared envelope-fingerprint replay for the audio oracles: the
    * modular closed form (PCM lossless, exact integer energies); bit
    * 63 signed per the [[PhashFpCte]] convention. Yields `fp(media_id,
    * f)`.
    */
  private val AudioFpCte: String =
    """p AS (
         SELECT doc_id AS media_id,
           1 + (doc_id % 100) % 6 AS a,
           ((doc_id % 100) // 6) % 7 AS b,
           (doc_id // 100) % 4 AS vr
         FROM documents),
       amps AS (
         SELECT media_id, w.w AS w,
           1 + (a * w.w + b
                + CASE WHEN w.w = 64 THEN vr ELSE 0 END) % 7 AS amp
         FROM p, range(0, 65) w(w)),
       bits AS (
         SELECT x.media_id, x.w AS pos,
           CASE WHEN x.amp > y.amp THEN 1 ELSE 0 END AS bit
         FROM amps x JOIN amps y
           ON y.media_id = x.media_id AND y.w = x.w + 1
         WHERE x.w < 64),
       fp AS (
         SELECT media_id, CAST(SUM(CASE WHEN bit = 0 THEN 0
             WHEN pos = 63 THEN -9223372036854775808
             ELSE (CAST(1 AS BIGINT) << CAST(pos AS INTEGER)) END)
           AS BIGINT) AS f
         FROM bits GROUP BY media_id)"""

  /** Shared oracle for the ad-hoc and at-rest audio pair gates:
    * [[AudioFpCte]] + the same banding replay as the image gates.
    */
  private val AudioNeardupSql: String =
    s"""WITH $AudioFpCte,
       keyed AS (
         SELECT media_id, f, c.chunk,
           CAST(((CAST(f AS HUGEINT) + CASE WHEN f < 0
               THEN CAST('18446744073709551616' AS HUGEINT)
               ELSE 0 END)
             // (CASE c.chunk WHEN 0 THEN 1 WHEN 1 THEN 65536
                 WHEN 2 THEN 4294967296
                 ELSE 281474976710656 END)) % 65536 AS BIGINT) AS v
         FROM fp, range(0, 4) c(chunk)),
       pairs AS (
         SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                a.f AS fa, b.f AS fb
         FROM keyed a JOIN keyed b
           ON b.chunk = a.chunk AND b.v = a.v AND a.media_id < b.media_id)
       SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
       FROM pairs WHERE bit_count(xor(fa, fb)) <= 3
       ORDER BY id_a, id_b"""

  /** Shared oracle for the ad-hoc and at-rest video gates: brute
    * cross-video frame join over the closed-form hashes, folded per
    * video pair — banding, packed ids and storage layout invisible.
    */
  private val VideoNeardupSql: String =
    """WITH p AS (
         SELECT doc_id AS media_id,
           1 + (doc_id % 50) % 6 AS a,
           ((doc_id % 50) // 6) % 7 AS b,
           2 + doc_id % 3 AS nf
         FROM documents),
       frames AS (
         SELECT media_id, a, b, j.j AS frame_idx
         FROM p, range(0, 4) j(j) WHERE j.j < nf),
       bits AS (
         SELECT media_id, frame_idx, y.y * 8 + x.x AS pos,
           CASE WHEN (a*x.x + b*y.y + frame_idx) % 7
                     > (a*(x.x+1) + b*y.y + frame_idx) % 7
                THEN 1 ELSE 0 END AS bit
         FROM frames, range(0, 8) x(x), range(0, 8) y(y)),
       fp AS (
         SELECT media_id, frame_idx,
           CAST(SUM(CASE WHEN bit = 0 THEN 0
               WHEN pos = 63 THEN -9223372036854775808
               ELSE (CAST(1 AS BIGINT) << CAST(pos AS INTEGER)) END)
             AS BIGINT) AS dhash
         FROM bits GROUP BY 1, 2),
       fpairs AS (
         SELECT fa.media_id AS id_a, fb.media_id AS id_b,
           CAST(bit_count(xor(fa.dhash, fb.dhash)) AS INT) AS h
         FROM fp fa JOIN fp fb
           ON fa.media_id < fb.media_id
           AND bit_count(xor(fa.dhash, fb.dhash)) <= 3)
       SELECT id_a, id_b, COUNT(*) AS shared_frames,
         MIN(h) AS min_hamming
       FROM fpairs GROUP BY 1, 2 ORDER BY 1, 2"""

  def oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS byte_len,
         SHA256(text) AS sha
         FROM documents ORDER BY doc_id""",
    "mm_patch_plan" ->
      """WITH imgs AS (
           SELECT doc_id AS media_id,
             CAST(64 + OCTET_LENGTH(ENCODE(text)) % 960 AS INT) AS width,
             CAST(64 + (OCTET_LENGTH(ENCODE(text)) * 7) % 540 AS INT) AS height
           FROM documents)
         SELECT media_id, width, height,
           CAST((width + 15) // 16 AS INT) AS n_cols,
           CAST((height + 15) // 16 AS INT) AS n_rows,
           CAST(((width + 15) // 16) * ((height + 15) // 16) AS INT) AS n_patches,
           CAST(((width + 15) // 16) * 16 - width AS INT) AS pad_x,
           CAST(((height + 15) // 16) * 16 - height AS INT) AS pad_y
         FROM imgs ORDER BY media_id""",
    // closed-form patch counts through the same recursive FFD replay
    // as t_pack_bins (lockstep per-shard bin-load list)
    "mm_patch_pack" ->
      s"""WITH RECURSIVE
         d AS (
           SELECT doc_id AS media_id,
             CAST(((64 + OCTET_LENGTH(ENCODE(text)) % 960 + 15) // 16)
               * ((64 + (OCTET_LENGTH(ENCODE(text)) * 7) % 540 + 15) // 16)
               AS BIGINT) AS n_patches,
             CAST(${graft.operators.Sampling.avalancheKeySql("doc_id")} % 8
               AS INT) AS shard
           FROM documents),
         ord AS (
           SELECT media_id, n_patches, shard,
             ROW_NUMBER() OVER (PARTITION BY shard
                                ORDER BY n_patches DESC, media_id) AS pos
           FROM d),
         pack AS (
           SELECT shard, CAST(0 AS BIGINT) AS pos,
                  CAST(NULL AS BIGINT) AS media_id,
                  CAST(NULL AS BIGINT) AS n_patches,
                  CAST(NULL AS INT) AS bin,
                  CAST([] AS BIGINT[]) AS loads
           FROM (SELECT DISTINCT shard FROM ord)
           UNION ALL
           SELECT shard, pos, media_id, n_patches, CAST(b - 1 AS INT) AS bin,
                  CASE WHEN b <= LEN(loads)
                       THEN LIST_TRANSFORM(RANGE(1, LEN(loads) + 1),
                         i -> CASE WHEN i = b THEN loads[i] + n_patches
                                   ELSE loads[i] END)
                       ELSE LIST_APPEND(loads, n_patches) END AS loads
           FROM (
             SELECT p.shard, p.pos + 1 AS pos, o.media_id, o.n_patches,
                    p.loads,
                    COALESCE(LIST_FILTER(RANGE(1, LEN(p.loads) + 1),
                      i -> p.loads[i] + o.n_patches <= 4096)[1],
                      LEN(p.loads) + 1) AS b
             FROM pack p
             JOIN ord o ON o.shard = p.shard AND o.pos = p.pos + 1))
         SELECT media_id, n_patches, shard, bin
         FROM pack WHERE pos >= 1 ORDER BY media_id""",

    "mm_decode" ->
      """SELECT doc_id AS media_id,
         CAST(8 + OCTET_LENGTH(ENCODE(text)) % 24 AS INT) AS width,
         CAST(8 + (OCTET_LENGTH(ENCODE(text)) * 7) % 16 AS INT) AS height,
         CAST(3 AS INT) AS channels
         FROM documents ORDER BY media_id""",
    "mm_audio_meta" ->
      """SELECT doc_id AS media_id,
         CAST(CASE OCTET_LENGTH(ENCODE(text)) % 4
              WHEN 0 THEN 8000 WHEN 1 THEN 16000
              WHEN 2 THEN 22050 ELSE 44100 END AS INT) AS sample_rate_hz,
         CAST(1 + OCTET_LENGTH(ENCODE(text)) % 2 AS INT) AS channels,
         CAST(64 + (OCTET_LENGTH(ENCODE(text)) * 3) % 256 AS INT) AS n_frames
         FROM documents ORDER BY media_id""",
    // dHash replay: the 9×8 cell grid is closed-form in doc_id; bit
    // y*8+x compares horizontal neighbors; bit 63 enters as the signed
    // two's-complement weight so the BIGINT fingerprint matches Spark's
    // long bit-for-bit; banding = 4 × 16-bit chunks via exact HUGEINT
    // division on the unsigned view (Spark's shiftrightunsigned twin)
    "mm_phash_neardup" ->
      s"""WITH $PhashFpCte,
         keyed AS (
           SELECT media_id, f, c.chunk,
             CAST(((CAST(f AS HUGEINT) + CASE WHEN f < 0
                 THEN CAST('18446744073709551616' AS HUGEINT)
                 ELSE 0 END)
               // (CASE c.chunk WHEN 0 THEN 1 WHEN 1 THEN 65536
                   WHEN 2 THEN 4294967296
                   ELSE 281474976710656 END)) % 65536 AS BIGINT) AS v
           FROM fp, range(0, 4) c(chunk)),
         pairs AS (
           SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                  a.f AS fa, b.f AS fb
           FROM keyed a JOIN keyed b
             ON b.chunk = a.chunk AND b.v = a.v AND a.media_id < b.media_id)
         SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
         FROM pairs WHERE bit_count(xor(fa, fb)) <= 3
         ORDER BY id_a, id_b""",

    // identical contract to the ad-hoc banding — same oracle
    "mm_phash_at_rest" ->
      s"""WITH $PhashFpCte,
         keyed AS (
           SELECT media_id, f, c.chunk,
             CAST(((CAST(f AS HUGEINT) + CASE WHEN f < 0
                 THEN CAST('18446744073709551616' AS HUGEINT)
                 ELSE 0 END)
               // (CASE c.chunk WHEN 0 THEN 1 WHEN 1 THEN 65536
                   WHEN 2 THEN 4294967296
                   ELSE 281474976710656 END)) % 65536 AS BIGINT) AS v
           FROM fp, range(0, 4) c(chunk)),
         pairs AS (
           SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                  a.f AS fa, b.f AS fb
           FROM keyed a JOIN keyed b
             ON b.chunk = a.chunk AND b.v = a.v AND a.media_id < b.media_id)
         SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
         FROM pairs WHERE bit_count(xor(fa, fb)) <= 3
         ORDER BY id_a, id_b""",

    // brute batch×corpus Hamming join over the same fingerprints —
    // banding + storage layout must be invisible in the result
    "mm_phash_batch_check" ->
      s"""WITH $PhashFpCte
         SELECT b.media_id + 1000000 AS batch_id, c.media_id AS id,
           CAST(bit_count(xor(b.f, c.f)) AS INT) AS hamming
         FROM fp b JOIN fp c
           ON b.media_id % 3 = 0 AND c.media_id % 3 <> 0
           AND bit_count(xor(b.f, c.f)) <= 3
         ORDER BY batch_id, id""",

    // all-pairs edges within the bound + recursive-reach closure +
    // min-label canonical — algorithmically independent of the Spark
    // side's banding + large-star/small-star loop
    "mm_phash_dedup" ->
      s"""WITH RECURSIVE $PhashFpCte,
         edges AS (
           SELECT a.media_id AS ia, b.media_id AS ib
           FROM fp a JOIN fp b ON a.media_id < b.media_id
             AND bit_count(xor(a.f, b.f)) <= 3),
         sym AS (SELECT ia AS src, ib AS dst FROM edges
                 UNION SELECT ib AS src, ia AS dst FROM edges),
         reach(node, lbl) AS (
           SELECT src, src FROM sym
           UNION
           SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node),
         canon AS (SELECT node, MIN(lbl) AS canonical FROM reach
                   GROUP BY node)
         SELECT p.media_id,
           COALESCE(c.canonical, p.media_id) AS cluster,
           p.media_id = COALESCE(c.canonical, p.media_id) AS kept
         FROM p LEFT JOIN canon c ON c.node = p.media_id
         ORDER BY p.media_id""",
    // envelope fingerprint from the modular closed form (PCM lossless,
    // exact integer energies) + the same banding replay as the image
    // gates; bit 63 signed per the PhashFpCte convention
    "mm_audio_neardup" -> AudioNeardupSql,

    // the at-rest layout must be invisible in the result — same oracle
    "mm_audio_at_rest" -> AudioNeardupSql,

    // spectral fingerprint from the closed form: per-window half-period
    // exponent m drives R_w = A²·(15 − 2·⌊15/2^m⌋), strictly increasing
    // in m, so each gradient bit replays as m_i > m_{i+1}; then the
    // standard 4×16-bit banding replay
    "mm_audio_spectral_neardup" ->
      s"""WITH p AS (
           SELECT doc_id AS media_id,
             1 + (doc_id % 100) % 6 AS a,
             ((doc_id % 100) // 6) % 7 AS b,
             (doc_id // 100) % 4 AS vr
           FROM documents),
         ms AS (
           SELECT media_id, w.w AS w,
             (a * w.w + b
              + CASE WHEN w.w = 64 THEN vr ELSE 0 END) % 3 AS m
           FROM p, range(0, 65) w(w)),
         bits AS (
           SELECT x.media_id, x.w AS pos,
             CASE WHEN x.m > y.m THEN 1 ELSE 0 END AS bit
           FROM ms x JOIN ms y
             ON y.media_id = x.media_id AND y.w = x.w + 1
           WHERE x.w < 64),
         fp AS (
           SELECT media_id, CAST(SUM(CASE WHEN bit = 0 THEN 0
               WHEN pos = 63 THEN -9223372036854775808
               ELSE (CAST(1 AS BIGINT) << CAST(pos AS INTEGER)) END)
             AS BIGINT) AS f
           FROM bits GROUP BY media_id),
         keyed AS (
           SELECT media_id, f, c.chunk,
             CAST(((CAST(f AS HUGEINT) + CASE WHEN f < 0
                 THEN CAST('18446744073709551616' AS HUGEINT)
                 ELSE 0 END)
               // (CASE c.chunk WHEN 0 THEN 1 WHEN 1 THEN 65536
                   WHEN 2 THEN 4294967296
                   ELSE 281474976710656 END)) % 65536 AS BIGINT) AS v
           FROM fp, range(0, 4) c(chunk)),
         pairs AS (
           SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                  a.f AS fa, b.f AS fb
           FROM keyed a JOIN keyed b
             ON b.chunk = a.chunk AND b.v = a.v AND a.media_id < b.media_id)
         SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
         FROM pairs WHERE bit_count(xor(fa, fb)) <= 3
         ORDER BY id_a, id_b""",

    // all-pairs edges within the bound + recursive-reach closure +
    // min-label canonical — the mm_phash_dedup idiom on the audio fp
    "mm_audio_dedup" ->
      s"""WITH RECURSIVE $AudioFpCte,
         edges AS (
           SELECT a.media_id AS ia, b.media_id AS ib
           FROM fp a JOIN fp b ON a.media_id < b.media_id
             AND bit_count(xor(a.f, b.f)) <= 3),
         sym AS (SELECT ia AS src, ib AS dst FROM edges
                 UNION SELECT ib AS src, ia AS dst FROM edges),
         reach(node, lbl) AS (
           SELECT src, src FROM sym
           UNION
           SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node),
         canon AS (SELECT node, MIN(lbl) AS canonical FROM reach
                   GROUP BY node)
         SELECT p.media_id,
           COALESCE(c.canonical, p.media_id) AS cluster,
           p.media_id = COALESCE(c.canonical, p.media_id) AS kept
         FROM p LEFT JOIN canon c ON c.node = p.media_id
         ORDER BY p.media_id""",

    // per-frame dHash from the fixture's modular closed form — no
    // pixel decode on the oracle side; bit 63 enters as the signed
    // two's-complement weight (the PhashFpCte convention)
    "mm_video_keyframe_phash" ->
      """WITH p AS (
           SELECT doc_id AS media_id,
             1 + (doc_id % 50) % 6 AS a,
             ((doc_id % 50) // 6) % 7 AS b,
             2 + doc_id % 3 AS nf
           FROM documents),
         frames AS (
           SELECT media_id, a, b, j.j AS frame_idx
           FROM p, range(0, 4) j(j) WHERE j.j < nf),
         bits AS (
           SELECT media_id, frame_idx, y.y * 8 + x.x AS pos,
             CASE WHEN (a*x.x + b*y.y + frame_idx) % 7
                       > (a*(x.x+1) + b*y.y + frame_idx) % 7
                  THEN 1 ELSE 0 END AS bit
           FROM frames, range(0, 8) x(x), range(0, 8) y(y)),
         fp AS (
           SELECT media_id, frame_idx,
             CAST(SUM(CASE WHEN bit = 0 THEN 0
                 WHEN pos = 63 THEN -9223372036854775808
                 ELSE (CAST(1 AS BIGINT) << CAST(pos AS INTEGER)) END)
               AS BIGINT) AS dhash
           FROM bits GROUP BY 1, 2)
         SELECT media_id, CAST(frame_idx AS INT) AS frame_idx, dhash
         FROM fp ORDER BY media_id, frame_idx""",

    // brute cross-video frame join over the closed-form hashes, folded
    // per video pair — banding + packed ids must be invisible
    "mm_video_neardup" -> VideoNeardupSql,

    // the at-rest layout must be invisible in the result — same oracle
    "mm_video_at_rest" -> VideoNeardupSql,

    // the closed forms mirror the fixture generator; sample_bytes sums
    // the same per-sample size sequence the stsz table carries (n ≤ 7,
    // so a fixed 0..6 series filtered by i < n replays the loop — DuckDB
    // 1.0 has no correlated generate_series)
    "mm_video_meta" ->
      """WITH p AS (
           SELECT doc_id, 2400 + (doc_id * 7) % 9000 AS dur
           FROM documents),
         ss AS (
           SELECT doc_id, CAST(SUM(100 + (dur + i) % 7) AS BIGINT) AS sample_bytes
           FROM p, range(0, 7) t(i)
           WHERE i < 3 + dur % 5
           GROUP BY doc_id)
         SELECT p.doc_id AS media_id,
         CAST(160 + (p.doc_id % 8) * 80 AS INT) AS width,
         CAST(90 + (p.doc_id % 6) * 90 AS INT) AS height,
         CAST(1000 + (p.doc_id % 3) * 500 AS INT) AS timescale,
         CAST(dur AS BIGINT) AS duration_ticks,
         CASE dur % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
              ELSE 'av01' END AS codec,
         CAST(3 + dur % 5 AS INT) AS n_frames,
         ss.sample_bytes
         FROM p JOIN ss USING (doc_id) ORDER BY media_id""")
}
