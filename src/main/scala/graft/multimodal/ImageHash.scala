package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + Hamming-banded near-duplicate pairs — the
  * image arm of the dedup family. A training-data pipeline dedups images
  * as well as text (re-encoded, recolored, resized copies of the same
  * picture), and byte-level hashing cannot see through a re-encode; the
  * classic cheap answer is a perceptual hash over a tiny luminance
  * thumbnail:
  *
  *   - dHash (difference hash): box-downsample to a 9×8 gray grid, one
  *     bit per horizontal neighbor comparison `g(x,y) > g(x+1,y)` —
  *     64 bits encoding the gradient SIGN structure, invariant to
  *     global brightness shifts and (by the box resample) to uniform
  *     upscaling.
  *   - aHash (average hash): 8×8 gray grid, one bit per cell
  *     `g > mean` — coarser, kept for cross-checking.
  *
  * All arithmetic is EXACT integer (luminance `(299r + 587g + 114b) /
  * 1000` floor-divided, box means floor-divided), so a hash is a pure
  * function of the pixel raster — replayable bit-for-bit by an oracle
  * given a closed-form raster (the `mm_phash_neardup` gate), and stable
  * across JVMs.
  *
  * Near-dup pairs reuse the SimHash pigeonhole banding
  * ([[graft.dedup.Dedup.simhashPairs]], `Dedup.scala:192`): split the
  * 64-bit hash into `maxHamming + 1` chunks — any pair within the
  * Hamming bound shares at least one exact chunk — and shuffle on
  * (chunk index, value), never O(n²). Identical hashes (exact or
  * re-encoded duplicates — the worst bucket skew) are collapsed to one
  * representative BEFORE banding and re-expanded at hamming 0,
  * mirroring the text path's exact-content collapse.
  *
  * 100 TB shape: decode + hash are partition-local (the [[Multimodal
  * .decode]] idiom — pixels never shuffle); banding ships 8-byte
  * fingerprints, `maxHamming + 1` rows each; the candidate join is
  * bounded by bucket co-residency of 16-bit chunk values; output is
  * pair-bounded. Nothing image-sized crosses the wire after the hash.
  */
object ImageHash {

  /** Integer luminance (ITU-601 weights, floor division) — exact, and
    * the identity on gray pixels (r = g = b = v ⇒ 1000v / 1000 = v).
    */
  private def lum(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (r * 299 + g * 587 + b * 114) / 1000
  }

  /** Box-downsample to a `tw`×`th` gray grid: cell (x, y) is the floor
    * mean of luminance over pixel box [⌊xW/tw⌋, ⌊(x+1)W/tw⌋) ×
    * [⌊yH/th⌋, ⌊(y+1)H/th⌋). Exact integer; the identity when the
    * image is already tw×th, and exact under k× pixel replication
    * (every box holds k² copies of one source pixel ⇒ same mean).
    */
  def grayGrid(img: BufferedImage, tw: Int, th: Int): Array[Array[Int]] = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= tw && h >= th,
      s"image ${w}x$h smaller than the ${tw}x$th hash grid — upscale first")
    Array.tabulate(th, tw) { (y, x) =>
      val x0 = x * w / tw; val x1 = (x + 1) * w / tw
      val y0 = y * h / th; val y1 = (y + 1) * h / th
      var sum = 0L
      var yy = y0
      while (yy < y1) {
        var xx = x0
        while (xx < x1) { sum += lum(img.getRGB(xx, yy)); xx += 1 }
        yy += 1
      }
      (sum / ((x1 - x0).toLong * (y1 - y0))).toInt
    }
  }

  /** dHash: bit `y*8 + x` set iff gray(x, y) > gray(x+1, y) on the
    * 9×8 grid (x in 0..7, y in 0..7). Bit 63 is the sign bit — the
    * hash is an ordinary two's-complement long.
    */
  def dHash64(img: BufferedImage): Long = {
    val g = grayGrid(img, 9, 8)
    var fp = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y)(x) > g(y)(x + 1)) fp |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    fp
  }

  /** aHash: bit `y*8 + x` set iff gray(x, y) > floor-mean of the 8×8
    * grid.
    */
  def aHash64(img: BufferedImage): Long = {
    val g = grayGrid(img, 8, 8)
    var sum = 0L
    var y = 0
    while (y < 8) { var x = 0; while (x < 8) { sum += g(y)(x); x += 1 }; y += 1 }
    val mean = sum / 64
    var fp = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y)(x) > mean) fp |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    fp
  }

  /** Decode image rows and hash them, partition-local ([[Multimodal
    * .decode]]'s shape: pixels stay inside the task). Returns
    * `(media_id, dhash, ahash)`.
    */
  def imageHashes(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      Multimodal.imageIoMemCache // decode scratch in memory, once per JVM
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.bytes))
        if (img == null)
          throw new IllegalArgumentException(
            s"undecodable image payload for media ${r.media_id} " +
              s"(${r.bytes.length} bytes)")
        (r.media_id, dHash64(img), aHash64(img))
      }
    }.toDF("media_id", "dhash", "ahash")
  }

  /** All id pairs within `maxHamming` of each other on a 64-bit
    * fingerprint column: `(id_a, id_b, hamming)` with id_a < id_b.
    * Pigeonhole banding over `maxHamming + 1` chunks (the
    * [[graft.dedup.Dedup.simhashPairs]] machinery, generalized to any
    * fingerprint); identical fingerprints collapse to a representative
    * before banding (re-encoded exact copies are the worst band skew)
    * and re-expand at hamming 0.
    */
  def hammingPairs(hashes: DataFrame, idCol: String, fpCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 15,
      s"maxHamming out of [1,15]: $maxHamming")
    val chunks = maxHamming + 1
    val bits = 64 / chunks
    val h = hashes.select(col(idCol).as("id"), col(fpCol).as("fp"))
    // exact-fingerprint collapse: one representative per distinct hash
    val groups = h.groupBy("fp").agg(min(col("id")).as("rep"))
    val member = h.join(groups, Seq("fp"))
    val keyed = groups.select(col("rep"), col("fp"),
        explode(array((0 until chunks).map { i =>
          struct(lit(i).as("chunk"),
            (shiftrightunsigned(col("fp"), i * bits) bitwiseAND
              lit((1L << bits) - 1)).as("v"))
        }: _*)).as("ck"))
      // primitive join keys — struct keys degrade to a non-hashable join
      .select(col("rep"), col("fp"), col("ck.chunk").as("chunk"),
        col("ck.v").as("v"))
    val l = keyed.select(col("chunk"), col("v"), col("rep").as("ra"),
      col("fp").as("fa"))
    val r = keyed.select(col("chunk"), col("v"), col("rep").as("rb"),
      col("fp").as("fb"))
    val repPairs = l.join(r, Seq("chunk", "v"))
      .filter(col("ra") < col("rb"))
      .dropDuplicates("ra", "rb")
      .withColumn("hamming",
        bit_count(col("fa") bitwiseXOR col("fb")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("ra", "rb", "hamming")
    // cross-group expansion: every member of ra × every member of rb
    val ma = member.select(col("rep").as("ra"), col("id").as("__ia"))
    val mb = member.select(col("rep").as("rb"), col("id").as("__ib"))
    val cross = repPairs.join(ma, Seq("ra")).join(mb, Seq("rb"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"), col("hamming"))
    // within-group pairs: identical hash ⇒ hamming 0
    val within = member.select(col("fp"), col("id").as("id_a")).as("x")
      .join(member.select(col("fp"), col("id").as("id_b")).as("y"),
        Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).cast("int").as("hamming"))
    cross.unionByName(within)
  }

  /** End-to-end perceptual image deduplication — the image twin of
    * [[graft.dedup.Dedup.deduplicate]]: decode+dHash partition-local,
    * Hamming-banded near-dup pairs, connected components (the shared
    * large-star/small-star loop, `checkpointDir` per the
    * [[graft.core.Durable]] policy), min-id canonical per cluster.
    * Returns EVERY media row's verdict: `(media_id, cluster, kept)` —
    * singletons are their own cluster and keep themselves. Transitive
    * closure is deliberate (a chain of ≤`maxHamming` steps is one
    * cluster — the standard near-dup recipe); tighten `maxHamming`
    * rather than fighting chains.
    */
  def deduplicate(media: Dataset[Multimodal.MediaRow], maxHamming: Int = 3,
                  checkpointDir: Option[String] = None): DataFrame = {
    val hashed = imageHashes(media)
    val pairs = hammingPairs(hashed, "media_id", "dhash", maxHamming)
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

  /** Decode MJPEG-in-MP4 video rows and hash their frames,
    * partition-local: the from-spec [[Mp4.sampleRanges]] walk locates
    * each sample's byte extent inside the container, every
    * `frameStep`-th sample decodes as an ordinary JPEG through the
    * same JDK ImageIO the image path uses, and the exact-integer
    * dHash/aHash follow. Returns `(media_id, frame_idx, dhash,
    * ahash)` — feed the hash column to [[hammingPairs]] (or persist
    * it via [[ImageStorage]]) and the whole image near-dup machinery
    * applies to video keyframes unchanged. In MJPEG every sample is a
    * keyframe; `frameStep` is the sampling stride.
    *
    * This is the ONE codec lane with real pixel decode (the JDK ships
    * no inter-frame decoder); non-MJPEG payloads fail loudly in the
    * JPEG decode, not silently hash garbage. 100 TB shape: identical
    * to [[imageHashes]] — containers never shuffle, only 8-byte
    * fingerprints do.
    */
  def videoKeyframeHashes(media: Dataset[Multimodal.MediaRow],
                          frameStep: Int = 1): DataFrame = {
    require(frameStep >= 1, s"frameStep must be >= 1: $frameStep")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      Multimodal.imageIoMemCache // decode scratch in memory, once per JVM
      rows.flatMap { r =>
        Mp4.sampleRanges(r.bytes).zipWithIndex
          .filter(_._2 % frameStep == 0)
          .map { case ((off, sz), i) =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.bytes, off.toInt, sz))
            if (img == null)
              throw new IllegalArgumentException(
                s"undecodable frame $i of media ${r.media_id} " +
                  s"($sz bytes at offset $off) — not MJPEG?")
            (r.media_id, i, dHash64(img), aHash64(img))
          }
      }
    }.toDF("media_id", "frame_idx", "dhash", "ahash")
  }

  /** VIDEO-level near-duplicate pairs from a keyframe-hash table
    * (`media_id, frame_idx, dhash` — [[videoKeyframeHashes]]'s shape):
    * `(id_a < id_b, shared_frames, min_hamming)` for every video pair
    * with at least `minSharedFrames` cross-video keyframe pairs within
    * `maxHamming` — re-encoded, re-containered or trimmed copies of a
    * clip share most keyframes; unrelated clips share none. Frame
    * instances pack into synthetic ids (`media_id · maxFramesPerVideo
    * + frame_idx`, range-guarded in-plan) so [[hammingPairs]]'
    * exact-collapse banding applies UNCHANGED; the frame-pair table is
    * then folded per video pair in one aggregation. Packed-id order
    * equals video order for cross-video pairs, so `id_a < id_b` holds
    * by construction.
    *
    * 100 TB shape: everything up to the fold is the image path
    * (fingerprints shuffle, frames don't); the fold is one map-side-
    * combined aggregation of the pair-bounded match table.
    */
  def videoNearDupPairs(frameHashes: DataFrame, maxHamming: Int = 3,
                        minSharedFrames: Int = 1,
                        maxFramesPerVideo: Int = 1000000): DataFrame = {
    val inst = packKeyframeHashes(frameHashes, maxFramesPerVideo)
    foldFramePairs(hammingPairs(inst, "fid", "dhash", maxHamming),
      maxFramesPerVideo, minSharedFrames)
  }

  /** Pack a keyframe-hash table into the frame-instance ids
    * [[videoNearDupPairs]] banding uses — exposed so the corpus can be
    * persisted AT REST through the fingerprint-agnostic
    * [[ImageStorage]] (`idCol = "fid"`): recurring video-dedup passes
    * then skip re-decode AND re-shuffle exactly like the image lane,
    * and [[videoNearDupPairsAtRest]] folds the stored pairs.
    */
  def packKeyframeHashes(frameHashes: DataFrame,
                         maxFramesPerVideo: Int = 1000000): DataFrame = {
    require(maxFramesPerVideo >= 1,
      s"maxFramesPerVideo must be >= 1: $maxFramesPerVideo")
    val k = maxFramesPerVideo.toLong
    // the upper bound guards silent Long wrap-around: media_id * k must
    // stay inside the long range or `div` unpacks phantom video ids
    val maxId = Long.MaxValue / k - 1
    val fid =
      when(col("media_id").between(0, maxId), col("media_id").cast("long"))
        .otherwise(raise_error(concat(lit(
          "packKeyframeHashes: media_id outside [0, " + maxId + "] breaks " +
            "the packed-id ordering (overflow) — re-key upstream or lower " +
            "maxFramesPerVideo; got "), col("media_id").cast("string")))) * k +
      when(col("frame_idx").between(0, k - 1), col("frame_idx"))
        .otherwise(raise_error(lit(
          s"packKeyframeHashes: frame_idx outside [0, $k) — raise " +
            "maxFramesPerVideo")))
    frameHashes.select(fid.as("fid"), col("dhash"))
  }

  /** [[videoNearDupPairs]] off an at-rest packed-keyframe corpus
    * ([[packKeyframeHashes]] → [[ImageStorage.writeBucketed]] with
    * `idCol = "fid"`): the banded candidate join consumes the storage
    * bucketing, the per-video fold is unchanged — same contract, no
    * decode, no corpus-sized band shuffle. `maxFramesPerVideo` must
    * equal the packing's.
    */
  def videoNearDupPairsAtRest(spark: org.apache.spark.sql.SparkSession,
                              table: String, maxHamming: Int = 3,
                              minSharedFrames: Int = 1,
                              maxFramesPerVideo: Int = 1000000): DataFrame =
    foldFramePairs(ImageStorage.pairs(spark, table, maxHamming),
      maxFramesPerVideo, minSharedFrames)

  /** The per-video-pair fold shared by the ad-hoc and at-rest video
    * near-dup paths: unpack frame-instance pairs to video pairs, drop
    * within-video matches, count + min-hamming per pair.
    */
  private def foldFramePairs(framePairs: DataFrame, maxFramesPerVideo: Int,
                             minSharedFrames: Int): DataFrame = {
    require(minSharedFrames >= 1,
      s"minSharedFrames must be >= 1: $minSharedFrames")
    val k = maxFramesPerVideo.toLong
    framePairs
      // exact long division — a float path would wobble past 2^53
      .select(expr(s"id_a div $k").as("vid_a"),
        expr(s"id_b div $k").as("vid_b"), col("hamming"))
      .filter(col("vid_a") =!= col("vid_b"))
      .groupBy(col("vid_a").as("id_a"), col("vid_b").as("id_b"))
      .agg(count(lit(1)).as("shared_frames"),
        min(col("hamming")).as("min_hamming"))
      .filter(col("shared_frames") >= minSharedFrames)
  }

  /** JPEG-encode at an explicit quality (the default writer quality is
    * content-dependent; the fixture contract below needs a pinned
    * high-quality table).
    */
  def jpegBytes(img: BufferedImage, quality: Float): Array[Byte] = {
    Multimodal.imageIoMemCache // encode scratch in memory, once per JVM
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    out.toByteArray
  }

  /** Closed-form MJPEG-in-MP4 fixture whose frame dHashes survive the
    * LOSSY codec exactly: frame `j` is a 72×64 gray image of 8×8-pixel
    * uniform cells — one cell per dHash grid position, each cell
    * aligned with one JPEG DCT block — with cell luminance
    * `((a·x + b·y + j) mod 7) · 36`, `a = 1 + grp mod 6` (never ≡ 0
    * mod 7, so horizontally adjacent cells ALWAYS differ),
    * `b = (grp/6) mod 7`. A uniform block carries only its DC
    * coefficient, so JPEG (q = 0.9) perturbs each cell's decoded mean
    * by a few luma units while adjacent cells sit ≥ 36 apart — every
    * dHash comparison's sign is codec-proof, and the oracle computes
    * the hash from the modular closed form without decoding anything.
    * Cells with EQUAL content decode identically (same block → same
    * bytes), so the strict `>` is stable there too.
    */
  def fixtureMjpegMp4(grp: Long, nFrames: Int): Array[Byte] = {
    require(nFrames >= 1 && nFrames <= 64, s"nFrames out of [1,64]: $nFrames")
    val a = 1 + (grp % 6).toInt
    val b = ((grp / 6) % 7).toInt
    val frames = (0 until nFrames).map { j =>
      val img = new BufferedImage(72, 64, BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 9) {
          val v = ((a * x + b * y + j) % 7) * 36
          var py = 0
          while (py < 8) {
            var px = 0
            while (px < 8) {
              img.setRGB(x * 8 + px, y * 8 + py, (v << 16) | (v << 8) | v)
              px += 1
            }
            py += 1
          }
          x += 1
        }
        y += 1
      }
      jpegBytes(img, quality = 0.9f)
    }
    Mp4.writeWithSamples(72, 64, 1000L, nFrames * 40L, "jpeg", frames)
  }

  /** Closed-form 9×8 gray PNG fixture for the oracle gate: cell
    * luminance `((grp+3)·(5x + 11y + 7xy + 1)) mod 256` — the mixed
    * xy term gives every (grp, row) its own comparison-step cadence,
    * so distinct grps hash ~32 bits apart (measured: zero cross-grp
    * pairs within Hamming 3 over 100 grps, popcount mean ≈ 31.6; a
    * plain linear gradient left ≤6 active bits and 31k accidental
    * cross-grp collisions) — except the LAST column's row-`variant`
    * cell, which adds 128 (mod 256). The last column participates in
    * exactly one dHash comparison (x = 7 vs x = 8), so two variants of
    * one `grp` differ in at most 2 hash bits — planted near-duplicates
    * whose dHash the oracle computes in closed form.
    */
  def fixturePng(grp: Long, variant: Int): Array[Byte] = {
    val img = new BufferedImage(9, 8, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val base = (((grp + 3) * (5 * x + 11 * y + 7 * x * y + 1)) % 256).toInt
        val v = if (x == 8 && y == variant) (base + 128) % 256 else base
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    Multimodal.imageIoMemCache // encode scratch in memory, once per JVM
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
