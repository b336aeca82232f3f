package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal ISO-BMFF (MP4) container codec — from the public ISO/IEC
  * 14496-12 box structure: `moov/mvhd` carries the movie timescale and
  * duration, `moov/trak/tkhd` the track dimensions in 16.16 fixed
  * point, and `moov/trak/mdia/minf/stbl` the sample tables — `stsd`
  * (codec fourcc), `stts` (decode timeline sample counts), `stsz`
  * (sample count + byte sizes), `stsc` (sample-to-chunk runs) and
  * `stco` (chunk offsets), which is how real tooling locates samples
  * without decoding them. [[sampleRanges]] walks stsz+stsc+stco into
  * per-sample byte extents, which makes ONE codec lane fully real:
  * MJPEG-in-MP4, whose samples are ordinary JPEG images the JDK's
  * ImageIO decodes ([[ImageHash.videoKeyframeHashes]]). Every other
  * codec (avc1/hev1/av01…) stays metadata-only — the JDK ships no
  * inter-frame video decoder; swap in a javacv/ffmpeg
  * [[Multimodal.Codec]] for those.
  *
  * [[write]] emits a minimal valid `ftyp + moov(mvhd, trak(tkhd,
  * mdia(minf(stbl(stsd, stts, stsz)))))` tree so fixtures and the parser
  * are independent implementations of the same spec (the NetCdf4↔Hdf5
  * move); it switches to version-1 (64-bit) mvhd/tkhd boxes when the
  * duration exceeds the unsigned-32 slot instead of truncating.
  *
  * Box sizes are validated against the enclosing extent before any
  * recursion or field read, so truncated or hostile payloads fail with a
  * precise "bad box size" error rather than a raw IndexOutOfBounds.
  */
object Mp4 {

  final case class Meta(widthPx: Int, heightPx: Int, timescale: Long,
                        durationTicks: Long, nTracks: Int,
                        codec: String = "", nSamples: Long = 0L,
                        sampleBytes: Long = 0L)

  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      new String(bytes, 4, 4, "US-ASCII") == "ftyp"

  // ------------------------------------------------------------- parse

  def parseMeta(bytes: Array[Byte]): Meta = {
    require(isMp4(bytes),
      s"undecodable video payload (${bytes.length} bytes) — not an " +
        "ISO-BMFF container (no ftyp box)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var timescale = 0L; var duration = 0L
    var w = 0; var h = 0; var tracks = 0
    var codec = ""; var nSamples = 0L; var sampleBytes = 0L
    // sample tables belong to the WINNING trak (largest video track, the
    // same rule as the dimensions); tkhd precedes mdia inside trak, so a
    // flag set at tkhd scopes the stbl handlers below it
    var inWinner = false
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val size = bb.getInt(o).toLong & 0xffffffffL
        val typ = new String(bytes, o + 4, 4, "US-ASCII")
        require(size == 0 || (size >= 8 && o.toLong + size <= to),
          s"bad box size $size at offset $o (extent $to) — truncated or " +
            "corrupt container")
        val end = if (size == 0) to else (o + size).toInt
        // every leaf handler reads header fields at fixed offsets from
        // `o` — require the box to actually CONTAIN them, or an 8–19
        // byte box would read the following box's bytes and the abort
        // message would misattribute the corruption (or, worse, parse
        // garbage as a sample table)
        def need(n: Int): Unit = require(end - o >= n,
          s"$typ box too small (${end - o} bytes, need >= $n) — " +
            "truncated or corrupt container")
        typ match {
          case "moov" | "mdia" | "minf" | "stbl" => walk(o + 8, end, depth + 1)
          case "trak" =>
            walk(o + 8, end, depth + 1)
            inWinner = false
          case "mvhd" =>
            need(9)
            val v = bytes(o + 8) & 0xff
            need(if (v == 1) 40 else 28)
            if (v == 1) {
              timescale = bb.getInt(o + 8 + 4 + 16).toLong & 0xffffffffL
              duration = bb.getLong(o + 8 + 4 + 20)
            } else {
              timescale = bb.getInt(o + 8 + 4 + 8).toLong & 0xffffffffL
              duration = bb.getInt(o + 8 + 4 + 12).toLong & 0xffffffffL
            }
          case "tkhd" =>
            tracks += 1
            need(9)
            val v = bytes(o + 8) & 0xff
            need(if (v == 1) 104 else 92)
            // offset of width from the version byte: v0 = 4+20+8+8+36,
            // v1 = 4+32+8+8+36 (times are 64-bit)
            val wOff = o + 8 + (if (v == 1) 88 else 76)
            val tw = bb.getInt(wOff) >>> 16    // 16.16 fixed point
            val th = bb.getInt(wOff + 4) >>> 16
            inWinner = tw > w || tracks == 1
            if (inWinner) { // largest (video) track wins, sample state too
              w = tw; h = th
              codec = ""; nSamples = 0L; sampleBytes = 0L
            }
          case "stsd" if inWinner =>
            // ver/flags + entry_count, then the first sample entry:
            // size + format fourcc (the codec identifier)
            if (end - o >= 8 + 8 + 8 && bb.getInt(o + 8 + 4) >= 1)
              codec = new String(bytes, o + 8 + 8 + 4, 4, "US-ASCII")
          case "stts" if inWinner =>
            need(16)
            val n = bb.getInt(o + 8 + 4).toLong & 0xffffffffL
            require(o.toLong + 8 + 8 + 8 * n <= end,
              s"stts entry count $n exceeds box extent")
            // only used as the sample-count fallback when stsz is absent
            if (nSamples == 0) {
              var i = 0; var total = 0L
              while (i < n) {
                total += bb.getInt(o + 8 + 8 + 8 * i).toLong & 0xffffffffL
                i += 1
              }
              nSamples = total
            }
          case "stsz" if inWinner =>
            need(20)
            val fixed = bb.getInt(o + 8 + 4).toLong & 0xffffffffL
            val n = bb.getInt(o + 8 + 8).toLong & 0xffffffffL
            nSamples = n
            if (fixed != 0) sampleBytes = fixed * n
            else {
              require(o.toLong + 8 + 12 + 4 * n <= end,
                s"stsz sample count $n exceeds box extent")
              var i = 0; var total = 0L
              while (i < n) {
                total += bb.getInt(o + 8 + 12 + 4 * i).toLong & 0xffffffffL
                i += 1
              }
              sampleBytes = total
            }
          case _ => ()
        }
        if (size == 0) o = to else o = end
      }
    }
    walk(0, bytes.length, 0)
    require(timescale > 0, "no mvhd box — not a movie container")
    Meta(w, h, timescale, duration, tracks, codec, nSamples, sampleBytes)
  }

  /** Per-sample byte extents `(offset, size)` of the winning (largest)
    * video track, from the stsz size table, stsc sample-to-chunk runs
    * and stco chunk offsets — the standard sample walk (14496-12
    * §8.7): chunk k (1-based) holds `samples_per_chunk` of the last
    * stsc run whose `first_chunk ≤ k`; within a chunk, samples are
    * contiguous from the chunk's stco offset in stsz order. Extents
    * are validated against the file length, so a truncated mdat fails
    * precisely here, not inside a decoder.
    */
  def sampleRanges(bytes: Array[Byte]): Seq[(Long, Int)] = {
    require(isMp4(bytes),
      s"undecodable video payload (${bytes.length} bytes) — not an " +
        "ISO-BMFF container (no ftyp box)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var w = 0; var tracks = 0; var inWinner = false
    var sizes: Array[Int] = Array.emptyIntArray
    var stsc: Array[(Long, Long)] = Array.empty    // (first_chunk, per_chunk)
    var stco: Array[Long] = Array.emptyLongArray
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val size = bb.getInt(o).toLong & 0xffffffffL
        val typ = new String(bytes, o + 4, 4, "US-ASCII")
        require(size == 0 || (size >= 8 && o.toLong + size <= to),
          s"bad box size $size at offset $o (extent $to) — truncated or " +
            "corrupt container")
        val end = if (size == 0) to else (o + size).toInt
        // same fixed-offset-containment rule as [[parseMeta]]'s walk: an
        // 8–19-byte sample-table box must fail HERE, not read the next
        // box's bytes as its own header fields
        def need(n: Int): Unit = require(end - o >= n,
          s"$typ box too small (${end - o} bytes, need >= $n) — " +
            "truncated or corrupt container")
        typ match {
          case "moov" | "mdia" | "minf" | "stbl" => walk(o + 8, end)
          case "trak" => walk(o + 8, end); inWinner = false
          case "tkhd" =>
            tracks += 1
            need(9)
            val v = bytes(o + 8) & 0xff
            need(if (v == 1) 104 else 92)
            val wOff = o + 8 + (if (v == 1) 88 else 76)
            val tw = bb.getInt(wOff) >>> 16
            inWinner = tw > w || tracks == 1
            if (inWinner) {
              w = tw
              sizes = Array.emptyIntArray; stsc = Array.empty
              stco = Array.emptyLongArray
            }
          case "stsz" if inWinner =>
            need(20)
            val fixed = bb.getInt(o + 8 + 4)
            val n = bb.getInt(o + 8 + 8)
            require(n >= 0, s"negative stsz sample count $n")
            if (fixed != 0) {
              // bound the allocation by what the file could possibly
              // hold — a hostile count must fail loud, not OOM
              require(fixed > 0 && n.toLong * fixed <= bytes.length,
                s"stsz fixed-size table ($n x $fixed bytes) exceeds the " +
                  s"file length ${bytes.length} — truncated or corrupt " +
                  "container")
              sizes = Array.fill(n)(fixed)
            }
            else {
              require(o.toLong + 8 + 12 + 4L * n <= end,
                s"stsz sample count $n exceeds box extent")
              sizes = Array.tabulate(n)(i => bb.getInt(o + 8 + 12 + 4 * i))
            }
          case "stsc" if inWinner =>
            need(16)
            val n = bb.getInt(o + 8 + 4)
            require(n >= 0 && o.toLong + 8 + 8 + 12L * n <= end,
              s"stsc entry count $n exceeds box extent")
            stsc = Array.tabulate(n) { i =>
              (bb.getInt(o + 8 + 8 + 12 * i).toLong & 0xffffffffL,
                bb.getInt(o + 8 + 8 + 12 * i + 4).toLong & 0xffffffffL)
            }
          case "stco" if inWinner =>
            need(16)
            val n = bb.getInt(o + 8 + 4)
            require(n >= 0 && o.toLong + 8 + 8 + 4L * n <= end,
              s"stco entry count $n exceeds box extent")
            stco = Array.tabulate(n)(i =>
              bb.getInt(o + 8 + 8 + 4 * i).toLong & 0xffffffffL)
          case "co64" if inWinner =>
            // the 64-bit chunk-offset twin (14496-12 §8.7.5) — files
            // past 4 GiB address chunks through co64, same table shape
            // with 8-byte entries
            need(16)
            val n = bb.getInt(o + 8 + 4)
            require(n >= 0 && o.toLong + 8 + 8 + 8L * n <= end,
              s"co64 entry count $n exceeds box extent")
            stco = Array.tabulate(n) { i =>
              val v = bb.getLong(o + 8 + 8 + 8 * i)
              require(v >= 0, s"negative co64 chunk offset $v")
              v
            }
          case _ => ()
        }
        if (size == 0) o = to else o = end
      }
    }
    walk(0, bytes.length)
    if (sizes.isEmpty) return Seq.empty
    require(stco.nonEmpty && stsc.nonEmpty,
      "stsz present but stsc/stco missing — samples not locatable")
    val out = Seq.newBuilder[(Long, Int)]
    var si = 0
    var chunk = 1L
    while (si < sizes.length && chunk <= stco.length) {
      // samples_per_chunk of the last run whose first_chunk ≤ chunk
      val per = stsc.foldLeft(0L) { case (acc, (fc, n)) =>
        if (fc <= chunk) n else acc }
      require(per > 0, s"no stsc run covers chunk $chunk")
      var off = stco((chunk - 1).toInt)
      var j = 0L
      while (j < per && si < sizes.length) {
        val sz = sizes(si)
        require(sz >= 0 && off + sz <= bytes.length,
          s"sample $si extent [$off, ${off + sz}) exceeds file length " +
            s"${bytes.length} — truncated mdat")
        out += ((off, sz))
        off += sz; si += 1; j += 1
      }
      chunk += 1
    }
    require(si == sizes.length,
      s"stco chunks exhausted with ${sizes.length - si} samples unplaced")
    out.result()
  }

  // ------------------------------------------------------------- write

  val MaxU32: Long = 0xffffffffL

  def write(widthPx: Int, heightPx: Int, timescale: Long,
            durationTicks: Long, codec: String = "",
            sampleSizes: Seq[Int] = Nil): Array[Byte] =
    build(widthPx, heightPx, timescale, durationTicks, codec, sampleSizes,
      samples = None)

  /** [[write]] with REAL sample payloads: the frames land in an `mdat`
    * box addressed by `stsc` + `stco` — the layout [[sampleRanges]]
    * (or any 14496-12 reader) walks back to the exact bytes. With JPEG
    * frames and fourcc `jpeg` this is Motion JPEG in MP4 — the one
    * codec lane the JDK can decode end-to-end.
    *
    * Layout knobs (defaults reproduce the original single-chunk
    * fixture byte-for-byte; the rest exist so the fuzz corpus covers
    * the general §8.7 walk, not just the layout this writer favors):
    *   - `samplesPerChunk` — partition of the samples into chunks;
    *     consecutive equal sizes RLE-compress into one stsc run (the
    *     "last run whose first_chunk ≤ k" logic real muxers emit);
    *   - `useCo64` — address chunks through the 64-bit `co64` table;
    *   - `fixedStsz` — emit the constant-sample-size stsz form
    *     (`sample_size != 0`, no table; all samples must be equal);
    *   - `chunkGap` — junk bytes between chunks inside mdat (chunks
    *     need not be contiguous; only samples within a chunk are).
    */
  def writeWithSamples(widthPx: Int, heightPx: Int, timescale: Long,
                       durationTicks: Long, codec: String,
                       samples: Seq[Array[Byte]],
                       samplesPerChunk: Seq[Int] = Nil,
                       useCo64: Boolean = false,
                       fixedStsz: Boolean = false,
                       chunkGap: Int = 0): Array[Byte] = {
    require(samples.nonEmpty, "writeWithSamples needs at least one sample")
    require(samplesPerChunk.isEmpty ||
      (samplesPerChunk.forall(_ >= 1) &&
        samplesPerChunk.sum == samples.length),
      s"samplesPerChunk ${samplesPerChunk.mkString(",")} must partition " +
        s"${samples.length} samples into >=1-sample chunks")
    require(!fixedStsz || samples.map(_.length).distinct.size == 1,
      "fixedStsz needs all samples the same size")
    require(chunkGap >= 0, s"negative chunkGap $chunkGap")
    build(widthPx, heightPx, timescale, durationTicks, codec,
      samples.map(_.length), samples = Some(samples),
      samplesPerChunk =
        if (samplesPerChunk.isEmpty) Seq(samples.length) else samplesPerChunk,
      useCo64 = useCo64, fixedStsz = fixedStsz, chunkGap = chunkGap)
  }

  private def build(widthPx: Int, heightPx: Int, timescale: Long,
                    durationTicks: Long, codec: String,
                    sampleSizes: Seq[Int],
                    samples: Option[Seq[Array[Byte]]],
                    samplesPerChunk: Seq[Int] = Nil,
                    useCo64: Boolean = false,
                    fixedStsz: Boolean = false,
                    chunkGap: Int = 0): Array[Byte] = {
    require(timescale >= 1 && timescale <= MaxU32,
      s"mvhd timescale $timescale outside the unsigned-32 slot")
    require(durationTicks >= 0, s"negative duration $durationTicks")
    require(codec.isEmpty || codec.length == 4,
      s"codec fourcc must be 4 chars, got '$codec'")
    // version-1 boxes carry 64-bit durations; v0 whenever it fits
    val v1 = durationTicks > MaxU32
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(8 + payload.length)
      bb.put(typ.getBytes("US-ASCII")); bb.put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val b = ByteBuffer.allocate(12)
      b.put("isom".getBytes); b.putInt(0); b.put("isom".getBytes); b.array()
    })
    val mvhd = box("mvhd", {
      val b = ByteBuffer.allocate(if (v1) 112 else 100)
        .order(ByteOrder.BIG_ENDIAN)
      if (v1) {
        b.putInt(0x01000000)           // version 1 + flags
        b.putLong(0); b.putLong(0)     // creation, modification (64-bit)
        b.putInt(timescale.toInt)
        b.putLong(durationTicks)
      } else {
        b.putInt(0)                    // version 0 + flags
        b.putInt(0); b.putInt(0)       // creation, modification
        b.putInt(timescale.toInt)
        b.putInt(durationTicks.toInt)
      }
      b.putInt(0x00010000)             // rate 1.0
      b.putShort(0x0100.toShort)       // volume 1.0
      b.putShort(0); b.putInt(0); b.putInt(0) // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)             // identity matrix
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(2)                      // next track id
      b.array()
    })
    val tkhd = box("tkhd", {
      val b = ByteBuffer.allocate(if (v1) 96 else 84)
        .order(ByteOrder.BIG_ENDIAN)
      if (v1) {
        b.putInt(0x01000007)           // version 1, flags enabled|in-movie
        b.putLong(0); b.putLong(0)     // creation, modification (64-bit)
        b.putInt(1)                    // track id
        b.putInt(0)                    // reserved
        b.putLong(durationTicks)
      } else {
        b.putInt(7)                    // version 0, flags enabled|in-movie
        b.putInt(0); b.putInt(0)       // creation, modification
        b.putInt(1)                    // track id
        b.putInt(0)                    // reserved
        b.putInt(durationTicks.toInt)
      }
      b.putInt(0); b.putInt(0)         // reserved
      b.putShort(0); b.putShort(0)     // layer, alternate group
      b.putShort(0); b.putShort(0)     // volume (video track: 0), reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)
      b.putInt(widthPx << 16)          // 16.16
      b.putInt(heightPx << 16)
      b.array()
    })
    // sample tables — emitted only when the fixture declares samples
    def stbl(chunkOffsets: Seq[Long]): Array[Byte] =
      if (codec.isEmpty && sampleSizes.isEmpty) Array.emptyByteArray
      else {
        val stsd = box("stsd", {
          // ver/flags + entry_count + one minimal visual sample entry
          // (size + fourcc + 78 zero bytes, the VisualSampleEntry shell)
          val entry = ByteBuffer.allocate(86).order(ByteOrder.BIG_ENDIAN)
          entry.putInt(86)
          entry.put((if (codec.isEmpty) "avc1" else codec).getBytes("US-ASCII"))
          val b = ByteBuffer.allocate(8 + 86).order(ByteOrder.BIG_ENDIAN)
          b.putInt(0); b.putInt(1); b.put(entry.array()); b.array()
        })
        val n = sampleSizes.length
        val stts = box("stts", {
          val b = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
          b.putInt(0); b.putInt(1)     // one run covering every sample
          b.putInt(n)
          b.putInt(if (n == 0) 0
                   else math.max(1, (durationTicks / math.max(1, n)).toInt))
          b.array()
        })
        val stsz = box("stsz",
          if (fixedStsz) {
            // constant-sample-size form: sample_size != 0, NO table
            val b = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
            b.putInt(0); b.putInt(sampleSizes.head); b.putInt(n)
            b.array()
          } else {
            val b = ByteBuffer.allocate(12 + 4 * n).order(ByteOrder.BIG_ENDIAN)
            b.putInt(0); b.putInt(0)   // ver/flags, sample_size 0 → table
            b.putInt(n)
            sampleSizes.foreach(b.putInt)
            b.array()
          })
        // sample addressing only when real payloads ride along
        val addr = if (samples.isEmpty) Array.emptyByteArray else {
          // stsc runs: RLE over per-chunk sample counts — real muxers
          // emit one run per STRETCH of equal-sized chunks, and the
          // reader's "last run whose first_chunk ≤ k" walk must expand
          // them back
          val runs = samplesPerChunk.zipWithIndex.foldLeft(
            List.empty[(Int, Int)]) { case (acc, (per, i)) =>
            acc match {
              case (fc, p) :: _ if p == per => acc
              case _ => (i + 1, per) :: acc
            }
          }.reverse
          val stsc = box("stsc", {
            val b = ByteBuffer.allocate(8 + 12 * runs.length)
              .order(ByteOrder.BIG_ENDIAN)
            b.putInt(0); b.putInt(runs.length)
            runs.foreach { case (firstChunk, per) =>
              b.putInt(firstChunk); b.putInt(per); b.putInt(1)
            }
            b.array()
          })
          val offsets =
            if (useCo64) box("co64", {
              val b = ByteBuffer.allocate(8 + 8 * chunkOffsets.length)
                .order(ByteOrder.BIG_ENDIAN)
              b.putInt(0); b.putInt(chunkOffsets.length)
              chunkOffsets.foreach(b.putLong)
              b.array()
            })
            else box("stco", {
              // exact allocation — an over-allocated buffer would
              // append garbage bytes the in-repo walk ignores but
              // strict 14496-12 readers reject
              val b = ByteBuffer.allocate(8 + 4 * chunkOffsets.length)
                .order(ByteOrder.BIG_ENDIAN)
              b.putInt(0); b.putInt(chunkOffsets.length)
              chunkOffsets.foreach { off =>
                require(off <= MaxU32,
                  s"stco offset $off > u32 — write with useCo64")
                b.putInt(off.toInt)
              }
              b.array()
            })
          stsc ++ offsets
        }
        box("mdia", box("minf", box("stbl", stsd ++ stts ++ stsz ++ addr)))
      }
    def moov(chunkOffsets: Seq[Long]): Array[Byte] =
      box("moov", mvhd ++ box("trak", tkhd ++ stbl(chunkOffsets)))
    samples match {
      case None => ftyp ++ moov(Nil)
      case Some(frames) =>
        // chunk offsets point INTO the file — size the header with
        // dummy offsets first (box sizes depend only on the offset
        // COUNT), then rebuild with the real ones
        val chunks = {
          var rest = frames
          samplesPerChunk.map { per =>
            val (c, r) = rest.splitAt(per); rest = r; c
          }
        }
        val chunkBytes = chunks.map(_.map(_.length).sum)
        val gap = Array.fill[Byte](chunkGap)(0x55)
        val payload = chunks.map(_.reduce(_ ++ _))
          .reduceLeft((a, b) => a ++ gap ++ b)
        val headerLen =
          ftyp.length + moov(Seq.fill(chunks.length)(0L)).length
        val firstSample = headerLen + 8L // past the mdat size+type
        val offsets = chunkBytes.init.scanLeft(firstSample)(
          (acc, sz) => acc + sz + chunkGap)
        val mdat = box("mdat", payload)
        ftyp ++ moov(offsets) ++ mdat
    }
  }
}
