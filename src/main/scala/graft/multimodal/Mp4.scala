package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal ISO-BMFF (MP4) container codec — metadata only, from the
  * public ISO/IEC 14496-12 box structure: `moov/mvhd` carries the movie
  * timescale and duration, `moov/trak/tkhd` the track dimensions in
  * 16.16 fixed point. The JDK ships no video codec, so this is the
  * video-arm analog of the WAV/AIFF header parse: real container
  * metadata without sample decode (frame pixels stay out of scope for
  * the engine — swap in a javacv/ffmpeg [[Multimodal.Codec]] for that).
  *
  * [[write]] emits a minimal valid `ftyp + moov(mvhd, trak(tkhd))` tree
  * so fixtures and the parser are independent implementations of the
  * same spec (the NetCdf4↔Hdf5 move).
  */
object Mp4 {

  final case class Meta(widthPx: Int, heightPx: Int, timescale: Long,
                        durationTicks: Long, nTracks: Int)

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
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val size = bb.getInt(o).toLong & 0xffffffffL
        val typ = new String(bytes, o + 4, 4, "US-ASCII")
        val end = if (size == 0) to else (o + size).toInt
        require(size == 0 || size >= 8, s"bad box size $size at $o")
        typ match {
          case "moov" | "trak" => walk(o + 8, end, depth + 1)
          case "mvhd" =>
            val v = bytes(o + 8) & 0xff
            if (v == 1) {
              timescale = bb.getInt(o + 8 + 4 + 16).toLong & 0xffffffffL
              duration = bb.getLong(o + 8 + 4 + 20)
            } else {
              timescale = bb.getInt(o + 8 + 4 + 8).toLong & 0xffffffffL
              duration = bb.getInt(o + 8 + 4 + 12).toLong & 0xffffffffL
            }
          case "tkhd" =>
            tracks += 1
            val v = bytes(o + 8) & 0xff
            // offset of width from the version byte: v0 = 4+20+8+8+36,
            // v1 = 4+32+8+8+36 (times are 64-bit)
            val wOff = o + 8 + (if (v == 1) 88 else 76)
            val tw = bb.getInt(wOff) >>> 16    // 16.16 fixed point
            val th = bb.getInt(wOff + 4) >>> 16
            if (tw > w) { w = tw; h = th } // largest (video) track wins
          case _ => ()
        }
        if (size == 0) o = to else o = end
      }
    }
    walk(0, bytes.length, 0)
    require(timescale > 0, "no mvhd box — not a movie container")
    Meta(w, h, timescale, duration, tracks)
  }

  // ------------------------------------------------------------- write

  def write(widthPx: Int, heightPx: Int, timescale: Long,
            durationTicks: Long): Array[Byte] = {
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
      val b = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)                      // version 0 + flags
      b.putInt(0); b.putInt(0)         // creation, modification
      b.putInt(timescale.toInt)
      b.putInt(durationTicks.toInt)
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
      val b = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      b.putInt(7)                      // version 0, flags enabled|in-movie
      b.putInt(0); b.putInt(0)         // creation, modification
      b.putInt(1)                      // track id
      b.putInt(0)                      // reserved
      b.putInt(durationTicks.toInt)
      b.putInt(0); b.putInt(0)         // reserved
      b.putShort(0); b.putShort(0)     // layer, alternate group
      b.putShort(0); b.putShort(0)     // volume (video track: 0), reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)
      b.putInt(widthPx << 16)          // 16.16
      b.putInt(heightPx << 16)
      b.array()
    })
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov
  }
}
