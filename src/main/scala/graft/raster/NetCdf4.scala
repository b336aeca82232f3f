package graft.raster

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

/** Minimal netCDF-4 (HDF5-container) WRITER — the compressed-output twin
  * of the classic [[NetCdf]] codec (ref: the reference's final results are
  * zlib-compressed netCDF-4, results/netcdf_final_result_writer.py:120-141,
  * which classic CDF-2 cannot express).
  *
  * Emits deliberately OLD-STYLE HDF5 (public File Format Specification):
  * superblock v0, v1 object headers, symbol-table groups (v1 B-tree +
  * SNOD + local heap), v1 attribute messages, contiguous or chunked v3
  * layouts with the deflate filter and v1 B-tree chunk indexes. Old-style
  * is readable by every HDF5 implementation ever shipped — and it is the
  * structural complement of the new-style features (OHDR v2, fractal
  * heaps, dense storage) exercised by the real MERRA-2 fixture in
  * [[graft.ingest.Hdf5]]'s specs, so writer and reader cannot share a
  * blind spot on either family.
  *
  * Dimension scales / DIMENSION_LIST are not written (the in-engine
  * reader falls back to canonical (time,[lev],lat,lon) order; xarray
  * readers see phony dims, exactly how the reference consumes OMI
  * HDF-EOS5 grids via phony_dims="access").
  */
object NetCdf4 {

  private val Undef = Array.fill[Byte](8)(0xff.toByte)

  sealed trait AVal
  final case class AText(s: String) extends AVal
  final case class ADoubles(a: Array[Double]) extends AVal
  final case class AFloats(a: Array[Float]) extends AVal
  final case class AInts(a: Array[Int]) extends AVal
  final case class Attr(name: String, v: AVal)

  sealed trait DData
  final case class F32(a: Array[Float]) extends DData
  final case class F64(a: Array[Double]) extends DData
  final case class I32(a: Array[Int]) extends DData
  /** One fixed-length string (HDF-EOS StructMetadata shape). */
  final case class Str(s: String) extends DData
  /** Compound (record) data, struct-of-arrays: numeric members of equal
    * length, written packed row-wise with a v1 compound datatype.
    */
  final case class Compound(members: Seq[(String, DData)]) extends DData {
    require(members.nonEmpty, "compound needs members")
    require(!members.exists(_._2.isInstanceOf[Str]),
      "string compound members unsupported")
    require(!members.exists(_._2.isInstanceOf[Compound]),
      "nested compound unsupported")
  }

  /** `chunks` + `deflate > 0` → chunked layout with the zlib filter;
    * otherwise contiguous. Chunk dims must divide into the dataspace
    * per HDF5 rules (edge chunks are padded to full size on disk).
    */
  final case class Dset(name: String, dims: Seq[Int], attrs: Seq[Attr],
                        data: DData, chunks: Option[Seq[Int]] = None,
                        deflate: Int = 0)

  final case class Group(name: String, attrs: Seq[Attr] = Nil,
                         dsets: Seq[Dset] = Nil, groups: Seq[Group] = Nil)

  // ------------------------------------------------------------- buffer
  private final class Buf {
    val out = new ByteArrayOutputStream(1 << 16)
    def addr: Long = out.size().toLong
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u16(v.toInt); u16((v >> 16).toInt) }
    def u64(v: Long): Unit = { u32(v); u32(v >> 32) }
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def pad8(): Unit = while (out.size() % 8 != 0) u8(0)
    def result(): Array[Byte] = out.toByteArray
  }

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  // --------------------------------------------------------- datatypes
  private def dtypeBytes(data: DData): (Array[Byte], Int) = {
    val b = new Buf
    data match {
      case F32(_) =>
        b.u8(0x11); b.u8(0x20); b.u8(31); b.u8(0); b.u32(4)
        b.u16(0); b.u16(32); b.u8(23); b.u8(8); b.u8(0); b.u8(23); b.u32(127)
        (b.result(), 4)
      case F64(_) =>
        b.u8(0x11); b.u8(0x20); b.u8(63); b.u8(0); b.u32(8)
        b.u16(0); b.u16(64); b.u8(52); b.u8(11); b.u8(0); b.u8(52); b.u32(1023)
        (b.result(), 8)
      case I32(_) =>
        b.u8(0x10); b.u8(0x08); b.u8(0); b.u8(0); b.u32(4)
        b.u16(0); b.u16(32)
        (b.result(), 4)
      case Str(s) =>
        val n = ascii(s).length + 1
        b.u8(0x13); b.u8(0); b.u8(0); b.u8(0); b.u32(n)
        (b.result(), n)
      case Compound(members) =>
        val parts = members.map { case (name, md) => (name, dtypeBytes(md)) }
        val recSize = parts.map(_._2._2).sum
        b.u8(0x16) // v1, class 6
        b.u8(members.size & 0xff); b.u8((members.size >> 8) & 0xff); b.u8(0)
        b.u32(recSize)
        var off = 0
        parts.foreach { case (name, (mdt, msz)) =>
          val nm = ascii(name)
          b.bytes(nm); b.u8(0)
          var pad = (nm.length + 1) % 8
          while (pad != 0 && pad < 8) { b.u8(0); pad += 1 }
          b.u32(off)
          b.u8(0); b.u8(0); b.u8(0); b.u8(0) // dimensionality + reserved
          b.u32(0); b.u32(0)                 // dim permutation + reserved
          (0 until 4).foreach(_ => b.u32(0)) // dim sizes
          b.bytes(mdt)
          off += msz
        }
        (b.result(), recSize)
    }
  }

  private def attrDtype(v: AVal): (Array[Byte], Array[Byte], Int) = v match {
    case AText(s) =>
      val payload = ascii(s) :+ 0.toByte
      val (dt, _) = dtypeBytes(Str(s))
      (dt, payload, 1)
    case ADoubles(a) =>
      val (dt, _) = dtypeBytes(F64(a))
      val bb = java.nio.ByteBuffer.allocate(a.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      a.foreach(bb.putDouble)
      (dt, bb.array(), a.length)
    case AFloats(a) =>
      val (dt, _) = dtypeBytes(F32(a))
      val bb = java.nio.ByteBuffer.allocate(a.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      a.foreach(bb.putFloat)
      (dt, bb.array(), a.length)
    case AInts(a) =>
      val (dt, _) = dtypeBytes(I32(a))
      val bb = java.nio.ByteBuffer.allocate(a.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      a.foreach(bb.putInt)
      (dt, bb.array(), a.length)
  }

  private def dataspace(dims: Seq[Int]): Array[Byte] = {
    val b = new Buf
    b.u8(1); b.u8(dims.length); b.u8(0); b.u8(0); b.u32(0)
    dims.foreach(d => b.u64(d.toLong))
    b.result()
  }

  private def rawBytes(data: DData): Array[Byte] = data match {
    case F32(a) =>
      val bb = java.nio.ByteBuffer.allocate(a.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      a.foreach(bb.putFloat); bb.array()
    case F64(a) =>
      val bb = java.nio.ByteBuffer.allocate(a.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      a.foreach(bb.putDouble); bb.array()
    case I32(a) =>
      val bb = java.nio.ByteBuffer.allocate(a.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      a.foreach(bb.putInt); bb.array()
    case Str(s) => ascii(s) :+ 0.toByte
    case Compound(members) =>
      val cols = members.map { case (_, md) => rawBytes(md) }
      val szs = members.map { case (_, md) => dtypeBytes(md)._2 }
      val n = members.head._2 match {
        case F32(a) => a.length; case F64(a) => a.length
        case I32(a) => a.length; case _ => 0
      }
      val rec = szs.sum
      val out = new Array[Byte](n * rec)
      var i = 0
      while (i < n) {
        var off = i * rec
        var m = 0
        while (m < cols.length) {
          System.arraycopy(cols(m), i * szs(m), out, off, szs(m))
          off += szs(m); m += 1
        }
        i += 1
      }
      out
  }

  // ------------------------------------------------ v1 header messages
  /** One v1 object-header message: type, 8-aligned body. */
  private final case class Msg(mtype: Int, body: Array[Byte])

  private def msgBlock(msgs: Seq[Msg]): Array[Byte] = {
    val b = new Buf
    msgs.foreach { m =>
      val padded = (m.body.length + 7) / 8 * 8
      b.u16(m.mtype); b.u16(padded); b.u8(0); b.u8(0); b.u8(0); b.u8(0)
      b.bytes(m.body)
      var i = m.body.length
      while (i < padded) { b.u8(0); i += 1 }
    }
    b.result()
  }

  private def objectHeader(buf: Buf, msgs: Seq[Msg]): Long = {
    buf.pad8()
    val addr = buf.addr
    val block = msgBlock(msgs)
    buf.u8(1); buf.u8(0)           // version, reserved
    buf.u16(msgs.length)
    buf.u32(1)                     // reference count
    buf.u32(block.length.toLong)   // header size
    buf.u32(0)                     // padding to 8-align message block
    buf.bytes(block)
    addr
  }

  private def attrMsg(a: Attr): Msg = {
    val (dt, payload, n) = attrDtype(a.v)
    val ds = dataspace(if (n == 1) Nil else Seq(n))
    val name = ascii(a.name) :+ 0.toByte
    def pad8(x: Int) = (x + 7) / 8 * 8
    val b = new Buf
    b.u8(1); b.u8(0)
    b.u16(name.length); b.u16(dt.length); b.u16(ds.length)
    b.bytes(name); (name.length until pad8(name.length)).foreach(_ => b.u8(0))
    b.bytes(dt); (dt.length until pad8(dt.length)).foreach(_ => b.u8(0))
    b.bytes(ds); (ds.length until pad8(ds.length)).foreach(_ => b.u8(0))
    b.bytes(payload)
    Msg(0x0C, b.result())
  }

  // ------------------------------------------------------------ chunks
  private def deflate(data: Array[Byte], level: Int): Array[Byte] = {
    val d = new Deflater(level)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](65536)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Split row-major data into full-size (edge-padded) chunks. */
  private def chunkSlices(raw: Array[Byte], dims: Seq[Int], cdims: Seq[Int],
                          elsz: Int): Seq[(Seq[Int], Array[Byte])] = {
    val rank = dims.length
    val starts = dims.indices.map(i => 0 until dims(i) by cdims(i))
    def cross(idx: Int): Seq[Seq[Int]] =
      if (idx == rank) Seq(Nil)
      else for (s <- starts(idx); rest <- cross(idx + 1)) yield s +: rest
    cross(0).map { offs =>
      val chunk = new Array[Byte](cdims.product * elsz)
      val lastC = cdims(rank - 1); val lastD = dims(rank - 1)
      val run = math.min(lastC, lastD - offs(rank - 1))
      val outerC = cdims.dropRight(1)
      val idx = Array.fill(math.max(rank - 1, 1))(0)
      val outer = outerC.product
      var it = 0
      while (it < math.max(outer, 1)) {
        val inRange = (0 until rank - 1).forall(i => offs(i) + idx(i) < dims(i))
        if (inRange) {
          var src = 0L
          (0 until rank - 1).foreach(i => src = src * dims(i) + offs(i) + idx(i))
          src = src * lastD + offs(rank - 1)
          var dst = 0L
          (0 until rank - 1).foreach(i => dst = dst * cdims(i) + idx(i))
          dst *= lastC
          System.arraycopy(raw, (src * elsz).toInt, chunk, (dst * elsz).toInt,
            run * elsz)
        }
        var j = rank - 2; var carry = true
        while (j >= 0 && carry) {
          idx(j) += 1
          if (idx(j) < cdims(j)) carry = false else idx(j) = 0
          j -= 1
        }
        it += 1
      }
      (offs, chunk)
    }
  }

  // ----------------------------------------------------------- dataset
  private def writeDataset(buf: Buf, ds: Dset): Long = {
    val (dt, elsz) = dtypeBytes(ds.data)
    val raw = rawBytes(ds.data)
    val n = if (ds.dims.isEmpty) 1 else ds.dims.product
    require(raw.length == n * elsz || ds.data.isInstanceOf[Str],
      s"dataset ${ds.name}: ${raw.length} bytes != $n x $elsz")
    val layout: Msg = (ds.chunks, ds.deflate) match {
      case (Some(cd), lvl) if lvl > 0 =>
        require(cd.length == ds.dims.length, "chunk rank mismatch")
        // chunk data first, then the v1 btree over it
        val entries = chunkSlices(raw, ds.dims, cd, elsz).map { case (offs, chunk) =>
          val packed = deflate(chunk, lvl)
          buf.pad8()
          val caddr = buf.addr
          buf.bytes(packed)
          (offs, caddr, packed.length)
        }
        buf.pad8()
        val btree = buf.addr
        val rank = ds.dims.length
        buf.bytes(ascii("TREE")); buf.u8(1); buf.u8(0); buf.u16(entries.length)
        buf.bytes(Undef); buf.bytes(Undef)
        entries.foreach { case (offs, caddr, csz) =>
          buf.u32(csz.toLong); buf.u32(0)
          offs.foreach(o => buf.u64(o.toLong)); buf.u64(0) // elem-dim offset
          buf.u64(caddr)
        }
        // final (greatest) key
        buf.u32(0); buf.u32(0)
        ds.dims.foreach(dim => buf.u64(dim.toLong)); buf.u64(0)
        val b = new Buf
        b.u8(3); b.u8(2); b.u8(rank + 1)
        b.u64(btree)
        cd.foreach(c => b.u32(c.toLong)); b.u32(elsz.toLong)
        Msg(0x08, b.result())
      case _ =>
        buf.pad8()
        val daddr = buf.addr
        buf.bytes(raw)
        val b = new Buf
        b.u8(3); b.u8(1); b.u64(daddr); b.u64(raw.length.toLong)
        Msg(0x08, b.result())
    }
    val filters: Seq[Msg] = (ds.chunks, ds.deflate) match {
      case (Some(_), lvl) if lvl > 0 =>
        val b = new Buf
        b.u8(1); b.u8(1); (0 until 6).foreach(_ => b.u8(0))
        b.u16(1); b.u16(0); b.u16(0); b.u16(1) // deflate, unnamed, 1 client value
        b.u32(lvl.toLong); b.u32(0)            // level + odd-count pad
        Seq(Msg(0x0B, b.result()))
      case _ => Nil
    }
    val dsDims = ds.data match {
      case Str(_) => Nil // scalar string dataset
      case _ => ds.dims
    }
    val msgs = Seq(Msg(0x01, dataspace(dsDims)), Msg(0x03, dt)) ++
      filters ++ Seq(layout) ++ ds.attrs.map(attrMsg)
    objectHeader(buf, msgs)
  }

  // ------------------------------------------------------------ groups
  private def writeGroup(buf: Buf, g: Group): Long = {
    val children: Seq[(String, Long)] =
      (g.dsets.map(d => d.name -> writeDataset(buf, d)) ++
        g.groups.map(sub => sub.name -> writeGroup(buf, sub))).sortBy(_._1)
    // local heap: empty string at 0, then each name 8-aligned
    val heapData = new Buf
    heapData.u8(0); heapData.pad8()
    val nameOffs = children.map { case (name, _) =>
      heapData.pad8()
      val off = heapData.addr
      heapData.bytes(ascii(name) :+ 0.toByte)
      off
    }
    heapData.pad8()
    val hd = heapData.result()
    buf.pad8()
    val heapSeg = buf.addr
    buf.bytes(hd)
    buf.pad8()
    val heapAddr = buf.addr
    buf.bytes(ascii("HEAP")); buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0)
    buf.u64(hd.length.toLong); buf.bytes(Undef); buf.u64(heapSeg)
    // one SNOD with all entries, name-sorted
    buf.pad8()
    val snod = buf.addr
    buf.bytes(ascii("SNOD")); buf.u8(1); buf.u8(0); buf.u16(children.length)
    children.zip(nameOffs).foreach { case ((_, oaddr), noff) =>
      buf.u64(noff); buf.u64(oaddr); buf.u32(0); buf.u32(0)
      (0 until 16).foreach(_ => buf.u8(0))
    }
    // group btree: one leaf entry pointing at the SNOD
    buf.pad8()
    val btree = buf.addr
    buf.bytes(ascii("TREE")); buf.u8(0); buf.u8(0); buf.u16(1)
    buf.bytes(Undef); buf.bytes(Undef)
    buf.u64(0)                                   // key 0: before-first name
    buf.u64(snod)
    buf.u64(nameOffs.lastOption.getOrElse(0L))   // key 1: greatest name
    val stMsg = { val b = new Buf; b.u64(btree); b.u64(heapAddr); Msg(0x11, b.result()) }
    objectHeader(buf, stMsg +: g.attrs.map(attrMsg))
  }

  /** Serialize a group tree (the root's name is ignored) to HDF5 bytes. */
  def writeBytes(root: Group): Array[Byte] = {
    val buf = new Buf
    // superblock v0 placeholder (96 bytes), patched once root is known
    (0 until 96).foreach(_ => buf.u8(0))
    val rootAddr = writeGroup(buf, root)
    val eof = buf.addr
    val out = buf.result()
    val sb = new Buf
    sb.bytes(Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    sb.u8(0); sb.u8(0); sb.u8(0); sb.u8(0)  // sb/fs/root-group/reserved versions
    sb.u8(0); sb.u8(8); sb.u8(8); sb.u8(0)  // shared-hdr ver, offsets, lengths
    sb.u16(4); sb.u16(16)                    // group leaf K, internal K
    sb.u32(0)                                // consistency flags
    sb.u64(0)                                // base address
    sb.bytes(Undef)                          // free-space address
    sb.u64(eof)                              // end of file
    sb.bytes(Undef)                          // driver info
    sb.u64(0)                                // root STE: link name offset
    sb.u64(rootAddr)                         //           object header
    sb.u32(0); sb.u32(0)                     // cache type, reserved
    (0 until 16).foreach(_ => sb.u8(0))      // scratch
    val sbb = sb.result()
    System.arraycopy(sbb, 0, out, 0, sbb.length)
    out
  }

  def write(root: Group, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, writeBytes(root))
  }
}
