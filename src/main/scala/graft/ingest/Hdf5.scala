package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** Minimal from-spec HDF5 reader — enough of the public HDF5 File Format
  * Specification (v3, hdfgroup.org) to decode netCDF-4 / HDF-EOS5 science
  * granules in-engine, with no native library:
  *
  *   - superblock v0/v1 (old style) and v2/v3;
  *   - object headers v1 and v2 ("OHDR"), with continuation blocks;
  *   - groups both old-style (symbol-table message → v1 B-tree → SNOD →
  *     local heap) and new-style (compact link messages, or dense links in
  *     a fractal heap indexed by a v2 B-tree);
  *   - attributes compact (message 0x0C v1-v3) or dense (attribute-info
  *     message → fractal heap + v2 B-tree);
  *   - dataspace v1/v2; datatypes: fixed-point, IEEE float, fixed string,
  *     object reference, and vlen (strings and reference sequences — the
  *     netCDF-4 `DIMENSION_LIST`), both endiannesses;
  *   - data layouts v3: compact, contiguous, and chunked via the v1
  *     B-tree chunk index, with the deflate (1), shuffle (2) and
  *     fletcher32 (3) filters; unallocated chunks fall back to the
  *     fill-value message.
  *
  * Scope: read-only random access over an in-memory byte array — granules
  * are a few MB and arrive via `binaryFiles`, so there is no streaming IO
  * here by design (ref granule use: collectors/ned/data_reader_merra.py:26-98,
  * data_reader_omno2d.py:33-159). Compound (record) datatypes decode
  * struct-of-arrays (v1/v2/v3 member layouts; numeric and fixed-string
  * members). Features science granules do not use (v4 layouts,
  * szip/nbit/scale-offset filters, huge fractal-heap objects, B-tree v2
  * depth > 1, vlen/enum/array compound members) throw with a precise
  * message instead of misreading.
  */
object Hdf5 {

  val Magic: Array[Byte] =
    Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')

  def isHdf5(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes.take(8).sameElements(Magic)

  private val Undef = -1L // 0xffffffffffffffff as signed

  // ------------------------------------------------------------ values

  sealed trait AttrVal
  final case class Text(s: String) extends AttrVal
  final case class Nums(a: Array[Double]) extends AttrVal
  /** Object-reference lists: one Array[addr] per dataspace element (the
    * shape of netCDF-4's DIMENSION_LIST — one vlen of refs per dim). */
  final case class RefLists(a: Array[Array[Long]]) extends AttrVal

  sealed trait Data
  final case class NumData(a: Array[Double]) extends Data
  final case class StrData(a: Array[String]) extends Data
  /** Compound (record) dataset, decoded struct-of-arrays. */
  final case class CompoundData(members: Seq[(String, Data)]) extends Data

  final case class Member(name: String, offset: Int, dtype: Dtype)
  final case class Dtype(cls: Int, size: Int, signed: Boolean,
                         bigEndian: Boolean, vlenIsString: Boolean,
                         members: Seq[Member] = Nil)

  final case class Dataset(name: String, dims: Array[Int],
                           attrs: Map[String, AttrVal], data: Data) {
    def doubles: Array[Double] = data match {
      case NumData(a) => a
      case StrData(_) => throw new IllegalArgumentException(
        s"dataset $name is a string dataset")
    }
    def text: String = data match {
      case StrData(a) => a.mkString
      case NumData(_) => throw new IllegalArgumentException(
        s"dataset $name is numeric")
    }
    /** Compound member by name (throws on non-compound datasets). */
    def member(n: String): Data = data match {
      case CompoundData(ms) => ms.collectFirst { case (`n`, v) => v }
        .getOrElse(throw new IllegalArgumentException(
          s"dataset $name has no member '$n' (members: ${ms.map(_._1).mkString(",")})"))
      case _ => throw new IllegalArgumentException(s"dataset $name is not compound")
    }
    def memberDoubles(n: String): Array[Double] = member(n) match {
      case NumData(a) => a
      case _ => throw new IllegalArgumentException(s"member $n is not numeric")
    }
    def attrText(n: String): Option[String] = attrs.get(n).collect {
      case Text(s) => s
    }
    def attrNum(n: String): Option[Double] = attrs.get(n).collect {
      case Nums(a) if a.nonEmpty => a(0)
    }
  }

  /** Open an in-memory HDF5 file. */
  def read(bytes: Array[Byte]): File = new File(bytes)

  final class File(val d: Array[Byte]) {
    require(isHdf5(d), "not an HDF5 file (bad signature)")

    private def u8(o: Long): Int = d(o.toInt) & 0xff
    private def u16(o: Long): Int =
      (d(o.toInt) & 0xff) | ((d(o.toInt + 1) & 0xff) << 8)
    private def u32(o: Long): Long = {
      var v = 0L; var i = 3
      while (i >= 0) { v = (v << 8) | (d(o.toInt + i) & 0xff); i -= 1 }
      v
    }
    private def u64(o: Long): Long = {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (d(o.toInt + i) & 0xff); i -= 1 }
      v
    }
    private def ui(o: Long, n: Int): Long = {
      var v = 0L; var i = n - 1
      while (i >= 0) { v = (v << 8) | (d(o.toInt + i) & 0xff); i -= 1 }
      v
    }
    private def sig(o: Long): String =
      new String(d, o.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)

    // -------------------------------------------------------- superblock
    private val sbVersion = u8(8)
    val rootAddr: Long = sbVersion match {
      case 0 | 1 =>
        require(u8(13) == 8 && u8(14) == 8, "only 8-byte offsets/lengths")
        val base = if (sbVersion == 0) 24L else 28L
        // 4 file addresses, then the root symbol-table entry:
        // link name offset (8) + object header address (8)
        u64(base + 4 * 8 + 8)
      case 2 | 3 =>
        require(u8(9) == 8 && u8(10) == 8, "only 8-byte offsets/lengths")
        u64(12 + 3 * 8)
      case v => throw new IllegalArgumentException(s"superblock v$v")
    }

    // ---------------------------------------------------- object headers
    /** (type, bodyOffset, size) of every non-NIL message of the header. */
    private def messages(addr: Long): Seq[(Int, Long, Int)] = {
      val out = Vector.newBuilder[(Int, Long, Int)]
      if (sig(addr) == "OHDR") {
        var o = addr + 4
        val ver = u8(o); o += 1
        require(ver == 2, s"OHDR v$ver")
        val flags = u8(o); o += 1
        if ((flags & 0x20) != 0) o += 16 // 4 timestamps
        if ((flags & 0x10) != 0) o += 4  // compact/dense phase bounds
        val szsz = 1 << (flags & 0x3)
        val chunk0 = ui(o, szsz); o += szsz
        msgsV2(o, chunk0, flags, out)
      } else {
        require(u8(addr) == 1, f"object header v${u8(addr)} @ $addr%#x")
        val chunk0 = u32(addr + 8)
        msgsV1(addr + 16, chunk0, out)
      }
      out.result()
    }

    private def msgsV2(start: Long, size: Long, ohFlags: Int,
                       out: collection.mutable.Builder[(Int, Long, Int), Vector[(Int, Long, Int)]]): Unit = {
      val hdr = 4 + (if ((ohFlags & 0x04) != 0) 2 else 0)
      var o = start
      val end = start + size
      while (o + hdr <= end) {
        val mt = u8(o); val ms = u16(o + 1); o += hdr
        if (mt == 0x10) { // continuation: OCHK sig + messages + checksum
          val caddr = u64(o); val clen = u64(o + 8)
          require(sig(caddr) == "OCHK", "bad continuation block")
          msgsV2(caddr + 4, clen - 8, ohFlags, out)
        } else if (mt != 0) out += ((mt, o, ms))
        o += ms
      }
    }

    private def msgsV1(start: Long, size: Long,
                       out: collection.mutable.Builder[(Int, Long, Int), Vector[(Int, Long, Int)]]): Unit = {
      var o = start
      val end = start + size
      while (o + 8 <= end) {
        val mt = u16(o); val ms = u16(o + 2); o += 8
        if (mt == 0x10) {
          val caddr = u64(o); val clen = u64(o + 8)
          msgsV1(caddr, clen, out)
        } else if (mt != 0) out += ((mt, o, ms))
        o += ms
      }
    }

    // ------------------------------------------------------------ groups
    /** Child links (name → object header address) of a group, across all
      * three storage styles.
      */
    def children(groupAddr: Long): Seq[(String, Long)] = {
      val msgs = messages(groupAddr)
      val out = Vector.newBuilder[(String, Long)]
      msgs.foreach {
        case (0x06, o, _) => out += parseLink(o)           // compact link
        case (0x11, o, _) =>                               // old-style group
          val btree = u64(o); val heap = u64(o + 8)
          oldGroupLinks(btree, heap, out)
        case (0x02, o, _) =>                               // link info
          var p = o + 2
          val flags = u8(o + 1)
          if ((flags & 1) != 0) p += 8
          val fheapAddr = u64(p); val nameBt = u64(p + 8)
          if (fheapAddr != Undef) {                        // dense links
            val fh = fheapInfo(fheapAddr)
            btree2Records(nameBt).foreach { rec =>
              // type-5 record: hash(4) + heap ID (7 bytes)
              val (off, _) = fheapObject(fh, rec + 4, 7)
              out += parseLink(off)
            }
          }
        case _ =>
      }
      out.result()
    }

    private def parseLink(start: Long): (String, Long) = {
      var o = start
      require(u8(o) == 1, "link message v" + u8(o)); o += 1
      val flags = u8(o); o += 1
      var ltype = 0
      if ((flags & 0x08) != 0) { ltype = u8(o); o += 1 }
      if ((flags & 0x04) != 0) o += 8 // creation order
      if ((flags & 0x10) != 0) o += 1 // charset
      val lsz = 1 << (flags & 0x3)
      val nlen = ui(o, lsz).toInt; o += lsz
      val name = new String(d, o.toInt, nlen, java.nio.charset.StandardCharsets.UTF_8)
      o += nlen
      require(ltype == 0, s"link '$name' is not a hard link")
      (name, u64(o))
    }

    private def oldGroupLinks(btreeAddr: Long, heapAddr: Long,
                              out: collection.mutable.Builder[(String, Long), Vector[(String, Long)]]): Unit = {
      require(sig(heapAddr) == "HEAP", "bad local heap")
      val dataSeg = u64(heapAddr + 8 + 16)
      def walk(addr: Long): Unit = sig(addr) match {
        case "TREE" =>
          val level = u8(addr + 5); val nent = u16(addr + 6)
          var p = addr + 8 + 16 // skip siblings
          // group keys are heap offsets (8), children follow each key
          var i = 0
          while (i < nent) {
            val child = u64(p + 8); p += 16
            walk(child)
            i += 1
          }
        case "SNOD" =>
          val nsyms = u16(addr + 6)
          var p = addr + 8
          var i = 0
          while (i < nsyms) {
            val nameOff = u64(p); val objAddr = u64(p + 8)
            var e = (dataSeg + nameOff).toInt
            val s = e
            while (d(e) != 0) e += 1
            out += ((new String(d, s, e - s,
              java.nio.charset.StandardCharsets.UTF_8), objAddr))
            p += 40 // entry: 8 + 8 + 4 + 4 + 16 scratch
            i += 1
          }
        case other => throw new IllegalArgumentException(
          s"unexpected node '$other' in old-style group")
      }
      walk(btreeAddr)
    }

    // ------------------------------------------------------- dataspaces
    private def parseDataspace(o: Long): Array[Long] = {
      val ver = u8(o); val rank = u8(o + 1)
      val base = if (ver == 1) o + 8 else o + 4
      Array.tabulate(rank)(i => u64(base + 8L * i))
    }

    // -------------------------------------------------------- datatypes
    /** Test seam: parse a datatype message at a raw byte offset (the
      * in-repo writer only emits v1 compounds, so externally-shaped v3
      * encodings are pinned against hand-built message bytes).
      */
    private[graft] def datatypeAt(o: Long): Dtype = parseDatatype(o)

    private def parseDatatype(o: Long): Dtype = {
      val cv = u8(o); val cls = cv & 0xf
      val b0 = u8(o + 1)
      val size = u32(o + 4).toInt
      cls match {
        case 0 => Dtype(0, size, (b0 & 0x08) != 0, (b0 & 1) != 0, false)
        case 1 => Dtype(1, size, signed = true, (b0 & 1) != 0, false)
        case 3 => Dtype(3, size, signed = false, bigEndian = false, false)
        case 7 => Dtype(7, size, signed = false, bigEndian = false, false)
        case 9 => Dtype(9, size, signed = false, bigEndian = false,
          vlenIsString = (b0 & 0xf) == 1)
        case 6 => try {
          val version = cv >> 4
          val nMembers = u8(o + 1) | (u8(o + 2) << 8)
          var p = o + 8
          val members = Seq.newBuilder[Member]
          var k = 0
          while (k < nMembers) {
            // member name: NUL-terminated; v1/v2 pad to 8 bytes, v3 not
            var e = p
            while (u8(e) != 0) e += 1
            val name = new String(d, p.toInt, (e - p).toInt, "UTF-8")
            p = if (version <= 2) p + ((e - p) / 8 + 1) * 8 else e + 1
            val off = version match {
              case 1 | 2 => val v = u32(p); p += 4; v
              case 3 =>
                // offset width per H5VM_limit_enc_size: bytes needed to
                // hold the compound SIZE itself, i.e. floor(log2(size))/8
                // + 1 — a size of exactly 256 encodes in 2 bytes (256
                // needs 9 bits), so the limit comparison is inclusive
                var nb = 1; var lim = 256L
                while (lim <= size) { nb += 1; lim *= 256 }
                val v = ui(p, nb); p += nb; v
              case v => throw new IllegalArgumentException(s"compound v$v")
            }
            if (version == 1) p += 4 + 4 + 4 + 16 // dimensionality+perm+resv+dims
            val mdt = parseDatatype(p)
            p += 8 + (mdt.cls match {
              case 0 => 4
              case 1 => 12
              case 3 => 0
              case c => throw new IllegalArgumentException(
                s"compound member class $c unsupported")
            })
            members += Member(name, off.toInt, mdt)
            k += 1
          }
          Dtype(6, size, signed = false, bigEndian = false, false,
            members.result())
        } catch { case _: IllegalArgumentException =>
          // members this reader can't walk (vlen/reference/nested —
          // MERRA-2 carries a reference-typed compound ATTRIBUTE):
          // surface an opaque compound; attribute reads skip it, dataset
          // reads reject it with a precise message
          Dtype(6, size, signed = false, bigEndian = false, false)
        }
        // other classes (enum, array, …) surface with their id;
        // dataset reads reject them, attribute reads skip them
        case c => Dtype(c, size, signed = false, bigEndian = false, false)
      }
    }

    /** Decode `n` elements at `off`, `stride` bytes apart (stride =
      * element size for packed arrays; the enclosing record size for
      * compound members).
      */
    private def decode(dt: Dtype, buf: Array[Byte], off: Int, n: Int,
                       stride0: Int = -1): AnyRef = {
      val stride = if (stride0 > 0) stride0 else dt.size
      val order = if (dt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
      dt.cls match {
        case 1 =>
          val bb = ByteBuffer.wrap(buf).order(order)
          val a = new Array[Double](n)
          var i = 0
          while (i < n) {
            a(i) = if (dt.size == 4) bb.getFloat(off + i * stride).toDouble
                   else bb.getDouble(off + i * stride)
            i += 1
          }
          a
        case 0 =>
          val bb = ByteBuffer.wrap(buf).order(order)
          val a = new Array[Double](n)
          var i = 0
          while (i < n) {
            val p = off + i * stride
            val v: Long = dt.size match {
              case 1 => if (dt.signed) bb.get(p).toLong else (bb.get(p) & 0xffL)
              case 2 => if (dt.signed) bb.getShort(p).toLong
                        else bb.getShort(p) & 0xffffL
              case 4 => if (dt.signed) bb.getInt(p).toLong
                        else bb.getInt(p) & 0xffffffffL
              case 8 => bb.getLong(p)
              case s => throw new IllegalArgumentException(s"int size $s")
            }
            a(i) = v.toDouble
            i += 1
          }
          a
        case 3 =>
          Array.tabulate(n) { i =>
            val s = off + i * stride
            var e = s
            while (e < s + dt.size && buf(e) != 0) e += 1
            new String(buf, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
          }
        case 7 =>
          val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
          Array.tabulate(n)(i => bb.getLong(off + i * stride)): Array[Long]
        case c => throw new IllegalArgumentException(s"decode class $c")
      }
    }

    /** Resolve a vlen element (length, global-heap addr, index). */
    private def vlenElem(buf: Array[Byte], off: Int): (Int, Array[Byte]) = {
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      val n = bb.getInt(off)
      val gaddr = bb.getLong(off + 4)
      val gidx = bb.getInt(off + 12)
      (n, globalHeap(gaddr, gidx))
    }

    private def globalHeap(addr: Long, idx: Int): Array[Byte] = {
      require(sig(addr) == "GCOL", "bad global heap collection")
      var o = addr + 16
      while (true) {
        val hidx = u16(o); val sz = u64(o + 8)
        if (hidx == idx) return java.util.Arrays.copyOfRange(
          d, (o + 16).toInt, (o + 16 + sz).toInt)
        if (hidx == 0) throw new IllegalArgumentException("global heap object not found")
        o += 16 + (sz + 7) / 8 * 8
      }
      throw new IllegalStateException("unreachable")
    }

    // ------------------------------------------------------- attributes
    /** All attributes of an object — compact messages and dense storage. */
    def attributes(addr: Long): Map[String, AttrVal] =
      attributesOf(messages(addr))

    private def attributesOf(msgs: Seq[(Int, Long, Int)]): Map[String, AttrVal] = {
      val out = Map.newBuilder[String, AttrVal]
      msgs.foreach {
        case (0x0C, o, _) => parseAttr(o).foreach(out += _)
        case (0x15, o, _) =>
          val flags = u8(o + 1)
          var p = o + 2
          if ((flags & 1) != 0) p += 2
          val fheapAddr = u64(p); val nameBt = u64(p + 8)
          if (fheapAddr != Undef) {
            val fh = fheapInfo(fheapAddr)
            btree2Records(nameBt).foreach { rec =>
              // type-8 record: heap ID (8) + flags(1) + corder(4) + hash(4)
              val (off, _) = fheapObject(fh, rec, 8)
              parseAttr(off).foreach(out += _)
            }
          }
        case _ =>
      }
      out.result()
    }

    /** None for attribute datatypes the model can't represent (compound
      * REFERENCE_LIST etc.) — metadata consumers don't need them and a
      * granule read must not die on them.
      */
    private def parseAttr(start: Long): Option[(String, AttrVal)] = {
      val ver = u8(start)
      val nsz = u16(start + 2); val dtsz = u16(start + 4); val dssz = u16(start + 6)
      def pad8(x: Int) = (x + 7) / 8 * 8
      var p = start + (if (ver == 1) 8 else if (ver == 2) 8 else 9)
      require(ver >= 1 && ver <= 3, s"attribute message v$ver")
      var e = p.toInt
      while (d(e) != 0) e += 1
      val name = new String(d, p.toInt, e - p.toInt,
        java.nio.charset.StandardCharsets.UTF_8)
      p += (if (ver == 1) pad8(nsz) else nsz)
      val dt = parseDatatype(p)
      p += (if (ver == 1) pad8(dtsz) else dtsz)
      val dims = parseDataspace(p)
      p += (if (ver == 1) pad8(dssz) else dssz)
      val n = dims.foldLeft(1L)(_ * _).toInt
      val v: Option[AttrVal] = dt.cls match {
        case 3 =>
          Some(Text(decode(dt, d, p.toInt, n).asInstanceOf[Array[String]].mkString))
        case 0 | 1 =>
          Some(Nums(decode(dt, d, p.toInt, n).asInstanceOf[Array[Double]]))
        case 9 if dt.vlenIsString =>
          Some(Text(Array.tabulate(n) { i =>
            val (len, bytes) = vlenElem(d, p.toInt + i * 16)
            new String(bytes, 0, len, java.nio.charset.StandardCharsets.UTF_8)
          }.mkString))
        case 9 => // vlen sequences — netCDF-4 DIMENSION_LIST (refs per dim)
          Some(RefLists(Array.tabulate(n) { i =>
            val (len, bytes) = vlenElem(d, p.toInt + i * 16)
            val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
            Array.tabulate(len)(j => bb.getLong(j * 8))
          }))
        case 7 =>
          Some(RefLists(Array(decode(dt, d, p.toInt, n).asInstanceOf[Array[Long]])))
        case _ => None
      }
      v.map(name -> _)
    }

    // ----------------------------------------------------- fractal heap
    private case class FHeap(idlen: Int, flags: Int, maxManaged: Long,
                             width: Int, start: Long, maxDirect: Long,
                             maxBits: Int, root: Long, rootRows: Int)

    private def fheapInfo(addr: Long): FHeap = {
      require(sig(addr) == "FRHP", "bad fractal heap header")
      var o = addr + 5
      val idlen = u16(o); o += 2
      val iof = u16(o); o += 2
      require(iof == 0, "filtered fractal heaps unsupported")
      val flags = u8(o); o += 1
      val maxManaged = u32(o); o += 4
      o += 12 * 8
      val width = u16(o); o += 2
      val start = u64(o); o += 8
      val maxDirect = u64(o); o += 8
      val maxBits = u16(o); o += 2
      o += 2
      val root = u64(o); o += 8
      val rootRows = u16(o)
      FHeap(idlen, flags, maxManaged, width, start, maxDirect, maxBits,
        root, rootRows)
    }

    private def minBytes(v0: Long): Int = {
      var v = v0; var n = 0
      while (v > 0) { n += 1; v >>= 8 }
      math.max(n, 1)
    }

    /** File offset + length of the managed heap object whose heap ID is
      * at `idOff` (ID occupies `idlen` bytes).
      */
    private def fheapObject(fh: FHeap, idOff: Long, idlen: Int): (Long, Int) = {
      val b0 = u8(idOff)
      val typ = (b0 >> 4) & 0x3
      require(typ == 0, s"fractal heap ID type $typ (huge/tiny) unsupported")
      val offsz = (fh.maxBits + 7) / 8
      val lensz = minBytes(fh.maxManaged)
      require(1 + offsz + lensz <= idlen, "fractal heap ID layout mismatch")
      val off = ui(idOff + 1, offsz)
      val len = ui(idOff + 1 + offsz, lensz).toInt
      // locate the direct block holding heap offset `off` (offsets cover
      // block headers too, so file offset = block addr + delta)
      val (baddr, boff) =
        if (fh.rootRows == 0) (fh.root, 0L)
        else {
          require(sig(fh.root) == "FHIB", "bad root indirect block")
          val entries = fh.root + 4 + 1 + 8 + offsz
          var blkOff = 0L
          var i = 0
          var found: (Long, Long) = null
          var r = 0
          while (r < fh.rootRows && found == null) {
            val size = if (r <= 1) fh.start else fh.start << (r - 1)
            require(size <= fh.maxDirect, "indirect-block children unsupported")
            var c = 0
            while (c < fh.width && found == null) {
              if (off >= blkOff && off < blkOff + size)
                found = (u64(entries + i * 8L), blkOff)
              blkOff += size
              i += 1
              c += 1
            }
            r += 1
          }
          require(found != null, "heap offset beyond root indirect rows")
          found
        }
      require(sig(baddr) == "FHDB", "bad fractal heap direct block")
      (baddr + (off - boff), len)
    }

    // -------------------------------------------------------- v2 B-tree
    /** Record start offsets, in key order. Depth ≤ 1. */
    private def btree2Records(addr: Long): Seq[Long] = {
      require(sig(addr) == "BTHD", "bad v2 btree header")
      val nodeSz = u32(addr + 6).toInt
      val recSz = u16(addr + 10)
      val depth = u16(addr + 12)
      val root = u64(addr + 16)
      val nrec = u16(addr + 24)
      require(depth <= 1, s"v2 btree depth $depth unsupported")
      val out = Vector.newBuilder[Long]
      def node(a: Long, n: Int, lvl: Int): Unit = {
        val o = a + 6
        if (lvl == 0) {
          require(sig(a) == "BTLF", "bad v2 btree leaf")
          var i = 0
          while (i < n) { out += o + i.toLong * recSz; i += 1 }
        } else {
          require(sig(a) == "BTIN", "bad v2 btree internal node")
          val maxRec = (nodeSz - 10) / recSz
          val nsz = minBytes(maxRec)
          var p = o + n.toLong * recSz
          var i = 0
          while (i <= n) {
            val caddr = u64(p); p += 8
            val cn = ui(p, nsz).toInt; p += nsz
            node(caddr, cn, lvl - 1)
            if (i < n) out += o + i.toLong * recSz
            i += 1
          }
        }
      }
      node(root, nrec, depth)
      out.result()
    }

    // ---------------------------------------------------------- layout
    private sealed trait Layout
    private case class Compact(off: Long, size: Int) extends Layout
    private case class Contiguous(addr: Long, size: Long) extends Layout
    private case class Chunked(btree: Long, chunkDims: Array[Int]) extends Layout

    private def parseLayout(o: Long): Layout = {
      val ver = u8(o)
      require(ver == 3, s"data layout v$ver unsupported")
      u8(o + 1) match {
        case 0 => Compact(o + 4, u16(o + 2))
        case 1 => Contiguous(u64(o + 2), u64(o + 10))
        case 2 =>
          val rank = u8(o + 2) // includes the trailing element-size "dim"
          val btree = u64(o + 3)
          Chunked(btree, Array.tabulate(rank)(i => u32(o + 11 + 4L * i).toInt))
        case c => throw new IllegalArgumentException(s"layout class $c")
      }
    }

    private def parseFilters(o: Long): Seq[(Int, Array[Long])] = {
      val ver = u8(o)
      val out = Vector.newBuilder[(Int, Array[Long])]
      if (ver == 1) {
        val n = u8(o + 1)
        var p = o + 8
        var i = 0
        while (i < n) {
          val fid = u16(p); val nlen = u16(p + 2); val ncl = u16(p + 6)
          p += 8 + (nlen + 7) / 8 * 8
          out += ((fid, Array.tabulate(ncl)(j => u32(p + 4L * j))))
          p += 4L * ncl
          if (ncl % 2 == 1) p += 4
          i += 1
        }
      } else {
        require(ver == 2, s"filter pipeline v$ver")
        val n = u8(o + 1)
        var p = o + 2
        var i = 0
        while (i < n) {
          val fid = u16(p); p += 2
          var nlen = 0
          if (fid >= 256) { nlen = u16(p); p += 2 }
          val ncl = u16(p + 2); p += 4
          p += nlen
          out += ((fid, Array.tabulate(ncl)(j => u32(p + 4L * j))))
          p += 4L * ncl
          i += 1
        }
      }
      out.result()
    }

    // ------------------------------------------------------- fill value
    /** Raw fill-value bytes, if the message defines one. */
    private def parseFill(o: Long): Option[Array[Byte]] = {
      val ver = u8(o)
      if (ver == 1 || ver == 2) {
        val defined = u8(o + 3)
        if (defined == 0) None
        else {
          val sz = u32(o + 4).toInt
          if (sz == 0) None
          else Some(java.util.Arrays.copyOfRange(d, (o + 8).toInt, (o + 8).toInt + sz))
        }
      } else {
        val flags = u8(o + 1)
        if ((flags & 0x20) == 0) None
        else {
          val sz = u32(o + 2).toInt
          if (sz == 0) None
          else Some(java.util.Arrays.copyOfRange(d, (o + 6).toInt, (o + 6).toInt + sz))
        }
      }
    }

    // ---------------------------------------------------- chunked reads
    private def v1ChunkEntries(addr: Long, rank: Int,
                               out: collection.mutable.Builder[(Array[Long], Long, Int, Int), Vector[(Array[Long], Long, Int, Int)]]): Unit = {
      if (addr == Undef) return
      require(sig(addr) == "TREE", "bad chunk btree node")
      val ntype = u8(addr + 4); val level = u8(addr + 5); val nent = u16(addr + 6)
      require(ntype == 1, "not a chunk btree")
      var p = addr + 8 + 16
      val keysz = 8 + 8L * (rank + 1)
      var i = 0
      while (i < nent) {
        val child = u64(p + keysz)
        if (level == 0) {
          val csz = u32(p).toInt
          val mask = u32(p + 4).toInt
          val offs = Array.tabulate(rank)(j => u64(p + 8 + 8L * j))
          out += ((offs, child, csz, mask))
        } else v1ChunkEntries(child, rank, out)
        p += keysz + 8
        i += 1
      }
    }

    private def inflate(src: Array[Byte], hint: Int): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(src)
      val out = new java.io.ByteArrayOutputStream(math.max(hint, 1024))
      val buf = new Array[Byte](65536)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput())
          throw new IllegalArgumentException("truncated deflate chunk")
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    }

    private def unshuffle(src: Array[Byte], elsz: Int): Array[Byte] = {
      if (elsz <= 1) return src
      val n = src.length / elsz
      val out = new Array[Byte](src.length)
      var j = 0
      while (j < elsz) {
        var i = 0
        while (i < n) {
          out(i * elsz + j) = src(j * n + i)
          i += 1
        }
        j += 1
      }
      out
    }

    /** Copy one chunk into the row-major destination (partial edge chunks
      * clipped), by contiguous last-dimension runs.
      */
    private def copyChunk(dst: Array[Byte], chunk: Array[Byte],
                          dims: Array[Long], cshape: Array[Int],
                          offs: Array[Long], elsz: Int): Unit = {
      val rank = dims.length
      if (rank == 0) { System.arraycopy(chunk, 0, dst, 0, elsz); return }
      val lastC = cshape(rank - 1)
      val lastD = dims(rank - 1)
      val run = math.min(lastC.toLong, lastD - offs(rank - 1)).toInt
      if (run <= 0) return
      var outer = 1L
      var k = 0
      while (k < rank - 1) { outer *= cshape(k); k += 1 }
      val idx = new Array[Long](math.max(rank - 1, 1))
      var it = 0L
      while (it < outer) {
        var ok = true
        var i = 0
        while (i < rank - 1) {
          if (offs(i) + idx(i) >= dims(i)) ok = false
          i += 1
        }
        if (ok) {
          var src = 0L
          i = 0
          while (i < rank - 1) { src = src * cshape(i) + idx(i); i += 1 }
          src *= lastC
          var dstIdx = 0L
          i = 0
          while (i < rank - 1) { dstIdx = dstIdx * dims(i) + offs(i) + idx(i); i += 1 }
          dstIdx = dstIdx * lastD + offs(rank - 1)
          System.arraycopy(chunk, (src * elsz).toInt, dst, (dstIdx * elsz).toInt,
            run * elsz)
        }
        // odometer over the outer dims
        var j = rank - 2
        var carry = true
        while (j >= 0 && carry) {
          idx(j) += 1
          if (idx(j) < cshape(j)) carry = false else idx(j) = 0
          j -= 1
        }
        it += 1
      }
    }

    // ----------------------------------------------------- dataset read
    def dataset(name: String, addr: Long): Dataset = {
      val msgs = messages(addr)
      var dims: Array[Long] = Array.empty
      var dt: Dtype = null
      var layout: Layout = null
      var filters: Seq[(Int, Array[Long])] = Nil
      var fill: Option[Array[Byte]] = None
      msgs.foreach {
        case (0x01, o, _) => dims = parseDataspace(o)
        case (0x03, o, _) => dt = parseDatatype(o)
        case (0x05, o, _) => fill = parseFill(o)
        case (0x08, o, _) => layout = parseLayout(o)
        case (0x0B, o, _) => filters = parseFilters(o)
        case _ =>
      }
      require(dt != null && layout != null, s"dataset $name lacks type/layout")
      val n = dims.foldLeft(1L)(_ * _)
      val elsz = dt.size
      val raw: Array[Byte] = layout match {
        case Compact(off, size) =>
          java.util.Arrays.copyOfRange(d, off.toInt, off.toInt + size)
        case Contiguous(a, size) =>
          if (a == Undef) fillBuffer(n, elsz, fill)
          else java.util.Arrays.copyOfRange(d, a.toInt, (a + size).toInt)
        case Chunked(btree, cdims) =>
          val rank = cdims.length - 1 // last entry is the element size
          require(rank == dims.length, s"chunk rank mismatch in $name")
          val cshape = cdims.take(rank)
          val buf = fillBuffer(n, elsz, fill)
          val entries = Vector.newBuilder[(Array[Long], Long, Int, Int)]
          v1ChunkEntries(btree, rank, entries)
          entries.result().foreach { case (offs, caddr, csz, mask) =>
            var data = java.util.Arrays.copyOfRange(d, caddr.toInt, caddr.toInt + csz)
            filters.reverseIterator.zipWithIndex.foreach { case ((fid, cl), ri) =>
              val fi = filters.length - 1 - ri
              val skipped = (mask & (1 << fi)) != 0
              if (!skipped) fid match {
                case 1 => data = inflate(data, cshape.product * elsz)
                case 2 =>
                  val sz = if (cl.nonEmpty) cl(0).toInt else elsz
                  data = unshuffle(data, sz)
                case 3 => data = java.util.Arrays.copyOfRange(data, 0, data.length - 4)
                case f => throw new IllegalArgumentException(
                  s"filter $f unsupported (szip/nbit/scale-offset not implemented)")
              }
            }
            copyChunk(buf, data, dims, cshape, offs, elsz)
          }
          buf
      }
      val data: Data = dt.cls match {
        case 0 | 1 =>
          NumData(decode(dt, raw, 0, n.toInt).asInstanceOf[Array[Double]])
        case 3 =>
          StrData(decode(dt, raw, 0, n.toInt).asInstanceOf[Array[String]])
        case 6 =>
          require(dt.members.nonEmpty,
            s"dataset $name: compound with undecodable members (vlen/ref/nested)")
          CompoundData(dt.members.map { m =>
            val v = decode(m.dtype, raw, m.offset, n.toInt, dt.size)
            m.name -> (m.dtype.cls match {
              case 3 => StrData(v.asInstanceOf[Array[String]])
              case _ => NumData(v.asInstanceOf[Array[Double]])
            })
          })
        case c => throw new IllegalArgumentException(
          s"dataset $name: class $c data unsupported")
      }
      Dataset(name, dims.map(_.toInt), attributesOf(msgs), data)
    }

    private def fillBuffer(n: Long, elsz: Int, fill: Option[Array[Byte]]): Array[Byte] = {
      val buf = new Array[Byte]((n * elsz).toInt)
      fill.foreach { fv =>
        if (fv.length == elsz && fv.exists(_ != 0)) {
          var i = 0
          while (i < buf.length) { buf(i) = fv(i % elsz); i += 1 }
        }
      }
      buf
    }

    // ---------------------------------------------------- group helpers
    /** Follow a `/`-separated path of group links from the root. */
    def resolve(path: String): Long =
      path.split('/').filter(_.nonEmpty).foldLeft(rootAddr) { (addr, seg) =>
        children(addr).collectFirst { case (`seg`, a) => a }.getOrElse(
          throw new IllegalArgumentException(
            s"no child '$seg' under path (have ${children(addr).map(_._1).mkString(", ")})"))
      }

    def rootAttributes: Map[String, AttrVal] = attributes(rootAddr)
  }
}
