package graft.raster

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal NetCDF classic (CDF-2, 64-bit offset) writer/reader.
  *
  * The reference's terminal artifact is a CF-1.8 NetCDF file
  * (ref: results/netcdf_final_result_writer.py:46-153, via h5netcdf).
  * No HDF5/NetCDF JVM library ships here, but the CLASSIC NetCDF format
  * (NASA/Unidata "NetCDF Classic Format Specification") is a small fixed
  * big-endian layout, implemented directly: header (magic, dim list, attr
  * list, var list) + contiguous variable data. Every mainstream consumer
  * (netCDF4, xarray, GDAL, ncdump) reads classic files natively, so the
  * artifact is interoperable even though the container predates HDF5 —
  * the documented divergence is no zlib chunk compression (classic has
  * none; the cube is MBs, not GBs, so size is immaterial).
  *
  * Supported types cover the artifact's needs: CHAR attrs, INT / FLOAT /
  * DOUBLE variables, fixed dimensions only (no unlimited/record dim).
  */
object NetCdf {

  val NcByte = 1; val NcChar = 2; val NcShort = 3
  val NcInt = 4; val NcFloat = 5; val NcDouble = 6

  sealed trait Value {
    def ncType: Int
    def nelems: Int
    def byteSize: Int = nelems * typeSize(ncType)
  }
  final case class Text(s: String) extends Value {
    def ncType = NcChar; def nelems = s.getBytes("UTF-8").length
  }
  final case class Ints(a: Array[Int]) extends Value {
    def ncType = NcInt; def nelems = a.length
  }
  final case class Floats(a: Array[Float]) extends Value {
    def ncType = NcFloat; def nelems = a.length
  }
  final case class Doubles(a: Array[Double]) extends Value {
    def ncType = NcDouble; def nelems = a.length
  }

  def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort         => 2
    case NcInt | NcFloat => 4
    case NcDouble        => 8
    case other           => throw new IllegalArgumentException(s"nc_type $other")
  }

  final case class Dim(name: String, length: Int)
  final case class Attr(name: String, value: Value)
  /** `dims` are indexes into the file's dim list, outermost first. */
  final case class Var(name: String, dims: Seq[Int], attrs: Seq[Attr], data: Value)
  final case class File(dims: Seq[Dim], gatts: Seq[Attr], vars: Seq[Var]) {
    def dim(name: String): Dim = dims.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"dim $name"))
    def variable(name: String): Var = vars.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"variable $name"))
    def attr(v: Var, name: String): Option[Value] =
      v.attrs.find(_.name == name).map(_.value)
  }

  private val TagDim = 0x0a
  private val TagVar = 0x0b
  private val TagAttr = 0x0c

  // ------------------------------------------------------------- write

  private def pad4(n: Int): Int = (n + 3) & ~3

  private def putName(bb: ByteBuffer, name: String): Unit = {
    val b = name.getBytes("UTF-8")
    bb.putInt(b.length).put(b)
    (b.length until pad4(b.length)).foreach(_ => bb.put(0.toByte))
  }

  private def putValues(bb: ByteBuffer, v: Value): Unit = {
    v match {
      case Text(s)    => bb.put(s.getBytes("UTF-8"))
      case Ints(a)    => a.foreach(bb.putInt)
      case Floats(a)  => a.foreach(bb.putFloat)
      case Doubles(a) => a.foreach(bb.putDouble)
    }
    (v.byteSize until pad4(v.byteSize)).foreach(_ => bb.put(0.toByte))
  }

  private def nameBytes(n: String): Int = 4 + pad4(n.getBytes("UTF-8").length)
  private def attrBytes(a: Attr): Int =
    nameBytes(a.name) + 8 + pad4(a.value.byteSize)
  private def attrListBytes(as: Seq[Attr]): Int = 8 + as.map(attrBytes).sum
  private def varHeaderBytes(v: Var): Int =
    nameBytes(v.name) + 4 + v.dims.length * 4 + attrListBytes(v.attrs) + 4 + 4 + 8

  private def putAttrList(bb: ByteBuffer, as: Seq[Attr]): Unit = {
    if (as.isEmpty) { bb.putInt(0); bb.putInt(0) }
    else {
      bb.putInt(TagAttr); bb.putInt(as.length)
      as.foreach { a =>
        putName(bb, a.name)
        bb.putInt(a.value.ncType); bb.putInt(a.value.nelems)
        putValues(bb, a.value)
      }
    }
  }

  /** Data bytes of a var on disk, padded to the 4-byte boundary. */
  private def vsize(v: Var): Int = pad4(v.data.byteSize)

  def write(file: File, path: String): Unit = {
    file.vars.foreach { v =>
      val expect = v.dims.map(file.dims(_).length.toLong).product
      require(v.data.nelems == expect,
        s"${v.name}: data has ${v.data.nelems} elems, dims imply $expect")
    }
    val headerSize =
      4 + 4 + // magic + numrecs
        (8 + file.dims.map(d => nameBytes(d.name) + 4).sum) +
        attrListBytes(file.gatts) +
        (8 + file.vars.map(varHeaderBytes).sum)
    val total = headerSize + file.vars.map(vsize).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    bb.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(2.toByte) // CDF-2
    bb.putInt(0) // numrecs (no record dim)
    if (file.dims.isEmpty) { bb.putInt(0); bb.putInt(0) }
    else {
      bb.putInt(TagDim); bb.putInt(file.dims.length)
      file.dims.foreach { d => putName(bb, d.name); bb.putInt(d.length) }
    }
    putAttrList(bb, file.gatts)
    if (file.vars.isEmpty) { bb.putInt(0); bb.putInt(0) }
    else {
      bb.putInt(TagVar); bb.putInt(file.vars.length)
      var begin = headerSize.toLong
      file.vars.foreach { v =>
        putName(bb, v.name)
        bb.putInt(v.dims.length)
        v.dims.foreach(bb.putInt)
        putAttrList(bb, v.attrs)
        bb.putInt(v.data.ncType)
        bb.putInt(vsize(v))
        bb.putLong(begin) // CDF-2: 64-bit begin
        begin += vsize(v)
      }
    }
    file.vars.foreach(v => putValues(bb, v.data))
    require(bb.position() == total, s"netcdf size bug: ${bb.position()} != $total")
    Files.write(Paths.get(path), bb.array())
  }

  // ------------------------------------------------------------- read

  private def getName(bb: ByteBuffer): String = {
    val len = bb.getInt()
    val b = new Array[Byte](len)
    bb.get(b)
    bb.position(bb.position() + (pad4(len) - len))
    new String(b, "UTF-8")
  }

  private def getValues(bb: ByteBuffer, ncType: Int, nelems: Int): Value = {
    val v = ncType match {
      case NcChar =>
        val b = new Array[Byte](nelems); bb.get(b); Text(new String(b, "UTF-8"))
      case NcInt    => Ints(Array.fill(nelems)(bb.getInt()))
      case NcFloat  => Floats(Array.fill(nelems)(bb.getFloat()))
      case NcDouble => Doubles(Array.fill(nelems)(bb.getDouble()))
      case other => throw new IllegalArgumentException(s"unsupported nc_type $other")
    }
    val raw = nelems * typeSize(ncType)
    bb.position(bb.position() + (pad4(raw) - raw))
    v
  }

  private def getAttrList(bb: ByteBuffer): Seq[Attr] = {
    val tag = bb.getInt(); val n = bb.getInt()
    require(tag == TagAttr || (tag == 0 && n == 0), s"bad attr tag $tag")
    (0 until n).map { _ =>
      val name = getName(bb)
      val t = bb.getInt(); val ne = bb.getInt()
      Attr(name, getValues(bb, t, ne))
    }
  }

  def read(path: String): File =
    readBytes(Files.readAllBytes(Paths.get(path)))

  /** Parse a classic NetCDF file from memory — the distributed-ingest
    * entry point (executors parse granules delivered by `binaryFiles`).
    */
  def readBytes(bytes: Array[Byte]): File = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val magic = Array.fill(3)(bb.get()).map(_.toChar).mkString
    require(magic == "CDF", "not a NetCDF classic file")
    val version = bb.get().toInt
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    bb.getInt() // numrecs
    val dimTag = bb.getInt(); val nDims = bb.getInt()
    require(dimTag == TagDim || (dimTag == 0 && nDims == 0), s"bad dim tag $dimTag")
    val dims = (0 until nDims).map(_ => Dim(getName(bb), bb.getInt()))
    val gatts = getAttrList(bb)
    val varTag = bb.getInt(); val nVars = bb.getInt()
    require(varTag == TagVar || (varTag == 0 && nVars == 0), s"bad var tag $varTag")
    val vars = (0 until nVars).map { _ =>
      val name = getName(bb)
      val nd = bb.getInt()
      val dimIds = (0 until nd).map(_ => bb.getInt())
      val attrs = getAttrList(bb)
      val ncType = bb.getInt()
      bb.getInt() // vsize
      val begin = if (version == 2) bb.getLong() else bb.getInt().toLong
      val nelems = dimIds.map(dims(_).length.toLong).product
      require(nelems <= Int.MaxValue, s"$name too large for in-memory read")
      val data = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      data.position(begin.toInt)
      Var(name, dimIds, attrs, getValues(data, ncType, nelems.toInt))
    }
    File(dims, gatts, vars)
  }
}
