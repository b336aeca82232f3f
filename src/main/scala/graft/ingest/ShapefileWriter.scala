package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

/** Minimal ESRI shapefile sink: polygon `.shp` + `grid_id`-attribute
  * `.dbf` + verbatim `.prj` — the structural complement of
  * [[ShapefileGrid.readShp]]/`readDbf` (the same role `raster/NetCdf4`
  * plays for the HDF5 reader: writer and reader implement the format
  * from the public spec independently enough that a round-trip failure
  * exposes either side). Reference scope: the reference only READS its
  * grid shapefile (grid.py); the writer exists for fixture synthesis
  * and for exporting derived grids to GIS tools.
  *
  * Layout written: one single-ring polygon record per entry, record
  * contents little-endian with big-endian record headers per the ESRI
  * whitepaper; dBASE III header with a single numeric `grid_id` column.
  */
object ShapefileWriter {

  /** Write `name`.shp/.dbf/.prj under `dir`. `polys` are flat closed
    * rings (x0,y0,…,x0,y0); `gridIds` pair positionally with them.
    */
  def write(dir: Path, name: String, polys: Seq[Array[Double]],
            gridIds: Seq[Long], prjWkt: String): Unit = {
    require(polys.size == gridIds.size, "one grid_id per polygon")
    writeShp(dir.resolve(s"$name.shp"), polys)
    writeDbf(dir.resolve(s"$name.dbf"), gridIds)
    Files.write(dir.resolve(s"$name.prj"), prjWkt.getBytes("UTF-8"))
  }

  private def writeShp(path: Path, polys: Seq[Array[Double]]): Unit = {
    val recs = polys.map { ring =>
      val np = ring.length / 2
      val content = ByteBuffer.allocate(4 + 32 + 8 + 4 + np * 16)
        .order(ByteOrder.LITTLE_ENDIAN)
      content.putInt(5) // polygon
      val xs = ring.grouped(2).map(_(0)).toSeq
      val ys = ring.grouped(2).map(_(1)).toSeq
      content.putDouble(xs.min).putDouble(ys.min)
        .putDouble(xs.max).putDouble(ys.max)
      content.putInt(1).putInt(np).putInt(0) // 1 part at offset 0
      ring.foreach(content.putDouble)
      content.array()
    }
    val totalLen = 100 + recs.map(8 + _.length).sum
    val bb = ByteBuffer.allocate(totalLen)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(9994); bb.position(24); bb.putInt(totalLen / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1000); bb.putInt(5)
    bb.position(36)
    val allX = polys.flatMap(_.grouped(2).map(_(0)))
    val allY = polys.flatMap(_.grouped(2).map(_(1)))
    bb.putDouble(allX.min).putDouble(allY.min)
      .putDouble(allX.max).putDouble(allY.max)
    bb.position(100)
    recs.zipWithIndex.foreach { case (r, i) =>
      bb.order(ByteOrder.BIG_ENDIAN).putInt(i + 1).putInt(r.length / 2)
      bb.put(r)
    }
    Files.write(path, bb.array())
  }

  private def writeDbf(path: Path, gridIds: Seq[Long]): Unit = {
    val fieldLen = 10
    val headerSize = 32 + 32 + 1
    val recSize = 1 + fieldLen
    val bb = ByteBuffer.allocate(headerSize + gridIds.size * recSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x03.toByte).put(24.toByte).put(1.toByte).put(1.toByte)
    bb.putInt(gridIds.size)
    bb.putShort(headerSize.toShort).putShort(recSize.toShort)
    bb.position(32)
    bb.put("grid_id".getBytes("ASCII")).position(32 + 11)
    bb.put('N'.toByte) // numeric
    bb.position(32 + 16)
    bb.put(fieldLen.toByte).put(0.toByte)
    bb.position(64)
    bb.put(0x0d.toByte)
    gridIds.foreach { id =>
      bb.put(' '.toByte)
      bb.put(("%" + fieldLen + "d").format(id).getBytes("ASCII"))
    }
    bb.put(0x1a.toByte)
    Files.write(path, bb.array())
  }
}
