package graft.raster

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Hdf5

/** Writer/reader cross-validation: NetCdf4 emits old-style HDF5 (symbol
  * tables, v1 headers), the Hdf5 reader's old-style path decodes it; the
  * reader's new-style path is covered separately by the real MERRA-2
  * fixture in NedGranuleSpec — the two families can't share a blind spot.
  */
class NetCdf4Spec extends AnyFunSuite {

  private def sampleRoot: NetCdf4.Group = {
    val vals = Array.tabulate(4 * 5 * 6) { k =>
      val t = k / 30; val i = (k % 30) / 6; val j = k % 6
      (t * 100 + i * 10 + j).toFloat
    }
    NetCdf4.Group("/",
      attrs = Seq(
        NetCdf4.Attr("RangeBeginningDate", NetCdf4.AText("2023-07-01")),
        NetCdf4.Attr("res", NetCdf4.ADoubles(Array(0.5, 0.625)))),
      dsets = Seq(
        NetCdf4.Dset("lat", Seq(5), Nil, NetCdf4.F64(Array(10, 20, 30, 40, 50))),
        NetCdf4.Dset("lon", Seq(6), Nil,
          NetCdf4.F64(Array(70, 71, 72, 73, 74, 75))),
        NetCdf4.Dset("time", Seq(4), Nil, NetCdf4.I32(Array(0, 60, 120, 180))),
        // chunk shape deliberately not dividing dims: edge chunks pad
        NetCdf4.Dset("T2M", Seq(4, 5, 6),
          Seq(NetCdf4.Attr("scale_factor", NetCdf4.ADoubles(Array(2.0))),
            NetCdf4.Attr("_FillValue", NetCdf4.AFloats(Array(9999f)))),
          NetCdf4.F32(vals), chunks = Some(Seq(3, 2, 6)), deflate = 5)),
      groups = Seq(
        NetCdf4.Group("meta",
          attrs = Seq(NetCdf4.Attr("GranuleYear", NetCdf4.AInts(Array(2023)))),
          dsets = Seq(NetCdf4.Dset("StructMetadata.0", Nil, Nil,
            NetCdf4.Str("GROUP=GridStructure\nEND"))))))
  }

  test("old-style write → from-spec read roundtrip (groups, attrs, chunks)") {
    val bytes = NetCdf4.writeBytes(sampleRoot)
    assert(Hdf5.isHdf5(bytes))
    val f = Hdf5.read(bytes)
    val kids = f.children(f.rootAddr).toMap
    assert(kids.keySet === Set("lat", "lon", "time", "T2M", "meta"))
    assert(f.rootAttributes.get("RangeBeginningDate") ===
      Some(Hdf5.Text("2023-07-01")))
    assert(f.rootAttributes.get("res").collect {
      case Hdf5.Nums(a) => a.toSeq
    } === Some(Seq(0.5, 0.625)))
    // contiguous coordinate vars
    assert(f.dataset("lat", kids("lat")).doubles.toSeq ===
      Seq(10.0, 20.0, 30.0, 40.0, 50.0))
    assert(f.dataset("time", kids("time")).doubles.toSeq ===
      Seq(0.0, 60.0, 120.0, 180.0))
    // chunked + deflate main var, edge-padded chunks reassemble exactly
    val v = f.dataset("T2M", kids("T2M"))
    assert(v.dims.toSeq === Seq(4, 5, 6))
    assert(v.attrNum("scale_factor") === Some(2.0))
    val got = v.doubles
    (0 until 4 * 5 * 6).foreach { k =>
      val t = k / 30; val i = (k % 30) / 6; val j = k % 6
      assert(got(k) === (t * 100 + i * 10 + j).toDouble, s"cell $k")
    }
    // nested group with int attr and scalar string dataset
    val meta = f.children(kids("meta")).toMap
    assert(f.attributes(kids("meta")).get("GranuleYear").collect {
      case Hdf5.Nums(a) => a(0)
    } === Some(2023.0))
    assert(f.dataset("StructMetadata.0", meta("StructMetadata.0")).text ===
      "GROUP=GridStructure\nEND")
  }

  test("contiguous float64 dataset roundtrip") {
    val g = NetCdf4.Group("/", dsets = Seq(
      NetCdf4.Dset("x", Seq(3), Nil, NetCdf4.F64(Array(1.5, -2.25, 3.75)))))
    val f = Hdf5.read(NetCdf4.writeBytes(g))
    val kids = f.children(f.rootAddr).toMap
    assert(f.dataset("x", kids("x")).doubles.toSeq === Seq(1.5, -2.25, 3.75))
  }

  test("compound (record) dataset roundtrip: packed rows -> struct-of-arrays") {
    // mixed member sizes force non-trivial offsets (4 + 8 + 4 = 16-byte
    // records); member names of different lengths exercise the 8-byte
    // v1 name padding on both sides
    val g = NetCdf4.Group("/", dsets = Seq(
      NetCdf4.Dset("obs", Seq(4), Nil, NetCdf4.Compound(Seq(
        "t" -> NetCdf4.I32(Array(0, 60, 120, 180)),
        "value" -> NetCdf4.F64(Array(1.5, -2.25, 3.75, 0.125)),
        "qc" -> NetCdf4.I32(Array(1, 0, 1, 1)))))))
    val f = Hdf5.read(NetCdf4.writeBytes(g))
    val kids = f.children(f.rootAddr).toMap
    val ds = f.dataset("obs", kids("obs"))
    assert(ds.dims.toSeq === Seq(4))
    assert(ds.memberDoubles("t").toSeq === Seq(0.0, 60.0, 120.0, 180.0))
    assert(ds.memberDoubles("value").toSeq === Seq(1.5, -2.25, 3.75, 0.125))
    assert(ds.memberDoubles("qc").toSeq === Seq(1.0, 0.0, 1.0, 1.0))
    val err = intercept[IllegalArgumentException](ds.member("nope"))
    assert(err.getMessage.contains("members: t,value,qc"))
  }

  test("v3 compound with size exactly 256 uses 2-byte member offsets") {
    // H5VM_limit_enc_size: offset width = floor(log2(size))/8 + 1, so a
    // 256-byte record encodes offsets in TWO bytes (256 needs 9 bits).
    // An off-by-one (while lim < size) read 1 byte here and misparsed
    // every subsequent member of externally-written v3 compounds.
    def i32dt: Array[Byte] = Array[Byte](
      0x10, 0x08, 0, 0,          // class 0 v1, signed
      4, 0, 0, 0,                // size 4
      0, 0, 32, 0)               // bit offset 0, precision 32
    def member(name: String, off: Int): Array[Byte] =
      name.getBytes("US-ASCII") ++ Array[Byte](0) ++
        Array[Byte]((off & 0xff).toByte, ((off >> 8) & 0xff).toByte) ++ i32dt
    val msg = Array[Byte](
      0x36.toByte,               // class 6, version 3
      2, 0, 0,                   // 2 members
      0, 1, 0, 0) ++             // size 256 (LE)
      member("a", 0) ++ member("b", 128)
    // minimal v0 superblock shell (8-byte offsets/lengths at 13/14) with
    // the message bytes parked at offset 16; tail padding keeps the
    // eager root-address read in bounds
    val sb = new Array[Byte](8)
    sb(5) = 8; sb(6) = 8 // file bytes 13, 14
    val bytes = Hdf5.Magic ++ sb ++ msg ++ new Array[Byte](128)
    val dt = new Hdf5.File(bytes).datatypeAt(16L)
    assert(dt.cls === 6)
    assert(dt.size === 256)
    assert(dt.members.map(m => m.name -> m.offset) ===
      Seq("a" -> 0, "b" -> 128))
  }
}
