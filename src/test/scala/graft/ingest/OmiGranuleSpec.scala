package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.SourcePack

/** S12 — HDF-EOS5 OMI grid semantics (ref: collectors/ned/
  * data_reader_omno2d.py:33-159) over the writer-built fixture.
  */
class OmiGranuleSpec extends AnyFunSuite {

  private lazy val bytes: Array[Byte] = {
    val dir = java.nio.file.Files.createTempDirectory("omi-spec")
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(SourcePack.omiFixture(dir)))
  }

  test("coords synthesize from GridSpan/GridSpacing with centre adjustment") {
    val day = OmiGranule.extractDay(bytes, "ColumnAmountNO2")
    assert(day.date === "2023-01-11")
    assert(day.lons.toSeq === Seq(2.5, 7.5, 12.5, 17.5, 22.5, 27.5))
    assert(day.lats.toSeq === Seq(2.5, 7.5, 12.5, 17.5))
    // plane survives, fill cells are NaN
    assert(day.values(1)(1) === 3 * 7.5 + 2 * 7.5)
    assert(day.values(0)(0).isNaN) // (0+0)%3==0 → fill
  }

  test("inclusive bbox subset") {
    val day = OmiGranule.extractDay(bytes, "ColumnAmountNO2",
      bbox = Some((5.0, 20.0, 5.0, 25.0)))
    assert(day.lats.toSeq === Seq(7.5, 12.5, 17.5))
    assert(day.lons.toSeq === Seq(7.5, 12.5, 17.5, 22.5))
  }

  test("grid-length validation mirrors the reference errors") {
    // numpy-arange semantics: [0, 30) step 5 → 6 points, not 7
    assert(OmiGranule.centreCoords(0.0, 30.0, 5.0).length === 6)
    assert(OmiGranule.centreCoords(-180.0, 180.0, 0.25).length === 1440)
    assert(OmiGranule.centreCoords(-90.0, 90.0, 0.25).length === 720)
    // a granule whose NumberOf*InGrid disagrees must throw
    val dir = java.nio.file.Files.createTempDirectory("omi-bad")
    val p = SourcePack.omiFixture(dir)
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val f = Hdf5.read(raw)
    // unknown variable errors with the available fields listed
    val e = intercept[IllegalArgumentException] {
      OmiGranule.extractDay(raw, "NoSuchField")
    }
    assert(e.getMessage.contains("ColumnAmountNO2"))
    assert(f.resolve("HDFEOS/GRIDS/ColumnAmountNO2") > 0)
  }

  test("readGranules emits long rows on executors") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("omi-read")
    val p = SourcePack.omiFixture(dir)
    val rows = OmiGranule.readGranules(spark, p, "ColumnAmountNO2").collect()
    // 24 cells − 8 fill cells ((i+j)%3==0)
    assert(rows.length === 16)
    assert(rows.forall(_.getString(0) == "2023-01-11"))
  }
}
