package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference interleave: bit-by-bit, the definition the magic-number
    * cascade must match.
    */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue matches the bit-by-bit Morton definition") {
    val rnd = new scala.util.Random(13)
    val pts = (1 to 500).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
      .select("x", "y", "z").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y), s"($x,$y)")
    }
  }

  test("aligned tiles share z prefixes (the locality contract)") {
    // any two points in the same 2^k-aligned tile agree on z >> 2k
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 200; k <- Seq(2, 4, 8)) {
      val tx = rnd.nextInt(65536 >> k).toLong
      val ty = rnd.nextInt(65536 >> k).toLong
      val (x1, y1) = ((tx << k) + rnd.nextInt(1 << k),
        (ty << k) + rnd.nextInt(1 << k))
      val (x2, y2) = ((tx << k) + rnd.nextInt(1 << k),
        (ty << k) + rnd.nextInt(1 << k))
      assert(mortonRef(x1, y1) >> (2 * k) === mortonRef(x2, y2) >> (2 * k))
    }
  }

  test("layoutByZ produces tile-bounded partitions, not full-extent stripes") {
    // uniform points over [0, 4096)^2 into 16 z-ranges: each partition's
    // bounding box must cover far less than the full extent in BOTH
    // dimensions combined (a 1-D range layout on x would give stripes
    // with full-height y ranges)
    val rnd = new scala.util.Random(41)
    val df = (1 to 20000).map(_ =>
      (rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong)).toDF("x", "y")
    val boxes = ZOrder.layoutByZ(df, "x", "y", numFiles = 16)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .select("dx", "dy").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(boxes.length > 1)
    // mean bounding-box area well under the full extent's area
    val meanArea = boxes.map { case (dx, dy) => dx.toDouble * dy }.sum / boxes.length
    assert(meanArea < 4096.0 * 4096.0 / 4,
      s"partitions are not tile-local: mean area $meanArea")
  }
}
