package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BinPackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("FFD packs whole docs under capacity; oversize docs get own bins") {
    val df = Seq(
      (1L, 600L), (2L, 500L), (3L, 400L), (4L, 300L),
      (5L, 1500L) // oversize
    ).toDF("id", "len")
    val asg = BinPacking.packBinsFFD(df, "id", "len",
        capacity = 1000L, numShards = 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    // capacity respected for every bin without an oversize member
    val binLoads = asg.toSeq.groupBy(_._2).map { case (bin, docs) =>
      bin -> docs.map(d => Map(1L -> 600L, 2L -> 500L, 3L -> 400L,
        4L -> 300L, 5L -> 1500L)(d._1)).sum
    }
    binLoads.foreach { case (bin, load) =>
      assert(load <= 1000L || load == 1500L, s"bin $bin overfilled: $load")
    }
    // the oversize doc sits alone
    val oversizeBin = asg(5L)
    assert(asg.count(_._2 == oversizeBin) === 1)
    // every doc assigned exactly once
    assert(asg.size === 5)
  }

  test("assignment is deterministic across partitionings") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 800).map(i => (i.toLong, (50 + rnd.nextInt(500)).toLong))
      .toDF("id", "len")
    def run(d: org.apache.spark.sql.DataFrame) =
      BinPacking.packBinsFFD(d, "id", "len", 1024L, numShards = 4)
        .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    assert(run(df.repartition(13)) === run(df.orderBy(col("len"))))
  }

  test("packing beats one-doc-per-bin and reports sane fill ratios") {
    val rnd = new scala.util.Random(31)
    val df = (1 to 600).map(i => (i.toLong, (100 + rnd.nextInt(400)).toLong))
      .toDF("id", "len")
    val asg = BinPacking.packBinsFFD(df, "id", "len", 1024L, numShards = 4)
    val report = BinPacking.packingReport(asg, "len", 1024L).collect()
    assert(report.length === 4)
    report.foreach { r =>
      val nBins = r.getAs[Long]("n_bins")
      val nDocs = r.getAs[Long]("n_docs")
      val fill = r.getAs[Double]("fill_ratio")
      assert(nBins < nDocs, "packing must beat one doc per bin")
      assert(fill > 0.6 && fill <= 1.0, s"fill ratio $fill out of range")
    }
  }
}
