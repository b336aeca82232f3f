package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class HllSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def regMap(h: HllSketch.Hll): Map[Long, Int] =
    h.registers.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("registers equal a local replay of the shared avalanche hash") {
    val p = 5
    val m = 1L << p
    val capRho = 61 - p
    val vals = (1 to 500).map(i => s"v${i % 137}")
    val sk = HllSketch.sketch(vals.map(Tuple1(_)).toDF("v"), "v", p)
    val expected = vals.distinct.map { v =>
      val h = Sampling.avalancheKeyLocal(v)
      val w = h / m
      val rho = if (w == 0L) capRho
        else java.lang.Long.numberOfTrailingZeros(w) + 1
      (h % m) -> rho
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(regMap(sk) === expected)
  }

  test("estimate is within the p=8 error envelope on 1000 distinct keys") {
    val df = (1 to 5000).map(i => Tuple1(s"k${i % 1000}")).toDF("v")
    val est = HllSketch.sketch(df, "v", p = 8).estimate()
      .select("est").as[Double].head()
    // ±1.04/sqrt(256) ≈ 6.5% standard error; allow 4 sigma
    assert(math.abs(est - 1000.0) / 1000.0 < 0.26, s"est=$est")
  }

  test("small-range linear counting kicks in and is close on tiny sets") {
    val df = (1 to 10).map(i => Tuple1(s"x$i")).toDF("v")
    val row = HllSketch.sketch(df, "v", p = 8).estimate()
      .select("v_empty", "est").head()
    assert(row.getLong(0) > 0)
    assert(math.abs(row.getDouble(1) - 10.0) < 2.0, s"est=${row.getDouble(1)}")
  }

  test("merge of shard sketches equals the whole-corpus sketch") {
    val a = (1 to 400).map(i => Tuple1(s"u${i % 50}")).toDF("v")
    val b = (1 to 300).map(i => Tuple1(s"u${i % 70}")).toDF("v")
    val whole = HllSketch.sketch(a.unionAll(b), "v", p = 6)
    val merged = HllSketch.sketch(a, "v", p = 6)
      .merge(HllSketch.sketch(b, "v", p = 6))
    assert(regMap(merged) === regMap(whole))
  }

  test("duplicates do not move registers: sketch of distinct equals sketch of raw") {
    val raw = (1 to 900).map(i => Tuple1(s"d${i % 30}")).toDF("v")
    val dedup = raw.distinct()
    assert(regMap(HllSketch.sketch(raw, "v", p = 6)) ===
      regMap(HllSketch.sketch(dedup, "v", p = 6)))
  }

  test("grouped sketch equals per-group filtered global sketches") {
    val df = (1 to 600).map(i => (s"g${i % 3}", s"u${i % 41}")).toDF("g", "v")
    val grouped = HllSketch.sketch(df, "v", p = 5, groupCols = Seq("g"))
    val byGroup = grouped.registers.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = HllSketch.sketch(df.where(col("g") === g), "v", p = 5)
      assert(regMap(solo) === byGroup.collect {
        case ((gg, b), r) if gg == g => b -> r
      }, g)
    }
  }

  test("empty corpus: estimate is 0 via linear counting, never NULL") {
    val empty = (1 to 4).map(Tuple1(_)).toDF("v").where(lit(false))
    val row = HllSketch.sketch(empty, "v", p = 6).estimate().head()
    assert(row.getAs[Long]("n_buckets") === 0L)
    assert(row.getAs[Long]("v_empty") === 64L)
    assert(row.getAs[Long]("s_mass") === 64L * (1L << 55))
    assert(row.getAs[Double]("est") === 0.0)
  }

  test("precision mismatch on merge fails loudly at plan time") {
    val df = (1 to 10).map(i => Tuple1(s"v$i")).toDF("v")
    val ex = intercept[IllegalArgumentException] {
      HllSketch.sketch(df, "v", p = 6).merge(HllSketch.sketch(df, "v", p = 7))
    }
    assert(ex.getMessage.contains("HLL parameter mismatch"))
  }

  test("partition invariance: registers identical under 1 and 17 partitions") {
    val vals = (1 to 800).map(i => Tuple1(s"z${i % 211}"))
    val one = HllSketch.sketch(vals.toDF("v").coalesce(1), "v", p = 6)
    val many = HllSketch.sketch(vals.toDF("v").repartition(17), "v", p = 6)
    assert(regMap(one) === regMap(many))
  }
}
