package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val L = 8 // universe [0, 256)
  private val D = 4

  // deterministic skewed sample in [0, 256): clustered low with a tail
  private def values: Seq[Long] =
    (1 to 2000).map(i => ((i * i * 2654435761L) % 256).abs min (i % 256))

  private def exactRankBelow(v: Long): Long = values.count(_ < v)

  private def discQuantile(q: Double): Long = {
    val sorted = values.sorted
    val t = math.max(1, math.ceil(q * sorted.size).toLong).toInt
    sorted(t - 1)
  }

  test("ranks never underestimate and stay inside the dyadic error bound") {
    val df = values.map(Tuple1(_)).toDF("v")
    val sk = QuantileSketch.sketch(df, "v", L, D, width = 512)
    val probes = Seq(0L, 1L, 7L, 63L, 128L, 200L, 255L).map(Tuple1(_)).toDF("v")
    val est = sk.rank(probes, "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bound = 2L * L * values.size / 512 // classic CMS range-sum bound
    est.foreach { case (v, r) =>
      val exact = exactRankBelow(v)
      assert(r >= exact, s"rank($v) underestimated: $r < $exact")
      assert(r - exact <= bound, s"rank($v) error ${r - exact} > $bound")
    }
    assert(est(0L) === 0L, "rank of the domain floor must be 0")
  }

  test("with a wide table ranks and quantiles are exact (deterministic hashes)") {
    // 256 distinct prefixes per level into width 8192: the salted md5
    // buckets happen to be collision-free here, and since the hashes
    // are deterministic this exactness is a stable fact, not a flake
    val df = values.map(Tuple1(_)).toDF("v")
    val sk = QuantileSketch.sketch(df, "v", L, D, width = 8192)
    val probes = (0L until 256L by 5L).map(Tuple1(_)).toDF("v")
    val est = sk.rank(probes, "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    est.foreach { case (v, r) =>
      assert(r === exactRankBelow(v), s"rank($v)")
    }
    val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = sk.quantiles(qs)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    qs.foreach { q =>
      assert(got(q) === discQuantile(q), s"q=$q")
    }
  }

  test("quantile walk lands within the rank error bound under collisions") {
    val df = values.map(Tuple1(_)).toDF("v")
    val sk = QuantileSketch.sketch(df, "v", L, D, width = 64)
    val n = values.size
    val bound = 2L * L * n / 64
    val got = sk.quantiles(Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    got.foreach { case (q, v) =>
      val t = math.max(1, math.ceil(q * n).toLong)
      val below = exactRankBelow(v)
      val atOrBelow = values.count(_ <= v).toLong
      assert(below <= t - 1 + bound && atOrBelow >= t - bound,
        s"q=$q returned $v: exact window [${below + 1}, $atOrBelow] " +
          s"vs target $t ± $bound")
    }
  }

  test("merge of shard sketches equals the whole-corpus sketch, cells and answers") {
    val (a, b) = values.splitAt(700)
    val skA = QuantileSketch.sketch(a.map(Tuple1(_)).toDF("v"), "v", L, D, 512)
    val skB = QuantileSketch.sketch(b.map(Tuple1(_)).toDF("v"), "v", L, D, 512)
    val whole = QuantileSketch.sketch(values.map(Tuple1(_)).toDF("v"), "v", L, D, 512)
    def cells(s: QuantileSketch.Dq) = s.cells.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(cells(skA.merge(skB)) === cells(whole))
    val qs = Seq(0.1, 0.5, 0.9)
    val m = skA.merge(skB).quantiles(qs)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val w = whole.quantiles(qs)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(m === w)
  }

  test("grouped sketch answers equal the filtered-global answers per group") {
    val df = values.zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v) }.toDF("g", "v")
    val grouped = QuantileSketch.sketch(df, "v", L, D, 512, groupCols = Seq("g"))
    val got = grouped.quantiles(Seq(0.5))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    (0 until 3).foreach { g =>
      val solo = QuantileSketch.sketch(
        df.filter(col("g") === s"g$g"), "v", L, D, 512)
      val exp = solo.quantiles(Seq(0.5)).collect()
        .map(r => r.getLong(1)).head
      assert(got((s"g$g", 0.5)) === exp, s"g$g")
    }
  }

  test("walk regimes agree: driver-side under the cap, joined over it") {
    val df = values.zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v) }.toDF("g", "v")
    val qs = Seq(0.1, 0.5, 0.9)
    def ans(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val sk = QuantileSketch.sketch(df, "v", L, D, 256, groupCols = Seq("g"))
    // maxBroadcastCells = 0 forces the distributed joined walk; the
    // default takes the collected driver-side walk — identical rows
    assert(ans(sk.quantiles(qs)) === ans(sk.quantiles(qs, maxBroadcastCells = 0)))
  }

  test("result is invariant to partitioning") {
    val df = values.map(Tuple1(_)).toDF("v")
    def answers(d: org.apache.spark.sql.DataFrame) = {
      val sk = QuantileSketch.sketch(d, "v", L, D, 256)
      sk.quantiles(Seq(0.3, 0.7)).collect()
        .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    }
    assert(answers(df.repartition(1)) === answers(df.repartition(13)))
  }

  test("weighted sketch equals the sketch of weight-replicated rows, cells and answers") {
    val weighted = values.take(400).zipWithIndex
      .map { case (v, i) => (v, (i % 4).toLong) } // weights 0..3 incl. zero
    val replicated = weighted.flatMap { case (v, w) =>
      Seq.fill(w.toInt)(v)
    }
    val wdf = weighted.toDF("v", "w")
    val skW = QuantileSketch.sketch(wdf, "v", L, D, 512,
      weightCol = Some("w"))
    val skR = QuantileSketch.sketch(
      replicated.map(Tuple1(_)).toDF("v"), "v", L, D, 512)
    def cells(s: QuantileSketch.Dq) = s.cells.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .filter(_._2 != 0L).toMap // zero-weight rows leave empty cells
    assert(cells(skW) === cells(skR))
    val qs = Seq(0.25, 0.5, 0.75)
    def ans(s: QuantileSketch.Dq) = s.quantiles(qs).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(ans(skW) === ans(skR))
    // total weight, not row count, is N
    assert(skW.totals.collect().head.getLong(0) ===
      weighted.map(_._2).sum)
  }

  test("negative weights fail loudly") {
    val bad = Seq((5L, -1L)).toDF("v", "w")
    val err = intercept[Exception] {
      QuantileSketch.sketch(bad, "v", L, D, 512,
        weightCol = Some("w")).cells.collect()
    }
    assert(err.getMessage.contains("non-negative"))
  }

  test("parameter mismatch and out-of-domain values fail loudly") {
    val df = values.map(Tuple1(_)).toDF("v")
    val a = QuantileSketch.sketch(df, "v", L, D, 512)
    val b = QuantileSketch.sketch(df, "v", L, D, 256)
    val e = intercept[IllegalArgumentException](a.merge(b))
    assert(e.getMessage.contains("parameter mismatch"))
    val bad = Seq(256L).map(Tuple1(_)).toDF("v")
    val err = intercept[Exception] {
      QuantileSketch.sketch(bad, "v", L, D, 512).cells.collect()
    }
    assert(err.getMessage.contains("outside [0, 2^8)"))
  }

  test("double lane: every answer within its own max_abs_err of the exact disc percentile") {
    // irregular floats (negatives, fractional, clustered) — nothing on
    // any integer grid
    val xs = (0 until 500).map(i =>
      math.sin(i * 0.7) * 37.3 - 5.1 + (i % 7) * 0.013)
    val df = xs.map(Tuple1(_)).toDF("x")
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val got = QuantileSketch.quantilesDouble(df, "x",
        levels = 12, depth = 4, width = 512, qs = qs)
      .collect().map(r => r.getDouble(0) ->
        ((r.getDouble(2), r.getDouble(4)))).toMap
    val sorted = xs.sorted
    qs.foreach { q =>
      // PERCENTILE_DISC: smallest x with rank ≥ ceil(q·n)
      val exact = sorted(math.max(math.ceil(q * xs.size).toInt, 1) - 1)
      val (v, err) = got(q)
      assert(math.abs(v - exact) <= err,
        s"q=$q: |$v - $exact| > max_abs_err=$err")
      // the bound is the advertised grid step
      assert(math.abs(err - (sorted.last - sorted.head) / 4095.0) < 1e-12)
    }
  }

  test("double lane: constant column answers exactly, zero-information grid") {
    val df = Seq.fill(40)(7.25).map(Tuple1(_)).toDF("x")
    val rows = QuantileSketch.quantilesDouble(df, "x",
        levels = 10, depth = 4, width = 256, qs = Seq(0.5))
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getDouble(2) === 7.25) // lo + 0/1.0
    assert(rows.head.getLong(1) === 0L)
  }
}
