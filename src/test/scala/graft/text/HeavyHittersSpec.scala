package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def zipfItems(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // zipf-ish: item id ~ floor(1/u) capped — few heavy, long light tail
    (1 to n).map { _ =>
      val u = rnd.nextDouble().max(1e-6)
      s"item${math.min((1 / u).toInt, 5000)}"
    }.toDF("token")
  }

  test("topKExact equals the exact top-k on a skewed corpus") {
    val items = zipfItems(20000, seed = 5).repartition(8)
    val exact = items.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = HeavyHitters.topKExact(items, "token", k = 10, counters = 256)
      .orderBy(col("cnt").desc, col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exact)
  }

  test("certificate fails loudly on a flat corpus with too few counters") {
    // 4000 distinct items, one occurrence each — no item is heavy, so
    // the k-th count (1) cannot clear the N/(counters+1) bound
    val flat = (1 to 4000).map(i => s"u$i").toDF("token").repartition(4)
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topKExact(flat, "token", k = 5, counters = 16)
    }
    assert(e.getMessage.contains("certificate failed"))
  }

  test("candidates is a superset of every provably-heavy item") {
    val items = zipfItems(30000, seed = 9).repartition(16)
    val counters = 128
    val n = items.count()
    val bound = n / (counters + 1)
    val heavy = items.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > bound)
      .select("token").as[String].collect().toSet
    val cand = HeavyHitters.candidates(items, "token", counters)
      .as[String].collect().toSet
    assert(heavy.subsetOf(cand),
      s"missing provably-heavy items: ${(heavy -- cand).take(5)}")
  }

  private def groupedZipf(n: Int, groups: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val g = rnd.nextInt(groups)
      val u = rnd.nextDouble().max(1e-6)
      // group-distinct vocabularies so per-group and global top-k differ
      (s"g$g", s"g$g-item${math.min((1 / u).toInt, 5000)}")
    }.toDF("src", "token")
  }

  test("topKExactByGroup equals the exact per-group top-k on skewed groups") {
    val items = groupedZipf(30000, groups = 3, seed = 11).repartition(8)
    val exact = items.groupBy("src", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(col("cnt").desc, col("token"))))
      .filter(col("rk") <= 7)
      .select("src", "token", "cnt", "rk")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    val got = HeavyHitters.topKExactByGroup(items, Seq("src"), "token",
        k = 7, counters = 256)
      .select("src", "token", "cnt", "group_rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(got === exact)
    assert(got.nonEmpty)
  }

  test("grouped result is invariant to partitioning and row order") {
    val items = groupedZipf(20000, groups = 4, seed = 23)
    def run(d: org.apache.spark.sql.DataFrame) =
      HeavyHitters.topKExactByGroup(d, Seq("src"), "token", k = 5,
          counters = 256)
        .select("src", "token", "cnt", "group_rank")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getInt(3))).toSet
    assert(run(items.repartition(17)) === run(items.orderBy(col("token").desc)))
  }

  test("grouped certificate fails loudly when ONE group is too flat") {
    // gA is heavily skewed, gB is flat — only gB's certificate fails,
    // and it must take the whole job down (never silently approximate)
    val skew = (1 to 5000).map(_ => ("gA", "hot")) ++
      (1 to 3000).map(i => ("gB", s"u$i"))
    val items = skew.toDF("src", "token").repartition(4)
    val e = intercept[Exception] {
      HeavyHitters.topKExactByGroup(items, Seq("src"), "token",
        k = 5, counters = 16).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("certificate failed") &&
      m.contains("gB")), e.toString)
  }

  test("certificate fails when evictions hide ranks even though returned rows pass the bound") {
    // counters=2, single partition, adversarial order: a×10, b×9, then
    // 9 distinct singles — each single decrements all slots, so b (true
    // rank 2 with count 9) is evicted while a survives with confirmed
    // count 10 > N/(counters+1) = 28/3 = 9. The old per-row bound check
    // passed the one surviving row and silently dropped rank 2; the
    // eviction-aware certificate must abort instead.
    val seq = Seq.fill(10)("a") ++ Seq.fill(9)("b") ++ (1 to 9).map(i => s"c$i")
    val items = seq.toDF("token").coalesce(1)
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topKExact(items, "token", k = 2, counters = 2)
    }
    assert(e.getMessage.contains("ranks beyond those returned"), e.getMessage)
  }

  test("fewer than k rows is exact (and passes) when no eviction ever ran") {
    // 3 distinct items, counters far above the domain: the candidate
    // set is provably complete, so the 3-row answer IS the exact top-5
    val items = (Seq.fill(7)("x") ++ Seq.fill(4)("y") ++ Seq("z"))
      .toDF("token").repartition(3)
    val got = HeavyHitters.topKExact(items, "token", k = 5, counters = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("x", 7L), ("y", 4L), ("z", 1L)))
  }

  test("grouped certificate fails when a group's evictions hide ranks") {
    // same adversarial sequence as the global test, inside one group;
    // a healthy sibling group must not mask the abort
    val seq = (Seq.fill(10)("a") ++ Seq.fill(9)("b") ++ (1 to 9).map(i => s"c$i"))
      .map(("gBad", _)) ++ Seq.fill(20)(("gOk", "hot"))
    val items = seq.toDF("src", "token").coalesce(1)
    val e = intercept[Exception] {
      HeavyHitters.topKExactByGroup(items, Seq("src"), "token",
        k = 2, counters = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("certificate failed") &&
      m.contains("gBad") && m.contains("ranks beyond those returned")), e.toString)
  }

  test("grouped: a small complete group returns fewer than k rows and passes") {
    val items = (Seq.fill(6)(("gS", "x")) ++ Seq.fill(2)(("gS", "y")) ++
      (1 to 40).map(i => ("gBig", s"t${i % 4}")))
      .toDF("src", "token").repartition(5)
    val got = HeavyHitters.topKExactByGroup(items, Seq("src"), "token",
        k = 5, counters = 64)
      .filter(col("src") === "gS")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(got === Set(("x", 6L, 1), ("y", 2L, 2)))
  }

  test("confirm join regimes: broadcast under the cap, shuffled over it, same result") {
    val items = groupedZipf(20000, groups = 4, seed = 47).repartition(9)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("src", "token", "cnt", "group_rank")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getInt(3))).toSet

    val small = HeavyHitters.topKExactByGroupPlanned(items, Seq("src"), "token",
      k = 5, counters = 256)
    assert(small.broadcastConfirm && small.candidateRows > 0)
    val smallRows = rows(small.df)
    small.df.count()
    assert(small.df.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "small domain must broadcast the candidates")
    small.release()

    // force the over-cap regime and disable every automatic broadcast:
    // the confirm semi-join must fall back to a shuffled join and the
    // result must not move
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = HeavyHitters.topKExactByGroupPlanned(items, Seq("src"), "token",
        k = 5, counters = 256, maxBroadcastCandidates = 0L)
      assert(!big.broadcastConfirm)
      assert(rows(big.df) === smallRows)
      big.df.count()
      val s = big.df.queryExecution.executedPlan.toString
      assert(!s.contains("BroadcastHashJoin"),
        s"over-cap regime must not broadcast:\n$s")
      big.release()
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("grouped candidates superset per group under adversarial merge orders") {
    val items = groupedZipf(40000, groups = 5, seed = 31).repartition(16)
    val counters = 128
    val totals = items.groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val heavy = items.groupBy("src", "token").agg(count(lit(1)).as("cnt"))
      .collect()
      .filter(r => r.getLong(2) > totals(r.getString(0)) / (counters + 1))
      .map(r => (r.getString(0), r.getString(1))).toSet
    val cand = HeavyHitters.candidatesByGroup(items, Seq("src"), "token", counters)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(heavy.subsetOf(cand),
      s"missing provably-heavy pairs: ${(heavy -- cand).take(5)}")
  }
}
