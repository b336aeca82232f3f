package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BradleyTerrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = 1000000L
  private val K = Scale * Scale

  private def run(games: Seq[(Long, Long)], iters: Int, parts: Int = 3)
      : Map[Long, (Long, Long, Long)] =
    BradleyTerry.ranks(games.toDF("winner", "loser").repartition(parts),
        "winner", "loser", iterations = iters, scale = Scale)
      .collect()
      .map(r => r.getAs[Long]("player") ->
        ((r.getAs[Long]("skill"), r.getAs[Long]("n_wins"),
          r.getAs[Long]("n_games"))))
      .toMap

  /** Independent reference: the same integer MM recurrence over Scala
    * maps — no Spark, no SQL.
    */
  private def simulate(games: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val clean = games.filter(g => g._1 != g._2)
    val players = clean.flatMap(g => Seq(g._1, g._2)).distinct
    val wins = clean.groupBy(_._1).map { case (p, v) => p -> v.size.toLong }
    val nPair = clean.groupBy(g => (math.min(g._1, g._2), math.max(g._1, g._2)))
      .map { case (k, v) => k -> v.size.toLong }
    var w = players.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      w = players.map { i =>
        val d = nPair.collect {
          case ((a, b), n) if a == i || b == i =>
            val j = if (a == i) b else a
            n * K / (w(i) + w(j))
        }.sum
        i -> math.max(wins.getOrElse(i, 0L) * K / d, 1L)
      }.toMap
    }
    w
  }

  test("dominant player accrues skill; all-loser floors at 1") {
    // 1 beats 2 ten times, 2 beats 3 ten times, 3 never wins
    val games = (1 to 10).flatMap(_ => Seq((1L, 2L), (2L, 3L)))
    val got = run(games, iters = 8)
    assert(got(1L)._1 > got(2L)._1)
    assert(got(2L)._1 > got(3L)._1)
    assert(got(3L)._1 === 1L)
    assert(got(1L)._2 === 10L && got(1L)._3 === 10L)
    assert(got(2L)._2 === 10L && got(2L)._3 === 20L)
  }

  test("symmetric record gives equal skills; matches the local recurrence") {
    val games = (1 to 5).flatMap(_ => Seq((1L, 2L), (2L, 1L)))
    val got = run(games, iters = 6)
    assert(got(1L)._1 === got(2L)._1)
    val sim = simulate(games, 6)
    assert(got.map { case (p, v) => p -> v._1 } === sim)
  }

  test("pseudo-random tournament matches the recurrence; layout-invariant") {
    val games = (1 to 400).map { i =>
      val h = i * 2654435761L
      ((h >>> 8) % 9, (h >>> 40) % 9)
    }.filter(g => g._1 != g._2)
    val sim = simulate(games, 8)
    val a = run(games, 8, parts = 1)
    val b = run(games.reverse, 8, parts = 17)
    assert(a.map { case (p, v) => p -> v._1 } === sim)
    assert(a === b)
  }

  test("win probabilities recover a planted ratio approximately") {
    // 1 beats 2 in 3 of 4 games: w1/(w1+w2) should settle near 0.75
    val games = (1 to 30).flatMap(_ =>
      Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L)))
    val got = run(games, iters = 12)
    val p = got(1L)._1.toDouble / (got(1L)._1 + got(2L)._1)
    assert(math.abs(p - 0.75) < 0.01, s"p=$p")
  }

  test("self-games and nulls drop; isolated self-player disappears") {
    val df = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(2L)), (Some(3L), Some(3L)), (None, Some(1L)),
      (Some(2L), None)).toDF("winner", "loser")
    val got = BradleyTerry.ranks(df, "winner", "loser", iterations = 3)
      .collect().map(_.getAs[Long]("player")).toSet
    assert(got === Set(1L, 2L))
  }

  test("empty game list returns an empty frame, not an opaque NPE") {
    // all rows filter away (self-games / nulls) — the overflow guard's
    // max() agg is all-null and must not be dereferenced
    val df = Seq[(Option[Long], Option[Long])](
      (Some(3L), Some(3L)), (None, Some(1L))).toDF("winner", "loser")
    val got = BradleyTerry.ranks(df, "winner", "loser", iterations = 3)
    assert(got.columns.toSeq ===
      Seq("player", "skill", "n_wins", "n_games"))
    assert(got.count() === 0L)
  }
}
