package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RankingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent local NDCG@k: plain Scala, no Spark. */
  private def localNdcg(rows: Seq[(Long, Double, Long)], k: Int): Option[Double] = {
    def dcg(rels: Seq[Long]): Double =
      rels.take(k).zipWithIndex.map { case (r, i) =>
        (math.pow(2.0, r.toDouble) - 1.0) / (math.log(i + 2.0) / math.log(2.0))
      }.sum
    val actual = dcg(rows.sortBy(r => (-r._2, r._1)).map(_._3))
    val ideal = dcg(rows.sortBy(r => (-r._3, r._1)).map(_._3))
    if (ideal > 0) Some(actual / ideal) else None
  }

  test("perfect ranking scores 1, inverted scores less, all-zero rel is NULL") {
    val rows = Seq(
      // query 1: score order == rel order → ndcg 1
      (1L, 10L, 9.0, 3L), (1L, 11L, 8.0, 2L), (1L, 12L, 7.0, 1L),
      // query 2: score order inverts rel order
      (2L, 20L, 9.0, 0L), (2L, 21L, 8.0, 1L), (2L, 22L, 7.0, 3L),
      // query 3: no relevant docs at all
      (3L, 30L, 5.0, 0L), (3L, 31L, 4.0, 0L))
      .toDF("q", "id", "s", "rel")
    val got = Ranking.ndcgAtK(rows, Seq("q"), "id", "s", "rel", k = 5)
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Double]("ndcg")).map(_.doubleValue)).toMap
    assert(got(1L) === Some(1.0))
    assert(got(2L).get < 1.0 && got(2L).get > 0.0)
    assert(got(3L) === None)
  }

  test("matches an independent local computation on pseudo-random data; layout-invariant") {
    val rows = (1 to 400).map { i =>
      val q = (i * 2654435761L % 7) + 1
      (q, i.toLong, (i * 48611 % 101).toDouble / 7.0, (i * 31 % 4).toLong)
    }
    def run(parts: Int) = Ranking.ndcgAtK(
        rows.toDF("q", "id", "s", "rel").repartition(parts),
        Seq("q"), "id", "s", "rel", k = 5)
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Double]("ndcg")).map(_.doubleValue)).toMap
    val got = run(7)
    rows.groupBy(_._1).foreach { case (q, qRows) =>
      val expect = localNdcg(qRows.map(r => (r._2, r._3, r._4)), 5)
      (got(q), expect) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-6, s"q=$q")
        case (a, b) => assert(a === b, s"q=$q")
      }
    }
    assert(run(1) === got) // rank-order folds: partitioning-invariant
  }

  test("ties break by id in both orders; k truncates") {
    // two docs tie on score; the lower id ranks first
    val rows = Seq((1L, 5L, 1.0, 0L), (1L, 4L, 1.0, 3L), (1L, 6L, 0.5, 3L))
      .toDF("q", "id", "s", "rel")
    // k=1: actual top-1 is id 4 (tie → min id) with rel 3; ideal top-1
    // rel 3 → ndcg = 1
    val k1 = Ranking.ndcgAtK(rows, Seq("q"), "id", "s", "rel", k = 1)
      .select("ndcg").as[Double].head()
    assert(k1 === 1.0)
  }

  test("retrieval@k: hits, precision, recall, reciprocal rank — exact by hand") {
    val rows = Seq(
      // q1: 3 relevant of 4; top-5 by score: ids 10(r),11(n),12(r),13(r)
      (1L, 10L, 9.0, 1L), (1L, 11L, 8.0, 0L), (1L, 12L, 7.0, 2L),
      (1L, 13L, 6.0, 1L),
      // q2: relevant exists but OUTSIDE top-2 at k=2
      (2L, 20L, 9.0, 0L), (2L, 21L, 8.0, 0L), (2L, 22L, 7.0, 1L),
      // q3: nothing relevant anywhere
      (3L, 30L, 5.0, 0L))
      .toDF("q", "id", "s", "rel")
    val got = Ranking.retrievalAtK(rows, Seq("q"), "id", "s", "rel", k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          Option(r.getAs[java.lang.Double]("r_at_k")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("rr_at_k")).map(_.doubleValue))))
      .toMap
    // q1 at k=2: top-2 = ids 10, 11 → 1 hit; first relevant at rank 1
    assert(got(1L) === ((3L, 1L, 0.5, Some(1.0 / 3), Some(1.0))))
    // q2: relevant item ranks 3rd → no hit, rr NULL at cutoff
    assert(got(2L) === ((1L, 0L, 0.0, Some(0.0), None)))
    // q3: no relevant at all → recall undefined
    assert(got(3L) === ((0L, 0L, 0.0, None, None)))
  }

  test("fractional and out-of-range relevance abort loudly") {
    val frac = Seq((1L, 1L, 1.0, 1.5)).toDF("q", "id", "s", "rel")
    val e1 = intercept[Exception] {
      Ranking.ndcgAtK(frac, Seq("q"), "id", "s", "rel", k = 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e1).exists(_.contains("Ranking.ndcgAtK")))
    val neg = Seq((1L, 1L, 1.0, -1L)).toDF("q", "id", "s", "rel")
    val e2 = intercept[Exception] {
      Ranking.ndcgAtK(neg, Seq("q"), "id", "s", "rel", k = 3).collect()
    }
    assert(msgs(e2).exists(_.contains("[0, 40]")))
  }
}
