package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.expressions.{VectorExpressions, VectorKernel}

/** Pins the rank-1 argmin rewrite (r13 optimization):
  * [[graft.functions.expressions.ArgMinScoreIdAgg]] must order EXACTLY
  * like `min(struct(score, id))` — Spark's double total order
  * (−0.0 ≡ 0.0, every NaN equal and greatest) then ascending id — and
  * return the winning row's raw score bit-for-bit, while planning as a
  * HashAggregate (primitive buffer) instead of the struct-buffer
  * SortAggregate it replaced.
  */
class AnnRank1Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("sortableDouble orders exactly like Spark's double ordering") {
    val specials = Seq(Double.NegativeInfinity, -1.0, -Double.MinPositiveValue,
      -0.0, 0.0, Double.MinPositiveValue, 0.5, 1.0, Double.MaxValue,
      Double.PositiveInfinity, Double.NaN,
      java.lang.Double.longBitsToDouble(0x7FF0000000000001L), // NaN payload
      java.lang.Double.longBitsToDouble(0xFFF8000000000000L)) // negative NaN
    for (a <- specials; b <- specials) {
      val want = Integer.signum(org.apache.spark.sql.catalyst.util
        .SQLOrderingUtil.compareDoubles(a, b))
      val got = Integer.signum(java.lang.Long.compare(
        VectorKernel.sortableDouble(a), VectorKernel.sortableDouble(b)))
      assert(got === want, s"sortable order disagrees for $a vs $b")
    }
  }

  test("argmin_score_id ≡ min(struct) bit-exactly: ties, ±0.0, NaN, null") {
    // crafted groups: score ties broken by id; −0.0 vs 0.0 tie (Spark-equal,
    // id decides, and the WINNING ROW's sign is returned); all-NaN group;
    // NaN never beats a real score; negative ids; nulls ignored.
    val rows = Seq(
      (1L, Some(10L), Some(0.5)), (1L, Some(3L), Some(0.5)),
      (1L, Some(99L), Some(0.9)),                                // tie at min → id 3
      (2L, Some(7L), Some(0.0)), (2L, Some(4L), Some(-0.0)),     // ±0 tie → id 4, its −0.0
      (3L, Some(8L), Some(-0.0)), (3L, Some(11L), Some(0.0)),    // ±0 tie → id 8, its −0.0
      (4L, Some(21L), Some(Double.NaN)), (4L, Some(12L), Some(Double.NaN)),
      (5L, Some(31L), Some(Double.NaN)), (5L, Some(44L), Some(2.0)),
      (6L, Some(-9L), Some(1.5)), (6L, Some(-2L), Some(1.5)),    // negative ids → −9
      (7L, Some(5L), Some(Double.NegativeInfinity)), (7L, Some(6L), Some(-1.0)),
      (8L, None, Some(-99.0)), (8L, Some(2L), None), (8L, Some(9L), Some(1.0))
    ).toDF("query_id", "neighbor_id", "negcos")

    val viaStruct = rows.filter(col("neighbor_id").isNotNull &&
        col("negcos").isNotNull)
      .select(col("query_id"),
        struct(col("negcos"), col("neighbor_id")).as("cand"))
      .groupBy("query_id").agg(min(col("cand")).as("best"))
      .select(col("query_id"), col("best.neighbor_id").as("nid"),
        col("best.negcos").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), bits(r.getDouble(2)))))
      .toMap

    val viaArgmin = rows
      .groupBy("query_id")
      .agg(VectorExpressions.argmin_score_id(col("negcos"),
        col("neighbor_id")).as("best"))
      .select(col("query_id"), col("best.id").as("nid"),
        col("best.score").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), bits(r.getDouble(2)))))
      .toMap

    assert(viaArgmin === viaStruct)
    assert(viaArgmin(1L)._1 === 3L)
    assert(viaArgmin(2L) === ((4L, bits(-0.0))))   // winner's own −0.0 survives
    assert(viaArgmin(3L)._1 === 8L)
    assert(viaArgmin(4L)._1 === 12L)
    assert(viaArgmin(5L)._1 === 44L)
    assert(viaArgmin(6L)._1 === -9L)
    assert(viaArgmin(7L)._1 === 5L)
    assert(viaArgmin(8L)._1 === 9L)                // null score/id rows ignored
  }

  test("argmin_score_id: all-null group evaluates to null") {
    val rows = Seq((1L, Option.empty[Long], Option.empty[Double]))
      .toDF("query_id", "neighbor_id", "negcos")
    val out = rows.groupBy("query_id")
      .agg(VectorExpressions.argmin_score_id(col("negcos"),
        col("neighbor_id")).as("best"))
      .collect()
    assert(out.length === 1 && out.head.isNullAt(1))
  }

  test("rank-1 aggregation plans as HashAggregate, not SortAggregate") {
    val emb = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val index = Ann.trainIvf(emb, nlist = 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft-rank1spec").toString + "/vecs"
    VectorStorage.writeBucketed(emb, index, "rank1_spec_corpus", path,
      nBuckets = 4)
    try {
      val rank1 = VectorStorage.mnnRank1Plan(spark, "rank1_spec_corpus")
      rank1.count()
      val plan = rank1.queryExecution.executedPlan.toString
      assert(plan.contains("HashAggregate"), plan)
      assert(!plan.contains("SortAggregate"), plan)
      // the brute-force path shares resolveScored; executes end-to-end
      assert(Ann.mutualNearestNeighbors(emb.limit(50), "vec_id",
        "embedding", None).count() >= 0)
    } finally spark.sql(s"DROP TABLE IF EXISTS rank1_spec_corpus")
  }
}
