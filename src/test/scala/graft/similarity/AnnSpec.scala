package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(0.0f, 0.0f, 0.0f))    // zero vector
  ).toDF("vec_id", "embedding")

  test("cosine: identity, orthogonal, opposite, zero-norm guard") {
    val q = vecs.filter(col("vec_id") === 0).withColumnRenamed("vec_id", "query_id")
    val got = Ann.bruteForceTopK(q, vecs, k = 5)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(got(0L) === 1.0)
    assert(got(2L) === 0.0)
    assert(got(3L) === -1.0)
    assert(got(4L) === 0.0) // zero vector guarded, not NaN
    assert(got(1L) > 0.99 && got(1L) < 1.0)
  }

  test("top-k ranks by cosine desc with id tie-break") {
    val q = vecs.filter(col("vec_id") === 0).withColumnRenamed("vec_id", "query_id")
    val got = Ann.bruteForceTopK(q, vecs, k = 3)
      .orderBy("rk").collect().map(_.getLong(2)).toSeq
    assert(got === Seq(0L, 1L, 2L)) // cos: 1.0, 0.993..., then tie 0.0/0.0 → min id
  }

  test("LSH top-k achieves high recall vs brute force on real embeddings") {
    val emb = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    val brute = Ann.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(queries, emb, k = 5, planes = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall > 0.3, s"recall=$recall") // 4 planes ≈ 1/16 of corpus probed
    // self-match always survives bucketing (identical vector, same bucket)
    assert((0L until 20L).forall(q => lsh.contains((q, q))))

    // multi-probe (flip-one-bit) recovers near-miss sign flips: recall is
    // a superset of single-probe candidates → monotonically ≥, and
    // substantially higher at few planes
    val multi = Ann.lshTopK(queries, emb, k = 5, planes = 4, probeRadius = 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallMulti = (brute & multi).size.toDouble / brute.size
    assert(recallMulti >= recall, s"multi=$recallMulti single=$recall")
    assert(recallMulti > 0.5, s"recallMulti=$recallMulti")
    // exactly 5 ranked rows per query even when probes overlap (dedupe
    // before ranking)
    val perQuery = Ann.lshTopK(queries, emb, k = 5, planes = 4, probeRadius = 1)
      .groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQuery.forall(_ === 5L))

    // exhaustive probe (radius = planes) IS brute force: identical ranked
    // rows, not just recall — the equivalence the driver oracle relies on
    val exhaustive = Ann.lshTopK(queries, emb, k = 5, planes = 4, probeRadius = 4)
      .select("query_id", "rk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val bruteRanked = Ann.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "rk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(exhaustive === bruteRanked)
  }

  test("mutual NN: twins pair, hubs pair at most once, one-way links drop") {
    // geometry on the unit circle: 1&2 identical (twins), 3 close to
    // them (one-way: nearest to the twin pair but they prefer each
    // other), 4&5 a mutual pair elsewhere, 6 isolated-ish
    def at(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val vecs = Seq(
      1L -> at(0), 2L -> at(0), 3L -> at(12),
      4L -> at(120), 5L -> at(125), 6L -> at(250))
    val got = Ann.mutualNearestNeighbors(
        vecs.toDF("vec_id", "embedding").repartition(3),
        "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // twins are each other's top-1 (self excluded BEFORE ranking);
    // 3's nearest is a twin but both twins prefer each other; 6's
    // nearest is 5, but 5 prefers 4
    assert(got === Set((1L, 2L), (4L, 5L)))
  }

  test("mutual NN celled: exhaustive probes ≡ exhaustive form; no corpus broadcast") {
    val emb = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(pmod(col("vec_id"), lit(3L)) === 0)
    val index = Ann.trainIvf(emb, nlist = 8)
    val brute = Ann.mutualNearestNeighbors(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // nprobe = nlist probes every cell: each pair meets exactly once
    // after the dedupe, so the celled result IS the exhaustive one —
    // the repo's exhaustive-probe oracle convention
    val celled = Ann.mutualNearestNeighborsCelled(emb, index, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(celled === brute)
    assert(brute.nonEmpty)
  }

  test("mutual NN celled: nprobe=1 recovers the pairs of well-separated clusters") {
    // four well-separated cluster centers in 8-dim; members differ by a
    // small deterministic wiggle, so every mutual pair is in-cluster
    val dims = 8
    val members = (0 until 80).map { i =>
      val cluster = i % 4
      val base = Array.fill(dims)(0.05f)
      base(cluster * 2) = 10.0f
      base((i / 4) % dims) += 0.01f * (1 + i % 7) // wiggle
      (i.toLong, base)
    }
    val df = members.toDF("vec_id", "embedding").repartition(5)
    val index = Ann.trainIvf(df, nlist = 4)
    val brute = Ann.mutualNearestNeighbors(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val celled = Ann.mutualNearestNeighborsCelled(df, index, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    val recall = (brute & celled).size.toDouble / brute.size
    assert(recall >= 0.9, s"celled mutual-NN recall=$recall on clustered data")
    // and nothing celled may be a false pair: mutuality is exact within
    // the probed candidate set, so every celled pair must be a brute
    // pair whenever clusters are cleanly separated
    assert((celled -- brute).isEmpty)
  }

  test("probeMasks enumerates exactly the ≤radius masks") {
    assert(Ann.probeMasks(4, 0) === Seq(0L))
    assert(Ann.probeMasks(4, 1).toSet ===
      Set(0L, 1L, 2L, 4L, 8L)) // identity + single-bit flips
    assert(Ann.probeMasks(4, 4).size === 16) // exhaustive = 2^planes
    assert(Ann.probeMasks(4, 4).distinct.size === 16)
    assert(Ann.probeMasks(8, 2).size === 1 + 8 + 28) // C(8,0)+C(8,1)+C(8,2)
  }

  test("IVF top-k: self-recall perfect, overall recall beats LSH at same probes") {
    val emb = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    val index = Ann.trainIvf(emb, nlist = 16)
    assert(index.centroids.length === 16)
    val ivf = Ann.ivfTopK(queries, emb, index, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vector → same cell → always retrieved
    assert((0L until 20L).forall(q => ivf.contains((q, q))))
    val brute = Ann.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.5, s"ivf recall=$recall") // nprobe=4 of 16 cells
  }

  test("hard negatives: wrong key only, exact when exhaustive, celled recall") {
    val emb = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val index = Ann.trainIvf(emb, nlist = 16)
    val exhaustive = Ann.hardNegativeTopK(emb, index, k = 3, nprobe = 16)
      .collect()
    // every row crosses the key boundary (self excluded for free)
    exhaustive.foreach { r =>
      assert(r.getAs[String]("anchor_key") !== r.getAs[String]("negative_key"))
      assert(r.getAs[Long]("query_id") !== r.getAs[Long]("neighbor_id"))
    }
    // exhaustive mining ≡ brute-force wrong-key top-k
    val labels = emb.select(col("vec_id"), col("label").cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val brute = Ann.bruteForceTopK(
        emb.withColumnRenamed("vec_id", "query_id"), emb, k = emb.count().toInt)
      .collect()
      .filter(r => labels(r.getLong(0)) != labels(r.getLong(2)))
      .groupBy(_.getLong(0))
      .toSeq
      .flatMap { case (_, rs) =>
        rs.sortBy(r => (-r.getDouble(3), r.getLong(2))).take(3)
          .map(r => (r.getLong(0), r.getLong(2))).toSeq
      }.toSet
    val got = exhaustive.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(got === brute)
    // celled (nprobe < nlist): still wrong-key-only, recall stays useful
    val celled = Ann.hardNegativeTopK(emb, index, k = 3, nprobe = 4)
      .collect().map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & celled).size.toDouble / brute.size
    assert(recall > 0.5, s"celled hard-negative recall=$recall")
  }

  test("int8 quantization: bounded error, cosine preserved, zero-safe") {
    val emb = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
    val q = emb.select(col("vec_id"), Ann.asDouble(col("embedding")).as("v"))
      .withColumn("q", Ann.quantizeInt8(col("v")))
      .withColumn("back", Ann.dequantize(col("q")))
      .withColumn("max_err",
        array_max(zip_with(col("v"), col("back"), (a, b) => abs(a - b))))
      .withColumn("scale", col("q.scale"))
      .withColumn("cos_orig_back", Ann.cosine(col("v"), col("back")))
    val rows = q.select("max_err", "scale", "cos_orig_back").collect()
    rows.foreach { r =>
      assert(r.getDouble(0) <= r.getDouble(1) / 2 + 1e-12) // err ≤ scale/2
      assert(r.getDouble(2) > 0.999) // quantization barely moves direction
    }
    // codes stay in int8 range; zero vector round-trips
    val codes = q.select(array_max(transform(col("q.codes"), c => abs(c))))
      .as[Int].collect()
    assert(codes.forall(_ <= 127))
    val z = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
      .select(Ann.dequantize(Ann.quantizeInt8(
        Ann.asDouble(col("embedding")))).as("back"))
      .as[Seq[Double]].head()
    assert(z === Seq(0.0, 0.0))
  }

  test("l2Normalize yields unit vectors and passes zero through") {
    val got = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Ann.l2Normalize(Ann.asDouble(col("embedding"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(math.abs(got(1L)(0) - 0.6) < 1e-12 && math.abs(got(1L)(1) - 0.8) < 1e-12)
    assert(got(2L) === Seq(0.0, 0.0))
  }

  test("hyperplanes are deterministic across calls") {
    assert(Ann.hyperplanes(4, 8).map(_.toSeq).toSeq ===
           Ann.hyperplanes(4, 8).map(_.toSeq).toSeq)
  }

  test("quantized refine: high recall at refine 2, exact when exhaustive") {
    val emb = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    val brute = Ann.bruteForceTopK(queries, emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // int8 reconstruction barely moves cosines → the approx stage keeps
    // the true top-k inside a 2× candidate set essentially always
    val refined = Ann.quantizedRefineTopK(queries, emb, k = 5, refineFactor = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val recall = (brute & refined).size.toDouble / brute.size
    assert(recall > 0.95, s"recall=$recall")
    // exhaustive refine ≡ brute force, row for row (the oracle equivalence)
    val n = emb.count().toInt
    val exact = Ann.quantizedRefineTopK(queries, emb, k = 5,
        refineFactor = (n + 4) / 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(exact === brute)
  }

  test("semDedup at nlist=1 equals the brute-force dominated rule") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),  // near-dup of 1 → dropped
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.98f, 0.15f)), // near-dup of 3 → dropped
      (5L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val idx = Ann.trainIvf(vecs, nlist = 1)
    val got = Ann.semDedup(vecs, idx, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false, 5L -> true))
  }

  test("semDedup clustered: only in-cluster dominated vectors drop") {
    // two tight groups far apart; nlist=2 separates them, and each
    // cluster independently keeps its lowest id
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.999f, 0.04f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.04f, 0.999f))
    ).toDF("vec_id", "embedding")
    val idx = Ann.trainIvf(vecs, nlist = 2)
    val rows = Ann.semDedup(vecs, idx, threshold = 0.9).collect()
    val kept = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L))
    // every dropped vector really has a lower-id in-cluster neighbor
    val cellOf = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cellOf(1L) === cellOf(2L) && cellOf(3L) === cellOf(4L))
    assert(cellOf(1L) !== cellOf(3L))
  }

  test("prototypicalityPrune keeps the farthest-from-centroid half per cell") {
    // two separated clusters of 4; within each, ids 3/4 (resp. 7/8) sit
    // farther from the cluster mean than 1/2 (resp. 5/6)
    val vecs = Seq(
      (1L, Array(1.00f, 0.00f)), (2L, Array(1.00f, 0.02f)),
      (3L, Array(1.00f, 0.30f)), (4L, Array(1.00f, -0.40f)),
      (5L, Array(-1.00f, 0.00f)), (6L, Array(-1.00f, 0.02f)),
      (7L, Array(-1.00f, 0.30f)), (8L, Array(-1.00f, -0.40f))
    ).toDF("vec_id", "embedding")
    val idx = Ann.trainIvf(vecs, nlist = 2)
    val rows = Ann.prototypicalityPrune(vecs, idx, keepFraction = 0.5).collect()
    val kept = rows.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(kept === Set(3L, 4L, 7L, 8L))
    // ceil(0.5 * 4) survivors per cell, and d2 ranks within the cell
    val byCell = rows.groupBy(_.getInt(1))
    assert(byCell.size === 2)
    byCell.values.foreach { cellRows =>
      assert(cellRows.count(_.getBoolean(3)) === 2)
      val minKeptD2 = cellRows.filter(_.getBoolean(3)).map(_.getDouble(2)).min
      val maxDropD2 = cellRows.filterNot(_.getBoolean(3)).map(_.getDouble(2)).max
      assert(minKeptD2 > maxDropD2)
    }
  }

  test("rrfFuse: reciprocal-rank fusion with missing-arm zeros") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val vec = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val got = Hybrid.rrfFuse(Seq("lex" -> lex, "vec" -> vec),
        Seq("doc_id"), "rank")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getDouble(3)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq === Seq(
      (10L, Some(1), None, r6(1.0 / 61)),
      (20L, Some(2), Some(1), r6(1.0 / 62 + 1.0 / 61)),
      (30L, Some(3), None, r6(1.0 / 63)),
      (40L, None, Some(2), r6(1.0 / 62))))
    // doc in both arms outranks every single-arm doc here
    val best = got.maxBy(_._4)
    assert(best._1 === 20L)
  }

  test("mutual NN celled: reliable checkpoint mode is bit-identical to local") {
    val emb = graft.core.Tables.table(spark, "/root/testdata/sf0.001",
      "embeddings")
    val index = Ann.trainIvf(emb, nlist = 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mnn-ckpt").toString
    try {
      val local = Ann.mutualNearestNeighborsCelled(emb, index, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val durable = Ann.mutualNearestNeighborsCelled(emb, index, nprobe = 2,
          checkpointDir = Some(dir))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(durable === local)
      assert(local.nonEmpty)
      // the reliable cut actually wrote state to the directory
      assert(new java.io.File(dir).listFiles != null &&
        new java.io.File(dir).listFiles.nonEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }
}
