package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The at-rest embedding layout: recurring ANN passes must plan their
  * within-cell candidate join with zero shuffle exchanges off the
  * bucketed table, and agree bit-for-bit with the ad-hoc operators.
  */
class VectorStorageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb =
    graft.core.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val index = Ann.trainIvf(emb, nlist = 8)

  private def withTable(name: String)(body: => Unit): Unit = {
    val path = java.nio.file.Files
      .createTempDirectory("graft-vecstore").toString + "/vecs"
    VectorStorage.writeBucketed(emb, index, name, path, nBuckets = 4,
      carryCols = Seq("label"))
    try body finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("register re-attaches a written corpus with the cell bucketing intact") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-vecreg").toString + "/vecs"
    VectorStorage.writeBucketed(emb, index, "vec_reg_written", path,
      nBuckets = 4)
    try {
      val written = VectorStorage.semDedup(spark, "vec_reg_written", 0.4)
        .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
      spark.sql("DROP TABLE IF EXISTS vec_reg_written")
      VectorStorage.register(spark, "vec_reg_attached", path, nBuckets = 4)
      val attached = VectorStorage.semDedup(spark, "vec_reg_attached", 0.4)
        .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
      assert(attached === written)
      assert(attached.nonEmpty)
      val pairs = VectorStorage.cellPairs(spark, "vec_reg_attached")
      assert(graft.Explain.shuffleCount(pairs) === 0,
        "re-attached corpus must keep the candidate join exchange-free")
    } finally Seq("vec_reg_written", "vec_reg_attached")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("cell pairs: zero shuffle exchanges off the bucketed table") {
    withTable("vec_rest_plan") {
      val pairs = VectorStorage.cellPairs(spark, "vec_rest_plan")
      pairs.count()
      val s = pairs.queryExecution.executedPlan.toString
      assert(graft.Explain.shuffleCount(pairs) === 0,
        s"candidate join must consume the storage bucketing:\n$s")
      assert(s.contains("SortMergeJoin"),
        s"corpus-sized sides must never broadcast:\n$s")
    }
  }

  test("at-rest semDedup ≡ ad-hoc Ann.semDedup under the same index") {
    withTable("vec_rest_semdedup") {
      val atRest = VectorStorage.semDedup(spark, "vec_rest_semdedup", 0.4)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2))))
        .toMap
      val adHoc = Ann.semDedup(emb, index, threshold = 0.4)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2))))
        .toMap
      assert(atRest === adHoc)
      assert(atRest.values.exists(!_._2), "fixture should drop something")
    }
  }

  test("at-rest mutual NN ≡ celled mutual NN at nprobe=1") {
    withTable("vec_rest_mnn") {
      val atRest = VectorStorage.mutualNearestNeighbors(spark, "vec_rest_mnn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val celled = Ann.mutualNearestNeighborsCelled(emb, index, nprobe = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(atRest === celled)
      assert(atRest.nonEmpty)
    }
  }

  test("at-rest mutual NN rank-1 plan: candidate join off the bucketing, one id-sized exchange") {
    withTable("vec_rest_mnn_plan") {
      val rank1 = VectorStorage.mnnRank1Plan(spark, "vec_rest_mnn_plan")
      rank1.count()
      val s = rank1.queryExecution.executedPlan.toString
      // the candidate join consumes the storage bucketing; the only
      // exchange anywhere in the stage is the rank-1 aggregation's,
      // carrying (query_id, best-candidate) partials — never vectors
      assert(graft.Explain.shuffleCount(rank1) === 1,
        s"rank-1 stage must plan exactly one (id-sized) exchange:\n$s")
      assert(s.contains("SortMergeJoin"),
        s"corpus-sized sides must never broadcast:\n$s")
      // the exchange's input is the min(struct) PARTIAL aggregate —
      // the scored projection, never the vector payloads
      assert(!s.contains("Exchange hashpartitioning(cell"),
        s"no corpus-sized exchange on the cell key may appear:\n$s")
    }
  }

  test("at-rest hard negatives ≡ Ann.hardNegativeTopK at nprobe=1") {
    withTable("vec_rest_hneg") {
      val atRest = VectorStorage.hardNegatives(spark, "vec_rest_hneg",
          k = 3, keyCol = "label")
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSet
      val adHoc = Ann.hardNegativeTopK(emb, index, k = 3, nprobe = 1)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSet
      assert(atRest === adHoc)
      assert(atRest.nonEmpty)
    }
  }

  test("incremental batch check: exhaustive ≡ brute cross pairs; home-cell plan is exchange-free") {
    withTable("vec_rest_batch") {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      // batch = a slice of the corpus under shifted ids: every batch
      // vector has an exact at-rest twin (cos 1) plus whatever else
      val batch = emb.filter(pmod(col("vec_id"), lit(4L)) === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      val got = VectorStorage.checkBatch(spark, "vec_rest_batch", batch,
          index, threshold = 0.9, nprobe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // brute reference over the cross product
      val brute = Ann.bruteForceTopK(
          batch.withColumnRenamed("vec_id", "query_id"), emb,
          k = emb.count().toInt)
        .filter(col("cos") >= 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got === brute)
      // every batch vector found its exact twin
      assert(batch.collect().map(_.getLong(0)).forall(b =>
        got.exists(p => p._1 == b && p._2 == b - 100000L && p._3 == 1.0)))
      // home-cell check: zero shuffle exchanges (bucketed scan + broadcast)
      val home = VectorStorage.checkBatch(spark, "vec_rest_batch", batch,
        index, threshold = 0.9, nprobe = 1)
      home.count()
      assert(graft.Explain.shuffleCount(home) === 0,
        s"home-cell batch check must be exchange-free:\n" +
          home.queryExecution.executedPlan.toString)
    }
  }

  test("IvfStore: round-trip identity, latest-run, fingerprint ties index to corpus") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivfstore").toString
    try {
      val store = new IvfStore(spark, root)
      val hash = store.corpusFingerprint(emb)
      store.save("docs_ivf", "2026-08-15T00-00-00", index, hash)
      store.save("docs_ivf", "2026-08-15T01-00-00", index, hash)
      assert(store.latestRun("docs_ivf") === Some("2026-08-15T01-00-00"))
      val loaded = store.load("docs_ivf", store.latestRun("docs_ivf").get)
      // exact centroid round-trip (doubles through parquet are lossless)
      assert(loaded.centroids.map(_.toSeq).toSeq ===
        index.centroids.map(_.toSeq).toSeq)
      // celled query parity: probing with the loaded index reproduces
      // the fresh index's results exactly
      val q = emb.filter(col("vec_id") < 10)
        .withColumnRenamed("vec_id", "query_id")
      val fresh = Ann.ivfTopK(q, emb, index, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val replay = Ann.ivfTopK(q, emb, loaded, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(replay === fresh)
      // the fingerprint is layout-invariant but content-sensitive
      assert(store.corpusFingerprint(emb.repartition(13)) === hash)
      assert(store.corpusFingerprint(emb.limit(50)) !== hash)
      // meta records the pairing
      val meta = store.loadMetaJson("docs_ivf", "2026-08-15T01-00-00")
      assert(meta.contains(s""""training_hash":$hash"""))
      assert(meta.contains(""""nlist":8"""))
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(root))
  }
}
