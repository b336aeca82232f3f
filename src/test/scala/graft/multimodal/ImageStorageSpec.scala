package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The at-rest image-hash layout: recurring dedup passes must plan
  * their banded candidate join with zero shuffle exchanges off the
  * bucketed tables (no re-decode, no re-shuffle), and agree
  * bit-for-bit with the ad-hoc ImageHash operators.
  */
class ImageStorageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** 200 planted media: 40 grp clusters × (up to) 5 variants, the
    * ImageHash fixture — variants of one grp sit within Hamming 2.
    */
  private lazy val media = {
    import spark.implicits._
    (0L until 200L).map { id =>
      Multimodal.MediaRow(id, "image",
        ImageHash.fixturePng(id % 40, (id / 40 % 4).toInt))
    }.toDS()
  }
  private lazy val hashed = ImageHash.imageHashes(media).localCheckpoint()

  private def withTable(name: String, maxHamming: Int = 3)
                       (body: => Unit): Unit = {
    val path = java.nio.file.Files
      .createTempDirectory("graft-imgstore").toString + "/imgs"
    ImageStorage.writeBucketed(hashed, name, path, maxHamming, nBuckets = 4)
    try body finally {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"DROP TABLE IF EXISTS ${ImageStorage.membersTable(name)}")
    }
  }

  test("register re-attaches a written corpus; pairs and plan contract intact") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-imgreg").toString + "/imgs"
    ImageStorage.writeBucketed(hashed, "img_reg_written", path,
      maxHamming = 3, nBuckets = 4)
    try {
      val written = ImageStorage.pairs(spark, "img_reg_written")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      spark.sql("DROP TABLE IF EXISTS img_reg_written")
      spark.sql("DROP TABLE IF EXISTS img_reg_written_members")
      ImageStorage.register(spark, "img_reg_attached", path, nBuckets = 4)
      val attached = ImageStorage.pairs(spark, "img_reg_attached")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(attached === written)
      assert(attached.nonEmpty)
      assert(graft.Explain.shuffleCount(
          ImageStorage.candidatePlan(spark, "img_reg_attached", 3)) === 0,
        "re-attached corpus must keep the banded candidate join " +
          "exchange-free")
    } finally Seq("img_reg_written", "img_reg_written_members",
      "img_reg_attached", "img_reg_attached_members")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("at-rest pairs ≡ ad-hoc hammingPairs") {
    withTable("img_rest_pairs") {
      val atRest = ImageStorage.pairs(spark, "img_rest_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val adHoc = ImageHash.hammingPairs(hashed, "media_id", "dhash")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(atRest === adHoc)
      assert(atRest.nonEmpty, "fixture should plant near-dups")
      assert(atRest.exists(_._3 == 0), "exact re-encodes collapse at 0")
      assert(atRest.exists(_._3 > 0), "variants sit at hamming > 0")
    }
  }

  test("candidate join: zero shuffle exchanges off the band bucketing") {
    withTable("img_rest_plan") {
      val cand = ImageStorage.candidatePlan(spark, "img_rest_plan", 3)
      cand.count()
      val s = cand.queryExecution.executedPlan.toString
      assert(graft.Explain.shuffleCount(cand) === 0,
        s"banded candidate join must consume the storage bucketing:\n$s")
      assert(s.contains("SortMergeJoin"),
        s"corpus-sized sides must never broadcast:\n$s")
    }
  }

  test("full pairs plan never exchanges on a corpus-sized key") {
    withTable("img_rest_full_plan") {
      val p = ImageStorage.pairs(spark, "img_rest_full_plan")
      p.count()
      val s = p.queryExecution.executedPlan.toString
      // what DOES exchange is pair-bounded (candidate dedupe) or
      // id-sized (member expansion) — never the band or fp keys that
      // would re-shuffle the corpus the bucketing co-located
      assert(!s.contains("Exchange hashpartitioning(chunk"),
        s"no exchange on the band key may appear:\n$s")
      assert(!s.contains("Exchange hashpartitioning(fp"),
        s"no exchange on the fingerprint key may appear:\n$s")
    }
  }

  test("at-rest deduplicate ≡ ad-hoc ImageHash.deduplicate") {
    withTable("img_rest_dedup") {
      val atRest = ImageStorage.deduplicate(spark, "img_rest_dedup")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
      val adHoc = ImageHash.deduplicate(media)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
      assert(atRest === adHoc)
      assert(atRest.values.exists(!_._2), "fixture should drop something")
    }
  }

  test("batch check ≡ brute Hamming join; corpus side plans exchange-free") {
    withTable("img_rest_batch") {
      import spark.implicits._
      // batch: every 4th medium re-enters under a shifted id — each has
      // an exact at-rest twin plus its grp near-dups
      val batch = media.filter(_.media_id % 4 == 0)
        .map(m => m.copy(media_id = m.media_id + 1000L))
      val batchHashed = ImageHash.imageHashes(batch)
      val got = ImageStorage.checkBatch(spark, "img_rest_batch", batchHashed)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // brute reference over the collected fingerprints
      val corpusFp = hashed.collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val batchFp = batchHashed.collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val brute = (for {
        (bid, bf) <- batchFp
        (cid, cf) <- corpusFp
        h = java.lang.Long.bitCount(bf ^ cf)
        if h <= 3
      } yield (bid, cid, h)).toSet
      assert(got === brute)
      // every batch image finds its exact twin at hamming 0
      assert(batchFp.forall { case (bid, _) =>
        got.contains((bid, bid - 1000L, 0)) })
      // plan: the at-rest bands never shuffle — the batch broadcasts;
      // the only exchange is the pair-bounded candidate dedupe
      val plan = ImageStorage.checkBatch(spark, "img_rest_batch", batchHashed)
      plan.count()
      val s = plan.queryExecution.executedPlan.toString
      assert(!s.contains("Exchange hashpartitioning(chunk"),
        s"no exchange on the band key may appear:\n$s")
      assert(graft.Explain.shuffleCount(plan) <= 1,
        s"only the pair-bounded dedupe may exchange:\n$s")
    }
  }

  test("streaming media ingest: foreachBatch checks every delivery against the at-rest corpus") {
    withTable("img_rest_stream") {
      import spark.implicits._
      // new media arrive as parquet files; each micro-batch hashes
      // partition-local and runs the incremental check — the standard
      // foreachBatch stream-vs-static reconciliation recipe (inside
      // foreachBatch the delivery is an ordinary batch frame, so the
      // whole ImageStorage lane applies unchanged)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-imgstream").toString
      val batch1 = media.filter(_.media_id % 4 == 0)
        .map(m => m.copy(media_id = m.media_id + 1000L))
      // the file source lists dir/* — stage the part files at top level
      val staged = java.nio.file.Files
        .createTempDirectory("graft-imgstream-w").toString
      batch1.coalesce(1).write.mode("overwrite").parquet(staged)
      new java.io.File(staged).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(s"$dir/part-$i.parquet"))
        }
      val got = scala.collection.mutable.Set.empty[(Long, Long, Int)]
      val q = spark.readStream
        .schema(batch1.schema)
        .parquet(dir)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          val hits = ImageStorage.checkBatch(spark, "img_rest_stream",
            ImageHash.imageHashes(df.as[Multimodal.MediaRow]))
          got.synchronized {
            got ++= hits.collect().map(r =>
              (r.getLong(0), r.getLong(1), r.getInt(2)))
          }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(300000) finally q.stop()
      val direct = ImageStorage.checkBatch(spark, "img_rest_stream",
          ImageHash.imageHashes(batch1))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got.toSet === direct)
      assert(got.nonEmpty)
    }
  }

  test("an empty corpus bootstraps: zero pairs and zero batch hits, no abort") {
    import spark.implicits._
    val empty = hashed.filter(col("media_id") < 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-imgstore-empty").toString + "/imgs"
    ImageStorage.writeBucketed(empty, "img_rest_empty", path, nBuckets = 4)
    try {
      assert(ImageStorage.pairs(spark, "img_rest_empty").count() === 0L)
      val batch = ImageHash.imageHashes(
        media.filter(_.media_id < 8))
      assert(ImageStorage.checkBatch(spark, "img_rest_empty", batch)
        .count() === 0L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS img_rest_empty")
      spark.sql(s"DROP TABLE IF EXISTS " +
        ImageStorage.membersTable("img_rest_empty"))
    }
  }

  test("band-split mismatch aborts before planning") {
    withTable("img_rest_split") {
      val ex = intercept[IllegalArgumentException] {
        ImageStorage.pairs(spark, "img_rest_split", maxHamming = 7)
      }
      assert(ex.getMessage.contains("band chunks"))
    }
  }
}
