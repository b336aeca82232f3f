package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "completely different content about spark catalyst optimizer rules"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (5L, "one two"), // too short for 3-shingles
    (6L, "completely different content about spark catalyst optimizer rules")  // exact dup of 3
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per distinct content") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_dups").orderBy("keep_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L, 5L))
    val byId = got.toMap
    assert(byId(1L) === 2L) // docs 1 and 4
    assert(byId(3L) === 2L) // docs 3 and 6
    assert(byId(2L) === 1L)
    assert(byId(5L) === 1L)
  }

  test("minhash LSH finds near and exact dup pairs, skips distinct docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup, jaccard 1
    assert(pairs.contains((3L, 6L))) // exact dup
    assert(pairs.contains((1L, 2L))) // near dup (one token differs)
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) && Set(a, b) != Set(3L, 6L) })
  }

  test("minhash jaccard estimate matches exact jaccard on planted pair") {
    val j = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .select("jaccard").as[Double].head()
    // 13 tokens → 11 shingles each, 10 shared, union 12 → 10/12
    assert(math.abs(j - 10.0 / 12.0) < 1e-6)
  }

  test("simhash: exact dups at hamming 0; distinct docs not paired") {
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got((1L, 4L)) === 0)
    assert(got((3L, 6L)) === 0)
    assert(!got.keySet.contains((1L, 3L)))
  }

  test("ngram jaccard pairs agree with hand-computed value") {
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .select("jaccard").as[Double].head()
    assert(math.abs(got - 10.0 / 12.0) < 1e-12)
  }

  // A doc duplicated more often than maxShingleDf used to lose its WHOLE
  // cluster: every shingle sat above the df cap, so no candidate pair was
  // ever generated (advisor round-2 finding). The exact-content pre-pass
  // collapses duplicates to one representative before the capped index.
  test("ngram jaccard: mass-duplicated cluster survives the shingle df cap") {
    val massText = "alpha beta gamma delta epsilon zeta eta theta"
    val nearText = "alpha beta gamma delta epsilon zeta eta iota"
    val rows = (1L to 8L).map(i => (i, massText)) ++
      Seq((9L, nearText),
        (10L, "totally unrelated words about something else entirely here"))
    val df = rows.toDF("doc_id", "text")
    val pairs = Dedup
      .ngramJaccardPairs(df, "doc_id", "text", threshold = 0.5, maxShingleDf = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // every intra-cluster pair of the 8 exact copies, at jaccard exactly 1
    val intra = for { a <- 1L to 8L; b <- (a + 1) to 8L } yield (a, b)
    intra.foreach(p => assert(pairs.get(p).contains(1.0), s"missing intra $p"))
    // near-dup rep pair expands onto every member: 6 shingles each,
    // 5 shared, union 7
    (1L to 8L).foreach(a =>
      assert(math.abs(pairs((a, 9L)) - 5.0 / 7.0) < 1e-12, s"missing ($a,9)"))
    assert(!pairs.keySet.exists(p => p._1 == 10L || p._2 == 10L))
    assert(pairs.size === intra.size + 8)
  }

  // The collapse must also hold for minhash LSH: 2,000 exact copies used
  // to fill the same bucket in all 32 bands (≈64M candidate rows before
  // dedup); collapsed, the banded index sees ONE representative and the
  // pair set comes out exactly — C(2000,2) intra pairs plus the near-dup
  // expansion onto every copy.
  test("minhash LSH: mass-duplicated cluster expands exactly, stays linear") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tonight"
    val rows = (1L to 2000L).map(i => (i, a)) ++ Seq((2001L, b)) ++
      (2002L to 2501L).map(i => (i, s"unique filler document number $i with completely distinct trailing content ${i * 7}"))
    val pairs = Dedup.minhashLsh(rows.toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.8)
    val n = pairs.count()
    // intra: C(2000,2); cross: jaccard(a,b) = 10/12 ≥ 0.8 onto all copies
    assert(n === 2000L * 1999 / 2 + 2000)
    val cross = pairs.filter(col("id_b") === 2001L)
    assert(cross.count() === 2000)
    assert(cross.select(min(col("jaccard"))).head().getDouble(0) === 0.833333)
    assert(pairs.filter(col("id_a") > 2001L || col("id_b") > 2001L).count() === 0)
  }

  test("deduplicate keeps one canonical doc per near-dup cluster") {
    val kept = Dedup.deduplicate(docs, "doc_id", "text", threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    // {1,2,4} collapse to 1; {3,6} collapse to 3; 5 untouched
    assert(kept === Set(1L, 3L, 5L))
  }

  test("deduplicateByQuality keeps the best-scoring member, ties by min id") {
    // score doc 2 highest in the {1,2,4} cluster; 3 and 6 tie → min id 3
    val scored = docs.withColumn("score",
      org.apache.spark.sql.functions.when(col("doc_id") === 2, 9L)
        .when(col("doc_id") === 6, 5L).when(col("doc_id") === 3, 5L)
        .otherwise(col("doc_id")))
    val got = Dedup.deduplicateByQuality(scored, "doc_id", "text", "score",
        threshold = 0.7)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Boolean]("kept")))).toMap
    assert(got(1L) === ((2L, false)))
    assert(got(2L) === ((2L, true)))
    assert(got(4L) === ((2L, false)))
    assert(got(3L) === ((3L, true)))
    assert(got(6L) === ((3L, false)))
    assert(got(5L) === ((5L, true)))
  }

  test("deduplicateByQuality accepts STRING ids like every other entry point") {
    // the tie-break must not negate the id arithmetically — string doc
    // ids are the common case (URLs, UUIDs) and every other dedup entry
    // point takes them
    val scored = docs
      .select(concat(lit("doc-"), col("doc_id")).as("doc_id"), col("text"))
      .withColumn("score",
        when(col("doc_id") === "doc-2", 9L).otherwise(1L))
    val got = Dedup.deduplicateByQuality(scored, "doc_id", "text", "score",
        threshold = 0.7)
      .collect()
      .map(r => r.getAs[String]("doc_id") ->
        ((r.getAs[String]("keep_id"), r.getAs[Boolean]("kept")))).toMap
    assert(got("doc-1") === (("doc-2", false)))
    assert(got("doc-2") === (("doc-2", true)))
    assert(got("doc-4") === (("doc-2", false)))
    // {3,6} tie at score 1 → min STRING id doc-3
    assert(got("doc-3") === (("doc-3", true)))
    assert(got("doc-6") === (("doc-3", false)))
    assert(got("doc-5") === (("doc-5", true)))
  }

  test("connected components: reliable-checkpoint mode is bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    try {
      val pairs = (1L to 60L).map(i => (i, i * 13 % 61 + 1))
        .toDF("id_a", "id_b")
      val local = Dedup.connectedComponents(pairs)
        .as[(Long, Long)].collect().toSet
      val reliable = Dedup.connectedComponents(pairs, checkpointDir = Some(dir))
        .as[(Long, Long)].collect().toSet
      assert(local === reliable)
      // the reliable mode actually wrote checkpoint state
      assert(new java.io.File(dir).listFiles != null &&
        new java.io.File(dir).listFiles.nonEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("deduplicateByQuality aborts loudly on a null score") {
    val scored = docs.withColumn("score",
      org.apache.spark.sql.functions.when(col("doc_id") === 2,
        org.apache.spark.sql.functions.lit(null).cast("long"))
        .otherwise(col("doc_id")))
    val ex = intercept[Exception] {
      Dedup.deduplicateByQuality(scored, "doc_id", "text", "score").count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("deduplicateByQuality")))
  }

  test("connected components resolve pair lists into canonical clusters") {
    // clusters: {1,2,4} via chain 1-2, 2-4; {3,6}; {7,8,9} via 7-8, 8-9
    val pairs = Seq((1L, 2L), (2L, 4L), (3L, 6L), (7L, 8L), (8L, 9L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 3L -> 3L, 6L -> 3L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  // Large-star/small-star must collapse DEEP components in O(log n)
  // rounds — min-label propagation would need one round per hop. A
  // 200-hop path exceeds maxRounds for propagation (50), so passing at
  // all proves the logarithmic alternation, not just the clustering.
  test("connected components collapse a 200-hop chain (diameter >> rounds)") {
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === 201)
    assert(got.forall(_._2 === 0L))
  }

  test("connected components match brute-force union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = ids.map(i => i -> find(i)).toMap
    // canonical = min of component: normalize the oracle's roots
    val byRoot = expected.groupBy(_._2).flatMap { case (_, members) =>
      val minId = members.keys.min
      members.keys.map(_ -> minId)
    }
    val got = Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === byRoot)
  }

  test("sql registration exposes the native kernels") {
    graft.functions.GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT size(word_shingles('a b c d', 3)) AS n_sh,
                simhash64(array('x','y')) AS sh,
                size(minhash_signature(array('a b c'), 8)) AS n_sig,
                size(minhash_bands(array('a b c'), 8, 4)) AS n_bands,
                size(winnow_fingerprint('some text to fingerprint')) AS n_fp,
                dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp""").head()
    assert(row.getAs[Int]("n_sh") === 2)
    assert(row.getAs[Int]("n_sig") === 8)
    assert(row.getAs[Int]("n_bands") === 4)
    assert(row.getAs[Int]("n_fp") > 0)
    assert(row.getAs[Double]("dp") === 11.0)
    assert(row.getAs[Long]("sh") ===
      SimHash.simhash64(Iterator("x", "y")))
  }

  test("winnow pairs: exact dups share fingerprints, distinct docs do not") {
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", minShared = 5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((3L, 6L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("word shingles: short docs yield empty, no phantom shingles") {
    val sh = docs.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
      .withColumn("n", size(col("sh")))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(sh(5L) === 0)
    assert(sh(1L) === 11)
  }

  test("substring spans: exact dups share all windows, near-dups the overlap") {
    val got = Dedup.substringSpanPairs(docs, "doc_id", "text",
        spanTokens = 5, minShared = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // 13 tokens → 9 distinct 5-windows; exact dups share all 9
    assert(got((1L, 4L)) === 9L)
    // 8 tokens → 4 distinct 5-windows; exact dups share all 4
    assert(got((3L, 6L)) === 4L)
    // docs 1,2 differ in the last token: windows 1..8 shared
    assert(got((1L, 2L)) === 8L)
    assert(!got.keySet.contains((1L, 3L)))
  }

  test("substring spans: count is exact even when the df cap drops windows") {
    // 12 docs all sharing one hot window; capped at df 5 the hot window
    // generates no candidates, but pairs that also share rare windows
    // keep their EXACT count (cap prunes candidates, never the verify)
    val base = "alpha beta gamma delta epsilon"
    val rows = (1L to 12L).map { i =>
      if (i <= 2) (i, s"$base zeta eta theta iota kappa")
      else (i, s"$base unique$i only$i here$i now$i stop$i")
    }
    val pairs = Dedup.substringSpanPairs(rows.toDF("doc_id", "text"),
        "doc_id", "text", spanTokens = 5, minShared = 1, maxSpanDf = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // docs 1,2 share 6 windows (identical text ⇒ all 6 of their windows)
    assert(pairs((1L, 2L)) === 6L)
    // hot-window-only pairs were capped away
    assert(!pairs.keySet.exists { case (a, b) => a >= 3L || b >= 3L })
  }

  test("incremental: bloom has no false negatives; checkBatch is exact") {
    val corpus = docs
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again and again today"), // dup of 1
      (102L, "a genuinely new document that the snapshot has never seen"),
      (103L, "one two"), // dup of 5
      (104L, "another brand new document")
    ).toDF("doc_id", "text")
    val bf = Incremental.buildBloom(corpus, "text", expectedItems = 1000L)
    val idx = Incremental.snapshotIndex(corpus, "text")
    val got = Incremental.checkBatch(batch, idx, bf, "doc_id", "text")
      .select("doc_id", "is_new")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(101L -> false, 102L -> true, 103L -> false, 104L -> true))
    val newIds = Incremental.newDocs(batch, idx, bf, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(newIds === Set(102L, 104L))
  }

  test("containment catches embedded docs that jaccard dilutes away") {
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val page = (1 to 60).map(i => s"p$i").mkString(" ") + " " + quote +
      " " + (1 to 40).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, quote), (2L, page)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // the quote's 10 shingles all appear in the page → containment 1.0
    assert(cont((1L, 2L)) === 1.0)
    // while jaccard (10 shared / ~112 union) is nowhere near a near-dup
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text", threshold = 0.5)
    assert(jac.count() === 0L)
  }

  test("containment dominates jaccard on the harness corpus") {
    // |A∩B|/min ≥ |A∩B|/union pointwise, so at any shared threshold the
    // jaccard pair set is a subset of the containment pair set — a
    // cross-operator invariant over real data, not a planted example
    val corpus = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val jac = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val con = Dedup.containmentPairs(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac.nonEmpty)
    assert(jac.keySet.subsetOf(con.keySet))
    jac.foreach { case (pair, j) =>
      assert(con(pair) >= j - 1e-12, s"$pair: containment ${con(pair)} < jaccard $j")
    }
  }

  test("leakage-safe split: near-dup clusters never straddle the boundary") {
    val got = Dedup.leakageSafeSplit(docs, "doc_id", "text", threshold = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // docs 1,2,4 form one near-dup cluster (canonical 1); 3,6 another
    assert(got(1L)._1 === 1L && got(2L)._1 === 1L && got(4L)._1 === 1L)
    assert(got(3L)._1 === 3L && got(6L)._1 === 3L)
    assert(got(5L)._1 === 5L) // singleton labels itself
    // the invariant the operator exists for: one split per cluster
    assert(Set(got(1L)._2, got(2L)._2, got(4L)._2).size === 1)
    assert(got(3L)._2 === got(6L)._2)
    // deterministic across runs
    val again = Dedup.leakageSafeSplit(docs, "doc_id", "text", threshold = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again === got)
  }

  test("bucketed corpus: exact dedup plans with zero shuffle exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val path = java.nio.file.Files.createTempDirectory("graft-corpus").toString + "/docs"
    CorpusStorage.writeBucketed(docs, "text", "corpus_bucketed_spec", path,
      nBuckets = 4)
    try {
      val dd = CorpusStorage.exactDedup(spark, "corpus_bucketed_spec", "doc_id")
      // same answer as the plain-path operator
      val got = dd.select("keep_id", "n_dups").orderBy("keep_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val plain = Dedup.exact(docs, "doc_id", "text")
        .select("keep_id", "n_dups").orderBy("keep_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === plain)
      // and the at-rest bucketing replaced the groupBy exchange
      dd.count()
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case o => o.children
        }
        (p match { case _: ShuffleExchangeExec => 1; case _ => 0 }) +
          kids.map(shuffles).sum
      }
      assert(shuffles(dd.queryExecution.executedPlan) === 0)
    } finally spark.sql("DROP TABLE IF EXISTS corpus_bucketed_spec")
  }

  test("bucketed corpus: snapshot replace is overwrite-only, identifiers gated") {
    val path = java.nio.file.Files.createTempDirectory("graft-corpus2").toString + "/docs"
    CorpusStorage.writeBucketed(docs.limit(3), "text", "corpus_replace_spec",
      path, nBuckets = 2)
    try {
      // second write replaces in place (no pre-DROP window with no table)
      CorpusStorage.writeBucketed(docs, "text", "corpus_replace_spec",
        path, nBuckets = 2)
      assert(CorpusStorage.scan(spark, "corpus_replace_spec").count() === 6)
      intercept[IllegalArgumentException] {
        CorpusStorage.writeBucketed(docs, "text", "bad name; DROP TABLE x", path)
      }
    } finally spark.sql("DROP TABLE IF EXISTS corpus_replace_spec")
  }

  test("minhash at rest: pairs and dedup equal the ad-hoc pass; candidate join is exchange-free") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-mhstore").toString + "/corpus"
    MinHashStorage.writeBucketed(docs, "doc_id", "text",
      "mh_rest_spec", path, nBuckets = 2)
    try {
      val adhoc = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val atRest = MinHashStorage.pairs(spark, "mh_rest_spec",
          threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(atRest === adhoc)
      assert(atRest.nonEmpty)
      // the corpus-sized band self-join consumes the storage bucketing
      assert(graft.Explain.shuffleCount(
          MinHashStorage.candidatePlan(spark, "mh_rest_spec")) === 0,
        "banded candidate self-join must plan zero shuffle exchanges " +
          "under the (band, bucket) bucketing")
      // survivor semantics match the ad-hoc deduplicate
      val survivorsAdhoc = Dedup.deduplicate(docs, "doc_id", "text",
          threshold = 0.7)
        .select("doc_id").as[Long].collect().toSet
      val survivorsRest = MinHashStorage.deduplicate(spark, "mh_rest_spec",
          threshold = 0.7)
        .as[Long].collect().toSet
      assert(survivorsRest === survivorsAdhoc)
    } finally {
      spark.sql("DROP TABLE IF EXISTS mh_rest_spec")
      spark.sql("DROP TABLE IF EXISTS mh_rest_spec_shingles")
      spark.sql("DROP TABLE IF EXISTS mh_rest_spec_members")
    }
  }

  test("minhash at rest: batch check finds near-dups of stored docs; empty corpus bootstraps") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-mhbatch").toString
    // corpus = docs 1, 3, 5; batch = texts of 2 (near-dup of 1),
    // 4 (exact dup of 1), 6 (exact dup of 3), re-keyed +100
    val corpus = docs.filter(col("doc_id").isin(1L, 3L, 5L))
    val batch = docs.filter(col("doc_id").isin(2L, 4L, 6L))
      .select((col("doc_id") + 100L).as("doc_id"), col("text"))
    MinHashStorage.writeBucketed(corpus, "doc_id", "text",
      "mh_batch_spec", s"$path/c", nBuckets = 2)
    try {
      val got = MinHashStorage.checkBatch(spark, "mh_batch_spec", batch,
          threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // 13-word texts → 11 shingles; one differing tail word leaves 10
      // shared of 12 distinct → 10/12
      assert(got === Set((102L, 1L, 0.833333), (104L, 1L, 1.0),
        (106L, 3L, 1.0)))
      // empty corpus: zero hits, no abort (incremental bootstrap)
      MinHashStorage.writeBucketed(corpus.filter(lit(false)), "doc_id",
        "text", "mh_batch_empty", s"$path/e", nBuckets = 2)
      assert(MinHashStorage.checkBatch(spark, "mh_batch_empty", batch)
        .count() === 0L)
      // the restart path must bootstrap too: an empty corpus has no
      // parquet footers, so register reads the schema sidecars
      MinHashStorage.register(spark, "mh_batch_empty_reg", s"$path/e",
        nBuckets = 2)
      assert(MinHashStorage.checkBatch(spark, "mh_batch_empty_reg", batch)
        .count() === 0L)
    } finally Seq("mh_batch_spec", "mh_batch_spec_shingles",
      "mh_batch_spec_members", "mh_batch_empty", "mh_batch_empty_shingles",
      "mh_batch_empty_members", "mh_batch_empty_reg",
      "mh_batch_empty_reg_shingles", "mh_batch_empty_reg_members")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("minhash at rest: register re-attaches a written corpus with the bucket spec intact") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-mhreg").toString + "/corpus"
    MinHashStorage.writeBucketed(docs, "doc_id", "text",
      "mh_reg_written", path, nBuckets = 2)
    try {
      val written = MinHashStorage.pairs(spark, "mh_reg_written",
          threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // a "new session": drop the catalog entries, re-attach from disk
      Seq("mh_reg_written", "mh_reg_written_shingles",
        "mh_reg_written_members")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      MinHashStorage.register(spark, "mh_reg_attached", path, nBuckets = 2)
      val attached = MinHashStorage.pairs(spark, "mh_reg_attached",
          threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(attached === written)
      assert(attached.nonEmpty)
      // the re-attached declaration keeps the zero-exchange contract
      assert(graft.Explain.shuffleCount(
          MinHashStorage.candidatePlan(spark, "mh_reg_attached")) === 0,
        "re-registered corpus must keep the bucketed candidate join " +
          "exchange-free")
    } finally Seq("mh_reg_written", "mh_reg_written_shingles",
      "mh_reg_written_members", "mh_reg_attached",
      "mh_reg_attached_shingles", "mh_reg_attached_members")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("incremental: bloom round-trips through the Hadoop FS path") {
    val bf = Incremental.buildBloom(docs, "text", expectedItems = 1000L)
    val p = java.nio.file.Files.createTempDirectory("bloom").toString + "/snap.bloom"
    Incremental.saveBloom(spark, bf, p)
    val back = Incremental.loadBloom(spark, p)
    // identical membership answers on corpus hashes and on novel values
    val hs = docs.select(xxhash64(col("text"))).as[Long].collect()
    hs.foreach(h => assert(back.mightContainLong(h) === bf.mightContainLong(h)))
    (1L to 100L).foreach(h =>
      assert(back.mightContainLong(h) === bf.mightContainLong(h)))
  }
}
