package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.expressions.TextExpressions

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token count: whitespace runs, blanks, empties") {
    val df = Seq("one two  three", "", "   ", "single", "a b c d")
      .toDF("text")
      .select(TextFunctions.tokenCount(col("text")).as("n"))
    assert(df.as[Int].collect().toSeq === Seq(3, 0, 0, 1, 4))
  }

  test("bpeish tokens segment letters/digits/symbols") {
    val got = Seq("hello world42 x!y")
      .toDF("text")
      .select(TextFunctions.bpeishTokens(col("text")).as("t"))
      .as[Seq[String]].head()
    assert(got === Seq("hello", " world", "42", " x", "!", "y"))
  }

  test("quality score bounded in [0,1] and ranks richer text higher") {
    val df = Seq(
      ("good", "the cat sat on the mat and it was a good day for all of us to be here"),
      ("junk", "!!! ??? *** ### @@@ %%%"))
      .toDF("k", "text")
      .select(col("k"), TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(df("good") > df("junk"))
    assert(df.values.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("langId picks marker-dominant language, falls back to en") {
    val df = Seq(
      ("the cat and the dog of it", "en"),
      ("el perro y la casa de que", "es"),
      ("der hund und die katze ist", "de"),
      ("xyzzy plugh qwerty", "en") // no markers → fallback
    ).toDF("text", "expected")
    val got = df.select(TextFunctions.langId(col("text")).as("got"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("winnow fingerprint: deterministic, shift-tolerant, edit-local") {
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "PREFIX " + a // shifted copy
    val c = "completely unrelated text with other characters"
    val fa = Winnow.fingerprint(a).toSet
    val fb = Winnow.fingerprint(b).toSet
    val fc = Winnow.fingerprint(c).toSet
    assert(Winnow.fingerprint(a).toSeq === Winnow.fingerprint(a).toSeq)
    // shared suffix → substantial fingerprint overlap
    assert((fa & fb).size.toDouble / fa.size > 0.5)
    // unrelated text → little overlap
    assert((fa & fc).size.toDouble / fa.size < 0.2)
  }

  test("winnow expression matches the JVM kernel through codegen") {
    val texts = Seq("some document text for fingerprinting", "ab", "")
    val got = texts.toDF("text")
      .select(TextExpressions.winnow_fingerprint(col("text")).as("fp"))
      .as[Seq[Long]].collect()
    val want = texts.map(t => Winnow.fingerprint(t).toSeq)
    assert(got.toSeq === want)
  }

  test("pii scrub: emails and urls replaced, url-embedded emails scrub as url") {
    val rows = Seq(
      "mail a@b.co and c.d+x@e-f.org twice",
      "see https://ex.org/p?u=a@b.co next http://plain.io/x done",
      "no pii here at all").toDF("text")
    val got = rows.select(
      TextFunctions.scrubPii(col("text")).as("s"),
      TextFunctions.emailCount(col("text")).as("ne"),
      TextFunctions.urlCount(col("text")).as("nu"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(got(0) === (("mail <EMAIL> and <EMAIL> twice", 2, 0)))
    // URL scrubbed FIRST, so the query-string email disappears with it
    assert(got(1) === (("see <URL> next <URL> done", 1, 2)))
    assert(got(2) === (("no pii here at all", 0, 0)))
  }

  test("sequence packing: per-shard offsets and boundary-crossing packs") {
    // one shard; budgets force doc 3 to straddle packs 0→1
    val docs = Seq(
      (1L, Seq.fill(4)("w").mkString(" ")),   // offset 0, tokens 4 → pack 0
      (2L, Seq.fill(3)("w").mkString(" ")),   // offset 4 → pack 0
      (3L, Seq.fill(5)("w").mkString(" ")),   // offset 7, last token 11 → packs 0..1
      (4L, ""),                               // zero tokens: no span
      (5L, Seq.fill(2)("w").mkString(" ")))   // offset 12 → pack 1
      .toDF("doc_id", "text")
    val got = graft.text.Packing
      .packOffsets(docs, "doc_id", "text", budget = 8, shard = lit(0))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, 4, 0L, 0L, 0L), (2L, 3, 4L, 0L, 0L), (3L, 5, 7L, 0L, 1L),
      (4L, 0, 12L, 1L, 1L), (5L, 2, 12L, 1L, 1L)))
  }

  test("decontaminate: shared 3-grams flagged, short/clean docs are not") {
    val evalSet = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then alpha beta gamma inside"), // shares one 3-gram
      (2L, "Alpha  Beta GAMMA DELTA"),                   // case/ws-insensitive: 2 grams
      (3L, "completely different content here"),
      (4L, "al be"))                                     // shorter than n
      .toDF("doc_id", "text")
    val got = Decontaminate.ngramOverlap(corpus, evalSet, n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq(
      (1L, 1L, true), (2L, 2L, true), (3L, 0L, false), (4L, 0L, false)))
  }

  test("fuzzy decontamination: paraphrase-level near-dups pair across corpora, both join regimes agree") {
    // eval doc 100 reworded in corpus doc 1 (high shingle jaccard, NOT
    // a verbatim 5-gram match); doc 2 is an exact copy; doc 3 unrelated
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val evalSet = Seq((100L, base)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the old river bank tonight"),
      (2L, base),
      (3L, "entirely unrelated text about catalyst optimizer internals and shuffles"))
      .toDF("doc_id", "text")
    val pairs = Decontaminate.fuzzyPairs(corpus, evalSet, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 100L), (2L, 100L)))
    assert(pairs.find(_._1 == 2L).get._3 === 1.0)
    // the shuffle regime (eval too big to broadcast) returns the same pairs
    val shuffled = Decontaminate.fuzzyPairs(corpus, evalSet, threshold = 0.7,
        maxBroadcastBandRows = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(shuffled === pairs.toSet)
    // per-doc verdicts: every corpus row present, flag semantics
    val flags = Decontaminate.fuzzyOverlap(corpus, evalSet, threshold = 0.7)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(flags(1L)._2 && flags(2L) === ((1L, true)))
    assert(flags(3L) === ((0L, false)))
  }

  test("temperature mixing: α=1 preserves shares, α→0 flattens, small domains keep all") {
    import graft.operators.Sampling
    // head domain 800 rows, tail domains 150 / 50
    val df = (1L to 1000L).map { i =>
      (i, if (i <= 800) "head" else if (i <= 950) "mid" else "tail")
    }.toDF("doc_id", "source")
    def plan(alpha: Double, target: Long) = Sampling
      .temperatureMixPlan(df, "source", alpha, target)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // α = 1: share ∝ n → every fraction is target/total (uniform thinning)
    val p1 = plan(1.0, 500L)
    assert(p1.values.forall { case (_, f) => math.abs(f - 0.5) < 1e-9 })
    // α = 0.5: the tail's keep fraction rises above the head's
    val p05 = plan(0.5, 500L)
    assert(p05("tail")._2 > p05("mid")._2 && p05("mid")._2 > p05("head")._2)
    // fractions match the closed form
    val s = math.sqrt(800.0) + math.sqrt(150.0) + math.sqrt(50.0)
    val expectHead = 500.0 * math.sqrt(800.0) / s / 800.0
    assert(math.abs(p05("head")._2 - expectHead) < 1e-6)
    // a small domain never up-samples: fraction caps at 1
    val pBig = plan(0.1, 100000L)
    assert(pBig.values.forall(_._2 === 1.0))
    // the selection is deterministic, respects the fractions, and keeps
    // roughly the budget
    val kept = Sampling.temperatureMixture(df, "source", "doc_id", 0.5, 500L)
    val kept2 = Sampling.temperatureMixture(df.repartition(13), "source",
      "doc_id", 0.5, 500L)
    assert(kept.collect().map(_.getLong(0)).toSet ===
      kept2.collect().map(_.getLong(0)).toSet)
    val total = kept.count()
    assert(total > 350 && total < 650, s"kept $total of a 500 budget")
  }

  test("domain mixture: deterministic selection, fraction 1.0 keeps all, unknown domain dropped") {
    import graft.operators.Sampling
    val df = (1L to 400L).map(i => (i, s"dom${i % 4}")).toDF("doc_id", "source")
    val fr = Map("dom0" -> 1.0, "dom1" -> 0.5, "dom2" -> 0.0)
    val a = Sampling.domainMixture(df, "source", "doc_id", fr).collect().toSet
    val b = Sampling.domainMixture(df, "source", "doc_id", fr).collect().toSet
    assert(a === b) // deterministic selection, not just rate
    val bySrc = a.groupBy(_.getString(1)).view.mapValues(_.size).toMap
    assert(bySrc.getOrElse("dom0", 0) === 100) // fraction 1.0 → every row
    assert(bySrc.getOrElse("dom2", 0) === 0)   // fraction 0.0 → none
    assert(!bySrc.contains("dom3"))            // absent → defaultFraction 0.0
    val d1 = bySrc.getOrElse("dom1", 0)        // hash threshold ≈ fraction
    assert(d1 > 25 && d1 < 75, s"dom1 kept $d1 of 100")
  }

  test("vocabTopK counts and orders deterministically") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "  "),                  // blank → no tokens
      (4L, "Apple date")           // case-folded
    ).toDF("doc_id", "text")
    val got = CorpusStats.vocabTopK(docs, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("apple", 3L), ("banana", 2L), ("cherry", 1L)))
  }

  test("keywordTopK ranks by tf/df with lexicographic ties") {
    val docs = Seq(
      (1L, "rare rare common"),
      (2L, "common other")
    ).toDF("doc_id", "text")
    val got = CorpusStats.keywordTopK(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    // doc 1: rare tf=2 df=1 (score 2.0) beats common tf=1 df=2 (0.5)
    assert(got.filter(_._1 == 1L).sortBy(_._2) ===
      Seq((1L, 1, "rare", 2L, 1L), (1L, 2, "common", 1L, 2L)))
    // doc 2: other (1/1) beats common (1/2)
    assert(got.filter(_._1 == 2L).sortBy(_._2) ===
      Seq((2L, 1, "other", 1L, 1L), (2L, 2, "common", 1L, 2L)))
  }

  test("null text: stats go null (not crash), dedup groups nulls apart") {
    val docs = Seq((1L, "real text here"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // column stats propagate null — callers filter, nothing throws
    val r = docs.filter(col("doc_id") === 2)
      .select(TextFunctions.tokenCount(col("text")),
        TextFunctions.qualityScore(col("text")),
        CharNgrams.charNgrams(col("text"), 3)).head()
    assert(r.isNullAt(0))
    // least/greatest skip nulls, so the quality clamps settle at a fixed
    // defined value for null text (1 + 1 + 0)/3 — deterministic, no crash
    assert(math.abs(r.getDouble(1) - 2.0 / 3.0) < 1e-12)
    // the null-condition when() falls to otherwise: empty grams, not null
    assert(r.getSeq[String](2) === Seq.empty)
    // chunker emits no chunks for null text
    assert(Chunker.chunk(docs, "doc_id", "text", 8, 2)
      .filter(col("doc_id") === 2).count() === 0L)
    // exact dedup: null text is its own group (xxhash64(null) = seed),
    // never merged with real content
    val groups = graft.dedup.Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_dups")
      .collect().map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap
    assert(groups === Map(1L -> 1L, 2L -> 1L))
  }

  test("c4 line rules: punctuation + word floor keep, page flags") {
    val page = Seq((1L,
      "Home | About | Contact\n" +            // no terminal punct → drop
      "This is a real sentence with enough words.\n" +
      "Short one.\n" +                        // punctuated, 2 words → drop
      "Accept all cookies to continue browsing now\n" + // no punct → drop
      "Another proper sentence follows right here!"))
      .toDF("doc_id", "text")
    val got = page.select(
        TextFunctions.c4KeptLines(col("text")).as("kept"),
        TextFunctions.c4CleanText(col("text")).as("clean"),
        TextFunctions.c4PageFlagged(col("text")).as("flag")).head()
    assert(got.getSeq[String](0) === Seq(
      "This is a real sentence with enough words.",
      "Another proper sentence follows right here!"))
    assert(got.getString(1).split("\n").length === 2)
    assert(!got.getBoolean(2))
    val flags = Seq((1L, "has Lorem Ipsum inside"), (2L, "code { spill }"),
      (3L, "clean page text."))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.c4PageFlagged(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(1L -> true, 2L -> true, 3L -> false))
  }

  test("corpus pipeline: each stage removes exactly its targets") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ") // 30 tokens
    val evalText = "held out benchmark sentence with exactly these tokens kept apart " +
      (1 to 15).map(i => s"ev$i").mkString(" ")
    val corpus = Seq(
      (1L, base + " alpha"),       // survivor
      (2L, base + " alpha"),       // exact dup of 1 → dropped by dedup
      (3L, "too short"),           // dropped by quality gate
      (4L, base + " beta"),        // near dup of 1 (jaccard > 0.8) → dropped
      (5L, "a fresh unrelated document " + (1 to 25).map(i => s"x$i").mkString(" ")),
      (6L, "contains held out benchmark sentence with exactly these tokens " +
        (1 to 20).map(i => s"y$i").mkString(" ")) // contaminated → dropped
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, evalText)).toDF("doc_id", "text")
    val got = CorpusPipeline.curate(corpus, evalSet, minTokens = 10,
        packBudget = 16, packShards = 2)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 5L))
    // packing saw only the survivors: doc 1 (31 tokens, shard 1) and
    // doc 5 (29 tokens, shard 1) — doc 5 starts where doc 1 ended
    val byId = got.map(r => r.getLong(0) ->
      (r.getLong(1), r.getInt(2), r.getLong(3))).toMap
    assert(byId(1L) === ((1L, 31, 0L)))
    assert(byId(5L) === ((1L, 29, 31L)))
  }

  test("corpus curation is idempotent under the stage runner") {
    // the §2.10 skip semantics are partition-label-generic: a corpus
    // snapshot id works exactly like a month key, so curation re-runs
    // skip when the curated snapshot already exists and validates
    import graft.core.{StageRef, StageStorage}
    import graft.orchestration.StageRunner
    val tmp = java.nio.file.Files.createTempDirectory("graft-corpus-run").toString
    val storage = new StageStorage(spark, tmp)
    val runner = new StageRunner(storage)
    val ref = StageRef("curated_corpus")
    val corpus = Seq(
      (1L, (1 to 25).map(i => s"c$i").mkString(" ")),
      (2L, (1 to 30).map(i => s"d$i").mkString(" "))).toDF("doc_id", "text")
    val evalSet = Seq((100L, "held out eval words")).toDF("doc_id", "text")
    var computes = 0
    def curateSnapshot(snapshot: String): org.apache.spark.sql.DataFrame = {
      computes += 1
      CorpusPipeline.curate(corpus, evalSet, minTokens = 10)
    }
    val r1 = runner.runMonths(ref, Seq("snap-001"), _ => 2L, curateSnapshot)
    assert(r1.head.ran && computes === 1)
    val r2 = runner.runMonths(ref, Seq("snap-001"), _ => 2L, curateSnapshot)
    assert(!r2.head.ran && computes === 1) // exists+valid → skipped
    val r3 = runner.runMonths(ref, Seq("snap-001"), _ => 2L, curateSnapshot,
      force = true)
    assert(r3.head.ran && computes === 2)
  }

  test("chunker: overlap windows, tail coverage, empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks → 3 chunks
      (2L, "a b c"),                                  // fits one window
      (3L, "   ")                                     // empty → no chunks
    ).toDF("doc_id", "text")
    val got = Chunker.chunk(docs, "doc_id", "text", size = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    // stride 3: starts 0,3,6 — K = ceil((10-1)/3) = 3; tail chunk covers w7..w10
    assert(got.filter(_._1 == 1L).toSeq === Seq(
      (1L, 0, 0, 4, "w1 w2 w3 w4"),
      (1L, 1, 3, 4, "w4 w5 w6 w7"),
      (1L, 2, 6, 4, "w7 w8 w9 w10")))
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0, 0, 3, "a b c")))
    assert(!got.exists(_._1 == 3L))
    // every token index is covered by at least one chunk
    val covered = got.filter(_._1 == 1L)
      .flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered === (0 until 10).toSet)
  }

  test("chunker: invariants hold across a parameter grid") {
    val texts = Seq(
      (1L, (1 to 37).map(i => s"w$i").mkString(" ")),
      (2L, "single"),
      (3L, (1 to 8).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    for (size <- Seq(1, 4, 8, 64); overlap <- Seq(0, size / 2, size - 1)
         if overlap < size) {
      val rows = Chunker.chunk(texts, "doc_id", "text", size, overlap)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      val byDoc = rows.groupBy(_._1)
      for ((id, n) <- Seq(1L -> 37, 2L -> 1, 3L -> 8)) {
        val cs = byDoc(id).sortBy(_._2)
        // chunk indices are dense from 0; every token covered; chunk
        // sizes positive and ≤ size; starts advance by the stride
        assert(cs.map(_._2).toSeq === cs.indices.toSeq)
        assert(cs.flatMap(c => c._3 until (c._3 + c._4)).toSet === (0 until n).toSet)
        assert(cs.forall(c => c._4 >= 1 && c._4 <= size))
        assert(cs.sliding(2).filter(_.length == 2)
          .forall(p => p(1)._3 - p(0)._3 == size - overlap))
      }
    }
  }

  test("char ngrams: overlapping trigrams, short-text empties, oov rates") {
    val grams = Seq((1L, "abcd"), (2L, "ab"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), CharNgrams.charNgrams(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(grams(1L) === Seq("abc", "bcd"))
    assert(grams(2L) === Seq.empty)
    assert(grams(3L) === Seq.empty)

    // corpus: "aaa" dominates; doc 4 is pure mojibake relative to it
    val docs = Seq((1L, "aaaaaa"), (2L, "aaaa"), (3L, "aaazzz"), (4L, "zzzz"))
      .toDF("doc_id", "text")
    val ref = CharNgrams.topNgrams(docs, "text", n = 3, k = 1)
    assert(ref.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("aaa", 7L)))
    val got = CharNgrams.oovStats(docs, ref, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got(1L) === ((4L, 0L, 0.0)))          // all aaa
    assert(got(4L) === ((2L, 2L, 1.0)))          // all OOV
    assert(got(3L)._1 === 4L && got(3L)._2 === 3L) // aaz, azz, zzz OOV
  }

  test("bpe training matches the hand-computed merge sequence") {
    // ab:2, abc:1 → pair (a,b) count 3 merges first, then (ab,c)
    val merges = Bpe.train(Seq(("ab", 2L), ("abc", 1L)), numMerges = 10)
    assert(merges === Seq(("a", "b"), ("ab", "c")))
    // frequency tie breaks to the lexicographically smallest pair
    val tied = Bpe.train(Seq(("xy", 1L), ("ab", 1L)), numMerges = 1)
    assert(tied === Seq(("a", "b")))
  }

  test("bpe encoding applies merges by rank, map-side") {
    val ranks = Seq(("a", "b"), ("ab", "c")).zipWithIndex.toMap
    assert(Bpe.encodeWord("abc", ranks) === Vector("abc"))
    assert(Bpe.encodeWord("abd", ranks) === Vector("ab", "d"))
    assert(Bpe.encodeWord("ba", ranks) === Vector("b", "a"))
    assert(Bpe.encodeWord("ababc", ranks) === Vector("ab", "abc"))
    val got = Seq((1L, "Abc abd"), (2L, ""), (3L, "zzz"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        Bpe.tokens(col("text"), Seq(("a", "b"), ("ab", "c"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq("abc", "ab", "d"))
    assert(got(2L) === Seq.empty)
    assert(got(3L) === Seq("z", "z", "z"))
  }

  test("bpe end-to-end: corpus-trained merges compress the corpus") {
    val docs = Seq.tabulate(20)(i => (i.toLong, "the quick brown fox " * 3))
      .toDF("doc_id", "text")
    val merges = Bpe.trainFromCorpus(docs, "text", numMerges = 20)
    assert(merges.nonEmpty && merges.size <= 20)
    val n = docs.select(size(Bpe.tokens(col("text"), merges)).as("n"))
      .as[Int].head()
    // 12 words × at most a few subwords each, far fewer than 57 chars
    assert(n >= 12 && n < 40)
  }

  test("simhash expression matches the JVM kernel; near-dups are close") {
    import graft.dedup.SimHash
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "the quick brown fox jumps over the lazy dog again and often"
    val got = Seq(t1, t2).toDF("text")
      .select(TextExpressions.simhash64(TextFunctions.wsTokens(col("text"))).as("h"))
      .as[Long].collect()
    assert(got(0) === SimHash.simhash64(t1.split("\\s+").iterator))
    assert(got(1) === SimHash.simhash64(t2.split("\\s+").iterator))
    assert(SimHash.hamming(got(0), got(1)) <= 16)
  }

  test("bm25: hand-checked scores on a tiny corpus") {
    val docs = Seq(
      (1L, "spark spark join"), (2L, "join hash"),
      (3L, "the quick fox"), (4L, "spark")
    ).toDF("doc_id", "text")
    val got = Bm25.score(docs, "doc_id", "text", Seq("spark", "join"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))

    // independent replay: N=4, avgdl=2.25, df(spark)=df(join)=2
    val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5)) // = ln 2
    def c(tf: Long, dl: Long): Double =
      (idf * (tf * 2.2)) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.25))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    assert(got.map(_._1).toSeq === Seq(1L, 2L, 4L)) // doc 3 never matches
    assert(got(0) === ((1L, r6(c(2, 3) + c(1, 3)), 2)))
    assert(got(1) === ((2L, r6(c(1, 2) + 0.0), 1)))
    assert(got(2) === ((4L, r6(c(1, 1) + 0.0), 1)))
    // higher tf and shorter doc both rank higher
    assert(got(0)._2 > got(2)._2 && got(2)._2 > got(1)._2)
  }

  test("bm25 plan: df and corpus stats broadcast, bounded shuffles") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val docs = (1L to 200L).map(i => (i, s"spark join doc $i word$i"))
      .toDF("doc_id", "text")
    val scored = Bm25.score(docs, "doc_id", "text", Seq("spark", "join"))
    scored.count()
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case o => o.children
      }
      p +: kids.flatMap(walk)
    }
    val nodes = walk(scored.queryExecution.executedPlan)
    // the (N, avgdl) scalars ship by broadcast, never by shuffling the
    // corpus against them
    assert(nodes.count(_.isInstanceOf[BroadcastExchangeExec]) >= 1)
    // the only shuffles: corpus stats agg, tf agg, df window on tf,
    // per-doc agg — a fifth would mean the corpus explode ran twice
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) <= 4)
  }
}
