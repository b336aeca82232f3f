package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables.table
import graft.dedup.{Dedup, Incremental}

/** Deduplication operators over the `documents` table.
  *
  * `dedup_minhash_lsh` is the interesting one: the implementation goes
  * through MinHash signatures + LSH banding + exact-jaccard verification,
  * while the oracle brute-forces exact jaccard in SQL — with 128 hashes /
  * 32 bands, LSH recall at the 0.8 threshold is 1 − O(10⁻⁸), so the two
  * must agree (and a banding bug shows up as a hash mismatch).
  */
object DedupPack extends QueryPack {

  /** Shared oracle CTE: distinct word 3-shingles per document. */
  private val ShingleCte =
    """toks AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS a FROM documents),
      |idx AS (SELECT doc_id, a, UNNEST(GENERATE_SERIES(1, LEN(a)-2)) AS i FROM toks),
      |sh AS (SELECT DISTINCT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS g FROM idx),
      |n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS i
      |          FROM sh s1 JOIN sh s2 ON s1.g = s2.g AND s1.doc_id < s2.doc_id
      |          GROUP BY 1, 2),
      |jac AS (SELECT a, b, CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
      |        FROM inter JOIN n na ON na.doc_id = a JOIN n nb ON nb.doc_id = b)
      |""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup by content hash (keep min doc_id per distinct text).
    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(table(s, dir, "documents"), "doc_id", "text")
        .select("keep_id", "n_dups")
        .orderBy("keep_id")
    }),

    // MinHash + LSH near-dup pairs, verified with exact jaccard.
    "dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLsh(table(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),

    // MinHash-LSH pairs off the AT-REST banded corpus (MinHashStorage):
    // the corpus is shingled + signed ONCE and written as the three
    // bucketed tables (band rows keyed (band, bucket), shingle sets by
    // doc, collapse members by ch) — the layout a 100 TB text
    // deployment keeps so recurring near-dup passes skip re-shingling
    // AND the corpus-sized band shuffle (plan-asserted in DedupSpec).
    // The contract equals the ad-hoc minhashLsh, so the same
    // brute-force jaccard oracle applies.
    "dedup_minhash_at_rest" -> ((s, dir) => {
      val (tbl, path) = gateCorpus("minhash")
      graft.dedup.MinHashStorage.writeBucketed(
        table(s, dir, "documents"), "doc_id", "text", tbl, path,
        shingleSize = 3, numHashes = 128, bands = 32, nBuckets = 8)
      graft.dedup.MinHashStorage.pairs(s, tbl, threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),

    // Incremental near-dup batch check: docs ≡ 0 (mod 3) re-enter as a
    // NEW batch (ids shifted +1000000) against the at-rest banded
    // corpus of the rest — the text twin of mm_phash_batch_check. The
    // oracle is the brute batch×corpus jaccard join over the same
    // shingle sets (banding + storage must be invisible; recall at
    // t=0.8 is the LSH convention, ≥ 1−5e-8).
    "dedup_minhash_batch_check" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val corpus = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val (tbl, path) = gateCorpus("mhbatch")
      graft.dedup.MinHashStorage.writeBucketed(
        corpus, "doc_id", "text", tbl, path, nBuckets = 8)
      graft.dedup.MinHashStorage.checkBatch(s, tbl, batch,
          "doc_id", "text", threshold = 0.8)
        .orderBy("batch_id", "id")
    }),

    // Inverted-index n-gram jaccard pairs (threshold low enough to yield
    // non-planted pairs too).
    "dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(table(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b")
    }),

    // Prefix-filtered jaccard pairs — the LOSSLESS exact similarity
    // join: the oracle is the COMPLETE brute-force pair set (no cap
    // caveat, no LSH recall argument — prefix filtering guarantees
    // every qualifying pair is generated, the verify keeps precision).
    "dedup_prefix_jaccard" -> ((s, dir) => {
      Dedup.prefixJaccardPairs(table(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, threshold = 0.4)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b")
    }),

    // Full dedup workflow: LSH pairs → connected components → survivors.
    // Oracle: exact-jaccard edges (LSH recall ≈ 1 at t=0.8) + a recursive
    // CTE computing each node's min reachable label = component canonical.
    "dedup_resolve" -> ((s, dir) => {
      Dedup.deduplicate(table(s, dir, "documents"), "doc_id", "text",
          threshold = 0.8)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // Quality-aware resolve: keep the LONGEST member of each near-dup
    // cluster (ties by min id) — the curation-correct canonical, with
    // every doc's verdict in the output. Oracle: exact-jaccard
    // components + a rank-1 argmax per cluster.
    "dedup_resolve_best" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Dedup.deduplicateByQuality(docs, "doc_id", "text",
          scoreCol = "n_chars", threshold = 0.8)
        .orderBy("doc_id")
    }),

    // SimHash near-dup pairs (pigeonhole-bucketed). The token hash is an
    // exact public spec (FNV-1a 64 — SimHash.scala), so the oracle
    // re-derives every fingerprint in SQL and brute-forces hamming; with
    // maxHamming=3 and 4 chunks the pigeonhole candidates are COMPLETE,
    // so the Spark pair set must equal the brute-force set exactly.
    "dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(table(s, dir, "documents"), "doc_id", "text",
          maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // Asymmetric containment pairs: |A∩B|/min(|A|,|B|) — catches a doc
    // verbatim-embedded in a longer page where jaccard dilutes to ~0.
    "dedup_containment" -> ((s, dir) => {
      Dedup.containmentPairs(table(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, threshold = 0.8)
        .withColumn("containment", round(col("containment"), 6))
        .orderBy("id_a", "id_b")
    }),

    // Leakage-safe split: split keyed on the near-dup cluster's canonical
    // id so duplicates never straddle train/test. Oracle replays the
    // exact-jaccard components + the multiplicative hash rule.
    "dedup_leakage_split" -> ((s, dir) => {
      Dedup.leakageSafeSplit(table(s, dir, "documents"), "doc_id", "text",
          threshold = 0.8, trainPermille = 800)
        .orderBy("doc_id")
    }),

    // Exact-substring span pairs (ExactSubstr signal): docs sharing ≥3
    // distinct 5-token windows, with the exact shared-window count.
    // Production spans are ~15 tokens; the harness corpus averages 54
    // tokens/doc, so 5-token windows exercise the path non-vacuously.
    "dedup_substring_spans" -> ((s, dir) => {
      Dedup.substringSpanPairs(table(s, dir, "documents"), "doc_id", "text",
          spanTokens = 5, minShared = 3)
        .orderBy("id_a", "id_b")
    }),

    // MAXIMAL exact-substring spans (Lee et al. 2022 ExactSubstr): the
    // seed-and-extend construction must report every maximal shared
    // token span ≥ 5 tokens with its exact extents — the oracle replays
    // seeds, the df cap, and the gaps-and-islands extension verbatim.
    // The engine keys its seed index by xxhash64 and exact-verifies the
    // window text; the oracle keys by the window text directly, so
    // agreement certifies the hashed fast path is result-invisible.
    // All-integer output: zero float surface.
    "dedup_exactsubstr_spans" -> ((s, dir) => {
      graft.dedup.ExactSubstr.maximalSharedSpans(table(s, dir, "documents"),
          "doc_id", "text", spanTokens = 5)
        .orderBy("id_a", "id_b", "a_start", "b_start")
    }),

    // The ExactSubstr removal ACTION: every maximal shared span is cut
    // from the LATER doc (first occurrence kept) and the texts
    // re-joined — the oracle rebuilds every cleaned text token-for-
    // token, so span extents, the keep-first convention, and the
    // reassembly all face SQL.
    "dedup_exactsubstr_cut" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val spans = graft.dedup.ExactSubstr.maximalSharedSpans(docs,
        "doc_id", "text", spanTokens = 5)
      graft.dedup.ExactSubstr.cutSpans(docs, "doc_id", "text", spans)
        .orderBy("doc_id")
    }),

    // Incremental batch-vs-snapshot dedup: the snapshot is the documents
    // table; the batch re-submits every doc with 1/3 of the texts
    // unchanged (true dups) and 2/3 edited (new). Bloom misses are
    // accepted map-side; only Bloom hits reach the md5 confirmation
    // join, and the Bloom filter never decides membership — so the
    // result is exact text-equality semantics, which is what the oracle
    // states directly with NOT EXISTS.
    "dedup_incremental" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val batch = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        when(pmod(col("doc_id"), lit(3L)) === 0, col("text"))
          .otherwise(concat(col("text"), lit(" [v2]"))).as("text"))
      val bf = Incremental.buildBloom(docs, "text", expectedItems = 100000L)
      val idx = Incremental.snapshotIndex(docs, "text")
      Incremental.checkBatch(batch, idx, bf, "doc_id", "text")
        .select("doc_id", "is_new")
        .orderBy("doc_id")
    }),

    // Repeated-paragraph removal: each doc becomes a 4-paragraph page —
    // two template paragraphs stamped across many docs (df 500 and ~100)
    // and two substring-derived ones (df ~1) — and the operator must strip
    // exactly the high-df paragraphs while preserving order.
    "dedup_paragraphs" -> ((s, dir) => {
      val page = concat(
        lit("subscribe to our newsletter today\n"),
        substring(col("text"), 1, 30), lit("\n"),
        when(pmod(col("doc_id"), lit(5L)) === 0,
          lit("share this article on social media"))
          .otherwise(lit("opinions are the author's own")),
        lit("\n"),
        substring(col("text"), 31, 50))
      val pages = table(s, dir, "documents")
        .select(col("doc_id"), page.as("text"))
      graft.dedup.ParagraphDedup.removeRepeated(
          pages, "doc_id", "text", maxDocFreq = 2L)
        .withColumnRenamed("text", "clean_text")
        .orderBy("doc_id")
    }),

    // Spelling canonicalization — fuzzy variants → components → the
    // cluster's most frequent form: every corpus token mapped to its
    // dominant spelling (ties lexicographically last). Oracle:
    // brute-force levenshtein edges + recursive components + the same
    // argmax.
    "dedup_spell_canon" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(explode(graft.text.CorpusStats.tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 3)
      graft.dedup.FuzzyDedup.canonicalizeSpellings(toks, "w", maxEdit = 1)
        .orderBy("word")
    }),

    // Fuzzy (edit-distance) matching via symmetric deletes: the
    // deletion-variant equi-join is a COMPLETE candidate generator for
    // levenshtein <= d, verified per candidate — so the oracle is the
    // brute-force pair scan the operator exists to avoid.
    "dedup_fuzzy_words" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(explode(graft.text.CorpusStats.tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 3)
      graft.dedup.FuzzyDedup.pairsWithinEdit(toks, "w", maxEdit = 2)
        .orderBy("a", "b")
    }))

  def oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
         FROM documents GROUP BY text ORDER BY keep_id""",
    "dedup_minhash_lsh" ->
      s"""WITH $ShingleCte
         SELECT a AS id_a, b AS id_b, ROUND(jaccard, 6) AS jaccard
         FROM jac WHERE jaccard >= 0.8 ORDER BY id_a, id_b""",
    // identical contract to the ad-hoc pass — same brute-force oracle
    "dedup_minhash_at_rest" ->
      s"""WITH $ShingleCte
         SELECT a AS id_a, b AS id_b, ROUND(jaccard, 6) AS jaccard
         FROM jac WHERE jaccard >= 0.8 ORDER BY id_a, id_b""",
    // brute batch×corpus jaccard over the same shingles; jac holds
    // unordered pairs a<b, so both orientations contribute
    "dedup_minhash_batch_check" ->
      s"""WITH $ShingleCte
         SELECT a + 1000000 AS batch_id, b AS id,
           ROUND(jaccard, 6) AS jaccard
         FROM jac WHERE a % 3 = 0 AND b % 3 <> 0 AND jaccard >= 0.8
         UNION ALL
         SELECT b + 1000000 AS batch_id, a AS id,
           ROUND(jaccard, 6) AS jaccard
         FROM jac WHERE b % 3 = 0 AND a % 3 <> 0 AND jaccard >= 0.8
         ORDER BY batch_id, id""",
    "dedup_ngram_jaccard" ->
      s"""WITH $ShingleCte
         SELECT a AS id_a, b AS id_b, ROUND(jaccard, 6) AS jaccard
         FROM jac WHERE jaccard >= 0.5 ORDER BY id_a, id_b""",
    "dedup_prefix_jaccard" ->
      s"""WITH $ShingleCte
         SELECT a AS id_a, b AS id_b, ROUND(jaccard, 6) AS jaccard
         FROM jac WHERE jaccard >= 0.4 ORDER BY id_a, id_b""",
    // Survivors = every doc except non-canonical members of a duplicate
    // component. The recursive CTE floods labels along the symmetric edge
    // list; MIN over everything that reaches a node is its component's
    // canonical (minimum) id — the same fixed point the iterative
    // min-label propagation converges to.
    "dedup_resolve" ->
      s"""WITH RECURSIVE $ShingleCte,
         edges AS (SELECT a, b FROM jac WHERE jaccard >= 0.8),
         sym AS (SELECT a AS src, b AS dst FROM edges
                 UNION SELECT b AS src, a AS dst FROM edges),
         reach(node, lbl) AS (
           SELECT src, src FROM sym
           UNION
           SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node),
         canon AS (SELECT node, MIN(lbl) AS canonical FROM reach GROUP BY node),
         dropped AS (SELECT node FROM canon WHERE node <> canonical)
         SELECT d.doc_id, d.n_chars
         FROM documents d LEFT JOIN dropped ON dropped.node = d.doc_id
         WHERE dropped.node IS NULL
         ORDER BY d.doc_id""",
    "dedup_resolve_best" ->
      s"""WITH RECURSIVE $ShingleCte,
         edges AS (SELECT a, b FROM jac WHERE jaccard >= 0.8),
         sym AS (SELECT a AS src, b AS dst FROM edges
                 UNION SELECT b AS src, a AS dst FROM edges),
         reach(node, lbl) AS (
           SELECT src, src FROM sym
           UNION
           SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node),
         canon AS (SELECT node, MIN(lbl) AS canonical FROM reach GROUP BY node),
         mem AS (SELECT d.doc_id, COALESCE(c.canonical, d.doc_id) AS cluster,
                   d.n_chars
                 FROM documents d LEFT JOIN canon c ON c.node = d.doc_id),
         best AS (SELECT cluster, doc_id AS keep_id FROM (
                    SELECT cluster, doc_id,
                      ROW_NUMBER() OVER (PARTITION BY cluster
                        ORDER BY n_chars DESC, doc_id) AS rn
                    FROM mem)
                  WHERE rn = 1)
         SELECT m.doc_id, m.cluster, b.keep_id,
           m.doc_id = b.keep_id AS kept
         FROM mem m JOIN best b USING (cluster)
         ORDER BY m.doc_id""",

    // Mirrors graft.dedup.SimHash exactly: FNV-1a 64 per whitespace token
    // (wrapping multiply emulated through HUGEINT mod 2^64; xor operates
    // on the signed bit pattern), ±1 votes per bit, fingerprint bit set
    // iff votes > 0 — then all-pairs XOR popcount ≤ 3. Spark's split('')
    // of an empty string yields [""], DuckDB's string_split_regex does
    // too, and fnv("") = the offset basis, handled by the length guard.
    "dedup_simhash" ->
      """WITH
         toks AS (SELECT doc_id, UNNEST(string_split_regex(TRIM(text), '\s+')) AS tok FROM documents),
         th AS (SELECT doc_id, CASE WHEN length(tok)=0 THEN CAST(-3750763034362895579 AS BIGINT) ELSE
           list_reduce(
             list_prepend(CAST(-3750763034362895579 AS BIGINT),
                          list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
             (h, c) -> CAST(CASE WHEN ((CASE WHEN xor(h, c) < 0 THEN CAST(xor(h, c) AS HUGEINT) + 18446744073709551616 ELSE CAST(xor(h, c) AS HUGEINT) END) * 1099511628211) % 18446744073709551616
                                 >= 9223372036854775808
                            THEN ((CASE WHEN xor(h, c) < 0 THEN CAST(xor(h, c) AS HUGEINT) + 18446744073709551616 ELSE CAST(xor(h, c) AS HUGEINT) END) * 1099511628211) % 18446744073709551616 - 18446744073709551616
                            ELSE ((CASE WHEN xor(h, c) < 0 THEN CAST(xor(h, c) AS HUGEINT) + 18446744073709551616 ELSE CAST(xor(h, c) AS HUGEINT) END) * 1099511628211) % 18446744073709551616 END AS BIGINT))
           END AS h FROM toks),
         uh AS (SELECT doc_id, CASE WHEN h < 0 THEN CAST(h AS HUGEINT) + 18446744073709551616 ELSE CAST(h AS HUGEINT) END AS u FROM th),
         votes AS (SELECT doc_id, b, SUM(CASE WHEN (u // (1::HUGEINT << b)) % 2 = 1 THEN 1 ELSE -1 END) AS v
                   FROM uh CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 63)) AS b) bits
                   GROUP BY doc_id, b),
         fp AS (SELECT doc_id,
                  CAST(CASE WHEN s >= 9223372036854775808 THEN s - 18446744073709551616 ELSE s END AS BIGINT) AS fp
                FROM (SELECT doc_id, SUM(CASE WHEN v > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS s
                      FROM votes GROUP BY doc_id)),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                          bit_count(xor(a.fp, b.fp)) AS hamming
                   FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
         FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b""",
    "dedup_containment" ->
      s"""WITH $ShingleCte,
         cont AS (SELECT a, b, CAST(i AS DOUBLE) / LEAST(na.n, nb.n) AS c
                  FROM inter JOIN n na ON na.doc_id = a JOIN n nb ON nb.doc_id = b)
         SELECT a AS id_a, b AS id_b, ROUND(c, 6) AS containment
         FROM cont WHERE c >= 0.8 ORDER BY id_a, id_b""",
    "dedup_leakage_split" ->
      s"""WITH RECURSIVE $ShingleCte,
         edges AS (SELECT a, b FROM jac WHERE jaccard >= 0.8),
         sym AS (SELECT a AS src, b AS dst FROM edges
                 UNION SELECT b AS src, a AS dst FROM edges),
         reach(node, lbl) AS (
           SELECT src, src FROM sym
           UNION
           SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node),
         canon AS (SELECT node, MIN(lbl) AS canonical FROM reach GROUP BY node)
         SELECT d.doc_id,
           COALESCE(canon.canonical, d.doc_id) AS canonical_id,
           CASE WHEN CAST('0x' || substr(md5(CAST(COALESCE(canon.canonical, d.doc_id) AS VARCHAR)), 1, 15) AS BIGINT) % 1000 < 800
                THEN 'train' ELSE 'test' END AS split
         FROM documents d LEFT JOIN canon ON canon.node = d.doc_id
         ORDER BY d.doc_id""",
    "dedup_substring_spans" ->
      """WITH toks AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS a FROM documents),
         idx AS (SELECT doc_id, a, UNNEST(GENERATE_SERIES(1, LEN(a)-4)) AS i
                 FROM toks WHERE LEN(a) >= 5),
         sh AS (SELECT DISTINCT doc_id, ARRAY_TO_STRING(a[i:i+4], ' ') AS g FROM idx),
         inter AS (SELECT s1.doc_id AS id_a, s2.doc_id AS id_b, COUNT(*) AS n_shared
                   FROM sh s1 JOIN sh s2 ON s1.g = s2.g AND s1.doc_id < s2.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b, n_shared FROM inter
         WHERE n_shared >= 3 ORDER BY id_a, id_b""",
    // seeds (positional 5-token windows) → df cap → cross-doc position
    // pairs → per-(pair, diagonal) gaps-and-islands → maximal spans
    "dedup_exactsubstr_spans" ->
      """WITH toks AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS a
                       FROM documents),
         idx AS (SELECT doc_id, a, UNNEST(GENERATE_SERIES(1, LEN(a)-4)) AS i
                 FROM toks WHERE LEN(a) >= 5),
         w AS (SELECT doc_id, i, ARRAY_TO_STRING(a[i:i+4], ' ') AS g FROM idx),
         df AS (SELECT g, COUNT(*) AS c FROM w GROUP BY 1),
         wk AS (SELECT w.doc_id, w.i, w.g FROM w JOIN df USING (g)
                WHERE df.c BETWEEN 2 AND 10000),
         p AS (SELECT w1.doc_id AS id_a, w2.doc_id AS id_b, w1.i AS ia, w2.i AS ib
               FROM wk w1 JOIN wk w2 ON w1.g = w2.g AND w1.doc_id < w2.doc_id),
         isl AS (SELECT id_a, id_b, ia, ib, ia - ib AS d,
                   ia - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, ia - ib
                                           ORDER BY ia) AS k
                 FROM p)
         SELECT id_a, id_b, CAST(MIN(ia) AS INT) AS a_start,
                CAST(MIN(ib) AS INT) AS b_start,
                CAST(COUNT(*) + 4 AS INT) AS span_tokens
         FROM isl GROUP BY id_a, id_b, d, k
         ORDER BY id_a, id_b, a_start, b_start""",
    // spans replayed (same CTEs), then every covered token of the
    // later doc dropped and the survivors re-joined in order
    "dedup_exactsubstr_cut" ->
      """WITH toks AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS a
                       FROM documents),
         idx AS (SELECT doc_id, a, UNNEST(GENERATE_SERIES(1, LEN(a)-4)) AS i
                 FROM toks WHERE LEN(a) >= 5),
         w AS (SELECT doc_id, i, ARRAY_TO_STRING(a[i:i+4], ' ') AS g FROM idx),
         df AS (SELECT g, COUNT(*) AS c FROM w GROUP BY 1),
         wk AS (SELECT w.doc_id, w.i, w.g FROM w JOIN df USING (g)
                WHERE df.c BETWEEN 2 AND 10000),
         p AS (SELECT w1.doc_id AS id_a, w2.doc_id AS id_b, w1.i AS ia, w2.i AS ib
               FROM wk w1 JOIN wk w2 ON w1.g = w2.g AND w1.doc_id < w2.doc_id),
         isl AS (SELECT id_a, id_b, ia, ib, ia - ib AS d,
                   ia - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, ia - ib
                                           ORDER BY ia) AS k
                 FROM p),
         spans AS (SELECT id_b, CAST(MIN(ib) AS INT) AS b_start,
                     CAST(COUNT(*) + 4 AS INT) AS span_tokens
                   FROM isl GROUP BY id_a, id_b, d, k),
         pos AS (SELECT doc_id, a, UNNEST(GENERATE_SERIES(1, LEN(a))) AS i
                 FROM toks),
         kept AS (SELECT pos.doc_id, pos.i, pos.a[pos.i] AS t FROM pos
                  WHERE LEN(pos.a[pos.i]) > 0
                    AND NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.id_b = pos.doc_id AND pos.i >= s.b_start
                      AND pos.i < s.b_start + s.span_tokens)),
         agg AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
                   ARRAY_TO_STRING(LIST(t ORDER BY i), ' ') AS text_clean
                 FROM kept GROUP BY 1)
         SELECT d.doc_id, COALESCE(agg.n_kept, 0) AS n_kept,
                COALESCE(agg.text_clean, '') AS text_clean
         FROM documents d LEFT JOIN agg USING (doc_id)
         ORDER BY d.doc_id""",
    "dedup_incremental" ->
      """WITH batch AS (
           SELECT doc_id + 1000000 AS doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN text
                       ELSE text || ' [v2]' END AS text
           FROM documents)
         SELECT b.doc_id,
                NOT EXISTS (SELECT 1 FROM documents d WHERE d.text = b.text) AS is_new
         FROM batch b ORDER BY doc_id""",
    // Paragraph document frequency computed directly over the paragraph
    // text (the Spark side groups by xxhash64 of the text — agreement
    // also certifies the hash-keyed frequency table is collision-clean).
    "dedup_paragraphs" ->
      """WITH page AS (
           SELECT doc_id,
                  'subscribe to our newsletter today' || chr(10) ||
                  SUBSTRING(text, 1, 30) || chr(10) ||
                  CASE WHEN doc_id % 5 = 0 THEN 'share this article on social media'
                       ELSE 'opinions are the author''s own' END || chr(10) ||
                  SUBSTRING(text, 31, 50) AS t
           FROM documents),
         paras AS (
           SELECT doc_id,
                  UNNEST(STRING_SPLIT(t, chr(10))) AS para,
                  UNNEST(GENERATE_SERIES(1, LEN(STRING_SPLIT(t, chr(10))))) AS pos
           FROM page),
         ne AS (SELECT * FROM paras WHERE LENGTH(TRIM(para)) > 0),
         freq AS (SELECT para, COUNT(DISTINCT doc_id) AS pdf FROM ne GROUP BY para)
         SELECT ne.doc_id,
                COALESCE(STRING_AGG(CASE WHEN f.pdf <= 2 THEN ne.para END,
                                    chr(10) ORDER BY ne.pos), '') AS clean_text,
                CAST(SUM(CASE WHEN f.pdf > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
         FROM ne JOIN freq f USING (para)
         GROUP BY ne.doc_id ORDER BY ne.doc_id""",
    // brute-force pair scan — the symmetric-delete routing must be
    // invisible in the result
    "dedup_spell_canon" ->
      """WITH RECURSIVE occ AS (
           SELECT UNNEST(LIST_FILTER(
             STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\s+'),
             t -> LENGTH(t) >= 3)) AS w
           FROM documents),
         wc AS (SELECT w, COUNT(*) AS cnt FROM occ GROUP BY w),
         edges AS (SELECT a.w AS a, b.w AS b
                   FROM wc a JOIN wc b ON a.w < b.w
                   WHERE levenshtein(a.w, b.w) <= 1),
         sym AS (SELECT a AS src, b AS dst FROM edges
                 UNION SELECT b AS src, a AS dst FROM edges),
         reach(node, lbl) AS (
           SELECT src, src FROM sym
           UNION
           SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node),
         canon AS (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node),
         mem AS (SELECT wc.w, wc.cnt, COALESCE(c.cluster, wc.w) AS cluster
                 FROM wc LEFT JOIN canon c ON c.node = wc.w),
         best AS (SELECT cluster, w AS canonical FROM (
                    SELECT cluster, w,
                      ROW_NUMBER() OVER (PARTITION BY cluster
                        ORDER BY cnt DESC, w DESC) AS rn
                    FROM mem)
                  WHERE rn = 1)
         SELECT m.w AS word, b.canonical, m.cnt
         FROM mem m JOIN best b USING (cluster)
         ORDER BY word""",
    "dedup_fuzzy_words" ->
      """WITH toks AS (
           SELECT DISTINCT UNNEST(LIST_FILTER(
             STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\s+'),
             t -> LENGTH(t) >= 3)) AS w
           FROM documents)
         SELECT a.w AS a, b.w AS b,
                CAST(levenshtein(a.w, b.w) AS INT) AS dist
         FROM toks a JOIN toks b ON a.w < b.w
         WHERE levenshtein(a.w, b.w) <= 2
         ORDER BY a, b""")
}
