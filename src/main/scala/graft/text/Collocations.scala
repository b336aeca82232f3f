package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PMI collocation mining — which ADJACENT word pairs stick together
  * beyond chance (Church & Hanks 1990). Complements
  * [[graft.operators.FrequentPairs]] (unordered co-occurrence within
  * a document — "basket" association) with the order-sensitive bigram
  * signal a tokenizer/vocab pipeline actually consumes: multi-word
  * expressions worth single vocabulary slots, boilerplate phrases
  * worth filtering.
  *
  * Score: the PMI RATIO `(n_ab · N) / (n_a · n_b)` — the probability
  * lift of the bigram over independence. PMI itself is the log of
  * this ratio; the log is monotone, so ranking/thresholds on the
  * ratio are ranking/thresholds on PMI, and omitting it keeps every
  * emitted float a SINGLE IEEE tree over exact BIGINTs (counts cast
  * to double, three multiplies, one divide), which both engines
  * evaluate bit-identically — no transcendental, no rounding row.
  * A `minCount` floor culls the rare-pair PMI pathology (hapax pairs
  * score arbitrarily high).
  *
  * Execution: bigram pairs are built MAP-SIDE with one zip_with over
  * the token array (the [[NgramLm]] posture — no self-join, no
  * shuffle to form pairs, whole-stage codegen throughout), then ONE
  * count aggregation over (a, b); unigram counts ride the same pass
  * shape; totals enter via a broadcast 1-row cross join. 100 TB
  * shape: two corpus-linear aggregations whose outputs are
  * vocabulary-bounded, a broadcastable unigram join, output bounded
  * by the observed-bigram vocabulary after the `minCount` cut.
  */
object Collocations {

  /** Adjacent lowercased-whitespace-token pairs of `text` as
    * `(a, b)` structs — `zip_with(toks.init, toks.tail)`, evaluated
    * once per row (no per-element re-split).
    */
  def adjacentPairs(text: Column): Column = {
    val toks = filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)
    val heads = slice(toks, lit(1), greatest(size(toks) - 1, lit(0)))
    val tails = slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
    zip_with(heads, tails, (a, b) => struct(a.as("a"), b.as("b")))
  }

  /** Collocation table over `docs(textCol)`: one row per adjacent
    * bigram with `pair_cnt ≥ minCount` —
    * `(a, b, pair_cnt, cnt_a, cnt_b, n_tokens, pmi_ratio)`, all
    * counts exact BIGINTs, `pmi_ratio` the pinned single-tree lift.
    */
  def pmiTable(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"),
      t => length(t) > 0)
    // unigram counts + the corpus token total from ONE exploded pass
    val uni = docs.select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds total + two joins; vocab-bounded
    val total = broadcast(uni.agg(sum(col("cnt")).as("n_tokens")))
    val pairCnt = docs.select(explode(adjacentPairs(col(textCol))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minCount)
    pairCnt
      .join(uni.select(col("tok").as("a"), col("cnt").as("cnt_a")), Seq("a"))
      .join(uni.select(col("tok").as("b"), col("cnt").as("cnt_b")), Seq("b"))
      .crossJoin(total)
      .select(col("a"), col("b"), col("pair_cnt"), col("cnt_a"),
        col("cnt_b"), col("n_tokens"),
        (col("pair_cnt").cast("double") * col("n_tokens").cast("double") /
          (col("cnt_a").cast("double") * col("cnt_b").cast("double")))
          .as("pmi_ratio"))
  }

  /** DuckDB replay of [[pmiTable]] over the `documents` table: same
    * tokenization, same exact counts, same single-tree ratio.
    */
  def oracleSql(minCount: Long): String =
    s"""WITH toks AS (
         SELECT doc_id,
           LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'),
                       t -> LENGTH(t) > 0) AS ts
         FROM documents),
       uni AS (
         SELECT tok, COUNT(*) AS cnt
         FROM (SELECT UNNEST(ts) AS tok FROM toks) GROUP BY tok),
       total AS (SELECT SUM(cnt) AS n_tokens FROM uni),
       pairs AS (
         SELECT UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LENGTH(ts), 1)),
                  i -> STRUCT_PACK(a := ts[i], b := ts[i + 1]))) AS p
         FROM toks),
       pc AS (
         SELECT p.a AS a, p.b AS b, COUNT(*) AS pair_cnt FROM pairs
         GROUP BY p.a, p.b
         HAVING COUNT(*) >= $minCount)
       SELECT pc.a, pc.b, CAST(pair_cnt AS BIGINT) AS pair_cnt,
         CAST(ua.cnt AS BIGINT) AS cnt_a, CAST(ub.cnt AS BIGINT) AS cnt_b,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(pair_cnt AS DOUBLE) * CAST(n_tokens AS DOUBLE) /
           (CAST(ua.cnt AS DOUBLE) * CAST(ub.cnt AS DOUBLE)) AS pmi_ratio
       FROM pc
       JOIN uni ua ON ua.tok = pc.a
       JOIN uni ub ON ub.tok = pc.b
       CROSS JOIN total"""
}
