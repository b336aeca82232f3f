package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise vocabulary overlap between corpus slices — the curation
  * matrix behind "are these two sources the same crawl in different
  * clothes / does the new source add any vocabulary": exact Jaccard
  * and containment between every pair of groups' distinct token sets,
  * in one pass over an inverted (token → groups) layout. Complements
  * [[graft.operators.KmvSketch]]'s `t_kmv_overlap` (the sketched
  * estimate at unbounded group counts) with the exact small-k form,
  * and [[graft.text.Dsir]] (distributional similarity) with plain
  * set overlap.
  *
  * Execution: distinct (group, token) presence pairs; per-group vocab
  * sizes; then a token-keyed self-join restricted to `g_a < g_b`
  * feeding one (pair → intersection) count. The join fan-out is
  * C(k_t, 2) per token, k_t = groups containing the token — bounded
  * by `maxGroups²` per token, which is why the operator aborts
  * EAGERLY (one cheap count over the already-materialized presence
  * set, BEFORE the quadratic join or any broadcast executes) when the
  * observed group count exceeds `maxGroups` (a thousands-of-sources
  * matrix wants the KMV path, not an exact quadratic; the
  * FrequentPairs cap posture). The guard makes the call NON-lazy:
  * invoking it runs Spark jobs (checkpoint + count) even if the
  * returned frame is never acted on — cache the result, not the
  * call (the [[graft.operators.InfoTheory.miTable]] posture). Jaccard and containment are single
  * IEEE divisions over exact BIGINTs — bit-replayable, no rounding.
  *
  * 100 TB shape: the corpus reduces to its (group, token) presence
  * set map-side + one distinct shuffle (vocab-bounded, not
  * corpus-bounded); everything after runs on vocabulary-sized frames.
  * Output: C(groups, 2) rows — driver-safe by construction.
  */
object SourceOverlap {

  /** Exact overlap matrix rows `(g_a, g_b, inter, n_a, n_b, jaccard,
    * containment)` for every group pair sharing at least one token
    * (disjoint vocabularies yield no row — absence IS the signal).
    * `containment` is inter / min(n_a, n_b), the "is the smaller one
    * a subset" direction Jaccard dilutes.
    */
  def vocabOverlap(docs: DataFrame, groupCol: String, textCol: String,
                   maxGroups: Int = 256): DataFrame = {
    require(maxGroups >= 2, s"maxGroups too small: $maxGroups")
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val pres = docs
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), explode(toks).as("tok"))
      .distinct()
      .localCheckpoint() // feeds sizes + both join sides (Triangles lesson)
    // EAGER cap check — pres is already materialized (the checkpoint
    // above), so the count is a cheap local aggregation, and it fires
    // BEFORE the quadratic self-join or any broadcast executes. The
    // previous in-plan guard was post-hoc: woven into the join output,
    // it evaluated only after the expensive work — and never at all
    // when no two groups shared a token (empty join, nothing emitted).
    val k = pres.select("g").distinct().count()
    if (k > maxGroups) throw new IllegalArgumentException(
      s"SourceOverlap: $k groups exceed maxGroups=$maxGroups — use the" +
        " KMV overlap sketch for wide matrices")
    val sizes = pres.groupBy("g").agg(count(lit(1)).as("n"))
    val inter = pres.as("x")
      .join(pres.as("y"),
        col("x.tok") === col("y.tok") && col("x.g") < col("y.g"))
      .groupBy(col("x.g").as("g_a"), col("y.g").as("g_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("g").as("g_a"), col("n").as("n_a")), Seq("g_a"))
      .join(sizes.select(col("g").as("g_b"), col("n").as("n_b")), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("inter"), col("n_a"), col("n_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
          .as("jaccard"),
        (col("inter").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("containment"))
  }

  /** DuckDB replay of [[vocabOverlap]] over the `documents` table
    * grouped by `groupCol`: same tokenization, same exact counts,
    * same single-division trees.
    */
  def oracleSql(groupCol: String): String =
    s"""WITH pres AS (
         SELECT DISTINCT $groupCol AS g, tok FROM (
           SELECT $groupCol,
             UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'),
                                t -> LENGTH(t) > 0)) AS tok
           FROM documents WHERE $groupCol IS NOT NULL)),
       sizes AS (SELECT g, COUNT(*) AS n FROM pres GROUP BY g),
       inter AS (
         SELECT x.g AS g_a, y.g AS g_b, COUNT(*) AS inter
         FROM pres x JOIN pres y ON y.tok = x.tok AND x.g < y.g
         GROUP BY x.g, y.g)
       SELECT g_a, g_b, CAST(inter AS BIGINT) AS inter,
         CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
         CAST(inter AS DOUBLE) /
           CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard,
         CAST(inter AS DOUBLE) /
           CAST(LEAST(sa.n, sb.n) AS DOUBLE) AS containment
       FROM inter
       JOIN sizes sa ON sa.g = inter.g_a
       JOIN sizes sb ON sb.g = inter.g_b"""
}
