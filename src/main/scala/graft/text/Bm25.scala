package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword relevance scoring over a document corpus — the standard
  * retrieval ranking function (Robertson & Zaragoza 2009), used in
  * training-data pipelines for query-match curation (rank a corpus
  * against a topic's terms, keep the best) and as the lexical arm of
  * hybrid lexical+embedding retrieval next to [[graft.similarity.Ann]].
  *
  * Lucene-style IDF: `ln(1 + (N - df + 0.5) / (df + 0.5))`, always
  * positive. Term frequency saturation `k1`, length normalization `b`.
  *
  * 100 TB shape: doc length is a map-side expression (no tokenize
  * shuffle); only rows matching a query term are exploded, so the one
  * real shuffle — tf = groupBy(doc, term) — carries the matching subset,
  * not the corpus. Per-term document frequencies come from a window over
  * the hits-sized tf (re-shuffling tf, never re-scanning the corpus) and
  * the two corpus scalars (N, avgdl) are a one-row broadcast cross join.
  * Nothing is all-pairs and no global sort is taken; chain
  * [[graft.operators.Sampling.topKPerGroup]] or a TakeOrdered limit for
  * the final cut.
  *
  * Floating-point determinism (oracle parity): the per-(doc,term)
  * contribution is aggregated with at most one value per SUM cell, and
  * the per-doc total adds the per-term cells in the fixed `queryTerms`
  * order — no partition-order-dependent double addition anywhere.
  */
object Bm25 {

  /** Tokens of `text`: whitespace-split, lowercased, trimmed. */
  private def toks(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Score every document that matches at least one of `queryTerms`.
    * Output: (idCol, bm25 rounded to 6dp, n_matched distinct terms).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            queryTerms: Seq[String], k1: Double = 1.2,
            b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    require(queryTerms.distinct == queryTerms, "queryTerms must be distinct")

    // doc length in tokens — map-side, feeds both avgdl and the
    // per-doc normalizer
    val withDl = docs.select(col(idCol), col(textCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("dl"))

    // corpus scalars: one row, broadcast cross join keeps the plan
    // distributed (no driver collect)
    val stats = withDl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    // explode only matching tokens: the shuffle carries hits, not corpus
    val hits = withDl
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), col("dl"),
        explode(toks(col(textCol))).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
    val tf = hits.groupBy(col(idCol), col("tok"), col("dl"))
      .agg(count(lit(1)).as("tf"))

    // per-term document frequency as a window over tf — a separate
    // groupBy would re-run the whole scan→explode lineage (Catalyst
    // does not reuse uncached subplans), costing the corpus a second
    // explode pass; the window re-shuffles only the hits-sized tf
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("tok"))))

    val joined = withDf.crossJoin(broadcast(stats))
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val denom = col("tf") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    val contrib = joined.withColumn("c", (idf * (col("tf") * lit(k1 + 1.0))) / denom)

    // one SUM cell per (doc, term), then fixed-order addition of the
    // cells — bit-reproducible regardless of partitioning
    val cells = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("tok") === t, col("c"))).as(s"c_$i")
    }
    val perDoc = contrib.groupBy(col(idCol))
      .agg(cells.head, cells.tail :+ count(lit(1)).as("n_matched_l"): _*)
    val total = queryTerms.indices
      .map(i => coalesce(col(s"c_$i"), lit(0.0)))
      .reduce(_ + _)
    perDoc.select(col(idCol), round(total, 6).as("bm25"),
      col("n_matched_l").cast("int").as("n_matched"))
  }

  /** DuckDB SQL replaying [[score]] over table `documents` with the same
    * operation order (for oracle construction in query packs).
    */
  def oracleSql(queryTerms: Seq[String], k1: Double = 1.2,
                b: Double = 0.75): String = {
    val inList = queryTerms.map(t => s"'$t'").mkString(", ")
    val cellsSql = queryTerms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN tok = '$t' THEN c END) AS c_$i"
    }.mkString(",\n             ")
    val totalSql = queryTerms.indices.map(i => s"COALESCE(c_$i, 0.0)")
      .mkString(" + ")
    s"""WITH dl AS (
          SELECT doc_id, text,
            CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                 ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS dl
          FROM documents),
        stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
        hits AS (
          SELECT doc_id, dl,
            UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS tok
          FROM dl WHERE LENGTH(TRIM(text)) > 0),
        tf AS (
          SELECT doc_id, tok, dl, COUNT(*) AS tf FROM hits
          WHERE tok IN ($inList) GROUP BY doc_id, tok, dl),
        dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        contrib AS (
          -- every constant is CAST to DOUBLE: DuckDB otherwise parses
          -- bare numeric literals as DECIMAL and decimal arithmetic
          -- rounds differently from the engine's IEEE doubles
          SELECT tf.doc_id, tf.tok,
            (LN(CAST(1.0 AS DOUBLE) +
                (CAST(stats.n_docs - dft.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                / (CAST(dft.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
             * (tf.tf * CAST(${k1 + 1.0} AS DOUBLE))) /
            (tf.tf + CAST($k1 AS DOUBLE) *
              (CAST(${1.0 - b} AS DOUBLE) +
               CAST($b AS DOUBLE) * tf.dl / stats.avgdl)) AS c
          FROM tf JOIN dft USING (tok) CROSS JOIN stats),
        cells AS (
          SELECT doc_id,
             $cellsSql,
             COUNT(*) AS n_matched_l
          FROM contrib GROUP BY doc_id)
        SELECT doc_id, ROUND($totalSql, 6) AS bm25,
          CAST(n_matched_l AS INTEGER) AS n_matched
        FROM cells ORDER BY doc_id"""
  }
}
