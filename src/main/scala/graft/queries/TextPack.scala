package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables.table
import graft.text.TextFunctions
import graft.functions.expressions.TextExpressions

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language ID, document fingerprinting.
  */
object TextPack extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_token_stats" -> ((s, dir) => {
      val t = col("text")
      table(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(t).as("n_tokens"),
          size(TextFunctions.bpeishTokens(t)).as("n_bpeish"),
          TextFunctions.charCount(t).as("n_chars_seen"),
          round(TextFunctions.meanWordLen(t), 6).as("mean_word_len"),
          round(TextFunctions.punctRatio(t), 6).as("punct_ratio"))
        .orderBy("doc_id")
    }),

    "t_quality_score" -> ((s, dir) => {
      val t = col("text")
      table(s, dir, "documents")
        .select(col("doc_id"),
          round(TextFunctions.stopwordRatio(t), 6).as("stopword_ratio"),
          round(TextFunctions.qualityScore(t), 6).as("quality"))
        .orderBy("doc_id")
    }),

    "t_langid" -> ((s, dir) => {
      val t = col("text")
      val hitCols = TextFunctions.LangMarkers.map { case (lang, ms) =>
        TextFunctions.langHits(t, ms).as(s"hits_$lang")
      }
      table(s, dir, "documents")
        .select((col("doc_id") +: hitCols :+
          TextFunctions.langId(t).as("lang_pred")): _*)
        .orderBy("doc_id")
    }),

    // Winnowing fingerprint (native Catalyst expression) — JVM-hash
    // specific, so rows-only here; golden-tested in TextSpec.
    "t_fingerprint" -> ((s, dir) => {
      val fp = TextExpressions.winnow_fingerprint(col("text"))
      table(s, dir, "documents")
        .select(col("doc_id"), size(fp).as("fp_size"),
          element_at(fp, 1).as("fp_first"))
        .orderBy("doc_id")
    }))

  private val QualityCte =
    """base AS (
      |  SELECT doc_id, text,
      |    STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks,
      |    STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\s+') AS ltoks,
      |    CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
      |         ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END AS n_tokens
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, text, toks, n_tokens,
      |    LEN(LIST_FILTER(ltoks, x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be'))) AS n_stop,
      |    LENGTH(REGEXP_REPLACE(text, '[^[:punct:]]', '', 'g')) AS n_punct,
      |    LENGTH(text) AS n_chars
      |  FROM base)
      |""".stripMargin

  def oracles: Map[String, String] = Map(
    "t_token_stats" ->
      """SELECT doc_id,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END AS n_tokens,
         LEN(REGEXP_EXTRACT_ALL(text, ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS n_bpeish,
         LENGTH(text) AS n_chars_seen,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0.0
              ELSE ROUND(CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT_REGEX(TRIM(text), '\s+'), x -> LENGTH(x))) AS DOUBLE)
                   / LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')), 6) END AS mean_word_len,
         CASE WHEN LENGTH(text) = 0 THEN 0.0
              ELSE ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
                   / LENGTH(text), 6) END AS punct_ratio
         FROM documents ORDER BY doc_id""",
    "t_quality_score" ->
      s"""WITH $QualityCte
         SELECT doc_id,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           ROUND((LEAST(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
                + LEAST(CAST(n_stop AS DOUBLE) / n_tokens * 5.0, 1.0)
                + GREATEST(0.0, 1.0 - CAST(n_punct AS DOUBLE) / n_chars * 5.0)) / 3.0, 6) AS quality
         FROM scored ORDER BY doc_id""",
    "t_langid" ->
      """WITH h AS (
           SELECT doc_id,
             STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\s+') AS lt
           FROM documents),
         hits AS (
           SELECT doc_id,
             LEN(LIST_FILTER(lt, x -> x IN ('the','and','of','to','is'))) AS hits_en,
             LEN(LIST_FILTER(lt, x -> x IN ('el','la','de','que','y'))) AS hits_es,
             LEN(LIST_FILTER(lt, x -> x IN ('le','la','de','et','les'))) AS hits_fr,
             LEN(LIST_FILTER(lt, x -> x IN ('der','die','und','das','ist'))) AS hits_de,
             LEN(LIST_FILTER(lt, x -> x IN ('的','是','了','在','我'))) AS hits_zh
           FROM h)
         SELECT doc_id, hits_en, hits_es, hits_fr, hits_de, hits_zh,
           CASE
             WHEN hits_en = GREATEST(hits_en, hits_es, hits_fr, hits_de, hits_zh)
                  AND GREATEST(hits_en, hits_es, hits_fr, hits_de, hits_zh) > 0 THEN 'en'
             WHEN hits_es = GREATEST(hits_en, hits_es, hits_fr, hits_de, hits_zh)
                  AND GREATEST(hits_en, hits_es, hits_fr, hits_de, hits_zh) > 0 THEN 'es'
             WHEN hits_fr = GREATEST(hits_en, hits_es, hits_fr, hits_de, hits_zh)
                  AND GREATEST(hits_en, hits_es, hits_fr, hits_de, hits_zh) > 0 THEN 'fr'
             WHEN hits_de = GREATEST(hits_en, hits_es, hits_fr, hits_de, hits_zh)
                  AND GREATEST(hits_en, hits_es, hits_fr, hits_de, hits_zh) > 0 THEN 'de'
             WHEN hits_zh = GREATEST(hits_en, hits_es, hits_fr, hits_de, hits_zh)
                  AND GREATEST(hits_en, hits_es, hits_fr, hits_de, hits_zh) > 0 THEN 'zh'
             ELSE 'en' END AS lang_pred
         FROM hits ORDER BY doc_id""")
}
