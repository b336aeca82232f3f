package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016; the GPT-2
  * merge-rank encoder), trained the way production tokenizer pipelines
  * train at corpus scale: the CORPUS pass is one distributed word-count
  * (linear shuffle, map-side partial aggregation), and the iterative
  * merge loop runs driver-side over that (small, bounded) word-frequency
  * table — never over the corpus. A 100 TB corpus has a few million
  * distinct words; re-scanning it once per merge would be 30k corpus
  * passes, while the word table fits in driver memory by construction
  * (`maxVocabWords` keeps the tail bounded; dropped singleton words
  * shift pair counts negligibly and deterministically).
  *
  * Encoding is map-side: the learned merge ranks broadcast once per
  * executor and each word resolves independently (lowest-rank adjacent
  * pair merges first, exactly the GPT-2 `bpe` loop). A deliberate UDF —
  * the per-word loop has no built-in equivalent, and the broadcast keeps
  * the plan size independent of vocabulary size.
  *
  * Determinism: merge selection breaks frequency ties on the
  * lexicographically smallest pair, so the merge list — and therefore
  * every encoding — is reproducible across runs and cluster layouts.
  */
object Bpe {

  type Merge = (String, String)

  /** Base tokens of a word: one per Unicode code point — NOT per UTF-16
    * code unit, which would split non-BMP characters (emoji, rare CJK)
    * into invalid lone surrogates when subword tokens are emitted
    * individually.
    */
  private def charToks(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Train `numMerges` merges over a word-frequency table (driver-side).
    * Ties break to the lexicographically smallest pair.
    */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    // each distinct word as its char-token sequence + multiplicity
    var words: Vector[(Vector[String], Long)] = wordCounts
      .map { case (w, c) => (charToks(w), c) }.toVector
    val merges = Vector.newBuilder[Merge]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = collection.mutable.Map.empty[Merge, Long]
      words.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (toks, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i < toks.length - 1 && toks(i) == best._1 && toks(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += toks(i); i += 1 }
          }
          (out.result(), c)
        }
        m += 1
      }
    }
    merges.result()
  }

  /** One distributed corpus pass → word-frequency table, capped to the
    * `maxVocabWords` most frequent words (deterministic count-desc,
    * word-asc cut via TakeOrdered — no global sort), then driver-side
    * [[train]].
    */
  def trainFromCorpus(docs: DataFrame, textCol: String, numMerges: Int,
                      maxVocabWords: Int = 1 << 20): Seq[Merge] = {
    val counts = CorpusStats.vocabTopK(docs, textCol, maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(counts, numMerges)
  }

  /** GPT-2 encode loop: repeatedly merge the lowest-rank adjacent pair. */
  def encodeWord(word: String, ranks: Map[Merge, Int]): Vector[String] = {
    var toks = charToks(word)
    var continue = toks.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) continue = false
      else {
        val joined = toks(bestAt) + toks(bestAt + 1)
        val merged = Vector.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && j == bestAt) { merged += joined; j += 2 }
          else { merged += toks(j); j += 1 }
        }
        toks = merged.result()
        // the same pair may occur later in the word at the same rank
        continue = toks.length > 1
      }
    }
    toks
  }

  /** Subword tokens of `text` (lower-cased whitespace words, each BPE-
    * encoded) as an array column. Merge ranks ship as one broadcast.
    */
  def tokens(text: Column, merges: Seq[Merge]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    val enc = udf { (t: String) =>
      if (t == null) Array.empty[String]
      else t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, bc.value))
    }
    enc(text)
  }
}
