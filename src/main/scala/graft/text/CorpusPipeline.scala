package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** End-to-end training-corpus curation — the composition the individual
  * operators exist for, in the canonical order the large corpus
  * pipelines run it (C4/Gopher/Llama-style):
  *
  *   1. quality gate (cheap, map-side — run FIRST so every later stage
  *      sees fewer rows);
  *   2. near-duplicate removal (MinHash-LSH pairs → connected
  *      components → keep each cluster's canonical doc);
  *   3. benchmark decontamination (drop docs sharing any word n-gram
  *      with the eval set — eval grams broadcast);
  *   4. sequence packing (per-shard concat-and-chunk token layout for
  *      the trainer).
  *
  * Stage order is a scale decision, not taste: the map-side quality
  * gate shrinks the corpus before the only heavyweight stage (dedup's
  * banded shuffle), and decontamination after dedup probes ~fewer docs
  * against the broadcast gram set. Every stage is one of this engine's
  * oracle-checked operators, so the composition itself is also
  * oracle-checkable end-to-end (query `corpus_e2e`).
  */
object CorpusPipeline {

  /** Curate `corpus` against `evalSet` and lay out the survivors for
    * training. Returns the packing frame (`doc_id, shard, n_tokens,
    * offset, pack_first, pack_last`) of the curated corpus.
    */
  def curate(corpus: DataFrame, evalSet: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             minTokens: Int = 20, dedupThreshold: Double = 0.8,
             decontaminateNgram: Int = 5, packBudget: Int = 2048,
             packShards: Int = 4): DataFrame = {
    // 1. map-side quality gate
    val quality = corpus.filter(
      TextFunctions.tokenCount(col(textCol)) >= minTokens)
    // 2. near-dup removal (LSH pairs → CC → survivors). The survivor set
    // feeds THREE downstream branches (gram overlap, the anti join, and
    // packing); without a cut each branch would replay the whole
    // LSH+components subtree — localCheckpoint materializes it once, the
    // in-memory stand-in for the at-rest stage write a production run
    // does between stages (Pm25Pipeline's shape).
    val deduped = Dedup.deduplicate(quality, idCol, textCol,
        threshold = dedupThreshold)
      .select(col(idCol), col(textCol))
      .localCheckpoint()
    // 3. benchmark decontamination
    val overlap = Decontaminate.ngramOverlap(deduped, evalSet,
      n = decontaminateNgram, textCol = textCol, idCol = idCol)
    val clean = deduped.join(
      overlap.filter(col("contaminated")).select(idCol),
      Seq(idCol), "left_anti")
    // 4. training layout
    Packing.packOffsets(clean, idCol, textCol, budget = packBudget,
      shard = pmod(col(idCol), lit(packShards.toLong)))
  }
}
