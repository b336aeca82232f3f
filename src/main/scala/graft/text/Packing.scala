package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing by concatenation: documents are laid out
  * end-to-end in a deterministic per-shard order and chunked at
  * `budget`-token boundaries (the standard pretraining sample-packing
  * regime — concat, then split every `budget` tokens; a document whose
  * span crosses a boundary contributes to consecutive packs).
  *
  * Scale shape: packing is per `shard` partition — a single global order
  * would serialize one sort at corpus scale, while per-shard packing (one
  * shard ≈ one training-data file) is exactly one window shuffle keyed by
  * shard, horizontally scalable and deterministic. The window sum is the
  * only pass; token counting is a codegen'd column expression.
  */
object Packing {

  /** Token layout per document: `offset` (tokens before it in its shard),
    * `pack_first`/`pack_last` (chunk ids of its first/last token).
    * Zero-token documents occupy no span: pack_last = pack_first.
    */
  def packOffsets(docs: DataFrame, idCol: String, textCol: String,
                  budget: Int, shard: Column): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), shard.as("shard"),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_first", floor(col("offset") / budget))
      .withColumn("pack_last",
        floor((col("offset") + greatest(col("n_tokens") - 1, lit(0))) / budget))
  }
}
