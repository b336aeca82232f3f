package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** First-fit-decreasing (FFD) sequence packing — assign documents to
  * fixed-capacity bins so training sequences waste minimal padding.
  *
  * [[Packing.packOffsets]] is the concat-and-chunk shape (documents
  * split across sequence boundaries); when documents must stay WHOLE
  * (instruction tuning, contrastive pairs), packing becomes bin
  * packing, and greedy FFD is the standard ≤(11/9)·OPT+1 heuristic.
  * FFD is inherently sequential, so the corpus is hash-sharded first
  * (one shuffle on `pmod(avalancheKey(id), numShards)`) and each shard
  * packs independently — shard-local FFD state is (bins × loads),
  * bounded by the shard's document count, and numShards sets the
  * parallelism exactly like every other sharded operator here.
  *
  * Deterministic end to end (avalanche shard, (length DESC, id) visit
  * order, integer loads), so the gate oracle replays the whole greedy
  * step-for-step in a recursive CTE — the k6 fold-assignment move.
  * Oversize documents (length > capacity) get a bin of their own.
  */
object BinPacking {

  /** Assignment table: (id, length, shard, bin) — `bin` is the
    * 0-based FFD bin index within the shard.
    */
  def packBinsFFD(df: DataFrame, idCol: String, lenCol: String,
                  capacity: Long, numShards: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive (got $capacity)")
    require(numShards > 0, s"numShards must be positive (got $numShards)")
    val spark = df.sparkSession
    import spark.implicits._
    val sharded = df.select(
        col(idCol).cast("long").as("id"),
        col(lenCol).cast("long").as("len"),
        pmod(graft.operators.Sampling.avalancheKey(col(idCol)),
          lit(numShards.toLong)).cast("int").as("shard"))
      .as[(Long, Long, Int)]
    sharded.groupByKey(_._3)
      .flatMapGroups { (shard: Int, rows: Iterator[(Long, Long, Int)]) =>
        // FFD: longest first (id tie-break), first bin that fits
        val docs = rows.toArray.sortBy(r => (-r._2, r._1))
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        docs.iterator.map { case (id, len, _) =>
          var b = 0
          while (b < loads.length && loads(b) + len > capacity) b += 1
          if (b == loads.length) loads += len else loads(b) += len
          (id, len, shard, b)
        }
      }
      .toDF("id", "len", "shard", "bin")
      .withColumnsRenamed(Map("id" -> idCol, "len" -> lenCol))
  }

  /** Per-shard packing report: bins used vs the naive one-doc-per-bin
    * and the fill ratio — the padding-waste numbers a data build logs.
    */
  def packingReport(assignment: DataFrame, lenCol: String,
                    capacity: Long): DataFrame =
    assignment.groupBy("shard")
      .agg(countDistinct("bin").as("n_bins"),
        count(lit(1)).as("n_docs"),
        sum(col(lenCol)).as("total_len"))
      .withColumn("fill_ratio",
        col("total_len").cast("double") /
          (col("n_bins") * lit(capacity)).cast("double"))
}
