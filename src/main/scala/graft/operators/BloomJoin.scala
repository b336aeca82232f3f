package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction — the runtime-filter lever for
  * fact ⨝ selective-dim at 100 TB.
  *
  * A shuffled equi-join moves EVERY fact row to its key's reducer before
  * the probe decides whether a dim row exists; when the dim side is
  * selective (a filtered dimension, an allowlist, yesterday's changed
  * keys), almost all of that shuffle is wasted. The reduction builds a
  * Bloom filter over the dim side's join keys in one pass over the
  * SMALL side (`spark.util.sketch`, the same sketch Spark's own
  * `spark.sql.optimizer.runtimeFilter` injects when statistics allow),
  * broadcasts it (~9.6 bits/key at 1% fpp — 1 GiB covers ~900 M keys),
  * and drops non-matching fact rows MAP-SIDE before the exchange: the
  * shuffle then carries `|matches| + fpp·|fact|` rows instead of
  * `|fact|`.
  *
  * Correctness is unconditional: a Bloom filter has no false negatives,
  * so no matching row is ever dropped, and false positives are removed
  * by the real join that follows — the filter routes rows, the join
  * decides (the same routes-never-decides contract as
  * [[graft.dedup.Incremental]]). The gate oracle is therefore the PLAIN
  * join: the reduction must be invisible in the result.
  *
  * The probe is the codegen'd broadcast-variable expression
  * ([[graft.functions.expressions.BloomExpressions.mightContainLong]]),
  * not a plan-literal `might_contain` — a corpus-scale filter embedded
  * in the logical plan would bloat every plan copy and task binary.
  */
object BloomJoin {

  /** Inner equi-join of `fact` and `dim` on the shared `keys`, with the
    * fact side Bloom-pruned map-side first. `expectedItems` sizes the
    * filter to the dim side's (approximate) key count; overshooting
    * degrades fpp gracefully, never correctness.
    */
  def reduceJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 expectedItems: Long, fpp: Double = 0.01): DataFrame =
    prune(fact, dim, keys, expectedItems, fpp).join(dim, keys)

  /** Just the map-side pruning half: `fact` rows whose key MIGHT appear
    * in `dim` (superset of the true matches). Composes with any join
    * type or downstream operator.
    *
    * Broadcast lifetime: the filter lives until the SparkContext dies —
    * at the documented ~1 GiB-per-filter scale, repeated prune calls in
    * a long-lived session accumulate broadcast blocks on the driver and
    * every executor. Use [[pruned]] when the caller can bound the
    * pruned frame's lifetime and release the filter after the
    * downstream action.
    */
  def prune(fact: DataFrame, dim: DataFrame, keys: Seq[String],
            expectedItems: Long, fpp: Double = 0.01): DataFrame =
    pruned(fact, dim, keys, expectedItems, fpp).df

  /** The pruned frame PLUS a release handle for the broadcast filter.
    * Call `release()` after the last action on `df` (or any plan built
    * from it): the filter's blocks are then dropped from the driver and
    * executors instead of living until the SparkContext stops. Actions
    * run after `release()` fail — the broadcast is gone, not lazily
    * rebuilt.
    */
  final case class Pruned(df: DataFrame,
                          filter: org.apache.spark.broadcast.Broadcast[
                            org.apache.spark.util.sketch.BloomFilter]) {
    def release(): Unit = filter.destroy()
  }

  def pruned(fact: DataFrame, dim: DataFrame, keys: Seq[String],
             expectedItems: Long, fpp: Double = 0.01): Pruned = {
    require(keys.nonEmpty, "at least one join key")
    val keyHash = xxhash64(keys.map(col): _*)
    val bf = dim.select(keyHash.as("__h")).stat
      .bloomFilter("__h", expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    Pruned(fact.filter(
      graft.functions.expressions.BloomExpressions.mightContainLong(bc, keyHash)),
      bc)
  }
}
