package graft.core

import org.apache.spark.sql.DataFrame

/** Per-iteration lineage truncation policy for the engine's iterative
  * operators (PageRank, k-core, BFS, connected components): every
  * round's state must be CUT from its lineage or the plan replays all
  * prior iterations per action and overflows the planner at depth ~20.
  *
  * Two cuts, one trade-off:
  *  - `localCheckpoint` (the default): state blocks live on executor
  *    local storage — no distributed-FS round-trip, the right call on
  *    local mode and for short loops. But the blocks DIE WITH THEIR
  *    EXECUTOR: on a real cluster, one lost node makes every
  *    downstream action fail unrecoverably (the lineage was
  *    truncated, so Spark cannot recompute), restarting a multi-hour
  *    100-TB components run from zero.
  *  - reliable `checkpoint(dir)`: state is written to `dir` (HDFS /
  *    object store), surviving any executor loss — the production
  *    posture for long iterative jobs, at the cost of one
  *    write+read of the (node-sized, never edge-sized) state per
  *    round.
  *
  * Both cuts are eager and produce bit-identical results (asserted in
  * GraphSpec — the cut changes WHERE blocks live, never their
  * content); operators expose the choice as an optional
  * `checkpointDir` and default to local.
  *
  * Housekeeping: reliable-mode files accumulate one state snapshot per
  * iteration under `dir` and Spark does not remove them at job end
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` is off by
  * default, and enabling it ties cleanup to GC timing) — give each run
  * its own subdirectory and delete it after the results are persisted,
  * exactly like any scratch dir.
  */
final class Durable(checkpointDir: Option[String]) {
  private var dirSet = false

  /** Eagerly materialize `df` and truncate its lineage per the policy. */
  def cut(df: DataFrame): DataFrame = checkpointDir match {
    case None => df.localCheckpoint(true)
    case Some(dir) =>
      if (!dirSet) {
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        dirSet = true
      }
      df.checkpoint(true)
  }
}
