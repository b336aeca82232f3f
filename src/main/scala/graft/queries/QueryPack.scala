package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A coherent group of SparkEntry queries plus their DuckDB oracle SQL.
  *
  * Conventions for oracle hash-parity (driver sorts columns by name, then
  * hashes values — see the builder contract):
  *   - every computed column is aliased identically in Spark and SQL;
  *   - SUMs of doubles go through DECIMAL(18,2) so arithmetic is exact and
  *     order-independent on both engines;
  *   - AVG/STDDEV/quantiles are rounded (4 decimals) — their error is
  *     O(sum_err / n), far below the rounding quantum;
  *   - timestamps are reduced to DATE or formatted strings (the testdata
  *     events.ts is nanosecond-precision, which Spark truncates to micros);
  *   - results carry an explicit ORDER BY on both sides for determinism.
  */
trait QueryPack {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  /** DuckDB SQL per query key; keys absent here get a rows-only check. */
  def oracles: Map[String, String]

  /** Per-invocation home for an at-rest gate corpus: a UNIQUE table
    * name (concurrent evaluations of the same gate never race on a
    * shared catalog entry) and a UNIQUE temp directory reclaimed at
    * JVM exit (the written parquet must outlive this call — the
    * returned gate frame reads it lazily — so a finally-delete is
    * wrong, but repeated runs must not leak corpora on disk either).
    * One shared janitor hook tracks every gate dir: a repeat-N sweep
    * allocates N dirs but exactly one hook thread.
    */
  protected def gateCorpus(gate: String): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$gate-gate")
    QueryPack.GateJanitor.track(dir.toFile)
    val tbl =
      s"${gate}_corpus_gate_${QueryPack.gateSeq.incrementAndGet()}"
    (tbl, dir.resolve("corpus").toString)
  }
}

object QueryPack {
  private val gateSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private object GateJanitor {
    private val dirs =
      new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach { d =>
        org.apache.commons.io.FileUtils.deleteQuietly(d)
        ()
      }
    }))
    def track(f: java.io.File): Unit = { dirs.add(f); () }
  }
}
