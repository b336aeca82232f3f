package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized into [[graft.queries.QueryPack]]s, one per area of
  * SURVEY.md §2's operator inventory; each query has a DuckDB oracle unless
  * its semantics are not portably SQL-expressible (those get rows-only
  * checks and ScalaTest goldens instead).
  */
object SparkEntry {
  private val packs: Seq[QueryPack] = Seq(
    RelationalPack, WindowPack, FunctionsPack, JoinPack,
    DedupPack, TextPack, SimilarityPack, MultimodalPack, KernelPack,
    SourcePack, GraphPack)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_wide_combine")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. A duplicate
    * name across packs would silently overwrite in toMap and shrink the
    * gate — fail loudly instead.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.defs)
    val dups = all.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names across packs: ${dups.mkString(", ")}")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
