package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints the formatted physical plan of the given
  * SparkEntry queries (all of them by default). Used to audit that filters
  * reach the parquet scan (PushedFilters), projections prune (ReadSchema),
  * dimension joins broadcast, and expressions stay in whole-stage codegen.
  *
  * Usage: graft.Explain [queryName ...]
  */
object Explain {

  /** Shuffle exchanges in the executed plan (descends into AQE roots) —
    * the number the plan-hygiene audits and bench guards assert on.
    */
  def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def walk(p: SparkPlan): Int = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case o => o.children
      }
      (p match { case _: ShuffleExchangeExec => 1; case _ => 0 }) + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"===== $q")
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
