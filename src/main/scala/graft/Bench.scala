package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given scale factor
  * and prints one JSON line. A warm-up action first (so no query absorbs
  * session/codegen startup), then queries in sorted-name order.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: touch the session, codegen, and the parquet footers
    graft.core.Tables.table(spark, sfDir, "lineitem").count()

    // best (minimum) of n per query — single-shot timings on a shared
    // sandbox mis-measured the engine by >10× in round 1, and even the
    // round-2 median caught two contended runs out of three. Co-tenant
    // contention is strictly additive noise, so min-of-n is the best
    // estimator of the engine's own cost (the `timeit` convention).
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    // A query that throws is a FAILURE, never a timing: round 4 published
    // 16 time-to-AnalysisException values as runtimes, poisoning the
    // round-over-round comparison. Failed queries are dropped from the
    // timings map and listed under "failed" in the JSON instead.
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // SPARK_GRAFT_SKIP_QUERIES=1 runs only the pipeline stages — the
    // converse of SPARK_GRAFT_SKIP_PIPELINE, for iterating on the
    // reference-scale numbers without paying the ~5 min micro sweep
    val queryDefs =
      if (sys.env.contains("SPARK_GRAFT_SKIP_QUERIES")) Seq.empty
      else SparkEntry.queries.toSeq.sortBy(_._1)
    val queryResults = queryDefs.flatMap { case (name, fn) =>
      val times = (1 to n).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      if (times.isEmpty) { failed += name; None }
      else Some(name -> times.min)
    }
    // reference-scale pipeline stages (33k grid × month, BASELINE.md's
    // actual workload), min of n runs with one-time setup, on tmpfs
    // scratch when available (see PipelineBench scaladoc) — skippable
    // via SPARK_GRAFT_SKIP_PIPELINE=1
    val pipelineResults =
      if (sys.env.contains("SPARK_GRAFT_SKIP_PIPELINE")) Seq.empty
      else try {
        val tmp = graft.bench.PipelineBench.scratchRoot()
        try graft.bench.PipelineBench.runBest(spark, tmp, n).toSeq.sortBy(_._1)
        finally org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(tmp))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] pipeline bench failed: ${e.getMessage}")
        Seq.empty
      }
    val results = queryResults ++ pipelineResults
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // companion metrics (shuffle counts, executor-cpu seconds) ride along
    // in "queries" but are not wall-time — keep them out of the total
    def totalSecs: Double = results
      .filterNot(r => r._1.endsWith("_shuffle_exchanges") ||
        r._1.endsWith("_cpu_sec")).map(_._2).sum
    def jsonLine(fmt: Double => String): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(totalSecs)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    }
    // The PRINTED line is capped-precision: round 3's full-precision line
    // (~90 queries × 17-digit doubles) overflowed the driver's log-tail
    // capture and the totals failed to parse. 3 decimals halves the line
    // while keeping ms resolution; the full-precision copy goes to a file
    // (SPARK_GRAFT_BENCH_OUT, else the tmpdir fallback below), immune to
    // any stdout mangling by a wrapping build tool.
    val full = jsonLine(_.toString)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      sys.props("java.io.tmpdir") + "/graft_bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // Locale.ROOT: the f-interpolator honours the default locale, and a
    // comma decimal separator would corrupt the JSON line
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(jsonLine(f3))
    // Second, SHORT totals-only line: round 4's log-tail capture clipped
    // the FRONT of the big line and lost the leading "metric" field, so
    // the totals failed to machine-parse. A trailing compact line always
    // survives a tail.
    println(s"""{"metric":"total","value":${f3(totalSecs)},"unit":"sec","nqueries":${results.size},"nfailed":${failed.size},"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
