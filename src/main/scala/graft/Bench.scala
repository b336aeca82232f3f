package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the reference-scale pipeline stages first
  * (headline), then every SparkEntry query, under a HARD wall-clock
  * budget, and emits results INCREMENTALLY — one short JSON line per
  * completed stage/query sample plus a continuously-rewritten
  * full-precision file — so a driver timeout (or any crash) leaves a
  * parseable partial artifact instead of nothing.
  *
  * Round-10 post-mortem (the reason for this shape): the sweep outgrew
  * the driver's kill threshold, and because the old main printed its
  * single JSON line only after ALL stages finished, `BENCH_r10.json`
  * recorded `rc:124 / parsed:null` — zero official numbers for a round
  * whose code was fine. The driver captures only the LAST ~2000 chars
  * of output and parses the last JSON line it finds, so the emission
  * contract is: (a) every completed measurement prints immediately as
  * its own compact line; (b) the full-precision map is rewritten to
  * SPARK_GRAFT_BENCH_OUT after every emission; (c) the final compact
  * totals line prints LAST so a clean run parses exactly as before.
  *
  * Budget: SPARK_GRAFT_BENCH_BUDGET_SEC (default 1350 — sized under the
  * driver's observed kill threshold: round 9 survived ~1463 s, round 10
  * died above it) is measured from JVM start and includes setup. Work is
  * ordered headline-first (pipeline stages, then micro queries sorted by
  * name), and repeats inside the pipeline sweep are interleaved, so when
  * the budget expires everything important already has at least one
  * sample; whatever never started is listed under "skipped".
  *
  * Repeat count: best (minimum) of SPARK_GRAFT_BENCH_N (default 3) per
  * query — single-shot timings on a shared sandbox mis-measured the
  * engine by >10× in round 1; co-tenant contention is strictly additive
  * noise, so min-of-n is the best estimator of the engine's own cost
  * (the `timeit` convention).
  *
  * A query that throws is a FAILURE, never a timing: round 4 published
  * 16 time-to-AnalysisException values as runtimes. Failed queries land
  * under "failed"; a pipeline-level hard error lands under "error" in
  * the final lines but never suppresses the numbers already measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1350").toDouble
    val deadline = t0 + (budgetSec * 1e9).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def elapsedSec: Double = (System.nanoTime() - t0) / 1e9
    // Locale.ROOT: the f-interpolator honours the default locale, and a
    // comma decimal separator would corrupt the JSON lines
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    var hardError: Option[String] = None

    // companion metrics (shuffle counts, executor-cpu seconds, setup
    // accounting) ride along in "queries" but are not wall-time — keep
    // them out of the total (same exclusion set as round 9 so totals
    // stay comparable round-over-round; bench_* keys are new meta)
    def totalSecs: Double = results.toSeq
      .filterNot(r => r._1.endsWith("_shuffle_exchanges") ||
        r._1.endsWith("_cpu_sec") || r._1.startsWith("bench_"))
      .map(_._2).sum
    def strArr(xs: Seq[String]): String =
      xs.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    def fullJson(fmt: Double => String): String = {
      val qs = results.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val err = hardError.map(e =>
        ",\"error\":\"" + e.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(300) +
          "\"").getOrElse("")
      s"""{"metric":"total","value":${fmt(totalSecs)},"unit":"sec",""" +
        s""""queries":$qs,"failed":${strArr(failed.toSeq)},""" +
        s""""skipped":${strArr(skipped.toSeq)},"budget_sec":${fmt(budgetSec)}$err,"sf":"$sfDir"}"""
    }
    // full-precision copy on disk, rewritten after EVERY emission —
    // immune to stdout mangling and to a mid-run kill
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      sys.props("java.io.tmpdir") + "/graft_bench_full.json")
    def writeFull(): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (fullJson(_.toString) + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
      }
    def emit(name: String, v: Double): Unit = {
      results(name) = v
      println(s"""{"metric":"stage","stage":"$name","value":${f3(v)},"unit":"sec","done":${results.size},"elapsed":${f3(elapsedSec)}}""")
      System.out.flush()
      writeFull()
    }

    // warm-up: touch the session, codegen, and the parquet footers
    graft.core.Tables.table(spark, sfDir, "lineitem").count()

    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt

    // ---- headline first: reference-scale pipeline stages (33k grid ×
    // month, BASELINE.md's actual workload) — skippable via
    // SPARK_GRAFT_SKIP_PIPELINE=1
    if (!sys.env.contains("SPARK_GRAFT_SKIP_PIPELINE")) {
      try {
        val tmp = graft.bench.PipelineBench.scratchRoot()
        try {
          // pipeline repeats beyond the first yield at 70% of the
          // budget so the micro-query sweep always gets a share — on a
          // contended box every stage runs uniformly slow, and round
          // 11's first sweep spent the whole budget on pipeline repeats
          val (stageMap, stageSkipped) = graft.bench.PipelineBench.runBest(
            spark, tmp, n, deadline, (nm, v, _) => emit(nm, v),
            laterRepsDeadlineNanos = t0 + (budgetSec * 0.7 * 1e9).toLong)
          stageMap.foreach { case (k, v) => emit(k, v) }
          skipped ++= stageSkipped
        } finally org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(tmp))
      } catch { case e: Throwable =>
        // fail SOFT: keep every number already emitted, record the error
        // in the artifact, and continue to the micro queries
        hardError = Some(s"pipeline: ${e.getMessage}")
        System.err.println(s"[bench] pipeline bench failed: ${e.getMessage}")
        writeFull()
      }
    }

    // ---- micro queries (sorted by name), budget-checked per query —
    // SPARK_GRAFT_SKIP_QUERIES=1 runs only the pipeline stages
    val queryDefs =
      if (sys.env.contains("SPARK_GRAFT_SKIP_QUERIES")) Seq.empty
      else SparkEntry.queries.toSeq.sortBy(_._1)
    queryDefs.foreach { case (name, fn) =>
      if (System.nanoTime() >= deadline) skipped += name
      else {
        val times = (1 to n).flatMap { i =>
          // always finish at least one repeat once a query starts, so a
          // budget edge never publishes a query as silently absent
          if (i > 1 && System.nanoTime() >= deadline) None
          else {
            val s0 = System.nanoTime()
            try { fn(spark, sfDir).count(); Some((System.nanoTime() - s0) / 1e9) }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              None
            }
          }
        }
        if (times.isEmpty) { failed += name; writeFull() }
        else emit(name, times.min)
      }
    }

    // ---- final lines: the big full-precision-ish map, then the compact
    // totals line LAST (the driver parses the last JSON line in its
    // 2000-char tail; round 4 proved the big line alone gets clipped)
    writeFull()
    println(fullJson(f3))
    val err = hardError.map(e =>
      ",\"error\":\"" + e.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120) +
        "\"").getOrElse("")
    println(s"""{"metric":"total","value":${f3(totalSecs)},"unit":"sec","nqueries":${results.size},"nfailed":${failed.size},"nskipped":${skipped.size},"budget_sec":${f3(budgetSec)},"elapsed":${f3(elapsedSec)}$err,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
