package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.features.FeatureGenerator
import graft.operators.{Scaffold, WideCombiner}
import graft.spatial.{DailySpatialInterpolator, TiledInterpolator}

/** Reference-scale pipeline benchmarks — the workload BASELINE.md actually
  * measures: a 33,074-cell grid × calendar month (~1M rows) combined from
  * N datasets, spatially imputed, and feature-generated. Data is
  * synthesized distributed (spark.range), deterministic, and sized to the
  * production month so the numbers compare directly against the
  * reference's envelope (combine: minutes on 8 cores; feature-gen: ≤3 h
  * for ~80 months on 8 vCPU).
  */
object PipelineBench {
  val NGrids = 33074
  val Days = 31

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Wall seconds AND aggregated executor-CPU seconds for a block. The
    * CPU figure comes from stage task metrics via a listener: a
    * co-tenant-contended run burns the same cpu-seconds, just spread
    * over more wall-clock, so the metric is noise-free in the way the
    * shuffle counts are — exactly what the single-shot soak stages need
    * after round 5's phantom 2× "regressions" (contention hitting the
    * only stages without min-of-n statistics).
    */
  private def timeWithCpu(spark: SparkSession)(f: => Unit): (Double, Double) = {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      // the listener bus is async — poll until the counter stabilizes
      var prev = -1L
      var tries = 0
      while (cpuNs.get() != prev && tries < 20) {
        prev = cpuNs.get(); Thread.sleep(100); tries += 1
      }
      (wall, cpuNs.get() / 1e9)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** One synthetic monthly dataset: full scaffold, deterministic values,
    * ~2% nulls. `cols` value columns.
    */
  def monthlyDataset(spark: SparkSession, name: String, cols: Int): DataFrame = {
    val base = spark.range(NGrids.toLong * Days).select(
      (col("id") % NGrids).as("grid_id"),
      date_format(date_add(lit("2023-01-01").cast("date"),
        floor(col("id") / NGrids).cast("int")), "yyyy-MM-dd").as("date"),
      col("id"))
    (0 until cols).foldLeft(base) { (d, i) =>
      d.withColumn(s"${name}_v$i",
        when(pmod(col("id") * 31 + i * 17, lit(53)) === 0, lit(null))
          .otherwise(sin(col("id") * 0.001 + i) * 50 + 100))
    }.drop("id")
  }

  def staticDataset(spark: SparkSession, name: String): DataFrame =
    spark.range(NGrids).select(col("id").as("grid_id"),
      (col("id") % 1000).cast("double").as(s"${name}_v"))

  /** Grid with planar coords (182×182 layout like the production grid). */
  def gridFrame(spark: SparkSession): DataFrame =
    spark.range(NGrids).select(col("id").as("grid_id"),
      ((col("id") % 182) * 10000).cast("double").as("original_x"),
      (floor(col("id") / 182) * 10000).cast("double").as("original_y"))

  /** Benchmark scratch root: tmpfs when available. The stages measure
    * scan + shuffle + compute of THIS engine; on a shared sandbox, /tmp
    * sits on a disk co-tenants also hammer, and round 1/2 recorded
    * pipeline numbers 10–60× above what the identical code path measures
    * standalone on the same machine. RAM-backed scratch removes the
    * co-tenant I/O term while keeping the real parquet encode/decode work
    * (the reference envelope is minutes; these stages are seconds — the
    * comparison is not disk-bound either way).
    */
  def scratchRoot(): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(base, "graft-pbench").toString
  }

  /** Pre-materialized stage inputs (setup, untimed): the production
    * combine reads stage outputs at rest, and fusing the synthesis into
    * the join would hide the scan+shuffle being measured. Built ONCE and
    * reused across repeats — the inputs are deterministic, and keeping
    * setup out of the repeat loop shrinks the window in which co-tenant
    * load can pollute the timed sections.
    */
  final case class Staged(plain: Seq[(String, DataFrame)],
                          bucketed: Seq[(String, String)])

  def prepare(spark: SparkSession, outRoot: String): Staged = {
    // s01 inputs: 12 monthly datasets (1–3 cols) + 2 static
    val monthly = (0 until 12).map(i =>
      s"ds$i" -> monthlyDataset(spark, s"ds$i", 1 + i % 3))
    val static = Seq("elev" -> staticDataset(spark, "elev"),
      "grid" -> staticDataset(spark, "gridmeta"))
    val plain = (monthly ++ static).map { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outRoot/stage/$name")
      name -> spark.read.parquet(s"$outRoot/stage/$name")
    }
    // bucketed stage outputs (the cluster-scale path) — in production
    // these replace the plain stage writes 1:1, so they are setup too
    val bucketed = (monthly ++ static).map { case (name, df) =>
      val tbl = s"bench_bkt_$name"
      graft.operators.BucketedStages.writeBucketed(df, tbl,
        s"$outRoot/bkt/$name")
      name -> tbl
    }
    Staged(plain, bucketed)
  }

  def cleanup(spark: SparkSession, staged: Staged): Unit =
    staged.bucketed.foreach { case (_, tbl) =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }

  /** Run the reference-scale stages `n` times and report the per-stage
    * MINIMUM. Contention noise on a shared sandbox is strictly additive
    * (round 1: the same combine stage measured 361 s under the driver vs
    * 5.7 s standalone on the same machine), so the fastest observed run
    * is the best estimator of the engine's cost — the same reasoning as
    * Python `timeit`'s documented min-of-repeats convention. Setup is
    * built once; only the timed stages repeat.
    */
  def runBest(spark: SparkSession, outRoot: String, n: Int): Map[String, Double] = {
    val staged = prepare(spark, outRoot)
    val best = try {
      val runs = (0 until math.max(1, n)).map(_ => run(spark, outRoot, staged))
      val names = runs.head.keys
      names.map(k => k -> runs.map(_(k)).min).toMap
    } finally cleanup(spark, staged)
    best ++ diskBackedCombine(spark, n) ++ yearSoak(spark, outRoot) ++
      denseImpute(spark)
  }

  /** The dense-grid K1 scenario: 300k points/day (9× the production
    * grid), 2 days. Untiled, each day is ONE Delaunay task — 30 of 32
    * local cores idle while two straggler triangulations run; tiled
    * (8×4 tiles, 6-spacing halo) the same work is 64 bounded tasks. The
    * pair quantifies the straggler-elimination headroom the tiled path
    * buys before 100-TB grid densities need it (a single 1M-point
    * triangulation already measures 6 minutes — the per-day key simply
    * stops scaling there, which is the point).
    */
  def denseImpute(spark: SparkSession): Map[String, Double] = {
    val nPts = 300000L
    val days = 2
    val side = math.ceil(math.sqrt(nPts.toDouble)).toLong // 1000
    val df = spark.range(nPts * days).select(
      date_format(date_add(lit("2023-07-01").cast("date"),
        (col("id") / nPts).cast("int")), "yyyy-MM-dd").as("date"),
      (pmod(col("id"), lit(nPts)) % side * 10.0 +
        pmod(col("id") * 2654435761L, lit(1000L)) * 0.003).as("x"),
      (floor(pmod(col("id"), lit(nPts)) / side) * 10.0 +
        pmod(col("id") * 48611L, lit(1000L)) * 0.003).as("y"),
      when(pmod(col("id") * 31L, lit(10L)) === 0, lit(null))
        .otherwise(sin(col("id") * 1e-3) * 50 + 100).as("v"))
      .localCheckpoint() // materialize once; time kernels, not the generator
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    out += "k1_dense_300k_untiled" -> time {
      DailySpatialInterpolator
        .interpolate(df, "date", "x", "y", Seq("v")).count()
    }
    out += "k1_dense_300k_tiled" -> time {
      TiledInterpolator.interpolate(df, "date", "x", "y", Seq("v"),
        gx = 8, gy = 4, halo = 60.0).count()
    }
    out.toMap
  }

  /** One combine recorded on REAL disk next to the tmpfs numbers, so the
    * parquet-I/O term stays visible in every round's report (tmpfs
    * isolates engine cost from co-tenant disk contention — see
    * [[scratchRoot]] — but the disk figure is the honest deployment
    * number). Inputs and outputs both live on the disk root.
    */
  private def diskBackedCombine(spark: SparkSession, n: Int): Map[String, Double] = {
    val diskRoot = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir")), "graft-pbench-disk").toString
    try {
      val monthly = (0 until 12).map(i =>
        s"ds$i" -> monthlyDataset(spark, s"ds$i", 1 + i % 3))
      val static = Seq("elev" -> staticDataset(spark, "elev"),
        "grid" -> staticDataset(spark, "gridmeta"))
      val plain = (monthly ++ static).map { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$diskRoot/stage/$name")
        name -> spark.read.parquet(s"$diskRoot/stage/$name")
      }
      val t = (0 until math.max(1, math.min(n, 2))).map { _ =>
        time {
          WideCombiner.combine(plain)
            .write.mode("overwrite").parquet(s"$diskRoot/combined")
        }
      }.min
      Map("pm25_combine_month_1M_disk" -> t)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(diskRoot))
  }

  /** Year-scale soak: s02 feature generation over a full production
    * year (365 days + the 31-day warm-up tail the reference reads for
    * cross-year rolling windows; ~13.1 M rows) with a plan guard that the
    * whole run still shuffles ONCE on grid_id, and a quarter of daily
    * spatial imputations (92 days × 33k points). These are the stages
    * whose cost must scale linearly with months for the 80-month
    * production backfill to stay inside BASELINE.md's envelope.
    *
    * Contention protocol (round-5 lesson: the only two single-shot
    * stages both "regressed" 2.2× while their unchanged kernels got
    * faster in the min-of-n stages): min-of-2 wall time, PLUS a
    * noise-free `_cpu_sec` companion (aggregated executor CPU of the
    * faster run) so a contended round is diagnosable from the artifact.
    */
  private def yearSoak(spark: SparkSession, outRoot: String): Map[String, Double] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val yearDf = rangeDataset(spark, "2022-12-01", 396, cols = 8)
    yearDf.write.mode("overwrite").parquet(s"$outRoot/year_in")
    val yearIn = spark.read.parquet(s"$outRoot/year_in")
    val baseCols = yearIn.columns.filter(_.startsWith("y_v")).toSeq
    val generated = FeatureGenerator.generate(
      yearIn.withColumn("month", substring(col("date"), 1, 7)), 2023,
      FeatureGenerator.Config(baseColumns = baseCols))
    val yearRuns = (0 until 2).map { _ =>
      timeWithCpu(spark) {
        generated.write.mode("overwrite").parquet(s"$outRoot/year_features")
      }
    }
    out += "pm25_feature_gen_year" -> yearRuns.map(_._1).min
    out += "pm25_feature_gen_year_cpu_sec" -> yearRuns.minBy(_._1)._2
    // scale guard: the four window families must share ONE grid_id
    // exchange — a second one would double the dominant shuffle at 100 TB
    val exchanges = graft.Explain.shuffleCount(generated)
    require(exchanges <= 1,
      s"feature-gen year plan has $exchanges shuffle exchanges (want 1)")

    val grid = gridFrame(spark)
    val quarter = rangeDataset(spark, "2023-01-01", 92, cols = 2)
      .join(broadcast(grid), Seq("grid_id"))
    val quarterRuns = (0 until 2).map { _ =>
      timeWithCpu(spark) {
        DailySpatialInterpolator
          .interpolate(quarter, "date", "original_x", "original_y",
            Seq("y_v0", "y_v1"))
          .write.mode("overwrite").parquet(s"$outRoot/imputed_quarter")
      }
    }
    out += "pm25_spatial_impute_quarter" -> quarterRuns.map(_._1).min
    out += "pm25_spatial_impute_quarter_cpu_sec" -> quarterRuns.minBy(_._1)._2
    out.toMap
  }

  /** Like [[monthlyDataset]] but over an arbitrary day range. */
  def rangeDataset(spark: SparkSession, startDate: String, days: Int,
                   cols: Int): DataFrame = {
    val base = spark.range(NGrids.toLong * days).select(
      (col("id") % NGrids).as("grid_id"),
      date_format(date_add(lit(startDate).cast("date"),
        floor(col("id") / NGrids).cast("int")), "yyyy-MM-dd").as("date"),
      col("id"))
    base.select(col("grid_id") +: col("date") +: (0 until cols).map(i =>
      when(pmod(col("id") * 31 + i * 17, lit(53)) === 0, lit(null))
        .otherwise(sin(col("id") * 0.001 + i) * 50 + 100).as(s"y_v$i")): _*)
  }

  /** Time the reference-scale stages once; returns name → seconds. */
  def run(spark: SparkSession, outRoot: String, staged: Staged): Map[String, Double] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    out += "pm25_combine_month_1M" -> time {
      WideCombiner.combine(staged.plain)
        .write.mode("overwrite").parquet(s"$outRoot/combined")
    }

    // combine over BUCKETED stage outputs: zero shuffle exchanges
    out += "pm25_combine_month_1M_bucketed" -> time {
      graft.operators.BucketedStages.combineBucketed(spark, staged.bucketed)
        .write.mode("overwrite").parquet(s"$outRoot/combined_bucketed")
    }
    // Shuffle counts recorded AS metrics, next to the wall-times: on a
    // shared sandbox the timings carry co-tenant noise (round 4's bucketed
    // figure tripled under evening load while the plan was unchanged), but
    // the zero-exchange property — the actual 100 TB lever — is noise-free
    // and belongs in the artifact. The require keeps a plan regression
    // from ever publishing a bench silently.
    val plainShuffles = graft.Explain.shuffleCount(
      WideCombiner.combine(staged.plain))
    val bucketedShuffles = graft.Explain.shuffleCount(
      graft.operators.BucketedStages.combineBucketed(spark, staged.bucketed))
    require(bucketedShuffles == 0,
      s"bucketed combine plans $bucketedShuffles shuffle exchanges (want 0)")
    out += "pm25_combine_month_1M_shuffle_exchanges" -> plainShuffles.toDouble
    out += "pm25_combine_month_1M_bucketed_shuffle_exchanges" ->
      bucketedShuffles.toDouble

    // K1 spatial imputation of two columns for the whole month (31 days
    // × 33k points each, parallel across dates; id+value projection only,
    // like the reference's P3 select)
    val grid = gridFrame(spark)
    out += "pm25_spatial_impute_month" -> time {
      val withXy = spark.read.parquet(s"$outRoot/combined")
        .select("grid_id", "date", "ds0__ds0_v0", "ds1__ds1_v0")
        .join(broadcast(grid), Seq("grid_id"))
      DailySpatialInterpolator
        .interpolate(withXy, "date", "original_x", "original_y",
          Seq("ds0__ds0_v0", "ds1__ds1_v0"))
        .write.mode("overwrite").parquet(s"$outRoot/imputed")
    }

    // s02 feature generation over the month (15 base columns × 4 window
    // families — the per-year run is this × 12 with the same plan)
    out += "pm25_feature_gen_month" -> time {
      val slice = spark.read.parquet(s"$outRoot/combined")
        .withColumn("month", lit("2023-01"))
      val baseCols = slice.columns.filter(_.contains("__")).take(15).toSeq
      FeatureGenerator.generate(slice, 2023,
          FeatureGenerator.Config(baseColumns = baseCols))
        .write.mode("overwrite").parquet(s"$outRoot/features")
    }
    out.toMap
  }
}
