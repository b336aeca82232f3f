package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables.table
import graft.raster.Regrid
import graft.spatial.DailySpatialInterpolator

/** The out-of-relational kernels (SURVEY.md §2.9) driven through the
  * harness tables — every entry oracle-checked: the interpolation queries
  * seed linear fields whose interpolants are closed-form, the pivot
  * round-trips through its dense-scaffold contract, and the GEE plans
  * replay the two-level mean in SQL. Exact numeric behavior is also
  * golden-tested in SpatialSpec / RasterSpec / GeePlannerSpec.
  */
object KernelPack extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K1, mixed linear+nearest with a full value oracle: valid cells carry
    // the plane v = 2x + 3y + 10 and four out-of-range corner sources pin
    // the convex hull to [-10,1010]² per date, so interior missing cells
    // take the Delaunay-linear path (plane-exact, the k1b argument below);
    // every third missing cell is SHIFTED ±1200 in x — strictly outside
    // the hull by construction — and takes the nearest-source path, whose
    // value (the plane at the nearest source) DuckDB reproduces with an
    // argmin-over-squared-distance subquery. Checked at sf0.001/sf0.01:
    // no two sources tie on min distance for any shifted cell, so the
    // argmin is well-defined on both engines. Four date groups exercise
    // the per-day parallelism.
    "k1_spatial_interpolate" -> ((s, dir) => {
      import s.implicits._
      val raw = table(s, dir, "part")
        .select(col("p_partkey"),
          (pmod(col("p_partkey") * 2654435761L, lit(100000L)).cast("double") / 100.0)
            .as("x0"),
          (pmod(col("p_partkey") * 40503L + 7L, lit(100000L)).cast("double") / 100.0)
            .as("y"),
          (col("p_size") % 7 === 0).as("missing"),
          concat(lit("2024-01-0"), (col("p_partkey") % 4 + 1)).as("date"))
      val pts = raw.select(col("p_partkey"),
        when(col("missing") && col("p_partkey") % 3 === 0,
          col("x0") + when(col("p_partkey") % 2 === 0, 1200.0).otherwise(-1200.0))
          .otherwise(col("x0")).as("x"),
        col("y"), col("date"),
        when(col("missing"), lit(null).cast("double"))
          .otherwise(lit(2.0) * col("x0") + lit(3.0) * col("y") + lit(10.0))
          .as("v"))
      val corners = for {
        d <- 1 to 4; (cx, ci) <- Seq(-10.0, 1010.0).zipWithIndex
        (cy, cj) <- Seq(-10.0, 1010.0).zipWithIndex
      } yield (-(d * 10L + ci * 2 + cj + 1), cx, cy, s"2024-01-0$d",
        2.0 * cx + 3.0 * cy + 10.0)
      val cornersDf = corners.toDF("p_partkey", "x", "y", "date", "v")
      DailySpatialInterpolator
        .interpolate(pts.unionByName(cornersDf), "date", "x", "y", Seq("v"))
        .filter(col("p_partkey") >= 0)
        .select(col("p_partkey"), round(col("v"), 4).as("v_filled"))
        .orderBy("p_partkey")
    }),

    // K1 with a value-level oracle: barycentric interpolation of a LINEAR
    // field is exact, so seeding the valid cells with v = 2x + 3y + 10 and
    // adding four out-of-range corner sources per date (every missing
    // point strictly inside the hull → pure Delaunay-linear path, no
    // nearest fallback) makes the filled values equal the plane — which
    // DuckDB computes directly. This turns the whole triangulate → locate
    // → barycentric pipeline into an oracle-checked query; k1 above keeps
    // exercising the mixed linear+nearest path rows-only.
    "k1b_interpolate_plane" -> ((s, dir) => {
      import s.implicits._
      val raw = table(s, dir, "part")
        .select(col("p_partkey"), col("p_size"),
          (pmod(col("p_partkey") * 2654435761L, lit(100000L)).cast("double") / 100.0)
            .as("x"),
          (pmod(col("p_partkey") * 40503L + 7L, lit(100000L)).cast("double") / 100.0)
            .as("y"),
          concat(lit("2024-01-0"), (col("p_partkey") % 4 + 1)).as("date"))
      val pts = raw.select(col("p_partkey"), col("x"), col("y"), col("date"),
        when(col("p_size") % 7 === 0, lit(null).cast("double"))
          .otherwise(lit(2.0) * col("x") + lit(3.0) * col("y") + lit(10.0))
          .as("v"))
      val corners = for {
        d <- 1 to 4; (cx, ci) <- Seq(-10.0, 1010.0).zipWithIndex
        (cy, cj) <- Seq(-10.0, 1010.0).zipWithIndex
      } yield (-(d * 10L + ci * 2 + cj + 1), cx, cy, s"2024-01-0$d",
        2.0 * cx + 3.0 * cy + 10.0)
      val cornersDf = corners.toDF("p_partkey", "x", "y", "date", "v")
      DailySpatialInterpolator
        .interpolate(pts.unionByName(cornersDf), "date", "x", "y", Seq("v"))
        .filter(col("p_partkey") >= 0)
        .select(col("p_partkey"), round(col("v"), 4).as("v_filled"))
        .orderBy("p_partkey")
    }),

    // K1 tiled twin — the 100×-density scale path: same planar
    // construction as k1b, interpolated per (date, tile) with a halo by
    // TiledInterpolator. Same oracle: the tiled kernel is spec-asserted
    // bit-identical to the untiled one wherever the halo covers the
    // interpolation neighborhood, and the plane makes every value
    // closed-form.
    "k1c_interpolate_tiled" -> ((s, dir) => {
      import s.implicits._
      val raw = table(s, dir, "part")
        .select(col("p_partkey"), col("p_size"),
          (pmod(col("p_partkey") * 2654435761L, lit(100000L)).cast("double") / 100.0)
            .as("x"),
          (pmod(col("p_partkey") * 40503L + 7L, lit(100000L)).cast("double") / 100.0)
            .as("y"),
          concat(lit("2024-01-0"), (col("p_partkey") % 4 + 1)).as("date"))
      val pts = raw.select(col("p_partkey"), col("x"), col("y"), col("date"),
        when(col("p_size") % 7 === 0, lit(null).cast("double"))
          .otherwise(lit(2.0) * col("x") + lit(3.0) * col("y") + lit(10.0))
          .as("v"))
      // anchor POSTS along the whole boundary, not just 4 corners: a
      // tile's halo-local hull must cover its own targets, so every
      // 300-unit window of the frame edge needs an anchor (with corner-
      // only anchors, edge targets above the local hull chord fall to
      // nearest-fill and off the plane)
      val edge = Seq(-10.0, 194.0, 398.0, 602.0, 806.0, 1010.0)
      val anchors = for {
        d <- 1 to 4
        ((ax, ay), i) <- (edge.map((_, -10.0)) ++ edge.map((_, 1010.0)) ++
          edge.drop(1).dropRight(1).map((-10.0, _)) ++
          edge.drop(1).dropRight(1).map((1010.0, _))).zipWithIndex
      } yield (-(d * 100L + i + 1), ax, ay, s"2024-01-0$d",
        2.0 * ax + 3.0 * ay + 10.0)
      val anchorsDf = anchors.toDF("p_partkey", "x", "y", "date", "v")
      graft.spatial.TiledInterpolator
        .interpolate(pts.unionByName(anchorsDf), "date", "x", "y", Seq("v"),
          gx = 2, gy = 2, halo = 300.0)
        .filter(col("p_partkey") >= 0)
        .select(col("p_partkey"), round(col("v"), 4).as("v_filled"))
        .orderBy("p_partkey")
    }),

    // K5: the GEE feature-planner semantics in-engine, on a synthetic
    // raster derived from `part`. Exact float parity by construction:
    // band values are integers, each (date, site) composite averages at
    // most 2 image samples (multiples of 0.5 — exact in double), and each
    // 2×2-site cell mean sums exact doubles before one correctly-rounded
    // divide, so both engines derive bit-identical values and the 4-dp
    // round is safe. p_partkey < 256 keeps the mixed-radix decomposition
    // (date × image × site) bijective at every scale factor. Dates span
    // {01,02,03} but the plan requests only {01,02} — the date filter is
    // exercised, d=3 rows drop.
    "k5_daily_average_plan" -> ((s, dir) => {
      val pixels = table(s, dir, "part")
        .filter(col("p_partkey") < 256)
        .select(
          concat(lit("2023-01-0"), col("p_partkey") % 3 + 1).as("date"),
          (expr("(p_partkey div 6) % 8") + 0.5).as("x"),
          (expr("(p_partkey div 6) div 8 % 8") + 0.5).as("y"),
          (col("p_partkey") * 7 % 100).cast("double").as("b1"),
          (col("p_partkey") * 13 % 50).cast("double").as("b2"))
      val planner = new graft.ingest.GriddedFeatureCollectionPlanner(gridCells(s))
      val plan = planner.planDailyAverage(pixels, "TEST/COLLECTION",
        Seq("b1", "b2"), Seq("2023-01-01", "2023-01-02"))
      plan.frame.select(col("date"), col("grid_id"),
          round(col("b1_mean"), 4).as("b1_mean"),
          round(col("b2_mean"), 4).as("b2_mean"))
        .orderBy("date", "grid_id")
    }),

    // K5 static single-image regrid: one sample per site (i < 64
    // bijective), single band → bare "mean" export name; cell means are
    // integer sums with one divide — exact.
    "k5_static_feature_plan" -> ((s, dir) => {
      val pixels = table(s, dir, "part")
        .filter(col("p_partkey") < 64)
        .select(
          (col("p_partkey") % 8 + 0.5).as("x"),
          (expr("p_partkey div 8 % 8") + 0.5).as("y"),
          (col("p_partkey") * 11 % 70).cast("double").as("elev"))
      val planner = new graft.ingest.GriddedFeatureCollectionPlanner(gridCells(s))
      val plan = planner.planStaticFeature(pixels, "TEST/IMAGE", Seq("elev"))
      plan.frame.select(col("grid_id"), round(col("mean"), 4).as("mean"))
        .orderBy("grid_id")
    }),

    // K5 annual classified-pixel shares: class values remap to 0/1 bands,
    // the year's image stack (2 of 4 images fall in 2023 — the year
    // filter is exercised) averages per site, cells average their sites.
    // Same exactness ladder as above: 0/1 over ≤2 images → multiples of
    // 0.5; site means sum exactly before the one cell divide.
    "k5_annual_classified_plan" -> ((s, dir) => {
      val pixels = table(s, dir, "part")
        .filter(col("p_partkey") < 256)
        .select(
          concat(when(col("p_partkey") % 4 < 2, lit("2023")).otherwise(lit("2024")),
            lit("-06-15")).as("date"),
          (expr("(p_partkey div 4) % 8") + 0.5).as("x"),
          (expr("(p_partkey div 4) div 8 % 8") + 0.5).as("y"),
          (col("p_partkey") * 3 % 7).as("land_cover"))
      val planner = new graft.ingest.GriddedFeatureCollectionPlanner(gridCells(s))
      val plan = planner.planAnnualClassifiedPixels(pixels, "TEST/COLLECTION",
        "land_cover", Seq("low" -> Seq(1, 2, 3), "high" -> Seq(4, 5)), 2023)
      plan.frame.select(col("grid_id"),
          round(col("low_mean"), 4).as("low_mean"),
          round(col("high_mean"), 4).as("high_mean"))
        .orderBy("grid_id")
    }),

    // K4: the terminal long→raster pivot (ref: collectors/grid.py:122-185)
    // oracle-checked through its long-form round trip: 59 bijectively
    // placed (time, y, x, value) points (p_partkey < 60 decomposes
    // mixed-radix into 3 times × 5 ys × 4 xs) pivot into the dense
    // 60-cell cube — absent cells (pk=0 never exists; pk%11=0 dropped)
    // materialize as NaN — and flatten back to long form. NaN→null at the
    // output edge keeps the driver's hash compare engine-portable; the
    // oracle rebuilds the dense scaffold with a cross join of the distinct
    // axes, which is exactly the cube's shape contract.
    "k4_pivot_longform" -> ((s, dir) => {
      val pts = table(s, dir, "part")
        .filter(col("p_partkey") < 60 && pmod(col("p_partkey"), lit(11)) =!= 0)
        .select(
          concat(lit("2024-01-0"), pmod(col("p_partkey"), lit(3)) + 1).as("time"),
          pmod(floor(col("p_partkey") / 3), lit(5)).cast("double").as("y"),
          floor(col("p_partkey") / 15).cast("double").as("x"),
          pmod(col("p_partkey") * 7, lit(100)).cast("float").as("value"))
      val cube = graft.raster.RasterPivot.toCube(pts, "time", "y", "x", "value")
      graft.raster.RasterPivot.toLong(s, cube)
        .select(col("time"), col("y"), col("x"),
          nanvl(col("value"), lit(null)).cast("double").as("value"))
        .orderBy("time", "y", "x")
    }),

    // K2: regrid a coarse raster (built from the region table) onto
    // customer "coordinates" by bilinear interpolation.
    "k2_regrid_bilinear" -> ((s, dir) => {
      val rasterDf = s.range(0, 25).select(
        ((col("id") % 5) * 10).cast("double").as("lat"),
        (floor(col("id") / 5) * 10).cast("double").as("lon"),
        ((col("id") % 5) * 10 + floor(col("id") / 5) * 10 * 2).cast("double").as("value"))
      val raster = Regrid.toRaster(rasterDf)
      val targets = table(s, dir, "customer")
        .select(col("c_custkey"),
          (col("c_custkey") % 40).cast("double").as("lat"),
          (col("c_custkey") % 35).cast("double").as("lon"))
      Regrid.interpolateAt(targets, raster, "linear")
        .select(col("c_custkey"), round(col("value"), 4).as("value"))
        .orderBy("c_custkey")
    }),

    // Z-order layout kernel: the Morton interleave that gives data at
    // rest 2-D locality (grid × time tiles) — exact public bit cascade,
    // replayed bit-for-bit in SQL.
    "k_zorder_curve" -> ((s, dir) => {
      table(s, dir, "customer")
        .select(col("c_custkey"),
          pmod(col("c_custkey"), lit(256L)).as("x"),
          pmod(col("c_custkey") * 7, lit(256L)).as("y"))
        .withColumn("z", graft.operators.ZOrder.zValue(col("x"), col("y")))
        .orderBy("c_custkey")
    }),

    // K6 (assignment half): the stratified group k-fold group→fold rule
    // — greedy over (group, stratum) counts with fixed-order arithmetic
    // and an md5 visit tie-break, so the DuckDB oracle replays it
    // step-for-step in a recursive CTE and matches bit-exactly. Model
    // TRAINING stays the SURVEY-blessed MLlib divergence (MlSpec); the
    // assignment rule itself is pure and now gate-checked.
    "k6_fold_assignment" -> ((s, dir) => {
      graft.ml.StratifiedGroupKFold
        .groupFolds(table(s, dir, "customer"), "c_nationkey", "c_mktsegment", 4)
        .select(col("c_nationkey"), col("__fold").as("fold"))
        .orderBy("c_nationkey")
    }))

  // K2 on a bilinear field is exact → the oracle computes the plane
  // directly (lat + 2·lon; all targets fall inside the raster extent).
  def oracles: Map[String, String] = Map(
    // k1 mixed-path oracle: non-shifted cells (valid, or missing-interior
    // filled by the linear pass) evaluate the plane at their own coords;
    // shifted cells (missing AND p_partkey % 3 = 0, moved outside the
    // hull) copy the plane value of the argmin-distance source of their
    // date group — the same doubles both engines derive from identical
    // integer arithmetic, so the 4-dp round is exact (tie-free, verified).
    "k1_spatial_interpolate" ->
      """WITH raw AS (
           SELECT p_partkey,
             CAST((p_partkey * 2654435761) % 100000 AS DOUBLE)/100.0 AS x0,
             CAST((p_partkey * 40503 + 7) % 100000 AS DOUBLE)/100.0 AS y,
             (p_size % 7 = 0) AS missing,
             p_partkey % 4 + 1 AS d
           FROM part),
         pts AS (
           SELECT p_partkey,
             CASE WHEN missing AND p_partkey % 3 = 0
                  THEN x0 + CASE WHEN p_partkey % 2 = 0 THEN 1200.0 ELSE -1200.0 END
                  ELSE x0 END AS x,
             y, x0, missing, d
           FROM raw),
         sources AS (
           SELECT x, y, 2.0*x + 3.0*y + 10.0 AS v, d FROM pts WHERE NOT missing
           UNION ALL
           SELECT cx, cy, 2.0*cx + 3.0*cy + 10.0, d
           FROM (VALUES (-10.0,-10.0),(-10.0,1010.0),(1010.0,-10.0),(1010.0,1010.0)) c(cx,cy)
           CROSS JOIN (VALUES (1),(2),(3),(4)) dd(d))
         SELECT p.p_partkey,
           CASE WHEN p.missing AND p.p_partkey % 3 = 0
                THEN (SELECT ROUND(s.v, 4) FROM sources s WHERE s.d = p.d
                      ORDER BY (s.x-p.x)*(s.x-p.x) + (s.y-p.y)*(s.y-p.y) LIMIT 1)
                ELSE ROUND(2.0*p.x0 + 3.0*p.y + 10.0, 4) END AS v_filled
         FROM pts p ORDER BY p.p_partkey""",
    // Exactness argument in the query comment: linear interpolation of a
    // plane reproduces the plane; valid cells carry it by construction.
    // Both engines derive x/y with the same integer-mod + double-divide,
    // so the doubles are bit-identical and the 4-dp round is safe (true
    // values have 2 decimals; barycentric error ~1e-12).
    "k1b_interpolate_plane" ->
      """SELECT p_partkey,
         ROUND(2.0 * (CAST((p_partkey * 2654435761) % 100000 AS DOUBLE) / 100.0)
             + 3.0 * (CAST((p_partkey * 40503 + 7) % 100000 AS DOUBLE) / 100.0)
             + 10.0, 4) AS v_filled
         FROM part ORDER BY p_partkey""",
    "k1c_interpolate_tiled" ->
      """SELECT p_partkey,
         ROUND(2.0 * (CAST((p_partkey * 2654435761) % 100000 AS DOUBLE) / 100.0)
             + 3.0 * (CAST((p_partkey * 40503 + 7) % 100000 AS DOUBLE) / 100.0)
             + 10.0, 4) AS v_filled
         FROM part ORDER BY p_partkey""",
    "k4_pivot_longform" ->
      """WITH pts AS (
           SELECT '2024-01-0' || CAST(p_partkey % 3 + 1 AS VARCHAR) AS time,
             CAST((p_partkey // 3) % 5 AS DOUBLE) AS y,
             CAST(p_partkey // 15 AS DOUBLE) AS x,
             CAST(p_partkey * 7 % 100 AS DOUBLE) AS value
           FROM part WHERE p_partkey < 60 AND p_partkey % 11 <> 0),
         axes AS (
           SELECT t.time, yy.y, xx.x
           FROM (SELECT DISTINCT time FROM pts) t
           CROSS JOIN (SELECT DISTINCT y FROM pts) yy
           CROSS JOIN (SELECT DISTINCT x FROM pts) xx)
         SELECT a.time, a.y, a.x, p.value
         FROM axes a
         LEFT JOIN pts p ON p.time = a.time AND p.y = a.y AND p.x = a.x
         ORDER BY a.time, a.y, a.x""",
    "k2_regrid_bilinear" ->
      """SELECT c_custkey,
         ROUND(CAST(c_custkey % 40 AS DOUBLE)
             + 2 * CAST(c_custkey % 35 AS DOUBLE), 4) AS value
         FROM customer ORDER BY c_custkey""",
    // K5 oracles replay the two-level mean explicitly: composite across
    // the image stack per site, THEN mean across sites per cell —
    // mean-of-means, never mean-of-rows.
    "k5_daily_average_plan" ->
      """WITH px AS (
           SELECT p_partkey % 3 + 1 AS d,
             (p_partkey // 6) % 8 + 0.5 AS x,
             ((p_partkey // 6) // 8) % 8 + 0.5 AS y,
             CAST(p_partkey * 7 % 100 AS DOUBLE) AS b1,
             CAST(p_partkey * 13 % 50 AS DOUBLE) AS b2
           FROM part WHERE p_partkey < 256 AND p_partkey % 3 + 1 <= 2),
         comp AS (
           SELECT d, x, y, AVG(b1) AS b1, AVG(b2) AS b2
           FROM px GROUP BY d, x, y)
         SELECT '2023-01-0' || CAST(d AS VARCHAR) AS date,
           CAST(FLOOR(y / 2) * 4 + FLOOR(x / 2) AS BIGINT) AS grid_id,
           ROUND(AVG(b1), 4) AS b1_mean, ROUND(AVG(b2), 4) AS b2_mean
         FROM comp GROUP BY 1, 2 ORDER BY 1, 2""",
    "k5_static_feature_plan" ->
      """SELECT CAST(FLOOR(((p_partkey // 8) % 8 + 0.5) / 2) * 4
               + FLOOR((p_partkey % 8 + 0.5) / 2) AS BIGINT) AS grid_id,
           ROUND(AVG(CAST(p_partkey * 11 % 70 AS DOUBLE)), 4) AS mean
         FROM part WHERE p_partkey < 64 GROUP BY 1 ORDER BY 1""",
    "k5_annual_classified_plan" ->
      """WITH px AS (
           SELECT (p_partkey // 4) % 8 + 0.5 AS x,
             ((p_partkey // 4) // 8) % 8 + 0.5 AS y,
             CASE WHEN p_partkey * 3 % 7 IN (1, 2, 3) THEN 1.0 ELSE 0.0 END AS low,
             CASE WHEN p_partkey * 3 % 7 IN (4, 5) THEN 1.0 ELSE 0.0 END AS high
           FROM part WHERE p_partkey < 256 AND p_partkey % 4 < 2),
         site AS (
           SELECT x, y, AVG(low) AS low, AVG(high) AS high
           FROM px GROUP BY x, y)
         SELECT CAST(FLOOR(y / 2) * 4 + FLOOR(x / 2) AS BIGINT) AS grid_id,
           ROUND(AVG(low), 4) AS low_mean, ROUND(AVG(high), 4) AS high_mean
         FROM site GROUP BY 1 ORDER BY 1""",

    // the Morton bit cascade replayed exactly (DuckDB & | << on BIGINT)
    "k_zorder_curve" ->
      s"""WITH p AS (
           SELECT c_custkey, c_custkey % 256 AS x, (c_custkey * 7) % 256 AS y
           FROM customer)
         SELECT c_custkey, x, y,
           (${spreadSql("x")}) | ((${spreadSql("y")}) << 1) AS z
         FROM p ORDER BY c_custkey""",

    // Step-for-step recursive-CTE replay of the greedy stratified
    // group-k-fold assignment (k=4). State rides in the recursion as two
    // lists: pf = per-(fold,stratum) counts flattened at index
    // fold*ns+stratum, fs = per-fold sizes. Each step places the next
    // group in the (spread DESC, md5(group)) visit order onto the fold
    // minimizing (eval, size, fold-id) — eval folds strata/folds in the
    // same fixed order as the Scala loop, so every double matches
    // bit-exactly and the lexicographic LIST_SORT argmin needs no
    // tolerance. Counts stay integral until the one division by the
    // stratum total.
    "k6_fold_assignment" ->
      """WITH RECURSIVE
         counts AS (
           SELECT c_nationkey AS g, c_mktsegment AS s, COUNT(*) AS n
           FROM customer GROUP BY 1, 2),
         strata AS (SELECT DISTINCT s FROM counts),
         consts AS (
           SELECT 4 AS k, (SELECT COUNT(*) FROM strata) AS ns,
                  (SELECT COUNT(DISTINCT g) FROM counts) AS ng,
                  (SELECT LIST(tot ORDER BY s)
                   FROM (SELECT s, SUM(n) AS tot FROM counts GROUP BY s)) AS tot),
         grid AS (
           SELECT gg.g, st.s, COALESCE(c.n, 0) AS n
           FROM (SELECT DISTINCT g FROM counts) gg
           CROSS JOIN strata st
           LEFT JOIN counts c ON c.g = gg.g AND c.s = st.s),
         g0 AS (
           SELECT g, LIST(n ORDER BY s) AS csl, SUM(n) AS gtot
           FROM grid GROUP BY g),
         gstats AS (
           SELECT g, csl, gtot,
                  SQRT(LIST_SUM(LIST_TRANSFORM(csl,
                    cc -> (cc - CAST(gtot AS DOUBLE) / ns)
                        * (cc - CAST(gtot AS DOUBLE) / ns))) / ns) AS sp
           FROM g0 CROSS JOIN consts),
         ord AS (
           SELECT g, csl, gtot,
                  ROW_NUMBER() OVER (ORDER BY sp DESC, md5(CAST(g AS VARCHAR))) AS pos
           FROM gstats),
         assign AS (
           SELECT 0::BIGINT AS pos, CAST(NULL AS INTEGER) AS g,
                  CAST(NULL AS BIGINT) AS fold,
                  (SELECT LIST_TRANSFORM(RANGE(1, k * ns + 1), x -> 0::BIGINT)
                   FROM consts) AS pf,
                  (SELECT LIST_TRANSFORM(RANGE(1, k + 1), x -> 0::BIGINT)
                   FROM consts) AS fs
           UNION ALL
           SELECT pos, g, best AS fold,
                  LIST_TRANSFORM(RANGE(0, k * ns), j ->
                    pf[j + 1] + CASE WHEN j // ns = best
                                     THEN csl[(j % ns) + 1] ELSE 0 END) AS pf,
                  LIST_TRANSFORM(RANGE(0, k), i ->
                    fs[i + 1] + CASE WHEN i = best THEN gtot ELSE 0 END) AS fs
           FROM (
             SELECT a.pos + 1 AS pos, o.g, o.csl, o.gtot, a.pf, a.fs,
                    c.k, c.ns, c.tot, c.ng,
                    LIST_SORT(LIST_TRANSFORM(RANGE(0, c.k), f -> {
                      'ev': LIST_SUM(LIST_TRANSFORM(RANGE(0, c.ns), s ->
                        CASE WHEN c.tot[s + 1] = 0 THEN 0.0 ELSE
                          SQRT(LIST_SUM(LIST_TRANSFORM(RANGE(0, c.k), i ->
                            (CAST(a.pf[i * c.ns + s + 1]
                                  + CASE WHEN i = f THEN o.csl[s + 1] ELSE 0 END
                              AS DOUBLE) / c.tot[s + 1]
                             - LIST_SUM(LIST_TRANSFORM(RANGE(0, c.k), i2 ->
                                 CAST(a.pf[i2 * c.ns + s + 1]
                                      + CASE WHEN i2 = f THEN o.csl[s + 1] ELSE 0 END
                                   AS DOUBLE) / c.tot[s + 1])) / c.k)
                            * (CAST(a.pf[i * c.ns + s + 1]
                                    + CASE WHEN i = f THEN o.csl[s + 1] ELSE 0 END
                                AS DOUBLE) / c.tot[s + 1]
                               - LIST_SUM(LIST_TRANSFORM(RANGE(0, c.k), i2 ->
                                   CAST(a.pf[i2 * c.ns + s + 1]
                                        + CASE WHEN i2 = f THEN o.csl[s + 1] ELSE 0 END
                                     AS DOUBLE) / c.tot[s + 1])) / c.k))) / c.k)
                        END)) / c.ns,
                      'sz': a.fs[f + 1],
                      'f': f }))[1].f AS best
             FROM assign a
             JOIN ord o ON o.pos = a.pos + 1
             CROSS JOIN consts c
             WHERE a.pos < c.ng))
         SELECT g AS c_nationkey, CAST(fold AS INTEGER) AS fold
         FROM assign WHERE pos >= 1 ORDER BY g""")

  /** The textbook magic-number bit spread (low 16 bits to even
    * positions) expanded textually for the z-order oracle.
    */
  private def spreadSql(v: String): String = {
    val a = s"((($v) | (($v) << 8)) & 16711935)"
    val b = s"((($a) | (($a) << 4)) & 252645135)"
    val c = s"((($b) | (($b) << 2)) & 858993459)"
    s"((($c) | (($c) << 1)) & 1431655765)"
  }

  /** 4×4 grid of 2×2 cells over [0,8)² — grid_id = row-major (gy·4+gx),
    * matching the oracle's FLOOR(y/2)·4 + FLOOR(x/2).
    */
  private def gridCells(s: SparkSession): DataFrame =
    s.range(16).select(col("id").as("grid_id"),
      ((col("id") % 4) * 2).cast("double").as("xmin"),
      (floor(col("id") / 4) * 2).cast("double").as("ymin"),
      ((col("id") % 4) * 2 + 2).cast("double").as("xmax"),
      (floor(col("id") / 4) * 2 + 2).cast("double").as("ymax"))
}
