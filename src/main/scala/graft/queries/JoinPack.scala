package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables.table

/** Join variants from SURVEY.md §2.3 beyond the wide combine:
  * J5 equi-join enrichment, J6/K3 nearest-neighbor join via broadcast +
  * windowed rank (ref: collectors/pm25/pm25_pipeline.py:166-189), J8
  * sample-split left join with null-defaulting (ref:
  * sample/imputation_sampler.py:98-105), plus semi/anti variants the
  * engine supports as first-class (expressed as EXISTS in the oracle).
  */
object JoinPack extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J5: plain equi-join enrichment (measurements ⨝ station map shape).
    "j5_equi_enrich" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"))
        .orderBy("c_custkey")
    }),

    // J6/K3: 1-NN join — for each customer the nearest supplier in account-
    // balance space. Broadcast the small side; k=1 resolves with a
    // lexicographic min(struct) aggregate (map-side combine — the cross
    // candidates never shuffle), not a rank window. Same plan shape as the
    // reference's station→grid haversine KNN.
    "j6_knn_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val sup = table(s, dir, "supplier")
      c.crossJoin(broadcast(sup))
        .withColumn("dist", abs(col("c_acctbal") - col("s_acctbal")))
        .groupBy("c_custkey")
        .agg(min(struct(col("dist"), col("s_suppkey"))).as("best"))
        .select(col("c_custkey"), col("best.s_suppkey").as("s_suppkey"),
          round(col("best.dist"), 2).as("dist"))
        .orderBy("c_custkey")
    }),

    // J8 + F10: split assignment — deterministically sampled keys become
    // "training", everything else defaults to "test" via coalesce.
    "j8_split_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val sampled = c
        .filter(pmod(col("c_custkey") * lit(2654435761L), lit(1000)) < 300)
        .select(col("c_custkey"), lit("training").as("split"))
      c.join(sampled, Seq("c_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("split"), lit("test")).as("split"))
        .orderBy("c_custkey")
    }),

    // Snapshot reconciliation: added/removed/changed/unchanged between
    // two derived versions of the events table — one full outer join
    // on the key, null-safe column comparison, exact counts.
    "j_snapshot_diff" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val oldSnap = ev.filter(col("event_id") % 97 =!= 0)
      val newSnap = ev.filter(col("event_id") % 89 =!= 0)
        .withColumn("value",
          when(col("event_id") % 13 === 0, col("value") + 1)
            .otherwise(col("value")))
      graft.operators.SnapshotDiff.summary(oldSnap, newSnap,
          Seq("event_id"), Seq("event_type", "value"))
        .orderBy("status")
    }),

    // Semi join: customers having at least one open order.
    // Salted equi-join: hot-key-safe layout, result identical to the
    // plain join (which is exactly what the oracle states). Aggregated
    // so the gate compares the full join product compactly.
    "j_salted_skew_join" -> ((s, dir) => {
      val joined = graft.operators.SaltedJoin.saltedEquiJoin(
        table(s, dir, "lineitem").select("l_orderkey", "l_quantity"),
        table(s, dir, "orders").select("o_orderkey", "o_orderpriority")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        keys = Seq("l_orderkey"), salt = 8)
      joined.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy("o_orderpriority")
    }),

    // Bloom semi-join reduction: lineitem rows for urgent orders, with
    // the fact side Bloom-pruned map-side before the join's shuffle.
    // The oracle is the PLAIN join — the filter must be invisible in
    // the result (no false negatives; false positives removed by the
    // real join).
    "j_bloom_semi_reduce" -> ((s, dir) => {
      val fact = table(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val dim = table(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      graft.operators.BloomJoin
        .reduceJoin(fact, dim, Seq("l_orderkey"), expectedItems = 100000L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy("o_orderstatus")
    }),

    "j_semi_exists" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders").filter(col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Anti join: customers with no orders at all.
    "j_anti_not_exists" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // As-of join: each click attaches the user's latest purchase
    // at-or-before it — the union-window plan (one key shuffle, no
    // theta-join blowup), checked against DuckDB's NATIVE ASOF JOIN.
    "j_asof_join" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
      graft.operators.AsOfJoin.backward(
          clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("purchase_value"), matchedTsName = "purchase_ts")
        .select(col("event_id"), col("user_id"),
          date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("purchase_ts"),
          round(col("purchase_value"), 6).as("purchase_value"))
        .orderBy("event_id")
    }),

    // As-of with a lookback tolerance: matches strictly older than one
    // hour before the click are nulled out (full-micros comparison).
    "j_asof_tolerance" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
      graft.operators.AsOfJoin.backward(
          clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("purchase_value"), matchedTsName = "purchase_ts",
          toleranceMicros = Some(3600L * 1000000L))
        .select(col("event_id"), col("user_id"),
          date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("purchase_ts"),
          round(col("purchase_value"), 6).as("purchase_value"))
        .orderBy("event_id")
    }),

    // Forward as-of: each click attaches the user's NEXT purchase
    // at-or-after it — the same union-window plan walked descending.
    "j_asof_forward" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
      graft.operators.AsOfJoin.forward(
          clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("purchase_value"), matchedTsName = "purchase_ts")
        .select(col("event_id"), col("user_id"),
          date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("purchase_ts"),
          round(col("purchase_value"), 6).as("purchase_value"))
        .orderBy("event_id")
    }),

    // Interval join: every click inside the hour after an error by the
    // same user — the bucketed range join (intervals explode into 1-hour
    // buckets, points own ONE bucket, equi-join on (user, bucket) + exact
    // containment filter; no per-key cross product, no dedup needed).
    "j_range_join" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val outages = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          col("ts").as("s"), (col("ts") + expr("INTERVAL 1 HOUR")).as("e"))
      graft.operators.RangeJoin.bucketed(
          clicks, outages, Seq("user_id"), "ts", "s", "e",
          bucketWidth = 3600L * 1000000L)
        .select("click_id", "error_id")
        .orderBy("click_id", "error_id")
    }))

  def oracles: Map[String, String] = Map(
    "j5_equi_enrich" ->
      """SELECT c_custkey, c_name, n_name FROM customer
         JOIN nation ON c_nationkey = n_nationkey ORDER BY c_custkey""",
    "j6_knn_join" ->
      """WITH d AS (SELECT c_custkey, s_suppkey,
             ABS(c_acctbal - s_acctbal) AS dist,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY ABS(c_acctbal - s_acctbal), s_suppkey) AS rk
           FROM customer CROSS JOIN supplier)
         SELECT c_custkey, s_suppkey, ROUND(dist, 2) AS dist
         FROM d WHERE rk = 1 ORDER BY c_custkey""",
    "j8_split_join" ->
      """SELECT c.c_custkey,
         COALESCE(s.split, 'test') AS split
         FROM customer c
         LEFT JOIN (SELECT c_custkey, 'training' AS split FROM customer
                    WHERE (c_custkey * 2654435761) % 1000 < 300) s
         ON c.c_custkey = s.c_custkey
         ORDER BY 1""",
    // Bloom routing must be invisible: the oracle is the plain join.
    "j_bloom_semi_reduce" ->
      """SELECT o.o_orderstatus, COUNT(*) AS n,
                CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem l
         JOIN (SELECT o_orderkey, o_orderstatus FROM orders
               WHERE o_orderpriority = '1-URGENT') o
           ON l.l_orderkey = o.o_orderkey
         GROUP BY 1 ORDER BY 1""",
    "j_semi_exists" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
         ORDER BY c_custkey""",
    "j_anti_not_exists" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey""",
    // Salting must be invisible in the result: the oracle is the PLAIN join.
    "j_salted_skew_join" ->
      """SELECT o.o_orderpriority, COUNT(*) AS n,
                CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1 ORDER BY 1""",
    // independent implementation: DuckDB's native ASOF JOIN (inclusive
    // rightTs <= leftTs, latest wins) vs the engine's union-window plan
    "j_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'click'),
         purchases AS (SELECT user_id, ts, value AS purchase_value FROM events
                       WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id,
                strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
                ROUND(p.purchase_value, 6) AS purchase_value
         FROM clicks c ASOF LEFT JOIN purchases p
           ON c.user_id = p.user_id AND c.ts >= p.ts
         ORDER BY c.event_id""",
    // native ASOF picks the latest at-or-before; the tolerance then nulls
    // the attach (not the row) when it is older than the 1-hour lookback
    "j_asof_tolerance" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'click'),
         purchases AS (SELECT user_id, ts, value AS purchase_value FROM events
                       WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id,
                CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR
                     THEN strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') END AS purchase_ts,
                CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR
                     THEN ROUND(p.purchase_value, 6) END AS purchase_value
         FROM clicks c ASOF LEFT JOIN purchases p
           ON c.user_id = p.user_id AND c.ts >= p.ts
         ORDER BY c.event_id""",
    "j_asof_forward" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'click'),
         purchases AS (SELECT user_id, ts, value AS purchase_value FROM events
                       WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id,
                strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
                ROUND(p.purchase_value, 6) AS purchase_value
         FROM clicks c ASOF LEFT JOIN purchases p
           ON c.user_id = p.user_id AND c.ts <= p.ts
         ORDER BY c.event_id""",
    // the oracle is the PLAIN range-predicate join — bucketing must be
    // invisible in the result
    "j_range_join" ->
      """SELECT c.event_id AS click_id, o.event_id AS error_id
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click') c
         JOIN (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'error') o
           ON c.user_id = o.user_id
          AND c.ts >= o.ts AND c.ts <= o.ts + INTERVAL 1 HOUR
         ORDER BY click_id, error_id""",

    "j_snapshot_diff" -> (graft.operators.SnapshotDiff.summaryOracleSql(
      """SELECT event_id, event_type, value FROM events
         WHERE event_id % 97 <> 0""",
      """SELECT event_id, event_type,
           CASE WHEN event_id % 13 = 0 THEN value + 1 ELSE value END AS value
         FROM events WHERE event_id % 89 <> 0""",
      keyCols = Seq("event_id"),
      compareCols = Seq("event_type", "value")) + " ORDER BY status"))
}
