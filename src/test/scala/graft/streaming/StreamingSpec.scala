package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Stage the harness events file into a streaming source directory. */
  private def stageEventsDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/part-0.parquet"))
    dir
  }

  test("windowed counts over the stream match the batch equivalent") {
    val dir = stageEventsDir()
    val stream = EventsStream.readEvents(spark, dir)
    val got = EventsStream.runToMemory(
      EventsStream.windowedCounts(stream, "1 hour", "2 hours"),
      "win_counts", mode = "complete")

    val batch = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

    val g = got.orderBy("window_start", "event_type").collect()
    val b = batch.orderBy("window_start", "event_type").collect()
    assert(g.length === b.length && g.length > 0)
    assert(g.toSeq === b.toSeq)
  }

  test("incremental arrival: second file extends the aggregation") {
    val dir = stageEventsDir()
    val stream = EventsStream.windowedCounts(
      EventsStream.readEvents(spark, dir), "1 hour", "2 hours")
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("inc_counts").start()
    try {
      q.processAllAvailable()
      val n1 = spark.table("inc_counts").agg(sum("n")).as[Long].head()
      // drop a second copy of the file in → counts double
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
      val n2 = spark.table("inc_counts").agg(sum("n")).as[Long].head()
      assert(n1 === 1000L && n2 === 2000L)
    } finally q.stop()
  }

  test("stateful as-of attach matches the batch AsOfJoin on the same events") {
    val dir = stageEventsDir()
    val got = EventsStream.runToMemory(
      EventsStream.asOfAttach(EventsStream.readEvents(spark, dir)).toDF(),
      "asof_attach")
      .select(col("eventId"), col("purchaseTs"), col("purchaseValue"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val ev = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
    val batch = graft.operators.AsOfJoin.backward(
        clicks, purchases, Seq("user_id"), "ts", "ts", Seq("purchase_value"),
        matchedTsName = "purchase_ts")
      .select(col("event_id"),
        unix_micros(col("purchase_ts")).as("pts"), col("purchase_value"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(got.size === batch.size && got.nonEmpty)
    assert(got === batch)
  }

  test("stateful sessionize matches the batch gaps-and-islands rollup") {
    val dir = stageEventsDir()
    val gapMs = 30L * 60 * 1000
    val got = EventsStream.runToMemory(
      EventsStream.sessionize(EventsStream.readEvents(spark, dir), gapMs).toDF(),
      "sess_twin")
      .select("userId", "sessionStart", "sessionEnd", "nEvents")
      .as[(Long, Long, Long, Int)].collect().toSet

    val batch = graft.operators.Sessions.sessionize(
        graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events"),
        Seq("user_id"), "ts", gapMs)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3, r._4.toInt)).toSet

    assert(got.nonEmpty && got === batch)
  }

  test("streaming dedup drops re-delivered event ids") {
    val dir = stageEventsDir()
    // second copy of the same file = exact re-delivery of all 1000 events
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/part-1.parquet"))
    val got = EventsStream.runToMemory(
      EventsStream.dedupEvents(EventsStream.readEvents(spark, dir)), "dedup_ev")
    assert(got.count() === 1000L)
    assert(got.select("event_id").distinct().count() === 1000L)
  }

  test("incremental snapshot dedup runs unchanged over a file stream") {
    // the batch operator is pure narrow ops + a stream-static join, so
    // the SAME Incremental.checkBatch works on a readStream frame —
    // continuous ingest-vs-snapshot dedup with no separate code path
    import graft.dedup.Incremental
    val snapshot = Seq((1L, "seen before"), (2L, "also seen")).toDF("doc_id", "text")
    val bf = Incremental.buildBloom(snapshot, "text", expectedItems = 100L)
    val idx = Incremental.snapshotIndex(snapshot, "text")

    val dir = java.nio.file.Files.createTempDirectory("graft-inc-stream").toString + "/feed"
    Seq((10L, "seen before"), (11L, "brand new"), (12L, "also seen"), (13L, "another new"))
      .toDF("doc_id", "text").write.parquet(dir)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(dir)

    val got = EventsStream.runToMemory(
        Incremental.checkBatch(stream, idx, bf, "doc_id", "text"), "inc_dedup")
      .select("doc_id", "is_new")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(10L -> false, 11L -> true, 12L -> false, 13L -> true))
  }

  test("streaming corpus ingest: jsonl → quality gate → snapshot dedup") {
    import graft.dedup.Incremental
    import graft.text.TextFunctions
    // at-rest snapshot with one known doc
    val snapshot = Seq((1L, "seen before with plenty of words to pass the gate"))
      .toDF("doc_id", "text")
    val bf = Incremental.buildBloom(snapshot, "text", expectedItems = 100L)
    val idx = Incremental.snapshotIndex(snapshot, "text")

    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-stream").toString
    val lines = Seq(
      """{"doc_id": 10, "text": "seen before with plenty of words to pass the gate"}""",
      """{"doc_id": 11, "text": "too short"}""",
      """{"doc_id": 12, "text": "a genuinely new document with enough words to pass"}""",
      """{"doc_id": 13, "text": "corrupt line""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/shard-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    val stream = graft.ingest.JsonlCorpus.readStream(spark, dir)
      .filter(col(graft.ingest.JsonlCorpus.CorruptCol).isNull)
      .drop(graft.ingest.JsonlCorpus.CorruptCol)
      .filter(TextFunctions.tokenCount(col("text")) >= 5)
    val curated = Incremental.checkBatch(stream, idx, bf, "doc_id", "text")
      .filter(col("is_new"))
    val got = EventsStream.runToMemory(curated, "jsonl_curated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 10 = snapshot dup, 11 = quality-gated, 13 = corrupt → only 12 lands
    assert(got === Set(12L))
  }

  test("stateful sessionization closes sessions at the inactivity gap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    // two users; user 1 has two bursts separated by > gap, user 2 one burst
    val nanos = (ms: Long) => ms * 1000000L
    Seq(
      (1L, nanos(0L), 1L, "click", 1.0, "{}"),
      (2L, nanos(60000L), 1L, "click", 1.0, "{}"),
      (3L, nanos(10000000L), 1L, "click", 1.0, "{}"), // new session
      (4L, nanos(30000L), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/batch0")
    val stream = EventsStream.readEvents(spark, s"$dir/batch0")
    val out = EventsStream.runToMemory(
      EventsStream.sessionize(stream, gapMs = 30 * 60 * 1000).toDF(), "sessions")
      .collect()
    // user 1: one closed session (2 events) + one open (1 event); user 2: open (1)
    val closed = out.filter(_.getAs[Boolean]("closed"))
    val open = out.filter(!_.getAs[Boolean]("closed"))
    assert(closed.length === 1)
    assert(closed.head.getAs[Long]("userId") === 1L)
    assert(closed.head.getAs[Int]("nEvents") === 2)
    assert(open.map(r => r.getAs[Long]("userId")).toSet === Set(1L, 2L))
  }

  test("streaming KMV sketch converges to the batch sketch across batches") {
    val k = 32
    val dir = stageEventsDir()
    val stream = EventsStream.kmvSketchStream(
      EventsStream.readEvents(spark, dir), "event_type", "user_id", k).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("kmv_stream").start()
    try {
      q.processAllAvailable()
      // a second batch re-delivers the same file: the mergeable state
      // must absorb it (same distinct users → same sketch)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    // fold every emitted update per key — merging intermediate sketches
    // is idempotent, so the fold equals the final state
    val got = spark.table("kmv_stream").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (key, rows) =>
        key -> rows.flatMap(r => r.getSeq[Long](r.fieldIndex("kmv")))
          .distinct.sorted.take(k).toSeq
      }
    val batch = graft.operators.KmvSketch.sketch(
        graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events"),
        Seq("event_type"), "user_id", k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("streaming CMS sketch final state equals the batch sketch of all batches") {
    val (d, w) = (4, 64)
    val dir = stageEventsDir()
    val stream = EventsStream.cmsSketchStream(
      EventsStream.readEvents(spark, dir), "event_type", "user_id", d, w).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("cms_stream").start()
    try {
      q.processAllAvailable()
      // a second batch re-delivers the same file: cell-wise addition
      // must absorb it — every count doubles, exactly as the batch
      // sketch over the doubled corpus would
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    // final state per key = the LAST emitted update (update mode emits
    // one row per key per batch; batch id orders them, so fold by
    // taking the row with the largest total — counts only ever grow)
    val got = spark.table("cms_stream").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (key, rows) =>
        key -> rows.map(_.getSeq[Long](1).toArray).maxBy(_.sum).toSeq
      }
    // batch twin: grouped sketch over BOTH deliveries (the union), as a
    // dense d×w array per key for cell-for-cell comparison
    val ev = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val both = ev.union(ev)
    val sk = graft.operators.CmsSketch.sketch(both, "user_id", d, w,
      groupCols = Seq("event_type"))
    val batch = sk.cells.collect()
      .groupBy(_.getString(0))
      .map { case (key, rows) =>
        val dense = new Array[Long](d * w)
        rows.foreach(r => dense(r.getInt(1) * w + r.getInt(2)) = r.getLong(3))
        key -> dense.toSeq
      }
    assert(got.nonEmpty && got === batch)
  }

  test("streaming AMS counters final state equals the batch sketch of all batches") {
    val d = 9
    val dir = stageEventsDir()
    val stream = EventsStream.amsSketchStream(
      EventsStream.readEvents(spark, dir), "event_type", "user_id", d).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("ams_stream").start()
    try {
      q.processAllAvailable()
      // re-deliver the same file: signed counters add linearly — every
      // z doubles, exactly as the batch sketch over the doubled corpus
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    // final state per key = the update with the largest n (z itself
    // moves both ways, so the monotone companion picks the batch order)
    val got = spark.table("ams_stream").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (key, rows) =>
        key -> rows.maxBy(_.getAs[Long]("n")).getSeq[Long](1).toSeq
      }
    val ev = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val sk = graft.operators.AmsSketch.sketch(ev.union(ev), "user_id", d,
      groupCols = Seq("event_type"))
    val batch = sk.cells.collect()
      .groupBy(_.getString(0))
      .map { case (key, rows) =>
        val dense = new Array[Long](d)
        rows.foreach(r => dense(r.getInt(1)) = r.getLong(2))
        key -> dense.toSeq
      }
    assert(got.nonEmpty && got === batch)
  }

  test("streaming dyadic quantile sketch final state equals the batch sketch") {
    val (levels, d, w) = (10, 2, 32)
    val dir = stageEventsDir()
    val in = EventsStream.readEvents(spark, dir)
      .select(col("event_type"), floor(col("value")).cast("long").as("v"))
    val stream = EventsStream.dqSketchStream(
      in, "event_type", "v", levels, d, w).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("dq_stream").start()
    try {
      q.processAllAvailable()
      // re-delivery: cell-wise addition must absorb the doubled corpus
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dq_stream").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (key, rows) =>
        key -> rows.map(_.getSeq[Long](1).toArray).maxBy(_.sum).toSeq
      }
    val ev = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), floor(col("value")).cast("long").as("v"))
    val sk = graft.operators.QuantileSketch.sketch(
      ev.union(ev), "v", levels, d, w, groupCols = Seq("event_type"))
    val batch = sk.cells.collect()
      .groupBy(_.getString(0))
      .map { case (key, rows) =>
        val dense = new Array[Long](levels * d * w)
        rows.foreach(r => dense(
          (r.getInt(1) * d + r.getInt(2)) * w + r.getInt(3)) = r.getLong(4))
        key -> dense.toSeq
      }
    assert(got.nonEmpty && got === batch)
  }

  test("streaming Misra-Gries with enough counters is exact across a re-delivered batch") {
    // events has 15 distinct users per type — counters = 16 means no
    // decrement can ever run, so the stream state must equal the exact
    // doubled counts and evicted = false must certify it
    val dir = stageEventsDir()
    val stream = EventsStream.mgHeavyHittersStream(
      EventsStream.readEvents(spark, dir), "event_type", "user_id", 16).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("mg_stream").start()
    try {
      q.processAllAvailable()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    // final state per key = the emission with the largest nTotal (MG
    // totals can shrink on a decrement; nTotal is monotone)
    val fin = spark.table("mg_stream").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (key, rows) =>
        val r = rows.maxBy(_.getAs[Long]("nTotal"))
        key -> ((r.getSeq[String](r.fieldIndex("items"))
            .zip(r.getSeq[Long](r.fieldIndex("counts"))).toMap,
          r.getAs[Boolean]("evicted")))
      }
    val ev = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val exact = ev.union(ev)
      .groupBy(col("event_type").cast("string").as("k"),
        col("user_id").cast("string").as("v"))
      .agg(count(lit(1)).as("c"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
    assert(fin.keySet === exact.keySet)
    fin.foreach { case (key, (cand, evicted)) =>
      assert(!evicted, s"$key must not evict with counters > domain")
      assert(cand === exact(key))
    }
  }

  test("streaming Misra-Gries under eviction keeps every item above the guarantee bound") {
    // skewed stream: key "hot" has one dominant item among a wide tail,
    // counters = 4 forces decrements; batch 2 re-delivers batch 1, so
    // the truth is the doubled counts. MG guarantees: (a) any item with
    // true count > nTotal/(counters+1) survives, (b) counts understate
    // by at most that bound, (c) ≤ counters slots, (d) evicted = true
    // is reported.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val batch1 = (1 to 60).map(_ => ("hot", "dom")) ++
      (1 to 40).map(i => ("hot", s"tail$i")) ++
      (1 to 30).map(i => ("flat", s"u${i % 10}"))
    val stream = EventsStream.mgHeavyHittersStream(
      mem.toDF().toDF("k", "v"), "k", "v", counters = 4).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("mg_skew").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch1: _*) // re-delivery: truth doubles
      q.processAllAvailable()
    } finally q.stop()
    val fin = spark.table("mg_skew").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (key, rows) =>
        val r = rows.maxBy(_.getAs[Long]("nTotal"))
        key -> ((r.getSeq[String](r.fieldIndex("items"))
            .zip(r.getSeq[Long](r.fieldIndex("counts"))).toMap,
          r.getAs[Boolean]("evicted"), r.getAs[Long]("nTotal")))
      }
    val truth = (batch1 ++ batch1).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    Seq("hot", "flat").foreach { key =>
      val (cand, evicted, n) = fin(key)
      val keyTruth = truth.collect { case ((k, v), c) if k == key => v -> c }
      assert(n === keyTruth.values.sum)
      assert(evicted, s"$key saw > 4 distinct items — a decrement must run")
      assert(cand.size <= 4)
      val bound = n / 5
      keyTruth.filter(_._2 > bound).foreach { case (v, c) =>
        assert(cand.contains(v), s"$key/$v (count $c > bound $bound) missing")
        assert(cand(v) <= c && c - cand(v) <= bound,
          s"$key/$v count ${cand(v)} outside [${c - bound}, $c]")
      }
      cand.foreach { case (v, c) =>
        val t = keyTruth.getOrElse(v, 0L)
        assert(c <= t && t - c <= bound)
      }
    }
    // the dominant item specifically: 120 > 260/5 = 52 — must survive
    assert(fin("hot")._1.contains("dom"))
  }

  test("streaming HLL registers: re-delivery is a no-op, state equals batch") {
    val p = 6
    val m = 1 << p
    val dir = stageEventsDir()
    val stream = EventsStream.hllSketchStream(
      EventsStream.readEvents(spark, dir), "event_type", "user_id", p).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("hll_stream").start()
    try {
      q.processAllAvailable()
      // re-delivery: register-wise max is IDEMPOTENT — unlike the
      // additive sketches, the doubled corpus must not move a register
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("hll_stream").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (key, rows) =>
        // registers only grow; elementwise max folds the updates
        key -> rows.map(_.getSeq[Int](1)).reduce(
          (a, b) => a.zip(b).map(t => math.max(t._1, t._2))).toSeq
      }
    val batch = graft.operators.HllSketch.sketch(
        graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events"),
        "user_id", p, groupCols = Seq("event_type"))
      .registers.collect()
      .groupBy(_.getString(0))
      .map { case (key, rows) =>
        val dense = new Array[Int](m)
        rows.foreach(r => dense(r.getLong(1).toInt) = r.getInt(2))
        key -> dense.toSeq
      }
    assert(got.nonEmpty && got === batch)
  }

  test("streaming moments: re-delivered batch doubles the sums exactly") {
    val dir = stageEventsDir()
    val in = EventsStream.readEvents(spark, dir)
      .select(col("event_type"), floor(col("value")).cast("long").as("v"))
    val stream = EventsStream.momentsStream(in, "event_type", "v").toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("mom_stream").start()
    try {
      q.processAllAvailable()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    // final state per key: sums only grow — take the max-n update
    val got = spark.table("mom_stream").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (key, rows) =>
        val last = rows.maxBy(_.getAs[Long]("n"))
        key -> (last.getAs[Long]("n"), last.getAs[Long]("s1"),
          last.getAs[Long]("s2"), last.getAs[Long]("s3"),
          last.getAs[Long]("s4"))
      }
    val ev = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), floor(col("value")).cast("long").as("v"))
    val batch = graft.operators.Moments
      .summarize(ev.union(ev), "v", Seq("event_type"))
      .sums.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.nonEmpty && got === batch)
  }

  test("streaming rolling-PSI counts replay into the batch rollingPsi row-for-row") {
    val dir = stageEventsDir()
    val stream = EventsStream.psiDailyCountsStream(
      EventsStream.readEvents(spark, dir), "ts", "value",
      nBuckets = 10, lo = 0.0, hi = 500.0).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("psi_daily").start()
    try {
      q.processAllAvailable()
      // a second batch with MORE of the same days: counts accumulate
      // across the batch boundary, not reset
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    // latest snapshot per day = the emission with the largest total
    val latest = spark.table("psi_daily").collect()
      .groupBy(_.getAs[String]("day"))
      .map { case (d, rows) =>
        d -> rows.maxBy(_.getAs[Long]("total")).getSeq[Long](1) }
    val dailyDf = latest.toSeq.flatMap { case (d, counts) =>
      counts.zipWithIndex.collect { case (n, b) if n > 0 => (d, b, n) }
    }.toDF("d", "bucket", "n")
      .select(to_date(col("d")).as("day"), col("bucket"), col("n"))
    val ev = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val doubled = ev.unionByName(ev) // the stream saw the file twice
    val ref = ev.filter(col("event_type") === "purchase")
      .select(col("value").as("v"))
    val got = graft.operators.Drift.rollingPsiFromDailyCounts(
        dailyDf, ref, "v", nBuckets = 10, lo = 0.0, hi = 500.0,
        windowDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    val batch = graft.operators.Drift.rollingPsi(
        doubled.select(col("ts"), col("value").as("v")), "ts", "v", ref,
        nBuckets = 10, lo = 0.0, hi = 500.0, windowDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("rolling-PSI stream: dedupEvents upstream makes re-delivery a no-op") {
    val dir = stageEventsDir()
    val stream = EventsStream.psiDailyCountsStream(
      EventsStream.dedupEvents(
        EventsStream.readEvents(spark, dir), watermark = "10 days"),
      "ts", "value", nBuckets = 10, lo = 0.0, hi = 500.0).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("psi_daily_dedup").start()
    try {
      q.processAllAvailable()
      // re-deliver the SAME events (same event_ids): the dedup absorbs
      // them — counting state must not move
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table("psi_daily_dedup").collect()
      .groupBy(_.getAs[String]("day"))
      .map { case (d, rows) =>
        d -> rows.maxBy(_.getAs[Long]("total")).getSeq[Long](1).toSeq }
    val batchCounts = graft.core.Tables
      .table(spark, "/root/testdata/sf0.001", "events")
      .filter(col("value").isNotNull)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        least(greatest(floor((col("value") - 0.0) / 50.0), lit(0.0)),
          lit(9.0)).cast("int").as("bucket"))
      .groupBy("day", "bucket").count()
      .collect()
      .groupBy(_.getString(0))
      .map { case (d, rows) =>
        val dense = new Array[Long](10)
        rows.foreach(r => dense(r.getInt(1)) = r.getLong(2))
        d -> dense.toSeq
      }
    assert(latest === batchCounts)
  }

  test("categorical PSI stream counts replay into the batch rollingPsiCat row-for-row") {
    val dir = stageEventsDir()
    val ev = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val ref = ev.filter(pmod(col("user_id"), lit(2L)) === 0 &&
      col("event_type") =!= "click")
    // the pinned set = the reference's categories, exactly what a
    // deployed monitor collects once at startup
    val cats = ref.select(col("event_type").cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    val stream = EventsStream.psiCatDailyCountsStream(
      EventsStream.readEvents(spark, dir), "ts", "event_type", cats).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("psi_cat_daily").start()
    try {
      q.processAllAvailable()
      // second batch: counts accumulate across the boundary
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    val slots = cats :+ "__other__"
    val latest = spark.table("psi_cat_daily").collect()
      .groupBy(_.getAs[String]("day"))
      .map { case (d, rows) =>
        d -> rows.maxBy(_.getAs[Long]("total")).getSeq[Long](1) }
    val dailyDf = latest.toSeq.flatMap { case (d, counts) =>
      counts.zipWithIndex.collect { case (n, i) if n > 0 =>
        (d, slots(i), n) }
    }.toDF("d", "category", "n")
      .select(to_date(col("d")).as("day"), col("category"), col("n"))
    val got = graft.operators.Drift.rollingPsiCatFromDailyCounts(
        dailyDf, ref, "event_type", windowDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSet
    val doubled = ev.unionByName(ev) // the stream saw the file twice
    val batch = graft.operators.Drift.rollingPsiCat(
        doubled, "ts", "event_type", ref, windowDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSet
    assert(got === batch)
    assert(got.nonEmpty)
    // 'click' rows landed in __other__ on both paths
    assert(got.exists(r => r._2 == "__other__" && r._4 > 0))
  }

  test("categorical PSI stream: stray-category assembly guard and caps abort") {
    val dir = stageEventsDir()
    intercept[IllegalArgumentException] {
      EventsStream.psiCatDailyCountsStream(
        EventsStream.readEvents(spark, dir), "ts", "event_type",
        (1 to 50).map(_.toString), maxCategories = 10)
    }
    intercept[IllegalArgumentException] {
      EventsStream.psiCatDailyCountsStream(
        EventsStream.readEvents(spark, dir), "ts", "event_type",
        Seq("a", "__other__"))
    }
    // a daily table carrying a category outside ref ∪ __other__ aborts
    // in-plan at the shared assembly
    val daily = Seq(("2024-01-01", "zzz", 3L)).toDF("d", "category", "n")
      .select(to_date(col("d")).as("day"), col("category"), col("n"))
    val ref = Seq("a", "b").toDF("c")
    val ex = intercept[Exception] {
      graft.operators.Drift.rollingPsiCatFromDailyCounts(
        daily, ref, "c", windowDays = 3).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("not in the reference set")))
  }

  test("rolling-PSI stream: the grid cap aborts at plan time") {
    val dir = stageEventsDir()
    val ex = intercept[IllegalArgumentException] {
      EventsStream.psiDailyCountsStream(
        EventsStream.readEvents(spark, dir), "ts", "value",
        nBuckets = 1000, lo = 0.0, hi = 500.0, maxBuckets = 100)
    }
    assert(ex.getMessage.contains("maxBuckets"))
  }

  test("streaming rolling-KS counts replay into the batch rollingKs row-for-row") {
    val dir = stageEventsDir()
    val stream = EventsStream.ksDailyCountsStream(
      EventsStream.readEvents(spark, dir)
        .withColumn("kv", floor(col("value")).cast("long")),
      "ts", "kv").toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("ks_daily").start()
    try {
      q.processAllAvailable()
      // a second batch with MORE of the same days: counts accumulate
      // across the batch boundary, not reset
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    // latest snapshot per day = the emission with the largest total
    val latest = spark.table("ks_daily").collect()
      .groupBy(_.getAs[String]("day"))
      .map { case (d, rows) =>
        val last = rows.maxBy(_.getAs[Long]("total"))
        d -> last.getSeq[Long](1).zip(last.getSeq[Long](2)) }
    val dailyDf = latest.toSeq.flatMap { case (d, vc) =>
      vc.map { case (v, n) => (d, v, n) }
    }.toDF("d", "v", "n")
      .select(to_date(col("d")).as("day"), col("v"), col("n"))
    val ev = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val doubled = ev.unionByName(ev) // the stream saw the file twice
    val ref = ev.filter(col("event_type") === "purchase")
      .select(floor(col("value")).cast("long").as("v"))
    val got = graft.operators.Drift.rollingKsFromDailyCounts(
        dailyDf, ref, "v", windowDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    val batch = graft.operators.Drift.rollingKs(
        doubled.select(col("ts"),
          floor(col("value")).cast("long").as("v")),
        "ts", "v", ref, windowDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("rolling-KS stream: dedupEvents makes re-delivery a no-op") {
    val dir = stageEventsDir()
    val stream = EventsStream.ksDailyCountsStream(
      EventsStream.dedupEvents(
          EventsStream.readEvents(spark, dir), watermark = "10 days")
        .withColumn("kv", floor(col("value")).cast("long")),
      "ts", "kv").toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("ks_daily_dedup").start()
    try {
      q.processAllAvailable()
      // re-deliver the SAME events (same event_ids): the dedup absorbs
      // them — counting state must not move
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-1.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table("ks_daily_dedup").collect()
      .groupBy(_.getAs[String]("day"))
      .map { case (d, rows) =>
        val last = rows.maxBy(_.getAs[Long]("total"))
        d -> last.getSeq[Long](1).zip(last.getSeq[Long](2)).toMap }
    val batchCounts = graft.core.Tables
      .table(spark, "/root/testdata/sf0.001", "events")
      .filter(col("value").isNotNull)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        floor(col("value")).cast("long").as("v"))
      .groupBy("day", "v").count()
      .collect()
      .groupBy(_.getString(0))
      .map { case (d, rows) =>
        d -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    assert(latest === batchCounts)
    assert(latest.nonEmpty)
  }

  test("rolling-KS stream: the support cap aborts the query") {
    val dir = stageEventsDir()
    val stream = EventsStream.ksDailyCountsStream(
      EventsStream.readEvents(spark, dir)
        .withColumn("kv", floor(col("value")).cast("long")),
      "ts", "kv", maxSupport = 2).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("ks_daily_cap").start()
    val ex = intercept[Exception] {
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("maxSupport")))
  }

  test("streaming CUSUM fold equals the batch closed-prefix form row-for-row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cusum").toString
    // a keyed daily series with a level shift halfway, split into two
    // time-ordered deliveries (days 1–15, then 16–30)
    def series(lo: Int, hi: Int) = (lo to hi).flatMap { t =>
      Seq(("a", t.toLong, if (t > 12) 30L else 10L),
          ("b", t.toLong, 10L))
    }.toDF("key", "t", "v")
    series(1, 15).coalesce(1).write.parquet(s"$dir/d0")
    val stream = EventsStream.cusumStream(
      spark.readStream.schema("key string, t long, v long")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/d*/"),
      "key", "t", "v", driftK = 10L, threshold = 25L).toDF()
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("cusum_stream").start()
    try {
      q.processAllAvailable()
      series(16, 30).coalesce(1).write.parquet(s"$dir/d1")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cusum_stream")
      .select("key", "t", "v", "cusumPos", "cusumNeg", "alarm")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5))).sortBy(x => (x._1, x._2))
      .toSeq
    val batch = graft.operators.Changepoint.cusum(
        series(1, 30), Seq("key"), Seq("t"), "v", 10L, 25L)
      .select(col("key"), col("t"), col("v"), col("cusum_pos"),
        col("cusum_neg"), col("alarm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5))).sortBy(x => (x._1, x._2))
      .toSeq
    assert(got === batch)
    // the shifted key alarms, the flat key never does
    assert(got.exists(r => r._1 == "a" && r._6 == 1))
    assert(got.filter(_._1 == "b").forall(_._6 == 0))
  }

  test("streaming transitions accumulate across batch boundaries exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-trans").toString
    // one user's path A B A | B B — the boundary pair (A, B) between
    // deliveries must be counted exactly once via the carried lag cell
    Seq(("u1", 1L, "A"), ("u1", 2L, "B"), ("u1", 3L, "A"))
      .toDF("key", "t", "st").coalesce(1).write.parquet(s"$dir/d0")
    val stream = EventsStream.transitionsStream(
      spark.readStream.schema("key string, t long, st string")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/d*/"),
      "key", "t", "st").toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("trans_stream").start()
    try {
      q.processAllAvailable()
      Seq(("u1", 4L, "B"), ("u1", 5L, "B"))
        .toDF("key", "t", "st").coalesce(1).write.parquet(s"$dir/d1")
      q.processAllAvailable()
    } finally q.stop()
    // update mode: latest count per (key, prev, next) is the total
    val got = spark.table("trans_stream").collect()
      .groupBy(r => (r.getString(0), r.getString(1), r.getString(2)))
      .map { case (k, rows) => k -> rows.map(_.getLong(3)).max }
    val batch = graft.operators.Transitions.transitionMatrix(
        Seq(("u1", 1L, "A"), ("u1", 2L, "B"), ("u1", 3L, "A"),
          ("u1", 4L, "B"), ("u1", 5L, "B")).toDF("key", "t", "st"),
        Seq("key"), Seq("t"), "st")
      .collect()
      .map(r => ("u1", r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === batch)
    assert(got(("u1", "A", "B")) === 2L) // one of them spans the boundary
  }

  test("streaming transitions abort past the state-vocabulary cap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-trans-cap").toString
    // 5 distinct states -> up to 4 observed pairs here; maxStates = 2
    // allows 4 pairs, the walk below creates 5 distinct ones
    Seq(("u", 1L, "a"), ("u", 2L, "b"), ("u", 3L, "c"), ("u", 4L, "d"),
        ("u", 5L, "e"), ("u", 6L, "a"))
      .toDF("key", "t", "st").coalesce(1).write.parquet(s"$dir/d0")
    val stream = EventsStream.transitionsStream(
      spark.readStream.schema("key string, t long, st string")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/d*/"),
      "key", "t", "st", maxStates = 2).toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("trans_cap").start()
    try {
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(ex).exists(m => m != null && m.contains("bounded vocabulary")))
    } finally q.stop()
  }

  test("streaming transitions reject state values containing NUL") {
    // a NUL inside a state value would collide two distinct (prev, next)
    // pairs in the NUL-packed map key — the contract rejects it loudly
    val dir = java.nio.file.Files.createTempDirectory("graft-trans-nul").toString
    Seq(("u", 1L, "a\u0000b"), ("u", 2L, "c")).toDF("key", "t", "st")
      .coalesce(1).write.parquet(s"$dir/d0")
    val stream = EventsStream.transitionsStream(
      spark.readStream.schema("key string, t long, st string")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/d*/"),
      "key", "t", "st").toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("trans_nul").start()
    try {
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(ex).exists(m => m != null && m.contains("NUL")))
    } finally q.stop()
  }

  test("streaming transitions abort on out-of-order delivery like CUSUM") {
    val dir = java.nio.file.Files.createTempDirectory("graft-trans-ooo").toString
    Seq(("u1", 5L, "A")).toDF("key", "t", "st")
      .coalesce(1).write.parquet(s"$dir/d0")
    val stream = EventsStream.transitionsStream(
      spark.readStream.schema("key string, t long, st string")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/d*/"),
      "key", "t", "st").toDF()
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("trans_ooo").start()
    try {
      q.processAllAvailable()
      Seq(("u1", 3L, "B")).toDF("key", "t", "st")
        .coalesce(1).write.parquet(s"$dir/d1")
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(ex).exists(m => m != null && m.contains("time-ordered")))
    } finally q.stop()
  }

  test("streaming CUSUM aborts on out-of-order delivery (fold, not merge)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cusum-ooo").toString
    Seq(("a", 5L, 10L)).toDF("key", "t", "v")
      .coalesce(1).write.parquet(s"$dir/d0")
    val stream = EventsStream.cusumStream(
      spark.readStream.schema("key string, t long, v long")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/d*/"),
      "key", "t", "v", driftK = 10L, threshold = 25L).toDF()
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("cusum_ooo").start()
    try {
      q.processAllAvailable()
      // a LATER batch replays an EARLIER order key — must abort loudly
      Seq(("a", 3L, 10L)).toDF("key", "t", "v")
        .coalesce(1).write.parquet(s"$dir/d1")
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(ex).exists(m => m != null && m.contains("time-ordered")))
    } finally q.stop()
  }
}
