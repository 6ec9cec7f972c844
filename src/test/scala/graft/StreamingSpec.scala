package graft

import graft.operators.Events
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming forms must agree with their batch twins when driven to
  * completion over the same finite input. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftTestSession.spark
  val dir = GraftTestSession.Sf0001

  test("testdata-encoding canary: streaming and batch reads agree on ts range") {
    // The driver has regenerated events.parquet with a DIFFERENT timestamp
    // encoding mid-build once already (TIMESTAMP(NANOS) -> TIMESTAMP(MICROS)
    // between rounds 6 and 7), which silently collapsed streaming event time
    // 1000x while the batch reader adapted. This canary turns that failure
    // mode into one named assertion: the streaming ingest and Tables.events
    // must decode the SAME min/max event time, at both test scales.
    Seq(GraftTestSession.Sf0001, GraftTestSession.Sf001).foreach { d =>
      val streamed = EventStreams.runToBatch(spark,
        EventStreams.readEvents(spark, d)
          .select(col("ts").cast(org.apache.spark.sql.types.TimestampType)),
        s"ts_canary_${EventStreams.sanitize(d)}")
        .agg(min("ts"), max("ts")).head()
      val batch = graft.Tables.events(spark, d)
        .select(col("ts").cast(org.apache.spark.sql.types.TimestampType))
        .agg(min("ts"), max("ts")).head()
      assert(streamed.getTimestamp(0) == batch.getTimestamp(0),
        s"$d: streaming min(ts) ${streamed.getTimestamp(0)} != batch ${batch.getTimestamp(0)} — ts encoding mis-scaled")
      assert(streamed.getTimestamp(1) == batch.getTimestamp(1),
        s"$d: streaming max(ts) ${streamed.getTimestamp(1)} != batch ${batch.getTimestamp(1)} — ts encoding mis-scaled")
      // and the decoded epoch must land in a plausible modern year, not 1970:
      // a unit error moves time by ~1000x, which no equality bug survives
      assert(batch.getTimestamp(1).toInstant.isAfter(
        java.time.Instant.parse("2000-01-01T00:00:00Z")),
        s"$d: batch max(ts) ${batch.getTimestamp(1)} decodes before 2000 — unit error")
    }
  }

  test("streaming hourly window equals batch hourly aggregate") {
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.hourlyWindowed(EventStreams.readEvents(spark, dir)),
      "hourly_test", OutputMode.Complete)
    val batch = Events.hourlyAgg(spark, dir)
    val sCount = streamed.agg(sum("n")).head().getLong(0)
    val bCount = batch.agg(sum("n")).head().getLong(0)
    assert(sCount == bCount)
    // spot-match a few (hour, type) cells
    val sMap = streamed.collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val bMap = batch.collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sMap == bMap)
  }

  test("q208: streaming exact quantiles equal the batch percentile " +
    "aggregate cell for cell") {
    val streamed = EventStreams.hourlyQuantileStreamQuery(spark, dir)
    val batch = Tables.events(spark, dir)
      .withColumn("ts", col("ts").cast(
        org.apache.spark.sql.types.TimestampType))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val (s, b) = (toMap(streamed), toMap(batch))
    assert(s == b)
    assert(s.nonEmpty)
    s.values.foreach { case (p50, p90, _) => assert(p50 <= p90) }
  }

  test("sliding windows produce ~4x tumbling cells") {
    val slid = EventStreams.runToBatch(spark,
      EventStreams.slidingWindowed(EventStreams.readEvents(spark, dir)),
      "sliding_test", OutputMode.Complete)
    val events = graft.Tables.events(spark, dir).count()
    // every event lands in exactly 4 overlapping windows
    assert(slid.agg(sum("n")).head().getLong(0) == events * 4)
  }

  test("staging key is injective: two distinct dirs stream in one JVM") {
    // a hashCode-keyed staging dir could collide and reuse stale data; the
    // sanitized-path key must give each source its own staging area
    assert(EventStreams.sanitize("/a/b") != EventStreams.sanitize("/a_b"))
    val n1 = EventStreams.hourlyStreamQuery(spark, GraftTestSession.Sf0001)
      .agg(sum("n")).head().getLong(0)
    val n2 = EventStreams.hourlyStreamQuery(spark, GraftTestSession.Sf001)
      .agg(sum("n")).head().getLong(0)
    assert(n1 == graft.Tables.events(spark, GraftTestSession.Sf0001).count())
    assert(n2 == graft.Tables.events(spark, GraftTestSession.Sf001).count())
    assert(n1 != n2)
  }

  test("hourly stream cost is engine-fixed: one data micro-batch at any sf") {
    // the q64 contract query processes its whole (finite, one-file) source
    // in a single data micro-batch at BOTH test scales — so its wall-clock
    // is dominated by per-RUN fixed overhead (query start, state-store
    // setup, batch planning), flat in row count. A multi-second swing
    // between identical runs (r3 bench: 2.57 s vs 0.75–1.12 s re-measured)
    // is therefore host scheduling, not a plan regression: there is no
    // per-row code path that could scale it.
    EventStreams.hourlyStreamQuery(spark, GraftTestSession.Sf0001)
    val small = EventStreams.lastRunDataBatches
    EventStreams.hourlyStreamQuery(spark, GraftTestSession.Sf001)
    val large = EventStreams.lastRunDataBatches
    assert(small >= 1 && small <= 2, s"sf0.001 ran $small data batches")
    assert(large == small,
      s"10x rows changed the batch count ($small -> $large): cost is not flat")
  }

  test("every streaming contract query processes its source in one data micro-batch") {
    // the q64 fixed-cost argument, extended to the whole streaming
    // surface: each contract query consumes its finite staged source in a
    // single data micro-batch at test scale, so any future multi-second
    // bench swing on q83/q89/q100/q106 is attributable to per-run fixed
    // overhead (or host scheduling) without re-measurement archaeology —
    // there is no per-row path that could scale it
    val drives: Seq[(String, () => Any)] = Seq(
      "q83_interval_join" ->
        (() => EventStreams.intervalJoinQuery(spark, GraftTestSession.Sf0001)),
      "q89_enrich" ->
        (() => EventStreams.enrichStreamQuery(spark, GraftTestSession.Sf0001)),
      "q100_anomalies" ->
        (() => EventStreams.anomalyStreamQuery(spark, GraftTestSession.Sf0001)),
      "q106_dedup" ->
        (() => EventStreams.dedupStreamQuery(spark, GraftTestSession.Sf0001)))
    drives.foreach { case (name, run) =>
      run()
      val batches = EventStreams.lastRunDataBatches
      assert(batches >= 1 && batches <= 2,
        s"$name ran $batches data micro-batches — cost is no longer flat")
    }
  }

  test("q146: native session_window stream emits exactly the batch sessions " +
    "finalized below the watermark frontier") {
    import org.apache.spark.sql.types.TimestampType
    val streamed = EventStreams.sessionWindowStreamQuery(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // ground truth: the batch session_window operator (q67 semantics)
    // filtered to sessions whose END the end-of-input watermark
    // (max ts − 10 min) has passed — INCLUSIVE boundary, pinned here so the
    // oracle's `end_ms <= wm` cannot drift from engine behavior unnoticed
    val batch = Events.sessionWindows(spark, dir)
    val wmMs = Tables.events(spark, dir)
      .agg(max(unix_millis(col("ts").cast(TimestampType)))).head().getLong(0) -
      10L * 60 * 1000
    val expected = batch.filter(col("end_ms") <= wmMs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed == expected)
    assert(streamed.nonEmpty)
    // the frontier is REAL: at least one session was withheld
    assert(batch.filter(col("end_ms") > wmMs).count() > 0,
      "fixture has no in-horizon tail — frontier untested")
  }

  test("q152: sliding stream panes equal the batch sliding windows, 4 panes " +
    "per event") {
    val streamed = EventStreams.slidingStreamQuery(spark, dir)
    val total = graft.Tables.events(spark, dir).count()
    assert(streamed.agg(sum("n")).head().getLong(0) == total * 4)
    val batch = EventStreams.runToBatch(spark,
      EventStreams.slidingWindowed(EventStreams.readEvents(spark, dir)),
      "sliding_batch_twin", org.apache.spark.sql.streaming.OutputMode.Complete)
      .select(unix_millis(col("win_start")).as("win_start_ms"),
        col("event_type"), col("n"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q153: stream PIT enrich picks exactly the signup version in effect " +
    "at each purchase") {
    import org.apache.spark.sql.types.TimestampType
    val got = EventStreams.pitEnrichStreamQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    assert(got.map(_._1).distinct.length == got.length) // ≤1 version/purchase
    // ground truth from a driver-side fold over the raw log
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts").cast(TimestampType)).as("ts_ms"),
        round(col("value") * 100).cast("long").as("v_c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val signups = ev.filter(_._3 == "signup").groupBy(_._2)
      .view.mapValues(_.sortBy(e => (e._4, e._1))).toMap
    val expected = ev.filter(_._3 == "purchase").flatMap {
      case (eid, uid, _, ts, _) =>
        signups.get(uid).toSeq.flatMap { hist =>
          val idx = hist.lastIndexWhere(_._4 <= ts)
          if (idx < 0) Nil
          else Seq((eid, uid, ts, (idx + 1).toLong, hist(idx)._5))
        }
    }.toSet
    assert(got.toSet == expected)
    // purchases before any signup really are excluded (frontier is real)
    val excluded = ev.count(e => e._3 == "purchase" &&
      !expected.exists(_._1 == e._1))
    assert(excluded > 0, "fixture has no pre-signup purchases — edge untested")
  }

  test("q156: CDC apply is associative — a multi-batch run converges to the " +
    "single-batch table") {
    import java.nio.file.{Files, Paths}
    import graft.streaming.CdcApply
    // split the feed into 3 files and force one micro-batch per file, so
    // the foreachBatch merge path (state ⋈ batch) really executes
    val orders = Tables.orders(spark, dir)
    val feed = Files.createTempDirectory("graft_cdc_feed")
    (0 until 3).foreach { i =>
      orders.filter(pmod(col("o_orderkey"), lit(3)) === i)
        .coalesce(1).write.mode("overwrite")
        .parquet(feed.resolve(s"part_$i").toString)
    }
    val flat = Files.createTempDirectory("graft_cdc_feed_flat")
    (0 until 3).foreach { i =>
      val src = Files.list(feed.resolve(s"part_$i")).iterator()
      var n = 0
      while (src.hasNext) {
        val f = src.next()
        if (f.toString.endsWith(".parquet")) {
          Files.copy(f, flat.resolve(s"chunk_${i}_$n.parquet")); n += 1
        }
      }
    }
    val multi = CdcApply.applyFeed(spark, flat.toString, "spec_multi",
      maxFilesPerTrigger = Some(1))
    val single = CdcApply.cdcApplyStreamQuery(spark, dir)
    assert(multi.count() == single.count())
    assert(multi.exceptAll(single).isEmpty && single.exceptAll(multi).isEmpty)
    // the multi-batch run really ran more than one data batch: the split
    // files are distinct, so at least 2 merges against existing state ran
    assert(Files.list(flat).iterator().hasNext)
  }

  test("watermark really drops too-late data: a file of stale events " +
    "arriving after the watermark advanced adds nothing") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.types.TimestampType
    // split the log at day 5: the bulk (late half of the month) arrives
    // first and advances the watermark far past the early days; the stale
    // early-days file arrives in a LATER micro-batch, entirely beyond the
    // 2-hour watermark, and Append-mode hourly aggregation must drop it
    val ev = Tables.events(spark, dir)
      .withColumn("ts", col("ts").cast(TimestampType))
    val cut = java.sql.Timestamp.from( // UTC instant, host-tz-proof
      java.time.Instant.parse("2024-01-05T00:00:00Z"))
    val feed = Files.createTempDirectory("graft_late_feed")
    val bulkDir = Files.createTempDirectory("graft_late_bulk")
    ev.filter(col("ts") >= cut).coalesce(1)
      .write.mode("overwrite").parquet(bulkDir.toString)
    val bulk = Files.list(bulkDir).iterator()
    var staged: java.nio.file.Path = null
    while (bulk.hasNext) {
      val f = bulk.next()
      if (f.toString.endsWith(".parquet"))
        staged = Files.copy(f, feed.resolve("a_bulk.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
    }
    val streamed = EventStreams.streamEvents(spark, feed.toString)
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
    val q = streamed.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("late_drop_test").start()
    try {
      q.processAllAvailable() // batch 1: bulk → watermark = max(ts) − 2 h
      // now the stale early-days slice lands as a new file
      val staleDir = Files.createTempDirectory("graft_late_stale")
      ev.filter(col("ts") < cut).coalesce(1)
        .write.mode("overwrite").parquet(staleDir.toString)
      val st = Files.list(staleDir).iterator()
      while (st.hasNext) {
        val f = st.next()
        if (f.toString.endsWith(".parquet"))
          Files.copy(f, feed.resolve("b_stale.parquet"),
            StandardCopyOption.REPLACE_EXISTING)
      }
      q.processAllAvailable() // batch 2: every row is beyond the watermark
    } finally q.stop()
    val emitted = spark.table("late_drop_test")
    // nothing from before the cut was emitted: the stale batch was dropped
    assert(emitted.filter(col("hour") < cut).count() == 0,
      "late rows leaked past the watermark")
    // and the emitted on-time hours match the batch aggregate of the bulk
    val batchBulk = ev.filter(col("ts") >= cut)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
    // Append emits only watermark-closed windows; every emitted cell must
    // agree exactly with the batch cell
    val got = emitted.collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = batchBulk.collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    got.foreach { case (k, n) => assert(want.get(k).contains(n),
      s"cell $k: streamed $n vs batch ${want.get(k)}") }
  }

  test("q173: streamed HLL hourly distinct equals the batch sketch and " +
    "stays inside the certified bound") {
    import org.apache.spark.sql.types.TimestampType
    val got = EventStreams.hourlyDistinctStreamQuery(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.nonEmpty)
    // HLL register-max merge is order-independent: the streamed estimate
    // must equal the batch estimate bit-for-bit
    val batch = Tables.events(spark, dir)
      .select(unix_millis(date_trunc("hour", col("ts").cast(TimestampType)))
        .as("h"), col("user_id"))
      .groupBy("h").agg(approx_count_distinct(col("user_id")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == batch.keySet)
    got.foreach { case (h, (est, ok)) =>
      assert(est == batch(h), s"hour $h: streamed $est vs batch ${batch(h)}")
      assert(ok, s"hour $h estimate out of the 5% bound")
    }
  }

  test("stateful session counts: totals match event counts per user") {
    val sessions = EventStreams.runToBatch(spark,
      EventStreams.sessionCounts(spark,
        EventStreams.readEvents(spark, dir)).toDF(),
      "sessions_test", OutputMode.Update)
    // in Update mode the memory sink may hold several updates per user; the
    // final state per user is the row with the max n_events
    val finalPerUser = sessions.groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("n_sessions").as("n_sessions"))
    val expected = graft.Tables.events(spark, dir)
      .groupBy("user_id").count()
    val f = finalPerUser.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = expected.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f == e)
    // session counts from the stateful op match the batch sessionizer
    val batchSessions = Events.sessionize(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamSessions = finalPerUser.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(streamSessions == batchSessions)
  }

  test("streaming dedup drops redelivered events within the watermark") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // stage the SAME events file twice = every event delivered twice
    val src = Paths.get(s"$dir/events.parquet")
    val staged = Files.createTempDirectory("graft_dupstream")
    Files.copy(src, staged.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, staged.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val doubled = EventStreams.streamEvents(spark, staged.toString)
    val n = graft.Tables.events(spark, dir).count()
    val raw = EventStreams.runToBatch(spark,
      doubled.select("event_id"), "dup_raw_test")
    assert(raw.count() == 2 * n) // both deliveries arrive without dedup
    val deduped = EventStreams.runToBatch(spark,
      EventStreams.dedupStream(doubled).select("event_id"), "dedup_test")
    assert(deduped.count() == n)
    assert(deduped.distinct().count() == n)
  }

  test("session emitter: every emitted session is a real closed session") {
    val gapMs = 30L * 60 * 1000
    val emitted = EventStreams.runToBatch(spark,
      EventStreams.sessionEmitter(spark,
        EventStreams.readEvents(spark, dir)).toDF(),
      "session_emitter_test", OutputMode.Append)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(emitted.nonEmpty) // watermark passed at least some timeouts
    assert(emitted.distinct.length == emitted.length) // exactly-once emission
    // ground truth: fold the full event log per user with the same strict
    // >30min gap rule the batch sessionizer uses
    val expected = graft.Tables.events(spark, dir)
      .select(col("user_id"),
        unix_millis(col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .as("ts_ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).flatMap { case (uid, rows) =>
        val ts = rows.map(_._2).sorted
        val sessions = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long)]
        var (start, last, n) = (ts.head, ts.head, 1L)
        ts.tail.foreach { t =>
          if (t - last > gapMs) {
            sessions += ((uid, start, last, n)); start = t; last = t; n = 1
          } else { last = t; n += 1 }
        }
        sessions += ((uid, start, last, n)) // trailing (possibly unemitted)
        sessions
      }.toSet
    emitted.foreach(s => assert(expected.contains(s), s"phantom session $s"))
  }

  test("streaming anomaly gate flags the identical event set as batch") {
    val streamed = EventStreams.anomalyStreamQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Events.anomalies(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-static enrichment join == batch join+agg") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.enrichStreamQuery(spark, dir)
    val batch = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("c_mktsegment").as("mktsegment"), col("n"), col("value_cents"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream interval join == batch join on the same predicate") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.intervalJoinQuery(spark, dir)
    def side(tpe: String, p: String) = Tables.events(spark, dir)
      .filter(col("event_type") === tpe)
      .select(col("user_id").as(s"${p}_user"),
        col("ts").cast(org.apache.spark.sql.types.TimestampType).as(s"${p}_ts"),
        col("event_id").as(s"${p}_id"))
    val batch = side("click", "c").join(side("error", "e"),
      col("c_user") === col("e_user") &&
        col("e_ts") >= col("c_ts") &&
        col("e_ts") <= col("c_ts") + expr("interval 60 minutes"))
      .select(col("c_user").as("user_id"), col("c_id").as("click_id"),
        col("e_id").as("error_id"),
        (unix_millis(col("e_ts")) - unix_millis(col("c_ts"))).as("delay_ms"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q137: left-outer interval join = inner rows + null padding exactly " +
    "for watermark-finalized unmatched clicks") {
    import org.apache.spark.sql.types.TimestampType
    val outerQ = EventStreams.intervalJoinLeftOuterQuery(spark, dir)
    val inner = EventStreams.intervalJoinQuery(spark, dir)
    // the matched part is EXACTLY the inner join
    val matched = outerQ.filter(col("error_id").isNotNull)
    assert(matched.exceptAll(inner).isEmpty && inner.exceptAll(matched).isEmpty)
    // every outer row is null-padded in BOTH padded columns at once
    assert(outerQ.filter(col("error_id").isNull =!= col("delay_ms").isNull)
      .count() == 0)
    // the outer set: unmatched clicks strictly below the end-of-input
    // watermark frontier wm = min(max c_ts, max e_ts) - 1h; above it the
    // row must stay in state (NOT emitted)
    def side(tpe: String) = Tables.events(spark, dir)
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id"),
        col("ts").cast(TimestampType).as("ts"))
    val clicks = side("click"); val errors = side("error")
    val wmMs = math.min(
      clicks.agg(max(unix_millis(col("ts")))).head().getLong(0),
      errors.agg(max(unix_millis(col("ts")))).head().getLong(0)) - 3600000L
    val unmatched = clicks.join(
      errors.toDF("e_user", "e_id", "e_ts"),
      col("user_id") === col("e_user") &&
        col("e_ts") >= col("ts") &&
        col("e_ts") <= col("ts") + expr("interval 60 minutes"), "left_anti")
    val expectedOuter = unmatched
      .filter(unix_millis(col("ts")) + 3600000L < wmMs)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    val gotOuter = outerQ.filter(col("error_id").isNull)
      .select(col("click_id")).collect().map(_.getLong(0)).toSet
    assert(gotOuter == expectedOuter)
    // and the frontier is REAL: some unmatched click above it was withheld
    val withheld = unmatched
      .filter(unix_millis(col("ts")) + 3600000L >= wmMs).count()
    assert(withheld > 0, "fixture has no in-state tail — frontier untested")
  }

  test("q286: full-outer interval join = inner rows + both padded sets " +
    "exactly at their own eviction frontiers, tails withheld on both sides") {
    import org.apache.spark.sql.types.TimestampType
    val fullQ = EventStreams.intervalJoinFullOuterQuery(spark, dir)
    val inner = EventStreams.intervalJoinQuery(spark, dir)
    // the matched part is EXACTLY the inner join
    val matched = fullQ.filter(col("click_id").isNotNull &&
      col("error_id").isNotNull)
    assert(matched.exceptAll(inner).isEmpty && inner.exceptAll(matched).isEmpty)
    // padding is all-or-nothing per side, and delay is null iff padded
    assert(fullQ.filter(col("click_id").isNull && col("error_id").isNull)
      .count() == 0)
    assert(fullQ.filter((col("click_id").isNull || col("error_id").isNull) =!=
      col("delay_ms").isNull).count() == 0)
    def side(tpe: String) = Tables.events(spark, dir)
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id"),
        col("ts").cast(TimestampType).as("ts"))
    val clicks = side("click"); val errors = side("error")
    val wmMs = math.min(
      clicks.agg(max(unix_millis(col("ts")))).head().getLong(0),
      errors.agg(max(unix_millis(col("ts")))).head().getLong(0)) - 3600000L
    // LEFT frontier: an unmatched click pads once wm > c_ts + 60min
    val unmatchedC = clicks.join(
      errors.toDF("e_user", "e_id", "e_ts"),
      col("user_id") === col("e_user") &&
        col("e_ts") >= col("ts") &&
        col("e_ts") <= col("ts") + expr("interval 60 minutes"), "left_anti")
    val expectedLeft = unmatchedC
      .filter(unix_millis(col("ts")) + 3600000L < wmMs)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    val gotLeft = fullQ.filter(col("error_id").isNull)
      .select(col("click_id")).collect().map(_.getLong(0)).toSet
    assert(gotLeft == expectedLeft)
    // RIGHT frontier: the join needs c_ts <= e_ts, so an unmatched error
    // pads once wm > e_ts — strictly tighter than the left's
    val unmatchedE = errors.join(
      clicks.toDF("c_user", "c_id", "c_ts"),
      col("user_id") === col("c_user") &&
        col("ts") >= col("c_ts") &&
        col("ts") <= col("c_ts") + expr("interval 60 minutes"), "left_anti")
    val expectedRight = unmatchedE
      .filter(unix_millis(col("ts")) < wmMs)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    val gotRight = fullQ.filter(col("click_id").isNull)
      .select(col("error_id")).collect().map(_.getLong(0)).toSet
    assert(gotRight == expectedRight)
    // both frontiers are REAL: each side has an in-state withheld tail
    assert(unmatchedC.filter(unix_millis(col("ts")) + 3600000L >= wmMs)
      .count() > 0, "no withheld click tail — left frontier untested")
    assert(unmatchedE.filter(unix_millis(col("ts")) >= wmMs)
      .count() > 0, "no withheld error tail — right frontier untested")
  }

  test("q152 stateful plan shape: one windowed-aggregate state operator " +
    "on the pinned partition count") {
    // the memory-sink result's executedPlan is just a sink scan — the
    // stateful shape is pinned through the progress events instead (the
    // streaming twin of a PlanAudit entry). One stateStoreSave = ONE
    // stateful aggregate: a second state operator would mean the sliding
    // expansion regressed to a chained stateful plan (double state, double
    // checkpoint traffic at scale).
    EventStreams.slidingStreamQuery(spark, dir)
    val ops = EventStreams.lastRunStateOperators
    assert(ops.map(_._1) == Seq("stateStoreSave"),
      s"unexpected state operators: $ops")
    // state partitioning fixed at first checkpoint — must be the 4 the
    // query pins (round-8 measurement: 4 beats both 8 and 2 on the
    // local harness), not the session shuffle default
    assert(ops.head._2 == 4L, s"state partitions: $ops")
    // and the interval join really carries join state, for contrast
    EventStreams.intervalJoinQuery(spark, dir)
    val joinOps = EventStreams.lastRunStateOperators
    assert(joinOps.map(_._1) == Seq("symmetricHashJoin"),
      s"unexpected state operators: $joinOps")
  }

  test("q64 under the on-heap state store equals the RocksDB default " +
    "(the 100 TB state story is a config, not a plan, change)") {
    // default: RocksDB (round-14 verdict item 7 — the off-heap +
    // spill-to-disk provider a production deployment needs once
    // stream-stream join / session state outgrows executor heap is now
    // what every contract/bench lane runs on)
    val base = EventStreams.hourlyStreamQuery(spark, dir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(EventStreams.lastRunProvider.contains("RocksDBStateStoreProvider"),
      s"RocksDB must be the default: ${EventStreams.lastRunProvider}")
    // flagged OFF: same query, state on the executor heap (Spark's own
    // default store — kept as the test-scale variant)
    spark.conf.set(EventStreams.RocksDbFlag, "false")
    try {
      val heap = EventStreams.hourlyStreamQuery(spark, dir).collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(EventStreams.lastRunProvider.contains("HDFSBackedStateStoreProvider"),
        s"flag did not reach the query: ${EventStreams.lastRunProvider}")
      assert(heap == base)
    } finally spark.conf.unset(EventStreams.RocksDbFlag)
    // and the flag restores cleanly: next run is back on the default
    EventStreams.hourlyStreamQuery(spark, dir)
    assert(EventStreams.lastRunProvider.contains("RocksDBStateStoreProvider"))
  }

  test("q219: streaming media decode equals the batch audio-energy result") {
    import graft.multimodal.MediaAnalysis
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val streamed = keyed(MediaAnalysis.audioEnergyStream(spark, dir).collect())
    val batch = keyed(MediaAnalysis.audioEnergy(spark, dir).collect())
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "per-micro-batch decode + stateful argmax must equal the batch plan")
    // the decode ran through the streaming engine's stateful aggregate,
    // not a batch fallback
    assert(EventStreams.lastRunStateOperators.map(_._1)
      .contains("stateStoreSave"),
      s"unexpected state operators: ${EventStreams.lastRunStateOperators}")
  }

  test("q292 streaming near-dup gate: verdicts equal an in-JVM replay of " +
    "the banded gate; planted near-dups are flagged; the gate ran as " +
    "real flatMapGroupsWithState state") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sig = docs.map { case (id, text) =>
      val votes = Array.fill(60)(0L)
      text.split(" ", -1).foreach { tok =>
        val h = java.lang.Long.parseLong(md5hex(tok).substring(0, 15), 16)
        for (b <- 0 until 60)
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      }
      id -> (0 until 60).map(b => if (votes(b) > 0) 1L << b else 0L).sum
    }.toMap
    val spans = Seq(8, 8, 8, 8, 7, 7, 7, 7).scanLeft(0)(_ + _)
      .zip(Seq(8, 8, 8, 8, 7, 7, 7, 7))
    val ids = docs.map(_._1).sorted
    val expected = ids.map { b =>
      val n = spans.zipWithIndex.count { case ((off, w), _) =>
        ids.exists(a => a < b &&
          ((sig(a) >> off) & ((1L << w) - 1)) ==
            ((sig(b) >> off) & ((1L << w) - 1)) &&
          java.lang.Long.bitCount(sig(a) ^ sig(b)) <= 7)
      }.toLong
      b -> ((n > 0, n))
    }.toMap
    val got = graft.operators.Dedup.streamingNearDupGate(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2))))
      .toMap
    assert(got == expected)
    // the fixture plants near-dup pairs — the gate must flag some docs,
    // and never the corpus's first arrival
    assert(got.values.exists(_._1))
    assert(!got(ids.min)._1, "the earliest doc can never be a near-dup")
    // the verdicts came out of REAL streaming state, not a batch fallback
    assert(EventStreams.lastRunStateOperators.map(_._1)
      .contains("flatMapGroupsWithState"),
      s"unexpected state operators: ${EventStreams.lastRunStateOperators}")
  }

  test("q292 gate is batch-split-invariant: a near-dup's smaller half " +
    "arriving a batch LATE still flags the larger half via upgrade rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_q292").toString
    val w = (0 until 100).map(i => s"g$i").toArray
    val w2 = w.clone(); w2(40) = "gx40" // near-dup pair (1, 2), hamming small
    val unrelated = (0 until 100).map(i => s"u$i").mkString(" ")
    def write(name: String, rows: Seq[(Long, String)], mtime: Long): Unit = {
      val dst = s"$tmp/__t"
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(dst)
      val part = new java.io.File(dst).listFiles()
        .find(_.getName.startsWith("part-")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/$name"))
      assert(new java.io.File(s"$tmp/$name").setLastModified(mtime))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dst))
    }
    // the LARGER half of the pair and an unrelated doc arrive FIRST;
    // the smaller half arrives one micro-batch later
    write("00_first.parquet",
      Seq((2L, w2.mkString(" ")), (10L, unrelated)), 1000000000000L)
    write("01_late.parquet", Seq((1L, w.mkString(" "))), 1000000060000L)
    val got = graft.operators.Dedup
      .nearDupGateOn(spark, tmp, "q292_split_inv", maxFilesPerTrigger = Some(1))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(EventStreams.lastRunDataBatches == 2,
      s"expected 2 data batches, got ${EventStreams.lastRunDataBatches}")
    // the doc_id-order semantics the batch oracle defines, regardless of
    // arrival order: 1 is the pair's minimum (never flagged), 2 is
    // flagged even though it ARRIVED before 1 — the upgrade-row path
    assert(got == Map(1L -> false, 2L -> true, 10L -> false), s"got $got")
  }

  test("q302 checkpoint restart: a stopped-and-restarted gate resumes " +
    "from its checkpoint — the final sink equals the uninterrupted drive " +
    "and part-2 verdicts depend on recovered part-1 state") {
    import java.security.MessageDigest
    import graft.operators.Dedup
    val (rollup, afterPart1, finalCount, split) =
      Dedup.checkpointRestartGateDrive(spark, dir)
    val got = rollup.collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    // kill/restart must be invisible: the two-phase drive's rollup equals
    // the single-process gate over the same corpus, verdict for verdict
    val uninterrupted = Dedup.streamingNearDupGate(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2))))
      .toMap
    assert(got == uninterrupted)
    // the restarted query APPENDED part 2's gate rows to the committed
    // sink instead of reprocessing part 1 (exactly-once via _spark_metadata)
    assert(afterPart1 > 0 && finalCount > afterPart1,
      s"sink rows: $afterPart1 after part 1, $finalCount final")
    // state recovery, first-principles: a part-2 doc whose ONLY
    // hamming<=7 band partners are part-1 docs can be flagged only if the
    // restarted query rebuilt its bucket state from the checkpoint
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sig = docs.map { case (id, text) =>
      val votes = Array.fill(60)(0L)
      text.split(" ", -1).foreach { tok =>
        val h = java.lang.Long.parseLong(md5hex(tok).substring(0, 15), 16)
        for (b <- 0 until 60)
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      }
      id -> (0 until 60).map(b => if (votes(b) > 0) 1L << b else 0L).sum
    }.toMap
    val spans = Seq(8, 8, 8, 8, 7, 7, 7, 7).scanLeft(0)(_ + _)
      .zip(Seq(8, 8, 8, 8, 7, 7, 7, 7))
    def collide(a: Long, b: Long): Boolean =
      java.lang.Long.bitCount(sig(a) ^ sig(b)) <= 7 &&
        spans.exists { case (off, w) =>
          ((sig(a) >> off) & ((1L << w) - 1)) ==
            ((sig(b) >> off) & ((1L << w) - 1)) }
    val ids = docs.map(_._1).sorted
    val crossOnly = ids.filter(_ > split).filter { b =>
      val partners = ids.filter(a => a < b && collide(a, b))
      partners.nonEmpty && partners.forall(_ <= split)
    }
    assert(crossOnly.nonEmpty,
      "fixture must hold a part-2 doc whose only partners are in part 1")
    crossOnly.foreach(b => assert(got(b)._1,
      s"doc $b's partners all arrived before the restart — an unflagged " +
        "verdict means the checkpoint state was not recovered"))
  }

  test("q302 restart recovery holds on the on-heap state store too: " +
    "both providers' checkpoints resume to the identical sink") {
    import graft.operators.Dedup
    def run(): (Map[Long, (Boolean, Long)], Long, Long) = {
      val (rollup, after1, fin, _) = Dedup.checkpointRestartGateDrive(spark, dir)
      (rollup.collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap,
        after1, fin)
    }
    val (base, b1, b2) = run() // RocksDB — the default
    spark.conf.set(EventStreams.RocksDbFlag, "false")
    val (heap, h1, h2) = try run()
    finally spark.conf.unset(EventStreams.RocksDbFlag)
    assert(heap == base,
      "on-heap-checkpointed restart must produce the identical verdicts")
    // both providers appended part 2 rather than reprocessing part 1
    assert(b2 > b1 && h2 > h1, s"sink rows: rocks $b1->$b2, heap $h1->$h2")
  }

  test("q302 hard-kill restart: a query killed MID-batch (offset WAL " +
    "entry present, commit entry absent) resumes from the checkpoint to " +
    "the identical sink — on both state store providers") {
    import graft.operators.Dedup
    // the graceful q302 spec proves stop-between-batches; this one proves
    // the production property — the engine's own logs must show the
    // crash-consistency state (an in-flight batch that never committed)
    // before the restart, and the replayed batch must be invisible in
    // the recovered sink (file-sink exactly-once via _spark_metadata)
    val uninterrupted = Dedup.streamingNearDupGate(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2))))
      .toMap
    def drive(provider: String): Unit = {
      val (rollup, offs, commits, _) =
        Dedup.checkpointRestartKillDrive(spark, dir)
      assert(offs > commits,
        s"[$provider] kill must land mid-batch: offsets=$offs " +
          s"commits=$commits")
      val got = rollup.collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
      assert(got == uninterrupted,
        s"[$provider] a mid-batch kill must be invisible in the sink")
    }
    drive("rocksdb") // the default provider
    spark.conf.set(EventStreams.RocksDbFlag, "false")
    try drive("on-heap") finally spark.conf.unset(EventStreams.RocksDbFlag)
  }

  test("q293 TTL gate: an expired signature no longer matches, an " +
    "in-window one still does, and verdicts are invariant to ordered " +
    "batch splits") {
    import spark.implicits._
    import graft.operators.Dedup
    val tmp = java.nio.file.Files.createTempDirectory("graft_q293").toString
    val words = (0 until 100).map(i => s"g$i").mkString(" ")
    val unrelated = (0 until 100).map(i => s"u$i").mkString(" ")
    // ids are MINUTES of the synthetic ingest clock; horizon = 64 min:
    //  (1, 50): identical text, gap 49  -> in-window, 50 must flag
    //  (100, 300): identical text, gap 200 -> expired, 300 must NOT flag
    val rows = Seq(1L -> words, 50L -> words, 100L -> unrelated,
      300L -> unrelated)
    def write(name: String, rs: Seq[(Long, String)], mtime: Long): Unit = {
      val dst = s"$tmp/__t"
      rs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(dst)
      val part = new java.io.File(dst).listFiles()
        .find(_.getName.startsWith("part-")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/$name"))
      assert(new java.io.File(s"$tmp/$name").setLastModified(mtime))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dst))
    }
    write("00_all.parquet", rows, 1000000000000L)
    def verdicts(sinkName: String, mfpt: Option[Int]): Map[Long, Boolean] =
      Dedup.gateVerdictRollup(
        Dedup.ttlGateSinkOn(spark, tmp, sinkName, maxFilesPerTrigger = mfpt))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val one = verdicts("q293_single", None)
    assert(one == Map(1L -> false, 50L -> true, 100L -> false,
      300L -> false),
      s"in-window must flag, expired must not: $one")
    // split the SAME ordered feed across two micro-batches: identical
    // verdicts (the TTL prune is deterministic per arrival, and state
    // carries the in-window survivors across the batch boundary)
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_q293b").toString
    def write2(name: String, rs: Seq[(Long, String)], mtime: Long): Unit = {
      val dst = s"$tmp2/__t"
      rs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(dst)
      val part = new java.io.File(dst).listFiles()
        .find(_.getName.startsWith("part-")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp2/$name"))
      assert(new java.io.File(s"$tmp2/$name").setLastModified(mtime))
    }
    write2("00_a.parquet", rows.take(2), 1000000000000L)
    write2("01_b.parquet", rows.drop(2), 1000000060000L)
    val two = Dedup.gateVerdictRollup(
      Dedup.ttlGateSinkOn(spark, tmp2, "q293_split",
        maxFilesPerTrigger = Some(1)))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(EventStreams.lastRunDataBatches == 2,
      s"expected 2 data batches, got ${EventStreams.lastRunDataBatches}")
    assert(two == one, s"ordered batch split changed verdicts: $two vs $one")
    // the gate ran as real stateful streaming
    assert(EventStreams.lastRunStateOperators.map(_._1)
      .contains("flatMapGroupsWithState"),
      s"unexpected state operators: ${EventStreams.lastRunStateOperators}")
  }

  test("q293/q294 on the contract corpus: the TTL verdict set is a strict " +
    "subset of the unbounded q292 set, and the census proves bounded " +
    "state (occupancy can never exceed the horizon window)") {
    import graft.operators.Dedup
    val unbounded = Dedup.streamingNearDupGate(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val ttl = Dedup.streamingNearDupGateTtl(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(ttl.keySet == unbounded.keySet)
    // forgetting can only UNFLAG: every TTL-flagged doc is q292-flagged
    ttl.foreach { case (id, f) =>
      if (f) assert(unbounded(id), s"doc $id flagged only under TTL") }
    // ... and on this corpus the horizon genuinely expires matches
    assert(ttl.count(_._2) < unbounded.count(_._2),
      "the horizon should expire at least one match on the contract data")
    val census = Dedup.gateStateCensus(spark, dir).collect()
    assert(census.length == 8)
    val windowCap = Dedup.GateHorizonSec / 60 + 1 // one id per minute
    census.foreach { r =>
      val (nAdm, nRes, maxOcc) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(maxOcc <= windowCap,
        s"band ${r.getInt(0)}: occupancy $maxOcc exceeds the horizon cap")
      assert(nRes <= nAdm)
    }
    // state genuinely shrank: residency is a strict subset of admissions
    assert(census.map(_.getLong(3)).sum < census.map(_.getLong(2)).sum,
      "final resident state should be smaller than total admissions")
  }

  test("q291 watermark model vs the engine's own progress trail: the " +
    "analytic w0/wfinal equal the REPORTED per-batch watermarks (a Spark " +
    "version change to the commit-lag rule fails here, loudly)") {
    import org.apache.spark.sql.functions.{col, max, md5, substring}
    EventStreams.lateDataCensusQuery(spark, dir, 2).collect()
    val trail = EventStreams.lastRunWatermarks
    assert(trail.count(_._2 > 0) == 3, s"expected 3 data batches: $trail")
    def wmMillis(batchId: Long): Long =
      java.time.Instant.parse(trail.find(_._1 == batchId).get._3)
        .toEpochMilli
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
      .withColumn("nib",
        substring(md5(col("event_id").cast("string")), 1, 1))
    def maxMillis(f: org.apache.spark.sql.DataFrame): Long = {
      val t = f.agg(max(col("ts"))).first()
        .getTimestamp(0).toInstant
      // Spark truncates the watermark to millisecond precision
      Math.floorDiv(t.getEpochSecond * 1000000L + t.getNano / 1000, 1000L)
    }
    val maxA = maxMillis(ev.filter(col("nib") >= "4" && col("nib") <= "9"))
    val maxAll = maxMillis(ev)
    val delayMs = 2L * 3600 * 1000
    // batch 0 runs against the initial epoch watermark
    assert(wmMillis(0) == 0L, s"batch 0 watermark: ${trail.head}")
    // the watermark REPORTED at batch 1 is the value batch 2's late rows
    // are filtered against — the oracle's w0 = max(file A) - delay (the
    // measured "batches <= N-2" commit-lag rule, here cross-checked
    // against the engine's own progress events instead of only modeled)
    assert(wmMillis(1) == maxA - delayMs,
      s"drop watermark ${wmMillis(1)} != maxA - delay ${maxA - delayMs}")
    // the final (no-data-batch) watermark is the oracle's wfinal
    val wFinal = java.time.Instant.parse(trail.last._3).toEpochMilli
    assert(wFinal == maxAll - delayMs,
      s"final watermark $wFinal != maxAll - delay ${maxAll - delayMs}")
  }

  test("q297 analytic census equals a REAL streaming drive at a " +
    "non-contract delay: the curve's extrapolated grid points are the " +
    "measured rule, not a parallel model") {
    def rows(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val measured = rows(EventStreams.lateDataCensusQuery(spark, dir, 1))
    val analytic = rows(EventStreams.analyticLateCensus(spark, dir, 1))
    assert(analytic == measured,
      s"analytic census diverges from the real 1h drive:\n" +
        s"  analytic $analytic\n  measured $measured")
  }

  test("q297 watermark delay curve: all three delays present, and total " +
    "drops are monotone non-increasing in the delay — in one lane") {
    val rows = EventStreams.watermarkDelayCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val drops = rows.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    assert(drops.keySet == Set(1L, 2L, 4L), s"delays: ${drops.keySet}")
    assert(drops(1L) >= drops(2L) && drops(2L) >= drops(4L),
      s"drop totals must shrink as the watermark loosens: $drops")
    // the curve is non-degenerate on the fixture: SOME delay drops rows
    assert(drops(1L) > 0L, "the 1h delay should drop late rows")
    // not-yet-expired bands (-1) never drop, at any delay
    rows.filter(_._2 == -1L).foreach { case (d, _, nd) =>
      assert(nd == 0L, s"delay $d dropped rows in the open band") }
  }

  test("q301 gate horizon sweep: flagged counts are monotone in the " +
    "window, and the contract-horizon grid point equals q293's verdicts") {
    import graft.operators.Dedup
    val rows = Dedup.gateHorizonSweep(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet ==
      Dedup.GateHorizonGridSec.map(_ / 60).toSet, s"grid: ${rows.keySet}")
    val sorted = rows.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach { case Seq((h1, (_, f1, b1)), (h2, (_, f2, b2))) =>
      assert(f1 <= f2 && b1 <= b2,
        s"longer window must flag at least as much: $h1->$f1/$b1 vs $h2->$f2/$b2")
    }
    // the middle grid point IS q293's horizon: counts must agree with
    // the q293 lane's own rollup
    val q293Flagged = Dedup.streamingNearDupGateTtl(spark, dir)
      .filter(col("is_near_dup")).count()
    assert(rows(Dedup.GateHorizonSec / 60)._2 == q293Flagged)
    // non-degenerate on the fixture: the sweep actually separates
    assert(sorted.head._2._2 < sorted.last._2._2,
      s"horizon grid should separate flagged counts: $sorted")
  }

  test("q291 late-data census: drops equal the watermark contract band " +
    "for band, the feed really ran three micro-batches, and shrinking " +
    "the delay grows the drop set monotonically") {
    def census(delayHours: Int): Map[Long, (Long, Long, Long)] =
      EventStreams.lateDataCensusQuery(spark, dir, delayHours).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
    val at2 = census(2)
    // the schedule produced a real three-batch replay (A, B, late)
    assert(EventStreams.lastRunDataBatches == 3,
      s"expected 3 data batches, got ${EventStreams.lastRunDataBatches}")
    assert(at2.nonEmpty && at2.keySet.exists(_ >= 0))
    // the contract, measured: every late row in an expired band (>= 0)
    // was dropped; nothing in the not-yet-expired band (-1) was
    at2.foreach { case (band, (_, nLate, nDropped)) =>
      if (band >= 0) assert(nDropped == nLate,
        s"band $band: dropped $nDropped != late $nLate")
      else assert(nDropped == 0L, s"band $band dropped $nDropped")
    }
    // delay-vs-completeness: a tighter watermark can only drop MORE
    val at1 = census(1)
    val dropped1 = at1.values.map(_._3).sum
    val dropped2 = at2.values.map(_._3).sum
    assert(dropped1 >= dropped2,
      s"1h delay dropped $dropped1 < 2h delay's $dropped2")
    assert(dropped2 > 0, "the 2h census must observe real drops")
  }
}
