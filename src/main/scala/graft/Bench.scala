package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every contract query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is forced through the `noop` sink — a `count()` action lets
  * Catalyst prune the plan down to counting (filters/projections would be
  * measured, generated columns would not), while noop-write computes every
  * output row fully, which is what a fair throughput number needs.
  *
  * The artifact is self-defending against host-load contamination (round-5
  * post-mortem: the driver's official map recorded a 2.1x "regression" that
  * was pure host stall and only a judge re-measure could refute):
  *   - a fixed CPU-only calibration probe runs before the suite (baseline)
  *     and after every [[CalibrateEvery]] queries; when a probe drifts past
  *     [[DriftLimit]]x baseline, every query in that segment is re-sampled
  *     once after the host settles, so a stall cannot silently inflate mins;
  *   - the emitted JSON carries a "contamination" object (stalled-query
  *     count by the min<<median signature, calibration baseline/max/drift,
  *     re-sample count) so the artifact explains its own trustworthiness;
  *   - a SPARK_GRAFT_ONLY-filtered run writes BENCH_PARTIAL.json and leaves
  *     BENCH_LATEST.json untouched (a focused judge re-run clobbered the
  *     driver's full round-5 map with an 8-query partial).
  */
object Bench {
  /** Run the calibration probe after every this-many queries. */
  final val CalibrateEvery = 10
  /** A probe slower than this multiple of the baseline marks its segment
    * contaminated and triggers one re-sample of the segment's queries. */
  final val DriftLimit = 2.0
  /** A whole RUN is "clean" (eligible to replace a clean canonical
    * BENCH_LATEST.json) only when its worst probe stayed under this drift
    * and no query shows the min<<median stall signature. Tighter than
    * [[DriftLimit]] on purpose: segment re-sampling tolerates a transient
    * stall; the canonical map should not. */
  final val CleanDriftLimit = 1.5

  /** min<<median stall signature: the samples disagree enough that a host
    * stall likely covered some of them. Thresholds per BENCH.md's variance
    * study: ratio alone misfires on sub-0.1s queries where scheduler jitter
    * dominates, so an absolute floor is required too. */
  def isStalled(min: Double, median: Double): Boolean =
    median > 2.0 * min && median - min > 0.2

  def medianOf(ts: List[Double]): Double = {
    val s = ts.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Absolute probe-excursion floor for the cleanliness bar, same
    * rationale as [[isStalled]]'s 0.2 s floor: once warm-up drives the
    * probe baseline to ~0.09 s, a 1.5× RATIO bar means a 45 ms scheduling
    * blip reads "contaminated" — far below the significance of any query
    * in the map. An excursion under this floor cannot have moved a
    * min-of-3 materially regardless of ratio. */
  final val CleanDriftAbsFloor = 0.1

  /** Whole-run cleanliness bar for the canonical-map guard: ratio bar OR
    * the absolute excursion floor, and zero stalled queries. */
  def isCleanRun(drift: Double, nStalled: Int,
                 probeExcursion: Double = Double.MaxValue): Boolean =
    (drift < CleanDriftLimit || probeExcursion < CleanDriftAbsFloor) &&
      nStalled == 0

  /** Does an existing bench map's own contamination block pass
    * [[isCleanRun]]? Unreadable/absent/contamination-less files are NOT
    * clean — a map that cannot vouch for itself earns no protection. */
  def fileIsClean(path: java.nio.file.Path): Boolean =
    try {
      val txt = java.nio.file.Files.readString(path)
      def num(key: String) = (s""""$key":\\s*([0-9.]+)""").r
        .findFirstMatchIn(txt).map(_.group(1).toDouble)
      val excursion = num("calib_baseline").zip(num("calib_max"))
        .map { case (b, m) => m - b }.getOrElse(Double.MaxValue)
      num("calib_drift").zip(num("stalled_queries")).exists {
        case (d, s) => isCleanRun(d, s.toInt, excursion)
      }
    } catch { case _: Exception => false }

  /** [[fileIsClean]] scoped to a CODE state: a canonical map only earns
    * protection against a red run when it measured the SAME compiled
    * code (round 15: after an optimization pass, four post-change runs
    * on a bursty host were all diverted while the pre-change map kept
    * masquerading as canonical numbers for code it never ran — a clean
    * map of stale code is stale, not canonical). Maps written before
    * this field existed carry no code tag and lose protection once. */
  def fileIsClean(path: java.nio.file.Path, currentCode: String): Boolean =
    fileIsClean(path) && (try {
      """"code":"([^"]*)"""".r
        .findFirstMatchIn(java.nio.file.Files.readString(path))
        .exists(_.group(1) == currentCode)
    } catch { case _: Exception => false })

  /** Fingerprint of the compiled code this bench measures: recursive
    * (file count, total bytes) of the classes dir or jar the Bench class
    * loaded from. mtimes are deliberately excluded so a no-op rebuild of
    * identical code keeps its canonical map's protection. */
  def codeFingerprint(): String = try {
    val root = new java.io.File(
      getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
    if (root.isFile) s"jar:${root.length}"
    else {
      var n = 0L
      var bytes = 0L
      def walk(f: java.io.File): Unit =
        if (f.isFile) { n += 1; bytes += f.length }
        else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .foreach(walk)
      walk(root)
      s"$n:$bytes"
    }
  } catch { case _: Exception => "unknown" }

  /** Fixed CPU-bound probe, independent of any query or input data: a fused
    * range-sum that whole-stage codegen compiles once (first call primes it;
    * callers time later calls only). ~30-60 ms steady-state at local[32] —
    * long enough to sense a host stall, short enough to run 14 times. */
  def calibrationProbe(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(8000000L).selectExpr("sum(id * 3 + 7)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Probe with one-retry confirmation: a single high reading is re-probed
    * once and the MIN of the pair is reported. Rationale (round-8 drift
    * study): the bench JVM itself pauses — a GC cycle or a codegen
    * compilation storm (230 queries each JIT fresh generated classes) can
    * cover exactly one ~50 ms probe and read as "drift 3×" on an idle
    * host. Those self-inflicted pauses never cover two consecutive probes;
    * a REAL sustained host stall covers both, so the retry preserves the
    * guard's purpose (sensing external load) while removing the
    * false-positive that kept honest runs red. */
  def confirmedProbe(spark: SparkSession, baseline: Double): Double = {
    val p = calibrationProbe(spark)
    if (p <= DriftLimit * baseline) p
    else math.min(p, calibrationProbe(spark))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the graft optimizer rule runs in every harness session, so the
    // full oracle gate exercises it (see graft.plans.GraftExtensions)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.MaterializeHofDependencies
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ graft.plans.GraftStrategies
    OracleCapture.currentDir = Some(sfDir)
    // one tiny action to initialize codegen/scheduler before timing
    spark.range(1000).selectExpr("sum(id)").collect()
    // JVM warm-up (round-8 drift study): early-alphabet queries were
    // reading 3× their steady state because shared engine infra (parquet
    // reader, hash agg, broadcast + window machinery) was still
    // interpreter-tier when they ran, and their later drift-triggered
    // resamples then came in far faster — tripping the min≪median stall
    // flag with no host stall anywhere. Two untimed passes over a
    // representative slice C2-compiles that shared infra before ANY timing.
    val warmup = Seq("q01_clean_filter", "q04_rfm", "q11_window_rank",
      "q12_star_join", "q17_percentiles")
    for (_ <- 1 to 2; name <- warmup; fn <- SparkEntry.queries.get(name))
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    // md5-chain warm (round-8 driver bench flagged q123/q166/q170/q238/
    // q44 — all md5/conv-heavy — as "stalled" on first touch): the shared
    // md5 → substring → conv deterministic-variate chain is its own
    // codegen path the relational slice above never touches; two untimed
    // passes C2-compile it so the first timed md5 query measures the
    // engine, not JIT. If the driver still reports stalls after this,
    // they are host noise by elimination.
    for (_ <- 1 to 2)
      spark.range(4000)
        .selectExpr(
          "conv(substring(md5(cast(id as string)), 1, 15), 16, 10) as h")
        // max, not sum: 4000 60-bit variates sum to ~2.3e21, which throws
        // under ANSI (Spark 4 default); max exercises the same codegen chain
        .selectExpr("max(cast(h as bigint)) as s")
        .write.format("noop").mode("overwrite").save()
    // prime the probe's codegen, then baseline = min of 3 timed probes
    calibrationProbe(spark)
    val calibBaseline = List.fill(3)(calibrationProbe(spark)).min
    // Per query: best of 3 back-to-back runs. The host shows multi-second
    // stalls unrelated to the engine (a 500-row narrow map was observed at
    // 0.5s and 87s across runs at near-zero CPU pressure; round 2 saw a
    // query stall in BOTH of 2 runs — 0.29s steady state read as 2.2s), so
    // min-of-3 reports steady-state throughput instead of host noise.
    // Optional focus filter for local iteration: comma-separated name
    // prefixes, e.g. SPARK_GRAFT_ONLY=q50,q51. Driver runs unfiltered.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    def once(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val timesByName = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    var calibMax = calibBaseline
    var resampled = 0
    selected.grouped(CalibrateEvery).foreach { segment =>
      segment.foreach { case (name, fn) =>
        // one untimed warm run first (JMH-style): sample 1 otherwise pays
        // the query's own codegen-compile + interpreter tier, which the
        // drift-triggered resamples later beat 2-3x — reading as a "stall"
        // with no stall anywhere (q04/q73, round-8 drift study). min-of-3
        // is documented as the STEADY-STATE throughput claim; warming one
        // run first is what makes that claim true for every query.
        once(name, fn)
        var times = List.fill(3)(once(name, fn))
        // stall guard: when even the best run is slow, take up to two extra
        // samples — a host stall can span every back-to-back run uniformly
        // (observed: a 0.96 s query reporting 12 s after one ~40 s stall
        // covered all three runs, and a 0.29 s query reporting 2.2 s from
        // two uniform stalls). A genuinely slow query just confirms its
        // min; the extra cost is bounded to the handful of >2 s queries.
        var extra = 0
        while (extra < 2 && times.min > 2.0) {
          times = once(name, fn) :: times
          extra += 1
        }
        timesByName(name) = times
      }
      // segment probe: a drifted probe means the host was loaded while this
      // segment's queries ran — their mins are suspect, so re-sample each
      // once after the probe reads clean again (bounded: 3 settle retries)
      var probe = confirmedProbe(spark, calibBaseline)
      calibMax = math.max(calibMax, probe)
      if (probe > DriftLimit * calibBaseline) {
        var settles = 0
        while (settles < 3 && probe > DriftLimit * calibBaseline) {
          Thread.sleep(2000)
          probe = confirmedProbe(spark, calibBaseline)
          calibMax = math.max(calibMax, probe)
          settles += 1
        }
        segment.foreach { case (name, fn) =>
          timesByName(name) = once(name, fn) :: timesByName(name)
          resampled += 1
        }
      }
    }
    // min<<median arbitration (round 8): the signature says the samples
    // DISAGREE — it cannot say whether the min or the medians are the
    // anomaly. Two fresh samples per flagged query resolve it symmetrically:
    // if steady state really is the min, the new samples land near it and
    // the recomputed median follows (flag clears, median now honest); if the
    // min was the fluke, they land near the median and the flag STANDS.
    // One pass only — no resample-until-clean.
    locally {
      val flagged = timesByName.collect {
        case (n, ts) if isStalled(ts.min, medianOf(ts)) => n
      }.toSeq
      flagged.foreach { n =>
        val fn = SparkEntry.queries(n)
        timesByName(n) = once(n, fn) :: once(n, fn) :: timesByName(n)
      }
    }
    val results = timesByName.toSeq
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    // comma-decimal locale would corrupt the JSON line this exists to emit
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    val mins = results.map { case (n, ts) => n -> ts.min }
    // median alongside min (round-5): min is the steady-state throughput
    // claim, but a stall that covers EVERY sample defeats it (r4's committed
    // q107 = 3.97 s vs 1.69 s steady state); min≈median says the samples
    // agree, min≪median flags residual stall contamination in the round's
    // artifact without re-measurement archaeology
    val medians = results.map { case (n, ts) => n -> medianOf(ts) }
    val stalledNames = mins.zip(medians).collect {
      case ((n, mn), (_, md)) if isStalled(mn, md) => n
    }
    val total = mins.map(_._2).sum
    val contamination =
      s"""{"stalled_queries":${stalledNames.size},"n_queries":${results.size},""" +
      s""""calib_baseline":${fmt(calibBaseline)},"calib_max":${fmt(calibMax)},""" +
      s""""calib_drift":${fmt(calibMax / calibBaseline)},"resampled":$resampled,""" +
      s""""stalled":[${stalledNames.map("\"" + _ + "\"").mkString(",")}]}"""
    // The driver stores a bounded TAIL of stdout; at 116+ queries the full
    // per-query map (~3.3 KB) no longer fits it (r3's line arrived
    // truncated and parsed:null). Two artifacts instead:
    //  - BENCH_LATEST.json in the working directory: the COMPLETE map,
    //    ingestable whole (BENCH_PARTIAL.json when SPARK_GRAFT_ONLY filters
    //    the suite — a partial map must never replace the full one);
    //  - ONE compact stdout line (total + the slowest 12 queries +
    //    a pointer), a few hundred bytes — always survives the tail.
    //
    // Canonical-map protection (round-7 post-mortem: a drift-9.22 map with 7
    // stalled queries was committed as BENCH_LATEST.json even though a
    // cleaner closing run existed): a run whose OWN contamination block is
    // red must not replace a clean canonical map. "Clean" = calib_drift
    // below CleanDriftLimit AND zero stalled queries — the same bar the
    // round-close procedure uses. A red run still writes its full map (to
    // BENCH_CONTAMINATED.json) so nothing measured is ever discarded, and
    // still prints the stdout line; it just cannot masquerade as canonical
    // while a trustworthy map exists. If the existing canonical map is
    // itself red (or absent/unreadable), the new map replaces it — even a
    // contaminated fresh map beats a stale contaminated one.
    val runIsClean = isCleanRun(calibMax / calibBaseline, stalledNames.size,
      calibMax - calibBaseline)
    val codeFp = codeFingerprint()
    // the canonical map is a measurement AT ONE CORE COUNT: a clean run at
    // a different SPARK_GRAFT_CPUS (the driver's scaling probe runs at 8
    // alongside the 32-cpu main run) must neither replace it nor be judged
    // against it — it gets its own per-cpus map file (round-16, verdict
    // item 1: a canonical map must never masquerade as a different-core-
    // count measurement). Maps written before the "cpus" tag existed are
    // treated as same-cpus once (legacy), exactly like the code tag.
    val canonCpus = (try {
      """"cpus":([0-9]+)""".r
        .findFirstMatchIn(java.nio.file.Files.readString(
          java.nio.file.Paths.get("BENCH_LATEST.json")))
        .map(_.group(1))
    } catch { case _: Exception => None })
    val sameCpus = canonCpus.forall(_ == cpus)
    val outFile =
      if (only.isDefined) "BENCH_PARTIAL.json"
      else if (!sameCpus) s"BENCH_c$cpus.json"
      else if (!runIsClean &&
               fileIsClean(java.nio.file.Paths.get("BENCH_LATEST.json"),
                 codeFp)) {
        System.err.println(
          s"[bench] contaminated run (drift ${fmt(calibMax / calibBaseline)}, " +
          s"${stalledNames.size} stalled) — keeping clean BENCH_LATEST.json, " +
          "writing BENCH_CONTAMINATED.json")
        "BENCH_CONTAMINATED.json"
      } else "BENCH_LATEST.json"
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","cpus":$cpus,"queries":${qjson(mins)},"medians":${qjson(medians)},"contamination":$contamination,"code":"$codeFp","sf":"$sfDir"}"""
    // an unwritable CWD must not discard the measured run: the stdout
    // summary below is the artifact of record either way
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), full + "\n")
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] $outFile write failed: $e")
    }
    // The stdout contract (round-16 verdict item 1): the LIVE run's
    // one-line JSON is the LAST stdout line, always — the driver parses
    // the tail, so nothing (in particular no echo of a committed map) may
    // print after it. The round-9 "canonical echo" that self-corrected a
    // contaminated driver capture made the parsed number builder-supplied
    // whenever the run was diverted (both r15 driver runs, and the 8-vs-32
    // scaling block compared the committed map to itself); it now goes to
    // STDERR, purely as a human diagnostic.
    if (outFile == "BENCH_CONTAMINATED.json") {
      try {
        val canon = java.nio.file.Files.readString(
          java.nio.file.Paths.get("BENCH_LATEST.json"))
        val ctotal = """"metric":"total","value":([0-9.eE+-]+)""".r
          .findFirstMatchIn(canon).map(_.group(1))
        System.err.println(
          s"[bench] diverted run: canonical BENCH_LATEST.json total is " +
          s"${ctotal.getOrElse("unknown")} s (this run measured " +
          s"${fmt(total)} s under drift ${fmt(calibMax / calibBaseline)})")
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] canonical note failed: $e")
      }
    }
    val slowest = mins.sortBy(-_._2).take(12)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","cpus":$cpus,"n_queries":${results.size},"queries_shown":${slowest.size},"queries":${qjson(slowest)},"contamination":$contamination,"full":"$outFile","sf":"$sfDir"}""")
    spark.stop()
  }
}
