package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-soak of the heaviest contract queries (round-9 verdict
  * item 4): the scale claims in the per-operator scaladocs are design
  * audits; this main MEASURES them by running the top heavies at sf0.1 and
  * at a synthesized ~sf1 (10× the rows) in one session and reporting the
  * time ratio → implied scaling exponent (`log10(t_10x / t_1x)`; 1.0 =
  * perfectly linear, ≥ ~1.3 flags a super-linear plan worth a fix).
  *
  * ==The ×10 dataset==
  * There is no driver-generated sf1, so the soak synthesizes one at
  * `outDir`: each table is the union of `factor` copies of sf0.1 with
  * every join key shifted by `copy × 10⁹` — consistently across tables
  * (o_custkey moves with c_custkey, l_orderkey with o_orderkey, …), so
  * all joins stay key-correct while the copies are fully disjoint.
  * Disjointness matters for honesty: identical keys ×10 would turn the
  * banded self-joins (image dedup, triangles) into ×100 pair blowups that
  * measure data skew, not plan scaling. Shifted doc_ids also give distinct
  * synthesized media payloads (the pixel/sample formulas hash the full id),
  * so media bucket occupancy stays realistic. nation/region stay single
  * copies (they are fixed dims joined by unshifted nationkeys); timestamps
  * are unshifted, so time-grid cardinalities stay constant while per-bucket
  * density grows 10× — the 100 TB shape.
  *
  * Each query runs TWICE per scale: `first` pays CacheRegistry population
  * and any plan-specific codegen; `steady` is the warm cost. The exponent
  * is computed on steady (that is the repeated-operation regime the
  * scaladocs' claims describe); first-run times are reported alongside so
  * one-shot cost regressions stay visible too.
  */
object ScaleSoak {

  private val Shift = 1000000000L

  /** Key columns shifted per copy, per table. Tables absent here (nation,
    * region) are written through as single fixed copies. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val allTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def buildScaled(spark: SparkSession, srcDir: String, outDir: String,
                  factor: Int): Unit = {
    for (t <- allTables) {
      val base = spark.read.parquet(s"$srcDir/$t.parquet")
      val out = keyCols.get(t) match {
        case None => base
        case Some(keys) =>
          (0 until factor).map { k =>
            val shifted = keys.foldLeft(base) { (d, c) =>
              d.withColumn(c, col(c) + lit(Shift * k))
            }
            // the TEXT analog of key shifting (round-10, for soaking the
            // corpus-similarity lanes): verbatim-copied text would plant
            // every cross-copy doc pair as a perfect near-dup, turning the
            // shingle self-joins (q261 prefix join, MinHash banding) into
            // a ×factor² pair blowup that measures the synthetic clones,
            // not plan scaling. Suffixing every WORD with the copy index
            // makes the shingle universes fully disjoint per copy while
            // preserving each copy's token-frequency shape — ×factor
            // disjoint instances of the original problem, the same
            // honesty contract the shifted join keys give the key-keyed
            // self-joins.
            // copy 0 stays byte-identical to the 1x source (round-10
            // ADVICE): suffixing it too would grow every token by 2+ chars
            // and inflate split/hash/shingle costs at xN relative to 1x,
            // biasing the exponent upward. Copies 1..N-1 alone already
            // guarantee disjoint shingle universes against copy 0.
            if (t == "documents" && k > 0)
              shifted.withColumn("text",
                array_join(transform(split(col("text"), " "),
                  w => concat(w, lit(s"~$k"))), " "))
            else shifted
          }.reduce(_ unionAll _)
      }
      out.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  /** The round-8 verdict's top-10 heavies, plus the round-9 additions the
    * round-9 verdict asked to soak (q261 prefix similarity join, q268
    * quantile normalization, q271 SNM explode-join — the lanes that scale
    * with the corpus and had never run at ×10). Note q271's distinct
    * p_name domain does NOT grow with the copy factor (names repeat across
    * copies; only row multiplicity grows) — at 100 TB that is exactly the
    * value-domain-vs-fact-table shape, so its exponent reads as the cost
    * of the domain-collapsing scan, near 0. */
  private val heavies = Seq(
    "q115_triangles", "q116_robust_scale", "q165_label_propagation",
    "q223_image_dedup", "q107_boilerplate", "q237_join_size_estimate",
    "q113_weighted_median", "q181_equidepth_deciles", "q144_target_encoding",
    "q206_random_walks",
    "q261_prefix_sim_join", "q268_quantile_normalize",
    "q271_sorted_neighborhood",
    // round-10 additions that grow with the corpus/log: the permutation
    // fan-out, the packed-sequence prefix sum, the CM read-back, the
    // CC-backed entity merge (value domain fixed — expect ~0), the
    // split-parity doc join, the simhash pair calibration
    "q274_bh_fdr", "q275_packed_manifest", "q277_cms_error_audit",
    "q273_entity_merge", "q280_split_parity", "q281_simhash_calibration",
    // round-11 additions (not yet in the canonical bench map the sweep
    // mode reads): the 8-band pair calibration, the clustered-layout
    // write+rollup, the PQ fit+recall pair, the full-outer join state
    "q283_simhash_router", "q284_clustered_rollup", "q285_pq_recall",
    "q286_stream_full_outer_join",
    // round-12 additions: the two-stage PQ rescore, the CC-backed routed
    // removal, the Z-order layout write+rollups, the 3-batch late census,
    // plus q261 re-soaked on its staged-layout serving path
    "q288_pq_rescore", "q289_routed_removal", "q290_zorder_skipping",
    "q291_late_data_census", "q292_stream_neardup_gate",
    // round-13 additions: the TTL gate + its census rollup, the router
    // occupancy census, the incremental-index merge audit, the 3-delay
    // watermark curve, plus q261/q31 re-soaked on the BUCKETED layouts
    "q293_gate_ttl", "q294_gate_state_census", "q295_router_census",
    "q296_incremental_index", "q297_watermark_curve", "q298_compaction",
    "q299_incremental_ann", "q300_codebook_drift",
    "q301_gate_horizon_sweep",
    // round-14 additions: the checkpoint-restart two-phase gate drive
    // and the tombstone-delete index maintenance audit
    "q302_checkpoint_restart", "q303_index_delete", "q304_ann_delete",
    "q305_index_lifecycle", "q306_forget_cascade",
    "q31_dedup_ngram_jaccard",
    // round-15 additions: the two verdict ×100 targets the list lacked —
    // the stream-stream left-outer (state-store churn grows with the log)
    // and the TF-IDF top-terms scan (vocabulary × corpus growth)
    "q137_stream_outer_join", "q92_tfidf")

  /** Times one query with shuffle parallelism scaled to the data factor —
    * the weak-scaling protocol: per-task shuffle volume stays constant
    * across scales (a real cluster reading 10× the data runs 10× the
    * tasks; AQE then coalesces within a scale exactly as it would there).
    * With partitions FIXED instead, every sort and hash build grows 10×
    * per task and the measurement conflates plan scaling with single-task
    * memory effects (spill cliffs) no production layout would hit. */
  private def timeOne(spark: SparkSession, name: String, dir: String,
                      parts: Int): Double = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    // normalize both paths (trailing slashes, doubled separators): every
    // derived-layout key is a sanitize() of the dir STRING, and a
    // non-canonical outDir would stage under one key and invalidate
    // under another
    val srcDir = java.nio.file.Paths
      .get(args.headOption.getOrElse("/root/testdata/sf0.1")).toString
    val outDir = java.nio.file.Paths
      .get(if (args.length > 1) args(1) else "/tmp/graft_sf1").toString
    val factor = sys.env.getOrElse("SPARK_GRAFT_SOAK_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // zstd shuffle/spill blocks (~2x lz4's ratio): the ×100 soak's
      // shuffle-heavy lanes (q115's edge self-join) otherwise exceed this
      // single box's disk — a weak-scaled cluster adds disk per node, one
      // box does not. Both scales run the same codec, so the exponent is
      // codec-neutral; raw times shift slightly vs the lz4 bench map.
      .config("spark.io.compression.codec", "zstd")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.MaterializeHofDependencies
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ graft.plans.GraftStrategies

    // rebuild unless a COMPLETE build of the SAME factor is present: the
    // marker is written last, so a crashed partial build (or a dataset
    // built at a different factor) never silently poisons the exponents
    val marker = new java.io.File(s"$outDir/_SOAK_FACTOR_$factor")
    if (!marker.exists() ||
        allTables.exists(t => !new java.io.File(s"$outDir/$t.parquet").exists())) {
      // drop EVERY stale factor marker first (round-9 ADVICE): after an
      // A-then-B factor sequence at one outDir, A's surviving marker plus
      // B's tables would make a third run at factor A skip the rebuild
      // and silently time factor-B data
      Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("_SOAK_FACTOR_")).foreach(_.delete())
      System.err.println(s"[soak] building ${factor}x dataset at $outDir ...")
      buildScaled(spark, srcDir, outDir, factor)
      // derived write-once layouts are keyed by the SOURCE DIR STRING, so
      // a rebuild at a new factor must invalidate them or q130/q284-class
      // lanes silently scan the previous factor's layout (the same
      // A-then-B staleness the _SOAK_FACTOR_ markers prevent above)
      graft.operators.Layout.invalidateClusteredOrders(outDir)
      graft.operators.PartitionedEvents.invalidateLayout(outDir)
      graft.operators.Staging.invalidate(spark, outDir)
      graft.streaming.EventStreams.invalidateStaged(outDir)
      graft.sources.SchemaEvolution.invalidateStage(outDir)
      graft.sources.OrcInterchange.invalidateStage(outDir)
      graft.operators.Bucketing.invalidateStage(spark, outDir)
      marker.createNewFile()
    }

    // SWEEP mode (round-11 verdict item 1): instead of the hand-picked
    // heavies, soak EVERY contract lane whose canonical sf0.1 steady cost
    // is at or above the given threshold — the q261 deserialized-cache
    // thrash class was invisible at sf0.1 and only appeared at ×10 on a
    // lane the hand-picked list happened to cover; any other multi-read
    // CacheRegistry consumer could hide the same pathology. The lane list
    // comes from the committed clean bench map, so the sweep's scope is
    // reproducible and auditable.
    val lanes = sys.env.get("SPARK_GRAFT_SOAK_SWEEP") match {
      case Some(thr) =>
        // a real JSON reader (Jackson ships with Spark), not a split/regex
        // scrape: a format drift in BENCH_LATEST.json must fail loudly
        // here, never quietly shrink the sweep's audited scope
        val root = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new java.io.File("BENCH_LATEST.json"))
        val qnode = root.get("queries")
        require(qnode != null && qnode.isObject,
          "BENCH_LATEST.json has no queries map")
        val allKnown = {
          val it = qnode.fields()
          val buf = Seq.newBuilder[(String, Double)]
          while (it.hasNext) {
            val e = it.next()
            require(e.getValue.isNumber,
              s"BENCH_LATEST.json queries.${e.getKey} is not a number")
            buf += e.getKey -> e.getValue.asDouble()
          }
          buf.result()
        }
        require(allKnown.size > 200,
          s"BENCH_LATEST.json queries map holds only ${allKnown.size} lanes" +
            " — implausibly small for the committed bench; refusing to sweep")
        val fromMap = allKnown.filter(_._2 >= thr.toDouble).map(_._1)
        // lanes newer than the committed map (this round's additions)
        // ride along via the hand-maintained list; heavies the map DOES
        // know stay subject to the threshold so the sweep's scope is
        // reproducible from map + threshold alone
        val known = allKnown.map(_._1).toSet
        (fromMap ++ heavies.filterNot(known.contains)).distinct.sorted
      case None => heavies
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val run = lanes.filter(n => only.forall(_.exists(n.startsWith)))
    System.err.println(s"[soak] ${run.size} lanes queued")

    // Cache hygiene between SCALES (round 10): both scales run in one JVM,
    // so without a reset the x10 steady run executes with the 1x scale's
    // CacheRegistry frames AND the x10 first run's blocks resident — the
    // q261 soak measured 181 s steady vs 20 s first from exactly that
    // block-manager pressure, a single-JVM artifact no two-cluster
    // comparison would show. A production 10x cluster does not carry the
    // 1x cluster's cache, so each scale starts from a clean store; the
    // steady run still measures the warm-cache regime WITHIN its scale.
    def resetCaches(): Unit = {
      CacheRegistry.clear(spark)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      // streaming lanes leave their MEMORY-SINK tables registered as temp
      // views — at ×10 those are multi-million-row driver-heap objects,
      // and a batch lane following a streaming lane measures the previous
      // lane's GC pressure, not its own plan (round-11 sweep: q107 read a
      // 5× steady-vs-first 'thrash' that vanished in isolation). Dropping
      // every temp view between lanes frees the sinks for the gc() below.
      spark.sqlContext.tableNames().foreach(spark.catalog.dropTempView)
      // streaming lanes also leave their state-store PROVIDERS loaded —
      // with RocksDB the default (round 15) each holds native memory and
      // working files the JVM's GC never sees, and a 99-lane sweep
      // accumulates dozens of them (round-14 verdict item 4: late-sweep
      // lanes ran under pressure no isolated run shows — q115 read
      // exponent 1.46 in-sweep vs 1.01 isolated). unload + maintenance
      // stop; providers re-load lazily on next use.
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      // two GC passes with a drain gap: shuffle files and broadcast
      // blocks are reclaimed by the ASYNC ContextCleaner after their
      // plans become unreachable — a single gc() queues the references
      // but a lane can start before the cleaner drains them
      System.gc()
      Thread.sleep(200)
      System.gc()
    }

    val rows = run.map { name =>
      def measure(): (Double, Double, Double, Double) = {
        resetCaches()
        sys.props("graft.stream.part.scale") = "1"
        val f1 = timeOne(spark, name, srcDir, cpus.toInt)
        val s1 = timeOne(spark, name, srcDir, cpus.toInt)
        resetCaches()
        // streaming lanes pin their own state-partition counts through
        // runToBatch — scale them with the data like the batch shuffle
        // partitions (weak scaling), not frozen at the 1× harness value
        // the staged-index bucket count needs no knob: it is derived from
        // the snapshot bytes (Dedup.shingleBuckets), so the x10 dataset
        // gets ~10x the buckets automatically
        sys.props("graft.stream.part.scale") = factor.toString
        val f10 = timeOne(spark, name, outDir, cpus.toInt * factor)
        // at ×100 the first run's shuffle files (still referenced until a
        // GC lets the async cleaner drop them) plus the steady run's peak
        // can exceed a single box's disk — drain between runs. The ×10
        // protocol is unchanged (keeps r13/r14 sweep comparability);
        // steady stays warm: CacheRegistry frames are strongly held.
        if (factor > 10) { System.gc(); Thread.sleep(300); System.gc() }
        val s10 = timeOne(spark, name, outDir, cpus.toInt * factor)
        (f1, s1, f10, s10)
      }
      var (f1, s1, f10, s10) = measure()
      def exponent = math.log(s10 / s1) / math.log(factor.toDouble)
      // super-linear CONFIRMATION pass (round-14 verdict item 4): a
      // sweep reading above linear gets one re-measure after a full
      // hygiene reset before it is reported — the q115 class of
      // context-pressure artifact does not reproduce, a real
      // super-linear plan does. min-of-runs per scale, the bench's own
      // steady-state protocol.
      var resampled = false
      if (exponent > 1.05) {
        resampled = true
        val (g1, r1, g10, r10) = measure()
        f1 = math.min(f1, g1); s1 = math.min(s1, r1)
        f10 = math.min(f10, g10); s10 = math.min(s10, r10)
      }
      val exp = exponent
      System.err.println(f"[soak] $name%-26s 1x first=$f1%7.2f steady=$s1%7.2f" +
        f"  ${factor}x first=$f10%7.2f steady=$s10%7.2f  exponent=$exp%5.2f" +
        (if (resampled) "  (resampled)" else ""))
      s""""$name":{"t1_first":$f1,"t1":$s1,"t10_first":$f10,"t10":$s10,""" +
        f""""exponent":$exp%.3f,"resampled":$resampled}"""
    }
    println(s"""{"metric":"scale_soak","factor":$factor,""" +
      s""""queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
