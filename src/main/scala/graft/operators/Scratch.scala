package graft.operators

import graft.Tables

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main for the optimization round — times the
  * pieces of one composite lane so the expensive stage is measured, not
  * guessed (guide §1.1). Not part of the contract surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.MaterializeHofDependencies
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ graft.plans.GraftStrategies
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    if (sys.env.get("GRAFT_SCRATCH_MODE").contains("stream")) {
      sys.env.get("GRAFT_ROCKSDB").foreach(v =>
        spark.conf.set(graft.streaming.EventStreams.RocksDbFlag, v))
      val lanes = Seq("q64_stream_hourly", "q106_stream_dedup",
        "q137_stream_outer_join", "q286_stream_full_outer_join",
        "q83_stream_interval_join", "q146_stream_session_window")
      for (name <- lanes) {
        val fn = graft.SparkEntry.queries(name)
        t(s"$name warm")(noop(fn(spark, dir)))
        for (i <- 1 to 3) t(s"$name run $i")(noop(fn(spark, dir)))
      }
      spark.stop()
      return
    }
    // warm pass
    t("q306 warm")(noop(Forget.cascadeAudit(spark, dir)))
    for (i <- 1 to 2) {
      t(s"q306 pieces run $i") {
        val sandbox = t("  stage sandbox")(
          Forget.debugStage(spark, dir, keep = true))
        val kept = t("  stage kept")(
          Forget.debugStage(spark, dir, keep = false))
        t("  builds doc")(Dedup.buildDocForgetLayouts(spark, sandbox))
        t("  builds ann")(
          SimilaritySearch.buildAnnForgetLayouts(spark, sandbox))
        t("  build phash")(
          graft.multimodal.MediaAnalysis.phashBands(spark, sandbox).count())
        t("  forget call") {
          val docRoster = Tables.documents(spark, sandbox)
            .filter(org.apache.spark.sql.functions.col("doc_id") % 97 === 0)
            .select("doc_id")
          val vecRoster = Tables.embeddings(spark, sandbox)
            .filter(org.apache.spark.sql.functions.col("vec_id") % 97 === 0)
            .select("vec_id")
          Forget.forget(spark, sandbox, "fc97",
            Map("documents" -> docRoster, "embeddings" -> vecRoster))
        }
        t("  audit docs plan") {
          Dedup.forgetAuditRowsDocs(spark, sandbox, kept)
            .queryExecution.executedPlan
        }
        t("  audit docs")(noop(
          Dedup.forgetAuditRowsDocs(spark, sandbox, kept)))
        t("  audit ann plan") {
          val qe = t("    ann frame")(
            SimilaritySearch.forgetAuditRowsAnn(spark, sandbox,
              org.apache.spark.sql.functions.col("vec_id") % 97 =!= 0)
            .queryExecution)
          t("    ann analyzed")(qe.analyzed)
          t("    ann optimized")(qe.optimizedPlan)
          t("    ann physical")(qe.executedPlan)
        }
        t("  audit phash")(noop(Dedup.indexDiffRow("phash_bands",
          graft.multimodal.MediaAnalysis.phashBands(spark, sandbox),
          graft.multimodal.MediaAnalysis.phashBands(spark, kept),
          Seq("media_id", "b0", "b1", "b2", "b3"))))
        t("  audit ann")(noop(
          SimilaritySearch.forgetAuditRowsAnn(spark, sandbox,
            org.apache.spark.sql.functions.col("vec_id") % 97 =!= 0)))
      }
    }
    spark.stop()
  }
}
