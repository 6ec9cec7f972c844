package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once, marker-gated PARQUET staging for prepared derived tables —
  * the persistent-artifact twin of [[graft.CacheRegistry]] (round-11
  * verdict item 1, generalizing the q284 `Layout.clusteredOrdersDir`
  * discipline to the dedup signature artifacts).
  *
  * Why this exists: the shingle inverted index and the MinHash/SimHash
  * signature tables are INDEX ARTIFACTS — a production corpus pipeline
  * builds each once per corpus snapshot and persists it beside the data;
  * every consumer (the near-dup joins, the calibration audits, the routed
  * dedup pass) then SCANS the prepared table. Session caching approximated
  * that dataflow but kept paying the build once per session AND exposed
  * multi-read lanes to deserialized-columnar-cache thrash (the ×10 soak
  * measured repeated cache reads at 4–8× the cost of a parquet re-scan on
  * q261's four-reference shingle plan). A staged parquet layout gives
  * every reference a plan-native columnar scan with honest file-size
  * statistics, pushdown, and pruning — the exact physical shape the
  * 100 TB deployment would have.
  *
  * Freshness: gated by Spark's own `_SUCCESS` plus a `_GRAFT_FP` marker
  * recording a cheap fingerprint of the SOURCE table (file count, total
  * bytes, newest mtime — the [[graft.streaming.EventStreams]] staging
  * discipline), so a source dir rebuilt in place (ScaleSoak factor
  * rebuilds, spec fixtures reusing a tmp path) re-stages instead of
  * silently serving the previous build's artifact. Layouts live under
  * `graft_prepared/<sanitized canonical source dir>/<artifact name>`, so
  * the per-source key is the FULL sanitized path — never a hashCode —
  * and invalidation removes exactly one source's subtree.
  */
object Staging {

  private val lock = new Object

  private def canon(dir: String): String =
    java.nio.file.Paths.get(dir).toString

  private def sourceRoot(dir: String): java.io.File =
    new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft_prepared"),
      graft.streaming.EventStreams.sanitize(canon(dir)))

  /** Cheap build fingerprint of a source table path — a single parquet
    * FILE (driver testdata) or a Spark-written DIRECTORY (soak rebuilds):
    * data-file count, total bytes, newest mtime. Shared by every staging
    * gate in the repo ([[graft.streaming.EventStreams]] uses it too) so
    * the freshness disciplines cannot silently diverge. */
  private[graft] def fingerprintOf(src: java.io.File): String =
    if (src.isFile) s"1:${src.length}:${src.lastModified}"
    else {
      val fs = Option(src.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
      s"${fs.length}:${fs.map(_.length).sum}:" +
        s"${fs.foldLeft(0L)((m, f) => math.max(m, f.lastModified))}"
    }

  /** Recursive delete — the shared staging-cleanup helper. */
  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }

  private def fingerprint(dir: String, sourceTable: String): String =
    fingerprintOf(new java.io.File(canon(dir), s"$sourceTable.parquet"))

  /** Get-or-build the staged parquet layout `name` derived from
    * `$dir/$sourceTable.parquet`, returning a frame that READS the staged
    * files (fresh leaf statistics per call — never a lineage into the
    * build plan). `build` runs at most once per (source build, name):
    * first caller pays one parquet write, every later reference is a
    * plain columnar scan. */
  def prepared(spark: SparkSession, name: String, dir: String,
               sourceTable: String = "documents")
              (build: => DataFrame): DataFrame = {
    val root = new java.io.File(sourceRoot(dir), name)
    lock.synchronized {
      val fp = fingerprint(dir, sourceTable)
      val marker = new java.io.File(root, "_GRAFT_FP")
      // markers alone are not proof the data survived tmp cleanup —
      // require at least one data file too (the stageForStream
      // discipline), or a cleaned layout would be served forever
      val ok = new java.io.File(root, "_SUCCESS").exists() &&
        marker.exists() &&
        Option(root.listFiles()).exists(_.exists(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))) &&
        java.nio.file.Files.readString(marker.toPath) == fp
      if (!ok) {
        build.write.mode("overwrite").parquet(root.toString)
        java.nio.file.Files.writeString(marker.toPath, fp)
        ()
      }
    }
    spark.read.parquet(root.toString)
  }

  /** Drop every staged layout for `dir` — belt-and-braces for callers
    * that rebuild source tables in place (the fingerprint gate already
    * catches this; explicit invalidation keeps the soak's rebuild hook
    * uniform across all derived-layout owners). */
  private[graft] def invalidate(dir: String): Unit = lock.synchronized {
    val root = sourceRoot(dir)
    if (root.exists()) deleteRecursively(root)
  }
}
