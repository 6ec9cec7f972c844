package graft.sources

import graft.Tables
import graft.operators.Rfm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC interchange lane: the engine's answer to "my upstream hands me ORC,
  * not parquet" — a second columnar container through the SAME declarative
  * pipeline, with pushdown and pruning intact.
  *
  * Spark's ORC source is a first-class DataSource V2 citizen: predicate
  * pushdown, column pruning, and partition-size splitting all work exactly
  * as for parquet, so at 100 TB an ORC lake needs no conversion step — the
  * scan-side economics (read only the projected columns' stripes, skip
  * stripes by min/max on the pushed predicate) are identical. The q234
  * contract gates BOTH fidelity and those economics: lineitem is staged to
  * ORC once per (session, dir), read BACK through the ORC reader with a
  * selective predicate, and aggregated; the oracle computes the same
  * aggregate from the original parquet in DuckDB — any loss, widening, or
  * reorder introduced by the ORC round-trip (timestamp affinity, decimal
  * scale, string encoding) breaks the hash. PlanAudit pins
  * `PushedFilters` on the ORC scan and the 3-column ReadSchema, so a
  * regression to filter-after-scan or full-width reads is caught even
  * while results stay right.
  */
object OrcInterchange {

  /** Stage lineitem's aggregation columns as an ORC dataset under tmp, once
    * per (session, dir) — same write-once discipline as
    * [[graft.operators.Bucketing]]: a stale-path check guards against tmp
    * cleanup, and the staged files carry a `_SUCCESS` marker so a
    * half-dead prior write is rewritten, not trusted. */
  /** Drop the staged ORC dataset for `dir` — for callers that rebuild the
    * source tables under an existing dir string (ScaleSoak factor
    * rebuilds); the marker would otherwise serve the previous build. */
  private[graft] def invalidateStage(dir: String): Unit = this.synchronized {
    val tag = graft.streaming.EventStreams.sanitize(dir)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_orc_lineitem_$tag").toFile
    if (p.exists()) rm(p)
  }

  private[graft] def ensureOrcStage(spark: SparkSession, dir: String): String = {
    val tag = graft.streaming.EventStreams.sanitize(dir)
    val path = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_orc_lineitem_$tag")
    def staged: Boolean =
      java.nio.file.Files.isRegularFile(path.resolve("_SUCCESS")) && {
        val ls = path.toFile.listFiles()
        ls != null && ls.exists(_.getName.endsWith(".orc"))
      }
    this.synchronized {
      if (!staged) {
        Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
            Rfm.cents(col("l_extendedprice")).as("price_cents"))
          .write.mode("overwrite").orc(path.toString)
      }
    }
    path.toString
  }

  /** q234 — returnflag totals for high-quantity lines, THROUGH the ORC
    * round-trip: every value the aggregate touches has crossed
    * parquet → ORC → reader. The `l_quantity >= 25` predicate must reach
    * the ORC scan as a pushed filter (PlanAudit), and the money sum rides
    * the exact long-cents chain ([[Rfm.cents]]) so the total is
    * order-independent at any parallelism. */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val staged = ensureOrcStage(spark, dir)
    spark.read.orc(staged)
      .filter(col("l_quantity") >= 25.0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(20,2)")).as("sum_qty"),
        sum(col("price_cents")).as("price_cents"))
      .select(col("l_returnflag"), col("n"),
        col("sum_qty").cast("double").as("sum_qty"), col("price_cents"))
  }

  val orcRoundTripSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |            AS BIGINT) AS price_cents
      |FROM lineitem WHERE l_quantity >= 25.0
      |GROUP BY l_returnflag""".stripMargin
}
