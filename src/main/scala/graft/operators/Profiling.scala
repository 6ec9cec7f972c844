package graft.operators

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling operator: per-column null counts, exact distinct
  * cardinality and min/max over a table — the validation pass a pipeline
  * runs before training data is trusted.
  *
  * Scale shape: one NARROW scan per column, unioned — deliberately NOT the
  * single Expand-based multi-distinct (q08/q19's shape). With k mixed
  * string/long columns the Expand plan inflates the shuffle ×k AND falls
  * back to SortAggregate over the expanded rows (string min/max keys defeat
  * the mutable hash-agg buffer), measured 10 s at sf0.1 vs ~1 s for this
  * plan. On columnar storage the union reads each column exactly once — the
  * same total I/O as one wide scan.
  *
  * Each branch is `groupBy(value).count` (two-phase HASH aggregate with
  * map-side partials — the only per-row work) and then derives ALL the
  * metrics from the distinct-value table: n_rows = Σcnt, n_null = cnt of
  * the null key, n_distinct = non-null key count, min/max over the keys.
  * The row-volume path never sorts; the residual sort-based aggregate runs
  * over the already-tiny distinct set.
  *
  * Only integer/string columns are profiled with min/max: double rendering
  * differs between engines ("1.0E7" vs "10000000.0"), which would break the
  * hash compare without saying anything about correctness. */
object Profiling {

  private val Cols =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")

  /** q98 — profile the six integer/string lineitem columns. Output: one row
    * per column (col_name, n_rows, n_null, n_distinct, min_s, max_s). */
  def profileLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    Cols.map { c =>
      li.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(col(c).isNull, col("cnt"))), lit(0L)).as("n_null"),
          count(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_s"),
          max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionAll _)
  }

  val profileLineitemSql: String = Cols.map { c =>
    s"""SELECT '$c' AS col_name, count(*) AS n_rows,
       |       count(*) - count($c) AS n_null,
       |       count(DISTINCT $c) AS n_distinct,
       |       CAST(min($c) AS VARCHAR) AS min_s,
       |       CAST(max($c) AS VARCHAR) AS max_s
       |FROM lineitem""".stripMargin
  }.mkString("\nUNION ALL\n")

  /** Benford's-law expected first-digit frequencies, log10(1+1/d), as
    * exact ppm literals — constants, so no transcendental runs in either
    * engine. */
  private val BenfordPpm: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L,
      45757L)

  /** q123 — Benford first-digit screen over order totals (the standard
    * numeric-forgery / data-corruption tripwire in data-quality suites):
    * per leading digit of the price in cents, the observed count, observed
    * share in exact ppm, the Benford expectation, and the absolute
    * deviation. A synthetic-uniform or fat-fingered column jumps out as a
    * large dev_ppm; the screen itself is one narrow map + a 9-row
    * aggregate, scan-speed at any size.
    *
    * ALWAYS emits all nine digits: the observed counts left-join a 9-row
    * digit domain, so a digit absent from the data surfaces as n = 0 with
    * its full expected share as deviation — a pathologically skewed column
    * (every price starting with 1) must show eight loud zero rows, not
    * silently drop them.
    *
    * The leading digit comes from the STRING of the exact long cents —
    * integer-to-string is engine-stable where double formatting is not. */
  def benfordScreen(spark: SparkSession, dir: String): DataFrame = {
    val cents = Rfm.cents(col("o_totalprice"))
    // reduceRight: otherwise() only applies to a when()-column, so the
    // chain must nest to the right
    val expected = BenfordPpm.zipWithIndex
      .map { case (p, i) => when(col("digit") === (i + 1).toLong, lit(p)) }
      .reduceRight((w, rest) => w.otherwise(rest))
    val counts = Tables.orders(spark, dir)
      .filter(cents > 0)
      .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    spark.range(1, 10).select(col("id").as("digit"))
      .join(counts, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .select(col("digit"), col("n"),
        floor(col("n") * lit(1000000L) / col("total")).cast("long")
          .as("obs_ppm"),
        expected.as("benford_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
  }

  val benfordScreenSql: String = {
    val cases = BenfordPpm.zipWithIndex
      .map { case (p, i) => s"WHEN digit = ${i + 1} THEN $p" }
      .mkString(" ")
    s"""WITH digits AS (
       |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
       |                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM orders
       |  WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
       |), raw AS (
       |  SELECT digit, count(*) AS n FROM digits GROUP BY digit
       |), counts AS (
       |  SELECT d.digit, COALESCE(r.n, 0) AS n
       |  FROM (SELECT unnest(range(1, 10)) AS digit) d
       |  LEFT JOIN raw r ON d.digit = r.digit
       |)
       |SELECT digit, n,
       |       CAST(floor(n * 1000000 / (SELECT sum(n) FROM counts))
       |            AS BIGINT) AS obs_ppm,
       |       CAST(CASE $cases END AS BIGINT) AS benford_ppm,
       |       abs(CAST(floor(n * 1000000 / (SELECT sum(n) FROM counts))
       |                AS BIGINT) - CAST(CASE $cases END AS BIGINT))
       |         AS dev_ppm
       |FROM counts""".stripMargin
  }
}
