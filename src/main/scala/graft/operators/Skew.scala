package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for heavy-hitter keys.
  *
  * AQE's skew-join splitting handles most runtime skew on Spark 3.2+; these
  * are the explicit forms for the cases AQE cannot fix:
  *  - a single group key receiving a large fraction of all rows in a
  *    `groupBy` (AQE splits joins, not aggregations);
  *  - deterministic plans where runtime re-optimization is disabled.
  *
  * [[saltedAggregate]] implements the standard two-phase pattern: spray each
  * key across `saltBuckets` sub-keys, partially aggregate, then merge the
  * partials. Correct for any algebraic aggregate (sum/count/min/max);
  * the caller supplies both phases explicitly so non-trivial merges (e.g.
  * sum-of-counts) stay visible.
  */
object Skew {

  /** Deterministic salt in [0, saltBuckets) derived from a stable row
    * expression — NOT rand(): retries/speculative tasks must re-derive the
    * same salt or partial aggregates double-count. */
  def salt(stable: Column, saltBuckets: Int): Column =
    pmod(xxhash64(stable), lit(saltBuckets.toLong))

  /** Two-phase salted aggregation.
    *
    * @param df          input
    * @param key         skewed grouping column
    * @param stable      stable per-row expression the salt derives from
    * @param saltBuckets fan-out per key
    * @param partial     phase-1 aggregates over (key, salt)
    * @param merge       phase-2 aggregates over key, referencing phase-1
    *                    output columns by name
    */
  def saltedAggregate(df: DataFrame, key: Column, stable: Column,
                      saltBuckets: Int,
                      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", salt(stable, saltBuckets))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(merge.head, merge.tail: _*)
      .withColumnRenamed("__key", "key")

  /** q121 — the salted two-phase aggregate as an ORACLE-GATED contract
    * query: per-user event count and exact value sum (long cents) computed
    * through 8 salt buckets, oracle-compared against the plain one-phase
    * GROUP BY the salting must be indistinguishable from. This puts the
    * skew pattern itself — not just its spec — under the driver's
    * hash-exact gate: the sum rides integer cents, so the partial/merge
    * split cannot move a bit.
    *
    * Scale: this is the groupBy shape AQE cannot fix (it splits skewed
    * JOIN partitions, not aggregation groups); a heavy-hitter user_id
    * spreads across 8 sub-groups whose partials merge in a second,
    * key-count-sized exchange. */
  def saltedUserAgg(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame =
    saltedAggregate(
      graft.Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"),
          Rfm.cents(col("value")).as("v_c")),
      key = col("user_id"), stable = col("event_id"), saltBuckets = 8,
      partial = Seq(count(lit(1)).as("pn"), sum(col("v_c")).as("ps")),
      merge = Seq(sum(col("pn")).as("n"), sum(col("ps")).as("v_sum_c")))
      .withColumnRenamed("key", "user_id")

  val saltedUserAggSql: String =
    """SELECT user_id, count(*) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |         AS v_sum_c
      |FROM events GROUP BY user_id""".stripMargin

  /** q148 — join-key skew AUDIT + salting plan: the measurement step that
    * decides WHETHER the q121 mitigation (or AQE's skew-join split) is
    * needed, and at what fan-out. For every event key: its row count, its
    * exact corpus share in ppm, a heavy-hitter flag (share of one key
    * exceeding a fair 1/`parts` slice means at least one task receives more
    * than its share of that join/agg), and the salt fan-out that caps each
    * sub-key at `targetRows` (`ceil(n / targetRows)`, 1 for light keys).
    *
    * All-integer arithmetic (ppm via `n * 1e6 DIV total`) so the plan is
    * hash-exact cross-engine. Scale: one map-side-combined aggregate over
    * the fact table; the 1-row total joins back via broadcast — nothing
    * data-sized moves twice, which is what makes this runnable as a cheap
    * pre-flight on a 100 TB fact table. */
  def saltingPlan(spark: org.apache.spark.sql.SparkSession, dir: String,
                  targetRows: Long = 500, parts: Int = 32): DataFrame = {
    val counts = graft.Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(
        col("user_id"), col("n"),
        expr("n * 1000000 DIV total").as("share_ppm"),
        (col("n") * lit(parts.toLong) > col("total")).as("is_heavy"),
        expr(s"(n + ${targetRows - 1}) DIV $targetRows").as("salt_factor"))
  }

  def saltingPlanSql(targetRows: Long = 500, parts: Int = 32): String =
    s"""WITH counts AS (
       |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
       |), tot AS (SELECT sum(n) AS total FROM counts)
       |SELECT user_id, CAST(n AS BIGINT) AS n,
       |       CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
       |       n * $parts > total AS is_heavy,
       |       CAST((n + ${targetRows - 1}) // $targetRows AS BIGINT)
       |         AS salt_factor
       |FROM counts CROSS JOIN tot""".stripMargin
}
