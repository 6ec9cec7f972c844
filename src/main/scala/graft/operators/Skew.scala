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
}
