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
}
