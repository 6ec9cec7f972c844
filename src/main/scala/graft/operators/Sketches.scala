package graft.operators

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable-sketch surface: pre-aggregated HyperLogLog sketches that can be
  * stored, shipped, and unioned later — the 100 TB pattern for distinct
  * counting where the raw data is touched ONCE and every downstream rollup
  * (per type, per week, global, cross-dataset) merges constant-size sketch
  * buffers instead of rescanning.
  *
  * Uses Spark's Apache DataSketches-backed `hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate` (binary-compatible with the
  * DataSketches ecosystem, so sketches survive parquet round-trips to other
  * engines). Distinct from [[Relational.approxDistinct]], which estimates
  * inline with HLL++ but never materializes a reusable sketch. */
object Sketches {

  /** q85 — two-level sketch pipeline over events: (day × type) sketches of
    * distinct users — the shape you'd persist — then a type-level merge via
    * `hll_union_agg` WITHOUT re-reading events. Output per event type:
    * merged-estimate, max single-day estimate, and day count. Deterministic
    * for a fixed dataset (DataSketches HLL is hash-based, not sampled), but
    * not SQL-expressible in DuckDB → invariant spec + rows-only driver
    * check, like q19. */
  def hllUserSketches(spark: SparkSession, dir: String,
                      lgConfigK: Int = 12): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts").cast(TimestampType)).as("day"),
        col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgConfigK)).as("sk"))
    daily.groupBy(col("event_type"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est_users"),
        max(hll_sketch_estimate(col("sk"))).as("max_daily_est"),
        count(lit(1)).cast(LongType).as("n_days"))
  }

  /** q97 — Count-Min-Sketch heavy hitters over `events.user_id`: the
    * sketch answers point frequency queries in O(depth) with bounded
    * overestimate (`est ≤ true + ε·N` w.p. ≥ δ), never underestimating —
    * THE structure for frequency estimation when the key space is too big
    * for an exact groupBy. Built through Spark's public
    * `df.stat.countMinSketch` (one distributed pass, commutative integer
    * merge of per-partition sketches → deterministic for a fixed seed
    * regardless of partition order), then every key's estimate is emitted
    * next to its exact count so the error contract is *visible in the
    * output* and pinned by the spec. Not SQL-expressible → rows-only
    * driver check + invariant spec, like q19/q85.
    *
    * At 100 TB the exact side of this query is the thing you CANNOT run
    * (that's the point of the sketch); it exists here as the ground truth
    * the estimates are validated against at test scale. */
  /** One CMS broadcast per (session, dir, params): the sketch build is an
    * eager full-scan action and the broadcast lives for the session —
    * rebuilding per call (Bench runs each query 3×, Verify and PlanAudit
    * once more) would rescan events and leak one broadcast per invocation.
    * Same prepared-artifact pattern as the Bloom cache in CorpusFilters;
    * stopped sessions' entries are purged on access. */
  private val cmsCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (org.apache.spark.SparkContext,
      org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.CountMinSketch])]

  private def cmsSketch(spark: SparkSession, dir: String, eps: Double,
                        confidence: Double, seed: Int) = {
    cmsCache.filterInPlace { case (_, (sc, _)) => !sc.isStopped }
    cmsCache.getOrElseUpdate(
      (spark.sparkContext.applicationId, s"$dir:$eps:$confidence:$seed"), {
        val sketch = Tables.events(spark, dir)
          .stat.countMinSketch(col("user_id"), eps, confidence, seed)
        (spark.sparkContext, spark.sparkContext.broadcast(sketch))
      })._2
  }

  def cmsHeavyHitters(spark: SparkSession, dir: String,
                      eps: Double = 0.001, confidence: Double = 0.99,
                      seed: Int = 42): DataFrame = {
    val bc = cmsSketch(spark, dir, eps, confidence, seed)
    val est = udf((u: Long) => bc.value.estimateCount(u))
    Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("true_n"))
      .withColumn("est_n", est(col("user_id")))
  }

  /** q118 — mergeable approximate quantiles (Greenwald–Khanna via
    * `percentile_approx`): per event type, approximate p50/p95/p99 of
    * `value` at 1/accuracy relative-rank error, beside the EXACT
    * interpolated quantiles for error accounting. Completes the sketch
    * family (HLL distincts, CMS counts, Bloom membership — this is the
    * rank/quantile member): one pass, fixed-size state per group,
    * partial-aggregable — the shape that works when the exact sort-based
    * percentile (q17) is too expensive to run corpus-wide at 100 TB.
    *
    * The sketch's merged result can depend on partial-merge order, so the
    * contract query is rows-only; the spec bounds each approximation
    * against the exact value by the sketch's rank-error guarantee. */
  def approxQuantiles(spark: SparkSession, dir: String,
                      accuracy: Int = 1000): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      // both aggregates in ONE pass: neither is distinct-based, so they
      // share the hash aggregate — one scan, one exchange, no join
      .agg(expr(s"percentile_approx(value, array(0.5, 0.95, 0.99), $accuracy)")
        .as("approx_q"),
        expr("percentile(value, array(0.5, 0.95, 0.99))").as("exact_q"))
      .select(col("event_type"),
        round(element_at(col("approx_q"), 1), 6).as("p50"),
        round(element_at(col("approx_q"), 2), 6).as("p95"),
        round(element_at(col("approx_q"), 3), 6).as("p99"),
        round(element_at(col("exact_q"), 1), 6).as("p50_exact"),
        round(element_at(col("exact_q"), 2), 6).as("p95_exact"),
        round(element_at(col("exact_q"), 3), 6).as("p99_exact"))
}
