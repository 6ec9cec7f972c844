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
  *  - money sums go through DECIMAL(18,2) (order-independent exact addition;
  *    doubles summed in different partition orders would drift in the last
  *    ulp), then cast back to double — bit-identical on both engines;
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

  /** Epoch-ms of a (possibly NTZ) timestamp column; session tz is pinned to
    * UTC so the NTZ→instant cast is the identity DuckDB's epoch_ms applies. */
  private[operators] def epochMs(c: org.apache.spark.sql.Column) =
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
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("monetary"))
      .crossJoin(broadcast(referenceMs(o)))
      .withColumn("recency",
        (col("ref_ms") - col("last_ms")).cast(DoubleType) / 86400000.0)
      .filter(col("recency") >= 0 && col("frequency") > 0 && col("monetary") > 0)
      .select(col("o_custkey").as("custkey"), col("recency"),
        col("frequency"), col("monetary"))
  }

  /** DuckDB oracle for [[rfmOrders]] — same arithmetic, same column names. */
  val rfmOrdersSql: String =
    """WITH ref AS (SELECT max(epoch_ms(o_orderdate)) + 86400000 AS ref_ms FROM orders),
      |agg AS (
      |  SELECT o_custkey AS custkey,
      |         max(epoch_ms(o_orderdate)) AS last_ms,
      |         CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS frequency,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      |  FROM orders GROUP BY o_custkey)
      |SELECT custkey,
      |       CAST(ref_ms - last_ms AS DOUBLE) / 86400000.0 AS recency,
      |       frequency, monetary
      |FROM agg CROSS JOIN ref
      |WHERE CAST(ref_ms - last_ms AS DOUBLE) / 86400000.0 >= 0
      |  AND frequency > 0 AND monetary > 0""".stripMargin

  /** Join-variant RFM: monetary from lineitem revenue
    * `sum(l_extendedprice*(1-l_discount))` with the P1-style clean filter
    * `l_quantity > 0` (SURVEY §7.2). Exercises a shuffle join on the natural
    * key plus the same group-aggregate; revenue is computed in DECIMAL so the
    * sum is order-independent. */
  def rfmLineitem(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 0)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(BigDecimal(1).setScale(2)).cast(DecimalType(3, 2)) -
            col("l_discount").cast(DecimalType(3, 2)))).as("revenue"))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(
        max(epochMs(col("o_orderdate"))).as("last_ms"),
        countDistinct(col("o_orderkey")).cast(DoubleType).as("frequency"),
        sum(col("revenue")).cast(DoubleType).as("monetary"))
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
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                  (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
      |              AS DOUBLE) AS monetary
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
