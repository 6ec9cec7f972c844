package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity retail pipeline (customer segmentation input stage).
  *
  * Re-expresses the reference's data stage as a single declarative Spark plan:
  *  - load + clean (reference `src/data.rs:97-130`)
  *  - RFM feature aggregation (reference `src/data.rs:147-191`)
  *
  * Semantics preserved exactly:
  *  - Clean filter `Quantity > 0 AND UnitPrice > 0 AND CustomerID IS NOT NULL`
  *    (reference `src/data.rs:106-112`). Cancellations (`C`-prefixed invoices)
  *    carry negative quantities, so no string predicate is needed — the
  *    executed reference predicate is exactly this numeric one.
  *  - `InvoiceDate` parsed with `MM/dd/yyyy HH:mm:ss` (reference
  *    `src/data.rs:115-123`); already-typed timestamp columns pass through.
  *  - `TotalAmount = Quantity * UnitPrice` (reference `src/data.rs:124`).
  *  - Recency in fractional days from a configurable reference date, default
  *    2011-12-09T00:00:00Z (reference `src/data.rs:98-99`), via epoch
  *    arithmetic `(ref_µs − max(InvoiceDate)_µs)/1e6/86400` (reference
  *    `src/data.rs:166-169`).
  *  - Frequency = exact distinct invoice count cast to double (reference
  *    `src/data.rs:158-161`); Monetary = sum of TotalAmount (`src/data.rs:163`).
  *  - Post-aggregation HAVING filter `Recency >= 0 AND Frequency > 0 AND
  *    Monetary > 0` (reference `src/data.rs:177-183`).
  *
  * Scale notes: the whole stage is one narrow scan + one hash aggregate keyed
  * on CustomerID — the only shuffle. At 100 TB the aggregate runs map-side
  * partial first (Spark's default HashAggregate partial/final split), so the
  * exchange carries one row per (partition, customer), not per transaction.
  */
object Retail {

  /** Explicit input schema — deterministic, no inference pass (the reference
    * infers from 10k rows with `ignore_errors`; PERMISSIVE mode reproduces the
    * malformed-row-to-null tolerance, reference `src/data.rs:103-104`). */
  val retailSchema: StructType = StructType(Seq(
    StructField("InvoiceNo", StringType),
    StructField("StockCode", StringType),
    StructField("Description", StringType),
    StructField("Quantity", IntegerType),
    StructField("InvoiceDate", StringType),
    StructField("UnitPrice", DoubleType),
    StructField("CustomerID", LongType),
    StructField("Country", StringType)))

  /** Default reference date — reference `src/data.rs:98-99`. */
  val DefaultReferenceDate = "2011-12-09T00:00:00Z"

  /** Lazy CSV scan with malformed-row tolerance (reference `src/data.rs:102-105`). */
  def loadCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", true)
      .option("mode", "PERMISSIVE")
      .schema(retailSchema)
      .csv(path)

  /** Clean + derive stage (reference `src/data.rs:106-126`).
    * Accepts either a string `InvoiceDate` (parsed `MM/dd/yyyy HH:mm:ss`,
    * falling back to ISO `yyyy-MM-dd'T'HH:mm:ss` as the reference's
    * integration fixtures use — `tests/integration.rs:17`) or an
    * already-typed timestamp column (parquet pass-through). */
  def cleanTransactions(raw: DataFrame): DataFrame = {
    val ts = raw.schema("InvoiceDate").dataType match {
      case _: TimestampType => col("InvoiceDate")
      case _ => coalesce( // try_: ANSI mode must not abort on the other format
        try_to_timestamp(col("InvoiceDate"), lit("MM/dd/yyyy HH:mm:ss")),
        try_to_timestamp(col("InvoiceDate"), lit("yyyy-MM-dd'T'HH:mm:ss")))
    }
    raw
      .filter(col("Quantity") > 0 && col("UnitPrice") > 0.0 &&
        col("CustomerID").isNotNull)
      .withColumn("InvoiceDate", ts)
      .withColumn("TotalAmount", col("Quantity") * col("UnitPrice"))
  }

  /** RFM aggregation (reference `src/data.rs:147-191`).
    * @param referenceDate ISO instant used as "now" for Recency. */
  def rfmFeatures(clean: DataFrame,
                  referenceDate: String = DefaultReferenceDate): DataFrame = {
    val refMicros = java.time.Instant.parse(referenceDate).toEpochMilli * 1000L
    clean
      .groupBy(col("CustomerID"))
      .agg(
        max(col("InvoiceDate")).as("LastPurchaseDate"),
        countDistinct(col("InvoiceNo")).cast(DoubleType).as("Frequency"),
        sum(col("TotalAmount")).as("Monetary"))
      .withColumn("Recency",
        ((lit(refMicros) - unix_micros(col("LastPurchaseDate")))
          .cast(DoubleType) / 1000000.0 / 86400.0))
      .select(col("CustomerID"), col("Recency"), col("Frequency"), col("Monetary"))
      .filter(col("Recency") >= 0 && col("Frequency") > 0 && col("Monetary") > 0)
  }

  /** Full load: CSV path → RFM features (reference `load_and_process_data`,
    * `src/data.rs:97-130` + `src/data.rs:147-191`). Empty-input guards
    * (reference `src/data.rs:128-130`, `src/data.rs:186-188`) are surfaced
    * lazily by [[requireNonEmpty]] so callers control when the action runs. */
  def loadAndProcess(spark: SparkSession, path: String,
                     referenceDate: String = DefaultReferenceDate): DataFrame =
    rfmFeatures(cleanTransactions(loadCsv(spark, path)), referenceDate)

  /** Reference empty-result guard (`src/data.rs:128-130`, `186-188`). */
  def requireNonEmpty(df: DataFrame, stage: String): DataFrame = {
    if (df.isEmpty)
      throw new IllegalArgumentException(s"No valid data after $stage")
    df
  }
}
