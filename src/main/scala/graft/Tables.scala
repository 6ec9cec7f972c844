package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Parquet table loaders for the driver testdata star schema.
  *
  * All readers take the scale-factor directory explicitly so the same code
  * serves sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, at
  * production scale, any partitioned table root. Reads are plain
  * `spark.read.parquet`, which keeps column pruning and filter pushdown
  * available to Catalyst (verified via `.explain` — see PlanAudit).
  */
object Tables {
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 only
    * reads as a raw long under `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set by Verify/Bench/tests). Converted here to a micro-precision
    * timestamp via integer division — a double-division path would lose
    * precision above 2^53 ns. DuckDB's `CAST(ts AS TIMESTAMP)` truncates the
    * same way, keeping oracle parity. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
}
