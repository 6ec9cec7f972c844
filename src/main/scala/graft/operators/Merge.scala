package graft.operators

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Upsert (SCD-type-1 MERGE) expressed relationally: the engine's answer to
  * `MERGE INTO target USING updates ON key WHEN MATCHED UPDATE / WHEN NOT
  * MATCHED INSERT`. Table-format engines (Delta/Iceberg) push this into a
  * transactional rewrite; the *dataflow* is exactly one full-outer join on
  * the key plus coalesce per column, which is what this operator pins down.
  *
  * Scale notes: one hash exchange per side on the merge key — the minimum
  * possible for an upsert. No row explosion: |result| = |target ∪ updates|.
  * When the update batch is small (the common CDC case) Spark's AQE
  * broadcast-converts the join and the target never shuffles at all.
  */
object Merge {

  /** q82 — deterministic CDC batch derived from `customer` itself:
    * every custkey ≡ 3 (mod 10) gets a +500.00 balance update, and every
    * custkey ≡ 0 (mod 97) spawns a brand-new customer (key + 10_000_000)
    * carrying its balance. Output: the merged table with per-row `action`
    * ('update' / 'insert' / 'keep') so the oracle checks the full merge
    * semantics, not just counts. Balances ride the exact long-cents path. */
  def upsertCustomers(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"),
        Rfm.cents(col("c_acctbal")).as("bal_c"),
        col("c_mktsegment").as("mktsegment"))
    val updates = base.filter(col("custkey") % 10 === 3)
      .select(col("custkey"), (col("bal_c") + 50000L).as("new_bal_c"))
      .unionAll(base.filter(col("custkey") % 97 === 0)
        .select((col("custkey") + 10000000L).as("custkey"),
          col("bal_c").as("new_bal_c")))
    base.join(updates, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        coalesce(col("new_bal_c"), col("bal_c")).as("bal_c"),
        coalesce(col("mktsegment"), lit("NEW")).as("mktsegment"),
        when(col("new_bal_c").isNotNull && col("bal_c").isNotNull, "update")
          .when(col("bal_c").isNull, "insert")
          .otherwise("keep").as("action"))
  }

  val upsertCustomersSql: String =
    """WITH base AS (
      |  SELECT c_custkey AS custkey,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
      |         c_mktsegment AS mktsegment
      |  FROM customer
      |), updates AS (
      |  SELECT custkey, bal_c + 50000 AS new_bal_c FROM base
      |  WHERE custkey % 10 = 3
      |  UNION ALL
      |  SELECT custkey + 10000000 AS custkey, bal_c AS new_bal_c FROM base
      |  WHERE custkey % 97 = 0
      |)
      |SELECT coalesce(b.custkey, u.custkey) AS custkey,
      |       coalesce(u.new_bal_c, b.bal_c) AS bal_c,
      |       coalesce(b.mktsegment, 'NEW') AS mktsegment,
      |       CASE WHEN u.new_bal_c IS NOT NULL AND b.bal_c IS NOT NULL
      |              THEN 'update'
      |            WHEN b.bal_c IS NULL THEN 'insert'
      |            ELSE 'keep' END AS action
      |FROM base b FULL OUTER JOIN updates u ON b.custkey = u.custkey""".stripMargin
}
