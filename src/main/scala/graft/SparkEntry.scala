package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed done in SURVEY §2 has a `queries` entry; every
  * SQL-expressible one also has a DuckDB `oracleSql` entry with identical
  * column names and deterministic arithmetic (see [[graft.operators.Rfm]]
  * scaladoc for the float-determinism strategy).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Rfm.rfmOrders(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q04_rfm" -> ((s, dir) => Rfm.rfmOrders(s, dir)),
    "q05_rfm_lineitem" -> ((s, dir) => Rfm.rfmLineitem(s, dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q04_rfm" -> Rfm.rfmOrdersSql,
    "q05_rfm_lineitem" -> Rfm.rfmLineitemSql,
  )
}
