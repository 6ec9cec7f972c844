package graft.operators

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling operator: per-column null counts, exact distinct
  * cardinality and min/max over a table — the validation pass a pipeline
  * runs before training data is trusted.
  *
  * Scale shape: ONE pass over the table. The multi-column exact distincts
  * compile to a single Expand-based aggregate (the q08/q19 shape — the
  * scale-correct plan: ×k row expansion in the map stage beats k separate
  * scans of a 100 TB table), and the per-column min/max/null counters ride
  * the same aggregate. The wide 1-row result is then unpivoted driver-free
  * with `stack`.
  *
  * Only integer/string columns are profiled with min/max: double rendering
  * differs between engines ("1.0E7" vs "10000000.0"), which would break the
  * hash compare without saying anything about correctness. */
object Profiling {

  private val Cols =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")

  /** q98 — profile the six integer/string lineitem columns. Output: one row
    * per column (col_name, n_rows, n_null, n_distinct, min_s, max_s). */
  def profileLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val aggs = count(lit(1)).as("n_rows") +: Cols.flatMap { c =>
      Seq((count(lit(1)) - count(col(c))).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val wide = li.agg(aggs.head, aggs.tail: _*)
    val stackArgs = Cols.map { c =>
      s"'$c', nn_$c, nd_$c, mn_$c, mx_$c"
    }.mkString(", ")
    wide.select(col("n_rows"), expr(
      s"stack(${Cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_s, max_s)"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  val profileLineitemSql: String = Cols.map { c =>
    s"""SELECT '$c' AS col_name, count(*) AS n_rows,
       |       count(*) - count($c) AS n_null,
       |       count(DISTINCT $c) AS n_distinct,
       |       CAST(min($c) AS VARCHAR) AS min_s,
       |       CAST(max($c) AS VARCHAR) AS max_s
       |FROM lineitem""".stripMargin
  }.mkString("\nUNION ALL\n")
}
