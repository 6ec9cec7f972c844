package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations — extension beyond the reference (SURVEY §2.6 lists them
  * absent there). Operands: big-spender custkeys (any order > 200k) vs
  * urgent-order custkeys. All three ops reduce to hash-based distinct
  * aggregation / semi-anti joins in Spark — same scaling story as any
  * keyed aggregate.
  */
object SetOps {

  private def bigSpenders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey").as("custkey"))

  private def urgent(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))

  def setUnion(spark: SparkSession, dir: String): DataFrame =
    bigSpenders(spark, dir).union(urgent(spark, dir)).distinct()

  val setUnionSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
      |UNION
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin

  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    bigSpenders(spark, dir).intersect(urgent(spark, dir))

  val setIntersectSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
      |INTERSECT
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin

  def setExcept(spark: SparkSession, dir: String): DataFrame =
    bigSpenders(spark, dir).except(urgent(spark, dir))

  val setExceptSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin
}
