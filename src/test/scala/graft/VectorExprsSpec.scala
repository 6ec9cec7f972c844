package graft

import graft.functions.VectorExprs.{dot_product, l2_norm}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Native codegen expressions must agree exactly with the interpreted
  * higher-order-function formulations they replaced (same sequential fold
  * order → bit-identical doubles). */
class VectorExprsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSession.spark

  private lazy val vecs = graft.Tables.embeddings(spark, GraftTestSession.Sf0001)
    .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
    .limit(100)

  test("l2_norm == sqrt(aggregate(v, x*x))") {
    val both = vecs.select(
      l2_norm(col("v")).as("native"),
      sqrt(aggregate(col("v"), lit(0.0d), (a, x) => a + x * x)).as("hof"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("dot_product == aggregate(zip_with(a, b, *))") {
    val paired = vecs.limit(10).toDF("ia", "a")
      .crossJoin(vecs.limit(10).toDF("ib", "b"))
    val both = paired.select(
      dot_product(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x).as("hof"))
      .collect()
    assert(both.length == 100)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("dot_product of mismatched lengths is null, not garbage") {
    val df = spark.sql(
      "SELECT array(1.0d, 2.0d) AS a, array(1.0d, 2.0d, 3.0d) AS b")
    assert(df.select(dot_product(col("a"), col("b"))).head().isNullAt(0))
  }

  test("expressions run inside whole-stage codegen") {
    val df = vecs.select(l2_norm(col("v")).as("n"))
    df.collect() // force execution so codegen stages materialize
    // codegen stages appear as "*(n)" markers in the simple plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(500))
  }
}
