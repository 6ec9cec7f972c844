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

  test("SQL bindings resolve to the same expressions as the Scala API " +
    "(graft_dot / graft_l2norm / graft_hilbert)") {
    graft.functions.GraftSqlFunctions.register(spark)
    graft.functions.GraftSqlFunctions.register(spark) // idempotent re-register
    vecs.limit(10).toDF("ia", "a")
      .crossJoin(vecs.limit(10).toDF("ib", "b"))
      .createOrReplaceTempView("ve_pairs")
    val both = spark.sql(
      "SELECT graft_dot(a, b) AS d_sql, graft_l2norm(a) AS n_sql, a, b " +
        "FROM ve_pairs")
      .select(col("d_sql"), col("n_sql"),
        dot_product(col("a"), col("b")).as("d_api"),
        l2_norm(col("a")).as("n_api"))
      .collect()
    assert(both.length == 100)
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(2))
      assert(r.getDouble(1) == r.getDouble(3))
    }
    val h = spark.sql(
      "SELECT graft_hilbert(3L, 5L, 8) AS hs").head().getLong(0)
    val hApi = spark.range(1).select(
      graft.functions.SpatialExprs.hilbert_index(lit(3L), lit(5L), 8).as("h"))
      .head().getLong(0)
    assert(h == hApi)
    // non-literal bits must fail at analysis, not produce silent garbage
    val err = intercept[Exception](
      spark.sql("SELECT graft_hilbert(3L, 5L, CAST(id AS INT)) FROM range(1)")
        .collect())
    assert(err.getMessage.contains("literal INT"), err.getMessage.take(200))
  }
}
