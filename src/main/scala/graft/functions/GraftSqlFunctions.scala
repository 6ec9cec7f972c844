package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL bindings for the native Catalyst expressions — the piece that makes
  * the engine's custom functions first-class for SQL-only users
  * (`spark.sql("SELECT graft_dot(a.v, b.v) ...")`), not just for the Scala
  * DataFrame API. Registered two ways with the same builders:
  *
  *  - cluster deployments get them from
  *    `spark.sql.extensions=graft.plans.GraftExtensions` (injectFunction);
  *  - an already-built session (the harness mains, tests, notebooks
  *    attaching to a running session) calls [[register]], which installs
  *    into the session's FunctionRegistry — idempotent, replace-on-repeat.
  *
  * Because the bindings resolve to the SAME codegen'd expressions as the
  * Scala wrappers ([[VectorExprs]], [[SpatialExprs]]), the SQL spelling
  * stays inside WholeStageCodegen — no UDF wrapping, no interpreted HOFs.
  */
object GraftSqlFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** (name, info, builder) triples — the exact shape
    * `SparkSessionExtensions.injectFunction` consumes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(VectorExprs.getClass.getName, "graft_dot",
        "graft_dot(a, b) - dot product of two array<double> columns " +
          "(codegen'd sequential fold; null on length mismatch)"),
      { args: Seq[Expression] =>
        arity("graft_dot", args, 2)
        VectorExprs.DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(VectorExprs.getClass.getName, "graft_l2norm",
        "graft_l2norm(a) - Euclidean norm of an array<double> column " +
          "(codegen'd sequential fold)"),
      { args: Seq[Expression] =>
        arity("graft_l2norm", args, 1)
        VectorExprs.L2Norm(args(0))
      }),
    (FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(SpatialExprs.getClass.getName, "graft_hilbert",
        "graft_hilbert(x, y, bits) - Hilbert-curve index of (x, y) on the " +
          "2^bits grid; bits must be a literal INT in [1, 31]"),
      { args: Seq[Expression] =>
        arity("graft_hilbert", args, 3)
        SpatialExprs.HilbertIndex(args(0), args(1),
          intLit(args(2), "graft_hilbert"))
      }))

  /** Install the functions into an existing session. Safe to call more than
    * once (registerFunction replaces). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, info, builder) =>
      reg.registerFunction(name, info, builder)
    }
  }
}
