package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extensions entry point for cluster deployments:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * }}}
  *
  * injects [[MaterializeHofDependencies]] into the optimizer. The harness
  * mains (Verify/Bench/PlanAudit) and the test session attach the same rule
  * through `spark.experimental.extraOptimizations`, so every oracle-checked
  * query in the contract suite runs WITH the rule — its correctness is
  * gated by the full DuckDB compare, not just its own spec. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => MaterializeHofDependencies)
}
