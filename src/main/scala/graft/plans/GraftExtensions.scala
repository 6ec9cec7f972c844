package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extensions entry point for cluster deployments:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * }}}
  *
  * injects [[MaterializeHofDependencies]] into the optimizer,
  * [[GraftStrategies]] (the [[AsOfJoin]] planner) into the planner, and the
  * [[graft.functions.GraftSqlFunctions]] SQL bindings (graft_dot /
  * graft_l2norm / graft_hilbert) into the function registry. The
  * harness mains (Verify/Bench/PlanAudit) and the test session attach the
  * same rule/strategy through `spark.experimental.extraOptimizations` /
  * `extraStrategies` (and `GraftSqlFunctions.register`), so every
  * oracle-checked query in the contract suite runs WITH them — their
  * correctness is gated by the full DuckDB compare, not just their own
  * specs. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => MaterializeHofDependencies)
    ext.injectPlannerStrategy(_ => GraftStrategies)
    graft.functions.GraftSqlFunctions.functions.foreach(ext.injectFunction)
  }
}
