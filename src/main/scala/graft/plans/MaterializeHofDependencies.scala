package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule closing a real Spark performance trap, measured at 10× on
  * this repo's corpus operators (see BENCH.md round-3 note): higher-order
  * functions (`transform`, `filter`, `aggregate`, ...) evaluate their
  * lambdas INTERPRETED — outside whole-stage codegen and its subexpression
  * elimination — so an expensive expression inside a lambda body that does
  * not depend on the lambda variables (e.g. an inline `split(text, " ")`
  * referenced by `element_at` per gram position) is re-evaluated once per
  * array element instead of once per row.
  *
  * The rule rewrites each `Project` that contains such an expression: the
  * lambda-invariant expensive subtree is materialized as an attribute in an
  * injected child `Project`, and every semantically-equal occurrence in the
  * parent is replaced by the attribute reference. One evaluation per row,
  * by construction. The repo's operators already hand-apply this shape
  * (`Dedup.withWords`); the rule makes the engine enforce it for any query
  * a user writes.
  *
  * Scope and safety:
  *  - only deterministic, non-foldable subtrees whose references are fully
  *    covered by the child's output and that contain NO lambda variables —
  *    hoisting them cannot change semantics;
  *  - "expensive" is an explicit allowlist (string split, regex family,
  *    cryptographic/murmur/xx hashes, JSON path extraction) — the cases
  *    where per-element re-evaluation actually hurts;
  *  - only maximal candidates are hoisted (an md5 inside a hoisted regexp
  *    is carried along, not double-materialized);
  *  - idempotent: after the rewrite the lambda references a plain
  *    attribute, so the rule no-ops on its own output (required — the
  *    user-rule batch runs to fixpoint).
  *
  * Registered via [[GraftExtensions]] (`spark.sql.extensions`) for cluster
  * deployments; the harness mains attach it through
  * `spark.experimental.extraOptimizations`.
  */
object MaterializeHofDependencies extends Rule[LogicalPlan] {

  private def isExpensive(e: Expression): Boolean = e match {
    case _: StringSplit => true
    case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 => true
    case _: Murmur3Hash | _: XxHash64 => true
    case _: GetJsonObject | _: JsonToStructs => true
    case _ => e.getClass.getSimpleName.startsWith("RegExp")
  }

  private def containsLambdaVar(e: Expression): Boolean =
    e.exists(_.isInstanceOf[NamedLambdaVariable])

  /** Lambda-invariant expensive subtrees inside the HOF lambda bodies of
    * `expr`, maximal only. */
  private def candidates(expr: Expression, childOutput: AttributeSet): Seq[Expression] = {
    val found = expr.collect {
      case hof: HigherOrderFunction =>
        hof.functions.flatMap {
          case LambdaFunction(body, _, _) =>
            body.collect {
              case e if isExpensive(e) && e.deterministic && !e.foldable &&
                !containsLambdaVar(e) && e.references.subsetOf(childOutput) => e
            }
          case _ => Nil
        }
    }.flatten
    // keep maximal subtrees only (drop candidates nested inside another)
    found.filter(e => !found.exists(o => (o ne e) && o.exists(_ eq e)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList, child) =>
      val childOut = child.outputSet
      val raw = projectList.flatMap(ne => candidates(ne, childOut))
      // dedupe semantically-equal subtrees across the project list
      val distinctCands = raw.foldLeft(Seq.empty[Expression]) { (acc, e) =>
        if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
      }
      if (distinctCands.isEmpty) p
      else {
        val aliases = distinctCands.zipWithIndex.map { case (e, i) =>
          Alias(e, s"_hofMat$i")()
        }
        val replacement = aliases.map(a => (a.child, a.toAttribute))
        val rewritten = projectList.map { ne =>
          ne.transform {
            case e if replacement.exists(_._1.semanticEquals(e)) =>
              replacement.find(_._1.semanticEquals(e)).get._2
          }.asInstanceOf[NamedExpression]
        }
        Project(rewritten, Project(child.output ++ aliases, child))
      }
  }
}
