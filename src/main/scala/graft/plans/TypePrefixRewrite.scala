package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Or, RLike, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite anchored literal regex matches into sargable
  * prefix predicates.
  *
  * The reference constructs `^prefix` (and `^a|^b`) regexes for its type
  * search so MongoDB can still use the type index
  * (server/src/main.rs:287-294). On Spark, `RLike` is a black box to the
  * parquet scan — no pushdown, no min/max skipping — while `StartsWith`
  * pushes down to the reader. This rule recovers index-friendliness for
  * users who port their regex-shaped queries verbatim:
  *
  *   rlike(type_full, '^0x2::coin')          → startswith(type_full, '0x2::coin')
  *   rlike(type_full, '^0x2::a|^0x3::b')     → startswith OR startswith
  *
  * Only fires when every alternation branch is `^` + a regex-metacharacter-
  * free literal — anything else is left untouched.
  */
object TypePrefixRewrite extends Rule[LogicalPlan] {

  private val Meta = "\\.[]{}()*+?$|".toSet

  /** Split an alternation of anchored literals; None if not rewritable. */
  def anchoredLiterals(pattern: String): Option[Seq[String]] = {
    // limit = -1 keeps trailing empty branches: '^a|' matches EVERYTHING
    // (empty alternative) and must not be rewritten to a prefix match.
    val branches = pattern.split("\\|", -1)
    val ok = branches.nonEmpty && branches.forall { b =>
      b.length > 1 && b.head == '^' && b.drop(1).forall(c => !Meta.contains(c) && c != '^')
    }
    if (ok) Some(branches.toSeq.map(_.drop(1))) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case r @ RLike(left, Literal(pattern: UTF8String, StringType)) =>
      anchoredLiterals(pattern.toString) match {
        case Some(prefixes) =>
          prefixes
            .map(p => StartsWith(left, Literal(p)): Expression)
            .reduce(Or(_, _))
        case None => r
      }
  }

  /** Runtime attachment for an existing session (tests, REPL). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(TypePrefixRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TypePrefixRewrite
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` wires the engine's
  * Catalyst extensions into any session at build time: the prefix-rewrite
  * rule and the graft_dot codegen expression. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => TypePrefixRewrite)
    ext.injectFunction(graft.functions.GraftFunctions.dotFunctionDescription)
    ext.injectFunction(graft.functions.GraftFunctions.minhashFunctionDescription)
    ext.injectFunction(graft.functions.GraftFunctions.simhashFunctionDescription)
    ext.injectFunction(graft.functions.GraftFunctions.shinglesFunctionDescription)
    ext.injectFunction(graft.functions.GraftFunctions.posShinglesFunctionDescription)
    ext.injectFunction(graft.functions.GraftFunctions.nearestFunctionDescription)
  }
}
