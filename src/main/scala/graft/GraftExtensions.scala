package graft

import graft.functions.expressions.DotProductFloat
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

/** SparkSessionExtensions entry point: registers graft's native expressions
  * in the SQL function registry, so plain `spark.sql` can call them:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT dot_product_float(a.embedding, b.embedding) ...")
  * }}}
  *
  * Also installable on a live session via [[GraftExtensions.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotProductFloatDescriptor)
    // logical-plan optimization: thresholded levenshtein filters -> banded
    // early-exit form (see the rule's scaladoc for the rewrite + proof)
    e.injectOptimizerRule(_ => graft.plans.LevenshteinThresholdRule)
    // whole-operator custom plan: AsOfJoinPlan -> co-partitioned merge exec
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private val dotProductFloatDescriptor = (
    FunctionIdentifier("dot_product_float"),
    new ExpressionInfo(
      classOf[DotProductFloat].getName,
      null,
      "dot_product_float",
      "dot_product_float(a, b) - double-precision dot product of two array<float> columns (codegen'd).",
      ""),
    (children: Seq[Expression]) => {
      require(children.size == 2, "dot_product_float takes exactly 2 arguments")
      DotProductFloat(children.head, children(1))
    })

  /** Register on an already-built session (tests, driver-owned sessions):
    * the function goes into the registry directly; the optimizer rule rides
    * `experimental.extraOptimizations` (same rule object as the
    * builder-time `injectOptimizerRule` path, different attachment point —
    * a live session's optimizer cannot be extended any other way). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product_float",
      exprs => DotProductFloat(exprs.head, exprs(1)),
      "built-in")
    if (!spark.experimental.extraOptimizations.contains(graft.plans.LevenshteinThresholdRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LevenshteinThresholdRule
    // extraStrategies are consulted by the same planner AQE re-plans with
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}
