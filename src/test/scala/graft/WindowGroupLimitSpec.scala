package graft

/** Plan-quality pin: Spark's WindowGroupLimit optimization (rank-filter
  * pushdown, SPARK-37099) must fire for the repo's top-k-per-key window
  * queries — it inserts a per-partition group-limit BELOW the shuffle, so
  * each map task forwards at most k rows per key instead of every row
  * through the full sort+window. This is the plan property that keeps
  * rank<=k queries scale-safe; a regression (e.g. a non-pushable frame or
  * a filter form the rule doesn't match) would silently revert to full
  * window materialization. */
class WindowGroupLimitSpec extends SparkFunSuite {

  test("q_window_rank plans a WindowGroupLimit below the shuffle") {
    val df = SparkEntry.queries("q_window_rank")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("WindowGroupLimit"), plan)
    // the partial (pre-shuffle) instance is the scale-relevant one
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"expected Partial AND Final WindowGroupLimit:\n$plan")
  }

  test("q_topk_orders plans TakeOrderedAndProject (global top-k, no total sort)") {
    val df = SparkEntry.queries("q_topk_orders")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
