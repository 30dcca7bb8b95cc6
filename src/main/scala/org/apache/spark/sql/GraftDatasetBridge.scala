package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Public bridge to the package-private `Dataset.ofRows` — the standard
  * pattern for libraries that construct custom [[LogicalPlan]] nodes and
  * need a DataFrame handle back (see SNIPPETS.md [2]/[3]: the same shim in
  * Pathling's `ColumnDataset` and Qbeast's `DatasetFactory`). This is the
  * ONLY member of the library living outside the `graft` package, and it
  * adds no behavior — one delegating call. */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
