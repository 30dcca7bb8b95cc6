package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over (key, start, end) tables — the "gaps and islands"
  * family downstream of sessionization (the reference's sessions are
  * exactly such intervals; README.md:42-50 motivates total-time-per-visitor
  * analytics, which needs overlap-free coverage when sessions can overlap,
  * e.g. multi-device visitors sharing one ip key).
  */
object Intervals {

  /** Merge overlapping or touching intervals per key (interval union).
    *
    * Sweep-line as windows: order each key's intervals by (start, end),
    * take the running max end over all STRICTLY PRECEDING rows; a row
    * starts a new island iff its start is strictly greater than that max
    * (so `[0,5) [5,9)` — touching — merge; use `>=` semantics upstream by
    * shrinking ends if touching must not merge). The island id is the
    * running count of new-island flags; one aggregate then collapses each
    * island to its extent.
    *
    * Scale shape: one key-hashed shuffle for the ordered window (running
    * max and running sum are O(1) state per row), reused by the final
    * (key, island) aggregate — no self-join, no explode, nothing
    * quadratic in intervals per key. Output is bounded by input rows.
    */
  def mergeOverlaps(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val runs = df
      .withColumn("__new", when(
        prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    runs
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol))
      .drop("__island")
  }

  /** Per-key coverage summary of the merged union: number of disjoint
    * islands and total covered length (Σ end−start). Same plan as
    * [[mergeOverlaps]] plus one more key-hashed aggregate. */
  def coverage(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame =
    mergeOverlaps(df, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col(endCol) - col(startCol)).as("covered"))
}
