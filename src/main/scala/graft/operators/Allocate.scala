package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact integer allocation / proration. */
object Allocate {

  /** Largest-remainder proration: split each group's integer `totalCol`
    * across its rows proportionally to `weightCol`, so that the shares are
    * integers and SUM EXACTLY to the total (the invariant float proration
    * cannot give). Each row's base share is `⌊T·w/W⌋`; the leftover
    * `T − Σ base` (< group size) goes +1 each to the rows with the largest
    * remainders `(T·w) mod W`, ties broken by `tieCol` — the standard
    * seat-apportionment method, fully deterministic.
    *
    * All inputs must be non-negative BIGINTs (fixed-point upstream), so
    * truncating and floor division agree and any SQL engine replays the
    * arithmetic exactly. Watch T·w overflow: T and w must satisfy
    * T·max(w) < 2⁶³ — rescale weights upstream if not.
    *
    * Plan shape: one group-hashed exchange drives the weight-sum window,
    * the remainder-rank window, and the base-sum window — nothing leaves
    * the group's partition, no join. */
  def largestRemainder(
      df: DataFrame,
      groupCol: String,
      totalCol: String,
      weightCol: String,
      tieCol: String): DataFrame = {
    val byGroup = Window.partitionBy(col(groupCol))
    val t = col(totalCol)
    val w = col(weightCol)
    val withBase = df
      .withColumn("__W", sum(w).over(byGroup))
      .withColumn("__base", expr(s"($totalCol * $weightCol) div __W"))
      .withColumn("__rem", (t * w) % col("__W"))
    withBase
      .withColumn("__rank", row_number().over(
        byGroup.orderBy(col("__rem").desc, col(tieCol))))
      .withColumn("__leftover", t - sum(col("__base")).over(byGroup))
      .withColumn("alloc",
        col("__base") + when(col("__rank") <= col("__leftover"), 1L).otherwise(0L))
      .drop("__W", "__base", "__rem", "__rank", "__leftover")
  }
}
