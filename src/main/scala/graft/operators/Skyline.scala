package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the points no other point dominates,
  * with `xCol` minimized and `yCol` maximized — e.g. cheapest-for-their-
  * recency orders, shortest-for-their-quality documents. Domination is
  * the standard non-strict-with-one-strict rule: q dominates p iff
  * q.x ≤ p.x ∧ q.y ≥ p.y ∧ (q.x < p.x ∨ q.y > p.y).
  *
  * Algorithm: after deduping to distinct (x, y) points (carrying the
  * multiplicity), sort by (x asc, y desc): every potential dominator of a
  * point precedes it, so a point is on the frontier iff its y strictly
  * exceeds the running max-y of all preceding points — one window, no
  * pair join.
  *
  * Scale shape: the naive formulation is a global sort. Here the frontier
  * is computed in TWO passes because skylines MERGE: pass 1 runs the
  * window per hash bucket (key-partitioned, parallel) — a point dominated
  * within its bucket is dominated globally, so survivors ⊇ frontier and
  * are frontier-sized per bucket; pass 2 reruns the same window globally
  * over the tiny survivor set. The full table never passes through one
  * partition (q_global_sort's range exchange would also work, but
  * local-prune + tiny-global is strictly less data moved). */
object Skyline {

  private def frontierFilter(df: DataFrame, part: Seq[Column], x: Column, y: Column): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(x.asc, y.desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__maxy", max(y).over(w))
      .filter(col("__maxy").isNull || col("__maxy") < y)
      .drop("__maxy")
  }

  /** Returns the distinct frontier points (xCol, yCol, n) where n is the
    * input multiplicity of that point. */
  def skyline2D(
      df: DataFrame,
      xCol: String,
      yCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val pts = df
      .groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).cast("long").as("n"))
    val local = frontierFilter(
      pts.withColumn("__b", pmod(hash(col(xCol), col(yCol)), lit(buckets))),
      Seq(col("__b")), col(xCol), col(yCol)).drop("__b")
    frontierFilter(local, Seq.empty, col(xCol), col(yCol))
  }
}
