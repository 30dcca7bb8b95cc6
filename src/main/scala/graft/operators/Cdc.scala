package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the change-data-capture step of a batch pipeline:
  * given two keyed snapshots of the same table, emit what changed
  * (`insert` / `delete` / `update` rows), e.g. to feed an incremental
  * downstream refresh instead of a full rebuild.
  *
  * One full-outer shuffle join on the key — both sides stream through
  * hash-partitioned, nothing driver-bound, so it holds at snapshot sizes
  * far beyond memory. Presence is tracked with explicit marker columns
  * (not value-null checks), so legitimately-NULL value columns diff
  * correctly; value comparison is null-safe (`<=>`). */
object Cdc {

  /** Rows that differ between `oldDf` and `newDf`, keyed by `keyCols`,
    * comparing `valueCols`. Output: coalesced keys, `old_<v>`/`new_<v>`
    * for each value column, and `op` ∈ insert | delete | update. */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keyCols and valueCols must be non-empty")
    val o = oldDf.select(
      keyCols.map(col) ++ valueCols.map(v => col(v).as(s"old_$v")) :+ lit(1).as("__old"): _*)
    val n = newDf.select(
      keyCols.map(col) ++ valueCols.map(v => col(v).as(s"new_$v")) :+ lit(1).as("__new"): _*)
    val changed = valueCols
      .map(v => !(col(s"old_$v") <=> col(s"new_$v")))
      .reduce(_ || _)
    o.join(n, keyCols, "full_outer")
      .withColumn(
        "op",
        when(col("__old").isNull, "insert")
          .when(col("__new").isNull, "delete")
          .when(changed, "update")
          .otherwise("same"))
      .filter(col("op") =!= "same")
      .drop("__old", "__new")
  }
}
