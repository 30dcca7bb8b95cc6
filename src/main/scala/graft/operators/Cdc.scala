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

  /** MERGE-style upsert: apply a keyed change set (upserts + delete
    * tombstones) to a base snapshot and emit every resulting row tagged
    * with its merge action — `keep` (base row untouched), `insert` (new
    * key), `update` (key present on both sides), `delete` (tombstone hit a
    * base row; value columns null). Tombstones for absent keys are no-ops
    * and emit nothing. This is the batch MERGE INTO under every
    * incremental-snapshot pipeline (the streaming counterpart is
    * MergeSink); downstream state = rows with op != 'delete'.
    *
    * Scale shape: ONE key-shuffled full-outer join (broadcast when the
    * change set is small — the common case for incremental loads) and a
    * narrow classification map; no window, no second exchange. */
  def mergeUpsert(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      deleteCol: String = "is_delete"): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keyCols and valueCols must be non-empty")
    val b = base.select(
      keyCols.map(col) ++ valueCols.map(v => col(v).as(s"base_$v")) :+ lit(1).as("__b"): _*)
    val c = changes.select(
      keyCols.map(col) ++ valueCols.map(v => col(v).as(s"chg_$v"))
        :+ col(deleteCol).as("__del") :+ lit(1).as("__c"): _*)
    val op = when(col("__c").isNull, "keep")
      .when(col("__del") && col("__b").isNotNull, "delete")
      .when(col("__del"), "noop") // tombstone for an absent key
      .when(col("__b").isNull, "insert")
      .otherwise("update")
    val out = valueCols.map(v =>
      when(col("op") === "keep", col(s"base_$v"))
        .when(col("op") === "delete", lit(null))
        .otherwise(col(s"chg_$v")).as(v))
    b.join(c, keyCols, "full_outer")
      .withColumn("op", op)
      .filter(col("op") =!= "noop")
      .select(keyCols.map(col) ++ Seq(col("op")) ++ out: _*)
  }

  /** Build a Type-2 slowly-changing dimension from a keyed change stream:
    * collapse consecutive rows whose tracked attributes are unchanged
    * (gaps-and-islands), then stamp each surviving version with
    * `valid_from` (its change time), `valid_to` (the NEXT version's change
    * time, null for the open version) and `is_current`.
    *
    * Ordering within a key is `(tsCol, tieCol)` — the tie column pins
    * equal-timestamp changes deterministically; attribute comparison is
    * null-safe (`<=>`), and the first row per key always survives (checked
    * by row number, not by lag-null, so an initially-NULL attribute doesn't
    * get merged into a phantom predecessor).
    *
    * Scale shape: two key-partitioned windows (collapse, then lead for the
    * validity interval) over key-hashed data and nothing else — versions
    * never leave their key's partition, output is island-count-sized. */
  def scdType2(
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tieCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keyCols and attrCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol), col(tieCol))
    val unchanged = attrCols.map(a => lag(col(a), 1).over(w) <=> col(a)).reduce(_ && _)
    changes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__same", unchanged)
      .filter(col("__rn") === 1 || !col("__same"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols.map(col) ++ attrCols.map(col)
        :+ col("valid_from") :+ col("valid_to") :+ col("is_current"): _*)
  }

  /** Point-in-time ("as of") snapshot over a [[scdType2]] dimension: the
    * one version per key whose validity interval covers `ts`
    * (`valid_from <= ts < valid_to`, open version = null valid_to). Keys
    * whose first version starts after `ts` are absent — they did not
    * exist yet. A pure filter: no shuffle, no window; at 100 TB this is
    * the partition-prunable time-travel read path over a persisted SCD2
    * table. */
  def asOfSnapshot(scd2: DataFrame, ts: Long): DataFrame =
    scd2.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))
}
