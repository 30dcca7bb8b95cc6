package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: as-of join and range
  * (interval-lookup) join. Both are expressed as compositions that keep the
  * whole plan shuffle-minimal and AQE-visible — no per-key loops, no
  * driver-side state, no cartesian products.
  *
  * The reference app has no joins at all (SURVEY.md §2.8); these cover the
  * "nearest prior event" / "value-in-range lookup" shapes every large-scale
  * event pipeline needs (attribution, tier lookup, config-as-of).
  */
object Temporal {

  /** As-of join: for each `left` row, attach the payload of the latest
    * `right` row with the same `key` and `right.time <= left.time`
    * ("last value at-or-before").
    *
    * Algorithm: tag both inputs with a side marker, union them, and take a
    * running `last(payload, ignoreNulls)` over a per-key window ordered by
    * `(time, side, tie)` — right rows sort before left rows at equal time,
    * so "at-or-before" is inclusive; among right rows with equal time the
    * largest `tie` wins. One hash shuffle on `key` + one sort: the same cost
    * as a sort-merge join, with no range-duplication or per-key iteration —
    * this is the 100 TB-safe shape (skewed keys split fine under AQE because
    * the window is order-dependent only within a key).
    *
    * Left rows with no prior right row get nulls in the payload columns.
    *
    * @param right      must contain `key`, `timeCol`, `tieCol`, and `payload`
    * @param payload    right columns to carry; emitted as `asof_<name>`
    * @param tieCol     per-row unique id on BOTH sides (determinism)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      timeCol: String,
      tieCol: String,
      payload: Seq[String]): DataFrame = {
    // The payload travels as ONE nullable struct so the window picks the
    // latest right ROW atomically — per-column last(ignoreNulls) would mix
    // fields from different right rows whenever a payload field is NULL.
    val payloadType = org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))
    val l = left
      .withColumn("__side", lit(1))
      .select(left.columns.map(col) ++ Seq(col("__side")) ++
        Seq(lit(null).cast(payloadType).as("__asof")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(timeCol), col(tieCol), col("__side")) ++
        left.columns.filterNot(Set(key, timeCol, tieCol)).map(c => lit(null).as(c)) ++
        Seq(struct(payload.map(p => col(p).as(p)): _*).as("__asof")): _*)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(timeCol), col("__side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col("__asof").getField(p).as(s"asof_$p")): _*)
  }

  /** As-of join through the custom whole-operator plan
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]):
    * identical semantics to [[asofJoin]] for non-null key/time rows
    * (latest at-or-before per key, largest-tie tie-break, null payload on
    * no match) — or, with `forward = true`, to [[asofJoinForward]]
    * (earliest at-or-after, smallest-tie). Null-key/null-time rows are the
    * one divergence: this exec always emits null payload for them, while
    * the window forms group null keys into one window partition so a
    * null-keyed left row CAN match a null-keyed right row (SQL window
    * PARTITION BY treats nulls as equal). The equivalence fuzz in
    * AsOfJoinExecSpec covers non-null keys. Different physical strategy: each side is
    * hash-clustered and sorted independently and a single-pass merge
    * tracks at most one candidate row per key, instead of sorting a
    * null-padded union through a window. Key/time/tie must be LongType.
    * Cross-checked row-for-row against both window forms in
    * AsOfJoinExecSpec. */
  def asofJoinMerge(
      left: DataFrame,
      right: DataFrame,
      key: String,
      timeCol: String,
      tieCol: String,
      payload: Seq[String],
      forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.LongType
    require(Seq(key, timeCol, tieCol).forall(c => right.schema(c).dataType == LongType) &&
      left.schema(key).dataType == LongType && left.schema(timeCol).dataType == LongType,
      "asofJoinMerge requires LongType key/time/tie columns")
    graft.GraftExtensions.install(left.sparkSession)
    val payloadAttrs = payload.map { p =>
      val f = right.schema(p)
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        s"asof_$p", f.dataType, nullable = true)()
    }
    val lPlan = left.queryExecution.analyzed
    // alias every right column: Alias mints fresh exprIds, so a self-join
    // (left and right derived from one scan) presents no duplicate
    // attributes — otherwise DeduplicateRelations re-aliases the right
    // child AFTER we resolved our references and they go stale (the
    // optimizer then prunes the right side to nothing)
    val rPlan = right
      .select((Seq(key, timeCol, tieCol) ++ payload).distinct.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    def attrOf(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val plan = graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      attrOf(lPlan, key), attrOf(lPlan, timeCol),
      attrOf(rPlan, key), attrOf(rPlan, timeCol), attrOf(rPlan, tieCol),
      payload.map(attrOf(rPlan, _)), payloadAttrs, forward)
    org.apache.spark.sql.GraftDatasetBridge.ofRows(left.sparkSession, plan)
  }

  /** Forward as-of join: for each `left` row, attach the payload of the
    * EARLIEST `right` row with the same `key` and `right.time >= left.time`
    * ("first value at-or-after" — the lead-time / next-event analogue of
    * [[asofJoin]]). Same union+window algorithm mirrored: left rows sort
    * BEFORE right rows at equal time, so "at-or-after" is inclusive, and a
    * running `first(payload, ignoreNulls)` over (currentRow →
    * unboundedFollowing) picks the earliest matching right row (smallest
    * `tie` among equal times). One shuffle + one sort, no per-key loops. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      timeCol: String,
      tieCol: String,
      payload: Seq[String]): DataFrame = {
    val payloadType = org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))
    val l = left
      .withColumn("__side", lit(0))
      .select(left.columns.map(col) ++ Seq(col("__side")) ++
        Seq(lit(null).cast(payloadType).as("__asof")): _*)
    val r = right
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(timeCol), col(tieCol), col("__side")) ++
        left.columns.filterNot(Set(key, timeCol, tieCol)).map(c => lit(null).as(c)) ++
        Seq(struct(payload.map(p => col(p).as(p)): _*).as("__asof")): _*)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(timeCol), col("__side"), col(tieCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("__asof", first(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(left.columns.map(col) ++
        payload.map(p => col("__asof").getField(p).as(s"asof_$p")): _*)
  }

  /** Nearest as-of join: the closer of the backward and forward matches
    * (ties to backward — "what already happened" beats "what is about to").
    * Both directions are computed over ONE union with two window specs that
    * share the key partitioning (one Exchange, two in-partition sorts —
    * the equal-time inclusivity of each direction needs its own side
    * ordering). The right row's time rides the payload struct so the
    * per-row distance compare is a column expression. */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      timeCol: String,
      tieCol: String,
      payload: Seq[String]): DataFrame = {
    val fields = (timeCol +: payload.filterNot(_ == timeCol)).distinct
    val payloadType = org.apache.spark.sql.types.StructType(fields.map(p => right.schema(p)))
    val l = left
      .withColumn("__sb", lit(1))
      .select(left.columns.map(col) ++ Seq(col("__sb")) ++
        Seq(lit(null).cast(payloadType).as("__p")): _*)
    val r = right
      .withColumn("__sb", lit(0))
      .select(Seq(col(key), col(timeCol), col(tieCol), col("__sb")) ++
        left.columns.filterNot(Set(key, timeCol, tieCol)).map(c => lit(null).as(c)) ++
        Seq(struct(fields.map(p => col(p).as(p)): _*).as("__p")): _*)
    val wB = Window.partitionBy(col(key))
      .orderBy(col(timeCol), col("__sb"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(key))
      .orderBy(col(timeCol), (lit(1) - col("__sb")), col(tieCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val t = col(timeCol)
    val back = col("__back"); val fwd = col("__fwd")
    val chosen = when(back.isNull, fwd)
      .when(fwd.isNull, back)
      .when(fwd.getField(timeCol) - t < t - back.getField(timeCol), fwd)
      .otherwise(back)
    l.unionByName(r)
      .withColumn("__back", last(col("__p"), ignoreNulls = true).over(wB))
      .withColumn("__fwd", first(col("__p"), ignoreNulls = true).over(wF))
      .filter(col("__sb") === 1)
      .withColumn("__sel", chosen)
      .select(left.columns.map(col) ++
        payload.map(p => col("__sel").getField(p).as(s"asof_$p")): _*)
  }

  /** Interval-overlap join: all (a, b) pairs whose half-open intervals
    * intersect (`a.lo < b.hi && b.lo < a.hi`) — session-vs-campaign,
    * outage-vs-job, any two event-span tables. Same bin trick as
    * [[rangeJoinBinned]] applied to BOTH sides: each interval explodes to
    * the fixed-width bins it touches, the join equi-matches on bin, a
    * residual predicate restores exactness, and `dropDuplicates` collapses
    * pairs that share several bins. Shuffle-partitionable on both sides —
    * no broadcast ceiling, no nested-loop fallback. */
  def overlapJoinBinned(
      a: DataFrame,
      b: DataFrame,
      binSize: Long,
      idA: String, loA: String, hiA: String,
      idB: String, loB: String, hiB: String): DataFrame = {
    require(binSize > 0, s"binSize must be positive: $binSize")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(hi) > col(lo))
      .withColumn("__bin",
        explode(expr(s"sequence($lo div ${binSize}L, ($hi - 1) div ${binSize}L)")))
    binned(a, loA, hiA).join(binned(b, loB, hiB), Seq("__bin"))
      .filter(col(loA) < col(hiB) && col(loB) < col(hiA))
      .select(col(idA), col(idB))
      .dropDuplicates(idA, idB)
  }

  /** Range join: `facts` rows matched to `ranges` rows with
    * `lo <= facts.valueCol < hi` (half-open intervals, long-typed bounds).
    *
    * A naive inequality join plans as BroadcastNestedLoopJoin — O(n·m) and a
    * broadcast-or-bust hazard at scale. Instead each range is exploded into
    * the fixed-width bins it overlaps (`lo div binSize .. (hi-1) div binSize`)
    * and the join becomes an equi-join on bin + a residual bound check:
    * shuffle-partitionable on both sides, so it survives ranges tables far
    * beyond broadcast size. Pick `binSize` near the typical range width so
    * the per-range explosion factor stays small.
    */
  def rangeJoinBinned(
      facts: DataFrame,
      valueCol: String,
      ranges: DataFrame,
      binSize: Long,
      loCol: String = "lo",
      hiCol: String = "hi"): DataFrame = {
    require(binSize > 0, s"binSize must be positive: $binSize")
    require(!facts.columns.contains("__bin") && !ranges.columns.contains("__bin"),
      "inputs must not already contain a __bin column")
    // Degenerate ranges (hi <= lo) match nothing under half-open semantics,
    // but an inverted range would make sequence() DESCEND and enumerate every
    // bin from lo down to hi — a potentially huge explode (the same trap
    // shingles() guards against). Filter them out before binning.
    val binned = ranges
      .filter(col(hiCol) > col(loCol))
      .withColumn(
        "__bin",
        explode(expr(s"sequence($loCol div ${binSize}L, ($hiCol - 1) div ${binSize}L)")))
    facts
      .withColumn("__bin", expr(s"$valueCol div ${binSize}L"))
      .join(binned, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}
