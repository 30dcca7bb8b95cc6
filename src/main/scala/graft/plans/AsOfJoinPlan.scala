package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class plan — tier (c) of the
  * custom-operator preference order (compose → Expression → custom
  * LogicalPlan/Strategy/SparkPlan → mapPartitions), for the one operator
  * where the composed form pays real overhead: the union+window as-of
  * ([[graft.operators.Temporal.asofJoin]]) must union both inputs into one
  * wide null-padded table, sort the UNION (|L|+|R| rows through one
  * sort+window, every row carrying both schemas), then filter half the
  * rows back out. This node instead plans a co-partitioned MERGE: each
  * side is hash-clustered on the key and sorted (key, time[, tie])
  * independently — narrow rows, no padding — and the physical operator
  * streams both sorted iterators once, tracking ONE candidate right row
  * per key (O(1) state, no window buffer).
  *
  * Semantics match asofJoin exactly: latest right row with
  * `right.time <= left.time` per key, ties on equal time broken by the
  * LARGEST `tie`; left rows with no match get null payload. With
  * `forward = true` the direction flips to asofJoinForward's semantics —
  * earliest right row at-or-after, equal-time ties to the SMALLEST tie —
  * and the merge needs no buffered row at all (the right lookahead IS the
  * match). Key, time and tie are LongType (enforced by the API builder);
  * null-keyed or null-timed right rows are skipped, left rows with nulls
  * get null payload.
  *
  * The needed columns are held as RESOLVED child attributes, so the
  * node's `references` is accurate and ColumnPruning keeps exactly the
  * key/time/tie/payload columns alive in the children (holding plain
  * column names instead made `references` empty — the optimizer then
  * pruned the children to nothing). `payloadAttrs` are minted once by the
  * API builder and travel with the node — output stability across
  * optimizer copies. */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    lKey: Attribute,
    lTime: Attribute,
    rKey: Attribute,
    rTime: Attribute,
    rTie: Attribute,
    payloadRefs: Seq[Attribute],
    payloadAttrs: Seq[AttributeReference],
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadAttrs
  override def producedAttributes: AttributeSet = AttributeSet(payloadAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (builder path) or
  * `spark.experimental.extraStrategies` (live-session path) — both are
  * consulted by the planner AQE re-plans with. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.lKey, p.lTime, p.rKey, p.rTime, p.rTie,
        p.payloadRefs, p.payloadAttrs, p.forward) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned sorted-merge as-of join. EnsureRequirements hash-clusters
  * both children on the key and sorts them (key, time[, tie]) — the
  * standard SMJ machinery — and `doExecute` zips the co-partitions with a
  * single forward pass: advance the right iterator while its (key, time)
  * is at-or-before the current left row, remembering the LAST right row
  * seen for the current key (right is sorted by (key, time, tie) ascending,
  * so last-seen = max (time, tie) — the tie rule). State per partition is
  * one buffered right row; output order preserves the left sort. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    lKey: Attribute,
    lTime: Attribute,
    rKey: Attribute,
    rTime: Attribute,
    rTie: Attribute,
    payloadRefs: Seq[Attribute],
    payloadAttrs: Seq[AttributeReference],
    forward: Boolean = false) extends BinaryExecNode {

  // exprId-first ordinal lookup (name fallback covers re-aliased children)
  private def ordinal(out: Seq[Attribute], a: Attribute): Int = {
    val byId = out.indexWhere(_.exprId == a.exprId)
    val i = if (byId >= 0) byId else out.indexWhere(_.name == a.name)
    require(i >= 0, s"column ${a.name} missing from as-of child output $out")
    i
  }

  override def output: Seq[Attribute] = left.output ++ payloadAttrs
  override def producedAttributes: AttributeSet = AttributeSet(payloadAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(lKey)) :: ClusteredDistribution(Seq(rKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(lKey, Ascending), SortOrder(lTime, Ascending)),
    Seq(SortOrder(rKey, Ascending), SortOrder(rTime, Ascending),
      SortOrder(rTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = ordinal(left.output, lKey)
    val lTimeOrd = ordinal(left.output, lTime)
    val rKeyOrd = ordinal(right.output, rKey)
    val rTimeOrd = ordinal(right.output, rTime)
    val pOrds = payloadRefs.map(p => ordinal(right.output, p)).toArray
    val pTypes = payloadRefs.map(_.dataType).toArray
    val outTypes = output.map(_.dataType).toArray
    val nPayload = payloadRefs.size

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(nPayload)
      // one-row lookahead over the right side
      var rRow: InternalRow = null
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && rIt.hasNext) {
          val cand = rIt.next()
          // null-keyed/timed right rows can never match: drop in-stream
          if (!cand.isNullAt(rKeyOrd) && !cand.isNullAt(rTimeOrd)) rRow = cand
        }
      }
      advanceRight()
      def mkPayload(row: InternalRow): InternalRow = {
        val vals = new Array[Any](nPayload)
        var i = 0
        while (i < nPayload) {
          vals(i) = if (row.isNullAt(pOrds(i))) null else row.get(pOrds(i), pTypes(i))
          i += 1
        }
        new GenericInternalRow(vals)
      }
      // backward direction: best (= last-seen at-or-before) right row for
      // matchKey, copied out of the iterator's reused UnsafeRow
      var matchRow: InternalRow = null
      var matchKey: Long = 0L

      lIt.map { lRow =>
        val payloadRow: InternalRow =
          if (lRow.isNullAt(lKeyOrd) || lRow.isNullAt(lTimeOrd)) nullPayload
          else {
            val lk = lRow.getLong(lKeyOrd)
            val lt = lRow.getLong(lTimeOrd)
            if (forward) {
              // earliest at-or-after: skip right rows strictly before
              // (lk, lt); the lookahead itself is then the match — it is
              // NOT consumed, so one right row can serve several left rows
              while (rRow != null && {
                val rk = rRow.getLong(rKeyOrd)
                rk < lk || (rk == lk && rRow.getLong(rTimeOrd) < lt)
              }) advanceRight()
              if (rRow != null && rRow.getLong(rKeyOrd) == lk) mkPayload(rRow)
              else nullPayload
            } else {
              while (rRow != null && {
                val rk = rRow.getLong(rKeyOrd)
                rk < lk || (rk == lk && rRow.getLong(rTimeOrd) <= lt)
              }) {
                if (rRow.getLong(rKeyOrd) == lk) {
                  matchRow = rRow.copy(); matchKey = lk
                }
                advanceRight()
              }
              if (matchRow != null && matchKey == lk) mkPayload(matchRow)
              else nullPayload
            }
          }
        proj(joined(lRow, payloadRow))
      }
    }
  }
}
