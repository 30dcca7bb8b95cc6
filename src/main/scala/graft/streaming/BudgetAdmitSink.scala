package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Online token-budget admission — the streaming counterpart of
  * [[graft.operators.Sampling.tokenBudgetMix]]: documents arrive over time
  * and each source's docs are admitted IN ARRIVAL (id) ORDER until the
  * source's token budget is exhausted; after that the source is closed.
  * "Tokens before" counts every SEEN doc of the source, not just admitted
  * ones — before the cutoff the two coincide (every doc is admitted), after
  * it both stay ≥ budget, so the admitted set is identical and the rule is
  * closed-form for an id-ordered stream chopped into ANY microbatches:
  * admitted ⇔ sum of n_tokens over same-source lower-id docs < budget.
  *
  * State = a parquet of per-(batch, source) token totals — k rows per
  * batch, NOT per-doc: the prior offset is a sum over a tiny table, so
  * state never grows with corpus size (contrast LshDedupSink, whose posting
  * index must hold per-doc rows because collisions are per-doc evidence).
  * Idempotent under foreachBatch's at-least-once replay: both writes go to
  * batchId-deterministic partitions in overwrite mode and the prior-state
  * read excludes the current batchId's partition. The in-batch cumsum uses
  * a per-source window, bounded by ONE MICROBATCH's rows (trigger-sized,
  * not corpus-sized) — the batch operator's distributed prefix sum is not
  * needed here.
  */
object BudgetAdmitSink {

  /** Process one microbatch against the running totals at `stateDir`,
    * writing admitted (doc_id, source, n_tokens, cum_before) under `outDir`
    * and the batch's per-source totals under `stateDir`. `budgets` =
    * (source, budget) — k rows, broadcast. A source with NO budget row is
    * never admitted (the inner join drops it) but its token totals are
    * still recorded, so granting it a budget later starts from its true
    * consumed-token position. */
  def admitBatch(stateDir: String, outDir: String, budgets: DataFrame)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val toks = batch
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      .materialize
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val stateExists =
      statePath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(statePath)
    val prior: DataFrame =
      if (stateExists)
        spark.read.parquet(stateDir)
          .filter(col("batch") < batchId)
          .groupBy(col("source")).agg(sum(col("toks")).as("__off"))
      else spark.range(0).select(
        col("id").cast("string").as("source"), col("id").as("__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val admitted = toks
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .join(prior, Seq("source"), "left")
      .join(broadcast(budgets), Seq("source"))
      .withColumn("cum_before",
        coalesce(col("__off"), lit(0L)) + col("__cum") - col("n_tokens"))
      .filter(col("cum_before") < col("budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_before"))
    admitted.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    toks.groupBy(col("source")).agg(sum(col("n_tokens")).as("toks"))
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
  }
}
