package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Online MinHash-LSH near-duplicate admission — streaming dedup one tier
  * above content-hash dedup: each microbatch's documents are admitted only
  * if none of their LSH band keys collided with any EARLIER document
  * (lower id within the batch; any previous batch via the persistent band
  * index). "Earlier" counts every seen document, admitted or not, which
  * makes the admitted set invariant to how an id-ordered stream is chopped
  * into microbatches — and lets the SQL oracle state the rule closed-form:
  * admitted ⇔ no band key is shared with a lower-id document.
  *
  * Index = an append-only parquet of (doc_id, band_idx, band_key): the
  * foreachBatch at-least-once contract holds because a replayed batch
  * re-appends identical band rows (semi-join hits are idempotent) and
  * admitted-set parquet is re-derived from the same prior index prefix.
  * At scale the index is the standard LSH posting table — the semi join
  * shuffles on band_key, ∝ batch bands, never ∝ corpus.
  */
object LshDedupSink {

  /** (id, band_idx, band_key) rows for `docs` — the LSH index/posting
    * format. Shingle-less docs (< shingleN tokens) produce no rows: they
    * carry no near-dup evidence and are always admitted. */
  def bandTable(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    Dedup.shingleSigTable(docs, idCol, textCol, shingleN, numHashes)
      .filter(col("__has")) // cheap twin of `__sig IS NOT NULL` (see its scaladoc)
      .select(col(idCol),
        posexplode(graft.functions.TextFunctions.bandKeys(col("__sig"), bands, r))
          .as(Seq("band_idx", "band_key")))
  }

  /** Process one microbatch against the index at `idxDir`, writing admitted
    * ids under `outDir` and the batch's band rows under `idxDir`.
    *
    * Idempotent under foreachBatch's at-least-once replay: both writes go
    * to batchId-deterministic partition directories (`batch=<id>`) in
    * OVERWRITE mode, so a replayed batch rewrites its own partitions
    * instead of appending duplicates, and the prior-index read excludes the
    * current batchId's partition — a replay that crashed after the index
    * write does not see the batch's own band keys as "prior". The semi
    * join shuffles only the BATCH's band rows; the index side is read, not
    * re-shuffled (left_semi is duplicate-insensitive, so no distinct over
    * the corpus-sized posting table). */
  def admitBatch(idxDir: String, outDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val ids = batch.select(col("doc_id")).materialize
    val bt = bandTable(batch).materialize
    // existence probed through the Hadoop FileSystem of the path's scheme
    // (a java.io.File check is always false for hdfs:// or s3a:// paths —
    // every batch would silently see an EMPTY prior index and re-admit
    // near-duplicates from earlier batches)
    val idxPath = new org.apache.hadoop.fs.Path(idxDir)
    val idxExists =
      idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(idxPath)
    val prior: DataFrame =
      if (idxExists)
        spark.read.parquet(idxDir)
          .filter(col("batch") < batchId)
          .select(col("band_key"))
      else spark.range(0).select(col("id").cast("string").as("band_key"))
    val priorHits = bt.join(prior, Seq("band_key"), "left_semi")
      .select(col("doc_id")).distinct()
    val minPerKey = bt.groupBy(col("band_key")).agg(min(col("doc_id")).as("min_id"))
    val inBatchHits = bt.join(minPerKey, Seq("band_key"))
      .filter(col("doc_id") > col("min_id"))
      .select(col("doc_id")).distinct()
    val admitted = ids.join(priorHits.union(inBatchHits).distinct(),
      Seq("doc_id"), "left_anti")
    admitted.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    bt.write.mode("overwrite").parquet(s"$idxDir/batch=$batchId")
  }
}
