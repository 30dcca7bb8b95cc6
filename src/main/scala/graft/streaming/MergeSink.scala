package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** foreachBatch incremental-merge sink: maintains a keyed serving table in
  * parquet by merging each microbatch of an UPDATE-mode aggregation over the
  * previous table version.
  *
  * The production pattern for "streaming aggregate → queryable table" on a
  * store with no native upsert (plain parquet/object storage):
  *
  *  - Update mode emits the full new aggregate value per CHANGED key each
  *    trigger, so the merge is a key-level overwrite:
  *    v(n) = v(n−1) ⟕anti batch  ∪  batch.
  *  - Each batch publishes a NEW immutable directory `v<batchId>`. Readers
  *    of v(n−1) are never disturbed mid-write (atomic publish by directory),
  *    and crash-replay of batch n (foreachBatch is at-least-once) rebuilds
  *    v(n) from the same v(n−1) base — the merge is idempotent per batchId,
  *    upgrading the sink to effectively-once.
  *  - The merge itself is a left-anti join + union: shuffle-partitioned on
  *    the key, no driver materialization, so the serving table can be far
  *    larger than any executor. At 100 TB the same shape works with the
  *    anti-join bucketed/partitioned on the key; old versions are pruned by
  *    retention (kept here — the whole history IS the audit trail).
  *
  * Mirrors the reference's Kafka-out "session updates feed a downstream
  * store" role (reference RealtimeSessionize.scala:161-174) with an
  * idempotent file-backed target instead of a transactional producer. */
object MergeSink {

  private val VersionRe = "^v(\\d+)$".r

  /** The newest published version directory under `target` with
    * batchId < `before` (or any, when `before` is None). */
  def latestVersion(target: String, before: Option[Long] = None): Option[String] = {
    val dirs = Option(new java.io.File(target).listFiles()).getOrElse(Array.empty)
    val ids = dirs.toSeq.flatMap(f => f.getName match {
      case VersionRe(n) if f.isDirectory => Some(n.toLong)
      case _ => None
    })
    val eligible = before match {
      case Some(b) => ids.filter(_ < b)
      case None => ids
    }
    eligible.sorted.lastOption.map(id => s"$target/v$id")
  }

  /** Merge one microbatch into the table at `target`; pass to
    * `writeStream.foreachBatch`. `keyCols` is the aggregation key.
    *
    * Publish is write-to-temp-then-rename: the parquet job writes into a
    * dot-prefixed staging dir (invisible to [[latestVersion]]'s `v<n>`
    * pattern) and only a completed write is renamed into place, so readers
    * never observe a half-written version — on a local/HDFS-like fs the
    * rename is atomic; an object-store deployment would swap this for a
    * manifest/_SUCCESS gate. */
  def mergeBatch(target: String, keyCols: Seq[String])(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // base = the latest version BELOW this batchId: on crash-replay of batch
    // n the half-written v(n) is ignored and rebuilt from v(n-1), not from
    // itself — that check is what makes the at-least-once replay idempotent
    val merged = latestVersion(target, before = Some(batchId)) match {
      case Some(prev) =>
        spark.read.parquet(prev)
          .join(batch.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(batch)
      case None => batch
    }
    val staging = new java.io.File(target, s".staging-v$batchId")
    merged.write.mode("overwrite").parquet(staging.getPath)
    val published = new java.io.File(target, s"v$batchId")
    if (published.exists()) deleteRecursively(published) // crash-replay leftover
    if (!staging.renameTo(published))
      sys.error(s"could not publish $staging as $published")
  }

  /** Shared with the SparkEntry drains (one copy of the helper). */
  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
