package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Effectively-once Kafka publishing via KEYED UPSERT — the standard way
  * to close the gap between Spark's at-least-once Kafka sink and the
  * reference's `Semantic.EXACTLY_ONCE` transactional producer
  * (reference `RealtimeSessionize.scala:161-174`) when no transactional
  * producer is available:
  *
  *  - every record is published with a PRODUCER-SIDE KEY (the logical
  *    entity id — here the session aggregation key), so the topic is a
  *    keyed CHANGELOG rather than an event log;
  *  - `foreachBatch` replay (Spark's at-least-once window: a crash
  *    between the sink write and the offset commit re-runs the batch)
  *    re-publishes the SAME (key, value) pairs — duplicates exist in
  *    the raw log, exactly as they would with the real connector;
  *  - consumers read the topic COMPACTED: last record per key wins
  *    ([[compactedView]] — the reader-side twin of Kafka log
  *    compaction / ksqlDB tables). Under last-write-wins the replayed
  *    duplicates are invisible: one logical record per key, always.
  *
  * This is [[MergeSink]]'s idempotence story transplanted from files to
  * a broker: MergeSink dedups by rebuilding version v(n) from v(n−1) on
  * replay; KeyedKafkaSink dedups by making the CONSUMER's view keyed,
  * so replay changes only the raw log length, never the logical state.
  *
  * Scale shape: the upsert write is one map-side pass (update-mode
  * aggregates already emit one row per changed key per trigger; the
  * within-batch last-per-key reduce is a key-hashed aggregate guard for
  * append-shaped inputs), and [[compactedView]] is one key-hashed
  * max_by aggregate over the consumed range — both partition freely. */
object KeyedKafkaSink {

  /** Publish one micro-batch as keyed upserts; pass to
    * `writeStream.foreachBatch(KeyedKafkaSink.upsertBatch(...))`.
    *
    * `orderCol` breaks within-batch ties when the input can carry
    * several rows per key (append-shaped input); update-mode aggregates
    * never do, making the reduce a no-op there. The reduce is a
    * lexicographic max over (orderCol, serialized value), so rows that
    * tie on orderCol break on the value bytes — fully deterministic
    * across replays, where a bare max_by(value, orderCol) would pick an
    * engine-order-dependent winner and a replayed batch could publish a
    * different record. Key = `keyCols` joined with '|'; value = the
    * full row as JSON. */
  def upsertBatch(topic: String, bootstrapServers: String,
      keyCols: Seq[String], orderCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    require(keyCols.nonEmpty, "keyCols must name the logical entity id")
    val latest = batch
      .withColumn("__k", concat_ws("|", keyCols.map(col): _*))
      .groupBy(col("__k"))
      .agg(max(struct(col(orderCol).as("o"),
        to_json(struct(batch.columns.map(col): _*)).as("v"))).as("__m"))
    latest
      .select(col("__k").as("key"), col("__m.v").as("value"))
      .write.format("kafka")
      .mode("append") // a topic is append-only; default ErrorIfExists maps to CTAS on DSv2
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()
  }

  /** The consumer-side compacted table: read the topic (earliest → now)
    * and keep the LAST record per key by log offset — what a compacted
    * Kafka topic converges to, materialized as a DataFrame. Returns
    * (key string, value string); parse `value` downstream. */
  def compactedView(spark: SparkSession, topic: String,
      bootstrapServers: String): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key").cast("string").as("key"),
        col("value").cast("string").as("value"), col("offset"))
      .groupBy(col("key"))
      .agg(max_by(col("value"), col("offset")).as("value"))
}
