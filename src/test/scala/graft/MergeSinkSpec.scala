package graft

import graft.streaming.MergeSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The foreachBatch incremental-merge sink: multi-batch merge correctness
  * and the per-batchId idempotency that upgrades foreachBatch's
  * at-least-once contract to effectively-once. */
class MergeSinkSpec extends SparkFunSuite {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("merge_spec_").toString

  test("multi-batch merge: final version equals the full-data aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val target = tmp() + "/table"
    val merge: (org.apache.spark.sql.DataFrame, Long) => Unit =
      MergeSink.mergeBatch(target, Seq("k"))
    val agg = input.toDF().toDF("k", "v").groupBy($"k").agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", tmp() + "/ckpt")
      .foreachBatch(merge)
      .start()
    try {
      input.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      input.addData((1L, "c"), (3L, "d")); q.processAllAvailable()
      input.addData((3L, "e")); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(MergeSink.latestVersion(target).get)
      .as[(Long, Long)].collect().toMap
    // key 2 only changed in batch 0: the merge must carry it forward
    // untouched while later batches overwrite keys 1 and 3
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("crash-replay idempotency: re-merging a batch rebuilds the same version from the prior base") {
    val target = tmp() + "/t"
    val m = MergeSink.mergeBatch(target, Seq("k")) _
    m(Seq((1L, 5L), (2L, 1L)).toDF("k", "n"), 0L)
    val b1 = Seq((1L, 7L), (3L, 2L)).toDF("k", "n")
    m(b1, 1L)
    val v1 = spark.read.parquet(s"$target/v1").as[(Long, Long)].collect().toSet
    assert(v1 == Set((1L, 7L), (2L, 1L), (3L, 2L)))
    // at-least-once replay of batch 1: must base on v0 (before-bound), not
    // on the possibly half-written v1 it is about to overwrite
    m(b1, 1L)
    assert(spark.read.parquet(s"$target/v1").as[(Long, Long)].collect().toSet == v1)
    assert(MergeSink.latestVersion(target, before = Some(1L)).get.endsWith("/v0"))
    assert(MergeSink.latestVersion(target).get.endsWith("/v1"))
  }

  test("latestVersion: empty/missing targets and non-version entries") {
    assert(MergeSink.latestVersion(tmp() + "/nonexistent").isEmpty)
    val target = tmp()
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(target, "not_a_version"))
    assert(MergeSink.latestVersion(target).isEmpty)
    MergeSink.mergeBatch(target, Seq("k"))(Seq((1L, 1L)).toDF("k", "n"), 12L)
    assert(MergeSink.latestVersion(target).get.endsWith("/v12"))
  }
}
