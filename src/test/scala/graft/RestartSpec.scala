package graft

import org.apache.spark.sql.functions._

/** Checkpoint-recovery durability: stateful streaming state must survive a
  * full query stop/start — the property every production restart, deploy,
  * and failover rides on. StreamingSpec proves trigger-chunking invariance
  * WITHIN one query; this spec kills the query between batches and starts a
  * brand-new one on the same checkpoint, on the RocksDB provider the
  * driver-facing queries run. */
class RestartSpec extends SparkFunSuite {
  import spark.implicits._

  test("dropDuplicates state survives a query restart: overlap across the restart stays suppressed") {
    val root = java.nio.file.Files.createTempDirectory("restart_spec_")
    val in = root.resolve("in").toString
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in))

    // file source only picks up whole files, so each "batch" is one file
    // dropped into the watched dir between query generations
    def addFile(name: String, ids: Range): Unit = {
      val tmp = root.resolve(s"tmp_$name").toString
      ids.map(_.toLong).toDF("user_id").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      assert(part.renameTo(new java.io.File(in, s"$name.parquet")))
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType)))
    def runGeneration(): Unit = withConfs(
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val q = spark.readStream.schema(schema).parquet(in)
        .dropDuplicates("user_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable()
      finally q.stop() // kill the query — generation boundary
    }

    addFile("b1", 0 until 100)
    runGeneration()
    // second generation: a NEW StreamingQuery recovers offsets + state from
    // the checkpoint; 50-99 were seen by the PREVIOUS query's state
    addFile("b2", 50 until 150)
    runGeneration()

    val got = spark.read.schema(schema).parquet(out).as[Long].collect().toSeq
    assert(got.sorted == (0L until 150L), // each key exactly once, no re-emission
      s"expected 0..149 exactly once, got ${got.length} rows, dups=${got.diff(got.distinct).distinct}")
    graft.streaming.MergeSink.deleteRecursively(root.toFile)
  }
}
