package graft

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** The OTHER half of the state-evolution story ([[StateMigrationSpec]]
  * is the rewrite tool): `transformWithState` under the AVRO state
  * encoding (`spark.sql.streaming.stateStore.encodingFormat=avro`,
  * RocksDB provider) supports ADDITIVE schema evolution natively — a
  * restart whose state gained a nullable/defaulted field resumes on
  * the SAME checkpoint, old state intact, new field reading as
  * absent. So the 100×-scale deploy recipe is: additive TWS change →
  * restart in place (this spec); anything else (fMGWS, non-additive,
  * rekeying) → StateMigration drain/map/seed. */
class TwsStateEvolutionSpec extends SparkFunSuite {
  import spark.implicits._

  private val inSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType)))

  test("transformWithState + avro encoding: adding a defaulted state " +
      "field resumes the SAME checkpoint with state intact") {
    val root = java.nio.file.Files.createTempDirectory("tws_evo_")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val outDir = root.resolve("out").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in))

    def addFile(name: String, ids: Seq[Long]): Unit = {
      val tmp = root.resolve(s"tmp_$name").toString
      ids.toDF("user_id").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(part.renameTo(new java.io.File(in, s"$name.parquet")))
    }

    def run(useV2: Boolean): Set[(Long, Long, Long)] =
      withConfs(
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.encodingFormat" -> "avro") {
        val grouped = spark.readStream.schema(inSchema).parquet(in)
          .selectExpr("user_id").as[Long].groupByKey(identity)
        val counted =
          if (useV2) grouped.transformWithState(
            new TwsCountProcV2(org.apache.spark.sql.Encoders.product[EvoStateV2]),
            TimeMode.None(), OutputMode.Append())
          else grouped.transformWithState(
            new TwsCountProcV1(org.apache.spark.sql.Encoders.product[EvoStateV1]),
            TimeMode.None(), OutputMode.Append())
        val q = counted.toDF("user_id", "n", "extra")
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try {
          q.processAllAvailable()
          spark.read.parquet(outDir).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        } finally q.stop()
      }

    // v1 generation: state {1→2, 2→1} (v1 emits extra = -2 always)
    addFile("b1", Seq(1L, 1L, 2L))
    assert(run(useV2 = false) == Set((1L, 2L, -2L), (2L, 1L, -2L)))

    // v2 on the SAME checkpoint: resumes (no schema rejection), key 1
    // continues from count 2, and the ADDED field reads absent (-1)
    // for migrated state, then persists (key 1 writes extra=1000+n)
    addFile("b2", Seq(1L, 3L))
    val g2 = run(useV2 = true)
    assert(g2.contains((1L, 3L, -1L)) && g2.contains((3L, 1L, -1L)), g2)

    // third batch: key 1's v2-written extra round-trips
    addFile("b3", Seq(1L))
    val g3 = run(useV2 = true)
    assert(g3.contains((1L, 4L, 1003L)), g3)

    graft.streaming.MergeSink.deleteRecursively(root.toFile)
  }
}

/** v1 per-key counter: state = EvoStateV1(count); emits extra = -2. */
class TwsCountProcV1(enc: Encoder[EvoStateV1])
    extends StatefulProcessor[Long, Long, (Long, Long, Long)] {
  @transient private var st:
    org.apache.spark.sql.streaming.ValueState[EvoStateV1] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[EvoStateV1]("cnt", enc, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Long],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val next = Option(st.get()).map(_.count).getOrElse(0L) + rows.size
    st.update(EvoStateV1(next))
    Iterator((key, next, -2L))
  }
}

/** v2: state gains `extra: Option[Long]` — emits the PRIOR extra (-1
  * when absent, i.e. for v1-written state) and writes 1000+count. */
class TwsCountProcV2(enc: Encoder[EvoStateV2])
    extends StatefulProcessor[Long, Long, (Long, Long, Long)] {
  @transient private var st:
    org.apache.spark.sql.streaming.ValueState[EvoStateV2] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[EvoStateV2]("cnt", enc, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Long],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val prev = Option(st.get()).getOrElse(EvoStateV2(0L, None))
    val next = prev.count + rows.size
    st.update(EvoStateV2(next, Some(1000L + next)))
    Iterator((key, next, prev.extra.getOrElse(-1L)))
  }
}
