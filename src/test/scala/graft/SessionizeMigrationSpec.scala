package graft

import graft.model.SessionState
import org.apache.spark.sql.functions._

/** The migration story applied to the FLAGSHIP operator: an OPEN
  * session survives a redeploy that cannot resume its checkpoint.
  *
  *   v1 sessionize runs (user 7's session open in state) → STOP →
  *   StateMigration.drainKeyedState reads the live SessionState rows →
  *   sessionizeWithInitialState starts at a FRESH checkpoint seeded
  *   with them → the next event CONTINUES the original session (same
  *   sessionId, running duration measured from the pre-deploy first
  *   event) instead of opening a new one at the deploy boundary.
  *
  * This is the Spark-native equivalent of the reference's savepoint
  * uid-remap deploy path (RealtimeSessionize.scala:101,121,135,143).
  * Also pinned: the drained v1 checkpoint still resumes untouched
  * (rollback), and an UNSEEDED fresh start would have cut the session
  * (the control that proves the seed is load-bearing). */
class SessionizeMigrationSpec extends SparkFunSuite {
  import spark.implicits._

  private val inSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("key",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("tieBreak",
      org.apache.spark.sql.types.LongType)))

  private def tsOf(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("an open session survives drain -> map -> initialState reseed " +
      "with its original sessionId and running duration") {
    val root = java.nio.file.Files.createTempDirectory("sess_mig_")
    val in = root.resolve("in").toString
    val ckptV1 = root.resolve("ckpt_v1").toString
    val outV1 = root.resolve("out_v1").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in))

    def addFile(name: String, rows: Seq[(String, Long, Long)]): Unit = {
      val tmp = root.resolve(s"tmp_$name").toString
      rows.map { case (k, sec, tie) => (k, tsOf(sec), tie) }
        .toDF("key", "ts", "tieBreak").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(part.renameTo(new java.io.File(in, s"$name.parquet")))
    }

    def runV1(): Seq[(String, Long, String, Long)] =
      withConfs("spark.sql.shuffle.partitions" -> "4") {
        val q = graft.streaming.SessionizeStream.sessionize(
            spark.readStream.schema(inSchema).parquet(in))
          .toDF()
          .writeStream.format("parquet").option("path", outV1)
          .option("checkpointLocation", ckptV1)
          .outputMode("append").start()
        try {
          q.processAllAvailable()
          spark.read.parquet(outV1)
            .select("key", "tsMillis", "sessionId", "duration")
            .collect()
            .map(r => (r.getString(0), r.getLong(1), r.getString(2),
              r.getLong(3))).toSeq
        } finally q.stop()
      }

    // v1: two events 10 s apart — one session, open in state
    addFile("b1", Seq(("7", 1000L, 1L), ("7", 1010L, 2L)))
    val v1Out = runV1()
    assert(v1Out.length == 2)
    val sid = v1Out.head._3
    assert(v1Out.forall(_._3 == sid))

    // ---- migrate: drain the stopped checkpoint's live SessionState ----
    val drained = graft.streaming.StateMigration
      .drainKeyedState(spark, ckptV1)
      .selectExpr("key.value AS key", "state.sessionId", "state.sessionIdx",
        "state.firstSec", "state.lastSec", "state.eventCount")
      .as[(String, String, Long, Long, Long, Int)]
    val states = drained.collect()
    assert(states.length == 1 &&
      states.head._2 == sid && states.head._6 == 2, states.toSeq.toString)
    val initial = drained
      .map(t => (t._1, SessionState(t._2, t._3, t._4, t._5, t._6)))
      .groupByKey(_._1).mapValues(_._2)

    // v2 deploy at a FRESH checkpoint, new input dir (topology change)
    val in2 = root.resolve("in2").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in2))
    def addFile2(name: String, rows: Seq[(String, Long, Long)]): Unit = {
      val tmp = root.resolve(s"tmp2_$name").toString
      rows.map { case (k, sec, tie) => (k, tsOf(sec), tie) }
        .toDF("key", "ts", "tieBreak").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(part.renameTo(new java.io.File(in2, s"$name.parquet")))
    }
    // 20 s after the last pre-deploy event: INSIDE the session gap
    addFile2("c1", Seq(("7", 1030L, 3L), ("9", 1030L, 1L)))
    def runSeeded(outDir: String, ckpt: String, seed: Boolean)
        : Seq[(String, Long, String, Long)] =
      withConfs("spark.sql.shuffle.partitions" -> "4") {
        val src = spark.readStream.schema(inSchema).parquet(in2)
        val ds =
          if (seed) graft.streaming.SessionizeStream
            .sessionizeWithInitialState(src, initial)
          else graft.streaming.SessionizeStream.sessionize(src)
        val q = ds.toDF()
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try {
          q.processAllAvailable()
          spark.read.parquet(outDir)
            .select("key", "tsMillis", "sessionId", "duration")
            .collect()
            .map(r => (r.getString(0), r.getLong(1), r.getString(2),
              r.getLong(3))).toSeq
        } finally q.stop()
      }

    val seeded = runSeeded(root.resolve("out_v2").toString,
      root.resolve("ckpt_v2").toString, seed = true)
    val u7 = seeded.filter(_._1 == "7")
    // the session CONTINUED: original id, duration measured from the
    // pre-deploy first event (1030 - 1000 = 30 s)
    assert(u7.length == 1 && u7.head._3 == sid && u7.head._4 == 30L,
      seeded.toString)
    // a key with no migrated state starts a fresh session normally
    val u9 = seeded.filter(_._1 == "9")
    assert(u9.length == 1 && u9.head._4 == 0L)

    // control: WITHOUT the seed the deploy boundary cuts the session —
    // new id, duration restarts at 0
    val unseeded = runSeeded(root.resolve("out_ctl").toString,
      root.resolve("ckpt_ctl").toString, seed = false)
    val c7 = unseeded.filter(_._1 == "7")
    assert(c7.length == 1 && c7.head._3 != sid && c7.head._4 == 0L)

    // rollback: the drained v1 checkpoint is untouched and still resumes
    addFile("b2", Seq(("7", 1015L, 4L)))
    val v1After = runV1()
    assert(v1After.count(_._1 == "7") == 3 &&
      v1After.filter(_._2 == 1015000L).head._3 == sid)

    graft.streaming.MergeSink.deleteRecursively(root.toFile)
  }
}
