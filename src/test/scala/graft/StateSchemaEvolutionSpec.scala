package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** What Spark tolerates when the flatMapGroupsWithState STATE SCHEMA
  * changes across a checkpoint restart — the Spark analogue of the
  * reference's Flink savepoint/uid schema-evolution story
  * (RealtimeSessionize.scala:101,121,135,143 tags operators so state
  * can be re-mapped across deploys; SURVEY §2.8 left the parity open).
  *
  * Findings pinned here:
  *  - identical state schema across a restart: recovers, state intact
  *    (RestartSpec proves the value-level half; this spec the schema
  *    handshake).
  *  - ADDING a field — even nullable-with-default — is REJECTED at
  *    query start by the state schema compatibility check; the error
  *    names both schemas. Deploys that must evolve fMGWS state use the
  *    TESTED rewrite path: [[graft.streaming.StateMigration]] drain →
  *    map → initialState seed (StateMigrationSpec, end to end), or —
  *    for ADDITIVE transformWithState changes — a native in-place
  *    restart under the Avro state encoding (TwsStateEvolutionSpec).
  *    Silently reinterpreting bytes is never attempted.
  *  - the rejected attempt does NOT corrupt the checkpoint: the
  *    original schema keeps working afterwards.
  */
class StateSchemaEvolutionSpec extends SparkFunSuite {
  import spark.implicits._

  private val stateSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType)))

  test("fMGWS state schema: same schema resumes; an added field is " +
      "rejected without corrupting the checkpoint") {
    val root = java.nio.file.Files.createTempDirectory("evo_spec_")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in))

    def addFile(name: String, ids: Seq[Long]): Unit = {
      val tmp = root.resolve(s"tmp_$name").toString
      ids.toDF("user_id").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(part.renameTo(new java.io.File(in, s"$name.parquet")))
    }

    // each generation appends its emissions to one parquet sink (the
    // memory sink cannot recover from a checkpoint); counts are
    // running, so the CUMULATIVE row set pins every generation's output
    val outDir = root.resolve("out").toString
    def run(useV2: Boolean): Either[Throwable, Set[(Long, Long)]] =
      withConfs("spark.sql.shuffle.partitions" -> "4") {
        val grouped = spark.readStream.schema(stateSchema).parquet(in)
          .groupByKey(_.getLong(0))
        val counted =
          if (useV2) grouped.flatMapGroupsWithState(
            OutputMode.Append, GroupStateTimeout.NoTimeout)(
            StateSchemaEvolutionSpec.countV2 _)
          else grouped.flatMapGroupsWithState(
            OutputMode.Append, GroupStateTimeout.NoTimeout)(
            StateSchemaEvolutionSpec.countV1 _)
        val q = counted.toDF("user_id", "n")
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        try {
          q.processAllAvailable()
          Right(spark.read.parquet(outDir).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet)
        } catch { case t: Throwable => Left(t) }
        finally q.stop()
      }

    addFile("b1", Seq(1L, 1L, 2L))
    val g1 = run(useV2 = false)
    assert(g1 == Right(Set((1L, 2L), (2L, 1L))))

    // same schema resumes with state intact (key 1 continues from 2)
    addFile("b2", Seq(1L, 3L))
    val g2 = run(useV2 = false)
    assert(g2 == Right(Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))))

    // added Option[Long] field: rejected by the state schema check at
    // the first stateful batch — the error must name the schema problem
    addFile("b3", Seq(2L))
    val g3 = run(useV2 = true)
    assert(g3.isLeft, "schema-evolved state unexpectedly accepted")
    val msg = {
      def full(t: Throwable): String =
        t.getMessage + Option(t.getCause).map(full).getOrElse("")
      full(g3.swap.getOrElse(fail()))
    }
    assert(msg.toLowerCase.contains("schema"),
      s"expected a state-schema incompatibility error, got: $msg")

    // the rejected attempt did not corrupt anything: V1 still resumes
    // and processes the pending batch against the original state
    val g4 = run(useV2 = false)
    assert(g4 == Right(Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L),
      (2L, 2L))))

    graft.streaming.MergeSink.deleteRecursively(root.toFile)
  }
}

object StateSchemaEvolutionSpec {
  def countV1(
      key: Long, rows: Iterator[org.apache.spark.sql.Row],
      st: GroupState[EvoStateV1]): Iterator[(Long, Long)] = {
    val prev = st.getOption.map(_.count).getOrElse(0L)
    val next = prev + rows.size
    st.update(EvoStateV1(next))
    Iterator((key, next))
  }

  def countV2(
      key: Long, rows: Iterator[org.apache.spark.sql.Row],
      st: GroupState[EvoStateV2]): Iterator[(Long, Long)] = {
    val prev = st.getOption.map(_.count).getOrElse(0L)
    val next = prev + rows.size
    st.update(EvoStateV2(next, None))
    Iterator((key, next))
  }
}

/** V1 per-key state: the original deploy. */
case class EvoStateV1(count: Long)

/** V2 = V1 + a defaulted nullable field — the minimal "add a field"
  * evolution a Flink POJO savepoint would accept. */
case class EvoStateV2(count: Long, extra: Option[Long] = None)
