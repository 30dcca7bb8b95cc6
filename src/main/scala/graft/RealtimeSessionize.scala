package graft

import graft.model.SessionConfig
import graft.operators.Sessionize
import graft.sources.{ElbLogParser, Streams}
import graft.streaming.{SessionizeProcessor, SessionizeStream}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reference-parity CLI (`RealtimeSessionize.scala:45-178`): replay ELB-style
  * access logs from a file or Kafka, sessionize, emit JSON.
  *
  *   runMain graft.RealtimeSessionize --source local --sink local \
  *     --path /data/logs.txt --out /tmp/out [--mode batch|stream] \
  *     [--gap-sec 1800] [--kafka-bootstrap host:port] [--topic-in t] [--topic-out t] \
  *     [--conf file.conf] [--ts-shift-ms N] [--once]
  *
  * Differences from the reference, on purpose (SURVEY.md §2):
  *  - tolerant parser (microsecond fractions, quoted request fields);
  *  - `--sink local` with `--source kafka` works (the reference NPEs);
  *  - the Kafka producer inherits the configured bootstrap servers (the
  *    reference builds an empty Properties and cannot connect);
  *  - batch mode exists at all (the reference is stream-only even for files).
  */
object RealtimeSessionize {

  final case class Options(
      source: String = "local",
      sink: String = "local",
      mode: String = "batch",
      path: String = "",
      out: String = "",
      gapSec: Long = SessionConfig.DefaultGapSec,
      engine: String = "fmgws", // fmgws = flatMapGroupsWithState | tws = transformWithState
      kafkaBootstrap: String = "",
      topicIn: String = "sessionize-in",
      topicOut: String = "sessionize-out",
      // Trigger.AvailableNow: process everything currently available, then
      // terminate — the incremental-batch pattern (cron-driven streaming
      // with checkpointed progress) and the only way a file-source stream
      // run can END for tests/smoke runs. Default = run forever.
      once: Boolean = false,
      // Reference parity (fakeTs debug shift, reference
      // RealtimeSessionize.scala:124-128): the reference shifts replayed
      // timestamps by (now - baseline) under --debug; ours takes the offset
      // EXPLICITLY so replays stay deterministic and testable. 0 = off.
      tsShiftMs: Long = 0L,
      // SASL/Kerberos consumer options derived from the flat config
      // (Streams.kafkaSecurityOptions) — reference KafkaConfig.scala:29-40.
      kafkaOptions: Map[String, String] = Map.empty)

  /** Apply a flat config map (see [[graft.sources.ConfLoader]]) as option
    * DEFAULTS — explicit CLI flags override. Kafka keys match the
    * reference's conf/sessionize.conf names. */
  private def withConf(o: Options, conf: Map[String, String]): Options = {
    def s(k: String, cur: String): String = conf.getOrElse(k, cur)
    def l(k: String, cur: Long): Long = conf.get(k).map(_.toLong).getOrElse(cur)
    o.copy(
      source = s("source", o.source),
      sink = s("sink", o.sink),
      mode = s("mode", o.mode),
      path = s("path", o.path),
      out = s("out", o.out),
      gapSec = l("gap.sec", o.gapSec),
      engine = s("engine", o.engine),
      kafkaBootstrap = s("kafka.bootstrap.servers", o.kafkaBootstrap),
      topicIn = s("kafka.topic.in", o.topicIn),
      topicOut = s("kafka.topic.out", o.topicOut),
      tsShiftMs = l("ts.shift.ms", o.tsShiftMs),
      once = conf.get("once").map(_.toBoolean).getOrElse(o.once),
      kafkaOptions = o.kafkaOptions ++ Streams.kafkaSecurityOptions(conf))
  }

  def parseArgs(args: Array[String]): Options = {
    def loop(rest: List[String], o: Options): Options = rest match {
      case "--conf" :: _ :: t => loop(t, o) // handled in the pre-pass below
      case "--source" :: v :: t => loop(t, o.copy(source = v))
      case "--sink" :: v :: t => loop(t, o.copy(sink = v))
      case "--mode" :: v :: t => loop(t, o.copy(mode = v))
      case "--path" :: v :: t => loop(t, o.copy(path = v))
      case "--out" :: v :: t => loop(t, o.copy(out = v))
      case "--gap-sec" :: v :: t => loop(t, o.copy(gapSec = v.toLong))
      case "--engine" :: v :: t => loop(t, o.copy(engine = v))
      case "--kafka-bootstrap" :: v :: t => loop(t, o.copy(kafkaBootstrap = v))
      case "--topic-in" :: v :: t => loop(t, o.copy(topicIn = v))
      case "--topic-out" :: v :: t => loop(t, o.copy(topicOut = v))
      case "--ts-shift-ms" :: v :: t => loop(t, o.copy(tsShiftMs = v.toLong))
      case "--once" :: t => loop(t, o.copy(once = true))
      case Nil => o
      case other :: _ => throw new IllegalArgumentException(s"unknown argument: $other")
    }
    // conf files supply DEFAULTS; flags (parsed second) override them.
    // The pre-pass walks flag/value PAIRS (not every sliding window), so a
    // "--conf" appearing as another flag's value is not misread as a config
    // file, and multiple --conf files all apply, in order (later wins).
    // A "--flag" whose successor is also a "--flag" is valueless (no flag
    // here takes a "--"-prefixed value) — derived, so a future valueless
    // flag can't silently misalign the walk and drop --conf files.
    def flagPairs(rest: List[String]): List[(String, String)] = rest match {
      case k :: (more @ (v :: _)) if k.startsWith("--") && v.startsWith("--") => flagPairs(more)
      case k :: v :: t if k.startsWith("--") => (k, v) :: flagPairs(t)
      case _ => Nil
    }
    val defaults = flagPairs(args.toList)
      .collect { case ("--conf", path) => path }
      .foldLeft(Options())((o, path) => withConf(o, graft.sources.ConfLoader.load(path)))
    val o = loop(args.toList, defaults)
    require(Set("local", "kafka")(o.source), s"invalid source: ${o.source}")
    require(Set("local", "kafka")(o.sink), s"invalid sink: ${o.sink}")
    require(Set("batch", "stream")(o.mode), s"invalid mode: ${o.mode}")
    require(Set("fmgws", "tws")(o.engine), s"invalid engine: ${o.engine}")
    require(o.source == "kafka" || o.path.nonEmpty, "--path required for local source")
    // stream mode always needs --out: a kafka sink still roots its
    // checkpointLocation there (otherwise it would land at "/_checkpoint")
    require(
      (o.sink == "kafka" && o.mode == "batch") || o.out.nonEmpty,
      "--out required (output dir, and checkpoint root in stream mode)")
    o
  }

  def main(args: Array[String]): Unit = {
    val o = parseArgs(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-realtime-sessionize")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, o)
    finally spark.stop()
  }

  /** Reference fakeTs parity: shift event time by a fixed offset (replay
    * logs as if they happened now). Integer-millis arithmetic, codegen'd. */
  private def shiftTs(df: org.apache.spark.sql.DataFrame, shiftMs: Long) =
    if (shiftMs == 0L) df
    else df.withColumn("ts", timestamp_millis(unix_millis(col("ts")) + shiftMs))

  def run(spark: SparkSession, o: Options): Unit = {
    val cfg = SessionConfig(gapSec = o.gapSec)
    if (o.mode == "batch") {
      val lines = spark.read.text(o.path)
      val parsed = shiftTs(ElbLogParser.parse(lines), o.tsShiftMs)
      val sessionized = Sessionize
        .fullSessionize(parsed.withColumn("tieBreak", lit(0L)),
          key = "ip", ts = "ts", tieBreak = "tieBreak", cfg = cfg)
        .select(to_json(struct(
          col("tsMillis").as("ts"), col("key").as("ip"),
          col("sessionId").as("session_id"), col("duration"))).as("value"))
      sessionized.write.mode("overwrite").text(o.out)
    } else {
      // Reference parity: the Flink job assumes a RocksDB state backend
      // (README.md:92-100); Spark's equivalent is the RocksDB state store.
      // Scoped: restored after the query ends so a shared session (tests,
      // notebooks) doesn't keep the provider switched behind callers' backs.
      val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try runStream(spark, o, cfg)
      finally prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  private def runStream(spark: SparkSession, o: Options, cfg: SessionConfig): Unit = {
      val lines =
        if (o.source == "kafka")
          Streams.kafkaLines(spark, o.kafkaBootstrap, o.topicIn,
            extraOptions = o.kafkaOptions)
        else Streams.fileLines(spark, o.path)
      val parsed = shiftTs(ElbLogParser.parse(lines), o.tsShiftMs)
        .select(col("ip").as("key"), col("ts"), lit(0L).as("tieBreak"))
      val sessionized =
        if (o.engine == "tws") SessionizeProcessor.sessionize(parsed, cfg)
        else SessionizeStream.sessionize(parsed, cfg)
      val writer =
        if (o.sink == "kafka")
          Streams.kafkaJsonSink(sessionized, o.kafkaBootstrap, o.topicOut, s"${o.out}/_checkpoint")
        else Streams.jsonFileSink(sessionized, o.out, s"${o.out}/_checkpoint")
      val q =
        if (o.once)
          writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        else writer.start()
      q.awaitTermination()
  }
}
