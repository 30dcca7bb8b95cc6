package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming source/sink wiring mirroring the reference's two entry points
  * (SURVEY.md §2.1, §2.6): local text replay and Kafka in/out.
  *
  * Kafka parity notes:
  *  - source: subscribe + startingOffsets=latest ≈ `setStartFromLatest()`
  *    (`RealtimeSessionize.scala:94-102`);
  *  - sink: Spark's Kafka sink is at-least-once; the reference claims
  *    EXACTLY_ONCE via transactional producers (`:165-174`) — a documented
  *    semantics delta (SURVEY.md §7.4), not silently glossed. The
  *    production-pattern closure is [[graft.streaming.KeyedKafkaSink]]:
  *    keyed upserts + a compacted consumer view make replayed
  *    micro-batches invisible to consumers (effectively-once),
  *    contract-proven in FakeKafkaUpsertSpec;
  *  - the reference's sink bug (fresh Properties with empty
  *    bootstrap.servers, `:162-163`) is intentionally NOT reproduced.
  * The Kafka connector jar is not present in this container (verified:
  * `spark-sql-kafka-0-10_2.13:4.1.2` is absent from both /opt/spark/jars
  * and the offline dependency mirror — resolution attempt documented in
  * build.sbt), so these paths are config-complete but exercised only in
  * environments that ship spark-sql-kafka. KafkaUnavailableSpec pins the
  * exact in-container failure mode so the gap is tested, not assumed. */
object Streams {

  /** Streaming text-file source (reference `readTextFile`, but a directory —
    * Spark's file source watches dirs, a minor surface difference). */
  def fileLines(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)

  /** Kafka string-value source. */
  def kafkaLines(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "latest",
      extraOptions: Map[String, String] = Map.empty): DataFrame =
    extraOptions
      .foldLeft(
        spark.readStream
          .format("kafka")
          .option("kafka.bootstrap.servers", bootstrapServers)
          .option("subscribe", topic)
          .option("startingOffsets", startingOffsets)) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** SASL/Kerberos consumer-config parity with the reference's
    * `KafkaConfig.fromRootProps` (`config/KafkaConfig.scala:29-40`): when
    * `kafka.security.protocol` is present in the flat config, the three
    * security keys are forwarded — and, as in the reference (unconditional
    * `getString` once the protocol key exists), the companion SASL keys are
    * then REQUIRED, so a half-configured secure setup fails fast at config
    * time instead of at broker handshake. Spark's Kafka source passes any
    * `kafka.`-prefixed option verbatim to the underlying consumer, so the
    * reference's HOCON names are already the Spark option names; feed the
    * result to [[kafkaLines]]'s `extraOptions`. */
  def kafkaSecurityOptions(conf: Map[String, String]): Map[String, String] = {
    val keys = Seq("kafka.security.protocol", "kafka.sasl.mechanism",
      "kafka.sasl.kerberos.service.name")
    if (!conf.contains(keys.head)) Map.empty
    else keys.map { k =>
      require(conf.contains(k),
        s"kafka.security.protocol is set but $k is missing (reference " +
          "KafkaConfig.fromRootProps requires all three security keys)")
      k -> conf(k)
    }.toMap
  }

  /** Typed re-ingest of the engine's own emitted session JSON — the
    * reference loop closed: the Flink job's JSON feeds a downstream OLAP
    * store (README.md:42-50); here the same engine consumes its emission
    * for the OLAP queries. Explicit schema (a schema-inference pre-scan is
    * an extra full pass at 100 TB); lines that fail to parse surface as a
    * NULL struct and are dropped explicitly rather than silently. */
  def readSessionsJson(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ts", LongType),
      StructField("ip", StringType),
      StructField("session_id", StringType),
      StructField("duration", LongType)))
    spark.read.text(path)
      .select(from_json(col("value"), schema).as("s"))
      .filter(col("s").isNotNull && col("s.ip").isNotNull)
      .select(col("s.*"))
  }

  /** JSON-lines file sink (reference `writeAsText` of json4s output). */
  def jsonFileSink[T](ds: org.apache.spark.sql.Dataset[T], path: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    ds.toDF().writeStream
      .format("json")
      .option("path", path)
      .option("checkpointLocation", checkpoint)

  /** Kafka sink: rows serialized to a JSON `value` column.
    *
    * `extraOptions` is the producer-side twin of [[kafkaLines]]'s: the
    * reference applies the SAME security config to its producer as to its
    * consumer (`config/KafkaConfig.scala:29-40` feeds both ends), so the
    * [[kafkaSecurityOptions]] map passes through here too — asserted at
    * the writer boundary by FakeKafkaContractSpec. */
  def kafkaJsonSink[T](
      ds: org.apache.spark.sql.Dataset[T],
      bootstrapServers: String,
      topic: String,
      checkpoint: String,
      extraOptions: Map[String, String] = Map.empty): DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.functions._
    ds.toDF()
      .select(to_json(struct(col("*"))).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .options(extraOptions)
  }
}
