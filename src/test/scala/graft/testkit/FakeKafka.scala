package graft.testkit

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TEST-ONLY embedded fake Kafka: a DataSource V2 provider registered under
  * the short name `kafka` on the TEST classpath (META-INF/services), so the
  * production [[graft.sources.Streams.kafkaLines]]/`kafkaJsonSink` paths —
  * which hardcode `.format("kafka")` exactly like the reference job binds
  * its consumer/producer (`RealtimeSessionize.scala:94-102,161-174`) — run
  * END-TO-END without a broker or the (offline-unresolvable) connector jar.
  *
  * The stub implements the real connector's OPTION SURFACE, not its wire
  * protocol:
  *  - source: `kafka.bootstrap.servers` required non-empty, `subscribe`
  *    required, `startingOffsets` ∈ {latest, earliest} (default latest —
  *    the reference's `setStartFromLatest`), any other `kafka.*` option
  *    (the SASL/Kerberos keys of `config/KafkaConfig.scala:29-40`)
  *    accepted and captured for inspection;
  *  - source schema = the real connector's 7 columns (key/value binary,
  *    topic, partition, offset, timestamp, timestampType);
  *  - sink: `topic` + `kafka.bootstrap.servers` required, input must carry
  *    a string/binary `value` column; epoch commits publish atomically.
  *
  * If a future environment ships the REAL spark-sql-kafka jar, provider
  * lookup becomes ambiguous ("Multiple sources found") and the contract
  * spec fails loudly — the signal to delete this stub. */
class FakeKafkaSource extends TableProvider with DataSourceRegister
    with RelationProvider with CreatableRelationProvider {
  override def shortName(): String = "kafka"

  // ---- V1 surface: "kafka" sits on spark.sql.sources.useV1SourceList by
  // default, so BATCH read/write (`spark.read`/`df.write.format("kafka")`)
  // route through RelationProvider/CreatableRelationProvider — exactly how
  // the real KafkaSourceProvider is structured. Streaming stays DSv2.
  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    require(parameters.get("kafka.bootstrap.servers").exists(_.nonEmpty),
      "fake kafka: required option 'kafka.bootstrap.servers' is missing/empty " +
        "(same contract as the real connector)")
    val topic = parameters.getOrElse("subscribe",
      sys.error("fake kafka: required option 'subscribe' is missing"))
    val starting = parameters.getOrElse("startingOffsets", "earliest")
    require(starting == "latest" || starting == "earliest",
      s"fake kafka: unsupported startingOffsets '$starting'")
    FakeKafkaBroker.lastSourceOptions = parameters
    new FakeKafkaBatchRelation(sqlContext, topic, starting)
  }

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    require(mode == SaveMode.Append || mode == SaveMode.ErrorIfExists,
      s"fake kafka sink: unsupported save mode $mode (real connector contract)")
    require(parameters.get("kafka.bootstrap.servers").exists(_.nonEmpty),
      "fake kafka: required option 'kafka.bootstrap.servers' is missing/empty")
    val topic = parameters.getOrElse("topic",
      sys.error("fake kafka: required option 'topic' is missing"))
    FakeKafkaBroker.lastSinkOptions = parameters
    val fields = data.schema.fieldNames
    val valueIdx = fields.indexOf("value")
    require(valueIdx >= 0, "fake kafka sink: input must carry a 'value' column")
    val keyIdx = fields.indexOf("key")
    def bytes(r: Row, i: Int): Array[Byte] =
      if (i < 0 || r.isNullAt(i)) null
      else r.get(i) match {
        case s: String => s.getBytes("UTF-8")
        case b: Array[Byte] => b
        case other => sys.error(s"fake kafka sink: key/value must be string/binary, got $other")
      }
    // tasks share the JVM under local[*]; collect-then-publish keeps the
    // publish atomic like the DSv2 epoch commit
    data.collect().foreach(r =>
      FakeKafkaBroker.publishRaw(topic, bytes(r, keyIdx), bytes(r, valueIdx)))
    new FakeKafkaBatchRelation(sqlContext, topic, "earliest")
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    FakeKafkaBroker.requireOption(options, "kafka.bootstrap.servers")
    FakeKafkaSource.Schema
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new FakeKafkaTable(new CaseInsensitiveStringMap(properties))
}

object FakeKafkaSource {
  /** The real Kafka source's fixed read schema. */
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))
}

/** In-JVM broker state: append-only logs per topic (local[*] test scope —
  * executors share the JVM). Offsets are log positions, like Kafka's. */
object FakeKafkaBroker {
  // per-topic append-only log of (key, value, appendMs) — key nullable,
  // exactly like a Kafka record
  private val topics = new ConcurrentHashMap[String, ArrayBuffer[(Array[Byte], Array[Byte], Long)]]()
  /** Options the last SOURCE table was opened with — lets the contract
    * spec assert the SASL/Kerberos keys actually reach the consumer
    * config, mirroring reference `KafkaConfig.fromRootProps`. */
  @volatile var lastSourceOptions: Map[String, String] = Map.empty
  /** Options the last SINK write was built with — the producer-side
    * twin (reference applies one security config to both ends). */
  @volatile var lastSinkOptions: Map[String, String] = Map.empty
  /** One-shot failure injection: the next epoch commit PUBLISHES its
    * rows and then throws — modelling the real at-least-once window
    * (producer sends are not transactional with the offset commit, so
    * a crash between them re-emits the batch on restart). */
  @volatile var failNextSinkCommitAfterPublish: Boolean = false

  private def log(topic: String): ArrayBuffer[(Array[Byte], Array[Byte], Long)] =
    topics.computeIfAbsent(topic, _ => ArrayBuffer.empty)

  def publish(topic: String, value: String): Unit =
    publishRaw(topic, null, value.getBytes("UTF-8"))
  def publishRaw(topic: String, key: Array[Byte], value: Array[Byte]): Unit = {
    val l = log(topic)
    l.synchronized { l += ((key, value, System.currentTimeMillis())) }
  }
  def size(topic: String): Int = { val l = log(topic); l.synchronized(l.length) }
  /** (key, value, offset, appendMs) for log positions [from, until). */
  def fetch(topic: String, from: Int, until: Int): Seq[(Array[Byte], Array[Byte], Long, Long)] = {
    val l = log(topic)
    l.synchronized {
      l.slice(from, until).zipWithIndex
        .map { case ((k, v, ts), i) => (k, v, (from + i).toLong, ts) }.toSeq
    }
  }
  def values(topic: String): Seq[String] = {
    val l = log(topic)
    l.synchronized(l.map(r => new String(r._2, "UTF-8")).toSeq)
  }
  def clear(): Unit = {
    topics.clear(); lastSourceOptions = Map.empty; lastSinkOptions = Map.empty
    failNextSinkCommitAfterPublish = false
  }

  def requireOption(options: CaseInsensitiveStringMap, key: String): String = {
    val v = options.get(key)
    require(v != null && v.nonEmpty,
      s"fake kafka: required option '$key' is missing/empty " +
        "(same contract as the real connector)")
    v
  }
}

class FakeKafkaTable(options: CaseInsensitiveStringMap) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = "fakekafka"
  override def schema(): StructType = FakeKafkaSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.BATCH_WRITE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    FakeKafkaBroker.requireOption(opts, "kafka.bootstrap.servers")
    val topic = FakeKafkaBroker.requireOption(opts, "subscribe")
    val starting = Option(opts.get("startingOffsets")).getOrElse("latest")
    require(starting == "latest" || starting == "earliest",
      s"fake kafka: unsupported startingOffsets '$starting'")
    // capture the full option map (incl. kafka.* SASL keys) for the spec
    val captured = scala.collection.mutable.Map[String, String]()
    opts.entrySet().forEach(e => captured += (e.getKey -> e.getValue))
    FakeKafkaBroker.lastSourceOptions = captured.toMap
    new FakeKafkaScanBuilder(topic, starting)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    FakeKafkaBroker.requireOption(info.options(), "kafka.bootstrap.servers")
    val topic = FakeKafkaBroker.requireOption(info.options(), "topic")
    // capture the full option map (incl. kafka.* SASL keys) for the spec —
    // the producer-side twin of the newScanBuilder capture
    val capturedW = scala.collection.mutable.Map[String, String]()
    info.options().entrySet().forEach(e => capturedW += (e.getKey -> e.getValue))
    FakeKafkaBroker.lastSinkOptions = capturedW.toMap
    val valueIdx = info.schema().fieldNames.indexOf("value")
    require(valueIdx >= 0,
      "fake kafka sink: input must carry a 'value' column (same contract " +
        "as the real connector when no per-row topic/key is used)")
    val valueType = info.schema().fields(valueIdx).dataType
    require(valueType == StringType || valueType == BinaryType,
      s"fake kafka sink: 'value' must be string or binary, got $valueType")
    // optional producer-side key column — same contract as the real sink
    val keyIdx = info.schema().fieldNames.indexOf("key")
    val keyIsString = keyIdx >= 0 &&
      info.schema().fields(keyIdx).dataType == StringType
    if (keyIdx >= 0) {
      val kt = info.schema().fields(keyIdx).dataType
      require(kt == StringType || kt == BinaryType,
        s"fake kafka sink: 'key' must be string or binary, got $kt")
    }
    new FakeKafkaWriteBuilder(topic, valueIdx, valueType == StringType,
      keyIdx, keyIsString)
  }
}

class FakeKafkaScanBuilder(topic: String, starting: String) extends ScanBuilder {
  override def build(): Scan = new FakeKafkaScan(topic, starting)
}

class FakeKafkaScan(topic: String, starting: String) extends Scan {
  override def readSchema(): StructType = FakeKafkaSource.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FakeKafkaMicroBatchStream(topic, starting)
  // batch read (spark.read.format("kafka")): the real connector reads the
  // log between startingOffsets and the CURRENT end — one snapshot scan
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val from = if (starting == "earliest") 0 else FakeKafkaBroker.size(topic)
      val until = FakeKafkaBroker.size(topic)
      if (until <= from) Array.empty
      else Array(FakeKafkaInputPartition(topic,
        FakeKafkaBroker.fetch(topic, from, until).toArray))
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new FakeKafkaReaderFactory
  }
  override def description(): String = s"fakekafka($topic, $starting)"
}

class FakeKafkaMicroBatchStream(topic: String, starting: String)
    extends MicroBatchStream {
  private case class KOffset(n: Int) extends Offset {
    override def json(): String = n.toString
  }
  // "latest" pins the start to the log size AT STREAM START — messages
  // published before the query starts are not replayed (the reference's
  // setStartFromLatest); "earliest" replays from position 0
  private lazy val initial: Int =
    if (starting == "earliest") 0 else FakeKafkaBroker.size(topic)

  override def initialOffset(): Offset = KOffset(initial)
  override def latestOffset(): Offset = KOffset(FakeKafkaBroker.size(topic))
  override def deserializeOffset(json: String): Offset = KOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KOffset].n
    val e = end.asInstanceOf[KOffset].n
    if (e <= s) Array.empty
    else Array(FakeKafkaInputPartition(topic, FakeKafkaBroker.fetch(topic, s, e).toArray))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FakeKafkaReaderFactory
}

case class FakeKafkaInputPartition(
    topic: String, rows: Array[(Array[Byte], Array[Byte], Long, Long)]) extends InputPartition

class FakeKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FakeKafkaInputPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.rows.length }
      override def get(): InternalRow = {
        val (k, v, off, tsMs) = p.rows(i)
        InternalRow(
          k, // key (null when the producer sent none)
          v,
          UTF8String.fromString(p.topic),
          0, // partition
          off,
          tsMs * 1000L, // TimestampType micros
          0) // timestampType = NO_TIMESTAMP_TYPE-ish constant
      }
      override def close(): Unit = ()
    }
  }
}

class FakeKafkaWriteBuilder(topic: String, valueIdx: Int, valueIsString: Boolean,
    keyIdx: Int, keyIsString: Boolean) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toStreaming: StreamingWrite =
      new FakeKafkaStreamingWrite(topic, valueIdx, valueIsString, keyIdx, keyIsString)
    // batch write (df.write.format("kafka") — the foreachBatch upsert
    // producer path): same task-buffer + atomic driver publish as the
    // streaming epochs, without an epoch id
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        FakeKafkaBatchWriterFactory(valueIdx, valueIsString, keyIdx, keyIsString)
      override def commit(messages: Array[WriterCommitMessage]): Unit =
        messages.foreach {
          case FakeKafkaCommit(rows) =>
            rows.foreach { case (k, v) => FakeKafkaBroker.publishRaw(topic, k, v) }
          case other => sys.error(s"unexpected commit message: $other")
        }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

/** Per-epoch buffered write: rows accumulate in task-side writers, travel
  * to the driver as commit messages, and publish atomically on epoch
  * commit — the at-least-once contract the real sink documents (an
  * aborted epoch republishes; nothing is lost). */
class FakeKafkaStreamingWrite(topic: String, valueIdx: Int, valueIsString: Boolean,
    keyIdx: Int, keyIsString: Boolean) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    // top-level case class, NOT an anonymous inner class: the factory is
    // shipped to executors and must not capture this (non-serializable) write
    FakeKafkaWriterFactory(valueIdx, valueIsString, keyIdx, keyIsString)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case FakeKafkaCommit(rows) =>
        rows.foreach { case (k, v) => FakeKafkaBroker.publishRaw(topic, k, v) }
      case other => sys.error(s"unexpected commit message: $other")
    }
    if (FakeKafkaBroker.failNextSinkCommitAfterPublish) {
      FakeKafkaBroker.failNextSinkCommitAfterPublish = false
      sys.error("fake kafka: injected crash AFTER publish, BEFORE the " +
        "offset commit (the at-least-once window)")
    }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

case class FakeKafkaWriterFactory(valueIdx: Int, valueIsString: Boolean,
    keyIdx: Int, keyIsString: Boolean) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    FakeKafkaDataWriter(valueIdx, valueIsString, keyIdx, keyIsString)
}

case class FakeKafkaBatchWriterFactory(valueIdx: Int, valueIsString: Boolean,
    keyIdx: Int, keyIsString: Boolean) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    FakeKafkaDataWriter(valueIdx, valueIsString, keyIdx, keyIsString)
}

/** Shared task-side buffer for the streaming and batch write paths. */
case class FakeKafkaDataWriter(valueIdx: Int, valueIsString: Boolean,
    keyIdx: Int, keyIsString: Boolean) extends DataWriter[InternalRow] {
  private val buf = ArrayBuffer[(Array[Byte], Array[Byte])]()
  override def write(record: InternalRow): Unit = {
    val v = if (valueIsString) record.getUTF8String(valueIdx).getBytes
      else record.getBinary(valueIdx)
    val k = if (keyIdx < 0 || record.isNullAt(keyIdx)) null
      else if (keyIsString) record.getUTF8String(keyIdx).getBytes
      else record.getBinary(keyIdx)
    buf += ((k, v))
  }
  override def commit(): WriterCommitMessage = FakeKafkaCommit(buf.toArray)
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

case class FakeKafkaCommit(rows: Array[(Array[Byte], Array[Byte])]) extends WriterCommitMessage

/** V1 batch relation over the broker log — the reader half of
  * `spark.read.format("kafka")` (real-connector column set). */
class FakeKafkaBatchRelation(ctx: SQLContext, topic: String, starting: String)
    extends BaseRelation with TableScan {
  override def sqlContext: SQLContext = ctx
  override def schema: StructType = FakeKafkaSource.Schema
  override def buildScan(): RDD[Row] = {
    val from = if (starting == "earliest") 0 else FakeKafkaBroker.size(topic)
    val rows = FakeKafkaBroker.fetch(topic, from, FakeKafkaBroker.size(topic))
      .map { case (k, v, off, tsMs) =>
        Row(k, v, topic, 0, off, new java.sql.Timestamp(tsMs), 0)
      }
    ctx.sparkContext.parallelize(rows, math.max(1, math.min(4, rows.size)))
  }
}
