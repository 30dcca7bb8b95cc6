package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Native DataSource V2 batch source for the reference's ELB access-log
  * format (`spark.read.format("elb").load(dir)`) — the "source" tier of the
  * Spark extension surface done properly: a `TableProvider` → `ScanBuilder`
  * → `Batch` → `PartitionReader` chain instead of read-text-then-parse.
  *
  * Semantics = [[ElbLogParser.parseLine]] exactly (one shared function):
  * tolerant tokenization, ISO-8601 timestamp with any fraction width,
  * unparseable lines silently dropped. Emits `(timestamp string,
  * ts_ms long, ip string)`.
  *
  * Scale shape: one `InputPartition` per file (ELB logs ship as many
  * rotated files — parallelism comes from file count, the same contract as
  * Spark's own text source before splitting); column pruning is pushed
  * into the reader (`SupportsPushDownRequiredColumns`), so a
  * `select(ip)` never materializes the other fields. Files resolve
  * through the path's own Hadoop `FileSystem`, not `java.io` (works for
  * hdfs:// and s3a:// paths, the compactSmallFiles lesson). */
class ElbDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "elb"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ElbTable.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ElbTable(properties.get("path"))
}

object ElbTable {
  val Schema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("ts_ms", LongType),
    StructField("ip", StringType)))
}

class ElbTable(path: String) extends Table with SupportsRead {
  require(path != null, "elb source requires a path: spark.read.format(\"elb\").load(dir)")
  override def name(): String = s"elb($path)"
  override def schema(): StructType = ElbTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ElbScanBuilder(path)
}

class ElbScanBuilder(path: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, StringStartsWith}

  private var required: StructType = ElbTable.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }

  /** Accept ip equality/prefix predicates — evaluated in the reader on the
    * RAW token BEFORE the timestamp parse (the expensive step), so a
    * selective ip filter skips most of the per-line work. ALL filters are
    * returned as residuals (Spark re-applies them above the scan), so the
    * pushdown is a pure skip optimization — double-filtering keeps
    * correctness independent of the reader's predicate support. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.collect {
      case f @ EqualTo("ip", _: String) => f
      case f @ StringStartsWith("ip", _) => f
    }
    filters // every filter stays a residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val preds = pushed.map {
      case EqualTo("ip", v: String) => ("eq", v)
      case StringStartsWith("ip", v) => ("prefix", v)
    }
    new ElbScan(path, required, preds)
  }
}

class ElbScan(path: String, required: StructType, preds: Array[(String, String)] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    ElbScan.listFiles(path).map(f => ElbInputPartition(f): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new ElbReaderFactory(required.fieldNames, preds)
  override def toMicroBatchStream(checkpointLocation: String) =
    new ElbMicroBatchStream(path, required.fieldNames)
  override def description(): String =
    s"elb($path) pushed=[${preds.map(p => s"ip ${p._1} ${p._2}").mkString(", ")}]"
}

object ElbScan {
  /** Deterministic (name-sorted) file listing through the path's own
    * Hadoop FileSystem. */
  def listFiles(path: String): Array[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val stat = fs.getFileStatus(p)
    val files =
      if (stat.isFile) Array(p)
      else fs.listStatus(p).filter(_.isFile).map(_.getPath)
        .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
    files.map(_.toString).sorted
  }
}

/** Streaming tier: the offset is the count of files consumed from the
  * NAME-SORTED listing — new files appended to the directory (sorting
  * later than those already read, e.g. timestamped log rotations) arrive
  * in later microbatches; each batch reads the file-range (start, end].
  * Files are the atomic unit (same contract as Spark's own file stream
  * source); a file must be fully written before it sorts into view. */
class ElbMicroBatchStream(path: String, fields: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class ElbOffset(n: Int) extends Offset {
    override def json(): String = n.toString
  }

  override def latestOffset(): Offset = ElbOffset(ElbScan.listFiles(path).length)
  override def initialOffset(): Offset = ElbOffset(0)
  override def deserializeOffset(json: String): Offset = ElbOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ElbOffset].n
    val e = end.asInstanceOf[ElbOffset].n
    ElbScan.listFiles(path).slice(s, e).map(f => ElbInputPartition(f): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ElbReaderFactory(fields)
}

case class ElbInputPartition(file: String) extends InputPartition

/** Serialized to executors — carries the pruned field names and the
  * pushed ip predicates. */
class ElbReaderFactory(fields: Array[String], preds: Array[(String, String)] = Array.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ElbPartitionReader(partition.asInstanceOf[ElbInputPartition].file, fields, preds)
}

class ElbPartitionReader(
    file: String,
    fields: Array[String],
    preds: Array[(String, String)] = Array.empty)
    extends PartitionReader[InternalRow] {
  private val path = new org.apache.hadoop.fs.Path(file)
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(
      path.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(path),
      java.nio.charset.StandardCharsets.UTF_8))
  private var current: InternalRow = _

  /** Pushed ip predicates checked on the RAW third token before the
    * timestamp parse — the skip that makes pushdown worth having. */
  private def ipMatches(line: String): Boolean =
    preds.isEmpty || {
      val toks = line.trim.split("\\s+", 4)
      toks.length >= 3 && preds.forall {
        case ("eq", v) => toks(2) == v
        case ("prefix", v) => toks(2).startsWith(v)
      }
    }

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      (if (ipMatches(line)) ElbLogParser.parseLine(line) else None) match {
        case Some(parsed) =>
          current = InternalRow.fromSeq(fields.toSeq.map {
            case "timestamp" => UTF8String.fromString(parsed.timestamp)
            case "ts_ms" => parsed.ts
            case "ip" => UTF8String.fromString(parsed.ip)
            case other => sys.error(s"unknown elb column: $other")
          })
          return true
        case None => line = reader.readLine() // tolerant drop, like parse()
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
