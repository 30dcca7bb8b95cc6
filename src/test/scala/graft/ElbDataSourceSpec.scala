package graft

import graft.sources.ElbLogParser

/** DSv2 ELB source: parity with the shared parser, tolerant drop of
  * malformed lines, and column pruning pushed into the scan. */
class ElbDataSourceSpec extends SparkFunSuite {
  import spark.implicits._

  private val lines = Seq(
    "2015-05-13T23:39:43.945958Z elb 10.0.0.1:80 10.0.0.2:80 0.0 0.0 0.0 200 200 0 3 GET http://x HTTP/1.1",
    "2015-05-13T23:39:44.955Z elb 10.9.9.9:2817 10.0.0.2:80 0.0 0.0 0.0 200 200 0 3 GET http://y HTTP/1.1",
    "not a log line at all",
    "2015-13-99T99:99:99Z elb 10.0.0.3:80", // unparseable timestamp
    "2015-05-13T23:39:45Z elb 10.0.0.4:80") // no fraction, 3 tokens min

  private def writeDir(): java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_elb_spec_")
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(root.toString)
    root
  }

  test("format(\"elb\") equals ElbLogParser.parse on the same lines; malformed dropped") {
    val root = writeDir()
    try {
      val viaSource = spark.read.format("elb").load(root.toString)
        .select("ip", "ts_ms").as[(String, Long)].collect().toSet
      val viaParser = ElbLogParser.parse(lines.toDF("value"))
        .select($"ip", org.apache.spark.sql.functions.unix_millis($"ts").as("ts_ms"))
        .as[(String, Long)].collect().toSet
      assert(viaSource == viaParser)
      assert(viaSource.size == 3) // two malformed lines dropped
      assert(viaSource.map(_._1) == Set("10.0.0.1:80", "10.9.9.9:2817", "10.0.0.4:80"))
    } finally graft.streaming.MergeSink.deleteRecursively(root.toFile)
  }

  test("column pruning reaches the DSv2 scan") {
    val root = writeDir()
    try {
      val df = spark.read.format("elb").load(root.toString).select("ip")
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty)
      assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("ip"),
        s"scan should read only 'ip', got ${scans.head.scan.readSchema().catalogString}")
      assert(df.as[String].collect().length == 3)
    } finally graft.streaming.MergeSink.deleteRecursively(root.toFile)
  }

  test("micro-batch stream tier reads files incrementally, new files in later batches") {
    val root = java.nio.file.Files.createTempDirectory("graft_elb_stream_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_elb_ckpt_")
    def writeFile(name: String, content: Seq[String]): Unit =
      java.nio.file.Files.writeString(root.resolve(name), content.mkString("\n"))
    try {
      writeFile("00.log", lines.take(2)) // 2 valid lines
      val q = spark.readStream.format("elb").load(root.toString)
        .writeStream.format("memory").queryName("elbstream")
        .option("checkpointLocation", ckpt.toString).start()
      try {
        q.processAllAvailable()
        assert(spark.table("elbstream").count() == 2)
        writeFile("01.log", lines.drop(2)) // 1 valid of 3 remaining
        q.processAllAvailable()
        val got = spark.table("elbstream").select("ip").as[String].collect().toSet
        assert(got == Set("10.0.0.1:80", "10.9.9.9:2817", "10.0.0.4:80"))
      } finally q.stop()
    } finally {
      graft.streaming.MergeSink.deleteRecursively(root.toFile)
      graft.streaming.MergeSink.deleteRecursively(ckpt.toFile)
    }
  }

  test("ip filters push into the scan and results match the unpushed read") {
    val root = writeDir()
    try {
      val eq = spark.read.format("elb").load(root.toString)
        .filter($"ip" === "10.9.9.9:2817")
      val scans = eq.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.head.scan.description().contains("ip eq 10.9.9.9:2817"),
        s"expected pushed predicate in ${scans.head.scan.description()}")
      assert(eq.select("ip").as[String].collect().toSeq == Seq("10.9.9.9:2817"))
      val prefix = spark.read.format("elb").load(root.toString)
        .filter($"ip".startsWith("10.0.0."))
        .select("ip").as[String].collect().toSet
      assert(prefix == Set("10.0.0.1:80", "10.0.0.4:80"))
    } finally graft.streaming.MergeSink.deleteRecursively(root.toFile)
  }

  test("timestamp column round-trips the raw token") {
    val root = writeDir()
    try {
      val raw = spark.read.format("elb").load(root.toString)
        .select("timestamp").as[String].collect().toSet
      assert(raw == Set(
        "2015-05-13T23:39:43.945958Z",
        "2015-05-13T23:39:44.955Z",
        "2015-05-13T23:39:45Z"))
    } finally graft.streaming.MergeSink.deleteRecursively(root.toFile)
  }
}
