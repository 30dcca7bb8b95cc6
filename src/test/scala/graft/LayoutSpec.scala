package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Clustered-layout writes and the pruning they buy on read-back:
  * directory-level partition pruning + pushed-down range predicates over
  * the in-file sort column. */
class LayoutSpec extends SparkFunSuite {
  import spark.implicits._

  test("writeClustered: partition pruning and filter pushdown both appear on the read plan") {
    val root = java.nio.file.Files.createTempDirectory("layout_spec_").toString
    val events = SparkEntry.table(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    Layout.writeClustered(events, root, partCol = "event_type", sortCol = "user_id")

    // one file per partition directory: the repartition aligned writer
    // tasks to partition values (no small-file explosion)
    val dirs = new java.io.File(root).listFiles().filter(_.getName.startsWith("event_type="))
    assert(dirs.length > 1)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName} has ${files.length} files")
    }

    val read = spark.read.parquet(root)
      .filter(col("event_type") === "click" && col("user_id") < 50L)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"expected directory-level partition pruning in:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(user_id,50)"),
      s"expected user_id range pushed to the parquet scan in:\n$plan")

    // and the pruned read returns exactly the right rows
    val expected = events.filter(col("event_type") === "click" && col("user_id") < 50L)
      .select("event_id").as[Long].collect().toSet
    val got = read.select("event_id").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty)

    // in-file clustering: rows inside the file are sorted by user_id, the
    // property parquet min/max row-group skipping relies on
    val clickRows = spark.read.parquet(root)
      .filter(col("event_type") === "click")
      .select(col("user_id"), input_file_name().as("f"))
    val sorted = clickRows.rdd.mapPartitionsWithIndex { (_, it) =>
      val rows = it.map(_.getLong(0)).toSeq
      Iterator(rows == rows.sorted)
    }.collect()
    assert(sorted.forall(identity), "user_id must be monotone within each read split")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(root))
  }

  test("zValue interleaves bits: a at even positions, b at odd") {
    val got = spark.range(1)
      .select(Layout.zValue(lit(5L), lit(3L), bits = 3).as("z"))
      .as[Long].head()
    // a=101b -> bits at positions 0,4 = 17; b=011b -> positions 1,3 = 10
    assert(got == 27L)
  }

  test("writeZOrdered: empty input writes an empty table instead of crashing on null ranges") {
    val root = java.nio.file.Files.createTempDirectory("zorder_empty_").toString
    val empty = SparkEntry.table(spark, sf0001, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
      .filter(lit(false))
    Layout.writeZOrdered(empty, root, "user_id", "ts_ms", files = 2)
    assert(spark.read.schema(empty.schema).parquet(root).count() == 0)
    graft.streaming.MergeSink.deleteRecursively(new java.io.File(root))
  }

  test("writeZOrdered: every file covers a small rectangle in BOTH dimensions") {
    val root = java.nio.file.Files.createTempDirectory("zorder_spec_").toString
    val ev = SparkEntry.table(spark, sf0001, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
    Layout.writeZOrdered(ev, root, "user_id", "ts_ms", files = 8)
    val tagged = spark.read.parquet(root)
      .select(input_file_name().as("f"), col("user_id"), col("ts_ms"))
    val spans = tagged.groupBy("f").agg(
      (max("user_id") - min("user_id")).cast("double").as("du"),
      (max("ts_ms") - min("ts_ms")).cast("double").as("dt"))
      .as[(String, Double, Double)].collect()
    assert(spans.length > 4, s"expected ~8 files, got ${spans.length}")
    val (gu, gt) = tagged
      .agg((max("user_id") - min("user_id")).cast("double"),
        (max("ts_ms") - min("ts_ms")).cast("double"))
      .as[(Double, Double)].head()
    val avgDu = spans.map(_._2).sum / spans.length / gu
    val avgDt = spans.map(_._3).sum / spans.length / gt
    // a LINEAR sort on one column leaves the other dimension's per-file
    // span ≈ the full global range (ratio ~1.0); the z-curve must shrink
    // BOTH dimensions at once (ideal for 8 files ≈ 1/sqrt(8) ≈ 0.35)
    assert(avgDu < 0.65, s"user_id per-file span ratio $avgDu")
    assert(avgDt < 0.65, s"ts per-file span ratio $avgDt")
    // nothing lost in the rewrite
    assert(spark.read.parquet(root).count() == ev.count())
    graft.streaming.MergeSink.deleteRecursively(new java.io.File(root))
  }

  test("compactSmallFiles collapses a micro-batch spray into few files, content-identical") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_compact_").toString + "/t"
    // simulate a streaming sink's accretion: 40 tiny appends
    (0 until 40).foreach { i =>
      Seq((i.toLong, s"row$i")).toDF("id", "s")
        .coalesce(1).write.mode("append").parquet(root)
    }
    val before = spark.read.parquet(root).as[(Long, String)].collect().toSet
    val (nBefore, nAfter) = graft.operators.Layout.compactSmallFiles(spark, root)
    assert(nBefore == 40, s"expected 40 input files, saw $nBefore")
    assert(nAfter == 1, s"tiny table must compact to 1 file, got $nAfter")
    val after = spark.read.parquet(root).as[(Long, String)].collect().toSet
    assert(after == before)
    // idempotent: re-compacting an already-compact dir is a no-op shape-wise
    val (b2, a2) = graft.operators.Layout.compactSmallFiles(spark, root)
    assert(b2 == 1 && a2 == 1)
    graft.streaming.MergeSink.deleteRecursively(
      new java.io.File(root).getParentFile)
  }
}
