package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter): when a
  * shuffle join's build side carries a selective predicate, Catalyst plants a
  * bloom filter built from the small side into the big side's scan — at
  * 100 TB that's the difference between shuffling the full fact table and
  * shuffling only rows that can possibly match. The thresholds are
  * size-based, so the spec pins that the optimization FIRES on this engine's
  * join shape once the fact side crosses the scan threshold (lowered here —
  * test tables are tiny). */
class RuntimeFilterSpec extends SparkFunSuite {

  test("selective dim filter injects a bloom filter into the fact-side scan of a shuffle join") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fact side is tiny at test scale; drop the scan-size gate so the
      // rule fires the way it would on a real 100 TB fact table
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val lineitem = SparkEntry.table(spark, sf0001, "lineitem")
      val orders = SparkEntry.table(spark, sf0001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") || optimized.contains("might_contain"),
        s"expected an injected runtime bloom filter in:\n$optimized")
      // and the filtered plan still computes the right answer
      val rows = j.collect()
      assert(rows.length == 1 && rows.head.getString(0) == "1-URGENT")
    }
  }

  test("without the runtime filter the same join scans unfiltered (control)") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val lineitem = SparkEntry.table(spark, sf0001, "lineitem")
      val orders = SparkEntry.table(spark, sf0001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("bloom_filter_agg") && !optimized.contains("might_contain"))
    }
  }
}
