package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketing = the pre-shuffled join: both sides written bucketed on the
  * join key join WITHOUT any Exchange — at 100 TB this turns every
  * recurring fact⋈fact join on a canonical key into a scan+sort-merge with
  * zero shuffle (the decisive win when the same key is joined daily). */
class BucketedJoinSpec extends SparkFunSuite {
  import spark.implicits._

  test("bucketed fact-fact join plans with no shuffle Exchange") {
    val dir = Files.createTempDirectory("graft_buckets").toFile
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // force the shuffle-sensitive SMJ path (broadcast would trivially
      // avoid an Exchange and prove nothing)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = SparkEntry.table(spark, sf0001, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val li = SparkEntry.table(spark, sf0001, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/orders_b").saveAsTable("graft_orders_b")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$dir/lineitem_b").saveAsTable("graft_lineitem_b")

      val joined = spark.table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // and it still computes the right thing
      val bucketedCount = joined.count()
      val plainCount = li.join(o, $"l_orderkey" === $"o_orderkey").count()
      assert(bucketedCount === plainCount)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("SHUFFLE_HASH hint selects ShuffledHashJoin (q_join_shuffle_hash strategy)") {
    val df = SparkEntry.queries("q_join_shuffle_hash")(spark, "/root/testdata/sf0.001")
    df.collect() // force AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected SHJ in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "hint must suppress the SMJ fallback")
  }
}
