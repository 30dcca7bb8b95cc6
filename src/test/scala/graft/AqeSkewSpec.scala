package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: the runtime complement to the deterministic
  * salted join (Skew.saltedJoin / q_salted_join). Salting rewrites the plan
  * for a skew you KNOW about; AQE splits oversized shuffle partitions for
  * the skew you discover at runtime — at 100 TB both are load-bearing, so
  * the suite pins that this build actually performs the runtime split. */
class AqeSkewSpec extends SparkFunSuite {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the size thresholds so the test's ~MB-scale skew triggers
      // the same detection a multi-GB partition would in production
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "4") {
      // 100k rows, ~98% on key 0, with a payload wide enough to exceed the
      // skew threshold; right side is uniform over the key space
      val big = spark.range(0, 100000)
        .select(
          when($"id" % 50 =!= 0, lit(0L)).otherwise($"id" % 97).as("k"),
          concat(lit("x"), lpad($"id".cast("string"), 64, "0")).as("payload"))
      val dim = spark.range(0, 97).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = big.join(dim, "k")
      // collect() drives THIS queryExecution (count() would spawn a fresh
      // one and leave joined's plan unfinalized — AQE finalizes on execution)
      assert(joined.collect().length == 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected a runtime skew split in:\n$plan")
    }
  }
}
