package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionSpec extends SparkFunSuite {
  import spark.implicits._

  test("codegen'd dot product is bit-identical to the HOF formulation on real embeddings") {
    val e = SparkEntry.table(spark, sf0001, "embeddings")
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id")).limit(5000)
    val diff = pairs
      .select(Similarity.dot(col("a"), col("b")).as("fast"),
        Similarity.dotHof(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow")) // bitwise-equal doubles compare equal
      .count()
    assert(diff == 0L)
  }

  test("dot product handles nulls and empty arrays") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float])))
      .toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b"))).collect().map(r => Option(r.get(0)))
    assert(got(0).contains(11.0))
    assert(got(1).isEmpty)
    assert(got(2).contains(0.0))
  }

  test("type check rejects non-float arrays") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val err = intercept[Exception] {
      df.select(Similarity.dot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>"))
  }
}
