package graft

import org.apache.spark.sql.functions._

class ExtensionsRegistrySpec extends SparkFunSuite {

  test("dot_product_float is callable from SQL after install") {
    GraftExtensions.install(spark)
    SparkEntry.table(spark, sf0001, "embeddings").limit(10).createOrReplaceTempView("emb_t")
    val rows = spark.sql(
      """SELECT a.vec_id, b.vec_id, dot_product_float(a.embedding, b.embedding) AS d
        |FROM emb_t a JOIN emb_t b ON a.vec_id < b.vec_id""".stripMargin).collect()
    assert(rows.length == 45)
    assert(rows.forall(r => !r.isNullAt(2)))
  }

  test("SQL result equals the Column API result") {
    GraftExtensions.install(spark)
    val e = SparkEntry.table(spark, sf0001, "embeddings").limit(5)
    e.createOrReplaceTempView("emb_s")
    val viaSql = spark.sql(
      "SELECT vec_id, dot_product_float(embedding, embedding) AS d FROM emb_s")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val viaCol = e.select(col("vec_id"),
      graft.operators.Similarity.dot(col("embedding"), col("embedding")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaSql == viaCol)
  }
}
