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

  test("banded levenshtein threshold semantics: -1 beyond k, exact within") {
    // the contract LevenshteinThresholdRule's rewrite relies on
    val r = spark.sql(
      """SELECT levenshtein('kitten', 'sitting', 2),
        |       levenshtein('kitten', 'sitting', 3),
        |       levenshtein('ab', 'ab', 0)""".stripMargin).head()
    assert(r.getInt(0) == -1)
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) == 0)
  }

  test("levenshtein filters are rewritten to the banded early-exit form with unchanged results") {
    import org.apache.spark.sql.catalyst.expressions.Levenshtein
    GraftExtensions.install(spark)
    val d = SparkEntry.table(spark, sf0001, "documents").limit(100)
      .select(col("doc_id"), col("text"))
    val a = d.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    val pairs = a.join(b, col("doc_b") === col("doc_a") + 1L)
    val k = 150
    val filtered = pairs
      .filter(levenshtein(col("text_a"), col("text_b")) <= k)
      .select(col("doc_a"), col("doc_b"))
    val opt = filtered.queryExecution.optimizedPlan
    val bandedCount = opt.collect { case p => p.expressions.map(e =>
      e.collect { case l: Levenshtein if l.threshold.isDefined => l }.size).sum }.sum
    val unbandedCount = opt.collect { case p => p.expressions.map(e =>
      e.collect { case l: Levenshtein if l.threshold.isEmpty => l }.size).sum }.sum
    assert(bandedCount == 1, s"expected exactly one banded levenshtein in:\n$opt")
    assert(unbandedCount == 0, s"expected no full-DP levenshtein left in:\n$opt")
    assert(opt.toString.contains("abs("), "length pre-guard missing")
    // semantics preserved: equals a driver-side threshold over raw distances
    val expected = pairs
      .select(col("doc_a"), col("doc_b"), levenshtein(col("text_a"), col("text_b")).as("dd"))
      .collect().filter(_.getInt(2) <= k).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    assert(filtered.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    // all four threshold spellings rewrite (lev<=k, k>=lev, lev<k, k>lev)
    Seq(
      levenshtein(col("text_a"), col("text_b")) <= k,
      lit(k) >= levenshtein(col("text_a"), col("text_b")),
      levenshtein(col("text_a"), col("text_b")) < k + 1,
      lit(k + 1) > levenshtein(col("text_a"), col("text_b"))).foreach { cond =>
      val q = pairs.filter(cond).select(col("doc_a"), col("doc_b"))
      val full = q.queryExecution.optimizedPlan.collect { case p => p.expressions.map(e =>
        e.collect { case l: Levenshtein if l.threshold.isEmpty => l }.size).sum }.sum
      assert(full == 0, s"unrewritten levenshtein for $cond")
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected,
        s"results diverge for $cond")
    }
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
