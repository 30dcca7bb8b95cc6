package graft

import graft.streaming.BudgetAdmitSink
import org.apache.spark.sql.DataFrame

/** Online token-budget admission: the closed-form rule (admitted ⇔
  * same-source lower-id token sum < budget) and its microbatch invariance
  * + at-least-once replay idempotence. */
class BudgetAdmitSpec extends SparkFunSuite {
  import spark.implicits._

  private val docs: Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(23)
    (0 until 90).map { i =>
      (i.toLong, s"s${i % 3}",
        Vector.fill(1 + rnd.nextInt(12))("w").mkString(" "))
    }
  }
  private val budgetMap = Map("s0" -> 60L, "s1" -> 90L, "s2" -> 25L)
  private def budgetsDf: DataFrame = budgetMap.toSeq.toDF("source", "budget")

  /** Closed form: per source in id order, admit while tokens-before < budget. */
  private def expected: Seq[(Long, String, Long, Long)] =
    docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._1).flatMap { case (id, s, t) =>
        val n = t.split(" ", -1).length.toLong
        val before = cum; cum += n
        if (before < budgetMap(src)) Some((id, s, n, before)) else None
      }
    }.sortBy(_._1)

  private def runChunked(chunks: Seq[Seq[(Long, String, String)]],
      replayBatch: Option[Int] = None): Seq[(Long, String, Long, Long)] = {
    val root = java.nio.file.Files.createTempDirectory("graft_budget_spec_")
    val state = root.resolve("state").toString
    val out = root.resolve("admitted").toString
    chunks.zipWithIndex.foreach { case (ch, i) =>
      BudgetAdmitSink.admitBatch(state, out, budgetsDf)(
        ch.toDF("doc_id", "source", "text"), i.toLong)
      // at-least-once: replay the requested batch immediately after itself
      if (replayBatch.contains(i))
        BudgetAdmitSink.admitBatch(state, out, budgetsDf)(
          ch.toDF("doc_id", "source", "text"), i.toLong)
    }
    val got = spark.read.parquet(out)
      .select("doc_id", "source", "n_tokens", "cum_before")
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    graft.streaming.MergeSink.deleteRecursively(root.toFile)
    got
  }

  test("admitted set matches the closed-form rule in one batch") {
    assert(runChunked(Seq(docs)) == expected)
  }

  test("admission is invariant to microbatch chopping") {
    assert(runChunked(docs.grouped(30).toSeq) == expected)
    assert(runChunked(docs.grouped(7).toSeq) == expected)
  }

  test("a replayed batch is idempotent (overwrite semantics, prior excludes own batch)") {
    assert(runChunked(docs.grouped(30).toSeq, replayBatch = Some(1)) == expected)
  }

  test("a source without a budget row is never admitted, but its totals are tracked") {
    val root = java.nio.file.Files.createTempDirectory("graft_budget_spec_")
    val state = root.resolve("state").toString
    val out = root.resolve("admitted").toString
    try {
      val noBudgetDocs = docs.map { case (id, _, t) => (id, "unbudgeted", t) }
      BudgetAdmitSink.admitBatch(state, out, budgetsDf)(
        noBudgetDocs.toDF("doc_id", "source", "text"), 0L)
      assert(spark.read.parquet(out).count() == 0)
      val tracked = spark.read.parquet(state)
        .select("source", "toks").as[(String, Long)].collect().toMap
      assert(tracked("unbudgeted") ==
        noBudgetDocs.map(_._3.split(" ", -1).length.toLong).sum)
    } finally graft.streaming.MergeSink.deleteRecursively(root.toFile)
  }

  test("budgets saturate: admitted token sums land within one doc of the budget") {
    val bySrc = runChunked(docs.grouped(30).toSeq).groupBy(_._2)
    budgetMap.foreach { case (src, b) =>
      val toks = bySrc(src).map(_._3).sum
      val maxDoc = bySrc(src).map(_._3).max
      assert(toks >= b && toks < b + maxDoc,
        s"$src admitted $toks tokens for budget $b")
    }
  }
}
