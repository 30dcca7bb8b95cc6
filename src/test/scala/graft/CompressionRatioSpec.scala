package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Pins q_compress_ratio's rows-only semantics: deflate-ratio ordering
  * (repetitive << prose << random noise), byte accounting, determinism
  * across partitionings. */
class CompressionRatioSpec extends SparkFunSuite {
  import spark.implicits._

  private val repetitive = ("ab" * 500)                       // 1000 chars, max redundancy
  private val prose = Seq.tabulate(100)(i => s"word$i of some ordinary sentence").mkString(" ")
  private val noise = {
    val rng = new scala.util.Random(29)
    Seq.fill(1000)((rng.nextInt(94) + 33).toChar).mkString    // printable ASCII noise
  }

  test("ratio orders repetitive < prose < noise") {
    val df = Seq((0L, repetitive), (1L, prose), (2L, noise)).toDF("doc_id", "text")
    val r = TextAnalysis.compressionRatio(df)
      .select("doc_id", "ratio").as[(Long, Double)].collect().toMap
    assert(r(0L) < 0.05, s"repetitive ${r(0L)}")
    assert(r(0L) < r(1L) && r(1L) < r(2L), s"ordering violated: $r")
    assert(r(2L) > 0.7, s"noise ${r(2L)}")
  }

  test("byte accounting: n_bytes is utf8 length; empty text is 0.0") {
    val df = Seq((0L, "héllo"), (1L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.compressionRatio(df)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(r(0)._2 == 6L) // é is 2 bytes
    // empty input still emits the 8-byte DEFLATE header/trailer; the ratio
    // is defined as 0.0 (guarded division)
    assert(r(1) == ((1L, 0L, 8L, 0.0)))
  }

  test("deterministic across partitionings") {
    val docs = (0L until 300L).map(i => (i, s"doc $i " + ("pad " * (i % 17).toInt)))
      .toDF("doc_id", "text")
    val a = TextAnalysis.compressionRatio(docs.coalesce(1))
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = TextAnalysis.compressionRatio(docs.repartition(11))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b)
  }
}
