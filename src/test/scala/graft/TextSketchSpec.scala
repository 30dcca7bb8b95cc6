package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Readability, BPE pair mining, and (w,k)-minimizer sketching — the
  * round-8 text additions, checked against hand-computed and brute-force
  * references (minimizer hashes replayed via MessageDigest in-JVM).
  */
class TextSketchSpec extends SparkFunSuite {
  import spark.implicits._

  test("readability: punctuation sentences, vowel-run syllables, FK formula") {
    val docs = Seq((1L, "the cat. ran far!")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).head()
    assert(r.getAs[Long]("n_words") == 4L)
    assert(r.getAs[Long]("n_sentences") == 2L)   // '.' run + '!' run
    assert(r.getAs[Long]("n_syllables") == 4L)   // e, a, a, a
    val want = math.rint((0.39 * 4 / 2 + 11.8 * 4.0 / 4 - 15.59) * 1e6) / 1e6
    assert(r.getAs[Double]("fk_grade") == want)
  }

  test("readability: punctuation-free text falls back to 15-word sentences") {
    val text30 = Seq.fill(30)("word").mkString(" ")
    val text31 = Seq.fill(31)("word").mkString(" ")
    val got = TextAnalysis.readability(
      Seq((1L, text30), (2L, text31)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_sentences")).toMap
    assert(got(1L) == 2L && got(2L) == 3L) // ceil(30/15)=2, ceil(31/15)=3
  }

  test("bpePairs: pair counts weighted by word frequency, 1-char words dropped") {
    val docs = Seq((1L, "ab ab cd abc a a a")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairs(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // vocab: ab:2, cd:1, abc:1 ('a' dropped); pairs: ab:2+1=3, bc:1, cd:1
    assert(got.toSeq == Seq(("ab", 3L, 1L), ("bc", 1L, 2L), ("cd", 1L, 3L)))
  }

  test("minimizerSketch equals brute-force windowed minima; short docs empty") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val toks = "k b c d e f g h i j a l m n o p q r s t".split(" ").toSeq
    val text = toks.mkString(" ")
    val docs = Seq((1L, text), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.minimizerSketch(docs, window = 4, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: hash all 3-shingles, min over trailing windows of 4
    val hs = toks.sliding(3).map(w => h60(w.mkString("_"))).toArray
    val want = hs.indices.map { i =>
      (math.max(0, i - 3) to i).map(hs).min
    }.toSet
    assert(got == want.map((1L, _))) // doc 2 (< 3 tokens) emits nothing
    // sampling bound: far fewer minimizers than shingles
    assert(want.size < hs.length)
  }

  test("minimizerSketch: shared runs produce shared minimizers (the dedup use)") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val shifted = "x y z " + base
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val sk = TextAnalysis.minimizerSketch(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val overlap = (sk(1L) & sk(2L)).size.toDouble / sk(1L).size
    assert(overlap > 0.7, s"expected high sketch overlap, got $overlap")
  }
}
