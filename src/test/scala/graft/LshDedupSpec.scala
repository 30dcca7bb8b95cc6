package graft

import graft.streaming.LshDedupSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online LSH near-dup admission: the closed-form rule (admitted ⇔ no band
  * key shared with a lower-id doc) and its microbatch invariance. */
class LshDedupSpec extends SparkFunSuite {
  import spark.implicits._

  // near-dup pairs: (1,2) share most shingles, (5,6) identical; 3,4 unique
  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog tonight",
    2L -> "the quick brown fox jumps over the lazy dog today",
    3L -> "completely different text about spark structured streaming state",
    4L -> "yet another unrelated document body with its own words",
    5L -> "identical duplicated body of text across two documents here",
    6L -> "identical duplicated body of text across two documents here",
    7L -> "tiny")  // < 3 tokens: no shingles, always admitted

  /** The closed-form expectation, computed batch-side. */
  private def expectedAdmitted(d: Seq[(Long, String)]): Set[Long] = {
    val bt = LshDedupSink.bandTable(d.toDF("doc_id", "text"))
    val m = bt.groupBy(col("band_key")).agg(min(col("doc_id")).as("min_id"))
    val dropped = bt.join(m, "band_key").filter(col("doc_id") > col("min_id"))
      .select("doc_id").as[Long].collect().toSet
    d.map(_._1).toSet -- dropped
  }

  private def runChunked(chunks: Seq[Seq[(Long, String)]]): Set[Long] = {
    val root = java.nio.file.Files.createTempDirectory("graft_lsh_spec_")
    val idx = root.resolve("bands").toString
    val out = root.resolve("admitted").toString
    chunks.zipWithIndex.foreach { case (ch, i) =>
      LshDedupSink.admitBatch(idx, out)(ch.toDF("doc_id", "text"), i.toLong)
    }
    val got = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    graft.streaming.MergeSink.deleteRecursively(root.toFile)
    got
  }

  test("admitted set matches the closed-form lower-id band-collision rule") {
    val exp = expectedAdmitted(docs)
    assert(exp.contains(1L) && !exp.contains(2L), "near-dup pair (1,2) must collide")
    assert(exp.contains(5L) && !exp.contains(6L), "identical pair (5,6) must collide")
    assert(exp.contains(7L), "shingle-less doc is always admitted")
    assert(runChunked(Seq(docs)) == exp)
  }

  test("admission equals an independent in-memory minhash reference on 20 random corpora") {
    // spec-side reimplementation of shingle → 16-hash affine minhash →
    // 4 band keys (NOT the Dedup kernel — an independent code path)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bandsRef(text: String): Seq[String] = {
      val toks = text.split(" ", -1)
      if (toks.length < 3) return Seq.empty
      val sh = (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString("_")).distinct
      val bases = sh.map(s => java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16) % 1073741824L)
      val sig = (0 until 16).map { h =>
        val a = (1103515245L * (h + 1) + 12345L) % 2147483647L
        val b = (1103515245L * (h + 17) + 12345L) % 2147483647L
        bases.map(x => (a * x + b) % 2147483647L).min
      }
      (0 until 4).map(j => sig.slice(j * 4, j * 4 + 4).mkString("_"))
    }
    val rng = new scala.util.Random(41)
    val vocab = Vector("spark", "flink", "state", "join", "window", "agg", "scan")
    (1 to 20).foreach { trial =>
      val corpus = (0L until (4 + rng.nextInt(10)).toLong).map { id =>
        id -> Seq.fill(2 + rng.nextInt(8))(vocab(rng.nextInt(vocab.length))).mkString(" ")
      }
      val bands = corpus.map { case (id, t) => id -> bandsRef(t).toSet }
      val expAdmitted = corpus.collect {
        case (id, _) if !bands.exists { case (o, ob) =>
          o < id && ob.intersect(bands.find(_._1 == id).get._2).nonEmpty
        } => id
      }.toSet
      assert(runChunked(Seq(corpus)) == expAdmitted, s"trial $trial: $corpus")
    }
  }

  test("admitted set is invariant to id-ordered microbatch chunking") {
    val exp = runChunked(Seq(docs))
    assert(runChunked(docs.map(Seq(_))) == exp)             // one doc per batch
    assert(runChunked(Seq(docs.take(3), docs.drop(3))) == exp)
    assert(runChunked(Seq(docs.take(5), docs.drop(5))) == exp) // splits the (5,6) pair
  }

  test("batch replay is idempotent: re-running a batchId changes nothing") {
    // foreachBatch is at-least-once — a crash between the two writes replays
    // the batch with the SAME id; partition-overwrite must absorb it even
    // though the first attempt already published the batch's index rows
    val root = java.nio.file.Files.createTempDirectory("graft_lsh_replay_")
    val idx = root.resolve("bands").toString
    val out = root.resolve("admitted").toString
    val b0 = docs.take(4); val b1 = docs.drop(4)
    LshDedupSink.admitBatch(idx, out)(b0.toDF("doc_id", "text"), 0L)
    LshDedupSink.admitBatch(idx, out)(b0.toDF("doc_id", "text"), 0L) // replay
    LshDedupSink.admitBatch(idx, out)(b1.toDF("doc_id", "text"), 1L)
    val got = spark.read.parquet(out).select("doc_id").as[Long].collect().toSeq
    assert(got.length == got.distinct.length, s"replay duplicated rows: $got")
    assert(got.toSet == runChunked(Seq(b0, b1)))
  }
}
