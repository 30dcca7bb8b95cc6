package graft

import graft.operators.{Sampling, Temporal, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-2 operators: as-of join, binned range join, deterministic
  * sampling/splits, quality scoring. Each is checked against a brute-force
  * or hand-computed expectation and for partition invariance. */
class Round2OperatorsSpec extends SparkFunSuite {
  import spark.implicits._

  // -- asofJoin ------------------------------------------------------------

  private val clicks = Seq(
    // (event_id, key, t)
    (1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 200L), // duplicate ts: max id wins
    (4L, 20L, 500L))
    .toDF("event_id", "user_id", "t")
  private val probes = Seq(
    (101L, 10L, 50L),  // before any click -> null
    (102L, 10L, 200L), // equal ts -> inclusive, tie -> click 3
    (103L, 10L, 9999L),
    (104L, 20L, 500L),
    (105L, 30L, 777L)) // key with no clicks at all -> null
    .toDF("event_id", "user_id", "t")

  test("asofJoin picks latest at-or-before with max-id tie-break") {
    val got = Temporal
      .asofJoin(probes, clicks, "user_id", "t", "event_id", payload = Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      101L -> None, 102L -> Some(3L), 103L -> Some(3L),
      104L -> Some(4L), 105L -> None))
  }

  test("asofJoin is partition-invariant") {
    val base = Temporal
      .asofJoin(probes, clicks, "user_id", "t", "event_id", Seq("event_id"))
      .orderBy("event_id").collect().toSeq
    val shuffled = Temporal
      .asofJoin(probes.repartition(7), clicks.repartition(3), "user_id", "t",
        "event_id", Seq("event_id"))
      .orderBy("event_id").collect().toSeq
    assert(base === shuffled)
  }

  // -- rangeJoinBinned -----------------------------------------------------

  test("rangeJoinBinned equals the naive inequality join") {
    val facts = (0L until 500L).map(i => (i, (i * 37L) % 1000L)).toDF("id", "v")
    // uneven widths incl. a range wider than binSize and one matching nothing
    val ranges = Seq(("a", 0L, 50L), ("b", 50L, 400L), ("c", 420L, 421L),
      ("d", 900L, 2000L), ("e", 5000L, 6000L))
      .toDF("label", "lo", "hi")
    val binned = Temporal.rangeJoinBinned(facts, "v", ranges, binSize = 100L)
      .select($"id", $"label").orderBy("id", "label").collect().toSeq
    val naive = facts.join(ranges, $"v" >= $"lo" && $"v" < $"hi")
      .select($"id", $"label").orderBy("id", "label").collect().toSeq
    assert(binned === naive)
    assert(binned.nonEmpty)
  }

  // -- Sampling ------------------------------------------------------------

  test("hashBucket matches a MessageDigest reference and is stable") {
    val ids = Seq(0L, 1L, 42L, 123456789L)
    val got = ids.toDF("id")
      .select(Sampling.hashBucket($"id", 100).as("hb"))
      .as[Long].collect().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = ids.map { i =>
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    assert(got === want)
  }

  test("trainValTestSplit is partition-invariant and ~80/10/10") {
    val df = (0L until 5000L).toDF("id")
    val split1 = Sampling.trainValTestSplit(df, "id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val split2 = Sampling.trainValTestSplit(df.repartition(13), "id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(split1 === split2)
    assert(split1("train") > 3800 && split1("train") < 4200)
    assert(split1("val") > 350 && split1("val") < 650)
    assert(split1("test") > 350 && split1("test") < 650)
    assert(split1.values.sum === 5000L)
  }

  test("sampleByHash keeps a deterministic subset") {
    val df = (0L until 2000L).toDF("id")
    val a = Sampling.sampleByHash(df, "id", 5).as[Long].collect().toSet
    val b = Sampling.sampleByHash(df.repartition(9), "id", 5).as[Long].collect().toSet
    assert(a === b)
    assert(a.size > 50 && a.size < 150) // ~5% of 2000
  }

  // -- qualityScore --------------------------------------------------------

  test("qualityScore hits each verdict branch") {
    val docs = Seq(
      (1L, "short text", "en"),                                // too_short (2 tokens)
      (2L, Seq.fill(20)("a").mkString(" "), "en"),             // token_len (avg 1)
      (3L, Seq.fill(20)("!!!###$$$").mkString(" "), "de"),     // symbols
      (4L, Seq.fill(20)("wording").mkString(" "), "en"),       // stopwords (en, none)
      (5L, ("the quick brown fox " * 5).trim, "en"))           // ok
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.qualityScore(docs)
      .select($"doc_id", $"verdict").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "too_short", 2L -> "token_len", 3L -> "symbols",
      4L -> "stopwords", 5L -> "ok"))
  }
}
