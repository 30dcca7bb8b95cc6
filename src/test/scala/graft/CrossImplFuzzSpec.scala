package graft

import graft.model.{SessionConfig, SessionEvent}
import graft.operators.{SessionEngine, Sessionize}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY.md §5 invariant (f): the declarative window-function sessionizer
  * and the imperative state machine must agree exactly whenever the
  * size/duration cuts don't fire — on RANDOM timelines, not just the fixed
  * testdata. The two implementations share no code, so agreement is strong
  * evidence both are right. */
class CrossImplFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private val base = 1_700_000_000_000L
  private val timelines: Gen[List[(Long, Long, Long)]] = for { // (event_id, ms, user)
    n <- Gen.choose(1, 300)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(0L, 5L)
      off <- Gen.frequency(
        6 -> Gen.choose(0L, 40L * 60L * 1000L),
        2 -> Gen.choose(0L, 3L * 3600L * 1000L),
        1 -> Gen.choose(0L, 40L * 3600L * 1000L))
    } yield (user, off))
  } yield rows.zipWithIndex.map { case ((u, off), i) => (i.toLong, base + off, u) }

  test("window-function sessionizer equals the state machine on 40 random timelines") {
    (1 to 40).foreach { seed =>
      timelines(Gen.Parameters.default, Seed(seed.toLong)).foreach { rows =>
        val df = rows.toDF("event_id", "ms", "user_id")
          .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
        val sql = Sessionize.gapSessionize(df)
          .select(col("event_id"), col("session_id"), col("session_idx"), col("duration"))
          .as[(Long, String, Long, Long)].collect().sortBy(_._1)
        // reference run: pure engine on sorted per-user timelines, gap cut only
        val cfg = SessionConfig(maxEvents = Int.MaxValue, maxDurationSec = Long.MaxValue / 4)
        val expected = rows
          .groupBy(_._3)
          .flatMap { case (u, rs) =>
            val evs = rs.sortBy(r => (r._2, r._1))
              .map(r => SessionEvent(u.toString, r._2, r._1))
            SessionEngine.run(evs.iterator, cfg).map(o =>
              (o.tieBreak, s"$u-${o.sessionId.split("-")(1)}", o.sessionIdx, o.duration))
          }
          .toSeq.sortBy(_._1)
        assert(sql.toVector == expected.toVector, s"mismatch at seed $seed")
      }
    }
  }

  test("empty and single-row inputs sessionize cleanly") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("event_id", "ms", "user_id")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    assert(Sessionize.gapSessionize(empty).count() == 0L)
    assert(Sessionize.fullSessionize(empty).count() == 0L)
    val one = Seq((1L, base, 9L)).toDF("event_id", "ms", "user_id")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val r = Sessionize.gapSessionize(one).select("duration", "session_idx")
      .as[(Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 1L)))
  }
}
