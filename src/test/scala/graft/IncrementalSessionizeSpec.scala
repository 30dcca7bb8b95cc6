package graft

import graft.operators.Sessionize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental batch sessionization must be row-identical to one full
  * recompute, for any event-time-contiguous split of the history. */
class IncrementalSessionizeSpec extends SparkFunSuite {
  import spark.implicits._

  private def evDF(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("event_id", "user_id", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")

  private type Row4 = (Long, Long, String, Long)

  private def resultSet(df: DataFrame): Set[(Long, Long, String, Long, Long)] =
    df.select(col("event_id"), col("user_id"), col("session_id"),
        col("session_idx"), col("duration"))
      .as[(Long, Long, String, Long, Long)].collect().toSet

  private def incremental(rows: Seq[(Long, Long, Long)], splits: Seq[Long]): DataFrame = {
    // splits: sorted ms boundaries; batch i = rows with ts in (prev, cut]
    val bounds = (Long.MinValue +: splits.sorted) :+ Long.MaxValue
    val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
      evDF(rows.filter(r => r._3 > lo && r._3 <= hi))
    }.toSeq
    var state: Option[DataFrame] = None
    val outs = batches.map { b =>
      val (r, s) = Sessionize.incrementalGapSessionize(state, b)
      state = Some(s.localCheckpoint(true))
      r
    }
    outs.reduce(_ unionByName _)
  }

  test("three-way split equals full recompute on a hand-built timeline") {
    val gap = graft.model.SessionConfig.DefaultGapSec
    val base = 1_700_000_000_000L
    val rows = Seq(
      // user 1: session A (2 events), then a gap, session B spanning a split
      (1L, 1L, base),
      (2L, 1L, base + 10_000L),
      (3L, 1L, base + (gap + 100) * 1000L),
      (4L, 1L, base + (gap + 130) * 1000L),
      // user 2: one long session crossing BOTH splits
      (5L, 2L, base + 5_000L),
      (6L, 2L, base + (gap + 110) * 1000L),
      (7L, 2L, base + (2 * gap + 150) * 1000L),
      // user 3: only in the first batch; state must carry forward
      (8L, 3L, base + 1_000L))
    val full = resultSet(Sessionize.gapSessionize(evDF(rows)))
    val split = resultSet(incremental(rows,
      Seq(base + (gap + 105) * 1000L, base + (gap + 140) * 1000L)))
    assert(split == full)
  }

  test("fuzz: random timelines and random splits equal full recompute") {
    val rng = new scala.util.Random(43)
    (1 to 12).foreach { trial =>
      val n = 10 + rng.nextInt(40)
      val rows = (1L to n.toLong).map { id =>
        (id, (rng.nextInt(4) + 1).toLong,
          1_700_000_000_000L + rng.nextInt(4_000_000).toLong * 1000L)
      }
      val cuts = Seq.fill(1 + rng.nextInt(3))(
        1_700_000_000_000L + rng.nextInt(4_000_000).toLong * 1000L)
      val full = resultSet(Sessionize.gapSessionize(evDF(rows)))
      val split = resultSet(incremental(rows, cuts))
      assert(split == full, s"trial $trial cuts=$cuts")
    }
  }

  private def fullResultSet(df: DataFrame): Set[(Long, String, String, Long, Long)] =
    df.select(col("tieBreak"), col("key"), col("sessionId"),
        col("sessionIdx"), col("duration"))
      .as[(Long, String, String, Long, Long)].collect().toSet

  private def incrementalFull(
      rows: Seq[(Long, Long, Long)],
      splits: Seq[Long],
      cfg: graft.model.SessionConfig): DataFrame = {
    val bounds = (Long.MinValue +: splits.sorted) :+ Long.MaxValue
    val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
      evDF(rows.filter(r => r._3 > lo && r._3 <= hi))
    }.toSeq
    var state: Option[DataFrame] = None
    val outs = batches.map { b =>
      val (r, s) = Sessionize.incrementalFullSessionize(state, b, cfg = cfg)
      state = Some(s)
      r
    }
    outs.reduce(_ unionByName _)
  }

  test("full-rule incremental equals full recompute with ALL cut rules firing") {
    // tight cuts so size and duration cuts trigger, including across splits
    val cfg = graft.model.SessionConfig(gapSec = 60L, maxEvents = 4, maxDurationSec = 150L)
    val rng = new scala.util.Random(47)
    (1 to 10).foreach { trial =>
      val n = 15 + rng.nextInt(40)
      val rows = (1L to n.toLong).map { id =>
        (id, (rng.nextInt(3) + 1).toLong,
          1_700_000_000_000L + rng.nextInt(1200).toLong * 1000L)
      }
      val cuts = Seq.fill(1 + rng.nextInt(3))(
        1_700_000_000_000L + rng.nextInt(1200).toLong * 1000L)
      val full = fullResultSet(Sessionize.fullSessionize(evDF(rows), cfg = cfg))
      val split = fullResultSet(incrementalFull(rows, cuts, cfg))
      assert(split == full, s"trial $trial cuts=$cuts")
    }
  }

  test("full-rule incremental: state carries keys through empty increments") {
    val cfg = graft.model.SessionConfig(gapSec = 60L, maxEvents = 4, maxDurationSec = 150L)
    val base = 1_700_000_000_000L
    val rows = Seq((1L, 1L, base), (2L, 1L, base + 5_000L), (3L, 1L, base + 70_000L))
    val full = fullResultSet(Sessionize.fullSessionize(evDF(rows), cfg = cfg))
    // second increment empty, third carries on: event 3 opens session 2
    // (gap cut) only if state survived the empty middle increment
    val split = fullResultSet(incrementalFull(rows, Seq(base + 6_000L, base + 8_000L), cfg))
    assert(split == full)
  }

  test("empty batches are harmless: state carries through them") {
    val base = 1_700_000_000_000L
    val rows = Seq((1L, 1L, base), (2L, 1L, base + 5_000L))
    // both cuts beyond all data -> batches 2 and 3 are empty
    val full = resultSet(Sessionize.gapSessionize(evDF(rows)))
    assert(resultSet(incremental(rows, Seq(base + 10_000L, base + 20_000L))) == full)
  }
}
