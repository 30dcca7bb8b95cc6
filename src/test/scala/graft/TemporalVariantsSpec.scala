package graft

import graft.operators.Temporal
import org.apache.spark.sql.DataFrame

/** Property tests for the as-of direction variants and the interval-overlap
  * join — same raw-ScalaCheck + brute-force-reference discipline as the
  * backward asofJoin property test in Round3OperatorsSpec. The generators
  * force heavy time ties across few keys, the regime where each direction's
  * (time, side, tie) ordering rules actually bite. */
class TemporalVariantsSpec extends SparkFunSuite {
  import spark.implicits._

  /** Random (event_id, key, t) rows: few keys, small time range → many ties. */
  private def randomTable(seed: Long, idBase: Long): Seq[(Long, Long, Long)] = {
    import org.scalacheck.{Gen, rng}
    val gen = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
    } yield rows.zipWithIndex.map { case ((k, t), i) => (idBase + i, k, t) }
    gen(Gen.Parameters.default, rng.Seed(seed)).get
  }

  test("asofJoinForward property: equals brute-force earliest-at-or-after under ties") {
    (1 to 12).foreach { sample =>
      val rightRows = randomTable(sample.toLong, idBase = 1000L)
      val leftRows = randomTable(sample.toLong + 500L, idBase = 9000L)
      val left = leftRows.toDF("event_id", "user_id", "t")
      val right = rightRows.toDF("event_id", "user_id", "t")
      val expected = leftRows.map { case (id, k, t) =>
        val cands = rightRows.filter(r => r._2 == k && r._3 >= t)
        // inclusive at-or-after; among time ties the SMALLEST tie-break wins
        id -> (if (cands.isEmpty) None else Some(cands.minBy(r => (r._3, r._1))._1))
      }.toMap
      def got(l: DataFrame, r: DataFrame) =
        Temporal.asofJoinForward(l, r, "user_id", "t", "event_id", payload = Seq("event_id"))
          .select($"event_id", $"asof_event_id")
          .as[(Long, Option[Long])].collect().toMap
      assert(got(left, right) === expected, s"sample $sample")
      if (sample <= 3)
        assert(got(left.repartition(7), right.repartition(3)) === expected,
          s"sample $sample repartitioned")
    }
  }

  test("asofJoinNearest property: closer of back/forward match, ties to backward") {
    (1 to 12).foreach { sample =>
      val rightRows = randomTable(sample.toLong + 100L, idBase = 1000L)
      val leftRows = randomTable(sample.toLong + 600L, idBase = 9000L)
      val left = leftRows.toDF("event_id", "user_id", "t")
      val right = rightRows.toDF("event_id", "user_id", "t")
      val expected = leftRows.map { case (id, k, t) =>
        val back = rightRows.filter(r => r._2 == k && r._3 <= t) match {
          case Nil => None
          case cs  => Some(cs.maxBy(r => (r._3, r._1))) // latest time, largest id
        }
        val fwd = rightRows.filter(r => r._2 == k && r._3 >= t) match {
          case Nil => None
          case cs  => Some(cs.minBy(r => (r._3, r._1))) // earliest time, smallest id
        }
        val sel = (back, fwd) match {
          case (None, f) => f
          case (b, None) => b
          case (Some(b), Some(f)) =>
            if (f._3 - t < t - b._3) Some(f) else Some(b) // ties → backward
        }
        id -> sel.map(_._1)
      }.toMap
      def got(l: DataFrame, r: DataFrame) =
        Temporal.asofJoinNearest(l, r, "user_id", "t", "event_id", payload = Seq("event_id"))
          .select($"event_id", $"asof_event_id")
          .as[(Long, Option[Long])].collect().toMap
      assert(got(left, right) === expected, s"sample $sample")
      if (sample <= 3)
        assert(got(left.repartition(7), right.repartition(3)) === expected,
          s"sample $sample repartitioned")
    }
  }

  /** Random (id, lo, hi) intervals; ~1/5 are degenerate or inverted
    * (hi <= lo) to exercise the filter, and widths straddle the bin size
    * so single-bin, bin-spanning, and many-bin intervals all occur. */
  private def randomIntervals(seed: Long, idBase: Long): Seq[(Long, Long, Long)] = {
    import org.scalacheck.{Gen, rng}
    val gen = for {
      n <- Gen.choose(4, 40)
      rows <- Gen.listOfN(n, for {
        lo <- Gen.choose(0L, 200L)
        w <- Gen.frequency(1 -> Gen.choose(-5L, 0L), 4 -> Gen.choose(1L, 60L))
      } yield (lo, lo + w))
    } yield rows.zipWithIndex.map { case ((lo, hi), i) => (idBase + i, lo, hi) }
    gen(Gen.Parameters.default, rng.Seed(seed)).get
  }

  test("overlapJoinBinned property: equals the naive all-pairs overlap join") {
    (1 to 12).foreach { sample =>
      val aRows = randomIntervals(sample.toLong, idBase = 1000L)
      val bRows = randomIntervals(sample.toLong + 700L, idBase = 9000L)
      val a = aRows.toDF("id_a", "lo_a", "hi_a")
      val b = bRows.toDF("id_b", "lo_b", "hi_b")
      val expected = (for {
        (ia, loA, hiA) <- aRows if hiA > loA
        (ib, loB, hiB) <- bRows if hiB > loB
        if loA < hiB && loB < hiA
      } yield (ia, ib)).toSet
      val got = Temporal.overlapJoinBinned(a, b, binSize = 16L,
          "id_a", "lo_a", "hi_a", "id_b", "lo_b", "hi_b")
        .as[(Long, Long)].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }

  test("overlapJoinBinned: exact pair-count with no duplicates across bin-spanning intervals") {
    // one long interval spanning many bins against several short ones —
    // the dropDuplicates must collapse the per-shared-bin repeats to 1
    val a = Seq((1L, 0L, 100L)).toDF("id_a", "lo_a", "hi_a")
    val b = Seq((10L, 5L, 6L), (11L, 31L, 33L), (12L, 99L, 105L), (13L, 100L, 101L))
      .toDF("id_b", "lo_b", "hi_b")
    val got = Temporal.overlapJoinBinned(a, b, binSize = 10L,
        "id_a", "lo_a", "hi_a", "id_b", "lo_b", "hi_b")
      .as[(Long, Long)].collect().toSeq
    assert(got.size === got.distinct.size)
    assert(got.toSet === Set((1L, 10L), (1L, 11L), (1L, 12L))) // 13 touches only at hi (half-open)
  }

  // ---- plan-shape pins: the Scaladoc scale claims, asserted -------------

  private def exchangesOf(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    "Exchange hashpartitioning".r.findAllIn(plan).size
  }

  test("asofJoinForward plans exactly ONE key shuffle (union + one window)") {
    val l = Seq((1L, 1L, 5L)).toDF("event_id", "user_id", "t")
    val r = Seq((2L, 1L, 7L)).toDF("event_id", "user_id", "t")
    val df = Temporal.asofJoinForward(l, r, "user_id", "t", "event_id", Seq("event_id"))
    assert(exchangesOf(df) === 1, df.queryExecution.executedPlan.toString)
  }

  test("asofJoinNearest plans ONE key shuffle shared by both window directions") {
    val l = Seq((1L, 1L, 5L)).toDF("event_id", "user_id", "t")
    val r = Seq((2L, 1L, 7L)).toDF("event_id", "user_id", "t")
    val df = Temporal.asofJoinNearest(l, r, "user_id", "t", "event_id", Seq("event_id"))
    assert(exchangesOf(df) === 1, df.queryExecution.executedPlan.toString)
  }

  test("overlapJoinBinned plans shuffle joins only — no broadcast, no nested loop") {
    // both sides must stay shuffle-partitionable: a BNLJ or a forced
    // broadcast here is exactly the 100-TB failure the binning avoids
    val a = (1L to 50L).map(i => (i, i * 10L, i * 10L + 25L)).toDF("id_a", "lo_a", "hi_a")
    val b = (1L to 50L).map(i => (i, i * 7L, i * 7L + 12L)).toDF("id_b", "lo_b", "hi_b")
    val df = Temporal.overlapJoinBinned(a, b, binSize = 16L,
      "id_a", "lo_a", "hi_a", "id_b", "lo_b", "hi_b")
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("overlapJoinBinned rejects non-positive bin size") {
    val d = Seq((1L, 0L, 1L)).toDF("id", "lo", "hi")
    intercept[IllegalArgumentException] {
      Temporal.overlapJoinBinned(d, d, 0L, "id", "lo", "hi", "id", "lo", "hi")
    }
  }
}
