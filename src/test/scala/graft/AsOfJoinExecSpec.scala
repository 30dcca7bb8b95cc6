package graft

import graft.operators.Temporal
import org.apache.spark.sql.DataFrame

/** The custom-plan as-of join (AsOfJoinPlan/Exec) vs the union+window
  * composition: identical results on tie-heavy random tables, correct
  * physical shape, null handling. */
class AsOfJoinExecSpec extends SparkFunSuite {
  import spark.implicits._

  private def randomTable(seed: Long, idBase: Long): Seq[(Long, Long, Long)] = {
    import org.scalacheck.{Gen, rng}
    val gen = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
    } yield rows.zipWithIndex.map { case ((k, t), i) => (idBase + i, k, t) }
    gen(Gen.Parameters.default, rng.Seed(seed)).get
  }

  test("asofJoinMerge equals asofJoin row-for-row on tie-heavy random tables") {
    (1 to 10).foreach { sample =>
      val l = randomTable(sample.toLong, 9000L).toDF("event_id", "user_id", "t")
      val r = randomTable(sample.toLong + 500L, 1000L).toDF("event_id", "user_id", "t")
      def collect(df: DataFrame) =
        df.select($"event_id", $"asof_event_id", $"asof_t")
          .as[(Long, Option[Long], Option[Long])].collect().toSet
      val viaWindow = collect(
        Temporal.asofJoin(l, r, "user_id", "t", "event_id", Seq("event_id", "t")))
      val viaMerge = collect(
        Temporal.asofJoinMerge(l, r, "user_id", "t", "event_id", Seq("event_id", "t")))
      assert(viaMerge === viaWindow, s"sample $sample")
    }
  }

  test("forward asofJoinMerge equals asofJoinForward row-for-row under ties") {
    (1 to 10).foreach { sample =>
      val l = randomTable(sample.toLong + 40L, 9000L).toDF("event_id", "user_id", "t")
      val r = randomTable(sample.toLong + 540L, 1000L).toDF("event_id", "user_id", "t")
      def collect(df: DataFrame) =
        df.select($"event_id", $"asof_event_id", $"asof_t")
          .as[(Long, Option[Long], Option[Long])].collect().toSet
      val viaWindow = collect(
        Temporal.asofJoinForward(l, r, "user_id", "t", "event_id", Seq("event_id", "t")))
      val viaMerge = collect(
        Temporal.asofJoinMerge(l, r, "user_id", "t", "event_id", Seq("event_id", "t"),
          forward = true))
      assert(viaMerge === viaWindow, s"sample $sample")
    }
  }

  test("asofJoinMerge survives repartitioned inputs (EnsureRequirements re-clusters)") {
    val l = randomTable(77L, 9000L).toDF("event_id", "user_id", "t")
    val r = randomTable(78L, 1000L).toDF("event_id", "user_id", "t")
    val base = Temporal.asofJoinMerge(l, r, "user_id", "t", "event_id", Seq("event_id"))
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    val rep = Temporal.asofJoinMerge(
        l.repartition(7), r.repartition(3), "user_id", "t", "event_id", Seq("event_id"))
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(base === rep)
  }

  test("plan shape: AsOfJoinExec with two clustered sorts, no Union, no Window") {
    val l = Seq((1L, 1L, 5L)).toDF("event_id", "user_id", "t")
    val r = Seq((2L, 1L, 3L)).toDF("event_id", "user_id", "t")
    val df = Temporal.asofJoinMerge(l, r, "user_id", "t", "event_id", Seq("event_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)         // nodeName strips "Exec"
    assert(!plan.contains("!AsOfJoin"), plan)       // no missing-input marker
    assert(!plan.contains("Union") && !plan.contains("Window"), plan)
    df.collect() // and it executes
  }

  test("null keys/times on the left produce null payload; right nulls are skipped") {
    val l = Seq((1L, Some(1L), Some(5L)), (2L, None, Some(5L)), (3L, Some(1L), None))
      .toDF("event_id", "user_id", "t")
    val r = Seq((10L, Some(1L), Some(3L)), (11L, None, Some(1L)), (12L, Some(1L), None))
      .toDF("event_id", "user_id", "t")
    val got = Temporal.asofJoinMerge(l, r, "user_id", "t", "event_id", Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("string payload columns ride the merge (non-numeric payload types)") {
    val l = Seq((1L, 1L, 5L)).toDF("event_id", "user_id", "t")
    val r = Seq((2L, 1L, 3L, "hello"), (3L, 1L, 4L, "world"))
      .toDF("event_id", "user_id", "t", "tag")
    val got = Temporal.asofJoinMerge(l, r, "user_id", "t", "event_id", Seq("tag", "t"))
      .select($"asof_tag", $"asof_t").as[(String, Long)].head()
    assert(got === (("world", 4L)))
  }
}
