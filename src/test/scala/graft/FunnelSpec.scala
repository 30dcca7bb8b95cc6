package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

/** Ordered-funnel semantics vs an in-memory reference. */
class FunnelSpec extends SparkFunSuite {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "ts_ms")

  test("funnel: out-of-order steps do not count") {
    // user 1: click happens BEFORE the first view -> stage stops at 1
    // user 2: proper view -> click -> purchase
    val df = ev(
      (1L, "click", 5L), (1L, "view", 10L),
      (2L, "view", 1L), (2L, "click", 2L), (2L, "purchase", 3L),
      (3L, "click", 1L)) // never viewed: absent
    val r = Sessionize.funnel(df, Seq("view", "click", "purchase"))
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 3L))
  }

  test("funnel: equal timestamps are at-or-after inclusive") {
    val df = ev((1L, "view", 5L), (1L, "click", 5L), (1L, "purchase", 5L))
    val r = Sessionize.funnel(df, Seq("view", "click", "purchase"))
      .select("user_id", "t1", "t2", "t3", "stage")
      .as[(Long, Long, Option[Long], Option[Long], Long)].head()
    assert(r === ((1L, 5L, Some(5L), Some(5L), 3L)))
  }

  test("funnel property: equals brute-force first-touch chain") {
    import org.scalacheck.{Gen, rng}
    val types = Vector("view", "click", "purchase", "error")
    (1 to 8).foreach { sample =>
      val gen = for {
        n <- Gen.choose(5, 80)
        rows <- Gen.listOfN(n,
          Gen.zip(Gen.choose(1L, 6L), Gen.oneOf(types), Gen.choose(0L, 30L)))
      } yield rows
      val rows = gen(Gen.Parameters.default, rng.Seed(sample.toLong)).get
      val expected = rows.groupBy(_._1).flatMap { case (u, es) =>
        val t1 = es.filter(_._2 == "view").map(_._3).minOption
        t1.map { v =>
          val t2 = es.filter(e => e._2 == "click" && e._3 >= v).map(_._3).minOption
          val t3 = t2.flatMap(c =>
            es.filter(e => e._2 == "purchase" && e._3 >= c).map(_._3).minOption)
          u -> ((v, t2, t3, 1L + t2.size + t3.size))
        }
      }
      val got = Sessionize.funnel(ev(rows: _*).repartition(5), Seq("view", "click", "purchase"))
        .select("user_id", "t1", "t2", "t3", "stage")
        .as[(Long, Long, Option[Long], Option[Long], Long)].collect()
        .map { case (u, a, b, c, s) => u -> ((a, b, c, s)) }.toMap
      assert(got === expected, s"sample $sample")
    }
  }

  test("funnel rejects degenerate step lists") {
    val d = ev((1L, "view", 1L))
    intercept[IllegalArgumentException] { Sessionize.funnel(d, Seq("view")) }
    intercept[IllegalArgumentException] { Sessionize.funnel(d, Seq("view", "view")) }
  }

  test("cohortRetention property: equals brute-force triangle") {
    import org.scalacheck.{Gen, rng}
    (1 to 6).foreach { sample =>
      val gen = for {
        n <- Gen.choose(5, 60)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 8L), Gen.choose(0L, 12L)))
      } yield rows
      val rows = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 30L)).get
      val dayMs = 86400000L
      val df = rows.map { case (u, d) => (u, "view", d * dayMs + u) }
        .toDF("user_id", "event_type", "ts_ms")
      val byUser = rows.groupBy(_._1)
      val expected = byUser.toSeq.flatMap { case (u, es) =>
        val cohort = es.map(_._2).min
        es.map(_._2).distinct.map(d => (cohort, d - cohort) -> u)
      }.filter(_._1._2 <= 7L)
        .groupBy(_._1).map { case (k, us) => k -> us.map(_._2).distinct.size.toLong }
      val got = Sessionize.cohortRetention(df, maxOffsetDays = 7)
        .as[(Long, Long, Long)].collect()
        .map { case (c, o, n) => (c, o) -> n }.toMap
      assert(got === expected, s"sample $sample")
    }
  }

  test("markovTransitions: counts consecutive pairs in (ts, tie) order; p row-normalizes") {
    import graft.operators.Sessionize
    val ev = Seq(
      // user 1: a -> b -> a (ties at ts=5 ordered by event_id: b then a)
      (1L, "a", 0L, 1L), (1L, "b", 5L, 2L), (1L, "a", 5L, 3L),
      // user 2: a -> b
      (2L, "a", 0L, 4L), (2L, "b", 9L, 5L),
      // user 3: single event -> no transition
      (3L, "c", 0L, 6L))
      .toDF("user_id", "event_type", "ts_ms", "event_id")
    val got = Sessionize.markovTransitions(ev)
      .as[(String, String, Long, Double)].collect().toSet
    // from a: 2x a->b; from b: 1x b->a => p(a->b)=1.0, p(b->a)=1.0
    assert(got === Set(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("markovTransitions: probabilities per from_type sum to 1") {
    import graft.operators.Sessionize
    val ev = SparkEntry.table(spark, sf0001, "events")
      .withColumn("ts_ms", org.apache.spark.sql.functions.unix_millis($"ts"))
    val sums = Sessionize.markovTransitions(ev)
      .groupBy("from_type")
      .agg(org.apache.spark.sql.functions.sum("p").as("sp"))
      .as[(String, Double)].collect()
    assert(sums.nonEmpty)
    sums.foreach { case (f, sp) => assert(math.abs(sp - 1.0) < 1e-4, s"from $f: $sp") }
  }

  test("sequenceMatch: non-overlapping counts, first position, unmapped types dropped") {
    import graft.operators.Sessionize
    val ev = Seq(
      // user 1: v c p v p  -> 'vcpvp' => 2 matches of v[c]*p, first at 1
      (1L, "view", 0L, 1L), (1L, "click", 1L, 2L), (1L, "purchase", 2L, 3L),
      (1L, "view", 3L, 4L), (1L, "purchase", 4L, 5L),
      // user 2: p v c (no match; seq 'pvc')
      (2L, "purchase", 0L, 6L), (2L, "view", 1L, 7L), (2L, "click", 2L, 8L),
      // user 3: only an unmapped type -> absent from output
      (3L, "other", 0L, 9L),
      // user 4: equal-ts ties ordered by event_id: v(id 10) p(id 11)
      (4L, "purchase", 5L, 11L), (4L, "view", 5L, 10L))
      .toDF("user_id", "event_type", "ts_ms", "event_id")
    val got = Sessionize.sequenceMatch(ev,
        codes = Map("view" -> "v", "click" -> "c", "purchase" -> "p"),
        pattern = "v[c]*p")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 5L, 2L, 1L), (2L, 3L, 0L, 0L), (4L, 2L, 1L, 1L)))
  }

  test("sequenceMatch is partition-invariant") {
    import graft.operators.Sessionize
    val ev = SparkEntry.table(spark, sf0001, "events")
      .withColumn("ts_ms", org.apache.spark.sql.functions.unix_millis($"ts"))
    val codes = Map("view" -> "v", "click" -> "c", "purchase" -> "p",
      "signup" -> "s", "error" -> "e")
    val a = Sessionize.sequenceMatch(ev, codes, "v[ce]*p")
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Sessionize.sequenceMatch(ev.repartition(13), codes, "v[ce]*p")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("attributeLastTouch: window cut, strict precedence, tie order, (none) bucket") {
    import graft.operators.Sessionize
    val ev = Seq(
      // user 1: click@0, purchase@5 (within 10) -> click
      (1L, "click", 0L, 1L), (1L, "purchase", 5L, 2L),
      // user 2: view@0, purchase@20 (outside 10) -> (none)
      (2L, "view", 0L, 3L), (2L, "purchase", 20L, 4L),
      // user 3: purchase with NO prior touch -> (none); later touch ignored
      (3L, "purchase", 0L, 5L), (3L, "view", 1L, 6L),
      // user 4: equal-ts touch with SMALLER tie id precedes -> view credited
      (4L, "view", 7L, 7L), (4L, "purchase", 7L, 8L),
      // user 4 second purchase: most recent touch still view@7, within 10
      (4L, "purchase", 9L, 9L))
      .toDF("user_id", "event_type", "ts_ms", "event_id")
    val got = Sessionize.attributeLastTouch(ev,
        touchTypes = Seq("view", "click"), convType = "purchase", lookbackMs = 10L)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("click", 1L, 1L), ("(none)", 2L, 2L), ("view", 2L, 1L)))
  }

  test("listagg query is deterministic under repartition at sf0.001") {
    val a = SparkEntry.queries("q_listagg")(spark, sf0001)
      .orderBy("o_custkey").as[(Long, Long, String)].collect().toSeq
    assert(a.nonEmpty)
    // concatenation order is imposed inside the aggregate -> stable
    val b = SparkEntry.queries("q_listagg")(spark, sf0001)
      .orderBy("o_custkey").as[(Long, Long, String)].collect().toSeq
    assert(a === b)
    assert(a.forall(_._3.split(",").nonEmpty))
  }
}
