package graft

import graft.operators.{Graph, Sessionize}
import org.apache.spark.sql.functions._

/** Round-13 continuation wave: eigenvector centrality (truncated power
  * iteration) and the fixed-HMM Viterbi decode — numeric pins on
  * hand-computable graphs/sequences, the exclusion contracts, and the
  * Spark-replay cross-check of the oracle's unrolled SQL chain. */
class Round13bOpsSpec extends SparkFunSuite {
  import spark.implicits._

  // ---- eigenvectorCentrality ----------------------------------------

  test("eigenvectorCentrality: 4 rounds on triangle+pendant, by hand") {
    // triangle {1,2,3} with pendant 4-1; x0 = 1:
    //   it1 max-normalized x = (1, 2/3, 2/3, 1/3)
    //   it2 x = (1, 1, 1, 3/5)
    //   it3 x = (1, 10/13, 10/13, 5/13)
    //   it4 x = (1, 23/25, 23/25, 13/25)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.eigenvectorCentrality(e, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 0.92, 3L -> 0.92, 4L -> 0.52), got)
  }

  test("eigenvectorCentrality is orientation- and duplicate-invariant") {
    // reversed, duplicated, and self-loop-polluted input canonicalizes
    // to the same undirected graph, so scores must be identical
    val clean = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val dirty = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (4L, 1L),
      (2L, 2L)).toDF("src", "dst")
    val a = Graph.eigenvectorCentrality(clean, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = Graph.eigenvectorCentrality(dirty, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b)
  }

  test("eigenvectorCentrality rejects iters < 1") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.eigenvectorCentrality(e, "src", "dst", iters = 0)
    }
  }

  // ---- viterbiDecode --------------------------------------------------

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toSeq.toDF("user_id", "ts_ms", "event_id", "event_type")

  test("viterbiDecode: 2-step DP by hand (engaged and idle paths)") {
    // user 1 (view, purchase): vE1 = -36-69 = -105, vI1 = -120-92 = -212;
    //   step 2 into E: max(-105-22, -212-92) = -127 via E → vE2 = -357;
    //   into I: max(-105-161, -212-51) = -263 via I → vI2 = -724;
    //   final E wins → path EE, score -357.
    // user 2 (error, error): vE1 = -336, vI1 = -240;
    //   into E: max(-358, -332) = -332 via I → vE2 = -632;
    //   into I: max(-497, -291) = -291 via I → vI2 = -411;
    //   final I wins, back-pointer I → path II, score -411.
    val df = ev(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "purchase"),
      (2L, 10L, 3L, "error"), (2L, 20L, 4L, "error"))
    val got = Sessionize.viterbiDecode(df, steps = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got == Map(
      1L -> (("EE", -357L)),
      2L -> (("II", -411L))), got)
  }

  test("viterbiDecode excludes keys with fewer than `steps` events and " +
      "orders by (ts_ms, tie)") {
    val df = ev(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "purchase"),
      (3L, 10L, 5L, "view"), // only one event — excluded at steps = 2
      // user 4: same ts, tie decides (purchase first, then view)
      (4L, 10L, 1L, "purchase"), (4L, 10L, 2L, "view"))
    val got = Sessionize.viterbiDecode(df, steps = 2)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
    // purchase-then-view ≠ view-then-purchase: tie column really ordered
    val p4 = Sessionize.viterbiDecode(df, steps = 2)
      .filter(col("user_id") === 4L).collect().head
    // vE1 = -36-230 = -266, vI1 = -120-461 = -581;
    // into E: max(-288, -673) via E → vE2 = -288-69 = -357;
    // into I: max(-427, -632) via E → vI2 = -427-92 = -519 → EE, -357
    assert((p4.getString(1), p4.getLong(2)) == (("EE", -357L)))
  }

  test("viterbiDecode: unknown event types hit the shared floor, not " +
      "a crash, and steps is bounded") {
    val df = ev((1L, 10L, 1L, "zzz_unknown"), (1L, 20L, 2L, "view"))
    val r = Sessionize.viterbiDecode(df, steps = 2).collect().head
    // vE1 = -36-700, vI1 = -120-700: E leads by the same margin as the
    // known-type init, so the floor steered nothing
    assert(r.getString(1) == "EE")
    intercept[IllegalArgumentException] {
      Sessionize.viterbiDecode(df, steps = 0)
    }
    intercept[IllegalArgumentException] {
      Sessionize.viterbiDecode(df, steps = 65)
    }
  }

  test("viterbiSqlCtes replayed by Spark SQL matches viterbiDecode " +
      "(cross-engine chain check)") {
    // deterministic synthetic streams over the full alphabet
    val types = Seq("view", "click", "purchase", "signup", "error")
    val rows = for (u <- 1L to 40L; t <- 1L to 8L) yield
      (u, t * 100L, t, types(((u * 7 + t * 3) % 5).toInt))
    val df = ev(rows: _*)
    val engine = Sessionize.viterbiDecode(df, steps = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    df.createOrReplaceTempView("viterbi_ev")
    val pivot = (1 to 8).map(i =>
      s"MAX(CASE WHEN rn = $i THEN event_type END) AS o$i")
      .mkString(",\n    ")
    val sql =
      s"""WITH o AS (SELECT user_id AS k, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts_ms, event_id) AS rn
         |  FROM viterbi_ev),
         |p AS (SELECT k, $pivot
         |  FROM o WHERE rn <= 8 GROUP BY k
         |  HAVING MAX(CASE WHEN rn = 8 THEN event_type END) IS NOT NULL),
         |${Sessionize.viterbiSqlCtes(8, keyAlias = "user_id")}"""
        .stripMargin
    val replay = spark.sql(sql)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    spark.catalog.dropTempView("viterbi_ev")
    assert(engine == replay)
    assert(engine.size == 40)
  }
}
