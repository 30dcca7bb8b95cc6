package graft

import graft.operators.Graph
import graft.streaming.StreamingZscore
import graft.streaming.StreamingZscore.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-10 continuation: per-vertex local clustering coefficient and
  * the streaming prior-moments z-score tier (multi-batch state handoff
  * — the behavior the single-batch oracle cannot see). */
class Round10fOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("localClustering: triangle 1.0, wedge third, square 0, pendant out") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L)).toDF("src", "dst")
    val out = Graph.localClustering(edges, "src", "dst", topK = 10)
      .collect()
    assert(out.map(_.getAs[Long]("id")).toSeq ==
      Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L)) // 4 (deg 1) excluded
    assert(out(0).getAs[Double]("cc") == 1.0)
    assert(out(1).getAs[Double]("cc") == 1.0)
    assert(out(2).getAs[Double]("cc") == 0.333333) // deg 3, one triangle
    assert(out(2).getAs[Long]("n_tri") == 1L)
    assert(out.drop(3).forall(_.getAs[Double]("cc") == 0.0)) // the square
  }

  test("streamingZscore: prior-moment state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val name = s"zs_out_${System.nanoTime()}"
    val q = StreamingZscore.zscore(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      // batch 1 (out of order): sorted fold gives each event the PRIOR
      // moments of its predecessors only
      input.addData(Seq(Ev(1L, 2L, 1L, 12L), Ev(1L, 1L, 1L, 10L)))
      q.processAllAvailable()
      val b1 = spark.table(name)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(b1.sortBy(_._2) == Seq(
        (1L, 1L, 1L, 10L, 0L, 0L, 0L),
        (1L, 2L, 1L, 12L, 1L, 10L, 100L)))
      // batch 2: continues from (n=2, sx=22, sxx=244)
      input.addData(Seq(Ev(1L, 3L, 1L, 8L)))
      q.processAllAvailable()
      val b2 = spark.table(name)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
        .filter(_._2 == 3L)
      assert(b2 == Seq((1L, 3L, 1L, 8L, 2L, 22L, 244L)))
    } finally {
      q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("zSql: warm-up nulls, flat baseline nulls, pinned outlier z") {
    // prior series 10,12,8,11,9 (n=5, sx=50, sxx=510, var=2); x=100
    val df = Seq(
      (100L, 5L, 50L, 510L), // z = 90/sqrt(2) = 63.63961
      (100L, 4L, 40L, 410L), // warm-up: n_prior < 5
      (100L, 5L, 50L, 500L)) // flat baseline: var = 0
      .toDF("x", "n_prior", "sx_prior", "sxx_prior")
      .withColumn("z", expr(StreamingZscore.zSql))
      .collect()
    assert(df(0).getAs[Double]("z") == 63.63961)
    assert(df(1).isNullAt(df(1).fieldIndex("z")))
    assert(df(2).isNullAt(df(2).fieldIndex("z")))
  }

  test("streamingZscore: Long-bound fold saturates instead of wrapping") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val name = s"zs_sat_${System.nanoTime()}"
    val big = 4000000000L // x^2 = 1.6e19 > Long.MaxValue
    val q = StreamingZscore.zscore(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      input.addData(Seq(Ev(1L, 1L, 1L, big), Ev(1L, 2L, 1L, 1L)))
      q.processAllAvailable()
      val rows = spark.table(name)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      val second = rows.find(_._2 == 2L).get
      assert(second._7 == Long.MaxValue) // pinned, not wrapped negative
    } finally {
      q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }
}
