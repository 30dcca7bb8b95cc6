package graft

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkFunSuite {
  import spark.implicits._

  test("fillBucketGaps property: equals brute-force spine fill") {
    import org.scalacheck.{Gen, rng}
    (1 to 8).foreach { sample =>
      val gen = for {
        n <- Gen.choose(3, 40)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 20L), Gen.choose(1L, 9L)))
      } yield rows
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong)).get
      // pre-aggregate: one value per (key, bucket)
      val perBucket = raw.groupBy(r => (r._1, r._2))
        .map { case ((k, b), vs) => (k, b, vs.map(_._3).sum) }.toSeq
      val expected = perBucket.groupBy(_._1).flatMap { case (k, rs) =>
        val m = rs.map(r => r._2 -> r._3).toMap
        (rs.map(_._2).min to rs.map(_._2).max).map(b => (k, b, m.getOrElse(b, 0L)))
      }.toSet
      val got = TimeSeries.fillBucketGaps(
          perBucket.toDF("k", "b", "v").repartition(5), "k", "b", "v")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }

  test("fillBucketGaps: single-bucket keys produce exactly one row, no fill") {
    val df = Seq((1L, 5L, 7L), (2L, 9L, 1L)).toDF("k", "b", "v")
    val got = TimeSeries.fillBucketGaps(df, "k", "b", "v")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 5L, 7L), (2L, 9L, 1L)))
  }

  test("interpolateLinear property: equals brute-force neighbor interpolation") {
    import org.scalacheck.{Gen, rng}
    (1 to 8).foreach { sample =>
      val gen = for {
        n <- Gen.choose(3, 40)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L), Gen.choose(-50L, 50L)))
      } yield rows
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 100L)).get
      val perBucket = raw.groupBy(r => (r._1, r._2))
        .map { case ((k, b), vs) => (k, b, vs.map(_._3).sum) }.toSeq
      val expected = perBucket.groupBy(_._1).flatMap { case (k, rs) =>
        val m = rs.map(r => r._2 -> r._3).toMap
        val bs = rs.map(_._2)
        (bs.min to bs.max).map { b =>
          val v = m.get(b) match {
            case Some(x) => x.toDouble
            case None =>
              val pb = m.keys.filter(_ < b).max; val nb = m.keys.filter(_ > b).min
              m(pb) + (m(nb) - m(pb)).toDouble * (b - pb) / (nb - pb)
          }
          (k, b,
            BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            m.contains(b))
        }
      }.toSet
      val got = TimeSeries.interpolateLinear(
          perBucket.toDF("k", "b", "v").repartition(5), "k", "b", "v")
        .as[(Long, Long, Double, Boolean)].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }

  test("madOutliers: med/mad interpolate like quantile_cont; dev is |v - med|") {
    // key 1: values 1,2,3,4 -> med 2.5; devs 1.5,0.5,0.5,1.5 -> mad 1.0
    val df = Seq((1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 3L), (1L, 3L, 4L),
      (2L, 0L, 10L)).toDF("k", "b", "v")
    val got = TimeSeries.madOutliers(df, "k", "b", "v")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSet
    assert(got === Set(
      (1L, 0L, 1L, 2.5, 1.0, 1.5), (1L, 1L, 2L, 2.5, 1.0, 0.5),
      (1L, 2L, 3L, 2.5, 1.0, 0.5), (1L, 3L, 4L, 2.5, 1.0, 1.5),
      (2L, 0L, 10L, 10.0, 0.0, 0.0)))
  }
}
