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

  test("ewma property: equals brute-force normalized exponential weighting") {
    import org.scalacheck.{Gen, rng}
    val alpha = 0.3; val look = 5
    (1 to 8).foreach { sample =>
      val gen = for {
        n <- Gen.choose(3, 40)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L), Gen.choose(-9L, 9L)))
      } yield rows
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 300L)).get
      val perBucket = raw.groupBy(r => (r._1, r._2))
        .map { case ((k, b), vs) => (k, b, vs.map(_._3).sum) }.toSeq
      val expected = perBucket.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.sortBy(_._2)
        sorted.indices.map { i =>
          val frame = sorted.slice(math.max(0, i - look + 1), i + 1).map(_._3.toDouble)
          val n = frame.length
          val num = frame.zipWithIndex.map { case (x, j) => x * math.pow(1 - alpha, n - 1 - j) }.sum
          val den = (1 - math.pow(1 - alpha, n)) / alpha
          (k, sorted(i)._2, sorted(i)._3,
            BigDecimal(num / den).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }.toSet
      val got = TimeSeries.ewma(
          perBucket.toDF("k", "b", "v").repartition(5), "k", "b", "v", alpha, look)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }

  test("ewma: single observation is its own average; constant series is constant") {
    val df = Seq((1L, 0L, 5L), (2L, 0L, 3L), (2L, 1L, 3L), (2L, 2L, 3L))
      .toDF("k", "b", "v")
    val got = TimeSeries.ewma(df, "k", "b", "v", alpha = 0.5, lookback = 10)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 0L, 5L, 5.0), (2L, 0L, 3L, 3.0),
      (2L, 1L, 3L, 3.0), (2L, 2L, 3L, 3.0)))
  }

  test("rollingMedian property: equals brute-force sorted-frame median") {
    import org.scalacheck.{Gen, rng}
    val win = 4
    (1 to 8).foreach { sample =>
      val gen = for {
        n <- Gen.choose(3, 40)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L), Gen.choose(-50L, 50L)))
      } yield rows
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 400L)).get
      val perBucket = raw.groupBy(r => (r._1, r._2))
        .map { case ((k, b), vs) => (k, b, vs.map(_._3).sum) }.toSeq
      val expected = perBucket.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.sortBy(_._2)
        sorted.indices.map { i =>
          val frame = sorted.slice(math.max(0, i - win + 1), i + 1).map(_._3.toDouble).sorted
          val n = frame.length
          val med = if (n % 2 == 1) frame(n / 2) else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
          (k, sorted(i)._2, sorted(i)._3,
            BigDecimal(med).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }.toSet
      val got = TimeSeries.rollingMedian(
          perBucket.toDF("k", "b", "v").repartition(5), "k", "b", "v", win)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }

  test("cusum property: equals brute-force clamped recurrence; partition-invariant") {
    import org.scalacheck.{Gen, rng}
    val drift = 2L; val threshold = 5L
    (1 to 8).foreach { sample =>
      val gen = for {
        n <- Gen.choose(3, 50)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 30L), Gen.choose(-10L, 10L)))
      } yield rows
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 600L)).get
      val perBucket = raw.groupBy(r => (r._1, r._2))
        .map { case ((k, b), vs) => (k, b, vs.map(_._3).sum, 1L) }.toSeq // target 1
      val expected = perBucket.groupBy(_._1).flatMap { case (k, rs) =>
        var pos = 0L; var neg = 0L
        rs.sortBy(_._2).map { case (_, b, x, t) =>
          pos = math.max(0L, pos + x - t - drift)
          neg = math.max(0L, neg + t - x - drift)
          (k, b, x, pos, neg, if (pos > threshold || neg > threshold) 1 else 0)
        }
      }.toSet
      val got = TimeSeries.cusum(
          perBucket.toDF("k", "b", "x", "t").repartition(7), "k", "b", "x", "t",
          drift, threshold)
        .as[(Long, Long, Long, Long, Long, Int)].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }

  test("cusum: clamp at zero stops drift accumulation; alarm is strict >") {
    // target 0, drift 0, threshold 3: x = 2,2,-10,2 -> pos 2,4,0,2; neg 0,0,10,8
    val df = Seq((1L, 0L, 2L, 0L), (1L, 1L, 2L, 0L), (1L, 2L, -10L, 0L), (1L, 3L, 2L, 0L))
      .toDF("k", "b", "x", "t")
    val got = TimeSeries.cusum(df, "k", "b", "x", "t", drift = 0L, threshold = 3L)
      .as[(Long, Long, Long, Long, Long, Int)].collect().toSet
    assert(got === Set(
      (1L, 0L, 2L, 2L, 0L, 0), (1L, 1L, 2L, 4L, 0L, 1),
      (1L, 2L, -10L, 0L, 10L, 1), (1L, 3L, 2L, 2L, 8L, 1)))
  }

  test("holt property: equals brute-force fixed-point recurrence (truncating division)") {
    import org.scalacheck.{Gen, rng}
    val (aN, aD, bN, bD, s) = (3L, 10L, 1L, 5L, 1000000L)
    (1 to 8).foreach { sample =>
      val gen = for {
        n <- Gen.choose(3, 40)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 25L), Gen.choose(-99L, 99L)))
      } yield rows
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 700L)).get
      val perBucket = raw.groupBy(r => (r._1, r._2))
        .map { case ((k, b), vs) => (k, b, vs.map(_._3).sum) }.toSeq
      val expected = perBucket.groupBy(_._1).flatMap { case (k, rs) =>
        var l = 0L; var b = 0L; var first = true
        rs.sortBy(_._2).map { case (_, bk, x) =>
          if (first) { l = x * s; b = 0L; first = false }
          else {
            val lNew = (aN * x * s + (aD - aN) * (l + b)) / aD
            b = (bN * (lNew - l) + (bD - bN) * b) / bD
            l = lNew
          }
          (k, bk, x, l, b, l + b)
        }
      }.toSet
      val got = TimeSeries.holt(
          perBucket.toDF("k", "b", "v").repartition(7), "k", "b", "v",
          aN, aD, bN, bD, s)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }

  test("holt: constant series keeps zero trend and exact level") {
    val df = Seq((1L, 0L, 7L), (1L, 1L, 7L), (1L, 2L, 7L)).toDF("k", "b", "v")
    val got = TimeSeries.holt(df, "k", "b", "v")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0L, 7L, 7000000L, 0L, 7000000L),
      (1L, 1L, 7L, 7000000L, 0L, 7000000L),
      (1L, 2L, 7L, 7000000L, 0L, 7000000L)))
  }

  test("autocorr: perfect positive/negative series, zero variance -> null, lag pairs only") {
    // key 1: strictly increasing -> lag-1 acf = 1 on the 4 pairs
    // key 2: constant -> zero variance -> null
    // key 3: single row -> no pair -> absent
    val df = Seq(
      (1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 3L), (1L, 3L, 4L), (1L, 4L, 5L),
      (2L, 0L, 7L), (2L, 1L, 7L), (2L, 2L, 7L),
      (3L, 0L, 9L)).toDF("k", "b", "v")
    val got = TimeSeries.autocorr(df, "k", "b", "v")
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(got === Set((1L, 4L, Some(1.0)), (2L, 2L, None)))
  }

  test("trendOls: exact line recovered, r2 = 1; degenerate keys null out") {
    // key 1: y = 3x + 2 exactly; key 2: one point; key 3: constant y
    val df = Seq(
      (1L, 0L, 2L), (1L, 1L, 5L), (1L, 2L, 8L), (1L, 3L, 11L),
      (2L, 4L, 9L),
      (3L, 0L, 5L), (3L, 1L, 5L)).toDF("k", "b", "v")
    val got = TimeSeries.trendOls(df, "k", "b", "v")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSet
    assert(got === Set(
      (1L, 4L, Some(3.0), Some(2.0), Some(1.0)),
      (2L, 1L, None, None, None),
      (3L, 2L, Some(0.0), Some(5.0), None))) // zero y-variance: slope 0, r2 null
  }

  test("autocorr property: equals brute-force Pearson over lagged pairs") {
    import org.scalacheck.{Gen, rng}
    (1 to 8).foreach { sample =>
      val gen = for {
        n <- Gen.choose(4, 40)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L), Gen.choose(-9L, 9L)))
      } yield rows
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 1000L)).get
      val perBucket = raw.groupBy(r => (r._1, r._2))
        .map { case ((k, b), vs) => (k, b, vs.map(_._3).sum) }.toSeq
      val expected = perBucket.groupBy(_._1).flatMap { case (k, rs) =>
        val vs = rs.sortBy(_._2).map(_._3)
        val pairs = vs.zip(vs.tail).map { case (x, y) => (x, y) }
        if (pairs.isEmpty) None
        else {
          val n = pairs.size.toLong
          val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
          val sxy = pairs.map(p => p._1 * p._2).sum
          val sxx = pairs.map(p => p._1 * p._1).sum
          val syy = pairs.map(p => p._2 * p._2).sum
          val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
          val acf = if (dx > 0 && dy > 0)
            Some(BigDecimal((n * sxy - sx * sy) / math.sqrt(dx.toDouble * dy.toDouble))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          else None
          Some((k, n, acf))
        }
      }.toSet
      val got = TimeSeries.autocorr(
          perBucket.toDF("k", "b", "v").repartition(5), "k", "b", "v")
        .as[(Long, Long, Option[Double])].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }

  test("Intervals.mergeOverlaps: overlap and touch merge, gaps split, per key") {
    import graft.operators.Intervals
    val df = Seq(
      (1L, 0L, 10L), (1L, 5L, 12L), (1L, 12L, 15L), // one island [0,15)
      (1L, 20L, 25L),                               // gap -> second island
      (2L, 0L, 1L), (2L, 2L, 3L))                   // two islands
      .toDF("k", "s", "e")
    val got = Intervals.mergeOverlaps(df, "k", "s", "e")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 0L, 15L), (1L, 20L, 25L), (2L, 0L, 1L), (2L, 2L, 3L)))
    val cov = Intervals.coverage(df, "k", "s", "e")
      .as[(Long, Long, Long)].collect().toSet
    assert(cov === Set((1L, 2L, 20L), (2L, 2L, 2L)))
  }

  test("Intervals.mergeOverlaps property: equals brute-force sweep; contained intervals absorbed") {
    import graft.operators.Intervals
    import org.scalacheck.{Gen, rng}
    (1 to 8).foreach { sample =>
      val gen = for {
        n <- Gen.choose(2, 50)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L), Gen.choose(1L, 12L)))
      } yield rows.map { case (k, s, len) => (k, s, s + len) }
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 500L)).get
      val expected = raw.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.map(r => (r._2, r._3)).sorted
        sorted.tail.foldLeft(List(sorted.head)) { case (acc @ (cs, ce) :: rest, (s, e)) =>
          if (s <= ce) (cs, math.max(ce, e)) :: rest else (s, e) :: acc
        }.map { case (s, e) => (k, s, e) }
      }.toSet
      val got = Intervals.mergeOverlaps(raw.toDF("k", "s", "e").repartition(5), "k", "s", "e")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }
}
