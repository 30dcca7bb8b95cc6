package graft

import graft.operators.{Normalize, TimeSeries}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzz for the round-8 normalization/stats operators: each is
  * re-derived against an independent in-memory Scala reference on random
  * data (the CrossImplFuzzSpec discipline — shared-nothing agreement).
  * Catches exactly the class of bug a fixed fixture can miss: interpolation
  * off-by-ones at group boundaries, variance cancellation, empty arms. */
class Round8FuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private val groups: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(2, 120)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(-500L, 500L)
    } yield (k, v))
  } yield rows

  /** Spark/DuckDB exact interpolated percentile on a sorted sample. */
  private def pct(sorted: Vector[Long], p: Double): Double = {
    val idx = p * (sorted.size - 1)
    val lo = math.floor(idx).toInt
    val hi = math.ceil(idx).toInt
    sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
  }

  test("winsorize equals the interpolated-quantile reference on 30 random tables") {
    (1 to 30).foreach { seed =>
      groups(Gen.Parameters.default, Seed(seed.toLong)).foreach { rows =>
        val got = Normalize.winsorize(rows.toDF("k", "v"), "k", "v", 0.1, 0.9)
          .select($"k", $"v", $"v_wins").as[(String, Long, Double)]
          .collect().groupBy(_._1)
        val ref = rows.groupBy(_._1)
        ref.foreach { case (k, rs) =>
          val sorted = rs.map(_._2).sorted.toVector
          val (lo, hi) = (pct(sorted, 0.1), pct(sorted, 0.9))
          got(k).foreach { case (_, v, w) =>
            val expect = math.rint(math.min(math.max(v.toDouble, lo), hi) * 1e6) / 1e6
            assert(math.abs(w - expect) < 1.1e-6, s"seed $seed key $k v $v: $w vs $expect")
          }
        }
      }
    }
  }

  test("zscore equals the exact-moment reference on 30 random tables") {
    (1 to 30).foreach { seed =>
      groups(Gen.Parameters.default, Seed(seed.toLong)).foreach { rows =>
        val got = Normalize.zscore(rows.toDF("k", "v"), "k", "v")
          .select($"k", $"v", $"z").collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
        rows.groupBy(_._1).foreach { case (k, rs) =>
          val xs = rs.map(_._2)
          val n = xs.size.toDouble
          val mean = xs.sum / n
          val variance = xs.map(x => x * x).sum / n - mean * mean
          xs.foreach { v =>
            val expect =
              if (variance > 0) Some(math.rint((v - mean) / math.sqrt(variance) * 1e6) / 1e6)
              else None
            val gotZ = got((k, v))
            (gotZ, expect) match {
              case (Some(g), Some(e)) => assert(math.abs(g - e) < 1.1e-6, s"seed $seed $k $v")
              case (g, e) => assert(g == e, s"seed $seed $k $v: $g vs $e")
            }
          }
        }
      }
    }
  }

  test("welchTTest equals the two-arm reference on 30 random tables") {
    (1 to 30).foreach { seed =>
      groups(Gen.Parameters.default, Seed(seed.toLong)).foreach { rows =>
        val armed = rows.zipWithIndex.map { case ((k, v), i) => (k, i % 2 == 0, v) }
        val got = Normalize.welchTTest(armed.toDF("k", "arm", "v"), "k", "arm", "v")
          .collect().map(r => r.getString(0) ->
            (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
        armed.groupBy(_._1).foreach { case (k, rs) =>
          val (a, b) = (rs.filter(_._2).map(_._3), rs.filterNot(_._2).map(_._3))
          def variance(xs: List[Long]): Double = {
            val n = xs.size.toDouble
            val m = xs.sum / n
            xs.map(x => (x - m) * (x - m)).sum / (n - 1)
          }
          val expect =
            if (a.size < 2 || b.size < 2) None
            else {
              val se2 = variance(a) / a.size + variance(b) / b.size
              if (se2 > 0)
                Some(math.rint((a.sum.toDouble / a.size - b.sum.toDouble / b.size) /
                  math.sqrt(se2) * 1e6) / 1e6)
              else None
            }
          (got(k), expect) match {
            case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-5, s"seed $seed $k: $g vs $e")
            case (g, e) => assert(g == e, s"seed $seed $k: $g vs $e")
          }
        }
      }
    }
  }

  test("nearDupHamming equals brute-force all-pairs on 20 random fingerprint tables") {
    // maxHamming < bands ⇒ the banding is exhaustive; equality (not just
    // recall) must hold against a shared-nothing all-pairs reference
    val tables: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(2, 80)
      rows <- Gen.listOfN(n, for {
        grp <- Gen.choose(1L, 3L)
        // cluster hashes so some pairs fall within hamming 3
        base <- Gen.oneOf(0x155555555L, 0x2AAAAAAAAL, 0x0F0F0F0F0L)
        flips <- Gen.choose(0, 5)
        bits <- Gen.listOfN(flips, Gen.choose(0, 41))
      } yield (grp, bits.foldLeft(base)((h, b) => h ^ (1L << b))))
    } yield rows.zipWithIndex.map { case ((g, h), i) => (i.toLong, g, h) }
    (1 to 20).foreach { seed =>
      tables(Gen.Parameters.default, Seed(seed.toLong)).foreach { rows =>
        val df = rows.toDF("doc_id", "n_bits", "dhash")
        val got = graft.operators.Dedup
          .nearDupHamming(df, groupCol = Some("n_bits"),
            bands = 6, bandBits = 7, maxHamming = 3)
          .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Long)]
          .collect().toSet
        val expect = (for {
          a <- rows; b <- rows
          if a._1 < b._1 && a._2 == b._2
          d = java.lang.Long.bitCount(a._3 ^ b._3)
          if d <= 3
        } yield (a._1, b._1, d.toLong)).toSet
        assert(got == expect, s"seed $seed: ${got.size} vs ${expect.size}")
      }
    }
  }

  test("skyline2D equals brute-force domination on 30 random point sets") {
    val sets: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 200)
      rows <- Gen.listOfN(n, for {
        x <- Gen.choose(0L, 30L)
        y <- Gen.choose(0L, 30L)
      } yield (x, y))
    } yield rows
    (1 to 30).foreach { seed =>
      sets(Gen.Parameters.default, Seed(seed.toLong)).foreach { rows =>
        val got = graft.operators.Skyline
          .skyline2D(rows.toDF("x", "y"), "x", "y", buckets = 7)
          .select($"x", $"y", $"n").as[(Long, Long, Long)].collect().toSet
        val pts = rows.groupBy(identity).map { case (p, g) => (p._1, p._2, g.size.toLong) }
        val expect = pts.filter { case (x, y, _) =>
          !pts.exists { case (qx, qy, _) =>
            qx <= x && qy >= y && (qx < x || qy > y)
          }
        }.toSet
        assert(got == expect, s"seed $seed: ${got.size} vs ${expect.size}")
      }
    }
  }

  test("ksTest equals the in-memory CDF reference on 30 random sample pairs") {
    val samples: Gen[(List[Long], List[Long])] = for {
      na <- Gen.choose(1, 150); nb <- Gen.choose(1, 150)
      a <- Gen.listOfN(na, Gen.choose(0L, 40L))
      // shifted support on one side so D spans the (0, 1] range across seeds
      b <- Gen.listOfN(nb, Gen.choose(10L, 60L))
    } yield (a, b)
    (1 to 30).foreach { seed =>
      samples(Gen.Parameters.default, Seed(seed.toLong)).foreach { case (a, b) =>
        val got = graft.operators.Profiling
          .ksTest(a.map(Tuple1(_)).toDF("v"), b.map(Tuple1(_)).toDF("v"), "v")
          .as[(Long, Long, Double)].head()
        val vs = (a ++ b).distinct.sorted
        val d = vs.map { v =>
          math.abs(a.count(_ <= v).toDouble / a.size - b.count(_ <= v).toDouble / b.size)
        }.max
        assert(got._1 == a.size.toLong && got._2 == b.size.toLong, s"seed $seed sizes")
        assert(math.abs(got._3 - math.rint(d * 1e6) / 1e6) < 1.1e-6, s"seed $seed: ${got._3} vs $d")
      }
    }
  }

  test("globalRowNumber assigns the exact sort rank on 20 random tables (incl. near-empty partitions)") {
    val tables: Gen[List[Long]] = for {
      n <- Gen.choose(1, 300)
      rows <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
    } yield rows.zipWithIndex.map { case (v, i) => v * 10000 + i } // unique
    (1 to 20).foreach { seed =>
      tables(Gen.Parameters.default, Seed(seed.toLong)).foreach { rows =>
        val got = graft.operators.Layout
          .globalRowNumber(rows.map(Tuple1(_)).toDF("v"), Seq("v"))
          .select($"v", $"pos").as[(Long, Long)].collect().toMap
        val expect = rows.sorted.zipWithIndex.map { case (v, i) => v -> (i + 1).toLong }.toMap
        assert(got == expect, s"seed $seed")
      }
    }
  }

  test("seasonalByPhase residuals cancel within every (key, phase) on 30 random series") {
    val series: Gen[List[(String, Long, Long)]] = for {
      n <- Gen.choose(3, 150)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("x", "y")
        b <- Gen.choose(0L, 60L)
        v <- Gen.choose(-1000L, 1000L)
      } yield (k, b, v))
    } yield rows.groupBy(r => (r._1, r._2)).map { case ((k, b), g) =>
      (k, b, g.map(_._3).sum) // one row per (key, bucket)
    }.toList
    (1 to 30).foreach { seed =>
      series(Gen.Parameters.default, Seed(seed.toLong)).foreach { rows =>
        val out = TimeSeries.seasonalByPhase(rows.toDF("k", "bucket", "v"), "k", "bucket", "v")
        // per-row resids are rounded to 6 decimals, so a phase of n buckets
        // cancels only to within n·(rounding half-step)
        val resid = out.groupBy($"k", pmod($"bucket", lit(7L)))
          .agg(sum($"resid").as("s"), count(lit(1)).as("n"))
          .select($"s", $"n").as[(Double, Long)].collect()
        assert(resid.forall { case (s, n) => math.abs(s) <= n * 5.1e-7 }, s"seed $seed")
        // decomposition identity: v = seasonal + resid (to rounding)
        val identity = out
          .select(($"v".cast("double") - ($"seasonal" + $"resid")).as("d"))
          .as[Double].collect()
        assert(identity.forall(math.abs(_) < 2e-6), s"seed $seed identity")
      }
    }
  }
}
