package graft

import graft.operators.{Dedup, TimeSeries}
import org.apache.spark.sql.functions._

/** Hampel despiking (fixed-point exactness) and blocking-based fuzzy
  * name matching — round-8 additions. */
class LinkageHampelSpec extends SparkFunSuite {
  import spark.implicits._

  test("hampel: hand series — spike repaired to frame median, rest kept") {
    val df = Seq((1L, 1L, 10L), (1L, 2L, 14L), (1L, 3L, 3L),
      (1L, 4L, 17L), (1L, 5L, 100L)).toDF("k", "b", "v")
    val got = TimeSeries.hampel(df, "k", "b", "v", windowRows = 3, k = 3)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getLong(6))).toMap
    // (med2, mad4, is_outlier, repaired2) per bucket — cross-checked
    // against DuckDB's windowed quantile_cont/mad on the same frames
    assert(got(1L) == (20L, 0L, false, 20L))
    assert(got(2L) == (24L, 8L, false, 28L))
    assert(got(3L) == (20L, 16L, false, 6L))
    assert(got(4L) == (28L, 12L, false, 34L))
    assert(got(5L) == (34L, 56L, true, 34L)) // the spike: repaired to median
  }

  test("hampel: MAD = 0 repairs ANY deviation (constant-run rule)") {
    val df = Seq((1L, 1L, 5L), (1L, 2L, 5L), (1L, 3L, 5L), (1L, 4L, 6L))
      .toDF("k", "b", "v")
    val r4 = TimeSeries.hampel(df, "k", "b", "v", windowRows = 3, k = 3)
      .filter(col("b") === 4L).head()
    // frame {5,5,6}: med2=10, devs {0,0,2} -> mad4=0; x=6 deviates -> repair
    assert(r4.getBoolean(5) && r4.getLong(6) == 10L)
  }

  test("fuzzyNameJoin: histogram counts, block + length-band + edit bound") {
    val df = Seq("red bolt", "red bolt", "hot bolt", "red ring", "redd bolt")
      .toDF("name")
    val got = Dedup.fuzzyNameJoin(df, "name",
      n => element_at(split(n, " "), -1), maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      ("hot bolt", "red bolt", 1L, 2L, 3L),   // hot->red = 3 edits
      ("red bolt", "redd bolt", 2L, 1L, 1L))) // one insertion
    // 'red ring' blocks apart from the bolts; hot/redd is 4 edits — both out
  }
}
