package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Time-series shaping: gap filling over integer bucket spines. */
object TimeSeries {

  /** Fill missing buckets per key with a constant: builds each key's spine
    * `sequence(min_bucket, max_bucket)` and left-joins the observed values
    * back. Input is an ALREADY-aggregated (key, bucket, value) table so the
    * operator composes with any upstream aggregation.
    *
    * Scale shape: one key-hashed aggregate for the per-key extents, one
    * bounded `explode(sequence(...))` (spine length = per-key bucket span,
    * never data-proportional beyond it), one key+bucket-hashed join back.
    * The spine generation is distributed — no driver-side calendar, no
    * cross join against a global dimension table. Keys whose span is
    * pathological (one key covering the whole epoch) fan out to span-many
    * rows — cap upstream if bucket ranges are adversarial. */
  def fillBucketGaps(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      fill: Long = 0L): DataFrame = {
    val spine = perBucket
      .groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__b0"), max(col(bucketCol)).as("__b1"))
      .select(col(keyCol), explode(expr("sequence(__b0, __b1)")).as(bucketCol))
    spine
      .join(perBucket, Seq(keyCol, bucketCol), "left")
      .select(col(keyCol), col(bucketCol),
        coalesce(col(valueCol), lit(fill)).as(valueCol))
  }

  /** Fill missing buckets per key by LINEAR INTERPOLATION between the
    * nearest observed neighbors (the standard sensor-series repair).
    * Builds the same per-key spine as [[fillBucketGaps]], then for each
    * missing bucket takes the last observed value/bucket at-or-before and
    * the first at-or-after (IGNORE NULLS running windows) and interpolates;
    * spine edges are always observed (the spine spans min..max observed
    * bucket) so both neighbors exist for every gap. Output value is
    * `round(x, 6)` for cross-engine float stability.
    *
    * Scale shape: the spine join of [[fillBucketGaps]] plus two key-
    * partitioned ordered windows — running IGNORE-NULLS first/last are
    * O(span) per key with constant state, and nothing crosses keys. */
  def interpolateLinear(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spine = perBucket
      .groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__b0"), max(col(bucketCol)).as("__b1"))
      .select(col(keyCol), explode(expr("sequence(__b0, __b1)")).as(bucketCol))
    val joined = spine.join(perBucket, Seq(keyCol, bucketCol), "left")
    val back = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col(valueCol).isNotNull, col(bucketCol))
    joined
      .withColumn("__pv", last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn("__pb", last(obsBucket, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col(valueCol), ignoreNulls = true).over(fwd))
      .withColumn("__nb", first(obsBucket, ignoreNulls = true).over(fwd))
      .select(col(keyCol), col(bucketCol),
        round(
          when(col(valueCol).isNotNull, col(valueCol).cast("double"))
            .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
              (col(bucketCol) - col("__pb")) / (col("__nb") - col("__pb"))),
          6).as(valueCol),
        col(valueCol).isNotNull.as("observed"))
  }

  /** Robust outlier annotation: per key, the exact interpolated median of
    * `valueCol` and the MAD (median absolute deviation), joined back so
    * every row carries `(med, mad, dev)` — callers threshold `dev > k·mad`
    * or rank by deviation. Exact `percentile(0.5)` both times (interpolated,
    * matching quantile_cont in ANSI engines), NOT approx — the medians are
    * per-key scalars so exactness costs one sort-based aggregate each.
    *
    * Scale shape: two key-hashed aggregates + two key-hashed joins; the
    * aggregate outputs are key-cardinality (tiny) so AQE broadcasts the
    * join-back sides. Per-key exact percentile sorts within the aggregate
    * buffer — bounded by the largest single key's bucket count. */
  def madOutliers(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String): DataFrame = {
    val med = perBucket.groupBy(col(keyCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = perBucket.join(med, Seq(keyCol))
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = withMed.groupBy(col(keyCol))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    withMed.join(mad, Seq(keyCol))
      .select(col(keyCol), col(bucketCol), col(valueCol),
        round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"),
        round(col("dev"), 6).as("dev"))
  }

  /** Exponentially-weighted moving average over each key's ordered bucket
    * observations, with a FINITE lookback window of the last `lookback`
    * rows (not calendar buckets): for the frame v₁..vₙ ending at the
    * current row, `ewma = Σ vᵢ·(1−α)^(n−i) / Σ (1−α)^(n−i)` — the
    * normalized form, so partial head windows are exact means of what has
    * been seen, not biased toward an implicit zero history. Weights below
    * (1−α)^lookback are truncated by construction; pick `lookback` ≥
    * ln(ε)/ln(1−α) for tail error < ε. Output rounds to 6 for
    * cross-engine float stability.
    *
    * Scale shape: one key-hashed ordered window; the frame collect is
    * O(lookback) per row (constant, small) and the higher-order
    * `aggregate`/`transform` fold stays inside codegen — no UDF, no
    * per-row allocation beyond the bounded frame array.
    */
  def ewma(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      alpha: Double = 0.3,
      lookback: Int = 30): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(lookback >= 1, s"lookback must be >= 1: $lookback")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(-(lookback - 1), 0)
    val decay = 1.0 - alpha
    perBucket
      .withColumn("__vs", collect_list(col(valueCol).cast("double")).over(w))
      .select(col(keyCol), col(bucketCol), col(valueCol),
        // numerator: left-to-right fold of vᵢ·d^(n−i); denominator: the
        // geometric closed form Σ_{j=0}^{n−1} d^j = (1−d^n)/(1−d) — the
        // same closed form the oracle uses, so float paths match.
        expr(
          s"""round(
             |  aggregate(
             |    zip_with(__vs, sequence(1, size(__vs)),
             |      (x, i) -> x * pow($decay, size(__vs) - i)),
             |    0D, (a, x) -> a + x) /
             |  ((1D - pow($decay, size(__vs))) / $alpha), 6)""".stripMargin
        ).as("ewma"))
  }

  /** MACD over the truncated-window EMA kernel ([[ewma]]'s fold — the
    * recursion-free form both engines can replay): macd = EMA_fast −
    * EMA_slow (spans 12/26, α = 2/(span+1)), signal = EMA_signal of
    * the macd series, histogram = macd − signal, and the crossover
    * label where the histogram changes sign — the classic momentum
    * turn detector. Rows before `slow` observations drop (truncated
    * EMAs are defined earlier but biased — the standard warm-up).
    *
    * Determinism: both EMAs fold ONE collected window (one sort); the
    * signal line folds a second window of the ROUND-6 macd values; all
    * constants splice from the same Scala doubles into both engines'
    * texts, and the left-to-right fold is the ewma kernel's proven
    * cross-engine contract. Crossovers compare rounded doubles to 0 —
    * exact.
    *
    * Plan: two same-sort windows + one lag on one key-hashed exchange;
    * per-key series is the caller's bucket granularity, window state
    * bounded by `lookback`. */
  def macd(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, fast: Int = 12, slow: Int = 26,
      signalSpan: Int = 9, lookback: Int = 60): DataFrame = {
    require(fast < slow, s"fast span must be < slow: $fast vs $slow")
    require(lookback >= slow, s"lookback must cover slow: $lookback")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val wRoll = wOrd.rowsBetween(-(lookback - 1), 0)
    val staged = perBucket
      .select(col(keyCol), col(bucketCol), col(valueCol).cast("long").as("v"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("__vs", collect_list(col("v").cast("double")).over(wRoll))
      .withColumn("macd", expr(
        s"round(${emaFoldSparkSql("__vs", emaAlpha(fast))} - " +
          s"${emaFoldSparkSql("__vs", emaAlpha(slow))}, 6)"))
      .withColumn("__ms", collect_list(col("macd")).over(wRoll))
      .withColumn("signal",
        expr(s"round(${emaFoldSparkSql("__ms", emaAlpha(signalSpan))}, 6)"))
      .withColumn("histogram", expr(macdHistSql))
      .withColumn("__ph", lag(col("histogram"), 1).over(wOrd))
      .withColumn("crossover", expr(macdCrossSql))
    staged.filter(col("rn") >= slow)
      .select(col(keyCol), col(bucketCol), col("v"), col("macd"),
        col("signal"), col("histogram"), col("crossover"))
  }

  /** α = 2/(span+1), spliced as the SAME Scala double into both
    * engines' fold texts. */
  def emaAlpha(span: Int): Double = 2.0 / (span + 1)

  /** Spark-side truncated-EMA fold over a collected double list —
    * the [[ewma]] kernel parameterized by column and α. */
  def emaFoldSparkSql(listCol: String, alpha: Double): String = {
    val d = 1.0 - alpha
    s"""(aggregate(
       |    zip_with($listCol, sequence(1, size($listCol)),
       |      (x, i) -> x * pow($d, size($listCol) - i)),
       |    0D, (a, x) -> a + x) /
       |  ((1D - pow($d, size($listCol))) / $alpha))""".stripMargin
  }

  /** DuckDB-side twin of [[emaFoldSparkSql]] (list_transform/list_sum —
    * the q_ewma-proven pairing). */
  def emaFoldDuckSql(listCol: String, alpha: Double): String = {
    val d = 1.0 - alpha
    s"(list_sum(list_transform($listCol, (x, i) -> " +
      s"x * pow($d, len($listCol) - i))) / " +
      s"((1 - pow($d, len($listCol))) / $alpha))"
  }

  /** histogram over the ROUNDED (macd, signal). Shared with the
    * oracle. */
  val macdHistSql: String = "round(macd - signal, 6)"

  /** Crossover label over (histogram, __ph): sign change only, NULL
    * elsewhere and on the first row. Shared with the oracle. */
  val macdCrossSql: String =
    "CASE WHEN __ph IS NULL THEN NULL " +
      "WHEN __ph <= 0 AND histogram > 0 THEN 'bullish' " +
      "WHEN __ph >= 0 AND histogram < 0 THEN 'bearish' END"

  /** Exact rolling median over each key's last `windowRows` ordered bucket
    * observations (interpolated/quantile_cont semantics: even frames
    * average the two middle values). Spark has no percentile WINDOW
    * function, so the frame is collected (bounded, `windowRows` elements),
    * sorted, and indexed — all inside codegen'd higher-order functions.
    *
    * Scale shape: one key-hashed ordered window; O(windowRows·log
    * windowRows) per row with a constant bound, nothing key-global. For
    * large windows prefer two-heap streaming medians via a custom
    * aggregator; at the typical 7–90 bucket windows this is faster and
    * exact. */
  def rollingMedian(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      windowRows: Int = 7): DataFrame = {
    require(windowRows >= 1, s"windowRows must be >= 1: $windowRows")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(-(windowRows - 1), 0)
    perBucket
      .withColumn("__s",
        sort_array(collect_list(col(valueCol).cast("double")).over(w)))
      .select(col(keyCol), col(bucketCol), col(valueCol),
        round(expr(
          """CASE WHEN size(__s) % 2 = 1
            |  THEN element_at(__s, CAST(size(__s) div 2 + 1 AS INT))
            |  ELSE (element_at(__s, CAST(size(__s) div 2 AS INT)) +
            |        element_at(__s, CAST(size(__s) div 2 + 1 AS INT))) / 2D
            |END""".stripMargin), 6).as("roll_med"))
  }

  /** Hampel filter — rolling-median/rolling-MAD outlier repair over the
    * same bounded trailing frames as [[rollingMedian]]: a point further
    * than `k`·MAD from the frame median is replaced BY the median (the
    * robust despiking step a sensor/clickstream series gets before
    * modeling; MAD = 0 collapses the rule to "any deviation repairs").
    *
    * ALL arithmetic is integer-exact in fixed point: values enter as
    * integers (cents), medians are computed over DOUBLED values (2× —
    * every midpoint of two even numbers is integral), deviations are
    * doubled once more for the MAD (4× — midpoints of 2×-unit deviations
    * stay integral), and the outlier test compares 4×-unit integers:
    * |x − med| > k·mad ⟺ 2·|2x − med₂| > k·mad₄. The SQL oracle replays
    * every bit (DuckDB's windowed quantile_cont/mad land on the same
    * grid). Output carries med/mad/repaired in their fixed-point units.
    *
    * Same scale shape as [[rollingMedian]]: per-key windows, bounded
    * frames, whole-stage codegen array math — no global state. */
  def hampel(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      windowRows: Int = 7,
      k: Int = 3): DataFrame = {
    require(windowRows >= 1, s"windowRows must be >= 1: $windowRows")
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(-(windowRows - 1), 0)
    def intMedian(arr: String): String =
      s"""CASE WHEN size($arr) % 2 = 1
         |  THEN element_at($arr, CAST(size($arr) div 2 + 1 AS INT))
         |  ELSE (element_at($arr, CAST(size($arr) div 2 AS INT)) +
         |        element_at($arr, CAST(size($arr) div 2 + 1 AS INT))) div 2
         |END""".stripMargin
    perBucket
      .withColumn("__v2", col(valueCol).cast("long") * 2)
      .withColumn("__s", sort_array(collect_list(col("__v2")).over(w)))
      .withColumn("__med2", expr(intMedian("__s")))
      .withColumn("__d4",
        sort_array(expr("transform(__s, e -> 2 * abs(e - __med2))")))
      .withColumn("__mad4", expr(intMedian("__d4")))
      .select(col(keyCol), col(bucketCol), col(valueCol),
        col("__med2").as("med2"), col("__mad4").as("mad4"),
        (lit(2L) * abs(col("__v2") - col("__med2")) >
          lit(k.toLong) * col("__mad4")).as("is_outlier"),
        when(lit(2L) * abs(col("__v2") - col("__med2")) >
            lit(k.toLong) * col("__mad4"), col("__med2"))
          .otherwise(col("__v2")).as("repaired2"))
  }

  /** Two-sided CUSUM change detection — the classic drift-tolerant
    * cumulative-sum recurrence
    * `pos_t = max(0, pos_{t−1} + x_t − target − drift)`,
    * `neg_t = max(0, neg_{t−1} + target − x_t − drift)`, alarm when either
    * side exceeds `threshold`. The recurrence is NOT prefix-sum
    * decomposable (the clamp at 0 breaks associativity), so no window
    * function expresses it; it runs as the engine's sorted-run fold (the
    * sessionizer's execution shape, `Sessionize.scala:20`): repartition by
    * key, sort within partitions by (key, bucket), one streaming
    * `mapPartitions` pass with per-key state reset — O(1) state, no
    * groupByKey materialization, scales to any per-key series length.
    *
    * All arithmetic is BIGINT-exact: callers pass integer-domain value and
    * target columns (scale fixed-point upstream — e.g. doubled cents so a
    * `.5` median stays integral) so the fold and any SQL oracle agree bit
    * for bit with no float drift.
    */
  def cusum(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      targetCol: String,
      drift: Long,
      threshold: Long): DataFrame = {
    require(drift >= 0, s"drift must be >= 0: $drift")
    require(threshold >= 0, s"threshold must be >= 0: $threshold")
    val spark = perBucket.sparkSession
    import spark.implicits._
    val typed = perBucket
      .select(col(keyCol).cast("long"), col(bucketCol).cast("long"),
        col(valueCol).cast("long"), col(targetCol).cast("long"))
      .as[(Long, Long, Long, Long)]
    val folded = typed
      .repartition(spark.sparkContext.defaultParallelism, col(keyCol))
      .sortWithinPartitions(col(keyCol), col(bucketCol))
      .mapPartitions { it =>
        var curKey = 0L
        var init = false
        var pos = 0L
        var neg = 0L
        it.map { case (k, b, x, t) =>
          if (!init || k != curKey) { curKey = k; init = true; pos = 0L; neg = 0L }
          pos = math.max(0L, pos + x - t - drift)
          neg = math.max(0L, neg + t - x - drift)
          (k, b, x, pos, neg, if (pos > threshold || neg > threshold) 1 else 0)
        }
      }
    folded.toDF(keyCol, bucketCol, valueCol, "cusum_pos", "cusum_neg", "alarm")
  }

  /** Holt double (level + linear trend) exponential smoothing — the
    * forecasting recurrence
    * `l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}`, initialized `l₁ = x₁,
    * b₁ = 0`. Like [[cusum]] it is a clamp-free but still order-dependent
    * recurrence with no window-function form, so it runs as the same
    * sorted-run mapPartitions fold.
    *
    * EXACT ARITHMETIC CONTRACT: α = alphaNum/alphaDen and β =
    * betaNum/betaDen are rationals, the state is carried in `scale`-scaled
    * fixed point, and every step divides with TRUNCATING semantics (JVM
    * long `/` here; ANSI/DuckDB integer division truncates toward zero
    * too — floorDiv would NOT match on negative trend values) — so a SQL
    * oracle replays the fold bit for bit, no float drift ever. Output columns are
    * the raw fixed-point BIGINTs (`level_fp`, `trend_fp`, and the
    * one-step-ahead `forecast_fp = level + trend`); divide by `scale`
    * downstream for display.
    */
  def holt(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      alphaNum: Long = 3L, alphaDen: Long = 10L,
      betaNum: Long = 1L, betaDen: Long = 5L,
      scale: Long = 1000000L): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen, s"alpha must be in (0,1): $alphaNum/$alphaDen")
    require(betaNum > 0 && betaNum < betaDen, s"beta must be in (0,1): $betaNum/$betaDen")
    require(scale > 0, s"scale must be > 0: $scale")
    val spark = perBucket.sparkSession
    import spark.implicits._
    val typed = perBucket
      .select(col(keyCol).cast("long"), col(bucketCol).cast("long"),
        col(valueCol).cast("long"))
      .as[(Long, Long, Long)]
    val folded = typed
      .repartition(spark.sparkContext.defaultParallelism, col(keyCol))
      .sortWithinPartitions(col(keyCol), col(bucketCol))
      .mapPartitions { it =>
        var curKey = 0L
        var init = false
        var l = 0L
        var b = 0L
        it.map { case (k, bk, x) =>
          if (!init || k != curKey) {
            curKey = k; init = true; l = x * scale; b = 0L
          } else {
            val lNew =
              (alphaNum * x * scale + (alphaDen - alphaNum) * (l + b)) / alphaDen
            b = (betaNum * (lNew - l) + (betaDen - betaNum) * b) / betaDen
            l = lNew
          }
          (k, bk, x, l, b, l + b)
        }
      }
    folded.toDF(keyCol, bucketCol, valueCol, "level_fp", "trend_fp", "forecast_fp")
  }

  /** Per-key ordinary-least-squares trend line `value ≈ slope·bucket +
    * intercept` — the same exact-BIGINT-moments construction as
    * [[autocorr]] (n, Σx, Σy, Σxy, Σx² summed exactly, two double steps
    * at the end), so SQL engines replay it bit for bit. Keys with a
    * single bucket or zero x-variance yield nulls. `r2` (null under the
    * same condition or zero y-variance) quantifies fit.
    *
    * Plan shape: ONE key-hashed aggregate over the pre-aggregated series;
    * no window, no join. */
  def trendOls(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String): DataFrame = {
    val x = col(bucketCol).cast("long")
    val y = col(valueCol).cast("long")
    perBucket
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col(keyCol), col("n"),
        round(when((col("n") * col("sxx") - col("sx") * col("sx")) > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")),
          6).as("slope"),
        round(when((col("n") * col("sxx") - col("sx") * col("sx")) > 0,
          (col("sy") - col("sx") *
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))) /
            col("n").cast("double")),
          6).as("intercept"),
        round(when((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          // explicit product, not pow(x,2): pow's rounding is not
          // guaranteed identical across libms; x*x is
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
          6).as("r2"))
  }

  /** Deterministic RANSAC robust line fit — [[trendOls]]'s
    * outlier-immune sibling: `nCand` two-point candidate lines are
    * seeded from the md5-ranked points (no RNG — reruns, partitionings,
    * and the SQL oracle all draw the SAME candidates), every point
    * votes inlier/outlier per candidate under an EXACT INTEGER residual
    * test, the candidate with the most inliers wins (ties by candidate
    * index), and the final line is the exact-moment OLS refit over the
    * winner's inliers.
    *
    * The inlier test never divides: |y − ŷ(x)| ≤ ε on the candidate
    * line through (x1,y1),(x2,y2) is cross-multiplied to
    * |(y−y1)·dx − (x−x1)·dy| ≤ ε·|dx| — decimal(38,0) products, so
    * both engines compare exact integers. The refit's moment sums stay
    * BIGINT (caller contract: n·Σxy must fit int64 — cents×quantity
    * scales to ~10¹⁸ rows here) and the two final division chains run
    * in explicit DOUBLE (shared SQL text; double ·/÷ match libm-free
    * across engines).
    *
    * Plan: one TakeOrdered of 2·nCand seed rows, one broadcast of the
    * ≤ nCand candidate lines against the point set (narrow filter +
    * count), a 1-row winner broadcast, one refit aggregate. Nothing
    * quadratic, nothing driver-bound. */
  def ransacLine(
      df: DataFrame, idCol: String, xCol: String, yCol: String,
      nCand: Int = 16, epsilon: Long = 1000000L): DataFrame = {
    require(nCand >= 1, s"nCand must be >= 1: $nCand")
    require(epsilon >= 0, s"epsilon must be >= 0: $epsilon")
    import org.apache.spark.sql.expressions.Window
    val pts = graft.Materialize(df.select(
      col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y")))
    val sel = graft.Materialize(pts
      .withColumn("__h", graft.functions.TextFunctions.tokenHash60(
        concat(lit("ransac:"), col("id").cast("string"))))
      .orderBy(col("__h"), col("id")).limit(2 * nCand)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("__h"), col("id"))).cast("long")))
    val cand = sel.as("a").join(sel.as("b"),
        col("b.rk") === col("a.rk") + 1L &&
          pmod(col("a.rk"), lit(2L)) === 1L &&
          col("b.x") =!= col("a.x"))
      .select(expr("(a.rk + 1) div 2").as("cand"),
        col("a.x").as("x1"), col("a.y").as("y1"),
        col("b.x").as("x2"), col("b.y").as("y2"))
    val inl = pts.crossJoin(broadcast(cand))
      .filter(expr(ransacInlierSql(epsilon)))
    val win = broadcast(graft.Materialize(
      inl.groupBy(col("cand"), col("x1"), col("y1"), col("x2"), col("y2"))
        .agg(count(lit(1)).cast("long").as("n_inliers"))
        .orderBy(col("n_inliers").desc, col("cand")).limit(1)))
    val tot = broadcast(pts.agg(count(lit(1)).cast("long").as("n_total")))
    pts.crossJoin(win)
      .filter(expr(ransacInlierSql(epsilon)))
      .groupBy(col("cand"), col("x1"), col("y1"), col("x2"), col("y2"),
        col("n_inliers"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("y")).cast("long").as("sy"),
        sum(col("x") * col("y")).cast("long").as("sxy"),
        sum(col("x") * col("x")).cast("long").as("sxx"))
      .crossJoin(tot)
      .select(col("cand"), col("x1"), col("y1"), col("x2"), col("y2"),
        col("n_inliers"), col("n_total"),
        expr("round(CAST(n_inliers AS DOUBLE) / n_total, 6)")
          .as("inlier_frac"),
        expr(ransacSlopeSql).as("slope"),
        expr(ransacInterceptSql).as("intercept"))
  }

  /** Exact cross-multiplied inlier predicate over
    * (x, y, x1, y1, x2, y2) — shared with the oracle. */
  def ransacInlierSql(eps: Long): String =
    "abs(CAST(y - y1 AS DECIMAL(38,0)) * (x2 - x1) - " +
      "CAST(x - x1 AS DECIMAL(38,0)) * (y2 - y1)) <= " +
      s"CAST($eps AS DECIMAL(38,0)) * abs(x2 - x1)"

  private val ransacDetSql: String =
    "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"

  private val ransacSlopeRawSql: String =
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
      s"CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / $ransacDetSql)"

  /** OLS slope/intercept over exact BIGINT moments (n, sx, sy, sxy,
    * sxx), NULL on zero x-variance — shared with the oracle. */
  val ransacSlopeSql: String =
    s"CASE WHEN $ransacDetSql > 0 THEN round($ransacSlopeRawSql, 6) END"

  val ransacInterceptSql: String =
    s"CASE WHEN $ransacDetSql > 0 THEN round((CAST(sy AS DOUBLE) - " +
      s"CAST(sx AS DOUBLE) * $ransacSlopeRawSql) / CAST(n AS DOUBLE), 6) END"

  /** Per-key autocorrelation at `lag` over the ordered bucket series —
    * Pearson correlation of (vₜ, vₜ₋lag) on CONSECUTIVE-ROW pairs. The
    * correlation is assembled from exact BIGINT moment sums (n, Σx, Σy,
    * Σxy, Σx², Σy²) with ONE double step at the end —
    * (nΣxy − ΣxΣy) / √((nΣx² − (Σx)²)(nΣy² − (Σy)²)) — so any SQL engine
    * replays it exactly (no Welford-vs-naive float divergence); keys with
    * zero variance on either side yield null. Input values must be
    * integer-domain (fixed-point upstream, same contract as [[cusum]]).
    *
    * Plan shape: one key-hashed window (lag) + one key-hashed aggregate
    * riding the same exchange. */
  def autocorr(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      lag: Int = 1): DataFrame = {
    require(lag >= 1, s"lag must be >= 1: $lag")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val paired = perBucket
      .select(col(keyCol), col(bucketCol), col(valueCol).cast("long").as("__y"))
      .withColumn("__x", org.apache.spark.sql.functions.lag(col("__y"), lag).over(w))
      .filter(col("__x").isNotNull)
    paired
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
      .select(col(keyCol), col("n"),
        round(
          when((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
              (col("n") * col("syy") - col("sy") * col("sy")) > 0,
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
          6).as("acf"))
  }

  /** Ljung–Box portmanteau test — "is this series white noise at all?":
    * Q = n(n+2)·Σ_{k≤m} ρ_k²/(n−k) over the first m autocorrelations
    * (the [[autocorr]] Pearson-pairs kernel per lag, a documented
    * convention choice), flagged against χ²_m(0.95). The pre-modeling
    * gate before fitting any AR/seasonal structure. Per-lag aggregates
    * run over the bounded per-key series and join key-wise; the Q
    * arithmetic over the ROUNDED ρ columns is shared SQL. A constant
    * series yields NULL ρ and a NULL Q (both engines). */
  def ljungBox(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, maxLag: Int = 5): DataFrame = {
    require(chi2Crit095.contains(maxLag),
      s"maxLag must be in [1, 20] (supported χ² table range): $maxLag")
    val base = perBucket.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_series"))
    val joined = (1 to maxLag).foldLeft(base) { (acc, k) =>
      acc.join(
        autocorr(perBucket, keyCol, bucketCol, valueCol, k)
          .select(col(keyCol), col("acf").as(s"rho_$k")),
        Seq(keyCol))
    }
    joined
      .withColumn("lb_stat", expr(lbSql(maxLag)))
      .withColumn("significant",
        expr(s"${lbSql(maxLag)} > ${chi2Crit095(maxLag)}"))
  }

  /** χ²_m(0.95) critical values keyed by df = maxLag — Q at m lags is
    * flagged against the m-df quantile, NOT a fixed one (m=1 → 3.84,
    * m=10 → 18.31). m=5 stays the 11.0705 literal shared with the
    * oracle SQL. */
  val chi2Crit095: Map[Int, Double] = Map(
    1 -> 3.841459, 2 -> 5.991465, 3 -> 7.814728, 4 -> 9.487729,
    5 -> 11.0705, 6 -> 12.591587, 7 -> 14.067140, 8 -> 15.507313,
    9 -> 16.918978, 10 -> 18.307038, 11 -> 19.675138, 12 -> 21.026070,
    13 -> 22.362032, 14 -> 23.684791, 15 -> 24.995790, 16 -> 26.296228,
    17 -> 27.587112, 18 -> 28.869299, 19 -> 30.143527, 20 -> 31.410433)

  /** Q over the per-lag ρ columns, shared with the oracle. 11.0705 =
    * χ²₅(0.95), matching the default maxLag. */
  def lbSql(m: Int): String =
    "round(CAST(n_series AS DOUBLE) * (n_series + 2) * (" +
      (1 to m).map(k => s"rho_$k * rho_$k / (n_series - $k)")
        .mkString(" + ") + "), 6)"

  /** Day-of-week seasonal decomposition of a per-(key, bucket) series:
    * seasonal = the key's mean value at this bucket's `bucket % period`
    * phase (from exact BIGINT sums, one double division), residual =
    * value − seasonal. The classical-decomposition seasonal profile for
    * integer-bucketed series — weekly traffic shape, weekday/weekend
    * split — without a float rolling mean (order-dependent at scale).
    *
    * Plan: one tiny (key, phase) aggregate (≤ key·period rows) broadcast
    * back onto the unshuffled series — same broadcast-stats-back shape as
    * [[Normalize.winsorize]]. Buckets must be non-negative (day numbers):
    * `%` truncates toward zero in both engines, so the phases agree. */
  def seasonalByPhase(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      period: Int = 7): DataFrame = {
    require(period > 0, s"period must be positive: $period")
    val phase = (col(bucketCol).cast("long") % period).as("__phase")
    val prof = perBucket
      .groupBy(col(keyCol), phase)
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col(valueCol).cast("long")).cast("long").as("__sv"))
    val seasonal = col("__sv").cast("double") / col("__n")
    perBucket
      .withColumn("__phase", col(bucketCol).cast("long") % period)
      .join(broadcast(prof), Seq(keyCol, "__phase"))
      .select(col(keyCol), col(bucketCol), col(valueCol),
        round(seasonal, 6).as("seasonal"),
        round(col(valueCol).cast("double") - seasonal, 6).as("resid"))
  }

  /** OHLC downsampling — the resample step that turns a raw event stream
    * into fixed-width bars (the warehouse representation of any
    * price/metric series): per (key, bucket), open = first value, close =
    * last value (both under the explicit (ts, tie) total order — bare
    * first()/arg_min on a tied timestamp is partitioning-dependent),
    * high/low/volume/count as plain aggregates. Two windows + one
    * aggregate all share the (key, bucket) partitioning, so the whole bar
    * build is ONE exchange. */
  def ohlcBars(
      df: DataFrame, keyCol: String, tsMsCol: String, tieCol: String,
      valCol: String, barMs: Long): DataFrame = {
    require(barMs > 0, s"barMs must be positive: $barMs")
    import org.apache.spark.sql.expressions.Window
    val bar = expr(s"($tsMsCol DIV ${barMs}L) * ${barMs}L")
    val tagged = df.withColumn("bar_start_ms", bar)
    val asc = Window.partitionBy(col(keyCol), col("bar_start_ms"))
      .orderBy(col(tsMsCol), col(tieCol))
    val desc = Window.partitionBy(col(keyCol), col("bar_start_ms"))
      .orderBy(col(tsMsCol).desc, col(tieCol).desc)
    tagged
      .withColumn("__ra", row_number().over(asc))
      .withColumn("__rd", row_number().over(desc))
      .groupBy(col(keyCol), col("bar_start_ms"))
      .agg(
        max(when(col("__ra") === 1, col(valCol))).as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max(when(col("__rd") === 1, col(valCol))).as("close"),
        count(lit(1)).cast("long").as("n"),
        sum(col(valCol)).cast("long").as("volume"))
  }

  /** Time-weighted average (TWAP) — the correct mean for irregularly
    * sampled series (a value that held for 6 hours must weigh 360× one
    * that held a minute): each observation is weighted by its holding
    * time `lead(ts) − ts` under the explicit (ts, tie) total order; the
    * last observation of a bucket has no successor and drops (its holding
    * time is unknown — the standard right-open convention). Weighted sums
    * are exact integers; one double division at the end.
    *
    * Buckets are (key, bucket) so the lead() window is calendar-bounded —
    * TWAP over a raw per-key stream would serialize each key through one
    * window task; the bucket column keeps partitions bounded at any
    * volume (holding times never cross a bucket edge by construction). */
  def twap(
      df: DataFrame, keyCol: String, bucketCol: String, tsMsCol: String,
      tieCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol), col(bucketCol))
      .orderBy(col(tsMsCol), col(tieCol))
    df.withColumn("__next", lead(col(tsMsCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .withColumn("__w", col("__next") - col(tsMsCol))
      .groupBy(col(keyCol), col(bucketCol))
      .agg(count(lit(1)).cast("long").as("n_holds"),
        sum(col("__w")).cast("long").as("total_ms"),
        sum(col("__w") * col(valCol)).cast("long").as("wsum"))
      .withColumn("twap",
        when(col("total_ms") > 0,
          round(col("wsum").cast("double") / col("total_ms"), 6)))
  }

  /** Single-changepoint detection by binary segmentation — the step CUSUM
    * alarms on ([[cusum]]) but LOCATES exactly: for every candidate split
    * t, the between-segment sum of squares nL·nR/n·(μL−μR)² from the
    * per-group prefix sums; the argmax is the changepoint, tie-broken on
    * the earlier split. Recursing on the two halves yields full binary
    * segmentation; one step is the operator (the recursion is a driver
    * loop over tiny per-group grids). All candidate scores come from ONE
    * prefix-sum window over the bounded per-group series; the score
    * arithmetic is shared SQL. */
  def changepoint(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col("x"))
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = df.select(col(groupCol), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .withColumn("sl", sum(col("y")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nl", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("s", sum(col("y")).over(wAll).cast("long"))
      .filter(col("nl") < col("n")) // split AFTER x; last point can't split
      .withColumn("score_micro", expr(binsegScoreSql))
    val pick = Window.partitionBy(col(groupCol))
      .orderBy(col("score_micro").desc, col("x"))
    ranked.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col(groupCol), col("x").as("split_after_x"), col("n"),
        col("score_micro"),
        expr("round(CAST(sl AS DOUBLE) / nl, 6)").as("mean_left"),
        expr("round(CAST(s - sl AS DOUBLE) / (n - nl), 6)").as("mean_right"))
  }

  /** Between-segment SS in micro units over the prefix row, shared SQL. */
  val binsegScoreSql: String =
    "CAST(ROUND(CAST(nl AS DOUBLE) * (n - nl) / n * " +
      "(CAST(sl AS DOUBLE)/nl - CAST(s - sl AS DOUBLE)/(n - nl)) * " +
      "(CAST(sl AS DOUBLE)/nl - CAST(s - sl AS DOUBLE)/(n - nl)), 0) AS BIGINT)"

  /** Mann–Kendall trend test — the significance companion to
    * [[theilSen]] (Sen gives the slope, MK says whether a monotone trend
    * exists at all, with NO distributional assumption): S = Σ_{i<j}
    * sign(y_j − y_i) as an exact integer, the tie-corrected variance
    * n(n−1)(2n+5)/18 − Σt(t−1)(2t+5)/18, and the continuity-corrected
    * z statistic as shared SQL. Pairs explode only within each group's
    * bounded grid (the Theil–Sen regime); the tie table aggregates
    * map-side. */
  def mannKendall(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("g"),
      col(xCol).cast("long").as("x1"), col(yCol).cast("long").as("y1"))
    val b = df.select(col(groupCol).as("g"),
      col(xCol).cast("long").as("x2"), col(yCol).cast("long").as("y2"))
    val s = a.join(b, Seq("g")).filter(col("x1") < col("x2"))
      .groupBy(col("g"))
      .agg(sum(signum(col("y2") - col("y1")).cast("long")).cast("long")
        .as("s_stat"))
    val ties = df.groupBy(col(groupCol).as("g"), col(yCol).as("__y"))
      .agg(count(lit(1)).cast("long").as("t"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("long").as("n_distinct_y"),
        sum(col("t")).cast("long").as("n"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).cast("long")
          .as("tie_term"))
    s.join(ties, Seq("g"))
      .withColumnRenamed("g", groupCol)
      .withColumn("var_s", expr(mkVarSql))
      .withColumn("z", expr(mkZSql))
      .withColumn("significant", expr(s"abs($mkZSql) > 1.959964"))
  }

  /** Tie-corrected Var(S) and the continuity-corrected z, shared SQL. */
  val mkVarSql: String =
    "round((CAST(n AS DOUBLE)*(n-1)*(2*n+5) - tie_term) / 18.0, 6)"
  val mkZSql: String = {
    val v = "((CAST(n AS DOUBLE)*(n-1)*(2*n+5) - tie_term) / 18.0)"
    s"CASE WHEN $v <= 0 THEN 0.0 WHEN s_stat > 0 " +
      s"THEN round((s_stat - 1) / sqrt($v), 6) WHEN s_stat < 0 " +
      s"THEN round((s_stat + 1) / sqrt($v), 6) ELSE 0.0 END"
  }

  /** Theil–Sen robust trend: per group, the LOWER MEDIAN of all pairwise
    * slopes (y₂−y₁)/(x₂−x₁) — breakdown point 29% vs OLS's 0% (one
    * corrupted day drags [[trendOls]] arbitrarily; it moves one of
    * C(n,2) slopes here). Slopes are kept in micro-units
    * (round((Δy·10⁶)/Δx) as BIGINT) so the median selection is an exact
    * integer compare the SQL oracle replays bit-for-bit; the lower median
    * (rank ⌈n/2⌉) avoids averaging two slopes.
    *
    * `xCol` must be distinct within each group (aggregate to a grid
    * first — the callers feed daily totals); pairs explode as C(n,2) PER
    * GROUP, so this is for bounded series per key (a year of days =
    * 66k pairs), not raw event streams — the standard Theil–Sen regime.
    * All windows are group-partitioned; nothing global ever sorts. */
  def theilSen(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = df.select(col(groupCol).as("g"),
      col(xCol).cast("long").as("x1"), col(yCol).cast("long").as("y1"))
    val bb = df.select(col(groupCol).as("g"),
      col(xCol).cast("long").as("x2"), col(yCol).cast("long").as("y2"))
    val pairs = a.join(bb, Seq("g")).filter(col("x1") < col("x2"))
      .withColumn("slope_micro",
        round(((col("y2") - col("y1")) * lit(1000000L)).cast("double") /
          (col("x2") - col("x1")).cast("double"), 0).cast("long"))
    val wOrd = Window.partitionBy(col("g"))
      .orderBy(col("slope_micro"), col("x1"), col("x2"))
    val wAll = Window.partitionBy(col("g"))
    pairs
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n_pairs", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(n_pairs + 1) DIV 2"))
      .select(col("g").as(groupCol), col("n_pairs").cast("long").as("n_pairs"),
        col("slope_micro").as("sen_slope_micro"))
  }

  /** Wald–Wolfowitz runs test on the per-key series of SUCCESSIVE-change
    * signs — "do ups and downs alternate like noise, or clump like
    * trend/regime structure?": the sign sequence s_i = sign(v_i − v_{i−1})
    * (ties dropped, the standard convention) is reduced to three exact
    * integers — up-count, down-count, run count — and z compares the run
    * count to its null mean 2u·d/n + 1. Complements [[mannKendall]]
    * (monotone trend) with a CLUMPINESS alarm that also fires on
    * oscillation (z ≫ 0: too many runs). Per-key windows only; the z
    * arithmetic over the count row is one shared-SQL double chain. */
  def runsTest(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val signs = perBucket
      .withColumn("__d",
        col(valueCol).cast("long") - lag(col(valueCol).cast("long"), 1).over(wk))
      .filter(col("__d").isNotNull && col("__d") =!= 0L)
      .withColumn("__s", signum(col("__d")).cast("long"))
    signs
      .withColumn("__new_run",
        when(lag(col("__s"), 1).over(wk).isNull ||
          lag(col("__s"), 1).over(wk) =!= col("__s"), 1L).otherwise(0L))
      .groupBy(col(keyCol))
      .agg(
        sum(when(col("__s") === 1L, 1L).otherwise(0L)).cast("long").as("n_up"),
        sum(when(col("__s") === -1L, 1L).otherwise(0L)).cast("long").as("n_down"),
        sum(col("__new_run")).cast("long").as("n_runs"))
      .withColumn("z", expr(runsZSql))
  }

  /** Durbin–Watson statistic per key — first-order autocorrelation of a
    * series' deviations from its own mean: d = Σ(e_i − e_{i−1})² / Σe_i²
    * ∈ [0, 4], d ≈ 2 for white noise, → 0 under positive
    * autocorrelation (the regression-residual diagnostic, applied to
    * mean-detrended per-key series). Exactness: e_i scaled by n —
    * ñ_i = n·v_i − S is an exact integer, and d is a ratio of
    * quadratics so the scaling cancels; the squared sums run in
    * DECIMAL(38,0) (ñ² can pass 2⁶³ on long daily-total series), and d
    * is one shared-SQL double division. Two passes over the per-key
    * series (mean join-back + lag window), both key-bounded. */
  def durbinWatson(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val stats = perBucket.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col(valueCol).cast("long")).cast("long").as("__s"))
    perBucket
      .join(broadcast(stats), Seq(keyCol))
      .withColumn("__e",
        col("__n") * col(valueCol).cast("long") - col("__s"))
      .withColumn("__d", col("__e") - lag(col("__e"), 1).over(wk))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n"),
        // square in DECIMAL — ñ² itself passes 2⁶³ once n·v > 3·10⁹
        // (hit by the 100× smoke's daily totals)
        sum(col("__e").cast("decimal(19,0)") *
          col("__e").cast("decimal(19,0)")).as("sse"),
        sum(col("__d").cast("decimal(19,0)") *
          col("__d").cast("decimal(19,0)")).as("ssd"))
      .withColumn("dw", expr(dwSql))
      // exposed DECIMAL → STRING (r10 decimal contract; d consumed the
      // exact decimals already)
      .withColumn("sse", col("sse").cast("string"))
      .withColumn("ssd", col("ssd").cast("string"))
  }

  /** d over the quadratic sums, shared with the oracle; NULL for a
    * constant series (sse = 0) or a 1-point series. */
  val dwSql: String =
    "CASE WHEN n > 1 AND sse > 0 THEN " +
      "round(CAST(ssd AS DOUBLE) / CAST(sse AS DOUBLE), 6) END"

  /** z for the run count vs its null distribution, shared with the
    * oracle; NULL when either sign is absent or the variance degenerates.
    * Products stay exact BIGINT and cast to DOUBLE once: a `2.0` literal
    * would be DECIMAL in both parsers, and Spark then runs the whole
    * chain in decimal (its own rounding) while DuckDB promotes to double
    * at the first division — a 1-ulp divergence the 6-dp round exposes. */
  val runsZSql: String =
    "CASE WHEN n_up > 0 AND n_down > 0 AND n_up + n_down > 1 AND " +
      "2*n_up*n_down*(2*n_up*n_down - (n_up+n_down)) > 0 THEN " +
      "round((CAST(n_runs AS DOUBLE) - " +
      "(CAST(2*n_up*n_down AS DOUBLE)/(n_up+n_down) + 1)) / " +
      "sqrt(CAST(2*n_up*n_down*(2*n_up*n_down - (n_up+n_down)) AS DOUBLE) / " +
      "(CAST(n_up+n_down AS DOUBLE)*(n_up+n_down)*(n_up+n_down-1))), 6) END"

  /** Partial autocorrelation (PACF) at lags 1..5 per key — the AR-order
    * diagnostic ACF can't give: pacf_k is the correlation at lag k AFTER
    * removing what lags 1..k−1 already explain (an AR(p) series cuts off
    * after lag p in PACF, tails off in ACF). Computed by the
    * Durbin–Levinson recursion over the ROUNDED [[autocorr]] ρ columns
    * (identical in both engines), unrolled as the shared [[pacfSteps]]
    * chain — pure ·/−// double arithmetic, no libm, so engine-exact;
    * degenerate denominators (|den| ≤ 1e-12, e.g. ρ₁ = ±1) yield NULL
    * from that lag on. Plan: five lag-window aggregates joined key-wise
    * (the [[ljungBox]] frame) + a width-constant expression chain. */
  def pacf(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    val base = perBucket.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_series"))
    val joined = (1 to 5).foldLeft(base) { (acc, k) =>
      acc.join(
        autocorr(perBucket, keyCol, bucketCol, valueCol, k)
          .select(col(keyCol), col("acf").as(s"rho_$k")),
        Seq(keyCol))
    }
    val stepped = pacfSteps.foldLeft(joined) { case (d, (name, sql)) =>
      d.withColumn(name, expr(sql))
    }
    stepped.select(col(keyCol), col("n_series"),
      round(col("phi11"), 6).as("pacf_1"),
      round(col("phi22"), 6).as("pacf_2"),
      round(col("phi33"), 6).as("pacf_3"),
      round(col("phi44"), 6).as("pacf_4"),
      round(col("phi55"), 6).as("pacf_5"))
  }

  /** Durbin–Levinson steps over (rho_1..rho_5): each entry is one
    * column derived from the previous ones — the oracle replays them as
    * one CTE per step (φ_{k,j} = φ_{k−1,j} − φ_{kk}·φ_{k−1,k−j}). */
  val pacfSteps: Seq[(String, String)] = {
    def lvl(k: Int, num: String, den: String) =
      s"CASE WHEN abs(1.0 - ($den)) > 1e-12 THEN " +
        s"(rho_$k - ($num)) / (1.0 - ($den)) END"
    Seq(
      "phi11" -> "CAST(rho_1 AS DOUBLE)",
      "phi22" -> lvl(2, "phi11*rho_1", "phi11*rho_1"),
      "phi21" -> "phi11 - phi22*phi11",
      "phi33" -> lvl(3, "phi21*rho_2 + phi22*rho_1",
        "phi21*rho_1 + phi22*rho_2"),
      "phi31" -> "phi21 - phi33*phi22",
      "phi32" -> "phi22 - phi33*phi21",
      "phi44" -> lvl(4, "phi31*rho_3 + phi32*rho_2 + phi33*rho_1",
        "phi31*rho_1 + phi32*rho_2 + phi33*rho_3"),
      "phi41" -> "phi31 - phi44*phi33",
      "phi42" -> "phi32 - phi44*phi32",
      "phi43" -> "phi33 - phi44*phi31",
      "phi55" -> lvl(5,
        "phi41*rho_4 + phi42*rho_3 + phi43*rho_2 + phi44*rho_1",
        "phi41*rho_1 + phi42*rho_2 + phi43*rho_3 + phi44*rho_4"))
  }

  /** Fano factor / burstiness per key over a DENSE bucket grid — "is
    * traffic Poisson, or does it arrive in bursts?": var/mean of
    * per-bucket event counts INCLUDING the empty buckets between min
    * and max (dropping them is the classic bias — a source active one
    * hour a day looks calm without its 23 zero buckets). The zeros
    * enter through arithmetic, not materialization: n_buckets =
    * max−min+1 and Σc² over present buckets are all that's needed, so
    * the plan is one (key,bucket) count + one key aggregate — no spine
    * join. Fano F = σ²/μ (1 = Poisson, >1 overdispersed); burstiness
    * B = (σ−μ)/(σ+μ) ∈ (−1,1), 0 = Poisson. Exact integer moments,
    * shared-SQL finish. */
  def fanoFactor(
      df: DataFrame, keyCol: String, bucketCol: String): DataFrame =
    df.select(col(keyCol).as("__k"), col(bucketCol).cast("long").as("__b"))
      .groupBy(col("__k"), col("__b"))
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy(col("__k"))
      .agg((max(col("__b")) - min(col("__b")) + 1L).cast("long")
          .as("n_buckets"),
        sum(col("c")).cast("long").as("n_events"),
        sum(col("c") * col("c")).cast("long").as("scc"))
      .withColumn("fano", expr(fanoSql))
      .withColumn("burstiness", expr(burstinessSql))
      .select(col("__k").as(keyCol), col("n_buckets"), col("n_events"),
        col("scc"), col("fano"), col("burstiness"))

  /** σ²/μ over (n_buckets, n_events, scc) with the dense-grid zeros in
    * the algebra: μ = N/B, σ² = Σc²/B − μ². Shared with the oracle. */
  val fanoSql: String =
    "CASE WHEN n_events > 0 THEN " +
      "round((CAST(scc AS DOUBLE) / n_buckets - " +
      "(CAST(n_events AS DOUBLE) / n_buckets) * " +
      "(CAST(n_events AS DOUBLE) / n_buckets)) / " +
      "(CAST(n_events AS DOUBLE) / n_buckets), 6) END"

  /** (σ−μ)/(σ+μ) over the same row; NULL when both vanish. */
  val burstinessSql: String =
    "CASE WHEN n_events > 0 THEN " +
      "round((sqrt(CAST(scc AS DOUBLE) / n_buckets - " +
      "(CAST(n_events AS DOUBLE) / n_buckets) * " +
      "(CAST(n_events AS DOUBLE) / n_buckets)) - " +
      "CAST(n_events AS DOUBLE) / n_buckets) / " +
      "(sqrt(CAST(scc AS DOUBLE) / n_buckets - " +
      "(CAST(n_events AS DOUBLE) / n_buckets) * " +
      "(CAST(n_events AS DOUBLE) / n_buckets)) + " +
      "CAST(n_events AS DOUBLE) / n_buckets), 6) END"

  /** Van den Broek score test for ZERO INFLATION per key — when
    * [[fanoFactor]] says "overdispersed", this asks the sharper
    * question: is the excess specifically a spike at ZERO (a mixture of
    * "inactive" and "active" states — dead hours, dark sensors) rather
    * than general spread ([[negbinFit]]'s answer)? Over the same dense
    * bucket grid: n₀ observed zeros (= B − #nonzero buckets — zeros
    * enter through the algebra, never materialized), λ̂ = N/B,
    * p₀ = e^{−λ̂}, and the score statistic
    * (n₀ − B·p₀)² / (B·p₀(1−p₀) − B·λ̂·p₀²) referred to χ²₁. exp
    * matches libm-for-libm; everything upstream is exact integers. One
    * grid aggregate per key. */
  def zeroInflation(
      df: DataFrame, keyCol: String, bucketCol: String): DataFrame =
    df.select(col(keyCol).as("__k"), col(bucketCol).cast("long").as("__b"))
      .groupBy(col("__k"), col("__b"))
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy(col("__k"))
      .agg((max(col("__b")) - min(col("__b")) + 1L).cast("long")
          .as("n_buckets"),
        count(lit(1)).cast("long").as("n_nonzero"),
        sum(col("c")).cast("long").as("n_events"))
      .withColumn("n_zero",
        (col("n_buckets") - col("n_nonzero")).cast("long"))
      .withColumn("score_chi2", expr(ziScoreSql))
      .withColumn("significant", expr(s"$ziScoreSql > 3.841459"))
      .select(col("__k").as(keyCol), col("n_buckets"), col("n_zero"),
        col("n_events"), col("score_chi2"), col("significant"))

  /** Score χ²₁ over (n_buckets, n_zero, n_events): p₀ = e^{−N/B},
    * (n₀ − B·p₀)²/(B·p₀·(1−p₀) − B·λ̂·p₀²); NULL when the denominator
    * degenerates (λ̂ = 0 or numerically tiny B). Shared with the
    * oracle. */
  val ziScoreSql: String = {
    val lam = "(CAST(n_events AS DOUBLE) / n_buckets)"
    val p0 = s"exp(-$lam)"
    val den = s"(n_buckets * $p0 * (1.0 - $p0) - n_buckets * $lam * $p0 * $p0)"
    s"CASE WHEN n_events > 0 AND $den > 0 THEN " +
      s"round((n_zero - n_buckets * $p0) * (n_zero - n_buckets * $p0) " +
      s"/ $den, 6) END"
  }

  /** Negative-binomial fit per key by method of moments over the SAME
    * dense bucket grid as [[fanoFactor]] — when Fano says
    * "overdispersed", this says BY HOW MUCH, as a distribution you can
    * simulate/threshold against: r = μ²/(σ²−μ), p = μ/σ² (σ² > μ
    * required; NULL for under/equi-dispersed keys — use plain Poisson
    * there). Same exact integer moments, one extra shared-SQL chain. */
  def negbinFit(
      df: DataFrame, keyCol: String, bucketCol: String): DataFrame =
    df.select(col(keyCol).as("__k"), col(bucketCol).cast("long").as("__b"))
      .groupBy(col("__k"), col("__b"))
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy(col("__k"))
      .agg((max(col("__b")) - min(col("__b")) + 1L).cast("long")
          .as("n_buckets"),
        sum(col("c")).cast("long").as("n_events"),
        sum(col("c") * col("c")).cast("long").as("scc"))
      .withColumn("mean_rate", expr(
        "round(CAST(n_events AS DOUBLE) / n_buckets, 6)"))
      .withColumn("nb_r", expr(negbinRSql))
      .withColumn("nb_p", expr(negbinPSql))
      .select(col("__k").as(keyCol), col("n_buckets"), col("n_events"),
        col("scc"), col("mean_rate"), col("nb_r"), col("nb_p"))

  private val nbMuSql = "(CAST(n_events AS DOUBLE) / n_buckets)"
  private val nbVarSql =
    s"(CAST(scc AS DOUBLE) / n_buckets - $nbMuSql * $nbMuSql)"

  /** r = μ²/(σ²−μ) over the dense-grid moment row; NULL unless
    * overdispersed. Shared with the oracle. */
  val negbinRSql: String =
    s"CASE WHEN n_events > 0 AND $nbVarSql > $nbMuSql THEN " +
      s"round($nbMuSql * $nbMuSql / ($nbVarSql - $nbMuSql), 6) END"

  /** p = μ/σ² under the same guard. Shared with the oracle. */
  val negbinPSql: String =
    s"CASE WHEN n_events > 0 AND $nbVarSql > $nbMuSql THEN " +
      s"round($nbMuSql / $nbVarSql, 6) END"

  /** Hurst exponent per key via rescaled-range (R/S) analysis over
    * dyadic blocks {8,16,32} — the long-memory diagnostic: H ≈ 0.5
    * random walk, H → 1 trending/persistent, H → 0 mean-reverting.
    * Each full m-block's R/S = (max−min of cumulative deviations) / σ
    * is computed from EXACT integers (z·m = m·cumsum − t·blocksum stays
    * a BIGINT; σ off the exact moment row), micro-quantized per block
    * and averaged; with three log2-equally-spaced sizes the OLS slope
    * collapses to H = (log2(R/S₃₂) − log2(R/S₈))/2 over the ROUNDED
    * means. Keys need ≥ 32 points (inner-joined away otherwise).
    * Plan: one index prefix-sum + three bounded block-window passes
    * (m-row partitions) + per-key aggregates. */
  def hurst(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = perBucket.select(col(keyCol).as("__k"),
      col(bucketCol).cast("long").as("__t"),
      col(valueCol).cast("long").as("__x"))
      .withColumn("one", lit(1L))
    val idx = Eval.rangedCumsumOrdered(u, Seq("__k"), Seq("__t"), Seq("one"))
      .select(col("__k"), col("__t"), col("__x"), col("cum_one").as("ti"))
      .materialize // read by the three block passes
    val perM = hurstBlockSizes.map { m =>
      val wRun = Window.partitionBy(col("__k"), col("block"))
        .orderBy(col("__t"))
      val wBlk = Window.partitionBy(col("__k"), col("block"))
      idx
        .withColumn("block", expr(s"(ti - 1) div $m"))
        .withColumn("cumx", sum(col("__x")).over(
          wRun.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tb", row_number().over(wRun).cast("long"))
        .withColumn("sxb", sum(col("__x")).over(wBlk))
        .withColumn("zm",
          lit(m.toLong) * col("cumx") - col("tb") * col("sxb"))
        .groupBy(col("__k"), col("block"))
        .agg(count(lit(1)).cast("long").as("cnt"),
          max(col("zm")).cast("long").as("zmax"),
          min(col("zm")).cast("long").as("zmin"),
          max(col("sxb")).cast("long").as("sx"),
          sum(col("__x") * col("__x")).cast("long").as("sxx"))
        .filter(col("cnt") === lit(m.toLong))
        .withColumn("rs_micro", expr(hurstRsMicroSql(m)))
        .filter(col("rs_micro").isNotNull)
        .groupBy(col("__k"))
        .agg(count(lit(1)).cast("long").as(s"nb_$m"),
          sum(col("rs_micro")).cast("long").as(s"rsm_$m"))
    }
    perM.reduce((a, b) => a.join(b, Seq("__k")))
      .select(col("__k").as(keyCol) +:
        hurstBlockSizes.map(m => col(s"nb_$m")) ++:
        hurstBlockSizes.map(m => expr(hurstMeanRsSql(m)).as(s"rs_$m")): _*)
      .withColumn("hurst", expr(hurstSql))
  }

  /** Dyadic R/S block sizes — three log2-equally-spaced points. */
  val hurstBlockSizes: Seq[Int] = Seq(8, 16, 32)

  /** Per-block R/S in micro units over (zmax, zmin, sx, sxx) for block
    * size m — R = (zmax−zmin)/m, σ = √((Σx² − (Σx)²/m)/m); NULL when
    * the block is constant. Shared with the oracle. */
  def hurstRsMicroSql(m: Int): String = {
    val s2 = s"((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * " +
      s"(CAST(sx AS DOUBLE) / $m)) / $m)"
    s"CASE WHEN $s2 > 0 THEN " +
      s"CAST(ROUND(CAST(zmax - zmin AS DOUBLE) / ($m * sqrt($s2)) * " +
      "1000000, 0) AS BIGINT) END"
  }

  /** Mean block R/S at size m off the exact micro sum. */
  def hurstMeanRsSql(m: Int): String =
    s"round(CAST(rsm_$m AS DOUBLE) / nb_$m / 1000000, 6)"

  /** H = (log2(R/S₃₂) − log2(R/S₈)) / 2 over the ROUNDED means (the
    * 3-point OLS slope on a dyadic grid), shared with the oracle. */
  val hurstSql: String =
    "CASE WHEN rs_8 > 0 AND rs_32 > 0 THEN " +
      "round((log2(rs_32) - log2(rs_8)) / 2, 6) END"

  /** Rolling correlation of two series per key over a trailing
    * `window`-bucket frame — "are these metrics STILL moving
    * together?": the all-history Pearson hides regime changes this
    * surfaces. Every frame's moment sums are window SUMs of exact
    * integers (no incremental float state to drift), the per-row
    * correlation is the shared [[autocorr]]-style assembly; frames
    * shorter than `minPeriods` or with a flat side yield NULL. One
    * key-hashed exchange drives all six window sums. */
  def rollingCorr(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      xCol: String, yCol: String, window: Int = 14,
      minPeriods: Int = 5): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    require(minPeriods >= 2 && minPeriods <= window,
      s"minPeriods in [2, window]: $minPeriods")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(-(window - 1).toLong, 0L)
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    perBucket
      .select(col(keyCol), col(bucketCol), x.as("__x"), y.as("__y"))
      .withColumn("n", count(lit(1)).over(w).cast("long"))
      .withColumn("sx", sum(col("__x")).over(w).cast("long"))
      .withColumn("sy", sum(col("__y")).over(w).cast("long"))
      .withColumn("sxy", sum(col("__x") * col("__y")).over(w).cast("long"))
      .withColumn("sxx", sum(col("__x") * col("__x")).over(w).cast("long"))
      .withColumn("syy", sum(col("__y") * col("__y")).over(w).cast("long"))
      .select(col(keyCol), col(bucketCol), col("n"),
        expr(rollingCorrSql(minPeriods)).as("corr"))
  }

  /** Frame correlation over the six window-sum columns; NULL below
    * minPeriods or on a flat side. Shared with the oracle. */
  def rollingCorrSql(minPeriods: Int): String =
    s"CASE WHEN n >= $minPeriods AND n*sxx - sx*sx > 0 AND " +
      "n*syy - sy*sy > 0 THEN " +
      "round((n*sxy - sx*sy) / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * " +
      "CAST(n*syy - sy*sy AS DOUBLE)), 6) END"

  /** Cross-correlation function between TWO series per key at lags
    * −maxLag..maxLag — "do clicks lead purchases, and by how many
    * days?": ccf(ℓ) correlates x shifted ℓ buckets back against y, so
    * a peak at positive ℓ means x LEADS y by ℓ. Same exact-BIGINT
    * Pearson-moment assembly as [[autocorr]], one lag-window +
    * aggregate per ℓ over the pre-aggregated series (2·maxLag+1
    * bounded passes, each key-hashed — the series table is tiny
    * relative to the raw events that built it). */
  def ccf(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      xCol: String, yCol: String, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1 && maxLag <= 12, s"maxLag in [1,12]: $maxLag")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val base = perBucket.select(col(keyCol), col(bucketCol),
      col(xCol).cast("long").as("__x0"), col(yCol).cast("long").as("__y"))
    val frames = (-maxLag to maxLag).map { k =>
      val shifted =
        if (k >= 0) org.apache.spark.sql.functions.lag(col("__x0"), k).over(w)
        else lead(col("__x0"), -k).over(w)
      base.withColumn("__x", shifted)
        .filter(col("__x").isNotNull)
        .groupBy(col(keyCol))
        .agg(count(lit(1)).as("n"), sum(col("__x")).as("sx"),
          sum(col("__y")).as("sy"), sum(col("__x") * col("__y")).as("sxy"),
          sum(col("__x") * col("__x")).as("sxx"),
          sum(col("__y") * col("__y")).as("syy"))
        .select(col(keyCol), lit(k.toLong).as("lag"),
          col("n").cast("long").as("n"),
          round(
            when((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
                (col("n") * col("syy") - col("sy") * col("sy")) > 0,
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                  .cast("double") *
                  (col("n") * col("syy") - col("sy") * col("sy"))
                    .cast("double"))),
            6).as("ccf"))
    }
    frames.reduce(_ unionByName _)
  }

  /** Pettitt change-point test per key — the NONPARAMETRIC "did the
    * level shift, and when?" (cusum needs a target; Pettitt doesn't):
    * U_t = Σ_{i≤t}Σ_{j>t} sgn(x_j − x_i) collapses to the EXACT integer
    * Σ_{i≤t} 2·midrank_i − t(n+1) via the doubled-midrank identity, so
    * the whole statistic is integer arithmetic on two prefix sums
    * (value ranks + time order); K = max|U_t| with smallest-t
    * tie-break, p ≈ 2·exp(−6K²/(n³+n²)) as one shared-SQL double.
    * Plan: one per-(key,value) count + two [[Eval.rangedCumsum]] passes
    * + one key aggregate — nothing row-quadratic, nothing sorts
    * globally. */
  def pettitt(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    val u = perBucket.select(col(keyCol).as("__k"),
      col(bucketCol).cast("long").as("__t"),
      col(valueCol).cast("long").as("__v"))
    val perv = u.groupBy(col("__k"), col("__v"))
      .agg(count(lit(1)).cast("long").as("nv"))
    val ranks = Eval.rangedCumsum(perv, Seq("__k"), "__v", Seq("nv"))
      .select(col("__k"), col("__v"),
        (col("cum_nv") * 2 - col("nv") + 1).as("r2"))
    val tot = broadcast(u.groupBy(col("__k"))
      .agg(count(lit(1)).cast("long").as("n")))
    val cum = Eval.rangedCumsumOrdered(
      u.join(ranks, Seq("__k", "__v")).withColumn("one", lit(1L)),
      Seq("__k"), Seq("__t"), Seq("r2", "one"))
    cum.join(tot, Seq("__k"))
      .select(col("__k"), col("n"), col("__t"),
        col("cum_one").as("ti"),
        (col("cum_r2") - col("cum_one") * (col("n") + 1L)).as("u_t"))
      .filter(col("ti") < col("n"))
      .groupBy(col("__k"), col("n"))
      .agg(max(struct(abs(col("u_t")).as("a"), (-col("ti")).as("nti"),
        col("__t").as("b"))).as("m"))
      .select(col("__k").as(keyCol), col("n"),
        col("m.a").cast("long").as("k_stat"),
        col("m.b").as("t_change"))
      .withColumn("p", expr(pettittPSql))
      .withColumn("significant", expr(s"$pettittPSql < 0.05"))
  }

  /** Pettitt tail approximation p = min(1, 2·exp(−6K²/(n³+n²))) over
    * (k_stat, n), shared with the oracle; NULL for n < 2. */
  val pettittPSql: String =
    "CASE WHEN n > 1 THEN round(least(CAST(1 AS DOUBLE), " +
      "2 * exp(-6.0 * CAST(k_stat AS DOUBLE) * k_stat / " +
      "(CAST(n AS DOUBLE)*n*n + CAST(n AS DOUBLE)*n))), 6) END"

  /** Gumbel extreme-value fit per key from BLOCK MAXIMA — the tail
    * question mean/std can't answer: "what's the worst value we should
    * expect per day/month/year?". Method-of-moments on the per-block
    * maxima: β = s·√6/π, μ = x̄ − γ·β (Euler–Mascheroni γ), plus the
    * 100-block return level μ − β·ln(−ln(1−1/100)) — the classical
    * first-order answer for capacity planning / anomaly thresholds.
    *
    * Plan: one (key, block) max aggregate (map-side combined) + one
    * per-key moment aggregate — maxima are exact longs, Σm² exact to
    * ~10⁹ blocks at cents² scale, and the fit is one shared-SQL double
    * chain. NULL fit when <2 blocks or zero variance. */
  def gumbelFit(
      df: DataFrame, keyCol: String, blockCol: String,
      valCol: String): DataFrame =
    df.groupBy(col(keyCol), col(blockCol))
      .agg(max(col(valCol).cast("long")).as("m"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_blocks"),
        sum(col("m")).cast("long").as("sm"),
        sum(col("m") * col("m")).cast("long").as("sq"))
      .withColumn("mean_max", expr(
        "round(CAST(sm AS DOUBLE) / n_blocks, 6)"))
      .withColumn("beta", expr(gumbelBetaSql))
      .withColumn("mu", expr(gumbelMuSql))
      .withColumn("return_level_100", expr(gumbelRl100Sql))

  /** Sample SD of the maxima in the overflow-safe double assembly
    * (see welchTTest's note on why not the n·Σx² integer form). */
  private val gumbelSdSql: String =
    "sqrt((CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE) * " +
      "(CAST(sm AS DOUBLE) / n_blocks)) / (n_blocks - 1))"

  private val gumbelGuardSql: String =
    "n_blocks > 1 AND (CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE) * " +
      "(CAST(sm AS DOUBLE) / n_blocks)) > 0"

  /** β = s·√6/π over the moment row, shared with the oracle. */
  val gumbelBetaSql: String =
    s"CASE WHEN $gumbelGuardSql THEN " +
      s"round($gumbelSdSql * sqrt(6.0) / pi(), 6) END"

  /** μ = x̄ − γβ (γ = 0.5772156649015329), shared with the oracle. */
  val gumbelMuSql: String =
    s"CASE WHEN $gumbelGuardSql THEN " +
      "round(CAST(sm AS DOUBLE) / n_blocks - 0.5772156649015329 * " +
      s"($gumbelSdSql * sqrt(6.0) / pi()), 6) END"

  /** 100-block return level μ − β·ln(−ln(0.99)), shared with the
    * oracle (libm ln matches engine-for-engine; see FIXTURES.md). */
  val gumbelRl100Sql: String =
    s"CASE WHEN $gumbelGuardSql THEN " +
      "round(CAST(sm AS DOUBLE) / n_blocks - 0.5772156649015329 * " +
      s"($gumbelSdSql * sqrt(6.0) / pi()) - " +
      s"($gumbelSdSql * sqrt(6.0) / pi()) * LN(-LN(0.99)), 6) END"

  /** Granger causality at lag 1, per key — "does x's PAST improve the
    * forecast of y beyond y's own past?": F-test of the lag-1
    * unrestricted fit y_t ~ b0 + b1·y_{t−1} + b2·x_{t−1} against the
    * restricted y_t ~ a0 + a1·y_{t−1}, both solved CLOSED-FORM from ONE
    * per-key moment row (the restricted fit reuses a subset of the same
    * sums — no second pass). The lag is the OBSERVATION lag over the
    * bucket order (gap-fill upstream for a calendar lag). Integer
    * inputs keep every moment an exact BIGINT (Σy² exact to ~10⁹
    * cents²-scale buckets per key — the welchTTest bound); the whole
    * F assembly is one shared-SQL double chain, so the oracle replays
    * it term-for-term. `significant` compares F(1, n−3) against the
    * asymptotic χ²₁ 5% point 3.841459 (exact for n → ∞, slightly
    * anti-conservative below ~30 buckets — documented, not hidden).
    * One key-window lag + one map-side-combined aggregate. */
  def grangerLag1(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      yCol: String, xCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val lagged = perBucket
      .select(col(keyCol), col(bucketCol),
        col(yCol).cast("long").as("y"), col(xCol).cast("long").as("x"))
      .withColumn("yl", lag(col("y"), 1).over(wk))
      .withColumn("xl", lag(col("x"), 1).over(wk))
      .filter(col("yl").isNotNull && col("xl").isNotNull)
    val m = lagged.groupBy(col(keyCol)).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("yl")).cast("long").as("s1"),
      sum(col("xl")).cast("long").as("s2"),
      sum(col("yl") * col("yl")).cast("long").as("s11"),
      sum(col("yl") * col("xl")).cast("long").as("s12"),
      sum(col("xl") * col("xl")).cast("long").as("s22"),
      sum(col("y")).cast("long").as("sy"),
      sum(col("yl") * col("y")).cast("long").as("s1y"),
      sum(col("xl") * col("y")).cast("long").as("s2y"),
      sum(col("y") * col("y")).cast("long").as("syy"))
    grangerSolve.foldLeft(m) { case (d, (name, sql)) =>
      d.withColumn(name, expr(sql))
    }
  }

  /** The shared Granger F assembly over the 10-moment row — spliced
    * verbatim into the DuckDB oracle (the ols2Solve pattern). */
  val grangerSolve: Seq[(String, String)] = {
    val (n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy) = (
      "CAST(n AS DOUBLE)", "CAST(s1 AS DOUBLE)", "CAST(s2 AS DOUBLE)",
      "CAST(s11 AS DOUBLE)", "CAST(s12 AS DOUBLE)", "CAST(s22 AS DOUBLE)",
      "CAST(sy AS DOUBLE)", "CAST(s1y AS DOUBLE)", "CAST(s2y AS DOUBLE)",
      "CAST(syy AS DOUBLE)")
    val det =
      s"($n*($s11*$s22 - $s12*$s12) - $s1*($s1*$s22 - $s12*$s2) + $s2*($s1*$s12 - $s11*$s2))"
    val det0 =
      s"($sy*($s11*$s22 - $s12*$s12) - $s1*($s1y*$s22 - $s12*$s2y) + $s2*($s1y*$s12 - $s11*$s2y))"
    val det1 =
      s"($n*($s1y*$s22 - $s12*$s2y) - $sy*($s1*$s22 - $s12*$s2) + $s2*($s1*$s2y - $s1y*$s2))"
    val det2 =
      s"($n*($s11*$s2y - $s1y*$s12) - $s1*($s1*$s2y - $s1y*$s2) + $sy*($s1*$s12 - $s11*$s2))"
    val rssU =
      s"($syy - ($det0/$det)*$sy - ($det1/$det)*$s1y - ($det2/$det)*$s2y)"
    val s11c = s"($s11 - $s1*$s1/$n)"
    val s1yc = s"($s1y - $s1*$sy/$n)"
    val syyc = s"($syy - $sy*$sy/$n)"
    val rssR = s"($syyc - $s1yc*$s1yc/$s11c)"
    val guard =
      s"n > 3 AND $det <> 0 AND $s11c > 0 AND $rssU > 0"
    val f = s"(($rssR - $rssU) / ($rssU / (n - 3)))"
    Seq(
      "b_yl" -> s"CASE WHEN $guard THEN round($det1/$det, 6) END",
      "b_xl" -> s"CASE WHEN $guard THEN round($det2/$det, 6) END",
      "f_stat" -> s"CASE WHEN $guard THEN round($f, 6) END",
      "significant" -> s"CASE WHEN $guard THEN $f > 3.841459 END")
  }

  /** Seasonal forecast skill per key — "is there weekly structure worth
    * modeling?": compare the season-lag naive forecast (v_{t−season})
    * against the plain lag-1 naive on the SAME support (rows where both
    * lags exist), as skill = 1 − ΣAE_season/ΣAE_naive. Positive skill →
    * the seasonal copy beats persistence → real seasonality; ≈0 → none;
    * negative → the series drifts faster than it repeats. All absolute
    * errors are exact BIGINTs (one key-window pass, two lags riding one
    * sort); the lag is the OBSERVATION lag over the bucket order
    * (gap-fill upstream for calendar lags). */
  def naiveSkill(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, season: Int = 7): DataFrame = {
    require(season >= 2, s"season must be >= 2: $season")
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    perBucket
      .select(col(keyCol), col(bucketCol), col(valueCol).cast("long").as("v"))
      .withColumn("l1", lag(col("v"), 1).over(wk))
      .withColumn("ls", lag(col("v"), season).over(wk))
      .filter(col("l1").isNotNull && col("ls").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(abs(col("v") - col("l1"))).cast("long").as("sae_naive"),
        sum(abs(col("v") - col("ls"))).cast("long").as("sae_season"))
      .withColumn("skill", expr(naiveSkillSql))
  }

  /** skill over (sae_naive, sae_season); NULL for a constant series
    * (persistence is already perfect). Shared with the oracle. */
  val naiveSkillSql: String =
    "CASE WHEN sae_naive > 0 THEN " +
      "round(1.0 - CAST(sae_season AS DOUBLE) / sae_naive, 6) END"

  /** Turning-points randomness test per key — the cheapest "is this
    * series random noise?" screen: count interior points where the
    * series changes direction ((vᵢ−vᵢ₋₁)(vᵢ₊₁−vᵢ) < 0) and compare to
    * the i.i.d. null E[T] = 2(n−2)/3, Var[T] = (16n−29)/90. Too FEW
    * turning points → trend/persistence; too MANY → alternation
    * (negative lag-1 correlation). Complements [[naiveSkill]] (which
    * asks which structure) and the runs test (which dichotomizes
    * around a level first). Tied neighbors do not count as turns
    * (documented downward bias on heavily tied series — pre-aggregate
    * to a coarser bucket if most neighbors tie).
    *
    * Plan: one key-hashed window (lag+lead ride one sort), one
    * key-hashed aggregate on the same exchange — scale-safe for any
    * number of keys; per-key series length is the caller's bucket
    * granularity. */
  def turningPoints(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    perBucket
      .select(col(keyCol), col(bucketCol), col(valueCol).cast("long").as("v"))
      .withColumn("__p", lag(col("v"), 1).over(wk))
      .withColumn("__f", lead(col("v"), 1).over(wk))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("__p").isNotNull && col("__f").isNotNull &&
          (col("v") - col("__p")) * (col("__f") - col("v")) < 0L, 1L)
          .otherwise(0L)).cast("long").as("n_turning"))
      .withColumn("z", expr(turningZSql))
      .withColumn("significant", expr(s"abs($turningZSql) > 1.959964"))
  }

  /** z for the turning-point count vs the i.i.d. null over
    * (n, n_turning); NULL for n ≤ 2 (no interior point). Integer terms
    * cast to DOUBLE once (the runsZSql discipline — bare decimal
    * literals would run the chain in DECIMAL on the Spark side).
    * Shared with the oracle. */
  val turningZSql: String =
    "CASE WHEN n > 2 THEN " +
      "round((CAST(n_turning AS DOUBLE) - CAST(2*(n-2) AS DOUBLE)/3) / " +
      "sqrt(CAST(16*n - 29 AS DOUBLE)/90), 6) END"

  /** Cox–Stuart trend test per key — the sign test folded onto itself:
    * pair the i-th observation with the (i+⌈n/2⌉)-th and sign-test the
    * differences (odd middles drop). Distribution-free where
    * [[trendOls]] assumes linearity and mannKendall costs a window per
    * lag; the pairing spans HALF the series, so slow monotone drifts
    * that defeat lag-1 tests show up. Ties discard (classical).
    *
    * Plan: per-key row_number + count ride one key-hashed sort; the
    * half-offset pairing is a self-join on (key, rn+⌈n/2⌉) — one
    * shuffle each side, per-key series bounded by the caller's bucket
    * granularity. */
  def coxStuart(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val seq0 = perBucket
      .select(col(keyCol).as("__k"), col(bucketCol),
        col(valueCol).cast("long").as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("__k")).orderBy(col(bucketCol))).cast("long"))
      .withColumn("nk", count(lit(1)).over(
        Window.partitionBy(col("__k"))).cast("long"))
    val lo = seq0.filter(col("rn") * 2 <= col("nk"))
      // integer div, not `/` (Column./ on longs returns DOUBLE)
      .withColumn("rn_pair", expr("rn + (nk + 1) div 2"))
      .select(col("__k"), col("rn_pair"), col("nk"), col("v").as("v_lo"))
    val hi = seq0.select(col("__k").as("__k2"),
      col("rn").as("rn_hi"), col("v").as("v_hi"))
    lo.join(hi, col("__k") === col("__k2") &&
        col("rn_hi") === col("rn_pair"))
      .groupBy(col("__k").as(keyCol))
      .agg(max(col("nk")).cast("long").as("n"),
        sum(when(col("v_hi") > col("v_lo"), 1L).otherwise(0L))
          .cast("long").as("s_plus"),
        sum(when(col("v_hi") < col("v_lo"), 1L).otherwise(0L))
          .cast("long").as("s_minus"))
      .withColumn("z", expr(coxStuartZSql))
      .withColumn("trend", expr(
        s"CASE WHEN abs($coxStuartZSql) > 1.959964 THEN " +
          s"CASE WHEN $coxStuartZSql > 0 THEN 'increasing' " +
          "ELSE 'decreasing' END ELSE 'none' END"))
  }

  /** Sign-test z over (s_plus, s_minus); NULL when every pair ties.
    * Shared with the oracle. */
  val coxStuartZSql: String =
    "CASE WHEN s_plus + s_minus > 0 THEN " +
      "round((CAST(s_plus AS DOUBLE) - s_minus) / " +
      "sqrt(CAST(s_plus + s_minus AS DOUBLE)), 6) END"

  /** Chow structural-break test per key — did the linear relation
    * y ~ bucket CHANGE at `breakBucket`? Fit pooled and per-segment
    * OLS from ONE conditional-moment pass and compare residual sums:
    * F = ((SSR_p − SSR₁ − SSR₂)/2) / ((SSR₁+SSR₂)/(n₁+n₂−4)). The
    * changepoint companions ([[TimeSeries]] pettitt / cusum) locate a
    * LEVEL shift; Chow asks whether the fitted TREND itself broke at a
    * known date (deploy, policy change). Squared-value sums run in
    * DECIMAL (the durbinWatson bound: Σv² passes 2⁶³ near 3·10⁹-scale
    * values), consumed internally — never exposed. Significance uses
    * the large-n F(2,∞) 95% critical value 2.995732 (documented
    * approximation, exact dfs exposed for re-judging).
    *
    * Plan: ONE map-side-combined aggregate per key over the scan — no
    * join, no window; output is n_keys rows. */
  def chowTest(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, breakBucket: Long): DataFrame = {
    val x = col(bucketCol).cast("long")
    val y = col(valueCol).cast("long")
    val seg = (x < lit(breakBucket)).as("__s1")
    def segAgg(one: Boolean, f: org.apache.spark.sql.Column) =
      sum(when(if (one) col("__s1") else !col("__s1"), f)
        .otherwise(lit(0L)))
    def segAggDec(one: Boolean, f: org.apache.spark.sql.Column) =
      sum(when(if (one) col("__s1") else !col("__s1"), f)
        .otherwise(lit(0L).cast("decimal(38,0)")))
    val yd = y.cast("decimal(38,0)")
    val frame = perBucket.select(col(keyCol), seg, x.as("__x"), y.as("__y"),
      (yd * yd).as("__yy"))
    def half(p: String, one: Boolean) = Seq(
      segAgg(one, lit(1L)).cast("long").as(s"n_$p"),
      segAgg(one, col("__x")).cast("long").as(s"sx_$p"),
      segAgg(one, col("__y")).cast("long").as(s"sy_$p"),
      segAgg(one, col("__x") * col("__x")).cast("long").as(s"sxx_$p"),
      segAgg(one, col("__x") * col("__y")).cast("long").as(s"sxy_$p"),
      segAggDec(one, col("__yy")).cast("decimal(38,0)").as(s"syy_$p"))
    val aggs = half("1", true) ++ half("2", false)
    frame.groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("f_stat", expr(chowFSql))
      .withColumn("n1", col("n_1")).withColumn("n2", col("n_2"))
      .withColumn("significant",
        expr(s"$chowFSql > CAST(2.995732 AS DOUBLE)"))
      .select(col(keyCol), col("n1"), col("n2"), col("f_stat"),
        col("significant"))
  }

  /** Residual sum of squares of segment `p` from its exact moment
    * columns — Syy_c − Sxy_c²/Sxx_c in the overflow-safe double
    * assembly; nullif-guarded divisors (the riskDiff hoisting note). */
  private def chowSsrSql(p: String): String = {
    val n = s"n_$p"
    val sxxC = s"(CAST(sxx_$p AS DOUBLE) - CAST(sx_$p AS DOUBLE) * " +
      s"(CAST(sx_$p AS DOUBLE) / nullif($n, 0)))"
    val syyC = s"(CAST(syy_$p AS DOUBLE) - CAST(sy_$p AS DOUBLE) * " +
      s"(CAST(sy_$p AS DOUBLE) / nullif($n, 0)))"
    val sxyC = s"(CAST(sxy_$p AS DOUBLE) - CAST(sx_$p AS DOUBLE) * " +
      s"(CAST(sy_$p AS DOUBLE) / nullif($n, 0)))"
    s"($syyC - $sxyC * ($sxyC / nullif($sxxC, 0)))"
  }

  /** Pooled-segment SSR from the summed moment columns (pooled moments
    * are the exact sums of the two segments'). */
  private val chowSsrPooledSql: String = {
    val n = "(n_1 + n_2)"
    val sx = "(CAST(sx_1 AS DOUBLE) + sx_2)"
    val sy = "(CAST(sy_1 AS DOUBLE) + sy_2)"
    val sxx = "(CAST(sxx_1 AS DOUBLE) + sxx_2)"
    val sxy = "(CAST(sxy_1 AS DOUBLE) + sxy_2)"
    val syy = "(CAST(syy_1 AS DOUBLE) + CAST(syy_2 AS DOUBLE))"
    val sxxC = s"($sxx - $sx * ($sx / nullif($n, 0)))"
    val syyC = s"($syy - $sy * ($sy / nullif($n, 0)))"
    val sxyC = s"($sxy - $sx * ($sy / nullif($n, 0)))"
    s"($syyC - $sxyC * ($sxyC / nullif($sxxC, 0)))"
  }

  /** Chow F over the two-segment moment row; NULL unless both segments
    * carry ≥3 points with x-variance and the pooled residual is
    * positive. Shared with the oracle. */
  val chowFSql: String = {
    val s1 = chowSsrSql("1"); val s2 = chowSsrSql("2")
    "CASE WHEN n_1 > 2 AND n_2 > 2 AND " +
      s"(CAST(n_1 AS DOUBLE) * sxx_1 - CAST(sx_1 AS DOUBLE) * sx_1) > 0 AND " +
      s"(CAST(n_2 AS DOUBLE) * sxx_2 - CAST(sx_2 AS DOUBLE) * sx_2) > 0 AND " +
      s"($s1 + $s2) > 0 THEN " +
      s"round((($chowSsrPooledSql - $s1 - $s2) / 2) / " +
      s"nullif(($s1 + $s2) / nullif(n_1 + n_2 - 4, 0), 0), 6) END"
  }

  /** Maximum drawdown per key — the risk summary for any cumulative or
    * level series (portfolio value, running revenue, queue depth): the
    * largest peak-to-trough drop under the running maximum. Reported
    * exactly in the metric's integer units plus the peak/trough pair
    * that realizes it (earliest trough on ties — the deterministic
    * choice an audit can replay). `dd_frac` is the one double: the
    * exact long drop divided by the exact long peak.
    *
    * Plan: running max and the argmax pick are two sorts over ONE
    * key-hashed exchange; series length per key is the caller's bucket
    * granularity, so no partition outgrows calendar bounds. */
  def drawdown(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perBucket
      .select(col(keyCol), col(bucketCol), col(valCol).cast("long").as("v"))
      .withColumn("run_max", max(col("v")).over(wRun))
      .withColumn("dd", col("run_max") - col("v"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col(keyCol))).cast("long"))
    val pick = Window.partitionBy(col(keyCol))
      .orderBy(col("dd").desc, col(bucketCol))
    ranked.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col(keyCol), col("n"), col("dd").as("max_dd"),
        col("run_max").as("peak_v"), col("v").as("trough_v"),
        col(bucketCol).as("trough_bucket"))
      .withColumn("dd_frac", expr(ddFracSql))
  }

  /** Drawdown fraction over (max_dd, peak_v); NULL on a non-positive
    * peak (series never rose above zero). Shared with the oracle. */
  val ddFracSql: String =
    "CASE WHEN peak_v > 0 THEN " +
      "round(CAST(max_dd AS DOUBLE) / peak_v, 6) END"

  /** Bollinger-band breach flags per (key, bucket) — the rolling
    * volatility envelope: mid = n-bar rolling mean, band = ±k·rolling
    * population sd. The breach DECISION is exact integer arithmetic —
    * `(n·v − s) > 0 ∧ (n·v − s)² > k²·(n·ss − s²)` in decimal(38,0) —
    * so no double sqrt can flip a boolean across engines (the
    * jarque-bera 1-ulp lesson); only the mid is a double, one exact
    * long division. Squared sums accumulate in decimal: cents² at
    * 100 TB bucket sums (~1e15) squares past 2⁶³. Bars before a full
    * window drop (standard warm-up convention). |n·v − s| stays under
    * ~1e19 for any realistic cents series — document, don't guard.
    *
    * Plan: both rolling sums and the row_number warm-up gate ride ONE
    * key-hashed sort; per-key series is calendar-bounded. */
  def bollinger(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valCol: String, nBars: Int = 24, k: Int = 2): DataFrame = {
    require(nBars > 1, s"nBars must be > 1: $nBars")
    require(k > 0, s"k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val wRoll = wOrd.rowsBetween(-(nBars - 1), 0)
    perBucket
      .select(col(keyCol), col(bucketCol), col(valCol).cast("long").as("v"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("s", sum(col("v")).over(wRoll).cast("long"))
      .withColumn("ss",
        sum(col("v").cast("decimal(38,0)") * col("v")).over(wRoll)
          .cast("decimal(38,0)"))
      .filter(col("rn") >= nBars)
      .withColumn("mid", expr(s"round(CAST(s AS DOUBLE) / $nBars, 6)"))
      .withColumn("breach_hi", expr(bollingerBreachSql(nBars, k, hi = true)))
      .withColumn("breach_lo", expr(bollingerBreachSql(nBars, k, hi = false)))
      .select(col(keyCol), col(bucketCol), col("v"), col("mid"),
        col("breach_hi"), col("breach_lo"))
  }

  /** Exact-integer band breach over (v, s, ss) for window n and width
    * k·sd: sign gate + squared compare, all in decimal. Shared with the
    * oracle (DuckDB runs the same text over HUGEINT-compatible
    * decimals). */
  def bollingerBreachSql(n: Int, k: Int, hi: Boolean): String = {
    val dev = if (hi) s"(CAST($n AS DECIMAL(38,0)) * v - s)"
      else s"(s - CAST($n AS DECIMAL(38,0)) * v)"
    s"$dev > 0 AND $dev * $dev > " +
      s"${k * k} * (CAST($n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s)"
  }

  /** Cutler's RSI per (key, bucket) — the bounded momentum oscillator:
    * 100·Σgains/(Σgains+Σlosses) over the last n deltas (simple
    * averages, not Wilder's recursive smoothing — window-expressible
    * and the standard batch variant). Flat windows (no movement) yield
    * NULL; all-gain windows 100, all-loss 0. Gains/losses are exact
    * longs; one double division.
    *
    * Plan: the lag diff, both rolling sums, and the warm-up gate share
    * ONE key-hashed sort. */
  def rsi(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valCol: String, nBars: Int = 14): DataFrame = {
    require(nBars > 0, s"nBars must be positive: $nBars")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val wRoll = wOrd.rowsBetween(-(nBars - 1), 0)
    perBucket
      .select(col(keyCol), col(bucketCol), col(valCol).cast("long").as("v"))
      .withColumn("__d", col("v") - lag(col("v"), 1).over(wOrd))
      .withColumn("rn", row_number().over(wOrd))
      .filter(col("__d").isNotNull)
      .withColumn("sg",
        sum(greatest(col("__d"), lit(0L))).over(wRoll).cast("long"))
      .withColumn("sl",
        sum(greatest(-col("__d"), lit(0L))).over(wRoll).cast("long"))
      .filter(col("rn") > nBars) // first diff is at rn=2; full window at n+1
      .select(col(keyCol), col(bucketCol), col("v"), col("sg"), col("sl"))
      .withColumn("rsi", expr(rsiSql))
  }

  /** RSI over (sg, sl); NULL when the window never moved. Shared with
    * the oracle. */
  val rsiSql: String =
    "CASE WHEN sg + sl > 0 THEN " +
      "round(100 * CAST(sg AS DOUBLE) / (sg + sl), 6) END"

  /** Stochastic oscillator per (key, bucket) — where the value sits in
    * its n-bar range: %K = 100·(v − min)/(max − min), %D = 3-bar mean
    * of %K. %D averages MICRO-QUANTIZED %K longs (sum of 3 exact longs,
    * one division) — averaging round-6 doubles directly would make the
    * sum order-dependent across engines. Flat ranges yield NULL %K and
    * drop from %D's average (classical convention: undefined, not 50):
    * %D requires a FULL 3-row frame (warm-up rows are NULL) but then
    * averages the d_n defined %K values in it, NULL only when all 3
    * are flat.
    *
    * Plan: rolling min/max, the quantized %K, and the %D average all
    * ride ONE key-hashed sort. */
  def stochasticOsc(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valCol: String, nBars: Int = 14): DataFrame = {
    require(nBars > 1, s"nBars must be > 1: $nBars")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val wRoll = wOrd.rowsBetween(-(nBars - 1), 0)
    val wD = wOrd.rowsBetween(-2, 0)
    perBucket
      .select(col(keyCol), col(bucketCol), col(valCol).cast("long").as("v"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("lo", min(col("v")).over(wRoll))
      .withColumn("hi", max(col("v")).over(wRoll))
      .filter(col("rn") >= nBars)
      .withColumn("k_micro", expr(stochKMicroSql))
      .withColumn("d_n",
        count(col("k_micro")).over(wD).cast("long"))
      .withColumn("f_n", count(lit(1)).over(wD).cast("long"))
      .withColumn("d_sum", sum(col("k_micro")).over(wD).cast("long"))
      .select(col(keyCol), col(bucketCol), col("v"),
        expr("CASE WHEN k_micro IS NOT NULL THEN " +
          "round(CAST(k_micro AS DOUBLE) / 1e6, 6) END").as("pct_k"),
        expr(stochDSql).as("pct_d"))
  }

  /** %D over (f_n, d_n, d_sum): full 3-row frame required, then the
    * mean of the d_n non-NULL %K values. Shared with the oracle. */
  val stochDSql: String =
    "CASE WHEN f_n = 3 AND d_n > 0 THEN " +
      "round(CAST(d_sum AS DOUBLE) / d_n / 1e6, 6) END"

  /** Micro-quantized %K over (v, lo, hi); NULL on a flat range. Shared
    * with the oracle. */
  val stochKMicroSql: String =
    "CASE WHEN hi > lo THEN " +
      "CAST(round(100000000 * CAST(v - lo AS DOUBLE) / (hi - lo), 0)" +
      " AS BIGINT) END"

  /** Volume-weighted average price per (key, bucket) — the execution
    * benchmark [[twap]] time-weights and VWAP volume-weights: exact
    * integer notional and quantity sums, one double division. Pure
    * map-side-combinable aggregate — the cheapest operator in the
    * family, scale-free. */
  def vwap(
      df: DataFrame, keyCol: String, bucketCol: String,
      notionalCol: String, qtyCol: String): DataFrame =
    df.groupBy(col(keyCol), col(bucketCol))
      .agg(count(lit(1)).cast("long").as("n_trades"),
        sum(col(qtyCol).cast("long")).cast("long").as("qty"),
        sum(col(notionalCol).cast("long")).cast("long").as("notional"))
      .withColumn("vwap", expr(vwapSql))

  /** VWAP over (notional, qty); NULL on zero quantity. Shared with the
    * oracle. */
  val vwapSql: String =
    "CASE WHEN qty > 0 THEN " +
      "round(CAST(notional AS DOUBLE) / qty, 6) END"

  /** Average true range per (key, bar) over [[ohlcBars]] output — the
    * standard volatility gauge that sees GAPS between bars, not just
    * intra-bar spread: TR = greatest(high−low, |high−prev_close|,
    * |low−prev_close|) (first bar: high−low), ATR = n-bar rolling mean
    * of TR. TR is an exact long; one double division.
    *
    * Plan: composes the bar build's (key, bar) aggregate with ONE
    * key-hashed sort for lag + rolling sum + warm-up gate. */
  def atr(
      bars: DataFrame, keyCol: String, barCol: String,
      nBars: Int = 14): DataFrame = {
    require(nBars > 0, s"nBars must be positive: $nBars")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(barCol))
    val wRoll = wOrd.rowsBetween(-(nBars - 1), 0)
    bars
      .select(col(keyCol), col(barCol), col("high").cast("long").as("h"),
        col("low").cast("long").as("l"), col("close").cast("long").as("c"))
      .withColumn("__pc", lag(col("c"), 1).over(wOrd))
      .withColumn("tr", expr(trSql))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("tr_sum", sum(col("tr")).over(wRoll).cast("long"))
      .filter(col("rn") >= nBars)
      .select(col(keyCol), col(barCol), col("tr"),
        expr(s"round(CAST(tr_sum AS DOUBLE) / $nBars, 6)").as("atr"))
  }

  /** True range over (h, l, __pc); first bar falls back to h−l. Shared
    * with the oracle. */
  val trSql: String =
    "CASE WHEN __pc IS NULL THEN h - l ELSE " +
      "greatest(h - l, abs(h - __pc), abs(l - __pc)) END"

  /** KPSS level-stationarity test per key — the null is STATIONARY
    * (the mirror of [[dickeyFuller]], whose null is a unit root; run
    * both and the quadrant tells you trend vs drift vs noise):
    * η = Σₜ Sₜ² / (n²·σ̂²) with Sₜ the demeaned partial sums and σ̂²
    * the lag-0 residual variance (the zero-truncation-lag variant —
    * serially correlated series need the caller to pre-whiten or
    * accept the documented size distortion). Reject stationarity at 5%
    * when η > 0.463.
    *
    * Exactness: Sₜ is held as the EXACT decimal n·prefixₜ − t·Σv (no
    * mean division), σ̂²'s moments likewise; each row's squared-bridge
    * term is nano-quantized to a long before summing, so the cross-row
    * sum is exact and order-free. Feed units keeping n·prefix and
    * n·Σx² under ~2⁵³ (dollars at warehouse scale) so the per-row
    * decimal→double casts are exact.
    *
    * Plan: the key aggregate windows and the ordered prefix window
    * share ONE key-hashed exchange; per-key series is the caller's
    * bucket granularity. */
  def kpss(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wKey = Window.partitionBy(col(keyCol))
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    perBucket
      .select(col(keyCol), col(bucketCol), col(valCol).cast("long").as("v"))
      .withColumn("n", count(lit(1)).over(wKey).cast("long"))
      .withColumn("sv", sum(col("v")).over(wKey).cast("long"))
      .withColumn("sxx", sum(col("v").cast("decimal(38,0)") * col("v"))
        .over(wKey).cast("decimal(38,0)"))
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("ps", sum(col("v")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .withColumn("term", expr(kpssTermNanoSql))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"),
        sum(col("term")).cast("long").as("s_nano"))
      .withColumn("eta", expr(kpssEtaSql))
      .withColumn("nonstationary",
        expr(s"coalesce($kpssEtaSql > 0.463, false)"))
  }

  /** Per-row nano-quantized Sₜ²/(n²σ̂²) bridge term over
    * (v, n, sv, sxx, t, ps); NULL (dropping the key) on a constant
    * series. D = n·ps − t·sv is the n-scaled demeaned partial sum;
    * den = n·sxx − sv² is n²·Σ(v−v̄)²/n = n·(n·σ̂²·n)/… — the n powers
    * cancel so term = D²/(n·den). Shared with the oracle. */
  val kpssTermNanoSql: String = {
    val d = "(CAST(n AS DECIMAL(38,0)) * ps - CAST(t AS DECIMAL(38,0)) * sv)"
    val den = "(CAST(n AS DECIMAL(38,0)) * sxx - " +
      "CAST(sv AS DECIMAL(38,0)) * sv)"
    s"CASE WHEN $den > 0 THEN " +
      s"CAST(round(1000000000 * CAST($d AS DOUBLE) * CAST($d AS DOUBLE) / " +
      s"(CAST(n AS DOUBLE) * CAST($den AS DOUBLE)), 0) AS BIGINT) END"
  }

  /** η over (n, s_nano). Shared with the oracle. */
  val kpssEtaSql: String =
    "CASE WHEN s_nano IS NOT NULL THEN " +
      "round(CAST(s_nano AS DOUBLE) / 1e9 / n, 6) END"

  /** Dickey–Fuller unit-root test per key (constant, no trend, no
    * augmentation — the workhorse single-lag variant; serially
    * correlated differences need pre-whitening): regress Δvₜ on vₜ₋₁,
    * t-statistic of the slope against the Dickey–Fuller 5% asymptotic
    * critical value −2.86 (NOT the t-table — the null distribution is
    * nonstandard). t < −2.86 rejects the unit root: the series mean-
    * reverts. Moments accumulate exactly (cross-products in decimal);
    * one shared-SQL double chain assembles β and its standard error —
    * the trendOls discipline. Feed units keeping Σx² under ~2⁵³.
    *
    * Plan: the lag diff and the moment aggregate share ONE key-hashed
    * exchange. */
  def dickeyFuller(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    perBucket
      .select(col(keyCol), col(bucketCol), col(valCol).cast("long").as("v"))
      .withColumn("__x", lag(col("v"), 1).over(wOrd))
      .filter(col("__x").isNotNull)
      .withColumn("__y", col("v") - col("__x"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("m"),
        sum(col("__x")).cast("long").as("sx"),
        sum(col("__y")).cast("long").as("sy"),
        sum(col("__x").cast("decimal(38,0)") * col("__x"))
          .cast("decimal(38,0)").as("sxx"),
        sum(col("__x").cast("decimal(38,0)") * col("__y"))
          .cast("decimal(38,0)").as("sxy"),
        sum(col("__y").cast("decimal(38,0)") * col("__y"))
          .cast("decimal(38,0)").as("syy"))
      .withColumn("beta", expr(dfBetaSql))
      .withColumn("t_stat", expr(dfTSql))
      .withColumn("stationary", expr(s"coalesce($dfTSql < -2.86, false)"))
      // exposed DECIMAL → STRING (r10 decimal contract)
      .withColumn("sxx", col("sxx").cast("string"))
      .withColumn("sxy", col("sxy").cast("string"))
      .withColumn("syy", col("syy").cast("string"))
  }

  /** Classical additive seasonal decomposition per key (the
    * statsmodels `seasonal_decompose` contract): trend = centered
    * 2×period moving average, seasonal = mean detrended value per
    * phase (bucket mod period) CENTERED to sum ≈ 0 across phases,
    * remainder = v − trend − seasonal. Rows without a full trend
    * window (the first/last period/2 buckets) drop — the standard
    * edge convention. Requires an EVEN period (the 2×p MA handles the
    * half-weights exactly: t2p = wide(p+1) + narrow(p−1) integer sums,
    * trend = t2p/2p with ONE division).
    *
    * Exactness: the detrended value is held as the exact long
    * 2p·v − t2p; per-phase means round ONCE to micro units; the
    * centering adjustment is the rounded phase-mean average. Every
    * output double is a deterministic chain over exact longs.
    *
    * Plan: the two rolling sums + row gates ride one key-hashed sort;
    * the phase means are a (key, phase) aggregate + join back — the
    * per-key series is the caller's bucket granularity, phases are
    * `period` rows per key. */
  def classicalDecompose(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valCol: String, period: Int = 24): DataFrame = {
    require(period > 1 && period % 2 == 0,
      s"period must be even and > 1 (2xp centered MA): $period")
    import org.apache.spark.sql.expressions.Window
    val half = period / 2
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val wKey = Window.partitionBy(col(keyCol))
    val base = perBucket
      .select(col(keyCol), col(bucketCol), col(valCol).cast("long").as("v"))
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("nk", count(lit(1)).over(wKey).cast("long"))
      .withColumn("s_wide",
        sum(col("v")).over(wOrd.rowsBetween(-half, half)).cast("long"))
      .withColumn("s_narrow",
        sum(col("v")).over(wOrd.rowsBetween(-(half - 1), half - 1))
          .cast("long"))
      .filter(col("rn") > half && col("rn") + half <= col("nk"))
      .withColumn("t2p", col("s_wide") + col("s_narrow"))
      .withColumn("phase", pmod(col(bucketCol), lit(period.toLong)))
      .withColumn("detr_x2p", lit(2L * period) * col("v") - col("t2p"))
    val pm = base.groupBy(col(keyCol), col("phase"))
      .agg(sum(col("detr_x2p")).cast("long").as("se_num"),
        count(lit(1)).cast("long").as("se_cnt"))
      .withColumn("seas_micro", expr(decompSeasMicroSql(period)))
      .withColumn("adj_micro", expr(
        s"CAST(round(avg(seas_micro) OVER (PARTITION BY $keyCol), 0)" +
          " AS BIGINT)"))
      .withColumn("s_eff", col("seas_micro") - col("adj_micro"))
    base.join(pm.select(col(keyCol), col("phase"), col("s_eff")),
        Seq(keyCol, "phase"))
      .withColumn("trend", expr(decompTrendSql(period)))
      .withColumn("seasonal",
        expr("round(CAST(s_eff AS DOUBLE) / 1e6, 6)"))
      .withColumn("remainder", expr(decompRemainderSql(period)))
      .select(col(keyCol), col(bucketCol), col("v"), col("phase"),
        col("trend"), col("seasonal"), col("remainder"))
  }

  /** Centered 2×p MA over t2p. Shared with the oracle. */
  def decompTrendSql(p: Int): String =
    s"round(CAST(t2p AS DOUBLE) / ${2 * p}, 6)"

  /** Micro-rounded phase mean of the exact detrended 2p·v − t2p.
    * Shared with the oracle. */
  def decompSeasMicroSql(p: Int): String =
    s"CAST(round(1000000 * CAST(se_num AS DOUBLE) / (${2 * p} * se_cnt)," +
      " 0) AS BIGINT)"

  /** remainder = v − trend − seasonal over exact (v, t2p, s_eff).
    * Shared with the oracle. */
  def decompRemainderSql(p: Int): String =
    s"round(CAST(v AS DOUBLE) - CAST(t2p AS DOUBLE) / ${2 * p} - " +
      "CAST(s_eff AS DOUBLE) / 1e6, 6)"

  /** Hyndman seasonal/trend strength per key over the
    * [[classicalDecompose]] output: F_seasonal = max(0, 1 −
    * Var(R)/Var(S+R)), F_trend = max(0, 1 − Var(R)/Var(T+R)) — the
    * "is this series worth a seasonal model?" triage that turns a
    * decomposition into one scheduling decision per metric. Component
    * values are micro-exact BY CONSTRUCTION (round-6 doubles), so the
    * variance moments accumulate as exact longs/decimals; one double
    * chain per ratio at the end. Feed series in units that keep
    * component² sums inside 2⁵³ (dollars for warehouse spend) so the
    * decimal→double casts stay exact. */
  def seasonalStrength(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valCol: String, period: Int = 24): DataFrame = {
    val d = classicalDecompose(perBucket, keyCol, bucketCol, valCol, period)
      .withColumn("r_mi",
        expr("CAST(round(remainder * 1e6, 0) AS BIGINT)"))
      .withColumn("sr_mi",
        expr("CAST(round(seasonal * 1e6, 0) AS BIGINT) + " +
          "CAST(round(remainder * 1e6, 0) AS BIGINT)"))
      .withColumn("tr_mi",
        expr("CAST(round(trend * 1e6, 0) AS BIGINT) + " +
          "CAST(round(remainder * 1e6, 0) AS BIGINT)"))
    d.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("r_mi")).cast("long").as("s_r"),
        sum(col("r_mi").cast("decimal(38,0)") * col("r_mi"))
          .cast("decimal(38,0)").as("q_r"),
        sum(col("sr_mi")).cast("long").as("s_sr"),
        sum(col("sr_mi").cast("decimal(38,0)") * col("sr_mi"))
          .cast("decimal(38,0)").as("q_sr"),
        sum(col("tr_mi")).cast("long").as("s_tr"),
        sum(col("tr_mi").cast("decimal(38,0)") * col("tr_mi"))
          .cast("decimal(38,0)").as("q_tr"))
      .withColumn("f_seasonal", expr(strengthSql("sr")))
      .withColumn("f_trend", expr(strengthSql("tr")))
      .select(col(keyCol), col("n"), col("f_seasonal"), col("f_trend"))
  }

  /** max(0, 1 − Var(r)/Var(x)) over the micro-moment row; NULL when
    * the component series is flat. Shared with the oracle. */
  def strengthSql(x: String): String = {
    def v(p: String) =
      s"(CAST(q_$p AS DOUBLE) - CAST(s_$p AS DOUBLE) * " +
        s"(CAST(s_$p AS DOUBLE) / n))"
    s"CASE WHEN ${v(x)} > 0 THEN " +
      s"round(greatest(0, 1 - ${v("r")} / ${v(x)}), 6) END"
  }

  /** Generic exact-moment OLS slope per key over PRE-QUANTIZED integer
    * (x, y) — the log-log elasticity fit (slope of ln q on ln p is the
    * price elasticity of demand), but any caller that milli/micro-
    * quantizes its transforms first gets the same exact-moment
    * treatment. Reuses [[dfBetaSql]]'s moment row (same column
    * contract as the Dickey–Fuller regression); adds r². Quantized
    * units cancel in the slope. Decimal cross-products internally,
    * none exposed. One map-side-combined aggregate. */
  def elasticity(
      df: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame =
    df.select(col(keyCol), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("m"),
        sum(col("__x")).cast("long").as("sx"),
        sum(col("__y")).cast("long").as("sy"),
        sum(col("__x").cast("decimal(38,0)") * col("__x"))
          .cast("decimal(38,0)").as("sxx"),
        sum(col("__x").cast("decimal(38,0)") * col("__y"))
          .cast("decimal(38,0)").as("sxy"),
        sum(col("__y").cast("decimal(38,0)") * col("__y"))
          .cast("decimal(38,0)").as("syy"))
      .withColumn("slope", expr(dfBetaSql))
      .withColumn("r2", expr(elasticityR2Sql))
      .select(col(keyCol), col("m").as("n"), col("slope"), col("r2"))

  private val dfSxxCSql =
    "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / m))"
  private val dfSxyCSql =
    "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / m))"
  private val dfSyyCSql =
    "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * (CAST(sy AS DOUBLE) / m))"

  /** Slope of Δv on lagged v over the moment row; NULL without x
    * variance. Shared with the oracle. */
  val dfBetaSql: String =
    s"CASE WHEN m > 2 AND $dfSxxCSql > 0 THEN " +
      s"round($dfSxyCSql / $dfSxxCSql, 6) END"

  /** r² over the same moment row ([[elasticity]]); NULL on degenerate
    * x or y. Shared with the oracle. */
  lazy val elasticityR2Sql: String =
    s"CASE WHEN m > 2 AND $dfSxxCSql > 0 AND $dfSyyCSql > 0 THEN " +
      s"round($dfSxyCSql * $dfSxyCSql / " +
      s"($dfSxxCSql * $dfSyyCSql), 6) END"

  /** DF t = β/se(β) from the same moments; NULL on a perfect fit
    * (zero residual) or degenerate x. Shared with the oracle. */
  val dfTSql: String = {
    val ssr = s"($dfSyyCSql - ($dfSxyCSql / $dfSxxCSql) * $dfSxyCSql)"
    s"CASE WHEN m > 2 AND $dfSxxCSql > 0 AND $ssr > 0 THEN " +
      s"round(($dfSxyCSql / $dfSxxCSql) / " +
      s"sqrt(($ssr / (m - 2)) / $dfSxxCSql), 6) END"
  }

  /** Forecast-accuracy panel per key — the metrics that judge a
    * forecast next to [[forecastSkill]]'s relative score: MAE and RMSE
    * of the lag-`fLag` forecast (ŷₜ = yₜ₋f, the seasonal-naive
    * baseline), sMAPE (per-row 2|e|/(|y|+|ŷ|) terms micro-quantized
    * before averaging — a raw double sum would be order-dependent;
    * rows with |y|+|ŷ| = 0 have an UNDEFINED term and drop from the
    * average), and MASE (Hyndman: MAE of the forecast over the MAE of
    * the lag-`sLag` naive scale). Scoring is restricted to rows where
    * BOTH lags exist, so the two error counts coincide and MASE is the
    * exact integer ratio Σ|e_f|/Σ|e_s|, NULL on a constant series.
    *
    * Long bound: Σe² at cents scale holds to ~10⁸ scored rows per key.
    *
    * Plan: ONE key-hashed sort carries both lags; one map-side-combined
    * aggregate finishes. */
  def forecastAccuracy(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valCol: String, fLag: Int = 24, sLag: Int = 1): DataFrame = {
    require(fLag > 0 && sLag > 0, s"lags must be positive: $fLag, $sLag")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    perBucket
      .select(col(keyCol), col(bucketCol), col(valCol).cast("long").as("v"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("yf", lag(col("v"), fLag).over(wOrd))
      .withColumn("ys", lag(col("v"), sLag).over(wOrd))
      .filter(col("rn") > math.max(fLag, sLag))
      .withColumn("sm_term", expr(smapeTermMicroSql))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(abs(col("v") - col("yf"))).cast("long").as("sae"),
        sum((col("v") - col("yf")) * (col("v") - col("yf")))
          .cast("long").as("sse"),
        sum(abs(col("v") - col("ys"))).cast("long").as("sas"),
        sum(col("sm_term")).cast("long").as("sm_sum"),
        count(col("sm_term")).cast("long").as("sm_n"))
      .withColumn("mae", expr("round(CAST(sae AS DOUBLE) / n, 6)"))
      .withColumn("rmse", expr("round(sqrt(CAST(sse AS DOUBLE) / n), 6)"))
      .withColumn("smape", expr(smapeSql))
      .withColumn("mase", expr(maseSql))
  }

  /** Micro-quantized sMAPE term over (v, yf); NULL when |y|+|ŷ| = 0
    * (undefined, drops from the average). Shared with the oracle. */
  val smapeTermMicroSql: String =
    "CASE WHEN abs(v) + abs(yf) > 0 THEN " +
      "CAST(round(2000000 * CAST(abs(v - yf) AS DOUBLE) / " +
      "(abs(v) + abs(yf)), 0) AS BIGINT) END"

  /** sMAPE over (sm_sum, sm_n); NULL when no term was defined. Shared
    * with the oracle. */
  val smapeSql: String =
    "CASE WHEN sm_n > 0 THEN " +
      "round(CAST(sm_sum AS DOUBLE) / sm_n / 1000000, 6) END"

  /** MASE over (sae, sas); NULL on a constant series (zero naive
    * scale). Shared with the oracle. */
  val maseSql: String =
    "CASE WHEN sas > 0 THEN " +
      "round(CAST(sae AS DOUBLE) / sas, 6) END"

  /** Page–Hinkley upward-drift test per key — the classical sequential
    * change detector next to the CUSUM tier: PHₜ = Σᵢ≤ₜ (xᵢ − x̄ᵢ − δ)
    * with x̄ᵢ the RUNNING mean, alarm when PHₜ − minᵢ≤ₜ PHᵢ exceeds λ.
    * Per-row terms micro-quantize (prefix sums are exact longs, the
    * mean division and round are IEEE-deterministic), so the PH
    * cumulative and its running minimum are exact integers and the
    * alarm decision is an integer compare — no double drift across
    * engines. Emits one row per key: the max gap, whether it crossed
    * λ, and the FIRST alarm bucket (earliest detection, the number an
    * on-call page needs). δ and λ are in value units (cents here).
    *
    * Plan: ONE key-hashed sort carries the prefix sum, the term
    * cumulative, and the running min; one aggregate finishes. */
  def pageHinkley(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valCol: String, delta: Long = 0L, lambda: Long = 1000L): DataFrame = {
    require(lambda > 0, s"lambda must be positive: $lambda")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .select(col(keyCol), col(bucketCol), col(valCol).cast("long").as("v"))
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("sv", sum(col("v")).over(wCum).cast("long"))
      .withColumn("term", expr(phTermMicroSql(delta)))
      .withColumn("ph", sum(col("term")).over(wCum).cast("long"))
      .withColumn("ph_min", min(col("ph")).over(wCum).cast("long"))
      .withColumn("gap", col("ph") - col("ph_min"))
      .withColumn("alarm", col("gap") > lit(lambda) * lit(1000000L))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        max(col("gap")).cast("long").as("max_gap_micro"),
        max(col("alarm")).as("drift"),
        min(when(col("alarm"), col(bucketCol))).as("first_alarm_bucket"))
      .withColumn("max_gap", expr("round(max_gap_micro / 1e6, 6)"))
      .drop("max_gap_micro")
  }

  /** Micro-quantized PH term over (v, sv, rn): x − (running mean) − δ.
    * Shared with the oracle. */
  def phTermMicroSql(delta: Long): String =
    "CAST(round(1000000 * (CAST(v AS DOUBLE) - " +
      s"CAST(sv AS DOUBLE) / rn - $delta), 0) AS BIGINT)"

  /** All-pairs Dynamic Time Warping over PAA-REDUCED series — the
    * standard "DTW on the sketch" trick from the SAX literature
    * (Keogh's PAA lower-bounding): reduce each key's ordered integer
    * series to `segments` equal-width PAA means (micro-quantized →
    * exact BIGINT), then run EXACT DTW on the m×m grid per key pair.
    * DTW aligns series that plain Euclidean distance mis-ranks when
    * one lags the other (shifted seasonal peaks, delayed rollouts) —
    * the alignment-invariant sibling of [[saxWords]]' shape equality.
    *
    * Exactness: PAA means quantize ONCE to micro longs (shared-text
    * round), cell costs are |Δmicro| BIGINTs, and the DP accumulates
    * exact integer sums — the whole distance matrix hashes
    * bit-for-bit. `least` ignores NULLs, so the three DP moves
    * (up/left/diag) collapse at grid edges for free.
    *
    * Plan: the m×m DP per pair runs MAP-SIDE as one `aggregate`
    * higher-order fold over the pair's two m-element PAA arrays
    * (rolling (m+1)-cell window, row-major order) — zero job barriers
    * for the grid, where the previous wavefront formulation paid 2m−1
    * sequential materialized join rounds (a fixed plan-latency floor:
    * q_dtw 7.1 s → well under the 4 s target at sf0.1 on identical
    * output). Pairs are enumerated with a hard `maxKeys` guard (pair
    * count grows quadratically in KEYS — series length only enters
    * through the one PAA pass; at 100 TB you DTW thousands of series
    * of any length, not millions of series); each pair row carries
    * 2m longs, so the bounded pair join stays narrow. Keys with fewer
    * than `segments` points are dropped (their PAA grid would be
    * ragged); dtw_norm = dtw / (2m) is the path-length-normalized
    * distance. */
  def dtwPaaDistances(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      segments: Int = 8,
      maxKeys: Long = 4096L): DataFrame = {
    require(segments >= 2 && segments <= 32,
      s"segments must be in [2, 32]: $segments")
    import org.apache.spark.sql.expressions.Window
    val rows = df
      .select(col(keyCol).as("k"), col(orderCol).as("o"),
        col(valueCol).cast("long").as("__y"))
      .withColumn("__rn", row_number()
        .over(Window.partitionBy(col("k")).orderBy(col("o"))).cast("long"))
      .withColumn("__n", count(lit(1))
        .over(Window.partitionBy(col("k"))).cast("long"))
      .filter(col("__n") >= segments.toLong)
      .withColumn("__seg", expr(s"((__rn - 1) * $segments) div __n"))
    val paa = rows.groupBy(col("k"), col("__seg").as("seg"))
      .agg(sum(col("__y")).cast("long").as("__ps"),
        count(lit(1)).cast("long").as("__pc"))
      .withColumn("pm", expr(paaMicroSql))
      .select(col("k"), col("seg"), col("pm"))
      .materialize
    val nKeys = paa.select(col("k")).distinct()
      .limit((maxKeys + 1).toInt).count()
    require(nKeys <= maxKeys,
      s"dtwPaaDistances: > $maxKeys keys — the pair grid is quadratic " +
        "in keys; pre-cluster (saxWords GROUP BY word) or raise maxKeys " +
        "deliberately.")
    // one m-element PAA array per key, seg-ordered
    val arr = paa.groupBy(col("k"))
      .agg(expr("transform(sort_array(collect_list(struct(seg, pm))), " +
        "x -> x.pm)").as("pv"))
    val m = segments
    // broadcast the probe side: ≤ maxKeys rows of m longs each, so the
    // pair enumeration plans as a bounded BNLJ instead of an
    // unconstrained CartesianProduct (PlanGuardSpec contract)
    arr.select(col("k").as("ka"), col("pv").as("pa"))
      .join(broadcast(arr.select(col("k").as("kb"), col("pv").as("pb"))),
        col("ka") < col("kb"))
      .select(col("ka"), col("kb"), expr(dtwFoldSql(m)).as("acc"))
      .select(col("ka"), col("kb"), col("acc").as("dtw_micro"),
        expr("round(acc / 1e6, 6)").as("dtw"),
        expr(s"round(acc / 1e6 / ${2 * m}, 6)").as("dtw_norm"))
  }

  /** The whole m×m DTW grid as ONE map-side integer fold: iterate the
    * cells row-major (t = i·m + j over sequence(0, m²−1)), maintaining
    * a rolling window S of the last m+1 DP values — dp(i,j−1) is the
    * window's last slot, dp(i−1,j) its 2nd, dp(i−1,j−1) its 1st — so
    * each step appends one value and shifts. CASE-gated edge cells
    * feed NULL into `least` (ignored), and cell (0,0) takes its bare
    * cost; the final answer is the window's last slot. Exact BIGINT
    * arithmetic end to end — bit-equal to the unrolled-join
    * formulation and to the oracle's wavefront replay. */
  private def dtwFoldSql(m: Int): String = {
    val w = m + 1
    s"""aggregate(
       |  sequence(0L, ${m * m - 1}L),
       |  array_repeat(CAST(NULL AS BIGINT), $w),
       |  (S, t) -> concat(slice(S, 2, $m), array(
       |    abs(element_at(pa, CAST(t div $m AS INT) + 1)
       |        - element_at(pb, CAST(t % $m AS INT) + 1))
       |    + CASE WHEN t = 0 THEN CAST(0 AS BIGINT) ELSE least(
       |        CASE WHEN t % $m > 0 THEN element_at(S, $w) END,
       |        CASE WHEN t >= $m THEN element_at(S, 2) END,
       |        CASE WHEN t >= $m AND t % $m > 0
       |          THEN element_at(S, 1) END) END)),
       |  S -> element_at(S, $w))""".stripMargin
  }

  /** Micro-quantized PAA mean over (__ps, __pc) — one double division
    * rounded back to micro. Shared with the oracle. */
  val paaMicroSql: String =
    "CAST(round(1000000 * CAST(__ps AS DOUBLE) / __pc, 0) AS BIGINT)"

  /** SAX — Symbolic Aggregate approXimation (Lin/Keogh 2003): each
    * key's ordered integer series → `segments` equal-width PAA means →
    * z-normalize against the key's own mean/std → map to letters at
    * the N(0,1) equiprobable breakpoints → one WORD per key. The
    * classic cheap series fingerprint: equal words ⇒ similar shapes,
    * so GROUP BY word is a shape-clustering and word distance lower-
    * bounds Euclidean distance (the paper's guarantee). The
    * time-series sibling of [[graft.operators.TextAnalysis]]'s
    * minimizer sketch — sublinear representation first, any pairwise
    * work on the tiny sketch table after.
    *
    * Exactness: PAA segment assignment is `((rn−1)·segments) div n`
    * (exact integers), mean/std come from exact BIGINT Σy and Σy²
    * (caller contract: values small enough that n·Σy² fits a double
    * exactly, i.e. < 2⁵³ — quantities yes, cents no), and the z-score
    * is ONE shared-text double chain, so the letter comparisons see
    * bit-identical doubles in both engines. Constant series (std = 0)
    * map every segment to the middle letter 'b'.
    *
    * Plan: two key-hashed aggregates (segment PAA + key stats) and a
    * word concat over `segments` rows per key — nothing is ever
    * all-pairs; keys partition freely. */
  def saxWords(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      segments: Int = 8): DataFrame = {
    require(segments >= 2 && segments <= 64,
      s"segments must be in [2, 64]: $segments")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val rows = df
      .select(col(keyCol), col(orderCol),
        col(valueCol).cast("long").as("__y"))
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1))
        .over(Window.partitionBy(col(keyCol))).cast("long"))
      .withColumn("__seg", expr(s"((__rn - 1) * $segments) div __n"))
    val paa = rows.groupBy(col(keyCol), col("__seg"))
      .agg(sum(col("__y")).cast("long").as("__ps"),
        count(lit(1)).cast("long").as("__pc"))
    val stats = rows.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col("__y")).cast("long").as("__s"),
        sum(col("__y") * col("__y")).cast("long").as("__q"))
    paa.join(stats, Seq(keyCol))
      .withColumn("__sym", expr(saxSymbolSql))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n"),
        array_join(transform(array_sort(
            collect_list(struct(col("__seg"), col("__sym")))),
          x => x("__sym")), "").as("sax_word"))
  }

  /** PAA z-score → letter over (__ps, __pc, __n, __s, __q): std from
    * exact integer moments (n·Σy² − (Σy)² under one sqrt), breakpoints
    * ±0.6745 and 0 (N(0,1) quartiles → 4 equiprobable letters).
    * Shared with the oracle. */
  val saxSymbolSql: String = {
    val mean = "CAST(__s AS DOUBLE) / __n"
    val std = "sqrt((CAST(__n AS DOUBLE) * CAST(__q AS DOUBLE) - " +
      "CAST(__s AS DOUBLE) * CAST(__s AS DOUBLE)) / " +
      "(CAST(__n AS DOUBLE) * CAST(__n AS DOUBLE)))"
    val z = s"(CAST(__ps AS DOUBLE) / __pc - ($mean)) / ($std)"
    s"CASE WHEN ($std) = 0 THEN 'b' WHEN ($z) < -0.6745 THEN 'a' " +
      s"WHEN ($z) < 0 THEN 'b' WHEN ($z) < 0.6745 THEN 'c' " +
      "ELSE 'd' END"
  }

  /** AR(2) fit by Yule–Walker over the [[autocorr]] Pearson-pairs
    * ρ₁/ρ₂ (the same convention [[pacf]]'s Durbin–Levinson uses), plus
    * an unrolled `horizon`-step mean-reverting forecast per key:
    * φ₁ = ρ₁(1−ρ₂)/(1−ρ₁²), φ₂ = (ρ₂−ρ₁²)/(1−ρ₁²), then
    * x̂_{n+h} = μ + φ₁(x̂_{n+h−1}−μ) + φ₂(x̂_{n+h−2}−μ) seeded from the
    * last two observations. Determinism: ρ's arrive ROUNDED (6 dp) so
    * both engines start the φ/forecast chain from identical doubles;
    * μ and the seeds are exact-integer derived; every double step is
    * the SAME spliced SQL text ([[ar2Phi1Sql]]/[[arStepSql]], the
    * pacfSteps discipline). Keys with degenerate ρ (zero variance or
    * |1−ρ₁²| ≤ 1e-12) forecast NULL by contract, never a crash.
    *
    * Scale shape: two [[autocorr]] lag aggregates + one moment
    * aggregate + one last-two pivot (key-partitioned window capped at
    * 2 rows before the shuffle), all joined key-wise; the unrolled
    * forecast is per-row column arithmetic — nothing wider than the
    * key ever shuffles, and `horizon` is a column budget (≤ 24), not
    * a job count. */
  def ar2Forecast(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, horizon: Int = 6): DataFrame = {
    require(horizon >= 1 && horizon <= 24,
      s"horizon must be in [1, 24] (unrolled-column budget): $horizon")
    import org.apache.spark.sql.expressions.Window
    val r1 = autocorr(perBucket, keyCol, bucketCol, valueCol, 1)
      .select(col(keyCol), col("acf").as("rho1"))
    val r2 = autocorr(perBucket, keyCol, bucketCol, valueCol, 2)
      .select(col(keyCol), col("acf").as("rho2"))
    val base = perBucket.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_series"),
        sum(col(valueCol).cast("long")).as("sv"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol).desc)
    val lastTwo = perBucket
      .select(col(keyCol), col(bucketCol), col(valueCol).cast("long").as("__y"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy(col(keyCol))
      .agg(max(when(col("__rn") === 1, col("__y"))).as("xn"),
        max(when(col("__rn") === 2, col("__y"))).as("xn1"))
    val fitted = base.join(r1, Seq(keyCol)).join(r2, Seq(keyCol))
      .join(lastTwo, Seq(keyCol))
      .withColumn("mu", expr("CAST(sv AS DOUBLE) / n_series"))
      .withColumn("phi1", expr(ar2Phi1Sql))
      .withColumn("phi2", expr(ar2Phi2Sql))
      .withColumn("f0", expr("CAST(xn AS DOUBLE)"))
      .withColumn("fm1", expr("CAST(xn1 AS DOUBLE)"))
    val stepped = (1 to horizon).foldLeft(fitted) { (d, h) =>
      val p1 = if (h == 1) "f0" else s"f${h - 1}"
      val p2 = if (h == 1) "fm1" else if (h == 2) "f0" else s"f${h - 2}"
      d.withColumn(s"f$h", expr(arStepSql(p1, p2)))
    }
    stepped.select(
        col(keyCol), col("n_series"),
        round(col("phi1"), 6).as("phi1"),
        round(col("phi2"), 6).as("phi2"),
        posexplode(array((1 to horizon).map(h => col(s"f$h")): _*))
          .as(Seq("__p", "__f")))
      .select(col(keyCol), col("n_series"), col("phi1"), col("phi2"),
        (col("__p") + 1).cast("long").as("h"),
        round(col("__f"), 6).as("forecast"))
  }

  /** Yule–Walker φ₁ over (rho1, rho2); NULL when 1−ρ₁² degenerates
    * (the pacfSteps guard style). Shared with the oracle. */
  val ar2Phi1Sql: String =
    "CASE WHEN abs(1.0 - rho1 * rho1) > 1e-12 " +
      "THEN (rho1 * (1.0 - rho2)) / (1.0 - rho1 * rho1) END"

  /** Yule–Walker φ₂ over (rho1, rho2); same guard. */
  val ar2Phi2Sql: String =
    "CASE WHEN abs(1.0 - rho1 * rho1) > 1e-12 " +
      "THEN (rho2 - rho1 * rho1) / (1.0 - rho1 * rho1) END"

  /** One mean-reverting AR(2) forecast step over (mu, phi1, phi2) and
    * the two predecessor columns. Shared with the oracle. */
  def arStepSql(prev1: String, prev2: String): String =
    s"mu + phi1 * ($prev1 - mu) + phi2 * ($prev2 - mu)"

  /** Matrix profile (z-normalized Euclidean, window `m`, exclusion
    * zone `excl`) over ONE gap-free integer series `(tCol, xCol)`:
    * for every length-m subsequence, the distance to its nearest
    * non-trivial neighbor and that neighbor's start — the standard
    * motif/discord primitive (Yeh et al., ICDM 2016; this is the
    * exact O(n²) profile computed set-wise, not the STOMP recurrence,
    * which is inherently sequential). Determinism: window dot products
    * and moment sums are EXACT BIGINTs (the series is integer by
    * contract); each pair's distance is ONE spliced double expression
    * ([[mpDistSql]]) rounded to 6 dp BEFORE the arg-min, whose
    * tie-break is the smaller neighbor index — so profile and indices
    * are engine-exact. Zero-variance windows (σ = 0, z-norm undefined)
    * drop out of both sides of the arg-min by contract.
    *
    * Scale shape: the series is probed once (1-row bounds action),
    * then pairs enumerate as (offset δ, start) — the δ frame is
    * broadcast, products rolling-sum per δ partition (ONE window pass,
    * never an n²·m explode), and the arg-min is a start-keyed
    * aggregate. Total work is Θ(n²) pairs BY DEFINITION of the exact
    * profile — `maxN` is the valve (default 20k starts ≈ 2·10⁸ pairs);
    * longer series should PAA/SAX-sketch first ([[saxWords]]) or shard
    * by regime. The raw-data side (bucketing events into the series)
    * is one groupBy at any corpus scale. */
  def matrixProfile(
      series: DataFrame, tCol: String, xCol: String,
      m: Int = 24, excl: Int = 12, maxN: Long = 20000L): DataFrame = {
    require(m >= 4, s"window m must be >= 4: $m")
    require(excl >= 1, s"exclusion zone must be >= 1: $excl")
    import org.apache.spark.sql.expressions.Window
    val s = series
      .select(col(tCol).cast("long").as("t"), col(xCol).cast("long").as("x"))
      .materialize
    val b = s.agg(min(col("t")).as("t0"), max(col("t")).as("t1"),
      count(lit(1)).as("n")).collect()(0)
    require(b.getLong(2) > 0L, "series is empty — nothing to profile")
    val (t0, t1, n) = (b.getLong(0), b.getLong(1), b.getLong(2))
    require(n == t1 - t0 + 1,
      s"series must be gap-free: ${t1 - t0 + 1 - n} missing buckets " +
        "(fillBucketGaps first)")
    require(n <= maxN,
      s"series length $n exceeds maxN=$maxN — the exact profile is " +
        "O(n^2) pairs; PAA/SAX-sketch or shard longer series")
    val nw = n - m + 1 // number of window starts
    require(nw > excl,
      s"need more than excl=$excl windows (have $nw): series too short " +
        s"for m=$m")
    val lastStart = t1 - m + 1
    // per-window moment sums (full windows only)
    val wOrd = Window.orderBy(col("t")).rowsBetween(0, m - 1)
    val wv = s.select(col("t").as("i"),
        sum(col("x")).over(wOrd).cast("long").as("sx"),
        sum(col("x") * col("x")).over(wOrd).cast("long").as("sxx"))
      .filter(col("i") <= lastStart)
      .materialize
    // product series per offset δ, rolling-summed into Q(i, i+δ)
    val deltas = series.sparkSession.range(excl.toLong, nw)
      .select(col("id").as("d"))
    val wQ = Window.partitionBy(col("d")).orderBy(col("t"))
      .rowsBetween(0, m - 1)
    val q = s.crossJoin(broadcast(deltas))
      .join(s.select(col("t").as("__t2"), col("x").as("__x2")),
        col("__t2") === col("t") + col("d"))
      .select(col("d"), col("t"), (col("x") * col("__x2")).as("z"))
      .withColumn("q", sum(col("z")).over(wQ).cast("long"))
      .filter(col("t") <= lit(lastStart) - col("d"))
      .select(col("t").as("i"), (col("t") + col("d")).as("j"), col("q"))
    val pairs = q
      .join(wv.select(col("i"), col("sx").as("sxi"), col("sxx").as("sxxi")),
        Seq("i"))
      .join(wv.select(col("i").as("j"), col("sx").as("sxj"),
        col("sxx").as("sxxj")), Seq("j"))
      .select(col("i"), col("j"), expr(mpDistSql(m)).as("dist"))
      .filter(col("dist").isNotNull)
    pairs.union(pairs.select(col("j").as("i"), col("i").as("j"), col("dist")))
      .groupBy(col("i").as("window_start"))
      .agg(min(struct(col("dist"), col("j"))).as("__m"))
      .select(col("window_start"),
        col("__m")("j").as("nn_start"),
        col("__m")("dist").as("nn_dist"))
  }

  /** z-normalized Euclidean distance over the exact BIGINT pair row
    * (q, sxi, sxxi, sxj, sxxj): d = √(2m(1 − corr)) with
    * corr = (mQ − SᵢSⱼ)/(√(mΣᵢ²−Sᵢ²)·√(mΣⱼ²−Sⱼ²)) — numerator and
    * variances are exact integer products, one double finish, rounded
    * BEFORE the arg-min; NULL on a zero-variance window. Shared with
    * the oracle. */
  def mpDistSql(m: Int): String = {
    val vi = s"(CAST($m AS BIGINT) * sxxi - sxi * sxi)"
    val vj = s"(CAST($m AS BIGINT) * sxxj - sxj * sxj)"
    val num = s"(CAST($m AS BIGINT) * q - sxi * sxj)"
    s"CASE WHEN $vi > 0 AND $vj > 0 THEN " +
      s"round(sqrt(greatest(0.0, CAST(${2 * m} AS DOUBLE) * " +
      s"(1.0 - CAST($num AS DOUBLE) / " +
      s"(sqrt(CAST($vi AS DOUBLE)) * sqrt(CAST($vj AS DOUBLE)))))), 6) END"
  }

  /** Poisson trend regression y ~ Poisson(exp(a + b·x)) by IRLS with a
    * FIXED iteration count — the GLM counterpart of [[trendOls]] for
    * count series ("is traffic growing exponentially, and how fast"):
    * per round, working response z = η + (y−μ)/μ and weight w = μ give
    * the weighted-OLS update for (a, b). Emits one row PER ITERATION so
    * the convergence trajectory is pinned, not just the endpoint.
    *
    * Determinism: each round's five weighted moments are MICRO-QUANTIZED
    * per row (round(10⁶·term) as BIGINT — w·z = μη + y − μ, so no
    * per-row division feeds a float sum) and summed exactly; the (a, b)
    * update is ONE shared double text ([[poissonBSql]]/[[poissonASql]])
    * over the integer sums, and exp/ln match engines at any magnitude
    * (the verify-skill libm note) — so every iteration starts from
    * bit-identical params on both engines. Quantization bound: per-row
    * |x·(μη + y − μ)| must stay ≤ ~9·10¹² (int64 at micro), i.e. counts
    * to ~10⁶ on buckets to ~10² — rescale x (day index, not epoch-ms!)
    * or pre-divide y beyond that.
    *
    * Scale shape: one aggregate pass per iteration over the bucketed
    * series (already tiny relative to the raw corpus); params are a
    * 1-row broadcast, materialized per round so the k-th iteration
    * never replays rounds 1..k−1. */
  def poissonTrend(
      series: DataFrame, xCol: String, yCol: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"iters must be in [1, 8]: $iters")
    val s = series
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .materialize
    def micro(e: String) = expr(s"CAST(ROUND(($e) * 1000000, 0) AS BIGINT)")
    // params are a 1-ROW driver fold (the sanctioned inherently-
    // sequential pattern): the init and every update still execute as
    // the SHARED SQL text inside Spark — the driver only carries
    // (n, a, b) between rounds
    var (n0, a0, b0) = {
      val r = s.agg(count(lit(1)).cast("long").as("n"),
          sum(col("y")).cast("long").as("sy"))
        .collect()(0)
      val (nn, sy) =
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      require(nn > 0L && sy > 0L,
        s"Poisson trend needs a nonempty series with positive total " +
          s"count (rows=$nn) — ln of a zero mean is not a fit")
      // the init still evaluates as Spark SQL over the exact counts
      // (engine parity with the oracle's i0 text)
      val a = s.sparkSession
        .sql(s"SELECT ln(CAST($sy AS DOUBLE) / $nn) AS a")
        .collect()(0).getDouble(0)
      (nn, a, 0.0)
    }
    val trail = (1 to iters).map { i =>
      val r = s
        .withColumn("a", lit(a0)).withColumn("b", lit(b0))
        .withColumn("eta", expr("a + b * x"))
        .withColumn("mu", expr("exp(a + b * x)"))
        .agg(
          sum(micro("mu")).as("w"),
          sum(micro("mu * x")).as("wx"),
          sum(micro("mu * x * x")).as("wxx"),
          sum(micro("mu * eta + y - mu")).as("wz"),
          sum(micro("x * (mu * eta + y - mu)")).as("wxz"))
        .withColumn("b", expr(poissonBSql))
        .withColumn("a", expr(poissonASql))
        .select(col("a"), col("b")).collect()(0)
      a0 = r.getDouble(0); b0 = r.getDouble(1)
      (i.toLong, n0, a0, b0)
    }
    import s.sparkSession.implicits._
    trail.toDF("iter", "n", "a", "b")
      .select(col("iter"), col("n"),
        round(col("a"), 6).as("a"), round(col("b"), 6).as("b"))
  }

  /** IRLS slope update over the micro-quantized moment row
    * (w, wx, wxx, wz, wxz) — the quantization scale cancels. Shared
    * with the oracle. */
  val poissonBSql: String =
    "(CAST(w AS DOUBLE) * wxz - CAST(wx AS DOUBLE) * wz) / " +
      "(CAST(w AS DOUBLE) * wxx - CAST(wx AS DOUBLE) * wx)"

  /** IRLS intercept update over the moment row + the just-updated `b`.
    * Shared with the oracle. */
  val poissonASql: String =
    "(CAST(wz AS DOUBLE) - b * CAST(wx AS DOUBLE)) / CAST(w AS DOUBLE)"

  /** Local-level Kalman filter (the simplest state-space model:
    * x_t = x_{t−1} + w, y_t = x_t + v) over per-key step series — the
    * probabilistic smoother the TS family lacked: unlike EWMA's fixed
    * alpha, the gain ADAPTS (high while the state is uncertain, low
    * once it converges), which is the textbook noisy-counter
    * level-tracker. Fixed `steps` unrolled as NAMED per-step columns
    * (the Viterbi lesson — a self-referencing Column tree grows
    * k^steps).
    *
    * Exactness: state (m, P) lives in exact MILLI longs; each step
    * does one double division (the gain) and one double product, each
    * immediately rounded back to milli ([[kalmanMUpdateSql]] /
    * [[kalmanPUpdateSql]], shared verbatim with the oracle), so no
    * float SUM ever crosses engines and the FMA-contraction hazard
    * (m + K·innov as one fused expression) is quantized away. Missing
    * steps observe y = 0 (callers gap-fill or accept the zero-count
    * reading — counts ARE zero on empty days).
    *
    * Input: (key, idx ∈ [0, steps), yMilli). Output per key: filtered
    * level and variance after the last step plus the last gain —
    * one conditional-aggregate pivot and a map-side column chain;
    * keys partition freely, nothing iterates on the driver. */
  def kalmanLocalLevel(
      df: DataFrame, keyCol: String, idxCol: String, yMilliCol: String,
      steps: Int = 8, qMilli: Long = 4000L, rMilli: Long = 100000L,
      p0Milli: Long = 10000000L): DataFrame = {
    require(steps >= 1 && steps <= 16, s"steps must be in [1, 16]: $steps")
    require(qMilli > 0 && rMilli > 0 && p0Milli > 0,
      s"variances must be positive: $qMilli/$rMilli/$p0Milli")
    val aggs = (0 until steps).map(k =>
      coalesce(max(when(col(idxCol) === k.toLong, col(yMilliCol))),
        lit(0L)).as(s"__y$k"))
    val wide = df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    var cur = wide
      .withColumn("__m0", lit(0L))
      .withColumn("__p0", lit(p0Milli))
    (1 to steps).foreach { t =>
      val (pm, pp, y) = (s"__m${t - 1}", s"__p${t - 1}", s"__y${t - 1}")
      cur = cur
        .withColumn(s"__pp$t", expr(s"$pp + $qMilli"))
        .withColumn(s"__m$t",
          expr(kalmanMUpdateSql(pm, s"__pp$t", y, rMilli)))
        .withColumn(s"__p$t", expr(kalmanPUpdateSql(s"__pp$t", rMilli)))
    }
    cur.select(col(keyCol),
      expr(s"round(CAST(__m$steps AS DOUBLE) / 1000, 6)").as("level"),
      expr(s"round(CAST(__p$steps AS DOUBLE) / 1000, 6)").as("variance"),
      expr(s"round(CAST(__pp$steps AS DOUBLE) / (__pp$steps + $rMilli), 6)")
        .as("last_gain"))
  }

  /** Milli state update m' = m + round(K·(y − m)): ONE double division
    * and ONE product, rounded straight back to exact milli. Shared
    * verbatim with the oracle. */
  def kalmanMUpdateSql(m: String, pp: String, y: String, rm: Long): String =
    s"$m + CAST(ROUND(CAST($pp AS DOUBLE) / ($pp + $rm) * ($y - $m), 0) " +
      "AS BIGINT)"

  /** Milli variance update P' = round(Pp·R / (Pp + R)) — the
    * multiply-then-divide form with no float add. Shared verbatim. */
  def kalmanPUpdateSql(pp: String, rm: Long): String =
    s"CAST(ROUND(CAST($pp AS DOUBLE) * $rm / ($pp + $rm), 0) AS BIGINT)"

  /** Binary segmentation to `depth` levels — MULTIPLE changepoints,
    * the recursive extension of [[changepoint]] (one split) that
    * real drift audits need (a series that jumps twice fools a single
    * split into the middle): level 0 takes each group's best
    * between-segment-SS split; every level after re-runs the same
    * argmax INSIDE each resulting segment, so depth 2 yields up to 3
    * ordered changepoints per group. `minSeg` keeps both halves of
    * every accepted split at least that long (degenerate 1-point
    * segments score high on noise). Ties break toward the smaller x;
    * scores are the exact micro-quantized [[binsegScoreSql]] shared
    * with the oracle.
    *
    * Output: one row per ACCEPTED split — (group, level, seg, the
    * binary segment path at that level, split_after_x, score_micro,
    * n, n_left).
    *
    * Scale shape per level: the same group×segment-keyed prefix-sum
    * windows as [[changepoint]] plus one argmax window — segment
    * labels ride the rows, so groups and segments partition freely
    * and each level is two window passes over the data, never a
    * per-split job. */
  def binarySegmentation(
      df: DataFrame, groupCol: String, xCol: String, yCol: String,
      depth: Int = 2, minSeg: Int = 2): DataFrame = {
    require(depth >= 1 && depth <= 4, s"depth must be in [1, 4]: $depth")
    require(minSeg >= 1, s"minSeg must be >= 1: $minSeg")
    import org.apache.spark.sql.expressions.Window
    var rows = df.select(col(groupCol).as("g"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("seg", lit(0L))
    var out: DataFrame = null
    (0 until depth).foreach { level =>
      val w = Window.partitionBy(col("g"), col("seg")).orderBy(col("x"))
      val wAll = Window.partitionBy(col("g"), col("seg"))
      val ranked = rows
        .withColumn("sl", sum(col("y")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nl", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll).cast("long"))
        .withColumn("s", sum(col("y")).over(wAll).cast("long"))
        .filter(col("nl") >= minSeg.toLong &&
          col("n") - col("nl") >= minSeg.toLong)
        .withColumn("score_micro", expr(binsegScoreSql))
      val pick = Window.partitionBy(col("g"), col("seg"))
        .orderBy(col("score_micro").desc, col("x"))
      val best = ranked.withColumn("rn", row_number().over(pick))
        .filter(col("rn") === 1)
        .select(col("g"), col("seg"), col("x").as("split_after_x"),
          col("score_micro"), col("n"), col("nl").as("n_left"))
        .materialize
      val lvl = best.select(col("g"), lit(level.toLong).as("level"),
        col("seg"), col("split_after_x"), col("score_micro"),
        col("n"), col("n_left"))
      out = if (out == null) lvl else out.unionByName(lvl)
      rows = rows
        .join(best.select(col("g"), col("seg"), col("split_after_x")),
          Seq("g", "seg"), "left")
        .withColumn("seg",
          col("seg") * 2 + when(col("split_after_x").isNotNull &&
            col("x") > col("split_after_x"), 1L).otherwise(0L))
        .drop("split_after_x")
    }
    out.select(col("g").as(groupCol), col("level"), col("seg"),
      col("split_after_x"), col("score_micro"), col("n"), col("n_left"))
  }

  /** Additive Holt–Winters with weekly seasonality over a fixed
    * 14-step (two-season) window — the SEASONAL member completing the
    * smoothing family ([[holt]] = level+trend, EWMA = level,
    * [[kalmanLocalLevel]] = adaptive gain; this one forecasts the
    * weekly shape): classic textbook init (level = week-1 mean, trend
    * = (week-2 − week-1 sums)/49, seasonals = week-1 deviations), then
    * seven smoothing steps over week 2 with DYADIC weights α=1/2,
    * β=γ=1/4 — so every update is integer add/multiply plus ONE
    * floor division, written once as [[floorDivSql]] and shared
    * verbatim with the oracle: the whole recursion is exact BIGINT
    * arithmetic, no doubles anywhere.
    *
    * Output per key: smoothed level/trend after step 14 and the h=1
    * and h=7 forecasts (level + h·trend + updated seasonal), all in
    * the input's integer unit.
    *
    * Plan: one conditional-aggregate pivot per key + a map-side named
    * column chain (the [[kalmanLocalLevel]] shape); keys partition
    * freely. */
  def holtWintersInt(
      df: DataFrame, keyCol: String, idxCol: String,
      yCol: String): DataFrame = {
    val aggs = (0 until 14).map(k =>
      coalesce(max(when(col(idxCol) === k.toLong, col(yCol))), lit(0L))
        .as(s"__y$k"))
    val wide = df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val s1 = (0 until 7).map(k => s"__y$k").mkString(" + ")
    val s2 = (7 until 14).map(k => s"__y$k").mkString(" + ")
    var cur = wide
      .withColumn("__l6", expr(floorDivSql(s1, 7)))
      .withColumn("__b6", expr(floorDivSql(s"($s2) - ($s1)", 49)))
    (0 until 7).foreach { j =>
      cur = cur.withColumn(s"__sea$j", expr(s"__y$j - __l6"))
    }
    (7 until 14).foreach { t =>
      val j = t - 7
      cur = cur
        .withColumn(s"__l$t", expr(floorDivSql(
          s"__y$t - __sea$j + __l${t - 1} + __b${t - 1}", 2)))
        .withColumn(s"__b$t", expr(floorDivSql(
          s"__l$t - __l${t - 1} + 3 * __b${t - 1}", 4)))
        .withColumn(s"__su$j", expr(floorDivSql(
          s"__y$t - __l$t + 3 * __sea$j", 4)))
    }
    cur.select(col(keyCol),
      col("__l13").as("level"), col("__b13").as("trend"),
      expr("__l13 + 1 * __b13 + __su0").as("fc_1"),
      expr("__l13 + 7 * __b13 + __su6").as("fc_7"))
  }

  /** Portable exact floor division (d > 0): identical text in Spark
    * and DuckDB — `%` follows the dividend's sign in both, the
    * corrected remainder makes the numerator an exact multiple, and
    * the double `/` is exact on multiples below 2^53. */
  def floorDivSql(x: String, d: Long): String =
    s"CAST((($x) - (((($x) % $d) + $d) % $d)) / $d AS BIGINT)"

  /** Croston's method for INTERMITTENT demand — the forecaster for
    * series that are mostly zeros with occasional positive demand
    * (spare parts, long-tail SKUs), where plain exponential smoothing
    * ([[holt]]) collapses toward zero between demands. Two coupled
    * EWMAs run over DEMAND EVENTS only: demand size
    * `z ← (α·q·scale + (1−α)·z) / 1` and inter-demand interval
    * `p ← α·I + (1−α)·p`; the per-period forecast is z/p, and the
    * Syntetos–Boylan approximation (SBA) debiases it by (1 − α/2).
    *
    * EXACT ARITHMETIC CONTRACT (the [[holt]] discipline): α =
    * alphaNum/alphaDen rational, state in `scale`-scaled fixed point,
    * every step divides with TRUNCATING semantics — a recursive-CTE
    * oracle replays the fold bit for bit. Initialization: the first
    * demand sets z = q₁·scale, p = scale (interval 1); each later
    * demand updates both EWMAs with its size and its observed gap.
    * The two forecasts are the only double steps (ratios of final
    * fixed points, round 6).
    *
    * `maxDemands` BOUNDS the per-key fold: only the LAST maxDemands
    * demand events feed the recurrence (α-geometric weights make the
    * dropped prefix's influence (1−α)^maxDemands ≈ 0, but the CONTRACT
    * is the truncated fold itself, so both engines replay the same
    * series at any scale) — at 100 TB a hot key's history collapses to
    * a fixed-size tail instead of an unbounded driver-side array.
    *
    * Plan shape: one key-hashed aggregate collects the bounded sorted
    * demand tail; the fold is a map-side `aggregate()` HOF over ≤
    * maxDemands elements — zero joins, zero iteration rounds. */
  def crostonInt(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      qtyCol: String,
      alphaNum: Long = 3L, alphaDen: Long = 10L,
      scale: Long = 1000000L, maxDemands: Int = 64): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be in (0,1): $alphaNum/$alphaDen")
    require(maxDemands >= 2, s"maxDemands must be >= 2: $maxDemands")
    val an = alphaNum; val ad = alphaDen
    perBucket
      .filter(col(qtyCol) > 0L)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast("long").as("n_demands"),
        sort_array(collect_list(struct(
          col(bucketCol).cast("long").as("b"),
          col(qtyCol).cast("long").as("q")))).as("__all"))
      // slice with a start beyond the array's length yields EMPTY, so
      // clamp the tail window to the series length
      .withColumn("__tail", expr(
        s"slice(__all, -least(size(__all), $maxDemands), $maxDemands)"))
      .withColumn("__st", expr(
        // state: (z_fp, p_fp, prev_bucket, seen) — seen gates the init
        s"""aggregate(__tail,
           |  named_struct('z', CAST(0 AS BIGINT), 'p', CAST(0 AS BIGINT),
           |    'prev', CAST(0 AS BIGINT), 'seen', CAST(0 AS BIGINT)),
           |  (s, x) -> IF(s.seen = 0,
           |    named_struct('z', x.q * $scale, 'p', CAST($scale AS BIGINT),
           |      'prev', x.b, 'seen', CAST(1 AS BIGINT)),
           |    named_struct(
           |      'z', CAST(($an * x.q * $scale + ($ad - $an) * s.z) div $ad
           |        AS BIGINT),
           |      'p', CAST(($an * (x.b - s.prev) * $scale
           |        + ($ad - $an) * s.p) div $ad AS BIGINT),
           |      'prev', x.b, 'seen', s.seen + 1)))""".stripMargin))
      .select(col(keyCol), col("n_demands"),
        col("__st.z").as("z_fp"), col("__st.p").as("p_fp"),
        expr(crostonFcSql("__st.z", "__st.p")).as("croston_fc"),
        expr(crostonSbaSql("__st.z", "__st.p", an, ad)).as("sba_fc"))
  }

  /** Per-period Croston forecast z/p — ONE double step from exact
    * fixed points; shared with the oracle. */
  def crostonFcSql(z: String, p: String): String =
    s"round(CAST($z AS DOUBLE) / CAST($p AS DOUBLE), 6)"

  /** Syntetos–Boylan debias (1 − α/2)·z/p with the rational α kept
    * exact in the numerator; shared with the oracle. */
  def crostonSbaSql(z: String, p: String, an: Long, ad: Long): String =
    s"round((CAST(${2 * ad - an} AS DOUBLE) * CAST($z AS DOUBLE)) / " +
      s"(CAST(${2 * ad} AS DOUBLE) * CAST($p AS DOUBLE)), 6)"

  /** Permutation entropy (Bandt–Pompe, order m = 3) — model-free series
    * complexity: slide a 3-wide window over each key's series, encode
    * each window's ORDINAL pattern (the permutation that sorts it, ties
    * broken by time position — the standard stable rule), and take the
    * Shannon entropy of the pattern distribution. Near 0 = monotone /
    * strongly regular dynamics, near 1 (normalized by ln 3!) = white
    * noise. Distinguishes equal-variance series that [[autocorr]] and
    * spectral moments cannot.
    *
    * Exactness: ordinal ranks are pure integer comparisons; pattern
    * counts are exact longs; each entropy term −(c/n)·ln(c/n) is
    * micro-quantized per PATTERN and summed exactly (≤ 6 terms — an
    * order-dependent double Σ would not cross engines), leaving the
    * final normalization as the one double step.
    *
    * Plan: two LEADs over the per-key window, one (key, pattern)
    * aggregate, one key aggregate — no joins, partitions by key. */
  def permutationEntropy(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val tri = perBucket
      .select(col(keyCol), col(bucketCol),
        col(valueCol).cast("long").as("v1"))
      .withColumn("v2", lead(col("v1"), 1).over(w))
      .withColumn("v3", lead(col("v1"), 2).over(w))
      .filter(col("v3").isNotNull)
      .withColumn("pat", expr(permPatternSql("v1", "v2", "v3")))
    tri
      .groupBy(col(keyCol), col("pat"))
      .agg(count(lit(1)).cast("long").as("c"))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(col(keyCol))).cast("long"))
      .groupBy(col(keyCol))
      .agg(
        max(col("n")).as("n_windows"),
        count(lit(1)).cast("long").as("n_patterns"),
        sum(expr(entropyTermMicroSql("c", "n"))).cast("long")
          .as("h_micro"))
      .select(col(keyCol), col("n_windows"), col("n_patterns"),
        col("h_micro"),
        expr(s"round(CAST(h_micro AS DOUBLE) / (1000000.0 * ln(6.0)), 6)")
          .as("h_norm"))
  }

  /** Ordinal pattern of (v1, v2, v3) as the 3-digit code r1·100 +
    * r2·10 + r3, where r_i = #{j : v_j < v_i} + #{j < i : v_j = v_i}
    * (stable argsort — ties rank by time position). Pure integer
    * CASE arithmetic; shared with the oracle. */
  def permPatternSql(a: String, b: String, c: String): String = {
    def lt(x: String, y: String) = s"(CASE WHEN $x < $y THEN 1 ELSE 0 END)"
    def eq(x: String, y: String) = s"(CASE WHEN $x = $y THEN 1 ELSE 0 END)"
    val r1 = s"(${lt(b, a)} + ${lt(c, a)})"
    val r2 = s"(${lt(a, b)} + ${lt(c, b)} + ${eq(a, b)})"
    val r3 = s"(${lt(a, c)} + ${lt(b, c)} + ${eq(a, c)} + ${eq(b, c)})"
    s"CAST($r1 * 100 + $r2 * 10 + $r3 AS BIGINT)"
  }

  /** One micro-quantized entropy term −(c/n)·ln(c/n) — exact BIGINT
    * per bucket so the cross-bucket sum is order-free; shared with the
    * oracle. */
  def entropyTermMicroSql(c: String, n: String): String =
    s"CAST(ROUND(-1000000.0 * (CAST($c AS DOUBLE) / CAST($n AS DOUBLE)) " +
      s"* ln(CAST($c AS DOUBLE) / CAST($n AS DOUBLE)), 0) AS BIGINT)"

  /** Spectral entropy over an n-point integer series per key: DFT power
    * at k = 1..n/2 via the EXACT-phase-reduction trick (phase k·i mod n
    * reduces in integer arithmetic BEFORE the trig call — cos/sin of
    * large arguments hit libm argument-reduction differences across
    * engines), per-sample trig terms deci-quantized and summed as exact
    * BIGINTs, so every P_k = re² + im² and the total power are exact
    * integers both engines agree on bit for bit. The entropy of the
    * normalized power spectrum (micro-quantized per frequency, ≤ n/2
    * exact terms) separates narrowband/periodic series (low) from
    * broadband/noisy ones (high). Overflow headroom: |re| ≤ n·10·max|y|,
    * so y up to ~3e7 is safe at n = 32 under ANSI's loud overflow.
    *
    * Plan: series × small static k-range cross, one (key, k) aggregate,
    * one key aggregate — partitions by key throughout. */
  def spectralEntropy(
      series: DataFrame, keyCol: String, idxCol: String, yCol: String,
      n: Int = 32): DataFrame = {
    require(n >= 4 && n % 2 == 0, s"n must be even and >= 4: $n")
    val spark = series.sparkSession
    val ks = spark.range(1, n / 2 + 1).select(col("id").as("__k"))
    val terms = series
      .select(col(keyCol), col(idxCol).cast("long").as("__i"),
        col(yCol).cast("long").as("__y"))
      .filter(col("__i") >= 0L && col("__i") < n.toLong)
      .crossJoin(broadcast(ks))
      .withColumn("__n", lit(n.toLong))
    val pk = terms
      .groupBy(col(keyCol), col("__k"))
      .agg(
        sum(expr(dftTermDeciSql("cos"))).cast("long").as("re"),
        sum(expr(dftTermDeciSql("sin"))).cast("long").as("im"))
      .withColumn("p", expr("re * re + im * im"))
      .withColumn("tot", sum(col("p")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol)))
        .cast("long"))
    pk.groupBy(col(keyCol))
      .agg(
        max(col("tot")).as("total_power"),
        sum(when(col("p") > 0L, expr(entropyTermMicroSql("p", "tot")))
          .otherwise(0L)).cast("long").as("h_micro"))
      .select(col(keyCol), col("total_power"), col("h_micro"),
        expr(s"round(CAST(h_micro AS DOUBLE) / " +
          s"(1000000.0 * ln(${n / 2}.0)), 6)").as("h_norm"))
  }

  /** Sample entropy (SampEn, m = 2) — the regularity statistic of
    * physiological-series analysis: −ln(A/B) where B counts template
    * pairs of length m within Chebyshev tolerance `r` and A counts the
    * same pairs still matching at length m+1 (self-matches excluded by
    * the i<j pairing; both sets range over the n−m windows with a full
    * m+1 template, the standard formulation). Complements
    * [[permutationEntropy]]: SampEn sees AMPLITUDE regularity where
    * ordinal patterns see only order.
    *
    * Exactness: match predicates are pure integer compares, A and B
    * exact longs; −ln(A/B) is the one double step (round 6, null when
    * A = 0 — no matches at m+1 gives SampEn = ∞ by convention).
    *
    * Scale shape: the pair count is O(per-key windows²) by DEFINITION —
    * bounded here because keys are short per-entity series (a daily
    * month ≈ 30 points → ≤ ~400 pairs/key); the self-join is key-local
    * (equi-join on the key), so it partitions freely and never goes
    * cross-key. For long series, PAA-compress first (the q_dtw
    * recipe). */
  def sampleEntropy(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, r: Long): DataFrame = {
    require(r >= 0, s"tolerance r must be >= 0: $r")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val tri = perBucket
      .select(col(keyCol), col(bucketCol),
        col(valueCol).cast("long").as("v1"))
      .withColumn("v2", lead(col("v1"), 1).over(w))
      .withColumn("v3", lead(col("v1"), 2).over(w))
      .filter(col("v3").isNotNull)
      .withColumn("i", row_number().over(w).cast("long"))
      .select(col(keyCol), col("i"), col("v1"), col("v2"), col("v3"))
    val a = tri.toDF(tri.columns.map(c => if (c == keyCol) c else s"a_$c"): _*)
    val b = tri.toDF(tri.columns.map(c => if (c == keyCol) c else s"b_$c"): _*)
    a.join(b, Seq(keyCol))
      .filter(col("a_i") < col("b_i"))
      .groupBy(col(keyCol))
      .agg(
        sum(when(abs(col("a_v1") - col("b_v1")) <= r &&
          abs(col("a_v2") - col("b_v2")) <= r, 1L).otherwise(0L))
          .cast("long").as("b_pairs"),
        sum(when(abs(col("a_v1") - col("b_v1")) <= r &&
          abs(col("a_v2") - col("b_v2")) <= r &&
          abs(col("a_v3") - col("b_v3")) <= r, 1L).otherwise(0L))
          .cast("long").as("a_pairs"))
      .select(col(keyCol), col("b_pairs"), col("a_pairs"),
        expr(sampEnSql("a_pairs", "b_pairs")).as("sampen"))
  }

  /** −ln(A/B) at 6dp, null when either count is 0; shared with the
    * oracle. */
  def sampEnSql(a: String, b: String): String =
    s"CASE WHEN $a > 0 AND $b > 0 THEN " +
      s"round(-ln(CAST($a AS DOUBLE) / CAST($b AS DOUBLE)), 6) END"

  /** Expected shortfall (CVaR) — the tail MEAN past the VaR cut: per
    * key, the k worst (largest) values where k = max(1, ⌈tailPpm·n⌉),
    * their exact integer sum, the k-th largest as the VaR floor, and
    * the tail mean as the one double step. The coherent risk metric the
    * quantile family (q_percentile/q_approx_percentile) doesn't give:
    * VaR ignores how bad the tail is, ES averages it.
    *
    * One per-key window rank + one aggregate, exact integers
    * throughout; ties at the cut break on the bucket (deterministic
    * membership, both engines replay it). */
  def expectedShortfall(
      perBucket: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, tailPpm: Long = 50000L): DataFrame = {
    require(tailPpm > 0 && tailPpm <= 1000000L,
      s"tailPpm must be in (0, 1e6]: $tailPpm")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__v").desc, col(bucketCol))
    perBucket
      .select(col(keyCol), col(bucketCol),
        col(valueCol).cast("long").as("__v"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col(keyCol))).cast("long"))
      .withColumn("__k", expr(
        s"greatest(CAST(1 AS BIGINT), ($tailPpm * __n + 999999) div 1000000)"))
      .filter(col("__rk") <= col("__k"))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n"), max(col("__k")).as("k_tail"),
        min(col("__v")).as("var_floor"),
        sum(col("__v")).cast("long").as("tail_sum"))
      .withColumn("es", expr(
        "round(CAST(tail_sum AS DOUBLE) / CAST(k_tail AS DOUBLE), 6)"))
  }

  /** Deci-quantized per-sample DFT term y·fn(2π((k·i) mod n)/n)·10 —
    * the [[graft.operators.Multimodal.dftTermMicroSql]] construction at
    * ×10 so P_k = re² + im² stays inside exact signed-64 range; shared
    * with the oracle. */
  def dftTermDeciSql(fn: String): String =
    s"CAST(ROUND(10 * __y * $fn(2 * PI() * ((__k * __i) % __n) / __n), 0)" +
      " AS BIGINT)"
}
