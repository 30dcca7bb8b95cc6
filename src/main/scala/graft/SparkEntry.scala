package graft

import graft.operators.Sessionize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here is DataFrame-native (no collect, no driver loops) and is
  * written to stay deterministic under any partitioning: stable tie-breaks,
  * integer or round(x, 6) numerics, no hash/time dependence (FIXTURES.md
  * "Oracle-determinism rules").
  */
object SparkEntry {

  /** Read one driver-generated parquet table.
    *
    * `events.ts` is parquet `timestamp[ns]`, which Spark's reader rejects by
    * default; `nanosAsLong` (runtime-settable) reads it as epoch-nanos Long,
    * which we convert back to TimestampType here with integer division
    * (`div`, not `/` — epoch nanos exceed 2^53, double math would round). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_sessionize_gap")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Reference parity: sessionization + downstream OLAP (SURVEY §2.5, §2.7)
    "q_sessionize_gap" -> ((s, dir) => {
      Sessionize
        .gapSessionize(table(s, dir, "events"))
        .select(
          col("event_id"),
          col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("session_id"),
          col("session_idx"),
          col("duration"))
    }),
    "q_sessionize_full" -> ((s, dir) => {
      // Full reference rule set (gap + 1499-event + 12 h cuts); sequential
      // per key → no SQL oracle (driver records rows-only check).
      Sessionize
        .fullSessionize(table(s, dir, "events"))
        .select(
          col("tieBreak").as("event_id"),
          col("key").cast("long").as("user_id"),
          col("tsMillis").as("ts_ms"),
          col("sessionId").as("session_id"),
          col("sessionIdx").as("session_idx"),
          col("duration"))
    }),
    "q_session_duration" -> ((s, dir) => {
      val sess = Sessionize.gapSessionize(table(s, dir, "events"))
      Sessionize.sessionDurationPerUser(sess)
    }),
    "q_loyal_visitors" -> ((s, dir) => {
      val sess = Sessionize.gapSessionize(table(s, dir, "events"))
      Sessionize.loyalUsers(sess)
    }),
    "q_uniq_visitors" -> ((s, dir) =>
      table(s, dir, "events").agg(countDistinct(col("user_id")).as("uniq_visitors"))),

    // ---- OLAP surface over the star schema (SURVEY §2.8)
    "q1_agg" -> ((s, dir) => {
      // TPC-H Q1-shaped pricing summary. Money sums go through integer cents
      // (round-per-term then integer sum) so the result is bit-deterministic
      // under any aggregation order — double sums are not.
      val li = table(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("sum_base_cents"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0).cast("long"))
            .as("sum_disc_cents"),
          count(lit(1)).as("n_rows"))
    }),
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_sessionize_gap" -> gapSessionizeSql,
    "q_session_duration" ->
      s"""SELECT user_id, CAST(SUM(max_d) AS BIGINT) AS total_duration FROM (
         |  SELECT user_id, session_id, MAX(duration) AS max_d
         |  FROM ($gapSessionizeSql) GROUP BY user_id, session_id
         |) GROUP BY user_id""".stripMargin,
    "q_loyal_visitors" ->
      s"""SELECT user_id, n_sessions FROM (
         |  SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions
         |  FROM ($gapSessionizeSql) GROUP BY user_id
         |) WHERE n_sessions > 1""".stripMargin,
    "q_uniq_visitors" ->
      "SELECT COUNT(DISTINCT user_id) AS uniq_visitors FROM events",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )

  /** Gap-only sessionize as ANSI window SQL (DuckDB dialect-safe): identical
    * semantics to [[Sessionize.gapSessionize]] — integer-millis arithmetic,
    * floor-to-seconds duration, (ts, event_id) total order. */
  private val gapSessionizeSql: String =
    """SELECT event_id, user_id, ms AS ts_ms,
      |  CAST(user_id AS VARCHAR) || '-' || CAST(first_ms AS VARCHAR) AS session_id,
      |  CAST(session_idx AS BIGINT) AS session_idx,
      |  CAST(ms // 1000 - first_ms // 1000 AS BIGINT) AS duration
      |FROM (
      |  SELECT *, MIN(ms) OVER (PARTITION BY user_id, session_idx) AS first_ms
      |  FROM (
      |    SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS session_idx
      |    FROM (
      |      SELECT event_id, user_id, epoch_ms(ts) AS ms,
      |        CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL
      |                  OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > 1800000
      |             THEN 1 ELSE 0 END AS is_new
      |      FROM events
      |    )
      |  )
      |)""".stripMargin
}
