package graft

import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Golden end-to-end tripwire (SURVEY.md §5.3): the canonical sessionize
  * output on the deterministic sf0.001 events is pinned to an md5. The
  * DuckDB oracle can't catch a bug where the Spark query and its oracle SQL
  * drift together; this hash can. If a change is INTENTIONALLY semantic
  * (like the round-1 gap-unit unification), recompute and update the hash
  * in the same commit, with the reason. */
class GoldenSpec extends SparkFunSuite {
  import spark.implicits._

  test("gap sessionize on sf0.001 matches the pinned golden hash") {
    val rows = SparkEntry.queries("q_sessionize_gap")(spark, sf0001)
      .select(col("event_id"), col("session_id"), col("session_idx"), col("duration"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val payload = rows.map { case (e, s, i, d) => s"$e,$s,$i,$d" }.mkString("\n")
    val md5 = MessageDigest.getInstance("MD5")
      .digest(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.length == 1000)
    // pinned 2026-08-12 after gap-unit unification (floored-second compares)
    assert(md5 == "cf5ef12b15d2406db7b0e8ef595999d7")
  }
}
