package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

/** SURVEY.md §7.5: Spark's built-in `session_window` can express gap-only
  * sessionization (not the size/duration cuts or running duration), so we use
  * it strictly as an independent cross-check of our gap sessionizer. */
class SessionWindowCrossCheckSpec extends SparkFunSuite {
  import spark.implicits._

  test("gap sessionizer session count/sizes match built-in session_window") {
    val ev = SparkEntry.table(spark, sf0001, "events")
    val builtIn = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
      .as[(Long, Long)].collect().toSeq.sorted
    val ours = Sessionize.gapSessionize(ev)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(ours == builtIn)
  }
}
