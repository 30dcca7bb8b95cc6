package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for all suites (object = JVM-wide). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkFunSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sf0001 = "/root/testdata/sf0.001"

  /** Scope session confs around `body`, restoring (or unsetting) the prior
    * values — the session is shared JVM-wide, so every suite that flips a
    * conf must clean up through this. Delegates to [[Confs.withConfs]]. */
  protected def withConfs[A](pairs: (String, String)*)(body: => A): A =
    Confs.withConfs(spark)(pairs: _*)(body)
}
