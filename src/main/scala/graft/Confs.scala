package graft

import org.apache.spark.sql.SparkSession

/** Conf scoping: set session confs around `body`, restoring (or unsetting)
  * the prior values afterwards. The ONE implementation of the
  * snapshot/set/try-finally-restore idiom — used by the streaming runners
  * (SparkEntry.withStreamingConfs) and the shared test base, so a fix to
  * restore semantics lands everywhere. */
object Confs {
  def withConfs[A](s: SparkSession)(pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
    pairs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
