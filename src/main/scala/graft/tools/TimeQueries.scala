package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: time named SparkEntry queries in isolation (noop sink,
  * two separated passes, min reported) — the single-query counterpart
  * of Bench for before/after work on one operator.
  * Args: <sfDir> <comma-separated query names> */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else sys.error("usage: TimeQueries <sfDir> <q_a,q_b,...>")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(once) // warm-up pass
    System.gc(); Thread.sleep(300)
    val a = names.map(n => n -> once(n))
    System.gc(); Thread.sleep(300)
    val b = names.map(n => n -> once(n)).toMap
    a.foreach { case (n, ta) =>
      println(f"[time] $n%-32s min=${math.min(ta, b(n))}%6.2f s  (a=$ta%.2f b=${b(n)}%.2f)")
    }
    spark.stop()
  }
}
