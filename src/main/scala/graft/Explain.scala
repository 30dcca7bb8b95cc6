package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or all SparkEntry
  * queries — the scale-review loop (broadcast where expected? filters pushed
  * to the scan? whole-stage codegen spans wide? no stray Exchange?).
  *
  * usage: runMain graft.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty && args(0) != "all") Seq(args(0)) else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
