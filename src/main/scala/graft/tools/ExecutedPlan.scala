package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: EXECUTE one query and print the final adaptive plan — the
  * runtime complement to [[graft.Explain]] (which prints the static plan;
  * under AQE, exchange reuse, runtime broadcast promotion, and skew splits
  * only show up here).
  *
  * usage: runMain graft.tools.ExecutedPlan <queryName> [sfDir]
  */
object ExecutedPlan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExecutedPlan <queryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val n = df.collect().length
    val p = df.queryExecution.executedPlan.toString
    println(s"\n========== $name (executed, $n rows) ==========")
    println(p)
    println(s"[executedplan] rows=$n" +
      s" reusedExchanges=${"ReusedExchange".r.findAllIn(p).length}" +
      s" shuffles=${"Exchange hashpartitioning".r.findAllIn(p).length}" +
      s" scans=${"Scan parquet".r.findAllIn(p).length}" +
      s" broadcasts=${"BroadcastExchange".r.findAllIn(p).length}")
    spark.stop()
  }
}
