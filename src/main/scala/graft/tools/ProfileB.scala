package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: isolate the x20 scale-smoke costs of hashedLinearScore and
  * the urls normalize+dedup pipeline. */
object ProfileB {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profileB] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  private def multiply(df: DataFrame, keyCol: String, mult: Int, keySpan: Long): DataFrame =
    (0 until mult)
      .map(i => df.withColumn(keyCol, col(keyCol) + lit(i * keySpan)))
      .reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    val docs = multiply(graft.SparkEntry.table(spark, dir, "documents"), "doc_id", 4, 1_000_000L)
    val events = multiply(graft.SparkEntry.table(spark, dir, "events"), "user_id", 20, 1_000_000L)

    time("docs x4: explode+count only")(noop(
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id")).agg(count(lit(1)))))
    val hashedAgg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"))
      .agg(sum(pmod(graft.functions.TextFunctions.tokenHash60(col("token")), lit(1024L))))
    time("docs x4: +md5 hash60 agg")(noop(hashedAgg))
    time("docs x4: hashedLinearScore full")(noop(
      graft.operators.TextAnalysis.hashedLinearScore(docs)))
    time("docs x4: hashedLinearScore again")(noop(
      graft.operators.TextAnalysis.hashedLinearScore(docs)))

    val urls = events.select(col("event_id"),
      format_string("https://www.h%d.example.com/%s/%d?utm_source=x&b=%d&a=1",
        pmod(col("user_id"), lit(5000L)), col("event_type"),
        pmod(col("event_id"), lit(50L)), pmod(col("event_id"), lit(3L))).as("url"))
    time("events x20: format_string only")(noop(urls))
    time("events x20: normalize only")(noop(graft.operators.Urls.normalize(urls, "url")))
    time("events x20: parse_url HOST only")(noop(
      urls.select(parse_url(col("url"), lit("HOST")))))
    time("events x20: dedupByUrl full")(noop(
      graft.operators.Urls.dedupByUrl(urls, "url", "event_id")))
    spark.stop()
  }
}
