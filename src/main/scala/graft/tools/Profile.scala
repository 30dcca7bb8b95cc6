package graft.tools

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: time the heavy operators' public entry points. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.SparkEntry.table(spark, dir, "documents")
    val emb = graft.SparkEntry.table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))

    // stage breakdown of the minhash pipeline (noop writes = full evaluation)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val st = Dedup.shingleSigTable(docs, "doc_id", "text", 3, 16)
    time("  kernel only")(noop(st))
    time("  kernel again")(noop(st))
    val st0 = Dedup.shingleSigTable(docs, "doc_id", "text", 3, 0)
    time("  kernel k=0 (shingles only)")(noop(st0))
    time("  kernel k=0 again")(noop(st0))
    import graft.functions.TextFunctions._
    val exploded = st
      .filter(col("__has"))
      .select(col("doc_id"), col("__sh"),
        posexplode(bandKeys(col("__sig"), 4, 4)).as(Seq("band_idx", "band_key")))
    time("  +bands")(noop(exploded))
    val buckets = exploded
      .groupBy(col("band_idx"), col("band_key"))
      .agg(array_sort(collect_list(struct(col("doc_id").as("id"), col("__sh").as("sh")))).as("rows"))
      .filter(size(col("rows")) > 1)
    time("  +buckets")(noop(buckets))

    time("minhashCandidates")(println("pairs=" + Dedup.minhashCandidates(docs).count()))
    time("nearDupMinhash")(println("rows=" + Dedup.nearDupMinhash(docs, 0.5).count()))
    time("nearDupCosine")(println("rows=" + Similarity.nearDupCosine(emb, 0.4).count()))
    val q = emb.limit(8).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    time("bruteForceTopK")(println("rows=" + Similarity.bruteForceTopK(q, emb, 10).count()))
    time("ivfTopK")(println("rows=" + Similarity.ivfTopK(q, emb, 10).count()))
    time("nearDupSimhash")(println("rows=" + Dedup.nearDupSimhash(docs).count()))
    spark.stop()
  }
}
