package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: PQ recall@10 vs Lloyd training iterations — the
  * measurement behind the trainIters default choice (BASELINE.md). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.SparkEntry.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 8L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // candidate-list recall: is the exact top-10 inside the ADC top-R?
    val truth = graft.Materialize(Similarity.l2TopK(q, e, topK = 10)
      .select(col("qid"), col("vec_id")))
    for ((m, k, iters, rr) <- Seq((4, 16, 1, 50), (4, 16, 1, 100),
        (4, 16, 1, 200), (8, 16, 1, 100), (16, 16, 1, 50),
        (16, 16, 1, 400), (16, 64, 1, 200), (16, 64, 1, 400))) {
      val t0 = System.nanoTime()
      val cand = Similarity.pqAdcTopK(q, e, m = m, k = k, topK = rr,
        trainIters = iters)
      val r = Similarity.recallAtK(truth, cand)
        .agg(avg(col("recall")).as("mean_recall")).head().getDouble(0)
      println(f"[recall] m=$m%d k=$k%d iters=$iters%d R=$rr%d " +
        f"cand_recall@10=$r%.4f (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
