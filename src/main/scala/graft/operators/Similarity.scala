package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    O(|Q|·|C|) pairs; fine when |Q| is small or as a ground-truth oracle.
  *  - [[ivfTopK]]: IVF-style approximate search — the 100 TB path. Corpus is
  *    partitioned into cells around seed centroids; a query probes only its
  *    `nprobe` nearest cells, scanning ~nprobe/nCentroids of the data.
  *    Everything is DataFrame joins — no driver collect, no UDF loops.
  */
object Similarity {

  /** Cosine similarity between two float-array columns, in double math.
    * `zip_with` + `aggregate` stay inside codegen; round(6) for oracle
    * stability (sum order across 64 elements is fixed left-to-right). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0),
        (acc, v) => acc + v)
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)
  }

  /** Exact top-k: every query row against every corpus row, ranked by
    * (cosine desc, corpus id) per query. Spark plans the cross join as
    * BroadcastNestedLoopJoin with the (small) query side broadcast. */
  def bruteForceTopK(
      queries: DataFrame,   // (qid, qvec)
      corpus: DataFrame,    // (vec_id, embedding)
      k: Int): DataFrame = {
    val pairs = queries
      .crossJoin(corpus)
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sim", cosine(col("qvec"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rank"))
  }

  /** All near-duplicate pairs with cosine ≥ threshold (exact, symmetric,
    * a < b). O(n²) compare — at scale swap the self-join for [[assignCells]]
    * blocking (same verify step, candidates from shared cells). */
  def nearDupCosine(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", cosine(col("emb_a"), col("emb_b")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("sim"))
  }

  /** IVF cell assignment: centroids = the `nCentroids` lowest-id corpus
    * vectors (deterministic, training-free; swap in k-means centroids for
    * production recall). Returns corpus rows tagged with `cell`.
    * The centroid side is broadcast — it is bounded and tiny. */
  def assignCells(corpus: DataFrame, nCentroids: Int): DataFrame = {
    val centroids = broadcast(
      corpus
        .orderBy(col("vec_id"))
        .limit(nCentroids)
        .select(col("vec_id").as("cell"), col("embedding").as("cvec")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("__d").desc, col("cell"))
    corpus
      .crossJoin(centroids)
      .withColumn("__d", cosine(col("embedding"), col("cvec")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** IVF approximate top-k: probe the `nprobe` cells nearest to each query,
    * exact-rank within the probed subset. Recall rises with nprobe;
    * cost ~ nprobe/nCentroids of brute force. */
  def ivfTopK(
      queries: DataFrame,   // (qid, qvec)
      corpus: DataFrame,    // (vec_id, embedding)
      k: Int,
      nCentroids: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val cells = assignCells(corpus, nCentroids)
    val centroids = broadcast(
      corpus
        .orderBy(col("vec_id"))
        .limit(nCentroids)
        .select(col("vec_id").as("cell"), col("embedding").as("cvec")))
    val wq = Window.partitionBy(col("qid")).orderBy(col("__d").desc, col("cell"))
    val probes = queries
      .crossJoin(centroids)
      .withColumn("__d", cosine(col("qvec"), col("cvec")))
      .withColumn("__r", row_number().over(wq))
      .filter(col("__r") <= nprobe)
      .select(col("qid"), col("qvec"), col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    probes
      .join(cells, "cell") // shuffle join on cell — each query scans only probed cells
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sim", cosine(col("qvec"), col("embedding")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rank"))
  }
}
